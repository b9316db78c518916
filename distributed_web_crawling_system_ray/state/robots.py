"""robots.txt policy: parse/match + per-host crawl delay.  [pure]

Reference semantics reproduced (crawler/crawler_node.py:27-55 RobotsCache;
archive/crawler_node.py:48-78 crawl-delay extraction):

- rules are cached per host (TTL 3600 s in the reference; irrelevant for the
  closed fixture web but kept on the record struct),
- robots fetch failure => allow-all BUT conservative 3000 ms delay,
- crawl delay >= 1000 ms always (v1 ``max(1, crawl_delay)``),
- host absent from the robots table => allow-all, default 1000 ms delay,
- a URL is disallowed when any disallow prefix matches its path
  (urllib.robotparser longest-prefix semantics degenerate to prefix-match for
  the plain path prefixes the fixture uses).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa


@dataclass(frozen=True)
class HostPolicy:
    host: str
    disallow: tuple[str, ...]
    crawl_delay_ms: int
    fetch_fails: bool = False
    fetched_at: float = 0.0

    def allows(self, canon_url: str) -> bool:
        if self.fetch_fails:  # robots unreachable -> assume allowed
            return True
        if not self.disallow:
            return True
        rest = canon_url.split("://", 1)[1]
        slash = rest.find("/")
        path = rest[slash:] if slash >= 0 else "/"
        return not any(path.startswith(p) for p in self.disallow)


DEFAULT_DELAY_MS = 1000
CONSERVATIVE_DELAY_MS = 3000


@dataclass
class RobotsPolicies:
    """All host policies for a crawl — the broadcast-small-side lookup (J2)."""

    by_host: dict[str, HostPolicy] = field(default_factory=dict)

    @classmethod
    def from_table(cls, robots: pa.Table) -> "RobotsPolicies":
        d = robots.to_pydict()
        out: dict[str, HostPolicy] = {}
        for i in range(robots.num_rows):
            fails = bool(d["fetch_fails"][i])
            delay = int(d["crawl_delay_ms"][i])
            floor = CONSERVATIVE_DELAY_MS if fails else DEFAULT_DELAY_MS
            out[d["host"][i]] = HostPolicy(
                host=d["host"][i],
                disallow=() if fails else tuple(d["disallow"][i]),
                crawl_delay_ms=max(floor, delay),
                fetch_fails=fails,
            )
        return cls(out)

    def policy(self, host: str) -> HostPolicy:
        p = self.by_host.get(host)
        if p is None:
            p = HostPolicy(host=host, disallow=(), crawl_delay_ms=DEFAULT_DELAY_MS)
            self.by_host[host] = p
        return p

    def allows(self, host: str, canon_url: str) -> bool:
        return self.policy(host).allows(canon_url)

    def delay_ms(self, host: str) -> int:
        return self.policy(host).crawl_delay_ms
