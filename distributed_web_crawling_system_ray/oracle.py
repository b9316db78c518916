"""Pure-Python conformance oracle: the reference v1 crawl semantics.

Re-implements (from scratch, ~80 lines, tests only — never used by the Ray
pipeline) the v1 MPI master/crawler logic:

- strict FIFO task queue, first-seen dedup at enqueue time
  (archive/master_node.py:46-54,74-78: ``queue.Queue`` + ``visited_urls`` set),
- seeds enqueued in order with the same dedup (archive/master_node.py:26-44),
- robots gate *after* dequeue, before fetch — disallowed URLs stay in the
  seen set but produce no fetch, no children (archive/crawler_node.py:24-27
  returns (None, []) -> crawler sends an empty link list),
- redirect-following fetch whose final ``response.url`` is the urljoin base
  (archive/crawler_node.py:36-43),
- link extraction in document order with urljoin + http(s) filter
  (archive/crawler_node.py:80-97), extended with this rebuild's full
  canonicalization (the pipeline applies the identical function),
- image refs resolved per fetched page, robots-gated, first-seen by
  canonical image URL (the payload graft; image_id = md5(canon)).

The oracle's FIFO pop order equals lexicographic ``(depth, rank_path)`` order
— the property the distributed pipeline's per-round sort relies on; tests
assert both representations agree.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

from distributed_web_crawling_system_ray.functions.canon import canonicalize, url_hash
from distributed_web_crawling_system_ray.functions.canon import host_of as _host
from distributed_web_crawling_system_ray.state.robots import RobotsPolicies

RANK_BYTES = 3  # per-level width of rank_path (16M links/page, 16M seeds)


@dataclass
class OracleResult:
    seen: dict[str, tuple[int, bytes]]  # canon -> (depth, rank_path)
    order: list[dict]   # attempted fetches, FIFO order (robots-allowed pops)
    images: dict[str, dict]  # image_id -> image row (payload expectation)
    disallowed: set[str]     # canon URLs dropped by the robots gate


def crawl_oracle(store, robots_table=None, max_depth: int = 10**9) -> OracleResult:
    """Run the v1-semantics crawl over a ``WebStore``."""
    robots = RobotsPolicies.from_table(
        robots_table if robots_table is not None else store.robots_table()
    )
    seen: dict[str, tuple[int, bytes]] = {}
    order: list[dict] = []
    disallowed: set[str] = set()
    images: dict[str, dict] = {}
    image_seen: set[str] = set()
    q: deque[tuple[str, int, bytes]] = deque()

    import pyarrow.parquet as pq
    import os

    seeds = pq.read_table(os.path.join(store.dir, "seeds.parquet")).to_pydict()
    ranked = sorted(zip(seeds["seed_rank"], seeds["url"]))
    for rank, url in ranked:
        c = canonicalize(url)
        if c is None or c in seen:
            continue
        rp = int(rank).to_bytes(RANK_BYTES, "big")
        seen[c] = (0, rp)
        q.append((c, 0, rp))

    fetch_seq = 0
    while q:
        c, depth, rp = q.popleft()
        host = _host(c)
        if not robots.allows(host, c):
            disallowed.add(c)
            continue
        res = store.fetch(c)
        ok = res["status"] == 200
        order.append(
            {
                "canon_url": c,
                "url_hash": url_hash(c),
                "depth": depth,
                "rank_path": rp,
                "fetch_seq": fetch_seq,
                "success": ok,
            }
        )
        fetch_seq += 1
        if not ok or depth >= max_depth:
            continue
        base = res["final_url"]
        for pos, href in enumerate(res["outlinks"]):
            cc = canonicalize(href, base)
            if cc is None or cc in seen:
                continue
            crp = rp + pos.to_bytes(RANK_BYTES, "big")
            seen[cc] = (depth + 1, crp)
            q.append((cc, depth + 1, crp))
        for href in res["image_refs"]:
            ic = canonicalize(href, base)
            if ic is None or ic in image_seen:
                continue
            image_seen.add(ic)
            if not robots.allows(_host(ic), ic):
                disallowed.add(ic)
                continue
            img = store.get_image(ic)
            if img is not None:
                images[img["image_id"]] = img
    return OracleResult(seen=seen, order=order, images=images, disallowed=disallowed)
