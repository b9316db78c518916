"""Deterministic synthetic web + image store (FIXTURES.md tables 1-4).

Everything is a pure function of ``(seed, scale)``; fixtures are generated
once and cached under ``/tmp/graft_fixtures/<scale>/`` (parquet, with a
params-stamped ``_SUCCESS`` manifest).  The crawl pipeline's fetch stage
resolves URLs against these tables instead of HTTP — the "web" is closed, so
correctness against the pure-Python oracle is exact.

Tables
------
- ``seeds(url, seed_rank)`` — mirrors the reference's default seed list
  (master/master_node.py:278-286) incl. a duplicate and a fragment-bearing
  variant to exercise dedup + canonicalization.
- ``web_pages(url, host, status, redirect_to, outlinks, outlinks_resolved,
  image_refs)`` — what requests.get + BeautifulSoup would yield
  (crawler/crawler_node.py:299-320).  ``outlinks`` are RAW hrefs in document
  order (absolute, relative, fragment, mailto/javascript junk, duplicates,
  dangling); ``outlinks_resolved`` is the canonicalized+filtered projection,
  present ONLY so a DuckDB SQL oracle can re-derive reachability without
  reimplementing canonicalization.
- ``robots(host, disallow, crawl_delay_ms, fetch_fails)`` — per-host policy
  (crawler/crawler_node.py:27-55; archive/crawler_node.py:48-78).
- ``images(image_url, image_id, bytes, w, h, fmt, caption, phash)`` plus an
  ``oracle_pixels(image_id, pixels_npy)`` side table (t1/t2 only) holding the
  pre-encode pixels for the allclose/PSNR invariant.
"""

from __future__ import annotations

import io
import json
import os
import tempfile
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from distributed_web_crawling_system_ray.functions.canon import canonicalize, md5_hex
from distributed_web_crawling_system_ray.functions.codec import (
    decode_image,
    encode_lossy,
    encode_png,
)
from distributed_web_crawling_system_ray.functions.phash import phash64

FIXTURE_ROOT = os.environ.get("GRAFT_FIXTURE_ROOT", "/tmp/graft_fixtures")


@dataclass(frozen=True)
class WebParams:
    n_pages: int
    n_seeds: int = 7
    seed: int = 42
    image_ratio: float = 0.5
    include_pixel_oracle: bool = True
    max_dim: int = 512
    schema_version: int = 6  # bump to invalidate cached fixtures


SCALES: dict[str, WebParams] = {
    "t1": WebParams(n_pages=50),
    "t2": WebParams(n_pages=2000),
    "bench": WebParams(n_pages=50_000, include_pixel_oracle=False, max_dim=256),
}

_JUNK_HREFS = ["mailto:someone@example.org", "javascript:void(0)", "ftp://ftp.example.org/pub"]


def _hosts(n_pages: int) -> list[str]:
    n = max(5, n_pages // 25)
    hosts = [f"h{i}.example-{i % 7}.test" for i in range(n)]
    # special-policy hosts (always present)
    hosts[1] = "closed.example.test"       # disallow everything
    hosts[2] = "partial.example.test"      # disallow /private/ subtree
    hosts[3] = "robots-fail.example.test"  # robots.txt unreachable
    return hosts


def _zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1), s)
    return w / w.sum()


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Procedural pixels, pure in image_id — gradients + sinusoids + noise."""
    rng = np.random.default_rng(int(image_id[:16], 16))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.empty((h, w, 3), np.float32)
    for c in range(3):
        fx, fy = rng.uniform(0.005, 0.15, 2)
        ph = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(60, 120)
        img[:, :, c] = 127.0 + amp * np.sin(2 * np.pi * (fx * xx + fy * yy) + ph)
    img += rng.normal(0, 5.0, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


_ADJ = ["quiet", "amber", "rapid", "frozen", "smooth", "vivid", "pale", "dense"]
_NOUN = ["harbor", "forest", "skyline", "motor", "竜", "café", "naïve-étude", "river"]


def _caption(j: int, image_id: str, rng: np.random.Generator) -> str:
    return (
        f"Image {j}: {_ADJ[int(rng.integers(len(_ADJ)))]} "
        f"{_NOUN[int(rng.integers(len(_NOUN)))]} — id {image_id[:8]} ✓"
    )


def generate(params: WebParams) -> dict[str, pa.Table]:
    """Build all fixture tables in memory. Pure in ``params``."""
    rng = np.random.default_rng(params.seed)
    n = params.n_pages
    hosts = _hosts(n)
    host_w = _zipf_weights(len(hosts))
    page_host = rng.choice(len(hosts), size=n, p=host_w)

    # ~10% orphans form the unreachable component (never targeted, never seeded)
    orphan = rng.random(n) < 0.10
    linkable = np.flatnonzero(~orphan)

    # statuses: 90% 200, 5% 404, 3% 500, 2% timeout sentinel (-1)
    status = np.full(n, 200, dtype=np.int16)
    r = rng.random(n)
    status[r < 0.05] = 404
    status[(r >= 0.05) & (r < 0.08)] = 500
    status[(r >= 0.08) & (r < 0.10)] = -1

    # paths; partial.example.test hosts some /private/ pages (robots-disallowed)
    paths = []
    for i in range(n):
        h = hosts[page_host[i]]
        u = rng.random()
        if h == "partial.example.test" and u < 0.4:
            paths.append(f"/private/p{i}.html")
        elif u < 0.15:
            paths.append(f"/q{i}?id={i}")
        elif u < 0.5:
            paths.append(f"/a/p{i}.html")
        else:
            paths.append(f"/p/{i}")
    urls = [f"http://{hosts[page_host[i]]}{paths[i]}" for i in range(n)]
    url_of = {i: urls[i] for i in range(n)}

    # redirects: 5% of non-orphan pages redirect to a 200 page; chains are
    # structurally impossible (a source is never a target and vice versa),
    # matching requests' effective single-hop here and keeping the SQL
    # oracle's one-join redirect resolution exact
    redirect_to = [None] * n
    candidates = np.flatnonzero((status == 200) & ~orphan)
    redirect_sources: set[int] = set()
    redirect_targets: set[int] = set()
    for i in linkable:
        if rng.random() < 0.05 and len(candidates) > 1 and i not in redirect_targets:
            tgt = int(candidates[rng.integers(len(candidates))])
            if tgt == i or tgt in redirect_sources or tgt in redirect_targets:
                continue
            redirect_to[i] = urls[tgt]
            redirect_sources.add(i)
            redirect_targets.add(tgt)

    # same-host pools for relative-link rendering
    by_host: dict[int, np.ndarray] = {
        hi: np.intersect1d(np.flatnonzero(page_host == hi), linkable)
        for hi in range(len(hosts))
    }
    popular = linkable[: max(1, len(linkable) // 5)]

    n_img = max(1, int(n * params.image_ratio))
    img_host = rng.choice(len(hosts), size=n_img, p=host_w)
    img_fmt = np.where(rng.random(n_img) < 0.5, "png", "jpeg")
    img_urls = [
        f"http://{hosts[img_host[j]]}/img/{j}.{'png' if img_fmt[j] == 'png' else 'jpg'}"
        for j in range(n_img)
    ]
    img_by_host: dict[int, np.ndarray] = {
        hi: np.flatnonzero(img_host == hi) for hi in range(len(hosts))
    }
    img_popular = np.arange(min(n_img, max(1, n_img // 5)))

    outlinks_col: list[list[str]] = []
    resolved_col: list[list[str]] = []
    image_refs_col: list[list[str]] = []
    image_refs_resolved_col: list[list[str]] = []
    for i in range(n):
        hi = page_host[i]
        k = int(rng.poisson(6.0))
        hrefs: list[str] = []
        resolved: list[str] = []
        chosen: list[int] = []
        for _ in range(k):
            u = rng.random()
            pool = by_host[hi] if (u < 0.6 and len(by_host[hi]) > 0) else linkable
            if len(pool) == 0:
                continue
            tgt = int(pool[rng.integers(len(pool))])
            if rng.random() < 0.15:
                tgt = int(popular[rng.integers(len(popular))])
            chosen.append(tgt)
        # render hrefs in document order, mixing forms + junk + dups + dangling
        for tgt in chosen:
            v = rng.random()
            tu = url_of[tgt]
            same = page_host[tgt] == hi
            if same and v < 0.35:
                href = tu.split(hosts[hi], 1)[1]  # root-relative
            elif v < 0.50:
                href = tu + "#sec" + str(int(rng.integers(5)))
            elif v < 0.55:
                href = "HTTP://" + tu[len("http://"):]
            elif v < 0.60:
                href = "//" + tu[len("http://"):]
            else:
                href = tu
            hrefs.append(href)
        if hrefs and rng.random() < 0.3:  # duplicate link on the page
            hrefs.append(hrefs[int(rng.integers(len(hrefs)))])
        if rng.random() < 0.25:
            hrefs.insert(
                int(rng.integers(len(hrefs) + 1)),
                _JUNK_HREFS[int(rng.integers(len(_JUNK_HREFS)))],
            )
        if rng.random() < 0.10:  # dangling link -> 404 at fetch
            hrefs.append(f"/missing/{int(rng.integers(1 << 30))}")
        base = urls[i]
        for hf in hrefs:
            c = canonicalize(hf, base)
            if c is not None:
                resolved.append(c)
        # image refs (0-4, skewed low)
        ki = int(rng.choice([0, 1, 2, 3, 4], p=[0.30, 0.30, 0.20, 0.15, 0.05]))
        irefs: list[str] = []
        for _ in range(ki):
            u = rng.random()
            ipool = img_by_host[hi] if (u < 0.5 and len(img_by_host[hi]) > 0) else None
            if rng.random() < 0.2:
                j = int(img_popular[rng.integers(len(img_popular))])
            elif ipool is not None:
                j = int(ipool[rng.integers(len(ipool))])
            else:
                j = int(rng.integers(n_img))
            iu = img_urls[j]
            if img_host[j] == hi and rng.random() < 0.4:
                irefs.append(iu.split(hosts[hi], 1)[1])
            else:
                irefs.append(iu)
        iresolved = []
        for hf in irefs:
            c = canonicalize(hf, base)
            if c is not None:
                iresolved.append(c)
        outlinks_col.append(hrefs)
        resolved_col.append(resolved)
        image_refs_col.append(irefs)
        image_refs_resolved_col.append(iresolved)

    web_pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array([hosts[h] for h in page_host], pa.string()),
            "status": pa.array(status, pa.int16()),
            "redirect_to": pa.array(redirect_to, pa.string()),
            "outlinks": pa.array(outlinks_col, pa.list_(pa.string())),
            "outlinks_resolved": pa.array(resolved_col, pa.list_(pa.string())),
            "image_refs": pa.array(image_refs_col, pa.list_(pa.string())),
            # canonical projection for the DuckDB SQL oracle only (like
            # outlinks_resolved) — the pipeline always uses the raw refs
            "image_refs_resolved": pa.array(
                image_refs_resolved_col, pa.list_(pa.string())
            ),
        }
    )

    # --- robots ---
    dis: list[list[str]] = []
    delays: list[int] = []
    fails: list[bool] = []
    for h in hosts:
        if h == "closed.example.test":
            dis.append(["/"]); delays.append(1000); fails.append(False)
        elif h == "partial.example.test":
            dis.append(["/private/"]); delays.append(1500); fails.append(False)
        elif h == "robots-fail.example.test":
            dis.append([]); delays.append(3000); fails.append(True)
        else:
            dis.append([])
            delays.append(int(rng.choice([1000, 1000, 1500, 2000])))
            fails.append(False)
    robots = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "disallow": pa.array(dis, pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(delays, pa.int32()),
            "fetch_fails": pa.array(fails, pa.bool_()),
        }
    )

    # --- seeds: hub pages + a duplicate + a fragment/uppercase variant ---
    hubs = [int(linkable[i % len(linkable)]) for i in range(params.n_seeds - 2)]
    seed_urls = [urls[i] for i in hubs]
    seed_urls.append(seed_urls[0])            # exact duplicate
    seed_urls.append(seed_urls[1].replace("http://", "HTTP://") + "#top")
    seeds = pa.table(
        {
            "url": pa.array(seed_urls, pa.string()),
            "seed_rank": pa.array(np.arange(len(seed_urls)), pa.int64()),
            # canonical form for the SQL oracle only
            "canon": pa.array([canonicalize(u) for u in seed_urls], pa.string()),
        }
    )

    # --- images ---
    # ~4% are near-duplicates: pixels of an earlier image plus low-amplitude
    # deterministic noise — exercises phash / embedding near-dup operators
    # (the reference lists near-dup as future work, system_architecture_v3.md:319)
    ids, blobs, ws, hs, fmts, caps, phs, pix = [], [], [], [], [], [], [], []
    mrs, mgs, mbs = [], [], []  # decoded mean color — image_features oracle
    dup_of: list[int | None] = [None] * n_img
    for j in range(n_img):
        if j > 0 and rng.random() < 0.04:
            dup_of[j] = int(rng.integers(min(j, 64)))  # sources = first 64
    kept_pixels: dict[int, np.ndarray] = {}
    for j in range(n_img):
        iu = img_urls[j]
        iid = md5_hex(iu)
        u1, u2 = rng.random(), rng.random()
        lim = params.max_dim
        if dup_of[j] is not None and dup_of[j] in kept_pixels:
            src = kept_pixels[dup_of[j]]
            nrng = np.random.default_rng(int(iid[:16], 16))
            px = np.clip(
                src.astype(np.int16) + nrng.integers(-2, 3, size=src.shape), 0, 255
            ).astype(np.uint8)
            h, w = px.shape[:2]
        else:
            w = int(16 * 2 ** (u1 * np.log2(lim / 16)))
            h = int(16 * 2 ** (u2 * np.log2(lim / 16)))
            px = synth_pixels(iid, w, h)
        if len(kept_pixels) < 64:  # bounded memory for dup sources
            kept_pixels[j] = px
        blob = encode_png(px) if img_fmt[j] == "png" else encode_lossy(px)
        dec, _ = decode_image(blob)
        ids.append(iid)
        blobs.append(blob)
        ws.append(w)
        hs.append(h)
        fmts.append(str(img_fmt[j]))
        caps.append(_caption(j, iid, rng))
        phs.append(phash64(dec))  # phash of what the pipeline will decode
        mm = dec.reshape(-1, 3).mean(axis=0)
        mrs.append(int(round(mm[0])))
        mgs.append(int(round(mm[1])))
        mbs.append(int(round(mm[2])))
        if params.include_pixel_oracle:
            buf = io.BytesIO()
            np.save(buf, px)
            pix.append(buf.getvalue())
    images = pa.table(
        {
            "image_url": pa.array(img_urls, pa.string()),
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
            "mean_r": pa.array(mrs, pa.int32()),
            "mean_g": pa.array(mgs, pa.int32()),
            "mean_b": pa.array(mbs, pa.int32()),
        }
    )
    out = {"seeds": seeds, "web_pages": web_pages, "robots": robots, "images": images}
    if params.include_pixel_oracle:
        out["oracle_pixels"] = pa.table(
            {"image_id": pa.array(ids, pa.string()), "pixels_npy": pa.array(pix, pa.binary())}
        )
    return out


def build_fixture(scale: str, root: str = FIXTURE_ROOT) -> str:
    """Generate (once) and cache the fixture for ``scale``; returns its dir."""
    params = SCALES[scale]
    d = os.path.join(root, scale)
    stamp = os.path.join(d, "_SUCCESS")
    want = json.dumps(asdict(params), sort_keys=True)
    if os.path.exists(stamp):
        with open(stamp) as f:
            if f.read() == want:
                return d
    tables = generate(params)
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root)
    for name, tbl in tables.items():
        # images: bytes are already PNG/QJPG-compressed — store the parquet
        # uncompressed so memory_map reads are zero-copy and the one file is
        # shared across all worker processes via the OS page cache
        comp = "none" if name == "images" else "snappy"
        pq.write_table(tbl, os.path.join(tmp, f"{name}.parquet"), compression=comp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(want)
    # atomic-ish publish
    if os.path.isdir(d):
        import shutil

        shutil.rmtree(d)
    os.replace(tmp, d)
    return d


class WebStore:
    """Read-side handle over the synthetic web: the 'network' the fetch stage
    hits.  Construct from a fixture dir (driver/tests/oracle) or from
    preloaded Arrow tables (``from_tables`` — the crawl pipeline broadcasts
    the tables through the Ray object store with ``ray.put`` so every worker
    on a node shares ONE zero-copy Arrow buffer instead of re-parsing the
    parquet per process; per-worker parses of the images table measured
    35-50 s under crawl I/O contention at bench scale).
    """

    def __init__(
        self,
        fixture_dir: str | None = None,
        *,
        pages: pa.Table | None = None,
        robots: pa.Table | None = None,
        images: pa.Table | None = None,
    ):
        self.dir = fixture_dir
        if pages is None:
            pages = pq.read_table(os.path.join(fixture_dir, "web_pages.parquet"))
        if robots is None:
            robots = pq.read_table(os.path.join(fixture_dir, "robots.parquet"))
        self._page_idx: dict[str, int] = {
            u: i for i, u in enumerate(pages.column("url").to_pylist())
        }
        self._pages = pages
        self._robots = robots
        # images index builds lazily: fetch-side users never touch it
        self._images: pa.Table | None = images
        self._img_idx: dict[str, int] | None = None

    @classmethod
    def from_tables(
        cls, pages: pa.Table, robots: pa.Table, images: pa.Table
    ) -> "WebStore":
        return cls(None, pages=pages, robots=robots, images=images)

    def _ensure_images(self) -> None:
        if self._images is None:
            self._images = pq.read_table(
                os.path.join(self.dir, "images.parquet"), memory_map=True
            )
        if self._img_idx is None:
            self._img_idx = {
                u: i
                for i, u in enumerate(self._images.column("image_url").to_pylist())
            }

    def robots_table(self) -> pa.Table:
        return self._robots

    def get_page(self, canon_url: str) -> dict | None:
        i = self._page_idx.get(canon_url)
        if i is None:
            return None
        return {k: v[0] for k, v in self._pages.slice(i, 1).to_pydict().items()}

    def get_image(self, canon_url: str) -> dict | None:
        self._ensure_images()
        i = self._img_idx.get(canon_url)
        if i is None:
            return None
        return {k: v[0] for k, v in self._images.slice(i, 1).to_pydict().items()}

    def fetch_batch(self, canons: list[str]) -> dict[str, list]:
        """Vectorized fetch: one ``take`` gather per batch instead of a
        per-row slice+to_pydict (which costs ~0.1-1 ms/row in pyarrow call
        overhead — the measured hot-path cost at bench scale).

        Returns columnar lists: status, final_url, outlinks, image_refs.
        Redirect resolution is a second gather (the fixture is chain-free by
        construction, matching requests' effective single hop).
        """
        n = len(canons)
        idxs = np.fromiter(
            (self._page_idx.get(c, -1) for c in canons), dtype=np.int64, count=n
        )
        status: list[int] = [404] * n
        finals: list[str] = list(canons)
        outlinks: list[list[str]] = [[] for _ in range(n)]
        image_refs: list[list[str]] = [[] for _ in range(n)]
        found = np.flatnonzero(idxs >= 0)
        if len(found) == 0:
            return {
                "status": status,
                "final_url": finals,
                "outlinks": outlinks,
                "image_refs": image_refs,
            }
        sub = self._pages.take(pa.array(idxs[found]))
        red = sub.column("redirect_to").to_pylist()
        # second gather for redirect targets
        rrows = [i for i, r in enumerate(red) if r is not None]
        rtgt = {
            i: self._page_idx.get(red[i], -1) for i in rrows
        }
        tgt_rows = [t for t in rtgt.values() if t >= 0]
        tgt_sub = self._pages.take(pa.array(tgt_rows)) if tgt_rows else None
        tgt_pos = {t: p for p, t in enumerate(tgt_rows)}
        st = sub.column("status").to_pylist()
        ol = sub.column("outlinks").to_pylist()
        ir = sub.column("image_refs").to_pylist()
        t_st = tgt_sub.column("status").to_pylist() if tgt_sub is not None else []
        t_ol = tgt_sub.column("outlinks").to_pylist() if tgt_sub is not None else []
        t_ir = tgt_sub.column("image_refs").to_pylist() if tgt_sub is not None else []
        for p, i in enumerate(found):
            if red[p] is not None:
                t = rtgt[p]
                if t < 0:
                    status[i] = 404
                    finals[i] = red[p]
                    continue
                q = tgt_pos[t]
                s = int(t_st[q])
                status[i] = s
                finals[i] = red[p]
                if s == 200:
                    outlinks[i] = t_ol[q]
                    image_refs[i] = t_ir[q]
            else:
                s = int(st[p])
                status[i] = s
                if s == 200:
                    outlinks[i] = ol[p]
                    image_refs[i] = ir[p]
        return {
            "status": status,
            "final_url": finals,
            "outlinks": outlinks,
            "image_refs": image_refs,
        }

    def get_images_batch(self, canons: list[str]) -> dict[str, list]:
        """Vectorized image fetch: one gather per batch; rows for unknown
        URLs are dropped (dangling refs == 404)."""
        self._ensure_images()
        idxs = [self._img_idx.get(c, -1) for c in canons]
        found = [i for i, x in enumerate(idxs) if x >= 0]
        if not found:
            return {"canon": [], "bytes": [], "caption": []}
        sub = self._images.take(pa.array([idxs[i] for i in found], pa.int64()))
        return {
            "canon": [canons[i] for i in found],
            "bytes": sub.column("bytes").to_pylist(),
            "caption": sub.column("caption").to_pylist(),
        }

    def fetch(self, canon_url: str, max_redirects: int = 5) -> dict:
        """Simulated HTTP GET with v1 redirect-following semantics
        (archive/crawler_node.py:36-43: requests follows redirects, final
        content + response.url are returned)."""
        url = canon_url
        for _ in range(max_redirects):
            page = self.get_page(url)
            if page is None:
                return {"status": 404, "final_url": url, "outlinks": [], "image_refs": []}
            if page["redirect_to"]:
                url = page["redirect_to"]
                continue
            return {
                "status": int(page["status"]),
                "final_url": url,
                "outlinks": list(page["outlinks"]),
                "image_refs": list(page["image_refs"]),
            }
        return {"status": 508, "final_url": url, "outlinks": [], "image_refs": []}
