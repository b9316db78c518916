"""Per-worker-process state cache for task-based map stages.

The crawl runs as one short Dataset pipeline per BFS round.  A class-based
``map_batches`` actor pool would pay actor startup + state load EVERY round
(pools die with their pipeline).  Ray *task* workers, by contrast, are
long-lived processes reused across rounds — so stateful-but-immutable stage
state (the synthetic-web store handle, parsed robots policies, broadcast
round inputs) lives in a module-level cache keyed by its identity and loads
once per worker process for the whole crawl.

This keeps the reference's "load once per worker" semantics (the per-crawler
``requests.Session`` / ``RobotsCache``, crawler/crawler_node.py:27-55,79-83)
with zero per-round overhead.  Genuinely *mutable* cross-round state (the
URL-seen filters) stays in long-lived named actors (state/seen.py).
"""

from __future__ import annotations

import ray

_CACHE: dict = {}


def get_store(fixture_dir: str):
    """WebStore handle loaded from disk, one per worker process (tests /
    small fixtures; the crawl pipeline uses get_shared_store instead)."""
    key = ("store", fixture_dir)
    if key not in _CACHE:
        from distributed_web_crawling_system_ray.sources.synthweb import WebStore

        _CACHE[key] = WebStore(fixture_dir)
    return _CACHE[key]


def get_shared_store(pages_ref, robots_ref, images_ref):
    """WebStore built from object-store-broadcast Arrow tables: the table
    buffers live ONCE per node in shared memory (ray.put on the driver);
    workers pay only the url->row index build, once per process."""
    key = ("shared_store", pages_ref.hex(), robots_ref.hex(), images_ref.hex())
    if key not in _CACHE:
        from distributed_web_crawling_system_ray.sources.synthweb import WebStore

        _CACHE[key] = WebStore.from_tables(
            ray.get(pages_ref), ray.get(robots_ref), ray.get(images_ref)
        )
    return _CACHE[key]


def get_http_store(user_agent: str, timeout_s: float):
    """Live-HTTP store handle (requests.Session), one per worker process —
    the reference's per-crawler session pool (crawler/crawler_node.py:79-83).
    Selected by CrawlConfig.store_backend == "http"."""
    key = ("http_store", user_agent, timeout_s)
    if key not in _CACHE:
        from distributed_web_crawling_system_ray.sources.httpstore import HttpStore

        _CACHE[key] = HttpStore(user_agent=user_agent, timeout_s=timeout_s)
    return _CACHE[key]


def get_object(ref: "ray.ObjectRef"):
    """ray.get with a per-worker cache — a broadcast object (robots table,
    host clocks) deserializes once per worker instead of once per task."""
    key = ("obj", ref.hex())
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
        if len(_CACHE) > 64:  # drop stale broadcast epochs
            for k in list(_CACHE.keys()):
                if k[0] == "obj" and k != key:
                    del _CACHE[k]
    return _CACHE[key]


def get_policies(robots_ref: "ray.ObjectRef"):
    key = ("policies", robots_ref.hex())
    if key not in _CACHE:
        from distributed_web_crawling_system_ray.state.robots import RobotsPolicies

        _CACHE[key] = RobotsPolicies.from_table(ray.get(robots_ref))
    return _CACHE[key]
