"""Ray-Data-native rebuild of the Trimbex Distributed-Web-Crawling-System.

A from-scratch URL-frontier + fetch scheduler expressed as Ray Data pipelines:

- frontier rounds are ``ray.data.Dataset``s of URL rows (BFS levels),
- fetch + decode is an actor-pool ``map_batches`` stage over zero-copy Arrow,
- URL-seen dedup is a sharded bloom+cuckoo filter actor pool,
- politeness / robots scheduling is a per-host-sharded actor pool,
- output is a partitioned (per-round) image+caption table
  (``image_id, bytes, w, h, fmt, caption, phash``), Lance when the ``lance``
  package is importable, Parquet otherwise.

The reference system (studied for semantics only, never copied) is
Trimbex/Distributed-Web-Crawling-System: a Flask+SQS+S3 master/worker crawler
(v3) and an MPI pipeline (v1, ``archive/``).  See SURVEY.md for the full
operator mapping.
"""

from distributed_web_crawling_system_ray.config import CrawlConfig

__all__ = ["CrawlConfig"]
__version__ = "0.1.0"
