"""Crawler→indexer seam: every crawled caption flows into the search index
(reference: crawler_node.send_to_indexer → indexer update_document,
crawler/crawler_node.py:340-366 + indexer/indexer_node.py:83-106).

Contract under test:
- index_crawl_payload over a finished crawl's payload indexes one document
  per crawled image, doc_id content-addressed from image_id.
- posting truth: and_terms for a caption token returns exactly the crawled
  images whose captions contain it (brute-forced in-test).
- re-indexing the SAME payload upserts (live_docs unchanged, new
  generation) — the reference's re-crawl behavior.
- the full search surface (topk_bm25f, query strings) works over crawled
  captions.
"""

import os

import pyarrow.parquet as pq
import pytest

from distributed_web_crawling_system_ray.api import crawl_cached
from distributed_web_crawling_system_ray.pipelines.search import tokenize
from distributed_web_crawling_system_ray.pipelines.search_index import (
    SearchIndex,
    index_crawl_payload,
)
from distributed_web_crawling_system_ray.sources.storage import payload_files


@pytest.fixture(scope="module")
def crawl_payload(ray_session):
    res = crawl_cached("t1")
    return res.out_dir


def _captions(out_dir: str) -> dict[int, str]:
    caps: dict[int, str] = {}
    for f in payload_files(out_dir):
        t = pq.read_table(f, columns=["image_id", "caption"])
        for iid, cap in zip(
            t.column("image_id").to_pylist(), t.column("caption").to_pylist()
        ):
            caps[int(iid[:15], 16)] = cap
    return caps


def test_payload_captions_indexed_and_searchable(
    ray_session, crawl_payload, tmp_path
):
    caps = _captions(crawl_payload)
    assert caps  # non-vacuous: the t1 crawl produced images
    idx = index_crawl_payload(crawl_payload, str(tmp_path / "idx"))
    assert idx.meta["live_docs"] == len(caps)

    # posting truth for a token that appears in some (not all) captions
    from collections import Counter

    tok_counts = Counter(
        t for cap in caps.values() for t in set(tokenize(cap))
    )
    token = next(
        t for t, n in tok_counts.most_common() if 0 < n < len(caps)
    )
    want = sorted(d for d, cap in caps.items() if token in tokenize(cap))
    got = sorted(idx.and_terms([token]).column("doc_id").to_pylist())
    assert got == want

    # ranked search over captions returns stored fields
    top = idx.topk_bm25f([token], k=5)
    assert top.num_rows == 5
    assert top.column("domain").to_pylist()[0] == "crawl"
    q = idx.search(f"content:{token}", k=3)
    assert set(q.column("doc_id").to_pylist()) <= set(want)


def test_reindex_same_payload_upserts(ray_session, crawl_payload, tmp_path):
    d = str(tmp_path / "idx2")
    idx = index_crawl_payload(crawl_payload, d)
    n = idx.meta["live_docs"]
    gens = len(idx.meta["generations"])
    total_dl = idx.meta["total_dl"]
    # a re-crawl re-submits every document: update_document semantics —
    # same live set, one more generation, scoring state unchanged
    idx2 = index_crawl_payload(crawl_payload, d)
    assert idx2.meta["live_docs"] == n
    assert len(idx2.meta["generations"]) == gens + 1
    assert idx2.meta["total_dl"] == total_dl
