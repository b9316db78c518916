"""Persistent incremental search index (reference: Whoosh update_document
upsert-by-key across crawler submissions, indexer/indexer_node.py:83-106).

Contract under test:
- build from submission 1, query; update with submission 2 (new docs + some
  RE-submitted doc_ids with changed text); queries reflect the latest text
  per doc_id WITHOUT a full rebuild (the gen-1 files are untouched).
- index-backed queries equal the direct one-pass pipeline over the merged
  "current" corpus (latest text per doc_id) — the oracle relation.
- the distributed overlap path (driver_id_limit=0) produces the same index.
- compaction folds generations and preserves every query result.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributed_web_crawling_system_ray.pipelines import search
from distributed_web_crawling_system_ray.pipelines.search_index import SearchIndex

TERMS = list(search.QUERY_TERMS)


def _docs_table(rows: dict[int, str]) -> pa.Table:
    ids = sorted(rows)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([rows[i] for i in ids], pa.string()),
        }
    )


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    vocab = [
        "customer", "join", "window", "stream", "table", "query", "index",
        "crawl", "page", "robots", "the", "a", "of", "data",
    ]
    sub1 = {
        i: " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
        for i in range(60)
    }
    # submission 2: 20 brand-new docs + 15 RE-submitted ids with CHANGED text
    sub2 = {
        i: " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
        for i in range(60, 80)
    }
    for i in range(10, 25):
        sub2[i] = "customer " * (i % 4) + " ".join(
            rng.choice(vocab, size=rng.integers(5, 30))
        )
    merged = dict(sub1)
    merged.update(sub2)
    return sub1, sub2, merged


def _direct_over(tmp_path, rows: dict[int, str], name: str):
    """Direct (non-indexed) pipeline results over a corpus snapshot — the
    ground truth the index must reproduce."""
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    pq.write_table(_docs_table(rows), str(d / "documents.parquet"))
    sf = str(d)
    return (
        search.search_topk(sf),
        search.search_and_terms(sf),
        search.search_term_df(sf),
    )


def _assert_index_matches(idx: SearchIndex, want, k=search.TOP_K):
    topk, and_t, df = want
    got_topk = idx.topk(TERMS, k)
    assert got_topk.equals(topk)
    got_and = idx.and_terms(TERMS)
    assert sorted(got_and.column("doc_id").to_pylist()) == sorted(
        and_t.column("doc_id").to_pylist()
    )
    got_df = {
        t: d
        for t, d in zip(
            idx.term_df().column("term").to_pylist(),
            idx.term_df().column("df").to_pylist(),
        )
    }
    want_df = {
        t: d
        for t, d in zip(df.column("term").to_pylist(), df.column("df").to_pylist())
    }
    assert got_df == want_df


def test_incremental_update_reflects_latest_text(ray_session, tmp_path, corpus):
    sub1, sub2, merged = corpus
    idx = SearchIndex.create(str(tmp_path / "idx"))
    idx.update(_docs_table(sub1))
    # initial build answers like the direct pipeline over submission 1
    _assert_index_matches(idx, _direct_over(tmp_path, sub1, "snap1"))
    gen0_postings = sorted(
        os.listdir(os.path.join(idx.index_dir, "gen=0", "postings"))
    )
    gen0_mtimes = {
        f: os.path.getmtime(os.path.join(idx.index_dir, "gen=0", "postings", f))
        for f in gen0_postings
    }

    stats = idx.update(_docs_table(sub2))
    assert stats["n_docs"] == len(sub2)
    assert stats["n_upserts"] == 15  # the re-submitted ids
    assert idx.meta["live_docs"] == len(merged)
    # incremental: generation-0 files were NOT rewritten (no full rebuild)
    for f, m in gen0_mtimes.items():
        assert (
            os.path.getmtime(os.path.join(idx.index_dir, "gen=0", "postings", f))
            == m
        )
    # queries now reflect the merged corpus (latest text per doc_id)
    _assert_index_matches(idx, _direct_over(tmp_path, merged, "snap2"))


def test_distributed_overlap_path_matches(ray_session, tmp_path, corpus):
    sub1, sub2, merged = corpus
    idx = SearchIndex.create(str(tmp_path / "idx_dist"), driver_id_limit=0)
    idx.update(_docs_table(sub1))
    stats = idx.update(_docs_table(sub2))
    assert stats["n_upserts"] == 15
    assert idx.meta["live_docs"] == len(merged)
    _assert_index_matches(idx, _direct_over(tmp_path, merged, "snap3"))


def test_compact_preserves_queries(ray_session, tmp_path, corpus):
    sub1, sub2, merged = corpus
    idx = SearchIndex.create(str(tmp_path / "idx_c"))
    idx.update(_docs_table(sub1))
    idx.update(_docs_table(sub2))
    before = (
        idx.topk(TERMS),
        sorted(idx.and_terms(TERMS).column("doc_id").to_pylist()),
        idx.term_df().sort_by("term"),
    )
    out = idx.compact()
    assert out["compacted"] and len(idx.meta["generations"]) == 1
    assert idx.meta["live_docs"] == len(merged)
    assert idx._last_gen_map() == {}  # supersede map emptied
    assert idx.topk(TERMS).equals(before[0])
    assert sorted(idx.and_terms(TERMS).column("doc_id").to_pylist()) == before[1]
    assert idx.term_df().sort_by("term").equals(before[2])
    # reopen from disk: the commit is durable
    idx2 = SearchIndex.open(idx.index_dir)
    assert idx2.topk(TERMS).equals(before[0])


def test_distributed_topk_path_matches_driver_fold(ray_session, tmp_path, corpus):
    """Stopword-scale scoring path (groupby(doc_id) + local top-k + merge,
    forced via driver_row_limit=0) returns exactly the driver-fold result —
    including a high-df term so many docs match."""
    sub1, sub2, merged = corpus
    idx = SearchIndex.create(str(tmp_path / "idx_dtk"))
    idx.update(_docs_table(merged))
    for terms in (TERMS, ["the", "data"], ["customer"]):
        a = idx.topk(terms, k=10)
        b = idx.topk(terms, k=10, driver_row_limit=0)
        assert a.equals(b), terms
        c = idx.and_terms(terms)
        d = idx.and_terms(terms, driver_row_limit=0)
        assert c.column("doc_id").to_pylist() == d.column("doc_id").to_pylist()


def test_stemmed_index_matches_both_sides(ray_session, tmp_path):
    """A stem=True index stems document tokens at build time and query terms
    at query time (the v3 StemmingAnalyzer contract) — inflected variants
    match; an unstemmed index does not match them (r3 review: stemming only
    the query against an unstemmed index silently missed everything)."""
    rows = {
        1: "joining customers windows",
        2: "join customer window",
        3: "nothing relevant at all",
    }
    stemmed = SearchIndex.create(str(tmp_path / "idx_stem"), stem=True)
    stemmed.update(_docs_table(rows))
    plain = SearchIndex.create(str(tmp_path / "idx_plain"))
    plain.update(_docs_table(rows))
    q = ["customer", "join", "window"]  # raw terms; the index preps them
    assert sorted(
        stemmed.and_terms(q).column("doc_id").to_pylist()
    ) == [1, 2]
    assert plain.and_terms(q).column("doc_id").to_pylist() == [2]
    t = stemmed.topk(q, k=3)
    by_doc = dict(zip(t.column("doc_id").to_pylist(), t.column("score").to_pylist()))
    assert by_doc[1] > 0 and by_doc[2] > 0 and by_doc[3] == 0
    # inflected QUERY terms stem to the same stems and match too
    assert sorted(
        stemmed.and_terms(["customers", "joins", "windows"])
        .column("doc_id")
        .to_pylist()
    ) == [1, 2]


def test_stemmed_index_equals_direct_stemmed_pipeline(ray_session, tmp_path):
    """A stem=True index over the sf0.001 corpus reproduces
    search_topk_stemmed (the oracle-green direct pipeline) exactly — the
    two v3-contract implementations cannot drift."""
    sf = "/root/testdata/sf0.001"
    direct = search.search_topk_stemmed(sf)
    idx = SearchIndex.create(str(tmp_path / "idx_v3"), stem=True)
    idx.update(sf + "/documents.parquet")
    got = idx.topk(list(search.QUERY_TERMS), search.TOP_K)
    assert got.equals(direct)


def test_within_submission_duplicate_doc_ids_collapse(ray_session, tmp_path):
    """Duplicate doc_ids in ONE submission collapse to a single row
    (deterministic content-hash tiebreak) — without this, duplicate
    same-generation postings broke AND counts and double-counted tf."""
    import pyarrow as pa

    idx = SearchIndex.create(str(tmp_path / "idx_dup"))
    tbl = pa.table(
        {
            "doc_id": pa.array([7, 7, 8], pa.int64()),
            "text": pa.array(
                ["customer join window", "customer join window", "customer join"],
                pa.string(),
            ),
        }
    )
    stats = idx.update(tbl)
    assert stats["n_docs"] == 2 and idx.meta["live_docs"] == 2
    assert idx.and_terms(TERMS).column("doc_id").to_pylist() == [7]
    t = idx.topk(TERMS, k=2)
    by_doc = dict(zip(t.column("doc_id").to_pylist(), t.column("score").to_pylist()))
    # tf counted once, not doubled: doc 7's tf vector is (1,1,1)
    df = idx.query_df(list(TERMS))
    n = idx.meta["live_docs"]
    from distributed_web_crawling_system_ray.pipelines.search import IDF_SCALE

    want7 = sum((n * IDF_SCALE) // df[q] for q in TERMS)
    assert by_doc[7] == want7


def test_zero_match_query_pads_with_ascending_ids(ray_session, tmp_path):
    rows = {i: "alpha beta gamma" for i in range(5)}
    idx = SearchIndex.create(str(tmp_path / "idx_z"))
    idx.update(_docs_table(rows))
    t = idx.topk(["nosuchterm"], k=3)
    assert t.column("doc_id").to_pylist() == [0, 1, 2]
    assert t.column("score").to_pylist() == [0, 0, 0]
    assert t.column("snippet").to_pylist() == ["alpha beta gamma"] * 3


def test_update_from_parquet_directory(ray_session, tmp_path):
    """A directory of parquet files is a valid ``update()`` source (r4
    advice: the source-column probe must not assume a single file)."""
    d = tmp_path / "docs_dir"
    d.mkdir()
    pq.write_table(
        _docs_table({0: "customer join window", 1: "alpha beta"}),
        str(d / "part_0.parquet"),
    )
    pq.write_table(
        _docs_table({2: "window window join", 3: "gamma delta"}),
        str(d / "part_1.parquet"),
    )
    idx = SearchIndex.create(str(tmp_path / "idx_dir"))
    st = idx.update(str(d))
    assert st["n_docs"] == 4
    assert idx.meta["live_docs"] == 4
    assert sorted(idx.and_terms(["join", "window"]).column("doc_id").to_pylist()) == [0, 2]


def test_vocabulary_sidecar_and_fallback(ray_session, tmp_path, corpus):
    """update() writes per-partition vocab sidecars (wildcard expansion
    domain); _vocabulary equals the distinct indexed terms, survives
    compaction, and falls back to the postings' term column for a
    generation written without sidecars (pre-vocab format)."""
    import os
    import shutil

    sub1 = corpus[0]
    idx = SearchIndex.create(str(tmp_path / "idx_vocab"))
    idx.update(_docs_table(sub1))
    want = sorted(
        {
            t
            for text in sub1.values()
            for t in search._TOKEN.findall(text.lower())
            + search._TOKEN.findall(text[: search.TITLE_CHARS].lower())
        }
    )
    assert list(idx._vocabulary()) == want
    assert idx._expand_wildcard("custom*") == [
        t for t in want if t.startswith("custom")
    ]
    # wildcard search answers from the sidecar
    got = idx.search("custom*", k=5)
    assert got.num_rows == 5

    # survives compaction (two generations -> one)
    idx.update(_docs_table({i: "zebra " + sub1[i] for i in range(3)}))
    idx.compact()
    assert "zebra" in set(idx._vocabulary())
    assert set(want) <= set(idx._vocabulary())

    # pre-vocab-format fallback: remove the sidecar dirs, clear the cache
    for e in idx.meta["generations"]:
        shutil.rmtree(
            os.path.join(idx._gen_dir(e["gen"]), "vocab"), ignore_errors=True
        )
    idx._vocab_cache = None
    assert "zebra" in set(idx._vocabulary())
    assert set(want) <= set(idx._vocabulary())
