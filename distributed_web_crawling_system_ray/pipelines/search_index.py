"""Persistent, incrementally-updatable inverted index over parquet.

Rebuilds the reference's on-disk Whoosh index contract
(``indexer/indexer_node.py:83-106``: ``update_document`` upserts-by-key as
crawler submissions arrive; the index is built once and queried many times,
and new crawl rounds update it incrementally without a full rebuild) —
Ray-Data-first, as a **generation-segmented, hash-partitioned parquet
postings store** (the Lucene/Whoosh segment idea re-expressed as Dataset
writes):

    index_dir/
      meta.json                      (commit record: generations, live count)
      gen=G/postings/part_P.parquet  (term, doc_id, tf, gen) — P = hash(term) % n_parts
      gen=G/docs/dpart_P.parquet     (doc_id, n_tokens, snippet, gen) — P = doc_id % n_dparts
      gen=G/doc_ids.parquet          (this submission's doc ids)
      gen=G/superseded.parquet       (ids re-indexed by G — their OLDER
                                      postings/doc rows are dead)

Upsert semantics: each ``update()`` call writes one new generation; a doc_id
present in an earlier generation is *superseded* — query-time readers keep a
row only when ``row.gen >= last_gen(doc_id)``.  The supersede map is bounded
by the number of RE-indexed docs (re-crawled pages), not the corpus;
``compact()`` folds all generations into one and empties it.

Scale shape:
- index build is one tokenize pass -> vocabulary-partitioned shuffle
  (``groupby(hash(term) % n_parts)``) -> one deterministic file per
  partition (idempotent under task retry: same name, atomic replace).
- term queries (topk / AND) read ONLY the partitions that can contain the
  query terms — Q hash buckets out of n_parts, across generations — never
  the corpus and never the text column (snippets are stored at index time,
  fetched by doc-partition-pruned reads for the k winners only).
- the per-term df pass and the per-doc score ``groupby(doc_id)`` operate on
  those pruned rows (Σ df(term) rows), the classic query-cost bound of an
  inverted index.
- overlap detection on update is a hash-partitioned intersection above
  ``driver_id_limit`` (a Dataset groupby path, pytest-forced at limit=0);
  driver-side ``np.isin`` below it.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from distributed_web_crawling_system_ray.pipelines.search import (
    _TOKEN,
    _stem,
    bm25f_contrib_vec,
    derive_crawl_date,
    derive_url,
    parse_query,
    BOOST_TITLE,
    IDF_SCALE,
    SNIPPET_CHARS,
    TITLE_CHARS,
    Wildcard,
)


def _runs_by_term(parts: list):
    """(term, rows) runs over concatenated posting parts: one sort by term,
    then boundary slices — O(rows log rows) total regardless of how many
    distinct terms a wildcard expansion produced."""
    if not parts:
        return
    tbl = pa.concat_tables(parts).sort_by("term")
    if tbl.num_rows == 0:
        return
    terms = np.asarray(tbl.column("term").to_pylist(), dtype=object)
    chg = np.flatnonzero(terms[1:] != terms[:-1]) + 1
    starts = np.concatenate([[0], chg])
    ends = np.concatenate([chg, [len(terms)]])
    for s0, e0 in zip(starts, ends):
        yield terms[s0], tbl.slice(s0, e0 - s0)


def _write_vocab_sidecar(group: pa.Table, gen_dir: str, part: int) -> None:
    """One postings partition's vocabulary sidecar: its distinct terms —
    the wildcard-expansion domain (vocab-sized, never index-sized).  The
    ONE writer shared by update() and compact() so the sidecar format
    cannot drift between fresh and merged generations."""
    _atomic_write_table(
        pa.table({"term": pc.unique(group.column("term"))}),
        os.path.join(gen_dir, "vocab", f"v_{part:05d}.parquet"),
    )


def _term_part(term: str, n_parts: int) -> int:
    """Stable term -> partition hash (md5 low bits; Python hash() is salted
    per process and would scatter a term across partitions between runs)."""
    import hashlib

    return int.from_bytes(
        hashlib.md5(term.encode("utf-8")).digest()[:4], "big"
    ) % n_parts


def _atomic_write_table(tbl: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


def _adjacent_count(pos_lists: list[list[int]]) -> int:
    """Number of phrase START positions: ``p`` such that ``p + i`` appears
    in ``pos_lists[i]`` for every constituent ``i`` — the positional-
    postings intersection at the heart of phrase matching (Whoosh/Lucene
    PhraseQuery semantics over within-field token positions)."""
    if any(not pl for pl in pos_lists):
        return 0
    starts = set(pos_lists[0])
    for i in range(1, len(pos_lists)):
        starts &= {p - i for p in pos_lists[i]}
        if not starts:
            return 0
    return len(starts)


class SearchIndex:
    """Handle over one on-disk index.  ``build``/``open`` + ``update`` +
    query surface (``topk`` / ``and_terms`` / ``term_df``)."""

    def __init__(self, index_dir: str, meta: dict):
        self.index_dir = index_dir
        self.meta = meta
        self._lg_cache: dict[int, int] | None = None  # supersede map cache
        self._vocab_cache: np.ndarray | None = None  # sorted distinct terms

    # ------------------------------------------------------------ lifecycle

    @classmethod
    def create(
        cls,
        index_dir: str,
        n_parts: int = 32,
        n_dparts: int = 16,
        driver_id_limit: int = 2_000_000,
        stem: bool = False,
    ) -> "SearchIndex":
        """``stem=True`` builds a STEMMED index (the v3 StemmingAnalyzer
        contract): document tokens stem at index time and query terms stem
        at query time — both sides, exactly once, like Whoosh."""
        if os.path.isdir(index_dir):
            shutil.rmtree(index_dir)
        os.makedirs(index_dir)
        meta = {
            "n_parts": n_parts,
            "n_dparts": n_dparts,
            "driver_id_limit": driver_id_limit,
            "stem": stem,
            # postings carry per-field token positions (phrase support);
            # False on indexes built by pre-r5 code — phrase queries on
            # those raise instead of mis-answering
            "positions": True,
            "generations": [],
            "live_docs": 0,
            # Σ dl over LIVE docs (BM25F's N*avgdl) — maintained exactly
            # across upserts so scoring never needs a corpus scan
            "total_dl": 0,
        }
        idx = cls(index_dir, meta)
        idx._write_meta()
        return idx

    @classmethod
    def open(cls, index_dir: str) -> "SearchIndex":
        with open(os.path.join(index_dir, "meta.json")) as f:
            return cls(index_dir, json.load(f))

    def _write_meta(self) -> None:
        tmp = os.path.join(self.index_dir, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, os.path.join(self.index_dir, "meta.json"))

    def _gen_dir(self, g: int) -> str:
        return os.path.join(self.index_dir, f"gen={g}")

    # --------------------------------------------------------------- update

    def update(self, docs) -> dict:
        """Index one submission (upsert-by-doc_id) as a new generation.

        ``docs``: a Dataset / Arrow table / parquet path with columns
        (doc_id:int64, text:string[, source:string]).  Reference semantics:
        Whoosh ``update_document`` per result batch
        (indexer/indexer_node.py:83-106) — a re-submitted doc_id replaces its
        previous postings.  ``source`` (when present) becomes the stored
        ``domain`` field (the reference derives domain from the url,
        indexer_node.py:89); absent, domain stores "unknown" — the
        reference's own fallback (``result.get("domain", "unknown")``).
        """
        if isinstance(docs, str):
            # pyarrow.dataset resolves both a single parquet file and a
            # directory of parquet files for the source-column probe (r4
            # advice: pq.read_schema only accepts a single file)
            import pyarrow.dataset as pads

            names = pads.dataset(docs, format="parquet").schema.names
            cols = [c for c in ("doc_id", "text", "source") if c in names]
            docs = ray.data.read_parquet(docs, columns=cols)
        elif isinstance(docs, pa.Table):
            cols = [
                c for c in ("doc_id", "text", "source") if c in docs.column_names
            ]
            docs = ray.data.from_arrow(docs.select(cols))
        g = (
            self.meta["generations"][-1]["gen"] + 1
            if self.meta["generations"]
            else 0
        )
        gd = self._gen_dir(g)
        if os.path.isdir(gd):  # uncommitted leftovers from a crashed update
            shutil.rmtree(gd)
        os.makedirs(os.path.join(gd, "postings"))
        os.makedirs(os.path.join(gd, "docs"))
        os.makedirs(os.path.join(gd, "vocab"))
        n_parts = self.meta["n_parts"]
        n_dparts = self.meta["n_dparts"]
        stem = bool(self.meta.get("stem", False))

        docs_mat = docs.materialize()
        # this submission's ids (ids only, 8 B/doc like the crawl admission
        # path) — pulled FIRST so within-submission duplicate doc_ids can be
        # detected and collapsed before any postings are built (r3 review:
        # duplicate same-generation postings both pass the live filter,
        # breaking AND counts and double-counting tf)
        id_parts = [
            t
            for t in ray.get(
                docs_mat.select_columns(["doc_id"]).materialize().to_arrow_refs()
            )
            if t.num_rows
        ]
        all_ids = (
            np.concatenate(
                [t.column("doc_id").to_numpy(zero_copy_only=False) for t in id_parts]
            )
            if id_parts
            else np.zeros(0, dtype=np.int64)
        )
        new_ids = np.unique(all_ids)
        if len(new_ids) != len(all_ids):
            docs_mat = self._collapse_submission_dups(docs_mat)

        # one tokenize pass -> postings rows (term, doc_id, tf, tf_title,
        # dl, pos, pos_title) + per-doc stored-field rows; both leave the
        # worker as Arrow, the text column never does.  ``tf`` is the
        # content (full-text) term frequency — v1 TF-IDF queries filter
        # tf>0 so a title-only term (e.g. a token truncated at the title
        # cut) never perturbs them; BM25F uses all rows (tf_w =
        # BOOST_TITLE*tf_title + tf > 0 by construction).  ``dl`` (the
        # BM25F weighted doc length) is DENORMALIZED into every posting row
        # so scoring needs no second read — the impact-ordered-index trade:
        # +8 B/row for a postings-only query path.  ``pos``/``pos_title``
        # are the term's token positions in each field — the positional
        # postings that make PHRASE queries answerable from the index (the
        # Lucene/Whoosh positions trade: the standard ~2-4x postings bytes
        # for exact adjacency match); non-phrase queries never read them
        # (column-pruned, see _pruned_postings).
        def explode(batch: pa.Table) -> pa.Table:
            terms: list[str] = []
            dids: list[int] = []
            tfs: list[int] = []
            tfts: list[int] = []
            dls: list[int] = []
            poss: list[list[int]] = []
            tposs: list[list[int]] = []
            for did, text in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                ctoks = _TOKEN.findall(text.lower())
                ttoks = _TOKEN.findall(text[:TITLE_CHARS].lower())
                if stem:
                    ctoks = [_stem(t) for t in ctoks]
                    ttoks = [_stem(t) for t in ttoks]
                cpos: dict[str, list[int]] = {}
                tpos: dict[str, list[int]] = {}
                for p, tok in enumerate(ctoks):
                    cpos.setdefault(tok, []).append(p)
                for p, tok in enumerate(ttoks):
                    tpos.setdefault(tok, []).append(p)
                dl = BOOST_TITLE * len(ttoks) + len(ctoks)
                union = cpos.keys() | tpos.keys()
                terms.extend(union)
                dids.extend([did] * len(union))
                for t in union:
                    cp = cpos.get(t, [])
                    tp = tpos.get(t, [])
                    tfs.append(len(cp))
                    tfts.append(len(tp))
                    poss.append(cp)
                    tposs.append(tp)
                dls.extend([dl] * len(union))
            part = np.fromiter(
                (_term_part(t, n_parts) for t in terms),
                dtype=np.int32,
                count=len(terms),
            )
            return pa.table(
                {
                    "term": pa.array(terms, pa.string()),
                    "doc_id": pa.array(dids, pa.int64()),
                    "tf": pa.array(tfs, pa.int64()),
                    "tf_title": pa.array(tfts, pa.int64()),
                    "dl": pa.array(dls, pa.int64()),
                    "pos": pa.array(poss, pa.list_(pa.int32())),
                    "pos_title": pa.array(tposs, pa.list_(pa.int32())),
                    "part": pa.array(part, pa.int32()),
                }
            )

        def doc_rows(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            has_src = "source" in batch.column_names
            srcs = (
                batch.column("source").to_pylist()
                if has_src
                else ["unknown"] * len(ids)
            )
            n_tok = [len(_TOKEN.findall(t.lower())) for t in texts]
            n_ttok = [
                len(_TOKEN.findall(t[:TITLE_CHARS].lower())) for t in texts
            ]
            dl = [BOOST_TITLE * a + b for a, b in zip(n_ttok, n_tok)]
            snip = [t[:SNIPPET_CHARS] for t in texts]
            dpart = (np.asarray(ids, dtype=np.int64) % n_dparts).astype(np.int32)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_tokens": pa.array(n_tok, pa.int64()),
                    "dl": pa.array(dl, pa.int64()),
                    "snippet": pa.array(snip, pa.string()),
                    # stored result fields (the Whoosh schema's stored=True
                    # set, indexer/indexer_node.py:63-70)
                    "title": pa.array(
                        [t[:TITLE_CHARS] for t in texts], pa.string()
                    ),
                    "domain": pa.array(srcs, pa.string()),
                    "crawl_date": pa.array(
                        [derive_crawl_date(int(d)) for d in ids], pa.string()
                    ),
                    "dpart": pa.array(dpart, pa.int32()),
                }
            )

        def _write_group(dir_name: str, name_prefix: str, key: str, vocab: bool = False):
            def write(group: pa.Table) -> pa.Table:
                p = int(group.column(key)[0].as_py())
                out = group.drop_columns([key]).append_column(
                    "gen", pa.array(np.full(group.num_rows, g, np.int32))
                )
                # deterministic filename + atomic replace: a Ray task retry
                # rewrites the identical file instead of duplicating rows
                _atomic_write_table(
                    out, os.path.join(gd, dir_name, f"{name_prefix}_{p:05d}.parquet")
                )
                if vocab:
                    _write_vocab_sidecar(group, gd, p)
                return pa.table({"n": pa.array([group.num_rows], pa.int64())})

            return write

        (
            docs_mat.map_batches(explode, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                _write_group("postings", "part", "part", vocab=True),
                batch_format="pyarrow",
            )
            .materialize()
        )
        (
            docs_mat.map_batches(doc_rows, batch_format="pyarrow")
            .groupby("dpart")
            .map_groups(_write_group("docs", "dpart", "dpart"), batch_format="pyarrow")
            .materialize()
        )

        _atomic_write_table(
            pa.table({"doc_id": pa.array(new_ids, pa.int64())}),
            os.path.join(gd, "doc_ids.parquet"),
        )

        # ---- supersede detection: which of new_ids already live in the
        # index?  (their older postings become dead).  Driver np.isin under
        # driver_id_limit; hash-partitioned Dataset intersection above it.
        prior_files = [
            os.path.join(self._gen_dir(e["gen"]), "doc_ids.parquet")
            for e in self.meta["generations"]
        ]
        overlap = np.zeros(0, dtype=np.int64)
        if prior_files and len(new_ids):
            total_prior = sum(e["n_docs"] for e in self.meta["generations"])
            if total_prior <= self.meta["driver_id_limit"]:
                prior = np.concatenate(
                    [
                        pq.read_table(f).column("doc_id").to_numpy(
                            zero_copy_only=False
                        )
                        for f in prior_files
                    ]
                )
                overlap = new_ids[np.isin(new_ids, prior)]
            else:
                overlap = self._distributed_overlap(prior_files, gd)
        _atomic_write_table(
            pa.table({"doc_id": pa.array(np.unique(overlap), pa.int64())}),
            os.path.join(gd, "superseded.parquet"),
        )

        # total_dl delta: + this submission's dl sum, - the superseded docs'
        # OLD dl (dpart-pruned read bounded by n_superseded, not the corpus)
        new_dl = 0
        ddir = os.path.join(gd, "docs")
        for fn in os.listdir(ddir):
            col = pq.read_table(os.path.join(ddir, fn), columns=["dl"]).column("dl")
            new_dl += int(pc.sum(col).as_py() or 0)
        old_dl = self._dl_of_ids(np.unique(overlap)) if len(overlap) else 0

        # commit: meta lists the generation only after every file is final
        self._lg_cache = None
        self._vocab_cache = None
        self.meta["generations"].append(
            {"gen": g, "n_docs": int(len(new_ids)), "n_superseded": int(len(overlap))}
        )
        self.meta["live_docs"] = int(
            self.meta["live_docs"] + len(new_ids) - len(np.unique(overlap))
        )
        self.meta["total_dl"] = int(
            self.meta.get("total_dl", 0) + new_dl - old_dl
        )
        self._write_meta()
        return {"gen": g, "n_docs": int(len(new_ids)), "n_upserts": int(len(overlap))}

    def _dl_of_ids(self, ids: np.ndarray) -> int:
        """Σ dl of the CURRENTLY-LIVE rows for ``ids`` (the rows a pending
        supersede is about to kill): dpart-pruned docs reads, max-gen row
        per id across the COMMITTED generations."""
        if not len(ids):
            return 0
        idset = set(int(i) for i in ids)
        parts = {int(i) % self.meta["n_dparts"] for i in ids}
        best: dict[int, tuple[int, int]] = {}  # id -> (gen, dl)
        for f in self._all_files("docs", parts):
            t = pq.read_table(f, columns=["doc_id", "dl", "gen"])
            for d, dl, g in zip(
                t.column("doc_id").to_numpy(zero_copy_only=False),
                t.column("dl").to_numpy(zero_copy_only=False),
                t.column("gen").to_numpy(zero_copy_only=False),
            ):
                di = int(d)
                if di in idset and (di not in best or int(g) > best[di][0]):
                    best[di] = (int(g), int(dl))
        return sum(dl for _, dl in best.values())

    def _collapse_submission_dups(self, docs_mat) -> "ray.data.Dataset":
        """One row per doc_id WITHIN a submission (Whoosh update_document is
        last-write-wins per call; a distributed batch has no defined row
        order, so the collapse keeps the row with the lexicographically
        largest md5(text) — deterministic and content-based).  Runs only
        when duplicate ids were actually detected."""
        import hashlib as _hl

        P = self.meta["n_dparts"]

        def add_part(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "cpart", pa.array((ids % P).astype(np.int32), pa.int32())
            )

        def collapse(group: pa.Table) -> pa.Table:
            ids = group.column("doc_id").to_numpy(zero_copy_only=False)
            if len(np.unique(ids)) == len(ids):
                return group.drop_columns(["cpart"])
            texts = group.column("text").to_pylist()
            th = np.asarray([_hl.md5(t.encode("utf-8")).hexdigest() for t in texts])
            # sort (doc_id asc, text-hash asc); the LAST row of each id run
            # holds the max hash — keep it
            order = np.lexsort((th, ids))
            _, first_idx = np.unique(ids[order], return_index=True)
            last_idx = np.r_[first_idx[1:], len(ids)] - 1
            keep = np.sort(order[last_idx])
            return group.take(pa.array(keep, pa.int64())).drop_columns(["cpart"])

        return (
            docs_mat.map_batches(add_part, batch_format="pyarrow")
            .groupby("cpart")
            .map_groups(collapse, batch_format="pyarrow")
        ).materialize()

    def _prep_terms(self, terms: list) -> list:
        """Query terms stem iff the index was built stemmed — both sides of
        the match transform identically, the Whoosh contract.  A PHRASE
        (tuple of tokens) stems each constituent; a WILDCARD pattern never
        stems — it expands against the (already-stemmed) vocabulary."""
        if self.meta.get("stem", False):
            return [
                t
                if isinstance(t, Wildcard)
                else tuple(_stem(x) for x in t)
                if isinstance(t, tuple)
                else _stem(t)
                for t in terms
            ]
        return list(terms)

    def _distributed_overlap(self, prior_files: list[str], gd: str) -> np.ndarray:
        """new_ids ∩ prior_ids without driver-side id sets: tag, hash-
        partition by doc_id, intersect per partition."""
        P = self.meta["n_dparts"]

        def tag(flag: int):
            def f(batch: pa.Table) -> pa.Table:
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "doc_id": batch.column("doc_id"),
                        "is_new": pa.array(
                            np.full(len(ids), flag, np.int8), pa.int8()
                        ),
                        "part": pa.array(
                            (ids % P).astype(np.int32), pa.int32()
                        ),
                    }
                )

            return f

        old_ds = ray.data.read_parquet(prior_files).map_batches(
            tag(0), batch_format="pyarrow"
        )
        new_ds = ray.data.read_parquet(
            os.path.join(gd, "doc_ids.parquet")
        ).map_batches(tag(1), batch_format="pyarrow")

        def intersect(group: pa.Table) -> pa.Table:
            flags = group.column("is_new").to_numpy(zero_copy_only=False)
            ids = group.column("doc_id").to_numpy(zero_copy_only=False)
            both = np.intersect1d(ids[flags == 1], ids[flags == 0])
            return pa.table({"doc_id": pa.array(both, pa.int64())})

        out = (
            old_ds.union(new_ds)
            .groupby("part")
            .map_groups(intersect, batch_format="pyarrow")
        ).materialize()
        parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        return (
            np.concatenate(
                [t.column("doc_id").to_numpy(zero_copy_only=False) for t in parts]
            )
            if parts
            else np.zeros(0, dtype=np.int64)
        )

    # ------------------------------------------------------------- compact

    def compact(self) -> dict:
        """Fold all generations into one (drop superseded rows) — the
        Whoosh/Lucene segment-merge analog.  Bounds the per-query generation
        fan-in and empties the supersede map."""
        gens = [e["gen"] for e in self.meta["generations"]]
        if len(gens) <= 1:
            return {"generations": len(gens), "compacted": False}
        last_gen = self._last_gen_map()
        lg_ref = ray.put(last_gen)
        new_g = gens[-1] + 1
        gd = self._gen_dir(new_g)
        if os.path.isdir(gd):
            shutil.rmtree(gd)
        os.makedirs(os.path.join(gd, "postings"))
        os.makedirs(os.path.join(gd, "docs"))
        os.makedirs(os.path.join(gd, "vocab"))
        n_parts = self.meta["n_parts"]

        def live_filter(batch: pa.Table) -> pa.Table:
            from distributed_web_crawling_system_ray.stages.cache import get_object

            lg = get_object(lg_ref)
            if not lg or batch.num_rows == 0:
                return batch
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            gen = batch.column("gen").to_numpy(zero_copy_only=False)
            keep = np.fromiter(
                (g >= lg.get(int(i), 0) for i, g in zip(ids, gen)),
                dtype=bool,
                count=len(ids),
            )
            return batch.filter(pa.array(keep, pa.bool_()))

        def rewrite(dir_name: str, key_col: str, key_of):
            files = self._all_files(dir_name)
            if not files:
                return
            ds = ray.data.read_parquet(files).map_batches(
                live_filter, batch_format="pyarrow"
            )

            def add_part(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    key_col,
                    pa.array(key_of(batch), pa.int32()),
                )

            def write(group: pa.Table) -> pa.Table:
                p = int(group.column(key_col)[0].as_py())
                out = group.drop_columns([key_col, "gen"]).append_column(
                    "gen", pa.array(np.full(group.num_rows, new_g, np.int32))
                )
                _atomic_write_table(
                    out,
                    os.path.join(gd, dir_name, f"{key_col}_{p:05d}.parquet"),
                )
                if dir_name == "postings":  # vocabulary sidecar survives merge
                    _write_vocab_sidecar(group, gd, p)
                return pa.table({"n": pa.array([group.num_rows], pa.int64())})

            (
                ds.map_batches(add_part, batch_format="pyarrow")
                .groupby(key_col)
                .map_groups(write, batch_format="pyarrow")
                .materialize()
            )

        rewrite(
            "postings",
            "part",
            lambda b: np.fromiter(
                (_term_part(t, n_parts) for t in b.column("term").to_pylist()),
                dtype=np.int32,
                count=b.num_rows,
            ),
        )
        rewrite(
            "docs",
            "dpart",
            lambda b: (
                b.column("doc_id").to_numpy(zero_copy_only=False)
                % self.meta["n_dparts"]
            ).astype(np.int32),
        )

        # live ids + total_dl: read back from the rewritten docs partitions
        # (int columns only)
        ids = []
        new_total_dl = 0
        ddir = os.path.join(gd, "docs")
        for f in sorted(os.listdir(ddir)):
            t = pq.read_table(os.path.join(ddir, f), columns=["doc_id", "dl"])
            ids.append(t.column("doc_id").to_numpy(zero_copy_only=False))
            new_total_dl += int(pc.sum(t.column("dl")).as_py() or 0)
        all_ids = np.unique(np.concatenate(ids)) if ids else np.zeros(0, np.int64)
        _atomic_write_table(
            pa.table({"doc_id": pa.array(all_ids, pa.int64())}),
            os.path.join(gd, "doc_ids.parquet"),
        )
        _atomic_write_table(
            pa.table({"doc_id": pa.array([], pa.int64())}),
            os.path.join(gd, "superseded.parquet"),
        )
        old_dirs = [self._gen_dir(g) for g in gens]
        self._lg_cache = None
        self._vocab_cache = None
        self.meta["generations"] = [
            {"gen": new_g, "n_docs": int(len(all_ids)), "n_superseded": 0}
        ]
        self.meta["live_docs"] = int(len(all_ids))
        self.meta["total_dl"] = int(new_total_dl)
        self._write_meta()
        for d in old_dirs:  # safe after commit: meta no longer lists them
            shutil.rmtree(d, ignore_errors=True)
        return {"generations": 1, "compacted": True, "gen": new_g}

    # ------------------------------------------------------------- queries

    def _last_gen_map(self) -> dict[int, int]:
        """doc_id -> latest generation that re-indexed it.  Bounded by the
        number of UPSERTED docs (re-crawled pages), not the corpus; cached
        per handle and invalidated by update()/compact()."""
        if self._lg_cache is not None:
            return self._lg_cache
        out: dict[int, int] = {}
        for e in self.meta["generations"]:
            f = os.path.join(self._gen_dir(e["gen"]), "superseded.parquet")
            if os.path.exists(f):
                for d in pq.read_table(f).column("doc_id").to_pylist():
                    out[int(d)] = e["gen"]
        self._lg_cache = out
        return out

    def _all_files(self, dir_name: str, parts: set[int] | None = None) -> list[str]:
        files: list[str] = []
        prefix = "part" if dir_name == "postings" else "dpart"
        for e in self.meta["generations"]:
            d = os.path.join(self._gen_dir(e["gen"]), dir_name)
            if not os.path.isdir(d):
                continue
            if parts is None:
                files.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
            else:
                for p in sorted(parts):
                    f = os.path.join(d, f"{prefix}_{p:05d}.parquet")
                    if os.path.exists(f):
                        files.append(f)
        return files

    def _vocabulary(self) -> np.ndarray:
        """Sorted distinct indexed terms — the wildcard-expansion domain.

        Reads the per-generation ``vocab/`` sidecars (distinct terms per
        postings partition, written at index time — vocab-sized, never
        index-sized).  A generation written by a pre-vocab format falls back
        to the ``term`` column of its postings (column-pruned).  May include
        terms of superseded docs — a harmless over-expansion: their postings
        are live-filtered downstream, so they match nothing.  Cached per
        handle; invalidated by update()/compact()."""
        if self._vocab_cache is not None:
            return self._vocab_cache
        cols: list[np.ndarray] = []
        for e in self.meta["generations"]:
            gd = self._gen_dir(e["gen"])
            vd = os.path.join(gd, "vocab")
            src = (
                [os.path.join(vd, f) for f in sorted(os.listdir(vd))]
                if os.path.isdir(vd)
                else [
                    os.path.join(gd, "postings", f)
                    for f in sorted(os.listdir(os.path.join(gd, "postings")))
                ]
            )
            for f in src:
                if not f.endswith(".parquet"):
                    continue
                # unique per file BEFORE collecting: the fallback source is
                # the postings' term column (index-sized with duplicates);
                # only its distinct values may reach driver memory
                t = pc.unique(pq.read_table(f, columns=["term"]).column("term"))
                cols.append(np.asarray(t.to_pylist(), dtype=object))
        vocab = (
            np.unique(np.concatenate(cols))
            if cols
            else np.zeros(0, dtype=object)
        )
        self._vocab_cache = vocab
        return vocab

    def _expand_wildcard(self, pattern: str) -> list[str]:
        """Indexed terms matching a ``*``/``?`` pattern (Whoosh wildcard
        semantics: case-normalized, matched against the vocabulary)."""
        import fnmatch
        import re as _re

        rx = _re.compile(fnmatch.translate(pattern))
        return [t for t in self._vocabulary() if rx.match(t)]

    def _pruned_postings(
        self,
        terms: list[str],
        require_content_tf: bool = True,
        with_positions: bool = False,
    ) -> "ray.data.Dataset | None":
        """Dataset over ONLY the hash partitions that can hold ``terms``,
        filtered to the terms and to live (non-superseded) rows.

        ``require_content_tf`` (the default) additionally drops title-only
        rows (tf == 0): the v1 TF-IDF/AND/df queries are defined over
        full-text tokens and must not see a token that exists only as a
        title truncation.  BM25F passes False — it scores the field union.

        ``with_positions`` additionally reads the ``pos``/``pos_title``
        list columns (phrase queries only — they are the bulk of the
        postings bytes, so every other query path prunes them at the read).
        """
        n_parts = self.meta["n_parts"]
        parts = {_term_part(t, n_parts) for t in terms}
        files = self._all_files("postings", parts)
        if not files:
            return None
        columns = ["term", "doc_id", "tf", "tf_title", "dl", "gen"]
        if with_positions:
            columns += ["pos", "pos_title"]
        last_gen = self._last_gen_map()
        term_set = set(terms)

        def keep(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            m = pc.is_in(batch.column("term"), value_set=pa.array(sorted(term_set)))
            if require_content_tf:
                m = pc.and_(m, pc.greater(batch.column("tf"), 0))
            t = batch.filter(m)
            if last_gen and t.num_rows:
                ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                gen = t.column("gen").to_numpy(zero_copy_only=False)
                live = np.fromiter(
                    (g >= last_gen.get(int(i), 0) for i, g in zip(ids, gen)),
                    dtype=bool,
                    count=len(ids),
                )
                t = t.filter(pa.array(live, pa.bool_()))
            return t

        return (
            ray.data.read_parquet(files, columns=columns)
            .map_batches(keep, batch_format="pyarrow")
            .materialize()
        )

    def _matched_parts(self, terms: list[str]) -> list[pa.Table]:
        """The pruned, live postings rows for ``terms`` as driver-held
        Arrow parts — read ONCE per query and shared by the df and scoring
        passes (r3 review: topk used to run the partition read twice)."""
        ds = self._pruned_postings(terms)
        if ds is None:
            return []
        return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]

    @staticmethod
    def _df_from_parts(parts: list[pa.Table], terms: list[str]) -> dict[str, int]:
        out = {t: 0 for t in terms}
        for t in parts:
            vc = pc.value_counts(t.column("term").combine_chunks())
            for term, n in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist()
            ):
                out[str(term)] = out.get(str(term), 0) + int(n)
        return out

    @staticmethod
    def _idf_weights(term_col, idf: dict[str, int]) -> np.ndarray:
        """Per-row idf via Arrow dictionary-encode + take: the idf dict is
        looked up once per UNIQUE term (a handful), never per row — no
        pandas/Python-object detour in the scoring hot loop."""
        arr = (
            term_col.combine_chunks()
            if isinstance(term_col, pa.ChunkedArray)
            else term_col
        )
        enc = pc.dictionary_encode(arr)
        vals = np.array(
            [idf.get(v, 0) for v in enc.dictionary.to_pylist()], dtype=np.int64
        )
        if not len(vals):
            return np.zeros(len(arr), dtype=np.int64)
        return vals[enc.indices.to_numpy(zero_copy_only=False)]

    def query_df(self, terms: list[str]) -> dict[str, int]:
        """Per-term document frequency for a query — pruned partitions only.
        Terms stem first iff the index is stemmed (keys are the stems)."""
        terms = self._prep_terms(terms)
        return self._df_from_parts(self._matched_parts(terms), terms)

    def topk(
        self, terms: list[str], k: int = 20, driver_row_limit: int = 2_000_000
    ) -> pa.Table:
        """Integer TF-IDF top-k from the persisted index (same contract as
        ``search.search_topk``: rank by score DESC, doc_id ASC; v3 fallback
        snippet).  Docs with zero matching terms pad the tail (doc_id ASC,
        score 0) when fewer than k docs match — the direct pipeline's
        local-topk does the same implicitly.

        Scale-adaptive scoring: the matched postings row count decides (a
        parquet-metadata check on the materialized pruned Dataset) — a
        driver fold below ``driver_row_limit``, else the distributed path
        (``groupby(doc_id)`` + per-block local top-k + tiny merge), because
        a STOPWORD query matches the whole corpus and must never fold on
        the driver."""
        n = int(self.meta["live_docs"])
        terms = self._prep_terms(terms)
        ds = self._pruned_postings(terms)
        n_rows = ds.count() if ds is not None else 0
        scored: dict[int, int] = {}
        if ds is not None and n_rows > driver_row_limit:
            ranked = self._topk_distributed(ds, terms, n, k)
            exclude = {d for d, _ in ranked}
        else:
            parts = (
                [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
                if ds is not None
                else []
            )
            df = self._df_from_parts(parts, terms)
            idf = {
                t: (n * IDF_SCALE) // df[t] if df.get(t, 0) > 0 else 0
                for t in terms
            }
            if parts:
                # per-doc score: a doc's rows can span term partitions ->
                # vectorized fold by doc_id, bounded by driver_row_limit
                import pandas as pd

                for t in parts:
                    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                    tf = t.column("tf").to_numpy(zero_copy_only=False)
                    contrib = tf * self._idf_weights(t.column("term"), idf)
                    for d, s in pd.Series(contrib).groupby(ids).sum().items():
                        scored[int(d)] = scored.get(int(d), 0) + int(s)
            ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            # matched docs always score > 0 (their term's df > 0), so the
            # zero-score tail must exclude every matched doc, not just the
            # ranked ones
            exclude = set(scored)
        if len(ranked) < k:
            ranked += [
                (int(d), 0)
                for d in self._live_doc_ids_ascending(
                    exclude=exclude, want=k - len(ranked)
                )
            ]
        ids = [d for d, _ in ranked]
        snips = self._snippets(ids)
        return pa.table(
            {
                "rank": pa.array(
                    np.arange(1, len(ranked) + 1, dtype=np.int64), pa.int64()
                ),
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array([s for _, s in ranked], pa.int64()),
                "snippet": pa.array([snips.get(d, "") for d in ids], pa.string()),
            }
        )

    def _topk_distributed(
        self,
        ds: "ray.data.Dataset",
        terms: list[str],
        n: int,
        k: int,
        row_contrib=None,
    ) -> list[tuple[int, int]]:
        """Stopword-scale scoring: df via per-batch partials (driver folds Q
        ints), per-doc score via ``groupby(doc_id).sum``, then per-block
        local top-k and a tiny driver merge — the driver never sees more
        than blocks x k rows.  Same shape as the direct pipeline's
        local-topk; pytest pins equality with the driver fold at limit=0.

        ``row_contrib(batch, idf_row) -> int64[]`` computes each posting
        row's score contribution (a (term, doc) pair appears in exactly one
        live row, so every scoring model that is per-(term,doc) — TF-IDF and
        BM25F alike — is row-additive under ``groupby(doc_id).sum``).
        Default: ``tf * idf``.  Zero-score docs drop out so they compete in
        the ascending-id tail fill exactly like unmatched docs."""
        from ray.data.aggregate import Sum

        term_list = sorted(set(terms))

        def df_partial(batch: pa.Table) -> pa.Table:
            vc = pc.value_counts(batch.column("term").combine_chunks())
            return pa.table(
                {
                    "term": vc.field("values"),
                    "pdf": pc.cast(vc.field("counts"), pa.int64()),
                }
            )

        df = {t: 0 for t in term_list}
        for t in ray.get(
            ds.map_batches(df_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        ):
            for term, c in zip(
                t.column("term").to_pylist(), t.column("pdf").to_pylist()
            ):
                df[term] = df.get(term, 0) + int(c)
        idf = {
            t: (n * IDF_SCALE) // df[t] if df.get(t, 0) > 0 else 0
            for t in term_list
        }
        if row_contrib is None:

            def row_contrib(batch: pa.Table, idf_row: np.ndarray) -> np.ndarray:
                return batch.column("tf").to_numpy(zero_copy_only=False) * idf_row

        def add_score(batch: pa.Table) -> pa.Table:
            contrib = row_contrib(
                batch, SearchIndex._idf_weights(batch.column("term"), idf)
            )
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "score_part": pa.array(contrib, pa.int64()),
                }
            )

        def local_topk(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.greater(batch.column("score"), 0))
            order = pc.sort_indices(
                batch,
                sort_keys=[("score", "descending"), ("doc_id", "ascending")],
            )
            return batch.take(order.slice(0, k))

        tops = [
            t
            for t in ray.get(
                ds.map_batches(add_score, batch_format="pyarrow")
                .groupby("doc_id")
                .aggregate(Sum("score_part", alias_name="score"))
                .map_batches(local_topk, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        if not tops:
            return []
        merged = pa.concat_tables(tops)
        order = pc.sort_indices(
            merged, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        top = merged.take(order.slice(0, k))
        return list(
            zip(
                (int(x) for x in top.column("doc_id").to_pylist()),
                (int(x) for x in top.column("score").to_pylist()),
            )
        )

    def and_terms(
        self, terms: list[str], driver_row_limit: int = 2_000_000
    ) -> pa.Table:
        """doc_ids containing ALL terms (v1 posting-list AND, D5) from the
        pruned partitions.  Above ``driver_row_limit`` matched rows the
        intersection runs as a distributed ``groupby(doc_id).count == Q``
        so the candidate rows never concentrate on the driver (only the
        intersection RESULT does — it is the output)."""
        terms = self._prep_terms(terms)
        q = len(set(terms))
        ds = self._pruned_postings(terms)
        if ds is None:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        if ds.count() > driver_row_limit:
            from ray.data.aggregate import Count

            hits_ds = (
                ds.groupby("doc_id")
                .aggregate(Count(alias_name="n_terms"))
                .map_batches(
                    lambda t: t.filter(pc.equal(t["n_terms"], q)).select(
                        ["doc_id"]
                    ),
                    batch_format="pyarrow",
                )
            ).materialize()
            parts = [t for t in ray.get(hits_ds.to_arrow_refs()) if t.num_rows]
            if not parts:
                return pa.table({"doc_id": pa.array([], pa.int64())})
            return (
                pa.concat_tables(parts).combine_chunks().sort_by("doc_id")
            )
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        all_ids = np.concatenate(
            [t.column("doc_id").to_numpy(zero_copy_only=False) for t in parts]
        )
        ids_u, counts = np.unique(all_ids, return_counts=True)
        hits = np.sort(ids_u[counts == q])
        return pa.table({"doc_id": pa.array(hits, pa.int64())})

    def term_df(self) -> pa.Table:
        """Full document-frequency table (term, df) — the index-statistics
        scan; reads postings metadata columns only, never text."""
        from ray.data.aggregate import Sum

        files = self._all_files("postings")
        if not files:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        last_gen = self._last_gen_map()
        lg_ref = ray.put(last_gen)

        def partial(batch: pa.Table) -> pa.Table:
            from distributed_web_crawling_system_ray.stages.cache import get_object

            # df is defined over full-text tokens: drop title-only rows
            batch = batch.filter(pc.greater(batch.column("tf"), 0))
            lg = get_object(lg_ref)
            if lg and batch.num_rows:
                ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
                gen = batch.column("gen").to_numpy(zero_copy_only=False)
                live = np.fromiter(
                    (g >= lg.get(int(i), 0) for i, g in zip(ids, gen)),
                    dtype=bool,
                    count=len(ids),
                )
                batch = batch.filter(pa.array(live, pa.bool_()))
            vc = pc.value_counts(batch.column("term").combine_chunks())
            return pa.table(
                {
                    "term": vc.field("values"),
                    "pdf": pc.cast(vc.field("counts"), pa.int64()),
                }
            )

        out = (
            ray.data.read_parquet(files, columns=["term", "doc_id", "tf", "gen"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("pdf", alias_name="df"))
        ).materialize()
        parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
        return (
            pa.concat_tables(parts)
            if parts
            else pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        )

    # --------------------------------------------------------------- BM25F

    def topk_bm25f(
        self,
        terms,
        k: int = 10,
        driver_row_limit: int = 2_000_000,
    ) -> pa.Table:
        """Field-weighted BM25 top-k from the persisted index — identical
        output contract to ``search.search_topk_bm25f`` (rank, doc_id, url,
        title, domain, crawl_date, score, snippet).  Scoring reads ONLY the
        pruned postings rows: ``dl`` is denormalized into every row and
        ``total_dl``/``live_docs`` live in meta, so no doc-table pass.

        Same scale-adaptive split as ``topk``: driver fold under
        ``driver_row_limit`` matched rows, else the distributed
        ``groupby(doc_id).sum`` path (BM25F is row-additive because each
        (term, doc) pair is one live posting row)."""
        n = int(self.meta["live_docs"])
        total_dl = int(self.meta.get("total_dl", 0))
        terms = self._prep_terms(list(terms))

        def contrib_of(batch: pa.Table, idf_row: np.ndarray) -> np.ndarray:
            tf = batch.column("tf").to_numpy(zero_copy_only=False)
            tft = batch.column("tf_title").to_numpy(zero_copy_only=False)
            dl = batch.column("dl").to_numpy(zero_copy_only=False)
            tf_w = BOOST_TITLE * tft + tf
            # overflow-guarded vector kernel (r4 advice): falls back to
            # Python-int arithmetic when int64 intermediates could wrap
            return bm25f_contrib_vec(idf_row, tf_w, dl, total_dl, n)

        ds = self._pruned_postings(terms, require_content_tf=False)
        n_rows = ds.count() if ds is not None else 0
        if ds is not None and n_rows > driver_row_limit:
            ranked = self._topk_distributed(
                ds, terms, n, k, row_contrib=contrib_of
            )
            exclude = {d for d, _ in ranked}
        else:
            parts = (
                [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
                if ds is not None
                else []
            )
            # BM25F df: every live row counts (tf_w > 0 by construction —
            # a row exists only where the term appears in title or content)
            df = self._df_from_parts(parts, terms)
            idf = {
                t: (n * IDF_SCALE) // df[t] if df.get(t, 0) > 0 else 0
                for t in terms
            }
            scored: dict[int, int] = {}
            if parts:
                import pandas as pd

                for t in parts:
                    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                    contrib = contrib_of(
                        t, self._idf_weights(t.column("term"), idf)
                    )
                    for d, s in pd.Series(contrib).groupby(ids).sum().items():
                        scored[int(d)] = scored.get(int(d), 0) + int(s)
            # zero-score matched docs (possible when a long doc's floored
            # contribution vanishes) compete in the ascending-id tail like
            # unmatched docs — the direct pipeline's total order
            scored = {d: s for d, s in scored.items() if s > 0}
            ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            exclude = set(scored)
        if len(ranked) < k:
            ranked += [
                (int(d), 0)
                for d in self._live_doc_ids_ascending(
                    exclude=exclude, want=k - len(ranked)
                )
            ]
        ids = [d for d, _ in ranked]
        fields = self._stored_fields(ids)

        def fld(d: int, name: str) -> str:
            return fields.get(d, {}).get(name, "")

        return pa.table(
            {
                "rank": pa.array(
                    np.arange(1, len(ranked) + 1, dtype=np.int64), pa.int64()
                ),
                "doc_id": pa.array(ids, pa.int64()),
                "url": pa.array(
                    [derive_url(d, fld(d, "domain")) for d in ids], pa.string()
                ),
                "title": pa.array([fld(d, "title") for d in ids], pa.string()),
                "domain": pa.array(
                    [fld(d, "domain") for d in ids], pa.string()
                ),
                "crawl_date": pa.array(
                    [fld(d, "crawl_date") for d in ids], pa.string()
                ),
                "score": pa.array([s for _, s in ranked], pa.int64()),
                "snippet": pa.array(
                    [fld(d, "snippet") for d in ids], pa.string()
                ),
            }
        )

    # ------------------------------------------------- query-string search

    def search(self, query_str: str, k: int = 10) -> pa.Table:
        """The reference's user-facing search endpoint
        (``indexer/indexer_node.py:151-183``): a query STRING with
        field-specific terms (``title:term`` / ``content:term``), boolean
        operators (AND / OR / NOT), parenthesized groups and quoted
        PHRASES, parsed by ``parse_query`` (the MultifieldParser stand-in
        — Whoosh's default grammar accepts all of these), matched against
        the index, and ranked with BM25F.

        Matching: the query in disjunctive normal form — OR of AND-groups;
        a bare term matches either field, ``title:x`` / ``content:x``
        restrict to one field; ``NOT x`` excludes (only inside a group with
        at least one positive term — a pure-negation group is rejected,
        like Whoosh's requirement of at least one positive clause).  A
        phrase leaf matches docs where its tokens appear ADJACENT in the
        restricted field, verified against the positional postings.

        Scoring: each distinct positive leaf contributes its
        field-restricted BM25F weight (bare terms use the boosted field
        union; ``title:x`` only ``BOOST_TITLE*tf_title``; ``content:x``
        only ``tf``; a phrase uses its OCCURRENCE count — the phrase
        frequency — in place of tf, with df = number of docs containing
        the phrase), summed per matching doc.

        The candidate postings for the query's terms are folded driver-side
        (bounded by the per-term document frequencies, the classic
        inverted-index query cost); corpus-scale stopword queries belong on
        ``topk``/``topk_bm25f``, which switch to the distributed path.
        """
        groups = parse_query(query_str)
        if not groups:
            return self.topk_bm25f([], k)
        stem_t = lambda t: self._prep_terms([t])[0]  # noqa: E731
        groups = [
            [(f, stem_t(t), neg) for f, t, neg in grp] for grp in groups
        ]
        for grp in groups:
            if grp and not any(not neg for _, _, neg in grp):
                raise ValueError(
                    "pure-negation query group is not matchable: " + query_str
                )
        has_phrase = any(
            isinstance(t, tuple) for grp in groups for _, t, _ in grp
        )
        if has_phrase and not self.meta.get("positions", False):
            raise ValueError(
                "phrase query needs positional postings — this index was "
                "built by a pre-positions format; rebuild it"
            )
        # wildcard leaves expand against the vocabulary sidecar ONCE; the
        # expanded terms then ride the ordinary pruned-postings path
        wmap = {
            t: self._expand_wildcard(t)
            for grp in groups
            for _, t, _ in grp
            if isinstance(t, Wildcard)
        }

        def _leaf_terms(t):
            if isinstance(t, Wildcard):
                return wmap[t]
            return t if isinstance(t, tuple) else (t,)

        all_terms = sorted(
            {x for grp in groups for _, t, _ in grp for x in _leaf_terms(t)}
        )
        n = int(self.meta["live_docs"])
        total_dl = int(self.meta.get("total_dl", 0))
        # main read: tf/df/dl for every query term, NO position columns —
        # positions are the bulk of the postings bytes and only phrase
        # constituents need them (r5 review: a mixed query was paying the
        # positional cost for its high-df non-phrase terms)
        ds = self._pruned_postings(
            all_terms, require_content_tf=False, with_positions=False
        )
        parts = (
            [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
            if ds is not None
            else []
        )
        # per-term posting columns (ids, tf, tf_title, dl): ONE sort of the
        # (already term-filtered) rows, then run slices — not a full-column
        # filter pass per term, which goes quadratic when a wildcard
        # expands to many terms (r5 review)
        cat: dict[str, dict] = {}
        for term, sub in _runs_by_term(parts):
            cat[term] = {
                "ids": sub.column("doc_id").to_numpy(zero_copy_only=False),
                "tf": sub.column("tf").to_numpy(zero_copy_only=False),
                "tft": sub.column("tf_title").to_numpy(zero_copy_only=False),
                "dl": sub.column("dl").to_numpy(zero_copy_only=False),
            }
        # positional read: ONLY the phrase constituents' partitions/rows
        pos_cat: dict[str, dict] = {}
        if has_phrase:
            phrase_terms = sorted(
                {
                    x
                    for grp in groups
                    for _, t, _ in grp
                    if isinstance(t, tuple)
                    for x in t
                }
            )
            pds = self._pruned_postings(
                phrase_terms, require_content_tf=False, with_positions=True
            )
            pparts = (
                [x for x in ray.get(pds.to_arrow_refs()) if x.num_rows]
                if pds is not None
                else []
            )
            for term, sub in _runs_by_term(pparts):
                pos_cat[term] = {
                    "ids": sub.column("doc_id").to_numpy(zero_copy_only=False),
                    "dl": sub.column("dl").to_numpy(zero_copy_only=False),
                    "pos": sub.column("pos").to_pylist(),
                    "post": sub.column("pos_title").to_pylist(),
                }

        _empty3 = (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
        )

        def term_support(field: str | None, term: str):
            """(ids, tf_w, dl) of docs where the single-term leaf matches."""
            a = cat.get(term)
            if a is None:
                return _empty3
            if field == "title":
                w = BOOST_TITLE * a["tft"]
            elif field == "content":
                w = a["tf"]
            else:
                w = BOOST_TITLE * a["tft"] + a["tf"]
            sel = w > 0
            return a["ids"][sel], w[sel], a["dl"][sel]

        phrase_cache: dict = {}

        def phrase_support(field: str | None, toks: tuple):
            """(ids, tf_w, dl) of docs where the phrase occurs in scope —
            tf_w is the field-weighted PHRASE frequency.  Candidates are
            the AND of constituent postings; adjacency verifies against
            the position lists (cost: Σ positions of candidates)."""
            key = (field, toks)
            if key in phrase_cache:
                return phrase_cache[key]
            entries = [pos_cat.get(x) for x in toks]
            if any(e is None for e in entries):
                phrase_cache[key] = _empty3
                return _empty3
            cand = entries[0]["ids"]
            for e in entries[1:]:
                cand = np.intersect1d(cand, e["ids"])
            if not len(cand):
                phrase_cache[key] = _empty3
                return _empty3
            idx_maps = [
                {int(d): i for i, d in enumerate(e["ids"])} for e in entries
            ]
            out_ids: list[int] = []
            out_w: list[int] = []
            out_dl: list[int] = []
            for d in cand:
                di = int(d)
                rows = [m[di] for m in idx_maps]
                c_occ = _adjacent_count(
                    [entries[j]["pos"][rows[j]] for j in range(len(toks))]
                )
                t_occ = _adjacent_count(
                    [entries[j]["post"][rows[j]] for j in range(len(toks))]
                )
                if field == "title":
                    w = BOOST_TITLE * t_occ
                elif field == "content":
                    w = c_occ
                else:
                    w = BOOST_TITLE * t_occ + c_occ
                if w > 0:
                    out_ids.append(di)
                    out_w.append(w)
                    out_dl.append(int(entries[0]["dl"][rows[0]]))
            res = (
                np.asarray(out_ids, dtype=np.int64),
                np.asarray(out_w, dtype=np.int64),
                np.asarray(out_dl, dtype=np.int64),
            )
            phrase_cache[key] = res
            return res

        wild_cache: dict = {}

        def wild_support(field: str | None, pattern: Wildcard):
            """Union of matching ids over the pattern's expanded terms —
            match/negation only; scoring expands to concrete term leaves."""
            key = (field, str(pattern))
            if key in wild_cache:
                return wild_cache[key]
            acc: np.ndarray | None = None
            for term in wmap[pattern]:
                s = term_support(field, term)[0]
                acc = s if acc is None else np.union1d(acc, s)
            ids = acc if acc is not None else np.zeros(0, dtype=np.int64)
            res = (ids, np.zeros(0, np.int64), np.zeros(0, np.int64))
            wild_cache[key] = res
            return res

        def leaf_support(field: str | None, t):
            if isinstance(t, Wildcard):
                return wild_support(field, t)
            return (
                phrase_support(field, t)
                if isinstance(t, tuple)
                else term_support(field, t)
            )

        match: np.ndarray | None = None
        for grp in groups:
            gm: np.ndarray | None = None
            for field, term, neg in grp:
                if neg:
                    continue
                s = leaf_support(field, term)[0]
                gm = s if gm is None else np.intersect1d(gm, s)
            for field, term, neg in grp:
                if neg and gm is not None and len(gm):
                    gm = np.setdiff1d(gm, leaf_support(field, term)[0])
            if gm is not None:
                match = gm if match is None else np.union1d(match, gm)
        match = match if match is not None else np.zeros(0, dtype=np.int64)

        # score the matches: distinct positive leaves, field-restricted tf_w;
        # a wildcard leaf scores as its expanded terms (Whoosh: a multi-term
        # query sums each matched term's contribution), deduped against any
        # explicitly-queried identical term
        leaf_set: set = set()
        for grp in groups:
            for f, t, neg in grp:
                if neg:
                    continue
                if isinstance(t, Wildcard):
                    leaf_set.update((f, str(x)) for x in wmap[t])
                else:
                    leaf_set.add((f, t))
        leaves = sorted(
            leaf_set,
            key=lambda x: (x[0] or "", x[1] if isinstance(x[1], str) else " ".join(x[1])),
        )
        scores: dict[int, int] = {int(d): 0 for d in match}
        mset = set(scores)
        for field, term in leaves:
            ids, tf_w, dl = leaf_support(field, term)
            df = len(ids)
            if df == 0:
                continue
            idf = (n * IDF_SCALE) // df
            contrib = bm25f_contrib_vec(idf, tf_w, dl, total_dl, n)
            for d, c in zip(ids, contrib):
                di = int(d)
                if di in mset:
                    scores[di] += int(c)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        ids = [d for d, _ in ranked]
        fields_map = self._stored_fields(ids)

        def fld(d: int, name: str) -> str:
            return fields_map.get(d, {}).get(name, "")

        return pa.table(
            {
                "rank": pa.array(
                    np.arange(1, len(ranked) + 1, dtype=np.int64), pa.int64()
                ),
                "doc_id": pa.array(ids, pa.int64()),
                "url": pa.array(
                    [derive_url(d, fld(d, "domain")) for d in ids], pa.string()
                ),
                "title": pa.array([fld(d, "title") for d in ids], pa.string()),
                "domain": pa.array(
                    [fld(d, "domain") for d in ids], pa.string()
                ),
                "crawl_date": pa.array(
                    [fld(d, "crawl_date") for d in ids], pa.string()
                ),
                "score": pa.array([s for _, s in ranked], pa.int64()),
                "snippet": pa.array(
                    [fld(d, "snippet") for d in ids], pa.string()
                ),
            }
        )

    # --------------------------------------------------------------- stats

    def stats(self) -> dict:
        """Index statistics — the reference's ``update_stats`` +
        ``get_status`` surface (``indexer/indexer_node.py:188-217``):
        ``document_count`` (its ``searcher.doc_count()``) and
        ``index_size_bytes``/``index_size_mb`` (its os.walk size sum), plus
        the rebuild's own segmentation facts."""
        total = 0
        for dirpath, _dirnames, filenames in os.walk(self.index_dir):
            for f in filenames:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    continue
        return {
            "document_count": int(self.meta["live_docs"]),
            "index_size_bytes": int(total),
            "index_size_mb": round(total / (1024 * 1024), 2),
            "n_generations": len(self.meta["generations"]),
            "total_dl": int(self.meta.get("total_dl", 0)),
            "stem": bool(self.meta.get("stem", False)),
        }

    # ------------------------------------------------------------- helpers

    def _live_doc_ids_ascending(self, exclude: set[int], want: int) -> list[int]:
        """Smallest ``want`` live doc_ids not in ``exclude`` — zero-score
        tail fill for degenerate queries (matched < k).

        Reads id+gen columns per docs file but keeps only a bounded
        selection per file (``np.partition`` to the smallest ``want``
        candidates), so driver memory is O(n_files * want), never
        O(corpus) (r3 advice: the old per-id dict held every live id)."""
        last_gen = self._last_gen_map()
        running = np.zeros(0, dtype=np.int64)
        for f in self._all_files("docs"):
            t = pq.read_table(f, columns=["doc_id", "gen"])
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            gen = t.column("gen").to_numpy(zero_copy_only=False)
            if last_gen:
                live = np.fromiter(
                    (g >= last_gen.get(int(i), 0) for i, g in zip(ids, gen)),
                    dtype=bool,
                    count=len(ids),
                )
                ids = ids[live]
            if exclude:
                ids = ids[
                    np.isin(
                        ids, np.fromiter(exclude, dtype=np.int64), invert=True
                    )
                ]
            # a doc_id can recur across generations (upserts): np.unique
            # dedups AND sorts, so the head is the smallest `want`
            running = np.unique(np.concatenate([running, ids]))[:want]
        return [int(d) for d in running]

    def _stored_fields(self, ids: list[int]) -> dict[int, dict]:
        """The stored result fields (title/domain/crawl_date/snippet) for
        the k winners: doc-partition-pruned read, latest generation wins —
        the Whoosh stored=True retrieval (indexer/indexer_node.py:174-181)."""
        if not ids:
            return {}
        n_dparts = self.meta["n_dparts"]
        parts = {int(d) % n_dparts for d in ids}
        idset = set(int(d) for d in ids)
        cols = ["doc_id", "title", "domain", "crawl_date", "snippet", "gen"]
        best: dict[int, tuple[int, dict]] = {}
        for f in self._all_files("docs", parts):
            t = pq.read_table(f, columns=cols)
            rows = [t.column(c).to_pylist() for c in cols]
            for d, title, domain, cdate, snip, g in zip(*rows):
                if d in idset and (d not in best or g > best[d][0]):
                    best[d] = (
                        g,
                        {
                            "title": title,
                            "domain": domain,
                            "crawl_date": cdate,
                            "snippet": snip,
                        },
                    )
        return {d: fields for d, (_, fields) in best.items()}

    def _snippets(self, ids: list[int]) -> dict[int, str]:
        """Stored snippets for the k winners (doc-partition-pruned)."""
        return {
            d: f["snippet"] for d, f in self._stored_fields(ids).items()
        }


# --------------------------------------------------- sf_dir-cached indexes


_INDEX_CACHE_ROOT = os.environ.get(
    "GRAFT_SEARCH_INDEX_CACHE", "/tmp/graft_search_index"
)


# bump when the on-disk layout or scoring-relevant build logic changes: a
# stale-format cache must rebuild, never serve wrong hash-checked results
# (3: positional postings — pos/pos_title list columns for phrase queries)
INDEX_FORMAT_VERSION = 3


def index_for(sf_dir: str, stem: bool = False) -> SearchIndex:
    """Build-once-query-many index over ``sf_dir/documents.parquet``,
    cached under /tmp — the reference's 'index once, query per request'
    usage.  ``stem=True`` builds/serves the STEMMED index (its own cache
    slot) — the v3 StemmingAnalyzer schema that BM25F and the stemmed
    top-k query contract require.

    The stamp covers the index-format version + source identity
    (path|size|mtime_ns); the build lands in a pid-suffixed staging dir and
    swaps in via ``os.replace``, so a crashed build leaves only an ignored
    staging dir and a concurrent reader of the previous index keeps its
    already-open handles (r3 review: the in-place create could rmtree a
    directory another process was querying, and a same-second in-place
    rewrite of the source passed the old stamp).

    Concurrency (r3 advice): the cache dir name carries a hash of the FULL
    normalized source path, so distinct fixture dirs sharing a basename get
    distinct cache slots instead of perpetually invalidating each other;
    and two processes racing to build the same slot are safe — the swap
    failure path re-checks for a concurrently-appeared valid-stamp dir and
    treats it as success (both built the same deterministic index)."""
    import hashlib

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    stamp = f"v{INDEX_FORMAT_VERSION}|{src}|{st.st_size}|{st.st_mtime_ns}|stem={stem}"
    norm = os.path.normpath(os.path.abspath(sf_dir))
    d = os.path.join(
        _INDEX_CACHE_ROOT,
        os.path.basename(norm)
        + "-"
        + hashlib.md5(norm.encode()).hexdigest()[:8]
        + ("-stem" if stem else ""),
    )

    def _valid() -> bool:
        stamp_path = os.path.join(d, "_SOURCE_STAMP")
        if not (os.path.isdir(d) and os.path.exists(stamp_path)):
            return False
        with open(stamp_path) as f:
            return f.read() == stamp and os.path.exists(
                os.path.join(d, "meta.json")
            )

    if _valid():
        return SearchIndex.open(d)
    staging = f"{d}.build-{os.getpid()}"
    idx = SearchIndex.create(staging, stem=stem)
    idx.update(src)
    with open(os.path.join(staging, "_SOURCE_STAMP"), "w") as f:
        f.write(stamp)
    old = f"{d}.old-{os.getpid()}"
    try:
        if os.path.isdir(d):
            os.replace(d, old)  # previous tree stays readable during swap
        os.replace(staging, d)
    except OSError:
        # lost the race: another process swapped its build in between our
        # check and replace — if its index carries the same stamp, use it
        shutil.rmtree(staging, ignore_errors=True)
        if _valid():
            shutil.rmtree(old, ignore_errors=True)
            return SearchIndex.open(d)
        # the competing landing doesn't serve this stamp (r4 advice): never
        # leave the cache slot emptier than before — restore the displaced
        # previous tree if the slot is vacant, else leave the competitor's
        if os.path.isdir(d):
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.isdir(old):
            try:
                os.replace(old, d)
            except OSError:
                shutil.rmtree(old, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)
    return SearchIndex.open(d)


def search_topk_indexed(sf_dir: str) -> pa.Table:
    """search_topk answered FROM the persisted index (oracle-identical
    output to search.search_topk)."""
    from distributed_web_crawling_system_ray.pipelines.search import (
        QUERY_TERMS,
        TOP_K,
    )

    return index_for(sf_dir).topk(list(QUERY_TERMS), TOP_K)


def search_and_terms_indexed(sf_dir: str) -> pa.Table:
    from distributed_web_crawling_system_ray.pipelines.search import QUERY_TERMS

    return index_for(sf_dir).and_terms(list(QUERY_TERMS))


def search_term_df_indexed(sf_dir: str) -> pa.Table:
    return index_for(sf_dir).term_df()


def search_topk_stemmed_indexed(sf_dir: str) -> pa.Table:
    """search_topk_stemmed answered FROM the persisted STEMMED index
    (oracle-identical output to search.search_topk_stemmed)."""
    from distributed_web_crawling_system_ray.pipelines.search import (
        QUERY_TERMS,
        TOP_K,
    )

    return index_for(sf_dir, stem=True).topk(list(QUERY_TERMS), TOP_K)


def search_topk_bm25f_indexed(sf_dir: str) -> pa.Table:
    """search_topk_bm25f answered FROM the persisted stemmed index
    (oracle-identical output to search.search_topk_bm25f) — the
    reference's actual serving shape: BM25F scored against the index, not
    a corpus scan per query (indexer/indexer_node.py:151-183)."""
    from distributed_web_crawling_system_ray.pipelines.search import (
        BM25_TOP_K,
        QUERY_TERMS,
    )

    return index_for(sf_dir, stem=True).topk_bm25f(
        list(QUERY_TERMS), BM25_TOP_K
    )


def index_crawl_payload(
    payload_root: str, index_dir: str, stem: bool = False
) -> SearchIndex:
    """The reference's crawler→indexer seam: every crawled document flows
    into the search index (``crawler_node.send_to_indexer`` →
    ``indexer update_document``, crawler/crawler_node.py:340-366 +
    indexer/indexer_node.py:83-106).  In this graft the crawl payload is
    image+caption rows, so the caption is the indexed text.

    ``doc_id`` = first 15 hex digits of ``image_id`` (a 60-bit slice of the
    content-addressed md5(canonical url) key) — stable across re-crawls, so
    re-indexing a later crawl of the same URL UPSERTS its caption exactly
    like Whoosh's update-by-unique-url.  ``domain`` stores "crawl" (the
    payload schema carries no host; the reference's own fallback is
    ``result.get("domain", "unknown")``, indexer_node.py:89).

    ``payload_root`` may be a crawl output root (``round=K/`` partitions)
    or a flat bulk output directory.
    """
    from distributed_web_crawling_system_ray.sources.storage import (
        payload_files,
    )

    if any(
        d.startswith("round=") for d in sorted(os.listdir(payload_root))
    ):
        files = payload_files(payload_root)
    else:
        files = [
            os.path.join(payload_root, f)
            for f in sorted(os.listdir(payload_root))
            if f.endswith(".parquet")
        ]

    def to_docs(batch: pa.Table) -> pa.Table:
        ids = [
            int(s[:15], 16) for s in batch.column("image_id").to_pylist()
        ]
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": batch.column("caption"),
                "source": pa.array(["crawl"] * n, pa.string()),
            }
        )

    docs = ray.data.read_parquet(
        files, columns=["image_id", "caption"]
    ).map_batches(to_docs, batch_format="pyarrow")
    if os.path.exists(os.path.join(index_dir, "meta.json")):
        idx = SearchIndex.open(index_dir)
    else:
        idx = SearchIndex.create(index_dir, stem=stem)
    idx.update(docs)
    return idx


def search_field_query(sf_dir: str) -> pa.Table:
    """The pinned field/boolean query through the full user-facing search
    path — ``parse_query`` (MultifieldParser stand-in) -> DNF match ->
    field-restricted BM25F -> stored fields — answered from the persisted
    stemmed index and hash-checked against a DuckDB oracle replicating the
    same DNF + scoring (the reference's /search endpoint surface,
    indexer/indexer_node.py:151-183)."""
    from distributed_web_crawling_system_ray.pipelines.search import (
        BM25_TOP_K,
        FIELD_QUERY,
    )

    return index_for(sf_dir, stem=True).search(FIELD_QUERY, k=BM25_TOP_K)


def search_phrase_query(sf_dir: str) -> pa.Table:
    """The pinned phrase query through the full user-facing search path —
    quoted-phrase adjacency verified against the positional postings
    (Whoosh PhraseQuery semantics: the reference feeds the raw user string
    to MultifieldParser, which accepts quoted phrases by default,
    indexer/indexer_node.py:170-178) — answered from the persisted stemmed
    index and hash-checked against a DuckDB oracle replicating the same
    match + phrase-frequency BM25F scoring over tokenized text windows."""
    from distributed_web_crawling_system_ray.pipelines.search import (
        BM25_TOP_K,
        PHRASE_QUERY,
    )

    return index_for(sf_dir, stem=True).search(PHRASE_QUERY, k=BM25_TOP_K)


def search_nested_query(sf_dir: str) -> pa.Table:
    """The pinned nested-boolean query: parenthesized groups distribute
    into DNF, a NOT-group De Morgans, and a phrase rides inside the
    negation — Whoosh grammar parity for ``(a OR b) AND c NOT (d OR "e f")``
    (indexer/indexer_node.py:170).  Answered from the persisted stemmed
    index, hash-checked against the equivalent DuckDB DNF."""
    from distributed_web_crawling_system_ray.pipelines.search import (
        BM25_TOP_K,
        NESTED_QUERY,
    )

    return index_for(sf_dir, stem=True).search(NESTED_QUERY, k=BM25_TOP_K)


def search_wildcard_query(sf_dir: str) -> pa.Table:
    """The pinned wildcard query: ``*``/``?`` patterns expand against the
    index's vocabulary sidecar and score as their expanded terms (Whoosh
    WildcardPlugin semantics — on by default in the grammar the reference
    feeds user queries to, indexer/indexer_node.py:170).  Answered from the
    persisted stemmed index, hash-checked against a DuckDB oracle that
    derives the same vocabulary from the documents and expands with LIKE."""
    from distributed_web_crawling_system_ray.pipelines.search import (
        BM25_TOP_K,
        WILDCARD_QUERY,
    )

    return index_for(sf_dir, stem=True).search(WILDCARD_QUERY, k=BM25_TOP_K)


def search_index_stats(sf_dir: str) -> pa.Table:
    """Index statistics as a one-row table — the reference's
    ``document_count`` + index-size status surface
    (indexer/indexer_node.py:188-217).  The oracle-checked columns are the
    deterministic ones (document_count, n_generations); byte sizes are in
    ``SearchIndex.stats()`` (pytest-pinned — on-disk size is not
    SQL-predictable)."""
    st = index_for(sf_dir).stats()
    return pa.table(
        {
            "document_count": pa.array([st["document_count"]], pa.int64()),
            "n_generations": pa.array([st["n_generations"]], pa.int64()),
        }
    )
