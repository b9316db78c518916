"""The BFS crawl driver loop: one Ray Data pipeline per frontier round.

Restates the whole reference master/worker system (SURVEY §3.1-3.3) as an
iterative sequence of bounded Dataset pipelines:

    round k:  frontier ──host exchange──> politeness scheduler (robots gate +
              virtual-time slots) ──filter allowed──> fetch (map stage)
              ──┬─> flat_map outlinks -> canonicalize -> pure seen-shard
              │    contains() prefilter -> min-rank dedup (driver-side under
              │    the partition limit, groupby(url_hash%P) above) ->
              │    exactly-once driver admission -> round k+1 frontier
              └─> flat_map image refs -> pure image-seen contains() + robots
                   gate -> set-dedup + exactly-once admission -> decode ->
                   write payload partition round=k   (runs on a driver
                   thread, overlapped with the frontier branch)

The feedback loop (extracted URLs re-entering the queue,
``master/master_node.py:167-173``) lives in this driver loop; each round is a
plain acyclic Dataset pipeline.  Termination = empty frontier (v1 semantics:
*loop while queue non-empty*, ``archive/master_node.py:111``) or the round
budget.

Frontier rounds are persisted as parquet under the work dir — that plus
filter-shard snapshots and host clocks is the checkpoint; resume re-reads the
last committed round's outputs (see ``checkpoint.py``).

Scale notes: per-round fetch results are materialized (they are
URL/metadata-sized — the image payload stream is NOT materialized, it flows
straight to the partitioned parquet/Lance sink); the dedup shuffle is an
explicit hash partition ``groupby(url_hash % P)``; the groupby(host) shuffle
is bounded by the per-host round budget (see scheduler.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from distributed_web_crawling_system_ray.config import CrawlConfig
from distributed_web_crawling_system_ray.functions.canon import (
    canonicalize,
    host_of,
    url_hash,
)
from distributed_web_crawling_system_ray.oracle import RANK_BYTES
from distributed_web_crawling_system_ray.pipelines.checkpoint import (
    commit_round,
    latest_round,
    round_dir,
)
from distributed_web_crawling_system_ray.stages.fetch import (
    decode_images,
    dedup_first_by_hash,
    dedup_min_rank,
    extract_image_candidates,
    extract_links,
    fetch_pages,
)
from distributed_web_crawling_system_ray.pipelines.partition import (
    add_hash_partition,
    host_partition_chunks,
)
from distributed_web_crawling_system_ray.state.scheduler import (
    ALLOWED,
    DEFERRED,
    DISALLOWED,
    schedule_host_group,
    schedule_hosts_batch,
)
from distributed_web_crawling_system_ray.state.seen import SeenPool


def _run_guarded(fn, out: dict) -> None:
    """Thread target: capture any exception for re-raise on the main thread."""
    try:
        fn()
    except BaseException as e:  # noqa: BLE001 — transported, not swallowed
        out["error"] = e


def _empty_schedule() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "canon": pa.array([], pa.string()),
            "url_hash": pa.array([], pa.uint64()),
            "host": pa.array([], pa.string()),
            "depth": pa.array([], pa.int32()),
            "rank_path": pa.array([], pa.binary()),
            "verdict": pa.array([], pa.int8()),
            "fetch_at_ms": pa.array([], pa.int64()),
        }
    )


@dataclass
class CrawlResult:
    out_dir: str
    work_dir: str
    rounds: int
    metrics: list[dict] = field(default_factory=list)

    def payload_dataset(self) -> "ray.data.Dataset":
        from distributed_web_crawling_system_ray.sources.storage import read_payload

        return read_payload(self.out_dir)

    def frontier_history(self) -> pa.Table:
        """Union of all rounds' frontiers == the final URL-seen set with
        (depth, rank_path) lineage."""
        tables = []
        for k in range(self.rounds):
            p = os.path.join(round_dir(self.work_dir, k), "frontier.parquet")
            if os.path.exists(p):
                tables.append(pq.read_table(p))
        return pa.concat_tables(tables) if tables else None

    def schedule_history(self) -> pa.Table:
        tables = []
        for k in range(self.rounds):
            p = os.path.join(round_dir(self.work_dir, k), "schedule.parquet")
            if os.path.exists(p):
                tables.append(pq.read_table(p))
        return pa.concat_tables(tables) if tables else None


def seed_frontier(fixture_dir: str, seen: SeenPool) -> pa.Table:
    """Round-0 frontier from the seeds table: canonicalize, first-seen dedup
    (duplicates and fragment variants collapse), rank = seed_rank bytes.

    Reference analog: seed enqueue with dedup (master/master_node.py:62-67,
    archive/master_node.py:26-44).  Seeds are assumed driver-sized; a huge
    seed list would go through the same Dataset path as a round instead.
    """
    seeds = pq.read_table(os.path.join(fixture_dir, "seeds.parquet")).to_pydict()
    rows = sorted(zip(seeds["seed_rank"], seeds["url"]))
    urls, canons, hashes, hosts, ranks = [], [], [], [], []
    local: set[int] = set()
    for rank, url in rows:
        c = canonicalize(url)
        if c is None:
            continue
        h = url_hash(c)
        if h in local:
            continue
        local.add(h)
        urls.append(url)
        canons.append(c)
        hashes.append(h)
        hosts.append(host_of(c))
        ranks.append(int(rank).to_bytes(RANK_BYTES, "big"))
    new_mask = ~seen.check_and_add(np.asarray(hashes, dtype=np.uint64))
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "canon": pa.array(canons, pa.string()),
            "url_hash": pa.array(np.asarray(hashes, np.uint64), pa.uint64()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "rank_path": pa.array(ranks, pa.binary()),
        }
    )
    return tbl.filter(pa.array(new_mask, pa.bool_()))


def ingest_injected_urls(work_dir: str, seen, rnd: int) -> pa.Table | None:
    """Consume ``work_dir/inject/*.txt`` into frontier rows.

    Mirrors the reference's ``/add_urls`` dedup-then-enqueue
    (master/master_node.py:212-220): each URL canonicalizes, passes the
    seen-shard ``check_and_add`` (idempotent — re-posting a known URL is a
    no-op), and enters the CURRENT round at depth=rnd with a rank that sorts
    after organically-discovered rows (0xFF-prefixed).  Files are consumed
    (renamed ``.done``) so ingestion never duplicates across resumes; a crash
    between consumption and the round's commit drops that batch (re-post to
    re-ingest) — still strictly better than the reference's at-most-once
    delivery (SQS delete-before-process, SURVEY §4.3).
    """
    inject_dir = os.path.join(work_dir, "inject")
    if not os.path.isdir(inject_dir):
        return None
    files = sorted(
        f for f in os.listdir(inject_dir) if f.endswith(".txt")
    )
    if not files:
        return None
    urls: list[str] = []
    for fn in files:
        p = os.path.join(inject_dir, fn)
        with open(p) as f:
            urls.extend(line.strip() for line in f if line.strip())
        os.replace(p, p + ".done")
    rows_url, canons, hashes, hosts, ranks = [], [], [], [], []
    local: set[int] = set()
    for k, url in enumerate(urls):
        c = canonicalize(url)
        if c is None:
            continue
        h = url_hash(c)
        if h in local:
            continue
        local.add(h)
        rows_url.append(url)
        canons.append(c)
        hashes.append(h)
        hosts.append(host_of(c))
        ranks.append(b"\xff" + int(k).to_bytes(RANK_BYTES, "big"))
    if not rows_url:
        return None
    new_mask = ~seen.check_and_add(np.asarray(hashes, dtype=np.uint64))
    tbl = pa.table(
        {
            "url": pa.array(rows_url, pa.string()),
            "canon": pa.array(canons, pa.string()),
            "url_hash": pa.array(np.asarray(hashes, np.uint64), pa.uint64()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array([rnd] * len(rows_url), pa.int32()),
            "rank_path": pa.array(ranks, pa.binary()),
        }
    )
    return tbl.filter(pa.array(new_mask, pa.bool_()))


def run_crawl(
    fixture_dir: str,
    cfg: CrawlConfig | None = None,
    work_dir: str | None = None,
    resume: bool = False,
) -> CrawlResult:
    """Run a full crawl; returns handles to the payload table + lineage.

    ``work_dir`` layout (the checkpoint):
      work_dir/checkpoint/round=K/{frontier,schedule,new_frontier}.parquet,
        seen/, image_seen/, clocks.json, metrics.json, _SUCCESS
      work_dir/payload/round=K/*.parquet
    """
    cfg = cfg or CrawlConfig()
    if work_dir is None:
        import tempfile

        work_dir = tempfile.mkdtemp(prefix="raycrawl_")
    ckpt_root = os.path.join(work_dir, "checkpoint")
    out_dir = os.path.join(work_dir, "payload")
    last = latest_round(ckpt_root) if resume else None
    if last is None:
        # Fresh start — including resume=True with NO committed round (a
        # crash during round 0 before the first commit_round): partial
        # parquet left in payload/ must not survive, or the re-run's
        # uniquely-named files land beside them and duplicate payload rows.
        import shutil

        for d in (ckpt_root, out_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)
    os.makedirs(ckpt_root, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)

    seen = SeenPool.create(cfg.seen_shards, cfg.cuckoo_capacity, cfg.bloom_bits)
    image_seen = SeenPool.create(
        max(2, cfg.seen_shards // 2), cfg.cuckoo_capacity, cfg.bloom_bits
    )
    robots_table = pq.read_table(os.path.join(fixture_dir, "robots.parquet"))
    robots_ref = ray.put(robots_table)
    from distributed_web_crawling_system_ray.state.robots import RobotsPolicies

    driver_policies = RobotsPolicies.from_table(robots_table)
    # broadcast the synthetic-web store once through the object store: all
    # workers on a node share ONE zero-copy Arrow buffer (per-worker parquet
    # parses of the images table cost 35-50 s each under I/O contention).
    # The http backend needs no table broadcast — each worker holds a
    # requests.Session (sources/httpstore.py); seeds + robots still come
    # from fixture_dir.
    if cfg.store_backend == "http":
        store_refs = None
    else:
        store_refs = (
            ray.put(pq.read_table(os.path.join(fixture_dir, "web_pages.parquet"))),
            robots_ref,
            ray.put(pq.read_table(os.path.join(fixture_dir, "images.parquet"))),
        )
    store_kwargs = {
        "store_refs": store_refs,
        "store_backend": cfg.store_backend,
        "user_agent": cfg.user_agent,
        "timeout_s": cfg.fetch_timeout_s,
    }

    clocks: dict[str, int] = {}
    metrics: list[dict] = []
    start_round = 0

    if last is not None:
        rd = round_dir(work_dir, last)
        seen.restore(os.path.join(rd, "seen"))
        image_seen.restore(os.path.join(rd, "image_seen"))
        with open(os.path.join(rd, "clocks.json")) as f:
            clocks = {k: int(v) for k, v in json.load(f).items()}
        for k in range(last + 1):
            mp = os.path.join(round_dir(work_dir, k), "metrics.json")
            if os.path.exists(mp):
                with open(mp) as f:
                    metrics.append(json.load(f))
        frontier = pq.read_table(os.path.join(rd, "new_frontier.parquet"))
        start_round = last + 1
        # wipe any partially-written later payload partitions
        for d in os.listdir(out_dir):
            if d.startswith("round=") and int(d.split("=")[1]) >= start_round:
                import shutil

                shutil.rmtree(os.path.join(out_dir, d))
    else:
        frontier = seed_frontier(fixture_dir, seen)

    timing = os.environ.get("GRAFT_TIMING") == "1"
    # wall-clock base for real-time politeness replay: anchored ONCE here on
    # the driver and shared by all fetch workers (per-worker monotonic epochs
    # drifted by pipeline spin-up and broke same-host spacing)
    rt_epoch = time.time() if cfg.real_time_politeness else None

    def _tick(label: str, marks: list, t: list) -> None:
        if timing:
            now = time.time()
            marks.append((label, round(now - t[0], 2)))
            t[0] = now

    rnd = start_round
    while True:
        # --- URL ingest between rounds (reference /add_urls endpoint,
        # master/master_node.py:212-220,260-265 / SURVEY S3): consume
        # work_dir/inject/*.txt (one URL per line), canonicalize, first-seen
        # dedup through the same shard pool, enqueue at the current round.
        injected = ingest_injected_urls(work_dir, seen, rnd)
        if injected is not None and injected.num_rows:
            frontier = (
                pa.concat_tables([frontier, injected])
                if frontier.num_rows
                else injected
            )
        if frontier.num_rows == 0 or rnd >= cfg.max_rounds:
            break
        t0 = time.time()
        marks: list = []
        tmark = [t0]
        rd = round_dir(work_dir, rnd)
        os.makedirs(rd, exist_ok=True)
        pq.write_table(frontier, os.path.join(rd, "frontier.parquet"))

        # --- schedule: the explicit host exchange -> per-host politeness.
        # Scale-adaptive realization of the groupby(host) shuffle: rounds
        # under driver_partition_limit are sorted by host driver-side and
        # cut at host boundaries (no Dataset sort; each host wholly in one
        # block -> plain map stage); larger rounds go through the
        # Dataset-native groupby(host).map_groups path.  Semantics are
        # identical (tests pin both paths to the oracle).
        clocks_ref = ray.put(clocks)
        sched_kwargs = {
            "robots_ref": robots_ref,
            "clocks_ref": clocks_ref,
            "per_host_round_budget": cfg.per_host_round_budget,
        }
        if frontier.num_rows <= cfg.driver_partition_limit:
            chunks = host_partition_chunks(frontier)
            schedule_ds = ray.data.from_arrow(chunks).map_batches(
                schedule_hosts_batch,
                fn_kwargs=sched_kwargs,
                batch_format="pyarrow",
                batch_size=None,
            )
        else:  # cluster-scale frontier: Dataset-native shuffle
            n_blocks = max(1, min(256, frontier.num_rows // 512 + 1))
            fr_ds = ray.data.read_parquet(
                os.path.join(rd, "frontier.parquet"),
                override_num_blocks=n_blocks,
            )
            schedule_ds = fr_ds.groupby("host").map_groups(
                schedule_host_group,
                fn_kwargs=sched_kwargs,
                batch_format="pyarrow",
            )
        schedule = schedule_ds.materialize()
        _tick("schedule", marks, tmark)
        sched_parts = [t for t in ray.get(schedule.to_arrow_refs()) if t.num_rows]
        sched_tbl = (
            pa.concat_tables(sched_parts) if sched_parts else _empty_schedule()
        )
        pq.write_table(sched_tbl, os.path.join(rd, "schedule.parquet"))
        verdicts = sched_tbl.column("verdict").to_numpy(zero_copy_only=False)
        n_allowed = int((verdicts == ALLOWED).sum())
        n_disallowed = int((verdicts == DISALLOWED).sum())
        n_deferred = int((verdicts == DEFERRED).sum())

        # advance per-host virtual clocks from this round's schedule
        if n_allowed:
            import pandas as pd

            sdf = pd.DataFrame(
                {
                    "host": sched_tbl.column("host").to_pylist(),
                    "fetch_at_ms": sched_tbl.column("fetch_at_ms").to_numpy(),
                    "allowed": verdicts == ALLOWED,
                }
            )
            sdf = sdf[sdf["allowed"]]
            for host, last_at in sdf.groupby("host")["fetch_at_ms"].max().items():
                clocks[host] = int(last_at) + driver_policies.delay_ms(host)

        # --- fetch allowed rows (actor pool; politeness is virtual-time)
        allowed_ds = schedule.map_batches(
            lambda t: t.filter(pc.equal(t["verdict"], ALLOWED)),
            batch_format="pyarrow",
        )
        results = allowed_ds.map_batches(
            fetch_pages,
            fn_kwargs={
                **store_kwargs,
                "real_time": cfg.real_time_politeness,
                "rt_epoch": rt_epoch,
            },
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
        ).materialize()
        _tick("fetch", marks, tmark)

        n_fetched = results.count()
        n_ok = results.map_batches(
            lambda t: t.filter(pc.equal(t["status"], 200)), batch_format="pyarrow"
        ).count()
        _tick("counts", marks, tmark)

        # --- payload branch: image refs -> PURE image-seen/robots filter ->
        # exactly-once admission -> decode actor pool -> parquet sink.
        # Every map_batches body here is side-effect-free: Ray Data may
        # re-execute a task after block loss (lineage reconstruction), and a
        # retry that consulted its first attempt's check_and_add inserts
        # would filter its own rows out and silently drop images.  The
        # seen-set *mutation* therefore happens exactly once, driver-side.
        _md = cfg.max_depth
        img_cands = results.map_batches(
            # a page AT the depth cap fetches but yields neither links nor
            # images (oracle.crawl_oracle max_depth semantics)
            lambda t: t.filter(pc.less(t["depth"], _md)),
            batch_format="pyarrow",
        ).map_batches(extract_image_candidates, batch_format="pyarrow")

        def _img_prefilter(batch: pa.Table) -> pa.Table:
            """Pure contains() anti-join vs prior rounds + robots gate.

            Deliberate divergence from the oracle's bookkeeping: the oracle
            marks robots-DISALLOWED image refs 'seen' at first reference,
            while this pipeline never admits them (they are re-gated on
            every re-reference).  The robots verdict is stable, so the
            payload output is identical either way — only the internal
            image_seen set differs (it holds exactly the admitted
            candidates), which no conformance surface observes.
            """
            if batch.num_rows == 0:
                return batch
            keys = batch.column("url_hash").to_numpy(zero_copy_only=False)
            new = ~image_seen.contains(keys)
            hosts = batch.column("host").to_pylist()
            canons = batch.column("canon").to_pylist()
            ok = np.fromiter(
                (
                    driver_policies.allows(hosts[i], canons[i])
                    for i in range(batch.num_rows)
                ),
                dtype=bool,
                count=batch.num_rows,
            )
            return batch.filter(pa.array(new & ok, pa.bool_()))

        payload_dir = os.path.join(out_dir, f"round={rnd}")
        os.makedirs(payload_dir, exist_ok=True)
        from distributed_web_crawling_system_ray.sources.storage import (
            write_payload,
        )

        filtered_cands = img_cands.map_batches(
            _img_prefilter, batch_format="pyarrow"
        )
        small_round = frontier.num_rows <= cfg.driver_partition_limit

        # The payload and frontier branches are independent consumers of the
        # materialized fetch results — run the payload decode+write on a
        # driver thread so it overlaps the link dedup/admission (both just
        # submit Ray work; the two branches touch disjoint seen pools).
        payload_out: dict = {}

        def _payload_branch() -> None:
            if small_round:
                # driver-sized round: materialize the metadata-sized
                # candidate rows, dedup + admit once on the driver, then
                # stream the decode
                cparts = [
                    t
                    for t in ray.get(filtered_cands.materialize().to_arrow_refs())
                    if t.num_rows
                ]
                if cparts:
                    cand_tbl = dedup_first_by_hash(
                        pa.concat_tables(cparts).combine_chunks()
                    )
                    newm = ~image_seen.check_and_add(
                        cand_tbl.column("url_hash").to_numpy(zero_copy_only=False)
                    )
                    cand_tbl = cand_tbl.filter(pa.array(newm, pa.bool_()))
                else:
                    cand_tbl = pa.table(
                        {
                            "canon": pa.array([], pa.string()),
                            "url_hash": pa.array([], pa.uint64()),
                            "host": pa.array([], pa.string()),
                        }
                    )
                step = cfg.decode_batch_size
                cand_chunks = [
                    cand_tbl.slice(o, min(step, cand_tbl.num_rows - o))
                    for o in range(0, cand_tbl.num_rows, step)
                ] or [cand_tbl]
                payload_ds = ray.data.from_arrow(cand_chunks).map_batches(
                    decode_images,
                    fn_kwargs=store_kwargs,
                    batch_format="pyarrow",
                    batch_size=cfg.decode_batch_size,
                )
                write_payload(payload_ds, payload_dir)
                payload_out["n_images"] = sum(
                    pq.read_metadata(os.path.join(payload_dir, f)).num_rows
                    for f in os.listdir(payload_dir)
                    if f.endswith(".parquet")
                )
            else:
                # cluster-scale round: Dataset-native intra-round set-dedup
                # (bounded hash partition); the deduped candidates stay in
                # the object store (metadata-sized — the blobs only exist
                # downstream of decode) while ONLY their url_hash column is
                # pulled for the exactly-once driver admission.  Admission
                # happens at CANDIDATE time exactly like the driver-sized
                # path (oracle semantics: a dangling/undecodable ref is
                # 'seen' at first reference and never retried).
                deduped_mat = (
                    filtered_cands.map_batches(
                        add_hash_partition,
                        fn_kwargs={"P": cfg.dedup_partitions},
                        batch_format="pyarrow",
                    )
                    .groupby("part")
                    .map_groups(dedup_first_by_hash, batch_format="pyarrow")
                ).materialize()
                hparts = [
                    t
                    for t in ray.get(
                        deduped_mat.select_columns(["url_hash"])
                        .materialize()
                        .to_arrow_refs()
                    )
                    if t.num_rows
                ]
                if hparts:
                    keys = np.concatenate(
                        [
                            t.column("url_hash").to_numpy(zero_copy_only=False)
                            for t in hparts
                        ]
                    )
                    # all keys are new by construction (pure contains()
                    # prefilter + dedup, and only this driver thread mutates
                    # image_seen) — check_and_add is the admission record
                    image_seen.check_and_add(keys)
                payload_ds = deduped_mat.map_batches(
                    decode_images,
                    fn_kwargs=store_kwargs,
                    batch_format="pyarrow",
                    batch_size=cfg.decode_batch_size,
                )
                write_payload(payload_ds, payload_dir)
                payload_out["n_images"] = sum(
                    pq.read_metadata(os.path.join(payload_dir, f)).num_rows
                    for f in os.listdir(payload_dir)
                    if f.endswith(".parquet")
                )

        import threading

        payload_thread = threading.Thread(target=_run_guarded, args=(_payload_branch, payload_out))
        payload_thread.start()

        # --- frontier branch: outlinks -> canonicalize (+batch combiner) ->
        # pure seen prefilter -> first-seen dedup -> exactly-once admission.
        # The contains() prefilter runs BEFORE the dedup so revisited URLs
        # (the bulk of extracted links) never enter the exchange; min-rank
        # dedup then runs driver-side for driver-sized rounds (no shuffle —
        # the survivors are materialized here anyway) or through the bounded
        # groupby(url_hash % P) hash partition at cluster scale.
        def _seen_prefilter(batch: pa.Table) -> pa.Table:
            """PURE contains() anti-join (safe under Ray task retry — see the
            payload branch note); admission happens once below, driver-side."""
            if batch.num_rows == 0:
                return batch
            keys = batch.column("url_hash").to_numpy()
            new = ~seen.contains(keys)
            return batch.filter(pa.array(new, pa.bool_()))

        max_depth = cfg.max_depth

        def _depth_gate(batch: pa.Table) -> pa.Table:
            """Depth cap: children beyond cfg.max_depth never enqueue
            (matches oracle.crawl_oracle's max_depth semantics — a page AT
            the cap is fetched but not expanded)."""
            if batch.num_rows == 0:
                return batch
            return batch.filter(pc.less_equal(batch.column("depth"), max_depth))

        cands = (
            results.map_batches(extract_links, batch_format="pyarrow")
            .map_batches(_depth_gate, batch_format="pyarrow")
            .map_batches(_seen_prefilter, batch_format="pyarrow")
        )

        if small_round:
            nf_refs = ray.get(cands.materialize().to_arrow_refs())
        else:
            deduped = (
                cands.map_batches(
                    add_hash_partition,
                    fn_kwargs={"P": cfg.dedup_partitions},
                    batch_format="pyarrow",
                )
                .groupby("part")
                .map_groups(dedup_min_rank, batch_format="pyarrow")
            )
            nf_refs = ray.get(deduped.materialize().to_arrow_refs())
        _tick("links", marks, tmark)
        nf_refs = [t for t in nf_refs if t.num_rows]
        base_cols = ["url", "canon", "url_hash", "host", "depth", "rank_path"]
        if nf_refs:
            cand_frontier = pa.concat_tables(
                [t.select(base_cols) for t in nf_refs]
            ).combine_chunks()
            # one row per url_hash with the minimum (depth, rank_path): a
            # no-op re-check after the groupby path, the actual dedup on the
            # driver path
            cand_frontier = dedup_min_rank(cand_frontier)
            # exactly-once first-seen admission (post-dedup, so no
            # intra-call collisions)
            newm = ~seen.check_and_add(
                cand_frontier.column("url_hash").to_numpy(zero_copy_only=False)
            )
            new_frontier = cand_frontier.filter(pa.array(newm, pa.bool_()))
        else:
            new_frontier = frontier.slice(0, 0)
        n_links_new = new_frontier.num_rows

        # deferred rows re-enter the next round (already in the seen set)
        if n_deferred:
            deferred_tbl = sched_tbl.filter(
                pa.array(verdicts == DEFERRED, pa.bool_())
            ).select(base_cols)
            new_frontier = pa.concat_tables([new_frontier, deferred_tbl])

        payload_thread.join()
        if "error" in payload_out:
            raise payload_out["error"]
        n_images = payload_out["n_images"]
        _tick("payload_join", marks, tmark)

        m = {
            "round": rnd,
            "urls_scheduled": int(sched_tbl.num_rows),
            "urls_fetched": int(n_fetched),
            "urls_failed": int(n_fetched - n_ok),
            "urls_disallowed": n_disallowed,
            "urls_deferred": n_deferred,
            "links_new": int(n_links_new),
            "images_written": int(n_images),
            "wall_s": round(time.time() - t0, 3),
        }
        metrics.append(m)
        if timing:
            _tick("commit_pre", marks, tmark)
            print(f"[round {rnd}] " + " ".join(f"{k}={v}" for k, v in marks), flush=True)
        commit_round(
            work_dir,
            rnd,
            new_frontier=new_frontier,
            clocks=clocks,
            metrics=m,
            seen=seen,
            image_seen=image_seen,
        )
        frontier = new_frontier
        rnd += 1

    return CrawlResult(out_dir=out_dir, work_dir=work_dir, rounds=rnd, metrics=metrics)
