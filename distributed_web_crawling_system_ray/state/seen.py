"""Sharded URL-seen actor pool — the semantic heart of the crawler.

Replaces the reference master's single in-memory ``seen_urls`` set and its
check-then-add loop (``master/master_node.py:44-45,62-67,167-173``) with K Ray
actors, each owning a bloom pre-filter + cuckoo filter over 64-bit canonical
URL hashes.  Routing is ``url_hash % K`` — a broadcast-free stateful
anti-join (SURVEY §2.4 J1): membership RPCs go only to the owning shard, so
dedup never requires an all-to-all shuffle of the candidate set.

Mutation discipline: ``check_and_add`` is called ONLY from driver code (once
per round / seed batch), never from inside retryable Ray Data tasks — a
retried task would see its first attempt's inserts and filter its own rows
out, silently dropping URLs (lineage reconstruction loses the original
output).  Tasks use the pure ``contains`` anti-join; the driver admits the
materialized survivors exactly once.

Scale note: 10^10 keys / K=32 shards ≈ 3.1e8 keys/shard ≈ 1.7 GB/shard at
~5.3 B/key — sized explicitly, snapshotted to the round checkpoint
(actor heap state is not covered by object-store spilling).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import ray


@ray.remote(num_cpus=0)
class UrlSeenShard:
    # num_cpus=0: a pure state server — RPC work is short and bursty, and
    # reserving whole cores for K shards would starve the map stages on a
    # fixed-size node.  Placement spreads via Ray's default SPREAD for actors.
    """One shard: bloom pre-filter (cheap definitely-new test) + cuckoo filter
    (compact membership, no false negatives) over url_hash keys."""

    def __init__(self, shard_id: int, cuckoo_capacity: int, bloom_bits: int):
        from distributed_web_crawling_system_ray.state.filters import (
            BloomFilter,
            CuckooFilter,
        )

        self.shard_id = shard_id
        self.bloom = BloomFilter(n_bits=bloom_bits)
        self.cuckoo = CuckooFilter(capacity=cuckoo_capacity, seed=0x5EED ^ shard_id)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Returns True where already seen; unseen keys become seen."""
        keys = np.asarray(keys, dtype=np.uint64)
        maybe = self.bloom.contains(keys)  # False -> definitely new
        seen = np.zeros(len(keys), dtype=bool)
        if maybe.any():
            idx = np.flatnonzero(maybe)
            seen[idx] = self.cuckoo.check_and_add(keys[idx])
        new_idx = np.flatnonzero(~maybe)
        if len(new_idx):
            # bloom said "definitely new" — but the cuckoo's verdict must
            # still be kept: an INTRA-batch duplicate (same key twice in one
            # call, both missing from the bloom) is "seen" on its second
            # occurrence.  Discarding this once produced duplicate payload
            # rows whenever two pages referencing the same image landed in
            # one coalesced filter batch.
            seen[new_idx] = self.cuckoo.check_and_add(keys[new_idx])
        self.bloom.add(keys[~seen])
        return seen

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self.cuckoo.contains(np.asarray(keys, dtype=np.uint64))

    def count(self) -> int:
        return self.cuckoo.count

    def snapshot(self, path: str) -> str:
        state = {
            "shard_id": self.shard_id,
            "bloom": self.bloom.snapshot_state(),
            "cuckoo": self.cuckoo.snapshot_state(),
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f, protocol=4)
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> int:
        from distributed_web_crawling_system_ray.state.filters import (
            BloomFilter,
            CuckooFilter,
        )

        with open(path, "rb") as f:
            state = pickle.load(f)
        self.shard_id = int(state["shard_id"])
        self.bloom = BloomFilter.restore_state(state["bloom"])
        self.cuckoo = CuckooFilter.restore_state(state["cuckoo"])
        return self.cuckoo.count


class SeenPool:
    """Driver-/task-side handle over the K shards.

    The handle (actor refs only) is cheap to capture in ``map_batches``
    closures; each batched call fans out at most one RPC per shard.
    """

    def __init__(self, shards: list):
        self.shards = shards
        self.k = len(shards)

    @classmethod
    def create(
        cls, k: int, cuckoo_capacity: int = 1 << 16, bloom_bits: int = 1 << 20
    ) -> "SeenPool":
        return cls(
            [UrlSeenShard.remote(i, cuckoo_capacity, bloom_bits) for i in range(k)]
        )

    def _route(self, keys: np.ndarray) -> np.ndarray:
        return (keys % np.uint64(self.k)).astype(np.int64)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Batched first-seen across shards; preserves input order."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        owner = self._route(keys)
        out = np.zeros(len(keys), dtype=bool)
        refs, idxs = [], []
        for s in range(self.k):
            idx = np.flatnonzero(owner == s)
            if len(idx):
                refs.append(self.shards[s].check_and_add.remote(keys[idx]))
                idxs.append(idx)
        for idx, res in zip(idxs, ray.get(refs)):
            out[idx] = res
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        owner = self._route(keys)
        out = np.zeros(len(keys), dtype=bool)
        refs, idxs = [], []
        for s in range(self.k):
            idx = np.flatnonzero(owner == s)
            if len(idx):
                refs.append(self.shards[s].contains.remote(keys[idx]))
                idxs.append(idx)
        for idx, res in zip(idxs, ray.get(refs)):
            out[idx] = res
        return out

    def total(self) -> int:
        return sum(ray.get([s.count.remote() for s in self.shards]))

    def snapshot(self, directory: str) -> list[str]:
        os.makedirs(directory, exist_ok=True)
        return ray.get(
            [
                s.snapshot.remote(os.path.join(directory, f"seen_shard_{i}.pkl"))
                for i, s in enumerate(self.shards)
            ]
        )

    def restore(self, directory: str) -> int:
        return sum(
            ray.get(
                [
                    s.restore.remote(os.path.join(directory, f"seen_shard_{i}.pkl"))
                    for i, s in enumerate(self.shards)
                ]
            )
        )
