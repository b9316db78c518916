"""Approximate-membership filters for the URL-seen state.

The reference keeps one unbounded in-memory Python set on the master
(``master/master_node.py:44-45`` — ~100 B/URL, caps out around 10^7 URLs; a
defect flagged in SURVEY §4.3).  At 10^10-frontier scale the seen state must
be (a) sharded, (b) compact, (c) snapshottable.  Design:

- **BloomFilter** — numpy bit array, k=4 double-hashed probes; cheap
  *definitely-new* pre-check in front of the cuckoo filter.
- **CuckooFilter** — 4-slot buckets, 32-bit fingerprints, partial-key cuckoo
  hashing with an exact stash fallback so membership NEVER has false
  negatives (a false negative would re-crawl; a false positive only skips a
  URL).  With 32-bit fingerprints the per-lookup FP probability is
  ~8·2^-32 ≈ 2e-9 — statistically exact at test scale (the conformance gate)
  and ~20 expected skipped URLs over a 10^10-URL crawl, at ~5.3 bytes/key.

Both support ``snapshot_state()`` / ``restore_state()`` for round
checkpoints.  Pure numpy — no Ray dependency (unit-testable in isolation).
"""

from __future__ import annotations

import numpy as np

_FP_MASK = np.uint64(0xFFFFFFFF)


def _mix(h: np.ndarray) -> np.ndarray:
    """64-bit finalizer (splitmix64-style) to decorrelate derived probes."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 20, k: int = 4):
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.n_bits = n_bits
        self.k = k
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)

    def _probes(self, keys: np.ndarray) -> np.ndarray:
        h1 = _mix(keys)
        h2 = _mix(keys ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        idx = np.empty((self.k, len(keys)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) & np.uint64(self.n_bits - 1)
        return idx

    def add(self, keys: np.ndarray) -> None:
        idx = self._probes(keys)
        w = (idx >> np.uint64(6)).astype(np.int64)
        b = np.uint64(1) << (idx & np.uint64(63))
        for i in range(self.k):
            np.bitwise_or.at(self.words, w[i], b[i])

    def contains(self, keys: np.ndarray) -> np.ndarray:
        idx = self._probes(keys)
        w = (idx >> np.uint64(6)).astype(np.int64)
        b = np.uint64(1) << (idx & np.uint64(63))
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            out &= (self.words[w[i]] & b[i]) != 0
        return out

    def snapshot_state(self) -> dict:
        return {"n_bits": self.n_bits, "k": self.k, "words": self.words.copy()}

    @classmethod
    def restore_state(cls, state: dict) -> "BloomFilter":
        f = cls(int(state["n_bits"]), int(state["k"]))
        f.words = np.asarray(state["words"], dtype=np.uint64).copy()
        return f


class CuckooFilter:
    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 16, seed: int = 0x5EED):
        # buckets as a (n_buckets, 4) uint64 table of fingerprints; 0 = empty
        nb = 1
        while nb * self.SLOTS < capacity:
            nb <<= 1
        self.n_buckets = nb
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint64)
        # overflow stash of (bucket, fingerprint) pairs — preserves the
        # no-false-negative guarantee when an eviction chain fails
        self.stash: set[tuple[int, int]] = set()
        self.count = 0
        self._rng = np.random.default_rng(seed)

    def _fp(self, keys: np.ndarray) -> np.ndarray:
        f = _mix(keys) & _FP_MASK
        return np.where(f == 0, np.uint64(1), f)  # 0 is the empty marker

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        alt = np.asarray(i1, dtype=np.uint64) ^ _mix(np.asarray(fp, dtype=np.uint64))
        return (alt & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._i2(i1, fp)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.stash:
            for j in np.flatnonzero(~hit):
                if (int(i1[j]), int(fp[j])) in self.stash or (
                    int(i2[j]),
                    int(fp[j]),
                ) in self.stash:
                    hit[j] = True
        return hit

    def _insert_one(self, fp: int, i1: int, i2: int) -> None:
        for b in (i1, i2):
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return
        # eviction chain: displace a random resident to its alternate bucket
        b = i1 if self._rng.integers(2) else i2
        cur = np.uint64(fp)
        for _ in range(self.MAX_KICKS):
            s = int(self._rng.integers(self.SLOTS))
            cur, self.table[b, s] = self.table[b, s], cur
            b = int(
                (np.uint64(b) ^ _mix(np.asarray([cur], dtype=np.uint64))[0])
                & np.uint64(self.n_buckets - 1)
            )
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                return
        # chain failed: `cur` (some resident's fingerprint, currently valid
        # for bucket b / its alternate) goes to the exact stash so its owner
        # never sees a false negative
        self.stash.add((b, int(cur)))

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Batch first-seen test: returns True where the key was ALREADY
        present; inserts unseen keys.  Idempotent; intra-batch duplicates
        resolve first-occurrence-wins."""
        keys = np.asarray(keys, dtype=np.uint64)
        seen = self.contains(keys)
        new_idx = np.flatnonzero(~seen)
        if len(new_idx) == 0:
            return seen
        fp = self._fp(keys[new_idx])
        i1 = self._i1(keys[new_idx])
        i2 = self._i2(i1, fp)
        inserted_fp: set[tuple[int, int]] = set()
        for j in range(len(new_idx)):
            sig = (int(i1[j]), int(fp[j]))
            if sig in inserted_fp:  # intra-batch duplicate
                seen[new_idx[j]] = True
                continue
            inserted_fp.add(sig)
            self._insert_one(int(fp[j]), int(i1[j]), int(i2[j]))
            self.count += 1
        return seen

    def snapshot_state(self) -> dict:
        stash = np.array(sorted(self.stash), dtype=np.uint64).reshape(-1, 2)
        return {
            "n_buckets": self.n_buckets,
            "table": self.table.copy(),
            "stash": stash,
            "count": self.count,
            "rng": self._rng.bit_generator.state,
        }

    @classmethod
    def restore_state(cls, state: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.n_buckets = int(state["n_buckets"])
        f.table = np.asarray(state["table"], dtype=np.uint64).copy()
        f.stash = {
            (int(a), int(b))
            for a, b in np.asarray(state["stash"], dtype=np.uint64).reshape(-1, 2)
        }
        f.count = int(state["count"])
        f._rng = np.random.default_rng()
        f._rng.bit_generator.state = state["rng"]
        return f
