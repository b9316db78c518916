"""Bloom/cuckoo filter unit tests (SURVEY §5 item 1): no false negatives,
bounded false positives, idempotent check_and_add, snapshot/restore."""

import numpy as np

from distributed_web_crawling_system_ray.state.filters import BloomFilter, CuckooFilter

RNG = np.random.default_rng(7)


def test_bloom_no_false_negatives():
    f = BloomFilter(n_bits=1 << 16)
    keys = RNG.integers(0, 2**63, size=2000, dtype=np.uint64)
    f.add(keys)
    assert f.contains(keys).all()


def test_bloom_fp_rate_bounded():
    f = BloomFilter(n_bits=1 << 20)
    keys = RNG.integers(0, 2**63, size=10_000, dtype=np.uint64)
    f.add(keys)
    other = RNG.integers(0, 2**63, size=10_000, dtype=np.uint64)
    fp = f.contains(other).mean()
    assert fp < 0.01, fp


def test_cuckoo_check_and_add_semantics():
    f = CuckooFilter(capacity=1 << 14)
    keys = RNG.integers(0, 2**63, size=5000, dtype=np.uint64)
    first = f.check_and_add(keys)
    assert not first.any()  # all new
    again = f.check_and_add(keys)
    assert again.all()  # idempotent: everything now seen
    assert f.contains(keys).all()  # no false negatives
    assert f.count == 5000


def test_cuckoo_intra_batch_duplicates():
    f = CuckooFilter(capacity=1 << 10)
    keys = np.array([42, 42, 7, 42, 7], dtype=np.uint64)
    seen = f.check_and_add(keys)
    assert list(seen) == [False, True, False, True, True]


def test_cuckoo_fp_rate_tiny():
    f = CuckooFilter(capacity=1 << 16)
    keys = RNG.integers(0, 2**63, size=30_000, dtype=np.uint64)
    f.check_and_add(keys)
    other = RNG.integers(0, 2**63, size=50_000, dtype=np.uint64)
    fps = int(f.contains(other).sum())
    # 32-bit fingerprints: expected FP ~ 50k * 8 * 2^-32 ~= 1e-4
    assert fps <= 2, fps


def test_cuckoo_overflow_keeps_exactness():
    # force saturation: tiny capacity, many keys -> stash absorbs overflow
    f = CuckooFilter(capacity=256)
    keys = RNG.integers(0, 2**63, size=2000, dtype=np.uint64)
    f.check_and_add(keys)
    assert f.contains(keys).all()  # still no false negatives


def test_snapshot_restore_roundtrip():
    f = CuckooFilter(capacity=1 << 12)
    b = BloomFilter(n_bits=1 << 14)
    keys = RNG.integers(0, 2**63, size=3000, dtype=np.uint64)
    f.check_and_add(keys)
    b.add(keys)
    f2 = CuckooFilter.restore_state(f.snapshot_state())
    b2 = BloomFilter.restore_state(b.snapshot_state())
    assert f2.contains(keys).all()
    assert b2.contains(keys).all()
    assert f2.count == f.count
    # restored filter keeps behaving identically on new inserts
    more = RNG.integers(0, 2**63, size=100, dtype=np.uint64)
    assert (f.check_and_add(more) == f2.check_and_add(more)).all()


def test_shard_intra_batch_duplicates(ray_session):
    """Regression: intra-batch duplicates through the SHARD (bloom-cold path)
    must be flagged seen on their second occurrence — the discarded-return
    bug produced duplicate payload rows at t2 scale."""
    import ray

    from distributed_web_crawling_system_ray.state.seen import SeenPool

    pool = SeenPool.create(2)
    keys = np.array([111, 222, 111, 333, 222, 111], dtype=np.uint64)
    seen = pool.check_and_add(keys)
    assert list(seen) == [False, False, True, False, True, True]
    # and fully seen on a second call
    assert pool.check_and_add(keys).all()
