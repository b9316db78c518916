"""Table-driven canonicalization tests (SURVEY.md §5 item 1).

Semantics under test mirror the reference link extractor
(crawler/crawler_node.py:307-316: urljoin + fragment strip + http(s) filter)
extended with full RFC-3986 normalization.
"""

import numpy as np
import pytest

from distributed_web_crawling_system_ray.functions.canon import (
    canonicalize,
    canonicalize_batch,
    host_of,
    md5_hex,
    url_hash,
)

CASES = [
    # (url, base, expected)
    ("http://example.com", None, "http://example.com/"),
    ("HTTP://Example.COM/Path", None, "http://example.com/Path"),
    ("http://example.com:80/a", None, "http://example.com/a"),
    ("https://example.com:443/a", None, "https://example.com/a"),
    ("http://example.com:8080/a", None, "http://example.com:8080/a"),
    ("http://example.com/a#frag", None, "http://example.com/a"),
    ("http://example.com/a?q=1#frag", None, "http://example.com/a?q=1"),
    ("http://example.com/a/./b/../c", None, "http://example.com/a/c"),
    ("http://example.com/a/b/..", None, "http://example.com/a/"),
    ("http://example.com./x", None, "http://example.com/x"),
    ("  http://example.com/sp  ", None, "http://example.com/sp"),
    ("ftp://example.com/x", None, None),
    ("mailto:bob@example.com", "http://e.com/", None),
    ("javascript:void(0)", "http://e.com/", None),
    ("", None, None),
    ("http://", None, None),
    ("http://example.com:badport/x", None, None),
    # relative resolution against a base (document order extraction)
    ("b.html", "http://e.com/dir/a.html", "http://e.com/dir/b.html"),
    ("/root.html", "http://e.com/dir/a.html", "http://e.com/root.html"),
    ("../up.html", "http://e.com/dir/sub/a.html", "http://e.com/dir/up.html"),
    ("//other.com/x", "https://e.com/a", "https://other.com/x"),
    ("?q=2", "http://e.com/a?q=1", "http://e.com/a?q=2"),
    ("#frag", "http://e.com/a", "http://e.com/a"),
    # trailing space ahead of a fragment must not survive (idempotence)
    ("http://e.com/a #frag", None, "http://e.com/a"),
]


@pytest.mark.parametrize("url,base,expected", CASES)
def test_canonicalize(url, base, expected):
    assert canonicalize(url, base) == expected


def test_idempotent():
    for url, base, expected in CASES:
        if expected is not None:
            assert canonicalize(expected) == expected


def test_host_of():
    assert host_of("http://example.com:8080/a/b") == "example.com"
    assert host_of("https://sub.e.com/") == "sub.e.com"


def test_hash_stability():
    # pinned value: must never change across versions (checkpoint compat)
    h1 = url_hash("http://example.com/")
    assert h1 == 0xA6BF1757FFF057F2
    assert url_hash("http://example.com/a") != h1
    # url_hash is the top 8 bytes of the md5 content address (image_id scheme)
    assert md5_hex("http://example.com/")[:16] == format(h1, "016x")


def test_batch_matches_scalar():
    urls = [u for u, b, _ in CASES if b is None]
    canons, hashes, hosts = canonicalize_batch(urls)
    for i, u in enumerate(urls):
        c = canonicalize(u)
        assert canons[i] == c
        if c is not None:
            assert hashes[i] == np.uint64(url_hash(c))
            assert hosts[i] == host_of(c)
        else:
            assert hashes[i] == 0
