"""Real-HTTP fetch seam: HttpStore against an in-process HTTP fixture server.

Proves the deployment seam (CrawlConfig.store_backend="http") end to end:
requests.Session fetching with redirect-following and final response.url,
document-order link/image extraction via the stdlib parser, image bytes +
alt-caption plumbing, and the same map_batches stages running unchanged on
the HTTP backend.
"""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pyarrow as pa
import pytest

from distributed_web_crawling_system_ray.functions.canon import host_of, url_hash
from distributed_web_crawling_system_ray.functions.codec import encode_png

PNG = encode_png(np.full((4, 6, 3), 99, dtype=np.uint8))

PAGES = {
    "/": (
        "<html><body>"
        '<a href="/a.html">A</a>'
        '<a href="/b.html">B</a>'
        '<img src="/img/one.png" alt="first image">'
        '<a href="/missing.html">gone</a>'
        "</body></html>"
    ),
    "/a.html": '<html><a href="/">home</a><img src="/img/one.png"></html>',
    "/b.html": "<html>no links here</html>",
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (stdlib API name)
        if self.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/a.html")
            self.end_headers()
            return
        if self.path == "/img/one.png":
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(PNG)
            return
        body = PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def http_site():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    yield base
    srv.shutdown()


def test_http_fetch_batch_semantics(http_site):
    from distributed_web_crawling_system_ray.sources.httpstore import HttpStore

    store = HttpStore()
    res = store.fetch_batch(
        [f"{http_site}/", f"{http_site}/redir", f"{http_site}/missing.html"]
    )
    assert res["status"] == [200, 200, 404]
    # redirect followed; final response.url kept (v1 semantics)
    assert res["final_url"][1] == f"{http_site}/a.html"
    # document-order outlinks and image refs
    assert res["outlinks"][0] == ["/a.html", "/b.html", "/missing.html"]
    assert res["image_refs"][0] == ["/img/one.png"]
    assert res["outlinks"][2] == []


def test_http_images_and_alt_caption(http_site):
    from distributed_web_crawling_system_ray.sources.httpstore import HttpStore

    store = HttpStore()
    store.fetch(f"{http_site}/")  # records the alt text for the image
    got = store.get_images_batch(
        [f"{http_site}/img/one.png", f"{http_site}/img/nope.png"]
    )
    assert got["canon"] == [f"{http_site}/img/one.png"]
    assert got["bytes"] == [PNG]
    assert got["caption"] == ["first image"]


def test_http_backend_through_map_batches_stages(http_site, ray_session):
    """The unchanged fetch_pages + decode_images stages run on the HTTP
    backend end to end (frontier in -> decoded payload rows out)."""
    import ray

    from distributed_web_crawling_system_ray.stages.fetch import (
        decode_images,
        extract_image_candidates,
        fetch_pages,
    )

    url = f"{http_site}/"
    frontier = pa.table(
        {
            "url": [url],
            "canon": [url],
            "url_hash": pa.array([url_hash(url)], pa.uint64()),
            "host": [host_of(url)],
            "depth": pa.array([0], pa.int32()),
            "rank_path": pa.array([b"\x00\x00\x00"], pa.binary()),
        }
    )
    kw = {"store_backend": "http", "timeout_s": 5.0}
    payload = (
        ray.data.from_arrow(frontier)
        .map_batches(fetch_pages, fn_kwargs=kw, batch_format="pyarrow")
        .map_batches(extract_image_candidates, batch_format="pyarrow")
        .map_batches(decode_images, fn_kwargs=kw, batch_format="pyarrow")
    )
    rows = payload.take_all()
    assert len(rows) == 1
    assert rows[0]["w"] == 6 and rows[0]["h"] == 4 and rows[0]["fmt"] == "png"


def test_full_crawl_over_http_backend(http_site, ray_session, tmp_path):
    """End-to-end BFS crawl with store_backend="http": seeds + robots come
    from a fixture dir, pages and images from the live (in-process) HTTP
    server — discovery, dedup, politeness scheduling, decode and the
    partitioned payload sink all run unchanged."""
    import pyarrow.parquet as pq

    from distributed_web_crawling_system_ray.config import CrawlConfig
    from distributed_web_crawling_system_ray.pipelines.crawl import run_crawl

    fixture = str(tmp_path / "http_fixture")
    import os

    os.makedirs(fixture)
    seed = f"{http_site}/"
    pq.write_table(
        pa.table(
            {
                "url": [seed],
                "seed_rank": pa.array([0], pa.int64()),
                "canon": [seed],
            }
        ),
        os.path.join(fixture, "seeds.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "host": ["127.0.0.1"],
                "disallow": pa.array([[]], pa.list_(pa.string())),
                "crawl_delay_ms": pa.array([1000], pa.int32()),
                "fetch_fails": pa.array([False], pa.bool_()),
            }
        ),
        os.path.join(fixture, "robots.parquet"),
    )

    result = run_crawl(
        fixture,
        CrawlConfig(seen_shards=2, store_backend="http"),
        work_dir=str(tmp_path / "work"),
    )
    # BFS: / -> {/a.html, /b.html, /missing.html}; /a.html -> / (seen)
    hist = result.frontier_history()
    seen = set(hist.column("canon").to_pylist())
    assert seen == {
        seed,
        f"{http_site}/a.html",
        f"{http_site}/b.html",
        f"{http_site}/missing.html",
    }
    m_total = {
        "fetched": sum(m["urls_fetched"] for m in result.metrics),
        "failed": sum(m["urls_failed"] for m in result.metrics),
    }
    assert m_total["fetched"] == 4 and m_total["failed"] == 1  # /missing 404s
    payload = result.payload_dataset().to_pandas()
    # one distinct image (referenced by / and /a.html, deduped), decoded
    assert len(payload) == 1
    assert payload.iloc[0]["w"] == 6 and payload.iloc[0]["h"] == 4
    # alt-caption is best-effort over HTTP: present when the page fetch and
    # the image decode land on the same worker process (documented in
    # sources/httpstore.py), empty otherwise
    assert payload.iloc[0]["caption"] in ("", "first image")


ROBOTS_TXT = (
    "# fixture robots\n"
    "User-agent: RayCrawlBot\n"
    "Disallow: /b.html\n"
    "Crawl-delay: 2\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /\n"
)
PAGES["/robots.txt"] = ROBOTS_TXT


def test_parse_robots_txt_groups_and_ua_matching():
    from distributed_web_crawling_system_ray.state.robots import parse_robots_txt

    dis, delay = parse_robots_txt(ROBOTS_TXT, "RayCrawlBot/1.0")
    assert dis == ("/b.html",) and delay == 2000  # specific group wins
    dis, delay = parse_robots_txt(ROBOTS_TXT, "SomeOtherBot/3.1")
    assert dis == ("/",) and delay is None  # falls back to the * group
    assert parse_robots_txt("", "x") == ((), None)
    # multiple agents sharing one group; comments stripped
    dis, delay = parse_robots_txt(
        "User-agent: a\nUser-agent: b\nDisallow: /x  # inline\nCrawl-delay: 1.5\n",
        "B/2",
    )
    assert dis == ("/x",) and delay == 1500


def test_parse_robots_txt_unhandled_directives_close_groups():
    """r2 ADVICE: an Allow/Sitemap line must end the agent block — a later
    User-agent starts a NEW group; B's Disallow never applies to A."""
    from distributed_web_crawling_system_ray.state.robots import parse_robots_txt

    txt = (
        "User-agent: alpha\n"
        "Allow: /x\n"
        "User-agent: beta\n"
        "Disallow: /y\n"
    )
    assert parse_robots_txt(txt, "Alpha/1.0") == ((), None)
    assert parse_robots_txt(txt, "Beta/1.0") == (("/y",), None)
    # Sitemap between groups likewise separates them
    txt2 = "User-agent: a\nSitemap: http://e/s.xml\nUser-agent: b\nDisallow: /z\n"
    assert parse_robots_txt(txt2, "A/1") == ((), None)
    assert parse_robots_txt(txt2, "B/1") == (("/z",), None)


def test_parse_robots_txt_longest_agent_token_wins():
    """RFC 9309 most-specific group: the LONGEST matching token, not the
    first in file order."""
    from distributed_web_crawling_system_ray.state.robots import parse_robots_txt

    txt = (
        "User-agent: ray\n"
        "Disallow: /generic\n"
        "\n"
        "User-agent: raycrawlbot\n"
        "Disallow: /specific\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    assert parse_robots_txt(txt, "RayCrawlBot/1.0") == (("/specific",), None)
    assert parse_robots_txt(txt, "ray-lite/0.1") == (("/generic",), None)
    assert parse_robots_txt(txt, "Unrelated/9") == (("/",), None)


def test_live_robots_fetch_and_crawl_honors_disallow(
    http_site, ray_session, tmp_path
):
    """fetch_robots_http builds the same robots table the fixture provides;
    a full HTTP crawl with it never fetches the disallowed path and applies
    the robots crawl delay in its schedule."""
    import os

    import pyarrow.parquet as pq

    from distributed_web_crawling_system_ray.config import CrawlConfig
    from distributed_web_crawling_system_ray.pipelines.crawl import run_crawl
    from distributed_web_crawling_system_ray.state.robots import (
        RobotsPolicies,
        fetch_robots_http,
    )

    host_port = http_site.split("://", 1)[1]
    host = host_port.split(":")[0]
    # fetch_robots_http takes host[:port] authority strings for the URL but
    # the politeness/robots key is the bare host
    robots = fetch_robots_http([host_port], user_agent="RayCrawlBot/1.0")
    robots = robots.set_column(
        0, "host", pa.array([host], pa.string())
    )
    pol = RobotsPolicies.from_table(robots)
    assert not pol.allows(host, f"{http_site}/b.html")
    assert pol.allows(host, f"{http_site}/a.html")
    assert pol.delay_ms(host) == 2000

    fixture = str(tmp_path / "live_fixture")
    os.makedirs(fixture)
    seed = f"{http_site}/"
    pq.write_table(
        pa.table(
            {
                "url": [seed],
                "seed_rank": pa.array([0], pa.int64()),
                "canon": [seed],
            }
        ),
        os.path.join(fixture, "seeds.parquet"),
    )
    pq.write_table(robots, os.path.join(fixture, "robots.parquet"))

    result = run_crawl(
        fixture,
        CrawlConfig(seen_shards=2, store_backend="http"),
        work_dir=str(tmp_path / "work"),
    )
    sched = result.schedule_history()
    fetched = {
        c
        for c, v in zip(
            sched.column("canon").to_pylist(), sched.column("verdict").to_pylist()
        )
        if v == 0
    }
    assert f"{http_site}/b.html" not in fetched  # robots gate held
    assert f"{http_site}/a.html" in fetched
    assert sum(m["urls_disallowed"] for m in result.metrics) >= 1
