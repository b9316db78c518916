"""Real-HTTP web store: the live-deployment seam behind the fetch stage.

Implements the same store protocol as the synthetic ``WebStore``
(``fetch_batch`` / ``get_images_batch`` / ``fetch``) over a per-worker
``requests.Session`` — the reference's load-once-per-process session pool
(``crawler/crawler_node.py:79-83``: shared Session, UA header, ``timeout=10``,
redirects followed with the final ``response.url`` kept, the v1 semantics of
``archive/crawler_node.py:36-43``).  Selected by ``CrawlConfig.store_backend
= "http"``; the synthetic store remains the default (this sandbox has no
network — the class is exercised against an in-process HTTP fixture server
in ``tests/test_httpstore.py``).

Link extraction is stdlib ``html.parser`` in document order: ``<a href>`` →
outlinks, ``<img src>`` → image refs — the reference's
``soup.find_all('a', href=True)`` walk (``crawler/crawler_node.py:307-316``)
without the BeautifulSoup dependency.  Captions: a live image fetch carries
no caption; the referencing page's ``alt`` text is surfaced when the page
and image are fetched by the same store instance (alt-text map kept per
worker), else empty — the synthetic store's caption column plays this role
in tests/bench.

Robots stays schedule-side (the scheduler actors gate URLs before fetch),
exactly as in the synthetic path; fetching robots.txt live belongs to the
RobotsPolicies loader, not the fetch store.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _LinkParser(HTMLParser):
    """Document-order <a href> / <img src[, alt]> collector."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self.images: list[tuple[str, str]] = []  # (src, alt)

    def handle_starttag(self, tag: str, attrs) -> None:
        d = dict(attrs)
        if tag == "a" and d.get("href"):
            self.links.append(d["href"])
        elif tag == "img" and d.get("src"):
            self.images.append((d["src"], d.get("alt") or ""))


def parse_links(html_text: str) -> tuple[list[str], list[tuple[str, str]]]:
    p = _LinkParser()
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass  # salvage whatever parsed before the error (lenient, like bs4)
    return p.links, p.images


class HttpStore:
    """requests.Session-backed store with the WebStore batch protocol."""

    def __init__(self, user_agent: str = "RayCrawler/2.0", timeout_s: float = 10.0):
        import requests

        self._session = requests.Session()
        self._session.headers["User-Agent"] = user_agent
        self.timeout_s = timeout_s
        # canonical image URL -> alt text seen on a referencing page.
        # Bounded: the store lives for the whole worker process, and a long
        # crawl would otherwise grow this one entry per alt'd image until
        # OOM.  Captions are best-effort over HTTP, so dropping old entries
        # only degrades captions, never correctness.
        self._alt: dict[str, str] = {}
        self._alt_cap = 100_000

    def fetch(self, canon_url: str) -> dict:
        """One GET: redirects followed, final response.url kept (v1
        semantics); network errors surface as status -1 like a timeout."""
        try:
            r = self._session.get(canon_url, timeout=self.timeout_s)
        except Exception:
            return {
                "status": -1,
                "final_url": canon_url,
                "outlinks": [],
                "image_refs": [],
            }
        outlinks: list[str] = []
        image_refs: list[str] = []
        if r.status_code == 200 and "html" in r.headers.get("Content-Type", "html"):
            outlinks, imgs = parse_links(r.text)
            from distributed_web_crawling_system_ray.functions.canon import canonicalize

            if len(self._alt) > self._alt_cap:
                self._alt.clear()
            for src, alt in imgs:
                image_refs.append(src)
                c = canonicalize(src, r.url)
                if c is not None and alt:
                    self._alt[c] = alt
        return {
            "status": int(r.status_code),
            "final_url": r.url,
            "outlinks": outlinks,
            "image_refs": image_refs,
        }

    def fetch_batch(self, canons: list[str]) -> dict[str, list]:
        status: list[int] = []
        finals: list[str] = []
        outlinks: list[list[str]] = []
        image_refs: list[list[str]] = []
        for c in canons:
            res = self.fetch(c)
            status.append(res["status"])
            finals.append(res["final_url"])
            outlinks.append(res["outlinks"])
            image_refs.append(res["image_refs"])
        return {
            "status": status,
            "final_url": finals,
            "outlinks": outlinks,
            "image_refs": image_refs,
        }

    def get_images_batch(self, canons: list[str]) -> dict[str, list]:
        """GET image bytes; non-200s are dropped (dangling ref semantics)."""
        out_c: list[str] = []
        out_b: list[bytes] = []
        out_cap: list[str] = []
        for c in canons:
            try:
                r = self._session.get(c, timeout=self.timeout_s)
            except Exception:
                continue
            if r.status_code != 200:
                continue
            out_c.append(c)
            out_b.append(r.content)
            out_cap.append(self._alt.get(c, ""))
        return {"canon": out_c, "bytes": out_b, "caption": out_cap}
