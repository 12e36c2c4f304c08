"""Hermetic live-HTTP e2e (round-6 verdict Next round #5): a stdlib
``http.server`` fixture serving FAKEDOC bytes with canned headers drives
the FULL pipeline over ``http://127.0.0.1`` — success, robots-blocked,
agent-scoped robots, 404, and timeout-then-retry all flow through the
REAL ``urllib.request`` path (reference `downloader.py:20-66` semantics),
not the file:// shortcut the other e2e uses."""

from __future__ import annotations

import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pyspark.sql import functions as F

from doc2dataset_spark.config import DownloadConfig
from doc2dataset_spark.plans.pipeline import build_pipeline
from tests.fixtures import fakedoc

UA_TOKEN = "testcrawler"
DOC = fakedoc(
    ["one two three four five six seven eight nine ten eleven twelve"]
)


class _Handler(BaseHTTPRequestHandler):
    hits: dict[str, int] = {}
    lock = threading.Lock()

    def _count(self) -> int:
        with self.lock:
            n = self.hits.get(self.path, 0) + 1
            self.hits[self.path] = n
        return n

    def _send_doc(self, extra_headers: list[tuple[str, str]] = ()) -> None:
        self.send_response(200)
        for k, v in extra_headers:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(DOC)))
        self.end_headers()
        self.wfile.write(DOC)

    def do_GET(self) -> None:  # noqa: N802 — http.server API
        self._count()
        if self.path == "/ok.fake":
            self._send_doc()
        elif self.path == "/robots.fake":
            # unscoped directive: applies to every agent -> blocked
            self._send_doc([("X-Robots-Tag", "noindex")])
        elif self.path == "/robots_other.fake":
            # scoped to a DIFFERENT agent -> allowed for us
            self._send_doc([("X-Robots-Tag", "otherbot: noindex, noai")])
        elif self.path == "/robots_us.fake":
            # scoped to OUR user_agent_token -> blocked
            self._send_doc([("X-Robots-Tag", f"{UA_TOKEN}: noai")])
        elif self.path == "/missing.fake":
            self.send_error(404)
        elif self.path == "/flaky.fake":
            # first request 500s; the retry succeeds (S10)
            if self.hits[self.path] == 1:
                self.send_error(500)
            else:
                self._send_doc()
        elif self.path == "/slow.fake":
            time.sleep(3)  # > cfg.timeout -> socket timeout on read
            self._send_doc()
        else:
            self.send_error(404)

    def log_message(self, *args) -> None:  # silence test output
        pass


@pytest.fixture(scope="module")
def http_root():
    _Handler.hits = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    thread.join(timeout=5)


def test_http_status_taxonomy_through_real_urllib(
    spark, http_root, tmp_path
):
    urls = [
        f"{http_root}/ok.fake",
        f"{http_root}/robots.fake",
        f"{http_root}/robots_other.fake",
        f"{http_root}/robots_us.fake",
        f"{http_root}/missing.fake",
        f"{http_root}/flaky.fake",
        f"{http_root}/slow.fake",
    ]
    url_list = tmp_path / "urls.txt"
    url_list.write_text("\n".join(urls) + "\n")
    cfg = DownloadConfig(
        url_list=str(url_list),
        output_folder=str(tmp_path / "out"),
        input_format="txt",
        user_agent_token=UA_TOKEN,
        timeout=1,
        retries=1,
        get_language=False,
        compute_hash="sha256",
        # the fixture docs are tiny (12 words): disable the reference's
        # default min-100-words page filter, which is not under test here
        min_words_per_page=None,
        max_images_per_page=None,
    )
    rows = {
        r["url"].rsplit("/", 1)[-1]: r.asDict()
        for r in build_pipeline(spark, cfg).collect()
    }
    assert len(rows) == 7

    # plain success through a real HTTP GET
    ok = rows["ok.fake"]
    assert ok["status"] == "success"
    assert ok["total_words"] == 12
    assert ok["sha256"] is not None

    # unscoped X-Robots-Tag directive blocks (S11)
    blocked = rows["robots.fake"]
    assert blocked["status"] == "failed_to_download"
    assert "X-Robots-Tag" in blocked["error_message"]

    # directive scoped to another agent does NOT block us
    assert rows["robots_other.fake"]["status"] == "success"

    # directive scoped to OUR token blocks us
    us = rows["robots_us.fake"]
    assert us["status"] == "failed_to_download"
    assert "X-Robots-Tag" in us["error_message"]

    # 404 surfaces as failed_to_download with the real urllib error
    missing = rows["missing.fake"]
    assert missing["status"] == "failed_to_download"
    assert "404" in missing["error_message"]

    # 500-then-200: retries=1 turns the flake into a success (S10),
    # and the server really saw >= 2 requests for it
    assert rows["flaky.fake"]["status"] == "success"
    assert _Handler.hits["/flaky.fake"] >= 2

    # read slower than cfg.timeout -> timeout error after retries
    slow = rows["slow.fake"]
    assert slow["status"] == "failed_to_download"
    assert "timed out" in slow["error_message"].lower()


def test_http_robots_fetch_discards_body(spark, http_root, tmp_path):
    """A robots-blocked response must never leak bytes downstream: the
    doc payload is dropped, so no page row carries text or a hash."""
    url_list = tmp_path / "urls1.txt"
    url_list.write_text(f"{http_root}/robots.fake\n")
    cfg = DownloadConfig(
        url_list=str(url_list),
        output_folder=str(tmp_path / "out1"),
        input_format="txt",
        user_agent_token=UA_TOKEN,
        timeout=2,
        get_language=False,
        compute_hash="sha256",
        min_words_per_page=None,
        max_images_per_page=None,
    )
    rows = build_pipeline(spark, cfg).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["status"] == "failed_to_download"
    assert r["text"] is None
    assert r["sha256"] is None
