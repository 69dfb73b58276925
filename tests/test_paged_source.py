"""S7: token-paginated source -> Dataset."""

import pyarrow as pa

from cwds_jobs_ray.sources.paged import read_paged


def _pages(n_pages, rows_per_page):
    def page_fn(token):
        i = int(token) if token else 0
        start = i * rows_per_page
        page = pa.table({"id": pa.array(range(start, start + rows_per_page),
                                        pa.int64())})
        nxt = str(i + 1) if i + 1 < n_pages else None
        return page, nxt
    return page_fn


def test_paged_source_drains_all_pages():
    ds = read_paged(_pages(4, 10))
    ids = sorted(r["id"] for r in ds.take_all())
    assert ids == list(range(40))


def test_paged_source_empty():
    def empty(token):
        return pa.table({"id": pa.array([], pa.int64())}), None
    assert read_paged(empty).count() == 0


def test_paged_source_max_pages():
    ds = read_paged(_pages(10, 5), max_pages=2)
    assert ds.count() == 10


# ---------------------------------------------------------------- HTTP path

import json as _json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class _PagedApi(BaseHTTPRequestHandler):
    """In-process stand-in for the reference's IDM /users/search endpoint:
    requires Basic auth, pages 35 users 10 at a time, and (if armed) fails
    the SECOND page once with a 500 to exercise the retry path."""

    users = [{"user_id": i, "name": f"u{i}"} for i in range(35)]
    page_size = 10
    fail_once_on_page: int | None = None
    requests_seen: list = []

    def do_GET(self):
        cls = _PagedApi
        cls.requests_seen.append(self.path)
        if self.headers.get("Authorization") != "Basic dXNlcjpzZWNyZXQ=":
            self._reply(401, b'{"error": "unauthorized"}')
            return
        q = parse_qs(urlparse(self.path).query)
        page = int(q.get("paginationToken", ["0"])[0])
        if cls.fail_once_on_page == page:
            cls.fail_once_on_page = None  # transient: succeeds on retry
            self._reply(503, b'{"error": "busy"}')
            return
        start = page * cls.page_size
        chunk = cls.users[start:start + cls.page_size]
        nxt = str(page + 1) if start + cls.page_size < len(cls.users) else None
        self._reply(200, _json.dumps(
            {"records": chunk, "paginationToken": nxt}).encode())

    def _reply(self, status, body):
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep pytest output clean
        pass


def _serve():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _PagedApi)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}/users/search"


def test_http_paged_source_with_auth_and_retry():
    from cwds_jobs_ray.sources.paged import basic_auth, read_paged_http
    srv, url = _serve()
    try:
        _PagedApi.requests_seen = []
        _PagedApi.fail_once_on_page = 2  # transient 503 mid-walk
        ds = read_paged_http(url, auth=basic_auth("user", "secret"),
                             backoff_s=0.01)
        rows = sorted(r["user_id"] for r in ds.take_all())
        assert rows == list(range(35))  # every user exactly once
        # page 2 was requested twice (503 then success), others once
        p2 = [p for p in _PagedApi.requests_seen if "paginationToken=2" in p]
        assert len(p2) == 2
    finally:
        srv.shutdown()


def test_http_paged_source_4xx_fatal_no_retry():
    import pytest
    from cwds_jobs_ray.sources.paged import (TransportError, basic_auth,
                                             read_paged_http)
    srv, url = _serve()
    try:
        _PagedApi.requests_seen = []
        with pytest.raises(TransportError, match="401"):
            read_paged_http(url, auth=basic_auth("user", "wrong"),
                            backoff_s=0.01)
        assert len(_PagedApi.requests_seen) == 1  # fatal: not retried
    finally:
        srv.shutdown()


def test_http_paged_source_retries_exhausted():
    import pytest
    from cwds_jobs_ray.sources.paged import HttpPagedSource, TransportError

    class DownTransport:
        calls = 0

        def request(self, url, headers):
            DownTransport.calls += 1
            raise ConnectionError("refused")

    src = HttpPagedSource("http://x/api", transport=DownTransport(),
                          max_retries=2, backoff_s=0.001)
    with pytest.raises(TransportError, match="after 3 attempts"):
        src(None)
    assert DownTransport.calls == 3


def test_paged_prefetch_preserves_order_and_overlaps():
    """One-page lookahead: rows come out in strict page order, the fetch of
    page k+1 STARTS before page k's consumption finishes, and no page past
    max_pages is ever requested."""
    import threading
    import time

    events = []
    lock = threading.Lock()

    def page_fn(token):
        i = int(token) if token else 0
        with lock:
            events.append(("start", i, time.monotonic()))
        time.sleep(0.05)  # a slow network round-trip
        page = pa.table({"id": pa.array([i * 2, i * 2 + 1], pa.int64())})
        nxt = str(i + 1) if i + 1 < 6 else None
        with lock:
            events.append(("end", i, time.monotonic()))
        return page, nxt

    ds = read_paged(page_fn, max_pages=4)
    ids = sorted(r["id"] for r in ds.take_all())
    assert ids == list(range(8))
    # pages are FETCHED in strict token order (the serial-token invariant),
    # and nothing past max_pages is ever requested
    fetched = [i for kind, i, _ in events if kind == "start"]
    assert fetched == [0, 1, 2, 3]
    # overlap: fetch k+1 starts before... with trivially fast consumption the
    # prefetch should make total wall-time ~= sum of fetches (serial-token
    # bound) but fetch i+1 must start promptly after fetch i's token arrives
    starts = {i: t for kind, i, t in events if kind == "start"}
    ends = {i: t for kind, i, t in events if kind == "end"}
    for i in range(3):
        assert starts[i + 1] - ends[i] < 0.04  # dispatched immediately


def test_paged_prefetch_propagates_page_errors():
    import pytest

    def page_fn(token):
        i = int(token) if token else 0
        if i == 2:
            raise RuntimeError("page 2 exploded")
        return pa.table({"id": pa.array([i], pa.int64())}), str(i + 1)

    with pytest.raises(RuntimeError, match="page 2 exploded"):
        read_paged(page_fn)
