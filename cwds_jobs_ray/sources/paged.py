"""Token-paginated source -> Dataset (S7 parity), with a real pluggable
HTTP transport.

The reference's CAP initial load pages an IDM REST API by opaque
``paginationToken`` until exhausted
(/root/reference/jobs-cap-users/src/main/java/gov/ca/cwds/jobs/cap/users/iterator/CapUsersInitialJobIterator.java:23-38,
.../service/IdmServiceImpl.java:68-75), sending Basic auth assembled from
credentials (IdmServiceImpl.java:61-66). Pagination is inherently serial
(each token comes from the previous response), so the driver walks the pages
and hands each page's ROWS to Ray as blocks — downstream transforms fan out
normally. For large pages, per-page work is a distributed ``map_batches``
from the first block on.

Error surface (this module's addition over the bare protocol):
- transient failures (HTTP 5xx, connection errors) retry with exponential
  backoff up to ``max_retries`` — the reference relies on the next cron run
  for retries; a long initial page walk can't afford to restart;
- 4xx responses are FATAL (an auth or contract bug; retrying can't help);
- the auth hook is a callable returning headers, evaluated per request so
  rotating tokens work.
"""

from __future__ import annotations

import base64
import json
import time
from collections.abc import Callable

import pyarrow as pa
import ray.data

# A page function: token (None = first page) -> (arrow table, next token or
# None). The reference analogue is `IdmService.getUserPage(token)`.
PageFn = Callable[[str | None], tuple[pa.Table, str | None]]


def read_paged(page_fn: PageFn, max_pages: int | None = None,
               prefetch: bool = True) -> ray.data.Dataset:
    """Drain a token-paginated source into a Dataset (one block per page).

    With ``prefetch`` (default), page k+1's fetch is dispatched to a
    background thread the moment page k's response yields its token, so the
    network round-trip (+ JSON parse) of the NEXT page overlaps the
    driver's handling of the CURRENT one — the reference's read-thread/
    write-thread overlap (README.md:62,
    jobs-cap-users/.../CapUsersInitialJobIterator.java:23-38) within token
    pagination's serial-token constraint. Page ORDER is unchanged: exactly
    one fetch is ever in flight, and results are consumed in submission
    order (tested)."""
    from concurrent.futures import ThreadPoolExecutor

    import ray

    # each page goes straight to the object store (spillable) the moment it
    # arrives — the driver holds O(pages) small refs, never the page bytes
    refs: list = []
    n = 0

    def consume(page: pa.Table) -> None:
        if page.num_rows:
            refs.append(ray.put(page))

    if not prefetch:
        token: str | None = None
        while True:
            page, token = page_fn(token)
            consume(page)
            n += 1
            if token is None or (max_pages is not None and n >= max_pages):
                break
    else:
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(page_fn, None)
            while True:
                page, token = fut.result()
                n += 1
                more = (token is not None
                        and (max_pages is None or n < max_pages))
                if more:  # one-page lookahead: fetch k+1 while k is consumed
                    fut = ex.submit(page_fn, token)
                consume(page)
                if not more:
                    break
    if not refs:
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(refs)


class TransportError(RuntimeError):
    """Fatal transport failure (4xx, or retries exhausted)."""

    def __init__(self, msg: str, status: int | None = None):
        super().__init__(msg)
        self.status = status


def basic_auth(user: str, password: str) -> Callable[[], dict[str, str]]:
    """Basic-auth header hook — the reference's Base64 credential assembly
    (IdmServiceImpl.java:61-66)."""
    tok = base64.b64encode(f"{user}:{password}".encode()).decode()

    def hook() -> dict[str, str]:
        return {"Authorization": f"Basic {tok}"}

    return hook


class UrllibTransport:
    """Default stdlib transport: GET url -> (status, body bytes).

    Swappable for tests or a pooled client; the retry policy lives in
    ``HttpPagedSource``, not here, so any transport gets it for free.
    """

    def __init__(self, timeout_s: float = 30.0):
        self.timeout_s = timeout_s

    def request(self, url: str, headers: dict[str, str]) -> tuple[int, bytes]:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:  # non-2xx WITH a status
            return e.code, e.read()
        except OSError as e:  # connection refused/reset/timeout: no status
            raise ConnectionError(str(e)) from e


class HttpPagedSource:
    """Token-paginated HTTP source with retry/backoff and an auth hook.

    Page contract (the IDM shape): GET ``{base_url}?{token_param}={token}``
    returns JSON ``{"records": [ {col: val, ...}, ... ],
    "paginationToken": "<next>" | null}``.

    Use as a ``PageFn``: ``read_paged(HttpPagedSource(url, ...))``.
    """

    def __init__(
        self,
        base_url: str,
        transport=None,
        auth: Callable[[], dict[str, str]] | None = None,
        token_param: str = "paginationToken",
        max_retries: int = 3,
        backoff_s: float = 0.1,
    ):
        self.base_url = base_url
        self.transport = transport or UrllibTransport()
        self.auth = auth
        self.token_param = token_param
        self.max_retries = max_retries
        self.backoff_s = backoff_s

    def _url(self, token: str | None) -> str:
        if token is None:
            return self.base_url
        from urllib.parse import quote

        sep = "&" if "?" in self.base_url else "?"
        return f"{self.base_url}{sep}{self.token_param}={quote(token)}"

    def _fetch(self, url: str) -> bytes:
        """One page with the retry policy: 5xx/connection errors back off
        exponentially; 4xx are fatal immediately."""
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                time.sleep(self.backoff_s * (2 ** (attempt - 1)))
            headers = dict(self.auth()) if self.auth else {}
            try:
                status, body = self.transport.request(url, headers)
            except ConnectionError as e:
                last = e
                continue
            if status < 300:
                return body
            if status < 500:
                raise TransportError(
                    f"GET {url} -> {status} (fatal, not retried): "
                    f"{body[:200]!r}", status=status)
            last = TransportError(f"GET {url} -> {status}", status=status)
        raise TransportError(
            f"GET {url} failed after {self.max_retries + 1} attempts: {last}",
            status=getattr(last, "status", None))

    def __call__(self, token: str | None) -> tuple[pa.Table, str | None]:
        payload = json.loads(self._fetch(self._url(token)))
        records = payload.get("records") or []
        table = (pa.Table.from_pylist(records) if records
                 else pa.table({}))
        return table, payload.get("paginationToken")


def read_paged_http(base_url: str, **kwargs) -> ray.data.Dataset:
    """Drain a paginated HTTP endpoint into a Dataset (see HttpPagedSource)."""
    return read_paged(HttpPagedSource(base_url, **kwargs))
