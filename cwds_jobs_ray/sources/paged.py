"""Token-paginated source -> Dataset (S7 parity).

The reference's CAP initial load pages an IDM REST API by opaque
``paginationToken`` until exhausted
(/root/reference/jobs-cap-users/src/main/java/gov/ca/cwds/jobs/cap/users/iterator/CapUsersInitialJobIterator.java:23-38,
.../service/IdmServiceImpl.java:68-75). Pagination is inherently serial
(each token comes from the previous response), so the driver walks the pages
and hands each page's ROWS to Ray as blocks — downstream transforms fan out
normally. For large pages, per-page work is a distributed ``map_batches``
from the first block on.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import ray.data

# A page function: token (None = first page) -> (arrow table, next token or
# None). The reference analogue is `IdmService.getUserPage(token)`.
PageFn = Callable[[str | None], tuple[pa.Table, str | None]]


def read_paged(page_fn: PageFn, max_pages: int | None = None) -> ray.data.Dataset:
    """Drain a token-paginated source into a Dataset (one block per page)."""
    tables: list[pa.Table] = []
    token: str | None = None
    n = 0
    while True:
        page, token = page_fn(token)
        if page.num_rows:
            tables.append(page)
        n += 1
        if token is None or (max_pages is not None and n >= max_pages):
            break
    if not tables:
        return ray.data.from_items([])
    ds = ray.data.from_arrow(tables[0])
    for t in tables[1:]:
        ds = ds.union(ray.data.from_arrow(t))
    return ds
