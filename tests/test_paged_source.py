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
