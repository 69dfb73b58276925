"""WAL segment discovery and batch planning — all from Parquet metadata.

The reference finds batch boundaries with probe queries against the source DB
(the k-th-row lookahead, /root/reference/jobs-facilities-cws/src/main/java/gov/ca/cwds/jobs/cals/facility/cws/dao/CwsChangedIdentifierDao.java:45-60,
driven by /root/reference/jobs-common/.../iterator/TimestampJobBatchIterator.java:27-36).
Here the WAL is a directory of Parquet segments, so batch boundaries come for
free from footer statistics: per-segment (min_lsn, max_lsn, rows, schema) —
no data is read on the driver.

Invariants:
- segments are produced in LSN order: ``max_lsn`` is strictly increasing in
  filename order (new LSNs only ever grow);
- one batch = a run of WHOLE segments — a single LSN is never split across
  batches (the reference's open-interval batching rule);
- a segment is already committed iff ``max_lsn <= manifest.applied_through_lsn``
  (duplicate *redeliveries* of old LSNs inside newer segments are filtered
  later, per-partition, by the LSN watermark in the merge).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import unify_change_schemas


@dataclass
class SegmentInfo:
    path: str
    min_lsn: int        # EFFECTIVE lsn (raw + lsn_namespace)
    max_lsn: int
    rows: int
    schema: pa.Schema
    source: str = "default"
    lsn_namespace: int = 0  # multi-source: (source_idx+1) << 48
    num_row_groups: int = 1  # lets a fat segment split across combine tasks


def list_segments(wal_dir: str, source: str = "default",
                  lsn_namespace: int = 0,
                  multi: bool = False) -> list[SegmentInfo]:
    """Driver-side metadata scan (footers only) of all WAL segments.

    ``lsn_namespace`` supports multi-source CDC (the reference's composite
    savepoint, CapUsersSavePointService.java:40-47): each source's raw lsns
    map into a disjoint effective range ``namespace | lsn`` so cross-source
    lsns stay globally unique (the dedup multiset and lineage column rely on
    uniqueness) while per-source monotonicity is preserved.
    """
    infos = []
    if not os.path.isdir(wal_dir):
        return infos
    for fn in sorted(os.listdir(wal_dir)):
        if not fn.endswith(".parquet"):
            continue
        path = os.path.join(wal_dir, fn)
        f = pq.ParquetFile(path)
        md = f.metadata
        schema = f.schema_arrow
        lsn_idx = schema.get_field_index("lsn")
        if lsn_idx < 0:
            raise ValueError(f"not a WAL segment (no lsn column): {path}")
        mn, mx = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(lsn_idx).statistics
            if st is not None and st.has_min_max:
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
        if md.num_rows == 0:
            continue
        if mn is None:  # writer emitted no column statistics: read the column
            col = f.read(columns=["lsn"])["lsn"]
            import pyarrow.compute as _pc
            mn, mx = _pc.min(col).as_py(), _pc.max(col).as_py()
        if (multi or lsn_namespace) and int(mx) >= (1 << 48):
            raise ValueError(
                f"segment {path}: raw lsn {mx} does not fit below the "
                "multi-source namespace shift (2^48) — namespaced ranges "
                "would overlap")
        infos.append(SegmentInfo(path, int(mn) + lsn_namespace,
                                 int(mx) + lsn_namespace, md.num_rows, schema,
                                 source, lsn_namespace, md.num_row_groups))
    # NOTE on the committed-iff-max_lsn rule's safety: a segment with
    # max_lsn <= applied_through contains only events at-or-below the
    # watermark, i.e. already-applied originals or verbatim redeliveries —
    # skipping it IS the dedup (segments that are pure redelivery tails are
    # normal and legitimately non-monotonic). The writer-side invariant is
    # only that an event's FIRST delivery appears in filename order no later
    # than any segment carrying a higher lsn — the same assumption the
    # reference makes of its ordered change feed (everything below the
    # savepoint has been processed).
    return infos


def plan_batches(
    segments: list[SegmentInfo],
    applied_through_lsn: int,
    events_per_batch: int,
) -> list[list[SegmentInfo]]:
    """Group pending segments into batches of whole segments.

    A batch closes when it reaches ``events_per_batch`` rows. Segments whose
    ``max_lsn`` is already committed are skipped entirely (resume).
    """
    pending = [s for s in segments if s.max_lsn > applied_through_lsn]
    batches: list[list[SegmentInfo]] = []
    cur: list[SegmentInfo] = []
    cur_rows = 0
    for s in pending:
        cur.append(s)
        cur_rows += s.rows
        if cur_rows >= events_per_batch:
            batches.append(cur)
            cur, cur_rows = [], 0
    if cur:
        batches.append(cur)
    return batches


def batch_schema(batch: list[SegmentInfo]) -> pa.Schema:
    """Unified Arrow schema across a batch's segments (v1/v2 mixing)."""
    return unify_change_schemas([s.schema for s in batch])
