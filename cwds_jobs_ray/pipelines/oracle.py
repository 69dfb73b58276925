"""Single-process reference reducer ("oracle"): replays a WAL over a base
table with the exact semantics the distributed engine must reproduce.

This is the analogue of the reference's golden expectations (exact item
counts / documents asserted after each run,
/root/reference/jobs-facilities-cws/src/test/java/gov/ca/cwds/jobs/cals/facility/cws/CwsFacilityJobTest.java:60-134).
Every distributed result is compared byte-for-byte against this replay under
stable (conv_id, turn_idx) order.

Semantics (shared contract, also implemented by stages/merge.py):
1. **Dedup**: events with an identical ``lsn`` are verbatim redeliveries;
   keep one, count the rest into ``dedup_count``.
2. **LWW**: per key (conv_id, turn_idx), the winner among {base row, events}
   is the max by (ts, lsn). Base rows carry their own (ts, lsn=<=0).
3. **Apply**: winner op D -> key absent; I/U -> row is the winning event's
   full payload (an old-schema event yields ``tool=null`` — null back-fill,
   the row is replaced wholesale); base winner -> base row unchanged.
4. **Counters**: ``conflict_count`` = deduped events that did not win their
   key (superseded by a newer event or by the base row).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import TRANSCRIPT_SCHEMA, conform_to_schema
from ..stages.partition import partition_ids


@dataclass
class OracleResult:
    final: pa.Table              # TRANSCRIPT_SCHEMA, sorted by (conv_id, turn_idx)
    rows_applied: int
    dedup_count: int
    conflict_count: int
    per_partition: pd.DataFrame | None = None  # indexed by partition id


def replay(base: pa.Table, wal: pa.Table, num_partitions: int | None = None,
           policy: str = "lww") -> OracleResult:
    """Pure pandas/pyarrow replay of ``wal`` over ``base``.

    ``policy``: "lww" (max (ts, lsn) wins — reference semantics) or
    "fww" (min wins), matching stages/merge.py MERGE_POLICIES.
    """
    base_df = conform_to_schema(base, TRANSCRIPT_SCHEMA).to_pandas()
    base_df["op"] = "B"
    ev = conform_to_schema(wal, pa.schema([f for f in TRANSCRIPT_SCHEMA] )
                           .insert(0, pa.field("op", pa.string()))).to_pandas() \
        if wal.num_rows else None

    if ev is not None:
        n_before = len(ev)
        ev = ev.drop_duplicates(subset=["lsn"], keep="first")
        dedup_count = n_before - len(ev)
        allrows = pd.concat([base_df, ev], ignore_index=True)
    else:
        dedup_count = 0
        allrows = base_df

    allrows = allrows.sort_values(["ts", "lsn"], kind="stable")
    grp = allrows.groupby(["conv_id", "turn_idx"], sort=False)
    winners = grp.tail(1) if policy == "lww" else grp.head(1)

    n_events = 0 if ev is None else len(ev)
    event_winners = int((winners["op"] != "B").sum())
    conflict_count = n_events - event_winners

    live = winners[winners["op"] != "D"].drop(columns=["op"])
    live = live.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)

    per_part = None
    if num_partitions is not None:
        parts = pd.DataFrame({
            "part": partition_ids(live["conv_id"].to_numpy(), num_partitions)})
        per_part = parts.groupby("part").size().reindex(
            range(num_partitions), fill_value=0).rename("rows_applied").to_frame()

    final = conform_to_schema(
        pa.Table.from_pandas(live, preserve_index=False), TRANSCRIPT_SCHEMA)
    return OracleResult(
        final=final,
        rows_applied=final.num_rows,
        dedup_count=int(dedup_count),
        conflict_count=int(conflict_count),
        per_partition=per_part,
    )
