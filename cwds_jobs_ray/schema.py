"""Schemas for the transcript lake table and the WAL change stream.

The change-event envelope mirrors the reference's ``ChangedDTO`` (id + I/U/D op
+ payload; /root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/ChangedDTO.java:8-13)
and its per-record watermark columns ``IBMSNAP_OPERATION`` / ``IBMSNAP_LOGMARKER``
(/root/reference/jobs-facilities-common/src/main/java/gov/ca/cwds/jobs/cals/facility/ReplicationPlacementHome.java:24-32),
re-expressed as Arrow columns ``op`` / ``lsn`` (+ event ``ts``).
"""

from __future__ import annotations

import pyarrow as pa

def from_pandas(df, **kw) -> pa.Table:
    """``pa.Table.from_pandas`` with the ``b'pandas'`` schema metadata
    stripped. pyarrow 16.1 schemas WITH metadata are unhashable
    (``hash(schema)`` raises "unhashable type: 'dict'"), which makes Ray
    Data's block-schema dedup log a warning per block pair and skip its
    cheap early-exit path — so every batch-fn that builds its output from
    pandas uses this instead."""
    return pa.Table.from_pandas(df, **kw).replace_schema_metadata(None)


# Primary key of the lake table. turn_idx never crosses a partition: the engine
# shuffles on conv_id only.
KEY_COLS = ["conv_id", "turn_idx"]

# Last-writer-wins total order per key (SURVEY.md §2.9): max (ts, lsn) wins.
ORDER_COLS = ["ts", "lsn"]

# Base lake table (BASELINE.json input_hint). ``lsn`` is engine-internal
# lineage: the winning event's LSN, kept so LWW keeps working across batches.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("lsn", pa.int64()),
    ]
)

# Columns a consumer of the lake table sees (lineage column dropped).
PUBLIC_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# On-disk partition-file schema: public columns + lineage (lsn) + the winning
# op. Tombstones (op == "D") are PERSISTED with their (ts, lsn) so that a
# later out-of-order event older than the delete still loses LWW — the
# reference never needs this because Elasticsearch applies the feed in strict
# order (ORDER BY watermark, id); our engine tolerates disorder instead.
# Tombstones older than the out-of-order horizon are compactable (see
# CDCJob docstring).
def stored_schema(target: pa.Schema) -> pa.Schema:
    return target.append(pa.field("op", pa.string()))

# Change-stream schema v2 (current). v1 segments lack the ``tool`` column —
# the schema-evolution case (reference evolves by full index replacement,
# /root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/elastic/ElasticsearchService.java:74-91;
# we unify schemas + null-backfill inside the merge instead).
CHANGE_SCHEMA_V2 = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),  # "I" | "U" | "D"; D carries nulls for payload
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

CHANGE_SCHEMA_V1 = pa.schema([f for f in CHANGE_SCHEMA_V2 if f.name != "tool"])

PAYLOAD_COLS = ["role", "text", "tool"]


def unify_change_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Unified read schema across WAL segments of mixed versions.

    Column order follows CHANGE_SCHEMA_V2 for known columns; unknown extra
    columns (future evolution) are appended in first-seen order.
    """
    seen: dict[str, pa.Field] = {}
    for s in schemas:
        for f in s:
            if f.name in seen:
                if not seen[f.name].type.equals(f.type):
                    # widen via permissive promotion
                    seen[f.name] = pa.field(
                        f.name, pa.unify_schemas([pa.schema([seen[f.name]]), pa.schema([f])],
                                                 promote_options="permissive").field(0).type
                    )
            else:
                seen[f.name] = f
    ordered = [seen.pop(f.name) for f in CHANGE_SCHEMA_V2 if f.name in seen]
    ordered.extend(seen.values())
    return pa.schema(ordered)


def conform_to_schema(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast/extend ``table`` to ``schema``, adding all-null columns for
    missing fields (null back-fill for evolved schemas)."""
    cols = []
    n = table.num_rows
    for f in schema:
        if f.name in table.column_names:
            col = table.column(f.name)
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def schema_to_b64(schema: pa.Schema) -> str:
    """Serialize an Arrow schema for embedding in the JSON manifest."""
    import base64

    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def schema_from_b64(b64: str) -> pa.Schema:
    import base64

    import pyarrow.ipc as ipc

    return ipc.read_schema(pa.BufferReader(base64.b64decode(b64)))
