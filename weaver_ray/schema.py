"""Single source of truth for every Arrow schema in the engine.

The reference had three drifted copies of its Product struct
(src/common/Product.go:3-11, src/router/product.go:3-9, src/client/main.go:20-27);
here every logical table has exactly one ``pyarrow.Schema`` and stage
boundaries validate against it.
"""

from __future__ import annotations

import pyarrow as pa

# The crawl payload — exactly BASELINE.json's input_hint shape.
CORPUS_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.large_binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)

# One frontier row = one unit of crawl work (reference: common.URLMessage,
# src/common/Product.go:13-16, plus queue envelope metadata).
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("url_canon", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("url_type", pa.string()),      # "root" | "product" (reference URLType enum)
        pa.field("priority", pa.float32()),
        pa.field("seq", pa.int64()),            # deterministic within-round order
        pa.field("round", pa.int32()),
        pa.field("parent_hash", pa.uint64()),
    ]
)

# Crawled record (reference: common.Product stored as one JSON file per record,
# src/storage/main.go:142-170) — here rows of a partitioned Parquet/Lance table.
RECORD_SCHEMA = pa.schema(
    [
        pa.field("url_canon", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("host", pa.string()),
        pa.field("round", pa.int32()),
        pa.field("seq", pa.int64()),
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.large_binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
        pa.field("fetch_status", pa.string()),  # "ok" | "dead" | "robots_denied"
        pa.field("priority", pa.float32()),
        pa.field("depth", pa.int32()),
    ]
)

# Per-partition lineage record written with every round commit (north rule:
# "checkpoint/resume with per-partition lineage + metrics").
LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("round", pa.int32()),
        pa.field("partition", pa.int32()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("new_urls", pa.int64()),
        pa.field("dup_urls", pa.int64()),
        pa.field("robots_denied", pa.int64()),
        pa.field("dead", pa.int64()),
        pa.field("bloom_maybe", pa.int64()),
        pa.field("task_attempt", pa.int32()),
    ]
)

SEEN_SCHEMA = pa.schema(
    [
        pa.field("url_canon", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("round", pa.int32()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, stage: str) -> pa.Table:
    """Assert-cast a batch to its declared schema at a stage boundary."""
    try:
        return table.select(schema.names).cast(schema)
    except (KeyError, pa.ArrowInvalid, pa.ArrowTypeError) as e:  # pragma: no cover
        raise ValueError(f"schema mismatch at stage {stage!r}: {e}\n got: {table.schema}") from e
