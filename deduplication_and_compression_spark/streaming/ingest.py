"""Structured Streaming ingest: the streaming analog of the
reference's UDP packet loop (/root/reference/App/Host.cpp:449-491 —
an unbounded hand-rolled stream consumer with a done-bit terminator).

Spark-idiomatic restatement: ``readStream`` over an arriving-files
parquet directory; per-micro-batch exact dedup against the global
content-hash state via dropDuplicatesWithinWatermark (bounded state),
with ``availableNow`` trigger for drain-and-stop semantics (the
done-bit analog).

The near-dup tiers stay batch (they need global shuffles); streaming
handles INGEST + exact screening, mirroring how the reference splits
"screen duplicates online" from "compress offline".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.exact import with_content_hash


def stream_images(
    spark: SparkSession,
    input_dir: str,
    schema: str = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long"
    ),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def streaming_exact_dedup(
    stream: DataFrame,
    event_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Unique-only stream: first occurrence of each content hash passes,
    later duplicates are dropped.

    With an event-time column the state is bounded by the watermark
    (dropDuplicatesWithinWatermark); without one Spark keeps full state
    — fine for tests, not for 10^12-row production (documented here so
    callers at scale MUST provide event time).
    """
    hashed = with_content_hash(stream)
    if event_time_col is not None:
        return hashed.withWatermark(event_time_col, watermark) \
            .dropDuplicatesWithinWatermark(["content_hash"])
    return hashed.dropDuplicates(["content_hash"])


def run_ingest_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain everything currently in input_dir into output_dir
    (unique rows only), then stop — the done-bit analog.  Restart with
    the same checkpoint_dir to resume incrementally."""
    stream = stream_images(spark, input_dir)
    unique = streaming_exact_dedup(stream)
    (
        unique.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
