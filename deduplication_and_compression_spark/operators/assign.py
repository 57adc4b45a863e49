"""Cluster assignments + compression-savings accounting.

``savings`` is the analog of the reference's compression report
(/root/reference/App/Host.cpp:500-507: unique vs total chunks and
``(fileSize - bytes_written)*100/fileSize``): for each duplicate
cluster, every member beyond the representative avoids re-storing its
payload, so bytes_saved = sum(member payload bytes) - rep payload
bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assignments_from_labels(df: DataFrame, labels: DataFrame,
                            id_col: str = "image_id") -> DataFrame:
    """Join per-id component labels (id_col, cluster_id) back onto the
    full table; ids with no label are singleton clusters of themselves.

    labels carries only duplicate members, so it is typically tiny
    relative to df → Catalyst/AQE picks a broadcast join when it fits.
    Accepts labels keyed either by ``id`` (connected_components output)
    or already by ``id_col``.
    """
    if "id" in labels.columns and id_col not in labels.columns:
        labels = labels.withColumnRenamed("id", id_col)
    out = (
        df.select(id_col)
        .join(labels, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
    return out.select(
        id_col,
        "cluster_id",
        (F.col(id_col) != F.col("cluster_id")).alias("is_duplicate"),
        F.col("cluster_id").alias("representative_id"),
    )


def payload_bytes(df: DataFrame) -> DataFrame:
    """(image_id, payload_bytes) = encoded image bytes + caption bytes."""
    return df.select(
        "image_id",
        (
            F.coalesce(F.length(F.col("bytes")), F.lit(0))
            + F.coalesce(F.length(F.encode(F.col("caption"), "UTF-8")), F.lit(0))
        ).cast("long").alias("payload_bytes"),
    )


def savings(assignments: DataFrame, payloads: DataFrame) -> DataFrame:
    """(cluster_id, members, bytes_total, bytes_saved) per cluster with
    ≥2 members.  bytes_saved = bytes_total - representative's bytes."""
    joined = assignments.join(payloads, "image_id")
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("members"),
            F.sum("payload_bytes").alias("bytes_total"),
            (
                F.sum("payload_bytes")
                - F.max(F.when(~F.col("is_duplicate"), F.col("payload_bytes")))
            ).cast("long").alias("bytes_saved"),
        )
        .filter(F.col("members") > 1)
    )


def dedup_ratio(assignments: DataFrame, payloads: DataFrame) -> DataFrame:
    """Global one-row accounting mirroring App/Host.cpp:507."""
    joined = assignments.join(payloads, "image_id")
    return joined.agg(
        F.count(F.lit(1)).alias("rows_total"),
        F.sum(F.when(~F.col("is_duplicate"), 1).otherwise(0)).alias("rows_unique"),
        F.sum("payload_bytes").alias("bytes_total"),
        F.sum(F.when(~F.col("is_duplicate"), F.col("payload_bytes")).otherwise(0)).alias("bytes_after_dedup"),
        (
            (F.sum("payload_bytes") - F.sum(F.when(~F.col("is_duplicate"), F.col("payload_bytes")).otherwise(0)))
            * F.lit(100.0) / F.sum("payload_bytes")
        ).alias("compression_pct"),
    )
