"""Bucketed-table co-located joins (shuffle elimination for repeated joins).

At 100 TB the expensive part of every downstream join against the
extraction output (elements ⋈ docs, dedup verify ⋈ docs, retrieval ⋈
chunks) is re-shuffling the big table on the same key every query. Writing
the table bucketed on that key once (``bucketBy`` at sink time) makes every
later equi-join on the key shuffle-free: Spark reads each bucket as one
partition already hash-placed, and the Exchange disappears from the plan
(asserted in tests/test_bucketed_join.py).

This is the table-format analog of the pipeline's in-flight discipline
(extract_corpus already clusters output by bucket before the write,
lineage.py); Iceberg's ``bucket(N, col)`` hidden partitioning plays the
same role on a real cluster (sources/iceberg.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally per-bucket-sorted) table.

    Joins and aggregations keyed on ``keys`` against this table need no
    Exchange; ``sort_cols`` additionally removes the Sort before
    sort-merge-join / window operators on the same keys.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
