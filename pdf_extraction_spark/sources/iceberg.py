"""Iceberg table source/sink adapter.

The north-star deployment reads Common-Crawl-style pages from an Iceberg
table and appends extraction output to another (reference S1/S6 analogs —
the reference walked PDF files on local disk, hybrid_docling_gpt4_processor
.py:109-141, and wrote one JSON per doc, :692-693). On a real cluster this
module speaks the Iceberg DataSource-v2 API:

    spark.read.format("iceberg").load("cat.db.pages")      # source
    df.writeTo("cat.db.docs").append()                     # sink

which keeps every scan optimization the engine relies on — partition
pruning on ``warc_ts``/bucket, hidden-partition transforms, column pruning
of the wide ``html`` binary column, and snapshot-isolated appends for the
resumable bucket runner.

This sandbox ships no ``iceberg-spark-runtime`` jar (and no network to
fetch one), so the adapter detects catalog availability at call time and
falls back to the parquet layout the rest of the repo uses — same schema,
same partitioning discipline — keeping call sites identical between the
sandbox and a real cluster. Table refs:

- ``catalog.db.table``  -> Iceberg DSv2 (requires a configured catalog)
- ``/path/to/dir``      -> parquet-layout fallback (sandbox)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_table_ref(ref: str) -> bool:
    """True for ``catalog.db.table`` refs, False for filesystem paths.

    A slash always means a path; a dot alone does NOT mean a table — a
    relative filename like ``corpus.parquet`` in the working directory is
    a path too (it used to be misrouted to the Iceberg branch and error
    out), as is anything with a data-file extension or that actually
    exists on the local filesystem."""
    import os

    if "/" in ref or "\\" in ref:
        return False
    if "." not in ref:
        return False
    low = ref.lower()
    if low.endswith((".parquet", ".pq", ".orc", ".json", ".csv", ".warc",
                     ".gz", ".wet")):
        return False
    return not os.path.exists(ref)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog implementation is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, ref: str) -> DataFrame:
    """Read the page corpus ``(url, warc_ts, html, text, lang)``.

    Iceberg DSv2 for table refs (partition pruning + column pruning reach
    the manifest level), parquet for path refs.
    """
    if is_table_ref(ref):
        if not iceberg_available(spark):
            raise RuntimeError(
                f"table ref {ref!r} needs iceberg-spark-runtime on the "
                "classpath; pass a parquet path in environments without it"
            )
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)


def write_docs(df: DataFrame, ref: str, mode: str = "append") -> None:
    """Append extraction output to the docs table.

    Iceberg appends are snapshot-isolated, which is what makes the bucket
    runner's resume-after-failure safe on a real cluster (a partially
    failed write is never visible); the parquet fallback relies on the
    runner's per-bucket overwrite discipline instead (lineage.py).
    """
    if is_table_ref(ref):
        spark = df.sparkSession
        if not iceberg_available(spark):
            raise RuntimeError(
                f"table ref {ref!r} needs iceberg-spark-runtime on the "
                "classpath; pass a parquet path in environments without it"
            )
        writer = df.writeTo(ref)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(ref)
