"""Structured Streaming ingest: continuous / incremental extraction.

The reference is a run-to-completion batch script (SURVEY.md §2.8 — no
streaming operators exist in it), and the north rule's resumability
requirement is met by the batch lineage protocol in :mod:`.lineage`. This
module is the *scale path beyond* that: a Common-Crawl-style corpus lands as
parquet files over time, and the extraction pipeline runs as an incremental
Structured Streaming job —

    readStream(corpus dir) → mapInPandas(kernels) → writeStream(parquet sink)

with ``Trigger.AvailableNow`` for drain-and-stop batch-of-streams runs and
the stream checkpoint providing exactly-once file-level progress (the
streaming analog of the bucket lineage table). ``maxFilesPerTrigger``
bounds micro-batch size so executor memory is sized by config, not by
whatever landed in the directory.

The transformation body is exactly :func:`..pipeline.extract_corpus` — the
same declarative plan runs batch or streaming unchanged, which is the point
of building on the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .pipeline import extract_corpus

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    partitions: int | None = None,
    salt: int = 8,
    max_files_per_trigger: int | None = None,
):
    """Start an AvailableNow streaming extraction; returns the query.

    Call ``query.awaitTermination()`` to drain everything currently in
    ``input_dir``; re-running later processes only files that arrived since
    the last run (checkpointed file log — the restart story needs no
    application code at all here).
    """
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    corpus = reader.parquet(input_dir)

    extracted = extract_corpus(corpus, partitions=partitions, salt=salt, repartition=False)
    # NOTE: repartition=False — a streaming micro-batch is already split into
    # file-sized tasks; the salted shuffle matters for hot-host batch scans,
    # while per-micro-batch repartition would add a shuffle per trigger.

    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
