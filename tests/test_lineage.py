"""Checkpoint/lineage resumability tests (north rule: "resumable from
checkpoint with per-partition lineage + metrics")."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark import lineage
from pdf_extraction_spark.corpus import compute_goldens, synth_rows

N = 120
N_BUCKETS = 8


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = synth_rows(N, seed=7)
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    return df, {g["url"]: g["extracted_text"] for g in compute_goldens(rows)}


def _read_texts(spark, out):
    return {
        r["url"]: r["extracted_text"]
        for r in spark.read.parquet(out + "/docs").select("url", "extracted_text").collect()
    }


def test_single_shot_run(spark, corpus_df, tmp_path):
    df, goldens = corpus_df
    out = str(tmp_path / "run1")
    summary = lineage.run_resumable(df, out, n_buckets=N_BUCKETS, partitions=4)
    assert summary["n_docs"] == N
    assert summary["buckets_run"] >= 1
    assert not summary["resumed"]
    assert _read_texts(spark, out) == goldens


def test_crash_then_resume_byte_identical(spark, corpus_df, tmp_path):
    """Crash mid-run (injected failure aborts the wave holding the poisoned
    bucket), resume, and end with the exact single-shot output — no loss, no
    duplicates, no reprocess of committed waves."""
    df, goldens = corpus_df
    out = str(tmp_path / "run2")

    # wave_size=2 -> waves [0,1] [2,3] [4,5] [6,7]; poison bucket 7 so the
    # first three waves commit and the last wave crashes.
    with pytest.raises(Exception):
        lineage.run_resumable(
            df, out, n_buckets=N_BUCKETS, partitions=4, run_id="r1",
            wave_size=2, fail_buckets={7},
        )
    committed = lineage.completed_buckets(spark, out)
    assert committed == {0, 1, 2, 3, 4, 5}

    # resume: only the crashed wave's buckets run
    s2 = lineage.run_resumable(df, out, n_buckets=N_BUCKETS, partitions=4, run_id="r2")
    assert s2["resumed"]
    assert s2["buckets_run"] == 2
    assert s2["buckets_skipped"] == 6
    assert _read_texts(spark, out) == goldens

    # idempotent: a third run does nothing
    s3 = lineage.run_resumable(df, out, n_buckets=N_BUCKETS, partitions=4, run_id="r3")
    assert s3["buckets_run"] == 0
    assert _read_texts(spark, out) == goldens

    # attempt counter recorded the retry on the crashed buckets
    lin = lineage.read_lineage(spark, out)
    attempts = {
        r["bucket"]: r["a"]
        for r in lin.filter("status = 'done'").groupBy("bucket").agg(
            F.max("attempt").alias("a")).collect()
    }
    assert attempts[7] == 2 and attempts[0] == 1


def test_metrics_summary(spark, corpus_df, tmp_path):
    df, _ = corpus_df
    out = str(tmp_path / "run3")
    lineage.run_resumable(df, out, n_buckets=N_BUCKETS, partitions=4, run_id="m1")
    m = {r["run_id"]: r for r in lineage.metrics_summary(spark, out).collect()}
    assert m["m1"]["n_docs"] == N
    assert m["m1"]["n_chars"] > 0
    assert m["m1"]["max_attempt"] == 1


def test_bucket_pruning_pushdown(spark, corpus_df, tmp_path):
    """Completed-bucket filter must prune bucket= partition dirs on the
    output scan (partition pruning check)."""
    df, _ = corpus_df
    out = str(tmp_path / "run4")
    lineage.run_resumable(df, out, n_buckets=N_BUCKETS, partitions=4)
    scan = spark.read.parquet(out + "/docs").filter(F.col("bucket") == 3)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:120]


def test_resume_with_different_bucket_grid_refuses(spark, tmp_path):
    """Resuming 8-bucket lineage with n_buckets=4 would silently skip
    documents whose new bucket id collides with an old done id (review
    finding) — it must raise instead."""
    import pytest

    from pdf_extraction_spark.lineage import run_resumable

    corpus = spark.createDataFrame(
        [(f"https://h{i}.x/d{i}", None, None, None, None) for i in range(8)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = str(tmp_path / "out")
    run_resumable(corpus, out, n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        run_resumable(corpus, out, n_buckets=4)
    # same grid resumes cleanly and skips all done buckets
    s = run_resumable(corpus, out, n_buckets=8)
    assert s["buckets_run"] == 0 and s["resumed"]
