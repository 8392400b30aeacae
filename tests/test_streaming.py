"""Structured Streaming ingest tests: stream == batch byte-identically, and
re-runs are incremental (only new files processed)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extraction_spark.corpus import compute_goldens, synth_rows
from pdf_extraction_spark.streaming import stream_extract


def _write_rows(rows, path):
    pq.write_table(
        pa.table(
            {
                "url": [r["url"] for r in rows],
                "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "text": [r["text"] for r in rows],
                "lang": [r["lang"] for r in rows],
            }
        ),
        path,
    )


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    (root / "in").mkdir()
    return root


def test_stream_matches_goldens_then_increments(spark, dirs):
    rows1 = synth_rows(80, seed=11)
    rows2 = synth_rows(40, seed=12)
    # seed=11/12 urls overlap (same host pool, index-based paths) — suffix
    # the second batch's urls so the union is disjoint, like a later crawl.
    for r in rows2:
        r["url"] += "?crawl=2"
    _write_rows(rows1, str(dirs / "in" / "part-0001.parquet"))

    out, ckpt = str(dirs / "out"), str(dirs / "ckpt")
    q = stream_extract(spark, str(dirs / "in"), out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(120)

    got = {r["url"]: r["extracted_text"] for r in spark.read.parquet(out).collect()}
    want = {g["url"]: g["extracted_text"] for g in compute_goldens(rows1)}
    assert got == want

    # second file lands; rerun drains ONLY the new file
    _write_rows(rows2, str(dirs / "in" / "part-0002.parquet"))
    q2 = stream_extract(spark, str(dirs / "in"), out, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(120)

    got2 = {r["url"]: r["extracted_text"] for r in spark.read.parquet(out).collect()}
    want2 = dict(want)
    want2.update({g["url"]: g["extracted_text"] for g in compute_goldens(rows2)})
    assert got2 == want2
    # no duplicates: row count equals distinct url count
    assert spark.read.parquet(out).count() == len(want2)


def test_stateful_host_stats_accumulate_across_drains(spark, tmp_path):
    """applyInPandasWithState: running per-host totals survive query
    restarts via the state store checkpoint."""
    from pdf_extraction_spark.streaming import stream_host_stats

    indir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    (tmp_path / "in").mkdir()
    rows1 = synth_rows(50, seed=21)
    _write_rows(rows1, indir + "/f1.parquet")

    q = stream_host_stats(spark, indir, out, ckpt)
    q.awaitTermination(120)
    first = {r["host"]: r for r in spark.read.parquet(out).collect()}
    assert sum(r["batch_docs"] for r in first.values()) == 50

    rows2 = synth_rows(30, seed=22)
    for r in rows2:
        r["url"] += "?crawl=2"
    _write_rows(rows2, indir + "/f2.parquet")
    q2 = stream_host_stats(spark, indir, out, ckpt)
    q2.awaitTermination(120)

    latest = {}
    for r in spark.read.parquet(out).collect():
        cur = latest.get(r["host"])
        if cur is None or r["total_docs"] > cur["total_docs"]:
            latest[r["host"]] = r
    # totals accumulate: all 80 docs accounted for in the running totals
    assert sum(r["total_docs"] for r in latest.values()) == 80
