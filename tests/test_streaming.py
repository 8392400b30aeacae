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


def test_windowed_counts_watermark_drops_late_rows(spark, tmp_path):
    """Event-time windows finalize once the watermark passes their end, and
    a record arriving later than the watermark is dropped (bounded state ⇔
    bounded lateness)."""
    import datetime

    from pdf_extraction_spark.streaming import stream_windowed_counts

    def row(host, hh, mm):
        return {
            "url": f"https://{host}.example.com/doc/{hh}{mm}",
            "warc_ts": datetime.datetime(2025, 3, 1, hh, mm),
            "html": b"<html><body><p>windowed counts fixture doc</p></body></html>",
            "text": None,
            "lang": "en",
        }

    indir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    (tmp_path / "in").mkdir()

    # drain 1: three h1 docs + two h2 docs in [10:00,11:00), one h1 at 12:10
    # -> watermark after drain = 12:10 - 30min = 11:40, closing [10:00,11:00)
    _write_rows(
        [row("h1", 10, 5), row("h1", 10, 20), row("h1", 10, 40),
         row("h2", 10, 10), row("h2", 10, 50), row("h1", 12, 10)],
        indir + "/f1.parquet",
    )
    stream_windowed_counts(spark, indir, out, ckpt).awaitTermination(120)

    # drain 2: a record at 13:00 moves the watermark on; a 10:15 record is
    # LATER than the 11:40 watermark and must be dropped, not counted
    _write_rows([row("h2", 13, 0), row("h1", 10, 15)], indir + "/f2.parquet")
    stream_windowed_counts(spark, indir, out, ckpt).awaitTermination(120)

    # drain 3: 15:00 record closes every earlier window
    _write_rows([row("h3", 15, 0)], indir + "/f3.parquet")
    stream_windowed_counts(spark, indir, out, ckpt).awaitTermination(120)

    got = {
        (r["window_start"].hour, r["host"].split(".")[0]): r["n_docs"]
        for r in spark.read.parquet(out).collect()
    }
    assert got[(10, "h1")] == 3  # the late 10:15 row did NOT land here
    assert got[(10, "h2")] == 2
    assert got[(12, "h1")] == 1
    assert got[(13, "h2")] == 1
    # every emitted window is append-mode-final: no duplicate (window, host)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == len({(r["window_start"], r["host"]) for r in rows})


def test_stream_dedup_exact_across_drains(spark, tmp_path):
    """Dedup-on-ingest: one keeper per distinct text across micro-batches
    and restarts; later drains drop duplicates of anything ever seen."""
    from pdf_extraction_spark.streaming import stream_dedup_exact

    rows1 = synth_rows(30, seed=21)
    # duplicate texts inside batch 1 (distinct urls)
    for k in range(5):
        dup = dict(rows1[k])
        dup["url"] += "?mirror=1"
        rows1.append(dup)
    (tmp_path / "in").mkdir()
    _write_rows(rows1, str(tmp_path / "in" / "part-0001.parquet"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_dedup_exact(spark, str(tmp_path / "in"), out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    texts = {r["text"] for r in rows1}
    assert got.count() == len(texts)
    # the 5 in-batch duplicates are accounted on their keeper rows
    assert (
        got.agg({"batch_dups": "sum"}).collect()[0][0] == 5
    )
    # same-batch duplicate keeper is chosen by min(url), not arrival order —
    # reruns/retries of the batch must emit the identical keeper row
    keepers = {r["url"] for r in got.collect()}
    for k in range(5):
        assert rows1[k]["url"] in keepers
        assert rows1[k]["url"] + "?mirror=1" not in keepers

    # batch 2: all repeats of batch 1 plus 3 genuinely new docs
    rows2 = [dict(r) for r in rows1[:10]]
    for r in rows2:
        r["url"] += "?crawl=2"
    fresh = synth_rows(3, seed=99)
    for r in fresh:
        r["url"] += "?crawl=2"
        r["text"] += " unseen suffix"
        r["html"] = r["html"][:-14] + r["text"][-13:].encode() + r["html"][-14:]
    _write_rows(rows2 + fresh, str(tmp_path / "in" / "part-0002.parquet"))
    q2 = stream_dedup_exact(spark, str(tmp_path / "in"), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(texts) + 3


def test_stream_dedup_null_text_keys_on_html(spark, tmp_path):
    """An ingest-shaped corpus (text=None everywhere, the WARC source's
    output) must dedup on the html payload, NOT collapse into the single
    xxhash64(NULL)=seed state group that kept exactly one document
    (review finding)."""
    from pdf_extraction_spark.streaming import stream_dedup_exact

    rows = [
        {"url": f"https://h{i}.x/d{i}", "warc_ts": None,
         "html": f"<html><body><p>doc {i % 3}</p></body></html>".encode(),
         "text": None, "lang": None}
        for i in range(9)  # 3 distinct payloads, 3 copies each
    ]
    (tmp_path / "in").mkdir()
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array([None] * len(rows), pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "text": pa.array([None] * len(rows), pa.string()),
                "lang": pa.array([None] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "in" / "part-0001.parquet"),
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_dedup_exact(spark, str(tmp_path / "in"), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 3  # one keeper per distinct payload, not 1 total
    assert got.agg({"batch_dups": "sum"}).collect()[0][0] == 6
