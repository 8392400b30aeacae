"""Iceberg adapter: ref classification, capability detection, and the
parquet fallback round-trip (the sandbox has no iceberg-spark-runtime jar,
so the DSv2 branch is exercised only up to its capability gate)."""

import pytest

from pdf_extraction_spark.sources import iceberg


def test_ref_classification():
    assert iceberg.is_table_ref("cat.db.pages")
    assert iceberg.is_table_ref("prod.cc.docs_v2")
    assert not iceberg.is_table_ref("/root/testdata/sf0.001/documents.parquet")
    assert not iceberg.is_table_ref("/tmp/out/docs")
    assert not iceberg.is_table_ref("s3a://bucket/path/table.parquet".replace("s3a://", "/"))


def test_capability_detection_matches_classpath(spark):
    # this container has no iceberg jar; on a real cluster this flips to True
    assert iceberg.iceberg_available(spark) is False


def test_table_ref_without_runtime_raises(spark, tmp_path):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        iceberg.read_pages(spark, "cat.db.pages")
    df = spark.range(3)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        iceberg.write_docs(df, "cat.db.docs")


def test_parquet_fallback_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [("https://a.example.com/1", "hello"), ("https://b.example.com/2", "world")],
        "url string, extracted_text string",
    )
    out = str(tmp_path / "docs")
    iceberg.write_docs(src, out, mode="overwrite")
    back = iceberg.read_pages(spark, out)
    assert sorted(r.url for r in back.collect()) == [
        "https://a.example.com/1",
        "https://b.example.com/2",
    ]


def test_relative_parquet_filename_is_a_path(tmp_path, monkeypatch):
    """'corpus.parquet' (relative, dotted) must route to the parquet
    branch, not be mistaken for a catalog.db.table ref (review finding)."""
    from pdf_extraction_spark.sources.iceberg import is_table_ref

    assert not is_table_ref("corpus.parquet")
    assert not is_table_ref("data.warc.gz")
    assert not is_table_ref("/abs/path/x")
    assert is_table_ref("cat.db.pages")
    # an existing dotted local file is a path even without a known extension
    monkeypatch.chdir(tmp_path)
    (tmp_path / "my.data").write_text("x")
    assert not is_table_ref("my.data")
