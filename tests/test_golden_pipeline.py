"""Golden-file tests: the Spark pipeline must reproduce the single-threaded
kernels byte-identically at every parallelism level (BASELINE.json north_rule:
"byte-identical extracted text per url")."""

import pytest

from pdf_extraction_spark.corpus import compute_goldens, synth_rows
from pdf_extraction_spark.pipeline import extract_corpus

N = 200


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = synth_rows(N, seed=42)
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    return df, {g["url"]: g for g in compute_goldens(rows)}


def test_byte_identical_vs_goldens(corpus_df):
    df, goldens = corpus_df
    out = {r["url"]: r for r in extract_corpus(df, partitions=8).collect()}
    assert len(out) == N
    for url, g in goldens.items():
        assert out[url]["extracted_text"] == g["extracted_text"], url
        assert out[url]["n_elements"] == g["n_elements"], url


def test_parallelism_invariance(corpus_df):
    """Same corpus at 2 vs 13 partitions → identical bytes (scaling protocol
    prerequisite, BASELINE.md)."""
    df, _ = corpus_df
    a = {r["url"]: r["extracted_text"] for r in extract_corpus(df, partitions=2).collect()}
    b = {r["url"]: r["extracted_text"] for r in extract_corpus(df, partitions=13, salt=3).collect()}
    assert a == b


def test_span_invariant(corpus_df):
    df, _ = corpus_df
    for r in extract_corpus(df, partitions=4).collect():
        blocks = r["extracted_text"].split("\n\n") if r["extracted_text"] else []
        assert len(blocks) == len(r["spans"])
        for span, blk in zip(r["spans"], blocks):
            assert r["extracted_text"][span["char_start"]:span["char_end"]] == blk


def test_column_pruning_reaches_scan(spark, corpus_df, tmp_path):
    """The extraction plan must read only (url, html) from the parquet scan —
    SURVEY.md §4 'column pruning analog'."""
    df, _ = corpus_df
    path = str(tmp_path / "corpus.parquet")
    df.write.mode("overwrite").parquet(path)
    plan = extract_corpus(spark.read.parquet(path))._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "url" in read_schema and "html" in read_schema
    assert "warc_ts" not in read_schema and "lang" not in read_schema


def test_documents_roundtrip_html(spark):
    """Extraction over the template-wrapped documents table recovers
    documents.text byte-identically (the oracle-checkable flagship)."""
    from pdf_extraction_spark.corpus import corpus_from_documents

    corpus = corpus_from_documents(spark, "/root/testdata/sf0.001", "html")
    got = {r["url"]: r["extracted_text"] for r in extract_corpus(corpus, partitions=8).collect()}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").collect()
    assert len(got) == len(docs)
    for d in docs:
        url = f"https://{d['source']}.example.com/doc/{d['doc_id']}"
        assert got[url] == d["text"]


def test_iter_binary_views_zero_copy_and_fallbacks():
    """The zero-copy Arrow payload iterator: values match to_pylist() on
    plain, SLICED (non-zero arr.offset), and null-bearing arrays."""
    import pyarrow as pa

    from pdf_extraction_spark.pipeline import _iter_binary_views

    vals = [b"alpha", b"", b"\x00binary\xff", b"d" * 5000, b"end"]
    arr = pa.array(vals, pa.binary())
    got = list(_iter_binary_views(arr))
    assert [bytes(v) for v in got] == vals
    assert all(isinstance(v, memoryview) for v in got)  # really zero-copy
    # sliced array: offsets shifted by arr.offset
    sl = arr.slice(1, 3)
    assert [bytes(v) for v in _iter_binary_views(sl)] == vals[1:4]
    # nulls route through the as_py fallback (kernels handle None)
    with_null = pa.array([b"x", None, b"y"], pa.binary())
    assert list(_iter_binary_views(with_null)) == [b"x", None, b"y"]
    # large_binary (unexpected layout) also falls back
    lb = pa.array(vals, pa.large_binary())
    assert [
        bytes(v) if v is not None else v for v in _iter_binary_views(lb)
    ] == vals
