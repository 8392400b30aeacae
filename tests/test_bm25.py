"""BM25 retrieval (bm25_retrieval): integer-exact scoring contract.

Three independent checks:
1. a pure-Python third implementation (pyarrow + collections) reproduces the
   Spark result EXACTLY — the integer-rational design means there is one
   right answer, not an approximation band;
2. the result is invariant to shuffle partitioning (the BIGINT sums are
   order-independent by construction);
3. plan gates: JVM-only, no cartesian, broadcast query side.
"""

import math
from collections import Counter

import pytest

from pdf_extraction_spark.operators import textops

SF = "/root/testdata/sf0.001"


def _reference_bm25(sf_dir: str):
    """Independent pure-Python BM25 with the operator's exact integer
    contract: idf_u = round(ln(1+(N-df+0.5)/(df+0.5))*1e4), contribution
    idf_u*22*S*tf // (10*S*tf + 3*S + 9*dl*N), summed per (qid, doc)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    words = {d: txt.split(" ") for d, txt in rows}
    dl = {d: len(w) for d, w in words.items()}  # raw split size, pre-filter
    S = sum(dl.values())
    N = len(rows)
    queries = {
        d: {tok for tok in w[: textops.BM25_QUERY_WORDS] if tok != ""}
        for d, w in words.items()
        if d < textops.BM25_N_QUERIES
    }
    qtoks = set().union(*queries.values())
    tf = {}  # (tok, doc) -> tf, restricted to query tokens
    for d, w in words.items():
        c = Counter(tok for tok in w if tok in qtoks and tok != "")
        for tok, n in c.items():
            tf[(tok, d)] = n
    df = Counter(tok for tok, _ in tf)
    idf_u = {
        # floor(x+0.5), NOT Python round(): round() is banker's (HALF_EVEN)
        # while Spark F.round and DuckDB round() are both HALF_UP — on an
        # exact k+0.5 double they disagree (11/11 vs 10)
        tok: math.floor(math.log(1 + (N - df[tok] + 0.5) / (df[tok] + 0.5)) * textops.BM25_IDF_SCALE + 0.5)
        for tok in df
    }
    scores = Counter()
    for (tok, d), f in tf.items():
        for qid, toks in queries.items():
            if tok in toks and d != qid:
                scores[(qid, d)] += idf_u[tok] * (22 * S * f) // (10 * S * f + 3 * S + 9 * dl[d] * N)
    out = []
    for qid in queries:
        ranked = sorted(
            ((s, d) for (q, d), s in scores.items() if q == qid),
            key=lambda x: (-x[0], x[1]),
        )[: textops.BM25_TOP_K]
        out.extend((qid, r + 1, d, s) for r, (s, d) in enumerate(ranked))
    return sorted(out)


def test_bm25_matches_pure_python_reference(spark):
    got = sorted(
        tuple(r) for r in textops.q_bm25_retrieval(spark, SF).collect()
    )
    assert got == _reference_bm25(SF)


def test_bm25_partitioning_invariant(spark):
    base = sorted(tuple(r) for r in textops.q_bm25_retrieval(spark, SF).collect())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        other = sorted(tuple(r) for r in textops.q_bm25_retrieval(spark, SF).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == other


def test_bm25_plan_jvm_only_no_cartesian(spark):
    df = textops.q_bm25_retrieval(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # JVM column algebra throughout
    assert "CartesianProduct" not in plan
    # the query-token side is broadcast into the postings join
    assert "BroadcastHashJoin" in plan


def test_bm25_overflow_guard_fires(spark, monkeypatch):
    """With the idf scale cranked to 1e15 the worst-case contribution
    product exceeds LONG_MAX on the sf0.001 corpus; the guard must raise
    loudly instead of letting non-ANSI BIGINT arithmetic wrap to a silently
    wrong ranking (DuckDB errors natively on the same inputs)."""
    monkeypatch.setattr(textops, "BM25_IDF_SCALE", 10**15)
    with pytest.raises(Exception, match="overflow"):
        textops.q_bm25_retrieval(spark, SF).collect()


def test_bm25_output_shape(spark):
    rows = textops.q_bm25_retrieval(spark, SF).collect()
    assert rows, "retrieval returned nothing"
    by_q = Counter(r.qid for r in rows)
    for qid, n in by_q.items():
        assert n <= textops.BM25_TOP_K
        ranks = sorted(r.rank for r in rows if r.qid == qid)
        assert ranks == list(range(1, n + 1))
    assert all(r.score_u > 0 for r in rows)
    assert all(r.doc_id != r.qid for r in rows)
