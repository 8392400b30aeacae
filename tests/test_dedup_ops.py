"""Dedup-operator unit/property tests beyond the DuckDB oracle gate:
connected-components convergence on adversarial diameters (VERDICT r2
item 7), the bounded verify-set guard (item 4), and the vectorized
winnowing kernel vs a per-char reference implementation (item 2)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators import dedup
from pdf_extraction_spark.operators.textops import (
    WINNOW_B,
    WINNOW_K,
    WINNOW_W,
    _winnow_batches,
)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["id_a", "id_b"]))


def test_connected_components_long_path_converges(spark):
    """A 20-node path graph has diameter 19 — the r2 flat 12-round cap
    mislabeled it; pointer doubling must converge to a single component."""
    edges = [(i, i + 1) for i in range(19)]
    out = dedup.connected_components(_pairs_df(spark, edges)).collect()
    assert len(out) == 1
    assert out[0].component_root == 0 and out[0].n_members == 20


def test_connected_components_multiple_components(spark):
    edges = [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)]
    out = {
        r.component_root: r.n_members
        for r in dedup.connected_components(_pairs_df(spark, edges)).collect()
    }
    assert out == {0: 3, 10: 2, 20: 4}


def test_verify_sets_hashes_and_caps(spark, monkeypatch):
    """Verify sets must hold 8-byte hashes (not raw shingle strings) and
    degrade to the bottom-k sketch beyond the cap."""
    monkeypatch.setattr(dedup, "VERIFY_SET_CAP", 4)
    sh = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1] * 10 + [2] * 3, "sh": [f"shingle {i}" for i in range(10)] + ["a", "b", "c"]}
        )
    )
    rows = {r.doc_id: r for r in dedup._verify_sets(sh).collect()}
    assert rows[1].n_sh == 4 and len(rows[1].shset) == 4
    assert rows[2].n_sh == 3 and len(rows[2].shset) == 3
    assert all(isinstance(v, int) for v in rows[1].shset)  # hashed, not strings
    assert rows[1].shset == sorted(rows[1].shset)  # bottom-k = smallest hashes


def _winnow_reference(text: str):
    """Per-position reference implementation (the oracle's SQL, in Python):
    poly hash per k-gram, min over the CURRENT..W-1 FOLLOWING frame."""
    L = len(text) - (WINNOW_K - 1)
    if L <= 0:
        return None
    hs = [
        sum(ord(text[i + j]) * pow(WINNOW_B, WINNOW_K - 1 - j, 1 << 32) for j in range(WINNOW_K))
        % (1 << 32)
        for i in range(L)
    ]
    sel = [min(hs[i : min(i + WINNOW_W, L)]) for i in range(L)]
    return len(set(sel)), min(sel)


@pytest.mark.parametrize(
    "text",
    [
        "abcdefghij",
        "aaaaaaaaaaaaaaaa",
        "The quick brown fox jumps over the lazy dog " * 5,
        "short",  # < K chars: no row
        "exactly8",  # == K chars: one gram
        "ünïcödé çhärs — ασδφ κλμν " * 3,  # non-ASCII code points
        "x" * (WINNOW_K + WINNOW_W - 1),  # L == W boundary
    ],
)
def test_winnow_kernel_matches_reference(text):
    pdf = pd.DataFrame({"doc_id": [7], "text": [text]})
    out = pd.concat(list(_winnow_batches([pdf])), ignore_index=True)
    ref = _winnow_reference(text)
    if ref is None:
        assert out.empty
    else:
        assert (int(out.n_fp[0]), int(out.min_fp[0])) == ref


def test_component_labels_per_node(spark):
    """component_labels returns one (node, lbl) row per node with the
    component-min label."""
    out = {
        r["node"]: r["lbl"]
        for r in dedup.component_labels(
            _pairs_df(spark, [(1, 2), (2, 3), (10, 11)])
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_keep_best_argmax_is_deterministic(spark):
    """Keeper = highest quality, doc_id ascending on ties."""
    from pyspark.sql import Window

    labels = dedup.component_labels(_pairs_df(spark, [(1, 2), (2, 3), (7, 8)]))
    quality = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 7, 8], "quality": [0.5, 0.9, 0.9, 0.4, 0.4]}
        )
    )
    j = labels.join(quality, labels.node == quality.doc_id)
    w = Window.partitionBy("lbl").orderBy(F.desc("quality"), F.asc("doc_id"))
    keep = (
        j.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("lbl", "doc_id")
        .collect()
    )
    got = {r["lbl"]: r["doc_id"] for r in keep}
    # cluster {1,2,3}: 2 and 3 tie on quality -> 2 wins; cluster {7,8} -> 7
    assert got == {1: 2, 7: 7}


def test_excluded_block_metrics_reports_skipped_mass(spark):
    """VERDICT r3 item 8: the quadratic-guard caps must surface what they
    dropped as a metrics row, not drop silently."""
    from pdf_extraction_spark.operators.dedup import excluded_block_metrics

    rows = spark.createDataFrame(
        [("hot", i) for i in range(7)]
        + [("warm", i) for i in range(4)]
        + [("cold", 0)],
        "source string, doc_id int",
    )
    m = excluded_block_metrics(rows, "source", cap=3).collect()[0]
    assert m.n_excluded_blocks == 2          # hot (7) and warm (4)
    assert m.n_excluded_rows == 11
    assert m.max_block == 7
    # nothing over the cap -> an explicit zero row, never an empty frame
    z = excluded_block_metrics(rows, "source", cap=100).collect()[0]
    assert (z.n_excluded_blocks, z.n_excluded_rows, z.max_block) == (0, 0, 0)


def test_excluded_metrics_companions_run_on_real_corpus(spark):
    """The pairing the operator docstrings promise: both capped queries have
    a runnable metrics companion over the SAME corpus + cap (VERDICT r3
    item 8 closed in the code path, not just the helper)."""
    from pdf_extraction_spark.operators.dedup import ngram_jaccard_excluded_metrics
    from pdf_extraction_spark.operators.similarity import (
        cosine_pairs_excluded_metrics,
    )

    sf = "/root/testdata/sf0.001"
    for fn in (ngram_jaccard_excluded_metrics, cosine_pairs_excluded_metrics):
        m = fn(spark, sf).collect()[0]
        # test corpus sits far below both caps: explicit zero rows
        assert (m.n_excluded_blocks, m.n_excluded_rows) == (0, 0), fn.__name__


def test_shingle_parity_on_short_docs(spark):
    """Docs with <3 words (review finding): Spark's concat_ws skips the
    NULL out-of-bounds words while the oracle used to coalesce them to ''
    and keep the separators ('x y' vs 'x y '); both sides now use
    concat_ws (DuckDB's skips NULLs identically), so shingle strings must
    match byte-for-byte — including the trailing-space doc whose THIRD
    token is a real '' (kept on both sides)."""
    import duckdb

    texts = ["solo", "x y", "x y ", "one two three four", ""]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    )
    srows = {(r.doc_id, r.sh) for r in dedup._shingles(docs).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE all_docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO all_docs VALUES (?, ?)", list(enumerate(texts))
    )
    orows = {tuple(r) for r in con.execute(dedup._SHINGLES_SQL).fetchall()}
    assert srows == orows, srows ^ orows
    # the 2-word doc makes exactly 'x y' (no trailing pad) on both sides
    assert (1, "x y") in srows and (2, "x y ") in srows
