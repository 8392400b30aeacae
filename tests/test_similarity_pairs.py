"""`q_embedding_cosine_pairs`' numpy block kernel (round-5 perf rewrite).

The kernel replaced a JVM pair-join whose per-pair cosine was an
interpreted `F.aggregate` fold; correctness there is pinned by the
unchanged DuckDB oracle (tools/check_oracles.py). These tests assert the
property the oracle hash relies on but cannot localize: the kernel's
dimension-sequential float64 accumulation reproduces the JVM/DuckDB
left-fold BIT-FOR-BIT (not merely approximately), plus the tiling and
degenerate-group paths."""

import math

import numpy as np
import pandas as pd
import pytest

from pdf_extraction_spark.operators import similarity


def _fold_cosine(a, b):
    """The exact arithmetic of the JVM `F.aggregate(zip_with(...))` fold
    and DuckDB's `list_sum`: float32 operands widened to float64, one
    multiply-then-add per dimension, left to right."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
        na = na + float(x) * float(x)
        nb = nb + float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _block(vectors, ids=None, label=7):
    arrs = [np.asarray(v, dtype=np.float32) for v in vectors]
    return pd.DataFrame(
        {
            "vec_id": ids if ids is not None else list(range(len(arrs))),
            "label": [label] * len(arrs),
            "embedding": arrs,
        }
    )


def _near_dup_vectors(n, dim=64):
    """n vectors all within cosine ~1 of each other (scaled + last-dim
    perturbed copies of one base) so every pair survives the kernel's
    0.9499 prefilter and the fold comparison covers every output row."""
    base = ((np.arange(dim) % 7) + 0.25).astype(np.float32)
    out = []
    for i in range(n):
        v = base * np.float32(1.0 + 0.5 * (i % 3))
        v = v.copy()
        v[-1] = v[-1] + np.float32(0.001 * i)
        out.append(v)
    return out

def test_kernel_matches_jvm_fold_bit_for_bit():
    vecs = _near_dup_vectors(9)
    out = similarity._cosine_block_pairs(_block(vecs))
    assert len(out) == 36  # all C(9,2) pairs pass the prefilter
    for row in out.itertuples():
        expected = _fold_cosine(vecs[int(row.id_a)], vecs[int(row.id_b)])
        assert row.cos_raw == expected  # bitwise, not approx
        assert row.id_a < row.id_b
        assert row.label == 7


def test_kernel_tiling_is_invisible(monkeypatch):
    vecs = _near_dup_vectors(11)
    whole = similarity._cosine_block_pairs(_block(vecs))
    monkeypatch.setattr(similarity, "PAIRS_TILE_ROWS", 3)
    tiled = similarity._cosine_block_pairs(_block(vecs))
    a = whole.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = tiled.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_kernel_orders_by_id_not_input_position():
    vecs = _near_dup_vectors(4)
    out = similarity._cosine_block_pairs(_block(vecs, ids=[40, 10, 30, 20]))
    assert (out.id_a < out.id_b).all()
    assert set(map(tuple, out[["id_a", "id_b"]].values)) == {
        (10, 20), (10, 30), (10, 40), (20, 30), (20, 40), (30, 40)
    }


def test_kernel_prefilter_drops_far_pairs():
    dim = 64
    e0 = np.zeros(dim, dtype=np.float32)
    e1 = np.zeros(dim, dtype=np.float32)
    e0[0] = 1.0
    e1[1] = 1.0  # orthogonal: cos 0, must not cross Arrow
    near = ((np.arange(dim) % 5) + 1.0).astype(np.float32)
    out = similarity._cosine_block_pairs(_block([e0, e1, near, near * 2]))
    assert set(map(tuple, out[["id_a", "id_b"]].values)) == {(2, 3)}


@pytest.mark.parametrize("n", [0, 1])
def test_kernel_degenerate_groups(n):
    out = similarity._cosine_block_pairs(_block(_near_dup_vectors(2)[:n]))
    assert len(out) == 0
    assert list(out.columns) == ["label", "id_a", "id_b", "cos_raw"]
    assert str(out.dtypes["id_a"]) == "int64"


def test_query_plan_has_no_pair_join(spark):
    df = similarity.q_embedding_cosine_pairs(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    rows = df.collect()
    assert rows, "fixture mutants must produce near-dup pairs"
    assert all(r.cos >= 0.95 and r.id_a < r.id_b for r in rows)
    # the deterministic x1.5 mutants are exact near-dups of their source
    assert any(r.id_b == r.id_a + 1_000_000 and r.cos == 1.0 for r in rows)


def test_kernel_keeps_nan_pairs_like_the_jvm_path_did():
    """Zero-norm vectors make cosine NaN. Spark and DuckDB both order NaN
    above every double, so the replaced JVM path and the unchanged oracle
    EMIT such pairs; numpy's IEEE `NaN >= x` is False, so the kernel must
    keep them explicitly or silently diverge from the oracle."""
    dim = 64
    zero = np.zeros(dim, dtype=np.float32)
    v = ((np.arange(dim) % 5) + 1.0).astype(np.float32)
    out = similarity._cosine_block_pairs(_block([zero, v, v * 2]))
    pairs = {tuple(p) for p in out[["id_a", "id_b"]].values}
    assert (0, 1) in pairs and (0, 2) in pairs  # NaN pairs survive
    assert (1, 2) in pairs
    nan_rows = out[out.id_a == 0]
    assert np.isnan(nan_rows.cos_raw).all()
