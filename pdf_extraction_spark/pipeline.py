"""Spark extraction pipeline: salted repartition → Arrow-batched extraction.

Rebuilds the reference's eager per-document loop
(hybrid_docling_gpt4_processor.py:474-532) as a declarative plan:

    corpus ─ select(url, html)            # column pruning before Python
           ─ repartition(P, xxhash64(host), salt)   # explicit skew defusal
           ─ mapInPandas(extract_batch)   # Arrow batches through the kernels
           ─ sink (parquet, Iceberg-compatible layout)

No per-row Python crosses the JVM boundary outside the Arrow batch path;
kernels initialize once per partition (scalar-iterator form). The salt term
splits pathological hosts (a single domain holding 30% of a 10^12-row corpus)
across ``salt`` partitions while keeping host locality for everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kernels.dispatch import extract_document

SPAN_TYPE = T.StructType(
    [
        T.StructField("elem_type", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("char_start", T.LongType()),
        T.StructField("char_end", T.LongType()),
        T.StructField("bbox", T.ArrayType(T.DoubleType())),
        # title-containment hierarchy (fills the reference's _build_hierarchy
        # stub, advanced_layout_extractor.py:540-554); parent_id is the span
        # array index of the parent, -1 for roots — children_ids is its
        # relational inverse (a groupBy on parent_id), not materialized
        T.StructField("hierarchy_level", T.IntegerType()),
        T.StructField("parent_id", T.IntegerType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("n_elements", T.IntegerType()),
        T.StructField("method", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def host_col(url_col="url"):
    """url-host for partitioning (pure JVM regexp, codegen'd)."""
    return F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)


def salted_repartition(df: DataFrame, partitions: int, salt: int = 8) -> DataFrame:
    """Explicit salted repartition on url-host (SURVEY.md §4 item 2).

    Hash-partitions on ``(xxhash64(host), pmod(xxhash64(url), salt))`` — hot
    domains spread over ``salt`` partitions, cold domains stay co-located.
    """
    return df.repartition(
        partitions,
        F.xxhash64(host_col()),
        F.pmod(F.xxhash64(F.col("url")), F.lit(salt)),
    )


def _make_extract_batches(keep_cols: tuple[str, ...] = ()):
    """mapInPandas worker factory: one kernel pass per Arrow batch;
    ``keep_cols`` are carried through untouched (e.g. the lineage bucket)."""

    def _extract_batches(batches):
        import pandas as pd

        for pdf in batches:
            urls = pdf["url"].tolist()
            payloads = pdf["html"].tolist()
            texts, spans_col, n_elems, methods, errors = [], [], [], [], []
            for payload in payloads:
                res = extract_document(payload)
                texts.append(res["text"])
                spans_col.append(
                    [
                        {
                            "elem_type": s[0],
                            "page": s[1],
                            "char_start": s[2],
                            "char_end": s[3],
                            "bbox": list(s[4]),
                            "hierarchy_level": s[5],
                            "parent_id": s[6],
                        }
                        for s in res["spans"]
                    ]
                )
                n_elems.append(res["n_elements"])
                methods.append(res["method"])
                errors.append(res["error"])
            out = {
                "url": urls,
                "extracted_text": texts,
                "spans": spans_col,
                "n_elements": n_elems,
                "method": methods,
                "error": errors,
            }
            for c in keep_cols:
                out[c] = pdf[c].tolist()
            yield pd.DataFrame(out)

    return _extract_batches


def extract_corpus(
    corpus: DataFrame,
    partitions: int | None = None,
    salt: int = 8,
    repartition: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Run the extraction pipeline over a corpus DataFrame.

    Prunes to ``(url, html)`` (+ ``keep_cols``) before the Python stage so
    the parquet scan reads only the needed columns (ReadSchema check in
    tests), then salted repartition, then the Arrow-batched kernel stage.
    """
    pruned = corpus.select("url", "html", *keep_cols)
    if repartition:
        if partitions is None:
            partitions = corpus.sparkSession.sparkContext.defaultParallelism
        pruned = salted_repartition(pruned, partitions, salt)
    schema = T.StructType(
        OUTPUT_SCHEMA.fields + [corpus.schema[c] for c in keep_cols]
    )
    return pruned.mapInPandas(_make_extract_batches(keep_cols), schema=schema)


def write_sink(result: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Parquet sink in an Iceberg-compatible layout (S6 analog —
    hybrid_docling_gpt4_processor.py:692-693 wrote one JSON per doc; we
    append to a table instead)."""
    result.write.mode(mode).parquet(path)
