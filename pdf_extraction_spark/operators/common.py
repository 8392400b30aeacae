"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


PAD_WORD = "pad"


def first_words(text: object, k: int) -> list[str]:
    """First ``k`` space-split words of ``text``, right-padded with
    ``PAD_WORD`` when the document is shorter than ``k`` words.

    The synthetic-fixture builders index into this list (``w[3]`` etc.);
    unpadded, a sub-``k``-word document raised IndexError inside the Arrow
    batch and killed the whole Spark job while the DuckDB oracles silently
    NULL-propagated (review finding). Every oracle that reads word ``i``
    mirrors this guard as ``coalesce(w[i], 'pad')`` so both engines build
    the identical fixture on any input."""
    return (str(text).split(" ") + [PAD_WORD] * k)[:k]
