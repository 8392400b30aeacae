"""Salted-repartition skew test (SURVEY.md §4 item 2): the synthetic corpus
has one pathological host holding ~30% of all rows; without salting that
domain pins one partition at ~30% of the work, with salting it spreads over
``salt`` partitions."""

from pyspark.sql import functions as F

from pdf_extraction_spark.corpus import synth_rows
from pdf_extraction_spark.pipeline import host_col, salted_repartition

N = 2000
P = 16


def _max_partition_fraction(df) -> float:
    sizes = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    return max(r["count"] for r in sizes) / N


def test_salt_flattens_heavy_host(spark):
    rows = synth_rows(N, seed=5)
    df = spark.createDataFrame(
        [(r["url"],) for r in rows], "url string"
    )
    heavy_frac = (
        df.filter(host_col() == "heavy-portal.example.com").count() / N
    )
    assert heavy_frac > 0.25  # the corpus really is skewed

    unsalted = df.repartition(P, F.xxhash64(host_col()))
    salted = salted_repartition(df, P, salt=8)

    max_unsalted = _max_partition_fraction(unsalted)
    max_salted = _max_partition_fraction(salted)

    # unsalted: the heavy host is indivisible -> >= its own 25-30% share
    assert max_unsalted >= heavy_frac
    # salted: spread over 8 sub-keys -> largest partition well under half
    # of the unsalted hot spot
    assert max_salted < max_unsalted / 2
    assert max_salted < 0.15
