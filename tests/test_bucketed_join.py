"""Bucketed tables make repeated equi-joins shuffle-free: the Exchange
disappears from the join plan and results are identical to the shuffled
join. This pins the co-located-join story SURVEY.md §4 claims."""

import pytest

from pdf_extraction_spark.operators.bucketed import write_bucketed

N_BUCKETS = 8


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/wh'")
    # the fixture tables are tiny enough to broadcast, which would bypass
    # the shuffle entirely; disable it so the test exercises the path a
    # 100 TB table takes (shuffle join), where bucketing is what removes
    # the Exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "bktest"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP DATABASE bktest CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    docs = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "concat('text-', id) AS text"
    )
    stats = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "id % 7 AS quality"
    )
    write_bucketed(docs, f"{bucket_db}.docs_b", ["doc_id"], N_BUCKETS, ["doc_id"])
    write_bucketed(stats, f"{bucket_db}.stats_b", ["doc_id"], N_BUCKETS, ["doc_id"])

    joined = (
        spark.table(f"{bucket_db}.docs_b")
        .join(spark.table(f"{bucket_db}.stats_b"), "doc_id")
        .where("quality = 3")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    # same values as the shuffled join over the raw frames
    expect = sorted(
        r.doc_id for r in docs.join(stats, "doc_id").where("quality = 3").collect()
    )
    got = sorted(r.doc_id for r in joined.collect())
    assert got == expect and len(got) > 0


def test_bucketed_groupby_has_no_exchange(spark, bucket_db):
    events = spark.range(0, 5000).selectExpr("id % 100 AS doc_id", "id AS v")
    write_bucketed(events, f"{bucket_db}.ev_b", ["doc_id"], N_BUCKETS, ["doc_id"])
    agg = spark.table(f"{bucket_db}.ev_b").groupBy("doc_id").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert agg.count() == 100
