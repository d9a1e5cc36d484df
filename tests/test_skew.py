"""Skew/bucketing scale techniques: salted agg/join equivalence, and
shuffle-free joins between co-bucketed tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_crawler_spark.operators.skew import salted_agg, salted_join, with_salt
from storage_crawler_spark.sources.lake import write_bucketed


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a tail
    hot = spark.range(0, 900).select(
        F.lit("HOT").alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(0, 100).select(
        F.concat(F.lit("t"), (F.col("id") % 10).cast("string")).alias("k"),
        (F.col("id") + 1000).alias("v"),
    )
    return hot.unionByName(tail)


def test_salt_spreads_hot_key(skewed):
    salted = with_salt(skewed, ["v"], n_salts=16)
    n = salted.filter("k = 'HOT'").select("_salt").distinct().count()
    assert n == 16  # the hot key fans out over every salt


def test_salted_agg_equals_plain(skewed):
    out = salted_agg(
        skewed,
        key="k",
        aggs={"n": "count(*)", "s": "sum(v)", "lo": "min(v)", "hi": "max(v)"},
        spread_cols=["v"],
        n_salts=16,
    )
    plain = skewed.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, "k", {"a": "avg(v)"}, ["v"])


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"t{i}", f"dim{i}") for i in range(10)],
        "k string, attr string",
    )
    out = salted_join(skewed, dim, key="k", n_salts=8)
    plain = skewed.join(dim, on="k", how="inner")
    assert sorted(map(tuple, out.select("k", "v", "attr").collect())) == sorted(
        map(tuple, plain.select("k", "v", "attr").collect())
    )


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed(left, "bk_left", ["k"], n_buckets=4, path=str(tmp_path / "l"))
    write_bucketed(right, "bk_right", ["k"], n_buckets=4, path=str(tmp_path / "r"))
    try:
        joined = spark.table("bk_left").hint("merge").join(spark.table("bk_right"), "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket pairs join in place
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
