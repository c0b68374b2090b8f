"""Salted aggregation == unsalted results (FIXTURES.md §3.8 skew case)."""

from pyspark.sql import functions as F

from hybrid_graphrag_with_qdrant_neo4j_spark.operators import skew


def _skewed_df(spark):
    # one key ('hot') carries 80% of rows — the corpus's Zipf shape
    rows = [("hot", f"u{i % 37}", f"c{i}") for i in range(800)]
    rows += [(f"k{i % 20}", f"u{i % 11}", f"c{i}") for i in range(200)]
    return spark.createDataFrame(rows, "key string, user string, chunk string")


def test_salted_count_distinct_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["key"]: r["n"]
        for r in df.groupBy("key").agg(F.countDistinct("user").alias("n")).collect()
    }
    salted = {
        r["key"]: r["n_distinct"]
        for r in skew.salted_count_distinct(df, ["key"], "user").collect()
    }
    assert salted == plain


def test_salted_distinct_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {tuple(r) for r in df.select("key", "user").distinct().collect()}
    salted = {
        tuple(r)
        for r in skew.salted_distinct(df, ["key", "user"], tiebreak_col="chunk").collect()
    }
    assert salted == plain


def test_salted_distinct_salt_spreads_hot_key(spark):
    """The salt must be independent of the dedup key: the hot key's rows
    must land in >1 (key, salt) bucket (the r1 version salted with the
    key itself, so everything collapsed into one bucket)."""
    df = _skewed_df(spark)
    from pyspark.sql import functions as F2

    salted = df.select("key", "user", "chunk").withColumn(
        "_salt", F2.pmod(F2.xxhash64(F2.col("chunk")), F2.lit(skew.DEFAULT_SALTS))
    )
    n_buckets = (
        salted.filter(F2.col("key") == "hot").select("_salt").distinct().count()
    )
    assert n_buckets > 1


def test_salted_join_equals_plain(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("hot", 1.0), ("k3", 2.0), ("k7", 3.0)], "key string, weight double"
    )
    plain = sorted(
        tuple(r) for r in big.join(small, "key").select("key", "chunk", "weight").collect()
    )
    salted = sorted(
        tuple(r)
        for r in skew.salted_join_hot_keys(big, small, "key", tiebreak_col="chunk")
        .select("key", "chunk", "weight")
        .collect()
    )
    assert salted == plain


def test_salt_is_deterministic(spark):
    df = _skewed_df(spark)
    a = {tuple(r) for r in skew.with_salt(df, "chunk").collect()}
    b = {tuple(r) for r in skew.with_salt(df, "chunk").collect()}
    assert a == b
