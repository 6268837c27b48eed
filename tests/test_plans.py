"""Physical-plan contracts: pushdown, pruning, codegen, no row-wise Python."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_matching_spark.plans.audit import plan_audit

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    a = plan_audit(df)
    assert a["pushed_filters"], "filter not pushed to parquet scan"
    assert any("30" in p for p in a["pushed_filters"])
    cols = a["read_schema_cols"][0]
    assert set(cols) == {"l_orderkey", "l_quantity"}, f"scan reads {cols}"


def test_broadcast_join_chosen(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    df = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).groupBy(
        "c_mktsegment").count()
    a = plan_audit(df)
    assert a["broadcast_joins"] >= 1


def test_er_scoring_plan_has_no_rowwise_python(spark, truth_df):
    """North rule: no per-row Python. Arrow/pandas UDF nodes only."""
    from record_matching_spark.operators.blocking import blocking_keys, candidate_pairs
    from record_matching_spark.operators.normalize import normalize_files
    from record_matching_spark.operators.scoring import pair_features, score_pairs
    from record_matching_spark.synth import repo_files

    norm = normalize_files(repo_files(truth_df.limit(200)))
    pairs = candidate_pairs(blocking_keys(norm))
    scored = score_pairs(pair_features(pairs, norm))
    a = plan_audit(scored)
    assert a["rowwise_python_nodes"] == 0, "row-at-a-time Python UDF in plan!"
    assert a["arrow_udf_nodes"] >= 1      # the pandas UDFs are Arrow-backed
    assert a["broadcast_joins"] + a["sortmerge_joins"] >= 2


def test_quality_score_is_pure_catalyst(spark):
    from record_matching_spark.functions.text import add_text_features

    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = plan_audit(add_text_features(d))
    assert a["rowwise_python_nodes"] == 0
    assert a["arrow_udf_nodes"] == 0      # text ops never leave the JVM
