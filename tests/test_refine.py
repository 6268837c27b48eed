"""B15 cluster refinement: a seeded mega-cluster (two entities bridged by a
single false-positive edge) is split; coherent clusters pass untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_matching_spark.operators.cluster import cluster_assignments
from record_matching_spark.operators.refine import cluster_coherence, refine_clusters


def _scored(spark, rows):
    return spark.createDataFrame(rows, "left long, right long, score double")


def test_refine_splits_bridged_mega_cluster(spark):
    # entity A = {1,2,3}, entity B = {10,11,12}; edge 3-10 is the FP bridge
    scored = _scored(spark, [
        (1, 2, 0.97), (2, 3, 0.96), (1, 3, 0.95),
        (10, 11, 0.98), (11, 12, 0.97), (10, 12, 0.96),
        (3, 10, 0.55),  # false positive above the CC threshold 0.5
        # a separate, coherent cluster C = {20,21}
        (20, 21, 0.99),
    ])
    nodes = spark.range(0, 0).select(F.col("id").alias("node")).unionByName(
        spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 12, 20, 21]],
                              "node long")
    )
    edges = scored.filter(F.col("score") > 0.5).select(
        F.col("left").alias("src"), F.col("right").alias("dst")
    )
    assign = cluster_assignments(edges, nodes, "node")
    merged = {r["cluster_id"] for r in assign.filter(
        F.col("node").isin([1, 2, 3, 10, 11, 12])).collect()}
    assert merged == {1}, "precondition: bridge merges A and B into one cluster"

    coh = {r["cluster_id"]: r for r in
           cluster_coherence(assign, scored, "node").collect()}
    assert coh[1]["size"] == 6
    assert coh[1]["coherence"] < 0.92  # dragged down by the 0.55 bridge
    assert coh[20]["coherence"] > 0.98

    refined = refine_clusters(
        assign, scored, "node",
        coherence_tau=0.92, edge_tau=0.8, min_size=3,
    )
    got = {r["node"]: r["cluster_id"] for r in refined.collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10
    assert got[1] != got[10], "mega-cluster split at the weak bridge"
    assert got[20] == got[21], "coherent cluster untouched"
    assert len(got) == 8


def test_pipeline_recall_first_then_refine(spark, tmp_path):
    """The two-stage pattern on the HARDENED corpus: a recall-max threshold
    (tau=0.2) chains sibling entities into mega-clusters (ARI ~0.64,
    precision ~0.51); the coherence refinement pass splits them back to
    near-perfect clusters — B15's measured value (sweep in BENCH.md)."""
    from pyspark.sql import functions as F

    from record_matching_spark.operators.evaluate import adjusted_rand_index
    from record_matching_spark.pipeline import Pipeline, PipelineConfig
    from record_matching_spark.synth import repo_files, synth_repo_files_with_truth

    truth = synth_repo_files_with_truth(
        spark, n_families=60, seed=42, members_mean=4, heavy_families=0,
        mutations_max=14, sib_swap=0.25,
    ).cache()
    files = repo_files(truth)
    tmap = truth.select("file_id", "entity_id")

    raw = Pipeline(spark, tmp_path / "raw", PipelineConfig(tau=0.2)).run(files)
    ari_raw = adjusted_rand_index(raw, tmap)

    refined = Pipeline(
        spark, tmp_path / "ref", PipelineConfig(tau=0.2, refine=True)
    ).run(files)
    ari_ref = adjusted_rand_index(refined, tmap)

    # deterministic corpus: measured ari_raw ≈ 0.877, ari_ref ≈ 0.973 with
    # DEFAULT weights (trained weights reach 0.9999 — see BENCH.md sweep)
    assert ari_raw < 0.9, f"expected mega-clusters at tau=0.2, got ARI {ari_raw:.3f}"
    assert ari_ref > 0.95, f"refinement should restore clusters, ARI {ari_ref:.3f}"
    assert ari_ref - ari_raw > 0.05


def test_refine_isolates_members_without_strong_edges(spark):
    # star around 1 with all-weak edges: refinement shatters it to singletons
    scored = _scored(spark, [(1, 2, 0.6), (1, 3, 0.55), (2, 3, 0.51)])
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    edges = scored.select(F.col("left").alias("src"), F.col("right").alias("dst"))
    assign = cluster_assignments(edges, nodes, "node")
    refined = refine_clusters(assign, scored, "node",
                              coherence_tau=0.9, edge_tau=0.8, min_size=3)
    got = {r["node"]: r["cluster_id"] for r in refined.collect()}
    assert got == {1: 1, 2: 2, 3: 3}
