"""B21 ablation: do the imputation-flag features (any_empty / both_empty)
move F1? (VERDICT r2 item 6 — record the row even if the delta is ~0.)

Reference analog: is_original-vs-imputed booleans fed to the classifier
(/root/reference/record_matching/main.py:394-405, claude_poc/
entity-resolution_v4.py:358-490). The engine's imputation analog is the
empty-token sentinel path, so the flags mark pairs with no token evidence.

Two corpora, same hardened knobs (mutations_max=14, sib_swap=0.25, seed 42):
- stock: the hardened gate corpus as-is (near-zero empty-token files —
  expected delta ~0, the honest negative-result row);
- blanked: a deterministic ~5% of files get non-tokenizable content
  (xxhash64(file_id) % 20 == 0 → "!!!"), preserving truth labels — the
  scenario the flags exist for (pairs whose content features are all
  sentinel values).

For each corpus: train LR with FEATURES-minus-flags vs full FEATURES on
the labeled pairs, sweep tau per model, report F1/P/R. Prints markdown
rows for BENCH.md.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from record_matching_spark.operators.blocking import blocking_keys, candidate_pairs
from record_matching_spark.operators.evaluate import labeled_pair_metrics
from record_matching_spark.operators.normalize import normalize_files
from record_matching_spark.operators.scoring import (
    FEATURES,
    choose_threshold,
    pair_features,
    score_pairs,
    train_weights,
)
from record_matching_spark.synth import labeled_pairs, repo_files, synth_repo_files_with_truth

NO_FLAGS = [f for f in FEATURES if f not in ("any_empty", "both_empty")]


def run(spark: SparkSession, truth, label: str) -> None:
    norm = normalize_files(repo_files(truth)).cache()
    pairs = candidate_pairs(blocking_keys(norm, id_col="fid"), id_col="fid")
    feats = pair_features(pairs, norm, id_col="fid").cache()
    lp = labeled_pairs(truth, id_space="fid").cache()
    lf = feats.join(lp, ["left", "right"], "inner").cache()
    n_empty = int(
        lf.filter(F.col("any_empty") > 0).count()
    )
    for name, fset in (("no flags", NO_FLAGS), ("with flags", FEATURES)):
        w = train_weights(lf, features=fset)
        scored = score_pairs(lf, w, features=fset).cache()
        tau, _ = choose_threshold(scored)
        m = labeled_pair_metrics(scored, lp, tau)
        print(
            f"| {label} ({n_empty} any_empty pairs) | {name} | "
            f"{m['f1']:.5f} | {m['precision']:.5f} | {m['recall']:.5f} |",
            flush=True,
        )
        scored.unpersist()
    for d in (norm, feats, lp, lf):
        d.unpersist()


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("ablation_b21")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    truth = synth_repo_files_with_truth(
        spark, n_families=120, seed=42, members_mean=4, heavy_families=1,
        mutations_max=14, sib_swap=0.25,
    ).cache()
    print("| corpus | features | F1 | precision | recall |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    run(spark, truth, "stock hardened")
    blanked = truth.withColumn(
        "content",
        F.when(F.xxhash64("file_id") % 20 == 0, F.lit("!!!")).otherwise(
            F.col("content")
        ),
    ).cache()
    run(spark, blanked, "5% blanked")
    spark.stop()


if __name__ == "__main__":
    main()
