"""End-to-end pretraining-data pipeline — the composed recipe a user of
this engine runs to turn a raw document corpus into training-ready,
deduplicated, decontaminated, shuffled, packed shards. Every stage is an
operator from record_matching_spark (each individually DuckDB-oracled /
recall-gated by the driver queries named in COVERAGE.md); this script is
the integration: the stages compose, the accounting reconciles, and the
output is deterministic at any parallelism.

    PYTHONPATH=. python examples/pretraining_pipeline.py [sf_dir]

Stages (driver query exercising each in parentheses):
  1. HTML -> prose extraction            (q45)
  2. PII scrubbing                        (q42)
  3. quality filter, per-rule verdicts    (q51, rules from q15/q40)
  4. URL-level dedup                      (q59)
  5. line-level boilerplate dedup         (q39)
  6. near-dup dedup, keep-one-per-cluster (q50 = q20 pairs + q21 CC)
  7. benchmark decontamination            (q38/q47)
  8. leakage-safe train/val/test split    (q57)
  9. mixture accounting + temperature resample (q48/q49)
 10. deterministic shuffle -> sequence packing -> token-balanced shards
     (q52/q44/q53)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from record_matching_spark.session import get_spark
from record_matching_spark.functions.text import (
    strip_html, scrub_pii, quality_filter, token_count,
)
from record_matching_spark.functions.dedup import (
    dedup_lines, near_dedup_keep_min, ngram_decontaminate,
)
from record_matching_spark.functions.sampling import (
    leakage_safe_split, mixture_report, temperature_sample,
    global_shuffle_rank, pack_sequences, shard_by_budget,
)

EVAL_SOURCES = ("src0", "src1", "src2")


def run(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1-2: extraction + PII scrub (map-only scans; the synthetic corpus is
    # already prose with no PII, so these are pass-through here — wired so
    # a real crawl swaps in with no pipeline change)
    clean = docs.select(
        "doc_id", "lang", "source",
        strip_html(F.col("text")).alias("text"),
    )
    clean = scrub_pii(clean, text_col="text", id_col="doc_id").join(
        clean.drop("text"), "doc_id"
    ).withColumnRenamed("clean_text", "text")

    # 3: quality filter with per-rule accounting
    verdicts = quality_filter(
        clean, min_chars=100, allowed_langs=["en", "de", "fr", "es"],
        lang_col="lang", min_quality=0.45, max_top_2gram_frac=0.12,
    )
    drop_counts = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict").agg(F.count("*").alias("n")).collect()
    }
    kept = clean.join(verdicts.filter("kept").select("doc_id"), "doc_id")

    # 5: line-level boilerplate dedup (4: URL dedup is a no-op on a
    # URL-free corpus — see q59 for the injected-URL exercise)
    lines = dedup_lines(kept, min_docs=2, keep_text=True)
    kept = kept.drop("text").join(
        lines.select("doc_id", F.col("dedup_text").alias("text")), "doc_id"
    )

    # 6: near-dup dedup, keep-one-per-cluster
    survivors = near_dedup_keep_min(kept, threshold=0.9)
    kept = kept.join(survivors.filter("kept").select("doc_id"), "doc_id")
    kept = kept.localCheckpoint(eager=True)

    # 7: exact-n-gram decontamination against the benchmark sources
    bench = docs.filter(F.col("source").isin(*EVAL_SOURCES))
    contaminated = ngram_decontaminate(kept, bench, n=8)
    kept = kept.join(contaminated.select("doc_id"), "doc_id", "left_anti")

    # 8: leakage-safe split (whole near-dup clusters per split)
    split = leakage_safe_split(
        kept, weights={"train": 0.9, "val": 0.05, "test": 0.05},
        threshold=0.9,
    )
    train = kept.join(split.filter("split = 'train'").select("doc_id"), "doc_id")

    # 9: mixture accounting + temperature rebalance on the skewed axis
    toks = train.select(
        "doc_id", "lang", "source", token_count(F.col("text")).alias("n_tokens")
    )
    mix = mixture_report(toks, group_cols=["lang"], weight_col="n_tokens")
    balanced = temperature_sample(toks, group_col="lang", alpha=0.7)

    # 10: shuffle -> pack -> shard
    order = global_shuffle_rank(balanced, id_col="doc_id", seed="epoch0")
    packed = pack_sequences(
        balanced.select("doc_id", "n_tokens"), budget=512
    )
    sharded = shard_by_budget(
        balanced.join(order, "doc_id"),
        token_col="n_tokens", n_shards=8, order_col="shuffle_rank",
    )

    n_train = train.count()
    total_tokens = int(
        balanced.agg(F.sum("n_tokens").alias("t")).collect()[0]["t"] or 0
    )
    return {
        "input_docs": n0,
        "drop_counts": drop_counts,
        "after_quality": verdicts.filter("kept").count(),
        "after_near_dup": survivors.filter("kept").count(),
        "decontaminated_out": contaminated.count(),
        "train_docs": n_train,
        "balanced_docs": balanced.count(),
        "total_tokens": total_tokens,
        "n_sequences": packed.agg(
            (F.max("seq_id") + 1).alias("s")
        ).collect()[0]["s"],
        "shards": sharded.groupBy("shard").agg(
            F.sum("n_tokens").alias("tokens")
        ).count(),
        "mixture_rows": mix.count(),
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="pretraining-pipeline", driver_memory="8g")
    out = run(spark, sf)
    for k, v in out.items():
        print(f"{k}: {v}")
