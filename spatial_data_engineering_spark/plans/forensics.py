"""Corpus forensics report — the pre-ingestion "should we train on this
source" readout, composed entirely of the engine's oracled diagnostics:

  - corpus shape: doc count, token mass, type count (q40/q169 inputs)
  - vocabulary: coverage of the top-1k types (q169), Zipf slope/r2
    (q172 — natural text sits near -1, templates sit shallow)
  - redundancy: exact-dup mass (q45), duplicate overhead from near-dup
    components (q152), lang-label conflicts (q160)
  - signal quality: quality-score AUC against the length proxy (q163)
  - language model fit: corpus-unigram NLL spread across sources (q141)

Output is one (metric, value) table — the golden.py report convention —
so the whole audit is a single collect of ~15 rows regardless of corpus
size.  Every number is the SAME value its standalone oracled query
produces (pinned by tests/test_forensics.py), so the report inherits the
per-operator correctness evidence for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import q152_dup_cluster_sizes
from ..operators.dedup import q45_dedup_exact
from ..operators.textops import (q141_unigram_logprob, q160_lang_mislabel,
                                 q163_score_auc, q169_vocab_coverage,
                                 q172_zipf_fit)


def corpus_forensics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed report: UNION of scalarized diagnostics."""
    exact = q45_dedup_exact(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.col("n_copies") - 1).alias("n_exact_dupes"))
    comps = q152_dup_cluster_sizes(spark, sf_dir).agg(
        F.sum("n_dup_overhead").alias("n_neardup_overhead"))
    mislabel = q160_lang_mislabel(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_lang_conflict_groups"))
    auc = q163_score_auc(spark, sf_dir).select("auc")
    zipf = q172_zipf_fit(spark, sf_dir)
    cov1k = (q169_vocab_coverage(spark, sf_dir)
             .filter(F.col("vocab_size") == 1000).select("coverage"))
    nll = q141_unigram_logprob(spark, sf_dir).agg(
        F.min("avg_nll").alias("min_src_nll"),
        F.max("avg_nll").alias("max_src_nll"))

    rows = [
        exact.select(F.lit("unique_documents").alias("metric"),
                     F.col("n_unique").cast("double").alias("value")),
        exact.select(F.lit("exact_duplicate_docs").alias("metric"),
                     F.col("n_exact_dupes").cast("double").alias("value")),
        comps.select(F.lit("neardup_overhead_docs").alias("metric"),
                     F.col("n_neardup_overhead").cast("double")
                     .alias("value")),
        mislabel.select(F.lit("lang_conflict_groups").alias("metric"),
                        F.col("n_lang_conflict_groups").cast("double")
                        .alias("value")),
        auc.select(F.lit("quality_score_auc").alias("metric"),
                   F.col("auc").cast("double").alias("value")),
        zipf.select(F.lit("zipf_slope").alias("metric"),
                    F.col("slope").cast("double").alias("value")),
        zipf.select(F.lit("zipf_r2").alias("metric"),
                    F.col("r2").cast("double").alias("value")),
        cov1k.select(F.lit("top1k_vocab_coverage").alias("metric"),
                     F.col("coverage").cast("double").alias("value")),
        nll.select(F.lit("min_source_avg_nll").alias("metric"),
                   F.col("min_src_nll").cast("double").alias("value")),
        nll.select(F.lit("max_source_avg_nll").alias("metric"),
                   F.col("max_src_nll").cast("double").alias("value")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
