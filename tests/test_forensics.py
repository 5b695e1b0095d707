"""The forensics report must surface the SAME numbers its standalone
oracled queries produce — composition adds no second source of truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_ORACLE


def test_forensics_matches_standalone_queries(spark):
    from spatial_data_engineering_spark.operators.dedup import (
        q45_dedup_exact)
    from spatial_data_engineering_spark.operators.textops import (
        q163_score_auc, q172_zipf_fit)
    from spatial_data_engineering_spark.plans.forensics import (
        corpus_forensics)

    got = {r["metric"]: r["value"]
           for r in corpus_forensics(spark, SF_ORACLE).collect()}
    assert len(got) == 10

    exact = q45_dedup_exact(spark, SF_ORACLE).agg(
        F.count(F.lit(1)).alias("u"),
        F.sum(F.col("n_copies") - 1).alias("d")).collect()[0]
    assert got["unique_documents"] == float(exact["u"])
    assert got["exact_duplicate_docs"] == float(exact["d"])

    auc = q163_score_auc(spark, SF_ORACLE).collect()[0]["auc"]
    assert got["quality_score_auc"] == auc

    zipf = q172_zipf_fit(spark, SF_ORACLE).collect()[0]
    assert got["zipf_slope"] == zipf["slope"]
    assert got["zipf_r2"] == zipf["r2"]

    # report-level sanity: the fixture is templated text, so the Zipf
    # slope must sit far above the natural-language -1
    assert got["zipf_slope"] > -0.5
    assert 0.0 < got["top1k_vocab_coverage"] <= 1.0
