"""Real-model swap-in path for the scoring plumbing (q42/q44): an
Arrow pandas_udf scorer — an arithmetic stand-in with exactly a model's
signature (text batch in, score vector out) — driven through the SAME
downstream plumbing as the JVM heuristics.  Pins that the documented
integration point works and that swapping the scorer cannot change the
aggregation semantics: with an equivalent scoring function the outputs
are identical, not merely same-shaped."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .conftest import SF_ORACLE

_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "es": ("el", "los", "las", "y"),
}
_ORDER = ("en", "de", "fr", "es")


def _lang_model_udf():
    """Stand-in 'model': batch of texts -> per-language score vector.
    Computes the same marker-token counts as the JVM expressions, but
    entirely in pandas — the exact shape a fasttext/transformer scorer
    would have (Arrow batch in, vector out).  Built lazily: pandas_udf
    registration needs an active session."""

    @pandas_udf("array<double>")
    def model_lang_scores(text: pd.Series) -> pd.Series:
        def score(t: str) -> list[float]:
            toks = set(t.split(" "))
            return [float(len(toks.intersection(_MARKERS[lang])))
                    for lang in _ORDER]

        return text.map(score)

    return model_lang_scores


def test_lang_id_pandas_scorer_matches_jvm(spark):
    from spatial_data_engineering_spark.catalog import load
    from spatial_data_engineering_spark.operators.textops import (
        lang_id_confusion)

    udf = _lang_model_udf()

    def score_cols(text_col):
        arr = udf(text_col)
        # element_at is 1-based; cast back to int so the downstream CASE
        # compares like-for-like with the JVM scorer
        return [F.element_at(arr, i + 1).cast("int")
                for i in range(len(_ORDER))]

    d = load(spark, SF_ORACLE, "documents")
    jvm = lang_id_confusion(d).toPandas()
    model = lang_id_confusion(d, score_cols=score_cols)
    # the pandas path really runs as an Arrow-batched eval, not row UDF
    plan = model._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    model = model.toPandas()

    # identical schema AND identical confusion matrix — the plumbing is
    # scorer-agnostic
    assert list(jvm.columns) == list(model.columns)
    key = ["lang", "pred_lang"]
    a = jvm.sort_values(key).reset_index(drop=True)
    b = model.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_quality_pandas_scorer_through_tiering_and_filter(spark):
    from spatial_data_engineering_spark.catalog import load
    from spatial_data_engineering_spark.operators.textops import (
        quality_filter, quality_tiers)

    @pandas_udf("double")
    def model_quality(text: pd.Series) -> pd.Series:
        # stand-in quality model: length-squashed score in [0, 1]
        n = text.str.len().astype("float64")
        return (n / (n + 400.0)).round(6)

    def scorer(frame):
        return frame.select(
            "doc_id", "lang", model_quality(F.col("text")).alias("quality"))

    d = load(spark, SF_ORACLE, "documents")

    tiers = quality_tiers(d, scorer=scorer).toPandas()
    # same output contract as the JVM path
    assert list(tiers.columns) == ["tier", "n_docs", "min_q", "max_q"]
    assert set(tiers["tier"]) <= {"keep", "review", "drop"}
    assert tiers["n_docs"].sum() == d.count()

    kept = quality_filter(d, scorer=scorer).toPandas()
    assert list(kept.columns) == ["doc_id", "lang", "quality", "p25"]
    # the per-language p25 cut keeps ~75% of each language
    n_by_lang = d.groupBy("lang").count().toPandas().set_index("lang")["count"]
    k_by_lang = kept.groupby("lang")["doc_id"].count()
    for lang, n in n_by_lang.items():
        assert 0.70 * n <= k_by_lang.get(lang, 0) <= 0.80 * n + 1
