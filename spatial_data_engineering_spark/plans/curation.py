"""End-to-end training-data curation pipeline — the LLM-data counterpart
of the flagship spatial report: every stage is one of the engine's
oracled operators, chained into a single Catalyst DAG a user points at a
raw corpus to get packed, split, decontaminated training shards out.

Stage order matters and mirrors production practice:

  1. exact dedup FIRST (hash groupBy keeps lowest doc_id) — identical
     texts collapse before any pairwise machinery, which is also what
     keeps LSH bucket sizes sane (SCALE_NOTES "negative results" #1);
  2. near-dup removal via the MinHash-LSH pair list (q47 shape) closed
     over connected components conceptually — here the admission rule is
     simply "drop the higher doc_id of every confirmed pair", the
     standard keep-first policy;
  3. benchmark decontamination (q79 shape): any doc whose shingle
     overlap with the held-out benchmark exceeds the threshold is
     removed from ALL splits, not just eval — and so are the benchmark
     member documents themselves (eval text must never reach train);
  4. quality-quartile cut per language (q80's core, computed on the
     deduped/decontaminated survivors — the cut reflects the corpus
     that actually remains, not the raw distribution's duplicates);
  5. language balancing to a per-language budget (q78's core, rates
     from the post-cut survivor counts so realized sizes land on K);
  6. deterministic train/val/test assignment (q73's md5 bucket);
  7. greedy sequence packing per (split, shard) (q77) so the output is
     training-ready bins.

Every stage is a pure function of content hashes — re-running the
pipeline on the same corpus yields byte-identical shards on any cluster
layout (the engine's determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full curation DAG; returns (doc_id, lang, split, shard,
    bin_idx, n_tokens) — the packed training-shard assignment."""
    from ..operators.dedup import QUERIES as DQ
    from ..operators.textops import (QUERIES as TQ, _PACK_CAP,
                                     _PACK_SHARDS)

    d = load(spark, sf_dir, "documents")

    # 1. exact dedup: keep each content hash's lowest doc_id
    keepers = DQ["q45_dedup_exact"](spark, sf_dir) \
        .select(F.col("keeper_doc_id").alias("doc_id"))
    corpus = d.join(F.broadcast(keepers), "doc_id")

    # 2. near-dup removal: drop the higher id of each confirmed LSH pair
    # (via the shared materialized pair set — computed once per session,
    # not re-derived by every graph consumer)
    from ..operators.dedup import near_dup_pairs

    pairs = near_dup_pairs(spark, sf_dir)
    losers = pairs.select(F.col("b_id").alias("doc_id")).distinct()
    corpus = corpus.join(losers, "doc_id", "left_anti")

    # 3. decontamination: drop flagged docs AND the benchmark members
    # themselves — eval text must not land in any split.  Membership here
    # is a pure function of doc_id (q79's contract), so the member drop
    # is a shuffle-free filter; with a real eval suite it would be the
    # same left_anti as the flagged set.
    from ..operators.textops import _DECON_MOD

    contaminated = TQ["q79_decontaminate"](spark, sf_dir) \
        .select("doc_id")
    corpus = (corpus.join(contaminated, "doc_id", "left_anti")
              .filter(F.col("doc_id") % _DECON_MOD != 0))

    # 4. per-language quality-quartile cut — q80's core on the SURVIVORS,
    # so the p25 thresholds reflect the deduped/decontaminated corpus,
    # not the raw distribution (whose duplicates would skew the cut)
    from ..operators.textops import balance_corpus, quality_filter

    quality_kept = quality_filter(corpus).select("doc_id")
    corpus = corpus.join(quality_kept, "doc_id")

    # 5. language balancing — q78's core on the post-cut survivors, so
    # keep-rates are computed from the counts actually entering this
    # stage and realized per-language sizes concentrate around K
    balanced = balance_corpus(corpus).select("doc_id")
    corpus = corpus.join(balanced, "doc_id")

    # 6. deterministic split assignment (q73's md5 bucket contract)
    from ..operators.textops import _md5_bucket

    bucket = F.expr(_md5_bucket("spark", "doc_id"))
    corpus = corpus.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test"))

    # 7. greedy packing per (split, shard) — q77's walk, applied to the
    # curated survivors only
    import pandas as pd

    toks = corpus.select(
        "doc_id", "lang", "split",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, bin_idx, cum = [], 0, 0
        for i, n in enumerate(pdf["n_tokens"]):
            if i == 0:
                cum = n
            elif cum + n > _PACK_CAP:
                bin_idx += 1
                cum = n
            else:
                cum += n
            bins.append(bin_idx)
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "lang", "split", "shard", "bin_idx",
                    "n_tokens"]]

    return toks.groupBy("split", "shard").applyInPandas(
        pack, schema="doc_id bigint, lang string, split string, "
                     "shard bigint, bin_idx bigint, n_tokens bigint")
