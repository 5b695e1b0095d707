"""Deduplication operators for large-scale training-data pipelines.

North-star surface (BASELINE.json): exact dedup, token-fingerprint dedup,
MinHash+LSH near-dup, SimHash bucketing.  All are single-DAG Spark jobs —
hash/groupBy for exact tiers, banded self-joins for the probabilistic ones.

Scale shape (100 TB): every variant reduces to groupBy/join on a *hash*,
so partitioning is uniform by construction (md5 output is uniform — no key
skew), map-side partial aggregation applies, and the LSH band join only
shuffles (doc_id, band) pairs, never document text.  Exact-Jaccard
verification of candidates re-joins the (small) candidate set back to the
token arrays.

Determinism: md5 is the portable hash (identical in Spark and DuckDB), so
every query here is fully oracle-checkable — including MinHash-LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

QUERIES: dict = {}
ORACLES: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# --------------------------------------------------------------------------
# q45 — exact dedup: content-hash groupBy, keep the lowest doc_id.
# --------------------------------------------------------------------------
@query(
    "q45_dedup_exact",
    """
    SELECT md5(text) AS h, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
    FROM documents GROUP BY 1
    """,
)
def q45_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id")
    )


# --------------------------------------------------------------------------
# q46 — token-sort fingerprint dedup (bag-of-words collision): normalize to
# the sorted distinct token set, hash, group.  Catches reorderings /
# shuffled near-copies that exact hashing misses.
# --------------------------------------------------------------------------
@query(
    "q46_dedup_tokensort",
    """
    SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS h,
           COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
    FROM documents GROUP BY 1
    """,
)
def q46_dedup_tokensort(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " "))
    return d.groupBy(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id")
    )


# --------------------------------------------------------------------------
# q47 — MinHash + LSH near-dup detection, fully oracle-checkable.
#
# Pipeline: distinct-token set -> 8 MinHash values (min over md5(seed:tok))
# -> 2 bands of 4 -> band-bucket self-join for candidates -> exact Jaccard
# verify -> pairs with J >= 0.9.
#
# At scale: the band join is an equi-join on an md5 bucket (uniform keys),
# candidates are a tiny fraction of n^2, and the exact-Jaccard verify only
# touches candidates.  This is the shingle->minhash->band->bucket-join plan
# the north star asks for; shingling is char-8-grams in q43 and distinct
# tokens here.
# --------------------------------------------------------------------------
_N_HASHES = 8
_BAND_SIZE = 4


def _minhash_spark(col: str, i: int) -> str:
    return (f"array_min(transform(array_distinct(split({col}, ' ')),"
            f" t -> md5(concat('{i}:', t))))")


def _minhash_sql(col: str, i: int) -> str:
    return (f"list_min(list_transform(list_distinct(string_split({col}, ' ')),"
            f" t -> md5(concat('{i}:', t))))")


def _bands_expr(mk) -> list[str]:
    bands = []
    for b in range(_N_HASHES // _BAND_SIZE):
        parts = ", ".join(mk("text", i)
                          for i in range(b * _BAND_SIZE, (b + 1) * _BAND_SIZE))
        bands.append(f"md5(concat_ws('|', 'b{b}', {parts}))")
    return bands


_ORACLE_Q47 = f"""
    WITH bands AS (
        SELECT doc_id,
               unnest([{', '.join(_bands_expr(_minhash_sql))}]) AS band
        FROM documents
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
    ),
    toks AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS tl
        FROM documents
    )
    SELECT a_id, b_id,
           ROUND(len(list_intersect(ta.tl, tb.tl)) * 1.0
                 / len(list_distinct(list_concat(ta.tl, tb.tl))), 6) AS jaccard
    FROM cand
    JOIN toks ta ON ta.doc_id = a_id
    JOIN toks tb ON tb.doc_id = b_id
    WHERE len(list_intersect(ta.tl, tb.tl)) * 1.0
          / len(list_distinct(list_concat(ta.tl, tb.tl))) >= 0.9
"""


@query("q47_minhash_lsh", _ORACLE_Q47)
def q47_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bands = d.select(
        "doc_id",
        F.explode(F.expr(f"array({', '.join(_bands_expr(_minhash_spark))})")).alias("band"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    toks = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tl")
    )
    ta = toks.alias("ta")
    tb = toks.alias("tb")
    j = (F.size(F.array_intersect(F.col("ta.tl"), F.col("tb.tl"))) * 1.0
         / F.size(F.array_distinct(F.concat(F.col("ta.tl"), F.col("tb.tl")))))
    return (
        cand.join(ta, F.col("ta.doc_id") == F.col("a_id"))
        .join(tb, F.col("tb.doc_id") == F.col("b_id"))
        .filter(j >= 0.9)
        .select("a_id", "b_id", F.round(j, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# q48 — SimHash bucketing: 16-bit signature from per-token md5 bit votes.
# Tokens explode to (doc_id, token); 16 bit-sums aggregate per doc; docs
# sharing a signature are duplicate candidates (hamming-0 buckets).
# Bit arithmetic is div/mod on hex-digit values — portable to the oracle.
# --------------------------------------------------------------------------
def _digit(engine: str, c: int) -> str:
    # value 0..15 of hex char c (1-based) of md5(t)
    if engine == "spark":
        return f"(locate(substring(md5(t), {c}, 1), '0123456789abcdef') - 1)"
    return f"(strpos('0123456789abcdef', substr(md5(t), {c}, 1)) - 1)"


def _bit_sum_exprs(engine: str) -> list[str]:
    div = "div" if engine == "spark" else "//"
    out = []
    for b in range(16):
        c, k = b // 4 + 1, b % 4
        d = _digit(engine, c)
        if engine == "spark":
            out.append(f"SUM(2 * (({d} div {2 ** k}) % 2) - 1) AS s{b}")
        else:
            out.append(f"SUM(2 * (({d} {div} {2 ** k}) % 2) - 1) AS s{b}")
    return out


_SIMHASH_RECOMBINE = " + ".join(
    f"(CASE WHEN s{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(16)
)

_ORACLE_Q48 = f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents
    ),
    sums AS (
        SELECT doc_id, {', '.join(_bit_sum_exprs('duckdb'))}
        FROM tok GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id, CAST({_SIMHASH_RECOMBINE} AS BIGINT) AS simhash
        FROM sums
    )
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_doc_id
    FROM sig GROUP BY simhash
"""


@query("q48_simhash", _ORACLE_Q48)
def q48_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t")).distinct()
    )
    sums = tok.groupBy("doc_id").agg(
        *[F.expr(e) for e in _bit_sum_exprs("spark")]
    )
    sig = sums.select(
        "doc_id", F.expr(f"CAST({_SIMHASH_RECOMBINE} AS BIGINT)").alias("simhash")
    )
    return sig.groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id")
    )
