"""Multimodal column plumbing (north star: image/audio/video as opaque
binary columns with typed metadata).

The container has no image/audio codecs, so the decode kernel is STUBBED
(BASELINE.json instruction): ``decode_image_batch(real=True)`` raises
NotImplementedError; the default deterministic fake derives metadata
arithmetically from the payload bytes.  Everything around the stub is the
real engine surface: a BinaryType payload column, an Arrow-batched
``mapInPandas`` decode operator with a typed output schema, and partition
sizing that keeps whole batches in executor memory.

At 100 TB: payloads live in parquet binary columns (or object-store URIs
resolved inside mapInPandas); the decode stage is embarrassingly parallel,
no shuffle until the metadata aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .common import sql_davg

QUERIES: dict = {}
ORACLES: dict = {}

DECODE_SCHEMA = ("doc_id bigint, source string, n_bytes bigint, "
                 "width int, height int, n_frames int")


def decode_image_batch(pdf: pd.DataFrame, real: bool = False) -> pd.DataFrame:
    """Decode a batch of binary payloads to image metadata.

    real=True is the integration point for an actual codec (PIL/ffmpeg);
    not available in this environment.
    """
    if real:
        raise NotImplementedError(
            "real image decode requires PIL/ffmpeg; not present in this "
            "container — deterministic fake used instead"
        )
    n = pdf["payload"].map(len).astype("int64")
    return pd.DataFrame({
        "doc_id": pdf["doc_id"].astype("int64"),
        "source": pdf["source"],
        "n_bytes": n,
        "width": (n % 640 + 16).astype("int32"),
        "height": ((n * 7) % 480 + 16).astype("int32"),
        "n_frames": (n % 30 + 1).astype("int32"),
    })


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode operator: (doc_id, source, payload binary) ->
    typed metadata rows.  One output row per input row; batches stream
    through Arrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf)

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# --------------------------------------------------------------------------
# q70 — multimodal metadata pipeline: binary payload column -> mapInPandas
# decode -> per-source aggregate.  The fake decode is arithmetic in the
# payload length, so the oracle verifies the whole pipeline (binary
# plumbing, UDF batch shape, aggregation) in plain SQL.
# --------------------------------------------------------------------------
@query(
    "q70_multimodal_meta",
    f"""
    WITH meta AS (
        SELECT doc_id, source,
               length(text) AS n_bytes,
               length(text) % 640 + 16 AS width,
               (length(text) * 7) % 480 + 16 AS height,
               length(text) % 30 + 1 AS n_frames
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           {sql_davg('width * 1.0', 'avg_width')},
           {sql_davg('height * 1.0', 'avg_height')},
           CAST(MAX(n_frames) AS INTEGER) AS max_frames
    FROM meta GROUP BY source
    """,
)
def q70_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # documents.text is ASCII -> utf-8 byte length == char length; the
    # payload stands in for image bytes
    payloads = d.select(
        "doc_id", "source", F.encode("text", "utf-8").alias("payload")
    )
    meta = decode_images(payloads)
    from .common import davg

    return meta.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        davg(F.col("width").cast("double"), "avg_width"),
        davg(F.col("height").cast("double"), "avg_height"),
        F.max("n_frames").cast("int").alias("max_frames"),
    )
