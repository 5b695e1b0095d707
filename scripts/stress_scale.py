#!/usr/bin/env python
"""Scale-stress probe: run the custom physical strategies 20-100x beyond
bench scale on synthetic data (generated with Spark `range`, never
collected to the driver) and print one JSON line of timings.

This is the local stand-in for the 1000-executor question: does the grid
spatial join stay an equi-join with bounded candidates, does LSH candidate
generation stay sub-quadratic, at data sizes where an O(n^2) or
driver-side formulation would already be intractable?

Usage: python scripts/stress_scale.py [n_points] [n_docs] [n_rects] [n_pack]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from pyspark.sql import functions as F

    from spatial_data_engineering_spark.operators.dedup import (
        _SHINGLES_SPARK, _band_keys, _hex_fold, _sig_aggs)
    from spatial_data_engineering_spark.operators.spatial_join import (
        grid_spatial_join)
    from spatial_data_engineering_spark.functions.st_funcs import (
        st_makebox, st_point)
    from spatial_data_engineering_spark.session import build_session

    spark = build_session(app_name="stress_scale")
    out: dict = {"n_points": n_points, "n_docs": n_docs}

    # ---- spatial join at n_points x 25 polygons -------------------------
    pts = (spark.range(n_points)
           .select(F.col("id").alias("pt_id"),
                   st_point(((F.col("id") * 37) % 100000) / 1000.0 + 0.0005,
                            ((F.col("id") * 61) % 100000) / 1000.0 + 0.0005)
                   .alias("geom")))
    boxes = (spark.range(25)
             .select(F.col("id").alias("box_id"),
                     st_makebox((F.col("id") % 5) * 20.0,
                                F.floor(F.col("id") / 5) * 20.0,
                                (F.col("id") % 5) * 20.0 + 20.0,
                                F.floor(F.col("id") / 5) * 20.0 + 20.0)
                     .alias("geom")))
    t0 = time.perf_counter()
    joined = grid_spatial_join(pts, boxes, ["pt_id"], ["box_id"],
                               predicate="contains", cell=10.0)
    n_matched = joined.count()
    out["spatial_join_sec"] = round(time.perf_counter() - t0, 2)
    out["spatial_join_matched"] = n_matched

    # ---- MinHash LSH at n_docs ------------------------------------------
    # synthetic corpus: per-GROUP word sequences (5 docs per group share a
    # base sequence + an id suffix -> genuine near-dup groups), different
    # groups get different sequences.  A single shared template would make
    # every band collide globally (~n^2/2 candidates — the exact
    # pathological case the char-shingle design exists to avoid, but no
    # shingle scheme survives a corpus of 50k identical documents).
    words = ("the fast key order sort table scan merge part window small "
             "hash join query row data slow filter customer line batch "
             "value agg group stream column vector").split()
    # word choice must be pseudorandom per (group, position): any linear
    # congruential scheme makes groups phase-shifted rotations of one
    # cyclic sequence, whose char shingles still collide globally
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    terms = ", ".join(
        f"element_at({arr}, pmod(hash(id DIV 5, {i}), {len(words)}) + 1)"
        for i in range(40)
    )
    docs = (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"),
                    F.expr(f"concat(concat_ws(' ', {terms}), ' v', "
                           f"CAST(id AS STRING))").alias("text")))
    docs = docs.persist()
    docs.count()

    t0 = time.perf_counter()
    sh = docs.select("doc_id", F.expr(_SHINGLES_SPARK.format(col="text")).alias("tl"))
    hx = (sh.select("doc_id", F.explode("tl").alias("t"))
          .select("doc_id", F.expr(_hex_fold("spark", "md5(t)")).alias("h")))
    sig = hx.groupBy("doc_id").agg(*[F.expr(e) for e in _sig_aggs("spark")])
    bands = sig.select(
        "doc_id",
        F.explode(F.expr(f"array({', '.join(_band_keys('spark'))})")).alias("band"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("a_id"),
                    F.col("b.doc_id").alias("b_id")).distinct())
    n_cand = cand.count()
    out["lsh_sec"] = round(time.perf_counter() - t0, 2)
    out["lsh_candidates"] = n_cand
    out["lsh_candidate_fraction_of_n2"] = round(
        n_cand / (n_docs * (n_docs - 1) / 2), 8)

    # ---- exact-union dissolve at n_rects --------------------------------
    # overlapping chains with a closed form: group g holds 100 rects
    # [i*6, i*6+10] x [g*20, g*20+5] -> every group dissolves to ONE part
    # of area (99*6 + 10) * 5 = 3020.  Exercises the planar-subdivision
    # union + the mapInPandas combiner on every group (all overlap).
    n_rects = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    n_groups = n_rects // 100
    rects = (spark.range(n_rects)
             .select((F.col("id") % n_groups).alias("grp"),
                     st_makebox(
                         (F.col("id") / n_groups).cast("long") * 6.0,
                         (F.col("id") % n_groups) * 20.0,
                         (F.col("id") / n_groups).cast("long") * 6.0 + 10.0,
                         (F.col("id") % n_groups) * 20.0 + 5.0)
                     .alias("geom")))
    t0 = time.perf_counter()
    from spatial_data_engineering_spark.functions.st_funcs import (
        st_area, st_num_geometries)
    from spatial_data_engineering_spark.operators.spatial_join import union_agg
    dissolved = union_agg(rects, ["grp"], geom_col="geom")
    agg = dissolved.select(
        F.sum(st_area("geom")).alias("total_area"),
        F.sum(st_num_geometries("geom").cast("long")).alias("total_parts"),
        F.count(F.lit(1)).alias("n_groups_out")).collect()[0]
    out["union_sec"] = round(time.perf_counter() - t0, 2)
    out["union_n_rects"] = n_rects
    out["union_area_exact"] = (abs(agg["total_area"] - n_groups * 3020.0)
                               < 1e-6 * n_groups)
    out["union_one_part_per_group"] = (
        agg["total_parts"] == n_groups == agg["n_groups_out"])

    # ---- exact ssjoin (q76 shape) at n_docs -----------------------------
    # same synthetic corpus: candidate generation must stay bounded by the
    # df cap (blocks of <= cap docs), never quadratic
    from spatial_data_engineering_spark.operators.dedup import _SSJ_DF_CAP
    t0 = time.perf_counter()
    tok = sh.select("doc_id", F.explode("tl").alias("t"))
    rare = (tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= _SSJ_DF_CAP).select("t"))
    rt = tok.join(rare, "t")
    ra, rb = rt.alias("a"), rt.alias("b")
    ss_cand = (ra.join(rb, (F.col("a.t") == F.col("b.t"))
                       & (F.col("a.doc_id") < F.col("b.doc_id")))
               .select(F.col("a.doc_id").alias("a_id"),
                       F.col("b.doc_id").alias("b_id")).distinct())
    n_ss = ss_cand.count()
    out["ssjoin_sec"] = round(time.perf_counter() - t0, 2)
    out["ssjoin_candidates"] = n_ss
    out["ssjoin_candidate_fraction_of_n2"] = round(
        n_ss / (n_docs * (n_docs - 1) / 2), 8)

    # ---- union_agg high-cardinality guard at n_rects groups -------------
    # one group per row: phase 1 must pass WKB through (no per-row
    # dissolve); completing in seconds rather than minutes is the signal
    hc = (spark.range(n_rects)
          .select(F.col("id").alias("grp"),
                  st_makebox(F.col("id") * 2.0, F.lit(0.0),
                             F.col("id") * 2.0 + 1.0, F.lit(1.0))
                  .alias("geom")))
    t0 = time.perf_counter()
    hc_out = union_agg(hc, ["grp"], geom_col="geom").count()
    out["union_hc_sec"] = round(time.perf_counter() - t0, 2)
    out["union_hc_groups"] = hc_out

    # ---- sequence packing (q77 shape) at n_pack docs --------------------
    # shards are the parallelism unit; each applyInPandas group walks its
    # rows once — wall-clock should scale with n_pack / n_shards
    from spatial_data_engineering_spark.operators.textops import _PACK_CAP
    n_pack = int(sys.argv[4]) if len(sys.argv) > 4 else 5_000_000
    n_shards = 1024
    pk = (spark.range(n_pack)
          .select(F.col("id").alias("doc_id"),
                  (F.col("id") % n_shards).alias("shard"),
                  ((F.col("id") * 37) % 400 + 20).alias("n_tokens")))
    import pandas as pd

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
        return pdf[["doc_id", "shard", "bin_idx", "n_tokens"]]

    t0 = time.perf_counter()
    packed = pk.groupBy("shard").applyInPandas(
        pack, schema="doc_id bigint, shard bigint, bin_idx bigint, "
                     "n_tokens bigint")
    n_packed = packed.count()
    out["pack_sec"] = round(time.perf_counter() - t0, 2)
    out["pack_docs"] = n_packed

    # ---- two-phase exact top-K (q85 shape): n_topk rows, ONE group ------
    # the regime where a single-window rank would serialize the whole
    # group onto one task; phase-1 hash thinning must cut the window
    # input to ~2K rows while the result stays exactly the K smallest
    # (u, doc_id).  Ground truth via global sort-limit (TakeOrdered — no
    # window, no serialization), valid because there is one group.
    import math

    from spatial_data_engineering_spark.operators.textops import (
        _HASH_DOMAIN, _doc_key, twophase_topk)

    n_topk = int(sys.argv[5]) if len(sys.argv) > 5 else 3_000_000
    k = 40
    tk = (spark.range(n_topk)
          .select(F.col("id").alias("doc_id"), F.lit("xx").alias("lang"),
                  (F.col("id") % 997).alias("n_chars")))
    t0 = time.perf_counter()
    got = twophase_topk(tk, k=k).collect()
    out["topk_sec"] = round(time.perf_counter() - t0, 2)
    out["topk_rows"] = n_topk
    thr = math.ceil(min(1.0, 2.0 * k / n_topk) * _HASH_DOMAIN)
    out["topk_window_rows"] = (
        tk.select(F.expr(_doc_key("spark")).alias("u"))
        .filter(F.col("u") < thr).count())
    truth = (tk.select("doc_id", F.expr(_doc_key("spark")).alias("u"))
             .orderBy("u", "doc_id").limit(k).collect())
    out["topk_exact"] = ({r["doc_id"] for r in got}
                         == {r["doc_id"] for r in truth})
    out["topk_k_returned"] = len(got)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
