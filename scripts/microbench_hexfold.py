"""Microbench: locate(substring)-chain vs conv() for md5-hex -> int.

Two expression strategies produce IDENTICAL values (so oracle parity is
unaffected); the question is pure evaluation cost inside whole-stage
codegen at token scale:

* fold8:  8x locate(substring(h,c,1), '0123456789abcdef') terms summed
  with power-of-16 weights (the original _hex_fold / q153 digit path);
* conv:   CAST(conv(substring(h,1,8),16,10) AS BIGINT) — one parse.

Run AFTER the test suite (quiet box): python scripts/microbench_hexfold.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from spatial_data_engineering_spark.session import build_session  # noqa: E402

P = 2_147_483_647


def fold8(m: str) -> str:
    terms = " + ".join(
        f"CAST((locate(substring({m}, {c}, 1), '0123456789abcdef')) - 1 "
        f"AS BIGINT) * CAST({16 ** (8 - c)} AS BIGINT)"
        for c in range(1, 9))
    return f"(({terms}) % {P})"


def convx(m: str) -> str:
    return f"(CAST(conv(substring({m}, 1, 8), 16, 10) AS BIGINT) % {P})"


def digits16(m: str) -> list[str]:
    return [f"(locate(substring({m}, {c}, 1), '0123456789abcdef') - 1)"
            for c in range(1, 17)]


def main() -> None:
    spark = build_session(app_name="microbench-hexfold")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tok = (spark.read.parquet(f"{sf}/documents.parquet")
           .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
           .select("doc_id", F.md5("t").alias("hh"))
           .localCheckpoint())  # isolate: only the fold expr differs below
    n = tok.count()
    print(f"tokens: {n}", file=sys.stderr)

    def run(label: str, df) -> float:
        best = min(_time(df) for _ in range(3))
        print(f"{label:18s} {best:.3f}s", file=sys.stderr)
        return best

    def _time(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # 1) single 32-bit fold (the q47/_hex_fold shape) + a min-agg consumer
    a = tok.select("doc_id", F.expr(fold8("hh")).alias("h")) \
           .groupBy("doc_id").agg(F.min("h"))
    b = tok.select("doc_id", F.expr(convx("hh")).alias("h")) \
           .groupBy("doc_id").agg(F.min("h"))
    run("fold8+minagg", a)
    run("conv+minagg", b)

    # equality proof
    diff = (tok.select(F.expr(fold8("hh")).alias("a"),
                       F.expr(convx("hh")).alias("b"))
            .filter("a <> b").count())
    print(f"fold-vs-conv mismatches: {diff}", file=sys.stderr)
    assert diff == 0

    # 2) q153 shape: 16 digits -> 64 bit-sums per doc
    dcols = [F.expr(e).alias(f"d{c}") for c, e in
             enumerate(digits16("hh"), start=1)]
    sums_digits = [
        F.expr(f"SUM(2 * ((d{4 * w + k // 4 + 1} div {2 ** (k % 4)}) % 2)"
               f" - 1)").alias(f"s{w}_{k}")
        for w in range(4) for k in range(16)]
    c1 = (tok.select("doc_id", *dcols)
          .groupBy("doc_id").agg(*sums_digits))

    h12 = [F.expr("CAST(conv(substring(hh, 1, 8), 16, 10) AS BIGINT)")
           .alias("h1"),
           F.expr("CAST(conv(substring(hh, 9, 8), 16, 10) AS BIGINT)")
           .alias("h2")]

    def bitsum(w: int, k: int) -> str:
        c = 4 * w + k // 4 + 1
        j = k % 4
        if c <= 8:
            return (f"SUM(2 * CAST((shiftright(h1, {4 * (8 - c) + j}) & 1) "
                    f"AS BIGINT) - 1)")
        return (f"SUM(2 * CAST((shiftright(h2, {4 * (16 - c) + j}) & 1) "
                f"AS BIGINT) - 1)")

    sums_conv = [F.expr(bitsum(w, k)).alias(f"s{w}_{k}")
                 for w in range(4) for k in range(16)]
    c2 = (tok.select("doc_id", *h12).groupBy("doc_id").agg(*sums_conv))
    run("digits16+64sums", c1)
    run("conv2+64bitsums", c2)

    # equality proof on the aggregated signature
    j = c1.alias("x").join(c2.alias("y"), "doc_id")
    bad = j.filter(" OR ".join(
        f"x.s{w}_{k} <> y.s{w}_{k}" for w in range(4)
        for k in range(16))).count()
    print(f"sig mismatches: {bad}", file=sys.stderr)
    assert bad == 0
    spark.stop()


if __name__ == "__main__":
    main()
