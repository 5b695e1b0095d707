"""Deployment PSL loader (VERDICT r11 task 5): prove COVERAGE's claim
that "a deployment swaps in the full published list the same way" —
parse the published .dat grammar, compile to the same CASE/
try_element_at shape as the shipped q214 snapshot constants, stay
expression-only at full-list size.

Three-way independence: every assertion triangulates Spark expression
vs DuckDB expression vs the pure-Python replay (the generated-oracle
discipline — a generator bug cannot agree three ways)."""

from __future__ import annotations

import time

import duckdb
import pyspark.sql.functions as F
import pytest

from spatial_data_engineering_spark.operators import dedup
from spatial_data_engineering_spark.operators.psl import (
    compile_registered_domain, parse_psl, registered_domain_py)

# the shipped q214 snapshot, re-expressed as a .dat-format document
# (comments, sections, whitespace and trailing-token noise included to
# exercise the parser, not just the rules)
FIXTURE_DAT = """
// ===BEGIN ICANN DOMAINS===
// uk : https://example.invalid/registry-docs
uk
co.uk
ac.uk
org.uk
// au
au
com.au
net.au
// others
com
org
net
io
edu
gov
de
fr
jp
co.jp
br
com.br
us
ca
in
// ck : wildcard + exception, the published grammar's hard shapes
*.ck
!www.ck
bd
*.bd

// ===BEGIN PRIVATE DOMAINS===
github.io
web.app
"""


def _fixture_hosts():
    # every shape the compiled expression branches on, plus junk
    return [
        "www.example.co.uk", "example.co.uk", "co.uk", "uk",
        "blog.site7.github.io", "github.io", "a.b.c.example.com",
        "example.com", "com", "www.ck", "zone3.ck", "a.zone3.ck", "ck",
        "x.bd", "a.x.bd", "bd", "site.de", "noanswer.zz", "singlelabel",
        "deep.a.b.c.d.e.example.org",
    ]


def test_parse_psl_shapes():
    rules = parse_psl(FIXTURE_DAT)
    assert rules.plain[1] >= {"com", "uk", "io"}
    assert rules.plain[2] >= {"co.uk", "github.io", "web.app"}
    assert rules.wild[1] == {"ck", "bd"}
    assert rules.exc[2] == {"www.ck"}
    assert rules.n_rules == 28  # 16 one-label + 9 two-label + 2 wild + 1 exc


def test_python_replay_matches_spec_cases():
    rules = parse_psl(FIXTURE_DAT)
    f = lambda h: registered_domain_py(h, rules)  # noqa: E731
    assert f("www.example.co.uk") == "example.co.uk"
    assert f("example.co.uk") == "example.co.uk"
    assert f("co.uk") is None           # host IS a public suffix
    assert f("www.ck") == "www.ck"      # exception rule
    # wildcard: zone3.ck IS the public suffix, so the registrable
    # domain is one label deeper
    assert f("a.zone3.ck") == "a.zone3.ck"
    assert f("zone3.ck") is None
    assert f("noanswer.zz") is None     # no implicit * by default
    star = parse_psl(FIXTURE_DAT, implicit_star=True)
    assert registered_domain_py("noanswer.zz", star) == "noanswer.zz"


def test_loader_reproduces_shipped_q214_expression(spark):
    """The loader compiled from FIXTURE_DAT must agree with the
    hand-written dedup.registered_domain_spark/_sql constants AND the
    Python replay on the actual q214 URL corpus — three engines, two
    expression generators, one truth."""
    from .conftest import SF_ORACLE

    rules = parse_psl(FIXTURE_DAT)
    hosts = (spark.read.parquet(SF_ORACLE + "/documents.parquet")
             .select("doc_id", F.expr(dedup._url_expr()).alias("url"))
             .select(F.regexp_extract(
                 "url", dedup._HOST_RE.strip("'"), 1).alias("host")))
    got = hosts.select(
        "host",
        F.expr(dedup.registered_domain_spark("host")).alias("shipped"),
        F.expr(compile_registered_domain(rules, "host")).alias("loaded"),
    ).collect()
    assert len(got) > 0
    for r in got:
        assert r["shipped"] == r["loaded"], r
        assert r["loaded"] == registered_domain_py(r["host"], rules), r


@pytest.mark.parametrize("dialect", ["spark", "duckdb"])
def test_loader_three_way_on_deep_rules(spark, dialect):
    """Label depths the shipped snapshot never reaches (3- and 4-label
    rules, 3-label exceptions, 2-label wildcard bases — all shapes the
    real list contains)."""
    dat = """
    jp
    kobe.jp
    *.kawasaki.jp
    !city.kawasaki.jp
    s3.dualstack.example-cloud.com
    com
    example-cloud.com
    """
    rules = parse_psl(dat)
    hosts = [
        "a.city.kobe.jp", "city.kobe.jp", "kobe.jp",
        "x.y.kawasaki.jp", "y.kawasaki.jp", "kawasaki.jp",
        "city.kawasaki.jp", "sub.city.kawasaki.jp",
        "bucket.s3.dualstack.example-cloud.com",
        "s3.dualstack.example-cloud.com",
        "app.example-cloud.com", "example-cloud.com",
    ]
    expect = [registered_domain_py(h, rules) for h in hosts]
    expr = compile_registered_domain(rules, "host", dialect)
    if dialect == "spark":
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        got = [r[0] for r in
               df.select(F.expr(expr)).collect()]
    else:
        rows = ", ".join(f"('{h}')" for h in hosts)
        got = [r[0] for r in duckdb.sql(
            f"SELECT {expr} FROM (VALUES {rows}) t(host)").fetchall()]
    assert got == expect
    # spot-pin the spec semantics at depth
    by_host = dict(zip(hosts, expect))
    assert by_host["sub.city.kawasaki.jp"] == "city.kawasaki.jp"  # exc
    # wildcard 2-base: y.kawasaki.jp IS the suffix -> one deeper
    assert by_host["x.y.kawasaki.jp"] == "x.y.kawasaki.jp"
    assert by_host["y.kawasaki.jp"] is None  # host IS a wildcard suffix
    assert by_host["bucket.s3.dualstack.example-cloud.com"] \
        == "bucket.s3.dualstack.example-cloud.com"  # 4-label suffix
    assert by_host["s3.dualstack.example-cloud.com"] is None  # IS suffix
    assert by_host["app.example-cloud.com"] == "app.example-cloud.com"
    # the wildcard rule does NOT match its bare base (no label for *);
    # fallthrough to the shorter `jp` rule must happen (the bug the
    # three-way check caught: an unguarded wildcard branch swallowed it)
    assert by_host["kawasaki.jp"] == "kawasaki.jp"
    assert by_host["kobe.jp"] is None  # plain suffix, no fallthrough


@pytest.mark.parametrize("dialect", ["spark", "duckdb"])
def test_mixed_case_hosts_match_case_insensitively(spark, dialect):
    # PSL matching is case-insensitive per spec; the compiled expression
    # lowercases the host (r12 self-review caught the miss — without
    # lower(), 'Example.COM' silently fell through to NULL while the
    # replay matched it)
    rules = parse_psl(FIXTURE_DAT)
    hosts = ["Example.COM", "EXAMPLE.CO.UK", "WwW.Example.Co.Uk",
             "WWW.CK", "A.Zone1.CK"]
    expect = [registered_domain_py(h, rules) for h in hosts]
    assert expect[0] == "example.com" and expect[3] == "www.ck"
    expr = compile_registered_domain(rules, "host", dialect)
    if dialect == "spark":
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        got = [r[0] for r in df.select(F.expr(expr)).collect()]
    else:
        rows = ", ".join(f"('{h}')" for h in hosts)
        got = [r[0] for r in duckdb.sql(
            f"SELECT {expr} FROM (VALUES {rows}) t(host)").fetchall()]
    assert got == expect


def test_shipped_q214_twins_match_case_insensitively(spark):
    # the hand-written dedup twins must share the loader's lowercasing
    # (r12 review: the fix originally landed only in the loader)
    rules = parse_psl(FIXTURE_DAT)
    hosts = ["Example.COM", "WwW.Example.Co.Uk", "WWW.CK", "A.Zone1.CK"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = df.select(
        F.expr(dedup.registered_domain_spark("host")).alias("s"),
        F.expr(compile_registered_domain(rules, "host")).alias("l"),
    ).collect()
    rows = ", ".join(f"('{h}')" for h in hosts)
    dk = [r[0] for r in duckdb.sql(
        f"SELECT {dedup.registered_domain_sql('host')} "
        f"FROM (VALUES {rows}) t(host)").fetchall()]
    for (r, d, h) in zip(got, dk, hosts):
        py = registered_domain_py(h, rules)
        assert r["s"] == r["l"] == d == py, (h, r["s"], r["l"], d, py)
    assert got[0]["s"] == "example.com"


def test_empty_snapshot_fails_loudly():
    with pytest.raises(ValueError, match="no rules"):
        compile_registered_domain(parse_psl("// only comments\n"), "host")


def _synthetic_full_list(n_rules: int) -> str:
    """A deterministic full-scale snapshot: same size and shape mix as
    the published list (~70% 2-label, ~25% 1-label+3-label, a tail of
    wildcards/exceptions)."""
    lines = ["// synthetic full-size PSL"]
    i = 0
    while len(lines) - 1 < n_rules:
        if i % 20 == 19:
            lines.append(f"*.w{i}x")
            lines.append(f"!keep.w{i}x")
        elif i % 4 == 3:
            lines.append(f"s{i}.t{i % 97}.z{i % 13}")
        elif i % 4 == 0:
            lines.append(f"t{i}")
        else:
            lines.append(f"a{i}.t{i % 97}")
        i += 1
    return "\n".join(lines[:n_rules + 1])


def test_full_size_list_stays_expression_only(spark):
    """The ~9k-rule ceiling claim, measured: parse + compile + run the
    full-size expression in BOTH engines and confirm it stays a pure
    per-row expression (parses, executes, agrees with the replay).
    Spark folds the large IN lists to InSet hash probes (threshold 10),
    so the cost is SQL-text parse time, not 9k comparisons per row —
    the numbers land in SCALE_NOTES."""
    dat = _synthetic_full_list(9000)
    t0 = time.perf_counter()
    rules = parse_psl(dat)
    expr = compile_registered_domain(rules, "host")
    t_compile = time.perf_counter() - t0
    assert rules.n_rules >= 8900
    hosts = ["www.example.t0", "x.a1.t1", "b.s3.t3.z3", "keep.w19x",
             "q.other.w19x", "no.match.zz", "a5.t5"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    t0 = time.perf_counter()
    got = [r[0] for r in df.select(F.expr(expr)).collect()]
    t_run = time.perf_counter() - t0
    assert got == [registered_domain_py(h, rules) for h in hosts]
    # DuckDB twin at full size (oracle-side feasibility)
    dexpr = compile_registered_domain(rules, "host", "duckdb")
    rows = ", ".join(f"('{h}')" for h in hosts)
    dgot = [r[0] for r in duckdb.sql(
        f"SELECT {dexpr} FROM (VALUES {rows}) t(host)").fetchall()]
    assert dgot == got
    # generous ceilings: this is a once-per-plan cost, and the point is
    # to FAIL LOUDLY if expression-size behavior regresses into minutes
    assert len(expr) < 400_000, len(expr)
    assert t_compile < 5, t_compile
    assert t_run < 60, t_run


def test_malformed_rules_fail_loudly():
    # ADVICE r12: rule bodies are spliced into single-quoted SQL
    # literals executed by both engines — a tampered/corrupted .dat
    # line with a quote, backslash, whitespace-in-body, or control
    # char must raise at PARSE time, never reach the expression
    import pytest

    from spatial_data_engineering_spark.operators.psl import (
        PslRules, _sql_in, parse_psl)

    for bad in ["evil'); DROP TABLE docs; --", "a\\'b.com",
                "back\\slash.net", "ctl\x07bell.org", "!quo'te.io",
                "*.wild'card.gr"]:
        with pytest.raises(ValueError):
            PslRules().add(bad)
    # the spec's whitespace rule still holds: text AFTER the first
    # whitespace is a comment, the rule itself stays clean
    r = parse_psl("com  // trailing note\nco.uk\n")
    assert r.plain == {1: {"com"}, 2: {"co.uk"}}
    # unicode IDN rules (raw, as published) remain accepted
    r2 = PslRules()
    r2.add("xn--p1ai")
    r2.add("рф")
    assert r2.n_rules == 2
    # defense in depth: _sql_in refuses unquotable strings even if
    # handed values that bypassed add()
    with pytest.raises(ValueError):
        _sql_in({"fine.com", "bro'ken.com"})
