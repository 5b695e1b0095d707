"""Deployment public-suffix-list loader (VERDICT r11 task 5).

q214's registered-domain dedup ships a mini PSL snapshot as compile-time
constants (``dedup._PSL_*``) covering all four published rule shapes.
COVERAGE claims "a deployment swaps in the full published list the same
way" — this module proves it: it parses a snapshot in the EXACT format
publicsuffix.org publishes (``public_suffix_list.dat``: ``//`` comments,
blank lines, plain / ``*.`` wildcard / ``!`` exception rules) and
compiles it into the same pure CASE/try_element_at expression shape as
``dedup.registered_domain_spark`` — generalized to arbitrary label
depth — so the full ~9k-rule list stays a codegen-only, shuffle-free,
embarrassingly parallel per-row expression at any corpus size.

Matching semantics (publicsuffix.org/list/ algorithm):
- exception rules prevail over everything; the exception label string
  itself IS the registrable domain;
- otherwise the prevailing rule is the LONGEST match (label count);
  a ``*.base`` wildcard has ``len(base)+1`` labels and matches any
  single label in the ``*`` position;
- registrable domain = prevailing public suffix plus one more label;
  a host that IS a public suffix (or matches nothing) yields NULL.
The published list implies a default ``*`` rule (unknown TLDs are
suffixes); q214's contract instead maps no-match to NULL ('(none)'
bucket), so the default is OFF here and opt-in via ``implicit_star``.

Scale note: Spark turns any IN list past
``spark.sql.optimizer.inSetConversionThreshold`` (default 10) into an
``InSet`` hash-set probe, so a 9k-literal membership test is one O(1)
lookup per row, NOT 9k comparisons, and the CASE itself has only
~2 x max_label_depth branches.  The measured ceiling is parse time of
the generated SQL text, not codegen — see tests/test_psl_loader.py and
SCALE_NOTES.

Reference behavior cross-checked against the publicsuffix.org
algorithm description only (public document); no code consulted.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Conservative rule-body allowlist (ADVICE r12): lowercase ASCII
# alphanumerics, dot, hyphen, underscore, plus any non-ASCII codepoint
# (the published list carries raw-unicode IDN rules alongside their
# punycode xn-- twins).  The point is what it EXCLUDES: quotes,
# backslashes, whitespace, and control characters — the rule bodies are
# spliced into single-quoted SQL literals executed by both engines, so a
# tampered or corrupted .dat line must fail the parse loudly, never
# reach the generated expression.
_RULE_BODY_RE = re.compile(r"^(?:[a-z0-9._\-]|[^\x00-\x7f])+$")


@dataclass
class PslRules:
    """Parsed snapshot: label-count-keyed rule sets.

    ``plain[k]``: set of k-label suffixes; ``wild[k]``: set of k-label
    wildcard BASES (the rule ``*.base`` — total length k+1);
    ``exc[k]``: set of k-label exception strings (leading ``!``
    stripped).
    """

    plain: dict[int, set[str]] = field(default_factory=dict)
    wild: dict[int, set[str]] = field(default_factory=dict)
    exc: dict[int, set[str]] = field(default_factory=dict)

    def add(self, rule: str) -> None:
        rule = rule.lower()
        if rule.startswith("!"):
            tgt, body = self.exc, rule[1:]
        elif rule.startswith("*."):
            tgt, body = self.wild, rule[2:]
        elif rule == "*":
            # the implicit default written explicitly: a 0-label
            # wildcard base — every last label is a suffix
            tgt, body = self.wild, ""
        else:
            tgt, body = self.plain, rule
        # Fail LOUDLY on any body outside the conservative charset —
        # rules are spliced into SQL string literals downstream, so a
        # malformed/tampered list line (quotes, backslash, whitespace,
        # control chars) must never reach _sql_in (ADVICE r12).
        if body and not _RULE_BODY_RE.match(body):
            raise ValueError(
                f"PSL rule {rule!r} contains characters outside the "
                f"allowed label charset — refusing to compile it into "
                f"a SQL expression")
        k = len(body.split(".")) if body else 0
        tgt.setdefault(k, set()).add(body)

    @property
    def n_rules(self) -> int:
        return sum(len(s) for d in (self.plain, self.wild, self.exc)
                   for s in d.values())

    def max_labels(self) -> int:
        """Deepest label index the expression needs: the longest
        registrable domain is longest-suffix + 1 (wildcards add one for
        the ``*`` slot)."""
        cands = [0]
        cands += [k + 1 for k in self.plain]
        cands += [k + 2 for k in self.wild]
        cands += [k for k in self.exc]
        return max(cands)


def parse_psl(text: str, implicit_star: bool = False) -> PslRules:
    """Parse a ``public_suffix_list.dat``-format snapshot.

    Keeps both ICANN and PRIVATE sections (they share one grammar);
    callers who want ICANN-only can slice the text at the
    ``===BEGIN PRIVATE DOMAINS===`` marker first.
    """
    rules = PslRules()
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        # spec: the rule is everything up to the first whitespace
        rules.add(line.split()[0])
    if implicit_star:
        rules.add("*")
    return rules


def _sql_in(vals) -> str:
    # defense in depth behind PslRules.add's charset gate: never emit a
    # literal that could terminate/escape the quoted string
    bad = [v for v in vals if "'" in v or "\\" in v]
    if bad:
        raise ValueError(f"unquotable PSL rule bodies: {bad[:3]!r}")
    return "(" + ", ".join(f"'{v}'" for v in sorted(vals)) + ")"


def _levels(host: str, n: int, dialect: str) -> tuple[list[str], list[str]]:
    """(labels l[1..n], suffix-strings last[1..n+?]) — l[i] is the i-th
    label from the right, last[k] the last-k-labels string; both NULL
    when the host is too short (concat/|| are null-intolerant).

    The host is LOWERCASED first: PSL matching is case-insensitive per
    spec, rules are stored lowercase, and the pure-Python replay lowers
    too — without this, any mixed-case host silently falls through to
    NULL (caught by the round-12 self-review, pinned in
    test_psl_loader.py).
    """
    host = f"lower({host})"
    if dialect == "spark":
        arr = f"split({host}, '\\\\.')"
        lab = [None] + [f"try_element_at({arr}, -{i})"
                        for i in range(1, n + 1)]
        last = [None, lab[1]]
        for k in range(2, n + 1):
            last.append(f"concat({lab[k]}, '.', {last[k - 1]})")
    else:
        arr = f"string_split({host}, '.')"
        lab = [None] + [f"{arr}[-{i}]" for i in range(1, n + 1)]
        last = [None, lab[1]]
        for k in range(2, n + 1):
            last.append(f"({lab[k]} || '.' || {last[k - 1]})")
    return lab, last


def compile_registered_domain(rules: PslRules, host: str,
                              dialect: str = "spark") -> str:
    """The registered-domain CASE expression for ``host`` under
    ``rules`` — same shape as ``dedup.registered_domain_spark`` (which
    remains the hand-written instance for the q214 snapshot), any label
    depth, Spark or DuckDB dialect.

    Branch order encodes the spec's precedence: all exception rules
    first (any length), then suffix rules longest-first; within one
    suffix length, plain and wildcard branches cannot disagree (a
    host matching both yields the same registrable domain).

    Raises ValueError on an empty rule set — a comment-only or
    wrongly-sliced snapshot should fail loudly, not emit a CASE that
    maps every host to NULL (or crash in _levels).
    """
    if rules.n_rules == 0:
        raise ValueError("PSL snapshot contains no rules — check the "
                         ".dat slicing (comment-only input?)")
    n = rules.max_labels()
    lab, last = _levels(host, n, dialect)
    branches: list[str] = []
    for k in sorted(rules.exc, reverse=True):
        branches.append(f"WHEN {last[k]} IN {_sql_in(rules.exc[k])} "
                        f"THEN {last[k]}")
    # suffix length s of the prevailing match, longest first; a plain
    # rule of k labels matches suffixes of length s=k, a wildcard base
    # of k labels matches s=k+1
    max_s = max([k for k in rules.plain] +
                [k + 1 for k in rules.wild] + [0])
    for s in range(max_s, 0, -1):
        if s in rules.plain:
            branches.append(
                f"WHEN {last[s]} IN {_sql_in(rules.plain[s])} "
                f"THEN {last[s + 1]}")
        if s - 1 in rules.wild:
            bases = rules.wild[s - 1]
            if s - 1 == 0:
                # the explicit default rule: any last label is a suffix
                branches.append(f"WHEN {lab[1]} IS NOT NULL "
                                f"THEN {last[s + 1]}")
            else:
                # the * slot must be FILLED for a wildcard rule to match
                # (spec: host needs at least as many labels as the
                # rule); without the guard, a host that IS the wildcard
                # base would stop the CASE here and block fallthrough
                # to a shorter rule (e.g. `kawasaki.jp` under
                # {jp, *.kawasaki.jp} must resolve via `jp`)
                branches.append(
                    f"WHEN {last[s - 1]} IN {_sql_in(bases)} "
                    f"AND {lab[s]} IS NOT NULL THEN {last[s + 1]}")
    return "CASE " + " ".join(branches) + " ELSE NULL END"


def registered_domain_py(host: str, rules: PslRules) -> str | None:
    """Pure-Python third-way replay of the same algorithm (the oracle
    independence device — tests compare all three)."""
    labels = host.lower().split(".")

    def last(k):
        return ".".join(labels[-k:]) if 0 < k <= len(labels) else None

    for k in sorted(rules.exc, reverse=True):
        if last(k) in rules.exc[k]:
            return last(k)
    max_s = max([k for k in rules.plain] +
                [k + 1 for k in rules.wild] + [0])
    for s in range(max_s, 0, -1):
        plain_hit = last(s) in rules.plain.get(s, ())
        if s - 1 == 0:
            wild_hit = 0 in rules.wild and len(labels) >= 1
        else:
            wild_hit = (last(s - 1) in rules.wild.get(s - 1, ())
                        and len(labels) >= s)
        if plain_hit or wild_hit:
            return last(s + 1)
    return None
