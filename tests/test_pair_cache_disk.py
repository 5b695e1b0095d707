"""Cross-session persistence of the shared near-dup pair table.

Round-5 verdict task 5: q199's cold path (>12 s at sf0.1) was the shared
LSH upstream materializing from scratch in every NEW session.  The 100 TB
pattern documented in SCALE_NOTES — write the pair table once, read it
back — is now implemented locally: ``near_dup_pairs`` persists its output
to parquet keyed by a fingerprint of the source ``documents.parquet``
(path + size + mtime), and any later session reads the KB-sized parquet
instead of re-running shingle -> minhash -> band join -> verify.
"""

from __future__ import annotations

import os
import shutil

import pytest

from spatial_data_engineering_spark.operators import dedup

from .conftest import SF_ORACLE  # single dataset knob: SPARK_GRAFT_TEST_SF


@pytest.fixture()
def cache_root(tmp_path, monkeypatch):
    root = tmp_path / "pair_cache"
    monkeypatch.setenv(dedup._PAIR_CACHE_ROOT_ENV, str(root))
    yield str(root)


def _rows(df):
    return sorted((r.a_id, r.b_id) for r in df.collect())


def test_second_session_reads_parquet_not_lsh(spark, cache_root):
    """Simulate two sessions: pop the in-memory handle (what a process
    restart does) and prove the second build is a disk read-back with
    identical content and zero LSH recompute."""
    key = (spark.sparkContext.applicationId, SF_ORACLE)

    dedup._PAIR_CACHE.pop(key, None)
    c0, d0 = dedup._PAIR_CACHE_COMPUTES, dedup._PAIR_CACHE_DISK_HITS
    first = dedup.near_dup_pairs(spark, SF_ORACLE)
    assert dedup._PAIR_CACHE_COMPUTES == c0 + 1  # cold: LSH ran once
    disk = dedup._pair_cache_path(SF_ORACLE)
    assert disk is not None and os.path.isdir(disk), "pair table not persisted"

    # "new session": in-memory handle gone, parquet survives
    dedup._PAIR_CACHE.pop(key, None)
    second = dedup.near_dup_pairs(spark, SF_ORACLE)
    assert dedup._PAIR_CACHE_COMPUTES == c0 + 1  # NO second LSH run
    assert dedup._PAIR_CACHE_DISK_HITS == d0 + 1
    assert _rows(second) == _rows(first)  # parity unchanged


def test_fingerprint_invalidates_on_source_change(tmp_path, monkeypatch):
    """A regenerated documents.parquet (new mtime/size) must map to a NEW
    cache path, so a stale pair set can never be served."""
    monkeypatch.setenv(dedup._PAIR_CACHE_ROOT_ENV, str(tmp_path / "pc"))
    sf = tmp_path / "sf"
    sf.mkdir()
    src = os.path.join(SF_ORACLE, "documents.parquet")
    dst = sf / "documents.parquet"
    shutil.copyfile(src, dst)
    p1 = dedup._pair_cache_path(str(sf))
    os.utime(dst, ns=(1, 1))  # simulate regeneration
    p2 = dedup._pair_cache_path(str(sf))
    assert p1 != p2

    # non-local / missing source: no disk path, in-session cache only
    assert dedup._pair_cache_path(str(tmp_path / "nope")) is None


def test_cache_write_is_atomic_no_tmp_left(spark, cache_root):
    key = (spark.sparkContext.applicationId, SF_ORACLE)
    dedup._PAIR_CACHE.pop(key, None)
    dedup.near_dup_pairs(spark, SF_ORACLE)
    leftovers = [p for p in os.listdir(cache_root) if ".tmp-" in p]
    assert leftovers == []


# --------------------------------------------------------------------------
# Persisted base-signature table (round-8 verdict task 3): admit_delta's
# base (sh, bands) pair follows the same write-once / read-back pattern
# as the pair table, keyed by the same corpus + LSH-parameter
# fingerprint so both invalidate together.
# --------------------------------------------------------------------------

_DOCS = os.path.join(SF_ORACLE, "documents.parquet")


def _sig_key(spark):
    return (spark.sparkContext.applicationId, os.path.abspath(_DOCS))


def test_sig_second_session_reads_parquet_not_rebuild(spark, cache_root):
    """Two sessions: the second persisted_shingle_bands call must be a
    disk read-back (zero signature recompute) with identical bands."""
    dedup._SIG_CACHE.pop(_sig_key(spark), None)
    c0, d0 = dedup._SIG_CACHE_COMPUTES, dedup._SIG_CACHE_DISK_HITS
    sh1, b1 = dedup.persisted_shingle_bands(spark, _DOCS)
    assert dedup._SIG_CACHE_COMPUTES == c0 + 1  # cold: built once
    disk = dedup._sig_cache_path(_DOCS)
    assert disk is not None and os.path.isdir(disk), "signatures not persisted"

    bands1 = sorted((r.doc_id, r.band) for r in b1.collect())
    n_sh1 = sh1.count()

    dedup._SIG_CACHE.pop(_sig_key(spark), None)  # "new session"
    sh2, b2 = dedup.persisted_shingle_bands(spark, _DOCS)
    assert dedup._SIG_CACHE_COMPUTES == c0 + 1  # NO rebuild
    assert dedup._SIG_CACHE_DISK_HITS == d0 + 1
    assert sorted((r.doc_id, r.band) for r in b2.collect()) == bands1
    assert sh2.count() == n_sh1
    # lineage is truncated at the parquet files: the read-back plan must
    # be a scan, not the shingle->minhash->band DAG
    plan = b2._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan


def test_sig_cache_feeds_admit_delta_identically(spark, cache_root):
    """admit_delta with disk-backed signatures admits exactly the same
    delta docs as with freshly built ones."""
    from spatial_data_engineering_spark.plans.curation import admit_delta

    base = spark.read.parquet(_DOCS).select("doc_id", "text")
    # delta: one exact dup of a base doc (must reject), one fresh doc
    sample = base.orderBy("doc_id").limit(1).collect()[0]
    delta = spark.createDataFrame(
        [(9_000_001, sample.text),
         (9_000_002, "a genuinely fresh delta document " * 6)],
        "doc_id bigint, text string")

    fresh = admit_delta(base, delta,
                        base_signatures=dedup.shingle_bands(base))
    dedup._SIG_CACHE.pop(_sig_key(spark), None)
    dedup.persisted_shingle_bands(spark, _DOCS)        # write
    dedup._SIG_CACHE.pop(_sig_key(spark), None)
    cached = admit_delta(base, delta,
                         base_signatures=dedup.persisted_shingle_bands(
                             spark, _DOCS))            # read-back
    ids_fresh = sorted(r.doc_id for r in fresh.collect())
    ids_cached = sorted(r.doc_id for r in cached.collect())
    assert ids_cached == ids_fresh
    assert 9_000_001 not in ids_cached  # the exact dup was rejected
    assert 9_000_002 in ids_cached


def test_sig_fingerprint_shared_with_pair_table(tmp_path, monkeypatch):
    """Same invalidation law as the pair cache: source mtime change or
    LSH-parameter change must move BOTH cache paths."""
    monkeypatch.setenv(dedup._PAIR_CACHE_ROOT_ENV, str(tmp_path / "pc"))
    sf = tmp_path / "sf"
    sf.mkdir()
    dst = sf / "documents.parquet"
    shutil.copyfile(_DOCS, dst)
    s1, p1 = dedup._sig_cache_path(str(dst)), dedup._pair_cache_path(str(sf))
    os.utime(dst, ns=(1, 1))
    s2, p2 = dedup._sig_cache_path(str(dst)), dedup._pair_cache_path(str(sf))
    assert s1 != s2 and p1 != p2
    monkeypatch.setattr(dedup, "_Q47_THETA", 0.123456)
    s3 = dedup._sig_cache_path(str(dst))
    assert s3 not in (s1, s2)  # algo change invalidates too
    # non-local / missing source: no disk path, in-session only
    assert dedup._sig_cache_path(str(tmp_path / "nope")) is None


def test_sig_cache_write_is_atomic_no_tmp_left(spark, cache_root):
    dedup._SIG_CACHE.pop(_sig_key(spark), None)
    dedup.persisted_shingle_bands(spark, _DOCS)
    leftovers = [p for p in os.listdir(cache_root) if ".tmp-" in p]
    assert leftovers == []


def test_exact_hash_cache_and_probe_equivalence(spark, cache_root):
    """The third stored table (base exact hashes): read-back serves the
    same admissions as computing hashes from the base corpus, and the
    broadcast collision probe is semantically the plain anti-join."""
    from spatial_data_engineering_spark.plans.curation import admit_delta

    base = spark.read.parquet(_DOCS).select("doc_id", "text")
    sample = base.orderBy("doc_id").limit(1).collect()[0]
    delta = spark.createDataFrame(
        [(9_100_001, sample.text),                     # exact dup: reject
         (9_100_002, "another wholly fresh doc " * 7),
         (9_100_003, "another wholly fresh doc " * 7)],  # in-delta dup of 2
        "doc_id bigint, text string")
    sigs = dedup.shingle_bands(base)

    plain = sorted(r.doc_id for r in
                   admit_delta(base, delta, base_signatures=sigs).collect())

    key = (spark.sparkContext.applicationId,
           "eh:" + os.path.abspath(_DOCS))
    dedup._SIG_CACHE.pop(key, None)
    c0, d0 = dedup._SIG_CACHE_COMPUTES, dedup._SIG_CACHE_DISK_HITS
    dedup.persisted_exact_hashes(spark, _DOCS)         # build + write
    assert dedup._SIG_CACHE_COMPUTES == c0 + 1
    dedup._SIG_CACHE.pop(key, None)                    # "new session"
    eh = dedup.persisted_exact_hashes(spark, _DOCS)    # read-back
    assert dedup._SIG_CACHE_COMPUTES == c0 + 1
    assert dedup._SIG_CACHE_DISK_HITS == d0 + 1

    stored = sorted(r.doc_id for r in
                    admit_delta(base, delta, base_signatures=sigs,
                                base_exact_hashes=eh).collect())
    assert stored == plain
    assert 9_100_001 not in stored        # exact dup vs base rejected
    assert 9_100_002 in stored            # fresh admitted
    assert 9_100_003 not in stored        # within-delta keep-first
    # same invalidation law as the other two caches
    assert dedup._cache_path(_DOCS, "ehash") is not None


def test_stored_tables_refresh_never_scans_base_corpus(spark, cache_root):
    """The zero-corpus-read property: with all base-side tables stored
    (signatures + exact hashes), admit_delta's physical plan contains
    NO scan of the base documents parquet — the refresh touches only
    the stored hash-sized tables plus the delta."""
    from spatial_data_engineering_spark.plans.curation import admit_delta

    base = spark.read.parquet(_DOCS).select("doc_id", "text")
    delta = spark.createDataFrame(
        [(9_200_001, "completely novel refresh document " * 6)],
        "doc_id bigint, text string")
    dedup._SIG_CACHE.pop(_sig_key(spark), None)
    dedup._SIG_CACHE.pop(
        (spark.sparkContext.applicationId, "eh:" + os.path.abspath(_DOCS)),
        None)
    dedup.persisted_shingle_bands(spark, _DOCS)
    dedup.persisted_exact_hashes(spark, _DOCS)
    dedup._SIG_CACHE.pop(_sig_key(spark), None)  # fresh session: read-back
    dedup._SIG_CACHE.pop(
        (spark.sparkContext.applicationId, "eh:" + os.path.abspath(_DOCS)),
        None)
    admitted = admit_delta(
        base, delta,
        base_signatures=dedup.persisted_shingle_bands(spark, _DOCS),
        base_exact_hashes=dedup.persisted_exact_hashes(spark, _DOCS))
    plan = admitted._jdf.queryExecution().executedPlan().toString()
    assert os.path.basename(_DOCS) not in plan, (
        "refresh plan still scans the base corpus parquet")
    assert [r.doc_id for r in admitted.collect()] == [9_200_001]


# --------------------------------------------------------------------------
# Persisted span table (round-16; r15 verdict task 4): q224/q225's
# substring-dup span table follows the same write-once / read-back
# pattern, so a new session never re-runs the corpus-chars-sized gram
# relation.
# --------------------------------------------------------------------------


def _span_rows(df):
    return sorted((r.doc_id, r.n_chars, r.s, r.e) for r in df.collect())


def test_span_table_second_session_reads_parquet(spark, cache_root):
    """Two sessions: pop the frame memo (what a restart does) and prove
    the second build is a parquet read-back — zero gram-relation
    recompute, bit-identical spans, lineage truncated at the files."""
    from spatial_data_engineering_spark.operators.dedup import (
        _SPAN_L, _cache_path, substring_dup_spans_cached)

    dedup._DOC_FRAME_CACHE.clear()
    c0, d0 = dedup._SPAN_CACHE_COMPUTES, dedup._SPAN_CACHE_DISK_HITS
    first = substring_dup_spans_cached(spark, SF_ORACLE)
    rows1 = _span_rows(first)
    assert dedup._SPAN_CACHE_COMPUTES == c0 + 1  # cold: gram walk ran
    disk = _cache_path(os.path.join(SF_ORACLE, "documents.parquet"),
                       f"spans-L{_SPAN_L}")
    assert disk is not None and os.path.isdir(disk), "spans not persisted"

    dedup._DOC_FRAME_CACHE.clear()  # "new session"
    second = substring_dup_spans_cached(spark, SF_ORACLE)
    assert dedup._SPAN_CACHE_COMPUTES == c0 + 1  # NO second gram walk
    assert dedup._SPAN_CACHE_DISK_HITS == d0 + 1
    assert _span_rows(second) == rows1  # values bit-identical
    plan = second._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan  # not the posexplode/md5 gram DAG
    leftovers = [p for p in os.listdir(cache_root) if ".tmp-" in p]
    assert leftovers == []
    dedup._DOC_FRAME_CACHE.clear()


def test_span_cache_key_folds_anchor_length(cache_root):
    """Changing _SPAN_L must map to a different cache path — a span
    table anchored at one L can never serve another."""
    from spatial_data_engineering_spark.operators.dedup import _cache_path

    src = os.path.join(SF_ORACLE, "documents.parquet")
    p50 = _cache_path(src, "spans-L50")
    p64 = _cache_path(src, "spans-L64")
    assert p50 != p64


def test_q224_q225_read_the_persisted_spans(spark, cache_root):
    """End-to-end: with the span parquet on disk and the memo cleared,
    both consumers still produce their exact pre-persistence rows."""
    from spatial_data_engineering_spark.operators.dedup import QUERIES

    dedup._DOC_FRAME_CACHE.clear()
    a1 = sorted(map(tuple, QUERIES["q224_exact_substring_dedup"](
        spark, SF_ORACLE).collect()))
    b1 = sorted(map(tuple, QUERIES["q225_substring_dedup_materialize"](
        spark, SF_ORACLE).collect()))
    dedup._DOC_FRAME_CACHE.clear()  # "new session": disk tier serves
    d0 = dedup._SPAN_CACHE_DISK_HITS
    a2 = sorted(map(tuple, QUERIES["q224_exact_substring_dedup"](
        spark, SF_ORACLE).collect()))
    b2 = sorted(map(tuple, QUERIES["q225_substring_dedup_materialize"](
        spark, SF_ORACLE).collect()))
    assert dedup._SPAN_CACHE_DISK_HITS == d0 + 1
    assert a1 == a2 and b1 == b2
    dedup._DOC_FRAME_CACHE.clear()
