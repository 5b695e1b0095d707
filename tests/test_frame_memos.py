"""Round-15 session-frame memos (VERDICT r14 task 3): the shared
signature/stage frames build ONCE per (session, corpus) and their
consumers produce bit-identical values through the memo.

Value identity is the load-bearing assertion: each memoized query is
compared row-for-row against a cold rebuild in the same session (cache
cleared), so the memo provably removes recompute without moving a
value.  Compute-count hooks pin the sharing itself.
"""

from __future__ import annotations

import pytest

from .conftest import SF_ORACLE


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def clear_memos():
    from spatial_data_engineering_spark.operators import dedup

    dedup._DOC_FRAME_CACHE.clear()
    yield
    dedup._DOC_FRAME_CACHE.clear()


def test_minhash_frames_build_once_for_q47_and_q156(spark, clear_memos):
    from spatial_data_engineering_spark.operators import dedup

    n0 = dedup._DOC_FRAME_COMPUTES
    a1 = _rows(dedup.QUERIES["q47_minhash_lsh"](spark, SF_ORACLE))
    b1 = _rows(dedup.QUERIES["q156_minhash_estimate_audit"](spark,
                                                            SF_ORACLE))
    built_once = dedup._DOC_FRAME_COMPUTES - n0
    assert built_once == 1, "q47+q156 must share ONE minhash-frame build"

    # cold rebuild in the same session: values must be identical
    dedup._DOC_FRAME_CACHE.clear()
    a2 = _rows(dedup.QUERIES["q47_minhash_lsh"](spark, SF_ORACLE))
    b2 = _rows(dedup.QUERIES["q156_minhash_estimate_audit"](spark,
                                                            SF_ORACLE))
    assert a1 == a2 and b1 == b2


def test_simhash_sig_builds_once_for_q48_q167(spark, clear_memos):
    from spatial_data_engineering_spark.operators import dedup

    n0 = dedup._DOC_FRAME_COMPUTES
    a1 = _rows(dedup.QUERIES["q48_simhash"](spark, SF_ORACLE))
    b1 = _rows(dedup.QUERIES["q167_dedup_strategy_venn"](spark,
                                                         SF_ORACLE))
    assert dedup._DOC_FRAME_COMPUTES - n0 == 1, \
        "q48+q167 must share ONE 16-bit SimHash signature build"

    dedup._DOC_FRAME_CACHE.clear()
    a2 = _rows(dedup.QUERIES["q48_simhash"](spark, SF_ORACLE))
    b2 = _rows(dedup.QUERIES["q167_dedup_strategy_venn"](spark,
                                                         SF_ORACLE))
    assert a1 == a2 and b1 == b2


def test_q153_sig_memo_value_identity(spark, clear_memos):
    from spatial_data_engineering_spark.operators import dedup

    a1 = _rows(dedup.QUERIES["q153_simhash_hamming_join"](spark,
                                                          SF_ORACLE))
    a1b = _rows(dedup.QUERIES["q153_simhash_hamming_join"](spark,
                                                           SF_ORACLE))
    dedup._DOC_FRAME_CACHE.clear()
    a2 = _rows(dedup.QUERIES["q153_simhash_hamming_join"](spark,
                                                          SF_ORACLE))
    assert a1 == a1b == a2


def test_curation_stages_build_once_for_q212_q213(spark, clear_memos):
    from spatial_data_engineering_spark.operators import dedup
    from spatial_data_engineering_spark.plans import curation

    n0 = dedup._DOC_FRAME_COMPUTES
    f1 = _rows(curation.QUERIES["q213_curation_funnel"](spark, SF_ORACLE))
    s1 = _rows(curation.QUERIES["q212_curation_shards"](spark, SF_ORACLE))
    n_stage_builds = sum(
        1 for k in dedup._DOC_FRAME_CACHE if k[1] == "curation_stages")
    assert n_stage_builds == 1, \
        "q212+q213 must share ONE curation-stage pipeline build"
    assert dedup._DOC_FRAME_COMPUTES > n0

    dedup._DOC_FRAME_CACHE.clear()
    f2 = _rows(curation.QUERIES["q213_curation_funnel"](spark, SF_ORACLE))
    s2 = _rows(curation.QUERIES["q212_curation_shards"](spark, SF_ORACLE))
    assert f1 == f2 and s1 == s2


def test_semdedup_assign_builds_once_for_q148_q201(spark, clear_memos):
    from spatial_data_engineering_spark.operators import dedup, similarity

    a1 = _rows(similarity.QUERIES["q148_semdedup"](spark, SF_ORACLE))
    b1 = _rows(similarity.QUERIES["q201_cluster_label_purity"](spark,
                                                               SF_ORACLE))
    n_assign_builds = sum(
        1 for k in dedup._DOC_FRAME_CACHE if k[1] == "semdedup_assign")
    assert n_assign_builds == 1, \
        "q148+q201 must share ONE SemDeDup assignment build"

    dedup._DOC_FRAME_CACHE.clear()
    a2 = _rows(similarity.QUERIES["q148_semdedup"](spark, SF_ORACLE))
    b2 = _rows(similarity.QUERIES["q201_cluster_label_purity"](spark,
                                                               SF_ORACLE))
    assert a1 == a2 and b1 == b2


def test_memo_falls_back_uncached_for_virtual_sources(spark):
    """A non-fingerprintable sf_dir (no documents.parquet on disk) must
    build fresh — never a stale hit, never a crash."""
    from spatial_data_engineering_spark.operators import dedup

    calls = []
    out = dedup._doc_frame_memo(spark, "/nonexistent/sfdir", "t",
                                lambda: calls.append(1) or "frame")
    out2 = dedup._doc_frame_memo(spark, "/nonexistent/sfdir", "t",
                                 lambda: calls.append(1) or "frame")
    assert out == out2 == "frame" and len(calls) == 2


def test_concurrent_cold_callers_build_exactly_once(spark):
    """r15 advice: two concurrent cold callers of the SAME memo key
    must produce exactly ONE build.  Before the per-key build lock,
    both executed build() and the loser's eagerly-checkpointed frames
    leaked executor storage until ContextCleaner GC; now the second
    caller blocks on the key's lock and reads the winner's entry."""
    import threading
    import time

    from spatial_data_engineering_spark.operators import dedup

    dedup._DOC_FRAME_CACHE.clear()
    dedup._DOC_FRAME_BUILD_LOCKS.clear()
    n0 = dedup._DOC_FRAME_COMPUTES
    builds, results, errs = [], [], []
    gate = threading.Barrier(2)

    def build():
        builds.append(threading.get_ident())
        time.sleep(0.3)  # widen the race window: a loser WOULD overlap
        return "frame"

    def call():
        try:
            gate.wait()
            results.append(dedup._doc_frame_memo(
                spark, SF_ORACLE, "race_tag", build))
        except Exception as exc:  # pragma: no cover - diagnostic
            errs.append(exc)

    ts = [threading.Thread(target=call) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert not errs, errs
    assert results == ["frame", "frame"]
    assert len(builds) == 1, "exactly one cold build may run per key"
    assert dedup._DOC_FRAME_COMPUTES - n0 == 1
    dedup._DOC_FRAME_CACHE.clear()
    dedup._DOC_FRAME_BUILD_LOCKS.clear()


def test_memo_reentrant_for_dependent_tags(spark):
    """A build() that re-enters the memo for ANOTHER tag (the
    curation_stages -> minhash_frames shape) must not deadlock on the
    per-key locks — the tag dependency DAG orders the acquisitions."""
    from spatial_data_engineering_spark.operators import dedup

    dedup._DOC_FRAME_CACHE.clear()
    dedup._DOC_FRAME_BUILD_LOCKS.clear()

    def inner_build():
        return "inner"

    def outer_build():
        return dedup._doc_frame_memo(spark, SF_ORACLE, "dag_inner",
                                     inner_build) + "+outer"

    out = dedup._doc_frame_memo(spark, SF_ORACLE, "dag_outer",
                                outer_build)
    assert out == "inner+outer"
    dedup._DOC_FRAME_CACHE.clear()
    dedup._DOC_FRAME_BUILD_LOCKS.clear()


def test_memo_key_folds_every_named_table(spark, tmp_path):
    """r15 advice (curation contract): with table=(a, b), changing
    EITHER source invalidates the key."""
    import shutil
    import time as _time

    from spatial_data_engineering_spark.operators import dedup

    sfd = tmp_path / "sf"
    sfd.mkdir()
    for t in ("documents", "embeddings"):
        shutil.copy(f"{SF_ORACLE}/{t}.parquet", sfd / f"{t}.parquet")
    calls = []
    args = (spark, str(sfd), "two_tab")

    dedup._doc_frame_memo(*args, lambda: calls.append(1) or "v1",
                          table=("documents", "embeddings"))
    dedup._doc_frame_memo(*args, lambda: calls.append(1) or "v2",
                          table=("documents", "embeddings"))
    assert len(calls) == 1  # hit on unchanged fingerprints

    # touch the SECOND table only; the key must change
    _time.sleep(0.01)
    (sfd / "embeddings.parquet").touch()
    out = dedup._doc_frame_memo(*args, lambda: calls.append(1) or "v3",
                                table=("documents", "embeddings"))
    assert out == "v3" and len(calls) == 2
    dedup._DOC_FRAME_CACHE.clear()
    dedup._DOC_FRAME_BUILD_LOCKS.clear()


def test_cov_moments_build_once_for_q93_and_q191(spark, clear_memos):
    """r17 opt: q93 (covariance) and q191 (redundancy audit over the
    SAME covariance) must share ONE BLAS corpus pass per session, and a
    cold rebuild must produce bit-identical values."""
    from spatial_data_engineering_spark.operators import dedup, similarity

    n0 = dedup._DOC_FRAME_COMPUTES
    a1 = _rows(similarity.QUERIES["q93_embedding_covariance"](spark,
                                                              SF_ORACLE))
    b1 = _rows(similarity.QUERIES["q191_dim_redundancy"](spark, SF_ORACLE))
    assert dedup._DOC_FRAME_COMPUTES - n0 == 1, \
        "q93+q191 must share ONE covariance-moment build"

    dedup._DOC_FRAME_CACHE.clear()
    a2 = _rows(similarity.QUERIES["q93_embedding_covariance"](spark,
                                                              SF_ORACLE))
    b2 = _rows(similarity.QUERIES["q191_dim_redundancy"](spark, SF_ORACLE))
    assert a1 == a2 and b1 == b2
