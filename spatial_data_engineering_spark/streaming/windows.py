"""Streaming window operators over the events stream.

Batch/stream parity is the design rule: every transformation here is a
function DataFrame -> DataFrame that works identically on a batch frame
and a ``readStream`` frame — the streaming tests assert the memory-sink
results equal the batch results on the same rows.

Watermarks bound state (late data beyond the watermark is dropped); on a
real cluster the event-time shuffle partitions by (window, key), and
``dropDuplicatesWithinWatermark`` keeps the dedup state finite.

Deployment note — ``spark.cleaner.periodicGC.interval=1min``
(session.py): the session factory pins the ContextCleaner's periodic GC
to 1 minute (default 30min) because a long-lived driver otherwise
accumulates dead broadcast/checkpoint blocks between full JVM GCs — the
round-10 sf1 probe measured late-suite queries paying ~4x for it.  For
ALWAYS-ON streaming jobs this setting is the standard long-lived-driver
hygiene, not a test hack: each micro-batch of ``admit_stream`` creates
and drops batch-scoped frames whose JVM handles only unpersist after a
driver GC, so REMOVING the setting on a deployment reintroduces
unbounded executor-storage growth between organic full GCs.  Keep it
(or set it to a few minutes) wherever these streams run unattended; the
1-minute RPC it triggers is driver-side and costs microseconds.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, events_dir: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over normalized events parquet.

    (The raw testdata events.parquet is TIMESTAMP(NANOS); callers
    pre-normalize via catalog.load + write, or point at any parquet dir
    with EVENTS_SCHEMA.)
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window: count + sum per (window, event_type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def sliding_activity(events: DataFrame, window: str = "1 hour",
                     slide: str = "30 minutes",
                     watermark: str = "2 hours") -> DataFrame:
    """Sliding window per user: overlapping windows, activity counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time session windows (gap-based; the streaming analogue of the
    batch lag-cumsum sessionization in relational.q18)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "user_id", "n_events", "sum_value")
    )


def dedup_within_watermark(events: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup by event_id with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_join(clicks: DataFrame, purchases: DataFrame,
                       max_gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Event-time stream-stream inner join: purchases joined to the same
    user's clicks that happened within [ts - max_gap, ts].

    Both sides carry watermarks so the join state is bounded: a buffered
    click can be dropped once the purchase-side watermark passes
    click.ts + max_gap.  Batch/stream parity holds by construction — the
    same predicate works on static frames.
    """
    c = (clicks.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("c_user"),
                 F.col("ts").alias("click_ts"),
                 F.col("event_id").alias("click_id")))
    p = (purchases.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("p_user"),
                 F.col("ts").alias("purchase_ts"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("value").alias("purchase_value")))
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id",
        "purchase_ts", "click_ts", "purchase_value",
    )


def write_stream_idempotent(stream_df: DataFrame, out_dir: str,
                            checkpoint_dir: str) -> None:
    """Exactly-once file sink via foreachBatch.

    Each micro-batch writes to a batch-id-named subdirectory with
    overwrite mode: a replayed batch (after failure/restart) rewrites the
    same directory instead of duplicating rows — idempotence is the
    user-side half of exactly-once; the checkpoint is Spark's half.
    Runs to completion (availableNow).
    """
    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = (stream_df.writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_dedup_against_corpus(stream_df: DataFrame,
                                corpus_keys: DataFrame,
                                key_col: str = "event_id") -> DataFrame:
    """Stream-static LEFT ANTI join: admit only stream rows whose key is
    absent from a standing corpus — the streaming twin of the batch
    incremental-dedup operator (dedup.q82).

    Spark re-plans the static side per micro-batch, so the corpus can be
    a table that a concurrent batch job replaces between batches; at
    scale the static side is a bucketed key table and the anti join is
    broadcast (small hot-key set) or co-located (bucketed).  State-free:
    unlike dropDuplicates, nothing accumulates in the state store —
    dedup against history lives in the corpus table, dedup within the
    stream belongs to dropDuplicatesWithinWatermark.
    """
    return stream_df.join(corpus_keys.select(key_col).distinct(),
                          key_col, "left_anti")


def stream_admit_documents(stream_docs: DataFrame,
                           corpus_docs: DataFrame) -> DataFrame:
    """Two-tier streaming admission against a standing document corpus —
    the streaming twin of the batch incremental dedup (dedup.q82): a
    streamed document is admitted only if neither its exact content hash
    (md5(text)) NOR its token-sort fingerprint already exists in the
    corpus.  Both tiers share ``dedup._fp_spark`` with q46/q54/q82, so
    streaming and batch admission cannot desynchronize key-wise.

    Plan shape mirrors q82 at scale: the corpus reduces to its distinct
    key sets (never its text), each tier is a stream-static LEFT ANTI
    join re-planned per micro-batch (the corpus table may be replaced by
    a concurrent batch job), and nothing enters the state store — dedup
    against history lives in the corpus, dedup within the stream belongs
    to dropDuplicatesWithinWatermark.
    """
    from ..operators.dedup import _fp_spark

    keyed = (stream_docs
             .withColumn("__eh", F.md5("text"))
             .withColumn("__fh", _fp_spark()))
    corpus_eh = corpus_docs.select(F.md5("text").alias("__eh")).distinct()
    corpus_fh = corpus_docs.select(_fp_spark().alias("__fh")).distinct()
    return (keyed
            .join(corpus_eh, "__eh", "left_anti")
            .join(corpus_fh, "__fh", "left_anti")
            .drop("__eh", "__fh"))


def admit_stream(base: DataFrame, stream_docs: DataFrame, out_dir: str,
                 checkpoint_dir: str, bench: DataFrame | None = None,
                 base_signatures: tuple[DataFrame, DataFrame] | None = None,
                 base_exact_hashes: DataFrame | None = None) -> None:
    """Streaming corpus admission with FULL near-dup semantics: every
    micro-batch runs the batch ``admit_delta`` (exact keep-first +
    LSH-banded near-dup verify + optional benchmark decontamination)
    against base ∪ everything previously admitted, then lands in a
    batch-id-named parquet directory.

    Why foreachBatch and not stream-static joins: the near-dup tier
    needs per-doc minhash signatures (explode + groupBy) and a
    candidate verify join — blocking operators that streaming append
    mode cannot host, but that are ordinary batch work inside a
    micro-batch closure.  ``stream_admit_documents`` stays the
    state-free fast path for exact/fingerprint tiers; this is the full
    pipeline-admission twin.

    ``base_signatures`` / ``base_exact_hashes`` accept the stored
    tables (``dedup.persisted_shingle_bands`` /
    ``persisted_exact_hashes``) so a stream over a warehouse corpus
    never rebuilds base-side state; omitted, both are computed once per
    stream from ``base``.

    Semantics are ARRIVAL-ORDER keep-first: a doc near-duplicating one
    admitted in an earlier batch is rejected, exactly like a later
    doc_id within one batch.  Replay-safe: a recomputed batch excludes
    its OWN previous output from the effective base (else every row of
    a replayed batch would self-reject as an exact dup and the rewrite
    would silently empty it) and overwrites its directories — the
    write_stream_idempotent contract.

    Admitted-doc SIGNATURES and EXACT HASHES are persisted per batch
    under ``out_dir/_sigs/`` (underscore-hidden, so the admitted-
    dataset read never sees them) and read back by later batches:
    per-batch signature COMPUTE is bounded by that batch's admissions,
    not by everything admitted so far.  Coverage is checked PER BATCH
    PARTITION, not per table: every ``batch=N`` under ``out_dir`` must
    have a matching partition under all three ``_sigs`` tables, and
    any uncovered batch — a crash landed between its docs write and
    its sig writes, or ``out_dir`` predates the sig persistence — has
    its state RECOMPUTED from its admitted docs (the source of truth)
    instead of failing or, worse, silently shrinking the dedup base;
    a batch's own uncommitted partitions are excluded either way, so
    replay can never self-reject.
    """
    from ..operators.dedup import shingle_bands
    from ..plans.curation import admit_delta

    base_kt = base.select("doc_id", "text")
    # base-side state: the stored tables when given, else built ONCE
    # for the whole stream — the stored-table amortization admit_delta
    # exists for; per micro-batch only the (small, admitted-so-far)
    # prev frames' persisted signatures/hashes are unioned on top
    base_sigs = base_signatures or shingle_bands(base_kt)
    # persist, NOT localCheckpoint: local checkpoints discard lineage, so
    # an executor loss mid-stream would poison every later micro-batch
    # with unrecoverable missing-block errors; persist keeps the lineage
    # and just recomputes lost blocks.
    base_eh = (base_exact_hashes if base_exact_hashes is not None
               else base_kt.select(F.md5("text").alias("eh")).distinct()
               .persist(StorageLevel.MEMORY_AND_DISK))

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        eff_sigs, eff_eh = base_sigs, base_eh
        # Only a genuinely ABSENT out_dir means "first batch".  Probing
        # existence explicitly (instead of catching AnalysisException
        # around the read) keeps every other analysis failure — stray
        # non-parquet files under out_dir, schema-inference conflicts,
        # permission errors — LOUD: silently falling back to the static
        # base would drop previously admitted docs from the dedup base
        # and re-admit their duplicates with no signal.
        jvm = spark._jvm
        jsc = spark._jsc
        conf = jsc.hadoopConfiguration()

        def _exists(p: str) -> bool:
            hp = jvm.org.apache.hadoop.fs.Path(p)
            return hp.getFileSystem(conf).exists(hp)

        def _batches(p: str) -> set[str]:
            """``batch=N`` partition names under ``p`` ({} if absent)."""
            hp = jvm.org.apache.hadoop.fs.Path(p)
            fs = hp.getFileSystem(conf)
            if not fs.exists(hp):
                return set()
            return {st.getPath().getName() for st in fs.listStatus(hp)
                    if st.getPath().getName().startswith("batch=")}

        not_this_batch = F.col("batch") != batch_id
        if _exists(out_dir):
            sig_paths = {t: f"{out_dir}/_sigs/{t}" for t in
                         ("sh", "bands", "eh")}
            doc_batches = _batches(out_dir) - {f"batch={batch_id}"}
            if not doc_batches:
                # out_dir exists but holds no prior admitted partitions.
                # Validate it the same way the pre-sig fallback always
                # did — an out_dir that cannot be read as the admitted
                # dataset (stray files, wrong layout) must fail LOUDLY,
                # never silently fall back to the static base.
                prev = (spark.read.parquet(out_dir)
                        .filter(not_this_batch)
                        .select("doc_id", "text"))
                prev_sh, prev_bands = shingle_bands(prev)
                prev_eh = prev.select(F.md5("text").alias("eh")).distinct()
            else:
                # Sig coverage is PER BATCH, not per table: a crash
                # between the docs write and the sig writes leaves
                # batch=N committed under out_dir with no partitions
                # under _sigs/* — while OTHER batches' sig dirs exist.
                # A per-table existence probe would then take the
                # sigs-read path and silently drop batch N from the
                # effective dedup base (its duplicates re-admit with no
                # signal — e.g. recovery under a fresh checkpoint, where
                # no new batch_id ever equals N).  Compare the batch
                # partition sets instead (cheap FileSystem listings) and
                # rebuild ONLY the uncovered batches from their admitted
                # docs, the source of truth.
                covered = doc_batches
                for p in sig_paths.values():
                    covered = covered & _batches(p)
                missing = sorted(doc_batches - covered)
                prev_sh = prev_bands = prev_eh = None
                if covered:
                    # covered batches' signatures/hashes: parquet scans,
                    # not recompute (each batch wrote its own under
                    # _sigs below).  A batch whose sigs were written but
                    # whose checkpoint did not commit is this batch
                    # itself on replay — excluded from `covered` above.
                    keep = F.col("batch").isin(
                        [int(b.split("=", 1)[1]) for b in covered])
                    prev_sh = (spark.read.parquet(sig_paths["sh"])
                               .filter(keep).drop("batch"))
                    prev_bands = (spark.read.parquet(sig_paths["bands"])
                                  .filter(keep).drop("batch"))
                    prev_eh = (spark.read.parquet(sig_paths["eh"])
                               .filter(keep).drop("batch"))
                if missing:
                    # rebuild bounded by the crashed batches' size,
                    # never a full prev-state recompute
                    gap = (spark.read.parquet(
                        *[f"{out_dir}/{b}" for b in missing])
                        .select("doc_id", "text"))
                    g_sh, g_bands = shingle_bands(gap)
                    g_eh = gap.select(F.md5("text").alias("eh")).distinct()
                    prev_sh = (g_sh if prev_sh is None
                               else prev_sh.unionByName(g_sh))
                    prev_bands = (g_bands if prev_bands is None
                                  else prev_bands.unionByName(g_bands))
                    prev_eh = (g_eh if prev_eh is None
                               else prev_eh.unionByName(g_eh))
            eff_sigs = (base_sigs[0].unionByName(prev_sh),
                        base_sigs[1].unionByName(prev_bands))
            eff_eh = base_eh.unionByName(prev_eh)
        # base_kt is never evaluated here: with signatures and exact
        # hashes supplied, admit_delta's plan contains no base-corpus
        # scan (pinned by test_stored_tables_refresh_never_scans_base_corpus)
        admitted = admit_delta(base_kt, batch_df, bench,
                               base_signatures=eff_sigs,
                               base_exact_hashes=eff_eh)
        admitted.write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}")
        # signatures + exact hashes of THIS batch's admissions, for
        # later batches to scan instead of rebuild — computed off the
        # just-written parquet so the admission DAG is not re-evaluated
        adm = (spark.read.parquet(f"{out_dir}/batch={batch_id}")
               .select("doc_id", "text"))
        a_sh, a_bands = shingle_bands(adm)
        a_sh.write.mode("overwrite").parquet(
            f"{out_dir}/_sigs/sh/batch={batch_id}")
        a_bands.write.mode("overwrite").parquet(
            f"{out_dir}/_sigs/bands/batch={batch_id}")
        (adm.select(F.md5("text").alias("eh")).distinct()
         .write.mode("overwrite").parquet(
             f"{out_dir}/_sigs/eh/batch={batch_id}"))

    q = (stream_docs.writeStream.foreachBatch(admit_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_admit_near_dedup(stream_docs: DataFrame, corpus_docs: DataFrame,
                            out_dir: str, checkpoint_dir: str) -> None:
    """Streaming twin of the MinHash-tier incremental admission
    (dedup.q226_incremental_near_dedup) — the curation tier the
    exact/fingerprint-only ``stream_admit_documents`` lacks.  Each
    micro-batch applies the same three tiers against the STANDING
    corpus:

      1. exact md5(text) + token-sort fingerprint anti joins vs the
         corpus key sets (computed once per stream, never per batch);
      2. LSH-banded near-dup verify vs the corpus signature table PLUS
         every earlier micro-batch's tier-1 survivors;
      3. within-micro-batch keep-first (drop the higher doc_id of a
         verified pair).

    PARITY CONTRACT (pinned in test_streaming): when the q226 batch
    arrives as micro-batches in doc_id order, the admitted union
    equals the batch form exactly — q226 drops a batch doc that
    verifies against ANY lower-id tier-1 survivor (whether or not that
    survivor is itself later dropped), and tier-1 survivors are
    precisely what tiers 2-3 see here: earlier batches via the
    persisted ``_t1sigs`` tables, the current batch via its own band
    self-join.  Dedup state therefore accumulates TIER-1 SURVIVORS,
    not admitted docs.

    foreachBatch, not stream-static joins: the near-dup tier needs
    blocking operators (signature groupBy + candidate verify join) —
    ordinary batch work inside the micro-batch closure, impossible in
    append-mode streaming (the admit_stream rationale).

    Crash consistency mirrors admit_stream: each batch persists its
    tier-1 survivor DOCS under ``out_dir/_t1/batch=N`` (the source of
    truth) and their derived (sh, bands) under ``out_dir/_t1sigs``;
    coverage is checked per batch partition, and an uncovered batch —
    a crash between the docs write and the sigs write — has its
    signatures rebuilt from its ``_t1`` docs instead of silently
    shrinking the dedup base.  A replayed batch excludes its own
    partitions, so replay is idempotent.  Underscore-prefixed dirs are
    invisible to a plain ``spark.read.parquet(out_dir)`` of the
    admitted dataset."""
    from ..operators.dedup import (_fp_spark, _near_dup_admission,
                                   shingle_bands)

    corpus_kt = corpus_docs.select("doc_id", "text")
    c_eh = (corpus_kt.select(F.md5("text").alias("eh")).distinct()
            .persist(StorageLevel.MEMORY_AND_DISK))
    c_fh = (corpus_docs.select(_fp_spark().alias("fh")).distinct()
            .persist(StorageLevel.MEMORY_AND_DISK))
    c_sh, c_bands = shingle_bands(corpus_kt)

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()

        def _batches(p: str) -> set[str]:
            hp = jvm.org.apache.hadoop.fs.Path(p)
            fs = hp.getFileSystem(conf)
            if not fs.exists(hp):
                return set()
            return {st.getPath().getName() for st in fs.listStatus(hp)
                    if st.getPath().getName().startswith("batch=")}

        keyed = (batch_df.withColumn("__eh", F.md5("text"))
                 .withColumn("__fh", _fp_spark()))
        t1 = (keyed.join(c_eh.withColumnRenamed("eh", "__eh"),
                         "__eh", "left_anti")
              .join(c_fh.withColumnRenamed("fh", "__fh"),
                    "__fh", "left_anti")
              .drop("__eh", "__fh"))
        # persist THIS batch's tier-1 survivors first (source of truth
        # for later batches' dedup base), then admit off the written
        # copy so the admission DAG reads truncated lineage
        t1.write.mode("overwrite").parquet(f"{out_dir}/_t1/batch={batch_id}")
        t1 = spark.read.parquet(f"{out_dir}/_t1/batch={batch_id}")
        b_sh, b_bands = shingle_bands(t1.select("doc_id", "text"))

        # earlier batches' tier-1 survivors: sigs where covered, docs
        # rebuilt where a crash left a gap — never silently dropped
        own = {f"batch={batch_id}"}
        doc_batches = _batches(f"{out_dir}/_t1") - own
        eff_sh, eff_bands = c_sh, c_bands
        if doc_batches:
            covered = doc_batches
            for t in ("sh", "bands"):
                covered = covered & _batches(f"{out_dir}/_t1sigs/{t}")
            missing = sorted(doc_batches - covered)
            if covered:
                keep = F.col("batch").isin(
                    [int(b.split("=", 1)[1]) for b in covered])
                eff_sh = eff_sh.unionByName(
                    spark.read.parquet(f"{out_dir}/_t1sigs/sh")
                    .filter(keep).drop("batch"))
                eff_bands = eff_bands.unionByName(
                    spark.read.parquet(f"{out_dir}/_t1sigs/bands")
                    .filter(keep).drop("batch"))
            if missing:
                gap = (spark.read.parquet(
                    *[f"{out_dir}/_t1/{b}" for b in missing])
                    .select("doc_id", "text"))
                g_sh, g_bands = shingle_bands(gap)
                eff_sh = eff_sh.unionByName(g_sh)
                eff_bands = eff_bands.unionByName(g_bands)

        admitted = _near_dup_admission(t1, b_bands, eff_bands, b_sh,
                                       eff_sh)
        admitted.write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}")
        b_sh.write.mode("overwrite").parquet(
            f"{out_dir}/_t1sigs/sh/batch={batch_id}")
        b_bands.write.mode("overwrite").parquet(
            f"{out_dir}/_t1sigs/bands/batch={batch_id}")

    q = (stream_docs.writeStream.foreachBatch(admit_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def run_to_completion(stream_df: DataFrame, query_name: str,
                      output_mode: str = "append") -> DataFrame:
    """Drive a (bounded file-source) streaming frame to completion through
    the memory sink and return the materialized result as a batch frame.

    For windowed aggregations use output_mode="complete": in append mode a
    window only emits once the watermark passes it, and with a bounded
    source the watermark never passes the trailing windows — the classic
    missing-last-window gotcha.
    """
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_cms_sketch(stream_docs: DataFrame) -> DataFrame:
    """Streaming count-min sketch maintenance: the q113 counter table kept
    live over a document stream.  Because a CMS is an additive groupBy —
    counters are (row, pos) -> SUM — the batch build IS the streaming
    build: tokens explode to d (row, pos) cells and a streaming
    aggregation in update/complete mode maintains the 4x1024 table
    incrementally, with per-micro-batch deltas merged by the state store
    exactly as map-side partials merge in batch.

    State is bounded at d*w rows regardless of stream volume — the
    sketch property that makes this the right frequency monitor for an
    unbounded stream (an exact token count's state grows with |vocab|).
    Parity with the batch sketch is pinned in test_streaming.
    """
    from ..operators.dedup import _hex_fold
    from ..operators.sketches import _CMS_D, _pos_exprs

    toks = (stream_docs
            .select(F.explode(F.split("text", " ")).alias("term"))
            .filter(F.col("term") != "")
            .withColumn("h", F.expr(_hex_fold("spark", "md5(term)"))))
    poss = _pos_exprs("spark", "h")
    cells = (toks.select(F.explode(F.array(*[
        F.expr(f"struct({i} AS row_i, {poss[i]} AS pos)")
        for i in range(_CMS_D)])).alias("c"))
        .select("c.row_i", "c.pos"))
    return cells.groupBy("row_i", "pos").agg(
        F.count(F.lit(1)).alias("cnt"))


def stream_type_moments(events: DataFrame) -> DataFrame:
    """Live per-type moments (n, Σv, Σv²) for the q99 anomaly scorer.

    q99 itself is two chained aggregations (stats, then outlier counts) —
    not expressible as one streaming query (multiple stateful aggs).  The
    production decomposition: this streaming aggregation maintains the
    MOMENTS incrementally — they are additive, so micro-batch deltas merge
    in the state store exactly like batch map-side partials, and the
    decimal casts keep the sums order-independent (merge order is
    arbitrary under streaming) — while the scorer joins a periodically
    refreshed broadcast snapshot of ``zscore_finalize`` of this table
    against the live stream.  State is bounded at one row per event type.
    """
    dec = "decimal(30,6)"
    v = F.col("value")
    return (events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(v.cast(dec)).alias("s1"),
                 F.sum((v * v).cast(dec)).alias("s2")))


def zscore_finalize(moments: DataFrame) -> DataFrame:
    """(event_type, mu, sigma) from the moments table — the broadcast
    side of the anomaly scorer.  Pure projection; identical math to
    q99's batch stats (closed-form sample variance over exact sums)."""
    n = F.col("n")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    var = F.greatest(s2 - s1 * s1 / n, F.lit(0)) / (n - 1)
    return moments.select(
        "event_type", (s1 / n).alias("mu"), F.sqrt(var).alias("sigma"))
