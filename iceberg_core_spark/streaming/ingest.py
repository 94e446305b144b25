"""Structured Streaming ingest into the IceTable layer — the Spark-first
re-expression of the reference's entire ingest pipeline (SURVEY.md §3.1):

reference component                     → here
FileStreamAdapter (streamAdapter.go)    → spark.readStream file source
BlockManager routing (blockManager.go:  → repartitionByRange inside the
  29-72, partition-key extraction R3)     table write (one shuffle)
MaxSize flush (blockManager.go:65-67)   → maxRecordsPerFile
MaxAge flush + 1s ticker                → trigger(processingTime=...) —
  (blockManager.go:84-114)                ingest-to-queryable latency is
                                          bounded by the trigger interval
commitBlock → Output channel (R8)       → foreachBatch → IceTable.append
                                          (manifest commit per micro-batch)
Stop() drain (blockManager.go:126-141)  → trigger(availableNow) + stop()

Single-writer manifest commits happen on the driver inside foreachBatch,
matching the reference's lone-goroutine commit discipline; data writes
are fully distributed.

Event-time operators (watermarks, tumbling/sliding/session windows,
stateful dedup) are NEW capability — the reference only had wall-clock
flush timing (SURVEY.md §2.B "Streaming" row). Each takes a DataFrame
(batch or streaming — identical API) so the batch twins are
oracle-checkable by the driver; for stream_dedup the batch twin is a
plain exact dedup (dropDuplicatesWithinWatermark is stream-only, and a
bounded batch needs no horizon).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from iceberg_core_spark.table import IceTable, MaintenancePolicy


def _should_tick(batch_id: int, maintenance, every: int | None) -> bool:
    """ONE tick-cadence rule for every periodic job the ingest entry
    points run (table maintenance AND index compaction — r11 review:
    the two previously had opposite zero semantics): never on the
    first batch (nothing to compact), ``None`` disables, then every
    ``max(1, every)`` batches — a zero/negative cadence means 'every
    batch', not a ZeroDivisionError inside foreachBatch."""
    return (maintenance is not None and every is not None
            and batch_id > 0 and batch_id % max(1, every) == 0)


def _latest_per_key(df: DataFrame, key_cols: list[str],
                    seq_col: str) -> DataFrame:
    """Collapse a micro-batch to its per-key LATEST row by ``seq_col``
    — the apply_cdc discipline, shared by the merge path and the
    upsert (op_col=None) CDC path so the two cannot drift."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def _start_foreach_batch(stream: DataFrame, fn, trigger: dict | None,
                         checkpoint_dir: str | None) -> StreamingQuery:
    """The shared writer scaffolding of all four ingest entry points —
    availableNow default, optional checkpoint — in ONE place."""
    writer = stream.writeStream.foreachBatch(fn).outputMode("append")
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_ingest_to_table(
    spark: SparkSession,
    source_dir: str,
    table_root: str,
    schema: StructType,
    partition_col: str | None,
    key_col: str,
    max_rows_per_file: int = 8192,
    trigger: dict | None = None,
    checkpoint_dir: str | None = None,
    source_format: str = "parquet",
    transform=None,
    bucket_by: tuple[str, int] | None = None,
    branch: str | None = None,
    maintenance: "MaintenancePolicy | None" = None,
    maintenance_every: int = 10,
    rollups: list | None = None,
) -> StreamingQuery:
    """File-source stream → partitioned, clustered, manifest-committed
    table. ``trigger`` e.g. {"processingTime": "1 seconds"} (the
    reference's MaxAge analog) or {"availableNow": True} (drain mode).
    ``max_rows_per_file`` is the MaxSize analog (default 8192 — the
    reference's test config, blockManager_test.go:19). ``transform``:
    optional DataFrame→DataFrame applied to the stream before writing
    (projection/normalization — e.g. ns→µs timestamp conversion).
    ``bucket_by=(col, n)``: ingest into a hash-bucket layout instead of
    partition/key clustering — every appended micro-batch keeps the
    bucket spec, so the growing table stays joinable exchange-free via
    ``as_bucketed_table`` (pass ``partition_col=None`` with this).

    ``branch``: STAGED ingest (write-audit-publish) — every micro-batch
    lands on the named audit branch instead of publishing instantly:
    consumers of the main view see nothing until
    ``IceTable.publish_branch(branch)`` flips the audited data visible
    in one metadata-only commit (or ``drop_branch`` discards it). The
    quality gate a 100 TB ingest pipeline runs between landing and
    serving. If the table does not exist yet, an empty create carries
    the schema so even the FIRST batch stages.

    ``maintenance``: a ``MaintenancePolicy`` makes the ingest
    self-maintaining — every ``maintenance_every`` micro-batches the
    driver runs one ``IceTable.maintain()`` tick after the commit
    (compact fragmented partitions, bound snapshot history). This is
    the managed fix for the reference's unmanaged small-block
    proliferation (every MaxSize/MaxAge flush is one file forever,
    blockManager.go:65-67): file counts stay bounded while the stream
    runs, replay protection survives history trimming (expire pins
    each lineage's newest batch stamp), and a staged branch or lost
    commit race skips the tick instead of killing the stream.

    ``rollups``: :class:`~iceberg_core_spark.table.rollup.MaterializedRollup`
    instances refreshed after every micro-batch commit — the
    continuously-maintained aggregate view of a continuously-ingesting
    table. Refresh folds only the batch's changelog delta (and a
    compaction tick's delta is zero rows), so per-batch cost tracks
    batch size, not table size. Crash-safe without coordination: the
    rollup syncs FROM the table (single source of truth) with its own
    watermark, so a driver death between the table commit and the
    rollup write just means the next batch's refresh folds both. With
    ``branch=`` staging, rollups track the PUBLISHED view — staged
    batches fold in when ``publish_branch`` runs."""
    stream = (
        spark.readStream.format(source_format)
        .schema(schema)
        .load(source_dir)
    )
    if transform is not None:
        stream = transform(stream)

    # Replay protection is two-layer, mirroring the reference's
    # idempotent-rewrite semantics (block.go:109-115 — identical content
    # rewrites the same block key, a no-op):
    #   1. batch-id guard within a checkpoint LINEAGE (cheap: skips the
    #      whole write when foreachBatch re-delivers a committed id) —
    #      this is the GUARANTEE layer for at-least-once foreachBatch;
    #   2. content-hash dedupe on append (dedupe_identical_files=True):
    #      a re-ingest under a LOST/fresh checkpoint that re-derives
    #      byte-identical files (same micro-batch composition, same
    #      repartitionByRange split) commits none of them. This layer
    #      is BEST-EFFORT, not a guarantee: a re-ingest under a
    #      different trigger/maxFilesPerTrigger, or after more source
    #      files arrived, composes batches differently, and
    #      differently-split files hash differently — those rows
    #      append again. Checkpoint loss therefore needs an
    #      operational answer (restore the checkpoint, or re-ingest
    #      into a fresh table); the hash layer just makes the common
    #      same-composition replay free.
    # Genuinely new data is never identical at the file level (different
    # key ranges → different bytes) and still appends.
    import uuid as _uuid

    lineage = checkpoint_dir or f"ephemeral-{_uuid.uuid4()}"

    def maybe_maintain(table: IceTable, batch_id: int) -> None:
        if _should_tick(batch_id, maintenance, maintenance_every):
            table.maintain(maintenance)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table = IceTable(spark, table_root)
        if table.manifest.current_snapshot_id() is None:
            if branch:
                # staged ingest must hide even the first batch: an
                # EMPTY create (schema only, no files) publishes the
                # table shell, then the batch appends onto the branch
                IceTable.create(
                    spark, table_root, batch_df.limit(0),
                    partition_col=partition_col, key_col=key_col,
                    max_rows_per_file=max_rows_per_file,
                    bucket_by=bucket_by,
                )
                table.append(batch_df,
                             max_rows_per_file=max_rows_per_file,
                             dedupe_identical_files=True,
                             source_batch_id=batch_id,
                             source_lineage=lineage, branch=branch)
                return
            # single atomic commit carries the batch stamp — no window
            # between table creation and replay-detection metadata
            IceTable.create(
                spark, table_root, batch_df,
                partition_col=partition_col, key_col=key_col,
                max_rows_per_file=max_rows_per_file,
                bucket_by=bucket_by,
                source_batch_id=batch_id, source_lineage=lineage,
            )
            return
        # foreachBatch is at-least-once: a replayed batch (driver died
        # between our commit and the checkpoint write) re-arrives with
        # the same id in the SAME lineage. Scan full snapshot history so
        # maintenance commits in between don't erase the guard.
        last = table.last_committed_batch(lineage)
        if last is not None and batch_id <= last:
            return
        table.append(batch_df, max_rows_per_file=max_rows_per_file,
                     dedupe_identical_files=True,
                     source_batch_id=batch_id, source_lineage=lineage,
                     branch=branch)
        maybe_maintain(table, batch_id)

    def commit_and_refresh(batch_df: DataFrame, batch_id: int) -> None:
        commit_batch(batch_df, batch_id)
        if rollups:
            table = IceTable(spark, table_root)
            if table.manifest.current_snapshot_id() is not None:
                for ru in rollups:
                    ru.refresh(table)

    return _start_foreach_batch(stream, commit_and_refresh, trigger,
                                checkpoint_dir)


def stream_admit_to_table(
    spark: SparkSession,
    source_dir: str,
    table_root: str,
    schema: StructType,
    partition_col: str | None,
    key_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float | None = None,
    admit_verdicts: tuple = ("unique",),
    quarantine_root: str | None = None,
    index_root: str | None = None,
    index_compact_every: int | None = 50,
    max_rows_per_file: int = 8192,
    max_files_per_trigger: int | None = None,
    trigger: dict | None = None,
    checkpoint_dir: str | None = None,
    source_format: str = "parquet",
    method: str = "minhash",
    max_dist: int | None = None,
) -> StreamingQuery:
    """Admission-filtered streaming ingest: every micro-batch is judged
    against the TABLE'S CURRENT CONTENTS with
    :func:`~iceberg_core_spark.functions.dedup_incremental.dedup_batch`
    before it lands — documents whose verdict is not in
    ``admit_verdicts`` (default: only ``unique`` enters; pass
    ``("unique", "near_dup")`` to block exact copies only) are dropped
    from the append and, when ``quarantine_root`` is set, written there
    under ``batch=<id>/`` WITH their verdict/match_id/jacc columns —
    the audit trail a data-quality pipeline reviews.

    This is the continuous-ingest composition of the table layer and
    incremental dedup: admission COMPOUNDS — a document admitted in
    batch N becomes corpus for batch N+1, so re-deliveries of the same
    content through different files are rejected even without replay
    protection (which still applies per the lineage batch-id guard).

    Scale note: without ``index_root`` the corpus side re-derives the
    fingerprint and band indexes from the table's (id, text) scan each
    batch — two columns only (column pruning reaches the scan),
    everything before the candidate join map-side, and the candidate
    join itself is batch x corpus-collisions, but the per-batch cost
    still includes one corpus text pass. Pass ``index_root`` for the
    100 TB path: a persisted
    :class:`~iceberg_core_spark.functions.dedup_incremental.AdmissionIndex`
    is synced from the table before each judgment (idempotent,
    crash-healing — the table is the single source of truth) and the
    corpus pass disappears; every ``index_compact_every`` batches the
    index's per-snapshot sync dirs consolidate into a fresh generation
    (crash-safe atomic flip; 0 disables). The first batch creates the table
    unfiltered (no corpus yet); batch-INTERNAL duplicates are out of
    scope by design (run the corpus-wide pass over a batch for that).
    Because of that first-batch semantics, a COLD START over a backlog
    of delivery files would swallow the whole backlog into the
    unfiltered create — set ``max_files_per_trigger`` (the file
    source's maxFilesPerTrigger, honored by availableNow drains) so
    each delivery is judged as its own micro-batch against the
    admissions before it.

    ``method`` selects the identity notion: ``"minhash"`` (default)
    judges exact fingerprints + MinHash-LSH Jaccard near-duplicates
    (``threshold`` applies); ``"fuzzy"`` judges Levenshtein
    near-identity via
    :func:`~iceberg_core_spark.functions.fuzzy_index.fuzzy_batch`
    (``max_dist`` edits, default
    :data:`~iceberg_core_spark.functions.fuzzy.MAX_DIST`) — the
    typo/variant admission gate for short keys (titles, names), with
    :class:`~iceberg_core_spark.functions.fuzzy_index.FuzzyIndex` as
    its ``index_root`` form. Same sync/judge/compact lifecycle, same
    compounding, same quarantine contract (verdict column values are
    family-specific: exact_dup/near_dup vs fuzzy_dup).
    """
    if method == "minhash":
        from iceberg_core_spark.functions.dedup_incremental import (
            THRESHOLD,
            AdmissionIndex,
            dedup_batch,
        )

        thr = THRESHOLD if threshold is None else threshold
        if max_dist is not None:
            raise ValueError("max_dist applies to method='fuzzy'")

        def make_index():
            return AdmissionIndex(spark, index_root,
                                  text_col=text_col, id_col=id_col)

        def judge_index(idx, batch_df):
            return idx.judge(batch_df, threshold=thr)

        def judge_scan(corpus, batch_df):
            return dedup_batch(corpus, batch_df, text_col=text_col,
                               id_col=id_col, threshold=thr)
    elif method == "fuzzy":
        from iceberg_core_spark.functions.fuzzy import MAX_DIST
        from iceberg_core_spark.functions.fuzzy_index import (
            FuzzyIndex,
            fuzzy_batch,
        )

        if threshold is not None:
            raise ValueError("threshold applies to method='minhash'; "
                             "fuzzy admission takes max_dist")
        dist = MAX_DIST if max_dist is None else max_dist

        def make_index():
            return FuzzyIndex(spark, index_root,
                              text_col=text_col, id_col=id_col,
                              max_dist=dist)

        def judge_index(idx, batch_df):
            return idx.judge(batch_df)

        def judge_scan(corpus, batch_df):
            return fuzzy_batch(corpus, batch_df, id_col=id_col,
                               text_col=text_col, max_dist=dist)
    else:
        raise ValueError(f"unknown admission method {method!r} "
                         "(expected 'minhash' or 'fuzzy')")
    reader = spark.readStream.format(source_format).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               max_files_per_trigger)
    stream = reader.load(source_dir)

    import uuid as _uuid

    lineage = checkpoint_dir or f"ephemeral-{_uuid.uuid4()}"

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table = IceTable(spark, table_root)
        if table.manifest.current_snapshot_id() is None:
            IceTable.create(
                spark, table_root, batch_df,
                partition_col=partition_col, key_col=key_col,
                max_rows_per_file=max_rows_per_file,
                source_batch_id=batch_id, source_lineage=lineage,
            )
            return
        idx = None
        if index_root is not None:
            # sync BEFORE the replay check: a crash between the table
            # commit and the index write heals here even when the
            # batch itself is then skipped as a replay
            idx = make_index()
            idx.sync(table)
            # the per-snapshot sync dirs accumulate one per batch —
            # consolidate on the compaction cadence (crash-safe
            # generation flip, so a mid-compact death costs nothing).
            # Same _should_tick convention as maintenance_every:
            # None disables, <=0 means every batch (r11 review: the
            # two knobs previously had opposite zero semantics)
            if _should_tick(batch_id, idx, index_compact_every):
                idx.compact()
        last = table.last_committed_batch(lineage)
        if last is not None and batch_id <= last:
            return
        if idx is not None:
            verdicts = judge_index(idx, batch_df)
        else:
            corpus = table.scan().select(id_col, text_col)
            verdicts = judge_scan(corpus, batch_df)
        # the judge pipeline (corpus scan or index joins + MinHash
        # verify) is by far the batch's dominant cost — persist the
        # verdicts so the quarantine write, the emptiness check, and
        # the append all reuse ONE judge execution. The batch source
        # persists too (r11 review): the admit semi-join, the
        # quarantine join, its isEmpty, and the append each re-scan
        # the delivery files otherwise — 4-5 source reads per batch
        batch_df = batch_df.persist()
        verdicts = verdicts.persist()
        try:
            admitted = batch_df.join(
                verdicts.filter(F.col("verdict").isin(*admit_verdicts))
                .select(id_col),
                id_col, "left_semi",
            )
            if quarantine_root is not None:
                rejected = batch_df.join(
                    verdicts.filter(
                        ~F.col("verdict").isin(*admit_verdicts)),
                    id_col,
                )
                if not rejected.isEmpty():
                    rejected.write.mode("overwrite").parquet(
                        os.path.join(quarantine_root,
                                     f"batch={batch_id}"))
            # an all-rejected batch still appends the empty frame so
            # the batch id is stamped and a replay of it is skipped
            # (an empty append commits no files)
            table.append(admitted, max_rows_per_file=max_rows_per_file,
                         dedupe_identical_files=True,
                         source_batch_id=batch_id,
                         source_lineage=lineage)
        finally:
            verdicts.unpersist()
            batch_df.unpersist()

    return _start_foreach_batch(stream, commit_batch, trigger,
                                checkpoint_dir)


def stream_cdc_to_table(
    spark: SparkSession,
    source_dir: str,
    table_root: str,
    schema: StructType,
    key_cols: list[str],
    partition_col: str | None = None,
    key_col: str | None = None,
    op_col: str | None = None,
    delete_op: str = "D",
    seq_col: str | None = None,
    mode: str = "cow",
    max_rows_per_file: int = 8192,
    trigger: dict | None = None,
    checkpoint_dir: str | None = None,
    source_format: str = "parquet",
    transform=None,
    maintenance: "MaintenancePolicy | None" = None,
    maintenance_every: int = 10,
) -> StreamingQuery:
    """Streaming MERGE (CDC apply) into an IceTable: each micro-batch
    upserts on ``key_cols``; with ``op_col`` set, rows marked
    ``delete_op`` delete their key instead (full-row images,
    last-writer-wins within a batch via ``seq_col``). The composition
    the reference's append-only ingest (blockManager.go:29-72) cannot
    express — change streams applied with exactly-once effect.

    Replay protection is the batch-id guard alone (same lineage
    contract as stream_ingest_to_table): a replayed micro-batch id is
    skipped whole, so the at-least-once foreachBatch applies each
    change set once. Content-hash dedupe does not apply here — a merge
    REWRITES files, it does not land new ones.

    Scale shape: when ``partition_col`` is one of ``key_cols``, each
    batch rewrites only the partitions it touches (IceTable.upsert's
    scoped merge); cost tracks the touched-partition volume, not table
    size. ``mode="mor"`` (requires ``op_col``) goes further for
    high-frequency change streams: each batch appends its rows plus an
    equality-delete key file — O(batch) per trigger, zero rewrites —
    and a periodic ``compact()`` materializes the deletes. The first
    batch creates the table (schema minus op/seq columns) and applies
    itself as a merge onto the empty shell.

    ``maintenance``/``maintenance_every``: same self-maintenance tick
    as ``stream_ingest_to_table``. It matters most under
    ``mode="mor"``: maintain()'s compact trigger also fires on
    outstanding equality deletes, so the accumulated delete files are
    periodically materialized away and scans return to clean
    file-for-file reads without a manual compact()."""
    stream = (
        spark.readStream.format(source_format)
        .schema(schema)
        .load(source_dir)
    )
    if transform is not None:
        stream = transform(stream)

    import uuid as _uuid

    lineage = checkpoint_dir or f"cdc-ephemeral-{_uuid.uuid4()}"
    strip = ([op_col] if op_col else []) + ([seq_col] if seq_col else [])

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table = IceTable(spark, table_root)
        if table.manifest.current_snapshot_id() is None:
            IceTable.create(
                spark, table_root, batch_df.drop(*strip).limit(0),
                partition_col=partition_col, key_col=key_col,
                max_rows_per_file=max_rows_per_file,
            )
        else:
            last = table.last_committed_batch(lineage)
            if last is not None and batch_id <= last:
                return
        if op_col is None:
            # honor seq_col on the upsert path too (r11 review: it
            # was silently dropped, so a batch with multiple rows per
            # key committed duplicate key rows) — same latest-per-key
            # collapse as apply_cdc, via the shared helper
            b = (_latest_per_key(batch_df, key_cols, seq_col)
                 if seq_col else batch_df)
            table.upsert(b.drop(*strip), key_cols=key_cols,
                         mode=mode, source_batch_id=batch_id,
                         source_lineage=lineage)
        else:
            table.apply_cdc(batch_df, key_cols=key_cols, op_col=op_col,
                            delete_op=delete_op, seq_col=seq_col,
                            mode=mode, source_batch_id=batch_id,
                            source_lineage=lineage)
        if _should_tick(batch_id, maintenance, maintenance_every):
            table.maintain(maintenance)

    return _start_foreach_batch(stream, apply_batch, trigger,
                                checkpoint_dir)


def stream_merge_to_table(
    spark: SparkSession,
    source_dir: str,
    table_root: str,
    schema: StructType,
    key_cols: list[str],
    when_matched: list[dict],
    when_not_matched_insert: bool | str = True,
    partition_col: str | None = None,
    key_col: str | None = None,
    mode: str = "cow",
    source_cols: list[str] | None = None,
    seq_col: str | None = None,
    max_rows_per_file: int = 8192,
    trigger: dict | None = None,
    checkpoint_dir: str | None = None,
    source_format: str = "parquet",
    maintenance: "MaintenancePolicy | None" = None,
    maintenance_every: int = 10,
) -> StreamingQuery:
    """Streaming CONDITIONAL multi-clause MERGE: each micro-batch
    applies :meth:`IceTable.merge`'s ordered ``WHEN MATCHED AND cond
    THEN UPDATE/DELETE`` clauses + conditional NOT-MATCHED insert —
    the general form ``stream_cdc_to_table``'s last-writer-wins
    apply cannot express (e.g. "update only if the incoming change is
    newer, tombstone on flag, insert the rest"). Clause conditions
    see the ``t``/``s`` aliases exactly as in the batch API.

    ``source_cols``: the subset of stream columns that form the table
    schema (defaults to all; list it when the stream carries
    clause-only columns like flags/sequence numbers — they stay
    visible to clause conditions via ``s.`` but are not stored).
    ``seq_col``: merge (like SQL MERGE) refuses a batch with multiple
    rows per key; pass the ordering column and each batch
    pre-collapses to the per-key LATEST row before merging (the
    apply_cdc discipline) so a bursty key cannot kill the stream.

    Exactly-once through the lineage batch-id guard (a replayed
    micro-batch id is skipped whole); the first batch creates the
    empty table and merges onto it, so insert conditions apply from
    batch 0. ``mode="mor"`` keeps each trigger O(batch) — only
    clause-claimed keys land in the equality-delete file — with the
    maintenance tick materializing deletes away. The same
    ``CommitConflictError`` read-modify-write discipline as batch
    merge applies: a lost race FAILS the query without
    half-applying (merge does not auto-rebase); restarting the
    stream replays the batch from the checkpoint, and the lineage
    guard skips any batch that did commit. Single maintainer per
    table is the operating assumption — a conflict means an
    external writer raced this stream."""
    stream = (
        spark.readStream.format(source_format)
        .schema(schema)
        .load(source_dir)
    )

    import uuid as _uuid

    lineage = checkpoint_dir or f"merge-ephemeral-{_uuid.uuid4()}"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if seq_col is not None:
            batch_df = _latest_per_key(batch_df, key_cols, seq_col)
        table = IceTable(spark, table_root)
        tbl_cols = source_cols or batch_df.columns
        if table.manifest.current_snapshot_id() is None:
            IceTable.create(
                spark, table_root,
                batch_df.select(*tbl_cols).limit(0),
                partition_col=partition_col, key_col=key_col,
                max_rows_per_file=max_rows_per_file,
            )
        else:
            last = table.last_committed_batch(lineage)
            if last is not None and batch_id <= last:
                return
        table.merge(
            batch_df, key_cols=key_cols, when_matched=when_matched,
            when_not_matched_insert=when_not_matched_insert,
            mode=mode, source_batch_id=batch_id,
            source_lineage=lineage)
        if _should_tick(batch_id, maintenance, maintenance_every):
            table.maintain(maintenance)

    return _start_foreach_batch(stream, apply_batch, trigger,
                                checkpoint_dir)


# ---------------------------------------------------------------------------
# event-time operators (batch/streaming-agnostic DataFrame → DataFrame)
# ---------------------------------------------------------------------------

def tumbling_counts(df: DataFrame, ts_col: str = "ts",
                    window: str = "1 hour",
                    group_cols: tuple[str, ...] = ("event_type",),
                    watermark: str | None = None,
                    value_col: str = "value") -> DataFrame:
    """Non-overlapping event-time windows. On a stream, pass a watermark
    (e.g. '10 minutes') to bound state and drop late data. ``value_col``
    names the summed measure (r11 review: it was hard-coded while every
    other column was parameterized)."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    w = F.window(F.col(ts_col), window)
    return (
        src.groupBy(w.alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(df: DataFrame, ts_col: str = "ts",
                   window: str = "1 hour", slide: str = "30 minutes",
                   watermark: str | None = None) -> DataFrame:
    """Overlapping windows: each event lands in window/slide windows."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    w = F.window(F.col(ts_col), window, slide)
    return (
        src.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
        )
    )


def session_agg(df: DataFrame, ts_col: str = "ts",
                gap: str = "5 minutes",
                group_cols: tuple[str, ...] = ("user_id",),
                watermark: str | None = None) -> DataFrame:
    """Session windows: a session extends while events arrive within
    ``gap``; closes after a gap of silence. State size is bounded by the
    watermark on a stream."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    w = F.session_window(F.col(ts_col), gap)
    return (
        src.groupBy(w.alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            *group_cols,
            "n_events",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_lag: str = "30 minutes",
    watermark: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream inner join with an event-time band: right events
    within [left_ts - max_lag, left_ts]. Watermarks on BOTH sides bound
    the join state (without them, Spark must buffer each stream forever).
    Works identically on batch DataFrames (watermarks are no-ops there),
    so the batch twin is the correctness oracle.

    State size ≈ input rate × (watermark + max_lag) per key — the knob a
    100 TB/day pipeline tunes. The time-band predicate is what lets
    Spark expire state; an unbounded-time stream-stream join is
    rejected by the analyzer.
    """
    prefixed = {f"{right_prefix}{c}" for c in right.columns if c != on} | {
        f"{right_prefix}{on}"
    }
    collisions = prefixed & set(left.columns)
    if collisions:
        raise ValueError(
            f"prefixed right columns collide with left columns: "
            f"{sorted(collisions)} — pick a different right_prefix"
        )
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    r = r.select(
        F.col(on).alias(f"{right_prefix}{on}"),
        F.col(right_ts).alias(f"{right_prefix}{right_ts}"),
        *[F.col(c).alias(f"{right_prefix}{c}")
          for c in right.columns if c not in (on, right_ts)],
    )
    rts = F.col(f"{right_prefix}{right_ts}")
    # the time band must be part of the JOIN condition — that is what
    # lets the streaming engine expire state (a post-join filter would
    # be rejected/unbounded)
    cond = (
        (F.col(on) == F.col(f"{right_prefix}{on}"))
        & (rts >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag}"))
        & (rts <= F.col(left_ts))
    )
    return l.join(r, cond, "inner").drop(f"{right_prefix}{on}")


def stream_dedup(df: DataFrame, keys: list[str], ts_col: str = "ts",
                 watermark: str = "10 minutes") -> DataFrame:
    """Stateful exact dedup on a stream within the watermark horizon —
    state is garbage-collected past the watermark, so memory is bounded
    regardless of stream length (dropDuplicatesWithinWatermark). On a
    batch DataFrame the operator falls back to a plain exact dedup:
    dropDuplicatesWithinWatermark is stream-only (raises
    AnalysisException on batch frames), and a bounded batch needs no
    horizon — global dedup IS the batch semantic, which keeps the
    module's batch-twin-as-oracle contract true for this operator."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
