"""Incrementally-maintained materialized aggregate over an IceTable —
classic incremental view maintenance (IVM) restricted to the
self-maintainable aggregates (COUNT, SUM), driven by the table's net
changelog (:meth:`IceTable.scan_changes`).

Why this exists at 100 TB: a per-group rollup a dashboard or a mixture
planner reads every few minutes cannot be recomputed from a 100 TB
fact table per refresh. COUNT/SUM fold under insertion AND retraction
(delta = +row for inserts, -row for deletes), so the rollup refreshes
at the cost of the CHANGED rows — an upsert that touched two
partitions folds in seconds regardless of table size, and a pure
compaction folds a zero-row delta (the changelog is rewrite-invariant).
MIN/MAX (and the OHLC endpoints built on arg-min/arg-max) fold under
INSERTS only — a retracted extremum forces a group rescan — so those
rollups rebuild from the pinned snapshot when a delta deletes, and
fold incrementally otherwise (the append-mostly ingest case).

Exactness contract: sums are maintained as DECIMAL(28,6) — exact,
associative, engine-portable — so an incrementally-folded rollup is
BYTE-IDENTICAL to a from-scratch recompute (double sums would drift by
fold order; the registry query's DuckDB oracle is exactly that
from-scratch recompute). Same crash discipline as
:class:`~iceberg_core_spark.functions.dedup_incremental.AdmissionIndex`:
each refresh writes a full rollup version under ``v=<snapshot>`` and
only then advances the watermark meta — a crash between the two heals
on the next refresh (the re-run overwrites the same version dir), and
``read()`` always serves the last fully-committed version.

The reference has no aggregation surface at all (SURVEY.md §2.C); this
is north-star scope — the "query it continuously" half of a streaming
ingest store.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SUM_T = "decimal(28,6)"
# OHLC sums: SUM over the house decimal(18,2) inputs widens to (28,2)
_OHLC_SUM_T = "decimal(28,2)"


class _RollupStore:
    """Shared storage + watermark discipline for changelog-folded
    rollups (the AdmissionIndex pattern): each refresh writes a full
    state version under ``v=<snapshot>`` and only then advances the
    watermark meta, so a crash between the two heals on the next
    refresh (the re-run overwrites the same version dir) and
    ``_read_stored`` always serves the last fully-committed version.

    Subclasses implement the state algebra only:

    - ``_full_state(rows)`` — the state computed from a full scan
    - ``_delta_state(changes)`` — the state folded from a changelog
      delta, or ``None`` when this delta cannot fold (schema too old,
      a retraction the algebra can't absorb, …) and the refresh must
      rebuild from the pinned snapshot instead. Call
      ``self._persist(changes)`` if the delta is consumed twice.
    """

    spark: SparkSession
    root: str
    #: superseded v=<snapshot> dirs younger than this are kept for
    #: in-flight LAZY readers (read() resolves the ref immediately,
    #: parquet opens at action time); the newest superseded version
    #: is always kept for the crash-heal re-fold. One hour bounds
    #: storage at refreshes/hour whole-state copies.
    version_retention_ms = 3600 * 1000

    def _meta_path(self) -> str:
        return os.path.join(self.root, "_meta.json")

    def synced_snapshot(self) -> int | None:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)["synced_snapshot_id"]
        except FileNotFoundError:
            return None

    def _advance(self, snapshot_id: int) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"synced_snapshot_id": snapshot_id,
                       "ref": f"v={snapshot_id}"}, f)
        os.replace(tmp, self._meta_path())

    def _read_stored(self) -> DataFrame:
        """The stored frame WITH any internal bookkeeping columns
        (what a fold consumes)."""
        with open(self._meta_path()) as f:
            ref = json.load(f)["ref"]
        return self.spark.read.parquet(os.path.join(self.root, ref))

    def _persist(self, changes: DataFrame) -> DataFrame:
        self._persisted = changes.persist()
        return self._persisted

    @staticmethod
    def _has_delete(changes: DataFrame) -> bool:
        return not changes.filter(
            F.col("_change_type") == "delete").isEmpty()

    def refresh(self, table) -> bool:
        """Fold the table's changes since the last refresh; returns
        whether anything advanced. Idempotent and crash-healing: the
        version dir is derived from the target snapshot, written
        before the watermark moves."""
        cur = table.manifest.load(load_files=False).snapshot_id
        last = self.synced_snapshot()
        if last == cur:
            return False
        self._persisted: DataFrame | None = None
        # every rebuild/fold is pinned to snapshot `cur` — a commit
        # landing between the watermark read and the scan would
        # otherwise store newer-snapshot data under v=cur, and the
        # next refresh would fold that commit's delta AGAIN
        if last is None:
            state = self._full_state(table.scan(snapshot_id=cur))
        else:
            try:
                changes = table.scan_changes(last, cur)
            except FileNotFoundError:
                # the synced snapshot was expired (expire_snapshots
                # dropped its metadata) — the delta is unrecoverable,
                # so rebuild from the target snapshot's contents; a
                # rollup refreshed at least once per retention window
                # never hits this
                state = self._full_state(table.scan(snapshot_id=cur))
            else:
                state = self._delta_state(changes)
                if state is None:
                    state = self._full_state(
                        table.scan(snapshot_id=cur))
        state.write.mode("overwrite").parquet(
            os.path.join(self.root, f"v={cur}"))
        if self._persisted is not None:
            self._persisted.unpersist()
            self._persisted = None
        self._advance(cur)
        # prune superseded version dirs: every refresh writes a FULL
        # state copy, so a per-micro-batch rollup would otherwise
        # accumulate one whole-rollup copy per refresh forever (r12
        # review). Retained: the newest superseded version (the
        # crash-healing path re-folds from it after a watermark
        # rollback) and any version younger than
        # ``version_retention_ms`` — a LAZY reader frame resolves its
        # v= dir at read() but opens the parquet at action time, and
        # under per-micro-batch refreshes a keep-only-two rule would
        # delete it within seconds (r12 review #2). Same mtime
        # discipline as remove_orphans: collect within the retention
        # window or re-read().
        import shutil
        import time

        cutoff = time.time() - self.version_retention_ms / 1000.0
        stale = sorted(
            (d for d in os.listdir(self.root)
             if d.startswith("v=") and d != f"v={cur}"),
            key=lambda d: int(d[2:]))[:-1]
        for d in stale:
            p = os.path.join(self.root, d)
            try:
                if os.path.getmtime(p) > cutoff:
                    continue
            except FileNotFoundError:
                continue
            shutil.rmtree(p, ignore_errors=True)
        return True


class MaterializedRollup(_RollupStore):
    """Per-``group_cols`` COUNT(*) + exact SUMs of ``sum_cols`` (and
    optionally MIN/MAX of ``min_cols``/``max_cols``), folded forward
    from the table's changelog.

    ``refresh(table)`` catches up to the table's current snapshot:
    the first refresh aggregates the full scan (one pass — the only
    full pass the rollup ever takes); every later refresh folds
    ``scan_changes(last, current)`` signed deltas into the stored
    rollup and drops groups whose live row count reaches zero.

    Each sum column carries a ``nn_<col>`` companion — its non-null
    contribution count — so retracting the LAST non-NULL value of a
    group that keeps NULL-valued rows takes the sum back to NULL
    (what a from-scratch recompute yields), never a spurious 0.

    MIN/MAX are self-maintainable only under INSERTS (new candidates
    fold as min(old, delta)); a retraction can take the extremum away,
    which only a group rescan can answer. So a delta containing any
    delete triggers a full recompute when min/max are tracked — the
    right tool for append-mostly tables (ingest watermarks like
    max(event_ts) per source), while pure COUNT/SUM rollups keep
    incremental folds under every operation.
    """

    def __init__(self, spark: SparkSession, root: str,
                 group_cols: list[str], sum_cols: list[str],
                 min_cols: list[str] | None = None,
                 max_cols: list[str] | None = None):
        self.spark = spark
        self.root = root
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.min_cols = list(min_cols or [])
        self.max_cols = list(max_cols or [])

    def _sum_alias(self, c: str) -> str:
        return f"sum_{c}"

    def _minmax_aliases(self) -> list[str]:
        return ([f"min_{c}" for c in self.min_cols]
                + [f"max_{c}" for c in self.max_cols])

    def _nn_alias(self, c: str) -> str:
        return f"nn_{c}"

    def _normalize(self, df: DataFrame) -> DataFrame:
        """Pin storage types so repeated folds can't widen them
        (min/max keep their source column types — min/max of any
        orderable type is exact by nature). Sums are nulled out when
        their non-null contribution count is zero: SUM over an
        all-NULL group is NULL in SQL, and a fold that retracted every
        non-NULL value would otherwise leave a spurious exact 0 —
        breaking byte-identity with a from-scratch recompute."""
        return df.select(
            *self.group_cols,
            F.col("row_count").cast("long").alias("row_count"),
            *[F.when(F.col(self._nn_alias(c)) > 0,
                     F.col(self._sum_alias(c)).cast(_SUM_T))
              .alias(self._sum_alias(c)) for c in self.sum_cols],
            *[F.col(self._nn_alias(c)).cast("long")
              .alias(self._nn_alias(c)) for c in self.sum_cols],
            *[F.col(a) for a in self._minmax_aliases()],
        )

    def _stored_foldable(self) -> DataFrame | None:
        """The stored frame if a fold can consume it, else ``None``.
        A rollup persisted before the nn_ bookkeeping existed lacks
        the per-sum non-null counts a fold needs; selecting them would
        raise AnalysisException instead of healing — so the caller
        falls back to a full rebuild from the target snapshot (same
        recovery as the expired-watermark path)."""
        stored = self._read_stored()
        need = {self._nn_alias(c) for c in self.sum_cols}
        return stored if need <= set(stored.columns) else None

    def read(self) -> DataFrame:
        """The last fully-committed rollup version — group cols,
        row_count, sums, min/max. The per-sum non-null counts are
        internal fold state and not part of the public rollup."""
        return self._read_stored().select(
            *self.group_cols, "row_count",
            *[self._sum_alias(c) for c in self.sum_cols],
            *self._minmax_aliases(),
        )

    # -- maintenance --------------------------------------------------
    def _full(self, rows: DataFrame) -> DataFrame:
        return self._normalize(
            rows.groupBy(*self.group_cols).agg(
                F.count(F.lit(1)).alias("row_count"),
                *[F.sum(F.col(c).cast("decimal(18,6)"))
                  .alias(self._sum_alias(c)) for c in self.sum_cols],
                *[F.count(F.col(c)).alias(self._nn_alias(c))
                  for c in self.sum_cols],
                *[F.min(c).alias(f"min_{c}") for c in self.min_cols],
                *[F.max(c).alias(f"max_{c}") for c in self.max_cols],
            )
        )

    def _fold(self, old: DataFrame, changes: DataFrame) -> DataFrame:
        sign = F.when(F.col("_change_type") == "insert",
                      F.lit(1)).otherwise(F.lit(-1))
        delta = changes.groupBy(*self.group_cols).agg(
            F.sum(sign).alias("row_count"),
            *[F.sum(F.col(c).cast("decimal(18,6)") * sign)
              .alias(self._sum_alias(c)) for c in self.sum_cols],
            # signed non-null contribution count: retracting the last
            # non-NULL value must take the sum back to NULL, not 0
            *[F.sum(F.when(F.col(c).isNotNull(), sign)
                    .otherwise(F.lit(0))).alias(self._nn_alias(c))
              for c in self.sum_cols],
            *[F.min(c).alias(f"min_{c}") for c in self.min_cols],
            *[F.max(c).alias(f"max_{c}") for c in self.max_cols],
        )
        merged = (
            self._raw(delta).unionByName(self._raw(old))
            .groupBy(*self.group_cols)
            .agg(F.sum("row_count").alias("row_count"),
                 *[F.sum(self._sum_alias(c)).alias(self._sum_alias(c))
                   for c in self.sum_cols],
                 *[F.sum(self._nn_alias(c)).alias(self._nn_alias(c))
                   for c in self.sum_cols],
                 *[F.min(f"min_{c}").alias(f"min_{c}")
                   for c in self.min_cols],
                 *[F.max(f"max_{c}").alias(f"max_{c}")
                   for c in self.max_cols])
            .filter(F.col("row_count") > 0)
        )
        return self._normalize(merged)

    def _raw(self, df: DataFrame) -> DataFrame:
        """Type-pinned but WITHOUT the null-out: inside a fold the
        partial sums must add (SUM skips NULLs, so a nulled-out stored
        sum folds correctly; a delta's partial sums are never nulled)."""
        return df.select(
            *self.group_cols,
            F.col("row_count").cast("long").alias("row_count"),
            *[F.col(self._sum_alias(c)).cast(_SUM_T)
              .alias(self._sum_alias(c)) for c in self.sum_cols],
            *[F.col(self._nn_alias(c)).cast("long")
              .alias(self._nn_alias(c)) for c in self.sum_cols],
            *[F.col(a) for a in self._minmax_aliases()],
        )

    # -- _RollupStore hooks --------------------------------------------
    def _full_state(self, rows: DataFrame) -> DataFrame:
        return self._full(rows)

    def _delta_state(self, changes: DataFrame) -> DataFrame | None:
        stored = self._stored_foldable()
        if stored is None:
            # pre-nn_ store (older code version): unfoldable, heal
            # with a full rebuild at the target snapshot
            return None
        if self.min_cols or self.max_cols:
            # min/max fold only under inserts: a retraction can take
            # the extremum away, which only a group rescan answers —
            # rebuild when the delta deletes
            persisted = self._persist(changes)
            if self._has_delete(persisted):
                return None
            return self._fold(stored, persisted)
        return self._fold(stored, changes)


class OhlcRollup(_RollupStore):
    """Continuously-maintained OHLC candle store over an IceTable —
    the hypertable "continuous aggregate" shape: per (group, bucket)
    open/close (first/last value by (epoch-µs, tiebreak)), low/high,
    exact-decimal sum + count (mean derives at read), folded forward
    from the table's changelog so a dashboard's candles refresh at
    the cost of the CHANGED rows, never a 100 TB rescan.

    Endpoints are arg-min/arg-max under the
    :func:`~iceberg_core_spark.operators.timeseries.endpoint_key`
    total order, so the fold is exact and associative: the stored
    candle IS a partial state (open carries its key), and folding a
    delta is the same aggregate over the union of partials —
    byte-identical to :func:`downsample_ohlc` recomputed from
    scratch (regression-tested). Like MIN/MAX rollups, endpoints are
    self-maintainable under INSERTS only; a delta containing any
    delete rebuilds from the pinned snapshot. Same crash discipline
    as :class:`MaterializedRollup`: write ``v=<snapshot>`` fully,
    then advance the watermark; ``refresh(table)`` is the same
    duck-typed hook ``stream_ingest_to_table(rollups=[...])`` ticks
    per micro-batch.
    """

    def __init__(self, spark: SparkSession, root: str,
                 group_cols: list[str], ts_col: str, value_col: str,
                 tiebreak_col: str, step_us: int):
        self.spark = spark
        self.root = root
        self.group_cols = list(group_cols)
        self.ts_col = ts_col
        self.value_col = value_col
        self.tiebreak_col = tiebreak_col
        self.step_us = int(step_us)

    # -- candle algebra ------------------------------------------------
    _STATE = ["open_key", "open_value", "close_key", "close_value",
              "low_value", "high_value", "sum_value", "n_events"]

    def _candles(self, rows: DataFrame) -> DataFrame:
        """Partial candle state per (group, bucket) — the endpoint
        KEYS travel with the values so states stay foldable."""
        from iceberg_core_spark.operators.timeseries import endpoint_key

        us = F.unix_micros(F.col(self.ts_col))
        # exact int64 floor-to-step (see downsample_ohlc: '/' would
        # misbucket near boundaries beyond 2^53 through a double)
        bucket = F.timestamp_micros(
            us - F.pmod(us, F.lit(self.step_us)))
        ok = endpoint_key(us, F.col(self.tiebreak_col))
        v = F.col(self.value_col)
        return (
            rows.select(*self.group_cols, bucket.alias("bucket"),
                        v.alias("__v"), ok.alias("__ok"))
            .groupBy(*self.group_cols, "bucket")
            .agg(F.min("__ok").alias("open_key"),
                 F.min_by("__v", "__ok").alias("open_value"),
                 F.max("__ok").alias("close_key"),
                 F.max_by("__v", "__ok").alias("close_value"),
                 F.min("__v").alias("low_value"),
                 F.max("__v").alias("high_value"),
                 # SUM over decimal(18,2) widens to (28,2); pin that
                 # as the storage type so folds can't drift it
                 F.sum(F.col("__v").cast("decimal(18,2)"))
                 .cast(_OHLC_SUM_T).alias("sum_value"),
                 F.count("__v").alias("n_events"))
        )

    def _fold(self, old: DataFrame, delta: DataFrame) -> DataFrame:
        """The same aggregate over the union of partial states —
        associativity is what makes the fold exact."""
        cols = [*self.group_cols, "bucket", *self._STATE]
        both = old.select(*cols).unionByName(delta.select(*cols))
        return (
            both.groupBy(*self.group_cols, "bucket")
            .agg(F.min("open_key").alias("open_key"),
                 F.min_by("open_value", "open_key").alias("open_value"),
                 F.max("close_key").alias("close_key"),
                 F.max_by("close_value", "close_key")
                 .alias("close_value"),
                 F.min("low_value").alias("low_value"),
                 F.max("high_value").alias("high_value"),
                 F.sum("sum_value").cast(_OHLC_SUM_T)
                 .alias("sum_value"),
                 F.sum("n_events").alias("n_events"))
        )

    def read(self) -> DataFrame:
        """The last fully-committed candles, in the exact
        :func:`downsample_ohlc` output shape (the endpoint keys are
        internal fold state)."""
        return self._read_stored().select(
            *self.group_cols, "bucket", "open_value", "close_value",
            "low_value", "high_value",
            (F.col("sum_value").cast("double")
             / F.col("n_events")).alias("avg_value"),
            "n_events",
        )

    # -- _RollupStore hooks --------------------------------------------
    def _full_state(self, rows: DataFrame) -> DataFrame:
        return self._candles(rows)

    def _delta_state(self, changes: DataFrame) -> DataFrame | None:
        # endpoints fold only under inserts: a retracted open/low
        # needs a bucket rescan — rebuild when the delta deletes
        persisted = self._persist(changes)
        if self._has_delete(persisted):
            return None
        return self._fold(
            self._read_stored(),
            self._candles(persisted.drop("_change_type")))
