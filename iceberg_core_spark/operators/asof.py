"""As-of join — nearest-key-at-or-before match, the natural time-series
join for the reference's data model (partition key + ordered key column,
SURVEY.md §2.B "Joins").

Spark has no built-in ASOF JOIN, so this implements the classic
union-and-carry-forward technique as a composition of built-in operators
(no UDFs, fully whole-stage-codegen'd):

1. tag left rows 1, right rows 0;
2. union by the shared (partition, time) axis;
3. one window per partition key, ordered by (time, tag, right-order),
   carrying the most recent right-side payload forward with
   ``last(..., ignorenulls=True)``;
4. keep left rows; their carried payload is the as-of match (rows with
   no earlier right row get NULLs — left-outer semantics).

Ordering ties: a right row at exactly t matches a left row at t
(``left.ts >= right.ts`` semantics, same as DuckDB/Pandas ASOF), because
tag 0 sorts before tag 1 within a timestamp.

Scale: cost is ONE shuffle of (left ∪ right) on the partition key +
a per-partition sort — the same cost profile as a sort-merge join, with
no range-explosion. Skewed partition keys are handled by AQE; for
extreme skew, pre-bucket both sides on the partition key so the union
is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    tolerance=None,
    right_order: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` group.

    ``right_payload``: right columns to carry (default: all non-key,
    non-ts columns). ``tolerance``: optional max allowed ``left_ts -
    right_ts`` (same type as the ts difference; matches farther back are
    nulled out). ``right_order``: deterministic tiebreaker when several
    right rows share the same (on, right_ts) — the carried row is the
    LAST under ascending order of these columns (default: the payload
    columns themselves, which must then be orderable types; pass an
    explicit column list when the payload contains maps).
    """
    on = [on] if isinstance(on, str) else list(on)
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in on + [right_ts]]
    collisions = set(right_payload) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right_payload columns collide with left columns: "
            f"{sorted(collisions)} — alias the right side first"
        )

    time_col = "__asof_ts"
    l = left.withColumn(_TAG, F.lit(1)).withColumn(time_col, F.col(left_ts))
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(time_col),
        *[F.col(c) for c in right_payload],
    ).withColumn(_TAG, F.lit(0))

    # Align schemas for the union: left lacks payload, right lacks left cols.
    left_only = [c for c in left.columns if c not in on + [left_ts]]
    for c in right_payload:
        l = l.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    for c in left_only:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.withColumn("__asof_rts", F.col(time_col))
    l = l.withColumn("__asof_rts", F.lit(None).cast(r.schema["__asof_rts"].dataType))

    cols = on + [time_col, _TAG, "__asof_rts"] + left_only + right_payload
    u = l.select(*cols).unionByName(r.select(*cols))

    # Tiebreak among right rows sharing (on, ts): without it the carried
    # payload is nondeterministic across runs/engines. Left rows hold
    # NULL in these columns, but _TAG already orders right (0) before
    # left (1) within a timestamp, so the tiebreak only acts within
    # right-row ties.
    tiebreak = right_order if right_order is not None else right_payload
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col).asc(), F.col(_TAG).asc(),
                 *[F.col(c).asc_nulls_first() for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the matched right row as ONE struct, not per-column
    # last(ignorenulls) calls: independent carries would assemble the
    # payload from DIFFERENT right rows whenever a right row holds
    # NULL in some payload column (col A from the t=2 row, col B from
    # the t=1 row — a combined row that never existed), where ASOF
    # semantics (DuckDB/pandas) attach the latest right ROW wholesale
    # (r13 review). The struct is non-NULL for every right row even
    # when all its fields are NULL, so ignorenulls carries rows, and
    # the matched ts rides in the same struct — tolerance can never
    # null out payload from a different row than the ts it tested.
    ps = F.when(F.col(_TAG) == 0, F.struct(
        *[F.col(c).alias(c) for c in right_payload],
        F.col("__asof_rts").alias("__rts"),
    ))
    carried_row = F.last(ps, ignorenulls=True).over(w)
    carried = [carried_row[c].alias(c) for c in right_payload]
    matched_ts = carried_row["__rts"].alias("__asof_mts")
    out = u.select(*on, time_col, _TAG, *left_only, *carried, matched_ts).filter(
        F.col(_TAG) == 1
    )

    if tolerance is not None:
        far = F.col(time_col).cast("double") - F.col("__asof_mts").cast("double")
        out = out.select(
            *on, time_col, _TAG, "__asof_mts", *left_only,
            *[
                F.when(far <= tolerance, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in right_payload
            ],
        )

    return out.select(
        *on, F.col(time_col).alias(left_ts), *left_only, *right_payload
    )
