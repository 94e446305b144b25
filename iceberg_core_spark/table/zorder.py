"""Z-order (Morton) clustering for multi-dimensional file pruning.

Key-sorted layout prunes range queries on the key column only; a query
on any other column touches every file. Z-ordering interleaves the bits
of several columns so files cover small hyper-rectangles in ALL
clustered dimensions — per-file min/max stats then prune range queries
on any of them (the standard lakehouse technique; e.g. the public
Iceberg/Delta z-order write strategy).

Implementation is pure built-in expressions:
1. normalize each column to a 16-bit integer rank using its global
   min/max (one lightweight agg job at write time);
2. interleave bits with an unrolled shift/mask expression (stays in
   whole-stage codegen — see spark-perf-pitfalls: unrolled beats
   interpreted HOF lambdas);
3. range-partition + sort by the z-value.

Supported column types: integral and timestamp (cast to epoch micros).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS = 16


def _as_long(df: DataFrame, col: str):
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp"))
    if dt in ("bigint", "int", "smallint", "tinyint", "long"):
        return c.cast("long")
    raise TypeError(f"z-order supports integral/timestamp columns, {col} is {dt}")


def zvalue_column(df: DataFrame, cols: list[str]) -> F.Column:
    """Morton code of ``cols`` as a single long (16 bits per column,
    max 4 columns). Global min/max per column come from one agg pass."""
    if not 2 <= len(cols) <= 4:
        raise ValueError("z-order needs 2-4 columns")
    longs = {c: _as_long(df, c) for c in cols}
    stats = df.agg(*[
        F.min(longs[c]).alias(f"mn_{i}") for i, c in enumerate(cols)
    ], *[
        F.max(longs[c]).alias(f"mx_{i}") for i, c in enumerate(cols)
    ]).first()

    z = F.lit(0).cast("long")
    n = len(cols)
    # Total interleaved bits must stay below 64 so the top bit of the
    # long (the SIGN bit) is never set: with 4×16 bits the last index is
    # 63 and rows whose 4th column has its high rank bit set would go
    # NEGATIVE and sort before everything, breaking Morton ordering.
    # 15 bits/col at n=4 keeps the max index at 14*4+3 = 59.
    bits = min(BITS, 63 // n)
    for i, c in enumerate(cols):
        lo = stats[f"mn_{i}"] or 0
        hi = stats[f"mx_{i}"] or 0
        span = max(1, hi - lo)
        # rank in [0, 2^bits): double division avoids the long overflow
        # of (v-lo)*65535 on wide spans (e.g. epoch-micros over years);
        # doubles hold epoch-micros exactly up to 2^53, far past any
        # realistic span, and the expression is deterministic IEEE
        rank = (
            (longs[c] - F.lit(lo)).cast("double")
            / F.lit(float(span)) * F.lit(float((1 << bits) - 1))
        ).cast("long")
        rank = F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), rank))
        for b in range(bits):
            bit = F.shiftright(rank, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit.cast("long"), b * n + i)
    return z
