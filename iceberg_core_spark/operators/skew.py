"""Skew-aware aggregation: explicit two-phase salted groupBy.

AQE's skew-join splitting handles joins, but a groupBy with a heavy-
hitter key still funnels that key's entire partial-aggregate stream into
one reducer. Salting splits each hot key into ``salt`` sub-groups
(phase 1), then combines the sub-aggregates (phase 2) — the classic
two-phase decomposition for algebraic aggregates (sum/count/min/max).

Cost model: phase 1 shuffles the same bytes but over keys×salt reducers
(no single hot reducer); phase 2 shuffles only keys×salt partial rows —
negligible. Worth it when one key holds >~1/parallelism of all rows;
for uniform keys it is pure overhead (two shuffles), so it is an opt-in
operator, not a default."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_alias: str | None = None,
    salt: int = 16,
) -> DataFrame:
    """GROUP BY ``keys`` with sums/count computed via two-phase salting.

    ``sums``: {column: output_alias} — each summed through exact
    DECIMAL(18,2) (phase-1 partials stay decimal; the final result casts
    to DOUBLE, matching the engine-wide oracle convention).
    """
    sums = sums or {}
    # Deterministic salt: hash of the FULL row (stable under task
    # retry — monotonically_increasing_id is not, and a retried map
    # task re-hashing rows to different reducers is the SPARK-23207
    # class of silent-corruption bug). Identical duplicate rows share a
    # bucket; that only matters under pathological duplication.
    hashable = [c for c, t in df.dtypes if not t.startswith("map<")] or keys
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(salt))
    )
    phase1_aggs = [
        F.sum(F.col(c).cast("decimal(18,2)")).alias(f"__p_{a}")
        for c, a in sums.items()
    ]
    if count_alias:
        phase1_aggs.append(F.count(F.lit(1)).alias(f"__p_{count_alias}"))
    p1 = salted.groupBy(*keys, _SALT).agg(*phase1_aggs)

    phase2_aggs = [
        F.sum(f"__p_{a}").cast("double").alias(a) for a in sums.values()
    ]
    if count_alias:
        phase2_aggs.append(F.sum(f"__p_{count_alias}").alias(count_alias))
    return p1.groupBy(*keys).agg(*phase2_aggs)
