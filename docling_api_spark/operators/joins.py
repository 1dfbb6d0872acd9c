"""Temporal join operators: as-of join + bounded-interval range counts.

Spark has no built-in as-of or interval range join; the naive encodings
(per-key ``applyInPandas`` merge_asof, or an equi-join on the key followed
by a time filter) either drop to Python or explode to O(|left|·|right|)
intermediate rows per key. Both operators here use the UNION + WINDOW
trick instead: tag left/right, union them into one frame, and resolve the
temporal predicate with window functions over a single shuffle on the join
key — no join operator at all, no Python, whole-stage codegen throughout.

Scale notes (100 TB): cost is one Exchange on the key plus an in-partition
sort — the same price as the equi-join's shuffle, but with no pair
expansion and no second relation build. Skewed keys degrade exactly like
any window over that key; route hot keys through
``plans.pipeline.skew_aware_repartition`` first if the key histogram is
pathological. Both window specs share the partitioning, so asking for the
as-of attach AND a preceding-interval count still costs one shuffle.

Reference parity: the reference correlates each usage/webhook event with
the most recent prior state for the same key — "latest job status at or
before t" polling (docling_client.py:300-330) and per-key last_used
tracking (key_service.py:163-180). This operator family is that lookup
expressed as a set operation instead of a point query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_IS_RIGHT = "_asof_is_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    attach_cols: Sequence[str] = ("value",),
    prefix: str = "asof_",
    count_preceding_s: int | None = None,
    count_col: str = "n_right_preceding",
) -> DataFrame:
    """As-of join: attach to every left row the latest right row with
    ``right_ts <= left_ts`` for the same key (inclusive semantics — the
    same as DuckDB's ``ASOF JOIN ... ON r.ts <= l.ts``), as
    ``{prefix}{right_ts}`` plus ``{prefix}{c}`` for each attached column;
    nulls when no right row precedes. Optionally also attach
    ``count_col`` = number of right rows in the half-open interval
    ``[left_ts - count_preceding_s, left_ts)`` — microsecond-exact via a
    range frame over epoch micros.

    Mechanics: right rows are projected to (key, ts, attached cols),
    unioned under the left schema, and ordered per key by
    (epoch_micros, is_right DESC, attached cols) — so at equal
    timestamps a right row sorts before a left row (inclusive as-of) and
    duplicate right timestamps resolve deterministically by attached
    value order. ``last(..., ignorenulls)`` over an unbounded-preceding
    row frame then carries the latest right values onto each left row.

    Requires: (key, right_ts) collisions are allowed but resolved by
    attached-column order; attached columns must be orderable types.
    """
    key = [on] if isinstance(on, str) else list(on)
    tagged_left = left.withColumn(_IS_RIGHT, F.lit(0))
    tagged_right = right.select(
        *key,
        F.col(right_ts).alias(left_ts),
        *[F.col(c).alias(prefix + c) for c in attach_cols],
    ).withColumn(_IS_RIGHT, F.lit(1))
    u = tagged_left.unionByName(tagged_right, allowMissingColumns=True)

    # parquet timestamps arrive as TIMESTAMP_NTZ; unix_micros wants
    # TIMESTAMP. The session pins spark.sql.session.timeZone=UTC
    # (session.py), so the cast is a linear relabeling — no DST folds
    # that could warp range-frame arithmetic.
    micros = F.unix_micros(F.col(left_ts).cast("timestamp"))
    w_rows = (
        Window.partitionBy(*key)
        .orderBy(
            micros.asc(),
            F.col(_IS_RIGHT).desc(),
            *[F.col(prefix + c).asc_nulls_first() for c in attach_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn(
        prefix + right_ts,
        F.last(F.when(F.col(_IS_RIGHT) == 1, F.col(left_ts)), ignorenulls=True)
        .over(w_rows),
    )
    for c in attach_cols:
        out = out.withColumn(
            prefix + c,
            F.last(F.col(prefix + c), ignorenulls=True).over(w_rows),
        )
    if count_preceding_s is not None:
        w_range = (
            Window.partitionBy(*key)
            .orderBy(micros)
            .rangeBetween(-count_preceding_s * 1_000_000, -1)
        )
        out = out.withColumn(
            count_col,
            F.count(F.when(F.col(_IS_RIGHT) == 1, F.lit(1))).over(w_range),
        )
    return out.filter(F.col(_IS_RIGHT) == 0).drop(_IS_RIGHT)


def range_interval_count(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = 600,
    upper_s: int = 0,
    count_col: str = "n_in_range",
) -> DataFrame:
    """Interval range join, aggregated: for every left row, the count of
    right rows with ``right_ts`` in ``[left_ts - lower_s, left_ts + upper_s)``
    for the same key (half-open upper bound; microsecond-exact). Same
    union + range-frame plan as :func:`asof_join` — one shuffle, no pair
    expansion. For ``upper_s = 0`` this is "right events in the preceding
    ``lower_s`` seconds, strictly before the left event"."""
    key = [on] if isinstance(on, str) else list(on)
    tagged_left = left.withColumn(_IS_RIGHT, F.lit(0))
    tagged_right = right.select(
        *key, F.col(right_ts).alias(left_ts)
    ).withColumn(_IS_RIGHT, F.lit(1))
    u = tagged_left.unionByName(tagged_right, allowMissingColumns=True)
    w_range = (
        Window.partitionBy(*key)
        .orderBy(F.unix_micros(F.col(left_ts).cast("timestamp")))
        .rangeBetween(-lower_s * 1_000_000, upper_s * 1_000_000 - 1)
    )
    out = u.withColumn(
        count_col,
        F.count(F.when(F.col(_IS_RIGHT) == 1, F.lit(1))).over(w_range),
    )
    return out.filter(F.col(_IS_RIGHT) == 0).drop(_IS_RIGHT)
