"""Reusable relational operators the plans compose.

Each is a DataFrame -> DataFrame combinator built purely from Catalyst
expressions, so Spark picks the physical strategy (and rank-limit filters
compile to `WindowGroupLimit`, pre-pruning rows before the full sort).

Scale notes:
- `topk_per_group` never global-sorts: partial per-partition limits
  (WindowGroupLimit) then one shuffle on the group key;
- `asof_join` is the window-pruned filtered join — the scalable as-of
  strategy when the right side per key is bounded; for unbounded right
  sides switch to a union + last_value scan (documented, same API);
- `sessionize` is lag + running-sum over (key, ts): one shuffle, no
  global sort;
- `salted_join` splinters hot keys across `n_salts` reducers: the left
  (large, skewed) side gets a deterministic per-row salt, the right side
  is replicated n_salts times. Use when AQE skew-join can't help (e.g.
  the skew is in a shuffle feeding a window, or right side too large to
  broadcast). Result is exactly the plain inner join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, keys: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group; ties broken by the caller's order columns."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .drop("__rnk")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    row_key: str,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    greatest `right_ts` <= `left_ts` for the same `on` key.

    `row_key` must uniquely identify left rows (dedup anchor). Column name
    collisions other than `on` must be resolved by the caller.
    """
    l = left.alias("l")
    r = right.withColumnRenamed(on, "__r_on").alias("r")
    joined = l.join(
        r,
        (F.col(on) == F.col("__r_on")) & (F.col(right_ts) <= F.col(left_ts)),
        how,
    ).drop("__r_on")
    w = Window.partitionBy(row_key).orderBy(F.col(right_ts).desc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_ms: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session indexes per key (lag + running sum)."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn(
        "new_session",
        F.when(
            F.lag(ts).over(w).isNull()
            | (F.unix_millis(F.col(ts)) - F.unix_millis(F.lag(ts).over(w)) > gap_ms),
            1,
        ).otherwise(0),
    ).withColumn("session_idx", F.sum("new_session").over(w)).drop("new_session")


def two_phase_sum(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof aggregation: partial sums/counts on (keys, salt), then a
    final combine on keys alone. The hot key's rows spread over `n_salts`
    reducers in phase 1; phase 2 combines `n_salts` rows per key.

    Only for algebraic aggregates (sum/count here) — exactly why the
    engine keeps money in integer cents: re-association never changes the
    result.
    """
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)),
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("__cnt"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("__cnt").alias("row_ct"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join with hot-key salting.

    The left side's salt is derived deterministically from all its columns
    (uniformly spreading each hot key's rows); the right side is exploded
    across all salt values. Join keys become (on, salt) so a hot key's rows
    land on `n_salts` reducers instead of one.
    """
    lcols = [F.col(c) for c in left.columns]
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*lcols), F.lit(n_salts)).cast("int")
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [on, "__salt"]).drop("__salt")


def window_funnel(
    df: DataFrame,
    steps: list[str],
    window_expr: str,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple = ("ts", "event_id"),
) -> DataFrame:
    """Per-key max funnel depth for an ordered step sequence within a
    time window anchored at the FIRST step (ClickHouse ``windowFunnel``
    semantics) — the generalized N-step form of
    ``plans/behavior.py::window_funnel_depth``.

    ZERO-join construction: one per-key sort carries a chained
    running-max "anchor" per completed prefix — ``anchor_k`` is the
    latest step-1 timestamp that has steps 2..k completed strictly
    before the current row, all inside ``window_expr`` of the anchor.
    Maximizing the anchor is exact, not greedy-approximate: for a fixed
    row, any admissible step chain implies the maximal anchor admits one
    too (a later qualifying anchor only extends the deadline).

    Returns (key_col, depth) with depth in [0, len(steps)].
    Scale: ONE shuffle on ``key_col``; every step adds a window frame
    over the SAME sort; per-key state is the row count, which is
    human-bounded for behavioral streams.
    """
    assert len(steps) >= 1
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        key_col, type_col, ts_col, *[c for c in order_cols if c != ts_col]
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    horizon = F.expr(window_expr)
    # anchor_1 = latest step-1 ts strictly before this row
    cur = ev.withColumn(
        "__a1",
        F.max(F.when(F.col(type_col) == steps[0], F.col(ts_col))).over(w),
    )
    depth = F.when(F.col(type_col) == steps[0], 1).otherwise(0)
    prev_anchor = "__a1"
    for k, step in enumerate(steps[1:], start=2):
        # rows of step k that complete the prefix: carry the anchor forward
        carry = f"__c{k}"
        cur = cur.withColumn(
            carry,
            F.when(
                (F.col(type_col) == step)
                & F.col(prev_anchor).isNotNull()
                & (F.col(ts_col) <= F.col(prev_anchor) + horizon),
                F.col(prev_anchor),
            ),
        )
        depth = F.when(F.col(carry).isNotNull(), k).otherwise(depth)
        if k < len(steps):
            nxt = f"__a{k}"
            cur = cur.withColumn(nxt, F.max(carry).over(w))
            prev_anchor = nxt
    per_key = cur.groupBy(key_col).agg(
        F.max(depth).cast("bigint").alias("depth")
    )
    return per_key


def clamped_running_sum(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    delta_col: str,
    out_col: str = "clamped_sum",
) -> DataFrame:
    """Floored-at-zero running sum C_t = max(0, C_{t-1} + delta_t) — the
    Lindley recursion, declaratively.

    The recurrence is prefix-dependent and NOT associative, so it looks
    like a stateful per-row loop; the reflection identity
    ``C_t = S_t - min(0, min_{j<=t} S_j)`` turns it into two stacked
    window functions over one per-key sort (one shuffle, zero Python).
    This is the shared core of ``running_balance_floor`` (wallet floors)
    and ``change_point_cusum`` (both one-sided CUSUM statistics), each
    oracle-gated; the streaming twin folds the DIRECT recurrence in keyed
    state and the driver row proves the identity bit-for-bit
    (``streaming_cusum_daily``).

    Appends ``out_col`` (same row grain as the input; exact integer if
    ``delta_col`` is integral).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = F.sum(delta_col).over(w)
    return df.withColumn("__s", s).withColumn(
        out_col, F.col("__s") - F.least(F.lit(0), F.min("__s").over(w))
    ).drop("__s")
