"""Keyed-state streaming processors — the reference's semantic core
(SURVEY.md §2.6, T1-T5), built on ``applyInPandasWithState``.

Each processor is the streaming twin of a window-function batch expression
in ``plans/core.py``; the pair is asserted equal in tests (same fixture ->
same output), which is this engine's substitute for the reference's absent
test suite.

State design (100 TB notes):
- state per key is O(1) (one date string / one marker), so the state store
  stays proportional to |keys|, not |events| — RocksDB-backed at scale;
- the reference's wall-clock TTLs (StateTtlConfig, 1 day) are re-expressed
  as event-date comparisons: equivalent for the daily-dedup semantics and
  deterministic/replayable (the reference's own Dws06 TTL was built but
  never attached — see SURVEY.md §2.6 note);
- processors are Arrow-batched (pandas), never row-at-a-time Python;
- API choice: Spark 4.1's `transformWithStateInPandas` (value state with
  native `ttlDurationMs`) is the preferred production API but its state
  server requires protobuf, which this container lacks (verified:
  STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE) — so these processors
  use `applyInPandasWithState`, with day-scoped state as the TTL
  equivalent; the processor bodies port to transformWithState unchanged.

Citations: T1 BaseLogApp.java:76-106; T2 Dws02...java:81-153;
T4 Dws04...java:82-125; T5 Dws06...java:68-105; T6 Dws09...java:99-145.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

EPOCH_DAY = "1970-01-01"


def _sorted_concat(pdfs: Iterator[pd.DataFrame], by: list[str]) -> pd.DataFrame:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    return pdf.sort_values(by, kind="mergesort", ignore_index=True)


# ---------------------------------------------------------------------------
# T1: new/old-visitor repair. Key: mid. State: first visit date.
# ---------------------------------------------------------------------------
def visitor_repair(events: DataFrame, key: str = "mid") -> DataFrame:
    """Rewrites `is_new` exactly as BaseLogApp.java:76-106:

    - is_new == "1" and first-ever visit      -> keep "1", remember today
    - is_new == "1" but state has earlier day -> rewrite to "0"
    - is_new == "0" and state empty           -> backfill state 1970-01-01
      (visitor predates the job)
    """
    schema = StructType(
        [
            StructField(key, StringType()),
            StructField("dt", StringType()),
            StructField("is_new", StringType()),
            StructField("payload", StringType()),
        ]
    )
    state_schema = StructType([StructField("first_dt", StringType())])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        first_dt = state.get[0] if state.exists else None
        pdf = _sorted_concat(pdfs, ["dt"])
        if len(pdf):
            # Once set, first_dt never changes, so the whole batch reduces
            # to one scalar: the state, else the first sorted row decides
            # (its own dt when it claims new, the epoch backfill otherwise).
            if first_dt is None:
                first_dt = (
                    pdf["dt"].iat[0]
                    if pdf["is_new"].iat[0] == "1"
                    else EPOCH_DAY
                )
            # Vectorized repair: "1" survives only on the first-visit date.
            demote = pdf["is_new"].eq("1") & pdf["dt"].ne(first_dt)
            pdf = pdf.assign(is_new=pdf["is_new"].mask(demote, "0"))
        state.update((first_dt,))
        yield pdf

    return events.groupBy(key).applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


# ---------------------------------------------------------------------------
# T2/T3/T5: first-event-per-key-per-day flag. Key: any id (mid, user_id...).
# ---------------------------------------------------------------------------
def daily_first_flag(
    events: DataFrame,
    key_cols: list[str],
    passthrough: list[StructField] = (),
) -> DataFrame:
    """Emits every row plus `first_flag` (1 on the key's first row of its
    event-date). State: the latest date already flagged.

    Batch twin: ROW_NUMBER() OVER (PARTITION BY key, dt ORDER BY ts) = 1.
    T3's two independent page states are this processor keyed on
    (mid, page_type); T5 is it keyed on user_id over cart events.
    """
    fields = [StructField(c, StringType()) for c in key_cols]
    fields.append(StructField("dt", StringType()))
    fields += list(passthrough)
    fields.append(StructField("first_flag", IntegerType()))
    schema = StructType(fields)
    state_schema = StructType([StructField("last_dt", StringType())])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        last_dt = state.get[0] if state.exists else None
        pdf = _sorted_concat(pdfs, ["dt"])
        flags = []
        for dt in pdf["dt"]:
            if last_dt is None or dt > last_dt:
                flags.append(1)
                last_dt = dt
            else:
                flags.append(0)
        state.update((last_dt,))
        yield pdf.assign(first_flag=flags)

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


# ---------------------------------------------------------------------------
# T4: login UV + 7-day returning users. Key: uid. State: last login date.
# ---------------------------------------------------------------------------
def login_back_flags(events: DataFrame, key: str = "uid") -> DataFrame:
    """Emits (uid, dt, uv_flag, back_flag): uv on first login of the day,
    back additionally when the gap since the previous login day exceeds 7
    days (Dws04...java:104-117: (cur-last)/86400000 > 7). Rows with uv=0
    are suppressed, matching the reference (emit only when uv fires).
    """
    schema = StructType(
        [
            StructField(key, StringType()),
            StructField("dt", StringType()),
            StructField("uv_flag", IntegerType()),
            StructField("back_flag", IntegerType()),
        ]
    )
    state_schema = StructType([StructField("last_dt", StringType())])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        last_dt = state.get[0] if state.exists else None
        pdf = _sorted_concat(pdfs, ["dt"])
        # Sorted ascending, so the emitted rows are exactly the distinct
        # dates above the incoming state, each once; the per-emission gap is
        # against the previous emitted date (seeded with the state).
        days = pdf["dt"].drop_duplicates()
        if last_dt is not None:
            days = days[days > last_dt]
        ts = pd.to_datetime(days)
        prev = ts.shift(1)
        if last_dt is not None and len(prev):
            prev.iloc[0] = pd.Timestamp(last_dt)
        # first-ever login: prev is NaT -> gap NaN -> back_flag 0
        back = ((ts - prev).dt.days > 7).astype("int32")
        out = pd.DataFrame(
            {
                key: key_tuple[0],
                "dt": days,
                "uv_flag": 1,
                "back_flag": back,
            }
        ).reset_index(drop=True)
        if len(days):
            last_dt = days.iat[-1]
        state.update((last_dt,))
        yield out

    return events.groupBy(key).applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


# ---------------------------------------------------------------------------
# T6: first-row-per-key dedup (join-retraction defense).
# ---------------------------------------------------------------------------
def first_row_per_key(events: DataFrame, key: str, payload_cols: list[str]) -> DataFrame:
    """Keeps only the first arrival per key (Dws09...java:99-145; 5 s TTL in
    the reference bounds state to the retraction window — here state is a
    single marker per key; production would use
    `dropDuplicatesWithinWatermark([key])`, which this engine prefers —
    this processor exists for semantic parity tests).
    """
    fields = [StructField(key, StringType())]
    fields += [StructField(c, StringType()) for c in payload_cols]
    schema = StructType(fields)
    state_schema = StructType([StructField("seen", StringType())])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        seen = state.exists
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if seen or pdf.empty:
            yield pdf.iloc[0:0]
        else:
            state.update(("1",))
            yield pdf.iloc[0:1]

    return events.groupBy(key).applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


# ---------------------------------------------------------------------------
# Floor-at-zero running balance — streaming twin of
# plans/state_ops.py::running_balance_floor (the batch side computes the
# same values via the reflection identity over two window functions; here
# the state carries the balance across micro-batches and the identity is
# applied WITHIN each batch, seeded by the carried balance). The pairing
# matters because max(0, B + D) is NOT associative: it cannot be a
# combine-backed aggregate, so streaming needs keyed state and batch
# needs the window identity — asserted equal in tests.
# ---------------------------------------------------------------------------
def running_balance(events: DataFrame, key: str = "uid") -> DataFrame:
    """Per-key wallet balance clamped at zero. Input: (key, seq, delta);
    emits every row with its post-event `balance`. Rows are processed in
    `seq` order within the key; state is one bigint.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField(key, StringType()),
            StructField("seq", LongType()),
            StructField("delta", LongType()),
            StructField("balance", LongType()),
        ]
    )
    state_schema = StructType([StructField("balance", LongType())])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        bal = state.get[0] if state.exists else 0
        pdf = _sorted_concat(pdfs, ["seq"])
        if len(pdf):
            # Vectorized within-batch Lindley step seeded by the carried
            # balance: S_t = bal + cumsum(delta);
            # B_t = S_t - min(0, running_min(S)).
            s = bal + pdf["delta"].cumsum()
            b = s - s.cummin().clip(upper=0)
            pdf = pdf.assign(balance=b.astype("int64"))
            bal = int(pdf["balance"].iat[-1])
        state.update((bal,))
        yield pdf

    return events.groupBy(key).applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def ewma_daily(events: DataFrame, key: str = "event_type") -> DataFrame:
    """Per-key integer EWMA over daily event counts — the keyed-state
    streaming twin of ``plans/timeseries.ewma_anomaly_daily`` (alpha=1/4,
    floor division; identical recurrence, so the outputs are bit-equal).

    Input rows carry (key, day) — one row per EVENT; each micro-batch's
    rows are counted per day in pandas, the days are folded IN ORDER, and
    the last smoothed level carries across micro-batches as the single
    bigint state value. ``prev`` is 0 on each key's very first day (a real
    previous level can never be 0: every observed day has ct >= 1, so
    ewma >= alpha * 1e6 > 0) — downstream deviation/anomaly expressions
    key off that marker exactly like the batch operator's ``i = 0``.

    Contract: days must arrive in non-decreasing order across micro-batches
    (the sequential-state contract any EWMA consumer needs; the streaming
    twin harness writes day-grouped source files with increasing mtimes).
    Scale note: counting inside the pandas fn is the test-harness shape —
    at corpus scale the daily counts would be pre-aggregated (foreachBatch
    or the batch operator) and only the per-(key, day) count rows would
    flow through the fold; state stays O(1) per key either way.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField(key, StringType()),
            StructField("day", StringType()),
            StructField("ct", LongType()),
            StructField("ewma", LongType()),
            StructField("prev", LongType()),
        ]
    )
    state_schema = StructType([StructField("ewma", LongType())])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        prev = state.get[0] if state.exists else -1
        pdf = pd.concat(list(pdfs), ignore_index=True)
        counts = pdf.groupby("day").size().sort_index()
        rows = []
        for day, ct in counts.items():
            x = int(ct) * 1_000_000
            ewma = x if prev < 0 else (3 * prev + x) // 4
            rows.append(
                (key_tuple[0], day, int(ct), ewma, 0 if prev < 0 else prev)
            )
            prev = ewma
        state.update((prev,))
        yield pd.DataFrame(
            rows, columns=[key, "day", "ct", "ewma", "prev"]
        )

    return events.groupBy(key).applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def cusum_daily(events: DataFrame, key: str = "event_type") -> DataFrame:
    """Per-key integer CUSUM over daily event counts — the keyed-state
    streaming twin of ``plans/timeseries.change_point_cusum``.

    The batch operator computes C_t via the Lindley reflection
    (S_t − min(0, min_{j<=t} S_j), two stacked windows); the streaming
    state form is the DIRECT recurrence C_t = max(0, C_{t-1} + d_t) —
    equal by the reflection identity, in exact integers, so the driver
    row proves the streaming execution (state carry across micro-batches,
    Arrow round trip) bit-matches the declarative batch oracle.

    Input rows carry (key, day, mean_micro) — one row per EVENT, with the
    per-key baseline mean joined on statically (a production CUSUM's
    baseline comes from a reference period the same way). State is the
    (c_up, c_dn) pair of bigints; days fold in order within and across
    micro-batches (same sequential-state contract and day-grouped-file
    harness as ewma_daily).
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField(key, StringType()),
            StructField("day", StringType()),
            StructField("ct", LongType()),
            StructField("cusum_up_micro", LongType()),
            StructField("cusum_dn_micro", LongType()),
            StructField("alarm", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("c_up", LongType()), StructField("c_dn", LongType())]
    )

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        c_up, c_dn = state.get if state.exists else (0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        mean = int(pdf["mean_micro"].iloc[0])
        slack = mean // 4  # CUSUM_SLACK_DEN twin (floor; mean > 0)
        counts = pdf.groupby("day").size().sort_index()
        rows = []
        for day, ct in counts.items():
            x = int(ct) * 1_000_000
            c_up = max(0, c_up + (x - mean - slack))
            c_dn = max(0, c_dn + (mean - slack - x))
            alarm = 1 if (c_up > 2 * mean or c_dn > 2 * mean) else 0
            rows.append((key_tuple[0], day, int(ct), c_up, c_dn, alarm))
        state.update((c_up, c_dn))
        yield pd.DataFrame(
            rows,
            columns=[
                key, "day", "ct", "cusum_up_micro", "cusum_dn_micro", "alarm",
            ],
        )

    return events.groupBy(key).applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def topk_hitters(
    events: DataFrame, key: str = "event_type", cap: int = 125
) -> DataFrame:
    """Per-key Misra-Gries heavy-hitter sketch with state carried across
    micro-batches — the keyed-SKETCH-state streaming twin of
    ``plans/mining.heavy_hitter_users`` (same vectorized fold as its
    ``_mg_candidates``, same MG 1982 guarantee).

    Because the state carries across micro-batches, this is a single
    sequential MG per key: any user with per-key frequency >= n_key/cap
    survives into the flush (undercount bound n_key/(cap+1) — no
    pigeonhole-over-partitions argument needed). The caller exact-verifies
    candidates batch-side, so the emitted heavy-hitter set is EXACT and
    independent of batch boundaries; the sketch only bounds state:
    O(cap) counters per key, never |users|.

    Input rows: (key, user_id, flush). Data rows have flush=0; the
    harness's final sentinel file carries one flush=1 row per key (no
    watermark/filter in the stream graph, so the W5 sentinel-pushdown trap
    does not apply). On flush the key emits its counter table and drops
    its state.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField(key, StringType()),
            StructField("user_id", LongType()),
            StructField("approx_ct", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("users", ArrayType(LongType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        users, counts = state.get if state.exists else ([], [])
        counters = pd.Series(
            list(counts or []), index=list(users or []), dtype="int64"
        )
        pdf = pd.concat(list(pdfs), ignore_index=True)
        flush = bool((pdf["flush"] == 1).any())
        data = pdf[pdf["flush"] == 0]
        if len(data):
            counters = counters.add(
                data["user_id"].value_counts(), fill_value=0
            ).astype("int64")
            if len(counters) > cap:
                cut = counters.nsmallest(len(counters) - cap).iloc[-1]
                counters = counters[counters > cut] - cut
        if flush:
            state.remove()
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(counters),
                    "user_id": counters.index.astype("int64"),
                    "approx_ct": counters.to_numpy(dtype="int64"),
                }
            )
        else:
            state.update(
                (
                    [int(u) for u in counters.index],
                    [int(c) for c in counters.to_numpy()],
                )
            )
            yield pd.DataFrame(
                {
                    key: pd.Series([], dtype="str"),
                    "user_id": pd.Series([], dtype="int64"),
                    "approx_ct": pd.Series([], dtype="int64"),
                }
            )

    return events.groupBy(key).applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def kmv_kmin(events: DataFrame, k: int = 8) -> DataFrame:
    """Per-day K-minimum-values sketch with state carried across
    micro-batches — the mergeable-sketch streaming twin of
    ``plans/sketches.kmv_distinct_daily``.

    The state is the day's K smallest DISTINCT hashes (a set union then
    re-truncate per batch — the same merge rule the batch rolling window
    uses, valid because the K smallest of a union are contained in the
    union of per-set K smallest). State per key is O(K) longs, never
    O(users): the whole point of keeping sketches instead of hash sets.

    Input rows: (day, h, flush). Data rows have flush=0; the harness's
    final sentinel file carries one flush=1 row per day. On flush the key
    emits (day, h_k, n_in) — the sketch summary the batch-side estimator
    consumes — and drops its state.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField("day", StringType()),
            StructField("h_k", LongType()),
            StructField("n_in", LongType()),
        ]
    )
    state_schema = StructType([StructField("hs", ArrayType(LongType()))])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        hs = set(state.get[0] or []) if state.exists else set()
        pdf = pd.concat(list(pdfs), ignore_index=True)
        flush = bool((pdf["flush"] == 1).any())
        data = pdf[pdf["flush"] == 0]
        if len(data):
            hs |= {int(x) for x in data["h"].unique()}
            hs = set(sorted(hs)[:k])
        if flush:
            state.remove()
            arr = sorted(hs)
            yield pd.DataFrame(
                {
                    "day": [key_tuple[0]],
                    "h_k": [int(arr[-1]) if arr else 0],
                    "n_in": [len(arr)],
                }
            )
        else:
            state.update(([int(x) for x in sorted(hs)],))
            yield pd.DataFrame(
                {
                    "day": pd.Series([], dtype="str"),
                    "h_k": pd.Series([], dtype="int64"),
                    "n_in": pd.Series([], dtype="int64"),
                }
            )

    return events.groupBy("day").applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def hll_register_merge(
    events: DataFrame, m: int = 64, rank_max: int = 55
) -> DataFrame:
    """Per-day HyperLogLog register state carried across micro-batches —
    the fixed-width mergeable-sketch streaming twin of
    ``plans/sketches.hll_union_rolling``'s register algebra.

    The state is the day's m-register vector (max rank seen per
    register): per batch the fold is an elementwise max — commutative,
    associative, idempotent, so the result is independent of how the
    stream was sliced. State per key is EXACTLY m longs regardless of
    cardinality — the property that distinguishes HLL from KMV's K-set
    (`kmv_kmin`) and makes the register vector the cheapest
    cross-cluster shippable distinct summary.

    Input rows: (day, reg, rank, flush). Data rows have flush=0; the
    harness's final sentinel carries one flush=1 row per day. On flush
    the key emits (day, occupied_regs, s_occ) — the two sufficient
    statistics of the shifted harmonic sum (s_occ = sum over occupied
    registers of 2^(rank_max - M_j)) — and drops its state; the
    JVM-side plan composes the same alpha/harmonic estimate as the
    batch operator.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField("day", StringType()),
            StructField("occupied_regs", LongType()),
            StructField("s_occ", LongType()),
        ]
    )
    state_schema = StructType([StructField("regs", ArrayType(LongType()))])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        regs = list(state.get[0]) if state.exists else [0] * m
        pdf = pd.concat(list(pdfs), ignore_index=True)
        flush = bool((pdf["flush"] == 1).any())
        data = pdf[pdf["flush"] == 0]
        if len(data):
            mx = data.groupby("reg")["rank"].max()
            for r, k in mx.items():
                r, k = int(r), int(k)
                if k > regs[r]:
                    regs[r] = k
        if flush:
            state.remove()
            yield pd.DataFrame(
                {
                    "day": [key_tuple[0]],
                    "occupied_regs": [sum(1 for v in regs if v > 0)],
                    "s_occ": [
                        sum(1 << (rank_max - v) for v in regs if v > 0)
                    ],
                }
            )
        else:
            state.update(([int(v) for v in regs],))
            yield pd.DataFrame(
                {
                    "day": pd.Series([], dtype="str"),
                    "occupied_regs": pd.Series([], dtype="int64"),
                    "s_occ": pd.Series([], dtype="int64"),
                }
            )

    return events.groupBy("day").applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


# ---------------------------------------------------------------------------
# Per-key streaming admission cap — the ingest-time half of the C4/
# RefinedWeb per-domain frequency cap (plans/corpus_ops.py::
# domain_frequency_cap is the batch side): as documents arrive, each host
# may admit at most `cap` of them; everything after is dropped AT INGEST,
# before any downstream (dedup/quality) work is spent on it. State per
# host is ONE bigint (the admitted count) — fixed-width, mergeable-free
# keyed state, the cheapest state class Structured Streaming has; at
# 100 TB the state size is the number of distinct hosts, not documents.
# ---------------------------------------------------------------------------
def admit_first_k(
    docs: DataFrame,
    key: str = "host",
    order_col: str = "doc_id",
    cap: int = 20,
) -> DataFrame:
    """Admit the first `cap` rows per key, in `order_col` order within
    each micro-batch; the carried count makes admission exact across
    batches. Emits admitted rows stamped with their 1-based `admit_seq`.
    The arrival-order contract (batch i holds smaller `order_col` values
    than batch i+1) is the feeder's job — a real ingest stream keys this
    by log offset.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField(key, StringType()),
            StructField(order_col, LongType()),
            StructField("admit_seq", LongType()),
        ]
    )
    state_schema = StructType([StructField("admitted", LongType())])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        pdf = _sorted_concat(pdfs, [order_col])
        room = max(0, cap - n)
        take = pdf.iloc[:room]
        take = take.assign(
            admit_seq=pd.RangeIndex(n + 1, n + 1 + len(take)).astype("int64")
        )
        state.update((n + len(take),))
        yield take[[key, order_col, "admit_seq"]]

    return docs.groupBy(key).applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def episode_returns(events: DataFrame) -> DataFrame:
    """Per-(user, day) discounted-return fold — the keyed-state streaming
    twin of ``plans/curation.episode_discounted_returns`` (gamma = 1/2,
    per-term arithmetic right shift; identical integer arithmetic, so the
    final per-episode rows are bit-equal to the batch operator).

    Input rows carry (user_id, day, ts_micro, ord_eid, r) — one row per
    event, reward already in cents, ord_eid = coalesce(event_id, -1).
    Each micro-batch's rows are sorted by the batch operator's total
    order (ts, ord_eid, r); the fold state (next step index t, running
    total, running discounted return) carries across micro-batches as
    three bigints. Every emission is the key's cumulative row; n_steps
    strictly increases per emission, so the final row per key is the one
    with max n_steps.

    Contract: slices must arrive in non-decreasing (per-key) ts order
    across micro-batches — the twin harness stages hour-banded slices
    with increasing mtimes, so every key's later-hour rows land in later
    batches. State is O(1) per open episode at any scale; a production
    job would add an event-time timeout to retire closed days.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("day", StringType()),
            StructField("n_steps", LongType()),
            StructField("total_reward_cents", LongType()),
            StructField("discounted_return_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("t", LongType()),
            StructField("total", LongType()),
            StructField("g", LongType()),
        ]
    )

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        t, total, g = state.get if state.exists else (0, 0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts_micro", "ord_eid", "r"])
        for r in pdf["r"]:
            r = int(r)
            total += r
            if t < 40:
                g += r >> t
            t += 1
        state.update((t, total, g))
        yield pd.DataFrame(
            [(key_tuple[0], key_tuple[1], t, total, g)],
            columns=[
                "user_id",
                "day",
                "n_steps",
                "total_reward_cents",
                "discounted_return_cents",
            ],
        )

    return events.groupBy("user_id", "day").applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def chunk_owner_election(chunks: DataFrame) -> DataFrame:
    """Per-chunk-hash owner election — the ingest-time half of
    ``plans/retrieval.cdc_chunk_dedup``: as CDC chunk occurrences stream
    in, each hash's state carries (owner = first doc seen, last doc,
    distinct-doc count, occurrence count). Under the twins' arrival
    contract (batches hold ascending doc_id ranges; rows sorted by doc_id
    within each batch), first-seen == min(doc_id), and the distinct-doc
    count is exact via run-length on the nondecreasing doc stream — so
    state stays FOUR bigint-ish fields per hash at any corpus size, never
    a doc set. Emission is cumulative: each batch a hash appears in emits
    its current row; n_occurrences strictly increases, so the final row
    per hash is the max-n_occurrences one (the twin filters post-sink).

    Input rows: (chunk_md5 string, doc_id long), one per occurrence.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField("chunk_md5", StringType()),
            StructField("owner_doc", LongType()),
            StructField("n_docs", LongType()),
            StructField("n_occurrences", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("owner", LongType()),
            StructField("last_doc", LongType()),
            StructField("n_docs", LongType()),
            StructField("n_occ", LongType()),
        ]
    )

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        owner, last_doc, n_docs, n_occ = (
            state.get if state.exists else (None, None, 0, 0)
        )
        pdf = _sorted_concat(pdfs, ["doc_id"])
        for d in pdf["doc_id"]:
            d = int(d)
            if owner is None:
                owner = d
            if last_doc is None or d != last_doc:
                n_docs += 1
                last_doc = d
            n_occ += 1
        state.update((owner, last_doc, n_docs, n_occ))
        yield pd.DataFrame(
            {
                "chunk_md5": [key_tuple[0]],
                "owner_doc": pd.array([owner], dtype="int64"),
                "n_docs": pd.array([n_docs], dtype="int64"),
                "n_occurrences": pd.array([n_occ], dtype="int64"),
            }
        )

    return chunks.groupBy("chunk_md5").applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def vocab_first_seen(toks: DataFrame) -> DataFrame:
    """Per-token first-appearance election — the ingest-time half of
    ``plans/corpus_ops.vocab_growth_curve``: as (token, band) rows stream
    in band order, each token's state carries only the band it was first
    seen in (ONE long per type at any corpus size — the canonical
    incremental corpus statistic). Under the twins' arrival contract
    (batches hold ascending band slices), first-seen == min(band), so the
    state never updates after it is set. Emission is cumulative: each
    batch a token appears in re-emits its (token, first_band) row; the
    twin de-duplicates post-sink (the row is constant once set).

    Input rows: (tok string, band int), distinct per batch.
    """
    from pyspark.sql.types import IntegerType

    schema = StructType(
        [
            StructField("tok", StringType()),
            StructField("first_band", IntegerType()),
        ]
    )
    state_schema = StructType([StructField("first_band", IntegerType())])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        if state.exists:
            (first_band,) = state.get
        else:
            first_band = None
        pdf = _sorted_concat(pdfs, ["band"])
        if len(pdf) and first_band is None:
            first_band = int(pdf["band"].iloc[0])
            state.update((first_band,))
        yield pd.DataFrame(
            {
                "tok": [key_tuple[0]],
                "first_band": pd.array([first_band], dtype="int32"),
            }
        )

    return toks.groupBy("tok").applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def frontier_epoch_assign(urls: DataFrame, rate: int) -> DataFrame:
    """Per-host politeness-epoch assignment — the ingest-time half of
    ``plans/corpus_ops.crawl_frontier_plan``: as a host's URLs stream in
    priority order, the keyed state carries only how many the host has
    already scheduled (ONE long per host at any frontier size); each
    arrival takes epoch = count div rate. Under the twins' arrival
    contract (batches hold ascending per-host rank slices; rows sorted
    by rank within each batch), the assignment equals the batch rank
    formula exactly. Emission is append-per-row: every URL emits once,
    in its arrival batch, with its assigned epoch.

    Input rows: (host string, doc_id long, n_chars long, rank int).
    """
    from pyspark.sql.types import IntegerType, LongType

    schema = StructType(
        [
            StructField("host", StringType()),
            StructField("doc_id", LongType()),
            StructField("n_chars", LongType()),
            StructField("fetch_epoch", IntegerType()),
        ]
    )
    state_schema = StructType([StructField("n_seen", LongType())])

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        (n_seen,) = state.get if state.exists else (0,)
        pdf = _sorted_concat(pdfs, ["rank"])
        epochs = []
        for _ in range(len(pdf)):
            epochs.append(int(n_seen) // rate)
            n_seen += 1
        state.update((n_seen,))
        yield pd.DataFrame(
            {
                "host": [key_tuple[0]] * len(pdf),
                # nullable Int64: the NULL fixture carries NULL doc_id /
                # n_chars rows, which schedule like any URL (the batch
                # rank does not skip them) but must stay NULL in output
                "doc_id": pd.array(pdf["doc_id"], dtype="Int64"),
                "n_chars": pd.array(pdf["n_chars"], dtype="Int64"),
                "fetch_epoch": pd.array(epochs, dtype="int32"),
            }
        )

    return urls.groupBy("host").applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def sft_gate_fold(turns: DataFrame) -> DataFrame:
    """Per-(user, day) conversation-structure fold — the keyed-state
    streaming twin of ``plans/sft_ops.sft_turn_structure_audit``: as
    turns stream in, each conversation's state carries SIX small ints
    (n_turns, n_user, n_assistant, violations, first-role code,
    last-role code; role codes 1=user 2=assistant, 0=unset) and every
    batch emits the key's cumulative structure row with the gate
    decision recomputed from the cumulative counters.

    Input rows carry (user_id, day, ts_micro, ord_eid, role) with
    ord_eid = coalesce(event_id, -1) — the batch operator's
    (ts, event_id) total order (Spark windows sort NULL event_id first;
    -1 sorts below every real id). Cross-batch alternation is exact
    because the state keeps the previous batch's LAST role: a violation
    spanning a batch boundary counts exactly once.

    Contract: slices arrive in non-decreasing per-key ts order across
    micro-batches (the hour-banded feeder). n_turns strictly increases
    per emission, so the final row per key is the one with max n_turns.
    State is O(1) per open conversation; production adds an event-time
    timeout to retire closed days.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("day", StringType()),
            StructField("n_turns", LongType()),
            StructField("n_user_turns", LongType()),
            StructField("n_assistant_turns", LongType()),
            StructField("alternation_violations", LongType()),
            StructField("starts_user", LongType()),
            StructField("ends_assistant", LongType()),
            StructField("decision", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("nu", LongType()),
            StructField("na", LongType()),
            StructField("viol", LongType()),
            StructField("first_r", LongType()),
            StructField("last_r", LongType()),
        ]
    )
    # gate constants mirrored from the batch operator
    from realtimedatawarehouse_self_spark.plans.sft_ops import MIN_TURNS

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        n, nu, na, viol, first_r, last_r = (
            state.get if state.exists else (0, 0, 0, 0, 0, 0)
        )
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts_micro", "ord_eid"])
        for role in pdf["role"]:
            code = 1 if role == "user" else 2
            if last_r != 0 and code == last_r:
                viol += 1
            if n == 0:
                first_r = code
            n += 1
            nu += code == 1
            na += code == 2
            last_r = code
        state.update((n, nu, na, viol, first_r, last_r))
        keep = (
            first_r == 1
            and last_r == 2
            and viol == 0
            and n >= MIN_TURNS
        )
        yield pd.DataFrame(
            [
                (
                    key_tuple[0],
                    key_tuple[1],
                    n,
                    nu,
                    na,
                    viol,
                    1 if first_r == 1 else 0,
                    1 if last_r == 2 else 0,
                    "keep" if keep else "drop",
                )
            ],
            columns=[
                "user_id",
                "day",
                "n_turns",
                "n_user_turns",
                "n_assistant_turns",
                "alternation_violations",
                "starts_user",
                "ends_assistant",
                "decision",
            ],
        )

    return turns.groupBy("user_id", "day").applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )


def watermark_pooled_counters(docs: DataFrame) -> DataFrame:
    """Per-source pooled greenlist counters — the keyed-state streaming
    twin of ``plans/corpus_ops.synthetic_watermark_detect``'s rollup: as
    each source's documents stream in, the state carries THREE longs
    (docs, scored transitions, green transitions — O(1) per source at
    any corpus size) and every batch emits the source's cumulative row.
    The final emission must equal the one-shot batch GROUP BY exactly —
    the mergeability of the pooled z statistic is the point (Kirchenbauer
    detection over a stream of arriving model output).

    Input rows: (source string, scored long, green long) — one per doc.
    """
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField("source", StringType()),
            StructField("n_docs", LongType()),
            StructField("scored", LongType()),
            StructField("green", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_docs", LongType()),
            StructField("scored", LongType()),
            StructField("green", LongType()),
        ]
    )

    def fn(key_tuple, pdfs, state) -> Iterator[pd.DataFrame]:
        n_docs, scored, green = (
            state.get if state.exists else (0, 0, 0)
        )
        for pdf in pdfs:
            n_docs += len(pdf)
            scored += int(pdf["scored"].sum())
            green += int(pdf["green"].sum())
        state.update((n_docs, scored, green))
        yield pd.DataFrame(
            {
                "source": [key_tuple[0]],
                "n_docs": [n_docs],
                "scored": [scored],
                "green": [green],
            }
        )

    return docs.groupBy("source").applyInPandasWithState(
        fn, schema, state_schema, "append", "NoTimeout"
    )
