"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in windowed aggregations (streaming/pipeline.py) cover the
reference's bar derivation; this module is the escape hatch for state
machines Spark's aggregates can't express — running per-key totals that
must emit on every update, price-alert latching, cross-batch dedup.

State model: one pandas-friendly tuple per key, updated per micro-batch,
emitted in ``update`` mode. State is bounded by key cardinality (use
timeouts for unbounded key spaces: ``GroupStateTimeout
.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``).

Scale: state lives in the state store partitioned by the group key —
the same hash shuffle as a batch groupBy; each micro-batch touches only
keys present in that batch plus timed-out keys.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum, max) maintained across micro-batches
    and re-emitted on every update — the stateful form of
    ``groupBy(key).agg(...)`` for when downstream needs the running value
    continuously, not one final row.

    The reference has no stateful processing at all (its 5-minute cadence
    is scheduler cron, SURVEY.md §2g); this is the extension-mandate
    stateful operator, tested for exact agreement with the batch
    aggregate in tests/test_ingest_streaming.py.
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            n, s, mx = state.get
        else:
            n, s, mx = 0, 0.0, float("-inf")
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            s += float(pdf[value_col].sum())
            mx = max(mx, float(pdf[value_col].max()))
        state.update((n, s, mx))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [mx],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long, "
        "sum_value double, max_value double",
        stateStructType="n long, s double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def threshold_alerts(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    threshold: float = 99.0,
) -> DataFrame:
    """Latched threshold alerts: emit ONE row the first time a key's
    value crosses the threshold, never again (state = latched flag).
    The price-alert shape the reference's dashboard KPI tiles imply —
    inexpressible as a windowed aggregate because emission depends on
    prior emission."""

    def update(key, pdfs, state: GroupState):
        latched = state.get[0] if state.exists else False
        if latched:
            return
        for pdf in pdfs:
            hits = pdf[pdf[value_col] >= threshold]
            if len(hits):
                state.update((True,))
                first = hits.iloc[0]
                yield pd.DataFrame(
                    {
                        key_col: [key[0]],
                        "first_alert_value": [float(first[value_col])],
                    }
                )
                return

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, first_alert_value double",
        stateStructType="latched boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def shard_packer_update(shard_tokens: int, key_col: str = "source"):
    """The shard-packer state machine (open shard id, tokens filled),
    as the applyInPandasWithState update callable — module-level so
    tests can replay it under fuzzed micro-batch slicings."""

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        shard, filled = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("doc_id")
            n_tok = pdf["n_tokens"].to_numpy()
            shards = []
            for n in n_tok:
                if filled > 0 and filled + int(n) > shard_tokens:
                    shard += 1
                    filled = 0
                shards.append(shard)
                filled += int(n)
            yield pd.DataFrame(
                {
                    key_col: key[0],
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_tokens": n_tok,
                    "shard_id": shards,
                }
            )
        state.update((int(shard), int(filled)))

    return update


def shard_packer(
    docs: DataFrame,
    shard_tokens: int = 2048,
    key_col: str = "source",
) -> DataFrame:
    """Incremental token-budget shard packing — the streaming twin of
    the batch ``pp1_token_shard_packing`` operator: as documents arrive,
    each ``key_col`` group fills its current shard until the next doc
    would exceed the budget, then rolls to a new shard (greedy
    first-fit-in-order; a doc larger than the budget gets a shard of its
    own). State per key is two integers (open shard id, tokens already
    in it), so the state store stays O(#sources) forever.

    Docs are processed in doc_id order within every micro-batch; across
    batches the arrival order is the stream order — the same contract a
    real ingest-and-pack job has. Exact agreement with a driver-side
    greedy replay is asserted in tests/test_ingest_streaming.py; the
    update fn itself is module-level (:func:`shard_packer_update`) so
    the slicing fuzz can drive the IDENTICAL state machine directly.
    """

    return docs.groupBy(key_col).applyInPandasWithState(
        shard_packer_update(shard_tokens, key_col),
        outputStructType=(
            f"{key_col} string, doc_id long, n_tokens long, shard_id long"
        ),
        stateStructType="shard long, filled long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_snapshot(
    events: DataFrame,
) -> DataFrame:
    """Streaming twin of the batch cdc1_latest_snapshot operator
    (operators/cdc.py): maintain the latest (value, ts) per
    (user_id, event_type) across micro-batches with the SAME
    deterministic (ts, event_id) tie-break, re-emitting a key's
    snapshot row whenever it changes — a continuously-maintained SCD-1
    table, i.e. MERGE-on-read without the merge.

    State per key is one fixed-width tuple (epoch-nanos, event_id,
    value, n_versions) — O(#live keys) total, the same cardinality the
    batch aggregate shuffles. Equality with the batch operator after an
    AvailableNow replay is asserted in tests/test_ingest_streaming.py."""

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            ts_ns, ev_id, val, n = state.get
        else:
            ts_ns, ev_id, val, n = -1, -1, 0.0, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            nanos = pdf["ts"].astype("int64")
            for m, e, v in zip(nanos, pdf["event_id"], pdf["value"]):
                if (m, e) > (ts_ns, ev_id):
                    ts_ns, ev_id, val = int(m), int(e), float(v)
        state.update((ts_ns, ev_id, val, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "last_ts": [pd.Timestamp(ts_ns)],  # int -> ns
                "last_value": [val],
                "n_versions": [n],
            }
        )

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        update,
        outputStructType="user_id long, event_type string, "
        "last_ts timestamp_ntz, last_value double, n_versions long",
        stateStructType="ts_ns long, ev_id long, val double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_stream(
    tokens: DataFrame,
    k: int = 32,
    n_groups: int = 8,
    token_col: str = "w",
) -> DataFrame:
    """Streaming frequent-items sketch — the stateful twin of the batch
    ``tx12_heavy_hitters`` candidate pass: tokens hash-partition into
    ``n_groups`` groups, each group's state is a k-counter Misra-Gries
    sketch fed incrementally across micro-batches, and every batch
    re-emits the group's current candidate set (update mode). Because
    a token always hashes to the same group, any item holding >= 1/k of
    the TOTAL stream mass is heavy within its own group's substream and
    survives that sketch — the union of group candidates is a superset
    of the true heavy hitters at every point in the stream, ready for
    the batch recount to exactify.

    State is O(k) per group FOREVER — n_groups*k counters total no
    matter how many distinct tokens flow past; contrast a streaming
    groupBy(token) count whose state grows with the vocabulary. That
    bounded-state property is the whole reason a 100 TB/day token
    stream can afford a continuously-maintained candidate set."""
    from etl_project_spark.operators.text import misra_gries_kernel

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            words, counts = state.get
            counters = dict(zip(list(words), [int(c) for c in counts]))
        else:
            counters = {}

        # continue the sketch: preload the stored counters, then feed
        # the new tokens through the SAME eviction rule as the batch
        # operator (shared kernel)
        merged = misra_gries_kernel(
            (w for pdf in pdfs for w in pdf[token_col]), k, counters
        )
        state.update((list(merged), [merged[w] for w in merged]))
        yield pd.DataFrame(
            {
                "grp": [int(key[0])] * len(merged),
                "w": list(merged),
                "est_count": [merged[w] for w in merged],
            }
        )

    return tokens.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType="grp int, w string, est_count long",
        stateStructType="words array<string>, counts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dsir_vocab_stream(
    tokens: DataFrame,
    target: str,
    source_col: str = "source",
    token_col: str = "w",
) -> DataFrame:
    """Running-vocabulary DSIR state — the streaming twin of the batch
    ``pp7_dsir_weights`` model build (SURVEY §12.6's last open
    batch/streaming parity item): as (source, token) rows arrive, each
    token's state is the pair of counters the DSIR vocabulary needs —
    ``cr`` (occurrences in the raw stream) and ``ct`` (occurrences in
    the target domain) — maintained across micro-batches and re-emitted
    on update. The latest emission per token IS the vocabulary
    relation; ``operators.pipeline.dsir_score_tokens`` over that
    snapshot produces importance weights, and after an AvailableNow
    replay of the full corpus they equal the batch pp7 weights exactly
    (same scoring code path, same vocabulary — asserted in
    tests/test_ingest_streaming.py).

    State is two integers per DISTINCT token forever — vocabulary-
    bounded, not corpus-bounded, exactly the state the batch aggregate
    shuffles; with the paper's hashed n-gram features the key space is
    a fixed bucket count and the state store size is a constant. This
    is the model-maintenance half; scoring stays a batch (or
    foreachBatch) join against the current snapshot, the
    bucket_counts_stream recipe."""

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        cr, ct = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cr += len(pdf)
            ct += int((pdf[source_col] == target).sum())
        state.update((cr, ct))
        yield pd.DataFrame(
            {token_col: [key[0]], "cr": [cr], "ct": [ct]}
        )

    return tokens.groupBy(token_col).applyInPandasWithState(
        update,
        outputStructType=f"{token_col} string, cr long, ct long",
        stateStructType="cr long, ct long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bucket_counts_stream(
    values: DataFrame,
    mn: float,
    width: float,
    n_buckets: int = 10,
    value_col: str = "value",
) -> DataFrame:
    """Streaming histogram state for drift monitoring — the stateful
    half of the batch ``dq3_psi_drift``: values bucket against a FIXED
    reference grid (mn/width fitted on the reference window, exactly
    dq3's clamp rule) and each bucket's running count is maintained
    across micro-batches and re-emitted on update. State is one
    integer per bucket FOREVER (n_buckets counters total), so a
    never-ending monitored stream costs O(buckets) memory; a trivial
    batch query over the latest emitted snapshot joins the reference
    shares and computes the PSI terms (tested equal to dq3's n_cur
    column after replaying the same window in
    tests/test_ingest_streaming.py)."""
    from pyspark.sql import functions as F

    b = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(mn)) / F.lit(width)).cast(
                "long"
            ),
            F.lit(0).cast("long"),
        ),
        F.lit(n_buckets - 1).cast("long"),
    )
    bucketed = values.select(b.alias("bucket"))

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"bucket": [int(key[0])], "n_cur": [n]})

    return bucketed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType="bucket long, n_cur long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rolling_zscore_stream(
    events: DataFrame,
    lookback: int = 20,
    z_threshold: float = 2.5,
) -> DataFrame:
    """Streaming twin of batch ts7_rolling_zscore: per-user trailing
    {lookback}-event mean/std, emit events beyond z_threshold sigma.
    State per user is the trailing value ring (<= lookback doubles) —
    bounded regardless of stream length. Rows are ordered by
    (ts, event_id) WITHIN each micro-batch before the state walk, so a
    time-ordered file replay reproduces the batch operator exactly
    (verified in tests/test_ingest_streaming.py); mid-batch late data
    needs an upstream watermark + sort, the standard caveat for any
    order-sensitive stateful op.

    Parity with batch: mean/var derive from the same s/s² formulas as
    ts7 (per-frame Python sums instead of window sums — equal at 6dp
    rounding); the anomaly predicate uses the unrounded chain.
    """

    def update(key, pdfs, state: GroupState):
        vals = list(state.get[0]) if state.exists else []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((vals,))
            return
        batch = pd.concat(frames).sort_values(["ts", "event_id"])
        out = []
        for _, row in batch.iterrows():
            v = float(row["value"])
            if len(vals) == lookback:
                s = sum(vals)
                s2 = sum(x * x for x in vals)
                n = float(lookback)
                mean = s / n
                var = max((s2 - s * s / n) / (n - 1), 1e-12)
                std = var**0.5
                z = (v - mean) / std
                if abs(z) > z_threshold:
                    out.append(
                        {
                            "user_id": int(key[0]),
                            "event_id": int(row["event_id"]),
                            "value": v,
                            "roll_mean": round(mean, 6),
                            "roll_std": round(std, 6),
                            "zscore": round(z, 6),
                        }
                    )
            vals.append(v)
            if len(vals) > lookback:
                vals.pop(0)
        state.update((vals,))
        if out:
            yield pd.DataFrame(out)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, event_id long, value double, "
            "roll_mean double, roll_std double, zscore double"
        ),
        stateStructType="vals array<double>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def type_mix_stream(
    events: DataFrame,
    split: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming categorical-mix state — the stateful half of the batch
    ``dq7_categorical_drift``: each event classifies against the FIXED
    reference/current time split and its type's two running counters
    are maintained across micro-batches and re-emitted on update.
    State is TWO integers per category forever, so a never-ending
    monitored stream costs O(types) memory; a trivial batch query over
    the latest snapshot computes the share deltas and chi-square terms
    (replay-tested equal to dq7's n_ref/n_cur columns in
    tests/test_ingest_streaming.py)."""
    from pyspark.sql import functions as F

    w = (
        F.when(
            F.col(ts_col) < F.lit(split).cast("timestamp"), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("win")
    )
    classified = events.select(F.col(type_col).alias("event_type"), w)

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n_ref, n_cur = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cur = int((pdf["win"] == 1).sum())
            n_cur += cur
            n_ref += len(pdf) - cur
        state.update((n_ref, n_cur))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_ref": [n_ref],
                "n_cur": [n_cur],
            }
        )

    return classified.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType="event_type string, n_ref long, n_cur long",
        stateStructType="n_ref long, n_cur long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def copurchase_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Per-order pair-emission state machine: pairs(S ∪ N) − pairs(S)
    walked item-at-a-time over the seen-item set — module-level so
    tests can replay it under fuzzed micro-batch slicings."""
    seen = set(state.get[0]) if state.exists else set()
    pa, pb = [], []
    for pdf in pdfs:
        for it in pdf["l_partkey"]:
            it = int(it)
            if it in seen:
                continue
            for b in seen:
                pa.append(min(it, b))
                pb.append(max(it, b))
            seen.add(it)
    state.update((sorted(seen),))
    if pa:
        yield pd.DataFrame(
            {
                "okey": int(key[0]),
                "part_a": pa,
                "part_b": pb,
            }
        )


def copurchase_pairs_stream(lineitem: DataFrame) -> DataFrame:
    """Streaming twin of batch ``an8_copurchase_pairs``' pair-count
    core: per-order state is the item set seen so far, and each
    arriving line item emits exactly the NEW unordered pairs it forms
    with the items already in its order — so an order split across
    micro-batches still yields each pair exactly once (pairs(S ∪ N) −
    pairs(S), walked item-at-a-time). A trivial batch count over the
    emitted (part_a, part_b) rows reproduces an8's n_pair column
    (replay-pinned in tests/test_ingest_streaming.py, including a
    slicing that deliberately splits orders across batches).

    State per order is its item set — bounded by basket size, never
    corpus-sized; a production deployment adds a processing-time
    timeout to evict orders once their basket is complete (the
    at-most-basket-sized analog of rolling_zscore_stream's ring).
    Support/confidence/lift stay batch-side: they need the global
    order count, which any scheduled batch query over the emitted
    sink computes (the a8 HLL-rollup pattern). The update fn is
    module-level (:func:`copurchase_update`) so the slicing fuzz can
    drive the identical state machine directly."""

    return lineitem.select("l_orderkey", "l_partkey").groupBy(
        "l_orderkey"
    ).applyInPandasWithState(
        copurchase_update,
        outputStructType="okey long, part_a long, part_b long",
        stateStructType="items array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


AN9_WINDOW_US = 7 * 86_400_000_000  # an9's 7-day lookback, microseconds


def attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of batch ``an9_attribution``: per-user state is
    the single most recent click/view (id, epoch-us, type); every
    purchase emits one attribution row against that state — credited
    if the touch is within the 7-day lookback, NULL columns otherwise.
    Rows are sorted by (ts, event_id) within each micro-batch before
    the state walk, so a time-ordered file replay reproduces the batch
    window frame exactly (UNBOUNDED PRECEDING..1 PRECEDING: the walk
    reads state BEFORE applying the current row, and a same-timestamp
    touch with a lower event_id is applied first by the sort) —
    replay-pinned in tests/test_ingest_streaming.py.

    State per user is ONE touch tuple — O(users), the smallest state
    of any twin here; production adds an event-time timeout at the
    lookback horizon to evict idle users (state older than 7 days can
    never attribute again). Gap math is exact integer microseconds
    floor-divided to seconds — bit-equal to batch an9. The update fn
    is module-level (:func:`attribution_update`) so the slicing fuzz
    can drive the identical state machine directly."""

    return events.groupBy("user_id").applyInPandasWithState(
        attribution_update,
        outputStructType=(
            "conv_event_id long, user_id long, revenue double, "
            "touch_event_id long, touch_type string, gap_sec long"
        ),
        stateStructType="t_id long, t_ts_us long, t_type string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def attribution_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Last-touch attribution state machine (see
    :func:`attribution_stream`) — module-level for the slicing fuzz."""
    touch = tuple(state.get) if state.exists else None
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        if touch is not None:
            state.update(touch)
        return
    batch = pd.concat(frames).sort_values(["ts", "event_id"])
    out = []
    for _, row in batch.iterrows():
        et = row["event_type"]
        ts_us = int(pd.Timestamp(row["ts"]).value // 1000)
        if et == "purchase":
            rec = {
                "conv_event_id": int(row["event_id"]),
                "user_id": int(key[0]),
                "revenue": float(row["value"]),
                "touch_event_id": None,
                "touch_type": None,
                "gap_sec": None,
            }
            if touch is not None:
                gap_us = ts_us - touch[1]
                if gap_us <= AN9_WINDOW_US:
                    rec["touch_event_id"] = touch[0]
                    rec["touch_type"] = touch[2]
                    rec["gap_sec"] = gap_us // 1_000_000
            out.append(rec)
        elif et in ("click", "view"):
            touch = (int(row["event_id"]), ts_us, et)
    if touch is not None:
        state.update(touch)
    if out:
        yield pd.DataFrame(out).astype(
            {
                "touch_event_id": "Int64",
                "gap_sec": "Int64",
            }
        )


TS8_ALPHA = 0.5  # ts8's dyadic smoothing constant (exact halvings)


def ewma_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of batch ``ts8_ewma_forecast``: the recursive
    EWMA fold as O(1) per-user state — (level, n_obs) — updated one
    event at a time and emitted once per micro-batch. Because the
    filter is associative over a time-ordered replay (each step
    depends only on the running level), the final emission per user
    is bit-identical to the batch fold before rounding — the row with
    the max n_obs per user reproduces ts8 exactly (replay-pinned in
    tests/test_ingest_streaming.py). Rows are sorted by (ts, event_id)
    within each micro-batch; this is the smallest-state twin alongside
    attribution_stream's one-touch tuple."""

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        level, n = (state.get[0], state.get[1]) if state.exists else (None, 0)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            if n:
                state.update((level, n))
            return
        batch = pd.concat(frames).sort_values(["ts", "event_id"])
        for v in batch["value"]:
            if pd.isna(v):
                continue
            v = float(v)
            level = v if level is None else (
                TS8_ALPHA * v + (1 - TS8_ALPHA) * level
            )
            n += 1
        if n == 0:
            return
        state.update((level, n))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_obs": [n],
                "ewma_level": [round(level, 6)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_obs long, ewma_level double",
        stateStructType="level double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _holt_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """holt_stream's kernel, module-level so the 1M-updates-per-key
    state-bound smoke (tests/test_scale_smoke.py) can drive it without
    the streaming harness."""
    if state.exists:
        level, trend, n = state.get[0], state.get[1], state.get[2]
    else:
        level, trend, n = None, 0.0, 0
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        if n:
            state.update((level, trend, n))
        return
    batch = pd.concat(frames).sort_values(["ts", "event_id"])
    for v in batch["value"]:
        if pd.isna(v):
            continue
        v = float(v)
        if level is None:
            level, trend = v, 0.0
        else:
            new_level = 0.5 * v + 0.5 * (level + trend)
            trend = 0.5 * (new_level - level) + 0.5 * trend
            level = new_level
        n += 1
    if n == 0:
        return
    state.update((level, trend, n))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_obs": [n],
            "holt_level": [round(level, 6)],
            "holt_trend": [round(trend, 6)],
            "forecast_1": [round(level + trend, 6)],
        }
    )


def holt_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of batch ``ts9_holt_forecast``: Holt's double
    exponential smoothing as O(1) per-user state — (level, trend,
    n_obs) — updated one event at a time. Same associative-over-replay
    argument as ewma_stream, with the two-component state standing in
    for the batch fold's 2-element array accumulator; the update uses
    the IDENTICAL arithmetic (a = b = 0.5, level' computed first and
    reused) so the final per-user emission is bit-identical to the
    batch fold before rounding (replay-pinned in
    tests/test_ingest_streaming.py)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _holt_update,
        outputStructType=(
            "user_id long, n_obs long, holt_level double, "
            "holt_trend double, forecast_1 double"
        ),
        stateStructType="level double, trend double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _hll_register_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """hll_register_stream's kernel (module-level for the scale smoke):
    per-bucket state is the single running max rho."""
    best = state.get[0] if state.exists else 0
    seen = False
    for pdf in pdfs:
        if len(pdf):
            seen = True
            m = int(pdf["rho"].max())
            if m > best:
                best = m
    if not seen:
        if best:
            state.update((best,))
        return
    state.update((best,))
    yield pd.DataFrame({"bucket": [int(key[0])], "rho": [best]})


def _cms_cell_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """cms_cell_stream's kernel (module-level for the scale smoke):
    per-cell state is one running counter."""
    c = state.get[0] if state.exists else 0
    add = 0
    for pdf in pdfs:
        add += len(pdf)
    if add == 0:
        if c:
            state.update((c,))
        return
    c += add
    state.update((c,))
    yield pd.DataFrame(
        {"row_": [int(key[0])], "col_": [int(key[1])], "c": [c]}
    )


def hll_register_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of a12's HLL register build: per-BUCKET state is
    the single running max rho (1024 groups, one integer each — the
    smallest aggregate state family alongside type_mix_stream).
    Registers only ever grow, so the max-n emission per bucket equals
    the batch register relation exactly and the estimate computed from
    it replays a12 (replay-pinned in tests/test_ingest_streaming.py).
    The md5 hash/bucket/rho rule is imported from the batch operator
    so the two sides can never drift."""
    from pyspark.sql import functions as F

    from etl_project_spark.operators.sketches import HLL_WBITS, _h32

    h = _h32(F.col("user_id").cast("string"))
    w = h % (1 << HLL_WBITS)
    rho = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    reg = events.select(
        (h / (1 << HLL_WBITS)).cast("long").alias("bucket"),
        rho.cast("int").alias("rho"),
    )
    return reg.groupBy("bucket").applyInPandasWithState(
        _hll_register_update,
        outputStructType="bucket long, rho int",
        stateStructType="rho int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_cell_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of a13's Count-Min sketch build: per-CELL state
    is one running counter ({CM_D}×{CM_W} groups). Counters only grow;
    the max-c emission per (row_, col_) equals the batch cell relation
    exactly, so point estimates served from the streamed sketch match
    a13 (replay-pinned in tests/test_ingest_streaming.py)."""
    from pyspark.sql import functions as F

    from etl_project_spark.operators.sketches import CM_D, CM_W, _h32

    rows = F.explode(F.array(*[F.lit(i) for i in range(CM_D)])).alias(
        "row_"
    )
    coords = events.select(F.col("user_id"), rows).select(
        "row_",
        (
            _h32(
                F.concat(
                    F.col("row_").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            )
            % CM_W
        ).alias("col_"),
    )

    return coords.groupBy("row_", "col_").applyInPandasWithState(
        _cms_cell_update,
        outputStructType="row_ int, col_ long, c long",
        stateStructType="c long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hourly_quantized_stream(events: DataFrame) -> DataFrame:
    """Streaming hourly state for seasonal decomposition — the
    incrementally-maintainable half of batch ts10: per calendar hour,
    the running (Σ floor(value*1e6 + 0.5), count) pair is updated
    across micro-batches and re-emitted on update. Integer sums are
    associative, so ANY slicing of the stream into micro-batches
    replays to the exact batch hourly relation (the same quantization
    that makes ts10 engine-portable makes its state order-free); the
    decomposition tail (centered MA + seasonal index) is a bounded
    batch query over the latest snapshot — the classic lambda split,
    with state O(calendar hours) forever (24 keys/day; use a
    watermark-style eviction for multi-decade streams)."""
    from etl_project_spark.operators.timeseries import TS10_Q

    from pyspark.sql import functions as F

    vq = F.floor(F.col("value") * TS10_Q + F.lit(0.5)).cast("long")
    hb = (
        events.filter(F.col("value").isNotNull())
        .select(F.date_trunc("hour", "ts").alias("h"), vq.alias("vq"))
    )

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        sq, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            sq += int(pdf["vq"].sum())
            n += len(pdf)
        state.update((sq, n))
        yield pd.DataFrame(
            {"h": [key[0]], "sq": [sq], "n_events": [n]}
        )

    return hb.groupBy("h").applyInPandasWithState(
        update,
        outputStructType="h timestamp, sq long, n_events long",
        stateStructType="sq long, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def scd2_update(
    key: tuple,
    pdfs: "Iterable[pd.DataFrame]",
    state: "GroupState",
) -> "Iterable[pd.DataFrame]":
    """Update fn for :func:`scd2_history_stream` (module-level so the
    differential fuzzer can drive it through drawn slicings). State is
    the key's FULL version spine — (ts_ns, event_id, value) sorted by
    (ts, event_id), the same total order batch cdc2 windows over. Each
    micro-batch inserts its events into the spine and emits a
    CHANGELOG of exactly the version rows whose interval changed: the
    inserted versions plus each insertion point's predecessor (its
    valid_to moves to the new row's valid_from; if it was the open row
    it also flips is_current). Late/out-of-order arrivals therefore
    retro-correct the history — the case cdc5's batch watermark
    contract excludes by design is handled here, at the price of
    O(versions-per-key) state (production seals closed history past a
    watermark and evicts it from state)."""
    import bisect

    if state.exists:
        ts_l, ev_l, val_l = state.get
        vers = list(zip(ts_l, ev_l, val_l))
    else:
        vers = []
    new_items: list[tuple] = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        nanos = pdf["ts"].astype("int64")
        new_items.extend(
            (int(t), int(e), float(v))
            for t, e, v in zip(nanos, pdf["event_id"], pdf["value"])
        )
    for item in sorted(new_items):
        bisect.insort(vers, item)
    state.update((
        [t for t, _, _ in vers],
        [e for _, e, _ in vers],
        [v for _, _, v in vers],
    ))
    if not new_items:
        return
    ids = [(t, e) for t, e, _ in vers]
    changed = {(t, e) for t, e, _ in new_items}
    for t, e, _ in new_items:
        i = bisect.bisect_left(ids, (t, e))
        if i > 0:
            changed.add(ids[i - 1])
    rows = []
    for t, e in sorted(changed):
        i = bisect.bisect_left(ids, (t, e))
        nxt = vers[i + 1][0] if i + 1 < len(vers) else None
        rows.append(
            {
                "user_id": key[0],
                "event_type": key[1],
                "event_id": e,
                "value": vers[i][2],
                "valid_from": pd.Timestamp(t),
                "valid_to": pd.Timestamp(nxt) if nxt is not None else pd.NaT,
                "is_current": i + 1 == len(vers),
            }
        )
    yield pd.DataFrame(rows)


def scd2_history_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch SCD2 operators (cdc2 full history /
    cdc5 incremental merge): a continuously-maintained version table.
    Applying the emitted changelog — last emission per version identity
    (key, valid_from, event_id) wins — reproduces cdc2's batch rebuild
    ROW-FOR-ROW under ANY micro-batch slicing, including out-of-order
    arrival (asserted by the engine-level replay in
    tests/test_ingest_streaming.py and the drawn-slicing fuzz grammar
    in tests/test_differential_fuzz.py). Per batch each affected key
    emits only its changed version rows: O(batch + touched
    predecessors) output, never the closed history — the streaming
    form of cdc5's touch-only-open-rows economics."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        scd2_update,
        outputStructType=(
            "user_id long, event_type string, event_id long, "
            "value double, valid_from timestamp_ntz, "
            "valid_to timestamp_ntz, is_current boolean"
        ),
        stateStructType=(
            "ts_ns array<long>, ev array<long>, val array<double>"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
