"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2h; north-star "custom stateful operators").

`first_seen_filter` is streaming exact-dedup: emit a key's rows only
the first time the key is seen, remembering seen-ness in the state
store. This is the streaming face of the ledger's skip-if-done and of
D3 insert-ignore — and the shape of an LLM-pipeline streaming dedup
(suppress documents whose fingerprint has already passed).

State design for scale: the state per key is a single boolean-ish
record (fixed size); keys shard across `spark.sql.shuffle.partitions`
state-store partitions; a processing-time timeout can expire keys if
the key universe is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_filter(
    stream: DataFrame,
    key_cols: list[str],
    output_schema: str | None = None,
    ttl_ms: int | None = None,
    timeout_eviction: bool = True,
) -> DataFrame:
    """Keep only the first-ever batch of rows per key (exact streaming
    dedup). Within the first batch a key appears in, all its rows pass
    (downstream batch dedup can pick a winner); afterwards the key is
    suppressed until its state expires.

    `ttl_ms` gives sliding-TTL cache semantics for an UNBOUNDED key
    universe (crawl-scale fingerprints): each sighting — admitted or
    suppressed — renews the window, a key idle past `ttl_ms` is
    re-admitted on its next sighting, and hot keys stay deduped
    forever. Re-admission is decided by an ARRIVAL-TIME check against
    the last-sighting stamp kept in state — not by whether a timeout
    callback happened to fire first — so the semantics hold even when
    the re-sighting arrives in the first batch to run after a long
    gap (the daily-cron shape, where no intervening batch existed to
    deliver the eviction callback). None keeps the exact
    remember-forever behavior — correct only when the key universe
    fits the state store.

    `timeout_eviction` (default True) additionally registers a
    processing-time timeout per sighting so idle keys are EVICTED
    from the state store — the state-size bound the TTL exists for.
    Requires a long-running trigger: under ProcessingTimeTimeout the
    stateful operator always reports another batch may be needed, so
    Trigger.AvailableNow never terminates. For the cron/AvailableNow
    ingest shape pass timeout_eviction=False: NoTimeout (terminates),
    TTL re-admission still exact via the arrival-time check, state
    then grows with distinct keys between manual store resets.

    STATE-SCHEMA BREAK (r13→r14 upgrade note, ADVICE r13): the TTL
    feature widened the per-key state from `seen int` to `seen int,
    last_ms long`. Spark's state store pins the state schema at
    checkpoint creation — a stream RESUMING from a pre-TTL checkpoint
    fails (or misreads) its state rows under the widened struct.
    Existing first_seen checkpoints and their state must be RESET on
    upgrade (delete the checkpoint, replay the source — the filter's
    replay idempotence makes this safe); the same forward-only
    contract as the epoch-stamp format (SCALE_NOTES r13), now
    documented in both places."""
    # pass the StructType itself — string-mangling simpleString()
    # corrupts nested struct columns
    schema = output_schema or stream.schema
    use_timeout = ttl_ms is not None and timeout_eviction

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # eviction callback (empty input): forget the key so its
            # next sighting re-admits
            state.remove()
            return
        now_ms = (
            state.getCurrentProcessingTimeMs() if ttl_ms is not None else 0
        )
        if state.exists:
            if ttl_ms is None:
                return  # remember-forever: no state rewrite needed
            (_, last_ms) = state.get
            if now_ms - last_ms > ttl_ms:
                # idle past the TTL but never evicted (no batch ran
                # during the gap): re-admit NOW — the docstring's
                # contract — and restart the sliding window
                state.update((1, now_ms))
                if use_timeout:
                    state.setTimeoutDuration(ttl_ms)
                for pdf in pdfs:
                    yield pdf
                return
            state.update((1, now_ms))  # sliding renewal
            if use_timeout:
                state.setTimeoutDuration(ttl_ms)
            return
        state.update((1, now_ms))
        if use_timeout:
            state.setTimeoutDuration(ttl_ms)
        for pdf in pdfs:
            yield pdf

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="seen int, last_ms long",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
