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
) -> DataFrame:
    """Keep only the first-ever batch of rows per key (exact streaming
    dedup). Within the first batch a key appears in, all its rows pass
    (downstream batch dedup can pick a winner); afterwards the key is
    suppressed until its state expires.

    `ttl_ms` bounds state for an UNBOUNDED key universe (crawl-scale
    fingerprints): each sighting — admitted or suppressed — renews a
    processing-time timeout, so a key idle for `ttl_ms` is evicted
    from the state store and its next sighting is re-admitted (the
    sliding-TTL cache semantics; hot keys stay deduped forever). None
    keeps the exact remember-forever behavior — correct only when the
    key universe fits the state store."""
    # pass the StructType itself — string-mangling simpleString()
    # corrupts nested struct columns
    schema = output_schema or stream.schema

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # eviction callback (empty input): forget the key so its
            # next sighting re-admits
            state.remove()
            return
        if state.exists:
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # sliding renewal
            return
        state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        for pdf in pdfs:
            yield pdf

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
