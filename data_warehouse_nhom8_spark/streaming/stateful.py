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
) -> DataFrame:
    """Keep only the first-ever batch of rows per key (exact streaming
    dedup). Within the first batch a key appears in, all its rows pass
    (downstream batch dedup can pick a winner); afterwards the key is
    suppressed forever (until state timeout, if configured)."""
    # pass the StructType itself — string-mangling simpleString()
    # corrupts nested struct columns
    schema = output_schema or stream.schema

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            return
        state.update((1,))
        for pdf in pdfs:
            yield pdf

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
