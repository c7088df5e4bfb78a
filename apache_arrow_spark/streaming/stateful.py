"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's streaming surface is stateless framing (SURVEY §2.9); the
one genuinely stateful piece is the DictionaryMemo accumulating dictionary
deltas across messages (ipc/dictionary.h:42).  This module provides the
general form of that pattern: user state carried across micro-batches per
key, with Arrow-batched pandas processing — running per-key aggregates
being the canonical instance.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key bigint, batch_events bigint, total_events bigint, total_value double"
STATE_SCHEMA = "total_events bigint, total_value double"


def running_totals(
    df: DataFrame,
    key: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Per-key running totals across micro-batches.

    Emits one row per (key, micro-batch-with-data): the batch's event count
    plus the all-time totals carried in state — the accumulate-across-
    messages behavior of the reference's DictionaryMemo generalized to
    arbitrary aggregates.  State is two scalars per key: bounded regardless
    of stream length.
    """

    def _update(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key_tuple
        if state.exists:
            total_events, total_value = state.get
        else:
            total_events, total_value = 0, 0.0
        batch_events = 0
        batch_value = 0.0
        for pdf in pdfs:
            batch_events += len(pdf)
            batch_value += float(pdf[value].sum())
        total_events += batch_events
        total_value += batch_value
        state.update((total_events, total_value))
        yield pd.DataFrame(
            {
                "key": [k],
                "batch_events": [batch_events],
                "total_events": [total_events],
                "total_value": [round(total_value, 4)],
            }
        )

    return (
        df.select(df[key].alias("key"), df[value].alias(value))
        .groupBy("key")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
