"""Custom stateful streaming operators via applyInPandasWithState.

The distributed alternative to the driver-held SamplerState
(frequent_stream.py): state lives per-key inside Spark's state store —
partitioned, checkpointed, and scalable to key cardinalities no driver
dict could hold. This is the engine's pattern for any custom stateful
operator the built-in streaming aggregations can't express.

`running_item_counts` is the reference's exact-counts dict
(big_data_computing_3.py:84-88) as per-key state: each micro-batch
updates the per-item count and emits the new value (update semantics).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("item", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("cnt", T.LongType())])


def _update_counts(
    key: Any,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (item,) = key
    prev = state.get[0] if state.exists else 0
    new = prev + sum(len(pdf) for pdf in batches)
    state.update((new,))
    yield pd.DataFrame({"item": [item], "cnt": [new]})


def running_item_counts(items: DataFrame) -> DataFrame:
    """Per-item running counts with per-key state: streaming
    DataFrame[item, cnt] emitting the updated count for every key seen in
    each micro-batch. ``items`` must have an ``item`` column."""
    return items.groupBy("item").applyInPandasWithState(
        _update_counts,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
