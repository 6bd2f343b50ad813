"""Distributed streaming samplers: reservoir + sticky with per-key
Spark state instead of driver dicts.

The counter-based PRNG (operators/frequent.py) makes every sampling
decision a pure function of the arrival position, so sampler state
decomposes by key with no cross-key or cross-batch RNG dependence:

- **Reservoir**: the slot each write targets is determined by its seq
  alone, so state partitions by ``slot`` (m keys). Per-slot state is the
  (seq, item) of the latest accepted write — new batches just max-merge.
- **Sticky**: admission is determined by each occurrence's own draw, so
  state partitions by ``item``. Per-item state is (admission_seq,
  count-since-admission); a batch for an untracked item first looks for
  its earliest lucky occurrence.

Both produce **bit-identical** results to the batch operators on the
same stream prefix (asserted in tests), while scaling to key
cardinalities and throughputs no driver loop could hold — the engine's
answer to the reference's inherently driver-sequential design
(big_data_computing_3.py:72-98).

Requires batches to arrive in seq order per key for exactness of the
intermediate states; the *final* state is order-independent because the
merge functions (max-by-seq, min-lucky-seq + count-of-later) are
commutative over disjoint seq sets.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.hashing import TWO_POW_60


def _u(tag: str, seed: int, t: int) -> float:
    key = f"{tag}-{seed}-{t}".encode()
    return int(hashlib.md5(key).hexdigest()[:15], 16) / TWO_POW_60


# ---------------------------------------------------------------------------
# Reservoir
# ---------------------------------------------------------------------------

_RES_OUT = T.StructType(
    [
        T.StructField("slot", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("item", T.LongType()),
    ]
)
_RES_STATE = T.StructType(
    [T.StructField("seq", T.LongType()), T.StructField("item", T.LongType())]
)


def reservoir_stream(
    items: DataFrame, m: int, seed: int = 0
) -> DataFrame:
    """Streaming reservoir: DataFrame[slot, seq, item] (update mode) —
    emits each slot's current occupant whenever it changes.

    ``items`` must carry (seq, item). The accepted-write filter and slot
    assignment are the same counter-based expressions as the batch
    operator (operators/frequent.py::reservoir_writes), evaluated
    row-wise inside the stream; only the per-slot max-merge is stateful.
    """
    from ..operators.frequent import reservoir_writes

    writes = reservoir_writes(items, m, seed)

    def update(
        key: Any, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (slot,) = key
        best_seq, best_item = (
            state.get if state.exists else (-1, None)
        )
        for pdf in batches:
            if len(pdf) == 0:
                continue
            idx = pdf["seq"].idxmax()
            if int(pdf["seq"][idx]) > best_seq:
                best_seq = int(pdf["seq"][idx])
                best_item = int(pdf["item"][idx])
        state.update((best_seq, best_item))
        yield pd.DataFrame(
            {"slot": [slot], "seq": [best_seq], "item": [best_item]}
        )

    return writes.groupBy("slot").applyInPandasWithState(
        update,
        outputStructType=_RES_OUT,
        stateStructType=_RES_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Sticky
# ---------------------------------------------------------------------------

_STK_OUT = T.StructType(
    [
        T.StructField("item", T.LongType()),
        T.StructField("est_cnt", T.LongType()),
    ]
)
_STK_STATE = T.StructType(
    [
        T.StructField("aseq", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def sticky_stream(
    items: DataFrame, n: int, r: float, seed: int = 0
) -> DataFrame:
    """Streaming sticky sampling: DataFrame[item, est_cnt] (update mode).

    Per-item state = (admission seq, count of occurrences at-or-after
    it). The per-occurrence luck draw is precomputed as a column (same
    expression as the batch operator), so the stateful function only
    merges.
    """
    rate = r / n
    lucky = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.lit("sticky"),
                        F.lit(str(seed)),
                        F.col("seq").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(TWO_POW_60)
        < F.lit(rate)
    )
    tagged = items.select("seq", "item", lucky.alias("lucky"))

    def update(
        key: Any, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (item,) = key
        if state.exists:
            aseq, cnt = state.get
            if aseq is not None and aseq < 0:
                aseq = None  # stored sentinel: not yet admitted
        else:
            aseq, cnt = None, 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if aseq is None:
                lucky_rows = pdf[pdf["lucky"]]
                if len(lucky_rows):
                    aseq = int(lucky_rows["seq"].min())
            if aseq is not None:
                cnt += int((pdf["seq"] >= aseq).sum())
        state.update((aseq if aseq is not None else -1, cnt))
        if aseq is not None and aseq >= 0:
            yield pd.DataFrame({"item": [item], "est_cnt": [cnt]})
        else:
            yield pd.DataFrame({"item": [], "est_cnt": []})

    return tagged.groupBy("item").applyInPandasWithState(
        update,
        outputStructType=_STK_OUT,
        stateStructType=_STK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
