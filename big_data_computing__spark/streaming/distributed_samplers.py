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


# ---------------------------------------------------------------------------
# Weighted reservoir (A-Res / A-ExpJ)
# ---------------------------------------------------------------------------

_WRES_OUT = T.StructType(
    [
        T.StructField("bucket", T.LongType()),
        T.StructField("epoch", T.LongType()),
        T.StructField("item", T.LongType()),
        T.StructField("w", T.LongType()),
        T.StructField("key", T.DoubleType()),
    ]
)
_WRES_STATE = T.StructType(
    [
        T.StructField("epoch", T.LongType()),
        T.StructField("items", T.ArrayType(T.LongType())),
        T.StructField("ws", T.ArrayType(T.LongType())),
        T.StructField("keys", T.ArrayType(T.DoubleType())),
    ]
)


def weighted_reservoir_stream(
    rows: DataFrame,
    m: int,
    n_buckets: int = 8,
    seed: int = 0,
    weight_col: str = "w",
    id_col: str = "item",
) -> DataFrame:
    """Streaming A-Res: DataFrame[bucket, epoch, item, w, key] — each
    bucket's current top-m candidates, re-emitted per micro-batch with a
    monotone epoch (final sample = latest epoch per bucket, unioned,
    global top-m; see tests).

    The A-Res key is a pure per-row function (counter-based u on the
    item id, operators/frequent.py::weighted_reservoir_keys), so top-m
    selection decomposes: per-bucket top-m states merge into the exact
    global top-m because top-m(∪ buckets) = top-m(∪ per-bucket top-ms).
    State per bucket is ≤ m (item, w, key) triples — bounded regardless
    of stream length, the property a driver-side heap would lose at
    high cardinality. Item→bucket hashing makes state hot-spot-free;
    the final cut touches n_buckets·m rows.
    """
    from ..operators.frequent import weighted_reservoir_keys

    keyed = weighted_reservoir_keys(rows, weight_col, id_col, seed)
    bucketed = keyed.select(
        F.pmod(F.col("item"), F.lit(n_buckets)).alias("bucket"),
        "item",
        "w",
        "key",
    )

    def update(
        key: Any, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.exists:
            epoch, items, ws, keys = state.get
            entries = list(zip(items, ws, keys))
        else:
            epoch, entries = 0, []
        for pdf in batches:
            for it, w, k in zip(pdf["item"], pdf["w"], pdf["key"]):
                entries.append((int(it), int(w), float(k)))
        # dedup by item: the key is a pure function of the item id, so
        # re-occurrences carry identical entries (a second stateful
        # dropDuplicates upstream is both unnecessary and unsupported
        # alongside this operator in update mode)
        entries = list({e[0]: e for e in entries}.values())
        # keep the m largest keys, item-id tie-break — the same total
        # order as the batch operator
        entries.sort(key=lambda e: (-e[2], e[0]))
        entries = entries[:m]
        epoch += 1
        state.update(
            (
                epoch,
                [e[0] for e in entries],
                [e[1] for e in entries],
                [e[2] for e in entries],
            )
        )
        yield pd.DataFrame(
            {
                "bucket": [bucket] * len(entries),
                "epoch": [epoch] * len(entries),
                "item": [e[0] for e in entries],
                "w": [e[1] for e in entries],
                "key": [e[2] for e in entries],
            }
        )

    return bucketed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=_WRES_OUT,
        stateStructType=_WRES_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
