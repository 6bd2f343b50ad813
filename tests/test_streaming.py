"""Structured Streaming parity: streaming run == batch operator on the
same prefix (the engine's counter-based PRNG makes this exact)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators import frequent as FR
from big_data_computing__spark.sources.readers import read_table
from big_data_computing__spark.sources.readers import event_stream_table
from big_data_computing__spark.streaming.frequent_stream import (
    SamplerState,
    file_items,
    run_sampler_stream,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir):
    """Replay the events fixture as 4 parquet chunk files (micro-batches)."""
    tmp = tempfile.mkdtemp(prefix="bdc_stream_")
    data = tmp + "/data"
    items = event_stream_table(spark, sf_dir).orderBy("seq").collect()
    chunk = len(items) // 4 + 1
    import pandas as pd

    for i in range(4):
        part = items[i * chunk : (i + 1) * chunk]
        if part:
            pdf = pd.DataFrame(
                {"seq": [r["seq"] for r in part],
                 "item": [r["item"] for r in part]}
            )
            spark.createDataFrame(pdf).write.mode("append").parquet(data)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_matches_batch(spark, sf_dir, stream_dir):
    batch = event_stream_table(spark, sf_dir).cache()
    n = batch.count()
    phi, eps, delta, seed = 0.02, 0.008, 0.1, 7

    state = SamplerState(n=n, phi=phi, epsilon=eps, delta=delta, seed=seed)
    items = file_items(spark, stream_dir + "/data")
    state = run_sampler_stream(
        items, state, checkpoint=stream_dir + "/ckpt", timeout_s=90
    )

    assert state.processed == n
    assert state.stopped

    # exact counts parity
    batch_counts = {
        r["item"]: r["cnt"] for r in FR.item_counts(batch).collect()
    }
    assert state.counts == batch_counts

    # true frequent parity
    batch_truth = sorted(
        r["item"] for r in FR.true_frequent_items(batch, phi).collect()
    )
    assert state.true_frequent() == batch_truth

    # reservoir parity: same counter PRNG → identical reservoir
    m = FR.reservoir_size(phi)
    batch_res = {
        r["slot"]: r["item"]
        for r in FR.reservoir_sample(batch, m, seed).collect()
    }
    assert state.reservoir == batch_res

    # sticky parity
    r = FR.sticky_rate(phi, eps, delta)
    batch_sticky = {
        r_["item"]: r_["est_cnt"]
        for r_ in FR.sticky_counts(batch, n, r, seed).collect()
    }
    assert state.sticky == batch_sticky


def test_stop_at_n_batch_granular(spark):
    """A batch that starts at-or-past n is skipped; the crossing batch is
    processed in full (reference big_data_computing_3.py:75-77)."""
    state = SamplerState(n=5, phi=0.5, epsilon=0.1, delta=0.1, seed=0)
    state.update([(1, 10), (2, 20), (3, 30)])
    assert state.processed == 3 and not state.stopped
    state.update([(4, 40), (5, 50), (6, 60)])  # crosses n=5: full batch
    assert state.processed == 6 and state.stopped
    state.update([(7, 70)])  # skipped
    assert state.processed == 6


def test_kmv_state_stream_parity_and_replay(spark, sf_dir, tmp_path):
    """KmvState folded over a real availableNow foreachBatch run
    equals the batch kmv_sketch/kmv_estimate over the same rows
    bit-for-bit, and a replayed batch id is a strict no-op."""
    from big_data_computing__spark.operators.frequent import (
        kmv_estimate,
    )
    from big_data_computing__spark.streaming.frequent_stream import (
        KmvState,
    )

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_orderkey").cast("long").alias("item")
    )
    data = str(tmp_path / "kmv_rows")
    li.repartition(4).write.parquet(data)
    src = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data)
    )
    st = KmvState(group_cols=["l_returnflag"])
    q = (
        src.writeStream.foreachBatch(st.update)
        .option("checkpointLocation", str(tmp_path / "kmv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(st._seen) > 1  # genuinely incremental

    want = {
        (r["l_returnflag"],): (
            r["n_sketch"],
            r["kth_hv"],
            r["estimate"],
        )
        for r in kmv_estimate(
            li, group_cols=["l_returnflag"]
        ).collect()
    }
    assert st.estimate() == want

    # replay idempotence: re-running an already-seen batch id changes
    # nothing
    before = {k: list(v) for k, v in st.sketches.items()}
    st.update(li, batch_id=next(iter(st._seen)))
    assert {k: list(v) for k, v in st.sketches.items()} == before
