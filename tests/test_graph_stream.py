"""Streaming k-truss maintenance (streaming/graph_stream.py): the
maintained truss must be bit-identical to the batch peel on the union
of every edge seen so far, after every micro-batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.operators.dedup import ktruss_edges
from big_data_computing__spark.streaming.graph_stream import (
    TrussState,
    truss_maintenance_stream,
)


def _edge_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )


def _graph():
    """Two 5-cliques welded by a chain, plus a triangle fringe — the
    shape whose 4-truss keeps the cliques and drops chain + fringe."""
    edges = []
    for base in (0, 100):
        nodes = [base + i for i in range(5)]
        edges += [
            (a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]
        ]
    edges += [(4, 50), (50, 51), (51, 100)]  # chain between cliques
    edges += [(200, 201), (201, 202), (200, 202)]  # lone triangle
    return edges


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_truss_state_matches_batch_after_every_batch(spark):
    edges = _graph()
    batches = [edges[0::3], edges[1::3], edges[2::3]]
    state = TrussState(k=4)
    seen = []
    for b in batches:
        seen += b
        n_new = state.update(_edge_df(spark, b))
        assert n_new == len(b)
        want = _rows(ktruss_edges(_edge_df(spark, seen), k=4))
        got = _rows(state.truss())
        assert got == want
    # final truss is exactly the two cliques (support 3 each edge)
    final = state.truss().collect()
    assert len(final) == 20
    assert all(r["support"] == 3 for r in final)
    assert {r["doc_a"] for r in final} | {r["doc_b"] for r in final} == {
        *range(5),
        *range(100, 105),
    }


def test_truss_state_replay_and_reversed_edges_are_noops(spark):
    edges = _graph()
    state = TrussState(k=4)
    state.update(_edge_df(spark, edges))
    before = _rows(state.truss())
    # replayed batch, and the same edges reversed
    assert state.update(_edge_df(spark, edges[:10])) == 0
    assert state.update(_edge_df(spark, [(b, a) for a, b in edges])) == 0
    assert _rows(state.truss()) == before


def test_truss_state_guards(spark):
    with pytest.raises(ValueError, match="k must be >= 3"):
        TrussState(k=2)
    with pytest.raises(ValueError, match="no edges ingested"):
        TrussState(k=3).truss()


def test_truss_maintenance_stream_wiring(spark, tmp_path):
    """Drive the state through a real Structured Streaming query (file
    source, availableNow): end state equals the batch truss."""
    edges = _graph()
    data = str(tmp_path / "edges")
    _edge_df(spark, edges).repartition(3).write.parquet(data)

    state = TrussState(k=4)
    src = spark.readStream.schema("doc_a long, doc_b long").parquet(data)
    q = (
        truss_maintenance_stream(src, state, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert state.n_edges == len(edges)
    want = _rows(ktruss_edges(_edge_df(spark, edges), k=4))
    assert _rows(state.truss()) == want


def test_truss_maintenance_over_ztable_ingested_edges(spark, tmp_path):
    """The composed pipeline: an edge stream lands in a ZTable (Z-order
    snapshot log, exactly-once batch-id guard), and the truss state is
    maintained from the table's own append deltas — each snapshot's
    new files are exactly one incremental update. End truss equals the
    batch operator over the table's live rows."""
    from big_data_computing__spark.sources import layout as L
    from big_data_computing__spark.streaming.table_stream import (
        table_append_stream,
    )

    edges = _graph()
    df = _edge_df(spark, edges)
    first, rest = df.where("doc_a < 3"), df.where("doc_a >= 3")
    table = L.ZTable.create(
        first, str(tmp_path / "edge_table"), x="doc_a", y="doc_b",
        n_files=2, cell=16.0,
    )
    src_dir = str(tmp_path / "incoming")
    rest.repartition(2).write.parquet(src_dir)
    src = spark.readStream.schema(df.schema).parquet(src_dir)
    q = (
        table_append_stream(src, table, str(tmp_path / "ckpt"), n_files=1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert table.read(spark).count() == len(edges)

    # replay the snapshot log as truss updates: version v's delta =
    # files in v but not v-1 (appends only ever add files)
    state = TrussState(k=4)
    versions = table.versions()
    prev_files: set[str] = set()
    for v in versions:
        files = {e["file"] for e in table.snapshot(v)["files"]}
        delta = sorted(files - prev_files)
        prev_files = files
        if delta:
            state.update(spark.read.parquet(*delta))
    want = _rows(ktruss_edges(table.read(spark), k=4))
    assert _rows(state.truss()) == want
    assert len(want) == 20  # the two 5-cliques
