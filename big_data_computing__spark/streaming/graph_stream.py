"""Streaming k-truss maintenance over an arriving edge stream.

The streaming face of the graph-cohesion family (operators/dedup.py:
triangle_supports / _truss_peel / ktruss_edges): duplicate-pair edges
arrive in micro-batches (e.g. from the simhash pair stream a continuous
ingestion pipeline emits, or a ZTable-ingested edge table), and the
full-graph per-edge triangle supports are maintained INCREMENTALLY —
per batch, only triangles through the just-arrived edges are
enumerated (a delta-keyed common-neighbor join, cost ∝ batch·avg-deg),
never the full O(m^1.5) enumeration the batch operator pays once. The
truss itself is then produced on demand by the shared peel
(``_truss_peel``), which starts from the maintained supports and also
never re-enumerates.

This is the insertion-side dual of the batch peel's delta rounds
(STRESS.md's "truss maintenance viable on slowly-evolving duplicate
graphs" note): additions can only CREATE triangles, so the support
update is a pure increment — each new triangle is found once per new
member edge, deduped by node triple, and credited to all three member
edges exactly once, the same triple-dedup argument the batch decrement
uses in reverse.

Fidelity contract: after any number of batches, ``TrussState.truss()``
is bit-identical to ``ktruss_edges`` run on the union of all edges
seen so far (pinned by tests/test_graph_stream.py). Duplicate and
reversed edge deliveries are no-ops (canonicalize + anti-join), so
replayed micro-batches are idempotent.

Scale notes: state is two checkpointed DataFrames — the canonical edge
set (two longs per edge) and the support table (three longs per
edge-in-a-triangle); both grow with the graph, not with stream length.
All joins are equi-joins on node/edge keys; no driver-side state
beyond the DataFrame handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    KTRUSS_MAX_ROUNDS,
    _canonical_edges,
    _truss_peel,
    triangle_supports,
)


class TrussState:
    """Incrementally-maintained edge set + full-graph triangle supports.

    Feed micro-batches of pair rows via :meth:`update`; read the
    current k-truss via :meth:`truss`. Designed for ``foreachBatch``
    (see :func:`truss_maintenance_stream`) but callable directly —
    the state is just two checkpointed DataFrames.
    """

    def __init__(
        self,
        k: int = 4,
        doc_a: str = "doc_a",
        doc_b: str = "doc_b",
        max_iterations: int = KTRUSS_MAX_ROUNDS,
    ) -> None:
        if k < 3:
            raise ValueError("TrussState: k must be >= 3")
        self.k = k
        self.doc_a = doc_a
        self.doc_b = doc_b
        self.max_iterations = max_iterations
        self.edges: DataFrame | None = None  # (u, v), u < v
        self.support: DataFrame | None = None  # (u, v, support)
        self.n_edges = 0

    def update(self, batch: DataFrame) -> int:
        """Absorb one micro-batch of pair rows; returns the number of
        genuinely new edges (0 for a fully-replayed batch)."""
        delta = _canonical_edges(batch, self.doc_a, self.doc_b)
        if self.edges is not None:
            delta = delta.join(self.edges, ["u", "v"], "left_anti")
        delta = delta.localCheckpoint()
        n_new = delta.count()
        if n_new == 0:
            return 0
        if self.edges is None:
            # first batch: the batch operator's path verbatim
            self.edges = delta
            self.support = triangle_supports(
                delta, n_edges=n_new
            ).localCheckpoint()
            self.n_edges = n_new
            return n_new
        g_new = self.edges.union(delta).localCheckpoint()
        # triangles of G_new containing >= 1 delta edge: for each delta
        # edge (u, v), common neighbors w in the NEW adjacency — the
        # insertion mirror of the batch peel's removal rounds
        adj = g_new.union(
            g_new.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).select(F.col("u").alias("n"), F.col("v").alias("w"))
        cand = delta.join(adj, delta["u"] == adj["n"]).select(
            delta["u"], delta["v"], adj["w"]
        )
        tri_new = cand.join(
            adj.select(F.col("n").alias("v"), F.col("w")),
            ["v", "w"],
            "left_semi",
        )
        # dedup by node triple: a triangle with 2-3 new edges is found
        # once per new edge but must credit each member edge once
        triple = tri_new.select(
            F.array_sort(F.array("u", "v", "w")).alias("t")
        ).distinct()
        inc = (
            triple.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.element_at("t", 1).alias("u"),
                            F.element_at("t", 2).alias("v"),
                        ),
                        F.struct(
                            F.element_at("t", 1).alias("u"),
                            F.element_at("t", 3).alias("v"),
                        ),
                        F.struct(
                            F.element_at("t", 2).alias("u"),
                            F.element_at("t", 3).alias("v"),
                        ),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .groupBy("u", "v")
            .agg(F.count("*").cast("long").alias("inc"))
        )
        self.support = (
            self.support.join(inc, ["u", "v"], "full")
            .select(
                "u",
                "v",
                (
                    F.coalesce("support", F.lit(0).cast("long"))
                    + F.coalesce("inc", F.lit(0).cast("long"))
                ).alias("support"),
            )
            .localCheckpoint()
        )
        self.edges = g_new
        self.n_edges += n_new
        return n_new

    def truss(self) -> DataFrame:
        """Current k-truss: DataFrame[doc_a, doc_b, support] — the same
        output (bit-identical) as ``ktruss_edges`` over every edge seen
        so far, produced WITHOUT re-enumerating triangles."""
        if self.edges is None:
            raise ValueError("TrussState.truss: no edges ingested yet")
        kept = _truss_peel(
            self.edges,
            self.support,
            self.k,
            self.max_iterations,
            n_edges=self.n_edges,
        )
        return kept.select(
            F.col("u").alias("doc_a"),
            F.col("v").alias("doc_b"),
            "support",
        )


def truss_maintenance_stream(
    src: DataFrame,
    state: TrussState,
    checkpoint_dir: str,
):
    """Wire a streaming DataFrame of (doc_a, doc_b) pair rows into
    ``state``: returns the DataStreamWriter (caller picks the trigger
    and calls ``.start()``). Each micro-batch is absorbed via
    :meth:`TrussState.update`; the caller reads ``state.truss()``
    whenever a current truss is needed (the state is always
    consistent between batches)."""

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        state.update(batch_df)

    return (
        src.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(absorb)
    )
