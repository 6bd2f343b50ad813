"""Streaming skyline maintenance.

Insert-only streams make the skyline exactly maintainable with the
minimal possible state: the skyline itself. Dominance is transitive, so
``skyline(S ∪ B) = skyline(skyline(S) ∪ skyline(B))`` — once a point is
dominated it stays dominated forever, and points outside the current
skyline can never re-enter. Each micro-batch is reduced DISTRIBUTEDLY
first (operators/skyline.skyline_nd — the SFS cascade), so only the
batch's own skyline ever reaches the driver; the driver merge is a
dominance sweep over two small sets.

The state carries processed batch ids (the LshIndexState idiom), so a
replayed micro-batch — Structured Streaming's at-least-once foreachBatch
contract — is a strict no-op and the maintained skyline equals the
batch operator over the arrived prefix bit-for-bit (the tested parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.skyline import skyline_nd


def _dominates(a, b, cols) -> bool:
    """True when row-dict a dominates b (<= everywhere, < somewhere)."""
    return all(a[c] <= b[c] for c in cols) and any(
        a[c] < b[c] for c in cols
    )


class SkylineState:
    """Driver-held exact skyline under insert-only micro-batches.

    ``fold`` merges one batch's local skyline (already reduced on the
    cluster) into the maintained set; state size is the skyline size —
    the information-theoretic minimum for exact maintenance.
    """

    def __init__(self, cols: list[str]):
        self.cols = list(cols)
        self.rows: list[dict] = []
        self._batches: set[int] = set()

    def fold(self, batch_rows: list[dict], batch_id: int | None = None) -> int:
        """Merge; returns the new skyline size. Replayed ids no-op."""
        if batch_id is not None:
            if batch_id in self._batches:
                return len(self.rows)
            self._batches.add(batch_id)
        merged: list[dict] = []
        incoming = [dict(r) for r in batch_rows]
        for cand in self.rows + incoming:
            if any(
                _dominates(o, cand, self.cols)
                for o in self.rows + incoming
            ):
                continue
            merged.append(cand)
        self.rows = merged
        return len(self.rows)

    def snapshot(self) -> list[dict]:
        return [dict(r) for r in self.rows]


def skyline_stream_query(
    stream: DataFrame,
    state: SkylineState,
    checkpoint_dir: str,
    cascade: tuple[int, ...] = (4, 1),
):
    """foreachBatch driver: reduce each micro-batch to its own skyline
    on the cluster, then fold the (small) result into ``state``."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        local = skyline_nd(batch_df, state.cols, cascade=cascade)
        state.fold(
            [r.asDict() for r in local.collect()], batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
