"""Streaming embedding-statistics maintenance: the scatter/covariance
matrix of an UNBOUNDED embedding stream, kept exactly.

The batch operator (`operators/similarity.embedding_scatter`) quantizes
first so every statistic is an exact BIGINT sum — and exact integer
sums are ADDITIVE, which is what makes the streaming twin trivial to
keep bit-exact: each micro-batch contributes its own k·(k+1)/2 pair
sums (the same distributed aggregation the batch runs), the driver
folds them into k² running integers (:class:`ScatterState`), and the
covariance is recomputed from the running totals by the batch
operator's exact expression. No approximation, no decay, no
accumulation-order sensitivity — after any prefix of the stream the
state equals the batch answer on the union of arrived rows
bit-for-bit (asserted in tests/test_embed_stream.py), the same
batch ≡ stream contract as the engine's other streaming twins.

Exactly-once: `update` is keyed by the micro-batch id and ignores
replays, the foreachBatch idempotence rule every sink here follows
(streaming/table_stream.py sets the pattern).

Scale: per batch the cluster reduces to k·(k+1)/2 rows; the driver
holds k² integers. A 768-dim production run is ~295k driver integers —
still nothing. PCA over the live state follows exactly as in
`similarity.embedding_pca` (k×k eigh on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.similarity import embedding_scatter


class ScatterState:
    """Driver-side running scatter totals: (i, j) -> [n, s_i, s_j,
    s_ij], all exact Python ints (arbitrary precision — no overflow
    at any stream length)."""

    def __init__(self, k: int = 8, scale: int = 1_000_000):
        self.k = k
        self.scale = scale
        self.sums: dict[tuple[int, int], list[int]] = {}
        self._seen: set[int] = set()
        #: per-batch covariance-drift report, appended by every applied
        #: (non-replay) update: [{batch_id, n_vecs, max_abs, l2}].
        #: Drift compares the post-batch covariance surface against the
        #: pre-batch one via :func:`covariance_drift`, so the series is
        #: a monitorable "how much is this stream still moving my
        #: second-moment estimate" signal (embedding-distribution
        #: drift); the first applied batch reports None (no baseline).
        self.drift_history: list[dict] = []
        self._prev_cov: dict[tuple[int, int], float] | None = None

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch's pair sums into the running state.
        Replays of an already-applied batch id are ignored
        (exactly-once under restart — they also leave
        ``drift_history`` untouched)."""
        if batch_id in self._seen:
            return
        for r in embedding_scatter(
            batch_df, k=self.k, scale=self.scale
        ).collect():
            cell = self.sums.setdefault(
                (r["i"], r["j"]), [0, 0, 0, 0]
            )
            cell[0] += r["n_vecs"]
            cell[1] += r["s_i"]
            cell[2] += r["s_j"]
            cell[3] += r["s_ij"]
        self._seen.add(batch_id)
        cur = {key: v[4] for key, v in self.result().items()}
        drift = (
            covariance_drift(self._prev_cov, cur)
            if self._prev_cov is not None
            else None
        )
        self.drift_history.append(
            {
                "batch_id": batch_id,
                "n_vecs": next(iter(self.sums.values()))[0]
                if self.sums
                else 0,
                "max_abs": drift["max_abs"] if drift else None,
                "l2": drift["l2"] if drift else None,
            }
        )
        self._prev_cov = cur

    def result(self) -> dict[tuple[int, int], tuple]:
        """(i, j) -> (n_vecs, s_i, s_j, s_ij, cov) from the running
        totals — cov is the batch operator's exact expression (IEEE
        double ops on exact integers, so it equals the batch result
        bit-for-bit)."""
        out = {}
        sc2 = float(self.scale) * float(self.scale)
        for (i, j), (n, s_i, s_j, s_ij) in self.sums.items():
            cov = round(
                (float(s_ij) / n - (float(s_i) / n) * (float(s_j) / n))
                / sc2,
                9,
            )
            out[(i, j)] = (n, s_i, s_j, s_ij, cov)
        return out


def covariance_drift(
    prev: dict[tuple[int, int], float],
    cur: dict[tuple[int, int], float],
) -> dict[str, float]:
    """Drift between two covariance surfaces (upper-triangle dicts of
    (i, j) -> cov): max-abs and Frobenius-style l2 over the entrywise
    deltas, missing cells treated as 0.0. Pure arithmetic on the
    9-dp covariances :meth:`ScatterState.result` reports — the same
    inputs the batch operator emits — so a drift series recomputed
    from per-prefix batch scatters equals the streaming series
    bit-for-bit (tests/test_embed_stream.py pins it)."""
    keys = set(prev) | set(cur)
    deltas = [cur.get(k2, 0.0) - prev.get(k2, 0.0) for k2 in keys]
    return {
        "max_abs": max((abs(d) for d in deltas), default=0.0),
        "l2": sum(d * d for d in deltas) ** 0.5,
    }


def scatter_stream(
    emb_stream: DataFrame,
    state: ScatterState,
    checkpoint: str,
):
    """Attach the running-scatter sink to a streaming embeddings
    DataFrame; returns the started StreamingQuery."""
    return (
        emb_stream.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: state.update(df, bid))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
