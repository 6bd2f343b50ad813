"""The composed daily-ingest pipeline: quality gate → global near-dup
gate → drift monitor → exactly-once table ingest, per micro-batch.

Each stage exists and is verified on its own (gopher gate in
operators/curation.py, the persisted-index LSH probe in
dedup_stream.py, DriftState in curation_stream.py, idempotent table
writes in table_stream.py); this module is their PRODUCTION
COMPOSITION — what a training-data ingest actually runs every batch —
with one deterministic acceptance contract the integration test can
verify independently, post-hoc, from batch operators alone.

Acceptance contract (greedy in arrival order): a document is ACCEPTED
iff it (1) passes the Gopher rule gate, and (2) has NO LSH candidate
pair to any gate-passing document that arrived before it — an earlier
batch's gate survivors (via the persisted signature index, which
indexes gate survivors only) or a lower-id gate survivor of its own
batch. The within-batch rule is deliberately conservative (a match to
a lower-id survivor rejects, even if that survivor was itself
rejected for an even earlier match): decisions then depend only on
the PAIR GRAPH and arrival order, never on the accept/reject
recursion — which keeps the contract independently recomputable and
the per-batch plan one join deeper than the probe itself.

The pair graph in the contract is the UNCAPPED band-collision graph
(``minhash_lsh_pairs`` with ``max_bucket=None``) — and the
implementation realizes it EXACTLY, without ever enumerating pairs:
the greedy predicate per band bucket collapses to "is this the
minimum-arrival member?" (within-batch: ``lsh_greedy_within_rejects``,
one min-aggregation) and to bare key membership against the index
(cross-batch: ``lsh_greedy_cross_rejects``, a semi-join). A
boilerplate super-bucket therefore costs O(b) rows here, not O(b²)
pairs, so the acceptance path needs NO super-bucket cap — the
derived-cap machinery (``lsh_max_bucket_from_stats``) belongs to the
pair-ENUMERATION surfaces (reports, maintained pair tables), where
output volume, not the accept bit, is the thing being bounded.

At 100 TB: per-batch cost is the batch's own signing + banded probe of
the standing index (never corpus × corpus), the drift state is O(40)
driver ints, and the table write is one idempotent blind append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.curation import gopher_quality_report
from ..operators.dedup import (
    lsh_greedy_cross_rejects,
    lsh_greedy_within_rejects,
    minhash_signatures,
)
from ..sources.layout import ZTable
from .batchlog import (
    committed_batch_ids,
    prune_uncommitted,
    write_batch_partition,
)
from .curation_stream import DriftState
from .table_stream import append_batch


class IngestPipeline:
    """foreachBatch driver for the composed ingest; see module doc."""

    def __init__(
        self,
        table_path: str,
        index_dir: str,
        num_hashes: int = 16,
        ngram: int = 3,
        text_col: str = "text",
        split_col: str = "lang",
        base_value: str = "en",
    ):
        self.table_path = table_path
        self.table: ZTable | None = None  # created on first batch
        self.index_dir = index_dir
        self.num_hashes = num_hashes
        self.ngram = ngram
        self.text_col = text_col
        self.drift = DriftState(split_col, base_value, text_col)
        self._seen: set[int] = set()
        self._indexed = False
        self._recovered = False

    def _recover(self) -> None:
        """One-time restart recovery (the batchlog guard the index
        states use): a replay of a batch whose signature partition is
        committed must SKIP — reprocessing it against an index that
        already contains its own signatures would self-match every
        doc and report accepted=0; the table side was always safe
        (append_batch's recorded-batch-id idempotence), this closes
        the index side. Marker-less partition dirs are crash debris
        and are pruned so the standing-index read never sees a
        partial batch."""
        if self._recovered:
            return
        self._recovered = True
        prune_uncommitted(self.index_dir)
        self._seen |= committed_batch_ids(self.index_dir)
        self._indexed = self._indexed or bool(self._seen)

    def _have_index(self) -> bool:
        return self._indexed

    def process(self, batch_df: DataFrame, batch_id: int) -> int:
        """Run one micro-batch through the gates; returns the number
        of accepted documents (0 on a replayed batch id)."""
        if batch_id in self._seen:
            return 0
        self._recover()
        if batch_id in self._seen:
            # committed before a restart: sig partition present, and
            # the table append is idempotent by recorded batch id
            return 0
        self._seen.add(batch_id)
        spark = batch_df.sparkSession

        # 1) hard quality gate
        gate = gopher_quality_report(batch_df, self.text_col)
        passing = (
            batch_df.join(
                gate.where(F.col("passes")).select("doc_id"), "doc_id"
            )
        ).localCheckpoint()

        # 2) global near-dup gate over gate survivors — the EXACT
        # greedy predicate, pair-free (module doc): within-batch
        # rejection is the bucket-min rule, cross-batch rejection is
        # band-key membership against the standing index. No
        # super-bucket cap exists on this path because no pair set is
        # ever enumerated — a boilerplate bucket costs O(b), and its
        # members are (correctly) rejected down to the earliest one.
        sigs = minhash_signatures(
            passing, self.num_hashes, self.ngram, self.text_col
        ).localCheckpoint()
        rejected = lsh_greedy_within_rejects(sigs, self.num_hashes)
        if self._have_index():
            cross = lsh_greedy_cross_rejects(
                sigs,
                spark.read.parquet(self.index_dir),
                self.num_hashes,
            )
            rejected = rejected.unionByName(cross)
        accepted = passing.join(
            rejected.distinct(), "doc_id", "left_anti"
        ).localCheckpoint()

        # 3) drift monitor over what actually enters the corpus
        self.drift.update(accepted, batch_id)

        # 4) exactly-once table ingest (idempotent blind append) —
        # layout coordinates derived from document shape
        rows = accepted.select(
            "doc_id",
            F.col("n_chars").cast("double").alias("x"),
            (F.col("doc_id") % 10000).cast("double").alias("y"),
            self.text_col,
            "lang",
            "source",
            "n_chars",
        )
        if self.table is None:
            import os

            marker = os.path.join(self.table_path, "_created_batch_id")
            if os.path.exists(marker):
                # restart with the table already created: re-open the
                # existing log. The creating batch's rows live in v0
                # with no recorded batch_id, so its replay (possible
                # only when its sig partition was lost — _recover
                # skips committed batches) is guarded by the marker;
                # every later batch gets append_batch's
                # recorded-batch-id idempotence.
                self.table = ZTable(self.table_path)
                if batch_id != int(open(marker).read()):
                    append_batch(self.table, rows, batch_id, n_files=1)
            else:
                # first batch ever creates the table (v0 carries the
                # rows), then records WHICH batch created it. A crash
                # between the two writes replays into a LOUD create-
                # on-existing-log failure rather than a double write.
                self.table = ZTable.create(
                    rows, self.table_path, n_files=1, cell=512.0
                )
                with open(marker, "w") as f:
                    f.write(str(batch_id))
        else:
            append_batch(self.table, rows, batch_id, n_files=1)

        # 5) index THIS batch's gate survivors (accepted or not — the
        # conservative contract keys on gate survivors) for later
        # batches' probes. Index LAST: a crash before this point
        # replays cleanly without self-matching; the batch_id=N
        # partition + _SUCCESS marker make the replay guard durable
        # across restarts (see _recover).
        write_batch_partition(sigs, self.index_dir, batch_id)
        self._indexed = True
        return accepted.count()
