"""Streaming corpus curation: per-row curation stages applied to an
unbounded document stream.

The streaming face of operators/curation.py's stateless stages. PII
redaction, quality gating, and repetition scoring are pure per-row
expressions, so the SAME Column expressions the batch operators use (or
provably-equal per-row reformulations — see
:func:`with_repetition_metrics`) run unchanged under Structured
Streaming — no state, no watermark needed, and batch ≡ streaming
bit-for-bit by construction (asserted by replay in
tests/test_curation_stream.py). :func:`repetition_window_stream` adds
the watermarked event-time rollup, and
:func:`curation_ingest_stream` composes the stages with streaming exact
dedup into the continuous training-data ingest pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_ngrams
from ..operators.curation import _PII_ORDER
from ..operators.textstats import quality_score_expr


def redact_pii_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming PII redaction: identical expression to
    operators.curation.redact_pii (typed placeholder tags, dependency
    order), valid on a streaming DataFrame because it is a stateless
    per-row map."""
    out = F.col(text_col)
    for pat, tag in _PII_ORDER:
        out = F.regexp_replace(out, pat, tag)
    return docs.withColumn(text_col, out)


def quality_gate_stream(
    docs: DataFrame,
    min_quality: float = 0.45,
    text_col: str = "text",
) -> DataFrame:
    """Streaming quality filter: keep documents whose heuristic quality
    score clears ``min_quality``; adds ``quality_score``. The score is
    the batch operator's exact expression (textstats.quality_score_expr
    — shared code, not a copy), stateless and shuffle-free."""
    return docs.withColumn(
        "quality_score", quality_score_expr(text_col)
    ).where(F.col("quality_score") >= F.lit(min_quality))


def _max_equal_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    array — i.e. the max multiplicity of any element. One linear
    ``aggregate`` pass with a (prev, run, best) accumulator; constant
    work per element, so no quadratic higher-order-function blowup.
    The '' sentinel is safe because tokens() never emits empty strings.
    """
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def with_repetition_metrics(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Streaming twin of operators.curation.repetition_metrics: appends
    ``n_tokens, top_token_frac, dup_bigram_frac, dup_trigram_frac`` and
    drops zero-token documents (the batch operator omits them too).

    The batch operator counts token multiplicity with an
    explode → groupBy — a shuffle, disallowed mid-stream in append mode.
    Here the same quantity (max token multiplicity) is computed per-row:
    sort the token array and take the longest equal-adjacent run
    (:func:`_max_equal_run`). Values are identical by construction —
    replay parity is asserted in tests — and the stage stays a
    stateless per-row map, valid on unbounded streams and free of any
    shuffle in batch mode as a bonus.
    """
    toks = tokens(F.col(text_col))
    bi = word_ngrams(F.col(text_col), 2)
    tri = word_ngrams(F.col(text_col), 3)

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.round(
            F.when(
                n > 0,
                F.lit(1.0)
                - F.size(F.array_distinct(arr)).cast("double") / n,
            ).otherwise(F.lit(0.0)),
            6,
        )

    n_tokens = F.size(toks)
    return (
        docs.withColumn("n_tokens", n_tokens)
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "top_token_frac",
            F.round(
                _max_equal_run(F.array_sort(toks)).cast("double")
                / F.col("n_tokens"),
                6,
            ),
        )
        .withColumn("dup_bigram_frac", dup_frac(bi))
        .withColumn("dup_trigram_frac", dup_frac(tri))
    )


def repetition_window_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    delay: str = "30 seconds",
    degenerate_threshold: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """Watermarked event-time rollup of repetition quality over a
    document stream: DataFrame[window_start, window_end, n_docs,
    mean_dup_bigram_frac, n_degenerate].

    The per-doc metrics are the stateless map above; the only stateful
    piece is Spark's native watermarked tumbling-window aggregate, so
    state is bounded by (windows inside the watermark horizon) and late
    documents beyond ``delay`` are dropped — the standard continuous
    corpus-quality monitor shape for an ingest pipeline.
    """
    per_doc = with_repetition_metrics(docs, text_col)
    return (
        per_doc.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("dup_bigram_frac"), 6).alias(
                "mean_dup_bigram_frac"
            ),
            F.sum(
                (F.col("dup_bigram_frac") > F.lit(degenerate_threshold))
                .cast("int")
            ).alias("n_degenerate"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_docs",
            "mean_dup_bigram_frac",
            "n_degenerate",
        )
    )


def curation_ingest_stream(
    docs: DataFrame,
    min_quality: float = 0.45,
    max_dup_bigram_frac: float = 0.2,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """The composed continuous training-data ingest pipeline over a
    document stream: PII redaction → quality gate → repetition gate →
    streaming exact dedup (first-seen fingerprints). Returns the
    surviving documents with ``quality_score``, repetition metrics, and
    ``fingerprint`` columns attached.

    Every stage before dedup is a stateless per-row map (this module);
    dedup is the only stateful stage and its state is bounded by the
    watermark when ``ts_col`` is given (streaming/dedup_stream.py).
    """
    from .dedup_stream import dedup_stream

    gated = quality_gate_stream(
        redact_pii_stream(docs, text_col), min_quality, text_col
    )
    reps = with_repetition_metrics(gated, text_col).where(
        F.col("dup_bigram_frac") <= F.lit(max_dup_bigram_frac)
    )
    return dedup_stream(reps, text_col, ts_col, watermark_delay)


def mixture_gate_stream(
    docs: DataFrame, rates: DataFrame
) -> DataFrame:
    """Streaming mixture-resample gate: keep arriving documents by the
    same counter-based draw as the batch
    ``operators.curation.mixture_resample``, against PRE-COMPUTED
    per-domain rates (a tiny static DataFrame[source, rate] from
    ``mixture_resample_rates`` on a reference snapshot).

    A stream-static broadcast join + a stateless per-row predicate —
    no state, no watermark, and replay ≡ batch bit-for-bit because the
    keep decision is a pure function of (doc_id, rate). Rates are
    frozen at training time by design: the target mixture is a
    training-run constant, not a moving estimate (recompute and restart
    the query to re-target — the standard static-enrichment pattern).
    """
    from ..functions.hashing import uniform01

    u = uniform01(F.concat(F.lit("mr:"), F.col("doc_id").cast("string")))
    return docs.join(F.broadcast(rates), "source").where(
        u < F.col("rate")
    )


# ---------------------------------------------------------------------------
# Streaming DSIR: exact incremental bucket maintenance + online scoring
# ---------------------------------------------------------------------------


class DsirBucketState:
    """Driver-side running DSIR bucket counters: bucket -> [t, r] as
    exact Python ints — the ScatterState pattern (embed_stream.py):
    integer counts are ADDITIVE, so each micro-batch contributes its
    own (bucket, target?, count) aggregate (≤ n_buckets rows to the
    driver) and the folded state equals the batch bucket table over
    the union of arrived rows BIT-FOR-BIT after any prefix.

    Scoring splits into the online and the replay form:
    - :meth:`score` scores a DataFrame against the CURRENT state (the
      prequential/online importance estimate a live selection gate
      uses — early documents are scored under early bucket tables);
    - scoring the accumulated corpus against the FINAL state
      reproduces batch ``dsir_importance`` exactly (asserted in
      tests), because :meth:`score` uses the same q_b = (1e6·(t+1))
      div (r+1) integer math over the same
      ``dsir_feature_buckets`` front-end.

    Exactly-once: ``update`` is keyed by micro-batch id and ignores
    replays (the foreachBatch idempotence rule of table_stream.py).
    State is O(n_buckets) driver ints — 1024 buckets is ~2k integers.
    """

    def __init__(
        self,
        n_buckets: int = 1024,
        target_pred: str = "lang = 'en'",
        text_col: str = "text",
        hash_mode: str = "md5",
    ):
        self.n_buckets = n_buckets
        self.target_pred = target_pred
        self.text_col = text_col
        self.hash_mode = hash_mode
        self.buckets: dict[int, list[int]] = {}
        self._seen: set[int] = set()

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.curation import dsir_feature_buckets

        if batch_id in self._seen:
            return
        self._seen.add(batch_id)
        agg = (
            dsir_feature_buckets(
                batch_df,
                self.target_pred,
                self.n_buckets,
                self.text_col,
                self.hash_mode,
            )
            .groupBy("bucket")
            .agg(
                F.count("*").cast("long").alias("r"),
                F.sum(F.col("is_target").cast("long"))
                .cast("long")
                .alias("t"),
            )
            .collect()
        )
        for row in agg:
            cur = self.buckets.setdefault(int(row["bucket"]), [0, 0])
            cur[0] += int(row["t"])
            cur[1] += int(row["r"])

    def score(self, docs: DataFrame) -> DataFrame:
        """DataFrame[doc_id, n_feats, imp_milli] of ``docs`` under the
        current bucket table — identical integer math to the batch
        operator (features absent from every arrived bucket score
        q = (1e6·1) div 1: the add-1 smoothing's unseen-bucket value,
        exactly what the batch computes for an empty bucket)."""
        from ..operators.curation import dsir_feature_buckets

        spark = docs.sparkSession
        rows = [
            (b, (1_000_000 * (t + 1)) // (r + 1))
            for b, (t, r) in sorted(self.buckets.items())
        ]
        q = spark.createDataFrame(
            rows or [(-1, 0)], "bucket int, q long"
        )
        feats = dsir_feature_buckets(
            docs,
            self.target_pred,
            self.n_buckets,
            self.text_col,
            self.hash_mode,
        )
        unseen = 1_000_000  # (1e6·(0+1)) div (0+1)
        return (
            feats.join(F.broadcast(q), "bucket", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("q"), F.lit(unseen)).alias("qv"),
            )
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("int").alias("n_feats"),
                F.expr("sum(qv) div count(*)")
                .cast("long")
                .alias("imp_milli"),
            )
        )


def dsir_stream(docs_stream: DataFrame, state: DsirBucketState):
    """Attach exact DSIR bucket maintenance to an unbounded document
    stream: foreachBatch folds each micro-batch's bucket aggregate
    into ``state`` (idempotent under replays). Score live batches or
    the accumulated corpus with ``state.score`` at any point."""
    return docs_stream.writeStream.foreachBatch(
        lambda df, bid: state.update(df, bid)
    )


class DriftState:
    """Driver-side running drift monitor: the streaming twin of
    ``curation.corpus_drift_report``. Per micro-batch, ONE ≤40-row
    aggregate ships (metric, bin, base?, count) to the driver; the
    folded histograms are ADDITIVE integer counts, so after any batch
    prefix :meth:`report` equals the batch operator over the union of
    arrived documents BIT-FOR-BIT (asserted in tests) — the live
    "did this ingest drift?" gate with O(40) driver ints of state.

    Exactly-once: ``update`` is keyed by micro-batch id and ignores
    replays (the foreachBatch idempotence rule of table_stream.py).
    """

    def __init__(
        self,
        split_col: str = "lang",
        base_value: str = "en",
        text_col: str = "text",
    ):
        self.split_col = split_col
        self.base_value = base_value
        self.text_col = text_col
        # (metric, bin) -> [base_n, comp_n]
        self.bins: dict[tuple, list[int]] = {}
        self._seen: set[int] = set()

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.textstats import quality_scores

        if batch_id in self._seen:
            return
        self._seen.add(batch_id)
        q = quality_scores(batch_df, self.text_col).select(
            "doc_id", "n_tokens", "quality_score"
        )
        joined = batch_df.select("doc_id", self.split_col).join(
            q, "doc_id"
        )
        is_base = (F.col(self.split_col) == self.base_value).cast(
            "long"
        )
        qbin = F.least(
            F.floor(
                F.round(F.col("quality_score") * 1000000).cast("long")
                / F.lit(100000)
            ),
            F.lit(9),
        ).cast("long")
        lbin = F.least(
            F.floor(F.col("n_tokens") / F.lit(20)), F.lit(9)
        ).cast("long")
        rows = (
            joined.select(
                is_base.alias("_b"),
                qbin.alias("_qbin"),
                lbin.alias("_lbin"),
            )
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.lit("quality_decile").alias("metric"),
                            F.col("_qbin").alias("bin"),
                        ),
                        F.struct(
                            F.lit("token_bucket").alias("metric"),
                            F.col("_lbin").alias("bin"),
                        ),
                    )
                ).alias("e"),
                "_b",
            )
            .groupBy("e.metric", "e.bin")
            .agg(
                F.sum("_b").cast("long").alias("base_n"),
                F.sum(1 - F.col("_b")).cast("long").alias("comp_n"),
            )
            .collect()
        )
        for r in rows:
            cell = self.bins.setdefault((r["metric"], r["bin"]), [0, 0])
            cell[0] += r["base_n"]
            cell[1] += r["comp_n"]

    def report(self) -> list[tuple]:
        """[(metric, bin, base_n, comp_n, tvd_milli)] — the batch
        operator's rows, computed from the folded state."""
        out = []
        metrics = sorted({m for m, _ in self.bins})
        for m in metrics:
            cells = {
                b: v for (mm, b), v in self.bins.items() if mm == m
            }
            b_tot = sum(v[0] for v in cells.values())
            c_tot = sum(v[1] for v in cells.values())
            cross = sum(
                abs(v[0] * c_tot - v[1] * b_tot)
                for v in cells.values()
            )
            tvd = (
                1000 * cross // (2 * b_tot * c_tot)
                if b_tot and c_tot
                else 0
            )
            for b in sorted(cells):
                v = cells[b]
                out.append((m, int(b), v[0], v[1], tvd))
        return out
