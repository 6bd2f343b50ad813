"""Round-8 hardening regressions: SQL literal escaping, chi2 NULL
contract, streaming-state numeric-key contract, pre-1970 day floors."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.functions.sqlsafe import sql_str
from big_data_computing__spark.operators.stats import (
    chi2_independence,
    chi2_independence_sql,
    ks_drift_sql,
)
from big_data_computing__spark.operators.windows import (
    _floor_div_sql,
    event_day,
)
from big_data_computing__spark.streaming.frequent_stream import (
    AucState,
    KSDriftState,
)


def test_sql_str_escapes_quotes():
    assert sql_str("plain") == "'plain'"
    assert sql_str("o'brien") == "'o''brien'"
    assert sql_str("''") == "''''''"


def test_quoted_label_sql_parses_in_duckdb():
    """A base value containing a quote must yield well-formed SQL in
    the generated twins (previously broke the parser or worse)."""
    sql = ks_drift_sql(
        "SELECT * FROM (VALUES (1.0, 'o''brien'), (2.0, 'x'), "
        "(3.0, 'o''brien'), (4.0, 'x')) t(v, s)",
        "v",
        "s",
        "o'brien",
    )
    row = duckdb.connect().execute(sql).fetchone()
    assert row[0] == 2 and row[1] == 2  # n_base, n_comp


def test_chi2_null_categories_excluded(spark):
    """NULL category rows are excluded at entry in BOTH engines — a
    NULL key can't match the margins cross-product equi-join, so an
    unfiltered NULL would inflate chi2 (ADVICE r7)."""
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
            (None, "x"), ("a", None)]
    df = spark.createDataFrame(rows, "ca string, cb string")
    got = chi2_independence(df, "ca", "cb").collect()[0]
    assert got["n"] == 4  # the two NULL rows dropped
    clean = spark.createDataFrame(rows[:4], "ca string, cb string")
    want = chi2_independence(clean, "ca", "cb").collect()[0]
    assert tuple(got) == tuple(want)

    sql = chi2_independence_sql(
        "SELECT * FROM (VALUES ('a','x'), ('a','y'), ('b','x'), "
        "('b','y'), (NULL,'x'), ('a',NULL)) t(ca, cb)",
        "ca",
        "cb",
    )
    orow = duckdb.connect().execute(sql).fetchone()
    assert tuple(got) == tuple(orow)


def test_state_rejects_decimal_scores(spark):
    """Decimal (or string) keyed columns would collapse/reorder
    distinct keys through the float() fold — rejected loudly."""
    dec = spark.range(4).select(
        F.col("id").cast("decimal(38,18)").alias("score"),
        (F.col("id") % 2 == 0).alias("passes"),
        F.col("id").cast("double").alias("value"),
        F.lit("purchase").alias("event_type"),
    )
    with pytest.raises(TypeError, match="float-"):
        AucState("score", "passes").update(dec, 0)
    with pytest.raises(TypeError, match="float-"):
        KSDriftState("score", "event_type", "purchase").update(dec, 0)
    # numeric columns still fold fine
    st = AucState("value", "passes")
    st.update(dec, 0)
    assert sum(p + n for p, n in st.counts.values()) == 4


def test_event_day_floors_pre_epoch(spark):
    """Day index uses FLOOR division for all sign ranges (the double
    division truncated toward zero, diverging pre-1970)."""
    df = spark.createDataFrame(
        [(-1,), (0,), (-86_400_000_000,), (-86_400_000_001,),
         (86_400_000_000,)],
        "ts long",
    )
    got = [r[0] for r in df.select(event_day(df, "ts")).collect()]
    assert got == [-1, 0, -1, -2, 1]
    # DuckDB's raw integer // TRUNCATES toward zero (probed: -1 // d
    # = 0), so the SQL twins use the pmod-subtracted floor helper —
    # assert the two engines' conventions agree through it.
    expr = _floor_div_sql("us", 86_400_000_000)
    want = duckdb.connect().execute(
        f"SELECT {expr} FROM (VALUES (-1), (0), "
        "(-86400000000), (-86400000001), (86400000000)) t(us) "
    ).fetchall()
    assert got == [w[0] for w in want]


# ---------------------------------------------------------------------------
# join_strategy_from_stats / join_analyzed (relational.py, r8)
# ---------------------------------------------------------------------------


def _mk_table(spark, df, path, key):
    from big_data_computing__spark.sources import layout as L

    t = L.ZTable.create(
        df.withColumn("x", F.col(key).cast("double"))
        .withColumn("y", F.lit(0.0)),
        str(path),
        n_files=4,
    )
    return t


def test_join_gate_three_regimes(spark, tmp_path):
    """The stats gate picks broadcast for a manifest-small build side,
    salted for a histogram-skewed probe side, plain otherwise — all at
    zero data read — and every strategy returns identical rows."""
    from big_data_computing__spark.operators.relational import (
        join_analyzed,
        join_strategy_from_stats,
    )

    n = 20_000
    skewed = spark.range(n).select(
        F.when(F.col("id") % 10 < 8, F.lit(0))
        .otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    uniform = spark.range(n).select(
        (F.col("id") % 100).cast("long").alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    dim = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("d"), F.col("id")).alias("name"),
    )
    t_skew = _mk_table(spark, skewed, tmp_path / "skew", "k")
    t_unif = _mk_table(spark, uniform, tmp_path / "unif", "k")
    t_dim = _mk_table(spark, dim, tmp_path / "dim", "k")
    t_skew.analyze_histograms(spark, ["k"], bins=8)
    t_unif.analyze_histograms(spark, ["k"], bins=8)

    # tiny build side -> broadcast regardless of probe shape
    d = join_strategy_from_stats(t_skew.snapshot(), t_dim.snapshot(), "k")
    assert d["strategy"] == "broadcast" and d["small_rows"] == 100

    # big build side + skewed probe -> salted (the volume floor
    # scaled to the fixture: a skewed RATIO only straggles when the
    # hot volume is absolutely large — A/B-calibrated default 30M)
    d = join_strategy_from_stats(
        t_skew.snapshot(), t_unif.snapshot(), "k",
        broadcast_max_rows=10, salt_min_hot_rows=10_000,
    )
    assert d["strategy"] == "salted"
    assert d["skew_factor"] >= 4.0  # 80% of rows in one bin of 8
    assert d["hot_bin_rows"] >= 10_000

    # same skew ratio under the volume floor -> plain (AQE-trusting)
    d = join_strategy_from_stats(
        t_skew.snapshot(), t_unif.snapshot(), "k", broadcast_max_rows=10
    )
    assert d["strategy"] == "plain"

    # big build side + uniform probe -> plain
    d = join_strategy_from_stats(
        t_unif.snapshot(), t_skew.snapshot(), "k", broadcast_max_rows=10
    )
    assert d["strategy"] == "plain"
    assert d["skew_factor"] < 4.0

    # missing histograms raise instead of silently guessing
    import pytest as _pytest

    with _pytest.raises(ValueError, match="analyze_histograms"):
        join_strategy_from_stats(
            t_dim.snapshot(), t_unif.snapshot(), "k", broadcast_max_rows=10
        )

    # executed results are identical across all three strategies
    want = sorted(
        map(
            tuple,
            t_skew.read(spark)
            .join(t_dim.read(spark), "k")
            .select("k", "v", "name")
            .collect(),
        )
    )
    for kwargs in (
        {},  # broadcast
        {"broadcast_max_rows": 10, "salt_min_hot_rows": 10_000},  # salted
        {"broadcast_max_rows": 10, "skew_factor_threshold": 99.0},  # plain
    ):
        dec, df = join_analyzed(spark, t_skew, t_dim, "k", **kwargs)
        got = sorted(map(tuple, df.select("k", "v", "name").collect()))
        assert got == want, dec


# ---------------------------------------------------------------------------
# round-9 hardening (ADVICE r8)
# ---------------------------------------------------------------------------


def test_replay_batches_null_keys_reach_state(spark):
    """replay_batches must be a TRUE partition of the input: NULL keys
    (pmod(NULL, n) is NULL — matches no bucket) land in batch 0
    instead of silently reaching no update call (ADVICE r8)."""
    from big_data_computing__spark.streaming.replay import replay_batches

    class Counter:
        def __init__(self):
            self.n = 0

        def update(self, df, bid):
            self.n += df.count()

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (None, "d"), (7, "e")],
        "k long, v string",
    )
    st = Counter()
    replay_batches(df, st, key=F.col("k"), n_batches=3)
    assert st.n == 5  # every row, NULL keys included


def test_join_gate_byte_budget():
    """A manifest-small (rows) but byte-fat build side must NOT
    broadcast; legacy manifests without size_bytes gate on rows alone
    (ADVICE r8)."""
    from big_data_computing__spark.operators.relational import (
        join_strategy_from_stats,
    )

    hist = {"lo": 0.0, "hi": 8.0, "counts": [100] * 8}
    big = {"files": [{"n_rows": 10_000_000, "hist_k": hist}]}

    fat = {"files": [{"n_rows": 500, "size_bytes": 4 << 30}]}
    d = join_strategy_from_stats(big, fat, "k")
    assert d["strategy"] != "broadcast"
    assert d["small_bytes"] == 4 << 30

    slim = {"files": [{"n_rows": 500, "size_bytes": 1 << 20}]}
    assert (
        join_strategy_from_stats(big, slim, "k")["strategy"]
        == "broadcast"
    )

    legacy = {"files": [{"n_rows": 500}]}  # pre-size_bytes manifest
    d = join_strategy_from_stats(big, legacy, "k")
    assert d["strategy"] == "broadcast" and d["small_bytes"] is None


def test_join_gate_straddled_hot_bin():
    """A hot key split across two adjacent global bins by the overlay's
    proportional re-binning must still read as skewed: the gate takes
    the max over 2-bin sliding windows too (ADVICE r8)."""
    from big_data_computing__spark.operators.relational import (
        join_strategy_from_stats,
    )

    # file A's grid is shifted half a bin vs file B, so the hot key
    # (~79% of rows, at the shared value 4.0) lands half in global
    # bin 3 and half in bin 4: each single bin reads ~40%, under the
    # 4.0x-of-uniform-share threshold for 8 bins, but the 2-bin
    # window sees the full volume
    hot_a = {"lo": 0.0, "hi": 8.0, "counts": [150] * 4 + [19_400] + [200] * 3}
    hot_b = {"lo": 0.5, "hi": 8.5, "counts": [150] * 3 + [19_400] + [200] * 4}
    big = {
        "files": [
            {"n_rows": 20_450, "hist_k": hot_a},
            {"n_rows": 20_450, "hist_k": hot_b},
        ]
    }
    small = {"files": [{"n_rows": 10_000_000, "size_bytes": 4 << 30}]}
    d = join_strategy_from_stats(
        big, small, "k", broadcast_max_rows=10, salt_min_hot_rows=10_000
    )
    assert d["strategy"] == "salted", d
    assert d["hot_bin_rows"] >= 30_000


def test_knn_index_state_durable_replay(spark, sf_dir, tmp_path):
    """The replay guard survives a process restart: a NEW KnnIndexState
    over the same on-disk logs skips fully-committed batches (no
    duplicate candidate rows), and a half-committed batch (candidates
    logged, index append lost) is repaired index-only (ADVICE r8)."""
    import os

    from big_data_computing__spark.operators import similarity as sim
    from big_data_computing__spark.sources.readers import read_table
    from big_data_computing__spark.streaming import ann_stream as A

    emb = read_table(spark, sf_dir, "embeddings").where("vec_id < 120")
    centers = sim.build_ivf_centroids(emb, n_cells=4, seed=42, l=2)
    idx, cand = str(tmp_path / "didx"), str(tmp_path / "dcand")
    st = A.KnnIndexState(idx, cand, centers, k=3, nprobe=2)
    st.update(emb.where("vec_id % 2 = 0"), 0)
    st.update(emb.where("vec_id % 2 = 1"), 1)
    want = sorted(map(tuple, st.topk(spark).collect()))
    n_cands = spark.read.parquet(cand).count()

    # restart: fresh state object, same dirs, replayed batch -> no-op
    st2 = A.KnnIndexState(idx, cand, centers, k=3, nprobe=2)
    st2.update(emb.where("vec_id % 2 = 1"), 1)
    assert spark.read.parquet(cand).count() == n_cands
    assert sorted(map(tuple, st2.topk(spark).collect())) == want

    # half-commit: drop batch 1's index partition (crash between the
    # two writes), then replay on a fresh state -> candidates NOT
    # re-written, the missing index partition restored, parity intact
    import shutil

    idx3, cand3 = str(tmp_path / "hidx"), str(tmp_path / "hcand")
    st3 = A.KnnIndexState(idx3, cand3, centers, k=3, nprobe=2)
    st3.update(emb.where("vec_id % 2 = 0"), 0)
    st3.update(emb.where("vec_id % 2 = 1"), 1)
    shutil.rmtree(os.path.join(idx3, "batch_id=1"))
    n_cands3 = spark.read.parquet(cand3).count()
    st4 = A.KnnIndexState(idx3, cand3, centers, k=3, nprobe=2)
    st4.update(emb.where("vec_id % 2 = 1"), 1)
    assert spark.read.parquet(cand3).count() == n_cands3
    assert (
        spark.read.parquet(idx3).select("vid").distinct().count()
        == emb.count()
    )
    assert sorted(map(tuple, st4.topk(spark).collect())) == want

    # mid-job-commit debris (ADVICE r9): a crash DURING the candidate
    # job commit leaves part files visible but no _SUCCESS marker (and
    # no index write — it runs after). The batch must read as
    # UNcommitted: the replay prunes the debris and rewrites both
    # partitions (the old row-level batch_id scan saw the partial rows,
    # skipped the re-append, and lost the missing rows forever)
    os.remove(os.path.join(cand3, "batch_id=1", "_SUCCESS"))
    shutil.rmtree(os.path.join(idx3, "batch_id=1"))
    st5 = A.KnnIndexState(idx3, cand3, centers, k=3, nprobe=2)
    st5.update(emb.where("vec_id % 2 = 1"), 1)
    assert spark.read.parquet(cand3).count() == n_cands3
    assert (
        spark.read.parquet(idx3).select("vid").distinct().count()
        == emb.count()
    )
    assert sorted(map(tuple, st5.topk(spark).collect())) == want


def test_lsh_cap_from_stats():
    """The derived super-bucket cap follows the linear pair budget
    b = sqrt(2·budget·N) with floor and absolute ceiling (VERDICT r8
    item #5: the last hardcoded threshold, now manifest-driven)."""
    from big_data_computing__spark.operators.dedup import (
        LSH_MAX_BUCKET,
        lsh_max_bucket_from_stats,
    )

    def snap(n):
        return {"files": [{"n_rows": n // 2}, {"n_rows": n - n // 2}]}

    assert lsh_max_bucket_from_stats(snap(0)) == 64  # floor
    assert lsh_max_bucket_from_stats(snap(100)) == 64  # floor
    # 1M rows, budget 8 -> sqrt(16M) = 4000
    assert lsh_max_bucket_from_stats(snap(1_000_000)) == 4000
    # monotone in N; ceiling at LSH_MAX_BUCKET
    assert lsh_max_bucket_from_stats(snap(10**8)) == 40_000
    assert (
        lsh_max_bucket_from_stats(snap(10**8))
        < lsh_max_bucket_from_stats(snap(10**12))
        == LSH_MAX_BUCKET
    )


def test_lsh_index_state_durable_replay(spark, sf_dir, tmp_path):
    """LshIndexState's replay guard survives a process restart (the
    KnnIndexState pattern): a NEW state over the same on-disk logs
    skips committed batches, and a half-committed batch (pairs
    logged, index append lost) is repaired signatures-only."""
    import os

    from big_data_computing__spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from big_data_computing__spark.sources.readers import read_table
    from big_data_computing__spark.streaming.dedup_stream import (
        LshIndexState,
    )

    docs = read_table(spark, sf_dir, "documents").where("doc_id < 120")
    idx, prs = str(tmp_path / "lidx"), str(tmp_path / "lprs")
    st = LshIndexState(idx, prs)
    st.update(docs.where("doc_id % 2 = 0"), 0)
    st.update(docs.where("doc_id % 2 = 1"), 1)
    want = sorted(map(tuple, minhash_lsh_pairs(docs).collect()))
    assert sorted(map(tuple, st.pairs(spark).collect())) == want
    n_pairs = spark.read.parquet(prs).count()

    # restart: replayed batch is a no-op on both logs
    st2 = LshIndexState(idx, prs)
    st2.update(docs.where("doc_id % 2 = 1"), 1)
    assert spark.read.parquet(prs).count() == n_pairs
    assert sorted(map(tuple, st2.pairs(spark).collect())) == want

    # half-commit: drop batch 1's index partition, replay on a fresh
    # state -> pairs NOT re-written, signatures restored
    import shutil

    shutil.rmtree(os.path.join(idx, "batch_id=1"))
    st3 = LshIndexState(idx, prs)
    st3.update(docs.where("doc_id % 2 = 1"), 1)
    assert spark.read.parquet(prs).count() == n_pairs
    assert (
        spark.read.parquet(idx).select("doc_id").distinct().count()
        == docs.count()
    )
    assert sorted(map(tuple, st3.pairs(spark).collect())) == want

    # mid-job-commit debris (ADVICE r9): pair part files without the
    # _SUCCESS marker (and no index write) -> pruned and rewritten,
    # never skipped-as-seen
    os.remove(os.path.join(prs, "batch_id=1", "_SUCCESS"))
    shutil.rmtree(os.path.join(idx, "batch_id=1"))
    st4 = LshIndexState(idx, prs)
    st4.update(docs.where("doc_id % 2 = 1"), 1)
    assert spark.read.parquet(prs).count() == n_pairs
    assert sorted(map(tuple, st4.pairs(spark).collect())) == want


def test_lsh_greedy_within_equals_uncapped_pairs(spark, sf_dir):
    """The pair-free within-batch rejection set (bucket-min rule) is
    IDENTICAL to 'appears as doc_b in the uncapped pair graph' — the
    equivalence the ingest gate's exactness rests on."""
    from big_data_computing__spark.operators.dedup import (
        lsh_greedy_within_rejects,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from big_data_computing__spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    got = {
        r["doc_id"]
        for r in lsh_greedy_within_rejects(sigs).collect()
    }
    want = {
        r["doc_b"]
        for r in minhash_lsh_pairs(
            docs, sigs=sigs, max_bucket=None
        ).collect()
    }
    assert got == want and want  # non-degenerate fixture


def test_lsh_greedy_cross_equals_uncapped_probe(spark, sf_dir):
    """The fan-out-free cross-batch rejection set (band-key
    membership) equals the distinct new side of the uncapped
    incremental probe."""
    from big_data_computing__spark.operators.dedup import (
        incremental_lsh_duplicates,
        lsh_greedy_cross_rejects,
        minhash_signatures,
    )
    from big_data_computing__spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 2 = 1")
    csigs = minhash_signatures(corpus)
    nsigs = minhash_signatures(new)
    got = {
        r["doc_id"]
        for r in lsh_greedy_cross_rejects(nsigs, csigs).collect()
    }
    want = {
        r["new_doc_id"]
        for r in incremental_lsh_duplicates(
            new, csigs, new_sigs=nsigs, max_bucket=None
        ).collect()
    }
    assert got == want and want  # non-degenerate fixture


def _gopher_passing_doc(doc_id: int, words: list) -> tuple:
    text = " ".join(words)
    return (doc_id, text, "en", "synth", len(text))


def test_ingest_gate_boilerplate_superbucket(spark, tmp_path):
    """ADVICE r9 (medium): a boilerplate band bucket larger than the
    old derived cap (floor 64) but under the old static 100k cap must
    still be DEDUPED by the ingest gate — the capped-pair-join gate
    silently accepted all of it (dropped buckets contribute no pairs).
    The exact gate accepts only the earliest boilerplate arrival."""
    from big_data_computing__spark.streaming.ingest_pipeline import (
        IngestPipeline,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    vocab = [
        "the", "system", "keeps", "sorted", "rows", "under", "merge",
        "windows", "while", "batch", "readers", "scan", "older",
        "files", "without", "locking", "writers", "during", "compact",
        "runs",
    ]
    # batch 0: six distinct gopher-passing docs (rotations give
    # distinct shingle sets)
    b0 = [
        _gopher_passing_doc(i, (vocab[i:] + vocab[:i]) * 3)
        for i in range(6)
    ]
    # batch 1: 80 IDENTICAL boilerplate docs (one 80-doc bucket in
    # every band — over the old derived cap of 64, under 100k) plus
    # five distinct docs
    boiler = list(reversed(vocab)) * 3
    b1 = [_gopher_passing_doc(100 + i, boiler) for i in range(80)]
    b1 += [
        _gopher_passing_doc(200 + i, (vocab[6 + i:] + vocab[:6 + i]) * 3)
        for i in range(5)
    ]
    pipe = IngestPipeline(
        str(tmp_path / "corpus"), str(tmp_path / "sig_index")
    )
    pipe.process(spark.createDataFrame(b0, schema), batch_id=0)
    pipe.process(spark.createDataFrame(b1, schema), batch_id=1)

    got = {r["doc_id"] for r in pipe.table.read(spark).collect()}
    accepted_boiler = sorted(d for d in got if 100 <= d < 180)
    assert accepted_boiler == [100], accepted_boiler

    # belt and braces: the full accepted set equals the independent
    # greedy recompute over the UNCAPPED pair graph
    from big_data_computing__spark.operators.curation import (
        gopher_quality_report,
    )
    from big_data_computing__spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    all_docs = spark.createDataFrame(b0 + b1, schema)
    surv = {
        r["doc_id"]
        for r in gopher_quality_report(all_docs)
        .where(F.col("passes"))
        .collect()
    }
    assert len(surv) == len(b0) + len(b1)  # all synthetic docs pass
    arrival = lambda d: (0 if d < 100 else 1, d)
    partners: dict = {}
    for r in minhash_lsh_pairs(
        all_docs, max_bucket=None
    ).collect():
        a, b = r["doc_a"], r["doc_b"]
        if a in surv and b in surv:
            partners.setdefault(a, set()).add(b)
            partners.setdefault(b, set()).add(a)
    want = {
        d
        for d in surv
        if not any(
            arrival(p) < arrival(d) for p in partners.get(d, ())
        )
    }
    assert got == want
