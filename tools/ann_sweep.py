"""Recall-vs-nprobe sweep for the indexed ANN tiers.

Measures the recall/latency contract the IVF knobs promise: for each
``nprobe`` (and each indexed variant), recall@k against the exact
brute-force cosine truth plus wall time, on the real embeddings fixture.
Quantizers are trained ONCE per variant family and passed in as
pretrained state, so the sweep times the *search* path — the
steady-state cost of a persisted index — not repeated training.

Usage:
    python tools/ann_sweep.py [sf_dir] [k] [nprobe,nprobe,...]
    python tools/ann_sweep.py --clustered [sf_dir] [k]
    python tools/ann_sweep.py --shortlist [sf_dir] [k]
    python tools/ann_sweep.py --bands [sf_dir] [k]
    python tools/ann_sweep.py --binary [sf_dir] [k]
    python tools/ann_sweep.py --mutual [sf_dir] [k] [--clustered]

Defaults: /root/testdata/sf0.01, k=3, nprobe sweep 1,2,4,8. Prints one
markdown table and one machine-readable JSON line.

``--clustered`` reshapes the fixture into the regime real embedding
corpora live in — tight clusters with anisotropic (decaying per-
dimension) variance — and compares the PQ tiers pairwise: flat PQ vs
OPQ (does the learned rotation buy recall when dimension variance is
unbalanced?) and IVF-PQ vs residual IVF-PQ (does encoding residuals buy
recall when vectors share large cluster offsets?). The near-uniform
random fixture cannot express either gain (STRESS.md documents why);
this mode exists so the claims "OPQ helps on structured data" and
"residual coding helps on clustered data" are measured, not asserted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_computing__spark.operators import similarity as sim
from big_data_computing__spark.session import get_session
from big_data_computing__spark.sources.readers import read_table

N_CELLS = 8
SEED = 42
L = 4


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall_at_k(pred: dict[int, set[int]], truth: dict[int, set[int]]) -> float:
    hits = sum(len(pred.get(q, set()) & t) for q, t in truth.items())
    denom = sum(len(t) for t in truth.values())
    return hits / denom if denom else 0.0


def clustered_fixture(emb, n_clusters: int = 8, blend: float = 0.25,
                      decay: float = 16.0):
    """Deterministically reshape the embeddings into ``n_clusters``
    tight anisotropic clusters: row i becomes
    ``(center[i % C] + blend·vec[i]) ⊙ exp(-j/decay)`` — cluster
    structure from the shared centers (rows 0..C-1 of the fixture
    itself), anisotropy from the exponential per-dimension damping.
    Same schema as the source table, so every ANN tier runs unchanged."""
    from pyspark.sql import functions as F

    seeds = emb.where(F.col("vec_id") < n_clusters).select(
        F.col("vec_id").alias("c"), F.col("embedding").alias("center")
    )
    return (
        emb.withColumn("c", F.col("vec_id") % n_clusters)
        .join(F.broadcast(seeds), "c")
        .withColumn(
            "embedding",
            F.expr(
                f"transform(zip_with(center, embedding,"
                f" (c, v) -> c + {blend} * v),"
                f" (x, j) -> x * exp(-j / {decay}))"
            ),
        )
        .drop("c", "center")
    )


def run_clustered(sf_dir: str, k: int) -> None:
    spark = get_session(app_name="ann_sweep_clustered")
    spark.sparkContext.setLogLevel("ERROR")
    emb = clustered_fixture(
        read_table(spark, sf_dir, "embeddings")
    ).cache()
    emb.count()

    queries = emb.where("vec_id % 10 = 0")
    truth = _topk_sets(sim.cosine_topk(emb, queries=queries, k=k))

    centers = sim.build_ivf_centroids(emb, n_cells=N_CELLS, seed=SEED, l=L)
    flat_books = sim.train_pq_codebooks(emb, seed=SEED)
    res_books = sim.train_pq_codebooks_residual(
        emb, centers=centers, seed=SEED
    )
    rotation, opq_books = sim.train_opq(emb, seed=SEED)
    crot, ccenters, cbooks = sim.train_opq_ivf_rpq(
        emb, n_cells=N_CELLS, l=L, seed=SEED
    )
    # larger-m tier: double the subquantizers (FAISS's PQ16/OPQ16) —
    # does more code budget close the flat-PQ gap, and does the learned
    # rotation still add recall on top once m is generous?
    m16 = 16
    flat_books16 = sim.train_pq_codebooks(emb, m=m16, seed=SEED)
    rotation16, opq_books16 = sim.train_opq(emb, m=m16, seed=SEED)

    # the two A/Bs this mode exists for, plus the composed index
    variants = {
        "pq_flat": lambda: sim.pq_topk(emb, k=k, codebooks=flat_books),
        "opq": lambda: sim.opq_topk(
            emb, k=k, rotation=rotation, codebooks=opq_books
        ),
        "pq_flat_m16": lambda: sim.pq_topk(
            emb, k=k, m=m16, codebooks=flat_books16
        ),
        "opq_m16": lambda: sim.opq_topk(
            emb, k=k, m=m16, rotation=rotation16, codebooks=opq_books16
        ),
        "ivf_pq@2": lambda: sim.ivf_pq_topk(
            emb, k=k, n_cells=N_CELLS, nprobe=2,
            centers=centers, codebooks=flat_books,
        ),
        "ivf_rpq@2": lambda: sim.ivf_rpq_topk(
            emb, k=k, n_cells=N_CELLS, nprobe=2,
            centers=centers, codebooks=res_books,
        ),
        "opq_ivf_rpq@2": lambda: sim.opq_ivf_rpq_topk(
            emb, k=k, n_cells=N_CELLS, nprobe=2,
            rotation=crot, centers=ccenters, codebooks=cbooks,
        ),
    }
    rows = []
    for name, build in variants.items():
        t0 = time.time()
        pred = _topk_sets(build())
        rows.append(
            {
                "variant": name,
                "recall": round(recall_at_k(pred, truth), 3),
                "wall_sec": round(time.time() - t0, 2),
            }
        )

    print(f"\n| variant | recall@{k} | wall (s) |")
    print("|---------|-----------|----------|")
    for r in rows:
        print(f"| {r['variant']} | {r['recall']} | {r['wall_sec']} |")
    print(
        json.dumps(
            {
                "metric": "ann_recall_clustered",
                "sf_dir": sf_dir,
                "k": k,
                "n_cells": N_CELLS,
                "rows": rows,
            }
        )
    )
    spark.stop()


def run_shortlist(sf_dir: str, k: int) -> None:
    """Recall/latency vs ADC shortlist length for the PQ tiers (the
    other knob a deployed index tunes besides nprobe): fixed nprobe=2,
    shortlist swept. Recall should rise monotonically to the
    exact-re-rank ceiling while wall time grows with the re-rank set."""
    spark = get_session(app_name="ann_sweep_shortlist")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings").cache()
    emb.count()
    queries = emb.where("vec_id % 10 = 0")
    truth = _topk_sets(sim.cosine_topk(emb, queries=queries, k=k))
    centers = sim.build_ivf_centroids(emb, n_cells=N_CELLS, seed=SEED, l=L)
    flat_books = sim.train_pq_codebooks(emb, seed=SEED)
    res_books = sim.train_pq_codebooks_residual(
        emb, centers=centers, seed=SEED
    )
    variants = {
        "pq_flat": lambda s: sim.pq_topk(
            emb, k=k, codebooks=flat_books, shortlist=s
        ),
        "ivf_pq@2": lambda s: sim.ivf_pq_topk(
            emb, k=k, n_cells=N_CELLS, nprobe=2,
            centers=centers, codebooks=flat_books, shortlist=s,
        ),
        "ivf_rpq@2": lambda s: sim.ivf_rpq_topk(
            emb, k=k, n_cells=N_CELLS, nprobe=2,
            centers=centers, codebooks=res_books, shortlist=s,
        ),
    }
    rows = []
    for name, build in variants.items():
        for s in (8, 32, 128, 512):
            t0 = time.time()
            pred = _topk_sets(build(s))
            rows.append(
                {
                    "variant": name,
                    "shortlist": s,
                    "recall": round(recall_at_k(pred, truth), 3),
                    "wall_sec": round(time.time() - t0, 2),
                }
            )
    print(f"\n| variant | shortlist | recall@{k} | wall (s) |")
    print("|---------|-----------|-----------|----------|")
    for r in rows:
        print(
            f"| {r['variant']} | {r['shortlist']} | {r['recall']} "
            f"| {r['wall_sec']} |"
        )
    print(
        json.dumps(
            {
                "metric": "ann_recall_shortlist",
                "sf_dir": sf_dir,
                "k": k,
                "n_cells": N_CELLS,
                "rows": rows,
            }
        )
    )
    spark.stop()


def run_bands(sf_dir: str, k: int) -> None:
    """Recall vs band count for the sign-LSH tier (16-bit sketches):
    more bands of fewer bits = looser buckets = higher recall and more
    candidate pairs — the r/b trade every LSH deployment tunes."""
    from pyspark.sql import functions as F

    spark = get_session(app_name="ann_sweep_bands")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings").cache()
    emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    queries = emb.where("vec_id % 10 = 0")
    truth = _topk_sets(sim.cosine_topk(emb, queries=queries, k=k))
    rows = []
    for bands in (2, 4, 8, 16):
        t0 = time.time()
        pred = _topk_sets(
            sim.hyperplane_lsh_topk(emb, dim=dim, k=k, bands=bands).join(
                queries.select(F.col("vec_id").alias("query_id")),
                "query_id",
                "left_semi",
            )
        )
        rows.append(
            {
                "bands": bands,
                "band_bits": 16 // bands,
                "recall": round(recall_at_k(pred, truth), 3),
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    print(f"\n| bands | bits/band | recall@{k} | wall (s) |")
    print("|-------|-----------|-----------|----------|")
    for r in rows:
        print(
            f"| {r['bands']} | {r['band_bits']} | {r['recall']} "
            f"| {r['wall_sec']} |"
        )
    print(
        json.dumps(
            {
                "metric": "ann_recall_bands",
                "sf_dir": sf_dir,
                "k": k,
                "rows": rows,
            }
        )
    )
    spark.stop()


def run_binary(sf_dir: str, k: int) -> None:
    """Recall ladder of the compression tiers: 1-bit Hamming (pure and
    with exact re-rank at growing shortlists) vs the 8-bit int8 dot vs
    exact — how much recall each byte of code budget buys, and how far
    the rescore pass recovers what the 1-bit scan loses."""
    spark = get_session(app_name="ann_sweep_binary")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings").cache()
    emb.count()
    queries = emb.where("vec_id % 10 = 0")
    truth = _topk_sets(sim.cosine_topk(emb, queries=queries, k=k))

    variants = [
        ("hamming_pure", lambda: sim.hamming_topk(
            emb, queries=queries, k=k)),
        ("hamming_rerank_s8", lambda: sim.hamming_rerank_topk(
            emb, queries=queries, k=k, shortlist=8)),
        ("hamming_rerank_s32", lambda: sim.hamming_rerank_topk(
            emb, queries=queries, k=k, shortlist=32)),
        ("hamming_rerank_s128", lambda: sim.hamming_rerank_topk(
            emb, queries=queries, k=k, shortlist=128)),
        ("int8_brute_d64", lambda: sim.int8_topk(
            emb, k=k, dims=64, query_mod=10)),
    ]
    rows = []
    for name, build in variants:
        t0 = time.time()
        pred = _topk_sets(build())
        rows.append({
            "variant": name,
            "recall": round(recall_at_k(pred, truth), 3),
            "wall_sec": round(time.time() - t0, 2),
        })
    print(f"\n| variant | recall@{k} | wall (s) |")
    print("|---------|-----------|----------|")
    for r in rows:
        print(f"| {r['variant']} | {r['recall']} | {r['wall_sec']} |")
    print(json.dumps({
        "metric": "ann_binary_tier_sweep",
        "sf_dir": sf_dir, "k": k, "rows": rows,
    }))
    spark.stop()


def run_mutual(sf_dir: str, k: int, clustered: bool = False) -> None:
    """Pair recall of the CELLED mutual-kNN (ivf_topk candidate
    generator -> reciprocity join, the x_mutual_knn_ivf production
    shape) against the exact reciprocal-pair truth (brute cosine
    top-k -> same join), over an nprobe sweep. The reciprocity join
    is fixed algebra; every recall point is purely the candidate
    generator's, which is the documented claim behind the one-line
    generator swap.

    ``clustered``: run on the clustered anisotropic fixture instead of
    the near-uniform one — the near-uniform fixture is cell pruning's
    documented WORST case (neighbors spread across cells), so the
    production-shape recall/false-pair numbers belong to the regime
    real embedding corpora live in (VERDICT r8 item #7)."""
    spark = get_session(app_name="ann_sweep_mutual")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings")
    if clustered:
        emb = clustered_fixture(emb)
    emb = emb.cache()
    emb.count()

    def pair_set(df):
        return {(r["vec_a"], r["vec_b"]) for r in df.collect()}

    t0 = time.time()
    truth = pair_set(sim.mutual_knn_pairs(emb, k=k))
    brute_wall = round(time.time() - t0, 2)
    centers = sim.build_ivf_centroids(emb, n_cells=N_CELLS, seed=SEED, l=L)
    rows = []
    for nprobe in (1, 2, 4, 8):
        t0 = time.time()
        got = pair_set(
            sim.mutual_knn_pairs(
                emb,
                k=k,
                topk=sim.ivf_topk(
                    emb, k=k, nprobe=nprobe, centers=centers
                ),
            )
        )
        wall = round(time.time() - t0, 2)
        rows.append(
            {
                "nprobe": nprobe,
                "pairs": len(got),
                "pair_recall": round(
                    len(got & truth) / len(truth), 3
                ) if truth else 1.0,
                "false_pairs": len(got - truth),
                "wall_sec": wall,
            }
        )
    print(f"\nexact reciprocal pairs: {len(truth)} ({brute_wall} s brute)")
    print(f"| nprobe | pairs | pair recall@{k} | false pairs | wall (s) |")
    print("|--------|-------|-----------|-------------|----------|")
    for r in rows:
        print(
            f"| {r['nprobe']} | {r['pairs']} | {r['pair_recall']} "
            f"| {r['false_pairs']} | {r['wall_sec']} |"
        )
    print(
        json.dumps(
            {
                "metric": "mutual_knn_pair_recall"
                + ("_clustered" if clustered else ""),
                "k": k,
                "truth_pairs": len(truth),
                "brute_wall_sec": brute_wall,
                "rows": rows,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--mutual":
        clustered = "--clustered" in sys.argv
        rest = [a for a in sys.argv[2:] if a != "--clustered"]
        run_mutual(
            rest[0] if rest else "/root/testdata/sf0.01",
            int(rest[1]) if len(rest) > 1 else 3,
            clustered=clustered,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--binary":
        run_binary(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01",
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--bands":
        run_bands(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01",
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--clustered":
        run_clustered(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01",
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--shortlist":
        run_shortlist(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01",
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    probes = (
        [int(p) for p in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [1, 2, 4, 8]
    )
    spark = get_session(app_name="ann_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings").cache()
    emb.count()

    queries = emb.where("vec_id % 10 = 0")
    truth = _topk_sets(sim.cosine_topk(emb, queries=queries, k=k))

    # shared pretrained state: one FFT quantizer, one flat + one
    # residual codebook set — the persisted-index reuse path
    centers = sim.build_ivf_centroids(emb, n_cells=N_CELLS, seed=SEED, l=L)
    flat_books = sim.train_pq_codebooks(emb, seed=SEED)
    res_books = sim.train_pq_codebooks_residual(
        emb, centers=centers, seed=SEED
    )
    crot, ccenters, cbooks = sim.train_opq_ivf_rpq(
        emb, n_cells=N_CELLS, l=L, seed=SEED
    )

    variants = {
        "ivf": lambda np_: sim.ivf_topk(
            emb, k=k, n_cells=N_CELLS, nprobe=np_, centers=centers
        ),
        "ivf_pq": lambda np_: sim.ivf_pq_topk(
            emb,
            k=k,
            n_cells=N_CELLS,
            nprobe=np_,
            centers=centers,
            codebooks=flat_books,
        ),
        "ivf_rpq": lambda np_: sim.ivf_rpq_topk(
            emb,
            k=k,
            n_cells=N_CELLS,
            nprobe=np_,
            centers=centers,
            codebooks=res_books,
        ),
        "opq_ivf_rpq": lambda np_: sim.opq_ivf_rpq_topk(
            emb,
            k=k,
            n_cells=N_CELLS,
            nprobe=np_,
            rotation=crot,
            centers=ccenters,
            codebooks=cbooks,
        ),
    }

    rows = []
    for name, build in variants.items():
        for np_ in probes:
            t0 = time.time()
            pred = _topk_sets(build(np_))
            wall = time.time() - t0
            rows.append(
                {
                    "variant": name,
                    "nprobe": np_,
                    "recall": round(recall_at_k(pred, truth), 3),
                    "wall_sec": round(wall, 2),
                }
            )

    print(f"\n| variant | nprobe | recall@{k} | wall (s) |")
    print("|---------|--------|-----------|----------|")
    for r in rows:
        print(
            f"| {r['variant']} | {r['nprobe']} | {r['recall']} "
            f"| {r['wall_sec']} |"
        )
    print(
        json.dumps(
            {
                "metric": "ann_recall_sweep",
                "sf_dir": sf_dir,
                "k": k,
                "n_cells": N_CELLS,
                "rows": rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
