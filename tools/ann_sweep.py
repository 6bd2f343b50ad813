"""Recall-vs-nprobe sweep for the indexed ANN tiers.

Measures the recall/latency contract the IVF knobs promise: for each
``nprobe`` (and each indexed variant), recall@k against the exact
brute-force cosine truth plus wall time, on the real embeddings fixture.
Quantizers are trained ONCE per variant family and passed in as
pretrained state, so the sweep times the *search* path — the
steady-state cost of a persisted index — not repeated training.

Usage:
    python tools/ann_sweep.py [sf_dir] [k] [nprobe,nprobe,...]

Defaults: /root/testdata/sf0.01, k=3, nprobe sweep 1,2,4,8. Prints one
markdown table and one machine-readable JSON line.
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


def main() -> None:
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
