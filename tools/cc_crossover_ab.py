"""Mid-regime A/B for the auto-dispatching CC closure
(dedup.duplicate_components_auto): measure shortcut vs two-phase at
~10⁶ edges — BETWEEN the two regimes the r8 ladder measured (~10⁵:
shortcut 4.7 s vs two-phase 13.2 s; ~10⁷: two-phase 109 s vs 147.9 s)
— so the 2M-edge dispatch threshold is bracketed by measurements
instead of interpolated between them (VERDICT r8 item #4).

The edge list is the REAL dup graph of the pipeline-stress corpus
(synth_corpus → minhash_lsh_pairs), not a synthetic chain: the
crossover claim is about the workload the dispatcher actually serves.
As in the composed pipeline, the junk class (exact duplicates of one
text) is removed BEFORE LSH — in the pipeline that's the exact-dedup
stage's job; left in, its single band bucket self-joins into n_junk²/2
edges (measured: 2.67B edges from 73k junk docs at n_docs=730k — the
exact pathology lsh_max_bucket_from_stats guards against). Edge count
scales ≈ 1.4 × n_docs after the filter, so n_docs ≈ 730k lands near
10⁶ edges.

Usage: python tools/cc_crossover_ab.py [n_docs] (default 730_000) —
results recorded in the STRESS.md CC ladder (r9).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from big_data_computing__spark.operators.dedup import (  # noqa: E402
    duplicate_components_shortcut,
    duplicate_components_twophase,
    minhash_lsh_pairs,
)
from big_data_computing__spark.session import get_session  # noqa: E402
from tools.pipeline_stress import synth_corpus  # noqa: E402

REPEATS = 3


def main(n_docs: int) -> None:
    spark = get_session(app_name="cc_crossover_ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        synth_corpus(spark, n_docs)
        .where(~F.col("text").startswith("zq"))
        .localCheckpoint()
    )
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs).localCheckpoint()
    n_edges = pairs.count()
    print(
        f"n_docs={n_docs} n_edges={n_edges} "
        f"(lsh {round(time.time() - t0, 1)} s)"
    )

    walls: dict[str, float] = {}
    outputs: dict[str, int] = {}
    for name, fn in (
        ("shortcut", duplicate_components_shortcut),
        ("twophase", duplicate_components_twophase),
    ):
        runs = []
        for _ in range(REPEATS):
            t0 = time.time()
            out = fn(pairs)
            # one row: (row count, order-free label hash) — the
            # identical-output assertion, paid inside the timed run
            # identically for both variants (bit_xor, not sum: a sum
            # of 64-bit hashes overflows under ANSI mode)
            sig = out.agg(
                F.count("*").cast("long"),
                F.expr("bit_xor(xxhash64(doc_id, component_id))"),
            ).collect()[0]
            runs.append(time.time() - t0)
        walls[name] = round(statistics.median(runs), 2)
        outputs[name] = tuple(sig)
        print(f"{name}: {walls[name]} s median of {runs}")
    assert outputs["shortcut"] == outputs["twophase"], outputs
    print(
        json.dumps(
            {
                "metric": "cc_crossover_ab",
                "n_docs": n_docs,
                "n_edges": n_edges,
                "wall_shortcut_s": walls["shortcut"],
                "wall_twophase_s": walls["twophase"],
                "faster": min(walls, key=walls.get),
                "n_component_rows": outputs["shortcut"][0],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 730_000)
