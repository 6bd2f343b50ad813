"""Closed-form ridge regression (operators/regression.py).

The oracle twin already pins the Gram sums and the Cramer solve
value-for-value against DuckDB HUGEINT; these tests pin what the twin
cannot see — agreement with an INDEPENDENT solver (numpy lstsq on the
ridge-augmented system), the ridge behaviour on a degenerate
(constant-feature) fixture, and the 100 TB plan shape (one partial
aggregation, broadcast scoring join).
"""

from __future__ import annotations

import numpy as np
import pytest

from big_data_computing__spark.operators import regression as rg
from big_data_computing__spark.sources.readers import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF_DIR, "documents")


def test_betas_match_numpy_closed_form(spark, docs):
    """The in-plan Cramer solve equals numpy's independent solve of
    (X'X + lam*I_feat) b = X'y on the same integer features."""
    feats = rg.quality_features(docs).toPandas()
    X = np.column_stack(
        [
            np.ones(len(feats)),
            feats.x1.to_numpy(float),
            feats.x2.to_numpy(float),
            feats.x3.to_numpy(float),
        ]
    )
    y = feats.y.to_numpy(float)
    A = X.T @ X + rg.RIDGE_LAMBDA * np.diag([0.0, 1.0, 1.0, 1.0])
    expected = np.linalg.solve(A, X.T @ y)
    row = rg.ridge_betas(docs).collect()[0]
    got = np.array([row.b0, row.b1, row.b2, row.b3])
    # betas are rounded to 6 dp in-plan; the Cramer ratio and the LU
    # solve agree to far better than that on a well-conditioned system
    assert np.allclose(got, np.round(expected, 6), atol=2e-6), (
        got,
        expected,
    )
    assert row.det != 0.0


def test_scores_are_the_linear_map(spark, docs):
    """score column == b0 + b1 x1 + b2 x2 + b3 x3 recomputed from the
    fitted betas, and the label/feature columns match
    quality_features exactly."""
    betas = rg.ridge_betas(docs).collect()[0]
    scored = rg.ridge_quality_scores(docs).toPandas()
    expected = (
        betas.b0
        + betas.b1 * scored.x1
        + betas.b2 * scored.x2
        + betas.b3 * scored.x3
    )
    assert np.allclose(scored.score, np.round(expected, 6), atol=2e-6)
    feats = rg.quality_features(docs).toPandas().set_index("doc_id")
    merged = scored.set_index("doc_id")
    for c in ("x1", "x2", "x3", "y"):
        assert (merged[c] == feats[c]).all()


def test_scores_separate_gate_classes(spark, docs):
    """The student actually learned the teacher: mean score of
    gate-passing docs exceeds mean score of failing docs (both classes
    non-degenerate on the fixture)."""
    scored = rg.ridge_quality_scores(docs).toPandas()
    passed = scored[scored.y == rg.Y_PASS]
    failed = scored[scored.y == 0]
    assert len(passed) > 10 and len(failed) > 10
    assert passed.score.mean() > failed.score.mean() + 10


def test_ridge_survives_constant_feature(spark):
    """With a constant feature the unregularized normal equations are
    singular; the ridge diagonal keeps det != 0 and the solve finite.
    All-alphabetic single-rep docs pin x3 = 100 for every row."""
    docs = spark.createDataFrame(
        [(i, ("word%d " % (i % 7)) * (20 + i % 5)) for i in range(60)],
        "doc_id long, text string",
    )
    row = rg.ridge_betas(docs).collect()[0]
    assert row.det != 0.0
    assert all(np.isfinite([row.b0, row.b1, row.b2, row.b3]))
    feats = rg.quality_features(docs).toPandas()
    assert (feats.x3 == 100).all()


def test_gram_is_one_partial_aggregation(spark, docs):
    """Plan shape: the fit is a global HashAggregate (partial → final
    over a single-row group) — no Exchange keyed on data columns, no
    window, no sort. At 100 TB the only shuffle is 14 partial sums."""
    plan = rg.ridge_betas(docs)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Window" not in plan and "Sort" not in plan


def test_scoring_broadcasts_coefficients(spark, docs):
    """Inference must not shuffle the corpus: the 1-row beta table is
    broadcast onto the feature scan."""
    plan = (
        rg.ridge_quality_scores(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_quality_calibration_buckets_partition_corpus(spark, sf_dir):
    """Decile buckets must partition the corpus (sizes sum to N, every
    bucket within ±1 of N/10) and pass_milli must be consistent with
    its bucket's own counts."""
    from big_data_computing__spark.operators.regression import (
        quality_calibration_report,
    )
    from big_data_computing__spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    rows = quality_calibration_report(docs).collect()
    assert sorted(r["bucket"] for r in rows) == list(range(10))
    assert sum(r["n_docs"] for r in rows) == n
    for r in rows:
        assert abs(r["n_docs"] - n / 10) <= 1
        assert r["pass_milli"] == (1000 * r["n_pass"]) // r["n_docs"]
        assert r["min_score"] <= r["max_score"]
