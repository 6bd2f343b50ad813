"""Property-based tests (hypothesis) for the engine's pure kernels and
the guarantees the randomized operators must satisfy regardless of seed
(SURVEY.md §5 item 4: unseeded behavior is property-tested)."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_computing__spark.functions.geometry import grid_lambda
from big_data_computing__spark.functions.hashing import (
    MINHASH_PRIME,
    minhash_coeff_a,
    minhash_coeff_b,
)
from big_data_computing__spark.operators.clustering import sequential_fft
from big_data_computing__spark.operators.frequent import (
    reservoir_size,
    sticky_rate,
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(st.floats(min_value=1e-6, max_value=1e6))
def test_grid_lambda_cell_diameter_bound(d):
    """Any two points in one Λ-cell are within D (the grid invariant the
    approximation depends on): cell diagonal = Λ·√2 = D/2 ≤ D."""
    lam = grid_lambda(d)
    assert lam * math.sqrt(2.0) <= d / 2 + 1e-9


@given(
    st.lists(
        st.tuples(finite, finite), min_size=1, max_size=60, unique=True
    ),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_fft_centers_subset_and_radius_monotone(points, k, seed):
    pts = np.array(points, dtype=np.float64)
    centers = sequential_fft(pts, k, seed=seed)
    assert len(centers) == min(k, len(pts))
    pt_set = {tuple(p) for p in pts}
    for c in centers:
        assert tuple(c) in pt_set
    # the k-center objective never increases as k grows
    def radius(cs):
        d = np.min(
            np.linalg.norm(pts[:, None, :] - cs[None, :, :], axis=2), axis=1
        )
        return float(d.max())

    if len(pts) > k:
        bigger = sequential_fft(pts, k + 1, seed=seed)
        assert radius(bigger) <= radius(centers) + 1e-9


@given(st.integers(min_value=0, max_value=10_000))
def test_minhash_family_valid(i):
    a, b = minhash_coeff_a(i), minhash_coeff_b(i)
    assert 1 <= a < MINHASH_PRIME
    assert 0 <= b < MINHASH_PRIME
    # no bigint overflow: max (a·x + b) with x < p
    assert a * (MINHASH_PRIME - 1) + b < 2**63


@given(st.floats(min_value=1e-4, max_value=0.5))
def test_reservoir_size_ceiling(phi):
    m = reservoir_size(phi)
    assert m >= 1 / phi
    assert m - 1 < 1 / phi


@given(
    st.floats(min_value=1e-3, max_value=0.3),
    st.floats(min_value=1e-4, max_value=1e-3),
    st.floats(min_value=0.01, max_value=0.5),
)
def test_sticky_rate_positive_increasing_in_precision(phi, eps, delta):
    r = sticky_rate(phi, eps, delta)
    assert r > 0
    # tighter epsilon → more aggressive sampling
    assert sticky_rate(phi, eps / 2, delta) > r
