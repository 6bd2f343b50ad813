"""Composed pipelines mirroring the reference's end-to-end entry points.

EP2 (big_data_computing_2.py:118-171): read points → MRFFT(K) → use the
clustering radius as the distance threshold D for MRApproxOutliers.
The engine composes the same flow from its operator library, returning
both the summary DataFrame and the instrumentation the reference prints
(per-round ms, radius — big_data_computing_2.py:162-165).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import MRFFTResult, mr_fft
from .outliers import approx_outliers_summary


@dataclass
class FFTOutlierResult:
    radius: float
    summary: DataFrame
    fft: MRFFTResult
    timings_ms: dict[str, int]


def fft_radius_outliers(
    points_2d: DataFrame,
    k: int,
    l: int,
    m: int,
    seed: int = 0,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
) -> FFTOutlierResult:
    """HW2 flow: k-center radius on the 2-D points, then grid-approximate
    (M, D=radius)-outlier summary (reference big_data_computing_2.py:161-169).

    The 2-D points are lifted to the d-dim features form for MRFFT, then
    the returned radius parameterizes the cell grid.
    """
    pts_nd = points_2d.select(
        F.col(id_col).alias("id"),
        F.array(F.col(x).cast("double"), F.col(y).cast("double")).alias(
            "features"
        ),
    )
    fft = mr_fft(pts_nd, k=k, l=l, seed=seed)
    t0 = time.time()
    summary = approx_outliers_summary(points_2d, fft.radius, m, x=x, y=y)
    timings = dict(fft.timings_ms)
    timings["approx_outliers_plan_ms"] = int((time.time() - t0) * 1000)
    return FFTOutlierResult(
        radius=fft.radius, summary=summary, fft=fft, timings_ms=timings
    )
