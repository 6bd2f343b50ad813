"""Vector (array<double>) expressions for similarity search.

Pure Catalyst higher-order functions; element-sequential sums keep float
results bit-deterministic across partitionings and matching the DuckDB
oracle's ``list_dot_product`` evaluation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_vec(col: Column) -> Column:
    """Cast array<float> (or any numeric array) to array<double>."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _make_dot_vec():
    """Vectorized twin of :func:`dot` for PAIR-SIZED hot paths (r10,
    guide §4.2): Catalyst higher-order functions run INTERPRETED (no
    whole-stage codegen), so the fold above costs ~interpreter-dispatch
    per element — measured as the dominant job of every exact cosine
    rescore at sf0.1 (candidate-pair count × dim elements; the two 11 s
    jobs of x_semdedup_survivors were exactly this). This Arrow kernel
    computes the SAME strict left fold — acc starts at 0.0 and adds
    x[j]·y[j] in ascending j, one numpy vector op per dimension over
    the batch, no BLAS matmul and no pairwise re-association — so every
    score is bit-identical to the Catalyst fold and to DuckDB's
    list_dot_product (same IEEE double sequence; this is the
    sign_sketch/_d2_to_centers parity argument, reused).

    Marked non-deterministic as an optimizer fence (guide §4.4): the
    callers filter on the computed score, and the pushed-down filter
    would otherwise duplicate the ArrowEvalPython node (one evaluation
    below the filter, one in the surviving projection). The function is
    pure; the marking only stops the optimizer from re-evaluating it.
    """
    import numpy as np
    import pandas as pd

    def _dot_seq(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        x = np.array(a.tolist(), dtype=np.float64)
        y = np.array(b.tolist(), dtype=np.float64)
        acc = np.zeros(len(x))
        for j in range(x.shape[1]):
            acc += x[:, j] * y[:, j]
        return pd.Series(acc)

    # explicit annotations (not string hints): the module's
    # `from __future__ import annotations` plus function-local imports
    # would leave pandas_udf's signature inference with unresolvable
    # 'pd.Series' strings
    _dot_seq.__annotations__ = {
        "a": pd.Series,
        "b": pd.Series,
        "return": pd.Series,
    }
    from pyspark.sql.types import DoubleType

    # DataType object, not a DDL string: string return types are parsed
    # through the active SparkContext, which does not exist yet when a
    # Python WORKER imports this module to unpickle a UDF
    return F.pandas_udf(_dot_seq, DoubleType()).asNondeterministic()


_DOT_VEC = None


def dot_vec(a: Column, b: Column) -> Column:
    """Bit-identical vectorized :func:`dot` (see :func:`_make_dot_vec`);
    the UDF object is built lazily on first use and cached."""
    global _DOT_VEC
    if _DOT_VEC is None:
        _DOT_VEC = _make_dot_vec()
    return _DOT_VEC(a, b)


def norm(a: Column) -> Column:
    """L2 norm of an array<double> column."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return dot(a, b) / (norm(a) * norm(b))
