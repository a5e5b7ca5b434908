"""Vector/matrix scalar function library + aggregates.

Rebuild of the reference's ``SparkFunctions`` (/root/reference/src/main/scala/
com/github/ozancicek/artan/ml/SparkFunctions.scala:32-259; Python mirror
python/artan/spark_functions.py:39-225) and the UDAFs in
LinalgUtils.scala:51-135 — but expressed as **JVM-side Catalyst expressions**
(higher-order functions on arrays) wherever possible, so they stay inside
whole-stage codegen; numpy pandas_udfs only for true matrix products.

Known reference bugs deliberately NOT replicated (SURVEY §7.3.7):
- ``zerosMatrix`` returning ones (SparkFunctions.scala:157)
- ``randMultiGaussian`` ignoring its Cholesky root (SparkFunctions.scala:242-245)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from artan_spark.types import MATRIX

__all__ = [
    "array_to_vector",
    "vector_to_array",
    "array_to_matrix",
    "matrix_to_array",
    "zeros_vector",
    "ones_vector",
    "zeros_matrix",
    "eye_matrix",
    "diag_matrix",
    "dot_vector",
    "scal_vector",
    "axpy_vector",
    "outer_product",
    "multiply_matrix",
    "multiply_matrix_vector",
    "project_matrix",
    "rand_multi_gaussian",
    "rand_multi_gaussian_with_col",
    "axpy_vector_aggregate",
    "axpy_matrix_aggregate",
    "latest_state_likelihood",
]

_D = DoubleType()


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- interop (reference SparkFunctions.scala:58-85) -------------------------


def array_to_vector(arr) -> Column:
    """array<double> -> Spark ML VectorUDT (JVM-native helper)."""
    from pyspark.ml.functions import array_to_vector as _atv

    return _atv(_col(arr))


def vector_to_array(vec) -> Column:
    from pyspark.ml.functions import vector_to_array as _vta

    return _vta(_col(vec))


def matrix_to_struct(mat) -> Column:
    """Spark ML MatrixUDT -> matrix struct (column-major values). Interop
    shim for reference-API users; row-at-a-time (UDTs bypass Arrow), so use
    native structs in hot paths."""
    from pyspark.sql.functions import udf

    def conv(m):
        if m is None:
            return None
        arr = m.toArray()  # row-major 2-D
        return (int(arr.shape[0]), int(arr.shape[1]), [float(v) for v in arr.T.ravel()])

    return udf(conv, MATRIX)(_col(mat))


def auto_array(df, col_name: str) -> Column:
    """Column reference that transparently converts VectorUDT -> array and
    MatrixUDT -> matrix struct based on the DataFrame schema."""
    dt = df.schema[col_name].dataType
    tname = type(dt).__name__
    if tname == "VectorUDT":
        return vector_to_array(F.col(col_name))
    if tname == "MatrixUDT":
        return matrix_to_struct(F.col(col_name))
    return F.col(col_name)


def array_to_matrix(num_rows, num_cols, values) -> Column:
    """(rows, cols, column-major values) -> matrix struct."""
    nr = F.lit(num_rows) if isinstance(num_rows, int) else _col(num_rows)
    nc = F.lit(num_cols) if isinstance(num_cols, int) else _col(num_cols)
    return F.struct(
        nr.cast("int").alias("numRows"),
        nc.cast("int").alias("numCols"),
        _col(values).alias("values"),
    )


def matrix_to_array(mat) -> Column:
    """matrix struct -> its column-major values array."""
    return _col(mat)["values"]


# -- constructors (SparkFunctions.scala:92-164) -----------------------------


def zeros_vector(size: int) -> Column:
    return F.array_repeat(F.lit(0.0), size)


def ones_vector(size: int) -> Column:
    return F.array_repeat(F.lit(1.0), size)


def zeros_matrix(num_rows: int, num_cols: int) -> Column:
    return array_to_matrix(num_rows, num_cols, F.array_repeat(F.lit(0.0), num_rows * num_cols))


def eye_matrix(size: int) -> Column:
    vals = np.eye(size).T.ravel().tolist()
    return array_to_matrix(size, size, F.array(*[F.lit(v) for v in vals]))


def diag_matrix(vec) -> Column:
    """vector -> diagonal matrix struct (column-major), fully JVM-side."""
    v = _col(vec)
    n = F.size(v)
    idx = F.sequence(F.lit(0), n - 1)
    values = F.flatten(
        F.transform(idx, lambda j: F.transform(idx, lambda i: F.when(i == j, v[i]).otherwise(F.lit(0.0))))
    )
    return F.struct(n.cast("int").alias("numRows"), n.cast("int").alias("numCols"), values.alias("values"))


# -- BLAS-style scalar fns (SparkFunctions.scala:106-219) -------------------


def dot_vector(x, y) -> Column:
    return F.aggregate(F.zip_with(_col(x), _col(y), lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)


def scal_vector(alpha, x) -> Column:
    a = F.lit(alpha) if isinstance(alpha, (int, float)) else _col(alpha)
    return F.transform(_col(x), lambda v: a * v)


def axpy_vector(alpha, x, y) -> Column:
    """alpha*x + y elementwise."""
    a = F.lit(alpha) if isinstance(alpha, (int, float)) else _col(alpha)
    return F.zip_with(_col(x), _col(y), lambda xi, yi: a * xi + yi)


def outer_product(x, y) -> Column:
    """x yᵀ as a matrix struct (column-major values)."""
    xc, yc = _col(x), _col(y)
    values = F.flatten(F.transform(yc, lambda yj: F.transform(xc, lambda xi: xi * yj)))
    return F.struct(
        F.size(xc).cast("int").alias("numRows"),
        F.size(yc).cast("int").alias("numCols"),
        values.alias("values"),
    )


# -- matrix products: vectorized numpy pandas_udfs (gemm/gemv) --------------


def _mats_to_np(s):
    # struct columns reach scalar pandas_udfs as a pd.DataFrame
    if isinstance(s, pd.DataFrame):
        return [
            np.asarray(v, dtype=np.float64).reshape(int(c), int(r)).T
            for r, c, v in zip(s["numRows"], s["numCols"], s["values"])
        ]
    return [
        np.asarray(m["values"], dtype=np.float64).reshape(int(m["numCols"]), int(m["numRows"])).T
        for m in s
    ]


@F.pandas_udf(MATRIX)
def _gemm_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    out = {"numRows": [], "numCols": [], "values": []}
    for ma, mb in zip(_mats_to_np(a), _mats_to_np(b)):
        r = ma @ mb
        out["numRows"].append(r.shape[0])
        out["numCols"].append(r.shape[1])
        out["values"].append(r.T.ravel())
    return pd.DataFrame(out)


@F.pandas_udf(ArrayType(DoubleType()))
def _gemv_udf(a: pd.Series, x: pd.Series) -> pd.Series:
    return pd.Series([(ma @ np.asarray(vx, dtype=np.float64)) for ma, vx in zip(_mats_to_np(a), x)])


@F.pandas_udf(MATRIX)
def _project_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    # B A Bᵀ (reference projectMatrix, SparkFunctions.scala:201-209)
    out = {"numRows": [], "numCols": [], "values": []}
    for ma, mb in zip(_mats_to_np(a), _mats_to_np(b)):
        r = mb @ ma @ mb.T
        out["numRows"].append(r.shape[0])
        out["numCols"].append(r.shape[1])
        out["values"].append(r.T.ravel())
    return pd.DataFrame(out)


def multiply_matrix(a, b) -> Column:
    return _gemm_udf(_col(a), _col(b))


def multiply_matrix_vector(a, x) -> Column:
    return _gemv_udf(_col(a), _col(x))


def project_matrix(a, b) -> Column:
    return _project_udf(_col(a), _col(b))


# -- MVN sampling (SparkFunctions.scala:228-258, with the bug fixed) --------


def rand_multi_gaussian(mean: np.ndarray, cov: np.ndarray, seed: int = 0) -> Column:
    """Constant-parameter MVN sample column: mean + L·randn, L = chol(cov).

    JVM-native: per-dimension ``F.randn(seed+i)`` scaled by the Cholesky
    root computed once driver-side. (The reference's version passes the raw
    covariance where the root belongs — SparkFunctions.scala:242-245; fixed.)
    """
    mean = np.asarray(mean, dtype=np.float64).ravel()
    root = np.linalg.cholesky(np.atleast_2d(np.asarray(cov, dtype=np.float64)))
    n = len(mean)
    randn = [F.randn(seed + j) for j in range(n)]
    dims = []
    for k in range(n):
        expr = F.lit(float(mean[k]))
        for j in range(n):
            if root[k, j] != 0.0:
                expr = expr + F.lit(float(root[k, j])) * randn[j]
        dims.append(expr)
    return F.array(*dims)


@F.pandas_udf(ArrayType(DoubleType()))
def _scale_mvn_udf(mean: pd.Series, cov: pd.Series, z: pd.Series) -> pd.Series:
    # mean + chol(cov) @ z, per row — Arrow-batched; cov is the matrix
    # struct (column-major values), z the pre-drawn standard normals
    out = []
    for mu, mc, vz in zip(mean, _mats_to_np(cov), z):
        root = np.linalg.cholesky(mc)
        out.append(np.asarray(mu, dtype=np.float64) + root @ np.asarray(vz, dtype=np.float64))
    return pd.Series(out)


def rand_multi_gaussian_with_col(mean_col, cov_col, size: int, seed: int = 0) -> Column:
    """Per-row-parameter MVN sample column: for each row,
    ``mean + chol(cov) @ z`` with ``z`` a fresh standard-normal vector —
    the column variant of :func:`rand_multi_gaussian`
    (SparkFunctions.scala:246-258 ``randMultiGaussianWithCol``).

    ``mean_col`` is an ``array<double>`` column, ``cov_col`` a matrix
    struct column, ``size`` the dimension (the reference requires it too:
    the randn vector's width can't be inferred from an unevaluated
    column). The normals are drawn JVM-side with ``F.randn(seed + j)``
    exactly like the constant variant — only the per-row Cholesky + gemv
    runs in the Arrow batch, so the randomness semantics (per-partition
    seeded streams) match the reference's ``randnVector``."""
    z = F.array(*[F.randn(seed + j) for j in range(size)])
    return _scale_mvn_udf(_col(mean_col), _col(cov_col), z)


# -- aggregates (LinalgUtils.scala:51-135) ----------------------------------


def axpy_vector_aggregate(weight, vec, size: int) -> Column:
    """Σ wᵢ·xᵢ over an array<double> column — JVM-side collect+fold.

    Usable directly inside ``.agg(...)``.
    """
    items = F.collect_list(F.struct(_col(weight).alias("w"), _col(vec).alias("v")))
    zero = F.array_repeat(F.lit(0.0), size)
    return F.aggregate(items, zero, lambda acc, it: F.zip_with(acc, it["v"], lambda a, x: a + it["w"] * x))


def axpy_matrix_aggregate(weight, mat, num_rows: int, num_cols: int) -> Column:
    """Σ wᵢ·Xᵢ over a matrix-struct column, as a matrix struct."""
    items = F.collect_list(F.struct(_col(weight).alias("w"), _col(mat)["values"].alias("v")))
    zero = F.array_repeat(F.lit(0.0), num_rows * num_cols)
    summed = F.aggregate(items, zero, lambda acc, it: F.zip_with(acc, it["v"], lambda a, x: a + it["w"] * x))
    return array_to_matrix(num_rows, num_cols, summed)


def latest_state_likelihood(loglikelihood, state_index, state) -> Column:
    """(Σ loglikelihood, argmax-by-stateIndex state) in one pass
    (LinalgUtils.scala:106-129) — F.sum + F.max_by, no UDAF."""
    return F.struct(
        F.sum(_col(loglikelihood)).alias("sumLoglikelihood"),
        F.max_by(_col(state), _col(state_index)).alias("latestState"),
    )
