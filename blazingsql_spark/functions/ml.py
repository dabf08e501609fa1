"""In-engine linear model fitting — closed-form ridge/OLS via distributed
normal equations.

The scalable-ML shape for low-dimensional models (quality probes over
engineered text features, calibration fits, trend baselines): the data
side is two aggregation passes over N rows — means, then the centered
Gram matrix — and the solve is a d×d numpy system on the driver (d =
#features, tens at most; the 100 TB side never moves). This is the same
division of labor as the k-means/PQ trainers in functions.similarity:
corpus-wide passes are Spark aggregates, tiny dense algebra is local.

Centering before forming the Gram matrix is what makes the result match
streaming-moment implementations (DuckDB/Spark REGR_*) to rounding
precision — the uncentered formula (nΣxy − ΣxΣy) cancels catastrophically
on large-magnitude features.

Prediction is a pure codegen projection (weights folded into the
expression as literals) — shuffle-free, broadcast-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def linear_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    l2: float = 0.0,
) -> dict:
    """Fit y ≈ intercept + Σ w_i · x_i by ridge-regularized least squares
    (l2=0 → OLS). Rows with a NULL in any used column are dropped (the
    same pair-skipping rule as SQL's REGR_* aggregates). Returns
    {"intercept": float, "weights": {col: float}, "n": int}."""
    import numpy as np

    cols = list(feature_cols) + [label_col]
    clean = df.select(*cols).na.drop(subset=cols)

    # pass 1: means (+ count)
    stats = clean.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.avg(F.col(c).cast("double")).alias(f"__m_{i}") for i, c in enumerate(cols)],
    ).first()
    n = stats["__n"]
    if n == 0:
        raise ValueError("linear_fit: no complete rows")
    means = [stats[f"__m_{i}"] for i in range(len(cols))]

    # pass 2: centered second moments — d(d+1)/2 + d sums in ONE aggregate
    # (map-side partial combine; shuffle payload is one row of doubles)
    d = len(feature_cols)
    centered = [
        (F.col(c).cast("double") - F.lit(means[i])) for i, c in enumerate(cols)
    ]
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(centered[i] * centered[j]).alias(f"__xx_{i}_{j}"))
        aggs.append(F.sum(centered[i] * centered[d]).alias(f"__xy_{i}"))
    moments = clean.agg(*aggs).first()

    A = np.zeros((d, d))
    b = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            A[i, j] = A[j, i] = moments[f"__xx_{i}_{j}"]
        b[i] = moments[f"__xy_{i}"]
    A += float(l2) * np.eye(d)
    w = np.linalg.solve(A, b)
    intercept = means[d] - float(np.dot(w, means[:d]))
    return {
        "intercept": float(intercept),
        "weights": {c: float(w[i]) for i, c in enumerate(feature_cols)},
        "n": int(n),
    }


def linear_predict(
    df: DataFrame,
    fit: dict,
    prediction_col: str = "prediction",
) -> DataFrame:
    """Score rows with a ``linear_fit`` result: one codegen projection,
    weights folded in as literals — no join, no shuffle, no Python."""
    expr: Column = F.lit(fit["intercept"])
    for c, w in fit["weights"].items():
        expr = expr + F.col(c).cast("double") * F.lit(w)
    return df.withColumn(prediction_col, expr)
