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


def _sigmoid(m: Column) -> Column:
    """Overflow-stable sigmoid as a branch both engines spell identically:
    exp() only ever sees a non-positive argument."""
    return F.when(m >= 0, 1.0 / (1.0 + F.exp(-m))).otherwise(
        F.exp(m) / (1.0 + F.exp(m))
    )


def logistic_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    l2: float = 1e-3,
) -> dict:
    """Distributed logistic regression by IRLS/Newton — the learned
    quality-classifier tier of the filtering stack (the fastText-style
    doc filter, linear head): each iteration is ONE aggregate pass over
    the data computing the gradient and the (d+1)² Hessian moments with
    the current weights folded in as literals (map-side partial combine;
    the shuffle payload is one row of doubles), then a tiny driver-side
    numpy solve — linear_fit's division of labor, iterated. L2 of ``l2``
    on the feature weights (not the intercept) keeps separable data from
    diverging. Returns {"intercept", "weights", "n", "nll"} where nll is
    the pre-update data log-loss per iteration (stable log1p(exp)
    spelling), the convergence trace a training gate can assert on."""
    import numpy as np

    d = len(feature_cols)
    clean = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias(label_col),
    ).na.drop()
    w = np.zeros(d)
    b = 0.0
    n = 0
    nlls: list[float] = []
    for _ in range(iters):
        m: Column = F.lit(float(b))
        for i, c in enumerate(feature_cols):
            m = m + F.col(c) * F.lit(float(w[i]))
        p = _sigmoid(m)
        s = p * (1.0 - p)
        r = p - F.col(label_col)
        t = (2.0 * F.col(label_col) - 1.0) * m
        nll = F.when(t > 0, F.log1p(F.exp(-t))).otherwise(-t + F.log1p(F.exp(t)))
        aggs = [
            F.count(F.lit(1)).alias("__n"),
            F.sum(r).alias("__gb"),
            F.sum(s).alias("__hbb"),
            F.sum(nll).alias("__nll"),
        ]
        for i in range(d):
            xi = F.col(feature_cols[i])
            aggs.append(F.sum(xi * r).alias(f"__g_{i}"))
            aggs.append(F.sum(xi * s).alias(f"__hb_{i}"))
            for j in range(i, d):
                aggs.append(
                    F.sum(xi * F.col(feature_cols[j]) * s).alias(f"__h_{i}_{j}")
                )
        row = clean.agg(*aggs).first()
        n = int(row["__n"])
        if n == 0:
            raise ValueError("logistic_fit: no complete rows")
        H = np.zeros((d + 1, d + 1))
        g = np.zeros(d + 1)
        for i in range(d):
            g[i] = row[f"__g_{i}"] + l2 * w[i]
            H[i, d] = H[d, i] = row[f"__hb_{i}"]
            for j in range(i, d):
                H[i, j] = H[j, i] = row[f"__h_{i}_{j}"]
            H[i, i] += l2
        g[d] = row["__gb"]
        H[d, d] = row["__hbb"]
        nlls.append(float(row["__nll"]))
        step = np.linalg.solve(H, g)
        w = w - step[:d]
        b = float(b - step[d])
    return {
        "intercept": b,
        "weights": {c: float(w[i]) for i, c in enumerate(feature_cols)},
        "n": n,
        "nll": nlls,
    }


def logistic_predict(
    df: DataFrame,
    fit: dict,
    prediction_col: str = "p",
) -> DataFrame:
    """Score rows with a ``logistic_fit`` result: sigmoid of one codegen
    projection, weights as literals — no join, no shuffle, no Python."""
    m: Column = F.lit(fit["intercept"])
    for c, wv in fit["weights"].items():
        m = m + F.col(c).cast("double") * F.lit(wv)
    return df.withColumn(prediction_col, _sigmoid(m))


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
) -> dict:
    """Fit a PCA model on a vector column — the dimensionality-reduction
    step an embedding pipeline runs before ANN indexing / SemDeDup-style
    clustering (project 64-dim crawl embeddings to the top-k subspace,
    optionally whitened).

    Distributed shape: each partition reduces to ONE mergeable moment
    sketch (n, Σx, Σxxᵀ) via an Arrow-batched pass — the corpus is
    scanned once and never collected; the driver combines the
    |partitions| sketches, forms the covariance, and runs a d×d
    eigendecomposition (d = embedding dim, trivially driver-sized).
    Component signs are fixed (largest-|coordinate| entry positive) so
    the fit is deterministic run-to-run.

    Returns {mean, components (k×d, rows orthonormal), eigvals (desc),
    total_var, n}.
    """
    n, s, ss = pca_moments(df, vec_col)
    return pca_fit_from_moments(n, s, ss, k)


def pca_moments(df: DataFrame, vec_col: str = "embedding"):
    """The mergeable PCA moment sketch (n, Σx, Σxxᵀ): one Arrow-batched
    corpus scan reducing each partition to a single row; sketches from
    disjoint shards/epochs merge by plain addition, which is what makes
    the streaming maintainer exact rather than approximate."""
    import numpy as np
    import pandas as pd

    def partial(pdfs):
        for pdf in pdfs:
            vecs = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if len(vecs) == 0:
                continue
            yield pd.DataFrame(
                {
                    "n": [len(vecs)],
                    "s": [vecs.sum(axis=0).tolist()],
                    "ss": [(vecs.T @ vecs).ravel().tolist()],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        partial, "n long, s array<double>, ss array<double>"
    ).toPandas()
    if parts.empty:
        raise ValueError("pca_moments: empty input")
    n = int(parts["n"].sum())
    s = np.sum([np.asarray(x) for x in parts["s"]], axis=0)
    d = s.shape[0]
    ss = np.sum([np.asarray(x) for x in parts["ss"]], axis=0).reshape(d, d)
    return n, s, ss


def pca_fit_from_moments(n: int, s, ss, k: int = 8) -> dict:
    """Finish a PCA fit from a (possibly merged) moment sketch — the
    driver-side d×d eigendecomposition shared by pca_fit and the
    streaming PcaIngest maintainer."""
    import numpy as np

    s = np.asarray(s, dtype=np.float64)
    ss = np.asarray(ss, dtype=np.float64)
    if ss.ndim == 1:  # flattened sketch (e.g. loaded from parquet)
        ss = ss.reshape(s.shape[0], s.shape[0])
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # symmetrize away accumulation ulps
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][: int(k)]
    comps = eigvecs[:, order].T  # k x d
    vals = np.maximum(eigvals[order], 0.0)
    for i in range(comps.shape[0]):  # deterministic sign convention
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "eigvals": vals.tolist(),
        "total_var": float(np.trace(cov)),
        "n": n,
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Project the vector column onto a ``pca_fit`` model: one
    Arrow-batched map over the rows (the k×d model rides in the closure —
    kilobytes), no shuffle, no join. ``whiten=True`` scales each
    component by 1/√eigval so downstream cosine/L2 treats directions
    equally."""
    import numpy as np

    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    if whiten:
        comps = comps / np.sqrt(np.asarray(model["eigvals"])[:, None] + eps)

    @F.pandas_udf("array<double>")
    def project(vecs):
        import pandas as pd

        x = np.asarray(vecs.tolist(), dtype=np.float64)
        out = (x - mean) @ comps.T
        return pd.Series(list(out))

    return df.withColumn(out_col, project(F.col(vec_col)))


def categorical_fit(
    df: DataFrame,
    col: str,
    id_col: str = "cat_id",
) -> DataFrame:
    """Frequency-ordered label encoding (the StringIndexer shape): build a
    (value, id, n) dictionary with ids dense from 0, assigned by count
    descending then value ascending — fully deterministic, so encoders
    fit on different days agree whenever the frequency order does.

    The no-partition window runs over the DISTINCT-value table (the
    dictionary), never the corpus — the same bounded-stage justification
    as the k-means init. NULL values are excluded (encode them
    explicitly upstream if they are a category)."""
    from pyspark.sql import Window

    counts = df.filter(F.col(col).isNotNull()).groupBy(col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy(F.desc("n"), F.asc(col))
    return counts.select(
        F.col(col),
        (F.row_number().over(w) - 1).cast("long").alias(id_col),
        F.col("n"),
    )


def categorical_transform(
    df: DataFrame,
    mapping: DataFrame,
    col: str,
    id_col: str = "cat_id",
    unknown_id: int = -1,
) -> DataFrame:
    """Apply a ``categorical_fit`` dictionary: one equi-join on the value
    (the dictionary side is broadcast-sized by construction — it has one
    row per distinct category); unseen values encode as ``unknown_id``
    rather than dropping rows."""
    m = mapping.select(col, id_col)
    return (
        df.join(F.broadcast(m), col, "left")
        .withColumn(id_col, F.coalesce(F.col(id_col), F.lit(int(unknown_id))))
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
) -> DataFrame:
    """Smoothed target (mean) encoding — the classic high-cardinality
    categorical feature: enc(c) = (sum_y(c) + m * global_mean) /
    (n(c) + m), shrinking rare categories toward the global mean so they
    don't memorize noise. One groupBy over the corpus plus a broadcast
    1-row global aggregate (the accepted corpus-stats shape); apply by
    joining the returned (category, n, enc) dictionary back on the
    category key."""
    g = df.agg(
        F.avg(F.col(target_col).cast("double")).alias("__gmean")
    )
    m = float(smoothing)
    per = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(target_col).cast("double")).alias("__sy"),
    )
    return per.crossJoin(F.broadcast(g)).select(
        F.col(cat_col),
        "n",
        (
            (F.col("__sy") + F.lit(m) * F.col("__gmean"))
            / (F.col("n") + F.lit(m))
        ).alias("enc"),
    )


def auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney rank-sum identity:
    AUC = (sum of positive ranks - n_pos(n_pos+1)/2) / (n_pos * n_neg),
    with AVERAGE ranks on score ties (the standard tie correction —
    equivalent to counting tied pos/neg pairs as half-concordant). One
    global rank (Spark range-partitions the sort) plus two aggregates;
    no pairwise anything, so it runs at corpus scale where the O(n^2)
    definition cannot. Returns a 1-row (n_pos, n_neg, auc) frame."""
    from blazingsql_spark.operators.window import global_running

    ranked = df.select(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("double").alias("__y"),
    )
    # collapse to the distinct-score grain, then prefix-sum the group
    # sizes DISTRIBUTED (operators.window.global_running — no
    # single-partition window even when every score is distinct).
    # average rank per tied score = first rank + (count-1)/2
    per_score = global_running(
        ranked.groupBy("__s").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("n_pos_s"),
        ),
        order_by=["__s"],
        sum_cols={"cum_n": "n"},
    ).withColumn(
        "avg_rank", F.col("cum_n") - F.col("n") + 1 + (F.col("n") - 1) / 2.0
    )
    return per_score.agg(
        F.sum("n_pos_s").cast("long").alias("n_pos"),
        (F.sum("n") - F.sum("n_pos_s")).cast("long").alias("n_neg"),
        (
            (
                F.sum(F.col("avg_rank") * F.col("n_pos_s"))
                - (F.sum("n_pos_s") * (F.sum("n_pos_s") + 1)) / 2.0
            )
            / (F.sum("n_pos_s") * (F.sum("n") - F.sum("n_pos_s")))
        ).alias("auc"),
    )
