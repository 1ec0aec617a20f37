"""Distributed logistic regression via IRLS (iteratively reweighted
least squares / Newton's method) — the classifier-training twin of the
Lloyd trainer in ``operators/kmeans.py``: per iteration ONE distributed
aggregation produces the d(d+1)/2 + d weighted moment sums, the driver
solves a d×d system (dimension-bounded state — never data), and the
updated coefficient vector re-enters the plan as literals.

At 100 TB this is the textbook scale shape for low-dimensional GLMs:
each Newton step is a single map-side-combined aggregate over the
feature table (no shuffle of data rows — only O(#tasks) partial moment
rows reach the final agg), and the driver work is O(d³) on a d ≤ ~100
matrix.  (For high-dimensional sparse models you'd switch to L-BFGS on
gradient aggregates — same skeleton, different driver solve.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["irls_logreg"]


def irls_logreg(
    df: DataFrame,
    *,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    ridge: float = 1e-6,
) -> list[float]:
    """Fit logistic regression coefficients (one per feature column —
    include an explicit intercept column of 1.0 if wanted) on
    ``label_col`` ∈ {0, 1}.  Returns the coefficient list after
    ``iters`` Newton steps from β = 0.

    Numerics: the working weight w = p(1−p) is floored at 1e-9 and a
    ``ridge`` multiple of I is added to XᵀWX before the solve — the
    standard IRLS safeguards for separable data.  Differential-tested
    against a driver-side numpy IRLS in
    ``tests/test_iterative_ops.py``."""
    import numpy as np

    d = len(feature_cols)
    base = df.select(
        *[F.col(c).cast("double").alias(f"_x{i}") for i, c in enumerate(feature_cols)],
        F.col(label_col).cast("double").alias("_y"),
    ).localCheckpoint(eager=True)  # every Newton step re-scans this once

    beta = np.zeros(d)
    for _ in range(iters):
        xb: Column = F.lit(0.0)
        for i in range(d):
            xb = xb + F.lit(float(beta[i])) * F.col(f"_x{i}")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-xb))
        w = F.greatest(p * (F.lit(1.0) - p), F.lit(1e-9))
        z = xb + (F.col("_y") - p) / w
        aggs = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(
                    F.sum(w * F.col(f"_x{i}") * F.col(f"_x{j}")).alias(
                        f"_a{i}_{j}"
                    )
                )
        for i in range(d):
            aggs.append(F.sum(w * F.col(f"_x{i}") * z).alias(f"_b{i}"))
        row = base.agg(*aggs).first()  # ONE row: the d×d moments
        A = np.zeros((d, d))
        b = np.zeros(d)
        for i in range(d):
            for j in range(i, d):
                A[i, j] = A[j, i] = row[f"_a{i}_{j}"]
            b[i] = row[f"_b{i}"]
        A += ridge * np.eye(d)
        beta = np.linalg.solve(A, b)
    return [float(x) for x in beta]
