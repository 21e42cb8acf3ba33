"""Trainable quality classifier — Newton-step logistic regression as
pure DataFrame aggregates.

Web-scale pipelines (CCNet, DCLM, FineWeb-Edu) gate documents with a
cheap linear classifier over text features trained on weak labels
(wiki-vs-crawl, langid, teacher scores). On Spark the right shape for
a LOW-dimensional model is not an MLlib fit (which ships its own
iteration machinery) but the sufficient-statistics pattern already
used by the IVF k-means refinement (operators/ann.py): each Newton /
IRLS step needs only

    gradient   g = Xᵀ(y − p)              (d+1 sums)
    Hessian    H = Xᵀ diag(p(1−p)) X      ((d+1)(d+2)/2 sums)

— every entry a map-side-combinable ``sum()`` of a JVM expression, so
one aggregation job per step ships O(d²) doubles to the driver no
matter how many rows the corpus has, and the d×d solve is a numpy
one-liner. No per-row Python anywhere; scoring is a codegen'd sigmoid
expression usable as a streaming-safe projection.

Determinism: given a fixed input and partitioning the aggregation
plan is fixed, so trained weights reproduce bit-for-bit in practice
(same caveat class as the seeded ANN paths; the driver contract pins
the confusion counts it measured, with provenance).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.functions.text import (punct_ratio,
                                                   stopword_ratio,
                                                   token_count)


def quality_features(col: Column | str = "text") -> dict[str, Column]:
    """Cheap JVM-only text features for a linear quality/lang gate."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    ascii_len = F.length(F.regexp_replace(c, r"[^\x00-\x7F]", ""))
    return {
        "f_stop_en": stopword_ratio(c, "en"),
        "f_punct": punct_ratio(c),
        "f_ascii": F.when(total == 0, F.lit(0.0))
                    .otherwise(ascii_len / total),
        "f_log_tokens": F.log1p(token_count(c)),
    }


def _margin(feature_cols: list[str], w: np.ndarray) -> Column:
    """bias + Σ wᵢ·fᵢ with the current weights as literals."""
    m = F.lit(float(w[0]))
    for i, f in enumerate(feature_cols):
        m = m + F.lit(float(w[i + 1])) * F.col(f)
    return m


def _sigmoid(m: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-m))


def train_logistic(df: DataFrame, label_col: str,
                   feature_cols: list[str], n_iter: int = 4,
                   reg: float = 1e-2) -> np.ndarray:
    """→ weights [bias, w_1..w_d] after ``n_iter`` Newton steps.

    One aggregation job per step; ``reg`` is an L2 ridge on the
    Hessian (keeps the solve stable under near-separable labels).
    Rows with a NULL label or feature are excluded from the fit.
    """
    d = len(feature_cols) + 1
    y = F.col(label_col).cast("double")
    guard = y.isNotNull()
    for f in feature_cols:
        guard = guard & F.col(f).isNotNull()
    fit = df.filter(guard)

    def x(i: int) -> Column:  # x_0 ≡ bias input
        return F.lit(1.0) if i == 0 else F.col(feature_cols[i - 1])

    w = np.zeros(d)
    for _ in range(n_iter):
        p = _sigmoid(_margin(feature_cols, w))
        # clamp: a saturated p would zero its Hessian weight exactly
        p = F.greatest(F.lit(1e-12), F.least(F.lit(1.0 - 1e-12), p))
        aggs = [F.sum(x(i) * (y - p)).alias(f"g{i}") for i in range(d)]
        aggs += [F.sum(x(i) * x(j) * p * (F.lit(1.0) - p))
                  .alias(f"h{i}_{j}")
                 for i in range(d) for j in range(i, d)]
        row = fit.agg(*aggs).first()
        g = np.array([row[f"g{i}"] for i in range(d)])
        h = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                h[i, j] = h[j, i] = row[f"h{i}_{j}"]
        h += reg * np.eye(d)
        w = w + np.linalg.solve(h, g - reg * w)
    return w


def score(feature_cols: list[str], w: np.ndarray) -> Column:
    """P(label=1) as one codegen'd expression (no UDF)."""
    return _sigmoid(_margin(feature_cols, w))


def fit_quality_classifier(df: DataFrame, label: Column,
                           text_col: str = "text", n_iter: int = 4,
                           reg: float = 1e-2
                           ) -> tuple[DataFrame, np.ndarray, list[str]]:
    """Featurize → train → score in one call.

    → (df + feature cols + ``prob`` + ``predicted``, weights, feature
    names). ``label`` is only consumed by the fit; the returned frame
    keeps the caller's columns so the gate composes like any filter.
    """
    feats = quality_features(text_col)
    names = list(feats)
    wide = df.withColumn("_y", label.cast("double"))
    for name, expr in feats.items():
        wide = wide.withColumn(name, expr)
    w = train_logistic(wide, "_y", names, n_iter=n_iter, reg=reg)
    prob = score(names, w)
    return (wide.drop("_y")
            .withColumn("prob", prob)
            .withColumn("predicted", (prob >= 0.5)),
            w, names)


def confusion(scored: DataFrame, label: Column) -> DataFrame:
    """One-row confusion summary of ``predicted`` against ``label``."""
    yb = label.cast("boolean")
    pred = F.col("predicted")
    return scored.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(yb.cast("long")).alias("n_pos"),
        F.sum((pred & yb).cast("long")).alias("tp"),
        F.sum((pred & ~yb).cast("long")).alias("fp"),
        F.sum((~pred & yb).cast("long")).alias("fn"),
        F.sum((~pred & ~yb).cast("long")).alias("tn"))


def log_loss(scored: DataFrame, label: Column) -> float:
    """Mean negative log-likelihood of ``prob`` against ``label``."""
    y = label.cast("double")
    p = F.greatest(F.lit(1e-12),
                   F.least(F.lit(1.0 - 1e-12), F.col("prob")))
    row = scored.agg(F.avg(-(y * F.log(p)
                             + (F.lit(1.0) - y)
                             * F.log(F.lit(1.0) - p))).alias("ll")) \
        .first()
    return float(row["ll"]) if row["ll"] is not None else math.nan
