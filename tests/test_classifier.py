"""Newton-aggregate logistic regression (operators/classifier.py):
weight recovery on data generated from a known model, perfect
separation handled by the ridge, determinism, null exclusion, and a
UDF-free scoring plan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from duplicate_finder_spark.operators.classifier import (
    confusion, fit_quality_classifier, log_loss, score, train_logistic)


def _synth(spark, n=4000, w_true=(0.5, 2.0, -3.0), seed=7):
    """Rows (f1, f2, y) with y ~ Bernoulli(sigmoid(b + w·x))."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 2))
    z = w_true[0] + x @ np.array(w_true[1:])
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-z))).astype(float)
    rows = [(float(a), float(b), float(c))
            for (a, b), c in zip(x, y)]
    return spark.createDataFrame(rows, "f1 double, f2 double, y double")


def test_recovers_generating_weights(spark):
    df = _synth(spark)
    w = train_logistic(df, "y", ["f1", "f2"], n_iter=6, reg=1e-4)
    # 4000 samples: MLE is within a loose band of the truth
    assert abs(w[0] - 0.5) < 0.35, w
    assert abs(w[1] - 2.0) < 0.5, w
    assert abs(w[2] + 3.0) < 0.6, w


def test_separable_data_classifies_perfectly_under_ridge(spark):
    rows = [(float(i), 1.0 if i > 50 else 0.0) for i in range(101)
            if i != 50]
    df = spark.createDataFrame(rows, "f1 double, y double")
    w = train_logistic(df, "y", ["f1"], n_iter=8, reg=1e-2)
    assert np.all(np.isfinite(w))          # ridge kept the solve sane
    got = df.withColumn("p", score(["f1"], w)) \
            .filter((F.col("p") >= 0.5) != (F.col("y") == 1.0)).count()
    assert got == 0


def test_deterministic_and_null_rows_excluded(spark):
    df = _synth(spark, n=500)
    with_nulls = df.unionByName(spark.createDataFrame(
        [(None, 1.0, 1.0), (0.3, None, 0.0), (0.1, 0.2, None)],
        "f1 double, f2 double, y double"))
    w1 = train_logistic(with_nulls, "y", ["f1", "f2"], n_iter=4)
    w2 = train_logistic(with_nulls, "y", ["f1", "f2"], n_iter=4)
    w_clean = train_logistic(df, "y", ["f1", "f2"], n_iter=4)
    assert np.array_equal(w1, w2)
    assert np.allclose(w1, w_clean)        # null rows contributed nothing


def test_fit_quality_classifier_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, ("the and of to in is a " * (2 + 3 * (i % 2))).strip())
         for i in range(80)],
        "doc_id long, text string")
    label = F.col("doc_id") % 2 == 1       # long docs are the positives
    scored, w, names = fit_quality_classifier(docs, label, n_iter=6)
    row = confusion(scored, label).first()
    assert row["n_docs"] == 80 and row["n_pos"] == 40
    assert row["tp"] == 40 and row["tn"] == 40, row
    assert log_loss(scored, label) < 0.1
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan        # scoring is pure codegen
