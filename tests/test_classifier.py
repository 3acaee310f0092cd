"""Logistic-regression quality classifier (pipeline/classifier.py).

The suite oracle (``doc_quality_classifier`` in test_suite_oracle)
pins cross-engine value-exactness of weights, predictions and
accuracy; these tests pin the training semantics themselves and the
import topology.
"""

from __future__ import annotations

import subprocess
import sys

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_SMALL


def test_classifier_importable_standalone():
    # regression: a top-level suite.base import made
    # `import xsarsea_spark.pipeline.classifier` (before the suite
    # package) fail with a circular-import error
    r = subprocess.run(
        [sys.executable, "-c",
         "import xsarsea_spark.pipeline.classifier as c;"
         "print(c.N_FEATURES)"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "5"


def test_train_learns_the_label_gate(spark):
    from xsarsea_spark.pipeline.classifier import (doc_features,
                                                   train_logreg,
                                                   z_expr)

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    xy = doc_features(docs)
    w = train_logreg(xy, rounds=8, lr=1.0)
    acc_row = (
        xy.select("y", F.expr(z_expr(w)).alias("z"))
        .agg(F.avg(F.expr(
            "CASE WHEN (z >= 0.0) = (y = 1.0)"
            " THEN 1.0 ELSE 0.0 END")).alias("acc"))
        .collect()[0]
    )
    # the label is a pure n_chars threshold and n_chars/1000 is a
    # feature, so the linear model must separate far better than the
    # majority-class baseline
    base = (
        xy.agg(F.greatest(F.avg("y"), 1 - F.avg("y")).alias("b"))
        .collect()[0]["b"]
    )
    assert acc_row["acc"] >= max(0.85, base)


def test_train_is_deterministic(spark):
    from xsarsea_spark.pipeline.classifier import (doc_features,
                                                   train_logreg)

    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    xy = doc_features(docs).repartition(7)
    w1 = train_logreg(xy, rounds=2)
    w2 = train_logreg(xy.repartition(3), rounds=2)
    # DECIMAL-grid gradient sums are partitioning/order independent
    assert w1 == w2
