"""Quality-classifier distillation: the student must learn a separable
vocabulary signal the teacher heuristic cannot see, reproduce teacher
labels on held-out data in self-distillation mode, score with a
shuffle-free narrow plan, and be deterministic across refits."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from duplicate_image_detector_spark.operators.quality_classifier import (
    QualityClassifier,
    score_quality,
    train_quality_classifier,
)

GOOD_VOCAB = (
    "theorem gradient census archive parliament molecule syntax "
    "harvest meridian catalyst"
).split()
BAD_VOCAB = (
    "click cheap deal winner casino pills free offer bonus jackpot"
).split()
FILLER = (
    "the a of and to in that it for on with as was at by from this "
    "be are or an"
).split()


def _doc(rng: random.Random, vocab: list[str], n: int = 60) -> str:
    # same length/diversity SHAPE for both classes: the heuristic
    # teacher (length + distinct ratio + word shape) cannot separate
    # them, so a passing student proves a learned vocabulary signal.
    return " ".join(
        rng.choice(vocab if i % 2 == 0 else FILLER) for i in range(n)
    )


@pytest.fixture(scope="module")
def labeled_docs(spark):
    rng = random.Random(11)
    rows = [
        (i, _doc(rng, GOOD_VOCAB), 1) for i in range(300)
    ] + [
        (300 + i, _doc(rng, BAD_VOCAB), 0) for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_student_learns_vocabulary_signal(labeled_docs):
    train = labeled_docs.where("doc_id % 5 != 0")
    held = labeled_docs.where("doc_id % 5 = 0")
    clf = train_quality_classifier(train, label_col="label")
    scored = score_quality(clf, held)
    agree = scored.where(
        (F.col("quality_keep").cast("int") == F.col("label"))
    ).count()
    total = held.count()
    assert total == 120
    assert agree / total >= 0.95, f"held-out accuracy {agree}/{total}"
    # probabilities are real probabilities, not raw margins
    bounds = scored.agg(
        F.min("quality_prob").alias("lo"), F.max("quality_prob").alias("hi")
    ).first()
    assert 0.0 <= bounds.lo <= bounds.hi <= 1.0


def test_self_distillation_reproduces_teacher(spark):
    # teacher = heuristic threshold; student trained on one half must
    # reproduce the teacher's labels on the OTHER half — the closed
    # loop that makes the non-SQL operator oracle-checkable in-test.
    from duplicate_image_detector_spark.functions.textstats import (
        quality_score_col,
    )

    rng = random.Random(7)
    rows = []
    for i in range(600):
        # vary length 5..120 words so the heuristic spreads over [0,1]
        n = 5 + rng.randrange(116)
        vocab = GOOD_VOCAB if i % 2 == 0 else BAD_VOCAB
        rows.append((i, _doc(rng, vocab, n)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    thr = 0.5
    train = docs.where("doc_id % 2 = 0")
    held = docs.where("doc_id % 2 = 1")
    clf = train_quality_classifier(train, teacher_threshold=thr)
    scored = score_quality(clf, held)
    teacher = (quality_score_col(F.col("text")) >= F.lit(thr)).cast("int")
    agree = scored.where(
        F.col("quality_keep").cast("int") == teacher
    ).count()
    total = held.count()
    assert agree / total >= 0.9, f"teacher agreement {agree}/{total}"


def test_scoring_plan_is_narrow(labeled_docs):
    clf = train_quality_classifier(
        labeled_docs.limit(50), label_col="label", max_iter=5
    )
    scored = score_quality(clf, labeled_docs)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"scoring shuffles:\n{plan}"


def test_refit_is_deterministic(labeled_docs):
    train = labeled_docs.where("doc_id % 5 != 0")
    held = labeled_docs.where("doc_id % 5 = 0").select("doc_id", "text")

    def fit_and_score() -> list[tuple[int, bool]]:
        clf = train_quality_classifier(train, label_col="label")
        assert isinstance(clf, QualityClassifier)
        out = score_quality(clf, held).select("doc_id", "quality_keep")
        return sorted((r.doc_id, r.quality_keep) for r in out.collect())

    assert fit_and_score() == fit_and_score()
