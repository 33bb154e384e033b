"""Quality-classifier distillation — the CCNet / FineWeb-Edu pattern:
a cheap heuristic (or a small set of human/LLM labels) teaches a hashed
bag-of-words logistic regression, and the distilled student scores the
full corpus.

Why distill at all when the teacher heuristic is already a column
expression?  The student generalizes past the teacher's blind spots
(it weights actual vocabulary, not just length/diversity shape) and,
in the production setting this module is written for, the teacher is a
few million expensive labels (an LLM judge, a wiki-reference crawl)
that cannot run over 10^12 documents — the student can.

Scale design (100 TB):

* Training runs over a SAMPLE, never the corpus: callers pass the
  output of :func:`~..operators.sampling.stratified_sample` (or any
  bounded frame).  LBFGS is iterative — each iteration is a full pass
  over the training frame (treeAggregate) — so the sample bound is the
  cost bound.  The fitted model is ``n_features`` doubles (2 MB at the
  2^18 default): broadcastable to every executor for free.
* Scoring is embarrassingly parallel: tokenize (codegen'd split),
  murmur3-hash into the feature space (HashingTF, JVM), one sparse dot
  product per row (the LR transform) — a narrow map with NO shuffle.
  ``tests/test_quality_classifier.py`` asserts the scoring plan
  contains no Exchange.
* Everything JVM-side: no Python UDF anywhere in train or score (the
  pyspark.ml stages are JVM estimators/transformers; probability
  extraction uses ``vector_to_array``).

Reference parity: the reference tool has no learned scorer — its
quality gating is fixed config thresholds (duplicate-detector.py:398-400
``min_inlier_ratio``/``min_absolute_inliers`` defaults, applied at
:1208-1222); this operator is part of the training-data-pipeline
surface the brief adds on top.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words_col
from ..functions.textstats import quality_score_col

_TOKENS = "_qc_tokens"
_FEATURES = "_qc_features"
_LABEL = "_qc_label"
_RAW_PRED = "_qc_rawPrediction"
_PROB_VEC = "_qc_probability"
_PRED = "_qc_prediction"


@dataclass(frozen=True)
class QualityClassifier:
    """A fitted distilled scorer: the HashingTF featurizer config plus
    the LogisticRegressionModel.  Immutable; safe to share across
    queries in one session."""

    hashing_tf: object  # pyspark.ml.feature.HashingTF (stateless config)
    lr_model: object  # pyspark.ml.classification.LogisticRegressionModel
    n_features: int
    teacher_threshold: float


def _featurize(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.withColumn(_TOKENS, words_col(F.col(text_col)))


def train_quality_classifier(
    train_docs: DataFrame,
    *,
    text_col: str = "text",
    label_col: str | None = None,
    teacher_threshold: float = 0.5,
    n_features: int = 1 << 18,
    max_iter: int = 30,
    reg_param: float = 1e-4,
    elastic_net_param: float = 0.0,
) -> QualityClassifier:
    """Fit the student on ``train_docs`` (a bounded sample — see module
    docstring; this function does NOT sample for you, so the cost is
    exactly ``max_iter`` passes over what you pass in).

    ``label_col``: an existing 0/1 integer column (human/LLM labels).
    When None, the teacher is the repo's deterministic quality
    heuristic (:func:`quality_score_col`) thresholded at
    ``teacher_threshold`` — the self-distillation mode whose value is
    vocabulary generalization, used by the tests as a closed-loop
    oracle (student must reproduce teacher labels on held-out data).
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    feats = _featurize(train_docs, text_col)
    if label_col is None:
        feats = feats.withColumn(
            _LABEL,
            (quality_score_col(F.col(text_col)) >= F.lit(teacher_threshold))
            .cast("double"),
        )
    else:
        feats = feats.withColumn(_LABEL, F.col(label_col).cast("double"))

    tf = HashingTF(
        inputCol=_TOKENS, outputCol=_FEATURES, numFeatures=n_features
    )
    lr = LogisticRegression(
        featuresCol=_FEATURES,
        labelCol=_LABEL,
        maxIter=max_iter,
        regParam=reg_param,
        elasticNetParam=elastic_net_param,
        standardization=False,
        predictionCol=_PRED,
        rawPredictionCol=_RAW_PRED,
        probabilityCol=_PROB_VEC,
    )
    model = lr.fit(tf.transform(feats))
    return QualityClassifier(
        hashing_tf=tf,
        lr_model=model,
        n_features=n_features,
        teacher_threshold=teacher_threshold,
    )


def score_quality(
    clf: QualityClassifier,
    docs: DataFrame,
    *,
    text_col: str = "text",
    prob_col: str = "quality_prob",
    keep_col: str = "quality_keep",
) -> DataFrame:
    """Corpus-scale scoring: adds ``prob_col`` (P(label=1) as double)
    and ``keep_col`` (the 0.5-argmax decision) to ``docs``.  Narrow
    map, no shuffle, no Python UDF."""
    from pyspark.ml.functions import vector_to_array

    scored = clf.lr_model.transform(
        clf.hashing_tf.transform(_featurize(docs, text_col))
    )
    return scored.select(
        *docs.columns,
        vector_to_array(F.col(_PROB_VEC)).getItem(1).alias(prob_col),
        F.col(_PRED).cast("boolean").alias(keep_col),
    )
