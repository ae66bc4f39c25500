"""Distributed quality-classifier training — the missing TRAIN half of
model-based data filtering (t18 scores with a fixed weight table; this
module produces one).

The pattern is the CCNet / GPT-3 / FineWeb-Edu quality-filter loop: derive
cheap per-document features, label a training slice (weak rule labels or
human/LLM labels — the trainer doesn't care), fit a logistic regression
DISTRIBUTED (``pyspark.ml`` L-BFGS: the gradient is one treeAggregate pass
over the cached feature vectors per iteration — corpus-sized map work,
driver-sized state), then throw the model AWAY as an object and keep only
its weights: serving is a pure whole-stage-codegen sigmoid expression
(``lr_score_expr``), so scoring 100 TB costs one scan with NO Python, no
MLlib, and no shuffle.

Reference parity: the reference has no trainer (its `sis_ai` tree is dead
commented-out code, /root/reference/src/core/sis_ai.h); this implements the
public-literature operator the LLM-pipeline mandate names (quality scoring
→ its training step), on public Spark MLlib API only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ago_sisdb_spark.operators import text as text_ops

QUALITY_FEATURES = ("f_loglen", "f_wordlen", "f_stopratio", "f_punctratio")


def quality_features(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append the four cheap quality features (all expression-only, one
    scan): log10 length, mean word length, distinct-stopword ratio,
    punctuation ratio.  Nulls (empty docs) coalesce to 0 so the trainer
    and the serving expression never see NULL features."""
    t = F.col(text_col)
    return (
        docs.withColumn("f_loglen", F.log10(F.length(t) + F.lit(1.0)))
        .withColumn(
            "f_wordlen", F.coalesce(text_ops.mean_word_len(t), F.lit(0.0))
        )
        .withColumn(
            "f_stopratio", F.coalesce(text_ops.stopword_ratio(t), F.lit(0.0))
        )
        .withColumn(
            "f_punctratio", F.coalesce(text_ops.punct_ratio(t), F.lit(0.0))
        )
    )


def train_lr(
    train: DataFrame,
    feature_cols: list[str] | tuple[str, ...],
    label_col: str,
    max_iter: int = 200,
    reg_param: float = 0.0,
    tol: float = 1e-9,
) -> tuple[list[float], float]:
    """Fit logistic regression distributed and return ``(weights,
    intercept)`` as plain Python floats — the only state that leaves the
    cluster.  Each L-BFGS iteration is one treeAggregate over the feature
    vectors (MLlib caches the assembled instances for the duration), so
    training cost is iterations × one corpus pass and the result is
    driver-tiny regardless of corpus size."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="__features"
    ).transform(
        train.select(
            *[F.col(c).cast("double").alias(c) for c in feature_cols],
            F.col(label_col).cast("double").alias("__label"),
        )
    )
    model = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        maxIter=max_iter,
        regParam=reg_param,
        tol=tol,
        standardization=True,
    ).fit(assembled)
    return [float(w) for w in model.coefficients], float(model.intercept)


def lr_score_expr(
    feature_cols: list[str] | tuple[str, ...],
    weights: list[float],
    intercept: float,
) -> Column:
    """The serving path: sigmoid(w·x + b) as a single Column expression —
    whole-stage codegen, no Python, broadcast-free (the model is literals).
    This is what runs over 100 TB; ``train_lr`` runs once on the labeled
    slice."""
    if len(feature_cols) != len(weights):
        raise ValueError(
            f"{len(feature_cols)} feature cols vs {len(weights)} weights"
        )
    z = F.lit(float(intercept))
    for c, w in zip(feature_cols, weights):
        z = z + F.col(c) * F.lit(float(w))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_threshold: float = 0.75,
    max_iter: int = 200,
) -> DataFrame:
    """End-to-end distillation of the composite quality rule into a linear
    scorer: weak labels = ``quality_score >= label_threshold`` (3 of the 4
    C4/Gopher-flavored rules pass), features = the rules' raw inputs, one
    distributed fit, then expression-only scoring of every document.

    Returns (id, pred_label bigint, score double) — the trained filter
    applied to the full corpus.  The weak-label rule is an AND of
    thresholds, which a linear model can only approximate — that gap is
    the realistic part (pytest pins accuracy and agreement with an
    independent plain-numpy trainer instead of an exact oracle)."""
    feats = quality_features(docs, text_col).select(
        id_col,
        *QUALITY_FEATURES,
        (text_ops.quality_score(F.col(text_col)) >= F.lit(label_threshold))
        .cast("int")
        .alias("__y"),
    )
    feats = feats.cache()
    try:
        weights, intercept = train_lr(
            feats, QUALITY_FEATURES, "__y", max_iter=max_iter
        )
        score = lr_score_expr(QUALITY_FEATURES, weights, intercept)
        return feats.select(
            id_col,
            (score > F.lit(0.5)).cast("bigint").alias("pred_label"),
            F.round(score, 6).alias("score"),
        )
    finally:
        feats.unpersist()
