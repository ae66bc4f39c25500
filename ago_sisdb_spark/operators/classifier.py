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
        docs.withColumn(
            "f_loglen",
            F.coalesce(F.log10(F.length(t) + F.lit(1.0)), F.lit(0.0)),
        )
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


def save_weights(
    spark,
    path: str,
    feature_cols: list[str] | tuple[str, ...],
    weights: list[float],
    intercept: float,
) -> None:
    """Persist a trained linear model as a one-row parquet artifact beside
    the other serve-time state (MinHash band index, PQ codebooks, pipe8
    digest set): train once, reload into ``lr_score_expr`` /
    ``ridge_predict_expr`` in any later session without refitting."""
    if len(feature_cols) != len(weights):
        raise ValueError(
            f"{len(feature_cols)} feature cols vs {len(weights)} weights"
        )
    spark.createDataFrame(
        [(list(feature_cols), [float(w) for w in weights], float(intercept))],
        "features array<string>, weights array<double>, intercept double",
    ).write.mode("overwrite").parquet(path)


def load_weights(spark, path: str) -> tuple[list[str], list[float], float]:
    """Read back a ``save_weights`` artifact → (feature_cols, weights,
    intercept), ready for the expression-only serve path."""
    rows = spark.read.parquet(path).collect()
    if len(rows) != 1:
        raise ValueError(f"weights artifact at {path} has {len(rows)} rows")
    r = rows[0]
    return list(r["features"]), [float(w) for w in r["weights"]], float(
        r["intercept"]
    )


def _cramer3(
    a: float, b: float, c: float, d: float, e: float, f: float,
    p: float, q: float, r: float,
) -> tuple[float, float, float]:
    """Solve the symmetric 3x3 system [[a,b,c],[b,d,e],[c,e,f]] beta =
    [p,q,r] by Cramer's rule with a FIXED operation tree — the DuckDB
    oracle restates these exact formulas, so given bit-identical inputs
    both engines produce bit-identical coefficients (np.linalg.solve would
    pivot differently and break cross-engine equality at the ulp)."""
    det = a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
    if det == 0.0:
        raise ValueError("singular normal matrix — degenerate features")
    det0 = p * (d * f - e * e) - b * (q * f - e * r) + c * (q * e - d * r)
    det1 = a * (q * f - r * e) - p * (b * f - e * c) + c * (b * r - q * c)
    det2 = a * (d * r - e * q) - b * (b * r - q * c) + p * (b * e - d * c)
    return det0 / det, det1 / det, det2 / det


def ridge_fit(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    lam: float = 1.0,
) -> tuple[float, float, float]:
    """Two-feature ridge regression by NORMAL EQUATIONS — training as ONE
    aggregation pass: the map side partial-sums the 9 moments (n, Σx1,
    Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y, Σx2y), one row crosses the wire,
    and the driver solves the 3×3 system (λ on every coefficient incl.
    the intercept — documented, keeps the system one formula).  Returns
    (b0, b1, b2) for ŷ = b0 + b1·x1 + b2·x2; serving is expression-only.

    This is the closed-form counterpart of ``train_lr``: no iterations, so
    training cost at 100 TB is exactly one corpus scan.  When the inputs
    are INTEGER columns every distributed sum is exact (< 2^53), making
    the whole fit bit-reproducible across engines — the t24 gate entry
    hash-checks training end-to-end on real data, no planted input needed.
    """
    x1, x2, y = (F.col(c).cast("double") for c in (x1_col, x2_col, y_col))
    m = df.select(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(y).alias("sy"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
    ).collect()[0]
    lam = float(lam)
    return _cramer3(
        m["n"] + lam, m["s1"], m["s2"],
        m["s11"] + lam, m["s12"], m["s22"] + lam,
        m["sy"], m["s1y"], m["s2y"],
    )


def ridge_predict_expr(
    x1_col: str, x2_col: str, beta: tuple[float, float, float]
) -> Column:
    """ŷ = b0 + b1·x1 + b2·x2 as a pure Column expression (the literals
    ARE the model — no broadcast, no Python at serve time)."""
    b0, b1, b2 = (float(b) for b in beta)
    return (
        F.lit(b0)
        + F.lit(b1) * F.col(x1_col).cast("double")
        + F.lit(b2) * F.col(x2_col).cast("double")
    )


def ridge_oracle_sql(
    table: str,
    id_col: str,
    x1_expr: str,
    x2_expr: str,
    y_expr: str,
    lam: float = 1.0,
) -> str:
    """DuckDB twin of ``ridge_fit`` + ``ridge_predict_expr``: the same 9
    exact integer moments, the same Cramer operation tree (every literal
    CAST to DOUBLE — bare decimals are DECIMAL in DuckDB), the same
    prediction expression.  SUM(BIGINT) is HUGEINT — cast to DOUBLE,
    exact below 2^53."""
    lam_sql = f"CAST({lam} AS DOUBLE)"
    return f"""
    WITH feats AS (
        SELECT {id_col} AS id_,
               CAST({x1_expr} AS DOUBLE) AS x1,
               CAST({x2_expr} AS DOUBLE) AS x2,
               CAST({y_expr} AS DOUBLE) AS y
        FROM {table}),
    mom AS (
        SELECT CAST(count(*) AS DOUBLE) + {lam_sql} AS a,
               CAST(sum(x1) AS DOUBLE) AS b,
               CAST(sum(x2) AS DOUBLE) AS c,
               CAST(sum(x1 * x1) AS DOUBLE) + {lam_sql} AS d,
               CAST(sum(x1 * x2) AS DOUBLE) AS e,
               CAST(sum(x2 * x2) AS DOUBLE) + {lam_sql} AS f,
               CAST(sum(y) AS DOUBLE) AS p,
               CAST(sum(x1 * y) AS DOUBLE) AS q,
               CAST(sum(x2 * y) AS DOUBLE) AS r
        FROM feats),
    beta AS (
        SELECT (p * (d * f - e * e) - b * (q * f - e * r)
                  + c * (q * e - d * r))
               / (a * (d * f - e * e) - b * (b * f - e * c)
                  + c * (b * e - d * c)) AS b0,
               (a * (q * f - r * e) - p * (b * f - e * c)
                  + c * (b * r - q * c))
               / (a * (d * f - e * e) - b * (b * f - e * c)
                  + c * (b * e - d * c)) AS b1,
               (a * (d * r - e * q) - b * (b * r - q * c)
                  + p * (b * e - d * c))
               / (a * (d * f - e * e) - b * (b * f - e * c)
                  + c * (b * e - d * c)) AS b2
        FROM mom)
    SELECT feats.id_ AS {id_col},
           round(b0 + b1 * x1 + b2 * x2, 6) AS pred,
           round(y - (b0 + b1 * x1 + b2 * x2), 6) AS resid
    FROM feats, beta
    """


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
    independent plain-numpy trainer instead of an exact oracle).

    The label is derived from the COALESCED feature columns, not by
    re-invoking ``quality_score`` (whose HOF aggregates would re-evaluate
    per row beside the identical feature expressions, and whose NULL on
    empty/token-less docs would reach the fit as a NULL label — MLlib
    refuses NULL labels).  The thresholds come from text.QUALITY_*
    (single source with quality_score), and the length cut compares
    f_loglen against a JVM-side log10 of the same boundary so both sides
    of the knife-edge are computed by the same libm.  On every document
    with tokens the rule is identical to ``quality_score >=
    label_threshold``; degenerate docs get label 0 instead of a crash."""
    wl_lo, wl_hi = text_ops.QUALITY_WORDLEN_RANGE
    rule_hits = (
        (
            F.col("f_loglen")
            >= F.log10(F.lit(float(text_ops.QUALITY_MIN_CHARS + 1)))
        ).cast("double")
        + ((F.col("f_wordlen") >= wl_lo) & (F.col("f_wordlen") <= wl_hi)).cast(
            "double"
        )
        + (F.col("f_stopratio") >= text_ops.QUALITY_MIN_STOPRATIO).cast("double")
        + (F.col("f_punctratio") <= text_ops.QUALITY_MAX_PUNCTRATIO).cast(
            "double"
        )
    ) / 4.0

    base = quality_features(docs, text_col)
    feats = base.select(
        id_col,
        *QUALITY_FEATURES,
        (rule_hits >= F.lit(label_threshold)).cast("int").alias("__y"),
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


def eval_binary(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    threshold: int = 0,
) -> DataFrame:
    """Exact binary-classifier evaluation: Mann-Whitney ROC-AUC plus the
    threshold confusion matrix, as ONE summary row of integer-exact
    aggregates with single-division float ratios.

    The EVAL half of the model-based filter loop (train: ``train_lr``;
    serve: ``lr_score_expr`` / ``text.hashed_linear_score``): before a
    quality classifier gates 100 TB of pretraining data you measure how
    well its score ranks the labels.  The reference has no evaluator (its
    `sis_ai` tree is dead code, /root/reference/src/core/sis_ai.h); this
    is the standard public-literature metric set.

    AUC is computed EXACTLY from the tie-aware pair count (the
    Mann-Whitney U statistic): collapse the corpus to one row per
    DISTINCT score value with (n_pos, n_neg) counts — the collapse point
    is bounded by the score codomain (≤ 2e6 rows for a fixed-point e6
    score in [-1, 1]), never by the corpus — then

        auc_num2 = Σ_s n_pos(s) · (2 · Σ_{s'<s} n_neg(s') + n_neg(s))
        auc_den2 = 2 · P · N
        auc      = auc_num2 / auc_den2        (ONE float division)

    which counts each correctly-ordered (pos, neg) pair twice and each
    tied pair once.  The cumulative-negatives term uses
    ``lastper.global_prefix_sums`` (range-partitioned spans, no
    single-partition window).  All counts are int64: exact while
    P·N < 4.6e18 (~4 billion balanced labeled rows; switch the two
    pair-count columns to decimal(38,0) beyond that).  The ratios
    (auc, prec, recall, f1, accuracy) are each ONE correctly-rounded
    IEEE division of exact integers, so they hash bit-identically
    cross-engine (see working-notes: float determinism).

    ``scored`` must have one row per example.  ``score_col`` should be an
    integer (fixed-point) score so tie semantics are exact; ``label_col``
    is boolean.  ``threshold`` splits predictions as score > threshold.
    Returns one row:
      (n_pos, n_neg, auc_num2, auc_den2, auc,
       tp, fp, fn, tn, prec, recall, f1, accuracy).
    """
    from ago_sisdb_spark.operators import lastper

    lab = F.col(label_col)
    per = scored.groupBy(F.col(score_col).alias("score")).agg(
        F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(lab, 0).otherwise(1)).cast("long").alias("n_neg"),
    )
    # Eager-materialize the collapse (r7 convention: checkpoint the SMALL
    # collapse point only): global_prefix_sums fans `per` out to three plan
    # consumers (span counts ×2 via the triangular offset self-join + the
    # ranked branch), so a lazy `per` re-embeds the whole upstream scoring
    # pipeline — 6 corpus scans in t27's plan — while the checkpointed
    # frame is codomain-bounded (≤ 2e6 rows for an e6 fixed-point score),
    # never corpus-scale.  mannwhitney_u deliberately does NOT do this:
    # its distinct-value table of a continuous measure can be corpus-scale.
    per = per.localCheckpoint()
    per = lastper.global_prefix_sums(per, [F.col("score")], ["n_neg"])
    pred = F.col("score") > F.lit(threshold)
    agg = per.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("n_pos") * (F.lit(2) * F.col("cum_n_neg") + F.col("n_neg"))
        )
        .cast("long")
        .alias("auc_num2"),
        F.sum(F.when(pred, F.col("n_pos")).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(pred, F.col("n_neg")).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~pred, F.col("n_pos")).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~pred, F.col("n_neg")).otherwise(0))
        .cast("long")
        .alias("tn"),
    )

    def _ratio(num: Column, den: Column) -> Column:
        return num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0))

    return agg.select(
        "n_pos",
        "n_neg",
        "auc_num2",
        (F.lit(2) * F.col("n_pos") * F.col("n_neg"))
        .cast("long")
        .alias("auc_den2"),
        _ratio(
            F.col("auc_num2"), F.lit(2) * F.col("n_pos") * F.col("n_neg")
        ).alias("auc"),
        "tp",
        "fp",
        "fn",
        "tn",
        _ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias("prec"),
        _ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall"),
        _ratio(
            F.lit(2) * F.col("tp"),
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"),
        ).alias("f1"),
        _ratio(
            F.col("tp") + F.col("tn"),
            F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"),
        ).alias("accuracy"),
    )
