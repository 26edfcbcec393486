"""Learned quality-classifier scoring — the FineWeb-Edu / DCLM pipeline
stage the heuristic rule sets (text.gopher_rules, text.c4_clean) and the
unigram-LM perplexity filter (operators/lm.py) do not cover: a TRAINED
model's score per document, thresholded to keep the best slice (FineWeb-Edu
keeps educational-score >= 3; DCLM-Baseline keeps the top fastText
percentile). The reference repo has no text surface at all (it is a schema
transpiler; see ``/root/reference/src/main/scala/Transpiler.scala``), so
this is pipeline-extra capability per the engine brief.

Scope: inference as ONE Column expression, plus a closed-form distributed
trainer (:func:`train_quality_classifier`) for the case where the labels
live in the corpus at scale (FineWeb-Edu scored 460 k LLM-annotated docs;
DCLM trained on millions of positives — at that size the training scan
itself must be the cluster's job, not a driver-side sklearn fit). The
trainer is diagonal LDA — Gaussian class-conditionals over the engineered
features with a POOLED per-feature variance — whose decision function is
exactly the linear form the scorer applies, so its output plugs straight
into :func:`score_quality_classifier`. Iterative optimizers (SGD/LBFGS)
are deliberately out of scope: diagonal LDA's sufficient statistics are
one ``groupBy(label).agg(count/sum/sum-of-squares per feature)`` — a
single partial-aggregated scan returning TWO rows, no iteration, no
per-step driver barrier — and for well-separated quality classes its
decision boundary tracks logistic regression's. Gradient-trained weights
(fastText et al.) remain loadable as plain coefficient mappings.

What must scale to 100 TB is applying the model,
and a linear model applies as ONE codegen'd Column expression:

    score = sigmoid(bias + sum_f w_f * feature_f(doc)
                         + mean_t token_weight(t))

- The engineered features come from the SAME registry the rest of the
  engine uses (text.tokens / stopword_ratio / punct_ratio HOFs) — exact
  arithmetic, JVM-side, zero UDFs.
- The optional bag-of-words term is a literal token -> weight map folded
  into the expression (``F.map_from_arrays`` + one ``F.aggregate`` over the
  staged token array) — the fastText-style lexical component. Weights ride
  the PLAN (kilobytes), not a join: nothing to shuffle, nothing to
  broadcast at runtime, and the whole scorer inlines into whole-stage
  codegen next to whatever projection already reads the text.
- The token array is staged in its own projection before the HOF reads it
  (the measured HOF re-inlining trap — see text.analyze and
  dedup._gram_frame).

At 10^12 documents this is the only shape that survives: a per-row Python
model call would be ~100x slower (Arrow round-trip per batch), and an
MLlib pipeline drags a Vector assembly + model broadcast through the plan
for what is arithmetically a dot product.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import (
    _mean_word_length_t,
    _stopword_ratio_t,
    punct_ratio,
    tokens,
)


def _ratio_of(pattern: str) -> Callable[[Column, Column], Column]:
    def f(col: Column, _toks: Column) -> Column:
        return F.length(F.regexp_replace(col, pattern, "")) / F.greatest(
            F.length(col), F.lit(1)
        )

    return f


#: feature name -> (text Column, staged token array Column) -> Column.
#: Every feature is exact Column arithmetic so an external SQL oracle can
#: re-derive scores bit-for-bit (after the documented 6-dp rounding).
FEATURES: Dict[str, Callable[[Column, Column], Column]] = {
    "log_n_chars": lambda c, t: F.log1p(F.length(c).cast("double")),
    "log_n_tokens": lambda c, t: F.log1p(F.size(t).cast("double")),
    "mean_word_len": lambda c, t: _mean_word_length_t(t),
    "stopword_ratio": lambda c, t: _stopword_ratio_t(t),
    "punct_ratio": lambda c, t: punct_ratio(c),
    "digit_ratio": _ratio_of(r"[^0-9]"),
    "upper_ratio": _ratio_of(r"[^A-Z]"),
}


def classifier_score(
    col: Column,
    toks: Column,
    weights: Mapping[str, float],
    *,
    bias: float = 0.0,
    token_weights: Optional[Mapping[str, float]] = None,
) -> Column:
    """Logistic-regression score in (0, 1) as one Column expression.

    ``weights`` maps :data:`FEATURES` names to coefficients; unknown names
    raise (a typo silently scoring 0 is how a filter quietly keeps
    everything). ``token_weights`` adds the lexical term: the MEAN mapped
    weight over the document's tokens (absent tokens weigh 0), fastText's
    averaged-bag shape. ``toks`` must be the STAGED token array column
    (see module docstring); pass ``text.tokens(col)`` only in tests.
    """
    unknown = set(weights) - set(FEATURES)
    if unknown:
        raise ValueError(
            f"unknown classifier features {sorted(unknown)} — "
            f"available: {sorted(FEATURES)}"
        )
    z: Column = F.lit(float(bias))
    for name in sorted(weights):
        z = z + F.lit(float(weights[name])) * FEATURES[name](col, toks)
    if token_weights:
        items = sorted(token_weights.items())
        tw = F.map_from_arrays(
            F.array(*[F.lit(k) for k, _ in items]),
            F.array(*[F.lit(float(v)) for _, v in items]),
        )
        lexical = F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc + F.coalesce(tw[t], F.lit(0.0)),
        ) / F.greatest(F.size(toks), F.lit(1))
        z = z + lexical
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality_classifier(
    df: DataFrame,
    weights: Mapping[str, float],
    *,
    bias: float = 0.0,
    token_weights: Optional[Mapping[str, float]] = None,
    text_col: str = "text",
    out_col: str = "clf_quality",
    keep_above: Optional[float] = None,
    decimals: Optional[int] = 6,
) -> DataFrame:
    """Add ``out_col`` with the classifier score; optionally keep only
    rows strictly above ``keep_above`` (FineWeb-Edu-style gate).

    ``decimals`` pre-rounds the score (default 6) so downstream threshold
    comparisons and cross-engine verification are immune to sub-ulp float
    noise — the same contract as lm.perplexity_split. Pass ``None`` for
    the raw score. One staged projection + one scoring projection; the
    filter (when requested) sits directly on the scan side of any later
    shuffle.
    """
    if out_col in df.columns or "__clf_toks" in df.columns:
        raise ValueError(
            f"score_quality_classifier output/working columns "
            f"{[out_col, '__clf_toks']} clash with the input"
        )
    c = F.col(text_col)
    staged = df.withColumn("__clf_toks", tokens(c))
    score = classifier_score(
        c,
        F.col("__clf_toks"),
        weights,
        bias=bias,
        token_weights=token_weights,
    )
    if decimals is not None:
        score = F.round(score, decimals)
    out = staged.withColumn(out_col, score).drop("__clf_toks")
    if keep_above is not None:
        out = out.filter(F.col(out_col) > float(keep_above))
    return out


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    *,
    features: Optional[list] = None,
    text_col: str = "text",
    var_floor: float = 1e-9,
    decimals: Optional[int] = 6,
) -> dict:
    """Fit the linear quality classifier with closed-form diagonal LDA.

    ``label_col`` must be boolean-or-0/1 (1 = keep-quality class). Each
    :data:`FEATURES` column ``f`` gets a Gaussian per class with class
    means ``mu_cf`` and a POOLED variance ``s2_f`` (unbiased, ``n - 2``
    denominator, floored at ``var_floor`` so a constant feature cannot
    divide by zero); the posterior log-odds are then linear with

        w_f  = (mu_1f - mu_0f) / s2_f
        bias = ln(n_1 / n_0) - sum_f (mu_1f^2 - mu_0f^2) / (2 s2_f)

    so ``sigmoid(bias + w . x)`` from :func:`classifier_score` IS this
    model's P(keep | x). Returns ``{"bias", "weights", "n_pos", "n_neg"}``
    — ``weights``/``bias`` plug directly into
    :func:`score_quality_classifier`.

    Distributed shape: ONE scan — a staged token projection feeding a
    ``groupBy(label)`` of ``count`` + per-feature ``sum``/``sum x^2``
    (all map-side-combined), collected as exactly TWO bounded rows of
    scalars; the matrix algebra a full-covariance LDA would need (and
    which SQL/driver code could not verify or scale) never appears.
    ``decimals`` rounds the returned coefficients (default 6 dp, the
    module's cross-engine float contract — sub-ulp aggregation-order
    drift between engines dies here instead of propagating into scores);
    pass ``None`` for raw doubles. Raises if either class is absent
    (a one-class fit has no decision boundary) or fewer than 3 rows
    carry a label.
    """
    feats = sorted(features) if features is not None else sorted(FEATURES)
    unknown = set(feats) - set(FEATURES)
    if unknown:
        raise ValueError(
            f"unknown classifier features {sorted(unknown)} — "
            f"available: {sorted(FEATURES)}"
        )
    c = F.col(text_col)
    staged = df.withColumn("__clf_toks", tokens(c))
    proj = staged.select(
        F.col(label_col).cast("int").alias("__y"),
        *[FEATURES[f](c, F.col("__clf_toks")).alias(f) for f in feats],
    ).filter(F.col("__y").isNotNull())
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in feats:
        aggs.append(F.sum(f).alias(f"__s_{f}"))
        aggs.append(F.sum(F.col(f) * F.col(f)).alias(f"__q_{f}"))
    rows = {r["__y"]: r for r in proj.groupBy("__y").agg(*aggs).collect()}
    if set(rows) != {0, 1}:
        raise ValueError(
            f"training needs both classes; label values seen: "
            f"{sorted(rows)}"
        )
    n0, n1 = rows[0]["__n"], rows[1]["__n"]
    if n0 + n1 < 3:
        raise ValueError("training needs >= 3 labeled rows for a pooled "
                         "variance (n - 2 denominator)")
    import math

    weights: dict = {}
    bias = math.log(n1 / n0)
    for f in feats:
        mu0 = rows[0][f"__s_{f}"] / n0
        mu1 = rows[1][f"__s_{f}"] / n1
        # pooled within-class sum of squares: sum(x^2) - n * mean^2 per
        # class (clamped at 0 against cancellation on constant features)
        ss = max(rows[0][f"__q_{f}"] - n0 * mu0 * mu0, 0.0) + max(
            rows[1][f"__q_{f}"] - n1 * mu1 * mu1, 0.0
        )
        s2 = max(ss / (n0 + n1 - 2), var_floor)
        weights[f] = (mu1 - mu0) / s2
        bias -= (mu1 * mu1 - mu0 * mu0) / (2.0 * s2)
    if decimals is not None:
        weights = {f: round(w, decimals) for f, w in weights.items()}
        bias = round(bias, decimals)
    return {
        "bias": bias, "weights": weights, "n_pos": int(n1), "n_neg": int(n0)
    }
