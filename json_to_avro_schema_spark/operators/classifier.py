"""Learned quality-classifier scoring — the FineWeb-Edu / DCLM pipeline
stage the heuristic rule sets (text.gopher_rules, text.c4_clean) and the
unigram-LM perplexity filter (operators/lm.py) do not cover: a TRAINED
model's score per document, thresholded to keep the best slice (FineWeb-Edu
keeps educational-score >= 3; DCLM-Baseline keeps the top fastText
percentile). The reference repo has no text surface at all (it is a schema
transpiler; see ``/root/reference/src/main/scala/Transpiler.scala``), so
this is pipeline-extra capability per the engine brief.

Scope: INFERENCE only. Training happens offline (sklearn / fastText /
anything that emits linear coefficients) and is policy, like every other
threshold in this engine; what must scale to 100 TB is applying the model,
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
