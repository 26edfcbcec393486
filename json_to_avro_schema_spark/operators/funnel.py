"""Composed corpus-cleaning funnel with a one-action attrition report.

Production web-corpus recipes (RefinedWeb §3's Figure-2 funnel, FineWeb,
Dolma) run the same ordered stages — URL blocklist → URL dedup → content
dedup → quality gate — and the number every paper reports is the
ATTRITION TABLE: how many documents each stage removed. This operator
composes the engine's existing stage operators and produces that table
from ONE action.

The trick is that every stage is expressed as a drop-ATTRIBUTION over the
original rows instead of a chain of shrinking frames: ``annotated``
carries one ``drop_stage`` column (null = survived the whole funnel), each
stage only labels rows still alive (``coalesce`` keeps the FIRST dropping
stage, the funnel semantics), and the report is a single
``groupBy(drop_stage).count()`` — one job, however many stages ran.

Stage order and semantics (each optional):

1. ``domain_blocked``   — registered domain in the blocklist
                          (web.url_domain identity, userinfo-proof).
2. ``url_duplicate``    — not the min-``id`` row of its canonical URL
                          (web.normalize_url identity).
3. ``text_duplicate``   — not the min-``id`` row of its normalized-text
                          fingerprint (text.fingerprint identity).
4. ``low_quality``      — fails the caller's ``keep_if`` predicate.
                          Thresholds are policy, so none ships here (same
                          contract as web.url_word_score); compose it from
                          text.quality_score / gopher_rules / analyze
                          columns or any Column expression.

Dedup winner selection considers only rows ALIVE after the earlier stages
(a URL-blocked page must not steal a canonical-URL win from a clean
refetch), which is what makes the order load-bearing — exactly as in the
published recipes.

Distributed shape: each dedup stage derives its winner set over a PRUNED
frame (id + 8-byte key only — the document text never enters a winner
shuffle, same argument as dedup.paragraph_dedup) using the rank-1
WindowGroupLimit pushdown (map tasks pre-prune to one row per key), then
rejoins by id. Cost is one extra pass over the pruned columns per dedup
stage — the honest lower bound for a funnel whose stage N depends on
N−1's survivors. The blocklist joins under web.domain_filter's broadcast
contract (whose count guard runs one tiny job at plan-construction
time — the only eager work here). No driver state; everything else
stays lazy until the caller triggers an action.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint
from .topk import grouped_topk
from .web import maybe_broadcast, normalize_url, url_domain

DROP_STAGE = "drop_stage"
STAGES = ("domain_blocked", "url_duplicate", "text_duplicate", "low_quality")


@dataclass
class FunnelResult:
    annotated: DataFrame   # original columns + drop_stage (null = kept)
    kept: DataFrame        # surviving rows, original columns untouched
    report: DataFrame      # (stage, n_docs): one row per stage that
                           # dropped anything + the terminal "kept" row;
                           # unordered (aggregation output) — sort on read


def _first_alive_winner(
    alive: DataFrame, key: Column, id_col: str, stage: str
) -> DataFrame:
    """Min-``id_col`` row per key among ``alive`` rows, as an id set.

    Only (id, key) enter the shuffle; rank-1 pushdown prunes map-side.
    """
    pruned = alive.select(F.col(id_col), key.alias("__fkey"))
    return (
        grouped_topk(
            pruned, ["__fkey"], [F.col(id_col).asc()], [id_col], 1,
            rank_col="__frk",
        )
        .select(F.col(id_col), F.lit(True).alias(f"__win_{stage}"))
    )


def corpus_funnel(
    df: DataFrame,
    *,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    blocked_domains: Optional[DataFrame] = None,
    dedup_urls: bool = True,
    dedup_text: bool = True,
    keep_if: Optional[Column] = None,
    max_broadcast_rows: int = 1_000_000,
) -> FunnelResult:
    """Run the funnel; see module docstring for stages and semantics."""
    clash = {
        DROP_STAGE, "__blocked_domain", "__win_url", "__win_text",
        "__fkey", "__frk",
    } & set(df.columns)
    if clash:
        raise ValueError(
            f"corpus_funnel output/working columns {sorted(clash)} already "
            f"exist on the input"
        )
    original_columns = list(df.columns)
    cur = df.withColumn(DROP_STAGE, F.lit(None).cast("string"))

    if blocked_domains is not None:
        b_col = blocked_domains.columns[0]
        # same count-guarded broadcast contract as web.domain_filter: past
        # the cap the hint is dropped and Spark plans the join itself
        b = maybe_broadcast(
            blocked_domains.select(
                F.col(b_col).alias("__blocked_domain")
            ).distinct(),
            max_broadcast_rows,
        )
        cur = (
            cur.join(
                b,
                url_domain(F.col(url_col)) == F.col("__blocked_domain"),
                "left",
            )
            .withColumn(
                DROP_STAGE,
                F.coalesce(
                    DROP_STAGE,
                    F.when(
                        F.col("__blocked_domain").isNotNull(),
                        F.lit("domain_blocked"),
                    ),
                ),
            )
            .drop("__blocked_domain")
        )

    if dedup_urls:
        alive = cur.filter(F.col(DROP_STAGE).isNull())
        winners = _first_alive_winner(
            alive, F.xxhash64(normalize_url(F.col(url_col))), id_col, "url"
        )
        cur = (
            cur.join(winners, id_col, "left")
            .withColumn(
                DROP_STAGE,
                F.coalesce(
                    DROP_STAGE,
                    F.when(
                        F.col("__win_url").isNull(), F.lit("url_duplicate")
                    ),
                ),
            )
            .drop("__win_url")
        )

    if dedup_text:
        alive = cur.filter(F.col(DROP_STAGE).isNull())
        winners = _first_alive_winner(
            alive, fingerprint(F.col(text_col)), id_col, "text"
        )
        cur = (
            cur.join(winners, id_col, "left")
            .withColumn(
                DROP_STAGE,
                F.coalesce(
                    DROP_STAGE,
                    F.when(
                        F.col("__win_text").isNull(), F.lit("text_duplicate")
                    ),
                ),
            )
            .drop("__win_text")
        )

    if keep_if is not None:
        cur = cur.withColumn(
            DROP_STAGE,
            F.coalesce(
                DROP_STAGE,
                F.when(~F.coalesce(keep_if, F.lit(False)),
                       F.lit("low_quality")),
            ),
        )

    report = (
        cur.groupBy(
            F.coalesce(DROP_STAGE, F.lit("kept")).alias("stage")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return FunnelResult(
        annotated=cur,
        kept=cur.filter(F.col(DROP_STAGE).isNull()).select(
            *[F.col(c) for c in original_columns]
        ),
        report=report,
    )
