"""Deterministic documents → interleaved-spans derivation.

The engine's native input (BASELINE.json input_hint) is the interleaved
table ``(doc_id, spans:array<struct<kind,text,media_ref,offset>>)``. This
module derives that shape from a plain text corpus with arithmetic only —
fixed-width text chunks plus a media span for every third document — so
every span-level operator becomes DuckDB-oracle-able: the same derivation
is re-expressed in SQL and both engines must agree byte-for-byte on the
span sequences (the north rule's (kind, text, media_ref, order) invariant).

All construction is HOF Column expressions (codegen'd, zero Python): at
100 TB this is a projection, not a shuffle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spans_from_documents(
    docs: DataFrame,
    *,
    chunk: int = 100,
    media_every: int = 3,
    corrupt_every: Optional[int] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, spans) with text split into ``chunk``-char spans (offset =
    chunk index) and, for every ``media_every``-th doc, one trailing media
    span whose ref is derived from the id (zero-padded to the reference's
    ``m-[0-9]{8}`` shape).

    ``corrupt_every`` plants offset-order violations: every N-th doc gets
    its offsets reversed — detectable by the spec's x-monotonicIncreasing
    check for any doc with ≥ 2 spans, and SQL-derivable for the oracle.
    """
    did = F.col(id_col)
    txt = F.col(text_col)
    n = F.greatest(
        F.ceil(F.length(txt) / F.lit(chunk)).cast("int"), F.lit(1)
    )
    text_spans = F.transform(
        F.sequence(F.lit(0), n - F.lit(1)),
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            txt.substr(i * chunk + 1, F.lit(chunk)).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    media_span = F.struct(
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(
            F.lit("m-"), F.lpad((did % 100_000_000).cast("string"), 8, "0")
        ).alias("media_ref"),
        n.cast("int").alias("offset"),
    )
    spans = F.when(
        did % media_every == 0, F.concat(text_spans, F.array(media_span))
    ).otherwise(text_spans)
    if corrupt_every is not None:
        total = F.size(spans)
        reversed_spans = F.transform(
            spans,
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                (total - 1 - s["offset"]).cast("int").alias("offset"),
            ),
        )
        spans = F.when(did % corrupt_every == 0, reversed_spans).otherwise(spans)
    return docs.select(did.alias("doc_id"), spans.alias("spans"))


def span_sequence_key(spans: Column) -> Column:
    """Canonical string of the span sequence — the north rule's per-row
    equality invariant (kind, text, media_ref, order) as a comparable
    value: fields joined by \\x01 within a span, spans by \\x02, in array
    order. Two rows have byte-identical span sequences iff their keys are
    equal, and the key is reproducible in any engine (no hash seeds)."""
    return F.array_join(
        F.transform(
            spans,
            lambda s: F.concat_ws(
                "\x01",
                s["kind"],
                F.coalesce(s["text"], F.lit("\x00")),
                F.coalesce(s["media_ref"], F.lit("\x00")),
                s["offset"].cast("string"),
            ),
        ),
        "\x02",
    )
