"""Deterministic synthetic generator for the interleaved documents table.

Input shape per BASELINE.json ``input_hint``:

    doc_id: string,
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Design constraints honored here:

* **Deterministic & seedless at any scale** — every value is a pure function
  of the row id via JVM-side ``xxhash64`` (no Python RNG, no per-row Python),
  so the same (n_docs, seed) produces identical bytes on 1 core or 1000
  executors, and generation itself distributes: ``spark.range(n)`` →
  ``F.transform(F.sequence(...))`` column expressions, all codegen'd.
* **Hot-prefix skew injected** — a configurable share of rows lands on a few
  hot ``doc_id`` prefixes (FIXTURES.md §A) to exercise salting/AQE skew
  handling; ``part_key = substr(doc_id, 1, 2)`` emulates Iceberg partitions.
* **Violation seeding** — a deterministic fraction of rows per violation
  class: duplicate doc_id, null spans, kind outside enum, text/media_ref on
  the wrong kind, non-monotonic offset, dangling media_ref.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

KINDS = ("text", "media")
N_HOT_PREFIXES = 3          # hot partitions
HOT_SHARE_PCT = 30          # % of docs forced onto hot prefixes
N_PREFIXES = 64             # total prefix buckets (part_key cardinality)
N_MEDIA_ASSETS = 100_000    # id space of the media_assets side table

# violation classes (deterministic fraction of rows each)
V_NONE = 0
V_DUP_DOC_ID = 1
V_NULL_SPANS = 2
V_BAD_KIND = 3
V_WRONG_FIELD = 4
V_NON_MONOTONIC = 5
V_DANGLING_REF = 6


def _h(*cols: Column | str | int, seed: int) -> Column:
    """Deterministic 64-bit hash of (seed, *cols) — the generator's 'RNG'."""
    return F.xxhash64(F.lit(seed), *[c if isinstance(c, Column) else F.lit(c) for c in cols])


def _pm(c: Column, m: int) -> Column:
    return F.pmod(c, F.lit(m))


def _doc_id_for(id_col: Column, seed: int) -> Column:
    """doc_id = '<2-hex-prefix>-<12-digit id>'; prefix distribution is skewed."""
    u = _pm(_h(id_col, "prefix", seed=seed), 100)
    hot = _pm(_h(id_col, "hot", seed=seed), N_HOT_PREFIXES)
    cold = _pm(_h(id_col, "cold", seed=seed), N_PREFIXES)
    prefix_num = F.when(u < F.lit(HOT_SHARE_PCT), hot).otherwise(cold)
    return F.format_string("%02x-%012d", prefix_num.cast("int"), id_col)


def generate_documents_iv(
    spark: SparkSession,
    n_docs: int,
    *,
    seed: int = 42,
    violation_pct: int = 5,
    max_spans: int = 8,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Build the interleaved documents table. Pure Column expressions, scales
    linearly with cores; ``violation_pct`` percent of rows carry exactly one
    seeded violation class."""
    df = spark.range(0, n_docs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i_d = F.col("id")

    vsel = _pm(_h(i_d, "viol", seed=seed), 100)
    vclass = F.when(
        vsel < F.lit(violation_pct),
        _pm(_h(i_d, "vclass", seed=seed), 6) + F.lit(1),
    ).otherwise(F.lit(V_NONE))

    # duplicate violators collide with the doc up to 96 ids below them
    dup_target = i_d - _pm(i_d, 97)
    doc_id = F.when(
        vclass == V_DUP_DOC_ID, _doc_id_for(F.greatest(dup_target, F.lit(0)), seed)
    ).otherwise(_doc_id_for(i_d, seed))

    n_spans = (_pm(_h(i_d, "nspans", seed=seed), max_spans) + 1).cast("int")
    idx = F.sequence(F.lit(0), n_spans - 1)

    def span(i: Column, vc: Column) -> Column:
        hk = _h(i_d, i, "kind", seed=seed)
        base_kind = F.when(_pm(hk, 10) < 3, F.lit("media")).otherwise(F.lit("text"))

        ht = _h(i_d, i, "text", seed=seed)
        text_val = F.format_string("tok%04d tok%04d tok%04d", _pm(ht, 9999).cast("int"),
                                   _pm(_h(i_d, i, "t2", seed=seed), 9999).cast("int"),
                                   _pm(_h(i_d, i, "t3", seed=seed), 9999).cast("int"))
        hm = _h(i_d, i, "media", seed=seed)
        media_ok = F.format_string("m-%08d", _pm(hm, N_MEDIA_ASSETS).cast("int"))
        media_bad = F.format_string("m-missing-%08d", _pm(hm, 10_000).cast("int"))

        # violation overrides apply to span 0 only
        first = i == 0
        # V_BAD_KIND: out-of-enum kind; V_WRONG_FIELD: forced text kind so the
        # illegally-set media_ref is the (only) violation
        kind = (
            F.when((vc == V_BAD_KIND) & first, F.lit("video"))
            .when((vc == V_WRONG_FIELD) & first, F.lit("text"))
            .when((vc == V_DANGLING_REF) & first, F.lit("media"))
            .otherwise(base_kind)
        )
        is_textish = kind != "media"  # "video" rows keep text populated
        text_col = F.when(is_textish, text_val).otherwise(F.lit(None).cast("string"))
        media_col = (
            F.when((vc == V_WRONG_FIELD) & first, media_ok)          # wrong kind
            .when((vc == V_DANGLING_REF) & first, media_bad)
            .when(~is_textish, media_ok)
            .otherwise(F.lit(None).cast("string"))
        )

        # monotonic offsets: stride 16 + jitter<16 keeps strict increase;
        # V_NON_MONOTONIC reverses the sequence
        jitter = _pm(_h(i_d, i, "off", seed=seed), 16)
        off_ok = i * 16 + jitter
        off_bad = (n_spans - i) * 16 + jitter
        offset = F.when(vc == V_NON_MONOTONIC, off_bad).otherwise(off_ok).cast("int")

        return F.struct(
            kind.alias("kind"),
            text_col.alias("text"),
            media_col.alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(idx, lambda i: span(i, vclass))
    spans = F.when(vclass == V_NULL_SPANS, F.lit(None)).otherwise(spans)

    out = df.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
    ).withColumn("part_key", F.substring("doc_id", 1, 2))
    return out


def generate_media_assets(spark: SparkSession, *, n: int = N_MEDIA_ASSETS) -> DataFrame:
    """Side table of valid media refs, for referential-integrity anti-joins."""
    return spark.range(0, n).select(
        F.format_string("m-%08d", F.col("id").cast("int")).alias("media_ref")
    )


def documents_iv_spec() -> dict:
    """The flagship constraint spec for the interleaved documents table —
    the reference's golden-fixture style re-expressed as an engine spec
    (FIXTURES.md §A). Span conformance: kind ∈ {text, media}; text set iff
    kind=text; media_ref set iff kind=media; offsets strictly increasing.

    Canonical copy lives at plans/documents_iv.json (used by the CLI); this
    loads it when present and falls back to the inline literal."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "documents_iv.json",
    )
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            return json.load(f)
    # NOTE: both arms declare the same properties in the same order so their
    # Spark carriers coincide and the union scalar-collapses onto the single
    # physical span struct (compiler/types.py union rules).
    span_text_arm = {
        "properties": {
            "kind": {"const": "text"},
            "text": {"type": "string", "minLength": 1},
            "media_ref": {"type": "null"},
            "offset": {"type": "integer", "x-bits": 32, "minimum": 0},
        },
        "required": ["kind", "text", "offset"],
    }
    span_media_arm = {
        "properties": {
            "kind": {"const": "media"},
            "text": {"type": "null"},
            "media_ref": {"type": "string", "pattern": "^m-[0-9]{8}$"},
            "offset": {"type": "integer", "x-bits": 32, "minimum": 0},
        },
        "required": ["kind", "media_ref", "offset"],
    }
    return {
        "$schema": "http://json-schema.org/draft-06/schema#",
        "$id": "http://engine.local/DocumentsIV",
        "type": "object",
        "properties": {
            "doc_id": {"type": "string", "pattern": "^[0-9a-f]{2}-[0-9]{12}$"},
            "spans": {
                "type": "array",
                "minItems": 1,
                "items": {"oneOf": [span_text_arm, span_media_arm]},
                "x-monotonicIncreasing": ["offset"],
            },
        },
        "required": ["doc_id", "spans"],
        "x-unique": [{"name": "unique_doc_id", "columns": ["doc_id"]}],
        "x-stats": ["doc_id"],
    }


def documents_iv_rich_spec() -> dict:
    """Production-density variant of the flagship spec: same table, ~3× the
    constraint surface (length/pattern bounds, span-set uniqueness, a
    contains requirement, offset caps). Real validation specs carry dozens
    of keywords per column; the 4-check minimal spec is parquet-decode-bound
    at high core counts, so scaling measurements use this richer spec to
    reflect production compute density (see BENCH/BASELINE.md)."""
    import copy

    spec = copy.deepcopy(documents_iv_spec())
    spec["$id"] = "http://engine.local/DocumentsIVRich"
    props = spec["properties"]
    props["doc_id"]["minLength"] = 15
    props["doc_id"]["maxLength"] = 15
    spans = props["spans"]
    spans["maxItems"] = 64
    spans["uniqueItems"] = True
    spans["contains"] = {
        "properties": {"kind": {"enum": ["text", "media"]}},
        "required": ["kind"],
    }
    for arm in spans["items"]["oneOf"]:
        p = arm["properties"]
        if p.get("text", {}).get("type") == "string":
            p["text"]["maxLength"] = 4096
            p["text"]["pattern"] = r"\S"
        if "offset" in p and p["offset"].get("type") == "integer":
            p["offset"]["maximum"] = 1000000000
    return spec
