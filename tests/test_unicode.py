"""Unicode normalization (operators/text.normalize_unicode): NFC parity
with the DuckDB oracle function, NFKC compatibility folding, the
lower/collapse pass, null passthrough, and the out_col/form surface."""

from __future__ import annotations

import os
import sys
import unicodedata

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_to_avro_schema_spark.operators.text import normalize_unicode  # noqa: E402

CASES = [
    "Café",          # decomposed acute -> composed é
    "ﬁle",            # ﬁ ligature (NFC keeps, NFKC folds)
    "ｆｕｌl", # fullwidth letters (NFKC folds)
    "Ångström",  # decomposed Å and ö
    "plain ascii",
    "",
]


def test_nfc_matches_duckdb_and_python(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(CASES)] + [(99, None)],
        "id long, text string",
    )
    got = {
        r["id"]: r["text"] for r in normalize_unicode(df, "text").collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(CASES):
        assert got[i] == unicodedata.normalize("NFC", s)
        assert got[i] == con.execute(
            "SELECT nfc_normalize(?)", [s]
        ).fetchone()[0], s
    assert got[99] is None


def test_nfkc_folds_compatibility_forms(spark):
    df = spark.createDataFrame(
        [(1, "ﬁle ｆｕｌl")], "id long, text string"
    )
    out = normalize_unicode(df, "text", form="NFKC").head()["text"]
    assert out == "file full"


def test_lower_collapse_out_col_and_errors(spark):
    df = spark.createDataFrame(
        [(1, "  Café\t\tBAR  baz ")], "id long, text string"
    )
    out = normalize_unicode(
        df, "text", lowercase=True, collapse_whitespace=True,
        out_col="clean",
    ).head()
    assert out["clean"] == "café bar baz"
    assert out["text"] == "  Café\t\tBAR  baz "  # original kept
    with pytest.raises(ValueError):
        normalize_unicode(df, "text", form="NFX")
