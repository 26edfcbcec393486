"""Functional-dependency discovery + the x-fd table check
(operators/profile.fd_candidates / suggest_fds, compiler x-fd parsing,
table_checks 'fd' verdicts): brute-force parity, null semantics, the
discover→suggest→compile→enforce round trip, approximate FDs, and the
spec error paths."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_to_avro_schema_spark.compiler.plan import compile_document  # noqa: E402
from json_to_avro_schema_spark.errors import SpecCompileError  # noqa: E402
from json_to_avro_schema_spark.operators.profile import (  # noqa: E402
    fd_candidates,
    suggest_fds,
)
from json_to_avro_schema_spark.table_checks import run_table_checks  # noqa: E402

# country -> currency holds; city -> country holds; country -> city is
# violated for exactly one key ('de'); currency has a null (null dependents
# don't violate); a null city forms its own key
ROWS = [
    ("de", "berlin", "eur"),
    ("de", "munich", "eur"),
    ("fr", "paris", "eur"),
    ("us", "nyc", "usd"),
    ("us", "nyc", None),
    (None, None, "chf"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "country string, city string, currency string"
    )


def _brute(pairs):
    out = {}
    for a, b in pairs:
        ai = ["country", "city", "currency"].index(a)
        bi = ["country", "city", "currency"].index(b)
        keys = {}
        for r in ROWS:
            keys.setdefault(r[ai], set())
            if r[bi] is not None:
                keys[r[ai]].add(r[bi])
        n_keys = len(keys)
        n_viol = sum(1 for v in keys.values() if len(v) > 1)
        out[(a, b)] = (n_keys, n_viol, n_viol / n_keys, n_viol == 0)
    return out


def test_fd_candidates_matches_bruteforce(df):
    cols = ["country", "city", "currency"]
    got = {
        (r["determinant"], r["dependent"]): (
            r["n_keys"], r["n_violating_keys"],
            r["violation_fraction"], r["fd_holds"],
        )
        for r in fd_candidates(df, cols).collect()
    }
    want = _brute([(a, b) for a in cols for b in cols if a != b])
    assert got == want
    # the planted semantics actually happened
    assert got[("country", "currency")][3] is True  # holds despite null
    assert got[("city", "country")][3] is True
    assert got[("country", "city")][1] == 1  # only 'de' violates


def test_fd_candidates_explicit_pairs_and_errors(df):
    got = fd_candidates(df, [], pairs=[("country", "currency")]).collect()
    assert len(got) == 1 and got[0]["fd_holds"]
    with pytest.raises(ValueError):
        fd_candidates(df, ["country"])
    with pytest.raises(ValueError):
        fd_candidates(df, [], pairs=[("city", "city")])


def test_suggest_compile_enforce_round_trip(spark, df):
    entries = suggest_fds(df, ["country", "city", "currency"])
    held = {(e["determinants"][0], e["dependents"][0]) for e in entries}
    assert ("country", "currency") in held
    assert ("country", "city") not in held

    doc = {
        "$id": "x://t/FD", "type": "object",
        "properties": {
            "country": {"type": "string"}, "city": {"type": "string"},
            "currency": {"type": "string"},
        },
        # suggested (holding) FDs plus one deliberately violated
        "x-fd": entries + [
            {"name": "fd_bad", "determinants": ["country"],
             "dependents": ["city"]},
        ],
    }
    plan = compile_document(doc)
    assert len(plan.fd_checks) == len(entries) + 1
    out = {
        r["check_name"]: r for r in run_table_checks(spark, df, plan).collect()
    }
    for e in entries:
        v = out[e["name"]]
        assert v["kind"] == "fd" and v["pass"] and v["n_bad"] == 0
    bad = out["fd_bad"]
    # n_rows counts determinant KEYS (de, fr, us, null), n_bad violators
    assert bad["n_rows"] == 4 and bad["n_bad"] == 1 and not bad["pass"]


def test_approximate_fd_threshold(spark, df):
    doc = {
        "$id": "x://t/FDA", "type": "object",
        "properties": {
            "country": {"type": "string"}, "city": {"type": "string"},
        },
        "x-fd": [
            {"name": "fd_soft", "determinants": ["country"],
             "dependents": ["city"], "maxViolationFraction": 0.25},
        ],
    }
    out = run_table_checks(
        spark, df.select("country", "city"), compile_document(doc)
    ).collect()[0]
    # 1 violating key of 4 = 0.25 <= 0.25 -> passes
    assert out["pass"] and out["n_bad"] == 1


def test_x_fd_spec_errors():
    base = {
        "$id": "x://t/FDE", "type": "object",
        "properties": {"a": {"type": "string"}, "b": {"type": "string"}},
    }
    with pytest.raises(SpecCompileError, match="both sides"):
        compile_document(
            {**base, "x-fd": [{"determinants": ["a"], "dependents": ["a"]}]}
        )
    with pytest.raises(SpecCompileError, match="non-empty"):
        compile_document({**base, "x-fd": [{"determinants": ["a"]}]})
    with pytest.raises(SpecCompileError, match="maxViolationFraction"):
        compile_document(
            {**base, "x-fd": [{
                "determinants": ["a"], "dependents": ["b"],
                "maxViolationFraction": 1.0,
            }]}
        )
