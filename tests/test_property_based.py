"""Differential property tests: for randomly generated (spec, values), the
compiled Spark predicates must agree with an independent pure-Python
draft-6 checker. One Spark round-trip per hypothesis example (the spec and
a batch of values are generated together) keeps runtime bounded."""

from __future__ import annotations

import math
import os
import re
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_to_avro_schema_spark.compiler.plan import compile_document  # noqa: E402
from json_to_avro_schema_spark.runner import run_validation  # noqa: E402

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------- python oracle

def py_passes(spec: dict, v) -> bool:
    """Independent draft-6 checker for the generated keyword subset.
    Nulls pass value constraints (requiredness is tested separately)."""
    if v is None:
        return True
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        if "minimum" in spec and not v >= spec["minimum"]:
            return False
        if "maximum" in spec and not v <= spec["maximum"]:
            return False
        if "exclusiveMinimum" in spec and not v > spec["exclusiveMinimum"]:
            return False
        if "exclusiveMaximum" in spec and not v < spec["exclusiveMaximum"]:
            return False
        if "multipleOf" in spec:
            m = spec["multipleOf"]
            if isinstance(v, int) and isinstance(m, int):
                if v % m != 0:
                    return False
            else:
                r = v / m
                if abs(r - round(r)) >= 1e-9:
                    return False
        if "enum" in spec and v not in spec["enum"]:
            return False
    if isinstance(v, str):
        if "minLength" in spec and len(v) < spec["minLength"]:
            return False
        if "maxLength" in spec and len(v) > spec["maxLength"]:
            return False
        if "pattern" in spec and not re.search(spec["pattern"], v):
            return False
        if "enum" in spec and v not in spec["enum"]:
            return False
    if isinstance(v, list):
        if "minItems" in spec and len(v) < spec["minItems"]:
            return False
        if "maxItems" in spec and len(v) > spec["maxItems"]:
            return False
        if spec.get("uniqueItems") and len(set(v)) != len(v):
            return False
        if "items" in spec and not all(py_passes(spec["items"], x) for x in v):
            return False
    return True


def _spark_failing(spark, col_spec: dict, values, schema: str):
    doc = {
        "$id": "x://t/Prop",
        "type": "object",
        "properties": {"id": {"type": "integer"}, "v": col_spec},
        "required": ["id"],
    }
    plan = compile_document(doc)
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, f"id long, v {schema}")
    res = run_validation(spark, df, plan)
    return {r["id"] for r in res.violations.select("id").collect()}


# ------------------------------------------------------------- strategies

int_specs = st.fixed_dictionaries(
    {"type": st.just("integer")},
    optional={
        "minimum": st.integers(-50, 50),
        "maximum": st.integers(-50, 50),
        "exclusiveMinimum": st.integers(-50, 50),
        "exclusiveMaximum": st.integers(-50, 50),
        "multipleOf": st.integers(1, 9),
        "enum": st.lists(st.integers(-50, 50), min_size=1, max_size=5,
                         unique=True),
    },
)

str_specs = st.fixed_dictionaries(
    {"type": st.just("string")},
    optional={
        "minLength": st.integers(0, 6),
        "maxLength": st.integers(0, 10),
        "pattern": st.sampled_from([r"^[ab]+$", r"c", r"^a", r"[0-9]"]),
        "enum": st.lists(st.text(alphabet="abc01", max_size=4), min_size=1,
                         max_size=4, unique=True),
    },
)

arr_specs = st.fixed_dictionaries(
    {"type": st.just("array"),
     "items": st.fixed_dictionaries(
         {"type": st.just("integer")},
         optional={"minimum": st.integers(-5, 5)})},
    optional={
        "minItems": st.integers(0, 3),
        "maxItems": st.integers(0, 5),
        "uniqueItems": st.booleans(),
    },
)


@settings(**SETTINGS)
@given(spec=int_specs,
       values=st.lists(st.one_of(st.none(), st.integers(-60, 60)),
                       min_size=1, max_size=25))
def test_integer_keywords_match_python_oracle(spark, spec, values):
    expected = {i for i, v in enumerate(values) if not py_passes(spec, v)}
    assert _spark_failing(spark, spec, values, "long") == expected


@settings(**SETTINGS)
@given(spec=str_specs,
       values=st.lists(st.one_of(st.none(),
                                 st.text(alphabet="abc01", max_size=8)),
                       min_size=1, max_size=25))
def test_string_keywords_match_python_oracle(spark, spec, values):
    expected = {i for i, v in enumerate(values) if not py_passes(spec, v)}
    assert _spark_failing(spark, spec, values, "string") == expected


@settings(**SETTINGS)
@given(spec=arr_specs,
       values=st.lists(st.one_of(st.none(),
                                 st.lists(st.integers(-8, 8), max_size=6)),
                       min_size=1, max_size=20))
def test_array_keywords_match_python_oracle(spark, spec, values):
    expected = {i for i, v in enumerate(values) if not py_passes(spec, v)}
    assert _spark_failing(spark, spec, values, "array<long>") == expected


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=8, deadline=None)
def test_cluster_pairs_is_valid_partition(spark, raw_pairs):
    """cluster_pairs must produce the connected components exactly: every
    edge's endpoints share a rep, every rep is the min of its component
    (checked against a driver-side union-find)."""
    from json_to_avro_schema_spark.operators.dedup import cluster_pairs

    pairs = [(min(a, b), max(a, b)) for a, b in raw_pairs]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["cluster_rep"] for r in cluster_pairs(df).collect()}

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", None]),
            st.sampled_from(["p", "q", None]),
        ),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_entropy_and_mi_match_driver_oracle(spark, rows):
    """entropy / mutual_information must agree with a driver-side
    closed-form computation on arbitrary small categorical frames,
    including all-null and empty inputs."""
    from collections import Counter

    from json_to_avro_schema_spark.operators.profile import (
        entropy,
        mutual_information,
    )

    df = spark.createDataFrame(rows, "x string, y string") if rows else (
        spark.createDataFrame([], "x string, y string")
    )

    def h(counter):
        n = sum(counter.values())
        if n == 0:
            return None
        return round(
            math.log(n) - sum(c * math.log(c) for c in counter.values()) / n,
            6,
        )

    got_h = {r["column"]: (r["n_values"], r["entropy"])
             for r in entropy(df, ["x", "y"]).collect()}
    for col in ("x", "y"):
        vals = Counter(v for v in
                       (r[0] if col == "x" else r[1] for r in rows)
                       if v is not None)
        if sum(vals.values()) == 0:
            assert col not in got_h  # no non-null rows -> no output row
        else:
            assert got_h[col] == (sum(vals.values()), h(vals))

    both = [(a, b) for a, b in rows if a is not None and b is not None]
    joint, xm, ym = Counter(both), Counter(a for a, _ in both), Counter(
        b for _, b in both
    )
    n = len(both)
    (r,) = mutual_information(df, [("x", "y")]).collect()
    assert r["n_pairs"] == n
    if n == 0:
        assert r["mi"] is None
    else:
        want = math.log(n) + (
            sum(c * math.log(c) for c in joint.values())
            - sum(c * math.log(c) for c in xm.values())
            - sum(c * math.log(c) for c in ym.values())
        ) / n
        assert r["mi"] == round(want, 6)


@given(
    st.lists(st.tuples(st.integers(0, 12), st.integers(0, 3)), min_size=0,
             max_size=15, unique_by=lambda t: t[0]),
    st.lists(st.tuples(st.integers(0, 12), st.integers(0, 3)), min_size=0,
             max_size=15, unique_by=lambda t: t[0]),
)
@settings(max_examples=8, deadline=None)
def test_table_diff_matches_brute_force(spark, old_rows, new_rows):
    """table_diff statuses must equal the brute-force dict comparison for
    arbitrary unique-keyed snapshots."""
    from json_to_avro_schema_spark.operators.diff import table_diff

    schema = "k long, v long"
    old = (spark.createDataFrame(old_rows, schema) if old_rows
           else spark.createDataFrame([], schema))
    new = (spark.createDataFrame(new_rows, schema) if new_rows
           else spark.createDataFrame([], schema))
    got = {r["k"]: r["status"]
           for r in table_diff(old, new, ["k"]).collect()}

    o, n = dict(old_rows), dict(new_rows)
    want = {}
    for k in set(o) | set(n):
        if k not in o:
            want[k] = "added"
        elif k not in n:
            want[k] = "removed"
        elif o[k] != n[k]:
            want[k] = "changed"
    assert got == want


# ------------------------------------------- session-4 operator properties

@given(
    weights=st.lists(
        st.one_of(
            st.floats(min_value=0.01, max_value=1e4, allow_nan=False),
            st.sampled_from([0.0, -2.0, None]),
        ),
        min_size=0, max_size=40,
    ),
    n=st.integers(min_value=1, max_value=10),
    seed=st.sampled_from(["", "s1", "p.q-r"]),
)
@settings(max_examples=8, deadline=None)
def test_weighted_sample_matches_brute(spark, weights, n, seed):
    """weighted_sample must equal the hashlib/md5 re-derivation exactly:
    same kept set, same priorities, same order — bad rows dropped."""
    import hashlib

    from json_to_avro_schema_spark.operators.sampling import (
        HASH_SPACE,
        weighted_sample,
    )

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r["doc_id"], r["priority"])
        for r in weighted_sample(df, "doc_id", "w", n, seed=seed).collect()
    ]

    def pr(k, w):
        b = int(hashlib.md5(f"{seed}{k}".encode()).hexdigest()[:8], 16)
        return round(math.log((b + 1) / HASH_SPACE) / w, 9)

    want = sorted(
        ((k, pr(k, w)) for k, w in rows if w is not None and w > 0),
        key=lambda r: (-r[1], r[0]),
    )[:n]
    assert got == want


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=4, max_size=60, unique=True,
    ),
    n_bins=st.integers(min_value=2, max_value=6),
)
@settings(max_examples=8, deadline=None)
def test_quantile_bins_assignment_properties(spark, vals, n_bins):
    """Bin assignment must equal the >=-edge count against the rounded
    exact-percentile edges, and be monotone in the value."""
    import numpy as np

    from json_to_avro_schema_spark.operators.binning import (
        quantile_bin_edges,
        quantile_bins,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    edges = quantile_bin_edges(df, "v", n_bins)
    want_edges = [
        round(float(np.percentile(vals, 100.0 * i / n_bins)), 6)
        for i in range(1, n_bins)
    ]
    assert edges == want_edges
    got = {
        r["id"]: r["v_bin"]
        for r in quantile_bins(df, "v", n_bins).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == sum(1 for e in edges if v >= e)
    by_val = [got[i] for i, _ in sorted(enumerate(vals), key=lambda t: t[1])]
    assert by_val == sorted(by_val)  # monotone in the value


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(8)]),
            min_size=1, max_size=8,
        ).map(" ".join),
        min_size=2, max_size=22,
    ),
    threshold=st.sampled_from([0.34, 0.5, 0.75]),
)
@settings(max_examples=6, deadline=None)
def test_set_similarity_join_is_exact(spark, texts, threshold):
    """Prefix-filtered join must equal brute-force Jaccard EXACTLY on
    arbitrary corpora (recall 1.0, no false positives)."""
    import itertools

    from json_to_avro_schema_spark.operators.dedup import (
        set_similarity_join,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id_1"], r["doc_id_2"], r["n_common"], r["jaccard"])
        for r in set_similarity_join(df, threshold=threshold).collect()
    )
    sets = {i: set(t.split()) for i, t in rows}
    want = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        j = inter / len(sets[a] | sets[b])
        if j >= threshold:
            want.append((a, b, inter, round(j, 6)))
    assert got == sorted(want)


@given(
    vals=st.lists(
        st.one_of(
            st.floats(min_value=1e-3, max_value=1e6, allow_nan=False),
            st.sampled_from([0.0, None]),
        ),
        min_size=1, max_size=50,
    )
)
@settings(max_examples=8, deadline=None)
def test_benford_report_matches_brute(spark, vals):
    """benford_report must agree with the clamped-digit Python
    re-derivation on arbitrary positive/zero/null mixtures."""
    from collections import Counter

    from json_to_avro_schema_spark.operators.drift import benford_report

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = [tuple(r) for r in benford_report(df, "v").collect()]

    digs = []
    for v in vals:
        if v is None or v == 0:
            continue
        d0 = math.floor(v / 10 ** math.floor(math.log10(v)))
        digs.append(1 if d0 >= 10 else (9 if d0 < 1 else int(d0)))
    if not digs:
        assert got == [] or all(r[1] == 0 for r in got)
        return
    c = Counter(digs)
    tot = float(len(digs))
    devs = [
        abs(c.get(d, 0) / tot - math.log10(1 + 1.0 / d)) for d in range(1, 10)
    ]
    mad = round(sum(devs) / 9, 6)
    want = [
        (
            d, c.get(d, 0),
            round(c.get(d, 0) / tot, 6),
            round(math.log10(1 + 1.0 / d), 6),
            round(devs[d - 1], 6),
            mad, mad <= 0.015,
        )
        for d in range(1, 10)
    ]
    assert got == want
