"""operators/profile.py: table profiling -> constraint-spec suggestion.

The load-bearing property is the round-trip invariant: a spec suggested
from a table must compile under the engine's own compiler and validate
that same table with ZERO violations (every suggested keyword was
observed to hold)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from json_to_avro_schema_spark.compiler.plan import compile_document
from json_to_avro_schema_spark.operators.profile import (
    profile_drift,
    profile_frame,
    profile_table,
    ref_containment,
    ref_containment_frame,
    suggest_refs,
    suggest_spec,
)
from json_to_avro_schema_spark.runner import apply_row_checks, extract_violations
from json_to_avro_schema_spark.table_checks import run_table_checks


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (i, float(i) * 1.5, f"doc {i:03d}", ["A", "N", "R"][i % 3],
         i if i % 7 else None, i % 2 == 0)
        for i in range(1, 201)
    ]
    return spark.createDataFrame(
        rows,
        "id long, price double, title string, flag string, "
        "maybe int, even boolean",
    )


def test_profile_values(spark, sample):
    profs = {p.name: p for p in profile_table(sample, exact_distinct=True)}
    assert profs["id"].json_type == "integer" and profs["id"].x_bits is None
    assert profs["maybe"].x_bits == 32
    assert profs["id"].n_rows == 200 and profs["id"].n_nulls == 0
    assert profs["id"].min_value == 1 and profs["id"].max_value == 200
    assert profs["id"].is_unique and profs["id"].distinct_is_exact
    assert profs["price"].json_type == "number"
    assert profs["price"].min_value == pytest.approx(1.5)
    assert profs["flag"].enum_values == ["A", "N", "R"]
    assert profs["flag"].n_distinct == 3
    # 200 distinct titles > enum_max -> no enum, but length bounds
    assert profs["title"].enum_values is None
    assert profs["title"].min_length == 7 and profs["title"].max_length == 7
    assert profs["maybe"].n_nulls == 200 // 7  # every 7th id in 1..200
    assert not profs["maybe"].is_unique  # nulls disqualify uniqueness
    assert profs["even"].json_type == "boolean"


def test_profile_approx_mode_verifies_unique_candidates(spark, sample):
    """Approx HLL pass -> exact count_distinct only for candidates; a
    duplicated column must not be reported unique by HLL luck."""
    dup = sample.withColumn("dupish", (F.col("id") % 190).cast("long"))
    profs = {p.name: p for p in profile_table(dup, exact_distinct=False)}
    assert profs["id"].is_unique and profs["id"].distinct_is_exact
    assert not profs["dupish"].is_unique
    # enum values are exact regardless of mode (collect_set pass)
    assert profs["flag"].enum_values == ["A", "N", "R"]


def test_suggest_spec_structure(spark, sample):
    doc = suggest_spec(sample, exact_distinct=True)
    props = doc["properties"]
    assert props["id"] == {"type": "integer", "minimum": 1, "maximum": 200}
    assert props["maybe"]["x-bits"] == 32
    assert props["flag"] == {"type": "string", "enum": ["A", "N", "R"]}
    assert props["title"]["minLength"] == 7
    assert "maybe" not in doc["required"]
    assert set(doc["required"]) == {"id", "price", "title", "flag", "even"}
    assert {"name": "unique_id", "columns": ["id"]} in doc["x-unique"]
    assert "price" in doc["x-stats"]


def test_round_trip_zero_violations(spark, sample):
    """suggest -> compile -> validate the SAME table: zero violations and
    every table check passes."""
    doc = suggest_spec(sample, exact_distinct=True)
    plan = compile_document(doc)
    checked = apply_row_checks(sample, plan)
    assert extract_violations(checked, sample.columns).count() == 0
    verdicts = run_table_checks(spark, sample, plan).collect()
    assert verdicts and all(r["pass"] for r in verdicts)


def test_round_trip_catches_drifted_data(spark, sample):
    """The suggested spec is ENFORCEABLE: data outside the observed
    domain violates it."""
    doc = suggest_spec(sample, exact_distinct=True)
    plan = compile_document(doc)
    bad = spark.createDataFrame(
        [(999, -1.0, "x", "Z", None, True)],
        sample.schema,
    )
    v = extract_violations(apply_row_checks(bad, plan), bad.columns)
    names = set(v.collect()[0]["failed_checks"])
    # id range, price range, title minLength, flag enum all violated
    assert any("id" in n for n in names)
    assert any("flag" in n for n in names)


def test_non_atomic_and_temporal_columns(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01", [1.0])], "id long, d string, emb array<double>"
    ).select("id", F.col("d").cast("date").alias("d"), "emb")
    profs = {p.name: p for p in profile_table(df, exact_distinct=True)}
    assert "emb" not in profs  # non-atomic: not profiled
    assert profs["d"].json_type is None  # temporal: presence only
    doc = suggest_spec(df, exact_distinct=True)
    assert "d" in doc["required"] and "d" not in doc["properties"]
    # and the spec still compiles + validates cleanly
    plan = compile_document(doc)
    assert extract_violations(apply_row_checks(df, plan), df.columns).count() == 0


def test_profile_frame_shape(spark, sample):
    profs = profile_table(sample, exact_distinct=True)
    pf = profile_frame(sample, profs)
    rows = {r["column"]: r for r in pf.collect()}
    assert rows["id"]["is_unique"] and rows["id"]["required"]
    assert rows["flag"]["enum_vals"] == "A\x1fN\x1fR"
    assert rows["maybe"]["n_nulls"] == 200 // 7


def test_empty_table(spark):
    df = spark.createDataFrame([], "id long, s string")
    profs = profile_table(df, exact_distinct=True)
    doc = suggest_spec(df, exact_distinct=True, profiles=profs)
    assert doc["required"] == [] and "x-unique" not in doc
    assert compile_document(doc) is not None


# ---------------------------------------------------------------- refs --


@pytest.fixture(scope="module")
def parent_child(spark):
    parent = spark.createDataFrame(
        [(i, f"grp{i % 3}") for i in range(1, 51)], "pk long, grp string"
    )
    # fk values 1..60: keys 51..60 dangle (10 of 60 distinct)
    child = spark.createDataFrame(
        [(i, (i % 60) + 1, f"grp{i % 5}") for i in range(1, 121)],
        "id long, fk long, cgrp string",
    )
    return child, parent


def test_ref_containment_values(spark, parent_child):
    child, parent = parent_child
    cands = {
        (c.child_col, c.parent_col): c
        for c in ref_containment(
            child, parent, [("fk", "pk"), ("cgrp", "grp")]
        )
    }
    fk = cands[("fk", "pk")]
    assert fk.n_child_keys == 60 and fk.n_dangling_keys == 10
    assert fk.containment == pytest.approx(1.0 - 10 / 60)
    assert fk.parent_is_unique and fk.parent_n_keys == 50
    grp = cands[("cgrp", "grp")]
    # cgrp has grp0..grp4; parent grp only grp0..grp2 -> 2 of 5 dangle
    assert grp.n_child_keys == 5 and grp.n_dangling_keys == 2
    assert not grp.parent_is_unique and grp.parent_n_keys == 3


def test_ref_containment_null_and_empty(spark, parent_child):
    _, parent = parent_child
    child = spark.createDataFrame(
        [(None,), (1,), (999,)], "fk long"
    )
    (c,) = ref_containment(child, parent, [("fk", "pk")])
    # nulls are excluded from containment (SQL FK semantics)
    assert c.n_child_keys == 2 and c.n_dangling_keys == 1
    empty = spark.createDataFrame([], "fk long")
    (e,) = ref_containment(empty, parent, [("fk", "pk")])
    assert e.n_child_keys == 0 and e.containment == 1.0


def test_suggest_refs_round_trip(spark, parent_child):
    """Suggested x-ref entries compile under the engine's own compiler and
    the referential check passes on the data that suggested them."""
    child, parent = parent_child
    contained = child.filter(F.col("fk") <= 50)
    refs = suggest_refs(
        contained, parent, [("fk", "pk"), ("cgrp", "grp")],
        ref_table="parent",
    )
    # cgrp→grp excluded twice over: dangling keys AND non-unique parent
    assert refs == [{
        "name": "ref_fk_parent", "columns": ["fk"],
        "refTable": "parent", "refColumns": ["pk"],
    }]
    doc = {
        "$schema": "http://json-schema.org/draft-06/schema#",
        "$id": "http://engine.local/SuggestedRefs",
        "type": "object", "properties": {}, "x-ref": refs,
    }
    plan = compile_document(doc)
    verdicts = run_table_checks(
        spark, contained, plan, ref_tables={"parent": parent}
    ).collect()
    assert verdicts and all(r["pass"] for r in verdicts)
    # threshold relaxation admits the partially-contained pair's child col
    loose = suggest_refs(
        child, parent, [("fk", "pk")], ref_table="parent",
        containment_threshold=0.8,
    )
    assert [r["name"] for r in loose] == ["ref_fk_parent"]


def test_ref_containment_composite_key(spark, parent_child):
    child, parent = parent_child
    contained = child.filter(F.col("fk") <= 50)
    (c,) = ref_containment(
        contained, parent, [(("fk", "cgrp"), ("pk", "grp"))]
    )
    assert c.child_col == "fk,cgrp" and c.parent_col == "pk,grp"
    # (pk, grp) is a key because pk alone already is
    assert c.parent_is_unique and c.parent_n_keys == 50
    # child tuple (fk, grp{(fk-1) % 5}) matches parent (fk, grp{fk % 3})
    expected_dangling = sum(
        1 for fk in range(1, 51) if (fk - 1) % 5 != fk % 3
    )
    assert c.n_child_keys == 50
    assert c.n_dangling_keys == expected_dangling
    # composite suggestion splits the key back into column lists
    full = child.filter(F.col("fk") <= 50).withColumn(
        "cgrp", F.concat(F.lit("grp"), ((F.col("fk") - 1) % 3).cast("string"))
    )
    refs = suggest_refs(
        full.filter(F.col("cgrp") == F.concat(
            F.lit("grp"), (F.col("fk") % 3).cast("string"))),
        parent, [(("fk", "cgrp"), ("pk", "grp"))], ref_table="parent",
    )
    assert refs == [{
        "name": "ref_fk_cgrp_parent", "columns": ["fk", "cgrp"],
        "refTable": "parent", "refColumns": ["pk", "grp"],
    }]


def test_ref_containment_composite_null_rows_excluded(spark):
    parent = spark.createDataFrame([(1, "a"), (2, "b")], "p1 long, p2 string")
    child = spark.createDataFrame(
        [(1, "a"), (1, None), (None, "b"), (9, "z")], "c1 long, c2 string"
    )
    (c,) = ref_containment(child, parent, [(("c1", "c2"), ("p1", "p2"))])
    # rows with any null key column are excluded (FK match-simple)
    assert c.n_child_keys == 2 and c.n_dangling_keys == 1


def test_ref_containment_frame_shape(spark, parent_child):
    child, parent = parent_child
    cands = ref_containment(child, parent, [("fk", "pk")])
    rows = ref_containment_frame(spark, cands).collect()
    assert rows[0]["containment"] == 1.0 - 10 / 60  # exact double, unrounded


# ------------------------------------------------------ frequent values --


@pytest.mark.parametrize("single_pass", [False, True])
def test_frequent_values(spark, single_pass):
    from json_to_avro_schema_spark.operators.profile import frequent_values

    rows = (
        [("a", 1)] * 5 + [("b", 1)] * 3 + [("c", 2)] * 3 + [(None, 3)] * 4
    )
    df = spark.createDataFrame(rows, "s string, v int")
    out = frequent_values(df, ["s", "v"], k=2, single_pass=single_pass).collect()
    by_col = {}
    for r in out:
        by_col.setdefault(r["column"], []).append(
            (r["rank"], r["value"], r["n"])
        )
    # s: 'a'×5 then NULL×4 — null participates as a value
    assert sorted(by_col["s"]) == [(1, "a", 5), (2, None, 4)]
    # v: 1×8, then tie 3×(v=2) vs 4×(v=3) → v=3 wins on count
    assert sorted(by_col["v"]) == [(1, "1", 8), (2, "3", 4)]


def test_frequent_values_tiebreak_deterministic(spark):
    from json_to_avro_schema_spark.operators.profile import frequent_values

    df = spark.createDataFrame(
        [("x",)] * 3 + [("y",)] * 3 + [("z",)] * 3, "s string"
    )
    out = frequent_values(df, ["s"], k=2).orderBy("rank").collect()
    # equal counts -> value ASC breaks the tie, stable across runs
    assert [(r["rank"], r["value"]) for r in out] == [(1, "x"), (2, "y")]


def test_frequent_values_plan_shapes(spark):
    """Default = one pruned aggregate per column (A/B'd 1.6× faster on a
    columnar source, same bytes read); single_pass = one melted scan for
    computed inputs. Both keep the rank-limit pushdown."""
    from json_to_avro_schema_spark.operators.profile import frequent_values

    df = spark.range(100).selectExpr(
        "cast(id % 7 as string) AS a", "cast(id % 3 as string) AS b"
    )
    melted = frequent_values(df, ["a", "b"], k=3, single_pass=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert melted.count("Range") == 1
    assert "WindowGroupLimit" in melted
    unioned = frequent_values(df, ["a", "b"], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert unioned.count("Range") == 2
    assert "WindowGroupLimit" in unioned
    # identical results from both shapes
    a = frequent_values(df, ["a", "b"], k=3).collect()
    b = frequent_values(df, ["a", "b"], k=3, single_pass=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --------------------------------------------------------------- drift --


def test_profile_drift_statuses_and_flags(spark):
    old = spark.createDataFrame(
        [(i, float(i), f"v{i % 3}", i, "x", i, "c") for i in range(100)],
        "id long, num double, cat string, uid long, gone string, "
        "mut long, keep string",
    )
    new = spark.createDataFrame(
        [
            (None if i < 10 else i,
             500.0 if i == 99 else float(i),
             f"v{i % 5}", i // 2, "s", 1.5, "c")
            for i in range(100)
        ],
        "id long, num double, cat string, uid long, mut string, "
        "added double, keep string",
    )
    opf = profile_frame(old, profile_table(old, exact_distinct=True))
    npf = profile_frame(new, profile_table(new, exact_distinct=True))
    d = {r["column"]: r for r in profile_drift(opf, npf).collect()}
    assert d["gone"]["status"] == "removed" and d["gone"]["drifted"]
    assert d["added"]["status"] == "added" and d["added"]["drifted"]
    assert d["mut"]["status"] == "type_changed"  # integer -> string
    assert d["id"]["null_jump"] and d["id"]["null_rate_new"] == 0.1
    assert d["num"]["range_expanded"] and not d["num"]["null_jump"]
    # cat: 3 -> 5 distinct (shift > 0.5) and values beyond the old enum
    assert d["cat"]["distinct_shift"] and d["cat"]["enum_widened"]
    assert d["uid"]["unique_regressed"]
    assert d["keep"]["status"] == "kept" and not d["keep"]["drifted"]


def test_profile_drift_enum_blew_cap(spark):
    """A column whose enum fit the cap yesterday but not today must flag
    enum_widened even though today's value set is unavailable."""
    old = spark.createDataFrame(
        [(f"v{i % 3}",) for i in range(50)], "cat string"
    )
    new = spark.createDataFrame(
        [(f"v{i}",) for i in range(50)], "cat string"  # 50 > enum_max
    )
    opf = profile_frame(old, profile_table(old, exact_distinct=True))
    npf = profile_frame(new, profile_table(new, exact_distinct=True))
    (row,) = profile_drift(opf, npf).collect()
    assert row["enum_widened"] and row["drifted"]


def test_fd_violations_extracts_conflicting_keys(spark):
    from json_to_avro_schema_spark.operators.profile import fd_violations

    df = spark.createDataFrame(
        [
            ("a", "en", 1), ("a", "en", 2),          # FD holds
            ("b", "en", 3), ("b", "de", 4),          # violated
            ("c", None, 5), ("c", "fr", 6),          # null doesn't count
            ("d", None, 7), ("d", None, 8),          # all-null: holds
        ],
        "src string, lang string, id long",
    )
    got = {
        r["src"]: (r["n_distinct"], r["n_rows"], r["lang_min"], r["lang_max"])
        for r in fd_violations(df, ["src"], ["lang"]).collect()
    }
    assert got == {"b": (2, 2, "de", "en")}

    # composite dependents and the no-examples mode
    multi = fd_violations(
        df, ["src"], ["lang", "id"], with_examples=False
    )
    assert set(multi.columns) == {"src", "n_distinct", "n_rows"}
    # every src maps to >1 (lang, id) pair except the all-null-lang d
    # (count_distinct skips rows with ANY null dependent)
    assert {r["src"] for r in multi.collect()} == {"a", "b"}

    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        fd_violations(df, [], ["lang"])
    with _pt.raises(ValueError, match="both sides"):
        fd_violations(df, ["src"], ["src", "lang"])


def test_correlations_fused_pairs(spark):
    from json_to_avro_schema_spark.operators.profile import correlations

    df = spark.createDataFrame(
        [
            (1.0, 2.0, 5.0, 1.0),
            (2.0, 4.0, 4.0, 1.0),
            (3.0, 6.0, 3.0, 1.0),
            (4.0, 8.0, 2.0, 1.0),
            (5.0, None, 1.0, 1.0),  # null excluded pairwise, not rowwise
        ],
        "a double, b double, c double, k double",
    )
    out = correlations(df, ["a", "b", "c", "k"])
    got = {(r["col_x"], r["col_y"]): (r["pearson_r"], r["n_pairs"])
           for r in out.collect()}
    assert len(got) == 6  # 4 choose 2
    assert got[("a", "b")] == (1.0, 4)       # perfect, null pair dropped
    assert got[("a", "c")] == (-1.0, 5)      # perfect negative, all rows
    assert got[("a", "k")] == (None, 5)      # zero variance -> null
    assert got[("b", "c")] == (-1.0, 4)

    # exact value vs the closed form on a non-degenerate pair
    df2 = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 5.0)], "x double, y double"
    )
    r = correlations(df2, ["x", "y"]).collect()[0]
    import math
    xs, ys = [1.0, 2.0, 3.0, 4.0], [1.0, 3.0, 2.0, 5.0]
    mx, my = sum(xs) / 4, sum(ys) / 4
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = math.sqrt(sum((x - mx) ** 2 for x in xs)
                    * sum((y - my) ** 2 for y in ys))
    assert r["pearson_r"] == round(num / den, 6)

    # ONE scan: a single fused aggregate, no shuffle beyond its exchange,
    # no per-pair re-scan (exactly one scan node in the plan)
    plan = (
        correlations(df, ["a", "b", "c"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") <= 1

    with pytest.raises(ValueError, match=">= 2"):
        correlations(df, ["a"])
    with pytest.raises(ValueError, match="duplicate"):
        correlations(df, ["a", "a"])


def test_null_patterns_joint_missingness(spark):
    from json_to_avro_schema_spark.operators.profile import null_patterns

    df = spark.createDataFrame(
        [
            (1.0, "x"), (2.0, "y"),            # both present x2
            (None, "z"), (None, "w"), (None, "v"),  # a null only x3
            (3.0, None),                        # b null only x1
            (None, None), (None, None),         # both null x2
        ],
        "a double, b string",
    )
    out = null_patterns(df, ["a", "b"])
    got = {(r["a_null"], r["b_null"]): (r["n_rows"], r["pct"])
           for r in out.collect()}
    assert got == {
        (False, False): (2, 0.25),
        (True, False): (3, 0.375),
        (False, True): (1, 0.125),
        (True, True): (2, 0.25),
    }
    # only observed patterns appear
    solo = null_patterns(df.select("b"), ["b"])
    assert {r["b_null"] for r in solo.collect()} == {True, False}

    # the agg is the only full-row exchange; the pct window runs on the
    # <= 2^k aggregate (SinglePartition over tiny rows), not the corpus
    # (split off AQE's "Initial Plan" echo before counting)
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1

    with pytest.raises(ValueError, match="at least one"):
        null_patterns(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        null_patterns(df, ["a", "a"])
    with pytest.raises(ValueError, match="bounded at 20"):
        null_patterns(df, [f"c{i}" for i in range(21)])


def test_entropy_matches_closed_form(spark):
    import math

    from json_to_avro_schema_spark.operators.profile import entropy

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 1), ("b", 1),        # uniform 2-way
         ("c", 1), ("c", None), (None, 1), (None, 1)],  # nulls excluded
        "s string, v int",
    )
    got = {r["column"]: r for r in entropy(df, ["s", "v"]).collect()}
    # s: counts a=2 b=2 c=2 over N=6 -> uniform 3-way = ln 3
    assert got["s"]["n_values"] == 6 and got["s"]["n_distinct"] == 3
    assert got["s"]["entropy"] == round(math.log(3), 6)
    # v: single value -> zero entropy
    assert got["v"]["n_values"] == 7 and got["v"]["n_distinct"] == 1
    assert got["v"]["entropy"] == 0.0

    # skewed closed form: p = (3/4, 1/4)
    sk = spark.createDataFrame([("x",)] * 3 + [("y",)], "c string")
    h = entropy(sk, ["c"]).collect()[0]["entropy"]
    expect = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert h == round(expect, 6)

    with pytest.raises(ValueError, match="at least one"):
        entropy(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        entropy(df, ["s", "s"])


def test_mutual_information_closed_forms(spark):
    import math

    from json_to_avro_schema_spark.operators.profile import mutual_information

    # deterministic pair: y = f(x), uniform 2x2 -> MI = H(X) = ln 2;
    # independent pair: all 4 combos equally likely -> MI = 0
    df = spark.createDataFrame(
        [("a", "p", "u"), ("a", "p", "v"), ("b", "q", "u"), ("b", "q", "v")],
        "x string, y string, z string",
    )
    got = {(r["col_x"], r["col_y"]): r
           for r in mutual_information(df, [("x", "y"), ("x", "z")]).collect()}
    assert got[("x", "y")]["n_pairs"] == 4
    assert got[("x", "y")]["mi"] == round(math.log(2), 6)
    assert got[("x", "z")]["mi"] == 0.0

    # skewed dependent closed form: joint counts {(a,p):2, (a,q):1, (b,q):1}
    sk = spark.createDataFrame(
        [("a", "p"), ("a", "p"), ("a", "q"), ("b", "q")], "x string, y string"
    )
    r = mutual_information(sk, [("x", "y")]).collect()[0]
    expect = (
        0.5 * math.log(0.5 / (0.75 * 0.5))
        + 0.25 * math.log(0.25 / (0.75 * 0.5))
        + 0.25 * math.log(0.25 / (0.25 * 0.5))
    )
    assert r["mi"] == round(expect, 6)

    # nulls excluded pairwise; an all-null pair surfaces as (0, null)
    nl = spark.createDataFrame(
        [("a", None), (None, "p")], "x string, y string"
    )
    rows = {(r["col_x"], r["col_y"]): r
            for r in mutual_information(nl, [("x", "y")]).collect()}
    assert rows[("x", "y")]["n_pairs"] == 0
    assert rows[("x", "y")]["mi"] is None

    with pytest.raises(ValueError, match="at least one"):
        mutual_information(df, [])
    with pytest.raises(ValueError, match="itself"):
        mutual_information(df, [("x", "x")])
    with pytest.raises(ValueError, match="missing"):
        mutual_information(df, [("x", "nope")])
    with pytest.raises(ValueError, match="duplicate"):
        mutual_information(df, [("x", "y"), ("x", "y")])


def test_profiler_operators_validate_missing_columns(spark):
    from json_to_avro_schema_spark.operators.profile import (
        correlations,
        entropy,
        null_patterns,
    )

    df = spark.createDataFrame([(1.0, "x")], "a double, b string")
    for call in (
        lambda: null_patterns(df, ["a", "nope"]),
        lambda: entropy(df, ["nope"]),
        lambda: correlations(df, ["a", "nope"]),
    ):
        with pytest.raises(ValueError, match="missing"):
            call()
