"""Z-order layout writer (operators/layout.py): Morton-key bit math vs a
Python re-derivation, null/degenerate quantization, the fit-in-a-long
guard, and the actual data-skipping property measured from the written
parquet row-group stats."""

from __future__ import annotations

import glob
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_to_avro_schema_spark.operators.layout import (  # noqa: E402
    with_zorder,
    write_zordered,
)


def _morton(vals, bits):
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_key_matches_python(spark):
    # quantization is identity when values already span [0, 2^bits)
    bits = 4
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["__z"]
        for r in with_zorder(df, ["x", "y"], bits=bits).collect()
    }
    for a, b in rows:
        # min/max quantization maps 0..15 onto 0..15 exactly
        assert got[(a, b)] == _morton([a, b], bits), (a, b)


def test_nulls_degenerate_and_guard(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 7.0), (2, None, 7.0), (3, 9.0, 7.0)],
        "id long, x double, c double",
    )
    out = {r["id"]: r["__z"] for r in with_zorder(df, ["x", "c"]).collect()}
    assert out[2] is not None  # null x quantizes to 0, key still defined
    # constant column c contributes 0 bits everywhere
    assert out[1] == 0  # x=min -> 0, c degenerate -> 0
    with pytest.raises(ValueError):
        with_zorder(df, ["x"] * 8, bits=12)
    with pytest.raises(ValueError):
        with_zorder(df, [])


def _rowgroup_widths(path, col, lo, hi):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(stats_min_value AS DOUBLE), "
        "CAST(stats_max_value AS DOUBLE) "
        "FROM parquet_metadata(?) WHERE path_in_schema = ?",
        [os.path.join(path, "*.parquet"), col],
    ).fetchall()
    assert rows
    return [(mx - mn) / (hi - lo) for mn, mx in rows]


def test_zorder_write_narrows_rowgroup_stats(spark, tmp_path):
    # two INDEPENDENT uniform columns: an unsorted write gives every file
    # ~full range on both; the z-ordered write must narrow BOTH at once
    n = 120_000
    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("x"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(100_000)).alias("y"),
    )
    plain = str(tmp_path / "plain")
    zpath = str(tmp_path / "zorder")
    df.repartition(16).write.parquet(plain)
    write_zordered(df, zpath, ["x", "y"], n_files=16)

    # same rows in both layouts
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(plain).count()
        == n
    )
    for col in ("x", "y"):
        wp = _rowgroup_widths(plain, col, 0, 99_999)
        wz = _rowgroup_widths(zpath, col, 0, 99_999)
        avg_p = sum(wp) / len(wp)
        avg_z = sum(wz) / len(wz)
        # unsorted files span ~the full range; z-ordered files must be
        # at least 2x narrower on BOTH columns simultaneously
        assert avg_p > 0.9, (col, avg_p)
        assert avg_z < 0.5 * avg_p, (col, avg_z, avg_p)
