"""Driver-faithful local correctness check.

Replicates the per-round driver gate: for every entry in
``__spark_entry__.queries()`` that has an ``oracle_sql()`` string, run the
Spark query at sf0.01 AND the DuckDB oracle over the same parquet tables,
then compare row count, schema (column names sorted), and a TYPE-SENSITIVE
value hash (the round-1 lesson: DuckDB sum() returns HUGEINT while Spark
returns BIGINT, and the driver's hash sees the difference — so this check
is strict about integer vs float dtypes, unlike tests/test_oracle_parity.py
which normalizes).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _cell(v) -> str:
    # type-sensitive: 1 (int) != 1.0 (float); round floats to 9 dp so
    # engine-level float noise doesn't flip the hash (driver tolerance).
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, float):
        return f"f:{round(v, 9)!r}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    if isinstance(v, (list, tuple)):
        return "a:[" + ",".join(_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update("\x01".join(_cell(v) for v in row).encode())
        h.update(b"\x02")
    return h.hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from json_to_avro_schema_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results, n_green, n_red, n_noora = {}, 0, 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n_noora += 1
            results[name] = {"err": "no_oracle"}
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf).toPandas()
            t_spark = time.monotonic() - t0
            odf = con.execute(oracles[name]).fetchdf()
            # duckdb fetchdf maps HUGEINT->float64 silently; detect via
            # a strict dtype-kind comparison after column sort
            s, o = _canon(sdf), _canon(odf)
            rows = len(s) == len(o)
            schema = list(s.columns) == list(o.columns)
            kinds_s = [s[c].dtype.kind for c in s.columns]
            kinds_o = [o[c].dtype.kind for c in o.columns]
            hm = rows and schema and _hash(s) == _hash(o)
            results[name] = {
                "rows_match": rows,
                "schema_match": schema,
                "hash_match": hm,
                "dtype_kinds": [kinds_s, kinds_o] if not hm else None,
                "spark_rows": len(s),
                "oracle_rows": len(o),
                "spark_sec": round(t_spark, 3),
                "total_sec": round(time.monotonic() - t0, 3),
            }
            if rows and schema and hm:
                n_green += 1
                print(
                    f"ok   {name}: spark={t_spark:.2f}s "
                    f"total={time.monotonic() - t0:.2f}s"
                )
            else:
                n_red += 1
                print(f"RED  {name}: rows={rows} schema={schema} hash={hm}")
                if not schema:
                    print(f"     spark cols: {list(s.columns)}")
                    print(f"     oracle cols: {list(o.columns)}")
                elif not hm and len(s) == len(o) and len(s) <= 20:
                    print(s.head(8).to_string())
                    print(o.head(8).to_string())
        except Exception as e:  # noqa: BLE001
            n_red += 1
            results[name] = {"err": f"{type(e).__name__}: {e}"}
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")

    print(f"\ngreen={n_green} red={n_red} no_oracle={n_noora}")
    Path("/tmp/local_correctness.json").write_text(
        json.dumps(results, indent=1, default=str)
    )
    return 1 if n_red else 0


if __name__ == "__main__":
    raise SystemExit(main())
