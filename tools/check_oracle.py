#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (builder-side
feedback loop only; not part of the Scala library).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB against <sfDir>/*.parquet
views, sorts columns by name + rows by all columns, and compares values
exactly (with a small report on near-misses).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pa_ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm_type(t: pa.DataType) -> str:
    """Canonical type label, dtype-STRICT where the driver's hash is.

    The driver hashes typed values, so DuckDB HUGEINT (arrow
    decimal128(38,0)) vs Spark BIGINT (int64) must FAIL here even when
    the numbers agree. Only representation-level spellings that hash
    identically are collapsed (large_string vs string, tz label on
    timestamps, dictionary encoding)."""
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return str(t)


def schema_types(schema: pa.Schema) -> dict:
    return {f.name: norm_type(f.type) for f in schema}


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # byte-level like the driver's hash: -0.0 != +0.0
        if a == 0.0 and b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # Bounded resources for scale-SF oracle runs: an uncapped DuckDB
    # computing a 483M-row bin-join oracle at sf10 was OOM-killed at
    # 49 GB RSS (round-12 sweep). With a memory_limit and a disk
    # temp_directory DuckDB spills instead of dying; both overridable.
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '24GB')}'")
    tmp = os.environ.get("DUCKDB_TMP", "/tmp/duckdb_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    thr = os.environ.get("DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        # large ScaleData outputs are parallel-written DIRECTORIES named
        # <t>.parquet; DuckDB's read_parquet takes globs, not bare dirs
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_ds = pa_ds.dataset(f"{out_dir}/{name}", format="parquet")
            got_types = schema_types(spark_ds.schema)
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp_tbl = con.execute(sql).arrow()
            exp_types = schema_types(exp_tbl.schema)
            exp = canon(exp_tbl.to_pandas())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1
            continue
        type_mismatch = {c: (got_types.get(c), exp_types.get(c))
                         for c in got.columns
                         if got_types.get(c) != exp_types.get(c)}
        if type_mismatch:
            print(f"FAIL {name}: dtype mismatch (spark, duck): {type_mismatch}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                if not values_equal(g, e):
                    bad.append((c, i, g, e))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ value mismatches, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(got)} rows x {len(got.columns)} cols")
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
