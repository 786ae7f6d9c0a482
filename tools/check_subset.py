#!/usr/bin/env python3
"""Subset wrapper around check_oracle: compares only the queries whose
Spark dump directory exists under <verifyOutDir> (builder-side sweep
tooling — Verify dumps oracle_sql.json with EVERY oracle, so a
restricted dump needs the oracle set filtered before the compare).
Also prints per-oracle DuckDB wall time so SCALING.md can report it.

Usage: python3 tools/check_subset.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle  # noqa: E402


def main(sf_dir: str, out_dir: str) -> int:
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    dumped = {n for n in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, n))}
    subset = {n: sql for n, sql in oracles.items() if n in dumped}
    missing = dumped - set(oracles)
    if missing:
        print(f"note: dumped but no oracle (skipped): {sorted(missing)}")
    with open(f"{out_dir}/oracle_sql.json", "w") as f:
        json.dump(subset, f)
    t0 = time.time()
    rc = check_oracle.main(sf_dir, out_dir)
    print(f"subset compare: {len(subset)} queries in {time.time() - t0:.1f}s")
    # restore the full oracle map for any later full-catalog compare
    with open(f"{out_dir}/oracle_sql.json", "w") as f:
        json.dump(oracles, f)
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
