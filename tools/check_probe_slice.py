#!/usr/bin/env python3
"""Probe-sliced subset oracle for q171_rrf_fusion at sf100 (round-15
verdict task 1: the RRF family had no sf100 row; the FULL oracle is
DuckDB-impractical on this box — the dense leg alone is a
|probes| x |vectors| = 200 x 2M = 400M-row window sort, measured OOM at
a 40 GB cap even at sf10).

The slice axis is the PROBE SET, because q171's output is per-probe
independent by construction:
  - dense leg: per-probe top-100 by cosine — each probe ranks the whole
    corpus independently;
  - lexical leg: tf/df/len/stats are probe-INDEPENDENT corpus facts
    (df counts docs containing a token, the maxDocFreq cut is
    df*10 <= n_docs — none depend on which probes are asked), and the
    per-(probe, doc) BM25 sum uses only that probe's tokens;
  - fusion + top-5: windowed per probe_id.
So restricting the probes CTE to the md5-lowest 20 (a PREFIX of the
md5-lowest 200 the engine ran — same ORDER BY, smaller LIMIT) computes
the EXACT full-output slice for those 20 probe_ids, compared
value-for-value against the engine dump's same slice.

The slice is produced by anchored text replacement on the COMMITTED
oracle SQL (loaded from the dump's oracle_sql.json — never a
hand-copied fork): the single `LIMIT 200` inside the probes CTE
becomes `LIMIT 20`. Both anchors must hit exactly once or we refuse
to guess.

Validate the machinery at sf10 first (where the full oracle passes
under a 90 GB cap — see SCALING.md round 16) before trusting the
sf100 run: the same checker, same slice, smaller SF.

Usage: python3 tools/check_probe_slice.py <sfDir> <verifyOutDir> [nProbes]
Env: DUCKDB_MEM (default 24GB), DUCKDB_TMP (default /tmp/duckdb_tmp)
"""
import json
import os
import sys
import time

import duckdb


def table_path(sf_dir: str, t: str) -> str:
    p = os.path.join(sf_dir, f"{t}.parquet")
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def frames_equal(con, sql_a: str, sql_b: str, label: str) -> bool:
    n_diff = con.execute(
        f"SELECT count(*) FROM ((({sql_a}) EXCEPT ALL ({sql_b}))"
        f" UNION ALL (({sql_b}) EXCEPT ALL ({sql_a})))").fetchone()[0]
    n_a = con.execute(f"SELECT count(*) FROM ({sql_a})").fetchone()[0]
    n_b = con.execute(f"SELECT count(*) FROM ({sql_b})").fetchone()[0]
    ok = n_diff == 0 and n_a == n_b
    print(f"[{label}] rows={n_a} vs {n_b}, sym-diff={n_diff} -> "
          f"{'OK' if ok else 'MISMATCH'}")
    return ok


def main(sf_dir: str, dump_dir: str, n_probes: int = 20) -> int:
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '24GB')}'")
    tmp = os.environ.get("DUCKDB_TMP", "/tmp/duckdb_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_path(sf_dir, t)}')")

    with open(f"{dump_dir}/oracle_sql.json") as f:
        oracle = json.load(f)["q171_rrf_fusion"]

    probes_anchor = "LIMIT 200)"
    assert oracle.count(probes_anchor) == 1, \
        "q171 oracle drifted: probes LIMIT anchor not unique"
    sliced = oracle.replace(probes_anchor, f"LIMIT {n_probes})")
    # the engine ran LIMIT 200; the slice must be a strict subset
    assert 0 < n_probes <= 200, "slice must be a prefix of the engine's probe set"

    dump = (f"SELECT probe_id, rnk, doc_id, rrf FROM "
            f"read_parquet('{dump_dir}/q171_rrf_fusion/*.parquet')")
    # the sliced probe ids, re-derived from SOURCE embeddings (the same
    # md5 order both engines use)
    probe_ids = f"""
      SELECT vec_id AS probe_id FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_probes}"""
    engine_slice = (f"SELECT s.probe_id, s.rnk, s.doc_id, s.rrf "
                    f"FROM ({dump}) s JOIN ({probe_ids}) p USING (probe_id)")
    n_slice = con.execute(
        f"SELECT count(*) FROM ({engine_slice})").fetchone()[0]
    assert n_slice > 0, (
        "q171 engine slice is EMPTY — the probe sample hit no output "
        "rows, the check would be vacuous")

    t0 = time.time()
    ok = frames_equal(con, sliced, engine_slice,
                      f"q171 probe-slice ({n_probes} of 200)")
    print(f"  q171 slice oracle wall: {time.time() - t0:.1f}s")
    return 0 if ok else 1


if __name__ == "__main__":
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    sys.exit(main(sys.argv[1], sys.argv[2], n))
