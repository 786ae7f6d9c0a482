#!/usr/bin/env python3
"""Key-sampled subset oracle for the two queries whose FULL DuckDB oracle
exceeded the box at sf100 (round-12 record, round-13 verdict task 2):

  q73_incremental_dedup — the full oracle's token/signature pipeline over
    5M docs out-spilled the free disk. The near-dup semantics are SCOPED
    by (lang, source) (candidates never cross scopes), so the oracle is
    partitionable by scope: this checker runs the COMMITTED oracle SQL
    (loaded from the Verify dump's oracle_sql.json, sliced by anchored
    text replacement — never a hand-copied fork) with the token pipeline
    restricted to a deterministic ~3% scope sample
    (substr(md5(lang||'#'||source),1,1)='0'), keeping the cheap exact-
    fingerprint CTE GLOBAL (exact dups may cross scopes). The result is
    the exact full-output slice for every new doc in the sampled scopes,
    compared value-for-value against the engine dump's same slice.

  q209/q210 IVF build + serving — the full oracle re-assigns every vector
    (|V| × sqrt(|V|) products). The subset protocol splits the claim:
      (a) assignment: for the deterministic sample md5(vec_id) LIKE '00%'
          (1/256), DuckDB re-derives cell, embedding, and norm from the
          SOURCE embeddings table and compares against the artifact dump;
      (b) occupancy: q209's engine output is re-aggregated from the full
          (vec_id, cell) artifact dump;
      (c) serving: the q210 router (probe→cell), candidate rescoring, and
          top-5 ranking are re-derived from SOURCE embeddings + the
          probed-cells slice, whose completeness against the full
          assignment dump is itself checked — so the only engine-trusted
          fact is the cell id of UNSAMPLED vectors, exactly the part (a)
          samples.
    Anything beyond that needs the full |V| re-assignment the box can't
    hold; recorded honestly as a sampled check, not a full hash.

Run the SAME checker at sf1 (where the full oracles pass, see
SCALING.md) to validate the slice machinery itself before trusting it at
sf100.

Inputs: a Verify dump dir containing q73_incremental_dedup/ +
oracle_sql.json, and a SliceDump dir (may be the same dir) containing
q209_ivf_index_build/ q210_ivf_bounded_serving/ q209_assign_all/
q209_assign_sample/ q210_probed_slice/.

Usage: python3 tools/check_sf100_slices.py <sfDir> <dumpDir>
"""
import json
import os
import re
import sys
import time

import duckdb

# Scope-sample bucket: md5 first hex char of the (lang, source) scope.
# 'd' — NOT '0' — because the testdata generator assigns source by
# doc_id % 20, so q73's "new docs" (doc_id % 10 = 9) exist ONLY in
# src9/src19 scopes; bucket '0' contains none of them and made the q73
# slice check vacuously 0 = 0 rows (caught at the round-14 sf1
# validation run — exactly what the validate-at-sf1-first step is for).
# Bucket 'd' holds zh/src19 + de/src9 (new docs present) plus 6 other
# scopes, ~5.8% of documents; doc_id % 20 and lang are replica-invariant
# under ScaleData (shift bases are multiples of 20), so the bucket
# membership is identical at every SF. main() asserts non-vacuity.
SCOPE_PRED = "substr(md5(lang || '#' || source), 1, 1) = 'd'"


def table_path(sf_dir: str, t: str) -> str:
    p = os.path.join(sf_dir, f"{t}.parquet")
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def frames_equal(con, sql_a: str, sql_b: str, label: str) -> bool:
    """Exact frame compare in DuckDB: same row multiset, column-by-column."""
    n_diff = con.execute(
        f"SELECT count(*) FROM ((({sql_a}) EXCEPT ALL ({sql_b}))"
        f" UNION ALL (({sql_b}) EXCEPT ALL ({sql_a})))").fetchone()[0]
    n_a = con.execute(f"SELECT count(*) FROM ({sql_a})").fetchone()[0]
    n_b = con.execute(f"SELECT count(*) FROM ({sql_b})").fetchone()[0]
    ok = n_diff == 0 and n_a == n_b
    print(f"[{label}] rows={n_a} vs {n_b}, sym-diff={n_diff} -> "
          f"{'OK' if ok else 'MISMATCH'}")
    return ok


def main(sf_dir: str, dump_dir: str) -> int:
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '24GB')}'")
    tmp = os.environ.get("DUCKDB_TMP", "/tmp/duckdb_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_path(sf_dir, t)}')")

    def dump(name: str) -> str:
        return f"SELECT * FROM read_parquet('{dump_dir}/{name}/*.parquet')"

    ok = True
    t0 = time.time()

    # ---------------------------------------------------------------- q73
    with open(f"{dump_dir}/oracle_sql.json") as f:
        oracle = json.load(f)["q73_incremental_dedup"]
    # anchored slice: restrict ONLY the token CTE (the near-dup pipeline,
    # scoped by construction) and the final new-doc scan; the fp CTE
    # stays global. Both anchors must hit exactly once or we refuse to
    # guess — the committed oracle is authoritative.
    toks_anchor = re.compile(r"(AS tok\s+FROM documents)\)")
    assert len(toks_anchor.findall(oracle)) == 1, "q73 oracle drifted: toks anchor"
    sliced = toks_anchor.sub(rf"\1 WHERE {SCOPE_PRED})", oracle)
    final_anchor = "WHERE d.doc_id % 10 = 9"
    assert sliced.count(final_anchor) == 1, "q73 oracle drifted: final anchor"
    sliced = sliced.replace(
        final_anchor,
        final_anchor + " AND " + SCOPE_PRED.replace("lang", "d.lang")
                                           .replace("source", "d.source"))
    engine_slice = (
        f"SELECT s.doc_id, s.verdict, s.match_id FROM ({dump('q73_incremental_dedup')}) s "
        f"JOIN documents d ON s.doc_id = d.doc_id WHERE {SCOPE_PRED}")
    n_slice = con.execute(
        f"SELECT count(*) FROM ({engine_slice})").fetchone()[0]
    assert n_slice > 0, (
        "q73 engine slice is EMPTY — the scope sample covers no new docs, "
        "so the check would be vacuous (see SCOPE_PRED note)")
    ok &= frames_equal(con, sliced, engine_slice, "q73 scope-slice")
    print(f"  q73 slice oracle wall: {time.time() - t0:.1f}s")

    # ----------------------------------------------------------- q209/q210
    t1 = time.time()
    con.execute("""
      CREATE VIEW v AS
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings""")
    con.execute("""
      CREATE VIEW cents AS
      SELECT vec_id AS cent_id, emb AS cent_emb, nrm AS cent_nrm
      FROM v ORDER BY vec_id
      LIMIT greatest(8, CAST(ceil(sqrt((SELECT count(*) FROM v))) AS BIGINT))""")

    # (a) sampled assignment: recompute cell/emb/nrm for the 1/256 sample.
    # nrm compares ROUNDED to 6 (round-13 ADVICE): Spark's FloatVecDot and
    # DuckDB's list_dot_product may accumulate in different orders; the
    # sampled oracle tests the ASSIGNMENT, not FP summation order (the
    # assignment itself already ranks on round(cos, 6)).
    recomputed = """
      SELECT vec_id, cell, emb, round(nrm, 6) AS nrm
      FROM (SELECT s.vec_id, c.cent_id AS cell, s.emb, s.nrm,
                   row_number() OVER (PARTITION BY s.vec_id
                     ORDER BY round(list_dot_product(s.emb, c.cent_emb)
                                    / (s.nrm * c.cent_nrm), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM (SELECT * FROM v
                  WHERE md5(CAST(vec_id AS VARCHAR)) LIKE '00%') s
            CROSS JOIN cents c)
      WHERE rn = 1"""
    sample_art = (f"SELECT vec_id, cell, CAST(embedding AS DOUBLE[]) AS emb, "
                  f"round(nrm, 6) AS nrm FROM ({dump('q209_assign_sample')})")
    ok &= frames_equal(con, recomputed, sample_art, "q209 sampled assignment")

    # (b) occupancy: q209's engine output re-aggregated from the full dump
    occ = (f"SELECT cell, count(*) AS n_vecs, min(vec_id) AS min_vec, "
           f"max(vec_id) AS max_vec FROM ({dump('q209_assign_all')}) "
           f"GROUP BY cell")
    ok &= frames_equal(con, occ, dump("q209_ivf_index_build"), "q209 occupancy")

    # (c) serving: recompute the router from SOURCE embeddings, check the
    # probed slice is COMPLETE against the full assignment dump, then
    # rescore + re-rank every candidate pair
    con.execute("""
      CREATE VIEW qa AS
      SELECT qid, cell, qemb, qnrm
      FROM (SELECT q.qid, c.cent_id AS cell, q.qemb, q.qnrm,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY round(list_dot_product(q.qemb, c.cent_emb)
                                    / (q.qnrm * c.cent_nrm), 6) DESC,
                              c.cent_id ASC) AS rn
            FROM (SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm FROM v
                  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 20) q
            CROSS JOIN cents c)
      WHERE rn <= 2""")
    slice_ids = f"SELECT cell, vec_id FROM ({dump('q210_probed_slice')})"
    probed_all = (f"SELECT cell, vec_id FROM ({dump('q209_assign_all')}) "
                  f"WHERE cell IN (SELECT DISTINCT cell FROM qa)")
    ok &= frames_equal(con, probed_all, slice_ids, "q210 probed-slice completeness")
    serving = f"""
      WITH pairs AS (
        SELECT q.qid, p.vec_id AS nn,
               round(list_dot_product(CAST(p.embedding AS DOUBLE[]), q.qemb)
                     / (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]),
                                              CAST(p.embedding AS DOUBLE[])))
                        * q.qnrm), 6) AS cos
        FROM ({dump('q210_probed_slice')}) p
        JOIN qa q ON p.cell = q.cell AND p.vec_id <> q.qid)
      SELECT qid, nn, cos
      FROM (SELECT qid, nn, cos,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cos DESC, nn ASC) AS rn
            FROM pairs)
      WHERE rn <= 5"""
    ok &= frames_equal(con, serving, dump("q210_ivf_bounded_serving"),
                       "q210 serving recompute")
    print(f"  q209/q210 slice oracle wall: {time.time() - t1:.1f}s")

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print("usage: check_sf100_slices.py <sfDir> <dumpDir>", file=sys.stderr)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
