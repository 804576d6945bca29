#!/usr/bin/env python3
"""Replayable at-scale correctness check for cluster_dbscan_grid
(VERDICT r9 #1/#3).

The full DuckDB all-pairs oracle is quadratic in the vector count and
exceeded a 25-minute cap at the 10x fixture; this checker replays the
engine's own emitted candidate pairs instead, which is linear in the
pair mass the engine actually produced:

  1. SOUNDNESS  - every emitted pair joins two real distinct
                  coordinates, its dist_sq and multiplicities are
                  recomputed independently, and dist_sq <= eps^2.
  2. SYMMETRY   - (ra, rb) present iff (rb, ra) present.
  3. SAMPLED COMPLETENESS - for a deterministic sample of
                  representatives (rid % sample_mod == 0), ALL true
                  eps-neighbors are computed by brute force (sample x
                  reps, linear in reps) and must appear in the dump.
  4. REPLAY     - degrees, roles, components (union-find), border
                  attachment and noise are recomputed from the VERIFIED
                  pair set in DuckDB + Python, expanded to vec_ids, and
                  compared EXACTLY against the engine's
                  cluster_dbscan_grid output.

Usage:
  python3 scripts/dbscan_scale_check.py <engine_out_dir> <fixture_dir>
      [--eps 50000] [--min-pts 8] [--sample-mod 997]

<engine_out_dir> must hold graft.Verify dumps of cluster_dbscan_pairs
and cluster_dbscan_grid for the same fixture. Prints one JSON line;
exit 0 iff every check passes.
"""
import json
import sys
import time


def fail(report, key, detail):
    report["checks"][key] = f"FAIL: {detail}"
    report["verdict"] = "FAIL"
    print(json.dumps(report))
    sys.exit(1)


def main():
    import duckdb

    import argparse
    ap = argparse.ArgumentParser(
        description="replay-verify cluster_dbscan_grid from the "
                    "engine's own pair dump")
    ap.add_argument("outdir", help="graft.Verify dump directory")
    ap.add_argument("fixture", help="fixture directory with "
                                    "embeddings.parquet")
    ap.add_argument("--eps", type=int, default=50000)
    ap.add_argument("--min-pts", type=int, default=8)
    ap.add_argument("--sample-mod", type=int, default=997)
    a = ap.parse_args()
    outdir, fixture = a.outdir, a.fixture
    eps, min_pts, sample_mod = a.eps, a.min_pts, a.sample_mod

    t0 = time.time()
    con = duckdb.connect()
    con.sql("SET threads TO 16")
    report = {"fixture": fixture, "eps": eps, "min_pts": min_pts,
              "sample_mod": sample_mod, "checks": {}, "verdict": "PASS"}

    con.sql(f"""CREATE TABLE pts AS SELECT vec_id,
        floor(embedding[1]::DOUBLE * 1000000.0 + 0.5)::BIGINT AS x,
        floor(embedding[2]::DOUBLE * 1000000.0 + 0.5)::BIGINT AS y
      FROM '{fixture}/embeddings.parquet'""")
    con.sql("""CREATE TABLE reps AS SELECT x, y,
        min(vec_id)::BIGINT AS rid, count(*)::BIGINT AS mult
      FROM pts GROUP BY 1, 2""")
    con.sql(f"""CREATE TABLE ep AS SELECT ra, rb, mult_a, mult_b,
        dist_sq
      FROM read_parquet('{outdir}/cluster_dbscan_pairs/*.parquet')""")
    n_reps = con.sql("SELECT count(*) FROM reps").fetchone()[0]
    n_pairs = con.sql("SELECT count(*) FROM ep").fetchone()[0]
    report["n_points"] = con.sql("SELECT count(*) FROM pts").fetchone()[0]
    report["n_reps"] = n_reps
    report["n_pairs"] = n_pairs

    # 1. SOUNDNESS
    bad = con.sql(f"""SELECT count(*) FROM ep
      LEFT JOIN reps a ON a.rid = ep.ra
      LEFT JOIN reps b ON b.rid = ep.rb
      WHERE a.rid IS NULL OR b.rid IS NULL
         OR ep.mult_a <> a.mult OR ep.mult_b <> b.mult
         OR ep.dist_sq <> (a.x - b.x) * (a.x - b.x)
                         + (a.y - b.y) * (a.y - b.y)
         OR ep.dist_sq > {eps}::BIGINT * {eps}
         OR ep.ra = ep.rb""").fetchone()[0]
    if bad:
        fail(report, "soundness", f"{bad} unsound pairs")
    dup = con.sql("""SELECT count(*) FROM
      (SELECT ra, rb FROM ep GROUP BY 1, 2
       HAVING count(*) > 1)""").fetchone()[0]
    if dup:
        fail(report, "soundness", f"{dup} duplicated pairs")
    report["checks"]["soundness"] = "OK"

    # 2. SYMMETRY
    asym = con.sql("""SELECT count(*) FROM ep e
      ANTI JOIN ep r ON r.ra = e.rb AND r.rb = e.ra""").fetchone()[0]
    if asym:
        fail(report, "symmetry", f"{asym} one-directional pairs")
    report["checks"]["symmetry"] = "OK"

    # 3. SAMPLED COMPLETENESS (brute force for the sampled reps)
    n_sample = con.sql(
        f"SELECT count(*) FROM reps WHERE rid % {sample_mod} = 0"
    ).fetchone()[0]
    missing = con.sql(f"""SELECT count(*) FROM
      (SELECT s.rid AS ra, o.rid AS rb
       FROM reps s JOIN reps o ON s.rid <> o.rid
         AND (s.x - o.x) * (s.x - o.x)
           + (s.y - o.y) * (s.y - o.y) <= {eps}::BIGINT * {eps}
       WHERE s.rid % {sample_mod} = 0) t
      ANTI JOIN ep ON ep.ra = t.ra AND ep.rb = t.rb""").fetchone()[0]
    if missing:
        fail(report, "completeness",
             f"{missing} true neighbor pairs missing from the dump")
    report["checks"]["completeness"] = f"OK ({n_sample} reps sampled)"

    # 4. REPLAY from the verified pair set
    con.sql("""CREATE TABLE wdeg AS
      SELECT ra AS rid, sum(mult_b)::BIGINT AS wnn
      FROM ep GROUP BY 1""")
    con.sql(f"""CREATE TABLE roles AS
      SELECT r.rid, r.x, r.y, r.mult,
        (r.mult + coalesce(w.wnn, 0) >= {min_pts})::BIGINT AS is_core
      FROM reps r LEFT JOIN wdeg w ON w.rid = r.rid""")
    core = con.sql("""SELECT e.ra, e.rb FROM ep e
      JOIN roles a ON a.rid = e.ra AND a.is_core = 1
      JOIN roles b ON b.rid = e.rb AND b.is_core = 1
      WHERE e.ra < e.rb""").fetchnumpy()
    # union-find over core-core edges (engine-independent replay)
    parent = {}

    def find(u):
        root = u
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(u, u) != u:
            parent[u], u = root, parent[u]
        return root

    for ra, rb in zip(core["ra"].tolist(), core["rb"].tolist()):
        x, y = find(ra), find(rb)
        if x != y:
            parent[max(x, y)] = min(x, y)
    comp = {}
    for u in set(list(parent)):
        comp[u] = find(u)
    label_rows = [(int(u), int(v)) for u, v in comp.items()]
    con.sql("CREATE TABLE comp (rid BIGINT, lbl BIGINT)")
    if label_rows:
        con.executemany("INSERT INTO comp VALUES (?, ?)", label_rows)
    con.sql("""CREATE TABLE corelbl AS
      SELECT r.rid, coalesce(c.lbl, r.rid)::BIGINT AS cluster
      FROM roles r LEFT JOIN comp c ON c.rid = r.rid
      WHERE r.is_core = 1""")
    con.sql("""CREATE TABLE borderlbl AS
      SELECT r.rid, min(cl.cluster)::BIGINT AS cluster
      FROM roles r JOIN ep ON ep.ra = r.rid
      JOIN corelbl cl ON cl.rid = ep.rb
      WHERE r.is_core = 0 GROUP BY 1""")
    con.sql("""CREATE TABLE coordlbl AS
      SELECT rid, 2::BIGINT AS role, cluster FROM corelbl
      UNION ALL SELECT rid, 1::BIGINT, cluster FROM borderlbl
      UNION ALL SELECT r.rid, 0::BIGINT, (-1)::BIGINT FROM roles r
      WHERE r.is_core = 0
        AND r.rid NOT IN (SELECT rid FROM borderlbl)""")
    con.sql("""CREATE TABLE replay AS
      SELECT p.vec_id, c.role, c.cluster
      FROM pts p JOIN roles r ON r.x = p.x AND r.y = p.y
      JOIN coordlbl c ON c.rid = r.rid""")
    diff = con.sql(f"""SELECT count(*) FROM
      (SELECT vec_id, role, cluster FROM replay
       UNION ALL
       SELECT vec_id, role, cluster
       FROM read_parquet('{outdir}/cluster_dbscan_grid/*.parquet'))
      GROUP BY vec_id, role, cluster HAVING count(*) <> 2""").df()
    n_engine = con.sql(f"""SELECT count(*) FROM read_parquet(
      '{outdir}/cluster_dbscan_grid/*.parquet')""").fetchone()[0]
    n_replay = con.sql("SELECT count(*) FROM replay").fetchone()[0]
    if n_engine != n_replay or len(diff):
        fail(report, "replay",
             f"{len(diff)} (vec_id, role, cluster) mismatches; "
             f"rows engine={n_engine} replay={n_replay}")
    report["checks"]["replay"] = f"OK ({n_engine} rows exact)"
    report["n_core_edges"] = int(len(core["ra"]))
    report["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
