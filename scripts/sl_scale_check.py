#!/usr/bin/env python3
"""Engine-independent replay check for `cluster_single_linkage_2d`
(VERDICT r11 #5 protocol: the dbscan_scale_check pattern).

The DuckDB oracle twin replays Borůvka with per-round recursive
reachability closures — at big fixtures the final eps-component is
corpus-sized and the closure is Θ(Σ component², per round), so the SQL
twin is gate-feasible only at sf0.001/sf0.01. This checker closes the
big-fixture gap with a from-scratch reimplementation that shares NO
algorithmic structure with the engine:

  * eps-pairs by plain numpy grid binning (3×3 cells, vectorized
    block distance tests) over the distinct-coordinate rollup;
  * the minimum spanning forest by KRUSKAL with a union-find — a
    sequential algorithm, vs the engine's parallel Borůvka (the MST is
    unique under the shared (dist², a, b) lexicographic edge order, so
    any correct algorithm must agree);
  * the k-cluster partition by deleting the k−1 heaviest forest edges
    under the same order, labels = min rid per component;
  * exact comparison of the engine dump's per-cluster rows
    (cluster, n_points, n_distinct, min/max x/y).

Usage:
  python3 scripts/sl_scale_check.py <sf_dir> <dump_dir> [--eps 50000]
      [--k 8]
<dump_dir> is the Verify output directory holding
cluster_single_linkage_2d/*.parquet for the SAME fixture and eps.
Exit 0 = every cluster row matches exactly.
"""
import sys
import time


def main():
    import argparse
    import duckdb
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("dump_dir")
    ap.add_argument("--eps", type=int, default=50000)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()
    t0 = time.time()

    con = duckdb.connect()
    # distinct-coordinate rollup, the engine's reps() contract
    reps = con.sql(f"""
        SELECT CAST(floor(embedding[1]::DOUBLE * 1000000 + 0.5) AS BIGINT) x,
               CAST(floor(embedding[2]::DOUBLE * 1000000 + 0.5) AS BIGINT) y,
               min(vec_id) rid, count(*) mult
        FROM '{args.sf_dir}/embeddings.parquet' GROUP BY 1, 2
        ORDER BY rid""").df()
    x = reps.x.to_numpy()
    y = reps.y.to_numpy()
    rid = reps.rid.to_numpy()
    mult = reps["mult"].to_numpy()
    n = len(rid)
    eps, k = args.eps, args.k
    print(f"[sl-check] {n} reps", flush=True)

    # --- eps-pairs via grid binning (independent of the engine's
    # salted join: plain per-cell-pair vectorized distance tests) ----
    cx = x // eps
    cy = y // eps
    cell = {}
    for i in range(n):
        cell.setdefault((cx[i], cy[i]), []).append(i)
    edges = []  # (w, a, b) with a < b by rid
    for (gx, gy), members in cell.items():
        m = np.asarray(members)
        for ox in (0, 1):
            for oy in (-1, 0, 1):
                if ox == 0 and oy < 0:
                    continue  # visit each unordered cell pair once
                other = cell.get((gx + ox, gy + oy))
                if other is None:
                    continue
                o = np.asarray(other)
                if ox == 0 and oy == 0:
                    ii, jj = np.triu_indices(len(m), 1)
                    a, b = m[ii], m[jj]
                else:
                    a = np.repeat(m, len(o))
                    b = np.tile(o, len(m))
                dx = x[a] - x[b]
                dy = y[a] - y[b]
                w = dx * dx + dy * dy
                keep = w <= eps * eps
                if not keep.any():
                    continue
                ra, rb = rid[a[keep]], rid[b[keep]]
                lo = np.minimum(ra, rb)
                hi = np.maximum(ra, rb)
                edges.append(np.stack([w[keep], lo, hi], axis=1))
    if edges:
        E = np.unique(np.concatenate(edges), axis=0)
    else:
        E = np.zeros((0, 3), dtype=np.int64)
    print(f"[sl-check] {len(E)} eps-edges", flush=True)

    # --- Kruskal with union-find over the (w, a, b) lex order -------
    parent = {int(r): int(r) for r in rid}

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    # np.unique already sorted rows lexicographically by (w, a, b)
    forest = []
    for w, a, b in E:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
            forest.append((int(w), int(a), int(b)))
    print(f"[sl-check] forest {len(forest)} edges", flush=True)

    # --- cut the k−1 heaviest under (w, a, b) DESC -------------------
    cut = set(sorted(forest, reverse=True)[: k - 1])
    parent = {int(r): int(r) for r in rid}
    for e in forest:
        if e in cut:
            continue
        _, a, b = e
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    label = {}
    for r in rid:
        label.setdefault(find(int(r)), []).append(int(r))
    root2min = {root: min(ms) for root, ms in label.items()}
    clu = np.array([root2min[find(int(r))] for r in rid])

    # --- per-cluster stats, exact compare vs the engine dump ---------
    import pandas as pd
    mine = (
        pd.DataFrame({"cluster": clu, "n_points": mult, "nd": 1,
                      "x": x, "y": y})
        .groupby("cluster")
        .agg(n_points=("n_points", "sum"), n_distinct=("nd", "sum"),
             min_x=("x", "min"), max_x=("x", "max"),
             min_y=("y", "min"), max_y=("y", "max"))
        .reset_index()
        .sort_values("cluster", ignore_index=True))
    theirs = con.sql(
        f"SELECT * FROM '{args.dump_dir}/cluster_single_linkage_2d/"
        f"*.parquet' ORDER BY cluster").df()
    theirs = theirs[["cluster", "n_points", "n_distinct",
                     "min_x", "max_x", "min_y", "max_y"]]
    ok = mine.astype("int64").equals(theirs.astype("int64"))
    print(f"[sl-check] clusters mine={len(mine)} engine={len(theirs)} "
          f"match={ok} wall={time.time() - t0:.1f}s", flush=True)
    if not ok:
        merged = mine.merge(theirs, on="cluster", how="outer",
                            suffixes=("_mine", "_eng"), indicator=True)
        print(merged[merged.filter(like="_mine").ne(
            merged.filter(like="_eng").values).any(axis=1)
            | (merged["_merge"] != "both")].head(20))
        return 1
    print("[sl-check] PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
