#!/usr/bin/env python3
"""Local dev emulation of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [only_csv] \
           [--jobs N] [--artifact PATH] [--timeout SEC] [--oracle-only]

--oracle-only runs just the oracle SQL set (no Spark outputs needed) —
the gate-budget smoke tier: point it at sf0.001 with a tight --timeout
to prove every oracle parses and completes under the cap.

Reads each <out>/<name> parquet (Spark result) and runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the same tables,
then compares: column names (sorted), dtypes (strict), row counts, and
values (rows sorted by all columns). Exact equality required — floats
too, since queries are expected to round for determinism.

Round-7 hardening (VERDICT r6 #1): the compares are embarrassingly
parallel, so they run on a process pool (default: min(16, cpus)) with
one DuckDB connection per worker; per-query wall seconds are recorded;
and the full results dict is written to a durable JSON artifact
(default CORRECTNESS_LOCAL.json next to this script's repo root) so a
driver-side gate outage can never again leave a round without a
committed hard correctness signal. A per-oracle --timeout (default
120 s) turns a pathological oracle (the DuckDB CTE-inlining explosion
class) into a loud TIMEOUT failure instead of a silent gate hang.
"""
import glob
import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor, as_completed

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries allowed to produce 0 rows (highly selective filters / near-dup
# pair queries that legitimately match nothing at small SF). Kept in
# lockstep with SparkEntrySmokeSpec's allowlist. Any OTHER query whose
# Spark output is empty FAILS the gate even if the oracle is also empty
# — a 0 == 0 hash match proves nothing (the r5 graph_bfs_depth and r7
# events_cem_att vacuity class).
MAY_BE_EMPTY = {"dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
                "dedup_ngram_blocked", "dedup_embedding",
                "q7_volume_shipping", "q9_product_profit", "regexp_filter",
                # r12 10x gate: support-2 3-itemsets exist in the
                # sf0.01 generation (12 rows, hash-gated non-vacuously
                # there every round) but NOT in the sf0.1 lineage the
                # 10x fixture replicates — verified by a brute-force
                # all-triples enumeration over sf0.1 lineitem (empty).
                # The sf0.01 gate keeps non-vacuous regression cover.
                "basket_frequent_triples"}

_WORKER = {}


def _init_worker(sfdir, threads, memlimit=None):
    import duckdb
    con = duckdb.connect()
    # Without this every worker's DuckDB grabs all machine cores:
    # 16 workers x 32 threads oversubscribes 16x and per-query times
    # balloon ~2x (observed: 9 s oracles hitting a 20 s cap).
    con.sql(f"SET threads={threads}")
    # Without a per-worker cap, N workers each assume they own ~80% of
    # machine RAM; at a big fixture the chain-CTE oracles then get
    # OS-OOM-killed, which poisons the whole ProcessPoolExecutor (every
    # pending compare fails "terminated abruptly" — observed at the r12
    # 10x gate). A DuckDB-enforced limit turns that into a clean
    # per-query OutOfMemoryException instead; spill stays enabled.
    if memlimit:
        con.sql(f"SET memory_limit='{memlimit}'")
        # per-PROCESS spill dir: DuckDB names spill files
        # duckdb_temp_storage-N.tmp inside temp_directory, so two
        # concurrent gate processes sharing one directory CLOBBER each
        # other's spill (observed: "Could not read enough bytes from
        # duckdb_temp_storage-0.tmp" at the r12 10x gate).
        # mkdtemp (not bare PID — a recycled PID after a crashed run
        # would inherit a stale dir) + atexit cleanup so repeated gate
        # runs don't accumulate spill dirs (ADVICE r12 #1).
        import atexit
        import shutil
        import tempfile
        os.makedirs("/tmp/duck_spill", exist_ok=True)
        spill = tempfile.mkdtemp(prefix=f"{os.getpid()}_",
                                 dir="/tmp/duck_spill")
        atexit.register(shutil.rmtree, spill, ignore_errors=True)
        con.sql(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    _WORKER["con"] = con


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _sql_with_timeout(con, sql, timeout):
    """Run con.sql(sql).df() with a watchdog that interrupts DuckDB if it
    exceeds `timeout` seconds — a hanging oracle (the CTE-inlining
    explosion class) becomes a loud error, not a stuck gate."""
    import threading

    def attempt():
        done = threading.Event()
        # The lock serializes "query finished" against "watchdog fires":
        # without it, an interrupt landing just as the query returns can
        # cancel the NEXT oracle on this pooled connection (spurious
        # TIMEOUT on an innocent query — ADVICE r7). `fired` records
        # whether THIS query's watchdog actually interrupted: a prior
        # query's interrupt can still land in the window between its
        # con.sql() returning and its finally block taking the lock,
        # cancelling US instead (ADVICE r8) — distinguishable because
        # our own watchdog never fired.
        lock = threading.Lock()
        fired = []

        def watchdog():
            if not done.wait(timeout):
                with lock:
                    if not done.is_set():
                        fired.append(True)
                        con.interrupt()

        threading.Thread(target=watchdog, daemon=True).start()
        try:
            return True, con.sql(sql).df()
        except Exception as e:
            # Classify UNDER the lock, setting done first: otherwise a
            # stale interrupt cancelling us in the same instant our own
            # watchdog times out appends to `fired` after we read it,
            # and the stale cancellation surfaces as TIMEOUT instead of
            # being retried (ADVICE r9). With done set under the lock,
            # the watchdog can no longer fire, so `fired` is frozen.
            with lock:
                done.set()
                ours = bool(fired)
            if "INTERRUPT" in str(e).upper() and not ours:
                return False, e  # stale interrupt, not our timeout
            raise
        finally:
            with lock:
                done.set()

    ok, res = attempt()
    if not ok:  # cancelled by a stale interrupt — retry once
        ok, res = attempt()
        if not ok:
            raise res
    return res


def check_one(args):
    """Runs in a worker process.
    Returns (name, verdict, seconds, spark_rows|None)."""
    name, sql, outdir, timeout, oracle_only = args
    con = _WORKER["con"]
    t0 = time.time()
    if oracle_only:
        # Gate-budget smoke tier (VERDICT r6 #6): prove every oracle
        # parses and completes under the cap at a tiny SF, with no
        # Spark dump needed — catches a pathological oracle (the CTE
        # inlining explosion class) at commit time, not at the driver.
        try:
            _sql_with_timeout(con, sql, timeout)
            return name, "OK", time.time() - t0, None
        except Exception as e:
            tag = "TIMEOUT" if "INTERRUPT" in str(e).upper() else "ERROR"
            return name, f"{tag}: {e}", time.time() - t0, None
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return name, "MISSING_SPARK_OUTPUT", 0.0, None
    try:
        sdf = con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).df()
        odf = _sql_with_timeout(con, sql, timeout)
    except Exception as e:
        tag = "TIMEOUT" if "INTERRUPT" in str(e).upper() else "ERROR"
        return name, f"{tag}: {e}", time.time() - t0, None
    nrows = len(sdf)
    # Vacuity guard (VERDICT r7 #2): an empty Spark result hash-matches
    # an empty oracle, proving nothing. FAIL unless explicitly allowed.
    if nrows == 0 and name not in MAY_BE_EMPTY:
        return (name, "EMPTY: spark_rows=0 (vacuous 0==0 pass blocked; "
                "add to MAY_BE_EMPTY only with justification)",
                time.time() - t0, 0)
    s, o = canon(sdf), canon(odf)
    if list(s.columns) != list(o.columns):
        return (name,
                f"COLS: spark={list(s.columns)} oracle={list(o.columns)}",
                time.time() - t0, nrows)
    # STRICT dtype equality — the driver's hash is type-representation
    # sensitive, so an oracle that lets DuckDB widen (sum(BIGINT) ->
    # HUGEINT -> pandas object; datediff -> BIGINT vs Spark INT)
    # hash-mismatches even when every value is equal (the r4
    # window_range_frame failure class). Catch it here, loudly,
    # instead of in the driver's ledger.
    dt_bad = [f"{c}: spark={s[c].dtype} oracle={o[c].dtype}"
              for c in s.columns if str(s[c].dtype) != str(o[c].dtype)]
    if dt_bad:
        return name, "DTYPES: " + "; ".join(dt_bad), time.time() - t0, nrows
    if len(s) != len(o):
        return (name, f"ROWS: spark={len(s)} oracle={len(o)}",
                time.time() - t0, nrows)
    mism = []
    for c in s.columns:
        a, b = s[c], o[c]
        try:
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                af = a.astype(float)
                bf = b.astype(float)
                bad = ~((af == bf) | (af.isna() & bf.isna()))
                if bad.any():
                    d = (af - bf).abs().max()
                    mism.append(f"{c}: {int(bad.sum())} diffs maxabs={d}")
            else:
                aa = a.astype(str)
                bb = b.astype(str)
                bad = aa != bb
                if bad.any():
                    i = bad.idxmax()
                    mism.append(
                        f"{c}: {int(bad.sum())} diffs e.g. row {i}: "
                        f"{aa[i]!r} vs {bb[i]!r}")
        except Exception as e:
            mism.append(f"{c}: compare error {e}")
    verdict = "OK" if not mism else "VALS: " + "; ".join(mism)
    return name, verdict, time.time() - t0, nrows


def _run_isolated(work, jobs):
    """Crash-isolated tier (VERDICT r12 #3): each query runs in its OWN
    subprocess (fresh python → fresh DuckDB), so a segfault or OS OOM
    kill fails exactly that query with a recorded reason instead of
    poisoning a shared ProcessPoolExecutor ('terminated abruptly' for
    every pending compare — 34 such non-verdict rows in the r12 10×
    artifact). `jobs` subprocesses run concurrently via threads."""
    import subprocess
    from concurrent.futures import ThreadPoolExecutor

    def one(w):
        name, sql, outdir, timeout, oracle_only, sfdir, memlimit = w
        t0 = time.time()
        cmd = [sys.executable, os.path.abspath(__file__), outdir, sfdir,
               name, "--jobs", "1", "--timeout", str(timeout), "--one"]
        if oracle_only:
            cmd.append("--oracle-only")
        if memlimit:
            cmd += ["--memlimit", memlimit]
        try:
            # generous kill cap: the in-process watchdog handles the
            # oracle timeout; this outer cap only catches a wedged child
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout * 2 + 300)
        except subprocess.TimeoutExpired:
            return name, f"TIMEOUT: isolated child exceeded hard cap", \
                time.time() - t0, None
        for line in p.stdout.splitlines():
            if line.startswith("@@ONE@@ "):
                rec = json.loads(line[len("@@ONE@@ "):])
                return rec["name"], rec["verdict"], rec["secs"], \
                    rec.get("rows")
        sig = -p.returncode if p.returncode < 0 else p.returncode
        tail = (p.stderr or p.stdout or "").strip().splitlines()[-3:]
        return name, (f"ERROR: isolated child died (exit {sig}): "
                      + " | ".join(tail)), time.time() - t0, None

    results = {}
    with ThreadPoolExecutor(max_workers=jobs) as ex:
        futs = {ex.submit(one, w): w[0] for w in work}
        for fut in as_completed(futs):
            n, verdict, secs, nrows = fut.result()
            results[n] = (verdict, secs, nrows)
            mark = "PASS" if verdict == "OK" else "FAIL"
            print(f"[{mark}][isolated] {n}  ({secs:.1f}s)"
                  + ("" if verdict == "OK" else f"  {verdict}"), flush=True)
    return results


def main(outdir, sfdir, only=None, jobs=None, artifact=None, timeout=120.0,
         oracle_only=False, memlimit=None, isolate=False, merge_into=None):
    import duckdb  # validate availability in the parent too
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    jobs = jobs or min(16, os.cpu_count() or 4)
    results = {}
    times = {}
    rowcounts = {}
    t_start = time.time()
    if isolate:
        work = [(name, oracle[name], outdir, timeout, oracle_only,
                 sfdir, memlimit) for name in sorted(oracle)]
        for n, (verdict, secs, nrows) in _run_isolated(work, jobs).items():
            results[n] = verdict
            times[n] = round(secs, 2)
            if nrows is not None:
                rowcounts[n] = nrows
    else:
        work = [(name, oracle[name], outdir, timeout, oracle_only)
                for name in sorted(oracle)]
        threads = max(2, (os.cpu_count() or 4) // jobs)
        with ProcessPoolExecutor(max_workers=jobs, initializer=_init_worker,
                                 initargs=(sfdir, threads, memlimit)) as ex:
            futs = {ex.submit(check_one, w): w[0] for w in work}
            for fut in as_completed(futs):
                name = futs[fut]
                try:
                    n, verdict, secs, nrows = fut.result()
                except Exception as e:
                    n, verdict, secs, nrows = (name, f"ERROR: {e}",
                                               float("nan"), None)
                results[n] = verdict
                times[n] = round(secs, 2)
                if nrows is not None:
                    rowcounts[n] = nrows
                mark = "PASS" if verdict == "OK" else "FAIL"
                print(f"[{mark}] {n}  ({secs:.1f}s)"
                      + ("" if verdict == "OK" else f"  {verdict}"),
                      flush=True)
    npass = sum(1 for v in results.values() if v == "OK")
    wall = time.time() - t_start
    print(f"\n{npass}/{len(results)} oracle-checked queries pass"
          f"  (gate wall {wall:.0f}s, {jobs} workers)")
    for n, v in sorted(results.items()):
        if v != "OK":
            print(f"[FAIL] {n}  {v}")
    # rows-only queries (no oracle): report presence
    con = duckdb.connect()
    rows_only = {}
    all_out = set() if oracle_only else {
        p.rstrip('/').split('/')[-1] for p in glob.glob(f"{outdir}/*/")}
    for name in sorted(all_out - set(oracle)):
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).fetchone()[0]
        rows_only[name] = n
        print(f"[ROWS] {name}: {n} rows (no oracle)")
    if merge_into:
        # Re-drain protocol (VERDICT r12 #3): overwrite ONLY the rows
        # this run re-checked in an existing artifact (preserving its
        # fixture/note/exclusions fields and every untouched verdict),
        # recompute the pass count, and write back — so a bulk pool run
        # plus an isolated re-run of its failures composes into ONE
        # clean artifact with a real verdict in every row.
        base = json.load(open(merge_into)) if os.path.exists(merge_into) \
            else {}
        base.setdefault("results", {}).update(results)
        base.setdefault("oracle_sec", {}).update(times)
        if rowcounts:
            base.setdefault("spark_rows", {}).update(rowcounts)
        base["pass"] = sum(1 for v in base["results"].values() if v == "OK")
        base["total"] = len(base["results"])
        base["generated_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime())
        env = {"duckdb": duckdb.__version__,
               "python": sys.version.split()[0]}
        try:
            env.update(json.load(open(f"{outdir}/env.json")))
        except Exception:
            pass
        base["env"] = env
        with open(merge_into, "w") as f:
            json.dump(base, f, indent=1, sort_keys=True)
        print(f"\n[artifact] {merge_into} merged "
              f"({base['pass']}/{base['total']} pass)")
    if artifact:
        # Oracle-environment stamp (VERDICT r12 #5): agg_grouping_sets
        # passed locally and failed at the driver, and neither side's
        # DuckDB build was recorded anywhere — a local-pass/driver-fail
        # divergence must be diagnosable from the repo alone.
        env = {
            "duckdb": duckdb.__version__,
            "python": sys.version.split()[0],
        }
        try:
            import pandas
            env["pandas"] = pandas.__version__
        except Exception:
            pass
        try:  # graft.Verify writes outdir/env.json with the Spark side
            env.update(json.load(open(f"{outdir}/env.json")))
        except Exception:
            pass
        payload = {
            "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "env": env,
            "sf_dir": sfdir,
            "out_dir": outdir,
            "jobs": jobs,
            "gate_wall_sec": round(wall, 1),
            "pass": npass,
            "total": len(results),
            "results": results,
            "oracle_sec": times,
            "spark_rows": rowcounts,
            "rows_only": rows_only,
        }
        with open(artifact, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"\n[artifact] {artifact} written "
              f"({npass}/{len(results)} pass)")
    return 0 if npass == len(results) else 1


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]]
    jobs = None
    artifact = None
    timeout = 120.0
    oracle_only = False
    memlimit = None
    isolate = False
    merge_into = None
    one = False
    pos = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--jobs":
            jobs = int(argv[i + 1]); i += 2
        elif a == "--artifact":
            artifact = argv[i + 1]; i += 2
        elif a == "--timeout":
            timeout = float(argv[i + 1]); i += 2
        elif a == "--oracle-only":
            oracle_only = True; i += 1
        elif a == "--memlimit":
            memlimit = argv[i + 1]; i += 2
        elif a == "--isolate":
            isolate = True; i += 1
        elif a == "--merge-into":
            merge_into = argv[i + 1]; i += 2
        elif a == "--one":
            one = True; i += 1
        else:
            pos.append(a); i += 1
    only = set(pos[2].split(",")) if len(pos) > 2 else None
    if one:
        # hidden single-query mode for --isolate children: run exactly
        # one compare in THIS process and emit a machine-readable line
        outdir, sfdir = pos[0], pos[1]
        assert only and len(only) == 1, "--one needs exactly one query"
        name = next(iter(only))
        sql = json.load(open(f"{outdir}/oracle_sql.json"))[name]
        threads = max(4, (os.cpu_count() or 4) // 2)
        _init_worker(sfdir, threads, memlimit)
        n, verdict, secs, nrows = check_one(
            (name, sql, outdir, timeout, oracle_only))
        print("@@ONE@@ " + json.dumps(
            {"name": n, "verdict": verdict, "secs": round(secs, 2),
             "rows": nrows}))
        sys.exit(0 if verdict == "OK" else 1)
    sys.exit(main(pos[0], pos[1], only, jobs, artifact, timeout,
                  oracle_only, memlimit, isolate, merge_into))
