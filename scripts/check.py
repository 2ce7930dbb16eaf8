#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: run the SQL in DuckDB over views of
the sfDir parquet tables, load the Spark result parquet, sort columns
by name, and compare values exactly (doubles: exact bit compare first,
then report max abs diff if mismatched). Reports per-query status.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def fresh_con(sf_dir):
    """A NEW connection per query: one long-lived connection
    accumulates intermediate allocations across heavy scale-up
    replays until DuckDB OOMs mid-batch and every later compare
    fails on a 2 KB allocation (seen on the 35-entry 100x run).
    Views are lazy, so rebuilding them costs nothing."""
    con = duckdb.connect()
    # an in-memory DuckDB has NO temp directory, so a scale-up oracle
    # that outgrows RAM aborts ("Failed to allocate block") instead of
    # spilling — seen on p123's 100x pair-join replay. Point temp at
    # disk and leave headroom below the default 80%-of-RAM limit.
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET max_temp_directory_size='200GB'")
    # cap the buffer pool well below physical RAM: the default (80% of
    # RAM) leaves no room for allocator fragmentation after several
    # spill-heavy 100x oracles (or a concurrent Spark JVM) — seen as
    # "Failed to allocate block of 1281 bytes" at the NEXT connect.
    # A lower cap just spills earlier; correctness is unaffected.
    # Env-tunable: the heaviest 100x oracle replays (p121's span
    # removal) legitimately need more than the safe default — run
    # those entries standalone with GRAFT_DUCK_MEM=90GB. The default
    # is min(48GB, 60% of physical RAM): a flat 48GB on a smaller host
    # would RAISE the ceiling above physical memory and turn the
    # safety cap into an OOM.
    try:
        ram = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        default_mem = "%dMB" % min(48 * 1024, int(ram * 0.6 / (1 << 20)))
    except (ValueError, OSError):
        default_mem = "48GB"
    con.execute("SET memory_limit='%s'"
        % os.environ.get("GRAFT_DUCK_MEM", default_mem))
    for t in TABLES:
        # driver testdata is one file per table; ScaleGen scale-up dirs
        # are Spark-written DIRECTORIES of part files — glob those.
        # Scale-up dirs may carry only a TABLE SUBSET (ScaleVerify's
        # families): skip absent tables — an oracle needing one fails
        # per-query with a clear "table not found" instead of blocking
        # the whole compare.
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def main(sf_dir, out_dir):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # progress to stderr (flushed): scale-up replays can take
        # minutes per oracle — make the slow one identifiable
        print(f"  .. {name}", file=sys.stderr, flush=True)
        con = fresh_con(sf_dir)
        # try/finally so EVERY exit path (including the continue
        # branches) releases the connection — the fresh-connection
        # OOM fix must not depend on CPython refcounting (r16 advice)
        try:
            files = glob.glob(f"{d}/*.parquet")
            if not files:
                bad.append((name, "no spark output")); continue
            try:
                got = con.execute(
                    f"SELECT * FROM read_parquet({files!r})").fetchdf()
            except Exception as e:
                bad.append((name, f"spark parquet read failed: {e}")); continue
            if name not in oracles:
                status = f"rows-only ({len(got)} rows)"
                (ok if len(got) > 0 else bad).append(
                    (name, status if len(got) > 0 else "EMPTY rows-only result"))
                continue
            try:
                exp = con.execute(oracles[name]).fetchdf()
            except Exception as e:
                bad.append((name, f"oracle failed: {e}")); continue
            got = got[sorted(got.columns)]
            exp_cols = sorted(exp.columns)
            if sorted(got.columns) != exp_cols:
                bad.append((name, f"columns differ: spark={sorted(got.columns)} oracle={exp_cols}"))
                continue
            exp = exp[exp_cols]
            if len(got) != len(exp):
                bad.append((name, f"row count: spark={len(got)} oracle={len(exp)}"))
                continue
            diffs = []
            for c in exp_cols:
                gv, ev = got[c].tolist(), exp[c].tolist()
                for i, (g, e) in enumerate(zip(gv, ev)):
                    if g is None and e is None:
                        continue
                    if isinstance(g, float) and isinstance(e, float):
                        if g != e and not (g != g and e != e):
                            diffs.append((c, i, g, e))
                    elif str(g) != str(e):
                        diffs.append((c, i, g, e))
                    if len(diffs) > 3:
                        break
                if len(diffs) > 3:
                    break
            if diffs:
                bad.append((name, "value diffs: " + "; ".join(
                    f"{c}[{i}]: spark={g!r} oracle={e!r}" for c, i, g, e in diffs[:4])))
            else:
                ok.append((name, f"MATCH ({len(got)} rows)"))
        finally:
            con.close()
    for n, s in ok:
        print(f"  OK  {n}: {s}")
    for n, s in bad:
        print(f" FAIL {n}: {s}")
    print(f"\n{len(ok)} ok, {len(bad)} failed")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
