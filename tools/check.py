#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev aid only; the
library itself is pure Scala/Spark).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`:
    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
Compares each <name>/ parquet dump against DuckDB running oracle_sql.json
on views over the raw testdata parquet. Column order is normalized by
sorting column names; rows are sorted by all columns; floats compared
with tolerance-free equality after the queries' own rounding.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64, timestamps -> ns utc-naive
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
        else:
            try:
                df[c] = df[c].astype("float64")  # duckdb HUGEINT/decimal -> float
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(out_dir, sf_dir, only=()):
    def fresh_con():
        c = duckdb.connect()
        for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
            # Driver testdata is one file per table; Spark-written corpora
            # (graft.ScaleUp output) are directories of part files.
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c
    con = fresh_con()
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # Optional oracle overlay (CHECK_ORACLE_OVERLAY=path.json): substitute
    # large-SF-tractable oracle variants for named queries. The canonical
    # registered oracles stay the driver-gate truth at sf0.01/sf0.1; the
    # overlay exists so the quadratic/recursive ones can still be
    # cross-checked at sf1 (each variant documents its derivation inline
    # via an "__comment_<name>" key, which is ignored here).
    overlay_path = os.environ.get("CHECK_ORACLE_OVERLAY")
    if overlay_path:
        overlay = json.load(open(overlay_path))
        for k, v in overlay.items():
            if not k.startswith("__") and k in oracle:
                oracle[k] = v
    if only:
        unknown = set(only) - set(oracle)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 2
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    # Queries that threw during Verify are recorded in errors.json and as
    # an _ERROR marker in their dump dir — report each as a FAIL row (this
    # also covers rows-only queries that have no oracle_sql entry, which
    # would otherwise vanish from the report entirely).
    err_path = os.path.join(out_dir, "errors.json")
    errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    if only:
        errors = {k: v for k, v in errors.items() if k in set(only)}
    n_pass = n_fail = 0
    for name, msg in sorted(errors.items()):
        print(f"FAIL {name}: query threw during Verify: {msg}")
        n_fail += 1
        oracle.pop(name, None)
    # Optional per-query oracle budget (CHECK_TIMEOUT_S env): a DuckDB
    # interrupt thread cancels quadratic/recursive oracle SQL at large SF
    # instead of hanging the sweep; timed-out queries report TIMEOUT.
    timeout_s = float(os.environ.get("CHECK_TIMEOUT_S", "0") or 0)
    def run_oracle(sql):
        # Returns (df, timed_out). The watchdog can race a query that
        # finishes right at the budget: interrupt() then lands on an
        # idle connection and poisons the NEXT execute. So (a) each
        # watchdog captures its OWN attempt's connection as a local —
        # a still-armed timer from a prior attempt can never interrupt
        # a fresh connection; (b) an InterruptException without a fired
        # watchdog (the stray from a previous query's racing timer) is
        # retried on a fresh connection via a BOUNDED loop, each attempt
        # with its own connection and watchdog — never recursion, so no
        # stack of armed timers accumulates; (c) after any fired
        # watchdog the shared connection is rebuilt so no pending
        # interrupt flag leaks into the next query.
        nonlocal con
        if not timeout_s:
            return con.execute(sql).df(), False
        import threading
        for _attempt in range(3):
            attempt_con = con
            done = threading.Event()
            fired = threading.Event()
            def interrupt(c=attempt_con, done=done, fired=fired):
                if not done.wait(timeout_s):
                    fired.set()
                    c.interrupt()
            t = threading.Thread(target=interrupt, daemon=True)
            t.start()
            try:
                df = attempt_con.execute(sql).df()
                if fired.is_set():  # completed anyway — drop the poisoned con
                    con = fresh_con()
                return df, False
            except duckdb.InterruptException:
                con = fresh_con()
                if fired.is_set():
                    return None, True
                # stray interrupt from a PREVIOUS query's watchdog landed
                # on this attempt's connection: loop with the fresh one
            finally:
                done.set()
        raise RuntimeError("3 stray interrupts in a row without a fired watchdog")
    for name, sql in sorted(oracle.items()):
        if os.path.exists(os.path.join(out_dir, name, "_ERROR")):
            marker = open(os.path.join(out_dir, name, "_ERROR")).read().strip()
            print(f"FAIL {name}: query threw during Verify: {marker}")
            n_fail += 1
            continue
        try:
            raw, timed_out = run_oracle(sql)
            if timed_out:
                print(f"TIMEOUT {name}: oracle exceeded {timeout_s}s")
                n_fail += 1
                continue
            expect = canon(raw)
            got = canon(load_result(os.path.join(out_dir, name)))
            if list(expect.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(expect.columns)}")
                n_fail += 1
                continue
            if len(expect) != len(got):
                print(f"FAIL {name}: rows {len(got)} vs oracle {len(expect)}")
                n_fail += 1
                continue
            if not expect.equals(got):
                neq = (expect != got) & ~(expect.isna() & got.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(expect)} rows differ; first:")
                print(pd.concat([expect[bad].head(3).add_suffix("_oracle"),
                                 got[bad].head(3).add_suffix("_spark")], axis=1).to_string())
                n_fail += 1
                continue
            print(f"PASS {name} ({len(expect)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
