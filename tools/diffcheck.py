#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Runs graft.Verify (already-compiled classes + /opt/spark/jars) on a scale
dir, then replays every oracle_sql.json statement in DuckDB with views
named after the parquet tables, and hash-compares against the Spark
result parquet: columns sorted by name, rows sorted by all columns,
exact value equality (floats compared bit-exactly AND with tolerance so
we can tell hard mismatches from ulp noise).

Usage: python3 tools/diffcheck.py [sfdir] [--skip-verify]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
SFDIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "/root/testdata/sf0.01"
OUT = REPO / "target" / "verify_out"

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def run_verify():
    # preflight: bare `sbt compile` does NOT copy resources, so after a
    # `clean` the DataSourceV2 service registration is silently missing
    # from target/classes and fs_listing_dsv2 alone fails with
    # DATA_SOURCE_NOT_FOUND. Fail fast with the fix instead.
    svc = (REPO / "target" / "scala-2.13" / "classes" / "META-INF" /
           "services" / "org.apache.spark.sql.sources.DataSourceRegister")
    if not svc.exists():
        sys.exit("missing DSv2 service registration in target/classes "
                 "(clean build without resources?) — run: "
                 "sbt Compile/copyResources")
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += [
        "-Xmx12g",
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp",
        f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.Verify", SFDIR, str(OUT),
    ]
    env = {"PATH": "/usr/bin:/bin", "SPARK_GRAFT_CPUS": "8",
           "HOME": "/root"}
    # targeted single-query iteration: pass the filter through to
    # graft.Verify (the env is otherwise scrubbed on purpose)
    import os
    if os.environ.get("SPARK_GRAFT_ONLY"):
        env["SPARK_GRAFT_ONLY"] = os.environ["SPARK_GRAFT_ONLY"]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  ", line)
    if r.returncode != 0:
        print(r.stderr[-4000:])
        sys.exit(f"verify exited {r.returncode}")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].dt.tz_localize(None) if getattr(
                df[c].dtype, "tz", None) else df[c]
    if len(df):
        # numeric columns sort numerically (string-sorting float reprs
        # can misalign rows between engines and garble per-row diffs)
        df = df.sort_values(
            by=list(df.columns), ignore_index=True,
            key=lambda s: s if pd.api.types.is_numeric_dtype(s)
            else s.astype(str))
    return df.reset_index(drop=True)


def cmp_frames(name, spark_df, oracle_df):
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    bad = []
    warn = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # driver fidelity: the driver hashes values AS TYPED, so an
            # integer Spark column paired with a float oracle column
            # (e.g. DuckDB widening sum(BIGINT) to HUGEINT→float) fails
            # the driver's hash even when values match. Fail it here too.
            if pd.api.types.is_integer_dtype(av) != \
                    pd.api.types.is_integer_dtype(bv):
                bad.append(
                    f"{c}(DTYPE-DRIFT {av.dtype} vs {bv.dtype} — "
                    "driver hash would fail; pin oracle with CAST)")
                continue
            av = av.astype(float)
            bv = bv.astype(float)
            exact = ((av == bv) | (av.isna() & bv.isna())).all()
            close = all(
                (math.isnan(x) and math.isnan(y)) or
                math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
                for x, y in zip(av, bv))
            if not exact:
                # ulp-only drift is tolerated (PASS with a warning) —
                # the driver's hash compare may still flag it, so warn
                # loudly; hard mismatches fail
                (warn if close else bad).append(
                    f"{c}{'(ulp-only)' if close else '(HARD)'}")
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                ia = (av.astype(str) != bv.astype(str)).idxmax()
                bad.append(f"{c} e.g. row{ia}: {av[ia]!r} vs {bv[ia]!r}")
    if bad:
        return "VALUES " + "; ".join(bad + warn)
    if warn:
        return None if not warn else f"OK-ULP-WARN {'; '.join(warn)}"
    return None


def main():
    if "--skip-verify" not in sys.argv:
        print(f"running graft.Verify on {SFDIR} ...")
        run_verify()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SFDIR}/{t}.parquet')")
    oracles = json.loads((OUT / "oracle_sql.json").read_text())
    results = {}
    # iterate the union of declared oracles and produced outputs, so a
    # query that failed to write (or a stale dir) is loudly reported
    names = sorted(set(p.name for p in OUT.iterdir() if p.is_dir())
                   | set(oracles.keys()))
    import os
    if os.environ.get("SPARK_GRAFT_ONLY"):
        only = {n.strip()
                for n in os.environ["SPARK_GRAFT_ONLY"].split(",")}
        names = [n for n in names if n in only]
    for name in names:
        files = list((OUT / name).glob("*.parquet")) \
            if (OUT / name).is_dir() else []
        if not files:
            results[name] = "NO SPARK OUTPUT"
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{OUT / name}/*.parquet')").df()
        if name not in oracles:
            results[name] = f"rows-only ({len(spark_df)} rows)"
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {str(e).splitlines()[0][:160]}"
            continue
        results[name] = cmp_frames(name, spark_df, oracle_df) or \
            f"OK ({len(spark_df)} rows)"
    for name in names:
        r = results[name]
        flag = "PASS" if r.startswith("OK") else (
            "SOFT" if r.startswith("rows-only") else "FAIL")
        print(f"{flag:4} {name}: {r}")
    n_fail = sum(1 for r in results.values()
                 if not r.startswith(("OK", "rows-only")))
    print(f"== {len(results) - n_fail}/{len(results)} clean ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
