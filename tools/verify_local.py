#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"`,
run `python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/graft_verify`.

For each query: loads the Spark parquet dump and the DuckDB oracle result,
sorts columns by name, sorts rows, and compares values EXACTLY (floats
bit-compared) — stricter than any plausible driver hash, so passing here
means passing the real gate.
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

class ArrayColumnError(Exception):
    """An array-typed published column: the DRIVER's gate sorts result rows
    by every column to hash them, and pandas sort_values crashes on a
    list/ndarray column (r9: q_mm_embed_pool shipped green here because we
    silently JSON-stringified it, then red at the real gate). Publishing an
    array column is therefore a hard FAIL locally too — reshape to long
    form (one row per element) or hash/stringify it IN the query."""


def lint_schema(name: str, df: pd.DataFrame, side: str):
    for c in df.columns:
        if df[c].dtype == object and len(df[c].dropna()) and \
                isinstance(df[c].dropna().iloc[0], (list, np.ndarray)):
            raise ArrayColumnError(
                f"{side} column '{c}' is array-typed - the driver gate cannot sort it")
        if pd.api.types.is_float_dtype(df[c]):
            # advisory: doubles hash fine when both engines agree bit-for-bit,
            # but the r7-r9 entropy saga showed the gate env can diverge on
            # double handling; pinScoreInt (BIGINT grid cell) is drift-proof
            print(f"LINT  {name}: {side} column '{c}' is double-typed "
                  f"(consider Exact.pinScoreInt for transcendental-derived scores)")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"COLUMNS spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        # int-on-one-side / float-on-the-other is a per-row TYPE divergence
        # the driver's value hash sees on every row even when == passes
        # (e.g. DuckDB sum(BIGINT) -> HUGEINT -> pandas float64 vs Spark
        # int64 — the q_text_entropy dl column). Hard FAIL.
        if pd.api.types.is_integer_dtype(a[c]) != pd.api.types.is_integer_dtype(b[c]) and \
           (pd.api.types.is_numeric_dtype(a[c]) and pd.api.types.is_numeric_dtype(b[c])):
            return (f"DTYPE col {c}: spark={a[c].dtype} oracle={b[c].dtype} "
                    f"(int/float split - cast the oracle side, e.g. CAST(.. AS BIGINT))")
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not eq.all():
                i = int(np.argmax(~eq))
                d = np.nanmax(np.abs(np.nan_to_num(av) - np.nan_to_num(bv)))
                return f"FLOAT col {c}: first row {i}: {av[i]!r} vs {bv[i]!r} (maxabsdiff {d:.3e})"
        else:
            aa, bb = pd.Series(av), pd.Series(bv)
            eq = (aa == bb) | (aa.isna() & bb.isna())
            if not eq.all():
                i = int(np.argmax(~eq.values))
                return f"col {c} ({a[c].dtype} vs {b[c].dtype}): first row {i}: {av[i]!r} vs {bv[i]!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    npass = nfail = nskip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{qdir}/*.parquet"))],
                             ignore_index=True) if glob.glob(f"{qdir}/*.parquet") else pd.DataFrame()
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(spark_df)} rows)")
            nskip += 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            nfail += 1
            continue
        try:
            lint_schema(name, spark_df, "spark")
            lint_schema(name, oracle_df, "oracle")
        except ArrayColumnError as e:
            print(f"FAIL  {name}: {e}")
            nfail += 1
            continue
        err = cmp(norm(spark_df), norm(oracle_df))
        if err:
            print(f"FAIL  {name}: {err}")
            nfail += 1
        else:
            print(f"PASS  {name} ({len(spark_df)} rows)")
            npass += 1
    print(f"\n{npass} pass, {nfail} fail, {nskip} no-oracle")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
