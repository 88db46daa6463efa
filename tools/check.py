#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against
views over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name + rows by all columns,
and compares exactly. NOT part of the library — dev tooling only.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # integer WIDTHS collapse when the driver serializes values (a Spark
    # int32 and DuckDB int64 hash identically), so widen all ints; the
    # int-vs-float distinction is what the driver's hash gate sees and
    # what this mimic must preserve
    for c in df.columns:
        ds = str(df[c].dtype)
        if ds in ("int8", "int16", "int32", "uint8", "uint16", "uint32"):
            df[c] = df[c].astype("int64")
        elif ds in ("Int8", "Int16", "Int32", "UInt8", "UInt16", "UInt32"):
            df[c] = df[c].astype("Int64")
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def cmp(name, got: pd.DataFrame, exp: pd.DataFrame):
    """Dtype-strict compare, mirroring the driver's hash gate: the driver
    hashes typed/serialized values, so an int64 12 vs float64 12.0 is a
    FAIL there and must be one here too (the q72/x26 class of oracle
    typing slip that a loose value compare cannot see)."""
    if sorted(got.columns) != sorted(exp.columns):
        return f"SCHEMA cols got={sorted(got.columns)} exp={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS got={len(got)} exp={len(exp)}"
    g, e = norm(got), norm(exp)
    for c in g.columns:
        if str(g[c].dtype) != str(e[c].dtype):
            return f"DTYPE col={c} got={g[c].dtype} exp={e[c].dtype}"
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    return f"VAL col={c} row={i} got={a!r} exp={b!r} diff={a-b!r}"
            else:
                # typed compare: the driver serializes values before
                # hashing, so cross-type "equal" values do not pass
                if type(a) is not type(b):
                    return (f"VALTYPE col={c} row={i} got={a!r}:{type(a).__name__} "
                            f"exp={b!r}:{type(b).__name__}")
                if a != b:
                    return f"VAL col={c} row={i} got={a!r} exp={b!r}"
    return None

# DuckDB types that pandas renders lossily (HUGEINT -> float64,
# DECIMAL(38,0) from sum(BIGINT) arithmetic -> float64/object): an
# oracle emitting one of these is a typing bug in the oracle SQL
# (missing ::BIGINT / ::DOUBLE cast), even when the values happen to
# match the loose compare. Narrow DECIMALs (e.g. DECIMAL(3,2) literals)
# convert to float64 exactly and pass the driver's hash, so only the
# 128-bit widths are flagged.
def oracle_type_audit(rel):
    bad = []
    for col, t in zip(rel.columns, rel.types):
        ts = str(t)
        if "HUGEINT" in ts or ts.startswith("DECIMAL(38") or ts.startswith("DECIMAL(19"):
            bad.append(f"{col}:{ts}")
    return bad

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            rel = con.sql(oracle[name])
            bad = oracle_type_audit(rel)
            exp = rel.df()
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            nfail += 1
            continue
        if bad:
            print(f"FAIL {name}: ORACLE-TYPE {','.join(bad)} (add ::BIGINT/::DOUBLE cast)")
            nfail += 1
            continue
        err = cmp(name, got, exp)
        if err:
            print(f"FAIL {name}: {err}")
            nfail += 1
        else:
            print(f"pass {name} ({len(got)} rows)")
            npass += 1
    print(f"== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)

main()
