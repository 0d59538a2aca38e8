"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` against its
``oracle_sql()`` twin on DuckDB at the given scale factor and reports
row-count / column-name / value equality. Stricter than the driver: values
are compared exactly (bit-exact for floats after normalization), so a pass
here should imply a pass on any reasonable hash.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — order-insensitive
    canonical form (the driver sorts columns by name before hashing)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64", errors="ignore")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last").reset_index(drop=True)
    return df


def dtype_family(s: pd.Series) -> str:
    """Coarse dtype family for parity checks. The driver hashes canonical
    string values, so an int64-vs-float64 split (DuckDB HUGEINT/DECIMAL
    materializing as float) hash-mismatches even when values are equal —
    this gate must FAIL on family drift instead of normalizing it away."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns {s_cols} != oracle {o_cols}")
        return problems
    for c in s_cols:
        sf, of = dtype_family(spark_pdf[c]), dtype_family(oracle_pdf[c])
        if sf != of:
            problems.append(
                f"col {c}: dtype family mismatch spark={sf}({spark_pdf[c].dtype}) "
                f"oracle={of}({oracle_pdf[c].dtype}) — the driver hash would "
                f"diverge; CAST the oracle (or Spark) side explicitly")
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64")
            bv = bv.astype("float64")
            eq = (av.values == bv.values) | (pd.isna(av.values) & pd.isna(bv.values))
            if not eq.all():
                bad = int((~eq).sum())
                diff = np.nanmax(np.abs(av.values - bv.values))
                problems.append(
                    f"col {c}: {bad} mismatched floats, max abs diff {diff:g}")
        else:
            eq = (av.values == bv.values) | (pd.isna(av).values & pd.isna(bv).values)
            if not eq.all():
                i = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {(~eq).sum()} mismatches, first at row {i}: "
                    f"{av.iloc[i]!r} != {bv.iloc[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from delta_sharing_spark import get_spark

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duck_connection(sf_dir)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    n_pass = n_fail = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"weak  {name}: rows={len(spark_pdf)} (no oracle; rows-only)")
            n_weak += 1
            continue
        try:
            oracle_pdf = con.sql(sql).df()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"pass  {name}: rows={len(spark_pdf)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
