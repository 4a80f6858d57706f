"""Replicate the driver's correctness gate locally.

Runs every ``__spark_entry__.queries()`` entry at the given sf and
compares against ``oracle_sql()`` via DuckDB: row count, column-name set,
and order-insensitive value equality (sorted rows, exact for
ints/strings, 1e-9 relative for floats — stricter than a hash in that it
pinpoints the first differing cell).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"schema: spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        return errs
    if len(got) != len(want):
        errs.append(f"rows: spark={len(got)} oracle={len(want)}")
        return errs
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(w[c]):
            a = g[c].astype(float).to_numpy()
            b = w[c].astype(float).to_numpy()
            bad = ~(np.isclose(a, b, rtol=1e-9, atol=1e-12) | (np.isnan(a) & np.isnan(b)))
            exact = (a == b) | (np.isnan(a) & np.isnan(b))
            if bad.any():
                i = int(np.argmax(bad))
                errs.append(f"col {c}: {int(bad.sum())} mismatches, first row {i}: {a[i]!r} vs {b[i]!r}")
            elif not exact.all():
                i = int(np.argmax(~exact))
                errs.append(f"col {c}: WARN inexact {int((~exact).sum())} cells (hash would differ), e.g. {a[i]!r} vs {b[i]!r}")
        else:
            neq = ~((g[c] == w[c]) | (g[c].isna() & w[c].isna()))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                errs.append(f"col {c}: {int(neq.sum())} mismatches, first row {i}: {g[c].iloc[i]!r} vs {w[c].iloc[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {t1-t0:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        errs = compare(name, got, want)
        hard = [e for e in errs if not e.startswith("col") or "WARN" not in e]
        if hard:
            n_fail += 1
            print(f"FAIL {name} ({len(got)} rows, {t1-t0:.1f}s)")
            for e in errs:
                print(f"     {e}")
        else:
            tag = " (float-inexact warn)" if errs else ""
            print(f"ok   {name}: {len(got)} rows, {t1-t0:.1f}s{tag}")
            for e in errs:
                print(f"     {e}")
    print(f"\n{n_fail} failures / {len(only) if only else len(qs)} checked")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
