"""Local mimic of the driver's Spark-vs-DuckDB correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at the given
sf dir, compares row count + sorted-column value frames. Floats compared
exactly by default (the engine's oracle-checked queries are designed to
be bit-deterministic across engines); NaN==NaN.

Usage: python scripts/validate_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from aroma_spark.session import get_spark
from aroma_spark.sources.transcripts import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # Spark DATE arrives as datetime.date objects while DuckDB
            # returns datetime64 — unify on datetime64[us] so a date
            # column compares equal across engines
            non_null = s.dropna()
            if len(non_null) and all(
                isinstance(v, dt.date) and not isinstance(v, dt.datetime)
                for v in non_null
            ):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                df[c] = s.astype(str)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    errs = []
    if len(a) != len(b):
        errs.append(f"rowcount spark={len(a)} duckdb={len(b)}")
        return errs
    a, b = normalize(a), normalize(b)
    if list(a.columns) != list(b.columns):
        errs.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        return errs
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.array_equal(av.astype(float), bv.astype(float), equal_nan=True)
        else:
            # null-aware equality (NaT==NaT, None==None) for datetime/object
            ok = bool(np.asarray((av == bv) | (pd.isna(av) & pd.isna(bv))).all())
        if not ok:
            bad = np.nonzero(~((av == bv) | (pd.isna(av) & pd.isna(bv))))[0][:3]
            errs.append(f"col {c}: first diffs at {bad}: spark={av[bad]} duck={bv[bad]}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # sf-dependent oracle fixtures (the trained-IVF codebook) must be
    # built from the SAME sf dir the views read
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    only = set(sys.argv[2:])
    spark = get_spark("oracle-validate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in os_:
            print(f"skip-oracle {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(os_[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        errs = compare(name, sdf, ddf)
        if errs:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(errs))
        else:
            print(f"ok   {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
