"""Local stand-in for the driver's correctness gate: run each queries()
entry AND its oracle_sql() on the same sf dir, compare row count, schema
(column names), and order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    # the DRIVER's value hash is dtype-sensitive (99111 vs 99111.0 hash
    # differently) — flag engine/oracle dtype divergence even when the
    # values compare equal, so HUGEINT->float64 SQL-twin artifacts
    # (round-4 cdc_chunks/cdc_dedup/props_stats) can't slip through the
    # local gate again
    for c in ray_df.columns:
        a, b = ray_df[c].dtype, sql_df[c].dtype
        if a == b:
            continue
        # the driver's hash is KIND-sensitive, not width-sensitive: ints
        # widen to uint64 and datetimes convert to int64 ns before
        # hashing (int32 vs int64 and datetime64[s] vs [us] hash equal;
        # r04's funnel_counts/events_hourly were driver-green with
        # exactly those diffs), but int-vs-FLOAT diverges (99111 vs
        # 99111.0 — the r04 cdc/props failures). Flag cross-kind only.
        ka = getattr(a, "kind", None)
        kb = getattr(b, "kind", None)
        # signed/unsigned ints are ONE kind for the driver (both widen
        # to uint64 before hashing) — 'i' vs 'u' must not flag
        if ka in ("i", "u"):
            ka = "i"
        if kb in ("i", "u"):
            kb = "i"
        if ka == kb and ka in ("i", "f", "M", "m"):
            continue
        problems.append(f"dtype col {c}: ray={a} sql={b}")
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
                bv.dtype, np.floating
            ):
                ok = np.allclose(
                    av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True
                )
            else:
                ok = (av == bv).all()
            if not ok:
                bad = np.flatnonzero(
                    ~(av == bv)
                    if not np.issubdtype(av.dtype, np.floating)
                    else ~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0)
                )[:3]
                problems.append(
                    f"col {c}: {len(bad)}+ mismatches, e.g. rows {bad.tolist()}: "
                    f"ray={av[bad].tolist()} sql={bv[bad].tolist()}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = entry_mod.queries(), entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"ROWS-ONLY {name}: {len(ray_df)} rows")
            continue
        try:
            sql_df = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: sql raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"OK   {name} ({len(ray_df)} rows)")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
