"""Local simulation of the driver's DuckDB correctness gate.

Runs every queries()[name](sf_dir) and the matching oracle_sql()[name] at
sf0.01 (override with argv[1]), compares row count, column names, and an
order-insensitive value hash with columns sorted by name.
"""

import hashlib
import sys

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name}: RAY FAIL {type(ex).__name__}: {ex}")
            failures += 1
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(got)} rows, cols={list(got.columns)})")
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as ex:
            print(f"{name}: ORACLE FAIL {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(exp)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        if status != "OK":
            failures += 1
        print(f"{name}: {status} rows={len(got)}/{len(exp)} cols_ok={ok_cols} hash_ok={ok_hash}")
        if not ok_cols:
            print("   got ", sorted(got.columns))
            print("   want", sorted(exp.columns))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
