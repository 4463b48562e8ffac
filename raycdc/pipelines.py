"""Named query pipelines + DuckDB oracle SQL.

Each entry pairs a Ray-Data pipeline (streaming, ``map_batches`` over
zero-copy Arrow) with an independently-written ANSI-SQL oracle the driver
runs side-by-side in DuckDB over the same parquet tables.  Column names are
aligned pair-for-pair (the driver hashes values under sorted column names).

The projector family generalizes the reference's contrib handlers
(SURVEY.md §2.3): numeric cleaning, multi-format date normalization,
era-date fallback, row filtering, metadata-broadcast appends, reprojection.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from raycdc import ops

# ---------------------------------------------------------------------------
# DuckDB-side reimplementation of clean_number (independent of the Arrow one)


def _sql_clean(expr: str) -> str:
    body = f"regexp_replace({expr}, '[^0-9.]', '', 'g')"
    return (
        f"CASE WHEN NOT regexp_matches({body}, '[0-9]') THEN '' "
        f"WHEN regexp_matches({expr}, '^[^0-9.]*-') THEN '-' || {body} "
        f"ELSE {body} END"
    )


# ---------------------------------------------------------------------------
# projector queries


def q_proj_clean_number(sf_dir: str):
    """T2 CleanNumber over synthetic dirty strings built from lineitem
    (/root/reference/contrib/handlers/handlers.go:36-51)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_suppkey", "l_partkey", "l_discount"],
    )

    def fn(t: pa.Table) -> pa.Table:
        okey = pc.cast(t["l_orderkey"], pa.string())
        s1 = pc.binary_join_element_wise("¥", okey, "-", "")
        s2 = pc.binary_join_element_wise(
            pc.cast(t["l_linenumber"], pa.string()),
            ".",
            pc.cast(t["l_suppkey"], pa.string()),
            "USD",
            "",
        )
        s3 = pc.if_else(
            pc.less(t["l_discount"], 0.05),
            pa.scalar("-"),
            pc.binary_join_element_wise(
                "-", pc.cast(t["l_partkey"], pa.string()), "円", ""
            ),
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "c1": ops.clean_number(s1),
                "c2": ops.clean_number(s2),
                "c3": ops.clean_number(s3),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_PROJ_CLEAN_NUMBER = f"""
WITH d AS (
    SELECT l_orderkey, l_linenumber,
        '¥' || CAST(l_orderkey AS VARCHAR) || '-' AS s1,
        CAST(l_linenumber AS VARCHAR) || '.' || CAST(l_suppkey AS VARCHAR) || 'USD' AS s2,
        CASE WHEN l_discount < 0.05 THEN '-'
             ELSE '-' || CAST(l_partkey AS VARCHAR) || '円' END AS s3
    FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       {_sql_clean('s1')} AS c1,
       {_sql_clean('s2')} AS c2,
       {_sql_clean('s3')} AS c3
FROM d
"""


def q_proj_dates(sf_dir: str):
    """T1/T4/T5 multi-format date normalization over events timestamps
    (quickstart bqload.go:37-49, sony_bank.go:16, rakuten_bank.go:17)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )
    fmts = ("%Y/%m/%d", "%Y%m%d", "%Y年%m月%d日")

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "d_slash": ops.parse_date_multi(
                    pc.strftime(t["ts"], format="%Y/%m/%d"), fmts
                ),
                "d_compact": ops.parse_date_multi(
                    pc.strftime(t["ts"], format="%Y%m%d"), fmts
                ),
                "d_jp": ops.parse_date_multi(
                    pc.strftime(t["ts"], format="%Y年%m月%d日"), fmts
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_PROJ_DATES = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS d_slash,
       strftime(ts, '%Y-%m-%d') AS d_compact,
       strftime(ts, '%Y-%m-%d') AS d_jp
FROM events
"""


def q_proj_wareki(sf_dir: str):
    """T6 Japanese-era date parse with plain-format fallback
    (/root/reference/contrib/handlers/smbc.go:15-41): orders dates rendered
    as Heisei-era strings (1995-2001 → H07-H13), parsed back."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def fn(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"]
        yy = pc.subtract(pc.year(d), 1988)
        era = pc.binary_join_element_wise(
            "H",
            pc.utf8_lpad(pc.cast(yy, pa.string()), 2, "0"),
            ".",
            pc.strftime(d, format="%m"),
            ".",
            pc.strftime(d, format="%d"),
            "",
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "wareki": era,
                "d": ops.parse_wareki_date(era),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_PROJ_WAREKI = """
SELECT o_orderkey,
       'H' || lpad(CAST(year(o_orderdate) - 1988 AS VARCHAR), 2, '0')
           || '.' || strftime(o_orderdate, '%m')
           || '.' || strftime(o_orderdate, '%d') AS wareki,
       strftime(o_orderdate, '%Y-%m-%d') AS d
FROM orders
"""


def q_proj_statement(sf_dir: str):
    """Composite bank-statement pipeline — the quickstart handler end-to-end
    (/root/reference/examples/quickstart/bqload.go:19-53): date normalize +
    numeric clean + row filter + preprocessor-style constant append."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type"]
    )

    def fn(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "event_id": t["event_id"],
                "date": ops.parse_date_multi(
                    pc.strftime(t["ts"], format="%Y/%m/%d"), ("%Y/%m/%d",)
                ),
                "description": pc.if_else(
                    pc.equal(t["event_type"], "click"),
                    pa.scalar(""),
                    t["event_type"],
                ),
                "amount": ops.clean_number(
                    pc.binary_join_element_wise(
                        pc.cast(t["event_id"], pa.string()), "円", ""
                    )
                ),
            }
        )
        out = ops.filter_nonempty(out, "description")
        return ops.append_constant(out, "payment_month", "2024-01")

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_PROJ_STATEMENT = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS date,
       event_type AS description,
       CAST(event_id AS VARCHAR) AS amount,
       '2024-01' AS payment_month
FROM events
WHERE event_type <> 'click'
"""


# ---------------------------------------------------------------------------
# registry


QUERIES: dict[str, Callable[[str], Any]] = {
    "proj_clean_number": q_proj_clean_number,
    "proj_dates": q_proj_dates,
    "proj_wareki": q_proj_wareki,
    "proj_statement": q_proj_statement,
}

ORACLES: dict[str, str] = {
    "proj_clean_number": SQL_PROJ_CLEAN_NUMBER,
    "proj_dates": SQL_PROJ_DATES,
    "proj_wareki": SQL_PROJ_WAREKI,
    "proj_statement": SQL_PROJ_STATEMENT,
}


def bench_extras() -> dict[str, Callable[[str], Any]]:
    """Heavier pipelines bench.py times (each consumed via count())."""
    return {
        "proj_statement": lambda sf: q_proj_statement(sf).count(),
    }
