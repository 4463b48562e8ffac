"""Per-format preset handlers — the ``contrib/handlers`` package re-expressed
as Ray Data pipelines (VERDICT.md round 2, missing #1).

Each factory mirrors one reference handler constructor
(``/root/reference/contrib/handlers/*.go``): the object-path pattern,
encoding, physical-line surgery, CSV dialect, path-derived metadata, and a
VECTORIZED Arrow projector reproducing the Go per-row projector cell for
cell (validated against the golden fixtures in
``contrib/handlers/testdata/`` by ``tests/test_presets.py``).

A :class:`Preset` is declarative: ``decode`` (a
:class:`raycdc.parsers.DecodeSpec` or a ``paths → Dataset`` callable for
binary workbooks) plus ``projector`` (``pa.Table → pa.Table``).  Use it
three ways:

* ``preset.records(paths)`` — segment files → projected record Dataset
  (string columns ``f0..fN`` in the reference's positional order);
* ``preset.handler(lake_dir, spec)`` — a ready
  :class:`raycdc.registry.PipelineHandler` for :class:`Router` fan-out;
* ``PRESETS[name]`` — the registry, one entry per reference factory.

Encoding note: the reference decodes Shift-JIS with Go ``x/text``'s WHATWG
table, which matches Python's **cp932** (e.g. ``0x817C → U+FF0D``), not
Python's ``shift_jis`` (``U+2212``) — presets therefore say ``cp932``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field, replace

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from raycdc import ops
from raycdc.parsers import (
    SEG_PATH,
    BinarySegmentDecoder,
    DecodeSpec,
    parse_segments,
    read_segments,
    statement_workbook_decoder,
)

# ---------------------------------------------------------------------------
# strict helpers (the reference projectors FAIL the load on a bad cell)


def _strict_date(
    arr: pa.ChunkedArray | pa.Array, formats: Sequence[str], what: str
) -> pa.ChunkedArray | pa.Array:
    """parse_date_multi that fails on any unparseable non-null cell — the
    projector-error semantics of e.g. sony_bank.go:16-19."""
    return ops.parse_date_multi(arr, formats, error_ok=False)


def _month_from_compact(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """``"202012" → "2020-12-01"`` (time.Parse("200601") + Format, e.g.
    smbc_card.go:53-58); null (pattern didn't match the object path) or a
    malformed month raises, like the reference preprocessor."""
    arr = pa.chunked_array([arr]).combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    ok = pc.match_substring_regex(arr, r"^\d{6}$")
    if int(pc.sum(pc.cast(pc.fill_null(ok, False), pa.int64())).as_py() or 0) != len(arr):
        bad = pc.filter(arr, pc.invert(pc.fill_null(ok, False)))
        raise ValueError(
            f"wrong object path: cannot parse payment month from "
            f"{bad[0].as_py() if len(bad) else None!r}"
        )
    y = pc.utf8_slice_codeunits(arr, 0, 4)
    m = pc.utf8_slice_codeunits(arr, 4, 6)
    out = pc.binary_join_element_wise(y, m, "01", "-")
    # month validity (time.Parse would reject month 13)
    parsed = pc.strptime(out, format="%Y-%m-%d", unit="us", error_is_null=True)
    if parsed.null_count:
        raise ValueError("wrong object path: invalid payment month")
    return out


def _month_from_dashed(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """``"2022-07" → "2022-07-01"`` (amex.go:71-86)."""
    arr = pa.chunked_array([arr]).combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if arr.null_count:
        raise ValueError("wrong object path: no payment month in file name")
    out = pc.binary_join_element_wise(arr, "01", "-")
    parsed = pc.strptime(out, format="%Y-%m-%d", unit="us", error_is_null=True)
    if parsed.null_count:
        raise ValueError("wrong object path: invalid payment month")
    return out


def _strict_wareki(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """parse_wareki_date that fails on unparseable cells (parseSMBCDate
    errors on unknown eras / malformed strings, smbc.go:15-41)."""
    out = ops.parse_wareki_date(arr)
    n_bad = out.null_count - (
        arr.null_count if hasattr(arr, "null_count") else 0
    )
    if n_bad:
        bad = pc.filter(arr, pc.and_(pc.is_null(out), pc.is_valid(arr)))
        raise ValueError(f"failed to parse date: {bad[0].as_py()!r}")
    return out


# ---------------------------------------------------------------------------
# Preset


@dataclass(frozen=True)
class Preset:
    """One pre-wired per-format handler (a reference ``contrib/handlers``
    factory as data + a vectorized projector)."""

    name: str
    pattern: str  # object-path regex the handler subscribes to
    decode: DecodeSpec | Callable[[list[str]], "ray.data.Dataset"]
    projector: Callable[[pa.Table], pa.Table]
    doc: str = ""

    def matches(self, path: str) -> bool:
        import re

        return re.search(self.pattern, path) is not None

    def records(self, paths: list[str] | str) -> "ray.data.Dataset":
        """Segment files → projected records (the Extract→Parse→Project
        front half of ``/root/reference/handler.go:100-131``), one
        streaming pipeline."""
        if isinstance(paths, str):
            paths = [paths]
        if callable(self.decode):
            ds = self.decode(paths)
        else:
            ds = parse_segments(read_segments(paths), self.decode)
        return ds.map_batches(self.projector, batch_format="pyarrow")

    def handler(self, lake_dir: str, spec=None, **kwargs):
        """A :class:`raycdc.registry.PipelineHandler` wired for Router
        fan-out (``bqloader.go:63-97``) — the MustAddHandlers flow."""
        from raycdc.registry import PipelineHandler
        from raycdc.schema import TableSpec

        return PipelineHandler(
            name=self.name,
            pattern=self.pattern,
            lake_dir=lake_dir,
            spec=spec or TableSpec(),
            decode=(
                self.decode
                if callable(self.decode)
                else (lambda paths: parse_segments(read_segments(paths), self.decode))
            ),
            projector=self.projector,
            **kwargs,
        )


def _names(n: int) -> tuple[str, ...]:
    return tuple(f"f{i}" for i in range(n))


# ---------------------------------------------------------------------------
# factories — one per reference handler


def sony_bank_statement() -> Preset:
    """ソニー銀行 statements (/root/reference/contrib/handlers/sony_bank.go:14-45):
    Shift-JIS CSV, 1 header row; f0 ``2006年01月02日``→ISO, f3/f4/f5
    CleanNumber."""

    def project(t: pa.Table) -> pa.Table:
        return ops.project(
            t,
            {
                "f0": lambda b: _strict_date(b["f0"], ("%Y年%m月%d日",), "f0"),
                "f1": "f1",
                "f2": "f2",
                "f3": lambda b: ops.clean_number(b["f3"]),
                "f4": lambda b: ops.clean_number(b["f4"]),
                "f5": lambda b: ops.clean_number(b["f5"]),
                SEG_PATH: SEG_PATH,
            },
        )

    return Preset(
        name="sony_bank_statement",
        pattern=r"sony_bank_statement\.csv$",
        decode=DecodeSpec(
            encoding="cp932", skip_leading_rows=1, column_names=_names(6)
        ),
        projector=project,
    )


def rakuten_bank_statement() -> Preset:
    """楽天銀行 入出金明細 (rakuten_bank.go:14-40): Shift-JIS CSV, 1 header
    row; f0 ``20060102``→ISO."""

    def project(t: pa.Table) -> pa.Table:
        return ops.project(
            t,
            {
                "f0": lambda b: _strict_date(b["f0"], ("%Y%m%d",), "f0"),
                "f1": "f1",
                "f2": "f2",
                "f3": "f3",
                SEG_PATH: SEG_PATH,
            },
        )

    return Preset(
        name="rakuten_bank_statement",
        pattern=r"rakuten_bank_statement\.csv$",
        decode=DecodeSpec(
            encoding="cp932", skip_leading_rows=1, column_names=_names(4)
        ),
        projector=project,
    )


def smbc_statement() -> Preset:
    """三井住友銀行 入出金明細 (smbc.go:43-70): Shift-JIS CSV, 1 header row;
    f0 is either ``2006/1/2`` (unpadded ok) or wareki ``R01.12.04``
    (parseSMBCDate, smbc.go:15-41); other columns pass through.  Column
    count varies by export vintage (5 or 7), so names are inferred."""

    def project(t: pa.Table) -> pa.Table:
        cols = {"f0": _strict_wareki(t["f0"])}
        for c in t.column_names:
            if c != "f0":
                cols[c] = t[c]
        return pa.table(cols)

    return Preset(
        name="smbc_statement",
        pattern=r"smbc_statement\d*\.csv$",
        decode=DecodeSpec(encoding="cp932", skip_leading_rows=1),
        projector=project,
    )


def smbc_card_statement() -> Preset:
    """三井住友VISAカード (smbc_card.go:18-100): Shift-JIS, keep only
    physical lines whose 5th character is ``/`` (the embedded per-card
    header/footer blocks drop out), no header skip; payment month from the
    ``/(\\d+).csv`` object-path group appended as the last column."""

    def project(t: pa.Table) -> pa.Table:
        t = ops.filter_nonempty(t, "f0")  # projector nil,nil row skip
        month = _month_from_compact(t["payment_month_raw"])
        cols = {
            "f0": _strict_date(t["f0"], ("%Y/%m/%d",), "f0"),
        }
        for c in (f"f{i}" for i in range(1, 7)):
            cols[c] = t[c]
        cols["f7"] = month
        cols[SEG_PATH] = t[SEG_PATH]
        return pa.table(cols)

    return Preset(
        name="smbc_card_statement",
        pattern=r"/\d+\.csv$",
        decode=DecodeSpec(
            encoding="cp932",
            line_filter=r"^.{4}/",
            column_names=_names(7),
            path_meta=(("payment_month_raw", r"/(\d+)\.csv"),),
        ),
        projector=project,
    )


def rakuten_card_statement() -> Preset:
    """楽天カード 明細 (rakuten_card.go:16-81): UTF-8 (BOM) CSV with
    LazyQuotes, 1 header row; payment month from ``enavi(\\d+)(\\(\\d+\\))``
    appended; rows with an empty date dropped."""

    def project(t: pa.Table) -> pa.Table:
        t = ops.filter_nonempty(t, "f0")
        month = _month_from_compact(t["payment_month_raw"])
        cols = {"f0": _strict_date(t["f0"], ("%Y/%m/%d",), "f0")}
        for c in (f"f{i}" for i in range(1, 10)):
            cols[c] = t[c]
        cols["f10"] = month
        cols[SEG_PATH] = t[SEG_PATH]
        return pa.table(cols)

    return Preset(
        name="rakuten_card_statement",
        pattern=r"enavi\d+\(\d+\)\.csv$",
        decode=DecodeSpec(
            encoding="utf-8-sig",
            skip_leading_rows=1,
            lazy_quotes=True,
            column_names=_names(10),
            path_meta=(("payment_month_raw", r"enavi(\d+)\(\d+\)"),),
        ),
        projector=project,
    )


def _amex_workbook_decode(paths: list[str]) -> "ray.data.Dataset":
    """AMEX ``.xls``/``.xlsx`` parse: date-rows of sheet 0 (amex.go:36-69),
    decoded by a BIFF8/XLSX actor pool (codec state built once per actor)."""
    return read_segments(paths).map_batches(
        BinarySegmentDecoder,
        fn_constructor_kwargs={"decode_fn": statement_workbook_decoder()},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def amex_statement() -> Preset:
    """AMEX legacy ``.xls`` statements (amex.go:22-135): BIFF8 workbook →
    sheet 0 date rows; c0/c1 dates→ISO, c4 CleanNumber, payment month from
    ``/(YYYY-MM).xls`` appended."""

    def project(t: pa.Table) -> pa.Table:
        t = ops.filter_nonempty(t, "c0")
        meta = pc.extract_regex(t[SEG_PATH], r"/(?P<m>\d\d\d\d-\d\d)\.xlsx?$")
        month = _month_from_dashed(pc.struct_field(meta, "m"))
        return pa.table(
            {
                "f0": _strict_date(t["c0"], ("%Y/%m/%d",), "c0"),
                "f1": _strict_date(t["c1"], ("%Y/%m/%d",), "c1"),
                "f2": t["c2"],
                "f3": t["c3"],
                "f4": ops.clean_number(t["c4"]),
                "f5": t["c5"],
                "f6": t["c6"],
                "f7": t["c7"],
                "f8": month,
                SEG_PATH: t[SEG_PATH],
            }
        )

    return Preset(
        name="amex_statement",
        pattern=r"/\d\d\d\d-\d\d\.xlsx?$",
        decode=_amex_workbook_decode,
        projector=project,
    )


def amex_statement_csv() -> Preset:
    """AMEX CSV statements (amex_csv.go:13-85): Shift-JIS CSV, 1 header
    row; dates f0/f1→ISO, the amount SHIFT (f4←clean(f5), f5←f6, f6←f7,
    f7←''), payment month from ``/(YYYY-MM).csv`` appended."""

    def project(t: pa.Table) -> pa.Table:
        month = _month_from_dashed(t["payment_month_raw"])
        return pa.table(
            {
                "f0": _strict_date(t["f0"], ("%Y/%m/%d",), "f0"),
                "f1": _strict_date(t["f1"], ("%Y/%m/%d",), "f1"),
                "f2": t["f2"],
                "f3": t["f3"],
                "f4": ops.clean_number(t["f5"]),
                "f5": t["f6"],
                "f6": t["f7"],
                "f7": pa.repeat(pa.scalar("", pa.string()), len(t)),
                "f8": month,
                SEG_PATH: t[SEG_PATH],
            }
        )

    return Preset(
        name="amex_statement_csv",
        pattern=r"/\d\d\d\d-\d\d\.csv$",
        decode=DecodeSpec(
            encoding="cp932",
            skip_leading_rows=1,
            column_names=_names(8),
            path_meta=(("payment_month_raw", r"/(\d\d\d\d-\d\d)\.csv$"),),
        ),
        projector=project,
    )


_SBI_DECODE = DecodeSpec(
    encoding="cp932",
    skip_head_lines=6,  # PartialCSVParser(6, 0, "\n"), sbi_securities.go:47,96
    skip_leading_rows=1,
)


def sbi_securities_global_banking_statement() -> Preset:
    """SBI証券 外国株式 入出金明細 (sbi_securities.go:14-57): 6 preamble
    lines + 1 header; REORDER to [date, 取引, 通貨, 摘要, clean(出金),
    clean(入金)]."""

    def project(t: pa.Table) -> pa.Table:
        return ops.project(
            t,
            {
                "f0": lambda b: _strict_date(b["f0"], ("%Y/%m/%d",), "f0"),
                "f1": "f1",
                "f2": "f5",
                "f3": "f2",
                "f4": lambda b: ops.clean_number(b["f3"]),
                "f5": lambda b: ops.clean_number(b["f4"]),
                SEG_PATH: SEG_PATH,
            },
        )

    return Preset(
        name="sbi_securities_global_banking_statement",
        pattern=r"sbi_securities_global_banking_statement\.csv$",
        decode=replace(_SBI_DECODE, column_names=_names(6)),
        projector=project,
    )


def sbi_securities_global_execution_history() -> Preset:
    """SBI証券 外国株式 約定履歴 (sbi_securities.go:60-102): 6 preamble
    lines + 1 header; dates f0/f10→ISO, CleanNumber on f8/f9/f11."""

    def project(t: pa.Table) -> pa.Table:
        cols = {}
        for i in range(12):
            c = f"f{i}"
            if i in (0, 10):
                cols[c] = _strict_date(t[c], ("%Y/%m/%d",), c)
            elif i in (8, 9, 11):
                cols[c] = ops.clean_number(t[c])
            else:
                cols[c] = t[c]
        cols[SEG_PATH] = t[SEG_PATH]
        return pa.table(cols)

    return Preset(
        name="sbi_securities_global_execution_history",
        pattern=r"sbi_securities_global_execution_history\.csv$",
        decode=replace(_SBI_DECODE, column_names=_names(12)),
        projector=project,
    )


def sbi_sumishin_net_bank_statement() -> Preset:
    """住信SBIネット銀行 (sbi_sumishin_net_bank.go:14-45): Shift-JIS CSV,
    1 header row; f0 date→ISO, CleanNumber on f2/f3/f4."""

    def project(t: pa.Table) -> pa.Table:
        return ops.project(
            t,
            {
                "f0": lambda b: _strict_date(b["f0"], ("%Y/%m/%d",), "f0"),
                "f1": "f1",
                "f2": lambda b: ops.clean_number(b["f2"]),
                "f3": lambda b: ops.clean_number(b["f3"]),
                "f4": lambda b: ops.clean_number(b["f4"]),
                "f5": "f5",
                SEG_PATH: SEG_PATH,
            },
        )

    return Preset(
        name="sbi_sumishin_net_bank_statement",
        pattern=r"sbi_sumishin_net_bank_statement\.csv$",
        decode=DecodeSpec(
            encoding="cp932", skip_leading_rows=1, column_names=_names(6)
        ),
        projector=project,
    )


PRESETS: dict[str, Callable[[], Preset]] = {
    "sony_bank_statement": sony_bank_statement,
    "rakuten_bank_statement": rakuten_bank_statement,
    "smbc_statement": smbc_statement,
    "smbc_card_statement": smbc_card_statement,
    "rakuten_card_statement": rakuten_card_statement,
    "amex_statement": amex_statement,
    "amex_statement_csv": amex_statement_csv,
    "sbi_securities_global_banking_statement": sbi_securities_global_banking_statement,
    "sbi_securities_global_execution_history": sbi_securities_global_execution_history,
    "sbi_sumishin_net_bank_statement": sbi_sumishin_net_bank_statement,
}
