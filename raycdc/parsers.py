"""Per-file (per-segment) decode stack — sources for ragged real-world files.

The generalized analog of the reference's extract→decode→parse front half
(``/root/reference/handler.go:106-121``):

* segment read   — ``read_segments``: one file = one row (bytes + path), the
  per-file granularity ``Event`` gives the reference (``event.go:12-24``);
* encoding decode — Shift-JIS etc. → UTF-8 (``handler.go:112-114``);
* physical-line surgery — head/tail preamble drop (``PartialCSVParser``,
  ``contrib/handlers/handlers.go:61-77``), line filters
  (``contrib/handlers/smbc_card.go:23-44``);
* CSV parse — quoted fields/newlines (``parser.go:15-23``,
  ``loader.go:40`` AllowQuotedNewlines) via Arrow CSV; lazy-quote fallback
  (``contrib/handlers/rakuten_card.go:55-65``) via python csv;
* header skip — ``SkipLeadingRows`` (``handler.go:29,121``);
* path metadata — preprocessor analog (``contrib/handlers/smbc_card.go:46-59``):
  regex over the segment path broadcast to every row.

Parsing is one ``map_batches`` stage over the segment Dataset: stateless,
vectorized where the format allows, one task per bundle of files — the
non-splittable-segment decoder pattern (SURVEY.md §2.2 P5).
"""

from __future__ import annotations

import csv as _csv
import io
import re
from collections.abc import Callable
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data

SEG_PATH = "seg_path"


@dataclass(frozen=True)
class DecodeSpec:
    """Declarative per-segment decode recipe (the ``Handler`` config fields
    ``Encoding`` / ``SkipLeadingRows`` / parser choice,
    ``/root/reference/handler.go:20-48``, as data)."""

    format: str = "csv"  # csv | jsonl
    encoding: str = "utf-8"
    skip_head_lines: int = 0  # physical lines before CSV parse (P3)
    skip_tail_lines: int = 0
    line_filter: str | None = None  # keep only physical lines matching regex (P4)
    skip_leading_rows: int = 0  # records after parse (P8)
    delimiter: str = ","
    lazy_quotes: bool = False  # malformed quoting (P6)
    strings_can_be_null: bool = False  # empty CSV cell → NULL (else "")
    column_names: tuple[str, ...] | None = None
    # optional Arrow types aligned with column_names: REQUIRED for stable
    # schemas when format='jsonl' segments can be empty (jsonl columns are
    # type-inferred from data, so an empty file has no way to reproduce
    # them); non-empty jsonl tables are CAST to these so every task's
    # block carries the identical schema.  CSV paths ignore it (always
    # string columns by design).
    column_types: tuple = ()
    path_meta: tuple[tuple[str, str], ...] = ()  # (col, regex-with-1-group) (M1-M4)
    # segment-file compression: "auto" (default) sniffs the MAGIC BYTES
    # (gzip \\x1f\\x8b\\x08, bz2 "BZh"+level+π-digits), or force with
    # "gzip"/"bz2"/None — WAL exports and bank dumps commonly arrive
    # gzipped, and the reference reads whatever bytes GCS hands it
    # (extractor.go:16-37).  Magic-based, NOT extension-based, because
    # transport layers (Ray's binary reader / Arrow filesystems) may have
    # already decompressed a ``.gz`` path — extension sniffing would then
    # double-decompress; magic bytes are right in both worlds.
    # Decompression runs per segment file, inside the same distributed
    # read task that decodes it.
    compression: str | None = "auto"


def split_physical_lines(text: str) -> list[str]:
    """Split on newlines the way line-oriented bank exports mean it —
    NOT csv-aware (matches the reference's PartialCSVParser semantics of
    "physical lines", handlers.go:64-71)."""
    return text.split("\n")


def decode_segment(data: bytes, path: str, spec: DecodeSpec) -> pa.Table:
    """bytes → Arrow table for ONE segment file."""
    comp = spec.compression
    if comp == "auto":
        if data[:3] == b"\x1f\x8b\x08":
            comp = "gzip"
        elif (
            data[:3] == b"BZh"
            and data[3:4].isdigit()
            and data[4:10] == b"\x31\x41\x59\x26\x53\x59"
        ):
            comp = "bz2"
        else:
            comp = None
    if comp == "gzip":
        import gzip

        data = gzip.decompress(data)
    elif comp == "bz2":
        import bz2

        data = bz2.decompress(data)
    elif comp is not None:
        raise ValueError(
            f"unsupported compression {comp!r} (None | 'auto' | 'gzip' | 'bz2')"
        )
    text = data.decode(spec.encoding)
    if spec.skip_head_lines or spec.skip_tail_lines or spec.line_filter:
        lines = split_physical_lines(text)
        if lines and lines[-1] == "":  # trailing newline artifact
            lines = lines[:-1]
        end = len(lines) - spec.skip_tail_lines
        lines = lines[spec.skip_head_lines : max(spec.skip_head_lines, end)]
        if spec.line_filter:
            pat = re.compile(spec.line_filter)
            lines = [ln for ln in lines if pat.search(ln)]
        text = "\n".join(lines)

    def _empty() -> pa.Table:
        # empty segments need declared column names to keep the record
        # stream schema-homogeneous across tasks (an unnamed empty file has
        # no way to know f0..fn) — fail fast rather than emit mixed schemas
        if not spec.column_names:
            raise ValueError(
                f"empty/record-less segment {path!r} requires "
                "DecodeSpec.column_names for a stable schema"
            )
        # column_types applies to jsonl only — CSV paths always produce
        # string columns, so a typed empty would itself break homogeneity
        types = (
            spec.column_types
            if (spec.format == "jsonl" and spec.column_types)
            else tuple(pa.string() for _ in spec.column_names)
        )
        return pa.table(
            {c: pa.array([], t) for c, t in zip(spec.column_names, types)}
        )

    if not text.strip():
        table = _empty()
    elif spec.format == "jsonl":
        # newline-delimited JSON records (Arrow JSON reader: typed columns)
        import pyarrow.json as pajson

        lines = [
            ln for ln in split_physical_lines(text) if ln.strip()
        ][spec.skip_leading_rows :]
        if not lines:
            table = _empty()
        else:
            table = pajson.read_json(io.BytesIO("\n".join(lines).encode()))
            if spec.column_names:
                table = table.select(list(spec.column_names))
                if spec.column_types:
                    # pin the declared types so empty and non-empty
                    # segments produce ONE schema across tasks
                    table = table.cast(
                        pa.schema(
                            [
                                pa.field(c, t)
                                for c, t in zip(
                                    spec.column_names, spec.column_types
                                )
                            ]
                        )
                    )
    elif spec.lazy_quotes:
        # python csv in permissive mode — the LazyQuotes analog.  Blank
        # physical lines produce NO record (Go encoding/csv and the Arrow
        # path's ignore_empty_lines agree) — an unfiltered [] would become
        # a spurious all-null row
        rows = [
            r
            for r in _csv.reader(
                io.StringIO(text), delimiter=spec.delimiter, strict=False
            )
            if r
        ]
        rows = rows[spec.skip_leading_rows :]
        if not rows:
            table = _empty()
        else:
            width = max(len(r) for r in rows)
            names = spec.column_names or tuple(f"f{i}" for i in range(width))
            arrays = [
                pa.array([r[i] if i < len(r) else None for r in rows], pa.string())
                for i in range(len(names))
            ]
            table = pa.table(arrays, names=list(names))
    else:
        names = spec.column_names
        if names is None:
            # positional untyped records, like the reference's [][]string:
            # sniff the width from the first POST-SKIP record (csv-aware,
            # so a quoted newline in it is handled) and declare every
            # column as string — letting Arrow INFER types here would
            # corrupt textual cells ("" → null through an int column,
            # "1.0000" → "1.0")
            reader = _csv.reader(io.StringIO(text), delimiter=spec.delimiter)
            first: list[str] = []
            for _ in range(spec.skip_leading_rows + 1):
                first = next(reader, [])
            if not first:
                _empty()  # ALWAYS raises here (no declared names)
            names = tuple(f"f{i}" for i in range(len(first)))
        read_opts = pacsv.ReadOptions(
            column_names=list(names),
            skip_rows=spec.skip_leading_rows,
        )
        parse_opts = pacsv.ParseOptions(
            delimiter=spec.delimiter, newlines_in_values=True
        )
        conv_opts = pacsv.ConvertOptions(
            column_types={c: pa.string() for c in names},
            strings_can_be_null=spec.strings_can_be_null,
        )
        try:
            table = pacsv.read_csv(
                io.BytesIO(text.encode()), read_opts, parse_opts, conv_opts
            )
        except pa.ArrowInvalid:
            # empty ONLY when skip_rows genuinely consumed every record
            # (header-only export); a parse error with records present
            # (ragged width, torn quoting) must stay LOUD — swallowing it
            # would silently ingest a corrupt statement as zero rows
            reader = _csv.reader(io.StringIO(text), delimiter=spec.delimiter)
            for _ in range(spec.skip_leading_rows):
                next(reader, None)
            if next(reader, None) is not None:
                raise
            # names were either declared (spec.column_names) or sniffed —
            # and a successful sniff implies a record exists, which the
            # replay above would have found and re-raised, so only the
            # declared-names case can reach here
            table = _empty()

    n = len(table)
    table = table.append_column(SEG_PATH, pa.repeat(pa.scalar(path), n))
    for col, pattern in spec.path_meta:
        m = re.search(pattern, path)
        val = m.group(1) if m else None
        table = table.append_column(col, pa.repeat(pa.scalar(val, pa.string()), n))
    return table


def read_segments(paths: list[str] | str) -> "ray.data.Dataset":
    """One row per file: ``{bytes, path}`` — Ray's binary reader keeps file
    granularity, the unit the per-segment decoders need.

    Accepts object-store URIs (``file://``, ``s3://``, ...) as well as
    local paths — the remote object-reader analog of
    ``/root/reference/extractor.go:16-37``."""
    from raycdc.storage import resolve_uri_paths

    if isinstance(paths, str):
        paths = [paths]
    paths, fs = resolve_uri_paths(list(paths))
    return ray.data.read_binary_files(paths, include_paths=True, filesystem=fs)


def parse_segments(
    segments: "ray.data.Dataset", spec: DecodeSpec
) -> "ray.data.Dataset":
    """Decode a segment Dataset into records, one ``map_batches`` stage.

    Each task decodes its bundle of whole files; outputs are unioned record
    tables with ``seg_path`` + path-meta columns attached.
    """

    def fn(batch: pa.Table) -> pa.Table:
        tables = []
        paths = batch["path"].to_pylist()
        datas = batch["bytes"].to_pylist()
        for path, data in zip(paths, datas):
            tables.append(decode_segment(data, path, spec))
        tables = [t for t in tables if len(t)]
        if not tables:
            return decode_segment(b"", "", spec).slice(0, 0)
        return pa.concat_tables(tables, promote_options="default")

    return segments.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# binary (non-splittable) segment decoder — P5 (AMEX .xls) generalized


class BinarySegmentDecoder:
    """Actor-pool decode stage for opaque binary segments (legacy ``.xls``,
    images, audio): ``map_batches(BinarySegmentDecoder(decode_fn),
    concurrency=N)``.  The reference's xls path
    (``/root/reference/contrib/handlers/amex.go:36-69``) opens a workbook per
    file; here ``decode_fn(data, path) -> pa.Table`` plays that role and any
    heavyweight codec setup belongs in ``__init__`` (once per actor).

    Real codecs shipped here: XLSX (:func:`decode_xlsx`), legacy BIFF8
    ``.xls`` (:func:`raycdc.xls.decode_xls`), both via
    :func:`statement_workbook_decoder`.  The default (no ``decode_fn``)
    still raises ``NotImplementedError`` — formats needing external
    libraries stay stubbed while the Ray plumbing (schema, per-file
    granularity, actor signature) remains real and tested.
    """

    def __init__(
        self,
        decode_fn: Callable[[bytes, str], pa.Table] | None = None,
    ):
        self.decode_fn = decode_fn or self._unsupported
        self._out_schema: pa.Schema | None = None  # last non-empty output

    @staticmethod
    def _unsupported(data: bytes, path: str) -> pa.Table:
        raise NotImplementedError(
            "no binary codec registered; pass decode_fn=... (e.g. "
            "statement_workbook_decoder() for xls/xlsx; image/audio codecs "
            "beyond WAV/BMP need libraries absent from this environment)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            t = self.decode_fn(data, path)
            tables.append(
                t.append_column(SEG_PATH, pa.repeat(pa.scalar(path), len(t)))
            )
        if not tables:  # zero-row input batch
            # reuse the last decoded schema so this block unifies with the
            # actor's data-carrying blocks (a seg_path-only table would
            # drop the c0..cN columns and KeyError downstream projectors);
            # a cold actor that has only ever seen empties can't know the
            # codec's width — seg_path-only is the documented last resort
            if self._out_schema is not None:
                return self._out_schema.empty_table()
            return pa.table({SEG_PATH: pa.array([], pa.string())})
        out = pa.concat_tables(tables, promote_options="default")
        if len(out):
            self._out_schema = out.schema
        return out


# ---------------------------------------------------------------------------
# XLSX decode — a REAL pure-python binary-container codec for the P5 stage


def _xlsx_col_index(ref: str) -> int:
    """Cell reference column → 0-based index ('A1'→0, 'BC12'→54)."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - 64)
    return idx - 1


def decode_xlsx(data: bytes, path: str = "", sheet_index: int = 0) -> pa.Table:
    """Decode one XLSX workbook (zip-of-XML container, stdlib-only) into a
    table of string columns ``c0..cN`` — the rows-of-strings shape the
    reference's workbook parser produces
    (``/root/reference/contrib/handlers/amex.go:36-69``: open workbook →
    sheet 0 → each row as ``[]string``).  The legacy OLE2 ``.xls`` codec
    needs a third-party lib (absent here, still stubbed in
    :class:`BinarySegmentDecoder`); XLSX is its modern sibling and fully
    parseable with ``zipfile`` + ``xml.etree``, so this path is
    demonstrable end-to-end.

    Handles: shared strings (``t="s"``, rich-text runs concatenated),
    inline strings (``t="inlineStr"``), formula strings (``t="str"``),
    numeric/default cells (raw ``<v>`` text), gap cells (empty string via
    ``r=`` references), and sheet resolution in WORKBOOK order via the
    relationship graph (not zip member order).
    """
    import xml.etree.ElementTree as ET
    import zipfile

    ns = {
        "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
        "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
        "p": "http://schemas.openxmlformats.org/package/2006/relationships",
    }
    zf = zipfile.ZipFile(io.BytesIO(data))

    # workbook sheet order -> relationship id -> worksheet part
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = wb.findall("m:sheets/m:sheet", ns)
    if sheet_index >= len(sheets):
        raise ValueError(f"no sheet {sheet_index} in {path or 'workbook'}")
    rid = sheets[sheet_index].get(f"{{{ns['r']}}}id")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target = None
    for rel in rels.findall("p:Relationship", ns):
        if rel.get("Id") == rid:
            target = rel.get("Target")
            break
    if target is None:
        raise ValueError(f"unresolvable sheet relationship {rid} in {path}")
    target = target.lstrip("/")
    sheet_name = target if target.startswith("xl/") else f"xl/{target}"

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in sst.findall("m:si", ns):
            shared.append("".join(t.text or "" for t in si.iter(f"{{{ns['m']}}}t")))

    rows: list[list[str]] = []
    width = 0
    sheet = ET.fromstring(zf.read(sheet_name))
    for row in sheet.findall("m:sheetData/m:row", ns):
        cells: list[str] = []
        for c in row.findall("m:c", ns):
            ci = _xlsx_col_index(c.get("r", ""))
            if ci < 0:
                ci = len(cells)
            while len(cells) <= ci:
                cells.append("")
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find("m:is", ns)
                val = (
                    "".join(t.text or "" for t in is_el.iter(f"{{{ns['m']}}}t"))
                    if is_el is not None
                    else ""
                )
            else:
                v = c.find("m:v", ns)
                raw = v.text if v is not None and v.text is not None else ""
                val = shared[int(raw)] if ctype == "s" and raw != "" else raw
            cells[ci] = val
        rows.append(cells)
        width = max(width, len(cells))

    cols = {
        f"c{j}": pa.array(
            [r[j] if j < len(r) else "" for r in rows], pa.string()
        )
        for j in range(width)
    }
    if not cols:
        return pa.table({"c0": pa.array([], pa.string())})
    return pa.table(cols)


def statement_workbook_decoder(
    date_pattern: str = r"^\d\d\d\d/\d\d/\d\d$", sheet_index: int = 0
) -> Callable[[bytes, str], pa.Table]:
    """Build a ``decode_fn`` for :class:`BinarySegmentDecoder` replicating
    the reference's AMEX statement semantics
    (``/root/reference/contrib/handlers/amex.go:34-69``): open sheet 0,
    keep only rows whose FIRST cell matches the date pattern (header and
    footer rows dropped).  The container is sniffed per file: ``PK`` →
    modern XLSX (zip-of-XML, :func:`decode_xlsx`), OLE2 magic → legacy
    BIFF8 ``.xls`` (:func:`raycdc.xls.decode_xls`).  The compiled regex is
    built once per decoder — actor-pool stages need no per-batch setup
    (Arrow compiles the RE2 pattern inside the kernel)."""
    import pyarrow.compute as pc

    def decode(data: bytes, path: str) -> pa.Table:
        if data[:2] == b"PK":
            t = decode_xlsx(data, path, sheet_index=sheet_index)
        elif data[:4] == b"\xd0\xcf\x11\xe0":
            from raycdc.xls import decode_xls

            t = decode_xls(data, path, sheet_index=sheet_index)
        else:
            raise ValueError(
                f"{path or 'workbook'}: neither XLSX (zip) nor OLE2 .xls "
                f"container (magic {data[:4]!r})"
            )
        if len(t) == 0 or "c0" not in t.column_names:
            return t
        keep = pc.match_substring_regex(t["c0"], date_pattern)
        return t.filter(keep)

    return decode


# kept for callers written against the XLSX-only round-2 name
statement_xlsx_decoder = statement_workbook_decoder
