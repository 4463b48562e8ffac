"""Golden-file tests for the per-segment decode stack.

Mirrors the reference's golden-test pattern (SURVEY.md §5: synthetic
fixtures shaped like contrib/handlers/testdata, asserted cell-for-cell via
contrib/handlers/handlers_test.go:33-51) — fixtures are generated here, not
copied.
"""

import pyarrow as pa
import pytest

import ray.data

from raycdc.parsers import (
    SEG_PATH,
    BinarySegmentDecoder,
    DecodeSpec,
    decode_segment,
    parse_segments,
    read_segments,
)

# --- decode_segment unit level --------------------------------------------


def test_plain_csv_positional_strings():
    data = b'a,1\n"b,x",2\n'
    t = decode_segment(data, "p.csv", DecodeSpec())
    assert t.column_names == ["f0", "f1", SEG_PATH]
    assert t["f0"].to_pylist() == ["a", "b,x"]
    assert t["f1"].to_pylist() == ["1", "2"]  # untyped positional strings


def test_quoted_newline_inside_field():
    # loader.go:40 AllowQuotedNewlines
    data = b'"line1\nline2",x\n'
    t = decode_segment(data, "p.csv", DecodeSpec())
    assert t["f0"].to_pylist() == ["line1\nline2"]


def test_partial_csv_head_tail_skip():
    # PartialCSVParser matrix (handlers_test.go:105-164): 2 head + 1 tail
    data = b"garbage\npreamble\na,1\nb,2\nfooter total\n"
    spec = DecodeSpec(skip_head_lines=2, skip_tail_lines=1)
    t = decode_segment(data, "p.csv", spec)
    assert t["f0"].to_pylist() == ["a", "b"]


def test_line_filter_fifth_char_slash():
    # smbc_card.go:23-44: keep only lines whose 5th char is '/'
    data = b"header row\n2020/01/02,x,100\nsummary,9\n2020/02/03,y,200\n"
    spec = DecodeSpec(line_filter=r"^.{4}/")
    t = decode_segment(data, "p.csv", spec)
    assert t["f0"].to_pylist() == ["2020/01/02", "2020/02/03"]


def test_skip_leading_rows_after_parse():
    # handler.go:29,121: header skip AFTER parse
    data = b"date,desc\n2020/01/02,x\n"
    t = decode_segment(data, "p.csv", DecodeSpec(skip_leading_rows=1))
    assert t["f0"].to_pylist() == ["2020/01/02"]


def test_shift_jis_decode():
    # handler.go:112-114 / sony_bank.go:36: Shift-JIS → UTF-8
    data = "日付,金額\n2020/01/02,257円\n".encode("shift_jis")
    t = decode_segment(data, "p.csv", DecodeSpec(encoding="shift_jis"))
    assert t["f0"].to_pylist() == ["日付", "2020/01/02"]
    assert t["f1"].to_pylist() == ["金額", "257円"]


def test_lazy_quotes_malformed():
    # rakuten_card.go:55-65 LazyQuotes: stray quote inside unquoted field
    data = b'ab"cd,1\nef,2\n'
    t = decode_segment(data, "p.csv", DecodeSpec(lazy_quotes=True))
    assert t["f0"].to_pylist() == ['ab"cd', "ef"]


def test_named_columns():
    data = b"2020/01/02,x\n"
    t = decode_segment(data, "p.csv", DecodeSpec(column_names=("date", "desc")))
    assert t.column_names == ["date", "desc", SEG_PATH]


def test_path_meta_preprocessor_analog():
    # smbc_card.go:46-59: payment month from filename, broadcast to rows
    data = b"a,1\nb,2\n"
    spec = DecodeSpec(path_meta=(("payment_month", r"/(\d{6})\.csv$"),))
    t = decode_segment(data, "/x/202001.csv", spec)
    assert t["payment_month"].to_pylist() == ["202001", "202001"]
    # non-matching path → nulls, not an error
    t2 = decode_segment(data, "/x/other.csv", spec)
    assert t2["payment_month"].to_pylist() == [None, None]


def test_empty_segment():
    t = decode_segment(b"", "p.csv", DecodeSpec(column_names=("a", "b")))
    assert len(t) == 0
    assert t.column_names == ["a", "b", SEG_PATH]


# --- Dataset level ---------------------------------------------------------


@pytest.fixture
def segment_dir(tmp_path):
    enc = "shift_jis"
    for i, name in enumerate(["202001.csv", "202002.csv"]):
        body = "ヘッダ\n" + "\n".join(
            f"2020/0{i+1}/0{j+1},desc{i}{j},1,23{j}円" for j in range(3)
        ) + "\nフッタ合計\n"
        (tmp_path / name).write_bytes(body.encode(enc))
    return str(tmp_path)


def test_parse_segments_end_to_end(ray_session, segment_dir):
    spec = DecodeSpec(
        encoding="shift_jis",
        skip_head_lines=1,
        skip_tail_lines=1,
        column_names=("date", "desc", "n", "amount"),
        path_meta=(("payment_month", r"/(\d{6})\.csv$"),),
    )
    ds = parse_segments(read_segments(segment_dir), spec)
    t = ds.to_pandas().sort_values(["payment_month", "date"]).reset_index(drop=True)
    assert len(t) == 6
    assert set(t["payment_month"]) == {"202001", "202002"}
    assert t.loc[0, "date"] == "2020/01/01"
    assert t.loc[0, "amount"] == "230円"
    assert t.loc[0, SEG_PATH].endswith("202001.csv")


def test_binary_decoder_default_raises(ray_session, tmp_path):
    (tmp_path / "x.xls").write_bytes(b"\x00\x01binary")
    ds = read_segments(str(tmp_path)).map_batches(
        BinarySegmentDecoder(), batch_format="pyarrow", concurrency=1
    )
    with pytest.raises(Exception, match="no binary codec"):
        ds.take_all()


def test_binary_decoder_with_fake_codec(ray_session, tmp_path):
    (tmp_path / "a.xls").write_bytes(b"\x05")
    (tmp_path / "b.xls").write_bytes(b"\x07")

    def fake_decode(data: bytes, path: str) -> pa.Table:
        return pa.table({"v": pa.array([int(data[0])], pa.int64())})

    ds = read_segments(str(tmp_path)).map_batches(
        BinarySegmentDecoder(fake_decode), batch_format="pyarrow", concurrency=1
    )
    rows = sorted(r["v"] for r in ds.take_all())
    assert rows == [5, 7]


# --- XLSX binary-container decode (P5 end-to-end) --------------------------


def _make_xlsx(rows, shared_strings=None):
    """Minimal but REAL xlsx: zip container, workbook rels, sharedStrings.
    Cells: ('s', i) shared string, ('inline', s) inline, ('n', x) number,
    None for a gap (cell omitted, reference-addressed)."""
    import io
    import zipfile

    def col_letter(j):
        s = ""
        j += 1
        while j:
            j, r = divmod(j - 1, 26)
            s = chr(65 + r) + s
        return s

    sheet_rows = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for j, cell in enumerate(row):
            if cell is None:
                continue
            ref = f"{col_letter(j)}{ri}"
            kind, val = cell
            if kind == "s":
                cells.append(f'<c r="{ref}" t="s"><v>{val}</v></c>')
            elif kind == "inline":
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{val}</t></is></c>')
            else:
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
        sheet_rows.append(f'<row r="{ri}">{"".join(cells)}</row>')
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    sheet = f'<?xml version="1.0"?><worksheet {ns}><sheetData>{"".join(sheet_rows)}</sheetData></worksheet>'
    wb = (
        f'<?xml version="1.0"?><workbook {ns} {rns}><sheets>'
        '<sheet name="S1" sheetId="1" r:id="rId7"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        if shared_strings:
            sst = "".join(f"<si><t>{s}</t></si>" for s in shared_strings)
            z.writestr(
                "xl/sharedStrings.xml",
                f'<?xml version="1.0"?><sst {ns}>{sst}</sst>',
            )
    return buf.getvalue()


def test_decode_xlsx_cell_types_and_gaps():
    from raycdc.parsers import decode_xlsx

    data = _make_xlsx(
        rows=[
            [("s", 0), ("s", 1), None, ("n", "12.5")],  # gap at c2
            [("inline", "2024/01/31"), ("n", "42")],
        ],
        shared_strings=["Date", "Amount"],
    )
    t = decode_xlsx(data)
    assert t.column_names == ["c0", "c1", "c2", "c3"]
    assert t["c0"].to_pylist() == ["Date", "2024/01/31"]
    assert t["c1"].to_pylist() == ["Amount", "42"]
    assert t["c2"].to_pylist() == ["", ""]
    assert t["c3"].to_pylist() == ["12.5", ""]


def test_statement_xlsx_decoder_filters_like_reference(ray_session, tmp_path):
    """End-to-end binary path: read_segments -> actor-pool
    BinarySegmentDecoder with the XLSX statement codec — only rows whose
    first cell is a yyyy/mm/dd date survive (amex.go:54-57 semantics)."""
    from raycdc.parsers import (
        BinarySegmentDecoder,
        read_segments,
        statement_xlsx_decoder,
    )

    data = _make_xlsx(
        rows=[
            [("inline", "Statement Header"), ("inline", "")],
            [("inline", "2024/01/05"), ("inline", "coffee"), ("n", "4.5")],
            [("inline", "2024/01/09"), ("inline", "books"), ("n", "30")],
            [("inline", "Total"), ("inline", ""), ("n", "34.5")],
        ]
    )
    p = tmp_path / "2024-01.xlsx"
    p.write_bytes(data)
    out = (
        read_segments([str(p)])
        .map_batches(
            BinarySegmentDecoder(statement_xlsx_decoder()),
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert list(out["c0"]) == ["2024/01/05", "2024/01/09"]
    assert list(out["c1"]) == ["coffee", "books"]
    assert all(out["seg_path"].str.endswith("2024-01.xlsx"))


def test_compressed_segments_auto_and_forced():
    """WAL exports commonly arrive gzipped: 'auto' sniffs the MAGIC BYTES
    (never the extension — transport layers may pre-decompress a .gz
    path), an explicit mode forces one codec, and the decoded cells are
    byte-equal to the uncompressed decode."""
    import bz2
    import gzip

    import pytest as _pytest

    raw = b"a,b\n1,2\n3,4\n"

    def cells(t):  # drop the seg_path provenance column (carries the name)
        return t.drop_columns(["seg_path"])

    plain = cells(decode_segment(raw, "p.csv", DecodeSpec()))
    assert cells(
        decode_segment(gzip.compress(raw), "p.csv.gz", DecodeSpec())
    ).equals(plain)
    assert cells(
        decode_segment(bz2.compress(raw), "p.csv.bz2", DecodeSpec())
    ).equals(plain)
    # auto on a plain extension: stored as-is
    assert cells(
        decode_segment(raw, "p.csv", DecodeSpec(compression="auto"))
    ).equals(plain)
    # forced mode beats the (wrong) extension
    assert cells(
        decode_segment(gzip.compress(raw), "p.csv", DecodeSpec(compression="gzip"))
    ).equals(plain)
    # compression=None reads bytes verbatim even under a .gz name
    with _pytest.raises(UnicodeDecodeError):
        decode_segment(gzip.compress(raw), "p.csv.gz", DecodeSpec(compression=None))
    with _pytest.raises(ValueError, match="unsupported compression"):
        decode_segment(raw, "p.csv", DecodeSpec(compression="zstd"))
