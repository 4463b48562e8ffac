"""BIFF8 decoder unit tests beyond the AMEX golden fixture: a synthetic
CFB + BIFF8 writer (test-only) exercises the numeric cell records
(NUMBER / RK int / RK div100 / RK float / MULRK), LABEL, BLANK gaps, and —
because the synthetic workbook is far under the 4096-byte cutoff — the
MINI-FAT stream path of the container reader (the golden fixture's
Workbook stream rides the regular FAT)."""

import struct

import pytest

from raycdc.xls import decode_xls


def _biff_workbook(cells: list[tuple[int, int, tuple]], ixfe: int = 15) -> bytes:
    """Minimal BIFF8 stream: globals (BOF, BOUNDSHEET, EOF) + one sheet
    substream containing ``cells`` = [(row, col, spec)] where spec is
    ('n', float) NUMBER, ('rk', raw_int32) RK, ('mulrk', [raw...]) MULRK
    starting at col, ('s', text) LABEL, ('blank',) BLANK."""

    def rec(rid: int, payload: bytes) -> bytes:
        return struct.pack("<HH", rid, len(payload)) + payload

    bof = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    sheet_rows = b""
    for rw, col, spec in cells:
        kind = spec[0]
        if kind == "n":
            sheet_rows += rec(
                0x0203, struct.pack("<HHH", rw, col, ixfe) + struct.pack("<d", spec[1])
            )
        elif kind == "rk":
            sheet_rows += rec(0x027E, struct.pack("<HHHi", rw, col, ixfe, spec[1]))
        elif kind == "mulrk":
            body = struct.pack("<HH", rw, col)
            for raw in spec[1]:
                body += struct.pack("<Hi", ixfe, raw)
            body += struct.pack("<H", col + len(spec[1]) - 1)
            sheet_rows += rec(0x00BD, body)
        elif kind == "s":
            data = spec[1].encode("latin-1")
            sheet_rows += rec(
                0x0204,
                struct.pack("<HHHHB", rw, col, ixfe, len(data), 0) + data,
            )
        elif kind == "blank":
            sheet_rows += rec(0x0201, struct.pack("<HHH", rw, col, ixfe))
    eof = rec(0x000A, b"")
    sheet_bof = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    sheet = sheet_bof + sheet_rows + eof

    name = "S1".encode("latin-1")
    # lbPlyPos filled after globals length is known
    bs_payload = struct.pack("<IHB", 0, 0, len(name)) + b"\x00" + name
    # grbit byte (compressed) sits between cch and the chars
    bs_payload = struct.pack("<IHBB", 0, 0, len(name), 0) + name
    globals_len = len(bof) + 4 + len(bs_payload) + len(eof)
    bs_payload = struct.pack("<IHBB", globals_len, 0, len(name), 0) + name
    return bof + struct.pack("<HH", 0x0085, len(bs_payload)) + bs_payload + eof + sheet


def _cfb_wrap(stream: bytes) -> bytes:
    """Wrap a (small) stream as a CFB compound file whose 'Workbook' lives
    in the MINI stream (size < 4096 → mini-FAT addressing)."""
    assert len(stream) < 4096
    SEC = 512
    MINI = 64
    n_mini = (len(stream) + MINI - 1) // MINI
    mini_data = stream + b"\x00" * (n_mini * MINI - len(stream))
    n_mini_sectors = (len(mini_data) + SEC - 1) // SEC
    mini_data += b"\x00" * (n_mini_sectors * SEC - len(mini_data))

    # sector map: 0=FAT, 1=directory, 2=mini-FAT, 3.. = mini stream
    FREE, END, FATSECT = -1, -2, -3
    fat = [FATSECT, END, END]
    for i in range(n_mini_sectors):
        fat.append(3 + i + 1 if i < n_mini_sectors - 1 else END)
    fat += [FREE] * (SEC // 4 - len(fat))
    fat_sector = struct.pack(f"<{SEC // 4}i", *fat)

    def dirent(name: str, etype: int, start: int, size: int) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = raw + b"\x00" * (64 - len(raw))
        e += struct.pack("<H", len(raw))
        e += bytes([etype, 1])  # type, black
        e += struct.pack("<iii", -1, -1, -1)  # siblings/child
        e += b"\x00" * 16  # CLSID
        e += b"\x00" * 4  # state bits
        e += b"\x00" * 16  # timestamps
        e += struct.pack("<iI", start, size)
        e += b"\x00" * 4
        assert len(e) == 128
        return e

    root = dirent("Root Entry", 5, 3, len(mini_data))
    wb = dirent("Workbook", 2, 0, len(stream))
    directory = root + wb + b"\x00" * (SEC - 256)

    mini_fat = [i + 1 if i < n_mini - 1 else END for i in range(n_mini)]
    mini_fat += [FREE] * (SEC // 4 - len(mini_fat))
    mini_fat_sector = struct.pack(f"<{SEC // 4}i", *mini_fat)

    header = _CFB_HEADER(
        n_fat=1, dir_start=1, mini_fat_start=2, n_mini_fat=1, fat_sectors=[0]
    )
    return header + fat_sector + directory + mini_fat_sector + mini_data


def _CFB_HEADER(n_fat, dir_start, mini_fat_start, n_mini_fat, fat_sectors):
    h = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"  # magic
    h += b"\x00" * 16  # CLSID
    h += struct.pack("<HH", 0x003E, 0x0003)  # minor, major
    h += struct.pack("<H", 0xFFFE)  # byte order
    h += struct.pack("<HH", 9, 6)  # sector 2^9, mini 2^6
    h += b"\x00" * 6
    h += struct.pack("<I", 0)  # num dir sectors (v3: 0)
    h += struct.pack("<I", n_fat)
    h += struct.pack("<i", dir_start)
    h += struct.pack("<I", 0)  # transaction sig
    h += struct.pack("<I", 4096)  # mini cutoff
    h += struct.pack("<i", mini_fat_start)
    h += struct.pack("<I", n_mini_fat)
    h += struct.pack("<i", -2)  # DIFAT start: none
    h += struct.pack("<I", 0)  # n DIFAT sectors
    difat = list(fat_sectors) + [-1] * (109 - len(fat_sectors))
    h += struct.pack("<109i", *difat)
    assert len(h) == 512
    return h


def _rk_int(v: int) -> int:
    return (v << 2) | 0x02


def _rk_float(v: float) -> int:
    hi = struct.unpack("<q", struct.pack("<d", v))[0] >> 32
    return int(hi) & ~0x03


def test_decode_xls_numeric_records_via_mini_fat():
    wb = _biff_workbook(
        [
            (0, 0, ("s", "date")),
            (0, 1, ("n", 1760.0)),
            (0, 2, ("n", 129.5)),
            (1, 0, ("rk", _rk_int(42))),
            (1, 1, ("rk", _rk_int(-7))),
            (1, 2, ("rk", _rk_float(2.5))),
            (1, 3, ("rk", _rk_int(12345) | 0x01)),  # div100 -> 123.45
            (2, 0, ("mulrk", [_rk_int(1), _rk_int(2), _rk_int(3)])),
            (3, 1, ("s", "end")),
            (3, 0, ("blank",)),
        ]
    )
    t = decode_xls(_cfb_wrap(wb))
    rows = [[t[c][i].as_py() for c in t.column_names] for i in range(t.num_rows)]
    assert rows == [
        ["date", "1760", "129.5", ""],
        ["42", "-7", "2.5", "123.45"],
        ["1", "2", "3", ""],
        ["", "end", "", ""],
    ]


def test_decode_xls_rejects_non_cfb():
    with pytest.raises(ValueError, match="OLE2"):
        decode_xls(b"PK\x03\x04not-an-ole2-file")


def test_decode_xls_missing_sheet_index():
    wb = _biff_workbook([(0, 0, ("s", "x"))])
    with pytest.raises(ValueError, match="no sheet 3"):
        decode_xls(_cfb_wrap(wb), sheet_index=3)


def test_workbook_decoder_sniffs_container():
    from raycdc.parsers import statement_workbook_decoder

    dec = statement_workbook_decoder(date_pattern=r"^\d+$")
    wb = _biff_workbook([(0, 0, ("s", "header")), (1, 0, ("rk", _rk_int(20221231)))])
    t = dec(_cfb_wrap(wb), "x.xls")
    assert t["c0"].to_pylist() == ["20221231"]
    with pytest.raises(ValueError, match="neither XLSX"):
        dec(b"garbage-bytes", "x.bin")


def test_decode_xls_skips_absent_rows_like_xlsx():
    """A sheet whose data starts at row 100 must not grow 100 phantom
    all-'' rows (decode_xlsx parity: one output row per present row)."""
    wb = _biff_workbook(
        [
            (100, 0, ("s", "first")),
            (100, 1, ("n", 1.0)),
            (205, 0, ("s", "second")),
        ]
    )
    t = decode_xls(_cfb_wrap(wb))
    assert t.num_rows == 2
    assert t["c0"].to_pylist() == ["first", "second"]
    assert t["c1"].to_pylist() == ["1", ""]
