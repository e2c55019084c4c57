"""Dependency-free legacy Excel .xls (BIFF8 in OLE2/CFB) reader.

The reference converts .xls uploads with xlrd (excel97.py:9-34), which
is not in this environment — but both container and record formats are
publicly documented ([MS-CFB] compound file binary and [MS-XLS] BIFF8),
and the single-sheet tabular subset the reference handles is parseable
with stdlib `struct` alone, like the PPM/WAV/XLSX/SAV readers.

Supported: OLE2 FAT + miniFAT streams (512/4096-byte sectors), the
Workbook/Book stream, SST shared strings (compressed and UTF-16 chars,
rich-text/ext payloads skipped, CONTINUE splits with option-flag
restarts), cell records LABELSST / LABEL / NUMBER / RK / MULRK /
BOOLERR / FORMULA(+STRING), 1900/1904 date modes, and date detection
via XF/FORMAT records (built-in date format ids + y/m/d/h/s scan of
custom formats — the xlrd classification the reference relies on).
Output conventions match excel97.py: numbers '%g', dates ISO-8601,
booleans 1/0. Multi-sheet workbooks fail (UnsupportedConversion shape,
excel97.py:14-17); BIFF5/7 workbooks (pre-SST) are not supported.
"""

from __future__ import annotations

import csv
import datetime
import struct

_u16 = struct.Struct("<H").unpack_from
_u32 = struct.Struct("<I").unpack_from
_f64 = struct.Struct("<d").unpack_from

_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE


class XlsError(ValueError):
    """Malformed or unsupported .xls content."""


# ------------------------------------------------------------- OLE2 / CFB


def _sector_chain(fat: list[int], start: int) -> list[int]:
    chain, seen = [], set()
    s = start
    while s not in (_ENDCHAIN, _FREE) and s < len(fat):
        if s in seen:
            raise XlsError("cyclic sector chain")
        seen.add(s)
        chain.append(s)
        s = fat[s]
    return chain


def ole2_stream(data: bytes, names=("Workbook", "Book")) -> bytes:
    """Extract the first directory stream named in `names` from a
    compound file ([MS-CFB]): header -> DIFAT -> FAT -> directory,
    with miniFAT/mini-stream handling for streams under the cutoff."""
    if data[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise XlsError("not an OLE2 compound file")
    if len(data) < 512:
        raise XlsError("truncated compound file header")
    sect_shift = _u16(data, 30)[0]
    mini_shift = _u16(data, 32)[0]
    ssz, msz = 1 << sect_shift, 1 << mini_shift
    n_fat = _u32(data, 44)[0]
    dir_start = _u32(data, 48)[0]
    mini_cutoff = _u32(data, 56)[0]
    minifat_start = _u32(data, 60)[0]
    difat_start = _u32(data, 68)[0]

    def sector(i: int) -> bytes:
        # [MS-CFB]: sector n begins at (n+1) * sector_size — the header
        # occupies one full sector (512 even for v4's 4096-byte sectors,
        # where sector 0 starts at 4096, not 512)
        off = (i + 1) * ssz
        return data[off : off + ssz]

    # DIFAT: 109 header entries, then chained DIFAT sectors whose last
    # u32 points at the next DIFAT sector
    difat: list[int] = list(struct.unpack_from("<109I", data, 76))
    s = difat_start
    difat_seen: set[int] = set()
    while s not in (_ENDCHAIN, _FREE):
        if s in difat_seen:
            raise XlsError("cyclic DIFAT chain")
        difat_seen.add(s)
        raw = sector(s)
        difat.extend(struct.unpack_from(f"<{ssz // 4 - 1}I", raw, 0))
        s = _u32(raw, ssz - 4)[0]
    fat_sectors = [x for x in difat[:n_fat] if x != _FREE]
    fat: list[int] = []
    for fs in fat_sectors:
        fat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(fs), 0))

    def read_chain(start: int) -> bytes:
        return b"".join(sector(i) for i in _sector_chain(fat, start))

    # directory entries: 128 bytes each
    dirdata = read_chain(dir_start)
    root_start = root_size = None
    target_start = target_size = None
    for off in range(0, len(dirdata) - 127, 128):
        name_len = _u16(dirdata, off + 64)[0]
        if name_len < 2:
            continue
        name = dirdata[off : off + name_len - 2].decode("utf-16-le", "replace")
        otype = dirdata[off + 66]
        start = _u32(dirdata, off + 116)[0]
        size = struct.unpack_from("<Q", dirdata, off + 120)[0]
        if otype == 5:  # root storage: holds the mini stream
            root_start, root_size = start, size
        elif otype == 2 and name in names and target_start is None:
            target_start, target_size = start, size
    if target_start is None:
        raise XlsError(f"no {'/'.join(names)} stream in compound file")

    if target_size >= mini_cutoff:
        return read_chain(target_start)[:target_size]
    # mini stream: sectors of msz bytes inside the root entry's chain,
    # chained through the miniFAT
    if root_start is None:
        raise XlsError("mini stream without root entry")
    mini_container = read_chain(root_start)[:root_size]
    minifat: list[int] = []
    for i in _sector_chain(fat, minifat_start):
        minifat.extend(struct.unpack_from(f"<{ssz // 4}I", sector(i), 0))
    out = b"".join(
        mini_container[i * msz : (i + 1) * msz]
        for i in _sector_chain(minifat, target_start)
    )
    return out[:target_size]


# ------------------------------------------------------------------ BIFF8


def _records(stream: bytes, pos: int):
    """Yield (opcode, payload, next_pos) from `pos` until EOF record."""
    n = len(stream)
    while pos + 4 <= n:
        op = _u16(stream, pos)[0]
        ln = _u16(stream, pos + 2)[0]
        payload = stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        yield op, payload, pos
        if op == 0x000A:  # EOF ends the substream
            return


class _Frags:
    """Cursor over SST + CONTINUE payload fragments: reads cross
    fragment boundaries; `boundary()` reports when positioned exactly
    at the start of a later fragment (where split strings restart
    their option-flags byte, [MS-XLS] 2.5.293)."""

    def __init__(self, frags: list[bytes]):
        self.frags = frags
        self.fi = 0
        self.pos = 0

    def _advance(self) -> None:
        while self.fi < len(self.frags) and self.pos >= len(self.frags[self.fi]):
            self.fi += 1
            self.pos = 0

    def boundary(self) -> bool:
        self._advance()
        return self.pos == 0 and self.fi > 0

    def remaining(self) -> int:
        self._advance()
        if self.fi >= len(self.frags):
            return 0
        return len(self.frags[self.fi]) - self.pos

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            if self.fi >= len(self.frags):
                raise XlsError("truncated SST")
            take = min(n, len(self.frags[self.fi]) - self.pos)
            out += self.frags[self.fi][self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)


def _read_sst_string(fr: _Frags) -> str:
    cch = _u16(fr.read(2))[0]
    flags = fr.read(1)[0]
    crun = _u16(fr.read(2))[0] if flags & 0x08 else 0
    cbext = _u32(fr.read(4))[0] if flags & 0x04 else 0
    high = flags & 0x01
    chars: list[str] = []
    need = cch
    while need > 0:
        # character data split across a CONTINUE re-declares the
        # option-flags byte at the start of each later fragment
        if fr.boundary():
            high = fr.read(1)[0] & 0x01
        width = 2 if high else 1
        avail = fr.remaining() // width
        take = min(need, avail)
        if take == 0:
            raise XlsError("SST fragment misaligned")
        raw = fr.read(take * width)
        chars.append(raw.decode("utf-16-le" if high else "latin-1"))
        need -= take
    if crun:
        fr.read(4 * crun)
    if cbext:
        fr.read(cbext)
    return "".join(chars)


def _parse_sst(frags: list[bytes]) -> list[str]:
    fr = _Frags(frags)
    fr.read(4)  # total string instances
    unique = _u32(fr.read(4))[0]
    return [_read_sst_string(fr) for _ in range(unique)]


def _short_string(payload: bytes, off: int) -> str:
    """8-bit-length XLUnicodeString (sheet names)."""
    cch = payload[off]
    high = payload[off + 1] & 1
    if high:
        return payload[off + 2 : off + 2 + 2 * cch].decode("utf-16-le")
    return payload[off + 2 : off + 2 + cch].decode("latin-1")


def _rk_value(rk: int) -> float:
    if rk & 0x02:  # integer in bits 2..31 (signed)
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:  # high 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100.0 if rk & 0x01 else val


# built-in format ids rendered as dates/times (xlrd's classification
# of the [MS-XLS] 2.4.126 built-in table)
_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(27, 37)) | set(range(45, 48)) | set(range(50, 59))


def _is_date_format_string(s: str) -> bool:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == '"':  # skip quoted literal
            j = s.find('"', i + 1)
            i = len(s) if j < 0 else j + 1
        elif c == "[":  # skip [colors]/[conditions]; keep [h]/[m]/[s]
            j = s.find("]", i + 1)
            inner = s[i + 1 : j] if j > 0 else ""
            if inner.lower().rstrip("0123456789") in ("h", "m", "s", "hh", "mm", "ss"):
                out.append(inner.lower()[0])
            i = len(s) if j < 0 else j + 1
        elif c == "\\":
            i += 2
        else:
            out.append(c.lower())
            i += 1
    return any(ch in out for ch in "ymdhs")


class XlsWorkbook:
    """Parsed single-sheet BIFF8 workbook: `header_and_rows()` yields
    dense rows (xlrd sheet.row_values order) with xlrd-typed cells."""

    def __init__(self, data: bytes):
        self.stream = ole2_stream(data)
        self.datemode = 0
        self.sst: list[str] = []
        self.xf_fmts: list[int] = []  # XF index -> ifmt
        custom_fmts: dict[int, str] = {}
        self.sheets: list[tuple[str, int]] = []
        if len(self.stream) < 4 or _u16(self.stream, 0)[0] != 0x0809:
            raise XlsError("workbook stream does not start with BOF (BIFF5/7?)")
        if len(self.stream) >= 6 and _u16(self.stream, 4)[0] < 0x0600:
            raise XlsError("pre-BIFF8 .xls (no SST) not supported")
        sst_frags: list[bytes] | None = None
        for op, payload, _ in _records(self.stream, 0):
            if op == 0x00FC:
                sst_frags = [payload]
            elif op == 0x003C and sst_frags is not None:
                sst_frags.append(payload)
            else:
                if sst_frags is not None:
                    # SST fully collected once a non-CONTINUE follows
                    if not self.sst:
                        self.sst = _parse_sst(sst_frags)
                    sst_frags = None
                if op == 0x0085:  # BOUNDSHEET
                    lbply = _u32(payload, 0)[0]
                    self.sheets.append((_short_string(payload, 6), lbply))
                elif op == 0x0022:  # DATEMODE
                    self.datemode = _u16(payload, 0)[0]
                elif op == 0x041E:  # FORMAT: ifmt + 16-bit-length string
                    ifmt = _u16(payload, 0)[0]
                    cch = _u16(payload, 2)[0]
                    high = payload[4] & 1
                    raw = payload[5 : 5 + cch * (2 if high else 1)]
                    custom_fmts[ifmt] = raw.decode(
                        "utf-16-le" if high else "latin-1"
                    )
                elif op == 0x00E0:  # XF: ifmt at offset 2
                    self.xf_fmts.append(_u16(payload, 2)[0])
        if sst_frags is not None and not self.sst:
            self.sst = _parse_sst(sst_frags)
        self._date_fmt = {
            i
            for i in set(self.xf_fmts)
            if i in _BUILTIN_DATE_FMTS
            or (i in custom_fmts and _is_date_format_string(custom_fmts[i]))
        }

    def _is_date_xf(self, ixfe: int) -> bool:
        return ixfe < len(self.xf_fmts) and self.xf_fmts[ixfe] in self._date_fmt

    def _date(self, serial: float):
        base = (
            datetime.datetime(1904, 1, 1)
            if self.datemode
            else datetime.datetime(1899, 12, 30)
        )
        return base + datetime.timedelta(days=serial)

    def _num(self, ixfe: int, value: float):
        return self._date(value) if self._is_date_xf(ixfe) else value

    def rows(self) -> list[list]:
        if len(self.sheets) != 1:
            raise XlsError(
                f"Excel workbook has {len(self.sheets)} sheets"
            )  # reference excel97.py:14-17 UnsupportedConversion shape
        _, pos = self.sheets[0]
        cells: dict[tuple[int, int], object] = {}
        pending_formula: tuple[int, int] | None = None
        for op, p, _ in _records(self.stream, pos):
            if op == 0x00FD:  # LABELSST
                r, c, _x = _u16(p, 0)[0], _u16(p, 2)[0], 0
                cells[(r, c)] = self.sst[_u32(p, 6)[0]]
            elif op == 0x0204:  # LABEL (16-bit-length inline string)
                r, c = _u16(p, 0)[0], _u16(p, 2)[0]
                cch = _u16(p, 6)[0]
                high = p[8] & 1
                raw = p[9 : 9 + cch * (2 if high else 1)]
                cells[(r, c)] = raw.decode("utf-16-le" if high else "latin-1")
            elif op == 0x0203:  # NUMBER
                r, c, x = _u16(p, 0)[0], _u16(p, 2)[0], _u16(p, 4)[0]
                cells[(r, c)] = self._num(x, _f64(p, 6)[0])
            elif op == 0x027E:  # RK
                r, c, x = _u16(p, 0)[0], _u16(p, 2)[0], _u16(p, 4)[0]
                cells[(r, c)] = self._num(x, _rk_value(_u32(p, 6)[0]))
            elif op == 0x00BD:  # MULRK
                r, c0 = _u16(p, 0)[0], _u16(p, 2)[0]
                n = (len(p) - 6) // 6
                for k in range(n):
                    x = _u16(p, 4 + 6 * k)[0]
                    rk = _u32(p, 6 + 6 * k)[0]
                    cells[(r, c0 + k)] = self._num(x, _rk_value(rk))
            elif op == 0x0205:  # BOOLERR: bool 1/0 or the error code,
                # both written as the raw int (xlrd row_values shape)
                r, c = _u16(p, 0)[0], _u16(p, 2)[0]
                cells[(r, c)] = int(p[6])
            elif op == 0x0006:  # FORMULA: cached result
                r, c, x = _u16(p, 0)[0], _u16(p, 2)[0], _u16(p, 4)[0]
                if _u16(p, 12)[0] == 0xFFFF:
                    kind = p[6]
                    if kind == 0:  # string result in following STRING
                        pending_formula = (r, c)
                    elif kind == 1:  # boolean
                        cells[(r, c)] = int(p[8])
                    elif kind == 2:  # error
                        cells[(r, c)] = int(p[8])
                    else:  # 3: empty string
                        cells[(r, c)] = ""
                else:
                    cells[(r, c)] = self._num(x, _f64(p, 6)[0])
            elif op == 0x0207 and pending_formula is not None:  # STRING
                cch = _u16(p, 0)[0]
                high = p[2] & 1
                raw = p[3 : 3 + cch * (2 if high else 1)]
                cells[pending_formula] = raw.decode(
                    "utf-16-le" if high else "latin-1"
                )
                pending_formula = None
        if not cells:
            return []
        nrows = max(r for r, _ in cells) + 1
        ncols = max(c for _, c in cells) + 1
        return [
            [cells.get((r, c), "") for c in range(ncols)] for r in range(nrows)
        ]


def xls_to_csv(path: str, out_path: str) -> None:
    """Decode a single-sheet .xls to CSV with the reference's output
    conventions (excel97.py:19-34): '%g' numbers, ISO-8601 dates,
    strings/booleans as-is, missing cells empty."""
    with open(path, "rb") as fp:
        wb = XlsWorkbook(fp.read())
    with open(out_path, "w", newline="") as out:
        w = csv.writer(out)
        for row in wb.rows():
            w.writerow(
                [
                    v.isoformat()
                    if isinstance(v, datetime.datetime)
                    else "%g" % v
                    if isinstance(v, float)
                    else v
                    for v in row
                ]
            )
