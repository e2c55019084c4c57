"""S4 legacy-Excel leg: the stdlib OLE2/BIFF8 reader (sources/xls.py;
reference excel97.py:9-34 via xlrd). Fixtures are written by a minimal
spec-following BIFF8+CFB writer below — the engine itself never writes
.xls."""

import struct

import pytest

ENDCHAIN = 0xFFFFFFFE
FREE = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


def _rec(op, payload=b""):
    return struct.pack("<HH", op, len(payload)) + payload


def _rk_float(v):
    bits = struct.unpack("<Q", struct.pack("<d", float(v)))[0]
    assert bits & 0xFFFFFFFF == 0, "value not RK-float representable"
    return (bits >> 32) & 0xFFFFFFFC


def _cell_hdr(r, c, ixfe=16):
    return struct.pack("<HHH", r, c, ixfe)


def _sst_entry(s, high=False, runs=0):
    flags = (1 if high else 0) | (8 if runs else 0)
    out = struct.pack("<HB", len(s), flags)
    if runs:
        out += struct.pack("<H", runs)
    out += s.encode("utf-16-le" if high else "latin-1")
    out += b"\x00" * (4 * runs)  # rich-text runs, skipped by the reader
    return out


def _workbook_stream(n_sheets=1, split_sst=False):
    """Globals (BOF, DATEMODE, XFs incl. a date XF, SST, BOUNDSHEETs,
    EOF) + one cell-grid sheet substream per sheet."""
    sst_strings = [
        "id", "name", "score", "when", "flag", "calc",  # header row
        "caf\xe9",  # utf-16 in SST (non-latin handled too, é forces test of high bit path when high=True)
        "plain",
    ]
    if split_sst:
        # first data string split across SST/CONTINUE at char 5 with an
        # option-flags restart byte; second string utf-16 in the CONTINUE
        head = struct.pack("<II", 2, 2) + struct.pack("<HB", 10, 0) + b"abcde"
        cont = b"\x00" + b"fghij" + struct.pack("<HB", 3, 1) + "xyz".encode("utf-16-le")
        sst = _rec(0x00FC, head) + _rec(0x003C, cont)
    else:
        body = struct.pack("<II", len(sst_strings), len(sst_strings))
        for i, s in enumerate(sst_strings):
            body += _sst_entry(s, high=(s == "caf\xe9"), runs=(1 if s == "plain" else 0))
        sst = _rec(0x00FC, body)

    globals_recs = [
        _rec(0x0809, struct.pack("<HH8x", 0x0600, 0x0005)),  # BOF globals
        _rec(0x0022, struct.pack("<H", 0)),  # DATEMODE 1900
    ]
    # 16 style XFs (ifmt 0), XF[16] general, XF[17] built-in date fmt 14
    xf = lambda ifmt: _rec(0x00E0, struct.pack("<HHH14x", 0, ifmt, 0))
    globals_recs += [xf(0) for _ in range(17)] + [xf(14)]
    globals_recs.append(sst)

    def sheet_substream(tag):
        if split_sst:
            cells = [
                _rec(0x00FD, _cell_hdr(0, 0) + struct.pack("<I", 0)),
                _rec(0x00FD, _cell_hdr(0, 1) + struct.pack("<I", 1)),
            ]
        else:
            cells = [
                # header row: LABELSST 0..5
                *[
                    _rec(0x00FD, _cell_hdr(0, c) + struct.pack("<I", c))
                    for c in range(6)
                ],
                # row 1
                _rec(0x027E, _cell_hdr(1, 0) + struct.pack("<I", (1 << 2) | 2)),
                _rec(0x00FD, _cell_hdr(1, 1) + struct.pack("<I", 6)),
                _rec(0x0203, _cell_hdr(1, 2) + struct.pack("<d", 12345.678)),
                _rec(0x0203, _cell_hdr(1, 3, ixfe=17) + struct.pack("<d", 43894.0)),
                _rec(0x0205, _cell_hdr(1, 4) + bytes([1, 0])),
                _rec(
                    0x0006,
                    _cell_hdr(1, 5) + struct.pack("<d", 7.5) + b"\x00" * 8,
                ),
                # row 2: RK div100-int, rich SST, MULRK (cols 2-3, col 3
                # carries the date XF), BOOLERR false, FORMULA -> STRING
                _rec(0x027E, _cell_hdr(2, 0) + struct.pack("<I", (250 << 2) | 3)),
                _rec(0x00FD, _cell_hdr(2, 1) + struct.pack("<I", 7)),
                _rec(
                    0x00BD,
                    struct.pack("<HH", 2, 2)
                    + struct.pack("<HI", 16, _rk_float(3.25))
                    + struct.pack("<HI", 17, _rk_float(44000.0))
                    + struct.pack("<H", 3),
                ),
                _rec(0x0205, _cell_hdr(2, 4) + bytes([0, 0])),
                # string-result FORMULA: num = [kind=0, 0*5, 0xFF, 0xFF]
                _rec(
                    0x0006,
                    _cell_hdr(2, 5) + b"\x00" * 6 + b"\xff\xff" + b"\x00" * 2,
                ),
                _rec(0x0207, struct.pack("<HB", 3, 0) + b"abc"),
            ]
        return (
            _rec(0x0809, struct.pack("<HH8x", 0x0600, 0x0010))
            + b"".join(cells)
            + _rec(0x000A)
        )

    sheets = [sheet_substream(i) for i in range(n_sheets)]
    # BOUNDSHEET offsets need the final globals length: compute with
    # placeholder-sized records first (fixed 12-byte payloads)
    def boundsheet(off, name):
        nm = name.encode("latin-1")
        return _rec(
            0x0085, struct.pack("<IH", off, 0) + bytes([len(nm), 0]) + nm
        )

    names = [f"Sheet{i + 1}" for i in range(n_sheets)]
    fixed = b"".join(globals_recs)
    bs_len = sum(4 + 8 + len(n) for n in names)
    globals_len = len(fixed) + bs_len + len(_rec(0x000A))
    offs = []
    pos = globals_len
    for s in sheets:
        offs.append(pos)
        pos += len(s)
    bs = b"".join(boundsheet(o, n) for o, n in zip(offs, names))
    return fixed + bs + _rec(0x000A) + b"".join(sheets)


def _ole2_wrap(workbook, pad_regular=False):
    """Wrap a stream into a compound file ([MS-CFB] v3, 512-byte
    sectors): mini-stream storage below the 4096 cutoff, regular FAT
    chain above (or when padded there)."""
    SS, MS = 512, 64
    if pad_regular and len(workbook) < 4096:
        workbook = workbook + b"\x00" * (4096 - len(workbook))
    mini = len(workbook) < 4096

    def pad(b, n):
        return b + b"\x00" * (-len(b) % n)

    def direntry(name, otype, start, size, child=FREE):
        nm = name.encode("utf-16-le") + b"\x00\x00"
        e = pad(nm, 64)[:64]
        e += struct.pack("<HBB", len(nm), otype, 1)
        e += struct.pack("<III", FREE, FREE, child)
        e += b"\x00" * 16 + b"\x00" * 4 + b"\x00" * 16
        e += struct.pack("<IQ", start, size)
        assert len(e) == 128
        return e

    if mini:
        ministream = pad(workbook, MS)
        n_mini = len(ministream) // MS
        minifat = list(range(1, n_mini)) + [ENDCHAIN]
        minifat_sec = pad(struct.pack(f"<{len(minifat)}I", *minifat), SS)
        ministream = pad(ministream, SS)
        n_stream_secs = len(ministream) // SS
        # sectors: 0 FAT, 1 dir, 2 miniFAT, 3.. ministream container
        fat = [FATSECT, ENDCHAIN, ENDCHAIN]
        for i in range(n_stream_secs):
            fat.append(3 + i + 1 if i < n_stream_secs - 1 else ENDCHAIN)
        root = direntry("Root Entry", 5, 3, len(pad(workbook, MS)), child=1)
        wb = direntry("Workbook", 2, 0, len(workbook))
        dirsec = pad(root + wb, SS)
        payload = [pad(struct.pack(f"<{len(fat)}I", *fat) + b"\xff" * 4 * (SS // 4 - len(fat)), SS)[:SS],
                   dirsec, pad(minifat_sec, SS)[:SS]] + [
            ministream[i * SS : (i + 1) * SS] for i in range(n_stream_secs)
        ]
        minifat_start, n_minifat = 2, 1
    else:
        stream = pad(workbook, SS)
        n_secs = len(stream) // SS
        # sectors: 0 FAT, 1 dir, 2.. stream
        fat = [FATSECT, ENDCHAIN]
        for i in range(n_secs):
            fat.append(2 + i + 1 if i < n_secs - 1 else ENDCHAIN)
        assert len(fat) <= SS // 4
        root = direntry("Root Entry", 5, ENDCHAIN, 0, child=1)
        wb = direntry("Workbook", 2, 2, len(workbook))
        dirsec = pad(root + wb, SS)
        payload = [pad(struct.pack(f"<{len(fat)}I", *fat) + b"\xff" * 4 * (SS // 4 - len(fat)), SS)[:SS],
                   dirsec] + [stream[i * SS : (i + 1) * SS] for i in range(n_secs)]
        minifat_start, n_minifat = ENDCHAIN, 0

    hdr = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 16
    hdr += struct.pack("<HHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6)
    hdr += b"\x00" * 6 + struct.pack("<I", 0)
    hdr += struct.pack("<III", 1, 1, 0)  # n FAT, first dir, transaction
    hdr += struct.pack("<III", 4096, minifat_start, n_minifat)
    hdr += struct.pack("<II", ENDCHAIN, 0)  # DIFAT chain
    difat = [0] + [FREE] * 108
    hdr += struct.pack("<109I", *difat)
    assert len(hdr) == 512
    return hdr + b"".join(payload)


def _expected_df_checks(df):
    assert list(df.columns) == ["id", "name", "score", "when", "flag", "calc"]
    assert df["id"].tolist() == [1, 2.5]
    assert df["name"].tolist() == ["caf\xe9", "plain"]
    assert df["score"].tolist() == [12345.7, 3.25]  # '%g' fidelity
    # serial 43894 (1900 mode) = 2020-03-04; 44000 = 2020-06-18
    assert str(df["when"].iloc[0]).startswith("2020-03-04")
    assert str(df["when"].iloc[1]).startswith("2020-06-18")
    assert df["flag"].tolist() == [1, 0]
    assert df["calc"].tolist() == ["7.5", "abc"]  # mixed col reads as str


def test_xls_ingest_regular_stream(ray_session, tmp_path):
    from auctus_ray.sources.ingest import read_table_auto, sniff_format

    p = tmp_path / "book.xls"
    p.write_bytes(_ole2_wrap(_workbook_stream(), pad_regular=True))
    assert sniff_format(str(p))["format"] == "xls"
    _expected_df_checks(read_table_auto(str(p)).to_pandas())


def test_xls_ingest_mini_stream(ray_session, tmp_path):
    """Streams under the 4096-byte cutoff live in the mini stream —
    the layout small real-world .xls files actually use."""
    from auctus_ray.sources.ingest import read_table_auto

    wb = _workbook_stream()
    assert len(wb) < 4096
    p = tmp_path / "small.xls"
    p.write_bytes(_ole2_wrap(wb))
    _expected_df_checks(read_table_auto(str(p)).to_pandas())


def test_xls_sst_continue_split():
    """SST character data split across a CONTINUE record restarts the
    option-flags byte (and may switch width) — [MS-XLS] 2.5.293."""
    from auctus_ray.sources.xls import XlsWorkbook

    wb = XlsWorkbook(_ole2_wrap(_workbook_stream(split_sst=True)))
    assert wb.sst == ["abcdefghij", "xyz"]
    rows = wb.rows()
    assert rows[0] == ["abcdefghij", "xyz"]


def test_xls_multisheet_fails_fast(tmp_path):
    """Reference parity: excel97.py:14-17 refuses multi-sheet books."""
    from auctus_ray.sources.ingest import ConversionUnavailable, read_table_auto

    p = tmp_path / "two.xls"
    p.write_bytes(_ole2_wrap(_workbook_stream(n_sheets=2), pad_regular=True))
    with pytest.raises(ConversionUnavailable, match="2 sheets"):
        read_table_auto(str(p))


def test_xls_cyclic_difat_raises():
    """A crafted DIFAT sector that points back at itself must raise
    XlsError, not loop forever with unbounded memory growth (the
    discovery drain's poison-file handling catches exceptions, not
    hangs)."""
    from auctus_ray.sources.xls import XlsError, ole2_stream

    data = bytearray(_ole2_wrap(_workbook_stream(), pad_regular=True))
    # append a DIFAT sector whose next-pointer (last u32) is itself
    self_idx = len(data) // 512 - 1  # sector n starts at (n+1)*512
    sect = struct.pack(f"<{512 // 4 - 1}I", *([FREE] * (512 // 4 - 1)))
    sect += struct.pack("<I", self_idx)
    data += sect
    struct.pack_into("<I", data, 68, self_idx)  # header DIFAT start
    with pytest.raises(XlsError, match="cyclic DIFAT"):
        ole2_stream(bytes(data))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    ),
    data=st.data(),
)
def test_sst_continue_split_property(texts, data):
    """SST parsing is invariant to WHERE the record splits into
    CONTINUE fragments, as long as splits land on character boundaries
    (the only splits [MS-XLS] allows): every split point must decode to
    the same strings."""
    from auctus_ray.sources.xls import _parse_sst

    # build one contiguous SST payload, tracking legal split points
    # (character boundaries inside each string's char data)
    payload = bytearray(struct.pack("<II", len(texts), len(texts)))
    splits_at: list[tuple[int, int]] = []  # (byte offset, width) candidates
    for s in texts:
        high = 1 if any(ord(c) > 0xFF for c in s) else 0
        payload += struct.pack("<HB", len(s), high)
        width = 2 if high else 1
        start = len(payload)
        payload += s.encode("utf-16-le" if high else "latin-1")
        for ci in range(1, len(s)):
            splits_at.append((start + ci * width, high))

    whole = _parse_sst([bytes(payload)])
    assert whole == texts

    if splits_at:
        off, high = data.draw(st.sampled_from(splits_at))
        frag2 = bytes([high]) + bytes(payload[off:])
        assert _parse_sst([bytes(payload[:off]), frag2]) == texts


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**29), max_value=2**29 - 1), st.booleans())
def test_rk_int_roundtrip(v, div100):
    from auctus_ray.sources.xls import _rk_value

    rk = ((v & 0x3FFFFFFF) << 2) | 0x02 | (0x01 if div100 else 0)
    expect = v / 100.0 if div100 else float(v)
    assert _rk_value(rk) == expect


@settings(max_examples=200, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False), st.booleans())
def test_rk_float_roundtrip(x, div100):
    """Floats whose low 34 mantissa bits are zero are exactly RK-
    representable (RK keeps the TOP 30 bits of the double); quantize
    the drawn float to that grid first."""
    from auctus_ray.sources.xls import _rk_value

    bits = struct.unpack("<Q", struct.pack("<d", x))[0] & 0xFFFFFFFC00000000
    x_q = struct.unpack("<d", struct.pack("<Q", bits))[0]
    rk = ((bits >> 32) & 0xFFFFFFFC) | (0x01 if div100 else 0)
    expect = x_q / 100.0 if div100 else x_q
    assert _rk_value(rk) == expect or (expect != expect and _rk_value(rk) != _rk_value(rk))
