"""Dependency-free SPSS .sav (system file) reader.

The reference converts SPSS uploads with pyreadstat (spss.py:7-16),
which is not in this environment — but the system-file format is
publicly documented (PSPP manual, "System File Format"), and the
subset real survey files use is parseable with stdlib `struct` alone,
the same dependency-free-decoder move as the PPM/WAV and XLSX readers.

Supported ($FL2): both endiannesses, uncompressed and bytecode-
compressed data, numeric and string variables (including multi-segment
strings up to 255 bytes), long variable names (type-7 subtype-13),
character encoding (subtype 20), DATE-family and DATETIME formats
rendered as ISO-8601 (the pyreadstat/reference output shape). Not
supported: zlib-compressed $FL3 (zsav) and >255-byte very long
strings (subtype 14) — both fail fast with a clear message.
"""

from __future__ import annotations

import csv
import datetime
import struct

# lowest finite double = SPSS system-missing (PSPP spec, "sysmis")
_SYSMIS = struct.unpack("<d", b"\xff\xff\xff\xff\xff\xff\xef\xff")[0]
# SPSS time values count seconds from midnight 1582-10-14 (Gregorian)
_EPOCH = datetime.datetime(1582, 10, 14)

# print-format type codes (PSPP spec "Variable Record"): families whose
# numeric value is seconds-since-epoch rendered as a calendar date ...
_DATE_FORMATS = {20, 23, 24, 28, 29, 30, 38, 39}  # DATE ADATE JDATE MOYR QYR WKYR EDATE SDATE
# ... or as a full timestamp
_DATETIME_FORMATS = {22}  # DATETIME


class SavError(ValueError):
    """Malformed or unsupported .sav content."""


class _Var:
    __slots__ = ("name", "width", "fmt_type")

    def __init__(self, name: str, width: int, fmt_type: int):
        self.name = name
        self.width = width  # 0 = numeric, else string byte width
        self.fmt_type = fmt_type

    @property
    def n_elements(self) -> int:
        return 1 if self.width == 0 else (self.width + 7) // 8


class SavReader:
    """Parse the dictionary eagerly, stream cases lazily (`rows()`)."""

    def __init__(self, fp):
        self._fp = fp
        self._endian = "<"
        self._vars: list[_Var] = []
        self._long_names: dict[str, str] = {}
        self._long_names_raw: bytes = b""
        self._encoding = "latin-1"
        self._read_header()
        self._read_dictionary()

    # -- little helpers ---------------------------------------------------
    def _read(self, n: int) -> bytes:
        b = self._fp.read(n)
        if len(b) != n:
            raise SavError("truncated .sav file")
        return b

    def _i32(self) -> int:
        return struct.unpack(self._endian + "i", self._read(4))[0]

    def _f64(self) -> float:
        return struct.unpack(self._endian + "d", self._read(8))[0]

    # -- dictionary -------------------------------------------------------
    def _read_header(self) -> None:
        magic = self._read(4)
        if magic == b"$FL3":
            raise SavError(
                "zlib-compressed .zsav ($FL3) is not supported by the "
                "stdlib reader"
            )
        if magic != b"$FL2":
            raise SavError(f"not a .sav system file (magic {magic!r})")
        self._read(60)  # product name
        layout = struct.unpack("<i", self._read(4))[0]
        if layout not in (2, 3):
            self._endian = ">"
            layout = struct.unpack(">i", struct.pack("<i", layout))[0]
            if layout not in (2, 3):
                raise SavError("unrecognized layout_code")
        self.nominal_case_size = self._i32()
        self.compression = self._i32()
        if self.compression not in (0, 1):
            raise SavError(
                f"compression scheme {self.compression} not supported"
            )
        self._i32()  # weight index
        self.ncases = self._i32()
        self.bias = self._f64()
        self._read(9 + 8 + 64 + 3)  # date, time, label, padding

    def _read_variable(self) -> None:
        width = self._i32()
        has_label = self._i32()
        n_missing = self._i32()
        self._i32()  # print format
        write_fmt = self._i32()
        # raw bytes: the encoding record (subtype 20) may come AFTER the
        # variable records, so names decode lazily in columns()
        name = self._read(8)
        if has_label:
            n = self._i32()
            self._read((n + 3) // 4 * 4)
        if n_missing:
            self._read(8 * abs(n_missing))
        if width >= 0:  # -1 = continuation of a long string: no new var
            # format int packs (LSB first) decimals, width, type, zero
            fmt_type = (write_fmt >> 16) & 0xFF
            self._vars.append(_Var(name, width, fmt_type))

    def _read_extension(self) -> None:
        subtype = self._i32()
        size = self._i32()
        count = self._i32()
        payload = self._read(size * count)
        if subtype == 13:
            # long variable names SHORT=Long\tSHORT=Long — kept raw and
            # decoded lazily in columns(): the encoding record (subtype
            # 20) may come after this one
            self._long_names_raw = payload
        elif subtype == 14:
            raise SavError(
                "very long strings (>255 bytes, subtype 14) not supported"
            )
        elif subtype == 20:
            enc = payload.decode("ascii", "replace").strip()
            if enc:
                self._encoding = enc

    def _read_dictionary(self) -> None:
        while True:
            rec = self._i32()
            if rec == 2:
                self._read_variable()
            elif rec == 3:  # value labels: count * (value, len, label)
                for _ in range(self._i32()):
                    self._read(8)
                    n = self._read(1)[0]
                    self._read((n + 1 + 7) // 8 * 8 - 1)
            elif rec == 4:  # label variable indexes
                self._read(4 * self._i32())
            elif rec == 6:  # documents
                self._read(80 * self._i32())
            elif rec == 7:
                self._read_extension()
            elif rec == 999:
                self._i32()  # filler
                return
            else:
                raise SavError(f"unknown dictionary record type {rec}")

    # -- data -------------------------------------------------------------
    @property
    def columns(self) -> list[str]:
        enc = self._encoding
        long_names = dict(self._long_names)
        if self._long_names_raw:
            for pair in self._long_names_raw.decode(enc, "replace").split("\t"):
                if "=" in pair:
                    short, long = pair.split("=", 1)
                    long_names[short.rstrip()] = long
        out = []
        for v in self._vars:
            name = (
                v.name.decode(enc, "replace").rstrip()
                if isinstance(v.name, bytes)
                else v.name
            )
            out.append(long_names.get(name, name))
        return out

    def _elements_raw(self):
        """Uncompressed stream: raw 8-byte elements until EOF."""
        while True:
            b = self._fp.read(8)
            if len(b) < 8:
                return
            yield b

    def _elements_bytecode(self):
        """Bytecode compression: 8 command bytes, each emitting zero or
        one element; code 253 consumes the next literal 8-byte block
        from the stream in order (PSPP spec, "Data Record")."""
        bias = self.bias
        while True:
            cmd = self._fp.read(8)
            if not cmd:
                return
            for code in cmd:
                if code == 0:  # padding
                    continue
                if code == 252:  # end of data
                    return
                if code == 253:
                    yield self._read(8)
                elif code == 254:
                    yield b"        "
                elif code == 255:
                    yield struct.pack(self._endian + "d", _SYSMIS)
                else:  # 1..251: compressible numeric, value = code - bias
                    yield struct.pack(self._endian + "d", code - bias)

    def rows(self):
        """Yield decoded cases: numeric -> float | None (sysmis),
        string -> rstripped str, DATE/DATETIME formats -> datetime."""
        elements = (
            self._elements_bytecode()
            if self.compression == 1
            else self._elements_raw()
        )
        unpack = struct.Struct(self._endian + "d").unpack
        emitted = 0
        while self.ncases < 0 or emitted < self.ncases:
            row = []
            try:
                for v in self._vars:
                    if v.width == 0:
                        (x,) = unpack(next(elements))
                        if x == _SYSMIS:
                            row.append(None)
                        elif v.fmt_type in _DATE_FORMATS:
                            row.append((_EPOCH + datetime.timedelta(seconds=x)).date())
                        elif v.fmt_type in _DATETIME_FORMATS:
                            row.append(_EPOCH + datetime.timedelta(seconds=x))
                        else:
                            row.append(x)
                    else:
                        parts = []
                        for _ in range(v.n_elements):
                            # explicit next(): StopIteration inside a
                            # genexp becomes RuntimeError (PEP 479) and
                            # would bypass the truncation handler below
                            parts.append(next(elements))
                        raw = b"".join(parts)
                        row.append(
                            raw[: v.width].decode(self._encoding, "replace").rstrip()
                        )
            except StopIteration:
                if row:
                    raise SavError("truncated case data")
                if self.ncases >= 0 and emitted < self.ncases:
                    raise SavError(
                        f"truncated data: {emitted} of {self.ncases} cases"
                    )
                return
            yield row
            emitted += 1


def sav_to_csv(path: str, out_path: str) -> None:
    """Decode a .sav to CSV with the reference's output conventions
    (spss.py:7-16 via pyreadstat + to_csv): '%g' floats, ISO-8601
    dates, empty string for system-missing."""
    with open(path, "rb") as fp:
        r = SavReader(fp)
        with open(out_path, "w", newline="") as out:
            w = csv.writer(out)
            w.writerow(r.columns)
            for row in r.rows():
                w.writerow(
                    [
                        ""
                        if v is None
                        else "%g" % v
                        if isinstance(v, float)
                        else v.isoformat()
                        if isinstance(v, (datetime.date, datetime.datetime))
                        else v
                        for v in row
                    ]
                )
