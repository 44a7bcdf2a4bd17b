"""Format-layer tests, mirroring the reference's test strategy
(reference src/columnfile_test.cc): varint/zigzag boundary enumeration,
per-codec roundtrips with NULLs and multi-segment files, 4 KiB values,
mid-file column additions, and AFL fuzz-corpus replay (clean exceptions
allowed, crashes/hangs not).

No Spark needed here — pure format layer.
"""

from __future__ import annotations

import glob
import io
import sys

import pytest

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.sources.columnfile.codec import (
    COMPRESSION_NAMES,
    ColumnFileFormatError,
    RunEncoder,
    decode_runs,
    compress_block,
    decompress_block,
    get_int,
    get_uint,
    put_int,
    put_uint,
    zigzag_decode,
    zigzag_encode,
)
from libcolumnfile_spark.sources.columnfile.format import (
    ColumnFileReader,
    ColumnFileWriter,
    expand_runs,
    scan_segments,
)

CORPUS = sorted(glob.glob("/root/reference/testdata/*.col"))


# ---------------------------------------------------------------------------
# Varint / zigzag (reference columnfile_test.cc:305-341)
# ---------------------------------------------------------------------------

UINT_BOUNDARIES = [
    0, 1, 0x7F, 0x80, 0x1FFF, 0x2000, 0x7FFFF, 0x80000, 0xFFFFF,
    0x100000, 0x7FFFFFF, 0x8000000, 0xFFFFFFF, 0x10000000,
    0x7FFFFFFF, 0x80000000, 0xFFFFFFFE, 0xFFFFFFFF,
]


@pytest.mark.parametrize("v", UINT_BOUNDARIES)
def test_varint_uint_roundtrip(v):
    out = bytearray()
    put_uint(out, v)
    got, pos = get_uint(bytes(out), 0)
    assert got == v
    assert pos == len(out)


@pytest.mark.parametrize("v", UINT_BOUNDARIES)
def test_varint_first_byte_never_control(v):
    """First byte must stay out of the 0xc0..0xff control range."""
    out = bytearray()
    put_uint(out, v)
    assert out[0] < 0xC0


@pytest.mark.parametrize(
    "v",
    [0, 1, -1, 2, -2, 63, -64, 64, -65, 2**31 - 1, -(2**31)],
)
def test_zigzag_roundtrip(v):
    assert zigzag_decode(zigzag_encode(v)) == v
    out = bytearray()
    put_int(out, v)
    got, _ = get_int(bytes(out), 0)
    assert got == v


def test_varint_truncated_raises():
    out = bytearray()
    put_uint(out, 0x123456)
    with pytest.raises(ColumnFileFormatError):
        get_uint(bytes(out[:-1]), 0)


def test_varint_fifth_byte_range_check():
    # fifth byte > 0x1f must be rejected (reference GetUInt :47-48)
    bad = bytes([0x80, 0x80, 0x80, 0x80, 0x20])
    with pytest.raises(ColumnFileFormatError):
        get_uint(bad, 0)


# ---------------------------------------------------------------------------
# Run codec: RLE + prefix coding
# ---------------------------------------------------------------------------


def roundtrip_values(values):
    enc = RunEncoder()
    for v in values:
        if v is None:
            enc.put_null()
        else:
            enc.put(v)
    enc.flush_run()
    runs = decode_runs(bytes(enc.data))
    return expand_runs(runs)


def test_rle_roundtrip():
    values = [b"a"] * 5 + [b"b"] * 3 + [None] * 4 + [b"a"] * 2
    assert roundtrip_values(values) == values


def test_prefix_coding_roundtrip():
    values = [
        b"http://www.example.org/abc.html",
        b"http://www.example.org/image.jpeg",
        b"http://www.example.org/image.png",
    ]
    assert roundtrip_values(values) == values


def test_prefix_coding_actually_elides():
    enc = RunEncoder()
    enc.put(b"http://www.example.org/abc.html")
    enc.put(b"http://www.example.org/image.jpeg")
    enc.flush_run()
    # second value should be stored as prefix-copy + suffix, much
    # shorter than the full concatenation
    assert len(enc.data) < len(b"http://www.example.org/abc.html") + len(
        b"http://www.example.org/image.jpeg"
    )


def test_prefix_cap_64_bytes():
    a = b"x" * 200
    b = b"x" * 199 + b"y"
    assert roundtrip_values([a, b]) == [a, b]


def test_large_value_roundtrip():
    # 4 KiB value exercises multi-byte varint lengths
    # (reference columnfile_test.cc:136-211)
    big = b"x" * 0xFFF
    values = [b"small", big, None, big]
    assert roundtrip_values(values) == values


def test_empty_values_and_null_flips():
    values = [b"", None, b"", b"", None, None, b"v", b""]
    assert roundtrip_values(values) == values


def test_decode_rejects_nonzero_reserved():
    out = bytearray()
    put_uint(out, 1)  # repeat
    put_uint(out, 7)  # reserved != 0
    out += b"\x00"
    with pytest.raises(ColumnFileFormatError):
        decode_runs(bytes(out))


def test_decode_rejects_prefix_overrun():
    out = bytearray()
    put_uint(out, 1)
    put_uint(out, 0)
    out.append(0xC0 | 0x10)  # claims 18-byte shared prefix, none exists
    put_uint(out, 0)
    with pytest.raises(ColumnFileFormatError):
        decode_runs(bytes(out))


# ---------------------------------------------------------------------------
# Block compression
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,codec", sorted(COMPRESSION_NAMES.items()))
def test_compression_roundtrip(name, codec):
    data = b"the quick brown fox " * 500
    blob = compress_block(data, codec)
    assert decompress_block(blob, codec) == data
    if name != "none":
        assert len(blob) < len(data)


# ---------------------------------------------------------------------------
# File roundtrips (reference columnfile_test.cc:52-134: 3 columns,
# 2 segments, NULLs in last row, all codecs)
# ---------------------------------------------------------------------------

REFERENCE_TABLE = [
    {0: b"2000-01-01", 1: b"January", 2: b"First"},
    {0: b"2000-01-02", 1: b"January", 2: b"Second"},
    {0: b"2000-02-02", 1: b"February", 2: b"Second"},
    # second segment
    {0: b"2000-02-03", 1: b"February", 2: b"Third"},
    {0: None, 1: None, 2: None},
]


@pytest.mark.parametrize("codec_name", sorted(COMPRESSION_NAMES))
def test_file_roundtrip_all_codecs(tmp_path, codec_name):
    path = str(tmp_path / f"t_{codec_name}.col")
    w = ColumnFileWriter(path, compression=codec_name)
    for i, row in enumerate(REFERENCE_TABLE):
        w.put_row(sorted(row.items()))
        if i == 2:
            w.flush()  # explicit two-segment split
    w.finalize()

    with ColumnFileReader(path) as r:
        rows = list(r.rows())
    assert rows == REFERENCE_TABLE
    assert len(scan_segments(path)) == 2


def test_in_memory_roundtrip():
    buf = io.BytesIO()
    w = ColumnFileWriter(buf, compression="lz4")
    w.put_row([(0, b"v1"), (1, b"x" * 0xFFF)])
    w.finalize()
    with ColumnFileReader(buf.getvalue()) as r:
        rows = list(r.rows())
    assert rows == [{0: b"v1", 1: b"x" * 0xFFF}]


def test_mid_file_column_addition(tmp_path):
    """Columns can appear mid-file: each segment declares its own set
    (reference columnfile-writer.cc:152-174); readers union per segment."""
    path = str(tmp_path / "grow.col")
    w = ColumnFileWriter(path, compression="none")
    w.put_row([(0, b"a")])
    w.flush()
    w.put_row([(0, b"b"), (5, b"new")])
    w.finalize()
    with ColumnFileReader(path) as r:
        rows = list(r.rows())
    assert rows == [{0: b"a"}, {0: b"b", 5: b"new"}]


def test_column_filter_skips(tmp_path):
    path = str(tmp_path / "filter.col")
    w = ColumnFileWriter(path, compression="lz4")
    for i in range(100):
        w.put_row([(0, str(i).encode()), (1, b"payload" * 50)])
    w.finalize()
    with ColumnFileReader(path, column_filter={0}) as r:
        rows = list(r.rows())
    assert len(rows) == 100
    assert all(set(row) == {0} for row in rows)


def test_pending_size_triggers_multi_segment(tmp_path):
    path = str(tmp_path / "seg.col")
    w = ColumnFileWriter(path, compression="none")
    for i in range(1000):
        w.put_row([(0, f"value-{i}".encode())])
        if w.pending_size > 2000:
            w.flush()
    w.finalize()
    assert len(scan_segments(path)) > 1
    with ColumnFileReader(path) as r:
        assert sum(1 for _ in r.rows()) == 1000


# ---------------------------------------------------------------------------
# Fuzz corpus replay (reference columnfile_test.cc:278-303): all 44 AFL
# files must parse to exhaustion or raise ColumnFileFormatError — never
# crash, hang, or blow memory.
# ---------------------------------------------------------------------------


def test_corpus_exists():
    assert len(CORPUS) >= 40


@pytest.mark.parametrize("path", CORPUS, ids=[p.split("/")[-1] for p in CORPUS])
def test_fuzz_corpus_replay(path):
    try:
        with ColumnFileReader(path) as r:
            n = 0
            for _ in r.rows():
                n += 1
                if n > 1_000_000:
                    pytest.fail("implausible row count from fuzz input")
    except ColumnFileFormatError:
        pass  # clean parse error is acceptable; crash/hang is not


# ---------------------------------------------------------------------------
# Vectorized fixed-width fast path (codec.decode_fixed_fast /
# typed.decode_buf_to_arrow): must be byte-identical to the general run
# decoder on matching buffers and must fall back (return None) on
# anything else — NULLs, prefix runs, multi-byte varints.
# ---------------------------------------------------------------------------


def _encode_runs(cells):
    from libcolumnfile_spark.sources.columnfile.codec import RunEncoder

    enc = RunEncoder()
    for c in cells:
        if c is None:
            enc.put_null()
        else:
            enc.put(c)
    enc.flush_run()
    return bytes(enc.data)


def test_fast_fixed_matches_general_decoder():
    import struct as st

    import numpy as np

    from libcolumnfile_spark.sources.columnfile.codec import decode_fixed_fast

    cells = [st.pack("<q", v) for v in [5, 5, 5, -1, 123456789, 77, 7]]  # RLE run of 3
    buf = _encode_runs(cells)
    got = decode_fixed_fast(buf, 8)
    assert got is not None
    raw, reps = got
    vals = np.repeat(raw.reshape(-1).view(np.int64), reps)
    assert list(vals) == [5, 5, 5, -1, 123456789, 77, 7]


def test_fast_fixed_falls_back_on_nulls_and_var_width():
    from libcolumnfile_spark.sources.columnfile.codec import decode_fixed_fast

    with_null = _encode_runs([b"\x01" * 8, None, b"\x02" * 8])
    assert decode_fixed_fast(with_null, 8) is None
    var_width = _encode_runs([b"\x01" * 8, b"\x02" * 4])
    assert decode_fixed_fast(var_width, 8) is None
    big_repeat = _encode_runs([b"\x03" * 8] * 200)  # repeat=200 -> 2-byte varint
    assert decode_fixed_fast(big_repeat, 8) is None


def test_decode_buf_to_arrow_both_paths_agree():
    import struct as st

    from pyspark.sql.types import DoubleType, LongType

    from libcolumnfile_spark.sources.columnfile.codec import decode_runs
    from libcolumnfile_spark.sources.columnfile.typed import (
        decode_buf_to_arrow,
        decode_runs_to_arrow,
    )

    for dt, fmt, vals in [
        (LongType(), "<q", [1, 1, 1, -5, 9]),
        (DoubleType(), "<d", [0.5, -1.25, 0.5, 3.0]),
    ]:
        buf = _encode_runs([st.pack(fmt, v) for v in vals])
        fast = decode_buf_to_arrow(buf, dt)
        slow = decode_runs_to_arrow(decode_runs(buf), dt)
        assert fast.equals(slow)
        assert fast.to_pylist() == vals


class TestEncodeVarFastProperty:
    """Property tests for the vectorized var-width encoder: any no-null
    string/binary array must roundtrip bit-exactly through
    encode_var_fast + decode_buf_to_arrow, across varint tier
    boundaries (127/128, 8191/8192) and unicode content."""

    def test_hypothesis_string_roundtrip(self):
        import pyarrow as pa
        from hypothesis import given, settings, strategies as st

        from libcolumnfile_spark.sources.columnfile.typed import (
            decode_buf_to_arrow,
            encode_var_fast,
        )
        from pyspark.sql.types import StringType

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(
                st.text(max_size=300) | st.text(min_size=120, max_size=140),
                min_size=1,
                max_size=40,
            )
        )
        def check(vals):
            arr = pa.array(vals, type=pa.string())
            got = encode_var_fast(arr, StringType())
            assert got is not None
            back = decode_buf_to_arrow(got[0], StringType())
            assert back.to_pylist() == vals

        check()

    def test_tier_boundaries_exact(self):
        import pyarrow as pa

        from libcolumnfile_spark.sources.columnfile.typed import (
            decode_buf_to_arrow,
            encode_var_fast,
        )
        from pyspark.sql.types import BinaryType

        vals = [
            b"", b"x" * 126, b"x" * 127, b"x" * 128, b"x" * 129,
            b"y" * 8191, b"y" * 8192, b"y" * 8193,
            b"z" * ((1 << 20) - 1),
        ]
        arr = pa.array(vals, type=pa.binary())
        enc, n = encode_var_fast(arr, BinaryType())
        assert n == len(vals)
        assert decode_buf_to_arrow(enc, BinaryType()).to_pylist() == vals

    def test_oversize_falls_back(self):
        import pyarrow as pa

        from libcolumnfile_spark.sources.columnfile.typed import encode_var_fast
        from pyspark.sql.types import StringType

        assert encode_var_fast(pa.array(["b" * (1 << 20)]), StringType()) is None

    def test_nullable_strings_roundtrip_fast(self):
        """Nullable string/binary arrays take the vectorized path too
        (round-6): nulls emit the 3-byte NULL run, and the sequential
        decoder and the writer's per-cell encoder agree byte-for-byte on
        semantics (values AND null positions)."""
        import pyarrow as pa

        from libcolumnfile_spark.sources.columnfile.typed import (
            decode_buf_to_arrow,
            encode_var_fast,
        )
        from pyspark.sql.types import BinaryType, StringType

        vals = [None, "a", "", None, None, "x" * 129, "tail", None]
        enc, n = encode_var_fast(pa.array(vals, type=pa.string()), StringType())
        assert n == len(vals)
        assert decode_buf_to_arrow(enc, StringType()).to_pylist() == vals
        bvals = [b"bin", None, b"", b"y" * 8192, None]
        enc, n = encode_var_fast(pa.array(bvals, type=pa.binary()), BinaryType())
        assert decode_buf_to_arrow(enc, BinaryType()).to_pylist() == bvals
        # all-null arrays too
        allnull = [None, None, None]
        enc, n = encode_var_fast(pa.array(allnull, type=pa.string()), StringType())
        assert decode_buf_to_arrow(enc, StringType()).to_pylist() == allnull

    def test_hypothesis_nullable_string_roundtrip(self):
        import pyarrow as pa
        from hypothesis import given, settings, strategies as st

        from libcolumnfile_spark.sources.columnfile.typed import (
            decode_buf_to_arrow,
            encode_var_fast,
        )
        from pyspark.sql.types import StringType

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(
                st.none() | st.text(max_size=200) | st.text(min_size=120, max_size=140),
                min_size=1,
                max_size=40,
            )
        )
        def check(vals):
            arr = pa.array(vals, type=pa.string())
            got = encode_var_fast(arr, StringType())
            assert got is not None
            back = decode_buf_to_arrow(got[0], StringType())
            assert back.to_pylist() == vals

        check()


class TestGoldenBytes:
    """Hand-authored golden .col files, written out literally byte by
    byte from the reference spec — NOT via our own encoder — and pinned
    in both directions: the reader must decode exactly these rows, and
    the writer, fed the same rows, must reproduce the files bit-exact.

    This is the strongest bit-compatibility evidence available without
    the C++ toolchain in the sandbox: every byte below is derived by
    hand from src/columnfile-internal.h:21-87 (magic, varint coding),
    src/columnfile-writer.cc:55-111 (segment framing: BE32 header size,
    varint compression/field-count/column/size) and
    src/columnfile-writer.cc:259-318 + src/columnfile.h:28-56 (run
    coding: varint repeat, reserved 0, control byte 0xff=null /
    0xc0..0xfe=prefix-copy of control-0xbe bytes / else first length
    byte; prefix elision only when shared > 2, capped at 0x40)."""

    MAGIC = b"\n\t\"\x00"

    # --- golden file 1: none codec, 2 columns, prefix elision ---------
    URL1 = b"http://www.example.org/abc.html"    # 31 bytes
    URL2 = b"http://www.example.org/image.jpeg"  # 33 bytes, shares 23
    URL3 = b"http://www.example.org/image.png"   # 32 bytes, shares 29
    X200 = b"x" * 200
    P70 = b"P" * 70

    def _g1(self):
        col0 = (
            # run: repeat=1, reserved=0, plain value len 31
            b"\x01\x00\x1f" + self.URL1
            # run: prefix-copy 23 bytes (control 0xc0|(23-2)=0xd5), +10
            + b"\x01\x00\xd5\x0a" + b"image.jpeg"
            # run: prefix-copy 29 (control 0xc0|27=0xdb), +3
            + b"\x01\x00\xdb\x03" + b"png"
            # run: 2 nulls
            + b"\x02\x00\xff"
            # run: repeat=3, len 200 = varint 0x88 0x03 (two-byte form)
            + b"\x03\x00\x88\x03" + self.X200
        )
        col1 = (
            b"\x03\x00\x01a"            # "a" x3
            + b"\x02\x00\x01b"          # "b" x2 (shared prefix 0)
            + b"\x01\x00\x46" + self.P70  # 70-byte value, 1-byte varint
            # shared prefix 70 capped at 0x40=64: control 0xfe, +7
            + b"\x01\x00\xfe\x07" + b"PPPPPPQ"
            + b"\x01\x00\x01z"
        )
        assert len(col0) == 262 and len(col1) == 96
        header = (
            b"\x00"          # compression none
            b"\x02"          # 2 fields
            b"\x00\x86\x04"  # col 0, size 262 (varint 0x86 0x04)
            b"\x01\x60"      # col 1, size 96
        )
        blob = (
            self.MAGIC
            + len(header).to_bytes(4, "big") + header + col0 + col1
        )
        rows = [
            {0: self.URL1, 1: b"a"},
            {0: self.URL2, 1: b"a"},
            {0: self.URL3, 1: b"a"},
            {0: None, 1: b"b"},
            {0: None, 1: b"b"},
            {0: self.X200, 1: self.P70},
            {0: self.X200, 1: self.P70 + b"Q"},
            {0: self.X200, 1: b"z"},
        ]
        return blob, rows

    def _g2(self):
        """Two segments with divergent column sets + multi-byte varint
        column index (200 = 0x88 0x03)."""
        seg1 = (
            (4).to_bytes(4, "big")
            + b"\x00\x01\x05\x0a"          # none, 1 field, col 5, 10 bytes
            + b"\x01\x00\x02aa" + b"\x01\x00\x02ab"
        )
        seg2 = (
            (7).to_bytes(4, "big")
            + b"\x00\x02\x05\x05" + b"\x88\x03" + b"\x0b"
            + b"\x01\x00\x02ac"                       # col 5
            + b"\x01\x00\xff" + b"\x01\x00\x05hello"  # col 200
        )
        blob = self.MAGIC + seg1 + seg2
        rows = [
            {5: b"aa"},
            {5: b"ab"},
            {5: b"ac", 200: None},
            {200: b"hello"},
        ]
        return blob, rows

    def _g4(self):
        """Varint boundary cases: empty value, 3-byte repeat varint
        (300 = 0xac 0x04), 3-byte length varint (8300 = 0xac 0x81 0x01),
        minimum prefix-copy control byte 0xc1 (shared prefix 3)."""
        y8300 = b"y" * 8300
        col0 = (
            b"\x01\x00\x00"                 # empty value
            + b"\x01\x00\x04abcX"
            + b"\x01\x00\xc1\x01Y"          # shared 3 -> control 0xc1
            + b"\xac\x04\x00\xac\x81\x01" + y8300  # repeat 300
        )
        assert len(col0) == 8321
        header = b"\x00\x01\x00" + b"\x81\x82\x01"  # blob size 8321
        blob = self.MAGIC + len(header).to_bytes(4, "big") + header + col0
        rows = (
            [{0: b""}, {0: b"abcX"}, {0: b"abcY"}]
            + [{0: y8300}] * 300
        )
        return blob, rows

    def _check_reader(self, blob, rows):
        from libcolumnfile_spark.sources.columnfile.format import ColumnFileReader

        with ColumnFileReader(blob) as r:
            assert list(r.rows()) == rows

    def _check_writer(self, blob, rows, flush_points=()):
        import io

        from libcolumnfile_spark.sources.columnfile.format import ColumnFileWriter

        sink = io.BytesIO()
        w = ColumnFileWriter(sink, compression="none")
        for i, row in enumerate(rows):
            w.put_row(sorted(row.items()))
            if i + 1 in flush_points:
                w.flush()
        w.finalize()
        assert sink.getvalue() == blob

    def test_g1_prefix_elision_reader_and_writer(self):
        blob, rows = self._g1()
        self._check_reader(blob, rows)
        self._check_writer(blob, rows)

    def test_g2_multi_segment_reader_and_writer(self):
        blob, rows = self._g2()
        self._check_reader(blob, rows)
        self._check_writer(blob, rows, flush_points={2})

    def test_g4_varint_boundaries_reader_and_writer(self):
        blob, rows = self._g4()
        self._check_reader(blob, rows)
        self._check_writer(blob, rows)

    def test_g3_zlib_literal_stream_decodes(self):
        """zlib-compressed segment with a LITERAL RFC-1950 stream (and
        the varint uncompressed-size prefix both the reference reader,
        src/columnfile-reader.cc:537-541, and ours require). Decode-pin
        only: compressed bytes are codec-version-dependent, so the
        writer side is covered by per-codec roundtrip tests instead."""
        stream = bytes.fromhex(
            "789c636260cd48cdc9c96764602dcf2fca4901001e04044a"
        )
        payload = b"\x10" + stream  # varint(16) size prefix + stream
        header = b"\x04\x01\x00" + bytes([len(payload)])
        blob = (
            self.MAGIC + len(header).to_bytes(4, "big") + header + payload
        )
        rows = [{0: b"hello"}, {0: b"hello"}, {0: b"world"}]
        self._check_reader(blob, rows)


class TestGoldenFuzz:
    """Systematic corruption of the hand-authored golden files: every
    truncation prefix and every single-byte flip must either parse to a
    (possibly empty) row prefix or raise ColumnFileFormatError — never
    crash, hang, or return garbage rows beyond the valid prefix.
    Complements the AFL corpus replay (external fuzz inputs) with
    EXHAUSTIVE local mutation of files we know are valid."""

    def _parse(self, blob):
        from libcolumnfile_spark.sources.columnfile.format import (
            ColumnFileFormatError,
            ColumnFileReader,
        )

        try:
            with ColumnFileReader(blob) as r:
                out = []
                for row in r.rows():
                    out.append(row)
                    if len(out) > 1_000_000:
                        raise AssertionError("implausible row count")
                return out
        except ColumnFileFormatError:
            return None  # clean parse error: acceptable

    def test_truncations_g1_g2(self):
        g = TestGoldenBytes()
        for blob, rows in (g._g1(), g._g2()):
            for cut in range(len(blob)):
                got = self._parse(blob[:cut])
                if got is not None:
                    # whatever parses must be a prefix of the true rows
                    assert got == rows[: len(got)]

    def test_truncations_g4_strided(self):
        g = TestGoldenBytes()
        blob, rows = g._g4()
        for cut in list(range(0, 64)) + list(range(64, len(blob), 97)):
            got = self._parse(blob[:cut])
            if got is not None:
                assert got == rows[: len(got)]

    def test_bit_flips_g1(self):
        g = TestGoldenBytes()
        blob, _rows = g._g1()
        for pos in range(len(blob)):
            for bit in (0x01, 0x80):
                mutated = bytearray(blob)
                mutated[pos] ^= bit
                self._parse(bytes(mutated))  # must not crash/hang


class TestVarFastDifferential:
    """The speculative string-run parser (codec.decode_var_fast) claims
    EXACT equivalence with the sequential parser on every buffer it
    accepts (the induction argument in its docstring). These property
    tests check the claim from both directions: real encoder output and
    arbitrary bytes."""

    @staticmethod
    def _fast_runs(buf):
        from libcolumnfile_spark.sources.columnfile.codec import decode_var_fast

        got = decode_var_fast(buf)
        if got is None:
            return None
        data, offsets, reps = got
        return [
            (bytes(data[offsets[i] : offsets[i + 1]]), int(reps[i]))
            for i in range(len(reps))
        ]

    def test_encoder_output_agrees(self):
        from hypothesis import given, settings, strategies as st

        from libcolumnfile_spark.sources.columnfile.codec import (
            RunEncoder,
            decode_runs,
        )

        run = st.one_of(
            st.none(),
            st.binary(max_size=40),
            st.binary(min_size=125, max_size=132),  # varint tier edge
        )

        @settings(max_examples=120, deadline=None)
        @given(st.lists(st.tuples(run, st.integers(1, 200)), min_size=1, max_size=25))
        def check(spec):
            enc = RunEncoder()
            for value, repeat in spec:
                for _ in range(repeat):
                    enc.put_null() if value is None else enc.put(value)
            enc.flush_run()
            buf = bytes(enc.data)
            fast = self._fast_runs(buf)
            slow = decode_runs(buf)
            if fast is not None:
                assert fast == slow  # acceptance implies exact agreement
            # declining is always allowed (NULLs, prefix-coded runs,
            # multi-byte varints) — the sequential parser is the
            # authoritative fallback; test_simple_buffers_accepted pins
            # that the fast path doesn't silently die on plain input

        check()

    def test_simple_buffers_accepted(self):
        """Distinct short values with no RLE benefit — the layout the
        writer's fast var encoder emits — MUST take the fast path (a
        silent always-decline would erase the 3x decode win unnoticed)."""
        from libcolumnfile_spark.sources.columnfile.codec import RunEncoder

        enc = RunEncoder()
        # leading counter keeps consecutive shared prefixes <= 2 chars —
        # RunEncoder prefix-codes only past 2, and a prefix-coded run
        # rightly declines the fast path
        for i in range(50):
            enc.put(f"{i:02d}-value-{'x' * (i % 40)}".encode())
        enc.flush_run()
        fast = self._fast_runs(bytes(enc.data))
        assert fast is not None and len(fast) == 50

    def test_implausible_repeat_total_raises_in_both_parsers(self):
        """Directed coverage of the fast path's only raise (the random
        strategy's 300-byte buffers can never reach the 2^27 repeat
        ceiling): a structurally-valid buffer whose repeats sum past
        MAX_ROWS must be rejected by BOTH parsers."""
        from libcolumnfile_spark.sources.columnfile.codec import (
            MAX_ROWS_PER_COLUMN_SEGMENT,
            ColumnFileFormatError,
            decode_runs,
            decode_var_fast,
        )

        n_runs = MAX_ROWS_PER_COLUMN_SEGMENT // 127 + 2
        buf = bytes([127, 0, 0]) * n_runs  # repeat=127, reserved, len=0
        with pytest.raises(ColumnFileFormatError):
            decode_var_fast(buf)
        with pytest.raises(ColumnFileFormatError):
            decode_runs(buf)

    def test_random_bytes_no_divergent_accept(self):
        from hypothesis import given, settings, strategies as st

        from libcolumnfile_spark.sources.columnfile.codec import (
            ColumnFileFormatError,
            decode_runs,
        )

        @settings(max_examples=300, deadline=None)
        @given(st.binary(max_size=300))
        def check(buf):
            try:
                fast = self._fast_runs(buf)
            except ColumnFileFormatError:
                # fast raised (implausible repeat total): sequential must
                # reject this buffer too
                try:
                    decode_runs(buf)
                except ColumnFileFormatError:
                    return
                raise AssertionError("fast raised where sequential accepted")
            if fast is None:
                return  # declined: sequential semantics are authoritative
            slow = decode_runs(buf)  # must not raise if fast accepted
            assert fast == slow

        check()
