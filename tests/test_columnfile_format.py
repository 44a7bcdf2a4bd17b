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

    def test_null_and_oversize_fall_back(self):
        import pyarrow as pa

        from libcolumnfile_spark.sources.columnfile.typed import encode_var_fast
        from pyspark.sql.types import StringType

        assert encode_var_fast(pa.array(["a", None]), StringType()) is None
        assert encode_var_fast(pa.array(["b" * (1 << 20)]), StringType()) is None
