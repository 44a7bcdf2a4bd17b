"""The columnfile format layer: a bit-compatible reimplementation of the
reference's on-disk format (magic + self-contained segments of RLE +
prefix-coded, per-column-compressed values) exposed to Spark as a Python
DataSource named ``columnfile``.
"""

from libcolumnfile_spark.sources.columnfile.codec import (
    COMPRESSION_DEFAULT,
    COMPRESSION_LZ4,
    COMPRESSION_LZMA,
    COMPRESSION_NAMES,
    COMPRESSION_NONE,
    COMPRESSION_SNAPPY,
    COMPRESSION_ZLIB,
    ColumnFileFormatError,
)
from libcolumnfile_spark.sources.columnfile.datasource import (
    ColumnFileDataSource,
    register,
)
from libcolumnfile_spark.sources.columnfile.format import (
    ColumnFileReader,
    ColumnFileWriter,
)

__all__ = [
    "COMPRESSION_DEFAULT",
    "COMPRESSION_LZ4",
    "COMPRESSION_LZMA",
    "COMPRESSION_NAMES",
    "COMPRESSION_NONE",
    "COMPRESSION_SNAPPY",
    "COMPRESSION_ZLIB",
    "ColumnFileDataSource",
    "ColumnFileFormatError",
    "ColumnFileReader",
    "ColumnFileWriter",
    "register",
]
