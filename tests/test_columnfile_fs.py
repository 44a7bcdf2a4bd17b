"""Filesystem-agnostic columnfile I/O (reference O25: pluggable
ColumnFileInput/ColumnFileOutput storage backends, src/columnfile.h:91-108,
tools/columnfile-cat.cc:199-209 CAS hook).

The mock:// scheme routes every byte through the fs layer while backing
onto a local root, which proves the property that matters: a dataset
addressed by a NON-LOCAL URI plans on the driver and reads/writes in
executor worker processes without any os.path assumptions. s3a://-style
deployments swap the backend (pyarrow.fs), not the format code.
"""

from __future__ import annotations

import shutil
import sys
import uuid

import pytest

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.sources.columnfile import register
from libcolumnfile_spark.sources.columnfile.fs import (
    _mock_local,
    fs_exists,
    fs_join,
    fs_listdir,
    fs_open_input,
    fs_open_output,
    fs_read_text,
    fs_size,
    fs_write_text,
)
from libcolumnfile_spark.tables import load_table, spread

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


@pytest.fixture()
def mock_dir():
    path = f"mock://bucket/cf-{uuid.uuid4().hex[:8]}"
    yield path
    local = _mock_local(path)
    shutil.rmtree(local, ignore_errors=True)


def test_fs_primitives_roundtrip(mock_dir):
    p = fs_join(mock_dir, "hello.txt")
    fs_write_text(p, "payload")
    assert fs_exists(p)
    assert fs_read_text(p) == "payload"
    assert fs_size(p) == len("payload")
    with fs_open_output(fs_join(mock_dir, "b.bin")) as f:
        f.write(b"\x00\x01")
    with fs_open_input(fs_join(mock_dir, "b.bin")) as f:
        assert f.read() == b"\x00\x01"
    assert sorted(fs_listdir(mock_dir)) == ["b.bin", "hello.txt"]


def test_columnfile_write_read_via_mock_scheme(spark, mock_dir):
    """Full DataSource roundtrip through a non-file:// URI: executor
    tasks write part files + sidecars, driver plans partitions, executor
    tasks read segments — all through the fs layer."""
    src = load_table(spark, SF, "nation").select("n_nationkey", "n_name", "n_regionkey")
    src.write.format("columnfile").mode("overwrite").save(mock_dir)
    names = fs_listdir(mock_dir)
    assert any(n.endswith(".col") for n in names)
    assert "_schema.json" in names and "_manifest.json" in names

    back = spark.read.format("columnfile").load(mock_dir)
    assert back.schema == src.schema
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in src.collect()
    )


def test_columnfile_filter_pushdown_via_mock_scheme(spark, mock_dir):
    src = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    src.write.format("columnfile").mode("overwrite").save(mock_dir)
    got = (
        spark.read.format("columnfile")
        .load(mock_dir)
        .filter("o_totalprice > 100000")
        .count()
    )
    want = src.filter("o_totalprice > 100000").count()
    assert got == want


def test_cache_root_env_redirection(monkeypatch):
    """All fixture/index caches key off SPARK_GRAFT_CACHE_DIR so a
    shared-FS cluster redirects them with one setting."""
    from libcolumnfile_spark.cache import cache_path

    monkeypatch.delenv("SPARK_GRAFT_CACHE_DIR", raising=False)
    assert cache_path("x").startswith("/tmp/libcolumnfile_spark")
    monkeypatch.setenv("SPARK_GRAFT_CACHE_DIR", "mock://bucket/cacheroot")
    assert cache_path("ivfcache", "k") == "mock://bucket/cacheroot/ivfcache/k"


def test_spread_handles_remote_scheme_without_rdd_fallback(spark, mock_dir):
    """tables.spread() must size remote inputs via the fs layer (not
    raise into the ~1 s RDD fallback). Parquet over mock:// isn't
    readable by the JVM, so exercise the size path directly."""
    p = fs_join(mock_dir, "x.bin")
    fs_write_text(p, "x" * 1024)
    assert fs_size(p) == 1024
    # and the local path through spread still plans without error
    df = spread(load_table(spark, SF, "nation"))
    assert df.count() == 25
