from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

# One JVM serves the whole ~570-test session, including the x10
# scale-contract fixtures: at the 4g engine default the heap exhausts
# near the end of a full run (JVM dies -> every later test fails with
# py4j ConnectionRefused). Tests run on the build host, not the
# driver's harness, so claim a test-appropriate heap unless the
# environment already pinned one.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")

from libcolumnfile_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
