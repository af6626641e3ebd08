import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from data_pipelines_spark.session import get_spark

    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="dps_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def tmp_root_factory():
    """Fresh dir per call — for hypothesis tests, where one function-scoped
    fixture instance would be shared across all examples."""
    dirs = []

    def make() -> str:
        d = tempfile.mkdtemp(prefix="dps_test_")
        dirs.append(d)
        return d

    yield make
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
