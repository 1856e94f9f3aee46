import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")


@pytest.fixture(scope="session")
def spark():
    from queens_spark.session import get_spark

    s = get_spark("queens_spark_tests")
    yield s


@pytest.fixture()
def warehouse_root(tmp_path):
    return str(tmp_path / "warehouse")
