import pytest

from graphdbetl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("graphdbetl-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
