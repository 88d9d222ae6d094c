import os

import pytest

from tmdataloader_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
FIXTURES = "/root/reference/fixtures"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tmdataloader-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
