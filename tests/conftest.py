import sys

import pytest

sys.path.insert(0, "/root/repo")

from ideafast_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
