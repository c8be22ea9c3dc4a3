import sys

import pytest

sys.path.insert(0, "/root/repo")

from geopy_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cores=8, shuffle_partitions=16)
    yield s
