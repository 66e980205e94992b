import os

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see segment_rtree_spark/__init__.py

import pytest


@pytest.fixture(scope="session")
def spark():
    from segment_rtree_spark.session import get_spark

    s = get_spark(cores=4, app="tests", shuffle_partitions=8)
    yield s
    s.stop()
