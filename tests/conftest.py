import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from mdbloom.spark.session import get_spark
    s = get_spark(app="mdbloom-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_index(tmp_path):
    return str(tmp_path / "index")
