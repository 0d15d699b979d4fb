import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


@pytest.fixture(scope="session")
def spark():
    from text2nkg_spark.session import get_spark

    s = get_spark("text2nkg-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
