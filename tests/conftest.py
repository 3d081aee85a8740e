import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pdfspark.pipeline import build_session

    s = build_session(cores=4, shuffle_partitions=8, app="pdfspark-tests")
    yield s
    s.stop()
