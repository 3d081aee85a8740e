import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from pdfspark.pipeline import build_session

    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = build_session(
        cores=4,
        shuffle_partitions=8,
        app="pdfspark-tests",
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()
