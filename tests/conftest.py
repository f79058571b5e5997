from __future__ import annotations

import pytest

from loongcollector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="loongcollector-tests",
        master="local[4]",
        shuffle_partitions="8",
        extra_conf={
            "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
            "spark.driver.memory": "4g",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
