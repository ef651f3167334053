from __future__ import annotations

import pytest

from serialization_agents_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sas-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.files.maxPartitionBytes": "8m"},
    )
    yield s
