from __future__ import annotations

import pytest

from hiv_data_integration_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="hiv-engine-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark
