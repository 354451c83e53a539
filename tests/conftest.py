from __future__ import annotations

import pytest

from lakeforge.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "lakeforge-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    yield s
    s.stop()
