from __future__ import annotations

import pytest

from lakeforge.session import get_spark


@pytest.fixture(scope="session")
def spark():
    extra = {"spark.ui.enabled": "false"}
    # The PostgreSQL JDBC driver must be on the JVM classpath at session
    # start for the live-Postgres round-trip tests; harmless when unused.
    from lakeforge.io.jdbc_driver import find_postgres_jar

    jar = find_postgres_jar()
    if jar:
        extra["spark.jars"] = jar
    s = get_spark(
        "lakeforge-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf=extra,
    )
    yield s
    s.stop()
