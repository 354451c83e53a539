"""Locate the PostgreSQL JDBC driver jar (org.postgresql:postgresql).

Spark's JDBC source/sink needs the driver ON THE JVM CLASSPATH at session
start (``spark.jars``).  The jar is a public Maven artifact; in an
offline sandbox it can only be used if some distribution already ships
it, so the finder probes, in order:

1. ``$LAKEFORGE_PG_JDBC_JAR`` — explicit override;
2. ``<repo>/lib/postgresql*.jar`` — a vendored copy, if one exists;
3. pyspark's bundled ``jars/`` directory;
4. well-known sandbox locations (``/root/reference/lib`` ships
   postgresql-42.7.3.jar alongside the reference deployment's compose
   file — the jar is upstream PostgreSQL's, not reference code).

Returns None when no jar is found — callers (the live-Postgres tests,
tools/pg_smoke.py) must skip, not fail: a missing driver is an
environment gap, not an engine bug.
"""

from __future__ import annotations

import glob
import os


def find_postgres_jar() -> str | None:
    env = os.environ.get("LAKEFORGE_PG_JDBC_JAR")
    if env and os.path.isfile(env):
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates: list[str] = []
    candidates += sorted(glob.glob(os.path.join(here, "lib", "postgresql*.jar")))
    try:
        import pyspark

        candidates += sorted(
            glob.glob(
                os.path.join(
                    os.path.dirname(pyspark.__file__), "jars", "postgresql-*.jar"
                )
            )
        )
    except Exception:
        pass
    candidates += sorted(glob.glob("/root/reference/lib/postgresql*.jar"))
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None
