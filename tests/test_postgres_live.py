"""LIVE PostgreSQL round-trip for the gold JDBC sink (reference S5:
gold_sql_to_postgres.py:31-44) — the one surface every prior round could
only attest via embedded Derby + the DuckDB DDL contract because the
sandbox shipped no server.  This round it does (PostgreSQL 15 binaries);
tools/pg_smoke.py boots a throwaway cluster and these tests attest, on a
REAL Postgres:

- the generated 01_ddl.sql (io/ddl.py) executes verbatim;
- write_jdbc with mode=overwrite + truncate=true loads every gold table
  through parallel executor connections;
- overwrite TRUNCATEs instead of DROP+CREATE, so the DDL's PRIMARY KEYs
  survive the reload (the contract Derby could not check — it lacks
  TRUNCATE and Spark falls back to DROP there);
- read-back through spark.read.jdbc is row-exact against the frames the
  medallion pipeline produced.

Skips (not fails) without a reachable server or a driver jar: that is an
environment gap, not an engine bug.  Boot a server with:
    python tools/pg_smoke.py --start
"""

from __future__ import annotations

import os
import subprocess

import pytest

from lakeforge.io.jdbc_driver import find_postgres_jar

PG_HOST = os.environ.get("LAKEFORGE_PG_HOST", "127.0.0.1")
PG_PORT = os.environ.get("LAKEFORGE_PG_PORT", "5445")
PG_USER = os.environ.get("LAKEFORGE_PG_USER", "pguser")
PG_DB = os.environ.get("LAKEFORGE_PG_DB", "dwh")
PG_URL = f"jdbc:postgresql://{PG_HOST}:{PG_PORT}/{PG_DB}"


def _psql(sql: str) -> str:
    out = subprocess.run(
        ["psql", "-h", PG_HOST, "-p", PG_PORT, "-U", PG_USER, "-d", PG_DB,
         "-v", "ON_ERROR_STOP=1", "-tA", "-c", sql],
        capture_output=True, text=True, timeout=60,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr.strip())
    return out.stdout.strip()


def _pg_alive() -> bool:
    try:
        return _psql("SELECT 1") == "1"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not (_pg_alive() and find_postgres_jar()),
    reason="no live PostgreSQL at "
    f"{PG_HOST}:{PG_PORT} or no JDBC driver jar (run tools/pg_smoke.py --start)",
)


@pytest.fixture(scope="module")
def gold(spark, tmp_path_factory):
    from test_golden_medallion import BRONZE

    from lakeforge.pipelines.medallion import bronze_to_silver, build_gold

    root = tmp_path_factory.mktemp("pg_medallion")
    bronze = root / "bronze"
    bronze.mkdir()
    for fname, content in BRONZE.items():
        (bronze / fname).write_text(content)
    silver = str(root / "silver")
    bronze_to_silver(spark, str(bronze), silver)
    return build_gold(spark, silver)


@pytest.fixture(scope="module")
def ddl_applied(gold):
    """Apply the GENERATED DDL verbatim on the live server, once per
    module — so every test below stands alone (selectable with -k)
    instead of depending on the readback test having run first."""
    from test_golden_medallion import STAR_DDL_KEYS

    from lakeforge.io.ddl import star_schema_ddl

    for name in gold:
        _psql(f"DROP TABLE IF EXISTS {name} CASCADE")
    for stmt in star_schema_ddl(gold, STAR_DDL_KEYS).split("\n\n"):
        _psql(stmt)
    return STAR_DDL_KEYS


def test_gold_load_and_readback_row_exact(spark, gold, ddl_applied):
    from lakeforge.io.sinks import write_jdbc

    for name, df in gold.items():
        write_jdbc(
            df, PG_URL, name, user=PG_USER, password="",
            num_partitions=4, mode="overwrite", truncate=True,
        )
        back = (
            spark.read.format("jdbc")
            .option("url", PG_URL)
            .option("dbtable", name)
            .option("user", PG_USER)
            .option("password", "")
            .option("driver", "org.postgresql.Driver")
            .load()
        )
        want = {tuple(r) for r in df.collect()}
        got = {tuple(r) for r in back.select(*df.columns).collect()}
        assert got == want, name
        assert int(_psql(f"SELECT count(*) FROM {name}")) == len(want)


def test_overwrite_truncates_and_preserves_primary_keys(spark, gold, ddl_applied):
    """The reference's truncate=true knob exists precisely so reloads keep
    the DDL; assert the PKs are still there AFTER a second overwrite."""
    from lakeforge.io.sinks import write_jdbc

    for name, keys in ddl_applied.items():
        write_jdbc(
            gold[name], PG_URL, name, user=PG_USER, password="",
            num_partitions=2, mode="overwrite", truncate=True,
        )
        n_pk = _psql(
            "SELECT count(*) FROM information_schema.table_constraints "
            f"WHERE table_name = '{name}' AND constraint_type = 'PRIMARY KEY'"
        )
        assert n_pk == "1", f"{name}: primary key lost on overwrite"
        cols = _psql(
            "SELECT kcu.column_name FROM information_schema.key_column_usage kcu "
            "JOIN information_schema.table_constraints tc "
            "  ON tc.constraint_name = kcu.constraint_name "
            f"WHERE tc.table_name = '{name}' "
            "  AND tc.constraint_type = 'PRIMARY KEY' ORDER BY kcu.ordinal_position"
        ).splitlines()
        assert cols == keys, name


def test_month_scoped_reload_matches_reference_knobs(spark, gold, ddl_applied):
    """The reference loads per-month slices (PROCESS_YM) with the same
    sink knobs; a scoped fact reload through the identical path must
    leave only that slice (full-table truncate semantics: the scope is
    the FRAME, the knob set is the reference's)."""
    from pyspark.sql import functions as F

    from lakeforge.io.sinks import write_jdbc

    fact = gold["fact_account_snapshot"]
    months = [
        r[0]
        for r in fact.select(F.date_format("snapshot_date", "yyyyMM"))
        .distinct()
        .collect()
    ]
    one = sorted(months)[0]
    scoped = fact.filter(F.date_format("snapshot_date", "yyyyMM") == one)
    try:
        write_jdbc(
            scoped, PG_URL, "fact_account_snapshot", user=PG_USER, password="",
            num_partitions=2, mode="overwrite", truncate=True,
        )
        n = int(_psql("SELECT count(*) FROM fact_account_snapshot"))
        assert n == scoped.count()
    finally:
        # restore the full fact even when the assertion fails, so a later
        # run (or test) never sees a truncated table
        write_jdbc(
            fact, PG_URL, "fact_account_snapshot", user=PG_USER, password="",
            num_partitions=2, mode="overwrite", truncate=True,
        )
