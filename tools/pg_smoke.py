"""Boot/stop a throwaway local PostgreSQL for the live JDBC round-trip
tests (tests/test_postgres_live.py) — closes VERDICT r10 #9, which was
env-blocked through rounds 1-10 until the sandbox shipped PostgreSQL 15
binaries.

Postgres refuses to run as root, so the cluster runs as a dedicated
``pguser`` system account (created on demand) with its data directory
under /tmp — entirely disposable, trust auth, non-default port 5445 so
nothing collides with a real deployment.

Usage:
  python tools/pg_smoke.py --start     # idempotent: initdb + start + createdb
  python tools/pg_smoke.py --stop
  python tools/pg_smoke.py --status
"""

from __future__ import annotations

import argparse
import os
import pwd
import subprocess
import sys
import time

PG_BASE = "/tmp/lakeforge_pg"
PG_DATA = f"{PG_BASE}/data"
PG_PORT = os.environ.get("LAKEFORGE_PG_PORT", "5445")
PG_USER = os.environ.get("LAKEFORGE_PG_USER", "pguser")
PG_DB = os.environ.get("LAKEFORGE_PG_DB", "dwh")


def _run(cmd: list[str], **kw):
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def _as_pguser(cmd: str):
    # cd / first: su drops into the caller's cwd, which pguser may not
    # be able to read (e.g. /root/repo).  /usr/local/bin explicitly: the
    # sandbox installs the server binaries there and su may reset PATH.
    return _run(
        ["su", PG_USER, "-c",
         f"cd / && PATH=/usr/local/bin:/usr/bin:/bin:$PATH {cmd}"]
    )


def _ensure_user() -> None:
    try:
        pwd.getpwnam(PG_USER)
    except KeyError:
        r = _run(["useradd", "-m", "-s", "/bin/bash", PG_USER])
        if r.returncode != 0:
            sys.exit(f"useradd failed: {r.stderr}")


def _alive() -> bool:
    r = _run(
        ["psql", "-h", "127.0.0.1", "-p", PG_PORT, "-U", PG_USER,
         "-d", "postgres", "-tA", "-c", "SELECT 1"],
    )
    return r.returncode == 0 and r.stdout.strip() == "1"


def start() -> None:
    if os.geteuid() != 0:
        sys.exit("tools/pg_smoke.py --start must run as root (uses su)")
    _ensure_user()
    os.makedirs(PG_BASE, exist_ok=True)
    uid = pwd.getpwnam(PG_USER).pw_uid
    os.chown(PG_BASE, uid, -1)
    if not os.path.isdir(PG_DATA):
        r = _as_pguser(f"initdb -D {PG_DATA} -U {PG_USER} --auth=trust")
        if r.returncode != 0:
            sys.exit(f"initdb failed: {r.stderr}\n{r.stdout}")
    if not _alive():
        r = _as_pguser(
            f"pg_ctl -D {PG_DATA} -l {PG_BASE}/log "
            f"-o '-p {PG_PORT} -k {PG_BASE}' start"
        )
        if r.returncode != 0:
            sys.exit(f"pg_ctl start failed: {r.stderr}\n{r.stdout}")
        for _ in range(30):
            if _alive():
                break
            time.sleep(0.5)
    dbs = _run(
        ["psql", "-h", "127.0.0.1", "-p", PG_PORT, "-U", PG_USER,
         "-d", "postgres", "-tA", "-c",
         f"SELECT 1 FROM pg_database WHERE datname = '{PG_DB}'"],
    )
    if dbs.stdout.strip() != "1":
        _run(
            ["psql", "-h", "127.0.0.1", "-p", PG_PORT, "-U", PG_USER,
             "-d", "postgres", "-c", f"CREATE DATABASE {PG_DB}"],
        )
    print(f"postgres up at 127.0.0.1:{PG_PORT} db={PG_DB} user={PG_USER}")


def stop() -> None:
    r = _as_pguser(f"pg_ctl -D {PG_DATA} stop -m fast")
    print(r.stdout.strip() or r.stderr.strip())


def status() -> None:
    print("alive" if _alive() else "down")


def main() -> None:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--start", action="store_true")
    g.add_argument("--stop", action="store_true")
    g.add_argument("--status", action="store_true")
    args = ap.parse_args()
    if args.start:
        start()
    elif args.stop:
        stop()
    else:
        status()


if __name__ == "__main__":
    main()
