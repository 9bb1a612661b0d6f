#!/usr/bin/env python3
"""Dual-lane validation of the Postgres serving-load artifacts
(VERDICT r17 #5, mirroring dag_check.py's real-vs-stub discipline):

REAL lane (preferred) — when a Postgres server is reachable or can be
bootstrapped, the goldens under tools/pg_golden/ EXECUTE for real,
driving the exact deployment sequence PostgisLoadJob documents:

  scenario A (prepared per-row upsert):
    CREATE TABLE → CREATE UNIQUE INDEX (way_id) → PREPARE the `?`-form
    upsert as $n → EXECUTE twice with a changed payload → assert ONE row
    with the UPDATED value (the idempotent ON CONFLICT path, executed).
  scenario B (staged set-based upsert):
    fresh table → CREATE UNIQUE INDEX (way_id, pgosm_date) → CREATE
    UNLOGGED stage → seed stage → staged upsert twice → assert
    exactly-once semantics.
  scenario C: the parameterized slice DELETE.

Server resolution order:
  1. $GRAFT_PG_DSN — a psql-able DSN ("host=... user=... dbname=...")
  2. scratch cluster via initdb/pg_ctl on a unix socket (run through
     `runuser -u postgres` when invoked as root), torn down afterwards.

GRAMMAR lane (fallback) — no server and no initdb: delegates to
pg_grammar_check.py over the same files.

Both lanes check the SAME statement inventory: every *.sql in
tools/pg_golden/ must be exercised, or the tool fails loud — the lanes
cannot silently drift apart.

Prints `mode=real` or `mode=grammar` plus per-scenario results; exit 0
only on full success of whichever lane ran.
"""
import os
import re
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "pg_golden")

# every golden must be claimed by a scenario below (inventory parity)
EXPECTED = {
    "create_osm_ways.sql", "create_unique_way_id.sql",
    "create_unique_way_id_pgosm_date.sql", "create_osm_ways_stage.sql",
    "upsert_prepared.sql", "upsert_staged.sql", "delete_slice.sql",
}


def golden(name):
    with open(os.path.join(GOLDEN, name), encoding="utf-8") as f:
        return f.read().strip().rstrip(";")


def jdbc_to_pg_params(sql):
    """Rewrite JDBC `?` binds to PostgreSQL $1..$n (PREPARE form)."""
    n = [0]

    def sub(_):
        n[0] += 1
        return f"${n[0]}"

    return re.sub(r"\?", sub, sql), n[0]


class Psql:
    def __init__(self, dsn):
        self.dsn = dsn

    def run(self, sql, check=True):
        p = subprocess.run(
            ["psql", self.dsn, "-v", "ON_ERROR_STOP=1", "-X", "-qAt", "-c", sql],
            capture_output=True, text=True)
        if check and p.returncode != 0:
            raise RuntimeError(f"psql failed on:\n{sql}\n{p.stderr}")
        return p.stdout.strip()


def find_server():
    """Returns (Psql, cleanup_fn, description) or None."""
    dsn = os.environ.get("GRAFT_PG_DSN")
    if dsn:
        db = Psql(dsn)
        try:
            db.run("SELECT 1")
            return db, lambda: None, f"GRAFT_PG_DSN ({dsn.split()[0]}...)"
        except Exception as e:
            print(f"GRAFT_PG_DSN set but unusable: {e}", file=sys.stderr)
    if not (shutil.which("initdb") and shutil.which("pg_ctl") and shutil.which("psql")):
        return None
    # bootstrap a scratch cluster on a unix socket; as root, run the
    # server as the postgres system user (postgres refuses uid 0)
    as_user = []
    if os.geteuid() == 0:
        if not shutil.which("runuser"):
            return None
        as_user = ["runuser", "-u", "postgres", "--"]
    work = tempfile.mkdtemp(prefix="graft_pg_")
    data = os.path.join(work, "data")
    if as_user:
        shutil.chown(work, user="postgres", group="postgres")

    def sh(cmd):
        p = subprocess.run(as_user + cmd, capture_output=True, text=True)
        if p.returncode != 0:
            raise RuntimeError(f"{' '.join(cmd)}:\n{p.stderr}")

    # free TCP port for the Spark wire-protocol leg (scenario D): the
    # executors connect over 127.0.0.1, psql keeps the unix socket
    import socket
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    try:
        sh(["initdb", "-D", data, "-U", "graft", "--auth=trust", "-E", "UTF8"])
        sh(["pg_ctl", "-D", data, "-o", f"-k {work} -h 127.0.0.1 -p {port}",
            "-l", os.path.join(work, "log"), "start", "-w"])
    except Exception as e:
        print(f"scratch cluster bootstrap failed: {e}", file=sys.stderr)
        shutil.rmtree(work, ignore_errors=True)
        return None

    def cleanup():
        subprocess.run(as_user + ["pg_ctl", "-D", data, "stop", "-m", "immediate"],
                       capture_output=True)
        shutil.rmtree(work, ignore_errors=True)

    return (Psql(f"host={work} port={port} user=graft dbname=postgres"), cleanup,
            f"scratch cluster ({work}, tcp {port})")


ROW1 = "(1, '\\x0102'::bytea, 'eu', 'spain', 4, 2.5, '2024-07-25', 'eu-spain')"
ROW1B = "(1, '\\x0102'::bytea, 'eu', 'spain', 9, 7.5, '2024-07-25', 'eu-spain')"
ROW2 = "(2, '\\x0304'::bytea, 'eu', 'france', 6, 3.5, '2024-07-25', 'eu-france')"
# NULL pgosm_date: a KEY column left NULL — under default NULLS DISTINCT
# the arbiter index never matches it and a retried merge inserts a
# duplicate; the NULLS NOT DISTINCT arbiter (r19) must keep it exactly-once
ROW3 = "(3, '\\x0506'::bytea, 'eu', 'italy', 5, 1.5, NULL, 'eu-italy')"
PREP_TYPES = "(bigint, bytea, text, text, int, float8, text, text)"


def real_lane(db):
    used = set()

    def g(name):
        used.add(name)
        return golden(name)

    # --- scenario A: prepared per-row upsert, ON CONFLICT (way_id)
    db.run("DROP TABLE IF EXISTS osm_ways, osm_ways_stage")
    db.run(g("create_osm_ways.sql"))
    db.run(g("create_unique_way_id.sql"))
    upsert, nbinds = jdbc_to_pg_params(g("upsert_prepared.sql"))
    assert nbinds == 8, f"prepared upsert should carry 8 binds, got {nbinds}"
    # PREPARE is session-scoped: the prepare + both executes ship as ONE
    # psql session (conflict path on the second execute: must UPDATE)
    db.run(f"PREPARE up {PREP_TYPES} AS {upsert};\n"
           f"EXECUTE up{ROW1};\nEXECUTE up{ROW1B}")
    rows = db.run("SELECT count(*) || ':' || max(n_points) || ':' || max(area) FROM osm_ways")
    assert rows == "1:9:7.5", f"scenario A expected 1 updated row, got {rows}"
    print("scenario A (prepared ON CONFLICT (way_id) upsert): executed, idempotent-update verified")

    # --- scenario C: parameterized slice delete (against scenario A state)
    delete, nbinds = jdbc_to_pg_params(g("delete_slice.sql"))
    assert nbinds == 1
    db.run(f"PREPARE del (text) AS {delete};\nEXECUTE del('eu-spain')")
    assert db.run("SELECT count(*) FROM osm_ways") == "0", "slice delete left rows"
    print("scenario C (parameterized slice DELETE): executed, slice emptied")

    # --- scenario B: staged set-based upsert, ON CONFLICT (way_id, pgosm_date)
    db.run("DROP TABLE IF EXISTS osm_ways, osm_ways_stage")
    db.run(g("create_osm_ways.sql"))
    db.run(g("create_unique_way_id_pgosm_date.sql"))
    db.run(g("create_osm_ways_stage.sql"))
    db.run(f"INSERT INTO osm_ways_stage VALUES {ROW1}, {ROW2}")
    staged = g("upsert_staged.sql")
    db.run(staged)
    db.run(staged)  # retry (Airflow re-run): must be exactly-once
    rows = db.run("SELECT count(*) FROM osm_ways")
    assert rows == "2", f"scenario B expected 2 rows after double merge, got {rows}"
    db.run("UPDATE osm_ways_stage SET area = 9.75 WHERE way_id = 1")
    db.run(staged)
    area = db.run("SELECT area FROM osm_ways WHERE way_id = 1")
    assert area == "9.75", f"scenario B carry-over update not applied: area={area}"
    # NULL-keyed retry: pgosm_date IS NULL must still hit the arbiter
    # (NULLS NOT DISTINCT) — a duplicate here is the silent-dupe bug
    db.run("TRUNCATE osm_ways_stage")
    db.run(f"INSERT INTO osm_ways_stage VALUES {ROW3}")
    db.run(staged)
    db.run(staged)  # retry with the NULL-dated row: must update, not insert
    nulls = db.run("SELECT count(*) FROM osm_ways WHERE pgosm_date IS NULL")
    assert nulls == "1", f"scenario B NULL-date retry duplicated: {nulls} rows"
    print("scenario B (staged ON CONFLICT (way_id, pgosm_date) merge): "
          "executed, exactly-once verified incl. NULL-keyed retry")

    missing = EXPECTED - used
    assert not missing, f"real lane did not exercise goldens: {missing}"


def wire_lane(db):
    """Scenario D (r19, VERDICT r18 #3): the Spark->Postgres WRITE leg,
    executed for real over the raw v3 wire protocol (graft.plans.PgWire)
    — one connection per Spark partition, batched INSERTs, staged upsert
    twice — since the org.postgresql JDBC jar cannot exist in the
    zero-egress sandbox. Requires the compiled engine classes; runs the
    JVM directly against the Spark jars (no sbt round trip)."""
    m = re.search(r"port=(\d+)", db.dsn)
    if not m:
        print("scenario D (Spark wire write): SKIPPED — no TCP port in DSN")
        return
    port = m.group(1)
    classes = os.path.join(os.path.dirname(HERE), "target", "scala-2.13", "classes")
    if not os.path.isdir(classes):
        print("scenario D (Spark wire write): SKIPPED — engine classes not built (run sbt compile)")
        return
    db.run("DROP TABLE IF EXISTS osm_ways, osm_ways_stage")
    p = subprocess.run(
        ["java", "-cp", classes + ":/opt/spark/jars/*",
         "-Dderby.stream.error.file=/dev/null", "--add-exports",
         "java.base/sun.nio.ch=ALL-UNNAMED",
         "graft.plans.PgWireLoadCheck", "127.0.0.1", port, "graft", "postgres"],
        capture_output=True, text=True, timeout=300)
    line = next((l for l in p.stdout.splitlines() if l.startswith('{"job":"pgwire_load_check"')), None)
    if p.returncode != 0 or line is None:
        raise RuntimeError(
            f"scenario D failed (rc={p.returncode}):\n{p.stdout[-1500:]}\n{p.stderr[-1500:]}")
    rows = db.run("SELECT count(*) FROM osm_ways")
    assert rows == "300", f"scenario D expected 300 target rows, got {rows}"
    print(f"scenario D (Spark wire-protocol write, 4 partitions): executed — {line}")


def grammar_lane():
    files = sorted(os.path.join(GOLDEN, f) for f in os.listdir(GOLDEN)
                   if f.endswith(".sql"))
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "pg_grammar_check.py")] + files,
        capture_output=True, text=True)
    sys.stdout.write(p.stdout)
    sys.stderr.write(p.stderr)
    if p.returncode != 0:
        raise RuntimeError("grammar lane failed")


def main():
    present = {f for f in os.listdir(GOLDEN) if f.endswith(".sql")}
    if present != EXPECTED:
        print(f"golden inventory drift: on disk {sorted(present)}, "
              f"expected {sorted(EXPECTED)}", file=sys.stderr)
        return 1
    server = find_server()
    if server is None:
        print("mode=grammar (no Postgres server reachable or bootstrappable)")
        grammar_lane()
        return 0
    db, cleanup, desc = server
    try:
        print(f"mode=real ({desc}, {db.run('SELECT version()').split(',')[0]})")
        real_lane(db)
        wire_lane(db)
        return 0
    finally:
        cleanup()


if __name__ == "__main__":
    sys.exit(main())
