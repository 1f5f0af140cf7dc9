"""The unrolled/capped DuckDB oracles must POISON their result (an
'ORACLE_CAP_EXCEEDED' row) when their round/depth cap is too small,
instead of silently emitting truncated rows that would read as an
engine bug (ADVICE r2 item 3).  Pure DuckDB — no Spark session.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def _poisoned(df) -> bool:
    return df.astype(str).apply(
        lambda col: col.str.contains("ORACLE_CAP_EXCEEDED").any()
    ).any()


def test_matching_guard_fires_when_cap_too_small(con):
    # rounds=1 cannot finish the handshake matching on the sf graph
    df = con.execute(entry._matching_sql(rounds=1)).df()
    assert _poisoned(df)


def test_matching_guard_silent_at_validated_cap(con):
    df = con.execute(entry._matching_sql(rounds=4)).df()
    assert not _poisoned(df)


def test_mis_guard_fires_when_cap_too_small():
    """On a 32-vertex path graph Luby needs several rounds; rounds=1
    must leave a live residual and poison.  (The sf0.001 reply graph
    converges in one round, so this case builds its own events view
    whose reply graph is the path t00->t01->...->t31.)"""
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW events AS "
        "SELECT CAST(i AS BIGINT) AS event_id, "
        "TIMESTAMP '2024-01-01' + INTERVAL (i) SECOND AS ts, "
        "CAST(1 AS BIGINT) AS user_id, "
        "'t' || lpad(CAST(i AS VARCHAR), 2, '0') AS event_type, "
        "1.0 AS value, '' AS props "
        "FROM (SELECT UNNEST(generate_series(0, 31)) AS i)"
    )
    df = c.execute(entry._mis_sql(rounds=1)).df()
    assert _poisoned(df)


def test_mis_guard_silent_at_validated_cap(con):
    df = con.execute(entry._mis_sql(rounds=6)).df()
    assert not _poisoned(df)


def test_onion_guard_fires_when_kmax_too_small(con):
    # kmax=1 cannot exhaust a graph whose max core >= 1 (phase 1 only
    # peels degree-0; any surviving edge leaves a residual)
    df = con.execute(entry._onion_sql(kmax=1, rounds=1)).df()
    assert _poisoned(df)


def test_onion_guard_silent_at_validated_cap(con):
    df = con.execute(entry._onion_sql(6, 6)).df()
    assert not _poisoned(df)


def test_core_number_guard_fires_when_kmax_too_small(con):
    # kmax=1 with a sentinel 2-core still present on the sf graph
    df = con.execute(entry._core_number_sql(kmax=1, rounds=1)).df()
    assert _poisoned(df)


def test_core_number_guard_silent_at_validated_cap(con):
    df = con.execute(entry._core_number_sql(5, 6)).df()
    assert not _poisoned(df)


def test_ktruss_guard_silent_at_validated_cap(con):
    df = con.execute(entry._ktruss_sql(3, 5)).df()
    assert not _poisoned(df)


def test_ktruss_guard_fires_at_depth_one():
    """rounds=1 must poison whenever round 1 removes anything — with
    no later round, the fixpoint is unproven.  Graph: a triangle plus
    a pendant chain whose edges all drop in round 1."""
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW events AS "
        "SELECT CAST(i AS BIGINT) AS event_id, "
        "TIMESTAMP '2024-01-01' + INTERVAL (i) SECOND AS ts, "
        "CAST(1 AS BIGINT) AS user_id, e AS event_type, "
        "1.0 AS value, '' AS props FROM (VALUES "
        "(0,'t0'),(1,'t1'),(2,'t2'),(3,'t0'),(4,'t2'),(5,'t3'),(6,'t4'),"
        "(7,'t5'),(8,'t6')) v(i, e)"
    )
    df = c.execute(entry._ktruss_sql(3, rounds=1)).df()
    assert _poisoned(df)


def test_landmark_and_double_sweep_guard_silent(con):
    for sql in (entry._LANDMARK_SQL, entry._DOUBLE_SWEEP_SQL):
        assert not _poisoned(con.execute(sql).df())


def test_landmark_guard_fires_at_depth_one():
    """A cap of 1 on the landmark BFS must poison (min-dist hits the
    cap on any graph with a 2-hop path)."""
    capped = entry._LANDMARK_SQL.replace("w.dist < 10", "w.dist < 1").replace(
        "d >= 10", "d >= 1"
    )
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    assert _poisoned(c.execute(capped).df())
