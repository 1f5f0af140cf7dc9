"""The fused-bundle canonicalization contract: _canon_spark (runtime
Spark schema) and _canon_sql (static fused_spec kinds) must produce the
same (part, k, v) multiset for the same relation — including NULL keys,
NULL values, booleans, and multi-float rows.  The driver's CORRECTNESS
gate rests on this equivalence."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as em


@pytest.fixture(scope="module")
def frames(spark):
    rows = [
        (1, "a", True, 0.5, None),
        (2, None, False, None, 2.25),
        (None, "x|y", None, -1.0, 3.5),  # '|' inside a key value
    ]
    sdf = spark.createDataFrame(
        rows, "id long, name string, flag boolean, score double, other double"
    )
    pdf = pd.DataFrame(
        rows, columns=["id", "name", "flag", "score", "other"]
    ).astype({"id": "Int64", "flag": "object"})
    return sdf, pdf


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    df["v"] = df["v"].astype("float64").round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_canon_spark_matches_canon_sql(spark, frames):
    sdf, pdf = frames
    tag = "probe"
    # register the synthetic spec for the probe relation
    from grandiso_networkx_spark.fused_spec import SPEC

    SPEC[tag] = [
        ("id", "k"), ("name", "k"), ("flag", "k"),
        ("score", "f"), ("other", "f"),
    ]
    try:
        got = _normalize(em._canon_spark(sdf, tag).toPandas())
        con = duckdb.connect()
        con.register("probe_rel", pdf)
        sql = em._canon_sql(tag, "SELECT * FROM probe_rel")
        want = _normalize(con.execute(sql).df())
    finally:
        del SPEC[tag]
    assert list(got.columns) == ["k", "part", "v"]
    # 3 input rows x 2 float cols = 6 canonical rows
    assert len(got) == 6 and len(want) == 6
    pd.testing.assert_frame_equal(got, want)
    # NULL keys hit the sentinel on both sides
    assert got["k"].str.contains("~null~").any()


def test_canon_spark_no_float_cols(spark):
    sdf = spark.createDataFrame([(1, "a"), (2, None)], "id long, name string")
    out = em._canon_spark(sdf, "t").toPandas()
    assert sorted(out["k"]) == ["1|a", "2|~null~"]
    assert (out["v"] == 0.0).all() and (out["part"] == "t").all()


def test_fused_spec_covers_every_oracled_query():
    """Every member of every value-checked bundle must have a spec
    entry and a standalone oracle; rows-only bundle members must have
    a standalone query.  Guards registry edits against silently
    breaking a bundle's composed oracle."""
    from grandiso_networkx_spark.fused_spec import SPEC

    sq = em._standalone_queries()
    so = em._standalone_oracles()
    for tag, parts in em._FUSED_BUNDLES.items():
        for p in parts:
            assert p in sq, f"{tag}: {p} has no standalone query"
            assert p in so, f"{tag}: {p} has no standalone oracle"
            assert p in SPEC, f"{tag}: {p} has no fused_spec entry"
            spec_cols = [c for c, _ in SPEC[p]]
            assert len(spec_cols) == len(set(spec_cols))
    for tag, parts in em._FUSED_ROWS_ONLY.items():
        for p in parts:
            assert p in sq, f"{tag}: {p} has no standalone query"


def test_first_50_cover_all_standalone_queries():
    """The driver records CORRECTNESS rows for the first 50 keys only;
    every standalone query must be reachable from those slots."""
    q = em.queries()
    first50 = list(q.keys())[:50]
    covered = set()
    for key in first50:
        if key in em._FUSED_BUNDLES:
            covered |= set(em._FUSED_BUNDLES[key])
        elif key in em._FUSED_ROWS_ONLY:
            covered |= set(em._FUSED_ROWS_ONLY[key])
        else:
            covered.add(key)
    missing = set(em._standalone_queries()) - covered
    assert not missing, f"queries outside the driver's 50-row window: {missing}"
