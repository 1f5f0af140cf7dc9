"""Native integral-id hosts: the motif engine must keep long ids
long (no string canonicalization) and produce the identical result
set as the stringified twin of the same graph."""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from grandiso_networkx_spark.graph import HostGraph
from grandiso_networkx_spark.operators.match import find_motifs, find_motifs_df
from grandiso_networkx_spark.plans.motif import Motif


EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (0, 3)]


def _hosts(spark):
    le = spark.createDataFrame(EDGES, "src long, dst long")
    se = le.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return (
        HostGraph(le, directed=True, hint_small=True),
        HostGraph(se, directed=True, hint_small=True),
    )


def _two_path():
    m = Motif(directed=True)
    m.add_edge("A", "B")
    m.add_edge("B", "C")
    return m


def test_integral_ids_stay_long(spark):
    lh, _ = _hosts(spark)
    assert lh.id_type == "long"
    df = find_motifs_df(_two_path(), lh)
    assert all(
        isinstance(f.dataType, T.LongType) for f in df.schema.fields
    ), df.schema
    assert isinstance(lh.degrees.schema["id"].dataType, T.LongType)


def test_long_host_matches_string_twin(spark):
    lh, sh = _hosts(spark)
    m = _two_path()
    got = {
        tuple(str(x) for x in r)
        for r in find_motifs_df(m, lh).collect()
    }
    want = {tuple(r) for r in find_motifs_df(m, sh).collect()}
    assert got == want and len(got) > 0


def test_int_width_normalized_to_long(spark):
    ie = spark.createDataFrame(EDGES, "src int, dst int")
    h = HostGraph(ie, directed=True, hint_small=True)
    assert h.id_type == "long"
    tri = Motif(directed=True)
    tri.add_edge("A", "B")
    tri.add_edge("B", "C")
    tri.add_edge("C", "A")
    # two directed 3-cycles (0-1-2, 2-3-4) x 3 rotations each
    assert find_motifs(tri, h, count_only=True) == 6


def test_hints_with_int_values(spark):
    lh, sh = _hosts(spark)
    m = _two_path()
    got = find_motifs(m, lh, hints=[{"A": 2}])
    want = find_motifs(m, sh, hints=[{"A": "2"}])
    assert {tuple(str(v) for v in d.values()) for d in got} == {
        tuple(d.values()) for d in want
    }
    assert len(got) > 0
    # complete hint short-circuits unverified, preserving the int type
    full = find_motifs(m, lh, hints=[{"A": 9, "B": 9, "C": 9}])
    assert full == [{"A": 9, "B": 9, "C": 9}]


def test_mixed_type_host_falls_back_to_string(spark):
    e = spark.createDataFrame(
        [("0", 1)], T.StructType([
            T.StructField("src", T.StringType()),
            T.StructField("dst", T.LongType()),
        ])
    )
    h = HostGraph(e, directed=True, hint_small=True)
    assert h.id_type == "string"


def test_isomorphisms_only_on_long_ids(spark):
    lh, sh = _hosts(spark)
    tri = Motif(directed=True)
    tri.add_edge("A", "B")
    tri.add_edge("B", "C")
    tri.add_edge("C", "A")
    nl = find_motifs(tri, lh, count_only=True, isomorphisms_only=True)
    ns = find_motifs(tri, sh, count_only=True, isomorphisms_only=True)
    assert nl == ns
