import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tiny-fixture test profile: single shuffle partition, no codegen, no
# AQE, no broadcast — per-stage overhead dominates on 10-node graphs and
# this cuts a motif query from ~20s to ~2s.  Production defaults
# (session.get_spark) keep AQE/codegen/broadcast on.
os.environ.setdefault("GISPARK_BROADCAST_SMALL", "0")

from grandiso_networkx_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=1,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.codegen.wholeStage": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.default.parallelism": "4",
        },
    )
    yield s
    s.stop()
