"""Shared per-loop driver-job counter (VERDICT r2 item 7): every
iterative operator's serial fraction is pinned by counting the Spark
jobs (materializations + collects alike) one call submits.

Job groups are unique per call — ``getJobIdsForGroup`` accumulates
over the session, so a reused name would count earlier tests' jobs.
"""

import itertools

_SEQ = itertools.count()


def jobs_during(spark, fn):
    """Run ``fn`` under a fresh job group; return how many Spark jobs
    it submitted from this thread."""
    sc = spark.sparkContext
    group = f"job-gate-{next(_SEQ)}"
    sc.setJobGroup(group, "counting")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))
