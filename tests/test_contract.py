"""Driver-contract regression guards: the two interop failures round 1
exposed (bench stdout-line truncation; silent registry-rotation typos)
must never recur."""

from __future__ import annotations

import json


def test_bench_summary_line_stays_small():
    """The external harness keeps only a bounded stdout tail (~3 kB); the
    one-line bench JSON must stay far below it no matter how many queries
    the registry grows."""
    import bench

    # worst case: every summary query present with a wide float
    fake = {k: 999.999 for k in bench.SUMMARY_QUERIES}
    line = json.dumps(
        {
            "metric": "headline_query_wall_time",
            "value": 9999.999,
            "unit": "sec",
            "queries": fake,
            "sf": 0.1,
        }
    )
    assert len(line) < 1500, f"summary line {len(line)}B risks tail truncation"
    # and the summary set itself must be registered queries
    from realtimedatawarehouse_self_spark import plans

    qs = plans.all_queries()
    missing = [k for k in bench.SUMMARY_QUERIES if k not in qs]
    assert missing == [], f"summary names not in registry: {missing}"
    missing_h = [k for k in bench.HEADLINE if k not in qs]
    assert missing_h == [], f"headline names not in registry: {missing_h}"


def test_registry_rotation_list_is_valid():
    """_VERIFY_FIRST drives which queries the external verifier re-proves;
    a typo silently drops a query from rotation (the _ordered() helper
    skips unknown names)."""
    from realtimedatawarehouse_self_spark import plans

    qs = plans.all_queries()
    oracles = plans.all_oracles()
    missing = [k for k in plans._VERIFY_FIRST if k not in qs]
    assert missing == [], f"rotation names not in registry: {missing}"
    # every registered query is oracle-gated (r4: approx_daily_users got a
    # deterministic oracle via its exact-companion columns)
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    # every query callable and oracle is non-trivially defined
    assert all(callable(v) for v in qs.values())
    assert all(isinstance(v, str) and "SELECT" in v.upper() for v in oracles.values())


def test_rotation_advances_coverage():
    """Rotation invariant (ADVICE r2/r3): each round's _VERIFY_FIRST must
    surface the queries the PREVIOUS driver rotation did NOT cover, so two
    consecutive rounds always cover the whole registry. Guards against
    re-proving the same 50 queries round after round (the r3 failure mode).
    Renamed/removed queries in the old record are ignored — they can't be
    in the registry anymore."""
    import glob
    import os

    from realtimedatawarehouse_self_spark import plans

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    records = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not records:  # fresh clone without driver artifacts
        return
    with open(records[-1]) as f:
        prev = set(json.load(f).keys())
    registry = set(plans.all_queries())
    rotation = plans._VERIFY_FIRST
    assert len(rotation) == len(set(rotation)), "duplicate rotation entries"
    uncovered = registry - prev
    missing = uncovered - set(rotation)
    assert missing == set(), (
        f"queries with no driver evidence since before {records[-1]} "
        f"are absent from _VERIFY_FIRST: {sorted(missing)}"
    )


def test_no_vacuous_queries_at_driver_scale(duck):
    """Every oracle must return at least one row at the driver's sf0.01 —
    a hash-match on two empty results is zero-information (the r3 failure
    mode: a streaming join whose predicate matched a nonexistent event
    type was 'green' for two rounds). DuckDB-only, so the sweep is cheap
    enough to run every session."""
    import os

    import __spark_entry__ as e

    from tests.conftest import TESTDATA
    from tests.oracle_harness import register_duckdb_views

    register_duckdb_views(duck, os.path.join(TESTDATA, "sf0.01"))
    empty = []
    for name, sql in e.oracle_sql().items():
        if duck.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0] == 0:
            empty.append(name)
    assert empty == [], f"vacuous at sf0.01: {empty}"
