"""Empty-input sweep: every registered query must execute (not crash) over
ZERO-ROW tables with the production schemas.

This is the boundary a 100 TB pipeline hits constantly — an empty
partition, a day with no events, a source that produced nothing — and
where div-by-zero, first()-on-empty, and seq(0, -1) bugs live. Queries may
legitimately return constant/empty frames; the invariant is no exception.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import TESTDATA

SRC = os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """Zero-row copies of every table, schemas identical to the testdata."""
    out = str(tmp_path_factory.mktemp("empty_sf"))
    from realtimedatawarehouse_self_spark.sources.tables import TABLES

    for t in TABLES:
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        df.limit(0).coalesce(1).write.parquet(os.path.join(out, f"{t}.parquet"))
    return out


def _all_names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


@pytest.mark.parametrize("name", _all_names())
def test_query_survives_empty_tables(spark, empty_sf, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, empty_sf)
    rows = df.collect()  # must not raise
    assert isinstance(rows, list)


def test_shuffle_skew_audit_empty_domain_shape(spark, empty_sf):
    """ADVICE r6: on an empty/all-NULL key domain the oracle's GROUP BY
    emits zero rows, while Spark's global agg used to emit one NULL-stats
    row per key column ('hash' fallthrough). The Spark side must now
    match the oracle's zero-row shape, not merely survive."""
    import __spark_entry__ as e

    df = e.queries()["shuffle_skew_audit"](spark, empty_sf)
    assert df.collect() == []
