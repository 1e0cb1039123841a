"""Output-type contract: no HUGEINT/DECIMAL at any query's top level.

Root cause of the 9 round-5 driver hash-reds (VERDICT r5 #1): the external
driver's order-insensitive value-hash renders DuckDB HUGEINT / DECIMAL(38,0)
cells differently from plain BIGINT even when the integer values are
bit-identical, and Spark DecimalType cells likewise stringify differently
from LongType.  The in-repo comparator (tests/oracle_harness.py) normalizes
Python values and so never saw the divergence.  This suite teaches the repo
gate the driver's actual behavior — the third such divergence class in six
rounds (r3 timestamps, r1 stdout tail, r5 wide-integer rendering):

* every oracle's DESCRIBE must be free of HUGEINT / UHUGEINT / DECIMAL —
  i.e. every un-cast sum(BIGINT) or ``//`` in a final SELECT is a bug;
* every Spark query's top-level schema must be free of DecimalType
  (wide-decimal arithmetic stays INTERNAL; the output boundary is int64);
* neither side may emit DATE / TIMESTAMP at top level (the r3 class:
  DuckDB's fetchdf renders DATE as ``2024-01-01 00:00:00`` while Spark
  renders ``2024-01-01``) — day buckets are rendered as strings via
  ``date_format(d, 'yyyy-MM-dd')`` / ``strftime(d, '%Y-%m-%d')``.

Schema-only: DuckDB DESCRIBE plans without executing, and Spark's
`.schema` is resolved by the analyzer without running a job, so the whole
154-query sweep costs seconds.
"""

from __future__ import annotations

import pytest

from realtimedatawarehouse_self_spark import plans
from tests.conftest import SF_SMOKE
from tests.oracle_harness import register_duckdb_views

BANNED_DUCK = ("HUGEINT", "DECIMAL", "DATE", "TIMESTAMP")  # UHUGEINT contains HUGEINT


def _oracle_items():
    return sorted(plans.all_oracles().items())


def _query_items():
    return sorted(plans.all_queries().items())


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_describe_is_wide_integer_free(duck, name, sql):
    register_duckdb_views(duck, SF_SMOKE)
    rows = duck.execute(f"DESCRIBE ({sql})").fetchall()
    offenders = [
        (col, typ)
        for col, typ, *_ in rows
        if any(b in typ.upper() for b in BANNED_DUCK)
    ]
    assert not offenders, (
        f"oracle {name!r} emits driver-hash-unsafe top-level types "
        f"{offenders}; CAST the final SELECT to BIGINT (driver renders "
        f"HUGEINT/DECIMAL differently from BIGINT — r5 hash-red class)"
    )


def test_all_spark_schemas_are_decimal_and_temporal_free(spark):
    """One pass over every registered query: analyzer-only, no execution."""
    from pyspark.sql.types import (
        DateType,
        DecimalType,
        TimestampNTZType,
        TimestampType,
    )

    banned = (DecimalType, DateType, TimestampType, TimestampNTZType)
    offenders = {}
    for name, fn in _query_items():
        schema = fn(spark, SF_SMOKE).schema
        bad = [f.name for f in schema.fields if isinstance(f.dataType, banned)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"Spark queries emit top-level Decimal/Date/Timestamp columns "
        f"{offenders}; keep wide arithmetic internal, cast integers to "
        f"bigint, and render day buckets via date_format (r5 + r3 "
        f"hash-red classes)"
    )
