"""File-format ingest: JSONL and CSV readers with dead-letter routing.

The reference's only raw-text ingress is JSON strings from Kafka topics
(``R/app/dwd/BaseLogApp.java:49-66`` parses with fastjson and routes
malformed rows to a ``dirty_data`` side output; MyKafkaUtil.java:139-148
declares the Maxwell topic as JSON DDL). A training-data pipeline ingests
the same shapes from files — JSONL shards and CSV exports — so this module
gives the log-ingest contract a file front door with identical dead-letter
semantics:

- **Schema is explicit, never inferred.** Inference reads the data twice
  and pins types to whatever the first shard contained — at 100 TB both
  are unacceptable. Callers pass a `StructType` (or DDL string).
- **text scan + `from_json`/`from_csv`**, the same parse path the Kafka
  envelope sources use (sources/envelopes.py): one codegen'd parse per
  line, and the raw line stays in hand so the dead-letter frame carries
  it VERBATIM for replay — the P1 "parse + dead-letter" pattern
  (BaseLogApp's dirty-data side output) rather than silently nulling
  (DROPMALFORMED) or failing the job on one bad shard (FAILFAST).
  Parsing from text also sidesteps Spark's restriction on querying only
  the internal corrupt-record column of a JSON/CSV file source (which
  otherwise forces a cache() — a non-starter at scale).
- Line-oriented by construction (`spark.read.text` splits at newlines):
  every record is one line, so a 1 TB shard splits at arbitrary byte
  offsets across executors. Multi-line JSON cannot split and is rejected
  here by design.
- Every DATA line lands in exactly one of the two frames, which are lazy
  filters over ONE parsed scan — no second pass; at 100 TB the dead
  frame is written next to the clean output for replay, never collected.
"""

from __future__ import annotations

import re
from typing import Tuple, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _as_schema(schema: Union[str, StructType]) -> StructType:
    return StructType.fromDDL(schema) if isinstance(schema, str) else schema


def _parse_split(
    lines: DataFrame, user: StructType, parser
) -> Tuple[DataFrame, DataFrame]:
    """Shared dead-letter contract for every reader in this module.

    ``parser(value_col, schema_with_corrupt)`` -> struct Column. One
    definition of the corrupt-capture schema, the accept predicate, and
    the (clean, dead) split, so the batch and streaming variants cannot
    drift (their equality is asserted in tests/test_files_source.py).
    """
    with_corrupt = StructType(list(user.fields)).add(CORRUPT_COL, "string")
    parsed = lines.withColumn("rec", parser(F.col("value"), with_corrupt))
    ok = F.col("rec").isNotNull() & F.col(f"rec.{CORRUPT_COL}").isNull()
    clean = parsed.filter(ok).select("rec.*").drop(CORRUPT_COL)
    dead = parsed.filter(~ok).select(F.col("value").alias("raw"))
    return clean, dead


def _json_parser(value: Column, schema: StructType) -> Column:
    return F.from_json(
        value,
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: Union[str, StructType]
) -> Tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON into (clean, dead_letter).

    clean: user-schema rows that parsed fully; dead_letter: one string
    column `raw` holding each malformed line verbatim (the reference's
    dirty-data side output, BaseLogApp.java:58-66). A line that is valid
    JSON but mismatches a field type is dead-lettered too — any corrupt
    capture counts as rejection, so `clean` holds only fully-typed rows.
    """
    return _parse_split(spark.read.text(path), _as_schema(schema), _json_parser)


def stream_jsonl(
    spark: SparkSession, path: str, schema: Union[str, StructType]
) -> Tuple[DataFrame, DataFrame]:
    """Streaming twin of `read_jsonl` (`readStream` text source): new
    shards dropped into `path` become micro-batches; the dead-letter
    split is byte-identical to the batch one because both run the same
    `_parse_split`. Trigger/maxFilesPerTrigger are the caller's concern."""
    return _parse_split(
        spark.readStream.text(path), _as_schema(schema), _json_parser
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Union[str, StructType],
    header: bool = True,
    sep: str = ",",
) -> Tuple[DataFrame, DataFrame]:
    """Read CSV into (clean, dead_letter) under the same contract as
    `read_jsonl`: explicit schema, per-line `from_csv` parse, malformed
    lines captured verbatim.

    Header semantics (`header=True`): the text source is line-oriented,
    so "first line of the file" is not well-defined under byte-offset
    splitting; instead any line whose trimmed fields equal the schema's
    column names is treated as a header and dropped (whitespace around
    fields tolerated). Two documented consequences of that contract:
    a DATA line spelled exactly like the header is dropped as a header —
    inherent CSV ambiguity; note it could only have been clean under an
    all-string schema, since under any typed column it would fail the
    parse anyway — and a header whose spelling deviates beyond
    whitespace (e.g. quoted names) is NOT recognized: it flows through
    the parse and lands in dead_letter, where replay tooling sees it —
    the explicit-schema contract treats an unrecognizable header as data
    it cannot type rather than guessing.
    """
    user = _as_schema(schema)
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        "sep": sep,
    }
    lines = spark.read.text(path)
    if header:
        names = F.array(*[F.lit(f.name) for f in user.fields])
        # F.split takes a REGEX: escape the separator or metacharacter
        # seps ('|', '.', '+') split per-character and header lines slip
        # through into the data path.
        split_trimmed = F.transform(
            F.split(F.col("value"), re.escape(sep)), lambda x: F.trim(x)
        )
        lines = lines.filter(split_trimmed != names)

    def parser(value: Column, with_corrupt: StructType) -> Column:
        return F.from_csv(value, with_corrupt.simpleString(), opts)

    return _parse_split(lines, user, parser)


def write_orc(df: DataFrame, path: str) -> None:
    """Columnar ORC export (S-family breadth: the second columnar format
    warehouses exchange besides parquet — Spark's reader supports the
    same predicate pushdown and column pruning, pinned in
    tests/test_layout_and_plans.py)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
