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
- Both output frames are lazy filters over ONE parsed scan — no second
  pass; at 100 TB the dead frame is written next to the clean output for
  replay, never collected.
"""

from __future__ import annotations

from typing import Tuple, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _as_schema(schema: Union[str, StructType]) -> StructType:
    return StructType.fromDDL(schema) if isinstance(schema, str) else schema


def _split(parsed: DataFrame, ok: Column) -> Tuple[DataFrame, DataFrame]:
    clean = parsed.filter(ok).select("rec.*")
    dead = parsed.filter(~ok).select(F.col("value").alias("raw"))
    return clean, dead


def read_jsonl(
    spark: SparkSession, path: str, schema: Union[str, StructType]
) -> Tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON into (clean, dead_letter).

    clean: user-schema rows that parsed fully; dead_letter: one string
    column `raw` holding each malformed line verbatim (the reference's
    dirty-data side output, BaseLogApp.java:58-66). A line that is valid
    JSON but mismatches a field type is dead-lettered too: `from_json`
    in FAILFAST-per-row disguise — we parse PERMISSIVE with the corrupt
    capture field and treat any capture as rejection, so `clean` holds
    only fully-typed rows.
    """
    user = _as_schema(schema)
    with_corrupt = StructType(list(user.fields)).add(CORRUPT_COL, "string")
    parsed = spark.read.text(path).withColumn(
        "rec",
        F.from_json(
            "value",
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    ok = F.col("rec").isNotNull() & F.col(f"rec.{CORRUPT_COL}").isNull()
    clean, dead = _split(parsed, ok)
    return clean.drop(CORRUPT_COL), dead


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Union[str, StructType],
    header: bool = True,
    sep: str = ",",
) -> Tuple[DataFrame, DataFrame]:
    """Read CSV into (clean, dead_letter) under the same contract as
    `read_jsonl`: explicit schema, per-line `from_csv` parse, malformed
    lines captured verbatim. With `header=True` the header line is
    recognized by equality against the schema's column names and dropped
    (per file — the text source is line-oriented, so "first line" is not
    a well-defined concept under splitting; name-equality is)."""
    user = _as_schema(schema)
    with_corrupt = StructType(list(user.fields)).add(CORRUPT_COL, "string")
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        "sep": sep,
    }
    lines = spark.read.text(path)
    if header:
        header_line = sep.join(f.name for f in user.fields)
        lines = lines.filter(F.col("value") != F.lit(header_line))
    parsed = lines.withColumn(
        "rec", F.from_csv("value", with_corrupt.simpleString(), opts)
    )
    ok = F.col("rec").isNotNull() & F.col(f"rec.{CORRUPT_COL}").isNull()
    clean, dead = _split(parsed, ok)
    return clean.drop(CORRUPT_COL), dead


def stream_jsonl(
    spark: SparkSession, path: str, schema: Union[str, StructType]
) -> Tuple[DataFrame, DataFrame]:
    """Streaming twin of `read_jsonl` (`readStream` text source): new
    shards dropped into `path` become micro-batches; the dead-letter
    split is identical because both frames are lazy over the same parsed
    stream. Trigger/maxFilesPerTrigger are the caller's concern."""
    user = _as_schema(schema)
    with_corrupt = StructType(list(user.fields)).add(CORRUPT_COL, "string")
    parsed = spark.readStream.text(path).withColumn(
        "rec",
        F.from_json(
            "value",
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    ok = F.col("rec").isNotNull() & F.col(f"rec.{CORRUPT_COL}").isNull()
    clean, dead = _split(parsed, ok)
    return clean.drop(CORRUPT_COL), dead
