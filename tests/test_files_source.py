"""File ingest (sources/files.py): JSONL/CSV dead-letter contract.

Mirrors the reference's dirty-data side output (BaseLogApp.java:58-66):
every input line lands in exactly one of (clean, dead), malformed lines
are preserved VERBATIM for replay, and the streaming twin produces the
identical split.
"""

from __future__ import annotations

import pytest

from realtimedatawarehouse_self_spark.sources.files import (
    read_csv,
    read_jsonl,
    stream_jsonl,
)

SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING"

GOOD = [
    '{"event_id": 1, "user_id": 10, "event_type": "view"}',
    '{"event_id": 2, "user_id": 11, "event_type": "click"}',
]
BAD_SYNTAX = '{"event_id": 3, "user_id": '  # truncated JSON
BAD_TYPE = '{"event_id": "not-a-number", "user_id": 12, "event_type": "view"}'


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_jsonl_clean_and_dead_partition(spark, tmp_path):
    p = _write(tmp_path / "in.jsonl", GOOD + [BAD_SYNTAX, BAD_TYPE])
    clean, dead = read_jsonl(spark, p, SCHEMA)
    rows = sorted(tuple(r) for r in clean.collect())
    assert rows == [(1, 10, "view"), (2, 11, "click")]
    assert clean.columns == ["event_id", "user_id", "event_type"]
    raws = sorted(r.raw for r in dead.collect())
    # malformed lines preserved verbatim, both syntax and type failures
    assert raws == sorted([BAD_SYNTAX, BAD_TYPE])


def test_jsonl_every_line_lands_exactly_once(spark, tmp_path):
    lines = GOOD + [BAD_SYNTAX, BAD_TYPE] + GOOD
    p = _write(tmp_path / "in2.jsonl", lines)
    clean, dead = read_jsonl(spark, p, SCHEMA)
    assert clean.count() + dead.count() == len(lines)


def test_csv_header_and_dead_letter(spark, tmp_path):
    p = _write(
        tmp_path / "in.csv",
        [
            "event_id,user_id,event_type",
            "1,10,view",
            "2,11,click",
            "boom,12,view",  # bigint parse failure
        ],
    )
    clean, dead = read_csv(spark, p, SCHEMA, header=True)
    rows = sorted(tuple(r) for r in clean.collect())
    assert rows == [(1, 10, "view"), (2, 11, "click")]
    assert [r.raw for r in dead.collect()] == ["boom,12,view"]


def test_csv_whitespace_tolerant_header(spark, tmp_path):
    p = _write(
        tmp_path / "ws.csv",
        ["event_id, user_id, event_type", "7,70,view"],
    )
    clean, dead = read_csv(spark, p, SCHEMA, header=True)
    assert [tuple(r) for r in clean.collect()] == [(7, 70, "view")]
    assert dead.count() == 0


def test_csv_regex_metachar_separator(spark, tmp_path):
    # '|' is a regex metacharacter: header detection must treat the
    # separator literally or the header slips into the data path.
    p = _write(tmp_path / "pipe.csv", ["event_id|user_id|event_type", "9|90|view"])
    clean, dead = read_csv(spark, p, SCHEMA, header=True, sep="|")
    assert [tuple(r) for r in clean.collect()] == [(9, 90, "view")]
    assert dead.count() == 0


def test_csv_no_header(spark, tmp_path):
    p = _write(tmp_path / "nh.csv", ["5,50,view"])
    clean, dead = read_csv(spark, p, SCHEMA, header=False)
    assert [tuple(r) for r in clean.collect()] == [(5, 50, "view")]
    assert dead.count() == 0


def test_stream_jsonl_matches_batch_split(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    _write(src / "shard-0.jsonl", GOOD)
    _write(src / "shard-1.jsonl", [BAD_SYNTAX, GOOD[0]])
    clean, dead = stream_jsonl(spark, str(src), SCHEMA)
    assert clean.isStreaming and dead.isStreaming
    for df, view in ((clean, "files_clean"), (dead, "files_dead")):
        q = (
            df.writeStream.format("memory")
            .queryName(view)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", str(tmp_path / f"cp_{view}")
            )
            .start()
        )
        assert q.awaitTermination(60), 'stream did not finish in 60s'
    got_clean = sorted(
        tuple(r) for r in spark.table("files_clean").collect()
    )
    assert got_clean == [(1, 10, "view"), (1, 10, "view"), (2, 11, "click")]
    assert [r.raw for r in spark.table("files_dead").collect()] == [BAD_SYNTAX]
