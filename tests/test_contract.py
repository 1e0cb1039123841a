"""Driver-contract regression guards: the two interop failures round 1
exposed (bench stdout-line truncation; silent registry-rotation typos)
must never recur."""

from __future__ import annotations

import json
import re


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
    """Rotation invariant (ADVICE r2/r3, re-tightened per VERDICT r6 #2):
    the HEAD of _VERIFY_FIRST — the only part a ~50-query driver budget
    ever reaches — must consist of queries that have never received green
    driver evidence in ANY recorded round. A full ordering that merely
    *contains* the uncovered names somewhere satisfies nothing (the r6
    regression); this test is positional: the first
    min(DRIVER_BUDGET, |uncovered|) entries must all be uncovered.
    With full coverage (zero uncovered, the r8 state) the invariant
    extends to evidence *freshness* (VERDICT r8 #1): queries whose MOST
    RECENT driver record is a fail (the r3 loader-outage reds) must
    precede every query whose record already ends green, so no registry
    row's evidence trail ends on a red once the driver's budget reaches
    it. Renamed/removed queries in old records are ignored."""
    import glob
    import os

    from realtimedatawarehouse_self_spark import plans

    DRIVER_BUDGET = 50  # every round so far recorded exactly ~50 rows

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    records = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not records:  # fresh clone without driver artifacts
        return
    ever_green: set[str] = set()
    latest: dict[str, tuple[int, bool]] = {}
    for rec in records:
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", rec).group(1))
        with open(rec) as f:
            for name, row in json.load(f).items():
                ok = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") in (True, None)
                )
                if rnd >= latest.get(name, (0, False))[0]:
                    latest[name] = (rnd, ok)
                if ok:
                    ever_green.add(name)
    registry = set(plans.all_queries())
    rotation = plans._VERIFY_FIRST
    assert len(rotation) == len(set(rotation)), "duplicate rotation entries"
    uncovered = registry - ever_green
    missing = uncovered - set(rotation)
    assert missing == set(), (
        f"queries with no driver evidence in any record are absent from "
        f"_VERIFY_FIRST: {sorted(missing)}"
    )
    # positional: the head the driver will actually run must be uncovered
    n = min(DRIVER_BUDGET, len(uncovered))
    head = rotation[:n]
    stale_in_head = [q for q in head if q in ever_green]
    assert stale_in_head == [], (
        f"{len(stale_in_head)} already-driver-proven queries occupy the "
        f"rotation head while {len(uncovered)} queries still lack any "
        f"driver evidence: {stale_in_head}"
    )
    # freshness: red-latest queries (proven before, but newest record is
    # a fail) fill the budget remaining after the uncovered tier, ahead
    # of any query whose record already ends green.
    red_latest = {
        q
        for q, (_, ok) in latest.items()
        if not ok and q in registry and q in ever_green
    }
    m = min(DRIVER_BUDGET, len(uncovered) + len(red_latest))
    green_in_priority_head = [
        q
        for q in rotation[:m]
        if q in ever_green and q not in red_latest
    ]
    assert green_in_priority_head == [], (
        f"{len(green_in_priority_head)} green-record queries occupy the "
        f"rotation head while {len(red_latest)} queries' latest driver "
        f"record is still a fail: {green_in_priority_head}"
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


def test_documented_registry_count():
    """SURVEY.md / README.md must quote the live registry size — the judge
    cross-checks the documented count against len(all_queries()) and doc
    drift has now happened twice (r5: 230, r6: 232 vs actual 233)."""
    import os
    import re

    from realtimedatawarehouse_self_spark import plans

    n = len(plans.all_queries())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for doc, pattern in [
        ("SURVEY.md", r"\*\*(\d+) queries, all oracle-gated\*\*"),
        ("README.md", r"`plans/` — (\d+) queries"),
    ]:
        with open(os.path.join(repo, doc)) as f:
            ms = re.findall(pattern, f.read())
        assert ms, f"{doc}: registry-count sentence missing"
        # earlier matches are frozen round-history notes; the LAST is current
        assert int(ms[-1]) == n, f"{doc} says {ms[-1]}, registry has {n}"


def test_python_path_ascii_corpus_contract(duck):
    """Every python_path oracle (byte profile, frame sample, audio
    windows, resize) samples CHARACTERS via substr(text, ...) at offsets
    computed from octet_length (a BYTE count), while the Spark side
    samples raw UTF-8 payload bytes. The two agree iff the documents
    corpus is pure ASCII (byte index == char index and ascii(ch) == byte
    value) — ADVICE r7 asked for this shared contract to be asserted,
    not just claimed in comments. Checked at both parity SFs."""
    import os

    from tests.conftest import TESTDATA

    for sf in ["sf0.001", "sf0.01"]:
        path = os.path.join(TESTDATA, sf, "documents.parquet")
        non_ascii = duck.execute(
            f"SELECT count(*) FROM '{path}' "
            "WHERE octet_length(encode(text)) != length(text)"
        ).fetchone()[0]
        assert non_ascii == 0, (
            f"{sf}: {non_ascii} non-ASCII documents — the python_path "
            "char-indexed oracles no longer match the byte-indexed Spark "
            "side; re-derive those oracles over encode(text) or drop "
            "them to rows-only checks"
        )


def test_no_duplicate_query_names_across_modules():
    """Two plan modules registering the same query name silently shadow
    each other in all_queries()/all_oracles() (dict update order), which
    can pair one module's Spark query with the OTHER module's oracle —
    caught live in r10 when a second k_anonymity_audit landed in
    corpus_ops while experiment.py already owned the name."""
    from collections import Counter

    from realtimedatawarehouse_self_spark import plans

    for attr in ("QUERIES", "ORACLE"):
        names = Counter()
        for mod in plans._MODULES:
            names.update(getattr(mod, attr, {}).keys())
        dups = sorted(n for n, c in names.items() if c > 1)
        assert dups == [], f"{attr} names registered by >1 module: {dups}"


def test_doc_id_unique_contract_for_in_row_dedup(duck):
    """The r10 dedup-family optimization replaced the corpus-wide
    `.distinct()` on (doc_id, lang, sh) with an IN-ROW
    `explode(array_distinct(...))` (llm_ops._doc_shingles + the two
    inline copies in corpus_clean_pipeline / crawl_to_train_funnel).
    That rewrite is equivalent iff doc_id is the row identity of the
    documents table: duplicates of (doc_id, lang, sh) can then only
    arise WITHIN one row's shingle array. ADVICE r10 #3 asked for the
    contract to be asserted, not just claimed in comments: duplicate or
    repeated-NULL doc_id input is OUT OF CONTRACT for the dedup family
    (such data would silently diverge from the oracle's cross-row
    SELECT DISTINCT). Checked at both parity SFs."""
    import os

    from tests.conftest import TESTDATA

    for sf in ["sf0.001", "sf0.01"]:
        path = os.path.join(TESTDATA, sf, "documents.parquet")
        dup_or_null = duck.execute(
            f"SELECT (SELECT count(*) FROM '{path}' WHERE doc_id IS NULL),"
            f" (SELECT count(*) - count(DISTINCT doc_id) FROM '{path}')"
        ).fetchone()
        assert dup_or_null == (0, 0), (
            f"{sf}: doc_id nulls/dups {dup_or_null} — the dedup family's "
            "in-row array_distinct no longer matches the oracle's "
            "SELECT DISTINCT; restore the cross-row distinct for this "
            "corpus or re-key it"
        )
