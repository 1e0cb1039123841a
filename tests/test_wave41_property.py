"""Property-based third opinions for the round-10 wave-41 operators.

Same discipline as test_wave22..40_property.py: hypothesis fixtures vs
pure-Python recounts independent of BOTH the Spark plans and the DuckDB
oracles.

- `robots_rule_eval`: RFC 9309 longest-match recount with plain string
  prefixes and an explicit (len, allow) sort — including the pin that an
  allow rule LONGER than a matching disallow overrides it, and that a
  doc whose host has no rules falls through to default-allow;
- `crawl_frontier_plan`: per-host (n_chars DESC, doc_id) rank and
  epoch-cut recount, plus the politeness invariant n_urls <= RATE per
  (host, epoch) and exact backlog horizon;
- `host_quality_shrinkage`: integer add-K shrinkage recount, plus the
  contraction property |shrunk - global| <= |mean - global| + 1 (the +1
  absorbs integer-floor asymmetry) — shrinkage must pull toward the
  corpus mean, never away.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.corpus_ops import (
    HOST_FETCH_RATE,
    ROBOTS_ALLOW_OVERRIDE_HEX,
    ROBOTS_ALLOW_PREFIX,
    ROBOTS_DISALLOW_SECTION_HEX,
    ROBOTS_SITE_BAN_HEX,
    SHRINK_PRIOR_DOCS,
)
from realtimedatawarehouse_self_spark.plans.curation import FT_WEIGHT_MOD

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = [f"w{i}" for i in range(12)]
# sources chosen so the derived hosts spread across all three rule gates
_SRCS = [f"s{i}" for i in range(8)]


def _write_docs(d: str, rows) -> None:
    # rows: (doc_id, text_or_None, source)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array([r[2] for r in rows]),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in rows], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def _host(source: str) -> str:
    return (source or "").lower() + ".example.com"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=99999),
        st.one_of(
            st.none(),
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=20).map(
                " ".join
            ),
        ),
        st.sampled_from(_SRCS),
    ),
    min_size=2,
    max_size=16,
    unique_by=lambda r: r[0],
)


def _rules_for(host: str):
    h = _md5(host)
    rules = []
    if h[0] in ROBOTS_DISALLOW_SECTION_HEX:
        rules.append(("/Articles", 0))
    if h[1] in ROBOTS_ALLOW_OVERRIDE_HEX:
        rules.append((ROBOTS_ALLOW_PREFIX, 1))
    if h[2] in ROBOTS_SITE_BAN_HEX:
        rules.append(("/", 0))
    return rules


def _robots_recount(rows):
    out = {}
    for doc_id, text, source in rows:
        if text is None:
            continue
        host = _host(source)
        path = f"/Articles/{doc_id}"
        matches = [
            (len(p), allow, p)
            for p, allow in _rules_for(host)
            if path.startswith(p)
        ]
        if not matches:
            out[doc_id] = (host, path, None, 0, "allow")
        else:
            ln, allow, p = max(matches)
            out[doc_id] = (
                host,
                path,
                p,
                ln,
                "allow" if allow == 1 else "disallow",
            )
    return out


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_robots_rule_eval_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        robots_rule_eval,
    )

    d = tempfile.mkdtemp(prefix="robotsprop")
    _write_docs(d, rows)
    got = {
        r["doc_id"]: (
            r["host"],
            r["path"],
            r["matched_prefix"],
            r["matched_len"],
            r["decision"],
        )
        for r in robots_rule_eval(spark, d).collect()
    }
    assert got == _robots_recount(rows)


def test_robots_longest_match_override_is_pinned(spark):
    """Deterministic fixture: find a source whose host carries BOTH the
    /Articles disallow and the longer /Articles/1 allow; a doc_id
    starting with '1' must come back 'allow' via the longer rule while a
    doc_id starting with '2' is disallowed — the RFC 9309 semantics the
    host-level blocklist cannot express."""
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        robots_rule_eval,
    )

    src = next(
        s
        for s in (f"t{i}" for i in range(2000))
        if _md5(_host(s))[0] in ROBOTS_DISALLOW_SECTION_HEX
        and _md5(_host(s))[1] in ROBOTS_ALLOW_OVERRIDE_HEX
        and _md5(_host(s))[2] not in ROBOTS_SITE_BAN_HEX
    )
    d = tempfile.mkdtemp(prefix="robotspin")
    _write_docs(d, [(19, "a b", src), (29, "a b", src)])
    got = {
        r["doc_id"]: (r["matched_prefix"], r["decision"])
        for r in robots_rule_eval(spark, d).collect()
    }
    assert got[19] == (ROBOTS_ALLOW_PREFIX, "allow")
    assert got[29] == ("/Articles", "disallow")


def _frontier_recount(rows):
    by_host = {}
    for doc_id, text, source in rows:
        if text is None:
            continue
        by_host.setdefault(_host(source), []).append(
            (len(text), doc_id)
        )
    out = {}
    for host, docs in by_host.items():
        docs.sort(key=lambda t: (-t[0], t[1]))
        horizon = (len(docs) - 1) // HOST_FETCH_RATE + 1
        for rank0, (n_chars, doc_id) in enumerate(docs):
            epoch = rank0 // HOST_FETCH_RATE
            key = (host, epoch)
            cur = out.get(key, (0, 0, doc_id, horizon))
            out[key] = (
                cur[0] + 1,
                cur[1] + n_chars,
                min(cur[2], doc_id),
                horizon,
            )
    return out


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_frontier_plan_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        crawl_frontier_plan,
    )

    d = tempfile.mkdtemp(prefix="frontierprop")
    _write_docs(d, rows)
    got = {
        (r["host"], r["fetch_epoch"]): (
            r["n_urls"],
            r["epoch_chars"],
            r["first_doc_id"],
            r["host_epochs"],
        )
        for r in crawl_frontier_plan(spark, d).collect()
    }
    want = _frontier_recount(rows)
    assert got == want
    # politeness invariant: no epoch batch exceeds the host rate
    assert all(n <= HOST_FETCH_RATE for n, _, _, _ in got.values())


def _score_milli(text: str) -> int:
    toks = [w for w in text.split(" ") if w != ""]
    s = sum(int(_md5(t)[:15], 16) % FT_WEIGHT_MOD for t in toks)
    return s // len(toks)


def _shrink_recount(rows):
    scored = [
        (_host(source), _score_milli(text))
        for _doc_id, text, source in rows
        if text is not None and [w for w in text.split(" ") if w != ""]
    ]
    if not scored:
        return {}
    gmean = sum(s for _, s in scored) // len(scored)
    by_host = {}
    for host, s in scored:
        n, tot = by_host.get(host, (0, 0))
        by_host[host] = (n + 1, tot + s)
    return {
        host: (
            n,
            tot // n,
            (tot + SHRINK_PRIOR_DOCS * gmean) // (n + SHRINK_PRIOR_DOCS),
            gmean,
        )
        for host, (n, tot) in by_host.items()
    }


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_host_shrinkage_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        host_quality_shrinkage,
    )

    d = tempfile.mkdtemp(prefix="shrinkprop")
    _write_docs(d, rows)
    got = {
        r["host"]: (
            r["n_docs"],
            r["mean_score_milli"],
            r["shrunk_score_milli"],
            r["global_mean_milli"],
        )
        for r in host_quality_shrinkage(spark, d).collect()
    }
    want = _shrink_recount(rows)
    assert got == want
    # contraction: shrinkage pulls toward the global mean, never away
    # (+1 tolerance absorbs the integer floor on both divisions)
    for n, mean, shrunk, gmean in got.values():
        assert abs(shrunk - gmean) <= abs(mean - gmean) + 1, got
