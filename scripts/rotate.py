#!/usr/bin/env python3
"""Recompute the driver-verification rotation head mechanically.

The external driver verifies queries in registry order and stops at a
budget (~50 rows per round so far). Every round the CORRECTNESS_r{N}.json
record lands AFTER the builder's final commit, so the rotation in
`plans/__init__.py::_VERIFY_FIRST` is one round stale at round open —
this script is the first-commit mechanical fix (VERDICT r7 "Next round"
item #2): it recomputes the FULL ordering from the recorded evidence and
rewrites the list in place.

Ordering policy (matches the tripwire
`tests/test_contract.py::test_rotation_advances_coverage`):

1. Queries with NO green driver evidence in ANY CORRECTNESS_r*.json —
   these head the rotation so the driver's budget always buys new
   coverage. Among themselves they keep their current rotation order
   (new waves are appended there on arrival).
2. Queries whose MOST RECENT driver record is a fail (e.g. the r3
   loader-outage reds): the evidence trail must not end on a red
   (VERDICT r8 #1).
3. Everything else stalest-first: ascending by the LAST round that
   proved the query green. The reference-parity CORE queries
   (SURVEY.md §2: the dws/dwd windows, sessionize, visitor repair,
   funnel, SCD2, the r2 streaming twins) win ties at EQUAL staleness
   (VERDICT r7 "Next round" #3, as stated: equal staleness only — a
   core row proven green in the latest recorded round must not starve
   the r1/r2-stale tail, which was the r8→r9 policy refinement).
   Remaining ties break by current rotation order.

Usage:  python scripts/rotate.py          # rewrite plans/__init__.py
        python scripts/rotate.py --check  # exit 1 if a rewrite is needed
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT = os.path.join(
    REPO, "realtimedatawarehouse_self_spark", "plans", "__init__.py"
)

# Reference-parity core (SURVEY.md §2): re-proving these carries the
# reference's own query semantics, so they outrank equally-stale rows.
_CORE = {
    "dws02_traffic_page_view_window",
    "dws03_home_detail_uv_window",
    "dws04_user_login_window",
    "dws05_user_register_window",
    "dws06_cart_add_uu_window",
    "dws09_trade_sku_order_window",
    "dwd_trade_order_detail",
    "dwd_cart_add",
    "sessionize_events",
    "visitor_repair_batch",
    "funnel_conversion",
    "scd2_user_value",
    "streaming_pv_hourly",
    "streaming_uv_daily",
    "streaming_session_windows",
    "keyword_page_view",
    "baselog_stream_split",
    "dim_config_routing",
}


def _evidence() -> tuple[dict[str, int], set[str]]:
    """Returns (last_green: name -> highest green round,
    red_latest: names whose MOST RECENT driver record is a fail).

    red_latest is the VERDICT r8 "record ends on a red" set: a query that
    passed in some round but whose newest record (e.g. the r3 loader
    outage) is a fail. The code is parity-green in-repo; the *evidence*
    should not end on a red, so these outrank everything already proven.
    """
    last_green: dict[str, int] = {}
    latest: dict[str, tuple[int, bool]] = {}
    for rec in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", rec)
        rnd = int(m.group(1))
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
                    last_green[name] = max(last_green.get(name, 0), rnd)
    red_latest = {q for q, (_, ok) in latest.items() if not ok}
    return last_green, red_latest


def _green_rounds() -> dict[str, int]:
    """name -> highest round number whose record proved it green."""
    return _evidence()[0]


def compute_order() -> list[str]:
    sys.path.insert(0, REPO)
    from realtimedatawarehouse_self_spark import plans

    registry = list(plans.all_queries())
    current = plans._VERIFY_FIRST
    pos = {q: i for i, q in enumerate(current)}
    last, red_latest = _evidence()

    def key(q: str):
        # tier 0: never-proven (head); tier 1: latest driver record is a
        # red (clear these so no query's record ends on a fail — VERDICT
        # r8 #1); tier 2: everything else, stalest-first by last green
        # round. Reference-parity CORE rows win ties at EQUAL staleness
        # (the r7 #3 policy as stated: core outranks generic rows *of
        # equal staleness*) but do not jump ahead of much-staler generic
        # rows — a core row proven green in the latest recorded round
        # must not eat a budget slot that an r1/r2-stale row needs
        # (r9 refinement: the previous tier form re-proved all 16
        # just-green core rows every round, starving the stale tail).
        if q not in last:
            tier = 0
        elif q in red_latest:
            tier = 1
        else:
            tier = 2
        return (
            tier,
            last.get(q, 0),
            0 if q in _CORE else 1,
            pos.get(q, len(current)),
            q,
        )

    return sorted(registry, key=key)


def rewrite(order: list[str], check: bool = False) -> bool:
    with open(INIT) as f:
        src = f.read()
    body = "".join(f'    "{q}",\n' for q in order)
    new = re.sub(
        r"_VERIFY_FIRST = \[\n(?:    \"[^\"]+\",\n)+\]",
        "_VERIFY_FIRST = [\n" + body + "]",
        src,
        count=1,
    )
    changed = new != src
    if changed and not check:
        with open(INIT, "w") as f:
            f.write(new)
    return changed


def main() -> int:
    check = "--check" in sys.argv
    order = compute_order()
    last = _green_rounds()
    uncovered = [q for q in order if q not in last]
    changed = rewrite(order, check=check)
    print(
        f"registry={len(order)} never-proven={len(uncovered)} "
        f"head={order[:5]}..."
    )
    if check:
        print("rotation", "STALE (rewrite needed)" if changed else "current")
        return 1 if changed else 0
    print("rotation", "rewritten" if changed else "already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
