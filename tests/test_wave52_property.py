"""Property-based third opinion for the round-10 wave-52 twin.

`streaming_watermark_twin`: on generated multi-source document tables
the final keyed-state emission (real micro-batches through
applyInPandasWithState) must equal a pure-Python pooled recount — and,
by z-mergeability, the per-source z recomputed from summed counters
must equal pooling the per-doc stats in any arrival order.
"""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.corpus_ops import (
    WM_Z_KEEP_MICRO,
)

_SETTINGS = dict(
    max_examples=4,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = [f"w{i}" for i in range(20)]


def _green(prev: str, cur: str) -> bool:
    return hashlib.md5(f"{prev}|{cur}".encode()).hexdigest()[0] < "4"


def _write_docs(d, docs):
    # docs: (doc_id, text, source)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array([r[2] for r in docs], pa.string()),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in docs], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 99999),
            st.lists(st.sampled_from(_WORDS), max_size=12).map(
                " ".join
            ),
            st.sampled_from(["srcA", "srcB", "srcC"]),
        ),
        min_size=1,
        max_size=16,
        unique_by=lambda r: r[0],
    )
)
def test_watermark_twin_matches_pooled_recount(spark, docs):
    from realtimedatawarehouse_self_spark.plans.streaming_twins import (
        streaming_watermark_twin,
    )

    d = tempfile.mkdtemp(prefix="wmtwin")
    _write_docs(d, docs)
    got = {
        r["source"]: (
            r["n_docs"],
            r["scored"],
            r["green"],
            r["z_micro"],
            r["verdict"],
        )
        for r in streaming_watermark_twin(spark, d).collect()
    }
    pooled = {}
    for _did, text, src in docs:
        toks = [t for t in text.split(" ") if t]
        scored = max(len(toks) - 1, 0)
        green = sum(
            _green(toks[i - 1], toks[i]) for i in range(1, len(toks))
        )
        n, s, g = pooled.get(src, (0, 0, 0))
        pooled[src] = (n + 1, s + scored, g + green)
    want = {}
    for src, (n, s, g) in pooled.items():
        zm = (
            0
            if s == 0
            else math.floor((4 * g - s) / math.sqrt(3.0 * s) * 1_000_000)
        )
        want[src] = (
            n,
            s,
            g,
            zm,
            "watermarked" if zm >= WM_Z_KEEP_MICRO else "clean",
        )
    assert got == want
