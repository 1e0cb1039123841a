"""realtimedatawarehouse_self_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference real-time data-warehouse project
(``zdasfa4523/realTimeDataWarehouse_Self``, surveyed in ``SURVEY.md``):

- layered streaming warehouse semantics (ODS -> DWD -> DIM -> DWS) expressed
  as Structured Streaming pipelines with batch twins that share the same
  column expressions (so a DuckDB oracle can validate semantics);
- config-table-driven dynamic routing (the reference's signature feature);
- keyed-state dedup/enrichment operators (new/old visitor repair, daily-UV
  dedup, 7-day returning users, first-row-per-key) as stateful streaming
  processors plus window-function batch twins;
- watermarked tumbling-window aggregations with window-boundary stamping;
- multi-way stream joins (inner / left-outer / lookup) re-planned as
  Catalyst-optimized DataFrame joins with broadcast dimension sides;
- large-scale training-data pipeline operators: exact/MinHash-LSH/SimHash/
  n-gram-Jaccard dedup, embedding similarity search (brute-force + bucketed),
  text quality analysis, language id, document fingerprinting, and
  multimodal (binary column) plumbing.

Design rules (see SURVEY.md section 7):
- DataFrame/SQL first; Catalyst plans everything; no hand-scheduling.
- UDFs only where built-ins genuinely cannot express the semantics, and then
  Arrow-batched (pandas) UDFs, never row-at-a-time.
- Every operator is written for 100 TB scale: broadcast small dims, push
  filters to the scan, keep expressions inside whole-stage codegen, avoid
  driver-side collects.
"""

__version__ = "0.1.0"

from realtimedatawarehouse_self_spark.session import get_spark  # noqa: F401
