"""Entity-resolution (record-linkage / MDM) operators over the part
catalog — the STRUCTURED-record sibling of the document dedup family
(which matches free text): candidate blocking, multi-field match
scoring, and golden-record survivorship with attribute consolidation.

- `entity_match_parts` — MULTI-PASS blocked candidate generation + exact
  verify, reported per block (the audit a matching run inspects before
  trusting its blocking keys). The match rule is
  |size diff| <= ENT_SIZE_DIFF AND (adj equal OR brand equal), so two
  blocking passes — (noun, size-bucket, adj) and (noun, size-bucket,
  brand) — are JOINTLY lossless: every matching pair satisfies one
  equality and, because buckets are wider than the size tolerance, sits
  in the probe's same-or-adjacent bucket. The probe side explodes into
  its 3 neighboring buckets while the build side keeps its own, and the
  two passes' union is deduped before the (pure size) verification.
- `entity_golden_record` — survivorship over exact-name clusters: elect
  the lowest-key member, consolidate brand by frequency (ties broken
  lexicographically), report the size spread the duplicates disagree on.

Scale notes: candidate volume is bounded per (noun, size-bucket) cell —
cells per part <= 3, pairs per cell <= |cell|^2 — the same bounded-
blocking doctrine as the dedup family's LSH bands / df-caps, here with a
NUMERIC-proximity key (adjacent-bucket explode) that bands and caps
cannot express. Verification is pure integer compares fused into the
join stage; every output is a per-block or per-cluster aggregate, so
result size is bounded by the key domain, never by pair volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table

ENT_SIZE_BUCKET = 5  # blocking bucket width in p_size units
ENT_SIZE_DIFF = 3  # match requires |size_a - size_b| <= 3 (< bucket width)


def _parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").isNotNull() & F.col("p_size").isNotNull())
        .select(
            F.col("p_partkey").alias("k"),
            F.element_at(F.split("p_name", " "), 1).alias("adj"),
            F.element_at(F.split("p_name", " "), -1).alias("noun"),
            "p_name",
            F.col("p_brand").alias("brand"),
            F.col("p_size").cast("bigint").alias("size"),
            "p_retailprice",
        )
    )


def entity_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = _parts(spark, sf_dir)

    # COLLAPSE-THEN-MATCH: records are first grouped to their distinct
    # attribute tuple (adj, noun, brand, size) with multiplicity m — at
    # catalog scale duplicate multiplicity is what explodes a pairwise
    # matcher quadratically (measured: the row-level pairwise form did
    # not finish a 10x-replica stress; this form is near-constant there,
    # because the REP count is bounded by the attribute-combination
    # domain, not the row count). Pair counts stay EXACT by combinatorics:
    # two distinct reps contribute m1*m2 unordered pairs, one rep
    # contributes C(m,2) internal pairs (identical records always match).
    reps = parts.groupBy("adj", "noun", "brand", "size").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )

    # MULTI-PASS blocking at the REP level: the cross-rep rule is
    # (adj = adj2 OR brand = brand2), so passes on (noun, bucket, adj)
    # and (noun, bucket, brand) are jointly lossless. r11
    # (guide §2.4 "remove shuffles outright"): the two passes' union used
    # to be deduped with a PAIR-VOLUME `.distinct()` exchange before
    # counting; inclusion–exclusion replaces it with a third pass keyed on
    # BOTH equalities and pure count arithmetic, |A ∪ B| = |A| + |B| −
    # |A ∩ B|. Within one pass each unordered rep pair appears at most
    # once (the strict struct total order picks one orientation, and the
    # probe's 3-bucket explode meets the build bucket at exactly one b),
    # so per-noun: pairs-matched-by-adj + pairs-matched-by-brand − pairs-
    # matched-by-both counts every (adj = OR brand =) pair exactly once —
    # the former distinct's semantics as a sum. Each pass now flows into a
    # signed per-noun partial aggregate (map-side combine), so no
    # pair-volume row set ever crosses an exchange.
    def _pass_counts(keys: list[str], sign: int) -> DataFrame:
        probe = reps.select(
            "adj",
            "noun",
            "brand",
            "size",
            "m",
            *[F.col(k).alias(f"bk{i}") for i, k in enumerate(keys)],
            F.explode(
                F.expr(
                    f"sequence(size div {ENT_SIZE_BUCKET} - 1,"
                    f" size div {ENT_SIZE_BUCKET} + 1)"
                )
            ).alias("b"),
        )
        build = reps.select(
            F.col("adj").alias("adj2"),
            "noun",
            F.col("brand").alias("brand2"),
            F.col("size").alias("size2"),
            F.col("m").alias("m2"),
            *[F.col(k).alias(f"bk{i}") for i, k in enumerate(keys)],
            F.expr(f"size div {ENT_SIZE_BUCKET}").alias("b"),
        )
        return (
            probe.join(
                build, ["noun", *[f"bk{i}" for i in range(len(keys))], "b"]
            )
            .filter(
                F.expr(
                    "struct(adj, brand, size) < struct(adj2, brand2, size2)"
                )
            )
            .groupBy("noun")
            .agg(
                F.sum(F.expr(f"{sign} * m * m2"))
                .cast("bigint")
                .alias("cand_cross"),
                F.sum(
                    F.expr(
                        f"CASE WHEN abs(size - size2) <= {ENT_SIZE_DIFF}"
                        f" THEN {sign} * m * m2 ELSE 0 END"
                    )
                )
                .cast("bigint")
                .alias("matched_cross"),
            )
        )

    # int64 headroom: pair counts are inherently quadratic in duplicate
    # multiplicity — m1*m2 (and the per-noun sums) stay within int64 up
    # to ~4.3e9 records of a single attribute tuple, far beyond any real
    # catalog; DuckDB errors on overflow natively, so a breach cannot
    # pass the gate silently.
    cross_counts = (
        _pass_counts(["adj"], 1)
        .unionByName(_pass_counts(["brand"], 1))
        .unionByName(_pass_counts(["adj", "brand"], -1))
        .groupBy("noun")
        .agg(
            F.sum("cand_cross").cast("bigint").alias("cand_cross"),
            F.sum("matched_cross").cast("bigint").alias("matched_cross"),
        )
    )
    within = reps.groupBy("noun").agg(
        F.sum(F.expr("m * (m - 1) div 2")).cast("bigint").alias("within_pairs")
    )
    per_block = (
        within.join(cross_counts, "noun", "left")
        .select(
            "noun",
            (
                F.coalesce("cand_cross", F.lit(0)) + F.col("within_pairs")
            ).cast("bigint").alias("cand_pairs"),
            (
                F.coalesce("matched_cross", F.lit(0)) + F.col("within_pairs")
            ).cast("bigint").alias("matched_pairs"),
        )
    )
    sizes = parts.groupBy("noun").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    return (
        sizes.join(per_block, "noun", "left")
        .select(
            "noun",
            "n_parts",
            F.coalesce("cand_pairs", F.lit(0)).cast("bigint").alias(
                "cand_pairs"
            ),
            F.coalesce("matched_pairs", F.lit(0)).cast("bigint").alias(
                "matched_pairs"
            ),
        )
        .withColumn(
            "match_ppm",
            F.expr(
                "CASE WHEN cand_pairs = 0 THEN 0"
                " ELSE CAST(matched_pairs * 1000000 div cand_pairs AS BIGINT)"
                " END"
            ),
        )
    )


_ENTITY_MATCH_SQL = f"""
WITH parts AS (
    SELECT p_partkey AS k,
           string_split(p_name, ' ')[1] AS adj,
           string_split(p_name, ' ')[-1] AS noun,
           p_brand AS brand, CAST(p_size AS BIGINT) AS size
    FROM part WHERE p_name IS NOT NULL AND p_size IS NOT NULL
),
probe AS (
    SELECT k, adj, noun, brand, size,
           size // {ENT_SIZE_BUCKET} + d AS b
    FROM parts, UNNEST([-1, 0, 1]) AS u(d)
),
build AS (
    SELECT k AS k2, adj AS adj2, noun, brand AS brand2, size AS size2,
           size // {ENT_SIZE_BUCKET} AS b
    FROM parts
),
cand AS (
    SELECT p.noun, p.k, b2.k2, p.size, b2.size2
    FROM probe p JOIN build b2
      ON p.noun = b2.noun AND p.adj = b2.adj2 AND p.b = b2.b
    WHERE p.k < b2.k2
    UNION
    SELECT p.noun, p.k, b2.k2, p.size, b2.size2
    FROM probe p JOIN build b2
      ON p.noun = b2.noun AND p.brand = b2.brand2 AND p.b = b2.b
    WHERE p.k < b2.k2
),
scored AS (
    SELECT noun,
           CASE WHEN abs(size - size2) <= {ENT_SIZE_DIFF}
                THEN 1 ELSE 0 END AS matched
    FROM cand
),
per_block AS (
    SELECT noun, CAST(count(*) AS BIGINT) AS cand_pairs,
           CAST(sum(matched) AS BIGINT) AS matched_pairs
    FROM scored GROUP BY 1
),
sizes AS (
    SELECT noun, CAST(count(*) AS BIGINT) AS n_parts FROM parts GROUP BY 1
)
SELECT s.noun, s.n_parts,
       CAST(coalesce(p.cand_pairs, 0) AS BIGINT) AS cand_pairs,
       CAST(coalesce(p.matched_pairs, 0) AS BIGINT) AS matched_pairs,
       CASE WHEN coalesce(p.cand_pairs, 0) = 0 THEN 0
            ELSE CAST(p.matched_pairs * 1000000 // p.cand_pairs AS BIGINT)
            END AS match_ppm
FROM sizes s LEFT JOIN per_block p USING (noun)
"""


def entity_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = _parts(spark, sf_dir)
    brand_ct = parts.groupBy("p_name", "brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("bc")
    )
    wb = Window.partitionBy("p_name").orderBy(F.col("bc").desc(), F.col("brand"))
    top_brand = (
        brand_ct.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("p_name", F.col("brand").alias("top_brand"))
    )
    clusters = parts.groupBy("p_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("k").cast("bigint").alias("survivor_key"),
        F.countDistinct("brand").cast("bigint").alias("n_brands"),
        F.min("size").cast("bigint").alias("size_min"),
        F.max("size").cast("bigint").alias("size_max"),
        F.expr("min_by(p_retailprice, k)").alias("survivor_price"),
    )
    return clusters.filter(F.col("n_members") >= 2).join(
        F.broadcast(top_brand), "p_name"
    ).select(
        "p_name",
        "n_members",
        "survivor_key",
        "n_brands",
        "top_brand",
        "size_min",
        "size_max",
        "survivor_price",
    )


_GOLDEN_SQL = """
WITH parts AS (
    SELECT p_partkey AS k, p_name, p_brand AS brand,
           CAST(p_size AS BIGINT) AS size, p_retailprice
    FROM part WHERE p_name IS NOT NULL AND p_size IS NOT NULL
),
brand_ct AS (
    SELECT p_name, brand, count(*) AS bc FROM parts GROUP BY 1, 2
),
top_brand AS (
    SELECT p_name, brand AS top_brand FROM (
        SELECT p_name, brand,
               row_number() OVER (PARTITION BY p_name
                                  ORDER BY bc DESC, brand) AS rn
        FROM brand_ct
    ) WHERE rn = 1
),
clusters AS (
    SELECT p_name,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(k) AS BIGINT) AS survivor_key,
           CAST(count(DISTINCT brand) AS BIGINT) AS n_brands,
           CAST(min(size) AS BIGINT) AS size_min,
           CAST(max(size) AS BIGINT) AS size_max,
           arg_min(p_retailprice, k) AS survivor_price
    FROM parts GROUP BY 1
)
SELECT c.p_name, c.n_members, c.survivor_key, c.n_brands, t.top_brand,
       c.size_min, c.size_max, c.survivor_price
FROM clusters c JOIN top_brand t USING (p_name)
WHERE c.n_members >= 2
"""


QUERIES = {
    "entity_match_parts": entity_match_parts,
    "entity_golden_record": entity_golden_record,
}

ORACLE = {
    "entity_match_parts": _ENTITY_MATCH_SQL,
    "entity_golden_record": _GOLDEN_SQL,
}
