"""NULL-bearing fixtures through the oracle-hazard query class (VERDICT r3
task #9): NULL ordering (Spark NULLS FIRST vs DuckDB NULLS LAST defaults)
and typed-NULL arithmetic are exactly the places a Spark/DuckDB comparison
silently drifts when the live testdata happens to contain no NULLs. These
tests inject NULL `value` rows (including an all-NULL group and a
mostly-NULL group) into a synthetic events table and run the full
engine-vs-oracle comparison on it.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    """A tiny events table where NULL values land in every hazard spot:
    first/last by event_id, an ALL-NULL event_type group, and a group with
    more NULLs than values."""
    d = tmp_path_factory.mktemp("nulldata")
    base = dt.datetime(2024, 1, 1)
    rows = []
    # 'view': mixed values and NULLs interleaved within one user's window
    for i, v in enumerate([None, 3.14, None, 1.0, 10.55, None, 2.0, None]):
        rows.append((i, base + dt.timedelta(minutes=i), 1, "view", v))
    # 'error': ALL values NULL — percentile of an all-NULL group
    for i in range(8, 12):
        rows.append((i, base + dt.timedelta(minutes=i), 2, "error", None))
    # 'purchase': single non-NULL among NULLs; second user for windows
    for i, v in enumerate([None, None, 7.07, None], start=12):
        rows.append((i, base + dt.timedelta(minutes=i), 3, "purchase", v))
    # NULL user_id rows: a view + a later purchase (NULL never equals
    # NULL, so the anti-join must still call the view abandoned on BOTH
    # engines), plus a click so NULL-keyed groupBy/window paths see a
    # multi-row NULL partition
    rows.append((16, base + dt.timedelta(minutes=16), None, "view", 1.0))
    rows.append((17, base + dt.timedelta(minutes=17), None, "purchase", 2.0))
    rows.append((18, base + dt.timedelta(minutes=18), None, "click", None))
    # NULL-ts rows (r9 code-review class): Spark groupBy/window keeps a
    # NULL-day/NULL-window group while SQL equi-joins and date functions
    # drop or NULL it — every time-keyed operator must treat these rows
    # identically on both engines. One with a real user + value (the
    # dangerous case: it would join/aggregate if not filtered), one
    # NULL-everything.
    rows.append((19, None, 1, "view", 5.0))
    rows.append((20, None, None, "click", None))
    # NULL event_type with a real user/ts/value: groupBy keeps the NULL
    # type group on both engines, but equi-joins/filters on event_type
    # must drop it identically
    rows.append((21, base + dt.timedelta(minutes=21), 1, None, 4.0))
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            # props hazards for the JSON profiler: mostly-empty objects,
            # one NULL, one malformed, one valid typed payload — the
            # '<null>'/'<invalid>'/'<empty>'/keyed shapes all appear
            "props": pa.array(
                [None, "{not json", '{"k": 5}'] + ["{}"] * (len(rows) - 3)
            ),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    # a tiny orders table for the PIT assembly: NULL custkey and NULL
    # orderdate rows must drop out of the feature stream on both engines
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1, None, 3, 1], pa.int64()),
            "o_orderstatus": pa.array(["F", "O", "F", "O"]),
            "o_totalprice": pa.array([10.0, 20.0, None, 5.5], pa.float64()),
            "o_orderdate": pa.array(
                [base - dt.timedelta(days=1), base, None, base],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }
    )
    pq.write_table(orders, os.path.join(str(d), "orders.parquet"))
    # a tiny customer table for the IVM delta-join: a NULL nationkey must
    # form its own view group and the NULL-custkey order must drop on
    # both engines (r8 wave 24)
    customer = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_name": pa.array(["a", "b", "c"]),
            "c_nationkey": pa.array([10, None, 10], pa.int32()),
            "c_acctbal": pa.array([1.0, 2.0, None], pa.float64()),
            "c_mktsegment": pa.array(["BUILDING"] * 3),
        }
    )
    pq.write_table(customer, os.path.join(str(d), "customer.parquet"))
    # a tiny documents table for the web-corpus front door (r9): NULL
    # text must vanish from both engines, NULL source/lang must not
    # swallow the synthesized page/URL through concat, a NULL n_chars row
    # exercises DESC null ordering (Spark desc = NULLS LAST, DuckDB
    # default NULLS LAST — must agree), and double spaces probe the
    # word-count split on both sides
    # rows 6-7 (r9 hardening): a whitespace-only text (tokenizes to [])
    # and a stopword-only text (tokens but zero RAKE islands / zero
    # non-stop content) — the degenerate shapes every text operator must
    # fold identically on both engines
    documents = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "text": pa.array(
                [
                    "one two three four five six seven eight nine ten "
                    "eleven twelve thirteen",
                    None,
                    "short tail only",
                    "a  b padded words here make five or so total count",
                    "",
                    "exactly five words here now",
                    "   ",
                    "the a the a",
                ]
            ),
            "lang": pa.array(
                ["en", "en", None, "de", "es", "en", "en", "de"]
            ),
            "source": pa.array(
                ["srcA", "srcA", "srcB", None, "srcA", "srcB", "srcB",
                 "srcA"]
            ),
            "n_chars": pa.array(
                [64, 0, 15, None, 0, 28, 3, 11], pa.int64()
            ),
        }
    )
    pq.write_table(documents, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_duck(null_sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(null_sf_dir, 'events.parquet')}'"
    )
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(null_sf_dir, 'orders.parquet')}'"
    )
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"'{os.path.join(null_sf_dir, 'customer.parquet')}'"
    )
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(null_sf_dir, 'documents.parquet')}'"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "event_value_percentiles",
        "window_frames_running_spend",
        "grouping_sets_events",
        "rollup_event_counts",
        "top_users_by_event_type",
        # final-r4: NULL user_id through the anti-join (NULL = NULL is
        # never true — the view must count as abandoned on both engines),
        # NULL-keyed window partitions and groupBys, and the planner's
        # explicit NOT NULL filter
        "abandoned_view_rate",
        "user_journey_paths",
        "user_event_diversity",
        "user_churn_labels",
        "plan_range_partitions",
        # r5: NULL value rows through the hash-gated subsample means, the
        # decay shift, the rank-percentile transform, and the RFM cents
        # sum (a purchase group whose values are partly NULL)
        "subsample_mean_variance",
        "decayed_user_score",
        "quantile_normalize_values",
        "rfm_user_features",
        "ewma_anomaly_daily",
        # r5 review: NULL user_id baskets must be excluded identically on
        # both engines (the oracle's equi-self-join can never match them)
        "market_basket_lift",
        # r6: NULL user_id through the funnel's NULL-keyed window
        # partition (a NULL-user view+purchase pair must fold in the SAME
        # partition on both engines), the bitmap's (user, day) distinct,
        # the CUSUM per-type fold over a group with NULL values, the
        # seasonality baseline, and the JSON profiler's '<null>'/'{}'
        # shape buckets
        "window_funnel_depth",
        "user_day_bitmap_retention",
        "change_point_cusum",
        "seasonal_baseline_residual",
        "props_json_profile",
        # r6 late: NULL-user viewers must count as non-converted on both
        # engines (NULL join keys never match), and the backtest's date-
        # key self-joins must skip NULL-day groups identically
        "conversion_lag_profile",
        "seasonal_naive_backtest",
        # r6 wave 2: the MAD median-rank pick over groups with NULL-user
        # rows, and the co-engagement bucket size under NULL user_id
        # (Spark's collect_set drops NULLs; the oracle must not count
        # them toward the hub cap either)
        "mad_anomaly_daily",
        "link_prediction_common_neighbors",
        # r6 wave 3: OLS sums over groups whose cents are partly or fully
        # NULL (sum-of-NULL and x*NULL must collapse identically)
        "ols_daily_trend",
        # r6 wave 4: ranking ties + lead/lag defaults over the fixture's
        # tiny per-type groups (n = 1 partitions exercise the
        # percent_rank-micro NULL guard)
        "window_rank_surface",
        # r6 wave 6: the Holt fold's non-NULL contract and the HHI's
        # NULL-user / NULL-value purchase exclusions
        "holt_linear_forecast",
        "revenue_concentration_hhi",
        # r6 wave 7: target encoding's NULL-user exclusion and NULL-cents
        # sums (a fold whose target values are partly NULL must shrink
        # toward the same prior on both engines), and the ACF daily counts
        # over a fixture where NULL-user rows still count toward the
        # series (count(*), not count(user))
        "target_encoding_oof",
        "autocorrelation_daily_lags",
        # sweep: NULL user/value rows still open intervals (only ts drives
        # the sweep), and the all-NULL-value 'error' group must sweep
        # identically on both engines
        "interval_coverage_sweep",
        # grouped-agg UDAF: the all-NULL 'error' group must surface as
        # (n=0, NULL) through the Arrow aggregate AND the oracle's
        # NOT EXISTS branch; mostly-NULL groups trim on non-NULLs only
        "trimmed_mean_value_udaf",
        # apportionment: NULL-value purchases drop out entirely, NULL-user
        # rows join to nothing, and remainder cents split identically
        "attribution_linear_apportion",
        # churn: NULL users excluded from every day's leaderboard on both
        # engines; tiny per-day sets exercise the full-outer day shift
        "topk_churn_daily",
        # r6 wave 8: the arm hash must exclude NULL users identically
        # (md5(NULL) is NULL → both engines drop the row pre-split), and
        # CUPED's per-user cents sums over partly-NULL purchase values
        # must floor to the same covariate on both engines
        "ab_experiment_lift",
        "cuped_variance_reduction",
        # DiD panel: NULL-value purchases drop from every cell on both
        # engines; survival: NULL-user rows never enter the risk set
        "diff_in_diff",
        "survival_hazard_daily",
        # k-anonymity: NULL value rows form their own vb=NULL classes and
        # NULL users must not count toward users_in_class on either side
        "k_anonymity_audit",
        # r7 wave 21/22: NULL users must never become LPA graph nodes on
        # either engine (Spark's groupBy keeps a NULL group, the oracle's
        # self-join never matches it — both filter explicitly); the PIT
        # matrix's NULL-value label day must coalesce to 0 cents, NULL
        # custkey/orderdate order rows must drop from the feature stream,
        # and the NULL-user purchase must produce no label row
        "community_label_propagation",
        "pit_training_matrix",
        # r8 wave 24: pass@k's sufficient stats over groups whose values
        # are partly/entirely NULL (the all-NULL 'error' type must vanish
        # identically), the conformal split where md5(NULL user) makes
        # is_cal NULL (dropped from BOTH the cal and test slices on both
        # engines), and the IVM delta-join where a NULL custkey order
        # never joins and a NULL nationkey forms its own view group
        "pass_at_k_estimator",
        "conformal_calibration_audit",
        "incremental_join_maintenance",
        # r8 wave 25: NULL users/ts must never become journey rows (the
        # path window would otherwise fold them into one partition), and
        # the theta-difference's distinct hash frame must drop them
        # identically pre-sketch
        "markov_removal_effect",
        "kmv_audience_difference",
        # r8 wave 26: the run windows and dictionary byte sums over
        # columns with NULLs (count/ndv/plain bytes must all skip them
        # identically), and the transition split where NULL users drop
        # before chaining
        "encoding_choice_audit",
        "next_event_prediction_accuracy",
        # r8 wave 27: NULL values drop before ranking (AUC over the
        # all-NULL 'error' day leg), NULL users never become graph nodes
        "binary_classifier_auc",
        "degree_assortativity",
        # r9 web-corpus front door: NULL text drops from both engines,
        # NULL source/lang coalesce (concat would otherwise NULL the
        # whole page/URL), NULL n_chars rides DESC null ordering, and
        # empty/double-space texts probe the block word count
        "html_text_extraction",
        "domain_frequency_cap",
        # r9 wave 28: NULL text drops identically pre-blocklist/shard,
        # NULL lang drops from the coverage audit on both engines, and
        # the streaming cap twin must admit the same first-K per host
        # with NULL-text rows never staged
        "robots_blocklist_filter",
        "tokenizer_vocab_coverage",
        "epoch_shard_plan",
        "streaming_domain_cap_twin",
        # r9 wave 29: NULL text must vanish from the WARC envelope build,
        # and the recipe's raw stage must count NULL-text/tok_ct hazards
        # (Spark size()=-1 vs DuckDB NULL both fold to 0 tokens)
        "warc_record_parse",
        "web_front_door_recipe",
        # r9 wave 30: the NULL-source group must carry its own sqrt
        # weight identically, NULL text drops pre-count
        "token_budget_mixture",
        # r9 waves 31-33: NULL text drops pre-scoring on both engines
        # (fasttext/DS/perplexity/rouge); NULL (source, lang) groups are
        # equality-joined away in rouge but kept as window partitions in
        # the perplexity bucketing — both engines must agree on both
        # treatments; NULL users/ts never become preference votes or
        # episode steps; the all-NULL 'error' value group rides
        # coalesce-to-0 rewards through the shift decay
        "fasttext_hash_quality",
        "dawid_skene_vote",
        "perplexity_bucket_assign",
        "rouge_bigram_eval",
        "pairwise_preference_matrix",
        "bradley_terry_strength",
        "episode_discounted_returns",
        # r10 wave 46: same episode order contract; NULL ts/user drop,
        # NULL event_id/value coalesce inside the step ordering
        "episode_return_to_go",
        # r9 wave 34: NULL text drops pre-scoring (confident learning /
        # DSIR weights); the NULL source and NULL lang groups must carry
        # their own ESS / pack-audit rows identically on both engines
        # (group-by keeps NULL keys; the pack oracle's max-pack join
        # needs the explicit IS NULL arm); NULL users/ts never become
        # episodes so the day baseline is unaffected
        "confident_learning_audit",
        "importance_weight_ess",
        "episode_advantage_baseline",
        "pack_attention_waste",
        # r9 wave 35: the day-rank split and both predictors must drop
        # NULL users/types identically; the streaming fold must stage
        # exactly the batch operator's NULL-filtered step set (NULL
        # event_ids ride ord_eid = -1 through the state fold)
        "preference_holdout_accuracy",
        "streaming_episode_return_twin",
        # r9 wave 36: NULL text drops pre-count on both engines; the
        # NULL-source group carries its own swept weights; RAKE's
        # islands construction must skip NULL-text docs identically
        "mixture_temperature_sweep",
        "negative_sampling_table",
        "keyphrase_rake",
        # r10 wave 37: NULL / whitespace-only text must yield zero
        # anchors on both engines (Spark: size(NULL) = -1 < K filter;
        # DuckDB: len(NULL) >= K is NULL -> dropped), never a NULL-keyed
        # anchor group
        "dedup_duplicated_spans",
        # r10 wave 38: NULL text drops at the WARC door on both engines;
        # NULL source must become the ''-titled page AND the
        # '.example.com' host (coalesce on both), and the NULL-source
        # group must ride the mixture hash gate identically
        "crawl_to_train_funnel",
        # r10 wave 39: NULL text drops at the tok CTE on both engines;
        # the NULL source group carries its own BLEU reference and its
        # own CDC chunk population
        "bleu_ngram_eval",
        "cdc_chunk_dedup",
        # r10 wave 40: NULL text is excluded from the removal base on
        # both engines (size(NULL)=-1 vs t IS NOT NULL); the NULL lang
        # group gets its own curriculum ranking
        "duplicated_span_removal",
        "curriculum_order_plan",
        # the 24th twin: NULL text yields no chunks on either engine;
        # dup-chunk election must agree on the remaining rows
        "streaming_chunk_owner_twin",
        # r10 wave 41: NULL source coalesces to the '.example.com' host
        # on both engines; NULL text drops before the rules join / rank
        # window / quality scan; NULL doc_id paths match no rule and
        # must fall through to the RFC default-allow identically
        "robots_rule_eval",
        "crawl_frontier_plan",
        "host_quality_shrinkage",
        # r10 wave 42: NULL text drops at the tok CTE on both engines;
        # the NULL source/lang groups carry their own chrF reference,
        # threshold rows, and distinct-n ratios
        "chrf_char_eval",
        "quality_threshold_sweep",
        "distinct_ngram_diversity",
        # r10 wave 43: NULL text and NULL doc_id are excluded from the
        # banded corpus on both engines; the curve and its streaming
        # twin must agree on the remaining band arithmetic
        "vocab_growth_curve",
        "streaming_vocab_growth_twin",
        # the 26th twin: per-host politeness counter across batches on
        # the NULL-host/NULL-text fixture
        "streaming_frontier_twin",
        # r10 wave 44: NULL text drops before windowing/scoring on both
        # engines; NULL lang/source ride as their own groups through the
        # code-switch profile, the shard cells, and the lexicon gate
        "code_switch_profile",
        "mixture_shard_conformance",
        "badword_ratio_filter",
        # (bitext_margin_mining is embeddings-only — the NULL fixture is
        # a documents/events fixture, so like the rest of the embedding
        # family it is covered by the empty-input + hypothesis suites)
        # r10 wave 47: NULL ts/user_id/event_type rows have no sequence
        # position / conversation / role and must drop identically
        # (Spark NULLS FIRST vs DuckDB NULLS LAST window hazard); NULL
        # props coalesces to the '_' content / 0-token payload on both
        # engines
        "sft_turn_structure_audit",
        "sft_template_render_overhead",
        "sft_loss_masking_plan",
        # r10 wave 48: the 27th twin must drop the same NULL-key rows as
        # its batch half; the NFC audit must treat NULL text (dropped)
        # and whitespace-only docs (pure-ASCII, unchanged) identically
        "streaming_sft_gate_twin",
        "unicode_normalization_audit",
        # r10 wave 49: NULL user_id/ts/event_type rows drop from the
        # comparison frame identically (the counts combine vs the SQL
        # self-join NULL-key hazard); NULL props coalesces to the
        # 0-token payload on both engines
        # (caption_image_alignment needs the embeddings table, absent
        # from this fixture — covered by empty-input + hypothesis
        # suites, like the rest of the embedding family)
        "preference_length_bias_probe",
        # r10 wave 50: NULL-text docs drop identically; whitespace-only
        # and single-token docs hit the scored=0 guard on both engines;
        # NULL user_id/ts/event_type rows leave the DPO comparison frame
        # identically, NULL props -> the 0-token payload
        "synthetic_watermark_detect",
        "dpo_pair_extraction",
        # r10 wave 51: NULL text drops identically from the judged pool
        # (NDCG) and the FIM staging; NULL lang additionally leaves the
        # FIM plan's combine; sub-4-token and empty docs land in 'skip'
        "retrieval_ndcg_eval",
        "fim_transform_plan",
        # r10 wave 52: NULL-source docs are out of scope on both engines
        # (a keyed counter needs a key); NULL text drops identically;
        # whitespace-only / single-token docs contribute scored=0 rows
        # to their source's pooled counters
        "streaming_watermark_twin",
        # r10 wave 53: NULL-text docs leave both the span evidence and
        # the exact-dup hash groups identically; NULL lang leaves the
        # parity combine; zero-token docs guard the micro divisions
        "memorization_risk_audit",
        "tokenizer_parity_audit",
        # r10 wave 54: NULL text/source leave the batch assignment and
        # the gate flags identically; zero-token docs fail the n_tok>0
        # conjuncts (not divide) on both engines
        "inbatch_negative_collision_audit",
        "filter_cascade_order_plan",
        # r10 wave 55: NULL text/lang leave the token-supply combine;
        # NULL user_id/ts/event_type rows are not conversation turns;
        # NULL props coalesces to the '_' content payload identically
        "repeated_epoch_value_plan",
        "sft_complexity_score",
        # r10 wave 56: NULL-text docs leave the prefix sweep identically;
        # short docs drop out of longer-K rows on both engines
        # (quantization_outlier_audit is embeddings-only — absent from
        # this fixture, covered by empty-input + hypothesis like the
        # rest of the embedding family)
        "prompt_prefix_cache_plan",
    ],
)
def test_null_fixture_oracle_parity(spark, null_duck, null_sf_dir, name):
    from tests.oracle_harness import compare_query

    from realtimedatawarehouse_self_spark import plans

    qs = plans.all_queries()
    oracles = plans.all_oracles()
    ok, detail = compare_query(
        qs[name](spark, null_sf_dir), null_duck, oracles[name]
    )
    assert ok, f"{name}: {detail}"


def test_null_values_actually_exercise_the_hazard(spark, null_sf_dir):
    """Guard the fixture itself: NULLs must survive the loader (a fixture
    that silently drops them proves nothing)."""
    from realtimedatawarehouse_self_spark.sources.tables import load_table

    ev = load_table(spark, null_sf_dir, "events")
    n_null = ev.filter("value IS NULL").count()
    # 4 in 'view' + 4 in 'error' + 3 in 'purchase' + 1 NULL-user 'click'
    # + 1 NULL-everything NULL-ts row
    assert n_null == 13
    assert ev.filter("user_id IS NULL").count() == 4
    assert ev.filter("ts IS NULL").count() == 2
