"""SFT / chat-data operators (round 10, wave 47): the supervised-
fine-tuning data-prep surface — the one post-training family the registry
did not yet cover (pretraining curation, preference/reward data, and RL
episodes each have their own modules).

An SFT pipeline receives conversations (ordered role-tagged turns),
audits their structure (role alternation, who speaks first/last), renders
them through a chat template whose special tokens cost real context
budget, and masks the loss to assistant turns only — so the three
operators here are exactly the three audits production SFT preps run:

- `sft_turn_structure_audit` — per-conversation structural gate
  (alternation violations, starts-with-user / ends-with-assistant,
  minimum turn count), the keep/drop decision every SFT cleaner applies
  before templating.
- `sft_template_render_overhead` — renders each conversation through a
  fixed ChatML-style template and measures how many of the rendered
  characters are template scaffolding vs. content (the "template tax"
  that inflates sequence length and shrinks the effective token budget).
- `sft_loss_masking_plan` — the per-day trainable-token yield: of all
  content tokens, how many land in assistant turns (loss-bearing) vs.
  user turns (masked), the number that decides how many epochs an SFT
  mix is worth.

Conversations are modeled on the `events` table: a conversation is one
(user_id, day); turns order by (ts, event_id); the role derives
deterministically from event_type (click/view → 'user', everything else
→ 'assistant') and the turn content from event_type + the `props.k`
payload — the same stand-in-derivation pattern as the WARC/HTML front
door (the container has no chat corpus; the Spark-side plumbing and the
cross-engine arithmetic are the real artifact).

Beyond the reference surface (BASELINE.json north-star). Scale notes per
operator; module-wide: every operator is ONE conversation-keyed shuffle
(the window sort and the group-by share the (user_id, day) partitioning,
so Spark plans a single Exchange), ratios are integer micro-units, and
nothing is iterative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table

# Role derivation (deterministic stand-in): browsing-shaped events are the
# human side, transactional/system-shaped events the assistant side.
_USER_TYPES = ("click", "view")

# Shared CTE: turns with conversation key, role, and content. The NOT NULL
# guards pin the cross-engine hazards: NULL ts has no sequence position
# (Spark window ASC = NULLS FIRST, DuckDB = NULLS LAST), NULL user_id /
# event_type have no conversation / role.
_TURNS_SQL = """
t AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, ts, event_id,
         CASE WHEN event_type IN ('click', 'view') THEN 'user'
              ELSE 'assistant' END AS role,
         event_type || ' ' ||
             coalesce(json_extract_string(
                 CASE WHEN json_valid(props) THEN props END, '$.k'),
                 '_') AS content
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
)
"""


def _turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events", fan_out=True)
    return (
        ev.filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "ts",
            "event_id",
            F.when(
                F.col("event_type").isin(*_USER_TYPES), "user"
            )
            .otherwise("assistant")
            .alias("role"),
            F.concat(
                F.col("event_type"),
                F.lit(" "),
                F.coalesce(
                    F.get_json_object("props", "$.k"), F.lit("_")
                ),
            ).alias("content"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 47a: conversation structure audit — the standard SFT cleaning gate
# (role alternation, user-first, assistant-last, >= 2 turns; e.g. the
# checks OpenAssistant/ShareGPT-style preps apply before templating).
# A conversation with two consecutive same-role turns breaks the
# alternation the chat template assumes; one that ends on a user turn has
# no trainable completion.
# Scale: one window sort per conversation key + one group-by on the SAME
# key — a single Exchange; per-conversation state is O(1) BIGINT counters.
# First/last turns are detected via lag/lead NULLs over the SAME ordered
# window spec (one streaming window pass) — the first cut's extra
# unordered count(*) window cost a second buffering pass, 7.7x the wall
# at the 100x stress (40.9 s -> 5.3 s). Conversations are bounded (a
# user-day), so no group can skew a partition at any corpus size.
# ---------------------------------------------------------------------------
MIN_TURNS = 2


def sft_turn_structure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _turns(spark, sf_dir)
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = t.withColumn("prev_role", F.lag("role").over(w)).withColumn(
        "next_role", F.lead("role").over(w)
    )
    conv = seq.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("bigint")
        .alias("n_user_turns"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("bigint")
        .alias("n_assistant_turns"),
        F.sum(
            F.when(F.col("role") == F.col("prev_role"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alternation_violations"),
        F.max(
            F.when(
                F.col("prev_role").isNull() & (F.col("role") == "user"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("starts_user"),
        F.max(
            F.when(
                F.col("next_role").isNull()
                & (F.col("role") == "assistant"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("ends_assistant"),
    )
    return conv.withColumn(
        "decision",
        F.when(
            (F.col("starts_user") == 1)
            & (F.col("ends_assistant") == 1)
            & (F.col("alternation_violations") == 0)
            & (F.col("n_turns") >= MIN_TURNS),
            "keep",
        ).otherwise("drop"),
    )


_TURN_STRUCTURE_SQL = f"""
WITH {_TURNS_SQL},
seq AS (
  SELECT user_id, day, role,
         lag(role) OVER w AS prev_role,
         lead(role) OVER w AS next_role
  FROM t
  WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)
),
conv AS (
  SELECT user_id, day,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_user_turns,
         CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_assistant_turns,
         CAST(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT)
             AS alternation_violations,
         CAST(max(CASE WHEN prev_role IS NULL AND role = 'user'
                       THEN 1 ELSE 0 END) AS BIGINT) AS starts_user,
         CAST(max(CASE WHEN next_role IS NULL AND role = 'assistant'
                       THEN 1 ELSE 0 END) AS BIGINT) AS ends_assistant
  FROM seq GROUP BY 1, 2
)
SELECT *,
       CASE WHEN starts_user = 1 AND ends_assistant = 1
                 AND alternation_violations = 0 AND n_turns >= {MIN_TURNS}
            THEN 'keep' ELSE 'drop' END AS decision
FROM conv
"""


# ---------------------------------------------------------------------------
# Wave 47b: chat-template render overhead — render every conversation
# through a fixed ChatML-style template (system preamble + per-turn
# <|role|> ... <|end|> scaffolding) and measure the template tax:
# rendered characters that are scaffolding, not content. Production preps
# track this because the scaffolding is charged against the context
# window on every example (HuggingFace `apply_chat_template` docs make
# the same point); a template change that looks free can cost percent-
# level effective batch tokens.
# The render really happens (ordered concat of the turn strings), and the
# audit measures the rendered artifact — but only the COUNTS leave the
# operator, so the wide string never survives the projection.
# Scale: sort_array(collect_list(...)) holds ONE conversation per group —
# bounded (a user-day), never corpus-sized; one conversation-keyed
# Exchange total. Ratios are integer micro-units over two BIGINTs.
# ---------------------------------------------------------------------------
_SYSTEM_PREAMBLE = "You are a helpful assistant."


def sft_template_render_overhead(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = _turns(spark, sf_dir)
    # ordered render: struct sorts by (ts, event_id) — unique within a
    # conversation — then the pieces join in that order.
    pieces = t.select(
        "user_id",
        "day",
        F.struct(
            "ts",
            "event_id",
            F.concat(
                F.lit("<|"),
                F.col("role"),
                F.lit("|>\n"),
                F.col("content"),
                F.lit("<|end|>"),
            ).alias("piece"),
        ).alias("turn"),
        F.length("content").cast("bigint").alias("content_chars"),
    )
    conv = pieces.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum("content_chars").cast("bigint").alias("content_chars"),
        F.concat(
            F.lit(f"<|system|>\n{_SYSTEM_PREAMBLE}\n"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("turn")),
                    lambda s: s["piece"],
                ),
                "\n",
            ),
        ).alias("rendered"),
    )
    return conv.select(
        "user_id",
        "day",
        "n_turns",
        "content_chars",
        F.length("rendered").cast("bigint").alias("rendered_chars"),
        (F.length("rendered") - F.col("content_chars"))
        .cast("bigint")
        .alias("overhead_chars"),
        F.expr(
            "(length(rendered) - content_chars) * 1000000"
            " div length(rendered)"
        ).alias("overhead_micro"),
    )


_TEMPLATE_OVERHEAD_SQL = f"""
WITH {_TURNS_SQL},
conv AS (
  SELECT user_id, day,
         '<|system|>' || chr(10) || '{_SYSTEM_PREAMBLE}' || chr(10) ||
         string_agg('<|' || role || '|>' || chr(10) || content || '<|end|>',
                    chr(10) ORDER BY ts, event_id) AS rendered,
         CAST(sum(length(content)) AS BIGINT) AS content_chars,
         CAST(count(*) AS BIGINT) AS n_turns
  FROM t GROUP BY 1, 2
)
SELECT user_id, day, n_turns, content_chars,
       CAST(length(rendered) AS BIGINT) AS rendered_chars,
       CAST(length(rendered) - content_chars AS BIGINT) AS overhead_chars,
       CAST((length(rendered) - content_chars) * 1000000
            // length(rendered) AS BIGINT) AS overhead_micro
FROM conv
"""


# ---------------------------------------------------------------------------
# Wave 47c: loss-masking yield — SFT loss is computed on assistant tokens
# only; user turns (and template scaffolding) are masked. The per-day
# trainable-token yield (loss tokens / total content tokens) is the
# number that decides how much gradient signal a day of conversations
# actually carries — a mix heavy in long user prompts and short replies
# can pay for 3x the tokens it trains on.
# Turn token counts derive deterministically from the props payload
# (2 + k mod 5 — variable-length stand-in, same derivation both engines).
# Scale: single scan -> one day-keyed combine (map-side partials); no
# window, no join; output is O(days).
# ---------------------------------------------------------------------------


def sft_loss_masking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _turns() projects the props payload away — derive from the base scan
    # directly (same guards, same role rule) with the payload available.
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events", fan_out=True)
    t = (
        ev.filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.when(F.col("event_type").isin(*_USER_TYPES), "user")
            .otherwise("assistant")
            .alias("role"),
            (
                F.lit(2)
                + F.coalesce(
                    F.get_json_object("props", "$.k").cast("bigint"),
                    F.lit(0),
                )
                % 5
            )
            .cast("bigint")
            .alias("turn_tokens"),
        )
    )
    return (
        t.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.sum("turn_tokens").cast("bigint").alias("total_tokens"),
            F.sum(
                F.when(
                    F.col("role") == "assistant", F.col("turn_tokens")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("loss_tokens"),
        )
        .withColumn(
            "loss_yield_micro",
            F.expr("loss_tokens * 1000000 div total_tokens"),
        )
    )


_LOSS_MASKING_SQL = """
WITH t AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CASE WHEN event_type IN ('click', 'view') THEN 'user'
              ELSE 'assistant' END AS role,
         2 + coalesce(TRY_CAST(json_extract_string(
                 CASE WHEN json_valid(props) THEN props END, '$.k')
                 AS BIGINT), 0) % 5 AS turn_tokens
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(turn_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN role = 'assistant' THEN turn_tokens
                     ELSE 0 END) AS BIGINT) AS loss_tokens,
       CAST(sum(CASE WHEN role = 'assistant' THEN turn_tokens
                     ELSE 0 END) * 1000000 // sum(turn_tokens) AS BIGINT)
           AS loss_yield_micro
FROM t GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Wave 55a (r10): per-sample instruction-complexity score — the
# difficulty table SFT selection and curriculum strategies rank by
# (Evol-Instruct/WizardLM's "depth" axis, Zhao et al. 2024 tree-depth
# complexity, the #InsTag intention-count proxy). Three integer proxies
# over the SAME conversation frame the structure gate audits: depth
# (turn count), intent diversity (distinct event types), and content
# volume (characters). Points: depth >=8 -> 3, >=4 -> 2, >=2 -> 1;
# diversity >=4 -> 2, >=3 -> 1; volume >=120 -> 2, >=60 -> 1. Buckets:
# >=6 hard, >=4 medium, >=2 easy, else trivial.
# Scale: ONE (user_id, day) combine (count + count-distinct + sum; no
# window, no join) — map-side partials, conversation-bounded keys.
# ---------------------------------------------------------------------------


def sft_complexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    conv = _turns(spark, sf_dir).groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.countDistinct("content").cast("bigint").alias("n_intents"),
        F.sum(F.length("content")).cast("bigint").alias("content_chars"),
    )
    scored = conv.withColumn(
        "complexity_points",
        F.expr(
            "CASE WHEN n_turns >= 8 THEN 3 WHEN n_turns >= 4 THEN 2"
            " WHEN n_turns >= 2 THEN 1 ELSE 0 END"
            " + CASE WHEN n_intents >= 4 THEN 2"
            " WHEN n_intents >= 3 THEN 1 ELSE 0 END"
            " + CASE WHEN content_chars >= 120 THEN 2"
            " WHEN content_chars >= 60 THEN 1 ELSE 0 END"
        ).cast("bigint"),
    )
    return scored.select(
        "user_id",
        "day",
        "n_turns",
        "n_intents",
        "content_chars",
        "complexity_points",
        F.expr(
            "CASE WHEN complexity_points >= 6 THEN 'hard'"
            " WHEN complexity_points >= 4 THEN 'medium'"
            " WHEN complexity_points >= 2 THEN 'easy'"
            " ELSE 'trivial' END"
        ).alias("complexity_bucket"),
    )


_COMPLEXITY_SQL = f"""
WITH {_TURNS_SQL},
conv AS (
  SELECT user_id, day,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(count(DISTINCT content) AS BIGINT) AS n_intents,
         CAST(sum(length(content)) AS BIGINT) AS content_chars
  FROM t GROUP BY 1, 2
),
scored AS (
  SELECT *,
         CAST(CASE WHEN n_turns >= 8 THEN 3 WHEN n_turns >= 4 THEN 2
              WHEN n_turns >= 2 THEN 1 ELSE 0 END
              + CASE WHEN n_intents >= 4 THEN 2
                WHEN n_intents >= 3 THEN 1 ELSE 0 END
              + CASE WHEN content_chars >= 120 THEN 2
                WHEN content_chars >= 60 THEN 1 ELSE 0 END
              AS BIGINT) AS complexity_points
  FROM conv
)
SELECT user_id, day, n_turns, n_intents, content_chars,
       complexity_points,
       CASE WHEN complexity_points >= 6 THEN 'hard'
            WHEN complexity_points >= 4 THEN 'medium'
            WHEN complexity_points >= 2 THEN 'easy'
            ELSE 'trivial' END AS complexity_bucket
FROM scored
"""


QUERIES = {
    "sft_turn_structure_audit": sft_turn_structure_audit,
    "sft_template_render_overhead": sft_template_render_overhead,
    "sft_loss_masking_plan": sft_loss_masking_plan,
    "sft_complexity_score": sft_complexity_score,
}

ORACLE = {
    "sft_turn_structure_audit": _TURN_STRUCTURE_SQL,
    "sft_template_render_overhead": _TEMPLATE_OVERHEAD_SQL,
    "sft_loss_masking_plan": _LOSS_MASKING_SQL,
    "sft_complexity_score": _COMPLEXITY_SQL,
}
