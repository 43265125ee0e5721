"""Round-12 continuation: post-training data assembly.

After pretraining-corpus curation (dedup, quality gates, sharding —
rounds 9-11), the next stage a training-data platform runs is
POST-training assembly: preference pairs for DPO/RLHF reward
modeling, multi-turn conversation transcripts with context-window
trimming and loss masks for SFT, tokenizer-efficiency evaluation
before committing a vocab to a 100 TB tokenization pass, and the
classic feature-engineering fits (min-max scaling, WOE-style evidence
binning) that the reward-model side of the pipeline consumes.

Everything here is exact-oracle, and every emitted fraction follows
the round-11 ADVICE rule: never ROUND a ratio on a possible decimal
half-boundary — emit either the exact integer rational pair
(numerator, denominator) or FLOOR(K * ratio) fixed-point units, both
of which are bit-stable across engines because the engines compute
the same IEEE-754 quotient and FLOOR/integer arithmetic carry no
rounding mode.

Scale design notes (per operator, details in each docstring):

* preference-pair assembly ranks inside bounded (lang, length-bucket)
  partitions — never a global window — so the rank shuffle partitions
  by a key whose group sizes are corpus-fraction-bounded.
* conversation assembly is one groupBy with a canonical in-array sort
  (the string_agg_sorted contract), so transcripts are deterministic
  under any partitioning and the only shuffle is on the conversation
  key.
* context trimming runs two window passes over the SAME partition key
  (one descending suffix-budget scan, one ascending offset scan) —
  Catalyst plans a single Exchange reused by both Sort+Window pairs.
* the scaler and the evidence binning broadcast their fitted
  statistics (3 groups / 1 row / ~30 bins) back onto the fact scan —
  the fit is a map-side-partial aggregate, the apply is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clj_kinesis_to_firehose_spark.registry import oracle, register
from clj_kinesis_to_firehose_spark.sources import load_table

# --- pref_pair_assembly -------------------------------------------------------

#: whitespace-token width of one preference-pair length bucket. Pairing
#: within a length bucket is the standard de-biasing move: a reward
#: model trained on pairs with large length gaps learns length, not
#: quality.
PREF_BUCKET_TOKENS = 50


@register(
    "pref_pair_assembly",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, source,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct,
             CAST(FLOOR(LEN(STRING_SPLIT(text, ' '))
                        / {PREF_BUCKET_TOKENS}.0) AS BIGINT) AS tok_bucket
      FROM documents
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY lang, tok_bucket
               ORDER BY CAST(n_distinct AS DOUBLE) / n_tokens DESC, doc_id
             ) AS rn_best,
             ROW_NUMBER() OVER (
               PARTITION BY lang, tok_bucket
               ORDER BY CAST(n_distinct AS DOUBLE) / n_tokens ASC, doc_id
             ) AS rn_worst
      FROM scored
    )
    SELECT b.lang, b.tok_bucket,
           b.doc_id AS chosen_doc_id, w.doc_id AS rejected_doc_id,
           b.source AS chosen_source, w.source AS rejected_source,
           b.n_tokens AS chosen_tokens, w.n_tokens AS rejected_tokens,
           b.n_distinct * w.n_tokens - w.n_distinct * b.n_tokens AS margin_num,
           b.n_tokens * w.n_tokens AS margin_den
    FROM ranked b JOIN ranked w
      ON b.lang = w.lang AND b.tok_bucket = w.tok_bucket
     AND b.rn_best = 1 AND w.rn_worst = 1
    WHERE b.doc_id <> w.doc_id
    """,
)
def pref_pair_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair (chosen, rejected) assembly for reward-model /
    DPO training: within each (lang, length-bucket) cohort, the
    highest-lexical-diversity document is `chosen` and the lowest is
    `rejected`. The pair margin is emitted as the EXACT rational
    (margin_num, margin_den) = d1/t1 - d2/t2 over a common
    denominator — integers, so no cross-engine rounding channel
    exists (the round-11 ADVICE rule).

    Ranking orders by the IEEE quotient n_distinct/n_tokens with a
    doc_id tiebreak: both engines compute the identical double and
    the identical total order, which is safe — only ROUNDING a ratio
    is a half-boundary channel, comparing it is not.

    Scale: both ROW_NUMBER windows share the (lang, tok_bucket)
    partition key, so Catalyst plans ONE Exchange; group sizes are a
    corpus fraction (languages x length buckets), never the corpus.
    The rank-1 x rank-1 self-join keys on the same bounded cohort
    key. Nothing is global, nothing collects.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.floor(F.size(toks).cast("long") / PREF_BUCKET_TOKENS)
        .cast("long")
        .alias("tok_bucket"),
    )
    ratio = F.col("n_distinct").cast("double") / F.col("n_tokens")
    cohort = Window.partitionBy("lang", "tok_bucket")
    ranked = scored.withColumn(
        "rn_best",
        F.row_number().over(cohort.orderBy(ratio.desc(), F.col("doc_id"))),
    ).withColumn(
        "rn_worst",
        F.row_number().over(cohort.orderBy(ratio.asc(), F.col("doc_id"))),
    )
    best = ranked.filter(F.col("rn_best") == 1).alias("b")
    worst = ranked.filter(F.col("rn_worst") == 1).alias("w")
    return (
        best.join(worst, ["lang", "tok_bucket"])
        .filter(F.col("b.doc_id") != F.col("w.doc_id"))
        .select(
            "lang",
            "tok_bucket",
            F.col("b.doc_id").alias("chosen_doc_id"),
            F.col("w.doc_id").alias("rejected_doc_id"),
            F.col("b.source").alias("chosen_source"),
            F.col("w.source").alias("rejected_source"),
            F.col("b.n_tokens").alias("chosen_tokens"),
            F.col("w.n_tokens").alias("rejected_tokens"),
            (
                F.col("b.n_distinct") * F.col("w.n_tokens")
                - F.col("w.n_distinct") * F.col("b.n_tokens")
            ).alias("margin_num"),
            (F.col("b.n_tokens") * F.col("w.n_tokens")).alias("margin_den"),
        )
    )


# --- pref_pair_stats ----------------------------------------------------------


def _sql_pref_pair_stats() -> str:
    return f"""
    WITH pairs AS ({oracle("pref_pair_assembly")})
    SELECT lang,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN chosen_tokens > rejected_tokens
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_chosen_longer,
           CAST(FLOOR(10000.0 * SUM(CASE WHEN chosen_tokens > rejected_tokens
                                         THEN 1 ELSE 0 END) / COUNT(*))
                AS BIGINT) AS share_chosen_longer_u4,
           CAST(SUM(CAST(FLOOR(1000000.0 * margin_num / margin_den) AS BIGINT))
                AS BIGINT) AS sum_margin_u6
    FROM pairs GROUP BY lang
    """


@register("pref_pair_stats", oracle=_sql_pref_pair_stats())
def pref_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bias audit over the assembled preference pairs — the
    first sanity check a reward-model team runs: what share of pairs
    has the CHOSEN side longer (a length-bias smell), and the total
    quality margin. Margins are summed in integer 1e-6 fixed-point
    units (FLOOR per pair, THEN integer sum) so the aggregate is
    order-independent — summing raw doubles would make the result
    depend on partitioning, the one nondeterminism no oracle can
    absorb.

    Scale: a composite over pref_pair_assembly's bounded pair
    relation — one aggregate with map-side partials on `lang`.
    """
    pairs = pref_pair_assembly(spark, sf_dir)
    longer = F.col("chosen_tokens") > F.col("rejected_tokens")
    margin_u6 = F.floor(
        F.lit(1000000.0) * F.col("margin_num") / F.col("margin_den")
    ).cast("long")
    return pairs.groupBy("lang").agg(
        F.count("*").alias("n_pairs"),
        F.sum(longer.cast("int")).cast("long").alias("n_chosen_longer"),
        F.floor(
            F.lit(10000.0) * F.sum(longer.cast("int")) / F.count("*")
        )
        .cast("long")
        .alias("share_chosen_longer_u4"),
        F.sum(margin_u6).cast("long").alias("sum_margin_u6"),
    )


# --- pref_winrate_matrix ------------------------------------------------------


def _sql_pref_winrate_matrix() -> str:
    return f"""
    WITH pairs AS ({oracle("pref_pair_assembly")}),
    cells AS (
      SELECT chosen_source, rejected_source, COUNT(*) AS n_wins
      FROM pairs GROUP BY 1, 2
    )
    SELECT chosen_source, rejected_source, n_wins,
           CAST(SUM(n_wins) OVER (PARTITION BY rejected_source) AS BIGINT)
             AS n_losses_of_rejected,
           CAST(FLOOR(10000.0 * n_wins /
                      SUM(n_wins) OVER (PARTITION BY rejected_source))
                AS BIGINT) AS share_of_losses_u4
    FROM cells
    """


@register("pref_winrate_matrix", oracle=_sql_pref_winrate_matrix())
def pref_winrate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-source win matrix over the preference pairs — the
    relation behind an Elo/Bradley-Terry fit: how often source A's
    documents beat source B's inside a cohort. Shares are FLOOR 1e-4
    fixed-point (exact), counts are exact integers; the iterative
    Bradley-Terry solve itself belongs to the trainer, this is its
    input sufficient statistic.

    Scale: aggregates the pair relation to source-cardinality² cells,
    then one window over those CELLS (bounded by source count, never
    corpus size).
    """
    pairs = pref_pair_assembly(spark, sf_dir)
    cells = pairs.groupBy("chosen_source", "rejected_source").agg(
        F.count("*").alias("n_wins")
    )
    w = Window.partitionBy("rejected_source")
    losses = F.sum("n_wins").over(w)
    return cells.select(
        "chosen_source",
        "rejected_source",
        "n_wins",
        losses.cast("long").alias("n_losses_of_rejected"),
        F.floor(F.lit(10000.0) * F.col("n_wins") / losses)
        .cast("long")
        .alias("share_of_losses_u4"),
    )


# --- chat_conversation_assembly ------------------------------------------------

#: event_type -> chat role. Interaction events are the user speaking,
#: conversion events are the assistant's turn, errors are system turns.
CHAT_ROLE_CASE = (
    "CASE WHEN event_type IN ('view', 'click') THEN 'user' "
    "WHEN event_type IN ('purchase', 'signup') THEN 'assistant' "
    "ELSE 'system' END"
)

#: shared CTE: one line per event with its conversation key. The line
#: text embeds only integers and strings (never a formatted timestamp
#: or raw double), so both engines render byte-identical turns.
SQL_CHAT_TURNS = f"""
    SELECT user_id,
           STRFTIME(DATE_TRUNC('month', ts), '%Y-%m') AS month,
           ts, event_id,
           {CHAT_ROLE_CASE} AS role,
           '<' || {CHAT_ROLE_CASE} || '> ' || event_type || ' #'
               || CAST(event_id AS VARCHAR) AS line
    FROM events
"""


@register(
    "chat_conversation_assembly",
    oracle=f"""
    WITH turns AS ({SQL_CHAT_TURNS})
    SELECT user_id, month,
           COUNT(*) AS n_turns,
           CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_assistant_turns,
           STRING_AGG(line, CHR(10) ORDER BY ts, event_id) AS transcript
    FROM turns GROUP BY user_id, month
    """,
)
def chat_conversation_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-turn conversation assembly for SFT: events become
    role-tagged turns ('<user> click #17'), grouped into one
    conversation per (user_id, month) and flattened to a single
    newline-joined transcript in strict (ts, event_id) order. This is
    the flatten step every chat-tuning pipeline runs before
    tokenization; the role tagging is the chat template.

    Determinism: the transcript is built by sorting INSIDE the
    aggregated array on (ts, event_id) — the string_agg_sorted
    contract — so the value is identical under any partitioning;
    turn text embeds only integers/strings, never formatted floats.

    Scale: one shuffle on the conversation key; transcripts are
    conversation-sized, the natural record size of the SFT dataset
    itself. No windows, no collect.
    """
    ev = load_table(spark, sf_dir, "events")
    role = (
        F.when(F.col("event_type").isin("view", "click"), "user")
        .when(F.col("event_type").isin("purchase", "signup"), "assistant")
        .otherwise("system")
    )
    turns = ev.select(
        "user_id",
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
        "ts",
        "event_id",
        role.alias("role"),
        F.concat(
            F.lit("<"),
            role,
            F.lit("> "),
            F.col("event_type"),
            F.lit(" #"),
            F.col("event_id").cast("string"),
        ).alias("line"),
    )
    return turns.groupBy("user_id", "month").agg(
        F.count("*").alias("n_turns"),
        F.sum((F.col("role") == "assistant").cast("int"))
        .cast("long")
        .alias("n_assistant_turns"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("transcript"),
    )


# --- chat_context_trim ---------------------------------------------------------

#: whitespace-token budget for one packed conversation context.
CHAT_CONTEXT_BUDGET = 12


@register(
    "chat_context_trim",
    oracle=f"""
    WITH turns AS ({SQL_CHAT_TURNS}),
    costed AS (
      SELECT *, LEN(STRING_SPLIT(line, ' ')) AS turn_tokens FROM turns
    ), budgeted AS (
      SELECT *,
             SUM(turn_tokens) OVER (
               PARTITION BY user_id, month ORDER BY ts DESC, event_id DESC
               ROWS UNBOUNDED PRECEDING
             ) AS suffix_tokens
      FROM costed
    ), kept AS (
      SELECT * FROM budgeted WHERE suffix_tokens <= {CHAT_CONTEXT_BUDGET}
    )
    SELECT user_id, month, event_id, role, line,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id, month ORDER BY ts, event_id
           ) AS BIGINT) AS turn_idx,
           CAST(COALESCE(SUM(LENGTH(line) + 1) OVER (
             PARTITION BY user_id, month ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_char,
           CAST(COALESCE(SUM(LENGTH(line) + 1) OVER (
             PARTITION BY user_id, month ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) + LENGTH(line) AS BIGINT) AS end_char,
           role = 'assistant' AS loss_mask
    FROM kept
    """,
)
def chat_context_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window trimming with loss-mask offsets: keep the LAST
    turns of each conversation whose cumulative token cost fits the
    budget (a suffix-sum scan from the newest turn backwards — the
    sliding-context rule every chat trainer applies), then emit each
    surviving turn with its byte offsets inside the re-packed
    transcript and loss_mask = (role == 'assistant') — exactly the
    span the SFT loss trains on, prompt turns masked out.

    Scale: both window passes (descending budget scan, ascending
    offset scan) partition by the SAME conversation key, so Catalyst
    plans one Exchange feeding two Sort+Window pairs; state per group
    is one running integer. Token costs and offsets are integers —
    no rounding channel.
    """
    ev = load_table(spark, sf_dir, "events")
    role = (
        F.when(F.col("event_type").isin("view", "click"), "user")
        .when(F.col("event_type").isin("purchase", "signup"), "assistant")
        .otherwise("system")
    )
    turns = ev.select(
        "user_id",
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
        "ts",
        "event_id",
        role.alias("role"),
        F.concat(
            F.lit("<"),
            role,
            F.lit("> "),
            F.col("event_type"),
            F.lit(" #"),
            F.col("event_id").cast("string"),
        ).alias("line"),
    ).withColumn("turn_tokens", F.size(F.split("line", " ")).cast("long"))

    conv = Window.partitionBy("user_id", "month")
    suffix = (
        conv.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = turns.withColumn(
        "suffix_tokens", F.sum("turn_tokens").over(suffix)
    ).filter(F.col("suffix_tokens") <= CHAT_CONTEXT_BUDGET)

    fwd = conv.orderBy("ts", "event_id")
    prior_chars = (
        F.coalesce(
            F.sum(F.length("line") + 1).over(
                fwd.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
    ).cast("long")
    return kept.select(
        "user_id",
        "month",
        "event_id",
        "role",
        "line",
        F.row_number().over(fwd).cast("long").alias("turn_idx"),
        prior_chars.alias("start_char"),
        (prior_chars + F.length("line")).cast("long").alias("end_char"),
        (F.col("role") == "assistant").alias("loss_mask"),
    )


# --- corpus_sft_loss_mask -------------------------------------------------------


#: whitespace-token length of the instruction prefix (the prompt).
SFT_PROMPT_TOKENS = 8


@register(
    "corpus_sft_loss_mask",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text, LENGTH(text) AS n_chars,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LENGTH(ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:{SFT_PROMPT_TOKENS}],
                                    ' ')) AS prompt_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(prompt_chars AS BIGINT) AS prompt_chars,
           CAST(CASE WHEN n_tokens > {SFT_PROMPT_TOKENS}
                     THEN prompt_chars + 1 ELSE n_chars END AS BIGINT)
             AS mask_start,
           CAST(n_chars AS BIGINT) AS mask_end,
           n_tokens > {SFT_PROMPT_TOKENS} AS trainable,
           CAST(CASE WHEN n_tokens > {SFT_PROMPT_TOKENS}
                THEN LEN(REGEXP_EXTRACT_ALL(SUBSTRING(text, prompt_chars + 2),
                                            '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                ELSE 0 END AS BIGINT) AS masked_bpe_tokens
    FROM split
    """,
)
def corpus_sft_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt/response loss-mask spans over raw documents: the first
    {SFT_PROMPT_TOKENS} whitespace tokens are the instruction prefix
    (the prompt), the remainder is the response the SFT loss trains
    on. Emits the 0-based character span [mask_start, mask_end) where
    loss applies (mask_start skips the separating space), whether the
    document is trainable at all (has a non-empty response), and the
    BPE-ish token count inside the masked span — the per-doc loss
    budget the epoch scheduler sums.

    The prompt boundary is computed by re-joining the first
    {SFT_PROMPT_TOKENS} split tokens — split/slice/join are
    byte-identical in both engines, unlike locale-sensitive sentence
    segmentation; the masked-span token count reuses
    text_token_count's segmentation rule verbatim.

    Scale: single scan, all codegen, no shuffle — the same shape as
    text_quality_score. The span relation joins downstream against
    the pack/shard manifests by doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    prompt_chars = F.length(
        F.array_join(F.slice(toks, 1, SFT_PROMPT_TOKENS), " ")
    )
    trainable = n_tokens > SFT_PROMPT_TOKENS
    return docs.select(
        "doc_id",
        prompt_chars.cast("long").alias("prompt_chars"),
        F.when(trainable, prompt_chars + 1)
        .otherwise(n_chars)
        .cast("long")
        .alias("mask_start"),
        n_chars.cast("long").alias("mask_end"),
        trainable.alias("trainable"),
        F.when(
            trainable,
            F.size(
                F.regexp_extract_all(
                    F.substring(F.col("text"), prompt_chars + 2, F.lit(2**30)),
                    F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"),
                    0,
                )
            ),
        )
        .otherwise(0)
        .cast("long")
        .alias("masked_bpe_tokens"),
    )


# --- tokenizer_compression_eval -------------------------------------------------


@register(
    "tokenizer_compression_eval",
    oracle="""
    WITH tok AS (
      SELECT source,
             LENGTH(text) AS n_chars,
             LEN(STRING_SPLIT(text, ' ')) AS ws_tokens,
             LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
               AS bpe_tokens
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
           CAST(FLOOR(10000.0 * SUM(n_chars) / SUM(bpe_tokens)) AS BIGINT)
             AS chars_per_token_u4,
           CAST(FLOOR(10000.0 * SUM(bpe_tokens) / SUM(ws_tokens)) AS BIGINT)
             AS fertility_u4
    FROM tok GROUP BY source
    """,
)
def tokenizer_compression_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-efficiency evaluation per source — the go/no-go
    numbers before committing a vocab to a full-corpus tokenization
    pass: compression (chars per token; higher = cheaper training)
    and fertility (subword tokens per whitespace word; a
    language/domain skew detector — sources whose fertility is high
    get systematically fewer effective words into the same context
    window). Ratios are FLOOR 1e-4 fixed-point over exact integer
    sums.

    Scale: per-doc token counts are a scan-stage projection; one
    aggregate on `source` with map-side partials. The evaluation
    costs one corpus scan, which is why it runs BEFORE the
    full tokenize-and-pack pass, not after.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        )
        .cast("long")
        .alias("bpe_tokens"),
    )
    return tok.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("ws_tokens").cast("long").alias("total_ws_tokens"),
        F.sum("bpe_tokens").cast("long").alias("total_bpe_tokens"),
        F.floor(F.lit(10000.0) * F.sum("n_chars") / F.sum("bpe_tokens"))
        .cast("long")
        .alias("chars_per_token_u4"),
        F.floor(F.lit(10000.0) * F.sum("bpe_tokens") / F.sum("ws_tokens"))
        .cast("long")
        .alias("fertility_u4"),
    )


# --- feature_minmax_scale --------------------------------------------------------


@register(
    "feature_minmax_scale",
    oracle="""
    WITH fit AS (
      SELECT l_returnflag,
             MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           l.l_extendedprice,
           CAST(FLOOR(1000000.0 * (l.l_extendedprice - f.lo) / (f.hi - f.lo))
                AS BIGINT) AS scaled_u6
    FROM lineitem l JOIN fit f ON l.l_returnflag = f.l_returnflag
    """,
)
def feature_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped min-max scaler, fit + apply in one plan: per-group
    [lo, hi] fitted from the data, every row rescaled to [0, 1]
    emitted as FLOOR 1e-6 fixed-point. (x - lo) and the division are
    the same IEEE operations on the same doubles in both engines, and
    FLOOR of an identical double is identical — the exact-emission
    discipline for derived floats.

    Scale: the fit is a 3-row aggregate (map-side partials, one tiny
    shuffle); the apply is a BROADCAST join of those 3 rows onto the
    fact scan — zero fact shuffles, the standard fit/apply split of
    every feature pipeline. At 100 TB the fit result is still 3 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    fit = li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    return li.join(F.broadcast(fit), "l_returnflag").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_extendedprice",
        F.floor(
            F.lit(1000000.0)
            * (F.col("l_extendedprice") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
        )
        .cast("long")
        .alias("scaled_u6"),
    )


# --- feature_woe_binning ----------------------------------------------------------

#: fixed bin width over o_totalprice. Fixed-width binning (not NTILE)
#: is deliberate: it needs NO global sort, bins are a scan-stage
#: projection, and the bin id of a row never changes when the corpus
#: grows — the property that lets the fit be refreshed incrementally.
WOE_BIN_WIDTH = 25000.0


@register(
    "feature_woe_binning",
    oracle=f"""
    WITH labeled AS (
      SELECT CAST(FLOOR(o_totalprice / {WOE_BIN_WIDTH}) AS BIGINT) AS bin_id,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      FROM orders
    ), bins AS (
      SELECT bin_id,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(1 - pos) AS BIGINT) AS n_neg
      FROM labeled GROUP BY bin_id
    ), tot AS (
      -- BIGINT casts: DuckDB SUM yields HUGEINT, whose products would
      -- surface as float64 in the driver's hash while Spark emits long
      SELECT CAST(SUM(n_pos) AS BIGINT) AS tot_pos,
             CAST(SUM(n_neg) AS BIGINT) AS tot_neg FROM bins
    )
    SELECT b.bin_id, b.n_pos, b.n_neg,
           CAST(b.n_pos * t.tot_neg AS BIGINT) AS odds_num,
           CAST(b.n_neg * t.tot_pos AS BIGINT) AS odds_den,
           CASE WHEN b.n_neg > 0 AND b.n_pos > 0
                THEN CAST(FLOOR(1000000.0 * (b.n_pos * t.tot_neg)
                                / (b.n_neg * t.tot_pos)) AS BIGINT)
                ELSE NULL END AS odds_ratio_u6
    FROM bins b CROSS JOIN tot t
    """,
)
def feature_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning sufficient statistics: fixed-width
    bins over o_totalprice, label = order fully shipped
    (o_orderstatus = 'F'), per-bin positive/negative counts and the
    EXACT odds ratio (n_pos/tot_pos)/(n_neg/tot_neg) as an integer
    rational plus FLOOR 1e-6 units. WOE itself is ln(odds_ratio) —
    strictly monotone in the emitted rational — so the log stays with
    the consumer and no transcendental enters the cross-engine hash
    (Math.log and libm may differ in the last ulp; integer rationals
    cannot).

    Bins are fixed-width, NOT NTILE: bin assignment is a scan-stage
    FLOOR with no global sort, and a row's bin never changes as data
    grows, so the fit refreshes incrementally — the same reasoning
    that moved corpus_quality_histogram off the rounded-double
    comparator in round 12.

    Scale: one aggregate to bin-cardinality rows, then a broadcast
    1-row totals join — the agg_global composition pattern. The fact
    table is scanned once.
    """
    orders = load_table(spark, sf_dir, "orders")
    labeled = orders.select(
        F.floor(F.col("o_totalprice") / WOE_BIN_WIDTH)
        .cast("long")
        .alias("bin_id"),
        (F.col("o_orderstatus") == "F").cast("int").alias("pos"),
    )
    bins = labeled.groupBy("bin_id").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("long").alias("n_neg"),
    )
    tot = bins.agg(
        F.sum("n_pos").alias("tot_pos"), F.sum("n_neg").alias("tot_neg")
    )
    ratio_ok = (F.col("n_neg") > 0) & (F.col("n_pos") > 0)
    return bins.crossJoin(F.broadcast(tot)).select(
        "bin_id",
        "n_pos",
        "n_neg",
        (F.col("n_pos") * F.col("tot_neg")).alias("odds_num"),
        (F.col("n_neg") * F.col("tot_pos")).alias("odds_den"),
        F.when(
            ratio_ok,
            F.floor(
                F.lit(1000000.0)
                * (F.col("n_pos") * F.col("tot_neg"))
                / (F.col("n_neg") * F.col("tot_pos"))
            ).cast("long"),
        ).alias("odds_ratio_u6"),
    )
