"""Distributed BPE tokenizer induction and encoding (Sennrich et al. 2016,
arXiv:1508.07909) — the subword-vocabulary training step of an LLM data
pipeline, re-expressed as Spark aggregations.

The reference collector has no tokenizer; this extends the engine's
training-data family (SURVEY §2 LLM ops) next to ``vocab_topk`` (word-level
vocabulary) with the standard subword method:

* ``bpe_train`` — learn the top-M merge rules. Classic BPE trains on the
  *word-frequency table*, not the raw corpus: one corpus scan builds
  ``(word, freq)`` (uniform md5-distributed keys, map-side combined), and
  every subsequent round touches only that vocabulary-sized frame. Each
  round is (a) adjacent-pair counting — a pure array expression
  (``zip_with`` over two ``slice`` views, no per-word shuffle) exploded
  into a freq-weighted partial aggregate on the ``(l, r)`` pair key, (b)
  the arg-max pair via ``TakeOrderedAndProject`` (count desc, then
  lexicographic — deterministic, engine-portable), collected to the driver
  as M-row iteration state exactly like ``embedding_kmeans`` materializes
  centroids, and (c) a greedy-leftmost merge applied per word by a
  higher-order ``aggregate`` fold. The symbol frame is persisted per round
  so round i+1 scans cached columns instead of re-folding rounds 1..i
  (bounded lineage — the kmeans discipline).

* ``bpe_encode`` — tokenize a corpus under learned merges. The merge list
  is M driver-side rows (broadcast-sized by construction); encoding folds
  the merges over the corpus' *distinct words* (OOV-free: the fold applies
  to any word, trained on it or not) and joins token counts back to the
  (doc_id, word) stream — so per-word work is paid once per distinct word,
  not once per occurrence.

Greedy-leftmost correctness of the fold: scanning symbols left to right,
merge when the accumulator's last element is ``lhs`` and the current symbol
is ``rhs``. After a merge the last element becomes ``lhs||rhs``, which can
never equal ``lhs`` again (that would need an empty ``rhs``), so a consumed
symbol can't double-merge, and runs of a self-pair ("aaaa" under (a,a))
merge at even offsets — the textbook non-overlapping scan. The DuckDB
oracle expresses the same semantics relationally: match positions →
gaps-and-islands over consecutive matches → keep even island offsets →
drop consumed successors → ``string_agg`` the survivors back in order.

Cross-engine exactness: pair counts are freq-weighted integer sums; the
arg-max tie-break is total (count desc, lhs asc, rhs asc); token counts are
integers — no float anywhere.

Scale (100 TB): the corpus is scanned ONCE (the word-frequency aggregate);
all M training rounds run on the vocabulary table (~10^7-10^8 rows at web
scale — partitioned, never collected). Driver state is the M merge rules
only. For production vocabularies (M ~ 32k) checkpoint the symbol frame
every K rounds (the persist below is that hook); the per-round pair
aggregate stays bounded by vocab × avg word length regardless of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.textstats import _tokens

BPE_MERGES = 8
END_OF_WORD = "</w>"

_MERGE_SCHEMA = (
    "rank int, lhs string, rhs string, merged string, pair_count long"
)


def _initial_symbols(word: Column) -> Column:
    """char-split + the end-of-word marker (Sennrich §3.2)."""
    return F.concat(
        F.expr("regexp_extract_all(word, '.', 0)"),
        F.array(F.lit(END_OF_WORD)),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (overlaps included, as
    in the reference algorithm's get_stats)."""
    n = F.greatest(F.size(syms) - 1, F.lit(0))
    return F.zip_with(
        F.slice(syms, 1, n),
        F.slice(syms, 2, n),
        lambda l, r: F.struct(l.alias("l"), r.alias("r")),
    )


def _apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """Greedy-leftmost merge of (lhs, rhs) -> lhs||rhs as a fold."""
    merged = lhs + rhs
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_frequencies(
    spark, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """(word, freq) over the corpus — the single corpus-wide scan."""
    return (
        _tokens(spark, sf_dir, docs=docs)
        .groupBy(F.col("w").alias("word"))
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def bpe_train(
    spark,
    sf_dir: str,
    merges: int = BPE_MERGES,
    docs: DataFrame | None = None,
    return_state: bool = False,
):
    """Learn the top-``merges`` BPE merge rules from the corpus.

    Returns the merge table (rank, lhs, rhs, merged, pair_count) — the
    model artifact a production run writes once and broadcasts everywhere.
    With ``return_state=True`` also returns the final per-word symbol
    frame (word, freq, syms) for encoding without re-folding.
    """
    state = word_frequencies(spark, sf_dir, docs=docs).select(
        "word", "freq", _initial_symbols(F.col("word")).alias("syms")
    )
    state = state.persist()
    learned: list[tuple[int, str, str, str, int]] = []
    to_unpersist: list[DataFrame] = [state]
    for rank in range(1, merges + 1):
        top = (
            state.select(
                F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq"
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("long").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, c = top[0].l, top[0].r, top[0].c
        learned.append((rank, lhs, rhs, lhs + rhs, c))
        state = state.withColumn(
            "syms", _apply_merge(F.col("syms"), lhs, rhs)
        ).persist()
        to_unpersist.append(state)
    merge_df = spark.createDataFrame(learned, schema=_MERGE_SCHEMA)
    if return_state:
        # caller owns the final frame; release the intermediates
        for df in to_unpersist[:-1]:
            df.unpersist(blocking=True)
        return merge_df, state
    # blocking: return the cache memory before the caller's next query —
    # async unpersist left rounds' blocks alive under back-to-back bench
    # queries sharing one heap
    for df in to_unpersist:
        df.unpersist(blocking=True)
    return merge_df


def bpe_encode(
    spark,
    sf_dir: str,
    merges: int = BPE_MERGES,
    docs: DataFrame | None = None,
    merge_rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-document BPE token counts under the learned merges:
    (doc_id, n_words, n_bpe_tokens, tokens_per_word).

    ``merge_rules`` is the production path — the M-row model from a prior
    ``bpe_train`` run (reloaded from storage), applied with NO training
    scans. When omitted the model self-trains on the scored corpus (the
    oracle shape, like ``doc_unigram_ll``'s self-trained mode).

    The folds run once per DISTINCT word; occurrence counts ride the
    (doc_id, word) aggregate, so corpus size only pays the token explode
    and two uniform-key aggregates.
    """
    if merge_rules is None:
        merge_rules = [
            (r.lhs, r.rhs)
            for r in bpe_train(spark, sf_dir, merges, docs=docs)
            .orderBy("rank")
            .collect()
        ]
    toks = _tokens(spark, sf_dir, docs=docs)
    per_word = toks.groupBy("doc_id", F.col("w").alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("occ")
    )
    syms = _initial_symbols(F.col("word"))
    for lhs, rhs in merge_rules:
        syms = _apply_merge(syms, lhs, rhs)
    vocab = (
        per_word.select("word")
        .distinct()
        .select("word", F.size(syms).cast("long").alias("n_sub"))
    )
    return (
        per_word.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").cast("long").alias("n_words"),
            F.sum(F.col("occ") * F.col("n_sub"))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            (
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_words").cast("double")
            ).alias("tokens_per_word"),
        )
    )


# --- DuckDB oracles ----------------------------------------------------------
#
# The merge loop unrolls into per-round CTE blocks (the embedding_kmeans /
# embedding_pq convention). Symbols travel as a space-joined string (symbols
# never contain spaces); each round is: adjacent-pair counts -> arg-max ->
# match positions -> islands of consecutive matches -> greedy starts at even
# island offsets -> drop consumed successors -> string_agg the new symbol
# string. The state CTEs (s{i}, mg{i}) are AS MATERIALIZED: DuckDB inlines
# plain CTEs, and s{i} is referenced twice per round — inlining would make
# the unrolled query exponential in the round count.

_TOKS_CTE = """
toks AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
    ) t WHERE length(w) > 0
),
words AS (
    SELECT w AS word, cast(count(*) AS bigint) AS freq FROM toks GROUP BY w
),
s0 AS MATERIALIZED (
    SELECT word, freq,
        array_to_string(
            list_append(regexp_extract_all(word, '.'), '</w>'), ' ') AS sym
    FROM words
)"""


def _round_ctes(i: int) -> str:
    prev = f"s{i - 1}"
    return f""",
p{i} AS (
    SELECT parts[j] AS l, parts[j + 1] AS r, cast(sum(freq) AS bigint) AS c
    FROM (
        SELECT freq, parts,
            unnest(generate_series(1, len(parts) - 1)) AS j
        FROM (SELECT freq, string_split(sym, ' ') AS parts FROM {prev}) q
    ) e GROUP BY l, r
),
mg{i} AS MATERIALIZED (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1),
tk{i} AS (
    SELECT word, freq, j, parts[j] AS sm,
        CASE WHEN j < len(parts) THEN parts[j + 1] END AS nxt
    FROM (
        SELECT word, freq, parts,
            unnest(generate_series(1, len(parts))) AS j
        FROM (SELECT word, freq, string_split(sym, ' ') AS parts
              FROM {prev}) q
    ) e
),
mt{i} AS (
    SELECT word, freq, j, sm,
        coalesce(sm = (SELECT l FROM mg{i})
                 AND nxt = (SELECT r FROM mg{i}), false) AS matched
    FROM tk{i}
),
is{i} AS (
    SELECT word, freq, j, sm, matched,
        CASE WHEN matched THEN
            j - row_number() OVER (PARTITION BY word, matched ORDER BY j)
        END AS island
    FROM mt{i}
),
st{i} AS (
    SELECT word, freq, j, sm,
        matched AND (row_number() OVER (
            PARTITION BY word, island ORDER BY j) % 2 = 1) AS start
    FROM is{i}
),
cs{i} AS (
    SELECT word, freq, j, sm, start,
        coalesce(lag(start) OVER (PARTITION BY word ORDER BY j),
                 false) AS consumed
    FROM st{i}
),
s{i} AS MATERIALIZED (
    SELECT word, freq,
        string_agg(
            CASE WHEN start THEN sm || (SELECT r FROM mg{i}) ELSE sm END,
            ' ' ORDER BY j) AS sym
    FROM cs{i} WHERE NOT consumed GROUP BY word, freq
)"""


def _bpe_train_oracle(merges: int = BPE_MERGES) -> str:
    body = "WITH " + _TOKS_CTE.strip()
    for i in range(1, merges + 1):
        body += _round_ctes(i)
    selects = [
        f"SELECT {i} AS rank, l AS lhs, r AS rhs, l || r AS merged, "
        f"c AS pair_count FROM mg{i}"
        for i in range(1, merges + 1)
    ]
    return body + "\n" + "\nUNION ALL ".join(selects)


def _bpe_encode_oracle(merges: int = BPE_MERGES) -> str:
    body = "WITH " + _TOKS_CTE.strip()
    for i in range(1, merges + 1):
        body += _round_ctes(i)
    return (
        body
        + f"""
SELECT t.doc_id,
    cast(count(*) AS bigint) AS n_words,
    cast(sum(len(string_split(s.sym, ' '))) AS bigint) AS n_bpe_tokens,
    cast(sum(len(string_split(s.sym, ' '))) AS double)
        / cast(count(*) AS double) AS tokens_per_word
FROM toks t JOIN s{merges} s ON t.w = s.word
GROUP BY t.doc_id"""
    )


BPE_TRAIN_ORACLE = _bpe_train_oracle()
BPE_ENCODE_ORACLE = _bpe_encode_oracle()
