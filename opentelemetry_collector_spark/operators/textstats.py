"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

These are the training-data-pipeline operators a 100 TB corpus needs in front
of dedup/filtering. They have no reference analog in the collector (which
never inspects payload text beyond routing — SURVEY §2.8); semantics are the
standard corpus-curation ones, expressed entirely in native Spark SQL
functions (JVM-side, whole-stage codegen — no Python in the hot path).

Every operator has an exactly-matching DuckDB oracle. Parity rules used
throughout: integer-derived arithmetic only (bit-exact in IEEE double),
identical operation order on both sides, md5 for any hashing (identical hex
in both engines), round() only on already-deterministic values.

Scale notes: all ops here are narrow per-row projections — no shuffle, no
skew surface; they pipeline into the scan and prune to (doc_id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# corpus-tuned marker sets (deterministic heuristic, not a trained model)
STOPWORDS = ("the", "a", "big", "small", "fast", "slow")
LANG_MARKERS = {
    "en": ("the", "and", "customer", "order"),
    "db": ("table", "query", "row", "scan"),
    "spark": ("spark", "shuffle", "agg", "partition"),
}
FP_PREFIX_CHARS = 128  # fingerprint window (winnowing-style, first 128 chars)
FP_SHINGLE = 8  # char-shingle width for the rolling-hash fingerprint


def _docs(spark, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    return docs if docs is not None else spark.read.parquet(
        f"{sf_dir}/documents.parquet"
    )


def _n_spaces() -> Column:
    return F.length("text") - F.length(F.regexp_replace("text", " ", ""))


def _occurrences(marker: str) -> Column:
    """Substring occurrence count via length arithmetic (engine-portable)."""
    return (
        (F.length("text") - F.length(F.expr(f"replace(text, '{marker}', '')")))
        / len(marker)
    ).cast("long")


def doc_tokens(spark, sf_dir: str) -> DataFrame:
    """Whitespace word count + a BPE-ish char/4 token estimate."""
    n_words = (_n_spaces() + F.lit(1)).cast("long")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        n_words.alias("n_words"),
        F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_tokens_bpe"),
    )


DOC_TOKENS_ORACLE = """
SELECT doc_id,
    cast(n_chars AS bigint) AS n_chars,
    cast(length(text) - length(replace(text, ' ', '')) + 1 AS bigint) AS n_words,
    cast(ceil(n_chars / 4.0) AS bigint) AS n_tokens_bpe
FROM documents
"""


def doc_quality(spark, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """Quality features + a deterministic [0,1] score: unique-word ratio,
    stopword ratio, length saturation. Identical formula (and operation
    order) on the oracle side so doubles are bit-equal."""
    df = _docs(spark, sf_dir, docs=docs)
    words = F.split(F.col("text"), " ")
    sw_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_words = F.size(words).cast("long")
    n_uniq = F.size(F.array_distinct(words)).cast("long")
    n_stop = F.expr(
        f"cast(size(filter(split(text, ' '), w -> w IN ({sw_list}))) AS bigint)"
    )
    uniq_ratio = n_uniq / n_words
    stop_ratio = n_stop / n_words
    sat = F.least(F.lit(1.0), n_words / 50.0)
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        n_uniq.alias("n_uniq_words"),
        n_stop.alias("n_stopwords"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(
            uniq_ratio * 0.5 + (F.lit(1.0) - stop_ratio) * 0.3 + sat * 0.2, 6
        ).alias("quality_score"),
    )


_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)
DOC_QUALITY_ORACLE = f"""
SELECT doc_id, n_words, n_uniq_words, n_stopwords,
    round(n_uniq_words / n_words, 6) AS uniq_ratio,
    round(n_stopwords / n_words, 6) AS stopword_ratio,
    round((n_uniq_words / n_words) * 0.5 + (1.0 - n_stopwords / n_words) * 0.3
          + least(1.0, n_words / 50.0) * 0.2, 6) AS quality_score
FROM (
    SELECT doc_id,
        cast(len(string_split(text, ' ')) AS bigint) AS n_words,
        cast(len(list_distinct(string_split(text, ' '))) AS bigint) AS n_uniq_words,
        cast(len(list_filter(string_split(text, ' '),
                             w -> w IN ({_SW_SQL}))) AS bigint) AS n_stopwords
    FROM documents
) q
"""


def doc_langid(spark, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """N-gram-marker language/domain ID: per-class marker occurrence scores,
    argmax with a fixed class order for ties. A real deployment swaps the
    marker table for per-language char-n-gram frequencies — the plan shape
    (pure projection, broadcastable marker lists) is the same."""
    df = _docs(spark, sf_dir, docs=docs)
    scores = {
        lang: sum((_occurrences(m) for m in ms), F.lit(0).cast("long"))
        for lang, ms in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["spark"] >= scores["db"]) & (scores["spark"] >= scores["en"]),
            F.lit("spark"),
        )
        .when(scores["db"] >= scores["en"], F.lit("db"))
        .otherwise(F.lit("en"))
    )
    return df.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        pred.alias("pred_class"),
    )


def _occ_sql(marker: str) -> str:
    return f"(length(text) - length(replace(text, '{marker}', ''))) / {len(marker)}"


def _score_sql(lang: str) -> str:
    return "cast(" + " + ".join(_occ_sql(m) for m in LANG_MARKERS[lang]) + " AS bigint)"


DOC_LANGID_ORACLE = f"""
SELECT doc_id, lang, score_en, score_db, score_spark,
    CASE WHEN score_spark >= score_db AND score_spark >= score_en THEN 'spark'
         WHEN score_db >= score_en THEN 'db'
         ELSE 'en' END AS pred_class
FROM (
    SELECT doc_id, lang,
        {_score_sql('en')} AS score_en,
        {_score_sql('db')} AS score_db,
        {_score_sql('spark')} AS score_spark
    FROM documents
) q
"""


# --- deterministic sampling / splitting (training-data mixing) --------------
#
# Both use an md5-derived integer: identical text in both engines
# (Spark conv(hex,16,10) == DuckDB cast('0x'||hex AS bigint)), so sampling
# is a pure function of doc_id — reproducible across runs, engines, and
# cluster sizes (no rand(), no partition dependence). At 10^12 rows this is
# a narrow projection + filter: no shuffle, trivially parallel.

SPLIT_FRACTIONS = (("train", 90), ("val", 5), ("test", 5))  # percent
# per-language keep rate (per-mille) — the data-mixing knob: downsample the
# dominant language, keep the tail intact
SAMPLE_RATES_PERMILLE = {"en": 500}
SAMPLE_DEFAULT_PERMILLE = 1000


def _hash_bucket(id_col: Column, modulus: int, salt: str) -> Column:
    return (
        F.conv(F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("bigint") % modulus
    )


def _hash_bucket_sql(id_expr: str, modulus: int, salt: str) -> str:
    return (
        f"cast(('0x' || substr(md5(cast({id_expr} AS string) || '{salt}'), 1, 8)) "
        f"AS bigint) % {modulus}"
    )


def _split_expr(bucket: Column) -> Column:
    """SPLIT_FRACTIONS as a CASE over a 0-99 bucket column — shared by
    doc_split and quality.doc_split_leakage_safe so both assign identical
    splits for the same group key."""
    edges = []
    lo = 0
    for name, pct in SPLIT_FRACTIONS:
        edges.append((name, lo, lo + pct))
        lo += pct
    expr = F.when(bucket < edges[0][2], F.lit(edges[0][0]))
    for name, lo_, hi in edges[1:-1]:
        expr = expr.when(bucket < hi, F.lit(name))
    return expr.otherwise(F.lit(edges[-1][0]))


def doc_split(spark, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by hashed doc_id
    ({SPLIT_FRACTIONS}): stable under re-runs and data growth (a doc never
    changes split when other docs are added)."""
    bucket = _hash_bucket(F.col("doc_id"), 100, ":split")
    return _docs(spark, sf_dir).select(
        "doc_id", "lang", bucket.cast("int").alias("split_bucket"),
        _split_expr(bucket).alias("split"),
    )


def _split_case_sql() -> str:
    parts, lo = [], 0
    for name, pct in SPLIT_FRACTIONS[:-1]:
        lo += pct
        parts.append(f"WHEN b < {lo} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{SPLIT_FRACTIONS[-1][0]}' END"


DOC_SPLIT_ORACLE = f"""
SELECT doc_id, lang, cast(b AS int) AS split_bucket, {_split_case_sql()} AS split
FROM (
    SELECT doc_id, lang, {_hash_bucket_sql('doc_id', 100, ':split')} AS b
    FROM documents
) q
"""


def corpus_sample(spark, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: per-language keep rates applied via
    hashed doc_id (the corpus-mixing step of a training pipeline)."""
    bucket = _hash_bucket(F.col("doc_id"), 1000, ":sample")
    rate = F.lit(SAMPLE_DEFAULT_PERMILLE)
    for lang, permille in SAMPLE_RATES_PERMILLE.items():
        rate = F.when(F.col("lang") == lang, F.lit(permille)).otherwise(rate)
    return (
        _docs(spark, sf_dir)
        .filter(bucket < rate)
        .select("doc_id", "lang", "source")
    )


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {pm}"
        for lang, pm in SAMPLE_RATES_PERMILLE.items()
    )
    return f"CASE {whens} ELSE {SAMPLE_DEFAULT_PERMILLE} END"


CORPUS_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source,
        {_hash_bucket_sql('doc_id', 1000, ':sample')} AS b,
        {_rate_case_sql()} AS rate
    FROM documents
) q WHERE b < rate
"""


def doc_fingerprint(spark, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """Document fingerprints: whole-text md5 + a winnowing-style rolling-hash
    fingerprint (min md5 over {FP_SHINGLE}-char shingles of the first
    {FP_PREFIX_CHARS} chars) that is stable under suffix edits."""
    df = _docs(spark, sf_dir, docs=docs)
    return df.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.expr(
            f"array_min(transform(sequence(1, greatest(length(substr(text, 1, "
            f"{FP_PREFIX_CHARS})) - {FP_SHINGLE - 1}, 1)), "
            f"i -> md5(substr(text, i, {FP_SHINGLE}))))"
        ).alias("prefix_fp"),
    )


DOC_FINGERPRINT_ORACLE = f"""
SELECT doc_id,
    md5(text) AS text_md5,
    list_min(list_transform(range(1, greatest(length(substr(text, 1,
        {FP_PREFIX_CHARS})) - {FP_SHINGLE - 1}, 1) + 1),
        i -> md5(substr(text, i, {FP_SHINGLE})))) AS prefix_fp
FROM documents
"""


def corpus_curation(spark, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """End-to-end curation: quality-gate -> near-dup canonical selection ->
    class tag. One composed Catalyst plan (the workflow a training-data
    pipeline runs before tokenization):

    1. drop docs with quality_score < 0.55;
    2. among surviving near-dups (prefix-fingerprint groups — the cheap
       first-pass dedup), keep the lowest doc_id;
    3. tag with the langid class.

    All three stages reuse the oracle-checked operators; the composition
    stays one scan + one window (fingerprint grouping).
    """
    from pyspark.sql.window import Window

    q = doc_quality(spark, sf_dir, docs=docs).select("doc_id", "quality_score")
    fp = doc_fingerprint(spark, sf_dir, docs=docs).select("doc_id", "prefix_fp")
    lang = doc_langid(spark, sf_dir, docs=docs).select("doc_id", "pred_class")
    kept = (
        q.filter(F.col("quality_score") >= 0.55)
        .join(fp, "doc_id")
        .join(lang, "doc_id")
    )
    w = Window.partitionBy("prefix_fp")
    return (
        kept.withColumn("canonical_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("canonical_id"))
        .select("doc_id", "quality_score", "prefix_fp", "pred_class")
    )


CORPUS_CURATION_ORACLE = f"""
WITH q AS ({DOC_QUALITY_ORACLE}),
fp AS ({DOC_FINGERPRINT_ORACLE}),
lang AS ({DOC_LANGID_ORACLE}),
kept AS (
    SELECT q.doc_id, q.quality_score, fp.prefix_fp, lang.pred_class
    FROM q JOIN fp ON q.doc_id = fp.doc_id
    JOIN lang ON q.doc_id = lang.doc_id
    WHERE q.quality_score >= 0.55
)
SELECT doc_id, quality_score, prefix_fp, pred_class FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY prefix_fp) AS canonical_id
    FROM kept
) c WHERE doc_id = canonical_id
"""


# --- repetition filtering (Gopher-style rules) ------------------------------

# Gopher repetition-filter thresholds (Rae et al. 2021, "Scaling Language
# Models", appendix A1.1): a doc whose most frequent word or 2-gram covers
# too much of it is boilerplate/repetitive and is dropped before training.
TOP_WORD_FRAC_MAX = 0.10
TOP_BIGRAM_FRAC_MAX = 0.18


def _word_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, ws, i) with 1-based word index — the shared explode for
    unigram/bigram stats. `sequence(1, size)` mirrors DuckDB
    generate_series(1, len) exactly (both inclusive, both ascending for
    size >= 1; docs are non-empty so the descending-sequence trap for
    size = 0 cannot fire)."""
    d = docs.select("doc_id", F.split("text", " ").alias("ws"))
    return d.select(
        "doc_id", "ws", F.explode(F.expr("sequence(1, size(ws))")).alias("i")
    )


def doc_repetition(spark, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """Gopher-style repetition metrics per doc: top-word fraction,
    duplicate-word fraction, top-bigram fraction, and a drop flag.

    No reference analog (collector never inspects payload text — SURVEY
    §2.8 gap-filler); semantics follow the public Gopher repetition rules,
    word-level because the synthetic corpus is single-line.

    Scale: two count aggregations keyed by doc_id (+ the word/bigram
    sub-key) and a doc_id join — partial aggregation is map-side, keys are
    per-document so there is no skew surface; survives a 100x corpus.
    """
    pos = _word_positions(_docs(spark, sf_dir, docs=docs))
    uni = pos.select("doc_id", F.expr("element_at(ws, i)").alias("word"))
    uc = uni.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    us = uc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.max("cnt").alias("top_word_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "dup_word_cnt"
        ),
    )
    bi = pos.filter(F.col("i") < F.size("ws")).select(
        "doc_id",
        F.expr("concat(element_at(ws, i), ' ', element_at(ws, i + 1))").alias(
            "bg"
        ),
    )
    bc = bi.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    bs = bc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.max("cnt").alias("top_bigram_cnt"),
    )
    joined = us.join(bs, "doc_id", "left")
    top_word_frac = F.col("top_word_cnt") / F.col("n_words")
    top_bigram_frac = F.col("top_bigram_cnt") / F.col("n_bigrams")
    return joined.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        top_word_frac.alias("top_word_frac"),
        (F.col("dup_word_cnt") / F.col("n_words")).alias("dup_word_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        (
            (top_word_frac > TOP_WORD_FRAC_MAX)
            | (top_bigram_frac > TOP_BIGRAM_FRAC_MAX)
        ).alias("repetitive"),
    )


DOC_REPETITION_ORACLE = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pos AS (
    SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM d
),
uc AS (
    SELECT doc_id, ws[i] AS word, count(*) AS cnt
    FROM pos GROUP BY 1, 2
),
us AS (
    SELECT doc_id,
        cast(sum(cnt) AS bigint) AS n_words,
        cast(max(cnt) AS bigint) AS top_word_cnt,
        cast(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS bigint)
            AS dup_word_cnt
    FROM uc GROUP BY 1
),
bc AS (
    SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg, count(*) AS cnt
    FROM pos WHERE i < len(ws) GROUP BY 1, 2
),
bs AS (
    SELECT doc_id,
        cast(sum(cnt) AS bigint) AS n_bigrams,
        cast(max(cnt) AS bigint) AS top_bigram_cnt
    FROM bc GROUP BY 1
)
SELECT us.doc_id, us.n_words,
    us.top_word_cnt / us.n_words AS top_word_frac,
    us.dup_word_cnt / us.n_words AS dup_word_frac,
    bs.top_bigram_cnt / bs.n_bigrams AS top_bigram_frac,
    (us.top_word_cnt / us.n_words > {TOP_WORD_FRAC_MAX}
     OR bs.top_bigram_cnt / bs.n_bigrams > {TOP_BIGRAM_FRAC_MAX})
        AS repetitive
FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
"""


# --- benchmark-contamination tagging ----------------------------------------

CONTAM_SHINGLE_WORDS = 4
CONTAM_BENCH_MOD = 23  # doc_id % 23 == 0 -> the held-out "benchmark" set


def contamination_tag(spark, sf_dir: str) -> DataFrame:
    """Tag training docs that share a CONTAM_SHINGLE_WORDS-word shingle
    with the benchmark set (docs with doc_id % CONTAM_BENCH_MOD == 0) —
    the decontamination step every training pipeline runs against its eval
    suites (n-gram-overlap method per GPT-3/PaLM appendix practice).

    Scale: the benchmark shingle set is tiny relative to the corpus ->
    broadcast hash join against a single corpus-side scan; shingles are
    md5-keyed (fixed width). Per-doc distinct bounds the fan-out; no skew
    surface beyond shingle popularity, which the broadcast join absorbs.
    """
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= CONTAM_SHINGLE_WORDS)
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(1, size(ws) - {CONTAM_SHINGLE_WORDS - 1})")
        ).alias("i"),
        "ws",
    ).select(
        "doc_id",
        F.md5(
            F.array_join(
                F.expr(f"slice(ws, i, {CONTAM_SHINGLE_WORDS})"), " "
            )
        ).alias("sh"),
    ).distinct()
    bench = (
        sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
        .select("sh")
        .distinct()
    )
    train = sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .select(
            "doc_id",
            F.col("n_shared_shingles").cast("long").alias(
                "n_shared_shingles"
            ),
        )
    )


CONTAMINATION_ORACLE = f"""
WITH d AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    WHERE len(string_split(text, ' ')) >= {CONTAM_SHINGLE_WORDS}
),
sh AS (
    SELECT DISTINCT doc_id,
        md5(array_to_string(
            list_slice(ws, i, i + {CONTAM_SHINGLE_WORDS - 1}), ' ')) AS sh
    FROM (
        SELECT doc_id, ws,
            unnest(generate_series(1, len(ws) - {CONTAM_SHINGLE_WORDS - 1}))
                AS i
        FROM d
    ) q
),
bench AS (
    SELECT DISTINCT sh FROM sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0
)
SELECT s.doc_id, cast(count(*) AS bigint) AS n_shared_shingles
FROM sh s JOIN bench b USING (sh)
WHERE s.doc_id % {CONTAM_BENCH_MOD} <> 0
GROUP BY s.doc_id
"""


# --- corpus unigram language model (CCNet-style LM quality filter) -----------

UNIGRAM_MIN_COUNT = 2  # words below this corpus count are OOV (floor prob)
VOCAB_TOPK = 50  # tokenizer-vocabulary induction: Zipf head size


def _tokens(spark, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """(doc_id, word) pairs: lowercase whitespace tokenization, empty
    tokens dropped — one explode over a (doc_id, text) projection."""
    return (
        _docs(spark, sf_dir, docs=docs)
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
        )
        .filter(F.length("w") > 0)
    )


def train_unigram_model(
    spark, sf_dir: str, docs: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """Train the unigram LM side-tables from the corpus: ``(vocab, tot)``
    where vocab = (w, c) for words with corpus count >= UNIGRAM_MIN_COUNT
    and tot = the 1-row total token count (double ``n``).

    Production shape: run once, write both to parquet, and pass the
    reloaded frames to ``doc_unigram_ll(model=...)`` — the scoring pass is
    then a SINGLE corpus scan (plan-guarded in tests/test_plans.py). The
    vocab aggregate shuffles words once; map-side combine absorbs Zipf
    skew (hot words partial-aggregate per partition)."""
    toks = _tokens(spark, sf_dir, docs=docs)
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= UNIGRAM_MIN_COUNT)
    )
    tot = toks.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return vocab, tot


def doc_unigram_ll(
    spark,
    sf_dir: str,
    model: tuple[DataFrame, DataFrame] | None = None,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document unigram log-likelihood under a unigram LM — the
    CCNet/Gopher-style statistical quality filter (perplexity filtering
    with a unigram model standing in for KenLM: the Spark plan shape —
    broadcast model join + per-doc aggregate — is identical).

    Model: p(w) = count(w)/N; words absent from the vocab side-table are
    out-of-vocabulary and score the floor prob 1/N (add-nothing backoff,
    deterministic). ``model`` is the (vocab, tot) pair from
    ``train_unigram_model`` (or the same tables reloaded from storage);
    when omitted the model self-trains on the scored corpus — the oracle
    shape, costing a second corpus scan.

    Cross-engine exactness: per-token log-probs are quantized to integer
    milli-nats BEFORE summing (``round(ln(c/N)*1000) -> bigint``) — each
    token's value derives from the same two integers in both engines, and
    integer sums are order-independent, so no float-accumulation-order
    hazard (the file-header parity rule).

    Scale: with a precomputed model the scoring pass is ONE corpus scan;
    the model join is a broadcast (a count>=2 vocab is bounded by corpus
    vocabulary, ~10M rows at 100 TB — still broadcastable at ~100 MB);
    the per-doc aggregate shuffles on doc_id (uniform key, no skew).
    """
    toks = _tokens(spark, sf_dir, docs=docs)
    vocab, tot = model if model is not None else train_unigram_model(
        spark, sf_dir, docs=docs
    )
    logp_milli = F.round(
        F.log(F.coalesce(F.col("c"), F.lit(1)).cast("double") / F.col("n"))
        * 1000.0
    ).cast("long")
    agg = (
        toks.join(F.broadcast(vocab), "w", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("c").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("oov_tokens"),
            F.sum(logp_milli).cast("long").alias("ll_milli"),
        )
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "oov_tokens",
        "ll_milli",
        (F.col("ll_milli").cast("double") / F.col("n_tokens").cast("double"))
        .alias("avg_logp_milli"),
    )


DOC_UNIGRAM_LL_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
    ) t WHERE length(w) > 0
),
vocab AS (
    SELECT w, count(*) AS c FROM toks GROUP BY w
    HAVING count(*) >= {UNIGRAM_MIN_COUNT}
),
tot AS (SELECT cast(count(*) AS double) AS n FROM toks)
SELECT doc_id,
    cast(count(*) AS bigint) AS n_tokens,
    cast(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS bigint) AS oov_tokens,
    cast(sum(cast(round(ln(cast(coalesce(c, 1) AS double) / n) * 1000)
        AS bigint)) AS bigint) AS ll_milli,
    cast(sum(cast(round(ln(cast(coalesce(c, 1) AS double) / n) * 1000)
        AS bigint)) AS double) / cast(count(*) AS double) AS avg_logp_milli
FROM toks LEFT JOIN vocab USING (w), tot
GROUP BY doc_id
"""


def vocab_topk(spark, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary induction: the corpus's top-{VOCAB_TOPK} words
    by frequency (Zipf head), ties broken lexically so the ranking is
    total and engine-independent.

    Scale: groupBy(word) with map-side combine, then ``orderBy + limit``
    — Spark plans TakeOrderedAndProject (per-partition partial top-k, no
    global sort); the row_number window runs on the K survivors only.
    """
    from pyspark.sql.window import Window

    vocab = (
        _tokens(spark, sf_dir)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    top = vocab.orderBy(F.col("c").desc(), F.col("w")).limit(VOCAB_TOPK)
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w"))
    return top.withColumn(
        "rank", F.row_number().over(w_rank).cast("int")
    )


VOCAB_TOPK_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
    ) t WHERE length(w) > 0
),
vocab AS (SELECT w, cast(count(*) AS bigint) AS c FROM toks GROUP BY w)
SELECT w, c, cast(row_number() OVER (ORDER BY c DESC, w) AS int) AS rank
FROM vocab ORDER BY c DESC, w LIMIT {VOCAB_TOPK}
"""


TFIDF_TOPK = 3


def doc_tfidf_topk(
    spark, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Top-{TFIDF_TOPK} TF-IDF terms per document — the keyword/topic
    extraction step of corpus analytics (used for domain tagging and
    mixture construction). Cross-engine exact: idf is quantized to integer
    milli-nats from two integers (``round(ln(n_docs/df)*1000)``), the
    score is the integer product ``tf * idf_milli``, and ties break on the
    term string — a total order, so ranks are engine-independent.

    Scale: tf is one (doc_id, w) partial-agg groupBy; df is a vocab-sized
    aggregate joined back onto the tf stream with a SHUFFLE join on the
    term key — the vocabulary of a 100 TB corpus is unbounded (billions
    of distinct tokens), so it must never be broadcast (VERDICT r03);
    hot terms ("the" appears in every doc) are exactly the skewed-key
    case AQE's skew-join split handles, and the df aggregation itself is
    safe because partial (map-side) aggregation collapses each hot term
    to one row per task before the shuffle. Only the 1-row corpus count
    rides as a broadcast. The rank window partitions on doc_id —
    high-cardinality uniform key, each partition holding only the doc's
    distinct terms.
    """
    from pyspark.sql.window import Window

    toks = _tokens(spark, sf_dir, docs=docs)
    tf = toks.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = _docs(spark, sf_dir, docs=docs).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    idf_milli = F.round(
        F.log(F.col("n_docs") / F.col("df").cast("double")) * 1000.0
    ).cast("long")
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n))
        .withColumn("score_milli", (F.col("tf") * idf_milli).cast("long"))
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("score_milli").desc(), F.col("w")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select(
            "doc_id", F.col("w").alias("term"), "tf", "df",
            "score_milli", "rank",
        )
    )


DOC_TFIDF_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
    ) t WHERE length(w) > 0
),
tf AS (
    SELECT doc_id, w, cast(count(*) AS bigint) AS tf
    FROM toks GROUP BY 1, 2
),
dfreq AS (SELECT w, cast(count(*) AS bigint) AS df FROM tf GROUP BY 1),
n AS (SELECT cast(count(*) AS double) AS n_docs FROM documents),
scored AS (
    SELECT doc_id, w, tf, df,
        tf * cast(round(ln(n_docs / cast(df AS double)) * 1000)
                  AS bigint) AS score_milli
    FROM tf JOIN dfreq USING (w), n
)
SELECT doc_id, w AS term, tf, df, score_milli,
    cast(rank AS int) AS rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score_milli DESC, w) AS rank
    FROM scored
) q WHERE rank <= {TFIDF_TOPK}
"""


# --- sequence packing (token-budget grouping for training batches) -----------

PACK_BUDGET_TOKENS = 256  # tokens per training sequence
PACK_BUCKETS = 8  # parallel packing streams (hash-partitioned)


def corpus_pack(spark, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences
    ("sequence packing"): docs are hash-routed into {PACK_BUCKETS}
    independent packing streams, greedily packed in deterministic
    (md5-of-id) order — pack_seq = which budget window the doc's START
    offset falls in, so a doc belongs to exactly one pack and packs fill
    to the budget (straddling docs spill into the next pack, the greedy
    rule every packer uses when truncation is off).

    Scale: one shuffle on the pack bucket (uniform hash key), a running
    integer cumsum window per bucket, no skew surface — the same shape
    at 10^9 docs with PACK_BUCKETS scaled to the cluster (each stream's
    sort is partition-local).
    """
    from pyspark.sql.window import Window

    toks = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_tokens"),
            _hash_bucket(F.col("doc_id"), PACK_BUCKETS, ":pack").cast(
                "int"
            ).alias("pack_bucket"),
            F.md5(F.col("doc_id").cast("string")).alias("ord_key"),
        )
    )
    w = Window.partitionBy("pack_bucket").orderBy("ord_key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "pack_bucket",
        "n_tokens",
        "cum_tokens",
        F.floor(
            (F.col("cum_tokens") - F.col("n_tokens"))
            / PACK_BUDGET_TOKENS
        ).cast("int").alias("pack_seq"),
    )


CORPUS_PACK_ORACLE = f"""
SELECT doc_id, pack_bucket, n_tokens,
    cast(cum_tokens AS bigint) AS cum_tokens,
    cast(floor((cum_tokens - n_tokens) / {PACK_BUDGET_TOKENS}) AS int)
        AS pack_seq
FROM (
    SELECT doc_id, pack_bucket, n_tokens,
        sum(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY ord_key
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
    FROM (
        SELECT doc_id,
            cast(ceil(n_chars / 4.0) AS bigint) AS n_tokens,
            cast({_hash_bucket_sql('doc_id', PACK_BUCKETS, ':pack')} AS int)
                AS pack_bucket,
            md5(cast(doc_id AS string)) AS ord_key
        FROM documents
    ) t
) q
"""
