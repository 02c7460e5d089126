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


def _docs(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


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


def doc_quality(spark, sf_dir: str) -> DataFrame:
    """Quality features + a deterministic [0,1] score: unique-word ratio,
    stopword ratio, length saturation. Identical formula (and operation
    order) on the oracle side so doubles are bit-equal."""
    df = _docs(spark, sf_dir)
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


def doc_langid(spark, sf_dir: str) -> DataFrame:
    """N-gram-marker language/domain ID: per-class marker occurrence scores,
    argmax with a fixed class order for ties. A real deployment swaps the
    marker table for per-language char-n-gram frequencies — the plan shape
    (pure projection, broadcastable marker lists) is the same."""
    df = _docs(spark, sf_dir)
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


def doc_split(spark, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by hashed doc_id
    ({SPLIT_FRACTIONS}): stable under re-runs and data growth (a doc never
    changes split when other docs are added)."""
    bucket = _hash_bucket(F.col("doc_id"), 100, ":split")
    edges = []
    lo = 0
    for name, pct in SPLIT_FRACTIONS:
        edges.append((name, lo, lo + pct))
        lo += pct
    expr = F.when(bucket < edges[0][2], F.lit(edges[0][0]))
    for name, lo_, hi in edges[1:-1]:
        expr = expr.when(bucket < hi, F.lit(name))
    expr = expr.otherwise(F.lit(edges[-1][0]))
    return _docs(spark, sf_dir).select(
        "doc_id", "lang", bucket.cast("int").alias("split_bucket"),
        expr.alias("split"),
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


def doc_fingerprint(spark, sf_dir: str) -> DataFrame:
    """Document fingerprints: whole-text md5 + a winnowing-style rolling-hash
    fingerprint (min md5 over {FP_SHINGLE}-char shingles of the first
    {FP_PREFIX_CHARS} chars) that is stable under suffix edits."""
    df = _docs(spark, sf_dir)
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


def corpus_curation(spark, sf_dir: str) -> DataFrame:
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

    q = doc_quality(spark, sf_dir).select("doc_id", "quality_score")
    fp = doc_fingerprint(spark, sf_dir).select("doc_id", "prefix_fp")
    lang = doc_langid(spark, sf_dir).select("doc_id", "pred_class")
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
