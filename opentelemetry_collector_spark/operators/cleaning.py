"""Web-corpus cleaning stages: PII masking and the C4 line/page filters.

The reference collector has no corpus operators (its redaction processor,
`processor/redactionprocessor`, masks span ATTRIBUTES — the trace-side
analog lives in operators/traces.py `redaction`); these extend the
engine's training-data family (SURVEY §2 LLM ops) with the two standard
public text-side treatments every web-scale corpus runs before training:

* ``doc_pii_scrub`` — typed PII masking (emails, IPv4 addresses,
  SSN-shaped ids, international phone numbers, long digit runs such as
  card/account numbers) with per-category replacement counts, the
  inspectable-filter discipline of ``doc_gopher_rules``. The category
  order is fixed (email → ip → ssn → phone → digit-run) and each count
  is taken on the text as it stands WHEN that category is scrubbed, so
  ``n_*`` is exactly the number of placeholders the stage inserted —
  no double counting when categories could overlap (a phone number
  contains digit runs; an email contains dots like an IPv4).
* ``doc_c4_filters`` — the C4 cleaning rules (Raffel et al. 2020,
  arXiv:1910.10683 §2.2): keep only lines that end in terminal
  punctuation, contain ≥{C4_MIN_LINE_WORDS} words, and do not mention
  javascript; drop pages with fewer than {C4_MIN_SENTENCES} sentences,
  pages containing curly braces, the phrase "lorem ipsum", or any
  configured bad word. (C4's remaining rule — the three-sentence-span
  dedup — is the substring family in operators/dedup.py.) Per-rule
  booleans plus ``keep`` and the line-filtered ``clean_text`` are all
  emitted, so the filter is auditable per document.

Scale notes (100 TB): both are single-scan pure projections — chained
``regexp_replace``/``regexp_count`` for PII, one higher-order
``filter``/``array_join`` over the line array for C4. No shuffle, no
join, no UDF; the plan is one ``Project`` over the scan at any corpus
size (guarded in tests/test_plans.py).

Engine-parity discipline: every pattern is written in the Java-regex ∩
RE2 common subset with NO backslash escapes (char classes like ``[.]``
and ``[+]`` instead), so the identical pattern string runs in Spark and
in the DuckDB oracle without SQL string-literal escaping hazards
(.claude/skills/verify gotcha), and all thresholds are integer
comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.textstats import _docs

# --- PII masking -------------------------------------------------------------

# (name, pattern, placeholder) in SCRUB ORDER. Patterns use the Java∩RE2
# subset with no backslashes; bounded quantifiers keep RE2 leftmost
# matching identical to Java's greedy matching here.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[0-9A-Za-z._%+-]+@[0-9A-Za-z.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "([0-9]{1,3}[.]){3}[0-9]{1,3}", "<IP>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", "[+][0-9]{1,3}[- ][0-9]{3,4}[- ][0-9]{3,4}([- ][0-9]{3,4})?",
     "<PHONE>"),
    ("digits", "[0-9]{13,19}", "<ID>"),
)


def doc_pii_scrub(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    project: bool = True,
) -> DataFrame:
    """Typed PII masking with per-category replacement counts.

    One codegen projection: the scrub is a fold of ``regexp_replace``
    calls in ``PII_PATTERNS`` order; ``n_<cat>`` counts matches on the
    text state at that fold step (= placeholders inserted).

    ``project=False`` is the processor position: text rewritten in
    place, ``n_chars`` refreshed, ``pii_total`` appended, every other
    column preserved.
    """
    df = _docs(spark, sf_dir, docs=docs)
    t: Column = F.col("text")
    counts: list[Column] = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).cast("long")
                      .alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, repl)
    total = sum(F.col(f"n_{c[0]}") for c in PII_PATTERNS)
    out = df.select(
        *df.columns, *counts, t.alias("scrubbed_text")
    ).withColumn("pii_total", total.cast("long"))
    if not project:
        return (
            out.withColumn("text", F.col("scrubbed_text"))
            .withColumn("n_chars", F.length("text").cast("long"))
            .drop("scrubbed_text", *[f"n_{c[0]}" for c in PII_PATTERNS])
        )
    return out.select(
        "doc_id",
        F.col("scrubbed_text").alias("text"),
        *[f"n_{c[0]}" for c in PII_PATTERNS],
        "pii_total",
        (F.col("pii_total") > 0).alias("has_pii"),
    )


def _pii_oracle() -> str:
    """DuckDB twin: same fold, same patterns; 'g' flag makes DuckDB's
    regexp_replace global like Spark's."""
    t = "text"
    count_cols = []
    for name, pat, repl in PII_PATTERNS:
        count_cols.append(
            f"cast(len(regexp_extract_all({t}, '{pat}')) AS bigint)"
            f" AS n_{name}"
        )
        t = f"regexp_replace({t}, '{pat}', '{repl}', 'g')"
    total = " + ".join(f"n_{c[0]}" for c in PII_PATTERNS)
    return f"""
SELECT doc_id, text, {", ".join(f"n_{c[0]}" for c in PII_PATTERNS)},
    cast({total} AS bigint) AS pii_total, ({total}) > 0 AS has_pii
FROM (
    SELECT doc_id, {t} AS text, {", ".join(count_cols)}
    FROM documents
) q
"""


DOC_PII_ORACLE = _pii_oracle()


# --- C4 line/page filters ----------------------------------------------------

C4_TERMINALS = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 3
C4_MIN_SENTENCES = 5
C4_SENTENCE_END = "[.!?]"


def _c4_line_keep(ln: Column) -> Column:
    lt = F.trim(ln)
    return (
        F.substring(lt, -1, 1).isin(*C4_TERMINALS)
        & (F.size(F.split(lt, " ")) >= C4_MIN_LINE_WORDS)
        & ~F.lower(lt).contains("javascript")
    )


def doc_c4_filters(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    bad_words: tuple[str, ...] = (),
    project: bool = True,
) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2): line filter + page rules.

    Line filter: a line survives iff (trimmed) it ends in one of
    ``C4_TERMINALS``, has ≥``C4_MIN_LINE_WORDS`` space-split words, and
    does not contain "javascript" (case-insensitive). Page rules:
    ``r_min_sentences`` (≥``C4_MIN_SENTENCES`` sentence enders in the
    KEPT text), ``r_no_brace`` (no ``{{``/``}}`` anywhere on the raw
    page), ``r_no_lorem`` ("lorem ipsum" absent, case-insensitive),
    ``r_no_badwords`` (no ``bad_words`` token among the page's
    space/newline-split words). ``keep`` is their conjunction plus at
    least one surviving line.

    ``project=False`` is the processor position: rows filtered to
    ``keep``, ``text`` rewritten to the line-filtered form, ``n_chars``
    refreshed, all other columns preserved.
    """
    df = _docs(spark, sf_dir, docs=docs)
    lines = F.split(F.col("text"), "\n")
    kept = F.filter(lines, _c4_line_keep)
    # explicit single-arg lambda: F.transform introspects callables and
    # would hand F.trim's optional second parameter the ELEMENT INDEX
    # (becoming the trim character set)
    clean = F.array_join(F.transform(kept, lambda ln: F.trim(ln)), "\n")
    words = F.split(F.replace(F.lower("text"), F.lit("\n"), F.lit(" ")), " ")
    no_bad = (
        ~F.arrays_overlap(words, F.array(*[F.lit(w) for w in bad_words]))
        if bad_words else F.lit(True)
    )
    cols = {
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept).cast("long"),
        "clean_text": clean,
        "n_sentences": F.regexp_count(clean, F.lit(C4_SENTENCE_END))
        .cast("long"),
    }
    rules = {
        "r_min_sentences": cols["n_sentences"] >= C4_MIN_SENTENCES,
        "r_no_brace": ~F.col("text").contains("{")
        & ~F.col("text").contains("}"),
        "r_no_lorem": ~F.lower("text").contains("lorem ipsum"),
        "r_no_badwords": no_bad,
    }
    keep = (
        rules["r_min_sentences"] & rules["r_no_brace"]
        & rules["r_no_lorem"] & rules["r_no_badwords"]
        & (cols["n_kept_lines"] >= 1)
    )
    if not project:
        return (
            df.withColumn("__clean", clean)
            .where(keep)
            .withColumn("text", F.col("__clean"))
            .withColumn("n_chars", F.length("text").cast("long"))
            .drop("__clean")
        )
    return df.select(
        "doc_id",
        *[c.alias(n) for n, c in cols.items()],
        *[c.alias(n) for n, c in rules.items()],
        keep.alias("keep"),
    )


def _c4_oracle(bad_words: tuple[str, ...] = ()) -> str:
    """DuckDB twin of doc_c4_filters(project=True). chr(10) avoids any
    newline-literal hazard in the SQL string."""
    terminals = ", ".join(f"'{t}'" if t != '"' else "'\"'"
                          for t in C4_TERMINALS)
    line_keep = (
        f"right(trim(ln), 1) IN ({terminals}) "
        f"AND len(string_split(trim(ln), ' ')) >= {C4_MIN_LINE_WORDS} "
        "AND NOT contains(lower(trim(ln)), 'javascript')"
    )
    bad = "TRUE"
    if bad_words:
        lst = ", ".join(f"'{w}'" for w in bad_words)
        bad = (
            "NOT list_has_any(string_split("
            "replace(lower(text), chr(10), ' '), ' '), "
            f"[{lst}])"
        )
    return f"""
SELECT doc_id, n_lines, n_kept_lines, clean_text, n_sentences,
    (n_sentences >= {C4_MIN_SENTENCES}) AS r_min_sentences,
    (NOT contains(text, chr(123)) AND NOT contains(text, chr(125)))
        AS r_no_brace,
    (NOT contains(lower(text), 'lorem ipsum')) AS r_no_lorem,
    ({bad}) AS r_no_badwords,
    ((n_sentences >= {C4_MIN_SENTENCES})
     AND (NOT contains(text, chr(123)) AND NOT contains(text, chr(125)))
     AND (NOT contains(lower(text), 'lorem ipsum'))
     AND ({bad}) AND n_kept_lines >= 1) AS keep
FROM (
    SELECT doc_id, text,
        cast(len(string_split(text, chr(10))) AS bigint) AS n_lines,
        cast(len(list_filter(string_split(text, chr(10)),
                             ln -> {line_keep})) AS bigint) AS n_kept_lines,
        -- array_to_string([]) is NULL in DuckDB where Spark's array_join
        -- gives '' — coalesce for parity on zero-kept-line docs
        coalesce(array_to_string(list_transform(
            list_filter(string_split(text, chr(10)), ln -> {line_keep}),
            ln -> trim(ln)), chr(10)), '') AS clean_text,
        cast(len(regexp_extract_all(coalesce(array_to_string(list_transform(
            list_filter(string_split(text, chr(10)), ln -> {line_keep}),
            ln -> trim(ln)), chr(10)), ''), '{C4_SENTENCE_END}')) AS bigint)
            AS n_sentences
    FROM documents
) q
"""


DOC_C4_ORACLE = _c4_oracle()
