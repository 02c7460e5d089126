"""Deterministic weighted sampling without replacement — priority
sampling (Duffield, Lund & Thorup 2007, JACM 54(6)) for picking a
k-document subset of a 10^12-row corpus where long/high-quality
documents should be proportionally more likely to survive.

How: every document gets a priority q_i = w_i / u_i with u_i uniform in
(0, 1]; the sample is the top-k by priority. Taking u_i from a
DETERMINISTIC md5-derived hash of the key (the repo's shared
`_h60` convention) makes the sample a pure function of the data — the
same property every dedup/sampling operator here relies on for oracle
parity and for crash-retried reruns producing identical output.

Engine parity note on the one float: q = w / (h + 1) is a SINGLE IEEE
double division of two exactly-representable integers — correctly
rounded and therefore bit-identical in the JVM and DuckDB (only
transcendental functions differ across libm implementations; +,-,*,/
may not). The emitted columns are integers only.

Scale shape: one scan, no shuffle of data rows — the top-k is
TakeOrderedAndProject (per-partition partial top-k, k rows to the
driver), the same plan the vocab_topk operator is guarded on. At
10^12 rows this is the only affordable weighted-sample shape; a
windowed rank would sort the world.

Collector analog: probabilistic head sampling keeps a hash-determined
FRACTION (processor/probabilisticsamplerprocessor — this repo's
`probabilistic_sampler`); priority sampling keeps a hash-determined
fixed-SIZE weighted subset. Same determinism contract, complementary
selection rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.sketch import _h60, _h60_sql

PSAMPLE_K = 20
PSAMPLE_SALT = ":psample"


def corpus_priority_sample(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    k: int = PSAMPLE_K,
    weight_col: str = "n_chars",
) -> DataFrame:
    """The PSAMPLE_K-document priority sample of the corpus weighted by
    ``weight_col``: (doc_id, weight, hkey), the k docs with the largest
    w / ((h + 1) / 2^60) — i.e. inclusion probability ~ min(1, w/tau).

    Zero-weight documents are never sampled (q = 0) and are filtered
    up front; ties (identical weight AND hash — only possible for
    duplicate doc_ids) break on doc_id for a total order."""
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = docs.select(
        "doc_id",
        F.col(weight_col).cast("long").alias("weight"),
        (_h60(F.col("doc_id"), PSAMPLE_SALT) + 1).alias("hkey"),
    ).filter(F.col("weight") >= 1)
    pri = F.col("weight").cast("double") / F.col("hkey").cast("double")
    return (
        cand.orderBy(pri.desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "weight", "hkey")
    )


PRIORITY_SAMPLE_ORACLE = f"""
WITH cand AS (
    SELECT doc_id,
           cast(n_chars AS bigint) AS weight,
           {_h60_sql("doc_id", PSAMPLE_SALT)} + 1 AS hkey
    FROM documents
    WHERE n_chars >= 1
)
SELECT doc_id, weight, hkey
FROM cand
ORDER BY cast(weight AS double) / cast(hkey AS double) DESC, doc_id
LIMIT {PSAMPLE_K}
"""


# --- deterministic global shuffle order (training curriculum) ----------------

SHUFFLE_SALT = ":shuffle"
SHUFFLE_BUCKETS = 256  # = 16^2: the first two md5 hex chars


def _shuffle_hash(col) -> "F.Column":
    return F.md5(F.concat(col.cast("string"), F.lit(SHUFFLE_SALT)))


def corpus_shuffle(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Deterministic global training order: (doc_id, order_idx) with
    order_idx a dense 0..N-1 permutation ordered by md5(doc_id) — the
    shuffle every epoch-0 training loader needs, as a pure function of
    the data (crash-retried reruns and the oracle see the same order).

    Scale shape — a global rank WITHOUT a global sort: the md5 key's
    first two hex chars give {SHUFFLE_BUCKETS} range buckets that are a
    PREFIX of the sort key, so (bucket, hash) order == hash order. Rank
    is then two-phase: (1) per-bucket counts -> cumulative offsets, a
    {SHUFFLE_BUCKETS}-row aggregate whose window runs on constant-bounded
    state; (2) row_number within each bucket (hash-partitioned exchange,
    uniform by construction — md5 buckets can't skew), plus the
    broadcast offset. This is the textbook distributed sort-rank; an
    un-bucketed ``row_number() OVER (ORDER BY h)`` would funnel 10^12
    rows through one partition."""
    from pyspark.sql.window import Window

    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashed = docs.select(
        "doc_id", _shuffle_hash(F.col("doc_id")).alias("h")
    ).withColumn(
        "bkt", F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
    )
    counts = hashed.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_off = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "bkt",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
        .cast("long")
        .alias("off"),
    )
    w_rk = Window.partitionBy("bkt").orderBy("h", "doc_id")
    return (
        hashed.join(F.broadcast(offsets), "bkt")
        .withColumn("rk", F.row_number().over(w_rk))
        .select(
            "doc_id",
            (F.col("off") + F.col("rk") - 1).cast("long").alias("order_idx"),
        )
    )


SHUFFLE_ORACLE = f"""
SELECT doc_id,
    cast(row_number() OVER (
        ORDER BY md5(cast(doc_id AS string) || '{SHUFFLE_SALT}'), doc_id
    ) - 1 AS bigint) AS order_idx
FROM documents
"""


# --- temperature-weighted source interleaving (training-mix order) -----------

ILEAVE_SALT = ":ileave"
ILEAVE_SCALE = 1_000_000  # key resolution; keys stay < 2^63 at 10^12 docs


def corpus_interleave(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Temperature-weighted source interleaving key (the multilingual /
    multi-source training-mix order, alpha = 0.5): (doc_id, source,
    src_rank, interleave_key). Sorting the corpus by (interleave_key,
    source, src_rank) yields a stream where source s appears at a rate
    proportional to sqrt(n_s) — the standard temperature flattening that
    up-samples small sources without starving large ones.

    Per source, docs are shuffled deterministically (md5 rank via the
    same two-phase bucket pattern as ``corpus_shuffle``, partitioned by
    (source, bucket) so a dominant source never lands in one partition)
    and the r-th doc (0-based) gets key = (2r+1)*{ILEAVE_SCALE} div
    (2*w_milli) with w_milli = floor(sqrt(n_s)*1000) — the midpoint rule
    that interleaves sources at their target rates. sqrt is
    IEEE-correctly-rounded (unlike libm transcendentals), and everything
    after it is integer arithmetic, so the emitted key is bit-identical
    across engines.

    The op emits the KEY rather than a global position: the consumer's
    sort/merge by key is the cheap part (or feeds the two-phase rank
    again), while the weights/ranks are the part worth materializing."""
    from pyspark.sql.window import Window

    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hashed = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(ILEAVE_SALT))
        ).alias("h"),
    ).withColumn(
        "bkt", F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
    )
    counts = hashed.groupBy("source", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_off = Window.partitionBy("source").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "source",
        "bkt",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
        .cast("long")
        .alias("off"),
    )
    weights = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_s"))
        .select(
            "source",
            F.floor(F.sqrt(F.col("n_s").cast("double")) * 1000)
            .cast("long")
            .alias("w_milli"),
        )
    )
    w_rk = Window.partitionBy("source", "bkt").orderBy("h", "doc_id")
    ranked = (
        hashed.join(F.broadcast(offsets), ["source", "bkt"])
        .withColumn("rk", F.row_number().over(w_rk))
        .select(
            "doc_id",
            "source",
            (F.col("off") + F.col("rk") - 1).cast("long").alias("src_rank"),
        )
    )
    return ranked.join(F.broadcast(weights), "source").select(
        "doc_id",
        "source",
        "src_rank",
        F.expr(
            f"((2 * src_rank + 1) * {ILEAVE_SCALE}L) div (2 * w_milli)"
        )
        .cast("long")
        .alias("interleave_key"),
    )


INTERLEAVE_ORACLE = f"""
WITH ranked AS (
    SELECT doc_id, source,
        cast(row_number() OVER (
            PARTITION BY source
            ORDER BY md5(cast(doc_id AS string) || '{ILEAVE_SALT}'), doc_id
        ) - 1 AS bigint) AS src_rank
    FROM documents
),
wts AS (
    SELECT source,
        cast(floor(sqrt(cast(count(*) AS double)) * 1000) AS bigint)
            AS w_milli
    FROM documents GROUP BY source
)
SELECT doc_id, source, src_rank,
    cast(((2 * src_rank + 1) * {ILEAVE_SCALE}) // (2 * w_milli) AS bigint)
        AS interleave_key
FROM ranked JOIN wts USING (source)
"""
