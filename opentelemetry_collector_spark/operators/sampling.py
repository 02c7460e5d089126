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
