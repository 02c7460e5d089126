"""Cross-tick corpus dedup — exact dedup against a persistent fingerprint
ledger, composing the training-data dedup operators with the incremental
ingest/checkpoint layer (SURVEY §2.5, §2.8).

A 100 TB training corpus is not deduped once: new crawl/transcript batches
arrive continuously and must be checked against EVERYTHING already accepted.
Re-running global dedup per batch is O(corpus) per tick; the standard shape
is a fingerprint ledger — the accepted docs' content hashes — that each new
batch anti-joins against. This module is that stage, with the same
crash-safety contract as the rest of the engine (write-then-commit,
idempotent re-run; the two-layer recovery pattern of
``sources/incremental.py`` + ``plans/checkpoint.py``, reference analog
persistent_storage.go:268-348's delete-after-OnProcessingFinished ordering).

Protocol per tick (caller typically inside ``IncrementalSource.process_new``
with the tick's ``PendingTick.tick_id``)::

    fresh = deduper.dedup(new_docs)            # pure, repeatable
    ... write `fresh` to the accepted corpus (idempotent sink) ...
    deduper.commit(fresh, tick_id)             # fp ledger, tick-partitioned

Crash anywhere before ``commit`` -> the re-run sees the SAME ledger state,
recomputes the SAME ``fresh`` set, and the idempotent sink + tick-partition
overwrite make the retry exactly-once. Commits are tick-partition dynamic
overwrites, so a double-commit of one tick cannot duplicate fingerprints.

Scale: the ledger holds one 32-char md5 + doc_id per accepted doc — bytes
per doc, not the doc. The anti-join shuffles only (fp) pairs hashed on fp;
no skew surface (md5 is uniform). At 10^9+ docs, bucket the ledger table by
fp so the per-tick anti-join co-locates with no ledger shuffle at all —
same Iceberg bucket layout note as sources/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FP_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tick_id", T.StringType(), False),
    ]
)


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp=md5(text)) — same content hash as ``dedup_exact``."""
    return docs.select("doc_id", F.md5("text").alias("fp"))


class IncrementalDeduper:
    """Exact dedup of incoming batches against a persistent fp ledger."""

    def __init__(
        self,
        spark: SparkSession,
        ledger_path: str,
        ledger_write_partitions: int = 8,
        bloom_ledger_path: str | None = None,
    ):
        self.spark = spark
        self.ledger_path = ledger_path
        # files per tick partition: bounds both the commit-path fan-in
        # (never a single-task funnel on a large tick) and the ledger's
        # file count (read amplification on every seen() scan)
        self.ledger_write_partitions = ledger_write_partitions
        # optional constant-state prefilter: with a Bloom ledger, a probe
        # MISS is proof of novelty (no false negatives), so only the
        # maybe-seen subset pays the anti-join against the growing fp
        # ledger — at 10^9 accepted docs that join's probe side shrinks
        # from "every incoming doc" to "actual dups + the filter's small
        # false-positive rate" while results stay bit-identical
        self._bloom = None
        if bloom_ledger_path is not None:
            from opentelemetry_collector_spark.operators.bloom import (
                IncrementalBloom,
            )

            self._bloom = IncrementalBloom(spark, bloom_ledger_path)

    def seen(self) -> DataFrame:
        """Accepted fingerprints (empty frame when no ledger yet —
        explicit FS probe, same bootstrap rule as IncrementalSource)."""
        from opentelemetry_collector_spark.sources.incremental import (
            list_data_files,
        )

        if not list_data_files(self.spark, self.ledger_path):
            return self.spark.createDataFrame([], FP_SCHEMA)
        return self.spark.read.schema(FP_SCHEMA).parquet(self.ledger_path)

    def dedup(self, docs: DataFrame) -> DataFrame:
        """The tick's accepted docs: in-batch dups collapsed to the min
        doc_id per content hash, then everything already in the ledger
        anti-joined away. Pure — safe to recompute on a crash retry (the
        ledger only changes at ``commit``)."""
        from pyspark.sql.window import Window

        fps = fingerprint(docs)
        w = Window.partitionBy("fp")
        in_batch = (
            fps.withColumn("canonical_id", F.min("doc_id").over(w))
            .filter(F.col("doc_id") == F.col("canonical_id"))
            .drop("canonical_id")
        )
        if self._bloom is None:
            fresh = in_batch.join(
                self.seen().select("fp"), "fp", "left_anti"
            )
        else:
            # bloom prefilter: misses are definitely new (no exact-ledger
            # work at all); only hits — true dups plus the bounded
            # false-positive residue — get the exact anti-join
            hits = (
                self._bloom.probe(in_batch.select("fp"))
                .filter("bloom_hit")
                .select("fp")
            )
            definitely_new = in_batch.join(hits, "fp", "left_anti")
            checked = in_batch.join(hits, "fp").join(
                self.seen().select("fp"), "fp", "left_anti"
            )
            fresh = definitely_new.unionByName(checked)
        return docs.join(fresh.select("doc_id"), "doc_id")

    def commit(self, accepted: DataFrame, tick_id: str) -> None:
        """Record the tick's accepted fingerprints, idempotently: the
        write replaces only this tick's partition (dynamic partition
        overwrite), so retrying a tick never duplicates ledger rows.

        With a Bloom prefilter, the filter commits FIRST: the bloom bits
        must always be a SUPERSET of the fp ledger, else a crash between
        the two writes could leave a committed fingerprint reading as a
        bloom miss — "definitely new" — and a later tick would re-accept
        the duplicate. The safe failure mode is the reverse (bloom has a
        tick the fp ledger lacks): those probes hit, the exact check
        finds nothing, and the docs are correctly treated as fresh."""
        if self._bloom is not None:
            self._bloom.commit(
                self._bloom.sketch(fingerprint(accepted).select("fp")),
                tick_id,
            )
        (
            fingerprint(accepted)
            .withColumn("tick_id", F.lit(tick_id))
            .select("fp", "doc_id", "tick_id")
            .coalesce(self.ledger_write_partitions)
            .write.mode("overwrite")
            .partitionBy("tick_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.ledger_path)
        )

    def metrics(self) -> dict:
        """Ledger gauges (queue-gauge analog, queued_retry.go:209-223)."""
        led = self.seen()
        n = led.count()
        ticks = led.select("tick_id").distinct().count()
        return {"accepted_docs": n, "ticks": ticks}


# --- cross-tick curation (streaming twin of corpus_curation) ------------------

CURATION_FP_SCHEMA = T.StructType(
    [
        T.StructField("prefix_fp", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tick_id", T.StringType(), False),
    ]
)


class IncrementalCurator:
    """Cross-tick twin of ``textstats.corpus_curation`` (quality gate ->
    near-dup canonical -> class tag) for corpora that arrive in batches:
    each tick quality-gates its docs, collapses in-tick near-dups to the
    min doc_id per prefix fingerprint, anti-joins fingerprints already
    ACCEPTED by earlier ticks, and commits the survivors' fingerprints to
    a persistent ledger — first-accepted-wins across ticks.

    Parity contract (tested): when ticks arrive in doc_id order — the
    natural shape for append-only corpus ingest — the union of per-tick
    outputs equals the one-shot batch ``corpus_curation`` over the same
    corpus, because each fingerprint group's global-min passing doc_id
    lives in the earliest tick that contains the group. Same crash-safety
    protocol as ``IncrementalDeduper`` (pure ``curate``, tick-partition
    dynamic-overwrite ``commit``; persistent_storage.go:268-348 analog).

    Scale: the ledger holds one 32-char fingerprint + doc_id per accepted
    doc; the per-tick anti-join shuffles only (prefix_fp) pairs — md5-
    uniform, no skew. Bucket the ledger by prefix_fp at 10^9+ docs for a
    shuffle-free co-located anti-join (sources/catalog.py layout note).
    """

    def __init__(
        self,
        spark: SparkSession,
        ledger_path: str,
        quality_min: float = 0.55,
        ledger_write_partitions: int = 8,
    ):
        self.spark = spark
        self.ledger_path = ledger_path
        self.quality_min = quality_min
        self.ledger_write_partitions = ledger_write_partitions

    def seen(self) -> DataFrame:
        from opentelemetry_collector_spark.sources.incremental import (
            list_data_files,
        )

        if not list_data_files(self.spark, self.ledger_path):
            return self.spark.createDataFrame([], CURATION_FP_SCHEMA)
        return self.spark.read.schema(CURATION_FP_SCHEMA).parquet(
            self.ledger_path
        )

    def curate(self, docs: DataFrame) -> DataFrame:
        """The tick's accepted docs with corpus_curation's exact columns
        (doc_id, quality_score, prefix_fp, pred_class). Pure — safe to
        recompute on a crash retry."""
        from pyspark.sql.window import Window

        from opentelemetry_collector_spark.operators.textstats import (
            doc_fingerprint,
            doc_langid,
            doc_quality,
        )

        q = doc_quality(self.spark, "", docs=docs).select(
            "doc_id", "quality_score"
        )
        fp = doc_fingerprint(self.spark, "", docs=docs).select(
            "doc_id", "prefix_fp"
        )
        lang = doc_langid(self.spark, "", docs=docs).select(
            "doc_id", "pred_class"
        )
        kept = (
            q.filter(F.col("quality_score") >= self.quality_min)
            .join(fp, "doc_id")
            .join(lang, "doc_id")
        )
        w = Window.partitionBy("prefix_fp")
        in_tick = (
            kept.withColumn("canonical_id", F.min("doc_id").over(w))
            .filter(F.col("doc_id") == F.col("canonical_id"))
            .select("doc_id", "quality_score", "prefix_fp", "pred_class")
        )
        return in_tick.join(
            self.seen().select("prefix_fp"), "prefix_fp", "left_anti"
        ).select("doc_id", "quality_score", "prefix_fp", "pred_class")

    def commit(self, accepted: DataFrame, tick_id: str) -> None:
        """Record the tick's accepted fingerprints idempotently (dynamic
        tick-partition overwrite — a retried tick never duplicates)."""
        (
            accepted.select("prefix_fp", "doc_id")
            .withColumn("tick_id", F.lit(tick_id))
            .coalesce(self.ledger_write_partitions)
            .write.mode("overwrite")
            .partitionBy("tick_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.ledger_path)
        )


# --- cross-tick NEAR-dup (MinHash signature ledger) ---------------------------

SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sig", T.ArrayType(T.LongType(), False), False),
        T.StructField("tick_id", T.StringType(), False),
    ]
)


class IncrementalMinHashDeduper:
    """Cross-tick NEAR-duplicate dedup against a persistent MinHash
    signature ledger — the fuzzy twin of ``IncrementalDeduper`` (which
    catches only byte-identical content across ticks).

    Per tick: (1) in-batch near-dups collapse to cluster canonicals via
    ``dedup_minhash_pairs`` (exact shingle-Jaccard verify) + connected
    components — the same policy as the batch ``dedup_minhash`` config
    processor; (2) the canonicals' LSH band keys (identical banding to the
    in-batch op — ``bands_from_signatures``) equality-join against the
    ledger's bands, and candidates are verified by SIGNATURE-estimated
    Jaccard (matching minhash components / K ≥ the same threshold): the
    ledger keeps the 16-bigint sketch per accepted doc, never its
    shingles, so the cross-tick verify uses the standard unbiased MinHash
    estimator rather than exact Jaccard — documented estimator tradeoff,
    candidates are already band-collision-filtered high-J pairs.

    Dedup policy is FIRST-ACCEPTED-WINS against the retained corpus: a
    new doc is dropped iff it is a near-dup of an ACCEPTED doc. Chains
    through previously-dropped docs deliberately do not propagate across
    ticks — the dropped doc is not in the training corpus, so it cannot
    justify dropping anything (the same over-deletion argument as
    ``dedup_minhash_p``'s cluster canonicals, applied at the corpus
    boundary).

    Crash contract is the module protocol: ``dedup`` is pure given the
    ledger, ``commit`` is a dynamic tick-partition overwrite, so crash
    retries recompute the same accepted set and double commits cannot
    duplicate signatures.

    Scale: ledger row = doc_id + {16} bigints (~150 B per accepted doc).
    The per-tick probe is an equality join on (band, key) — uniform md5
    keys, no skew surface; at 10^9+ accepted docs, bucket the ledger by
    the band key (Iceberg layout note in sources/catalog.py) so the probe
    co-locates without a ledger shuffle.
    """

    def __init__(
        self,
        spark: SparkSession,
        ledger_path: str,
        ledger_write_partitions: int = 8,
    ):
        self.spark = spark
        self.ledger_path = ledger_path
        self.ledger_write_partitions = ledger_write_partitions

    def seen(self) -> DataFrame:
        """Accepted (doc_id, sig) rows; empty frame before first commit."""
        from opentelemetry_collector_spark.sources.incremental import (
            list_data_files,
        )

        if not list_data_files(self.spark, self.ledger_path):
            return self.spark.createDataFrame([], SIG_SCHEMA)
        return self.spark.read.schema(SIG_SCHEMA).parquet(self.ledger_path)

    def dedup(self, docs: DataFrame) -> DataFrame:
        """The tick's accepted docs (near-dup-free within the batch AND
        vs everything already accepted). Pure — safe to recompute."""
        from opentelemetry_collector_spark.operators.dedup import (
            JACCARD_THRESHOLD,
            MINHASH_K,
            bands_from_signatures,
            connected_components,
            dedup_minhash_pairs,
            minhash_signatures,
        )

        # (1) in-batch: exact-verified pairs -> component canonicals
        pairs = dedup_minhash_pairs(self.spark, "", docs=docs)
        drop_in_batch = (
            connected_components(pairs)
            .filter(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id")
        )
        canon = docs.join(drop_in_batch, "doc_id", "left_anti")

        # (2) cross-tick: band-collision candidates vs the ledger,
        # verified by the signature-estimated Jaccard
        new_sigs = minhash_signatures(self.spark, "", docs=canon)
        led = self.seen()
        cand = (
            bands_from_signatures(new_sigs)
            .join(
                bands_from_signatures(
                    led.select("doc_id", "sig")
                ).select(
                    F.col("doc_id").alias("old_id"), "band", "key"
                ),
                ["band", "key"],
            )
            .select("doc_id", "old_id")
            .distinct()
        )
        est = (
            cand.join(new_sigs, "doc_id")
            .join(
                led.select(
                    F.col("doc_id").alias("old_id"),
                    F.col("sig").alias("old_sig"),
                ),
                "old_id",
            )
            .withColumn(
                "est_jaccard",
                F.expr(
                    "size(filter(zip_with(sig, old_sig,"
                    " (x, y) -> x = y), v -> v))"
                )
                / F.lit(MINHASH_K),
            )
        )
        drop_cross = (
            est.filter(F.col("est_jaccard") >= JACCARD_THRESHOLD)
            .select("doc_id")
            .distinct()
        )
        return canon.join(drop_cross, "doc_id", "left_anti")

    def commit(self, accepted: DataFrame, tick_id: str) -> None:
        """Record the tick's accepted signatures idempotently (dynamic
        tick-partition overwrite)."""
        from opentelemetry_collector_spark.operators.dedup import (
            minhash_signatures,
        )

        (
            minhash_signatures(self.spark, "", docs=accepted)
            .withColumn("tick_id", F.lit(tick_id))
            .select("doc_id", "sig", "tick_id")
            .coalesce(self.ledger_write_partitions)
            .write.mode("overwrite")
            .partitionBy("tick_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.ledger_path)
        )

    def metrics(self) -> dict:
        """Ledger gauges (queue-gauge analog)."""
        led = self.seen()
        return {
            "accepted_docs": led.count(),
            "ticks": led.select("tick_id").distinct().count(),
        }
