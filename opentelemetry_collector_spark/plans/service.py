"""Service builder — config -> running pipeline (the service/graph analog,
SURVEY §2.4/§3.2; service/internal/graph/graph.go:66-249, otelcol/collector.go).

The reference builds components from config by factory name and wires
receivers -> processors -> exporters per pipeline. Here the "graph" is
DataFrame composition: each named component resolves to a function, and a
pipeline is a fold of processors over the receiver's DataFrame, fanned out
to every exporter (fanoutconsumer semantics — the DataFrame is shared; each
exporter is one write action over the same plan).

Component registry (extensible by passing extra factories):
  receivers:  transcripts (events-derived), transcripts_table (parquet dir),
              otlp_jsonl (JSON-lines wire)
  processors: parse, enrich, route
  exporters:  sinks (partitioned fan-out write), sink_counts (metrics
              table), otlp_jsonl (JSON-lines export), dead_letter
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opentelemetry_collector_spark.plans.config import ServiceConfig


def _builtin_receivers() -> dict[str, Callable]:
    from opentelemetry_collector_spark.sources.jsonl import read_otlp_jsonl
    from opentelemetry_collector_spark.sources.transcripts import (
        events_to_transcripts,
        read_transcripts,
    )

    return {
        "transcripts": lambda spark, cfg: events_to_transcripts(
            spark, cfg["path"]
        ),
        "transcripts_table": lambda spark, cfg: read_transcripts(
            spark, cfg["path"]
        ),
        "otlp_jsonl": lambda spark, cfg: read_otlp_jsonl(spark, cfg["path"]),
        # corpus-curation source: a documents table (doc_id, text, ...)
        "documents": lambda spark, cfg: spark.read.parquet(cfg["path"]),
    }


def _builtin_processors() -> dict[str, Callable]:
    from opentelemetry_collector_spark.operators.enrich import enrich
    from opentelemetry_collector_spark.operators.parse import parse_turns
    from opentelemetry_collector_spark.operators.route import route
    from opentelemetry_collector_spark.operators.transform import (
        transform_processor_factory,
    )

    from opentelemetry_collector_spark.operators.traces import (
        LATENCY_THRESHOLD_MS,
        probabilistic_sampler,
        tail_sampling,
        tail_sampling_composite,
    )

    def sampler_factory(spark, df, cfg):
        # head sampling keeps every input column in processor position —
        # downstream stages still need the full record; keep rate is
        # configurable like the reference's sampling_percentage
        from opentelemetry_collector_spark.operators.traces import (
            SAMPLER_PERMYRIAD,
        )

        return probabilistic_sampler(
            df, project=False,
            permyriad=cfg.get("permyriad", SAMPLER_PERMYRIAD),
        )

    def tail_factory(spark, df, cfg):
        fn = (
            tail_sampling_composite
            if cfg.get("policies") == "composite"
            else tail_sampling
        )
        return fn(
            df,
            latency_threshold_ms=cfg.get(
                "latency_threshold_ms", LATENCY_THRESHOLD_MS
            ),
            project=False,
        )

    # --- corpus-curation processors (documents stream) ----------------
    # Each filters the flowing documents frame via an anti-join against a
    # marker set computed over that SAME frame (processor position keeps
    # every input column). Policies are the standard curation ones; the
    # underlying operators are the oracle-gated ones in operators/dedup.py
    # and operators/textstats.py (docs= processor-position entry).

    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators import dedup as _dd
    from opentelemetry_collector_spark.operators import textstats as _tx

    def dedup_exact_p(spark, df, cfg):
        dups = _dd.dedup_exact(spark, "", docs=df).filter("is_dup")
        return df.join(dups.select("doc_id"), "doc_id", "left_anti")

    def dedup_near_p(spark, df, cfg):
        # connected components over ngram-Jaccard pairs; keep the cluster
        # canonical (min doc_id) so chained duplicates collapse to one doc
        clusters = _dd.dedup_clusters(
            spark, "", max_iter=cfg.get("max_iter", 20), docs=df
        )
        drop = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
        return df.join(drop, "doc_id", "left_anti")

    def dedup_minhash_p(spark, df, cfg):
        # keep-first policy via connected components over the verified
        # MinHash pair set: only the cluster canonical (min doc_id per
        # component) survives. Dropping doc_b of every pair would
        # over-delete on chains a~b, b~c (no a~c): c's only near-dup b is
        # itself removed, so keep-first would re-keep c (ADVICE r03).
        pairs = _dd.dedup_minhash_pairs(spark, "", docs=df)
        clusters = _dd.connected_components(
            pairs, max_iter=cfg.get("max_iter", 20)
        )
        drop = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
        return df.join(drop, "doc_id", "left_anti")

    def dedup_substring_p(spark, df, cfg):
        # drop docs whose duplicated-substring spans cover more than
        # max_dup_word_frac of their words (Lee et al. windowed dedup as a
        # doc-level filter; span excision is the text-rewrite variant)
        spans = _dd.dedup_substring_spans(spark, "", docs=df)
        dup_words = spans.groupBy("doc_id").agg(
            F.sum("n_words").alias("dup_words")
        )
        frac = F.col("dup_words") / (
            F.size(F.split(F.col("text"), " "))
        )
        over = (
            df.select("doc_id", "text")
            .join(dup_words, "doc_id")
            .filter(frac > float(cfg.get("max_dup_word_frac", 0.5)))
            .select("doc_id")
        )
        return df.join(over, "doc_id", "left_anti")

    def quality_filter_p(spark, df, cfg):
        out = df
        if cfg.get("drop_repetitive", True):
            bad = _tx.doc_repetition(spark, "", docs=df).filter("repetitive")
            out = out.join(bad.select("doc_id"), "doc_id", "left_anti")
        min_ll = cfg.get("min_avg_logp_milli")
        if min_ll is not None:
            model = None
            if cfg.get("model_dir"):  # precomputed LM side-tables
                model = (
                    spark.read.parquet(f"{cfg['model_dir']}/vocab"),
                    spark.read.parquet(f"{cfg['model_dir']}/tot"),
                )
            ll = _tx.doc_unigram_ll(spark, "", model=model, docs=df)
            bad = ll.filter(
                F.col("avg_logp_milli") < float(min_ll)
            ).select("doc_id")
            out = out.join(bad, "doc_id", "left_anti")
        return out

    from opentelemetry_collector_spark.operators import quality as _q

    def gopher_filter_p(spark, df, cfg):
        # pure Catalyst filter on the flowing frame — no rule-frame join
        return _q.doc_gopher_rules(spark, "", docs=df, project=False)

    def normalize_p(spark, df, cfg):
        # rewrites text/n_chars in place, appends norm_hash for dedup keying
        return _q.doc_normalize(spark, "", docs=df, project=False)

    def mix_p(spark, df, cfg):
        # broadcast per-source rate table, salted-hash keep — no wide shuffle
        return _q.corpus_mix(spark, "", docs=df, project=False)

    def leakage_split_p(spark, df, cfg):
        # annotate the flowing documents frame with the leakage-safe split
        # (near-dup components never straddle train/test); with `keep:`,
        # filter to that split — the step that builds a clean training cut
        s = _q.doc_split_leakage_safe(spark, "", docs=df)
        out = df.join(s.select("doc_id", "split"), "doc_id")
        keep = cfg.get("keep")
        if keep:
            out = out.filter(F.col("split") == str(keep)).drop("split")
        return out

    def dedup_paragraphs_p(spark, df, cfg):
        # CCNet-style duplicate-paragraph excision: rewrite text to the
        # surviving tiles (position order preserved) and drop documents
        # whose every tile was a duplicate. First-wins resolves via the
        # keeper aggregate + equality join (skew-safe, see dedup.py).
        kept = _dd.dedup_paragraphs(
            spark, "", tile=int(cfg.get("tile", _dd.PARA_TILE)), docs=df
        )
        return (
            df.join(
                kept.filter(F.col("n_kept") > 0).select(
                    "doc_id", "text_kept"
                ),
                "doc_id",
            )
            .withColumn("text", F.col("text_kept"))
            .drop("text_kept")
            .withColumn("n_chars", F.length("text").cast("long"))
        )

    def entropy_filter_p(spark, df, cfg):
        # drop low-entropy (repetitive/boilerplate) documents; threshold in
        # integer milli-nats so the decision is engine-exact
        flagged = (
            _q.doc_entropy(spark, "", docs=df)
            .filter("low_entropy")
            .select("doc_id")
        )
        return df.join(flagged, "doc_id", "left_anti")

    def ppl_filter_p(spark, df, cfg):
        # CCNet §3.3: tag head/middle/tail by unigram-LM perplexity
        # terciles and keep the configured buckets (default head+middle —
        # the CCNet training cut). Threshold pass runs on the bounded
        # integer-score histogram; the tag join is doc_id-keyed.
        keep = set(cfg.get("keep", ["head", "middle"]))
        tagged = _q.corpus_ppl_buckets(spark, "", docs=df)
        kept = tagged.filter(
            F.col("ppl_bucket").isin(*sorted(keep))
        ).select("doc_id")
        return df.join(kept, "doc_id", "left_semi")

    def priority_sample_p(spark, df, cfg):
        # deterministic weighted top-k (Duffield-Lund-Thorup priority
        # sampling): keep the k docs with the largest w/u priority under
        # the md5-derived hash. TakeOrderedAndProject ships k rows to the
        # driver side of the plan — no global sort, rerun-stable.
        from opentelemetry_collector_spark.operators import (
            sampling as _ps,
        )

        kept = _ps.corpus_priority_sample(
            spark,
            "",
            docs=df,
            k=int(cfg.get("k", _ps.PSAMPLE_K)),
            weight_col=cfg.get("weight_col", "n_chars"),
        ).select("doc_id")
        return df.join(kept, "doc_id", "left_semi")

    def shuffle_order_p(spark, df, cfg):
        # epoch-0 training order: annotate the flowing frame with the
        # deterministic md5-permutation rank (two-phase bucketed rank —
        # no range partitioning). The downstream writer sorts or
        # bucket-partitions by order_idx; the column is the contract.
        from opentelemetry_collector_spark.operators import (
            sampling as _ps,
        )

        order = _ps.corpus_shuffle(spark, "", docs=df)
        return df.join(order, "doc_id")

    def interleave_p(spark, df, cfg):
        # temperature-weighted source interleave key (alpha = 0.5):
        # annotate (src_rank, interleave_key); sorting by the key yields
        # the sqrt-flattened training mix. Same two-phase rank, keyed by
        # (source, bucket).
        from opentelemetry_collector_spark.operators import (
            sampling as _ps,
        )

        keyed = _ps.corpus_interleave(spark, "", docs=df).drop("source")
        return df.join(keyed, "doc_id")

    def dsir_filter_p(spark, df, cfg):
        # DSIR importance selection: keep docs whose per-token weight beats
        # the corpus average. The score pass aggregates on doc_id anyway, so
        # the semi-join back is the one inherent extra shuffle.
        kept = (
            _q.dsir_weights(
                spark,
                "",
                docs=df,
                target_lang=cfg.get("target_lang", _q.DSIR_TARGET_LANG),
            )
            .filter("keep")
            .select("doc_id")
        )
        return df.join(kept, "doc_id", "left_semi")

    from opentelemetry_collector_spark.operators import cleaning as _cl

    def pii_scrub_p(spark, df, cfg):
        # typed PII masking in place (text + n_chars rewritten,
        # pii_total appended) — single projection, no shuffle
        return _cl.doc_pii_scrub(spark, "", docs=df, project=False)

    def quality_checks_p(spark, df, cfg):
        # Deequ-style admission control: ONE aggregate pass evaluates the
        # declarative per-column rules; any failure raises (refuse,
        # don't corrupt) BEFORE downstream stages see the batch. Eager by
        # design — the gate is an action, like config validation.
        from opentelemetry_collector_spark.operators.checks import (
            quality_gate,
        )

        return quality_gate(spark, df, dict(cfg.get("rules", {})))

    def c4_filter_p(spark, df, cfg):
        # C4 line/page cleaning: drop failing pages, rewrite text to the
        # surviving lines — single projection + filter, no shuffle
        return _cl.doc_c4_filters(
            spark,
            "",
            docs=df,
            bad_words=tuple(cfg.get("bad_words", ())),
            project=False,
        )

    def classifier_filter_p(spark, df, cfg):
        # FineWeb-style supervised quality classifier: train NB log-odds
        # on the rows whose `label_col` is non-null, score EVERY doc,
        # keep positive-posterior docs (token-less docs carry no
        # evidence and are kept — the filter only drops on evidence)
        from opentelemetry_collector_spark.operators.quality import (
            doc_classifier_score,
        )

        scored = doc_classifier_score(
            spark,
            "",
            docs=df,
            labeled=df,
            label_col=cfg.get("label_col", "label"),
        )
        drop = scored.filter(~F.col("keep")).select("doc_id")
        return df.join(drop, "doc_id", "left_anti")

    def sft_mask_p(spark, df, cfg):
        # SFT training-prep: per-turn token spans + assistant loss mask
        # over the flowing transcripts frame — one conv-keyed window
        # (elided on the bucketed layout)
        from opentelemetry_collector_spark.operators.training import (
            sft_loss_mask,
        )

        return sft_loss_mask(spark, "", transcripts=df)

    def conversation_pack_p(spark, df, cfg):
        # whole-conversation sequence packing (terminal, conv-granular
        # output): rollup + pack-bucket cumsum, corpus_pack's shape
        from opentelemetry_collector_spark.operators.training import (
            CONV_PACK_BUDGET_TOKENS,
            conversation_pack,
        )

        return conversation_pack(
            spark,
            "",
            transcripts=df,
            budget=int(cfg.get("budget", CONV_PACK_BUDGET_TOKENS)),
        )

    return {
        "parse": lambda spark, df, cfg: parse_turns(df),
        "enrich": lambda spark, df, cfg: enrich(df, spark),
        "route": lambda spark, df, cfg: route(df),
        # telemetry-mutation / filter statements (docs/processing.md:33-60)
        "transform": transform_processor_factory,
        # sampling processors (trace-consistent hash head sampling; window
        # tail sampling with error>latency[>probabilistic] policies)
        "sampler": sampler_factory,
        "tail_sampling": tail_factory,
        # corpus-curation processors (documents stream)
        "dedup_exact": dedup_exact_p,
        "dedup_near": dedup_near_p,
        "dedup_minhash": dedup_minhash_p,
        "dedup_substring": dedup_substring_p,
        "quality_filter": quality_filter_p,
        "gopher_filter": gopher_filter_p,
        "normalize": normalize_p,
        "mix": mix_p,
        "dsir_filter": dsir_filter_p,
        "leakage_split": leakage_split_p,
        "dedup_paragraphs": dedup_paragraphs_p,
        "entropy_filter": entropy_filter_p,
        "priority_sample": priority_sample_p,
        "ppl_filter": ppl_filter_p,
        "shuffle_order": shuffle_order_p,
        "interleave": interleave_p,
        "pii_scrub": pii_scrub_p,
        "c4_filter": c4_filter_p,
        "quality_checks": quality_checks_p,
        "classifier_filter": classifier_filter_p,
        # transcript-native training-prep (operators/training.py)
        "sft_mask": sft_mask_p,
        "conversation_pack": conversation_pack_p,
    }


def _builtin_exporters() -> dict[str, Callable]:
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.aggregate import sink_counts
    from opentelemetry_collector_spark.operators.route import (
        dead_letter,
        routed_ok,
        write_sinks,
    )
    from opentelemetry_collector_spark.sources.jsonl import write_otlp_jsonl

    def export_sinks(spark, df, cfg):
        write_sinks(df, cfg["path"],
                    cfg.get("max_records_per_file", 8192),
                    compression=cfg.get("compression"))

    def export_counts(spark, df, cfg):
        counts = sink_counts(routed_ok(df), cfg.get("bucket_seconds", 300))
        counts.coalesce(1).write.mode("overwrite").parquet(cfg["path"])

    def export_jsonl(spark, df, cfg):
        write_otlp_jsonl(df, cfg["path"], cfg.get("compression"))

    def export_dead_letter(spark, df, cfg):
        dead_letter(df).write.mode("overwrite").parquet(cfg["path"])

    def export_log_dedup(spark, df, cfg):
        from opentelemetry_collector_spark.operators.aggregate import (
            log_dedup,
        )

        groups = log_dedup(df, cfg.get("bucket_seconds", 300))
        groups.write.mode("overwrite").parquet(cfg["path"])

    def export_parquet(spark, df, cfg):
        writer = df.write.mode("overwrite")
        if cfg.get("partition_by"):
            writer = writer.partitionBy(*cfg["partition_by"])
        writer.parquet(cfg["path"])

    return {
        "sinks": export_sinks,
        "sink_counts": export_counts,
        "otlp_jsonl": export_jsonl,
        "dead_letter": export_dead_letter,
        # template-identity dedup counts (log-deduplication pattern)
        "log_dedup": export_log_dedup,
        # generic table writer (curated-corpus sink)
        "parquet": export_parquet,
    }


def run_service(
    spark: SparkSession,
    config: ServiceConfig,
    extra_receivers: dict[str, Callable] | None = None,
    extra_processors: dict[str, Callable] | None = None,
    extra_exporters: dict[str, Callable] | None = None,
    persist_results: bool = False,
) -> dict[str, DataFrame]:
    """Build and execute every configured pipeline. Component TYPE is the
    config key before any '/' (collector 'type/name' instance convention,
    e.g. 'otlp_jsonl/backup'). Returns the final DataFrame per pipeline
    (pre-export) for inspection.

    Fan-out parity (fanoutconsumer/logs.go:35-85): all of a pipeline's
    exporters consume the SAME DataFrame — immutability replaces the
    clone-if-mutating dance; Catalyst may recompute the plan per action,
    which callers avoid at scale by .persist() between exporters (handled
    here when a pipeline has >1 exporter). ``persist_results=True`` keeps
    each pipeline's frame cached past the exporter loop so the caller's
    post-run actions (e.g. the CLI's report counts) reuse the exporters'
    execution instead of re-running the plan — the caller owns unpersist.
    """
    receivers = {**_builtin_receivers(), **(extra_receivers or {})}
    processors = {**_builtin_processors(), **(extra_processors or {})}
    exporters = {**_builtin_exporters(), **(extra_exporters or {})}

    def ctype(name: str) -> str:
        return name.split("/", 1)[0]

    results: dict[str, DataFrame] = {}
    for pname, p in config.pipelines.items():
        # receivers: union of all configured sources (shared-component dedup
        # happens naturally — one DataFrame per receiver instance)
        dfs = []
        for rname in p["receivers"]:
            factory = receivers.get(ctype(rname))
            if factory is None:
                raise ValueError(f"no factory for receiver type {ctype(rname)!r}")
            dfs.append(factory(spark, config.receivers[rname]))
        df = dfs[0]
        for other in dfs[1:]:
            df = df.unionByName(other, allowMissingColumns=True)

        for prname in p.get("processors", []):
            factory = processors.get(ctype(prname))
            if factory is None:
                raise ValueError(f"no factory for processor type {ctype(prname)!r}")
            df = factory(spark, df, config.processors[prname])

        exps = p["exporters"]
        persisted = persist_results or len(exps) > 1
        if persisted:
            df = df.persist()
        try:
            for ename in exps:
                factory = exporters.get(ctype(ename))
                if factory is None:
                    raise ValueError(
                        f"no factory for exporter type {ctype(ename)!r}"
                    )
                factory(spark, df, config.exporters[ename])
        finally:
            if persisted and not persist_results:
                df.unpersist()
        results[pname] = df
    return results
