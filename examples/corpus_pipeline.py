#!/usr/bin/env python
"""End-to-end training-corpus pipeline: the batch composition a 100 TB
pretraining-data job runs, expressed entirely as artan_spark plan operators.

    documents ──> URL-level dedup (canonical page, stage 1)
                  ──> PII scrub ──> cross-corpus line dedup ──> exact
                  substring (span) dedup ──> quality score ──> filter
                  ──> near-dup clusters ──> keep one per cluster
                  ──> SemDeDup semantic prune ──> Bloom eval
                  decontamination ──> token-budget language
                  mixing ──> LM perplexity gate (head+middle) ──> DSIR
                  resampling ──> concat-and-cut sequence packing ──────┐
                  + BPE train ─> encode to ids ─> pack id sequences    │
    embeddings ─> ANN (k-means IVF) top-k neighbors per query ─────────┤
                                                                       v
              cleaned + packed corpus written PARTITIONED BY (lang/stream)

Every stage is the same operator the driver registry verifies against
DuckDB (text_quality_score, dedup_clusters, ann_ivf_kmeans); this example
shows them composing into one lazy plan per output. Scale notes: the
cluster step's candidate generation is df-capped ('auto'), the ANN
assignment is a map-side argmax over broadcast centroids, and the sink is
partitioned so downstream readers prune by language.

Usage: python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.sources import session_builder


def main(sf_dir="/root/testdata/sf0.001", out_dir=None):
    from artan_spark.plans.dedup import dedup_clusters
    from artan_spark.plans.simsearch import ann_ivf_kmeans
    from artan_spark.plans.textstats import dedup_corpus_lines, scrub_pii, text_quality_score
    from artan_spark.sources import read_table

    spark = session_builder("CorpusPipeline", master="local[4]", shuffle_partitions=4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    out_dir = out_dir or tempfile.mkdtemp(prefix="corpus_pipeline_")

    docs = read_table(spark, sf_dir, "documents")

    # -1. stage 1 of every published crawl pipeline: URL-level dedup — the
    #     cheapest pass (needs no text; one narrow agg + a semi-join). The
    #     driver tables carry no url column, so derive the synthetic one
    #     (production: the crawl's own url column)
    from artan_spark.plans.urls import canonical_url, with_synthetic_url

    keep_urls = (
        with_synthetic_url(docs.select("doc_id", "source"))
        .groupBy(canonical_url(F.col("url")).alias("cu"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(keep_urls, "doc_id", "left_semi")

    # 0. scrub PII (stateless codegen projection), drop cross-corpus
    #    boilerplate lines (the C4 pass), then cut cross-doc duplicated
    #    token SPANS (the ExactSubstr pass — templated runs that are not
    #    newline-bounded survive line dedup) — all BEFORE any scoring so
    #    the quality/dedup stages see the text the model would train on
    from artan_spark.plans.textstats import dedup_corpus_substrings

    scrubbed = scrub_pii(docs.select("doc_id", "text"))
    deboiled = dedup_corpus_lines(scrubbed, max_df=3).select("doc_id", "text")
    despanned = (
        dedup_corpus_substrings(deboiled, n=8, min_df=3)
        .filter(F.col("text") != "")  # drop fully-templated tombstones
        .select("doc_id", "text")
    )
    docs = docs.drop("text").join(despanned, "doc_id")

    # 1. quality gates (pure Catalyst HOF expressions, no Python in row
    #    path): the heuristic score plus the published Gopher rules that
    #    apply to this synthetic corpus (the stop-word rule is calibrated
    #    to real English; word-soup docs would all fail it)
    from artan_spark.plans.textstats import gopher_quality_flags, gopher_repetition_flags

    quality = text_quality_score(spark, sf_dir)
    gopher = gopher_quality_flags(docs.select("doc_id", "text"))
    g_ok = gopher.filter(
        F.col("ok_word_len") & F.col("ok_symbols") & F.col("ok_bullets")
        & F.col("ok_ellipsis") & F.col("ok_alpha")
    ).select("doc_id")
    # the A1.2 repetition gate (all 13 rules) — the within-doc companion
    # of the rules above, another stateless projection on the same scan
    r_ok = (
        gopher_repetition_flags(docs.select("doc_id", "text"))
        .filter(F.col("passes_gopher_repetition"))
        .select("doc_id")
    )
    kept = (
        docs.join(quality.filter(F.col("quality_score") >= 0.3).select("doc_id"), "doc_id")
        .join(g_ok, "doc_id")
        .join(r_ok, "doc_id")
    )

    # 2. near-dup removal: keep the cluster representative (min doc_id)
    clusters = dedup_clusters(spark, sf_dir)
    losers = (
        clusters.select(F.explode(F.split("members", ",")).alias("member"), "cluster")
        .select(F.col("member").cast("long").alias("doc_id"), "cluster")
        .filter(F.col("doc_id") != F.col("cluster"))
        .select("doc_id")
    )
    # 2b. SEMANTIC dedup (SemDeDup): embedding-space duplicates within
    #     k-means cells — catches paraphrases the lexical pass misses.
    #     Only embedded docs (vec_id == doc_id in the testdata) can LOSE;
    #     docs without an embedding pass through untouched, so the prune
    #     is an anti-join against the semantic-loser set, not a semi-join
    #     against the kept set
    from artan_spark.plans.simsearch import _emb, dedup_semantic

    # NOTE: no broadcast hint here — the SemDeDup KEPT set is nearly the
    # full embeddings table (the LARGE side); only the loser complement
    # computed by this anti-join is small enough to broadcast (and is,
    # on the next join below)
    sem_losers = (
        _emb(spark, sf_dir)
        .select(F.col("vec_id").alias("doc_id"))
        .join(
            dedup_semantic(spark, sf_dir).select(F.col("vec_id").alias("doc_id")),
            "doc_id",
            "left_anti",
        )
    )
    # 2c. eval decontamination, Bloom-shaped: the TEST split's shingles
    #     compress to one broadcast bit array (~32 KiB) and train docs are
    #     flagged by stateless bit probes fused into the scan — the exact
    #     join variant (docs_decontaminate) would shuffle the corpus
    #     shingle stream at lake scale
    from artan_spark.plans.sampling import docs_decontaminate_bloom

    contaminated = docs_decontaminate_bloom(spark, sf_dir).select("doc_id")

    # materialize: the quality+dedup lineage feeds the rates aggregate AND
    # both sinks — one computation instead of one per downstream action
    cleaned = (
        kept.join(losers, "doc_id", "left_anti")
        .join(F.broadcast(sem_losers), "doc_id", "left_anti")
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .localCheckpoint()
    )

    # 3. token-budget mixing: rebalance the CLEANED corpus toward equal
    #    per-language token volume (deterministic hash-Bernoulli keep on
    #    the UNROUNDED rates, so the selection matches mix_sample's report)
    from artan_spark.plans.sampling import _hash_uniform, mix_rates, pack_sequences

    rates = mix_rates(cleaned)
    mixed = (
        cleaned.join(F.broadcast(rates), "lang")
        .filter(_hash_uniform(F.col("doc_id")) < F.col("rate"))
        .drop("rate")
    )

    # 3b. model-based selection on the mixed corpus: CCNet perplexity
    #     buckets (keep head+middle under the reference-slice bigram LM)
    #     then DSIR importance resampling toward the same reference
    from artan_spark.plans.dsir import dsir_select
    from artan_spark.plans.lm import lm_perplexity_buckets

    ppl = lm_perplexity_buckets(mixed.select("doc_id", "source", "text"))
    lm_kept = ppl.filter(F.col("bucket") != "tail").select("doc_id")
    selected = (
        dsir_select(mixed.select("doc_id", "source", "text"), frac=0.9)
        .filter("selected")
        .select("doc_id")
    )
    mixed = mixed.join(lm_kept, "doc_id", "left_semi").join(
        selected, "doc_id", "left_semi"
    )

    # 4. sequence packing: concat-and-cut the mixed docs into fixed-token
    #    training sequences (8 independent hash streams, one window each)
    packed = pack_sequences(mixed, seq_len=512)

    # 4b. the materialized twin: BPE-encode the selected corpus to token
    #     ids and pack the ids themselves into fixed-length sequences
    from artan_spark.plans.bpe import bpe_encode_ids, bpe_train, bpe_vocab, pack_token_ids

    merges = bpe_train(mixed, n_merges=60)
    vocab = bpe_vocab(mixed, merges)
    enc = bpe_encode_ids(mixed.select("doc_id", "text"), merges, vocab)
    packed_ids = pack_token_ids(enc, seq_len=512)

    # 5. similarity index: top-k cosine neighbors via the k-means IVF path
    neighbors = ann_ivf_kmeans(spark, sf_dir)

    # 6. partitioned sinks: downstream jobs prune by lang / stream at the scan
    mixed.write.mode("overwrite").partitionBy("lang").parquet(out_dir + "/cleaned")
    packed.write.mode("overwrite").partitionBy("stream").parquet(out_dir + "/packed")
    packed_ids.write.mode("overwrite").partitionBy("stream").parquet(out_dir + "/packed_ids")
    neighbors.write.mode("overwrite").parquet(out_dir + "/neighbors")

    n_in, n_out = docs.count(), spark.read.parquet(out_dir + "/cleaned").count()
    n_seq = spark.read.parquet(out_dir + "/packed").agg(F.max("seq_id")).first()[0]
    pid = spark.read.parquet(out_dir + "/packed_ids")
    n_ids = pid.agg(F.sum("n_tokens")).first()[0]
    n_nb = spark.read.parquet(out_dir + "/neighbors").count()
    assert n_out > 0 and n_nb > 0 and n_seq is not None and n_ids > 0
    print(f"corpus: {n_in} docs -> {n_out} kept+mixed+selected ({n_in - n_out} dropped); "
          f"packed into <= {n_seq + 1} seqs/stream + {n_ids} BPE ids materialized; "
          f"{n_nb} neighbor edges -> {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:3])
