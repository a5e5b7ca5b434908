#!/usr/bin/env python
"""Daily lake maintenance: the incremental-serving composition a 100 TB
corpus runs when a new crawl batch lands — nothing rescans the corpus,
every step costs batch work against persisted build-once artifacts.

    BUILD ONCE (day 0, corpus snapshot):
      documents ─> MinHash signature store      (plans/neardup_store)
      documents ─> NB quality model, frozen     (plans/quality_clf)
      documents ─> Unigram-LM tokenizer, saved  (plans/tokenizer_store)
      embeddings ─> IVF ANN index               (plans/simsearch)
      events    ─> daily KMV/HLL sketch store   (plans/sketch_store)

    EVERY DAY (new batch, batch-sized work only):
      new docs  ─> exact-dup flags vs the WHOLE indexed corpus
                   (partition-pruned hash-store read) + store append
      new docs  ─> near-dup flags vs the WHOLE indexed corpus
                   (partition-pruned bucket semi-join) + store append
      new docs  ─> quality scores under the FROZEN model
                   (stateless row-wise projection — streams unchanged)
      new docs  ─> token ids under the LOADED vocabulary
                   (byte-identical ids across sessions)
      new vecs  ─> assigned to FROZEN centroids, cell files appended;
                   staleness ratio says when to rebuild
      new events─> per-day sketches appended; any-range distinct counts
                   answered from sketch rows (bit-equal to a full rescan)
      new events─> PSI drift per event_type against the FROZEN day-0
                   reference distribution (keys x bins store)
      new docs  ─> perplexity under the FROZEN bigram LM (CCNet serving:
                   train on the snapshot once, score every later batch)
      keep set  ─> deterministic sharded training export (re-exports
                   bit-reproduce; shard = training file)

Usage: python examples/incremental_lake.py [sf_dir]
"""

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from artan_spark.sources import session_builder


def main(sf_dir="/root/testdata/sf0.001"):
    from artan_spark.plans.neardup_store import (
        append_neardup_index,
        build_neardup_index,
        neardup_index_stats,
    )
    from artan_spark.plans.quality_clf import (
        persist_quality_model,
        score_rowwise_with_quality_model,
    )
    from artan_spark.plans.simsearch import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_index_staleness,
    )
    from artan_spark.plans.sketch_store import (
        append_sketch_days,
        build_sketch_store,
        sketch_distinct_over,
    )
    from artan_spark.plans.tokenizer_store import load_tokenizer, save_tokenizer
    from artan_spark.plans.unigram import unigram_encode_ids, unigram_train
    from artan_spark.sources import read_table, read_table_wide

    spark = session_builder(
        "IncrementalLake", master="local[4]", shuffle_partitions=4
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    root = tempfile.mkdtemp(prefix="incremental_lake_")

    docs = read_table_wide(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    vecs = read_table(spark, sf_dir, "embeddings")
    events = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")

    # ---- day 0: build every artifact on the snapshot ----------------------
    cut = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    base_docs, new_docs = docs.filter(F.col("doc_id") <= cut), docs.filter(
        F.col("doc_id") > cut
    )
    from artan_spark.plans.exact_store import append_exact_index, build_exact_index
    from artan_spark.plans.temporal import (
        persist_psi_reference,
        score_against_psi_reference,
    )

    build_exact_index(spark, root + "/ex", base_docs)
    build_neardup_index(spark, root + "/nd", base_docs)
    persist_psi_reference(
        events.filter(day <= F.lit("2024-01-20")).select("event_type", "value"),
        root + "/psi",
        "event_type",
        "value",
    )
    persist_quality_model(spark, root + "/qm", docs)  # full-corpus stats
    save_tokenizer(spark, root + "/tok", "unigram", unigram_train(docs, vocab_size=64, max_train_words=512))
    build_ivf_index(spark, sf_dir, root + "/ivf")
    build_sketch_store(spark, root + "/sk", events.filter(day <= F.lit("2024-01-20")))

    # ---- daily batch: everything below is batch-cost ----------------------
    ex_flags = append_exact_index(spark, root + "/ex", new_docs)
    print(
        f"exact-dup flags: {ex_flags.count()} batch docs, "
        f"{ex_flags.filter('is_dup').count()} exact dups vs corpus"
    )

    flags = append_neardup_index(spark, root + "/nd", new_docs)
    n_dup = flags.filter("is_dup").count()
    print(f"near-dup flags: {flags.count()} batch docs, {n_dup} dups vs corpus")
    print("signature store:", neardup_index_stats(spark, root + "/nd"))

    scored = score_rowwise_with_quality_model(spark, root + "/qm", new_docs)
    print("quality scores (frozen model, row-wise):")
    scored.orderBy(F.desc("prob")).show(3, truncate=60)

    kind, logp = load_tokenizer(spark, root + "/tok")
    enc = unigram_encode_ids(new_docs, logp)
    print(f"encoded under loaded {kind}: "
          f"{enc.agg(F.sum('n_tokens')).first()[0]} tokens")

    from artan_spark.plans.dsir import dsir_score_batch, persist_dsir_tables

    persist_dsir_tables(spark, root + "/dsir", docs)
    scored_w = dsir_score_batch(spark, root + "/dsir", new_docs)
    print("DSIR importance scores (frozen p/q tables):")
    scored_w.orderBy(F.desc("score")).show(3, truncate=40)

    # today's embedding batch: fresh ids past the indexed high-water mark
    vmax = vecs.agg(F.max("vec_id")).first()[0]
    new_vecs = vecs.limit(20).select(
        (F.col("vec_id") + F.lit(vmax + 1)).alias("vec_id"), "embedding"
    )
    append_to_ivf_index(spark, root + "/ivf", new_vecs)
    print("ivf staleness after append:", ivf_index_staleness(spark, root + "/ivf"))

    append_sketch_days(spark, root + "/sk", events.filter(day > F.lit("2024-01-20")))
    print("distinct users 2024-01-10..2024-01-25, from sketch rows only:")
    sketch_distinct_over(spark, root + "/sk", "2024-01-10", "2024-01-25").show()

    print("PSI drift of today's events vs the frozen day-0 reference:")
    score_against_psi_reference(
        spark,
        root + "/psi",
        events.filter(day > F.lit("2024-01-20")).select("event_type", "value"),
        "event_type",
        "value",
    ).orderBy(F.desc("psi")).show()

    from artan_spark.plans.lm import persist_lm, score_with_lm

    persist_lm(spark, root + "/lm", base_docs)
    ppl = score_with_lm(spark, root + "/lm", new_docs, "kn")
    print("batch perplexity under the frozen day-0 KN bigram LM:")
    ppl.orderBy("ppl").show(3)

    from artan_spark.plans.diff import diff_report

    print("what did today's batch change vs yesterday's corpus:")
    diff_report(base_docs, base_docs.unionByName(new_docs)).groupBy("status").agg(
        F.sum("n_docs").alias("n_docs")
    ).orderBy("status").show()

    from artan_spark.plans.skew import skew_report

    print("events user_id skew profile (salt sizing for the keyed joins):")
    skew_report(events, "user_id").show(truncate=False)

    from artan_spark.plans.export import export_plan, write_training_shards

    keep = new_docs.join(flags.filter("is_dup").select("doc_id"), "doc_id", "left_anti")
    write_training_shards(keep, root + "/shards")
    print("training export manifest (8 shards, md5 order):")
    export_plan(keep).orderBy("shard").show()

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
