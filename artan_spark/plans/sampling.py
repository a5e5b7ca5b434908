"""Deterministic sampling / splitting over the ``documents`` table.

Training pipelines need splits and subsamples that are (a) reproducible
across runs and engines, (b) stable under repartitioning, and (c) free of
coordination — which rules out ``df.sample`` (partition-order dependent
RNG) and ``rand()`` seeds. The standard trick is hash-based assignment:
bucket every row by a portable content hash, so membership is a pure
function of the row. Both queries here are therefore bit-reproducible and
carry full value-hash oracles, unlike anything built on Spark's RNG.

Scale: split assignment is a stateless projection (no shuffle at all);
stratified top-N is one hash shuffle on the stratum key + a per-group
window — the same cost as any grouped top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from artan_spark.sources import read_table

# portable 60-bit md5 prefix (verified Spark == DuckDB incl. empty string)
_BUCKETS = 100
_TRAIN, _VAL = 80, 90  # 80/10/10


def _hash_bucket(col):
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long") % _BUCKETS
    )


def _hash_uniform(col):
    """Deterministic uniform in (0, 1) from the portable 60-bit md5 prefix
    — the shared hash-uniform every sampler keys membership on."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))


def docs_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment keyed on doc_id — a stateless
    projection, then per-split yield stats (count + token volume)."""
    d = read_table(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < _TRAIN, F.lit("train")).when(b < _VAL, F.lit("val")).otherwise(F.lit("test"))
    )
    toks = n_tokens_expr()
    return (
        d.select(split.alias("split"), toks.alias("n_tokens"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


_SPLIT_SQL = f"""
SELECT CASE WHEN b < {_TRAIN} THEN 'train' WHEN b < {_VAL} THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens
FROM (
  SELECT text,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % {_BUCKETS} AS b
  FROM documents
)
GROUP BY 1
"""


N_PER_LANG = 20


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota subsample: the N lowest-hash docs of each lang —
    a deterministic 'balanced corpus' selection. One shuffle on lang, then
    a bounded per-group top-k."""
    d = read_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        d.select("lang", "doc_id", h.alias("hv"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= N_PER_LANG)
        .select("lang", "doc_id", "rn")
    )


_STRATIFIED_SQL = f"""
SELECT lang, doc_id, rn
FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
                    doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= {N_PER_LANG}
"""


K_WEIGHTED = 50
_TWO60 = float(1 << 60)


def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement: the classic
    exponential-sort scheme (Efraimidis-Spirakis A-ES) with the hash as the
    uniform — keep the top-k docs by ln(u)/w where w = n_chars, i.e. sample
    probability proportional to document length, reproducible everywhere.

    Scale shape: the priority is a stateless projection and the top-k runs
    as TakeOrderedAndProject (per-partition heaps + tiny merge), NOT a
    global sort or single-partition window. Priorities are distinct random
    doubles, so cross-libm ln() noise (~1e-16 rel) cannot flip membership."""
    d = read_table(spark, sf_dir, "documents")
    prio = F.log(_hash_uniform(F.col("doc_id"))) / F.col("n_chars")
    return (
        d.select("doc_id", "lang", "n_chars", prio.alias("prio"))
        .orderBy(F.desc("prio"), F.asc("doc_id"))
        .limit(K_WEIGHTED)
        .select("doc_id", "lang", "n_chars")
    )


_TWO60_SQL = float(1 << 60)

_WEIGHTED_SQL = f"""
SELECT doc_id, lang, n_chars
FROM (
  SELECT doc_id, lang, n_chars,
         ln((CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
            / {_TWO60_SQL}) / n_chars AS prio
  FROM documents
)
ORDER BY prio DESC, doc_id ASC
LIMIT {K_WEIGHTED}
"""


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval decontamination: test-split documents that share word 3-grams
    with any train-split document — the overlap report you run before
    trusting a held-out set. Composes the hash split (above) with the
    shingle inverted index (plans/dedup.py): one equi-join on shingle, so
    cost tracks shared-shingle volume, not |train| x |test|. On real text
    apply the same df-cap as dedup_ngram_jaccard to bound hot-shingle
    fanout; this corpus has shingle df ~= 2."""
    from artan_spark.plans.dedup import _shingles

    sh = _shingles(spark, sf_dir)
    b = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < _TRAIN, F.lit("train")).when(b < _VAL, F.lit("val")).otherwise(F.lit("test"))
    )
    tagged = sh.withColumn("split", split)
    test_sh = tagged.filter(F.col("split") == "test").select("doc_id", "shingle")
    train_sh = tagged.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    return (
        test_sh.join(train_sh, "shingle")
        .groupBy(F.col("doc_id").alias("test_doc_id"))
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("train_doc_id").alias("n_train_docs_hit"),
        )
    )


_DECONTAMINATE_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
),
tagged AS (
  SELECT doc_id, shingle,
         CASE WHEN b < {_TRAIN} THEN 'train' WHEN b < {_VAL} THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT doc_id, shingle,
           CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % {_BUCKETS} AS b
    FROM sh
  )
)
SELECT t.doc_id AS test_doc_id,
       COUNT(DISTINCT t.shingle) AS n_shared_shingles,
       COUNT(DISTINCT tr.doc_id) AS n_train_docs_hit
FROM tagged t JOIN tagged tr ON t.shingle = tr.shingle
WHERE t.split = 'test' AND tr.split = 'train'
GROUP BY t.doc_id
"""


# -- Bloom-filter decontamination ---------------------------------------------

BLOOM_BITS = 1 << 18  # m: filter size in bits (4096 longs, ~32 KiB broadcast)
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 4  # hash functions


def _bloom_pos(j: int, col) -> F.Column:
    """Position of hash j: portable 60-bit md5 of 'j:value' mod m — the
    same cross-engine contract as every other hashed operator here."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 15), 16, 10).cast(
            "long"
        )
        % BLOOM_BITS
    )


# session memo for the decontamination filter bits (ONE ~32 KiB row over
# the immutable eval split) — the fit-cache contract; the train-side
# probe streams the corpus per invocation
_BLOOM_FIT_CACHE: dict[tuple, DataFrame] = {}


def bloom_build(items: DataFrame, col: str) -> DataFrame:
    """Build a Bloom filter over ``items[col]`` as ONE row
    ``bits: array<long>`` (length BLOOM_WORDS). Entirely JVM-side: items
    -> k positions each -> DISTINCT -> per-word ``bit_or`` partial agg ->
    map-assembled into the dense array. The filter is ~m/8 bytes however
    large the item set is — the broadcastable summary of a set too big to
    broadcast as rows."""
    pos = items.select(
        F.explode(F.array(*[_bloom_pos(j, F.col(col)) for j in range(BLOOM_K)])).alias("p")
    ).distinct()
    words = (
        pos.select(
            F.expr("p DIV 64").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("mw")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(BLOOM_WORDS - 1)),
            lambda i: F.coalesce(F.element_at("mw", i.cast("long")), F.lit(0).cast("long")),
        ).alias("bits")
    )


# single-bit masks indexed by (p % 64): a literal lookup avoids
# variable-amount shifts (the python shiftleft API takes only literal
# shift counts); bit 63 is the sign bit, hence the negative literal
_BIT_MASKS = [1 << i for i in range(63)] + [-(1 << 63)]


def _bloom_mask(p) -> F.Column:
    return F.element_at(
        F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS]), (p % 64).cast("int") + 1
    )


def bloom_hit(col, bits=None) -> F.Column:
    """True iff every hash position's bit is set in the filter — O(k)
    element_at probes per value, a stateless predicate fused into whatever
    scan feeds it (never a join against the member set).

    ``bits`` is the filter to probe: None (default) references a
    crossJoin-broadcast ``bits`` column — a deterministic filter above the
    crossJoin is pushed INTO the BroadcastNestedLoopJoin condition and
    runs interpreted, which the r12 A/B measured as the FASTER form — or a
    Python list of BLOOM_WORDS longs embedded as an array literal
    (codegen'd Filter; measured ~1.6x slower per probe than the
    interpreted condition on this data — the big array-literal accesses
    dominate — kept for callers that need a joinless plan shape)."""
    bits_col = F.lit(bits) if bits is not None else F.col("bits")
    hit = F.lit(True)
    for j in range(BLOOM_K):
        p = _bloom_pos(j, col)
        word = F.element_at(bits_col, (p / F.lit(64)).cast("int") + F.lit(1))
        hit = hit & (word.bitwiseAND(_bloom_mask(p)) != F.lit(0))
    return hit


def docs_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter eval decontamination — the 100-TB shape of
    ``docs_decontaminate``: instead of equi-joining the TRAIN shingle
    stream against the test set (a corpus-volume shuffle), build a Bloom
    filter over the TEST split's 3-gram shingles (eval sets are tiny
    next to a crawl) and flag train docs by a STATELESS membership probe
    fused into the corpus scan — zero shuffle on the corpus side beyond
    the per-doc count agg. False positives possible (bounded by the m/k
    design point and deterministic — same hashes both engines); false
    negatives impossible (Bloom guarantee; pinned against the exact join
    in tests). Returns (doc_id, n_flagged_shingles) for train docs with
    at least one bloom-positive shingle.

    Probe form (r12 A/B, kept deliberately): the crossJoin-broadcast
    probe plans as a BroadcastNestedLoopJoin CONDITION (interpreted), and
    the tempting alternative — pull the fixed ~32 KiB bits array to the
    driver and probe via a codegen'd literal-array Filter — MEASURED
    SLOWER (2M-shingle micro: 1.99 s vs 1.22 s warm; entry: ~6.0 s vs
    ~4.3 s), the big array-literal accesses costing more in generated
    code than the interpreted join condition. See OPTIMIZATION_r12.md."""
    from artan_spark.plans.dedup import _dedup_memo_key, _shingles
    from artan_spark.plans.simsearch import _evict_stale

    sh = _shingles(spark, sf_dir)
    b = _hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < _TRAIN, F.lit("train")).when(b < _VAL, F.lit("val")).otherwise(F.lit("test"))
    )
    tagged = sh.withColumn("split", split)
    # the ~32 KiB filter over the (immutable) eval split is a FIT — in
    # production it is literally a frozen artifact scored against every
    # crawl batch; fit it once per (appId, path, freshness-token). The
    # train-side probe (the corpus-volume work) still runs per invocation.
    memo_key = _dedup_memo_key(spark, sf_dir, "bloom-test-bits")
    bloom = _BLOOM_FIT_CACHE.get(memo_key)
    if bloom is None:
        bloom = bloom_build(tagged.filter(F.col("split") == "test"), "shingle").localCheckpoint()
        _evict_stale(_BLOOM_FIT_CACHE, memo_key)
        _BLOOM_FIT_CACHE[memo_key] = bloom
    train = tagged.filter(F.col("split") == "train").select("doc_id", "shingle")
    probed = train.crossJoin(F.broadcast(bloom))
    return (
        probed.filter(bloom_hit(F.col("shingle")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_flagged_shingles"))
    )


SEQ_LEN = 2048  # token budget per packed training sequence
N_STREAMS = 8  # parallel packing streams (cluster: one per writer task)


def docs_pack_sequences(
    spark: SparkSession, sf_dir: str, seq_len: int = SEQ_LEN, n_streams: int = N_STREAMS
) -> DataFrame:
    """Concat-and-cut sequence packing — the standard step that turns a
    cleaned document corpus into fixed-token training sequences: documents
    are concatenated in a deterministic order and cut every ``seq_len``
    tokens, so each doc lands in sequence ``floor(start_offset/seq_len)``
    of its stream.

    Spark-first shape: docs hash into ``n_streams`` independent packing
    streams (pure projection — at 100 TB each stream is one writer's
    worth of work and no stream needs to see another's rows), then ONE
    window per stream computes the running token offset (exclusive
    cumsum). Everything after the hash is order-deterministic (doc_id
    within stream), so the assignment is bit-reproducible across engines
    — full value-hash oracle. ``n_seqs`` per doc records straddling: a
    doc whose span crosses a cut belongs to multiple sequences
    (attention-mask bookkeeping downstream).

    Token counts use the shared whitespace tokenizer (``n_tokens_expr``,
    trim+split — same convention as textstats' counts and the mixing
    report that feeds this step).
    """
    d = read_table(spark, sf_dir, "documents")
    return pack_sequences(d, seq_len=seq_len, n_streams=n_streams)


def pack_sequences(
    d: DataFrame, seq_len: int = SEQ_LEN, n_streams: int = N_STREAMS
) -> DataFrame:
    """DataFrame-core of ``docs_pack_sequences``: pack any (doc_id, text)
    frame (e.g. a cleaned/filtered corpus mid-pipeline)."""
    d = d.select(
        "doc_id",
        (_hash_bucket(F.col("doc_id")) % n_streams).alias("stream"),
        n_tokens_expr().alias("n_tokens"),
    )
    w = Window.partitionBy("stream").orderBy("doc_id")
    offs = d.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
    )
    return offs.select(
        "doc_id",
        "stream",
        "n_tokens",
        "start_off",
        F.floor(F.col("start_off") / seq_len).alias("seq_id"),
        # number of seq_len windows the doc's [offset, offset+n_tokens) span touches
        (F.floor((F.col("start_off") + F.col("n_tokens") - 1) / seq_len) - F.floor(F.col("start_off") / seq_len) + 1).alias("n_seqs"),
    )


_PACK_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % {_BUCKETS} % {N_STREAMS} AS stream,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, stream, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM d
)
SELECT doc_id, stream, n_tokens, start_off,
       start_off // {SEQ_LEN} AS seq_id,
       (start_off + n_tokens - 1) // {SEQ_LEN} - start_off // {SEQ_LEN} + 1 AS n_seqs
FROM o
"""


BUDGET_FRAC = 0.5  # corpus-mixing token budget: half the corpus volume


def docs_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: rebalance the corpus toward EQUAL token
    volume per language under a global budget of ``BUDGET_FRAC`` of all
    tokens — the sampling step of a training-data mixture recipe
    (down-weight over-represented languages, keep scarce ones whole).

    Per-language acceptance rate ``r_l = min(1, budget_share / tokens_l)``
    where ``budget_share = BUDGET_FRAC * total_tokens / n_langs``; a doc is
    kept iff its hash-uniform ``u < r_l`` — deterministic doc-level
    Bernoulli, so the kept set is a pure function of the data (no RNG) and
    the kept token volume matches the target in expectation. Languages
    below their share keep rate 1 (never upsampled).

    Scale shape: one hash agg for the per-lang token totals (a few rows,
    broadcast back), then a stateless filter projection — no shuffle of
    the corpus itself, which is exactly how a 100-TB mixing job should
    look. Output is the per-lang yield report (rate, kept docs/tokens).
    """
    d = read_table(spark, sf_dir, "documents")
    return mix_sample(d)


def n_tokens_expr(col: str = "text"):
    """THE whitespace token count — ``size(split(trim(col), '\\s+'))``,
    matching ``textstats._toks``. Every token-volume consumer in this
    module (split stats, mixing, packing) uses this one expression so a
    doc with leading/trailing whitespace is counted identically by the
    mixing report and by the packer it feeds."""
    return F.size(F.split(F.trim(F.col(col)), r"\s+"))


def mix_rates(docs: DataFrame, budget_frac: float = BUDGET_FRAC) -> DataFrame:
    """Per-language acceptance rates (lang, rate) — UNROUNDED, so callers
    that re-apply the hash-Bernoulli keep (corpus_pipeline example) select
    exactly the set the ``mix_sample`` report accounts for; the report
    rounds only for display/oracle stability."""
    d = docs.select("doc_id", "lang", n_tokens_expr().alias("n_tokens"))
    totals = d.groupBy("lang").agg(F.sum("n_tokens").cast("long").alias("lang_tokens"))
    w = Window.partitionBy()
    return totals.select(
        "lang",
        F.least(
            F.lit(1.0),
            F.lit(budget_frac)
            * F.sum("lang_tokens").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
            / F.col("lang_tokens").cast("double"),
        ).alias("rate"),
    )


def mix_sample(docs: DataFrame, budget_frac: float = BUDGET_FRAC) -> DataFrame:
    """DataFrame-core of ``docs_mix_sample``: rebalance any (doc_id, lang,
    text) frame toward equal per-language token volume under the budget."""
    d = docs.select("doc_id", "lang", n_tokens_expr().alias("n_tokens"))
    kept = d.join(F.broadcast(mix_rates(docs, budget_frac)), "lang").filter(
        _hash_uniform(F.col("doc_id")) < F.col("rate")
    )
    return kept.groupBy("lang").agg(
        F.round(F.first("rate"), 6).alias("rate"),
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
    )


_MIX_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
t AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens FROM d GROUP BY lang),
r AS (
  SELECT lang, lang_tokens,
         LEAST(1.0, {BUDGET_FRAC} * (SUM(lang_tokens) OVER ()) / (COUNT(*) OVER ())
                      / CAST(lang_tokens AS DOUBLE)) AS rate
  FROM t
)
SELECT d.lang,
       ROUND(MIN(r.rate), 6) AS rate,
       COUNT(*) AS n_docs_kept,
       CAST(SUM(d.n_tokens) AS BIGINT) AS n_tokens_kept
FROM d JOIN r ON d.lang = r.lang
WHERE (CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
        / {_TWO60_SQL} < r.rate
GROUP BY d.lang
"""


# max token share any single source may hold. The driver corpus has 20
# roughly equal ~5% sources, so 4% makes every source actually exercise
# the downsampling branch (rate ~0.8) rather than degenerate to rate 1.0
SOURCE_CAP_SHARE = 0.04


def cap_source_share(
    docs: DataFrame,
    max_share: float = SOURCE_CAP_SHARE,
    key_col: str = "source",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Cap any single SOURCE's (domain's) token share of the corpus at
    ``max_share`` — the MassiveText/Gopher-style domain cap that stops a
    handful of boilerplate-heavy domains from dominating a crawl corpus.
    Sources over the cap are deterministically hash-downsampled to
    ``rate = cap_tokens / source_tokens``; under-cap sources pass through
    whole (never upsampled). Returns the kept (doc_id, source, n_tokens)
    rows.

    The cap is relative to the PRE-cap total — one aggregate pass, no
    fixpoint iteration (re-normalizing against the post-cap total would
    re-inflate the remaining shares every round; single-pass pre-cap is
    the standard practice). Scale shape mirrors ``mix_sample``: one hash
    agg for per-source totals (few rows, broadcast back), then a
    stateless hash-Bernoulli filter — the corpus itself never shuffles.

    ``n_tokens_col`` names a pre-computed token-count column to use
    instead of re-deriving ``n_tokens_expr()`` from ``text`` — callers
    that already paid a tokenizing pass (the curation pipeline's gated
    metadata) pass it so the cap's two reads stay tokenization-free."""
    if n_tokens_col is not None:
        d = docs.select("doc_id", key_col, F.col(n_tokens_col).cast("int").alias("n_tokens"))
    else:
        d = docs.select("doc_id", key_col, n_tokens_expr().alias("n_tokens"))
    totals = d.groupBy(key_col).agg(F.sum("n_tokens").cast("long").alias("src_tokens"))
    w = Window.partitionBy()
    rates = totals.select(
        key_col,
        F.least(
            F.lit(1.0),
            F.lit(max_share)
            * F.sum("src_tokens").over(w).cast("double")
            / F.col("src_tokens").cast("double"),
        ).alias("rate"),
    )
    return (
        d.join(F.broadcast(rates), key_col)
        .filter(_hash_uniform(F.col("doc_id")) < F.col("rate"))
        .select("doc_id", key_col, "n_tokens", "rate")
    )


# temperature exponent for docs_temperature_mix: 0.7 is the standard
# multilingual pretraining setting (XLM-R / mT5 lineage); alpha -> 0
# approaches the equal-share mix above, alpha = 1 is proportional
TEMP_ALPHA = 0.7


def temperature_mix(
    docs: DataFrame,
    alpha: float = TEMP_ALPHA,
    budget_frac: float = BUDGET_FRAC,
    key_col: str = "source",
) -> DataFrame:
    """Temperature-based mixture sampling over ``key_col`` — the
    p^alpha re-weighting every multilingual/multi-domain pretraining
    recipe uses (Conneau et al. 2020 §3.1; the LLaMA/GPT-3 data tables
    are hand-tuned instances of the same form): target share
    ``q_i = p_i^alpha / sum_j p_j^alpha`` where ``p_i`` is the group's
    token share, flattening the head and lifting the tail as alpha
    drops below 1. Acceptance ``rate_i = min(1, budget * q_i /
    tokens_i)`` — never upsampled — applied as the same deterministic
    doc-level hash-Bernoulli as ``mix_sample`` (alpha -> 0 recovers its
    equal-share targets; alpha = 1 is proportional pass-through at the
    budget).

    Cross-engine determinism: ``pow`` is NOT bit-portable between the
    JVM and C libm, so the rate is ROUNDED to 6 decimals BEFORE the
    Bernoulli comparison in both engines (the same 6-dp contract the
    k-means centroids use); semantically harmless, and the report then
    restates the exact filter rate. Scale shape identical to the other
    mixers: one hash agg to per-group totals (few rows), rates derived
    on that tiny frame, broadcast back, stateless filter — the corpus
    never shuffles. Returns kept (doc_id, key, n_tokens, rate) rows."""
    d = docs.select("doc_id", key_col, n_tokens_expr().alias("n_tokens"))
    totals = d.groupBy(key_col).agg(F.sum("n_tokens").cast("long").alias("grp_tokens"))
    w = Window.partitionBy()
    rates = (
        totals.withColumn("tot", F.sum("grp_tokens").over(w).cast("double"))
        .withColumn("pa", F.pow(F.col("grp_tokens").cast("double") / F.col("tot"), alpha))
        .withColumn("za", F.sum("pa").over(w))
        .select(
            key_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(budget_frac)
                    * F.col("tot")
                    * (F.col("pa") / F.col("za"))
                    / F.col("grp_tokens").cast("double"),
                ),
                6,
            ).alias("rate"),
        )
    )
    return (
        d.join(F.broadcast(rates), key_col)
        .filter(_hash_uniform(F.col("doc_id")) < F.col("rate"))
        .select("doc_id", key_col, "n_tokens", "rate")
    )


def docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source yield report of the temperature mix at the default
    alpha: (source, rate, n_docs_kept, n_tokens_kept)."""
    kept = temperature_mix(read_table(spark, sf_dir, "documents"))
    return kept.groupBy("source").agg(
        F.first("rate").alias("rate"),
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
    )


_TEMP_MIX_SQL = f"""
WITH d AS (
  SELECT doc_id, source, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
t AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS grp_tokens FROM d GROUP BY source),
r AS (
  SELECT source,
         ROUND(LEAST(1.0,
           {BUDGET_FRAC} * tot * (pa / (SUM(pa) OVER ())) / CAST(grp_tokens AS DOUBLE)
         ), 6) AS rate
  FROM (
    SELECT source, grp_tokens,
           CAST(SUM(grp_tokens) OVER () AS DOUBLE) AS tot,
           POWER(CAST(grp_tokens AS DOUBLE) / CAST(SUM(grp_tokens) OVER () AS DOUBLE),
                 {TEMP_ALPHA}) AS pa
    FROM t
  )
)
SELECT d.source,
       MIN(r.rate) AS rate,
       COUNT(*) AS n_docs_kept,
       CAST(SUM(d.n_tokens) AS BIGINT) AS n_tokens_kept
FROM d JOIN r ON d.source = r.source
WHERE (CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
        / {_TWO60_SQL} < r.rate
GROUP BY d.source
"""


def docs_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source yield report of the domain-cap pass: rate, kept docs,
    kept tokens — sorted consumers can verify no post-cap source exceeds
    the cap in expectation."""
    kept = cap_source_share(read_table(spark, sf_dir, "documents"))
    return kept.groupBy("source").agg(
        F.round(F.first("rate"), 6).alias("rate"),
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
    )


_SOURCE_CAP_SQL = f"""
WITH d AS (
  SELECT doc_id, source, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
t AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens FROM d GROUP BY source),
r AS (
  SELECT source,
         LEAST(1.0, {SOURCE_CAP_SHARE} * (SUM(src_tokens) OVER ())
                      / CAST(src_tokens AS DOUBLE)) AS rate
  FROM t
)
SELECT d.source,
       ROUND(MIN(r.rate), 6) AS rate,
       COUNT(*) AS n_docs_kept,
       CAST(SUM(d.n_tokens) AS BIGINT) AS n_tokens_kept
FROM d JOIN r ON d.source = r.source
WHERE (CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
        / {_TWO60_SQL} < r.rate
GROUP BY d.source
"""


# r11 window rotation: stratified/weighted moved to the pytest gate
# (split_assign + decontaminate keep the sampler family in the window)
QUERIES = {
    "docs_split_assign": docs_split_assign,
    "docs_decontaminate": docs_decontaminate,
}
ORACLES = {
    "docs_split_assign": _SPLIT_SQL,
    "docs_decontaminate": _DECONTAMINATE_SQL,
}
# registry is at the driver's 50-entry cap; these keep pytest oracles
# -- UniMax budget allocation ---------------------------------------------------

UNIMAX_EPOCHS = 4.0  # N: the per-group repeat cap for low-resource groups


def unimax_mix(
    docs: DataFrame,
    budget_frac: float = BUDGET_FRAC,
    max_epochs: float = UNIMAX_EPOCHS,
    key_col: str = "lang",
) -> DataFrame:
    """UniMax sampling (Chung et al., ICLR 2023): allocate a total token
    budget across groups by GREEDY WATERFILLING instead of a temperature
    exponent — visit groups smallest-first; each takes
    ``min(its_size * max_epochs, remaining_budget / groups_remaining)``.
    Low-resource groups get their full ``max_epochs``; whatever is left
    spreads UNIFORMLY over the high-resource ones (the paper's fairness
    argument vs p^alpha, which still over-allocates the head).

    Spark shape: per-group totals (tiny agg) -> ONE row holding the
    ascending-(size, key)-sorted group array -> the sequential greedy is
    an in-row ``aggregate`` fold over that bounded array (group count is
    tens, never corpus-sized) -> explode back to a rates table broadcast
    into the stateless hash-Bernoulli keep. The fold is +,-,*,/,min only
    — IEEE-exact in both engines, so the DuckDB oracle replays it with a
    recursive CTE bit-for-bit; rates round to 6 dp BEFORE the Bernoulli
    comparison (the same contract as ``temperature_mix``). Since this
    sampler never upsamples, groups whose allocation implies epochs > 1
    keep everything (rate caps at 1) — ``epochs`` is still reported so a
    repeat-aware loader can oversample them.

    Returns kept (doc_id, key, n_tokens, rate, epochs) rows."""
    d = docs.select("doc_id", key_col, n_tokens_expr().alias("n_tokens"))
    totals = d.groupBy(key_col).agg(F.sum("n_tokens").cast("double").alias("c"))
    one = totals.agg(
        F.array_sort(F.collect_list(F.struct("c", F.col(key_col).alias("k")))).alias("a"),
        F.sum("c").alias("tot"),
        F.count(F.lit(1)).alias("n"),
    )
    # the fold seed reads the row's tot, so the zero struct is a column
    # expression, not a literal
    zero = F.struct(
        (F.lit(budget_frac) * F.col("tot")).alias("rem"),
        F.lit(0).cast("int").alias("i"),
        F.expr("CAST(array() AS array<struct<k:string,alloc:double>>)").alias("out"),
    )

    def step(acc, x):
        share = acc["rem"] / (F.col("n") - acc["i"]).cast("double")
        alloc = F.least(x["c"] * F.lit(max_epochs), share)
        return F.struct(
            (acc["rem"] - alloc).alias("rem"),
            (acc["i"] + 1).cast("int").alias("i"),
            F.concat(
                acc["out"], F.array(F.struct(x["k"].alias("k"), alloc.alias("alloc")))
            ).alias("out"),
        )

    allocs = (
        one.select(F.explode(F.aggregate("a", zero, step)["out"]).alias("s"))
        .select(F.col("s.k").alias(key_col), F.col("s.alloc").alias("alloc"))
    )
    rates = allocs.join(totals, key_col).select(
        key_col,
        F.round("alloc", 6).alias("alloc_tokens"),
        F.round(F.col("alloc") / F.col("c"), 6).alias("epochs"),
        F.round(F.least(F.lit(1.0), F.col("alloc") / F.col("c")), 6).alias("rate"),
    )
    return (
        d.join(F.broadcast(rates), key_col)
        .filter(_hash_uniform(F.col("doc_id")) < F.col("rate"))
        .select("doc_id", key_col, "n_tokens", "rate", "epochs")
    )


def docs_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language UniMax report over ``documents``: allocation, epochs,
    acceptance rate, and realized kept volume."""
    kept = unimax_mix(read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("n_tokens_kept"),
        F.first("rate").alias("rate"),
        F.first("epochs").alias("epochs"),
    )


_UNIMAX_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
t AS (SELECT lang, CAST(SUM(n_tokens) AS DOUBLE) AS c FROM d GROUP BY lang),
o AS (
  SELECT lang, c,
         ROW_NUMBER() OVER (ORDER BY c ASC, lang ASC) AS rn,
         COUNT(*) OVER () AS n
  FROM t
),
rec AS (
  SELECT CAST(0 AS BIGINT) AS rn,
         {BUDGET_FRAC} * (SELECT SUM(c) FROM t) AS rem,
         CAST(NULL AS VARCHAR) AS lang,
         CAST(NULL AS DOUBLE) AS alloc
  UNION ALL
  SELECT o.rn,
         r.rem - LEAST(o.c * {UNIMAX_EPOCHS}, r.rem / (o.n - r.rn)),
         o.lang,
         LEAST(o.c * {UNIMAX_EPOCHS}, r.rem / (o.n - r.rn))
  FROM rec r JOIN o ON o.rn = r.rn + 1
),
rates AS (
  SELECT rec.lang,
         ROUND(LEAST(1.0, rec.alloc / t.c), 6) AS rate,
         ROUND(rec.alloc / t.c, 6) AS epochs
  FROM rec JOIN t ON t.lang = rec.lang
),
kept AS (
  SELECT d.doc_id, d.lang, d.n_tokens, r.rate, r.epochs
  FROM d JOIN rates r ON d.lang = r.lang
  WHERE (CAST(CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE) + 0.5)
          / {_TWO60_SQL} < r.rate
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_kept,
       ANY_VALUE(rate) AS rate,
       ANY_VALUE(epochs) AS epochs
FROM kept
GROUP BY lang
"""


_DECON_BLOOM_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
),
tagged AS (
  SELECT doc_id, shingle,
         CASE WHEN b < {_TRAIN} THEN 'train' WHEN b < {_VAL} THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT doc_id, shingle,
           CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % {_BUCKETS} AS b
    FROM sh
  )
),
j AS (SELECT unnest(range({BLOOM_K})) AS j),
testpos AS (
  SELECT DISTINCT
         CAST('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || t.shingle), 1, 15) AS BIGINT) % {BLOOM_BITS} AS p
  FROM tagged t CROSS JOIN j WHERE t.split = 'test'
),
probe AS (
  SELECT t.doc_id, t.shingle, j.j,
         CAST('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || t.shingle), 1, 15) AS BIGINT) % {BLOOM_BITS} AS p
  FROM tagged t CROSS JOIN j WHERE t.split = 'train'
),
hits AS (
  SELECT doc_id, shingle FROM probe JOIN testpos USING (p)
  GROUP BY doc_id, shingle HAVING COUNT(*) = {BLOOM_K}
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged_shingles FROM hits GROUP BY doc_id
"""


PYTEST_ORACLES = {
    "docs_stratified_sample": (docs_stratified_sample, _STRATIFIED_SQL),
    "docs_weighted_sample": (docs_weighted_sample, _WEIGHTED_SQL),
    "docs_decontaminate_bloom": (docs_decontaminate_bloom, _DECON_BLOOM_SQL),
    "docs_unimax_mix": (docs_unimax_mix, _UNIMAX_SQL),
    "docs_pack_sequences": (docs_pack_sequences, _PACK_SQL),
    "docs_mix_sample": (docs_mix_sample, _MIX_SQL),
    "docs_source_cap": (docs_source_cap, _SOURCE_CAP_SQL),
    "docs_temperature_mix": (docs_temperature_mix, _TEMP_MIX_SQL),
}


# -- fixed-window document chunking -------------------------------------------

CHUNK_WINDOW = 64  # tokens per training window
CHUNK_STRIDE = 48  # window start step (window - stride = 16-token overlap)


def chunk_documents(
    docs: DataFrame,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text) -> (doc_id, chunk_id, n_tokens, chunk): split every
    document into fixed-size overlapping token windows — the
    context-window preparation step between cleaning and packing when
    documents exceed the model's sequence length (the standard
    sliding-window regime; stride < window keeps boundary context in two
    chunks).

    Semantics: windows start at 0, stride, 2*stride, ... while the start
    is inside the document; the LAST window may be short (the tail is
    never dropped, and a short doc yields exactly one chunk — an empty
    doc yields one empty chunk, so every input row is represented).

    100-TB shape: pure in-row Catalyst — tokenize once per row, window
    starts via ``sequence``, slices via ``slice``, one ``posexplode``.
    No shuffle, no Python, no state; output rows ~ corpus tokens /
    stride."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.floor((n - F.lit(1)).cast("double") / F.lit(stride)).cast("int"),
            F.lit(0),
        ),
    )
    chunks = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, window))
    )
    out = docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk")
    )
    n_tokens = F.when(
        F.col("chunk") == "", F.lit(0)
    ).otherwise(F.size(F.split(F.col("chunk"), r"\s+")))
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        n_tokens.cast("long").alias("n_tokens"),
        "chunk",
    )


def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-table entry: per-(doc, chunk) report over ``documents`` at
    the default window/stride (chunk text elided to its token count +
    first token — the hash-stable summary; full text is corpus-sized)."""
    from artan_spark.sources import read_table_wide

    d = read_table_wide(spark, sf_dir, "documents").select("doc_id", "text")
    c = chunk_documents(d)
    first_tok = F.when(F.col("chunk") == "", F.lit("")).otherwise(
        F.split(F.col("chunk"), r"\s+")[0]
    )
    return c.select(
        "doc_id", "chunk_id", "n_tokens", first_tok.alias("first_token")
    )


_CHUNK_SQL = f"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
starts AS (
  SELECT doc_id, t,
         unnest(range(0, GREATEST(CAST(FLOOR((len(t) - 1) * 1.0 / {CHUNK_STRIDE}) AS BIGINT), 0) + 1)) AS k
  FROM base
),
chunks AS (
  SELECT doc_id, k AS chunk_id,
         t[k * {CHUNK_STRIDE} + 1 : LEAST(k * {CHUNK_STRIDE} + {CHUNK_WINDOW}, len(t))] AS ct
  FROM starts
)
SELECT doc_id, chunk_id,
       CAST(CASE WHEN len(ct) = 1 AND ct[1] = '' THEN 0 ELSE len(ct) END AS BIGINT) AS n_tokens,
       COALESCE(ct[1], '') AS first_token
FROM chunks
"""

PYTEST_ORACLES["docs_chunk_windows"] = (docs_chunk_windows, _CHUNK_SQL)

# -- embedding-based (semantic) decontamination --------------------------------

# A train doc whose embedding is this close to ANY eval doc is flagged.
# Random 64-dim pairs in this corpus cosine at ~N(0, 1/8); 0.35 sits past the
# p90 of the per-doc max, so the report is non-vacuous without flagging bulk.
EMB_DECON_THRESHOLD = 0.35
# Eval sets are benchmark-sized (1e4-1e6 rows). The collected eval matrix
# costs n_eval * dim * 8 bytes on the driver and per executor (200k x 64
# doubles ~= 100 MiB); past the gate, route through the LSH/IVF candidate
# path (plans/simsearch.py) instead of dense scoring.
EMB_DECON_EVAL_LIMIT = 200_000

_EMB_DECON_SCHEMA = "train_vec_id long, eval_vec_id long, max_cosine double"


def embedding_decontaminate(
    train: DataFrame,
    eval_vecs: DataFrame,
    *,
    threshold: float = EMB_DECON_THRESHOLD,
    eval_limit: int = EMB_DECON_EVAL_LIMIT,
) -> DataFrame:
    """Semantic decontamination: flag every ``train`` row whose embedding
    has cosine >= ``threshold`` to ANY ``eval_vecs`` row — the embedding
    twin of the n-gram ``docs_decontaminate`` (the overlap an exact-match
    scan misses: paraphrased or lightly-edited benchmark leakage).

    Both inputs need columns ``vec_id`` (long) and ``embedding``
    (array<float>). Returns one row per contaminated train doc:
    ``train_vec_id``, the closest eval doc ``eval_vec_id`` (smallest id on
    ties), ``max_cosine`` (rounded 6dp).

    Scale design: the eval side is the small one by construction, so it is
    collected ONCE (size-gated at ``eval_limit``, actionable error past it)
    and broadcast as a dense normalized numpy matrix; the corpus side
    streams through ONE Arrow ``mapInPandas`` pass — a per-batch
    (batch x eval) matmul, no shuffle, no pairwise blowup, corpus scan cost
    only. This is exactly the shape that survives 100 TB: the eval matrix
    is fixed-size however large the corpus is, and every batch is
    independent. For eval sets past the gate, use the LSH/IVF bucketed
    candidate generation in plans/simsearch.py.
    """
    import numpy as np
    import pandas as pd

    spark = train.sparkSession
    n_eval = eval_vecs.count()
    if n_eval == 0:
        return spark.createDataFrame([], _EMB_DECON_SCHEMA)
    if n_eval > eval_limit:
        raise ValueError(
            f"eval set has {n_eval} rows > eval_limit={eval_limit}: the dense "
            "broadcast matrix would tax the driver/executors — use the "
            "LSH/IVF candidate path (plans/simsearch.py) for eval sets this "
            "large, or raise eval_limit explicitly"
        )
    # sorted by vec_id so numpy argmax's first-occurrence tiebreak == the
    # oracle's ORDER BY cosine DESC, eval_vec_id ASC
    rows = eval_vecs.select("vec_id", "embedding").orderBy("vec_id").collect()
    eval_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    emat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    enorm = np.linalg.norm(emat, axis=1, keepdims=True)
    emat = emat / np.where(enorm == 0.0, 1.0, enorm)
    bc = spark.sparkContext.broadcast((eval_ids, emat))

    def score(batches):
        ids_e, me = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norm = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.where(norm == 0.0, 1.0, norm)
            sims = m @ me.T
            j = np.argmax(sims, axis=1)
            mx = sims[np.arange(len(m)), j]
            keep = mx >= threshold
            yield pd.DataFrame(
                {
                    "train_vec_id": pdf["vec_id"].to_numpy()[keep],
                    "eval_vec_id": ids_e[j[keep]],
                    "max_cosine": np.round(mx[keep], 6),
                }
            )

    return train.select("vec_id", "embedding").mapInPandas(score, _EMB_DECON_SCHEMA)


def docs_decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the md5 80/10/10 split over ``embeddings.vec_id``
    (same portable split as ``docs_split_assign``), test split = eval set,
    train split = corpus to scrub."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    b = _hash_bucket(F.col("vec_id"))
    return embedding_decontaminate(e.filter(b < _TRAIN), e.filter(b >= _VAL))


_EMB_DECON_SQL = f"""
WITH t AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) % {_BUCKETS} AS b
  FROM embeddings
),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS norm, b FROM t),
pairs AS (
  SELECT tr.vec_id AS train_vec_id, te.vec_id AS eval_vec_id,
         list_dot_product(tr.v, te.v) / (tr.norm * te.norm) AS c
  FROM n tr JOIN n te ON tr.b < {_TRAIN} AND te.b >= {_VAL}
),
best AS (
  SELECT train_vec_id, eval_vec_id, c,
         row_number() OVER (PARTITION BY train_vec_id ORDER BY c DESC, eval_vec_id ASC) AS rn
  FROM pairs
)
SELECT train_vec_id, eval_vec_id, ROUND(c, 6) AS max_cosine
FROM best WHERE rn = 1 AND c >= {EMB_DECON_THRESHOLD}
"""

PYTEST_ORACLES["docs_decontaminate_embedding"] = (
    docs_decontaminate_embedding,
    _EMB_DECON_SQL,
)


def persist_eval_index(eval_vecs: DataFrame, index_dir: str) -> None:
    """Persist the decontamination eval set as a reusable screening index:
    the (vec_id, embedding) rows, parquet at ``index_dir``. Train-once /
    screen-daily contract (same as the quality model and DSIR tables): a
    daily ingest batch is screened against the FROZEN eval set without
    re-shipping it through the driver of whatever job built it."""
    eval_vecs.select("vec_id", "embedding").write.mode("overwrite").parquet(
        index_dir + "/eval"
    )


def screen_against_eval_index(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    *,
    threshold: float = EMB_DECON_THRESHOLD,
    eval_limit: int = EMB_DECON_EVAL_LIMIT,
) -> DataFrame:
    """Score ``batch`` against a persisted eval index: identical output to
    ``embedding_decontaminate(batch, <original eval frame>)`` row-for-row
    (pinned by test). Reading the index is one parquet scan of an
    eval-sized table; the batch pass is the same single Arrow projection,
    so this runs on a readStream batch too."""
    ev = spark.read.parquet(index_dir + "/eval")
    return embedding_decontaminate(batch, ev, threshold=threshold, eval_limit=eval_limit)
