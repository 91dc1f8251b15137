"""Training-data curation workloads: PII, quality gates, retention,
quota sampling, contamination, and closed-form regression statistics.

These are the corpus-governance operators a large-scale LLM training
pipeline runs between "raw crawl" and "tokenizer input" (SURVEY.md §0
north star; extends the text/dedup surface in workloads/text.py and
workloads/dedup.py):

- ``pii_pseudonymize_kanon`` — irreversible pseudonymization (SHA-256)
  of direct identifiers plus a k-anonymity audit over the
  quasi-identifier tuple (nation, segment, balance bucket).
- ``gopher_repetition_stats`` — repetition-based quality gates in the
  style of the Gopher rules (Rae et al. 2021): duplicate-token
  fraction, top-token share, top-bigram share.
- ``dedup_keep_best`` — retention policy on exact-duplicate clusters:
  keep the best representative (longest, then smallest id) per
  fingerprint group instead of an arbitrary one.
- ``source_quota_sample`` — deterministic per-source quota (bounded
  rows per domain) via hash-ordered ranking, the standard mix-balancing
  step before tokenization.
- ``mixture_temperature_resample`` — alpha=0.5 temperature rebalancing
  of the source mixture via closed-form ``sqrt(tok_min/tok_s)``
  acceptance rates (exact cross-engine, no RNG, two linear passes).
- ``train_split_assign`` — reproducible 80/10/10 train/val/test split
  by hash threshold on doc_id; new docs land in a stable split forever.
- ``contamination_ngram_overlap`` — benchmark-contamination check:
  fraction of each candidate document's 5-gram shingles that appear in
  a held-out benchmark corpus (here: the ``src0`` slice).
- ``lineitem_regression_stats`` — corr / OLS slope / intercept per
  group in closed form from exact decimal power sums (the oracle-exact
  formulation of A5/ML-adjacent stats from SURVEY.md §2.5).

Scale notes (100 TB):
- PII + quality + quota are narrow single-scan projections/windows
  partitioned by their natural keys (source, fingerprint); no
  cross-partition traffic beyond the one keyed shuffle each.
- The contamination benchmark set is tiny by construction (a benchmark
  suite, not the corpus), so the shingle-membership join broadcasts —
  no shuffle of the 100 TB side. With a larger benchmark, swap the
  broadcast for the Bloom prefilter in operators/bloom.py.
- Power-sum regression is a pure map-side-combinable aggregation: six
  decimal sums per group, one exchange, closed-form math on the tiny
  aggregated frame. This is how you fit millions of per-group OLS
  models without a Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.text import exploded_shingles, tokenize
from big_data_pipeline_spark.functions.vectors import (
    EMB_DIMS_DEFAULT,
    dot_sql,
    seq_cosine_fenced,
    sq_norm_sql,
)
from big_data_pipeline_spark.io import read_table

_TOKS_SQL = r"regexp_split_to_array(trim(text), '\s+')"

# --- pii_pseudonymize_kanon -------------------------------------------------

_K_THRESHOLD = 5
_BAL_BUCKET = 1000


def pii_pseudonymize_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymize direct identifiers; audit k-anonymity of the rest.

    c_name (direct identifier) -> SHA-256 hex. The quasi-identifier
    tuple (c_nationkey, c_mktsegment, floor-bucketed c_acctbal) gets a
    group-size k; rows with k < 5 are flagged for suppression. One
    window over the quasi-identifier key — single shuffle.
    """
    cust = read_table(spark, sf_dir, "customer")
    bucket = (F.floor(F.col("c_acctbal") / F.lit(float(_BAL_BUCKET))) * _BAL_BUCKET).alias(
        "bal_bucket"
    )
    w = Window.partitionBy("c_nationkey", "c_mktsegment", "bal_bucket")
    return (
        cust.select(
            "c_custkey",
            F.sha2(F.col("c_name"), 256).alias("name_pseudo"),
            "c_nationkey",
            "c_mktsegment",
            bucket,
        )
        .withColumn("k_anonymity", F.count(F.lit(1)).over(w))
        .withColumn("suppress", F.col("k_anonymity") < _K_THRESHOLD)
    )


_PII_SQL = f"""
SELECT c_custkey,
       sha256(c_name) AS name_pseudo,
       c_nationkey,
       c_mktsegment,
       CAST(FLOOR(c_acctbal / {_BAL_BUCKET}.0) AS BIGINT) * {_BAL_BUCKET} AS bal_bucket,
       COUNT(*) OVER (
         PARTITION BY c_nationkey, c_mktsegment,
                      CAST(FLOOR(c_acctbal / {_BAL_BUCKET}.0) AS BIGINT) * {_BAL_BUCKET}
       ) AS k_anonymity,
       COUNT(*) OVER (
         PARTITION BY c_nationkey, c_mktsegment,
                      CAST(FLOOR(c_acctbal / {_BAL_BUCKET}.0) AS BIGINT) * {_BAL_BUCKET}
       ) < {_K_THRESHOLD} AS suppress
FROM customer
"""

# --- gopher_repetition_stats ------------------------------------------------

_DUP_FRAC_MAX = 0.55
_TOP_TOKEN_MAX = 0.12


def gopher_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality gates: dup-token fraction, top-token share,
    top-bigram share, and the resulting keep/drop decision.

    One explode per granularity (token, bigram), each collapsed by a
    map-side-combinable two-level groupBy; the final join is on doc_id.
    """
    docs = read_table(spark, sf_dir, "documents")
    uni = (
        docs.select("doc_id", F.explode(tokenize("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    bi = (
        exploded_shingles(docs, "doc_id", "text", k=2, distinct=False)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_bigrams"), F.max("cnt").alias("top_bi_cnt"))
    )
    out = uni.join(bi, "doc_id")
    dup_frac = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens")
    top_share = F.col("top_cnt").cast("double") / F.col("n_tokens")
    bi_share = F.col("top_bi_cnt").cast("double") / F.col("n_bigrams")
    return out.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        dup_frac.alias("dup_token_frac"),
        top_share.alias("top_token_share"),
        bi_share.alias("top_bigram_share"),
        ((dup_frac <= _DUP_FRAC_MAX) & (top_share <= _TOP_TOKEN_MAX)).alias("keep"),
    )


_GOPHER_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
uni AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM toks, UNNEST(t) AS u(tok)
  GROUP BY doc_id, tok
),
unistats AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct,
         MAX(cnt) AS top_cnt
  FROM uni GROUP BY doc_id
),
bi AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS shingle, COUNT(*) AS cnt
  FROM toks, UNNEST(range(1, greatest(len(t), 2))) AS u(i)
  GROUP BY doc_id, array_to_string(t[i:i+1], ' ')
),
bistats AS (
  SELECT doc_id, SUM(cnt) AS n_bigrams, MAX(cnt) AS top_bi_cnt
  FROM bi GROUP BY doc_id
)
SELECT u.doc_id, n_tokens, n_distinct,
       1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_frac,
       CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_share,
       CAST(top_bi_cnt AS DOUBLE) / n_bigrams AS top_bigram_share,
       (1.0 - CAST(n_distinct AS DOUBLE) / n_tokens) <= {_DUP_FRAC_MAX}
         AND CAST(top_cnt AS DOUBLE) / n_tokens <= {_TOP_TOKEN_MAX} AS keep
FROM unistats u JOIN bistats b ON u.doc_id = b.doc_id
"""

# --- dedup_keep_best --------------------------------------------------------


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup retention policy: one representative per fingerprint
    group — longest text first, then smallest doc_id. Emits the kept
    row with its group size (how many dups it absorbed)."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.md5("text").alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint")
    wr = w.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("fingerprint", F.col("doc_id").alias("kept_doc_id"),
                "n_chars", "group_size",
                (F.col("group_size") - F.lit(1)).alias("n_dups_removed"))
    )


_KEEP_BEST_SQL = """
WITH fp AS (
  SELECT doc_id, n_chars, md5(text) AS fingerprint,
         COUNT(*) OVER (PARTITION BY md5(text)) AS group_size,
         ROW_NUMBER() OVER (
           PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id ASC
         ) AS rn
  FROM documents
)
SELECT fingerprint, doc_id AS kept_doc_id, n_chars, group_size,
       group_size - 1 AS n_dups_removed
FROM fp WHERE rn = 1
"""

# --- source_quota_sample ----------------------------------------------------

_QUOTA = 40


def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source quota: keep at most 40 docs per source,
    chosen by md5-hash order (stable across engines and runs — no RNG
    state, rerunnable at any scale). The mix-balancing step that stops
    one crawl domain from dominating the training mix."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        docs.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _QUOTA)
    )


_QUOTA_SQL = f"""
SELECT source, doc_id, rn FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))
         ) AS rn
  FROM documents
) WHERE rn <= {_QUOTA}
"""

# --- weighted_sample_docs ---------------------------------------------------

_SAMPLE_K = 100
# Efraimidis–Spirakis weighted reservoir key: u^(1/w) with u uniform in
# (0,1]. u comes from a Knuth multiplicative hash of doc_id instead of an
# RNG — deterministic, partition-order-free, identical in both engines.
_ES_KEY = (
    "pow((((doc_id * 2654435761) % 2147483648) + 1) / 2147483649.0,"
    " 1.0 / n_chars)"
)


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample: top-100 by the E-S key, so a
    doc's inclusion probability is proportional to n_chars without any
    RNG state (rerunnable, resumable — what a production training-mix
    sampler needs).

    orderBy().limit(k) plans as TakeOrderedAndProject: each partition
    keeps its local top-k, only k rows per partition reach the driver
    merge — no global sort at 100 TB. The key itself is not output
    (libm pow may differ in the last ulp across engines; ordering is
    unaffected but raw key bytes would flake the exact-value hash).
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    key = F.expr(_ES_KEY)
    top = docs.orderBy(key.desc(), F.asc("doc_id")).limit(_SAMPLE_K)
    w = Window.orderBy(F.expr(_ES_KEY).desc(), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))


_WEIGHTED_SQL = f"""
SELECT doc_id, source, n_chars, rank FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (ORDER BY {_ES_KEY} DESC, doc_id ASC) AS rank
  FROM documents
) WHERE rank <= {_SAMPLE_K}
"""

# --- contamination_ngram_overlap --------------------------------------------

_BENCH_SOURCE = "src0"
_CONTAM_K = 5


def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: share of each candidate doc's distinct
    5-grams that appear anywhere in the benchmark slice (source=src0).

    The benchmark shingle set is small (a benchmark suite, not a
    corpus), so it broadcasts; the candidate side never shuffles.
    """
    docs = read_table(spark, sf_dir, "documents")
    # source rides through the explode — no join back to the table
    sh = exploded_shingles(
        docs, "doc_id", "text", k=_CONTAM_K, extra_cols=("source",)
    )
    bench = (
        sh.filter(F.col("source") == _BENCH_SOURCE)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cand = sh.filter(F.col("source") != _BENCH_SOURCE)
    joined = cand.join(F.broadcast(bench), "shingle", "left")
    return (
        joined.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_hits"),
        )
        .select(
            "doc_id",
            "source",
            "n_shingles",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_shingles")).alias(
                "contamination_rate"
            ),
        )
    )


_CONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(t[i:i+{_CONTAM_K - 1}], ' ') AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - {_CONTAM_K - 2}, 2))) AS u(i)
),
bench AS (
  SELECT DISTINCT shingle, 1 AS hit FROM sh WHERE source = '{_BENCH_SOURCE}'
)
SELECT c.doc_id, c.source, COUNT(*) AS n_shingles,
       COUNT(b.hit) AS n_hits,
       CAST(COUNT(b.hit) AS DOUBLE) / COUNT(*) AS contamination_rate
FROM sh c LEFT JOIN bench b ON c.shingle = b.shingle
WHERE c.source <> '{_BENCH_SOURCE}'
GROUP BY c.doc_id, c.source
"""

# --- lineitem_regression_stats ----------------------------------------------

# One formula text shared by both engines: identical parse -> identical
# IEEE-754 evaluation order -> bit-exact doubles on both sides. Sums are
# over exact integer cents (sum of squared DOUBLE prices cast to decimal
# rounds differently across engines in the last ulp); the /100 cent
# scale is undone at the end. corr is scale-invariant.
_SLOPE = "((n * sxy - sx * sy) / (n * sxx - sx * sx)) / 100.0"
_INTERCEPT = "((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) / 100.0"
_CORR = "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))"


def lineitem_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS of extendedprice on quantity, plus Pearson
    corr, in closed form from exact integer-cent power sums.

    Equivalent to SQL regr_slope/regr_intercept/corr, but order-
    insensitive (exact decimal sums of integer cents) and bit-exact
    across engines — built-in float aggregates are summation-order-
    sensitive and cannot pass an exact-equality oracle. Map-side
    combinable; one exchange.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("x"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("yc"),
    )

    def dsum(expr: str, alias: str):
        return F.sum(F.expr(expr).cast("decimal(38,0)")).cast("double").alias(alias)

    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x", "sx"),
        dsum("yc", "sy"),
        dsum("x * yc", "sxy"),
        dsum("x * x", "sxx"),
        dsum("yc * yc", "syy"),
    )
    return sums.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(_SLOPE).alias("slope"),
        F.expr(_INTERCEPT).alias("intercept"),
        F.expr(_CORR).alias("corr_qty_price"),
    )


_REGR_SQL = f"""
WITH cents AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS yc
  FROM lineitem
),
sums AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(yc AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x * yc AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(yc * yc AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS syy
  FROM cents GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       {_SLOPE} AS slope,
       {_INTERCEPT} AS intercept,
       {_CORR} AS corr_qty_price
FROM sums
"""

def incremental_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: drop new-batch docs already present in
    the ingested corpus, then keep one representative per in-batch
    duplicate group.

    The between-runs shape every continuously-fed training pipeline
    needs (the reference's daily-append job rewrites its whole bucket;
    here the corpus side is touched only through its Bloom bitmap).
    Split: ``doc_id % 5 == 0`` plays the already-ingested corpus, the
    rest the incoming batch. Steps:

    1. fingerprint = md5(text) (exact dedup key, JVM-side).
    2. :func:`~..operators.bloom.bloom_pruned_anti_join`: bloom-negative
       batch rows are provably new (no shuffle); only the ~fpp sliver
       pays the exact left-anti join.
    3. in-batch dedup: min doc_id per fingerprint (one keyed window on
       the high-cardinality fingerprint — no low-cardinality trap).

    Oracle: the plain anti-join + row_number SQL — proves the Bloom fast
    path drops nothing and lets nothing through.
    """
    from big_data_pipeline_spark.operators.bloom import bloom_pruned_anti_join

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("fingerprint")
    )
    existing = docs.filter(F.col("doc_id") % 5 == 0)
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    new_docs = bloom_pruned_anti_join(
        batch, existing.select("fingerprint"), "fingerprint", "fingerprint"
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        new_docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint", "source")
    )


_INCR_DEDUP_SQL = """
WITH f AS (
  SELECT doc_id, source, md5(text) AS fingerprint FROM documents
),
existing AS (SELECT fingerprint FROM f WHERE doc_id % 5 = 0),
batch AS (SELECT * FROM f WHERE doc_id % 5 <> 0),
surv AS (
  SELECT b.* FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.fingerprint = b.fingerprint)
),
keep AS (
  SELECT doc_id, fingerprint, source,
         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM surv
)
SELECT doc_id, fingerprint, source FROM keep WHERE rn = 1
"""


def quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each language's top-quartile documents by token count, with
    the per-language p75 threshold computed EXACTLY and distributed.

    The scale trap this avoids: ``percent_rank() OVER (PARTITION BY
    lang ...)`` sorts each language in ONE task — a few langs over
    100 TB means a handful of straggler tasks owning terabytes. Instead
    the quantile is found on the score HISTOGRAM: group by (lang,
    n_tokens) — map-side combinable, output bounded by #distinct scores
    — then a cumulative sum over that tiny aggregate picks the smallest
    score whose cumulative count covers 75% (integer comparison
    ``4*cum >= 3*total``, bit-exact across engines). The thresholds
    frame (#langs rows) broadcast-joins back against the corpus, so the
    full-size side is scanned twice and never sorted.
    """
    toks = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokenize("text")).alias("n_tokens")
    )
    hist = toks.groupBy("lang", "n_tokens").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("lang")
        .orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("lang")
    thresholds = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("total", F.sum("cnt").over(wtot))
        .filter(F.col("cum") * 4 >= F.col("total") * 3)
        .groupBy("lang")
        .agg(F.min("n_tokens").alias("lang_p75"))
    )
    return toks.join(F.broadcast(thresholds), "lang").filter(
        F.col("n_tokens") >= F.col("lang_p75")
    ).select("doc_id", "lang", "n_tokens", "lang_p75")


_QGATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, len({_TOKS_SQL}) AS n_tokens FROM documents
),
hist AS (
  SELECT lang, n_tokens, COUNT(*) AS cnt FROM toks GROUP BY lang, n_tokens
),
cum AS (
  SELECT lang, n_tokens,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY n_tokens
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY lang) AS total
  FROM hist
),
thresholds AS (
  SELECT lang, MIN(n_tokens) AS lang_p75 FROM cum
  WHERE cum * 4 >= total * 3 GROUP BY lang
)
SELECT t.doc_id, t.lang, CAST(t.n_tokens AS INT) AS n_tokens,
       CAST(th.lang_p75 AS INT) AS lang_p75
FROM toks t JOIN thresholds th ON t.lang = th.lang
WHERE t.n_tokens >= th.lang_p75
"""


# --- incremental_neardup_batch ----------------------------------------------

_NEARDUP_JACCARD = 0.5


def neardup_batch_vs_corpus(
    batch_sh: DataFrame,
    corpus_sh: DataFrame,
    batch_sizes: DataFrame,
    corpus_sizes: DataFrame,
    threshold: float = _NEARDUP_JACCARD,
    fpp: float = 0.01,
) -> DataFrame:
    """Core of incremental near-dedup: given the incoming batch's
    exploded shingles and the ALREADY-PERSISTED corpus shingle table
    (plus per-doc shingle counts for each side), return the
    (batch_id, corpus_id, n_common, jaccard) pairs clearing
    ``threshold``.

    This is the production shape at 100 TB: the corpus-side shingle
    table and its per-doc sizes are the persisted outputs of prior
    ingests — each incremental run re-shingles ONLY the batch. The
    asymmetry does the work: a Bloom bitmap over the BATCH's shingles
    (the small side — a few MB regardless of corpus size) prunes the
    corpus shingle stream map-side, so the only corpus rows that reach
    the shuffle are those sharing a shingle with the incoming batch;
    everything else never moves. Candidates then pay the exact
    count/Jaccard verify, so output pairs are exactly the plain-join
    answer — the Bloom stage can only add ~fpp wasted shuffle rows,
    never drop a match.

    ``batch_sh`` feeds three consumers (bloom sizing, bloom build, the
    verify join); callers should localCheckpoint/persist it first.
    ``batch_sizes`` is batch-sized and broadcasts; ``corpus_sizes`` is
    corpus-doc-count-sized and joins the (small) candidate aggregate —
    AQE picks the broadcast direction at runtime.
    """
    from big_data_pipeline_spark.operators.bloom import (
        bloom_filter_rows,
        build_bloom,
        optimal_bits,
    )

    n_keys = max(1, batch_sh.select("shingle").distinct().count())
    num_bits, num_hashes = optimal_bits(n_keys, fpp)
    bitmap = build_bloom(batch_sh, "shingle", num_bits, num_hashes)
    corpus_pruned = bloom_filter_rows(corpus_sh, "shingle", bitmap, num_hashes)
    inter = (
        batch_sh.alias("b")
        # both sides are exploded-shingle-sized: pin the shuffle-hash
        # join (see shingle_jaccard_pairs — Catalyst sizes exploded
        # frames from the compact parquet and may try to broadcast)
        .join(
            corpus_pruned.alias("c").hint("shuffle_hash"),
            F.col("b.shingle") == F.col("c.shingle"),
        )
        .groupBy(
            F.col("b.doc_id").alias("batch_id"),
            F.col("c.doc_id").alias("corpus_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sb, sc = batch_sizes.alias("sb"), corpus_sizes.alias("sc")
    jacc = F.col("n_common").cast("double") / (
        F.col("sb.n") + F.col("sc.n") - F.col("n_common")
    )
    return (
        inter.join(F.broadcast(sb), F.col("batch_id") == F.col("sb.doc_id"))
        .join(sc, F.col("corpus_id") == F.col("sc.doc_id"))
        .filter(jacc >= threshold)
        .select("batch_id", "corpus_id", "n_common", jacc.alias("jaccard"))
    )


def incremental_neardup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dedup: find new-batch docs whose 3-word-shingle
    Jaccard against some already-ingested corpus doc clears 0.5 —
    without re-clustering the corpus.

    The companion to ``incremental_dedup_new_batch`` (same
    ``doc_id % 5`` corpus/batch split) one level up the dedup ladder:
    exact fingerprints catch byte-identical re-crawls, this catches the
    re-crawl with a new boilerplate header. This self-contained form
    shingles both sides from the documents table so a DuckDB oracle can
    replay it exactly; the production path — persisted corpus shingles,
    batch a small fraction of the corpus — is ``neardup_batch_vs_corpus``
    above (same plan from the Bloom stage on; stressed on an asymmetric
    1/50 split by tools/stress_neardup.py, numbers in SCALE.md).
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = exploded_shingles(docs, "doc_id", "text", 3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    is_corpus = F.col("doc_id") % 5 == 0
    # the batch shingle set feeds three consumers (bloom sizing, bloom
    # build, the verify join) — materialize once, same trade as the
    # minhash/simhash fingerprint reuse (on a cluster: persist or an
    # intermediate table)
    batch_sh = sh.filter(~is_corpus).localCheckpoint(eager=True)
    return neardup_batch_vs_corpus(
        batch_sh,
        sh.filter(is_corpus),
        sizes.filter(~is_corpus),
        sizes.filter(is_corpus),
    )


_INCR_NEARDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, COUNT(*) AS n_common
  FROM sh b JOIN sh c ON b.shingle = c.shingle
  WHERE b.doc_id % 5 <> 0 AND c.doc_id % 5 = 0
  GROUP BY 1, 2
)
SELECT batch_id, corpus_id, n_common,
       CAST(n_common AS DOUBLE) / (sb.n + sc.n - n_common) AS jaccard
FROM inter
JOIN sizes sb ON sb.doc_id = batch_id
JOIN sizes sc ON sc.doc_id = corpus_id
WHERE CAST(n_common AS DOUBLE) / (sb.n + sc.n - n_common)
      >= {_NEARDUP_JACCARD}
"""

# --- mixture_temperature_resample -------------------------------------------

# Uniform-in-[0,1) acceptance key from the same Knuth multiplicative
# hash family as weighted_sample_docs: deterministic, partition-order
# free, and evaluated identically by any ANSI engine (integers < 2^53
# are exact in doubles; the division is by a power of two). The divisor
# uses e-notation on purpose: `2147483648.0` parses as a DECIMAL
# literal in both Spark and DuckDB, routing u through decimal division
# at each engine's own scale; `2147483648e0` is a DOUBLE in both, and
# int/2^31 double division is exact.
_U_KEY = "((doc_id * 2654435761) % 2147483648) / 2147483648e0"


def mixture_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced source mixture (alpha = 0.5), the standard
    multilingual/multi-domain rebalancing step (mT5/XLM-R style): big
    sources are downsampled toward token share ~ sqrt(raw share) so
    small sources aren't drowned.

    Sampling cannot upsample without replication, so the mixture is
    anchored at the smallest source (acceptance 1.0). For alpha = 0.5
    the per-source acceptance rate collapses in closed form to
    ``sqrt(tok_min / tok_s)`` — the temperature weights' float
    normalizing sum cancels, leaving one exact int64 min, one exact
    int64->double division, and one IEEE-correctly-rounded sqrt; the
    result is bit-identical on every engine, so the whole sampler is
    oracle-hash-checkable (unlike pow/exp-based formulations).

    Scale (100 TB): pass 1 is a map-side-combinable groupBy(source) sum
    (output = #sources rows); rates broadcast back; pass 2 filters on
    the per-doc hash key. Two linear scans, one kilobyte-sized shuffle,
    no sort, no RNG state — rerunnable and resumable mid-corpus.
    """
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokenize("text")).alias("n_tokens")
    )
    totals = docs.groupBy("source").agg(F.sum("n_tokens").alias("tok_s"))
    tok_min = totals.agg(F.min("tok_s").alias("tok_min"))
    rates = totals.crossJoin(F.broadcast(tok_min)).select(
        "source",
        F.sqrt(F.col("tok_min").cast("double") / F.col("tok_s")).alias(
            "accept_rate"
        ),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(F.expr(_U_KEY) < F.col("accept_rate"))
        .select("doc_id", "source", "n_tokens", "accept_rate")
    )


_MIXTURE_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, len({_TOKS_SQL}) AS n_tokens FROM documents
),
tot AS (SELECT source, SUM(n_tokens) AS tok_s FROM tok GROUP BY source),
m AS (SELECT MIN(tok_s) AS tok_min FROM tot),
rates AS (
  SELECT source, sqrt(CAST(tok_min AS DOUBLE) / tok_s) AS accept_rate
  FROM tot CROSS JOIN m
)
SELECT t.doc_id, t.source, CAST(t.n_tokens AS INT) AS n_tokens,
       r.accept_rate
FROM tok t JOIN rates r ON t.source = r.source
WHERE {_U_KEY} < r.accept_rate
"""

# --- train_split_assign ------------------------------------------------------


def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split by hash of doc_id,
    reported as per-(split, lang) doc and token counts.

    Hash-threshold assignment is how production pipelines hold out
    evaluation data: membership is a pure function of the key, so it
    survives reruns, backfills, and corpus growth (new docs land in the
    right split without reshuffling old ones) — none of which is true
    of rand()-based splits. Single scan + one map-side-combinable
    groupBy on a 3 x #langs key space.
    """
    u = F.expr(_U_KEY)
    split = (
        F.when(u < 0.8, F.lit("train"))
        .when(u < 0.9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    docs = read_table(spark, sf_dir, "documents").select(
        split.alias("split"),
        "lang",
        F.size(tokenize("text")).alias("n_tokens"),
    )
    return docs.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


_SPLIT_SQL = f"""
SELECT CASE WHEN {_U_KEY} < 0.8 THEN 'train'
            WHEN {_U_KEY} < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1, 2
"""

# --- dsir_importance_score --------------------------------------------------

_DSIR_TARGET_LANG = "en"


def dsir_importance_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling, DSIR-shaped (Xie et
    al. 2023): score each raw document by how much its hashed-n-gram
    feature profile leans toward a target distribution (here: the
    English slice stands in for the curated target corpus), then keep
    the documents that lean target-ward.

    The textbook weight is a product of probability ratios evaluated in
    log space — but cross-engine ``log`` is not ulp-reproducible, so
    this uses the algebraically equivalent SIGN-exact linear form:
    per feature f, lean(f) = target_cnt(f)·RT − raw_cnt(f)·TT (RT/TT =
    total raw/target feature mass), a pure BIGINT; a document's score
    is the integer sum over its distinct bigram features, normalized by
    the constant RT·TT in ONE final double division. Zero floats until
    the last step → cell-exact oracle. (At corpora where the integer
    products would overflow int64, drop to per-feature double
    log-weights and a rows-only check — the plan shape is unchanged.)

    Scale: one explode (map-side), then the exploded frame crosses the
    wire exactly ONCE — a single shingle-keyed exchange on which a
    whole-partition window (``partitionBy(shingle)``, no frame) attaches
    raw_cnt/target_cnt to every occurrence row in place, followed by the
    per-doc groupBy. The earlier groupBy-then-join-back formulation
    shuffled the exploded frame on shingle TWICE (stats agg + join
    re-exchange); the r9 sf10 stress measured that at 12.8x on 10x data
    isolated, and halving the dominant exchange is what brings it back
    inside the linear envelope. The totals ride a 1-row broadcast and
    come straight off the pre-shuffle frame: summing raw_cnt over
    distinct shingles equals counting occurrence rows (and likewise for
    the target mass), so rt/tt need a map-side partial agg only, never
    the per-shingle table. No Python anywhere.
    """
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    feats = exploded_shingles(
        docs, "doc_id", "text", k=2, distinct=True, extra_cols=("lang",)
    )
    is_target = F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
    totals = feats.agg(
        F.count(F.lit(1)).alias("rt"), F.sum(is_target).alias("tt")
    )
    w = Window.partitionBy("shingle")
    occ = feats.select(
        "doc_id",
        "lang",
        F.count(F.lit(1)).over(w).alias("raw_cnt"),
        F.sum(is_target).over(w).alias("target_cnt"),
    )
    per_doc = (
        occ.crossJoin(F.broadcast(totals))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(
                F.col("target_cnt") * F.col("rt")
                - F.col("raw_cnt") * F.col("tt")
            ).alias("score_num"),
            F.first(F.col("rt") * F.col("tt")).alias("denom"),
        )
    )
    return per_doc.select(
        "doc_id",
        "lang",
        "n_feats",
        "score_num",
        (F.col("score_num").cast("double") / F.col("denom")).alias(
            "dsir_score"
        ),
        (F.col("score_num") > 0).alias("keep"),
    )


_DSIR_SQL = f"""
WITH toks AS (SELECT doc_id, lang, {_TOKS_SQL} AS t FROM documents),
feats AS (
  SELECT DISTINCT doc_id, lang, array_to_string(t[i:i+1], ' ') AS shingle
  FROM toks, UNNEST(range(1, GREATEST(len(t), 2))) AS u(i)
),
stats AS (
  SELECT shingle, COUNT(*) AS raw_cnt,
         SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
           AS target_cnt
  FROM feats GROUP BY shingle
),
tot AS (
  SELECT CAST(SUM(raw_cnt) AS BIGINT) AS rt,
         CAST(SUM(target_cnt) AS BIGINT) AS tt
  FROM stats
),
per_doc AS (
  SELECT f.doc_id, f.lang, COUNT(*) AS n_feats,
         CAST(SUM(s.target_cnt * t.rt - s.raw_cnt * t.tt) AS BIGINT)
           AS score_num,
         CAST(t.rt * t.tt AS BIGINT) AS denom
  FROM feats f JOIN stats s USING (shingle), tot t
  GROUP BY f.doc_id, f.lang, t.rt, t.tt
)
SELECT doc_id, lang, n_feats, score_num,
       CAST(score_num AS DOUBLE) / denom AS dsir_score,
       score_num > 0 AS keep
FROM per_doc
"""

# --- ldiversity_audit -------------------------------------------------------

_L_THRESHOLD = 3


def ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007), the
    companion check to ``pii_pseudonymize_kanon``: k-anonymity alone
    still leaks when everyone in a quasi-identifier group shares one
    sensitive value (homogeneity attack). Per QI group
    (nation, balance bucket) report group size k, the number of
    distinct sensitive values l (market segment as the stand-in
    sensitive attribute), and whether the group meets l >= 3.

    One map-side-combinable groupBy on the QI key — a single keyed
    exchange of tiny per-group counters; COUNT(DISTINCT) expands to
    Spark's two-phase partial-distinct aggregate, so no QI group ever
    concentrates on one task beyond its own distinct value set.
    """
    cust = read_table(spark, sf_dir, "customer")
    bucket = (
        F.floor(F.col("c_acctbal") / F.lit(float(_BAL_BUCKET))) * _BAL_BUCKET
    ).alias("bal_bucket")
    return (
        cust.select("c_nationkey", bucket, "c_mktsegment")
        .groupBy("c_nationkey", "bal_bucket")
        .agg(
            F.count(F.lit(1)).alias("k_size"),
            F.count_distinct("c_mktsegment").alias("l_distinct"),
        )
        .withColumn("diverse", F.col("l_distinct") >= _L_THRESHOLD)
    )


_LDIV_SQL = f"""
SELECT c_nationkey,
       CAST(FLOOR(c_acctbal / {_BAL_BUCKET}.0) AS BIGINT) * {_BAL_BUCKET} AS bal_bucket,
       COUNT(*) AS k_size,
       COUNT(DISTINCT c_mktsegment) AS l_distinct,
       COUNT(DISTINCT c_mktsegment) >= {_L_THRESHOLD} AS diverse
FROM customer
GROUP BY 1, 2
"""

# --- split_leakage_audit ----------------------------------------------------

_LEAK_THRESHOLD = 0.35
_LEAK_EVAL_FRAC = 0.9  # u >= 0.9 -> held-out eval split
_LEAK_BENCH_K = 600  # audited benchmark sample (fixed size at any corpus)


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination via embedding near-duplicates: after the
    hash-threshold split (same Knuth key family as
    ``train_split_assign``), report every (train, eval) vector pair
    whose cosine similarity crosses the near-dup threshold — the
    memorization-risk audit run before a held-out set is trusted.

    The eval split is ~10% of the corpus by construction, and an eval
    *benchmark* at 100 TB scale is smaller still — so the eval side is
    broadcast and the train side streams once: no shuffle of the big
    side, |train| x |eval| scored with the Arrow ``seq_cosine`` kernel
    (squared norms precomputed per vector; bit-identical to the
    oracle's unrolled chain). For an eval side too big to broadcast,
    the LSH band join in similarity/knn.py is the candidate prefilter.
    """
    u = F.expr("((vec_id * 2654435761) % 2147483648) / 2147483648e0")
    emb = (
        read_table(spark, sf_dir, "embeddings")
        .withColumn("u", u)
        .withColumn(
            "sqn", F.expr(sq_norm_sql("embedding", EMB_DIMS_DEFAULT, offset=0))
        )
    )
    # spread the streaming side across all cores BEFORE the broadcast
    # nested-loop join: a small-file corpus arrives as one split, and
    # the NLJ inherits its partitioning — without this every
    # |train| x |eval| scoring runs on one thread (measured 126s -> ~8s
    # at the sf1 stress corpus). Same move as knn_cosine_topk.
    train = (
        emb.filter(F.col("u") < _LEAK_EVAL_FRAC)
        .select(
            F.col("vec_id").alias("train_id"),
            F.col("embedding").alias("t_vec"),
            F.col("sqn").alias("t_sqn"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # the audited benchmark is a FIXED-SIZE deterministic sample of the
    # held-out split (hash order): real eval benchmarks do not grow
    # with the corpus, and without the cap the |train| x |eval| scoring
    # is f(1-f)·N² — measured 12.5x at the 10x stress corpus. The cap
    # is above the whole eval split at the driver's sf0.01/sf0.1
    # scales, so checked results are unchanged there; TakeOrdered keeps
    # the selection a top-k, never a global sort.
    ev = (
        emb.filter(F.col("u") >= _LEAK_EVAL_FRAC)
        .orderBy("u", "vec_id")
        .limit(_LEAK_BENCH_K)
        .select(
            F.col("vec_id").alias("eval_id"),
            F.col("embedding").alias("e_vec"),
            F.col("sqn").alias("e_sqn"),
        )
    )
    # score-then-filter: the fenced kernel keeps the |train| x |eval|
    # scoring to ONE ArrowEvalPython pass (the deterministic form was
    # evaluated twice — see seq_cosine_fenced in functions/vectors.py).
    # Verified bit-identical output.
    return (
        train.crossJoin(F.broadcast(ev))
        .withColumn(
            "cos_sim",
            seq_cosine_fenced(
                F.col("t_vec"), F.col("e_vec"), F.col("t_sqn"), F.col("e_sqn")
            ),
        )
        .filter(F.col("cos_sim") >= _LEAK_THRESHOLD)
        .select("train_id", "eval_id", "cos_sim")
    )


_LEAK_U = "((vec_id * 2654435761) % 2147483648) / 2147483648e0"

_LEAK_SQL = f"""
WITH s AS (
  SELECT vec_id, embedding, {_LEAK_U} AS u,
         {sq_norm_sql("embedding", EMB_DIMS_DEFAULT, offset=1)} AS sqn
  FROM embeddings
),
t AS (SELECT vec_id AS train_id, embedding AS t_vec, sqn AS t_sqn FROM s
      WHERE u < {_LEAK_EVAL_FRAC}),
v AS (SELECT vec_id AS eval_id, embedding AS e_vec, sqn AS e_sqn FROM s
      WHERE u >= {_LEAK_EVAL_FRAC}
      ORDER BY u, vec_id LIMIT {_LEAK_BENCH_K}),
pairs AS (
  SELECT train_id, eval_id,
         ({dot_sql("t_vec", "e_vec", EMB_DIMS_DEFAULT, offset=1)})
           / (sqrt(t_sqn) * sqrt(e_sqn)) AS cos_sim
  FROM t, v
)
SELECT train_id, eval_id, cos_sim FROM pairs
WHERE cos_sim >= {_LEAK_THRESHOLD}
"""


# --- epoch_shuffle_shards: seeded deterministic training-order shuffle ------
# The data-loader handoff step: a reproducible epoch-seeded global
# permutation of the corpus, materialized as (shard, pos_in_shard) so
# each shard is one output file a loader streams in order. Assignment
# is a pure function of (epoch, doc_id) — the same Knuth multiplicative
# hash discipline as _U_KEY above — so reruns and backfills reproduce
# the exact same order, unlike rand()-based shuffles.
#
# Scale (100 TB): shard count is the parallelism contract — production
# runs pick shards ~ number of output files (thousands), so each window
# partition holds corpus/shards rows and the per-shard ROW_NUMBER is
# NOT the low-cardinality single-task trap: a totally-ordered shard
# file must be assembled in one place by definition, and its size is
# bounded by construction. One hash exchange on shard, no joins.

_EPOCH = 7
_EPOCH_SHARDS = 16
# (doc_id + epoch * 40503) * 2654435761 stays well inside BIGINT for
# any realistic doc_id; % 2^31 folds it to a positive 31-bit value in
# both engines (all inputs positive).
_EPOCH_H = (
    f"((doc_id + {_EPOCH} * 40503) * 2654435761) % 2147483648"
)


def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_EPOCH_H).alias("h")
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.withColumn("shard", (F.col("h") % _EPOCH_SHARDS).cast("int"))
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos_in_shard")
    )


_EPOCH_SHUFFLE_SQL = f"""
WITH h AS (
  SELECT doc_id, {_EPOCH_H} AS h FROM documents
)
SELECT doc_id,
       CAST(h % {_EPOCH_SHARDS} AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY h % {_EPOCH_SHARDS} ORDER BY h, doc_id
       ) AS BIGINT) AS pos_in_shard
FROM h
"""


# --- local differential privacy: randomized response ------------------------
#
# Warner (1965) randomized response, the LDP primitive every private
# telemetry/count pipeline builds on: each row reports its TRUE order
# status with probability p, otherwise a uniformly random status — then
# the aggregate de-biases the noisy counts. "Random" is the house
# deterministic double-round LCG scrambler (cf. stratified_sample_docs),
# so the privatized report is reproducible across runs, cluster
# layouts, AND engines — which makes the whole mechanism
# oracle-checkable while keeping the estimator mathematics intact
# (the scrambler passes the same uniformity tests as the samplers).
# Scale: one narrow map + one tiny groupBy — nothing driver-side.

_RR_SALT = 65537
_RR_KEEP_NUM = 3  # keep truth with prob 3/4
_RR_KEEP_DEN = 4
_RR_STATUSES = ("F", "O", "P")  # orders.o_orderstatus domain, sorted


def rr_dp_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    m = 2147483648
    h1 = ((F.col("o_orderkey") + _RR_SALT) * 1103515245 + 12345) % m
    coin = (h1 * 1103515245 + 12345) % m
    h2 = ((F.col("o_orderkey") + _RR_SALT * 2) * 1103515245 + 12345) % m
    pick = (h2 * 1103515245 + 12345) % m % len(_RR_STATUSES)
    alt = F.when(pick == 0, _RR_STATUSES[0]).when(
        pick == 1, _RR_STATUSES[1]
    ).otherwise(_RR_STATUSES[2])
    keep = coin * _RR_KEEP_DEN < m * _RR_KEEP_NUM
    reported = (
        orders.select(
            F.when(keep, F.col("o_orderstatus")).otherwise(alt).alias("status")
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_reported"))
    )
    truth = orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    total = orders.agg(F.count(F.lit(1)).alias("n_total"))
    p = float(_RR_KEEP_NUM) / _RR_KEEP_DEN
    q = (1.0 - p) / len(_RR_STATUSES)
    est = F.expr(
        f"(CAST(n_reported AS DOUBLE) - CAST(n_total AS DOUBLE) * {q!r})"
        f" / {p!r}"
    )
    return (
        reported.join(truth, "status", "full")
        .crossJoin(F.broadcast(total))
        .select("status", "n_true", "n_reported", est.alias("n_estimated"))
    )


def _rr_sql() -> str:
    m = 2147483648
    p = float(_RR_KEEP_NUM) / _RR_KEEP_DEN
    q = (1.0 - p) / len(_RR_STATUSES)
    coin = (
        f"((((o_orderkey + {_RR_SALT}) * 1103515245 + 12345) % {m})"
        f" * 1103515245 + 12345) % {m}"
    )
    pick = (
        f"((((o_orderkey + {_RR_SALT * 2}) * 1103515245 + 12345) % {m})"
        f" * 1103515245 + 12345) % {m} % {len(_RR_STATUSES)}"
    )
    alts = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(_RR_STATUSES)
    )
    return f"""
WITH reported AS (
  SELECT CASE WHEN ({coin}) * {_RR_KEEP_DEN} < CAST({m} AS BIGINT) * {_RR_KEEP_NUM}
              THEN o_orderstatus
              ELSE (CASE ({pick}) {alts} END) END AS status
  FROM orders
),
rep AS (SELECT status, COUNT(*) AS n_reported FROM reported GROUP BY status),
truth AS (SELECT o_orderstatus AS status, COUNT(*) AS n_true
          FROM orders GROUP BY 1),
total AS (SELECT COUNT(*) AS n_total FROM orders)
SELECT COALESCE(rep.status, truth.status) AS status, n_true, n_reported,
       (CAST(n_reported AS DOUBLE) - CAST(n_total AS DOUBLE) * {q!r}) / {p!r}
         AS n_estimated
FROM rep FULL JOIN truth ON rep.status = truth.status
CROSS JOIN total
"""


# --- t_closeness_audit ------------------------------------------------------

_TC_K = 10  # ordered sensitive-attribute buckets
_TC_LO = -1000.0
_TC_WIDTH = 1100.0
_TC_T = 0.2


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third rung of the privacy ladder after ``pii_pseudonymize_kanon``
    and ``ldiversity_audit``: l-diversity still leaks when a QI group's
    sensitive values are diverse but SKEWED vs the population. Per QI
    group (nation, market segment), compare the group's distribution of
    the ordered sensitive attribute (account balance in ``_TC_K``
    fixed-width buckets) to the global one with the earth-mover's
    distance for ordered categories: EMD = sum_i |CumQ_i - CumP_i| /
    (k-1). Groups with EMD > ``_TC_T`` fail.

    Determinism: the cumulative fractions are compared in INTEGER form
    — |cumq*N - cump*n_g| sums exactly as BIGINT (bounded by
    k*n_g*N ~ 1e18 at a 1.5e9-customer scale, inside int64), and only
    the final normalization divides once as double. Scale: two
    map-side-combinable counts (per-group-bucket, global-bucket); the
    dense group x bucket grid is groups x k rows via a literal
    ``sequence`` explode (no data-sized cross join); the global bucket
    CDF is a k-row broadcast; the per-group cumsum windows over the QI
    key — high cardinality, never a global window.
    """
    bucket = F.least(
        F.greatest(
            F.floor((F.col("c_acctbal") - F.lit(_TC_LO)) / F.lit(_TC_WIDTH)),
            F.lit(0),
        ),
        F.lit(_TC_K - 1),
    ).cast("bigint")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", bucket.alias("bucket")
    )
    grp_cnt = cust.groupBy("c_nationkey", "c_mktsegment", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gsz = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k_size")
    )
    glob = (
        cust.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("gcnt"))
        .withColumn(
            "cump",
            F.sum("gcnt").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .select("bucket", "cump")
    )
    total = cust.agg(F.count(F.lit(1)).alias("n_total"))
    dense = gsz.select(
        "c_nationkey",
        "c_mktsegment",
        "k_size",
        F.explode(F.sequence(F.lit(0), F.lit(_TC_K - 1))).alias("bucket"),
    )
    wq = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    terms = (
        dense.join(grp_cnt, ["c_nationkey", "c_mktsegment", "bucket"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .withColumn("cumq", F.sum("cnt").over(wq))
        .filter(F.col("bucket") < _TC_K - 1)
        .join(F.broadcast(glob), "bucket")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "term",
            F.abs(
                F.col("cumq") * F.col("n_total")
                - F.col("cump") * F.col("k_size")
            ),
        )
    )
    return (
        terms.groupBy("c_nationkey", "c_mktsegment", "k_size", "n_total")
        .agg(F.sum("term").alias("num"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k_size",
            (
                F.col("num").cast("double")
                / (
                    F.col("k_size") * F.col("n_total") * F.lit(_TC_K - 1)
                ).cast("double")
            ).alias("emd"),
        )
        .withColumn("t_close", F.col("emd") <= _TC_T)
    )


_TCLOSE_SQL = f"""
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         LEAST(GREATEST(CAST(FLOOR((c_acctbal - ({_TC_LO!r})) / {_TC_WIDTH!r})
                             AS BIGINT), 0), {_TC_K - 1}) AS bucket
  FROM customer
),
grp_cnt AS (
  SELECT c_nationkey, c_mktsegment, bucket, COUNT(*) AS cnt
  FROM cust GROUP BY 1, 2, 3
),
gsz AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS k_size
  FROM cust GROUP BY 1, 2
),
gcdf AS (
  SELECT bucket,
         SUM(COUNT(*)) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cump
  FROM cust GROUP BY bucket
),
total AS (SELECT COUNT(*) AS n_total FROM cust),
dense AS (
  SELECT c_nationkey, c_mktsegment, k_size, CAST(u.b AS BIGINT) AS bucket
  FROM gsz, UNNEST(range(0, {_TC_K})) AS u(b)
),
cum AS (
  SELECT d.c_nationkey, d.c_mktsegment, d.k_size, d.bucket,
         SUM(COALESCE(g.cnt, 0)) OVER (
             PARTITION BY d.c_nationkey, d.c_mktsegment ORDER BY d.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumq
  FROM dense d
  LEFT JOIN grp_cnt g
    ON g.c_nationkey = d.c_nationkey AND g.c_mktsegment = d.c_mktsegment
   AND g.bucket = d.bucket
)
SELECT c.c_nationkey, c.c_mktsegment, c.k_size,
       CAST(SUM(ABS(c.cumq * t.n_total - gl.cump * c.k_size)) AS DOUBLE)
         / CAST(c.k_size * t.n_total * {_TC_K - 1} AS DOUBLE) AS emd,
       CAST(SUM(ABS(c.cumq * t.n_total - gl.cump * c.k_size)) AS DOUBLE)
         / CAST(c.k_size * t.n_total * {_TC_K - 1} AS DOUBLE) <= {_TC_T!r}
         AS t_close
FROM cum c
JOIN gcdf gl ON gl.bucket = c.bucket
CROSS JOIN total t
WHERE c.bucket < {_TC_K - 1}
GROUP BY c.c_nationkey, c.c_mktsegment, c.k_size, t.n_total
"""


# --- preference_pair_assembly: DPO/RLHF pair construction --------------------
# Preference-tuning data prep: within each source, pair the r-th BEST
# document (by the corpus quality score) with the r-th WORST as
# (chosen, rejected), keeping pairs with a positive quality margin —
# the deterministic skeleton of how DPO datasets are assembled from
# scored candidate pools (strong vs weak completions per prompt
# group; source plays the prompt-group role here).
#
# Scale shape: the score is the existing single-scan quality
# projection; both rank windows partition by source (keyed shuffle,
# WindowGroupLimit applies — only top/bottom M survive the shuffle);
# the pair join keys on (source, rank) — |sources| × M rows.

_PREF_M = 20


def preference_pair_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from big_data_pipeline_spark.workloads.text import doc_quality_score

    q = doc_quality_score(spark, sf_dir).select("doc_id", "quality")
    src = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = src.join(q, "doc_id")
    w_best = Window.partitionBy("source").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    w_worst = Window.partitionBy("source").orderBy(
        F.asc("quality"), F.asc("doc_id")
    )
    best = (
        scored.withColumn("r", F.row_number().over(w_best))
        .filter(F.col("r") <= _PREF_M)
        .select(
            "source",
            "r",
            F.col("doc_id").alias("chosen_id"),
            F.col("quality").alias("chosen_q"),
        )
    )
    worst = (
        scored.withColumn("r", F.row_number().over(w_worst))
        .filter(F.col("r") <= _PREF_M)
        .select(
            "source",
            "r",
            F.col("doc_id").alias("rejected_id"),
            F.col("quality").alias("rejected_q"),
        )
    )
    return (
        best.join(worst, ["source", "r"])
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "source",
            F.col("r").alias("pair_rank"),
            "chosen_id",
            "rejected_id",
            (F.col("chosen_q") - F.col("rejected_q")).alias("margin"),
        )
        .filter(F.col("margin") > 0)
    )


def _pref_sql() -> str:
    from big_data_pipeline_spark.workloads.text import _QUALITY_SQL

    return f"""
WITH q AS ({_QUALITY_SQL}),
scored AS (
  SELECT d.doc_id, d.source, q.quality
  FROM documents d JOIN q USING (doc_id)
),
best AS (
  SELECT source, r, doc_id AS chosen_id, quality AS chosen_q FROM (
    SELECT source, doc_id, quality,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY quality DESC, doc_id ASC) AS r
    FROM scored
  ) WHERE r <= {_PREF_M}
),
worst AS (
  SELECT source, r, doc_id AS rejected_id, quality AS rejected_q FROM (
    SELECT source, doc_id, quality,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY quality ASC, doc_id ASC) AS r
    FROM scored
  ) WHERE r <= {_PREF_M}
)
SELECT source, r AS pair_rank, chosen_id, rejected_id,
       chosen_q - rejected_q AS margin
FROM best JOIN worst USING (source, r)
WHERE chosen_id <> rejected_id AND chosen_q - rejected_q > 0
"""


# --- sgns_training_pairs: word2vec skip-gram-with-negatives prep -------------
# The (center, context, label) frequency table SGNS training consumes
# (Mikolov et al. 2013): positives are adjacent-token pairs in both
# orientations; each position also draws one deterministic negative —
# the vocab token ranked hash(doc_id, pos) mod |V| — labeled 0. Output
# is aggregated counts, bounded by |V|² regardless of corpus size.
#
# Scale shape: positives come from one zip of the token array with its
# shift (no self-join of the exploded corpus); negatives are one
# md5-mod join against the RANKED VOCAB — a model-sized frame (the
# rank window runs over distinct tokens, not the corpus; at 100 TB the
# vocab is still just a model). Counts collapse map-side.


def sgns_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", tokenize("text").alias("t"))
    adj = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
            )
        ).alias("p"),
    ).select(
        "doc_id", F.col("p.0").alias("a"), F.col("p.1").alias("b")
    )
    positives = adj.select(
        F.col("a").alias("center"), F.col("b").alias("context")
    ).unionAll(
        adj.select(F.col("b").alias("center"), F.col("a").alias("context"))
    )
    vocab = (
        toks.select(F.explode("t").alias("tok"))
        .distinct()
        .withColumn(
            "vrank",
            F.row_number().over(Window.orderBy("tok")) - 1,
        )
    )
    n_vocab = vocab.count()
    pos_idx = docs.select(
        "doc_id", F.posexplode(tokenize("text")).alias("pos", "center")
    )
    neg_rank = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sgns:"),
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_vocab
    )
    negatives = pos_idx.withColumn("vrank", neg_rank).join(
        F.broadcast(vocab), "vrank"
    ).select("center", F.col("tok").alias("context"))
    return (
        positives.withColumn("label", F.lit(1))
        .unionAll(negatives.withColumn("label", F.lit(0)))
        .groupBy("center", "context", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


_SGNS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
pos AS (
  SELECT doc_id, u.i - 1 AS p, t[u.i] AS tok
  FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
),
adj AS (
  SELECT a.tok AS ca, b.tok AS cb
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
),
positives AS (
  SELECT ca AS center, cb AS context FROM adj
  UNION ALL
  SELECT cb AS center, ca AS context FROM adj
),
vocab AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY tok) - 1 AS vrank
  FROM (SELECT DISTINCT tok FROM pos)
),
nv AS (SELECT COUNT(*) AS v FROM vocab),
negatives AS (
  SELECT p.tok AS center, vb.tok AS context
  FROM pos p, nv
  JOIN vocab vb
    ON vb.vrank = CAST(concat('0x', substr(md5(concat('sgns:',
         CAST(p.doc_id AS VARCHAR), ':', CAST(p.p AS VARCHAR))), 1, 8))
         AS BIGINT) % nv.v
)
SELECT center, context, label, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT center, context, 1 AS label FROM positives
  UNION ALL
  SELECT center, context, 0 AS label FROM negatives
)
GROUP BY center, context, label
"""


QUERIES = {
    "preference_pair_assembly": preference_pair_assembly,
    "sgns_training_pairs": sgns_training_pairs,
    "t_closeness_audit": t_closeness_audit,
    "rr_dp_status_counts": rr_dp_status_counts,
    "incremental_dedup_new_batch": incremental_dedup_new_batch,
    "epoch_shuffle_shards": epoch_shuffle_shards,
    "incremental_neardup_batch": incremental_neardup_batch,
    "quality_quantile_gate": quality_quantile_gate,
    "pii_pseudonymize_kanon": pii_pseudonymize_kanon,
    "gopher_repetition_stats": gopher_repetition_stats,
    "dedup_keep_best": dedup_keep_best,
    "source_quota_sample": source_quota_sample,
    "weighted_sample_docs": weighted_sample_docs,
    "mixture_temperature_resample": mixture_temperature_resample,
    "train_split_assign": train_split_assign,
    "contamination_ngram_overlap": contamination_ngram_overlap,
    "lineitem_regression_stats": lineitem_regression_stats,
    "dsir_importance_score": dsir_importance_score,
    "ldiversity_audit": ldiversity_audit,
    "split_leakage_audit": split_leakage_audit,
}

ORACLE = {
    "preference_pair_assembly": _pref_sql(),
    "sgns_training_pairs": _SGNS_SQL,
    "t_closeness_audit": _TCLOSE_SQL,
    "rr_dp_status_counts": _rr_sql(),
    "epoch_shuffle_shards": _EPOCH_SHUFFLE_SQL,
    "incremental_neardup_batch": _INCR_NEARDUP_SQL,
    "mixture_temperature_resample": _MIXTURE_SQL,
    "train_split_assign": _SPLIT_SQL,
    "incremental_dedup_new_batch": _INCR_DEDUP_SQL,
    "quality_quantile_gate": _QGATE_SQL,
    "weighted_sample_docs": _WEIGHTED_SQL,
    "pii_pseudonymize_kanon": _PII_SQL,
    "gopher_repetition_stats": _GOPHER_SQL,
    "dedup_keep_best": _KEEP_BEST_SQL,
    "source_quota_sample": _QUOTA_SQL,
    "contamination_ngram_overlap": _CONTAM_SQL,
    "lineitem_regression_stats": _REGR_SQL,
    "dsir_importance_score": _DSIR_SQL,
    "ldiversity_audit": _LDIV_SQL,
    "split_leakage_audit": _LEAK_SQL,
}
