"""Text-analysis workload over the documents table.

LLM-pipeline extension surface (SURVEY.md §0 north star): token
counting, quality scoring, language stats, content fingerprinting,
exact dedup, and exact n-gram-shingle Jaccard near-dup pairs. All six
queries are oracle-checked — the heuristics are deliberately written in
closed form expressible in both engines.

Scale notes (100 TB):
- Per-document metrics are narrow projections over a single scan; no
  shuffle at all (the groupBys here key on low-cardinality lang/hash).
- exact_dedup is the canonical hash-groupBy dedup: shuffle on md5(text),
  combine map-side, one pass.
- shingle_jaccard_pairs joins on 3-word shingles whose cardinality grows
  with corpus size, so the join stays sparse: only genuine near-dups
  (plus rare chance collisions) meet more than a handful of times. At
  100 TB you'd add the MinHash-LSH prefilter (dedup/minhash.py) in
  front; the exact-jaccard verify stage is this same query over the
  candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.text import (
    LANG_STOPWORDS,
    exploded_shingles,
    lang_scores,
    md5_fingerprint,
    quality_score,
    stopword_hits,
    tokenize,
)
from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.oracle import exact_avg, exact_avg_sql

_TOKS_SQL = r"regexp_split_to_array(trim(text), '\s+')"


# --- doc_token_stats: tokenize + count (token counting op) ------------------


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokenize("text")
    return read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        (F.length(F.trim("text")).cast("double") / F.size(toks)).alias(
            "avg_token_span"
        ),
    )


_TOKEN_STATS_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars_actual,
       len({_TOKS_SQL}) AS n_tokens,
       len(list_distinct({_TOKS_SQL})) AS n_unique_tokens,
       CAST(length(trim(text)) AS DOUBLE) / len({_TOKS_SQL}) AS avg_token_span
FROM documents
"""


# --- doc_quality_score: closed-form quality heuristic -----------------------


def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    en_hits = stopword_hits(toks, LANG_STOPWORDS["en"])
    df = df.select(
        "doc_id",
        F.length("text").cast("double").alias("n_chars_d"),
        F.size(toks).cast("double").alias("n_tokens_d"),
        (en_hits.cast("double") / F.size(toks)).alias("stop_ratio"),
    )
    return df.select(
        "doc_id",
        F.col("stop_ratio"),
        quality_score(
            F.col("n_chars_d"), F.col("n_tokens_d"), F.col("stop_ratio")
        ).alias("quality"),
    )


_EN_LIST = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars_d,
         CAST(len({_TOKS_SQL}) AS DOUBLE) AS n_tokens_d,
         CAST(len(list_filter({_TOKS_SQL}, t -> t IN ({_EN_LIST}))) AS DOUBLE)
           / len({_TOKS_SQL}) AS stop_ratio
  FROM documents
)
SELECT doc_id, stop_ratio,
       round((least(n_chars_d / 400.0, 1.0)
            + least(n_tokens_d / 60.0, 1.0)
            + (1.0 - abs(stop_ratio - 0.4))) / 3.0, 6) AS quality
FROM t
"""


# --- lang_id_stopwords: per-language hit counts + argmax --------------------
# Tie-break: first language in de<en<es<fr<zh order wins (>= chain).


def lang_id_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    scores = lang_scores(toks)
    df = df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[scores[lang].alias(f"c_{lang}") for lang in sorted(scores)],
    )
    langs = sorted(LANG_STOPWORDS)
    expr = None
    for lang in langs:
        others = [F.col(f"c_{o}") for o in langs if o != lang]
        cond = F.col(f"c_{lang}") >= F.greatest(*others)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return df.withColumn("predicted_lang", expr)


def _lang_sql() -> str:
    langs = sorted(LANG_STOPWORDS)
    score_cols = ",\n         ".join(
        f"len(list_filter({_TOKS_SQL}, t -> t IN "
        f"({', '.join(repr(w) for w in LANG_STOPWORDS[lang])}))) AS c_{lang}"
        for lang in langs
    )
    cases = "\n            ".join(
        f"WHEN c_{lang} >= greatest("
        + ", ".join(f"c_{o}" for o in langs if o != lang)
        + f") THEN '{lang}'"
        for lang in langs
    )
    return f"""
WITH t AS (
  SELECT doc_id, lang AS labeled_lang,
         {score_cols}
  FROM documents
)
SELECT doc_id, labeled_lang, c_de, c_en, c_es, c_fr, c_zh,
       CASE {cases} END AS predicted_lang
FROM t
"""


# --- lang_id_confusion: classifier evaluation matrix ------------------------
# The eval step after any heuristic classifier ships: labeled vs
# predicted language counts (the confusion matrix) plus per-cell share
# of the labeled class (row-normalized recall). Reuses lang_id's exact
# argmax; one tiny groupBy over |langs|² keys + a broadcast-back of
# row totals. The diagnostic a curation pipeline gates lang-ID changes
# on — a falling diagonal share is a regression.


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = lang_id_stopwords(spark, sf_dir).select(
        "labeled_lang", "predicted_lang"
    )
    counts = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = counts.groupBy("labeled_lang").agg(
        F.sum("n_docs").alias("n_labeled")
    )
    return counts.join(F.broadcast(totals), "labeled_lang").select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n_labeled")).alias(
            "recall_share"
        ),
        (F.col("labeled_lang") == F.col("predicted_lang")).alias("correct"),
    )


def _lang_confusion_sql() -> str:
    return f"""
WITH pred AS ({_lang_sql()}),
counts AS (
  SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
  FROM pred GROUP BY labeled_lang, predicted_lang
),
totals AS (
  SELECT labeled_lang, CAST(SUM(n_docs) AS BIGINT) AS n_labeled
  FROM counts GROUP BY labeled_lang
)
SELECT labeled_lang, predicted_lang, n_docs,
       CAST(n_docs AS DOUBLE) / n_labeled AS recall_share,
       labeled_lang = predicted_lang AS correct
FROM counts JOIN totals USING (labeled_lang)
"""


# --- lang_stats: per-language aggregates ------------------------------------


def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            exact_avg("CAST(n_chars AS DOUBLE)", "avg_chars"),
        )
    )


_LANG_STATS_SQL = f"""
SELECT lang, COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
       {exact_avg_sql("CAST(n_chars AS DOUBLE)", "avg_chars")}
FROM documents GROUP BY lang
"""


# --- exact_dedup: hash-groupBy deduplication --------------------------------


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", md5_fingerprint("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# --- shingle_jaccard_pairs: exact n-gram near-dup detection -----------------

_JACCARD_THRESHOLD = 0.5


def shingle_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    sh = exploded_shingles(docs, "doc_id", "text", 3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        # the shingle side is O(corpus x doc_len) rows but Catalyst
        # estimates it from the compact pre-explode parquet, so the
        # auto-broadcast threshold can misfire and try to broadcast the
        # whole exploded corpus (observed at the sf1 stress run on the
        # analogous entity-blocking join); pin the shuffle-hash join the
        # cardinality actually calls for
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id1"), F.col("b.doc_id").alias("doc_id2")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    jacc = F.col("n_common").cast("double") / (
        F.col("s1.n") + F.col("s2.n") - F.col("n_common")
    )
    return (
        inter.join(F.broadcast(s1), F.col("doc_id1") == F.col("s1.doc_id"))
        .join(F.broadcast(s2), F.col("doc_id2") == F.col("s2.doc_id"))
        .filter(jacc >= _JACCARD_THRESHOLD)
        .select("doc_id1", "doc_id2", "n_common", jacc.alias("jaccard"))
    )


_JACCARD_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_id1, doc_id2, n_common,
       CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = doc_id1
JOIN sizes s2 ON s2.doc_id = doc_id2
WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) >= {_JACCARD_THRESHOLD}
"""


# --- shingle_containment_pairs: asymmetric (subset-copy) near-dup -----------
# Containment C(A,B) = |A ∩ B| / min(|A|, |B|): a small document pasted
# inside a much larger one scores near 1 here but far below any Jaccard
# threshold (the union is dominated by the big doc) — the quote/
# boilerplate-inclusion case symmetric Jaccard structurally misses
# (Broder 1997 distinguishes exactly these two resemblance measures).
# Same blocking + intersection plan as shingle_jaccard_pairs (one
# shuffle-hash equi-join on the shingle key, sizes broadcast); only the
# normalizer changes, so the 100 TB properties carry over unchanged.

_CONTAINMENT_THRESHOLD = 0.8


def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    sh = exploded_shingles(docs, "doc_id", "text", 3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id1"),
            F.col("b.doc_id").alias("doc_id2"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    containment = F.col("n_common").cast("double") / F.least(
        F.col("s1.n"), F.col("s2.n")
    )
    jacc = F.col("n_common").cast("double") / (
        F.col("s1.n") + F.col("s2.n") - F.col("n_common")
    )
    return (
        inter.join(F.broadcast(s1), F.col("doc_id1") == F.col("s1.doc_id"))
        .join(F.broadcast(s2), F.col("doc_id2") == F.col("s2.doc_id"))
        .filter(containment >= _CONTAINMENT_THRESHOLD)
        .select(
            "doc_id1",
            "doc_id2",
            "n_common",
            containment.alias("containment"),
            jacc.alias("jaccard"),
        )
    )


_CONTAINMENT_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(range(1, len(t)-1)) AS u(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_id1, doc_id2, n_common,
       CAST(n_common AS DOUBLE) / LEAST(s1.n, s2.n) AS containment,
       CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = doc_id1
JOIN sizes s2 ON s2.doc_id = doc_id2
WHERE CAST(n_common AS DOUBLE) / LEAST(s1.n, s2.n) >= {_CONTAINMENT_THRESHOLD}
"""


# --- dup_span_fraction: cross-document duplicated-span share ----------------
# The ExactSubstr dedup signal (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better") at shingle granularity:
# for each document, the share of its 8-token shingle positions whose
# shingle also occurs in ANOTHER document. Doc-level dedup
# (exact_dedup, minhash/simhash) misses partially-copied documents —
# this is the per-doc score pipelines threshold to strip or downweight
# them, the granularity the dedup family otherwise lacks.
#
# Scale (100 TB): positions are a map-side explode (~tokens rows, no
# shuffle); the one wide stage is groupBy(shingle) — 8-token shingles
# are near-unique so no hot keys, and the distinct-doc count per
# shingle is map-side-combinable. The join back is shingle-keyed
# shuffle-hash (pinned: Catalyst costs the exploded side from the
# compact pre-explode parquet, the same broadcast misfire observed on
# the entity-blocking join at sf1). A suffix-array implementation
# (Lee et al.'s) finds arbitrary-length spans but needs a global sort;
# fixed-k shingles give the same thresholding signal with one
# aggregation.

_SPAN_K = 8


def dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    pos = exploded_shingles(docs, "doc_id", "text", _SPAN_K, distinct=False)
    per_shingle = pos.groupBy("shingle").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    # merge (not shuffle_hash) pin: both sides are corpus-sized and the
    # hint must only prevent the broadcast misfire (Catalyst costs the
    # exploded side from the compact pre-explode parquet). A shuffle-
    # hash build of the per-shingle side is NOT spillable — its
    # per-partition hash map holds |unique shingles|/partitions long
    # string keys and threw SparkOutOfMemoryError at the sf10 stress
    # corpus — while sort-merge spills gracefully at any scale.
    return (
        pos.join(per_shingle.hint("merge"), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.when(F.col("n_docs") >= 2, 1).otherwise(0)
            ).cast("bigint").alias("n_dup_spans"),
        )
        .withColumn(
            "dup_frac",
            F.col("n_dup_spans").cast("double") / F.col("n_spans"),
        )
    )


_DUP_SPAN_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
pos AS (
  SELECT doc_id,
         array_to_string(t[i:i+{_SPAN_K - 1}], ' ') AS shingle
  FROM toks,
       UNNEST(range(1, GREATEST(len(t) - {_SPAN_K - 2}, 2))) AS u(i)
),
per_shingle AS (
  SELECT shingle, COUNT(DISTINCT doc_id) AS n_docs FROM pos GROUP BY shingle
)
SELECT doc_id, COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_frac
FROM pos JOIN per_shingle USING (shingle)
GROUP BY doc_id
"""


# --- bpe_token_counts: BPE-style pre-tokenizer counting ---------------------
# LLM token budgeting needs subword-style counts, not whitespace words.
# This is the GPT-2 pre-tokenizer shape (contraction suffixes /
# space-prefixed letter runs / digit runs / punctuation runs),
# simplified to the RE2-compatible subset (no lookahead) so Spark's
# Java regex and DuckDB's RE2 produce identical matches. The count is
# a deterministic ~proxy for BPE token count (pre-tokenization is the
# count-dominating stage; merges only split within runs).

_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokenize("text")
    # idx=0 = whole match (Spark defaults to capture group 1; the
    # pattern's only group is non-capturing)
    bpe = F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    return read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(toks).alias("n_ws_tokens"),
        (
            F.length("text").cast("double")
            / F.greatest(F.size(bpe), F.lit(1))
        ).alias("chars_per_bpe_token"),
    )


_BPE_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_PAT.replace("'", "''")}'))
         AS n_bpe_tokens,
       len({_TOKS_SQL}) AS n_ws_tokens,
       CAST(length(text) AS DOUBLE)
         / greatest(len(regexp_extract_all(text, '{_BPE_PAT.replace("'", "''")}')), 1)
         AS chars_per_bpe_token
FROM documents
"""


# --- tfidf_top_terms: per-document signature terms --------------------------
# TF-IDF with a LINEAR smoothed idf, (n_docs+1)/(df+1), instead of the
# usual log form: java.lang.Math.log and libm log are not guaranteed
# bit-identical, and the ranking (the part that matters for signature
# terms) is unchanged for any monotone idf transform. Every arithmetic
# step — int casts, one divide, one multiply — is IEEE-exact in both
# engines, so the scores (not just the ranks) hash-match.
#
# Scale shape: tf is a (doc, term) groupBy (shuffle keyed on the pair,
# zipfian skew lands on distinct (doc,term) combos, not raw terms); df
# re-aggregates tf's output by term alone; n_docs is a 1-row broadcast.
# The hot-term skew of the df join is bounded: df is one row per term.


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * (
        (F.col("n_docs") + F.lit(1)) / (F.col("df") + F.lit(1))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(total))
        .withColumn("tfidf", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf")
    )


_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM tok WHERE token <> '' GROUP BY doc_id, token
),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
total AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, token, tf, df,
         tf * ((n_docs + 1) / (df + 1)) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id
           ORDER BY tf * ((n_docs + 1) / (df + 1)) DESC, token
         ) AS rn
  FROM tf JOIN dfreq USING (token), total
)
SELECT doc_id, token, tf, df, tfidf FROM scored WHERE rn <= 3
"""


# --- inverted_index_postings: token -> capped posting list ------------------

_POSTING_CAP = 20


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an inverted index: per token, document frequency and the
    first 20 doc_ids (ascending) as the posting list.

    The retrieval-side twin of tf-idf: one explode, one distinct, one
    groupBy on token. collect_list order is nondeterministic under
    parallel aggregation, so the list is sort_array-ed before capping —
    the output is exact, not order-lucky. At 100 TB posting lists for
    stopword-like tokens are the skew risk; the cap bounds both memory
    and output, and a production index would range-bucket doc_ids per
    token (the salting pattern in operators/skew.py).

    The posting list is emitted comma-joined (string), not array<long>:
    the driver's canonicalizer sorts result rows with pandas, where a
    Python-list cell is unhashable (round-3 CORRECTNESS err on the int8
    quantizer) — the serialized form is information-identical and
    hashes stably on both engines.
    """
    docs = read_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize("text"))).alias("token")
    )
    return (
        pairs.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.slice(
                    F.sort_array(F.collect_list("doc_id")), 1, _POSTING_CAP
                ).cast("array<string>"),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= 2)
    )


_INVERTED_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, tok AS token
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents), UNNEST(t) AS u(tok)
)
SELECT token, COUNT(*) AS df,
       array_to_string((list(doc_id ORDER BY doc_id))[1:{_POSTING_CAP}], ',') AS postings
FROM pairs
GROUP BY token
HAVING COUNT(*) >= 2
"""


# --- doc_chunk_overlap: RAG/window chunking ---------------------------------
# Split each document's token stream into fixed-size chunks with a
# fixed overlap (stride = size - overlap) — the retrieval-index /
# context-window preparation step downstream embedders consume. Chunk
# starts are enumerated with sequence() + explode and sliced with
# slice(): one narrow map-side explode per doc, no shuffle until the
# consumer — the same fan-out shape as shingling, linear at any corpus
# size. A doc shorter than one chunk yields exactly one (partial)
# chunk; the tail chunk may be short.

_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48  # 16-token overlap


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize("text").alias("t"))
    n_chunks = F.greatest(
        F.ceil((F.size("t") - F.lit(_CHUNK_SIZE)) / F.lit(_CHUNK_STRIDE)) + 1,
        F.lit(1),
    )
    chunks = toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), (n_chunks - 1).cast("bigint"))
        ).alias("chunk_id"),
        F.col("t"),
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * _CHUNK_STRIDE).alias("start_tok"),
        F.least(
            F.col("chunk_id") * _CHUNK_STRIDE + _CHUNK_SIZE, F.col("n_tokens")
        ).alias("end_tok"),
        F.concat_ws(
            " ",
            F.slice(
                "t", F.col("chunk_id") * _CHUNK_STRIDE + 1, F.lit(_CHUNK_SIZE)
            ),
        ).alias("chunk_text"),
    )
    return chunks


_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
spans AS (
  SELECT doc_id, len(t) AS n_tokens, t,
         UNNEST(range(0, GREATEST(
           CAST(CEIL((len(t) - {_CHUNK_SIZE}) / {_CHUNK_STRIDE}.0) AS BIGINT) + 1,
           1))) AS chunk_id
  FROM toks
)
SELECT doc_id, chunk_id,
       chunk_id * {_CHUNK_STRIDE} AS start_tok,
       LEAST(chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n_tokens) AS end_tok,
       array_to_string(
         t[chunk_id * {_CHUNK_STRIDE} + 1 : chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}],
         ' ') AS chunk_text
FROM spans
"""


# --- token_rarity_score: corpus-statistics quality signal -------------------
# The integer-exact stand-in for a unigram-LM perplexity filter: rank
# the corpus vocabulary by frequency ascending (rank 1 = rarest), score
# each document by its MEAN TOKEN RARITY RANK. Unusually rare-token-
# heavy docs (gibberish, OCR noise) score high; boilerplate scores low.
# Everything is counts and integer ranks — no log/exp, so no libm
# parity assumptions — and the mean is one exact integer sum / count.
#
# Scale: the vocab ranking is a GLOBAL order — computed with the
# sharded prefix sum (operators/prefix.py), not a single-task window;
# the doc join shuffles on token (skew on stopwords handled by AQE).


def token_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_pipeline_spark.operators.prefix import sharded_running_sum

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    ).filter(F.col("token") != "")
    # materialize the vocab counts once: the sharded prefix sum consumes
    # the frame three times (boundary probe, local window, offsets) and
    # each replay re-ran tokenize+explode+groupBy over the corpus.
    # |vocab|-sized: the reduced side.
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    ranked = sharded_running_sum(
        vocab,
        [],
        "cnt",
        F.lit(1),
        "rarity_rank",
        shards=16,
        tiebreak_cols=["token"],
    )
    return (
        toks.join(ranked.select("token", "rarity_rank"), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum("rarity_rank").cast("double") / F.count(F.lit(1))
            ).alias("mean_rarity_rank"),
            F.max("rarity_rank").alias("max_rarity_rank"),
        )
    )


_RARITY_SQL = f"""
WITH toks AS (
  SELECT doc_id, tok AS token
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents), UNNEST(t) AS u(tok)
  WHERE tok <> ''
),
vocab AS (
  SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
),
ranked AS (
  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY cnt, token) AS BIGINT)
           AS rarity_rank
  FROM vocab
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(CAST(SUM(rarity_rank) AS BIGINT) AS DOUBLE) / COUNT(*)
         AS mean_rarity_rank,
       MAX(rarity_rank) AS max_rarity_rank
FROM toks JOIN ranked USING (token)
GROUP BY doc_id
"""


# --- boilerplate_span_strip: corpus-level repeated-span removal -------------
# The C4/RefinedWeb "remove lines repeated across documents" gate,
# re-expressed for a corpus without line structure: each document is cut
# into NON-overlapping _BP_W-token spans; a span whose text occurs in at
# least _BP_DF_FRAC of all documents is boilerplate (navigation chrome,
# cookie banners, license headers at web scale), and the document is
# re-emitted with those spans removed, plus audit counts. Reference has
# no analog (its 630-row stock feed has no corpus-frequency concept);
# the operator exists for the LLM-training-data surface.
#
# Scale (100 TB): span counting is ONE map-side-combinable
# groupBy(span_text) distinct-doc count (internally two-phase over
# (span_text, doc_id)); the qualifying span set is bounded by the
# document-frequency threshold — at a fixed fraction of N docs, at most
# vocab-bounded thousands of spans qualify — so it broadcasts back onto
# the span stream, and reassembly is one groupBy(doc_id). Two bounded
# shuffles total; nothing quadratic, nothing driver-side.

_BP_W = 2  # span width in tokens (non-overlapping)
_BP_DF_FRAC = 0.04  # span is boilerplate when present in >= 4% of docs


def boilerplate_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize("text").alias("t"))
    n_spans = F.ceil(F.size("t") / F.lit(float(_BP_W)))
    spans = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), (n_spans - 1).cast("bigint"))
        ).alias("span_id"),
        F.col("t"),
    ).select(
        "doc_id",
        "span_id",
        F.concat_ws(
            " ", F.slice("t", F.col("span_id") * _BP_W + 1, F.lit(_BP_W))
        ).alias("span_text"),
    )
    total = docs.select(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        spans.groupBy("span_text")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("df") >= F.col("n_docs") * _BP_DF_FRAC)
        .select("span_text", F.lit(True).alias("is_boiler"))
    )
    flagged = spans.join(F.broadcast(boiler), "span_text", "left").withColumn(
        "is_boiler", F.coalesce("is_boiler", F.lit(False))
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(
                ~F.col("is_boiler"), F.struct("span_id", "span_text")
            )
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("is_boiler").cast("int")).alias("n_boiler_spans"),
        (
            F.sum(F.col("is_boiler").cast("int")).cast("double")
            / F.count(F.lit(1))
        ).alias("boiler_frac"),
        F.concat_ws(
            " ", F.transform(kept, lambda s: s["span_text"])
        ).alias("clean_text"),
    )


_BOILER_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
spans AS (
  SELECT doc_id, span_id,
         array_to_string(
           t[span_id * {_BP_W} + 1 : span_id * {_BP_W} + {_BP_W}], ' ')
           AS span_text
  FROM (
    SELECT doc_id, t,
           UNNEST(range(0, CAST(CEIL(len(t) / {_BP_W}.0) AS BIGINT)))
             AS span_id
    FROM toks
  )
),
total AS (SELECT COUNT(*) AS n_docs FROM documents),
boiler AS (
  SELECT span_text FROM spans, total
  GROUP BY span_text, n_docs
  HAVING COUNT(DISTINCT doc_id) >= n_docs * {_BP_DF_FRAC}
),
flagged AS (
  SELECT s.doc_id, s.span_id, s.span_text,
         b.span_text IS NOT NULL AS is_boiler
  FROM spans s LEFT JOIN boiler b USING (span_text)
)
SELECT doc_id, COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler_spans,
       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS boiler_frac,
       COALESCE(
         string_agg(CASE WHEN NOT is_boiler THEN span_text END, ' '
                    ORDER BY span_id), '') AS clean_text
FROM flagged GROUP BY doc_id
"""


# --- token_cooccurrence_topk: corpus-level co-occurrence mining -------------
# Which token pairs travel together across documents? (The
# market-basket/collocation primitive behind phrase mining and topic
# seeding.) Per document: DISTINCT tokens, sorted, capped at
# _COOC_CAP — the cap bounds the per-doc pair fan-out at
# cap*(cap-1)/2 no matter how degenerate a document is (the quadratic
# guard; identical in the oracle, so results still hash-match). Pair
# counting is one map-side-combinable groupBy; the global top-k is
# TakeOrderedAndProject (no global sort). At real corpus scale the
# exact count would be preceded by the Misra-Gries sketch
# (functions/sketches.py) to prune the pair-key space.

_COOC_CAP = 64
_COOC_TOPK = 25


def token_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.slice(
            F.array_sort(F.array_distinct(tokenize("text"))), 1, _COOC_CAP
        ).alias("ts"),
    )
    a = toks.select("doc_id", F.explode("ts").alias("t1"))
    b = toks.select("doc_id", F.explode("ts").alias("t2"))
    pairs = a.join(b, "doc_id").filter(F.col("t1") < F.col("t2"))
    counts = pairs.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return counts.orderBy(
        F.desc("n_docs"), F.asc("t1"), F.asc("t2")
    ).limit(_COOC_TOPK)


_COOC_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_sort(list_distinct({_TOKS_SQL}))[1:{_COOC_CAP}] AS ts
  FROM documents
),
a AS (SELECT doc_id, UNNEST(ts) AS t1 FROM toks),
b AS (SELECT doc_id, UNNEST(ts) AS t2 FROM toks),
counts AS (
  SELECT t1, t2, COUNT(*) AS n_docs
  FROM a JOIN b USING (doc_id)
  WHERE t1 < t2
  GROUP BY t1, t2
)
SELECT t1, t2, n_docs FROM counts
ORDER BY n_docs DESC, t1 ASC, t2 ASC
LIMIT {_COOC_TOPK}
"""


# --- quality_rank_normalize: per-source quantile transform ------------------
# Feature normalization for heterogeneous sources: a raw quality score
# is not comparable across sources with different length/style
# profiles, so curation thresholds use the WITHIN-SOURCE percentile
# instead. Rank = deterministic row_number by (quality, doc_id) — the
# doc_id tiebreak makes tied scores well-defined — computed with the
# sharded prefix sum (sources are LOW-cardinality: the single-task
# window trap, SCALE.md §4c); pct = (rank-1)/(n-1), exact integer
# division to double on both engines.


def quality_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_pipeline_spark.operators.prefix import sharded_running_sum

    docs = read_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    en_hits = stopword_hits(toks, LANG_STOPWORDS["en"])
    # materialize the per-doc scores once: the sharded prefix sum
    # consumes the frame three times and the per-source totals a fourth,
    # and each replay re-ran the tokenizing quality kernel over the full
    # corpus. One narrow row per doc: far smaller than the text it
    # derives from.
    scored = docs.select(
        "doc_id",
        "source",
        quality_score(
            F.length("text").cast("double"),
            F.size(toks).cast("double"),
            (en_hits.cast("double") / F.size(toks)),
        ).alias("quality"),
    ).localCheckpoint(eager=True)
    ranked = sharded_running_sum(
        scored,
        ["source"],
        "quality",
        F.lit(1),
        "rank",
        tiebreak_cols=["doc_id"],
    )
    n = scored.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    return ranked.join(F.broadcast(n), "source").select(
        "doc_id",
        "source",
        "quality",
        F.col("rank").cast("long").alias("rank"),
        (
            (F.col("rank") - 1).cast("double")
            / F.greatest(F.col("n_src") - 1, F.lit(1))
        ).alias("pct_rank"),
    )


_RANK_NORM_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         round((least(CAST(length(text) AS DOUBLE) / 400.0, 1.0)
              + least(CAST(len({_TOKS_SQL}) AS DOUBLE) / 60.0, 1.0)
              + (1.0 - abs(CAST(len(list_filter({_TOKS_SQL},
                    t -> t IN ({_EN_LIST}))) AS DOUBLE)
                  / len({_TOKS_SQL}) - 0.4))) / 3.0, 6) AS quality
  FROM documents
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY quality, doc_id) AS "rank",
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM scored
)
SELECT doc_id, source, quality, "rank",
       CAST("rank" - 1 AS DOUBLE) / GREATEST(n_src - 1, 1) AS pct_rank
FROM ranked
"""


# --- jaccard_prefix_filter_pairs: ppjoin-style prefix-filtered join ---------
# Same output contract as shingle_jaccard_pairs (exact Jaccard >= t over
# distinct 3-word shingles) computed with the prefix-filtering principle
# (SSJoin, Chaudhuri et al. 2006; ppjoin, Xiao et al. 2008): order every
# document's shingles by ascending global frequency and keep only the
# first |d| - ceil(t*|d|) + 1 as its "prefix"; two sets with
# Jaccard >= t must share at least one prefix element under any
# consistent global order (J >= t forces overlap >= t*max(|x|,|y|), and
# missing the whole prefix caps overlap at ceil(t*|x|) - 1 < t*|x|).
# Candidates therefore come from an equi-join on PREFIX shingles only —
# the rare-token slice of each document — and the exact intersection is
# re-counted only for candidate pairs.
#
# Scale (100 TB): the naive shingle self-join meets on EVERY shared
# shingle, so stopword-heavy shingles ("of the and") dominate both the
# shuffle and the per-key fan-out. The prefix join meets only on each
# doc's ~(1-t) rarest shingles — frequency ordering pushes the hot keys
# out of the prefix, which is exactly an in-plan skew mitigation. The
# verify stage is linear in (candidates x doc length). The oracle runs
# the naive formulation, so the driver hash-checks the optimization's
# completeness, not just its plumbing.


def _prefix_candidates(sh: DataFrame, sizes: DataFrame, t: float) -> DataFrame:
    """Candidate (doc_id1, doc_id2) pairs whose frequency-ordered
    prefixes (length |d| - ceil(t*|d|) + 1) share a shingle, pruned by
    ppjoin's size and positional filters (Xiao et al. 2008 §4.2).
    Complete for Jaccard >= t; exposed separately so tests can count
    candidates against the naive join's meet cardinality.

    Size filter: J >= t forces t*max(|x|,|y|) <= min(|x|,|y|); with
    t = 1/2 that is integer-exact as 2*min >= max.

    Positional filter: a meeting on shingle w at frequency-order
    positions i (in x) and j (in y) bounds the overlap by
    1 + min(|x|-i, |y|-j) PROVIDED no shared shingle precedes w. The
    bound is therefore applied per meeting and a pair survives if ANY
    of its meetings passes — complete because the pair's FIRST shared
    shingle (minimal in the shared (gf, shingle) order, hence minimal
    i AND minimal j) sees every other common shingle after both its
    positions, so its meeting passes whenever overlap >= alpha, where
    alpha = ceil(t/(1+t) * (|x|+|y|)) is the Jaccard overlap bound —
    computed integer-exactly for t = 1/2 as floor((|x|+|y|+2)/3).
    Later meetings may under-prune (common shingles can precede them)
    but never over-prune completeness: the verify stage recounts the
    exact intersection anyway.
    """
    if abs(t - 0.5) > 1e-12:
        raise ValueError(
            "integer-exact alpha/size bounds below assume t = 1/2; "
            "re-derive the rationals before changing the threshold"
        )
    gfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("gf"))
    w = Window.partitionBy("doc_id").orderBy("gf", "shingle")
    ranked = (
        # exploded x exploded: pin shuffle-hash, same misestimation trap
        # as the naive join above
        sh.join(gfreq.hint("shuffle_hash"), "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(sizes), "doc_id")
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n") - F.ceil(F.col("n") * F.lit(t)) + 1
    ).select("doc_id", "shingle", "rn", "n")
    a, b = prefix.alias("a"), prefix.alias("b")
    n1, n2 = F.col("a.n"), F.col("b.n")
    alpha = F.floor((n1 + n2 + 2) / F.lit(3)).cast("long")
    pos_bound = 1 + F.least(n1 - F.col("a.rn"), n2 - F.col("b.rn"))
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size filter (t = 1/2): join-side, kills length-mismatched
            # meetings before they reach the distinct
            & (2 * F.least(n1, n2) >= F.greatest(n1, n2))
            # positional filter: suffix room after this meeting must
            # still be able to reach the overlap bound
            & (pos_bound >= alpha),
        )
        .select(
            F.col("a.doc_id").alias("doc_id1"),
            F.col("b.doc_id").alias("doc_id2"),
        )
        .distinct()
    )


def jaccard_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    # Join/verify on xxhash64(shingle), not the ~20-byte string: every
    # downstream exchange (frequency count, prefix self-join, the two
    # verify-side set joins) ships fixed 8-byte keys, and the verify
    # intersect compares longs. Hash-as-identity preserves set equality
    # exactly unless two DISTINCT shingles collide in 64 bits (~1e-6
    # chance corpus-wide at 5M distinct shingles — negligible; the
    # sf0.01 oracle universe is ~1e4). The subtree feeds three
    # consumers (sizes, prefix ranking, verify sets), so materialize it
    # once instead of re-running tokenize+explode per branch.
    sh = exploded_shingles(docs, "doc_id", "text", 3).select(
        "doc_id", F.xxhash64("shingle").alias("shingle")
    )
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cand = _prefix_candidates(sh, sizes, _JACCARD_THRESHOLD)
    # Verify against the COMPACTED per-doc shingle set (one array row per
    # doc), not a re-exploded shingle x shingle join: candidates shuffle
    # twice at pair granularity and the exact intersection is a JVM
    # array_intersect over the two carried sets. The exploded verify
    # shuffles |cand| x doc_len rows; this shuffles |docs| arrays +
    # 2x|cand| pairs — the ppjoin verify layout (Xiao et al. 2008 §5).
    sets_df = sh.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("shingles"),
        F.count(F.lit(1)).alias("n"),
    )
    g1 = sets_df.select(
        F.col("doc_id").alias("doc_id1"),
        F.col("shingles").alias("sh1"),
        F.col("n").alias("n1"),
    )
    g2 = sets_df.select(
        F.col("doc_id").alias("doc_id2"),
        F.col("shingles").alias("sh2"),
        F.col("n").alias("n2"),
    )
    inter = (
        cand.join(g1.hint("shuffle_hash"), "doc_id1")
        .join(g2.hint("shuffle_hash"), "doc_id2")
        .select(
            "doc_id1",
            "doc_id2",
            F.size(F.array_intersect("sh1", "sh2")).alias("n_common"),
            "n1",
            "n2",
        )
    )
    jacc = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    return inter.filter(jacc >= _JACCARD_THRESHOLD).select(
        "doc_id1", "doc_id2", "n_common", jacc.alias("jaccard")
    )


# --- bigram_lm_quality: corpus-trained language-model quality score ---------
# The CCNet-style LM quality filter (Wenzek et al. 2020) re-expressed
# deterministically: train add-one-smoothed bigram statistics on the
# corpus itself, then score every document by the average (and minimum)
# conditional probability p(w2|w1) = (C(w1 w2)+1)/(C(w1 .)+V) of its
# bigrams. Low average = unusual token transitions = candidate junk;
# real CCNet scores log-perplexity from a pretrained KenLM — ln() is not
# IEEE-correctly-rounded across engines, so the probabilities themselves
# are the cross-checkable form (the RANKING is monotone-equivalent for
# fixed doc length; logs stay in the non-oracle analytics).
#
# Scale (100 TB): two map-side-combinable counts (bigram, context), one
# shuffle join of the bigram stream against its own counts, vocab as a
# broadcast 1-row scalar. No Python, no window; the "model" is a
# DataFrame, never collected.


def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize("text").alias("t"))
    # size >= 2 gate BEFORE the explode: sequence(1, 0) yields the
    # descending [1, 0] and element_at(t, 0) raises on a single-token
    # doc; the gate degrades to zero bigrams, matching the oracle.
    big = toks.where(F.size("t") >= 2).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
        F.col("t"),
    ).select(
        "doc_id",
        F.element_at("t", F.col("i")).alias("w1"),
        F.element_at("t", F.col("i") + 1).alias("w2"),
    )
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cw = big.groupBy("w1").agg(F.count(F.lit(1)).alias("cw"))
    vocab = toks.select(F.explode("t").alias("tok")).agg(
        F.count_distinct("tok").alias("vocab")
    )
    scored = (
        big.join(cb.hint("shuffle_hash"), ["w1", "w2"])
        .join(cw.hint("shuffle_hash"), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "p", (F.col("cb") + 1).cast("double") / (F.col("cw") + F.col("vocab"))
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        exact_avg("p", "avg_bigram_prob"),
        F.min("p").alias("min_bigram_prob"),
    )


_BIGRAM_LM_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
),
cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
cw AS (SELECT w1, COUNT(*) AS cw FROM bg GROUP BY w1),
v AS (
  SELECT COUNT(DISTINCT tok) AS vocab
  FROM (SELECT unnest(t) AS tok FROM toks)
),
scored AS (
  SELECT doc_id, CAST(cb + 1 AS DOUBLE) / (cw + vocab) AS p
  FROM bg JOIN cb USING (w1, w2) JOIN cw USING (w1) CROSS JOIN v
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       {exact_avg_sql("p", "avg_bigram_prob")},
       MIN(p) AS min_bigram_prob
FROM scored GROUP BY doc_id
"""


# --- flesch_readability: classic reading-ease scoring -----------------------
# Flesch Reading Ease (Flesch 1948): 206.835 - 1.015*(words/sentences)
# - 84.6*(syllables/words), with the standard computational proxies —
# syllables ~ vowel groups ([aeiouy]+), sentences ~ terminal-punctuation
# runs (floored at 1: the synthetic corpus has no punctuation, which
# exercises exactly that guard). A quality gate real curation stacks run
# next to the stopword/length heuristics (doc_quality_score): all three
# counts are exact integers from one regex pass each, the score is one
# shared-text IEEE expression, and the band CASE cuts on the identical
# doubles — fully hash-checkable. Scale: pure map-side projection, no
# shuffle, no Python.

_FLESCH = (
    "CAST(206.835 AS DOUBLE) "
    "- CAST(1.015 AS DOUBLE) * (CAST(words AS DOUBLE) / sentences) "
    "- CAST(84.6 AS DOUBLE) * (CAST(syllables AS DOUBLE) / words)"
)
_FLESCH_BAND = (
    "CASE WHEN flesch >= CAST(90 AS DOUBLE) THEN 'very_easy' "
    "WHEN flesch >= CAST(60 AS DOUBLE) THEN 'standard' "
    "WHEN flesch >= CAST(30 AS DOUBLE) THEN 'difficult' "
    "ELSE 'very_confusing' END"
)


def flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        F.size(tokenize("text")).alias("words"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), F.lit(0))
        ).alias("syllables"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))),
            F.lit(1),
        ).alias("sentences"),
    )
    return counted.withColumn("flesch", F.expr(_FLESCH)).withColumn(
        "band", F.expr(_FLESCH_BAND)
    )


_FLESCH_SQL = f"""
WITH counted AS (
  SELECT doc_id,
         len({_TOKS_SQL}) AS words,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences
  FROM documents
)
SELECT doc_id, words, syllables, sentences, flesch, {_FLESCH_BAND} AS band
FROM (SELECT *, {_FLESCH} AS flesch FROM counted)
"""


# --- text_normalize_dedup: canonicalize-then-dedup --------------------------
# The cleaning step ahead of exact dedup in every corpus pipeline:
# exact_dedup on raw bytes misses trivially-different copies ("Hello,
# World!" vs "hello world"), so documents are canonicalized first —
# lowercase, strip non-alphanumerics, collapse whitespace — and grouped
# by the md5 of the canonical form. Output: one row per canonical
# group with its size, how many RAW variants it collapses (the signal
# raw dedup would miss), and the deterministic keeper (min doc_id).
# Pure string functions with identical semantics in both engines.
#
# Scale (100 TB): normalization is map-side; the only shuffle is the
# hash-groupBy on the canonical fingerprint — exact_dedup's shape with
# a cheaper payload (the md5, never the text, crosses the wire).


def text_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return (
        docs.select(
            "doc_id",
            F.md5(norm).alias("canon_md5"),
            F.md5("text").alias("raw_md5"),
        )
        .groupBy("canon_md5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("raw_md5").alias("n_raw_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


_NORM_DEDUP_SQL = """
SELECT md5(trim(regexp_replace(
         regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
         ' +', ' ', 'g'))) AS canon_md5,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_raw_variants,
       MIN(doc_id) AS keeper_doc_id
FROM documents
GROUP BY 1
"""


# --- bm25_topk_docs: sparse lexical retrieval over the corpus ---------------
# The BM25 ranking function (Robertson & Walker 1994) for a fixed query,
# top-20 docs: per matched term, idf-weighted saturated term frequency
# tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl)) with k1=1.2, b=0.75. The idf
# factor uses the log-free RSJ odds (N - df + 0.5)/(df + 0.5): ln() is
# not IEEE-identical across engines (the bigram_lm_quality precedent),
# and the odds are per-term monotone in the standard log idf, so the
# ranking semantics survive while every arithmetic step stays a shared
# IEEE expression. Per-doc summation is over the FIXED literal query
# terms, so the score is one explicit fixed-associativity expression —
# no float aggregation at all.
#
# Scale (100 TB): the explode is map-side and the `tok IN (...)`
# filter drops ~all of it before the only data shuffle (groupBy
# doc_id); df/N/avgdl are broadcast scalars; top-20 is
# TakeOrderedAndProject, never a global sort.

_BM25_TERMS = ("dup", "spark", "merge", "scan")
_BM25_K = 20


def _bm25_score_expr() -> str:
    parts = []
    for i in range(len(_BM25_TERMS)):
        w = f"(n_docs - df{i} + 0.5) / (df{i} + 0.5)"
        sat = (
            f"(tf{i} * 2.2) / "
            f"(tf{i} + 1.2 * (0.25 + 0.75 * (dl / avgdl)))"
        )
        parts.append(
            f"CASE WHEN tf{i} IS NULL THEN CAST(0 AS DOUBLE)"
            f" ELSE ({w}) * ({sat}) END"
        )
    score = parts[0]
    for p in parts[1:]:
        score = f"({score}) + ({p})"
    return score


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BM25_K)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document BM25-scored for the fixed query (no top-k) —
    shared by ``bm25_topk_docs`` and the RRF hybrid fusion in
    workloads/similarity.py."""
    docs = read_table(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id",
        F.size(tokenize("text")).cast("double").alias("dl"),
        tokenize("text").alias("toks"),
    )
    toks = lens.select("doc_id", "dl", F.explode("toks").alias("tok"))
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    wide = tf.groupBy("doc_id", "dl").agg(
        *[
            F.max(F.when(F.col("tok") == t, F.col("tf"))).alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ]
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        exact_avg("dl", "avgdl"),
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))
    dfreq_wide = dfreq.agg(
        *[
            F.max(F.when(F.col("tok") == t, F.col("df_t")))
            .cast("double")
            .alias(f"df{i}")
            for i, t in enumerate(_BM25_TERMS)
        ]
    )
    return (
        wide.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfreq_wide))
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("doc_len"),
            *[
                F.coalesce(F.col(f"tf{i}"), F.lit(0.0))
                .cast("long")
                .alias(f"tf_{t}")
                for i, t in enumerate(_BM25_TERMS)
            ],
            F.expr(_bm25_score_expr()).alias("bm25"),
        )
    )


def _bm25_sql() -> str:
    return f"""
{_bm25_scored_sql()}
ORDER BY bm25 DESC, doc_id
LIMIT {_BM25_K}
"""


def _bm25_scored_sql() -> str:
    tf_cols = ", ".join(
        f"MAX(CASE WHEN tok = '{t}' THEN tf END) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(MAX(CASE WHEN tok = '{t}' THEN df_t END) AS DOUBLE) AS df{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    out_tfs = ", ".join(
        f"CAST(COALESCE(tf{i}, 0.0) AS BIGINT) AS tf_{t}"
        for i, t in enumerate(_BM25_TERMS)
    )
    terms_in = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH lens AS (
  SELECT doc_id, CAST(len({_TOKS_SQL}) AS DOUBLE) AS dl,
         {_TOKS_SQL} AS toks
  FROM documents
),
toks AS (SELECT doc_id, dl, unnest(toks) AS tok FROM lens),
tf AS (
  SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM toks WHERE tok IN ({terms_in})
  GROUP BY doc_id, dl, tok
),
wide AS (SELECT doc_id, dl, {tf_cols} FROM tf GROUP BY doc_id, dl),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         {exact_avg_sql('dl', 'avgdl')}
  FROM lens
),
dfreq AS (SELECT tok, COUNT(*) AS df_t FROM tf GROUP BY tok),
dfreq_wide AS (SELECT {df_cols} FROM dfreq)
SELECT doc_id, CAST(dl AS BIGINT) AS doc_len, {out_tfs},
       {_bm25_score_expr()} AS bm25
FROM wide, stats, dfreq_wide"""


# --- doc_char_diversity: character-diversity quality signal -----------------
# Simpson diversity (1 - Σ p_c²) of the per-document character
# distribution — the cheap gibberish/low-diversity gate in web-corpus
# quality filtering (degenerate docs like "aaaa…" or single-word spam
# score far below natural text's ~0.92). Simpson rather than Shannon
# entropy ON PURPOSE: log2/ln are not bit-portable across engines
# (JVM StrictMath-adjacent vs libm last-ulp differences — same reason
# bigram_lm_quality and bm25 avoid ln), while Simpson is pure rational
# arithmetic. Both engines evaluate the IDENTICAL generated formula
# text: per-character counts via length-minus-replace (one vectorized
# pass per alphabet symbol, no explode, no shuffle), probability
# squares summed in fixed left-associated alphabet order — every step
# the same IEEE-754 op stream, so the doubles (and the keep gate and
# the effective-alphabet-size reciprocal) are bit-equal.
#
# Scale (100 TB): a narrow per-row projection over one scan; cost is
# O(|alphabet| × bytes) of JVM string work inside whole-stage codegen
# with zero shuffle — the cheapest possible quality-signal shape. A
# byte-histogram Pandas UDF would beat the 27-pass constant at very
# wide alphabets; for [a-z ] the codegen form wins (no Arrow hop).

_DIV_ALPHABET = "abcdefghijklmnopqrstuvwxyz "
_DIV_KEEP = 0.92  # keep iff simpson_div > 0.92


def _char_cnt_expr(c: str) -> str:
    return f"(length(text) - length(replace(text, '{c}', '')))"


def _diversity_exprs() -> tuple[str, str]:
    """(total_chars_expr, simpson_concentration_expr) shared verbatim
    by Spark and DuckDB; concentration = Σ p_c² over the alphabet."""
    total = " + ".join(_char_cnt_expr(c) for c in _DIV_ALPHABET)
    terms = []
    for c in _DIV_ALPHABET:
        p = f"(CAST({_char_cnt_expr(c)} AS DOUBLE) / tot)"
        terms.append(f"{p} * {p}")
    return total, "(" + " + ".join(terms) + ")"


def doc_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    total, conc = _diversity_exprs()
    return (
        read_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "text",
            F.expr(f"CAST({total} AS DOUBLE)").alias("tot"),
        )
        .select(
            "doc_id",
            F.col("tot").cast("long").alias("n_alpha"),
            (F.lit(1.0) - F.expr(conc)).alias("simpson_div"),
            (F.lit(1.0) / F.expr(conc)).alias("eff_alphabet"),
        )
        .withColumn("keep", F.col("simpson_div") > _DIV_KEEP)
    )


def _char_diversity_sql() -> str:
    total, conc = _diversity_exprs()
    return f"""
WITH b AS (
  SELECT doc_id, text, CAST({total} AS DOUBLE) AS tot FROM documents
)
SELECT doc_id,
       CAST(tot AS BIGINT) AS n_alpha,
       1.0 - {conc} AS simpson_div,
       1.0 / {conc} AS eff_alphabet,
       1.0 - {conc} > {_DIV_KEEP} AS keep
FROM b
"""


# --- blocklist_term_filter: dimension-join content gating -------------------
# Web-corpus curation step: count blocked-term occurrences per document
# and gate on the hit fraction (reference analog: the equality filters of
# main.py:63 generalized to a term-list predicate). The blocklist joins
# as a (broadcast) dimension TABLE against the exploded token stream
# rather than a literal-array predicate — the form that still works when
# the blocklist has millions of entries (production URL/word blocklists):
# below the autoBroadcast threshold Catalyst broadcasts it, above it the
# same plan degrades gracefully to a shuffle equi-join. One explode, one
# broadcast-left-join, ONE shuffle (the per-doc groupBy) — no join back
# to the source table for totals because the un-matched tokens ride
# through the left join and are counted in the same aggregation.
# The keep gate compares integers cross-multiplied (n_hits * 12 <
# n_tokens, i.e. hit_frac < 1/12) so both engines decide it exactly;
# hit_frac itself is a single int/int double division — bit-identical.

_BLOCKLIST = ("slow", "hash", "vector")
_BLOCK_DEN = 12  # keep iff n_hits / n_tokens < 1 / _BLOCK_DEN


def blocklist_term_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    blocklist = spark.createDataFrame(
        [(t,) for t in _BLOCKLIST], "term string"
    )
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("tok"))
    joined = toks.join(
        F.broadcast(blocklist), toks["tok"] == blocklist["term"], "left"
    )
    hit = F.col("term").isNotNull()
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(hit.cast("long")).alias("n_hits"),
            F.count_distinct("term").alias("n_terms_hit"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_hits",
            "n_terms_hit",
            (F.col("n_hits").cast("double") / F.col("n_tokens")).alias(
                "hit_frac"
            ),
            (F.col("n_hits") * _BLOCK_DEN < F.col("n_tokens")).alias("keep"),
        )
    )


def _blocklist_sql() -> str:
    values = ", ".join(f"('{t}')" for t in _BLOCKLIST)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
),
bl(term) AS (VALUES {values}),
j AS (SELECT doc_id, tok, term FROM toks LEFT JOIN bl ON tok = term)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       COUNT(DISTINCT term) AS n_terms_hit,
       CAST(SUM(CASE WHEN term IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS hit_frac,
       SUM(CASE WHEN term IS NOT NULL THEN 1 ELSE 0 END) * {_BLOCK_DEN}
         < COUNT(*) AS keep
FROM j
GROUP BY doc_id
"""


# --- zipf_fit_report: corpus frequency-law fit --------------------------------
# Vocabulary diagnostics for tokenizer design: fit ln(freq) ~
# a + b·ln(rank) over the full frequency table (Zipf's law predicts
# b ≈ −1). Logs go through the house micro-log discipline
# (round(ln·1e6) as BIGINT, the NB-classifier pattern): per-type x/y
# are exact integers, every cross-type sum is an exact integer sum,
# and the OLS closed form runs on exactly-converted doubles — so the
# fit is cell-exact on both engines despite the libm logs. The slope
# is scale-invariant under the shared 1e6 factor; the intercept is
# divided back out.
#
# Scale shape: one token count (map-side combine); the rank window
# runs over the DISTINCT-TOKEN frequency table — the vocab is a model
# (bounded), not the corpus, the same justification as the SGNS vocab
# rank and the BPE trainer's word table.

_ZIPF_MICRO = 1_000_000


def zipf_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokenize("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = freq.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("tok"))),
    )
    micro = ranked.select(
        F.round(F.log(F.col("rank").cast("double")) * _ZIPF_MICRO)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("n").cast("double")) * _ZIPF_MICRO)
        .cast("bigint")
        .alias("y"),
        "n",
    )
    s = micro.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        # Each product is ~1.3e14 (micro-logs ~1.4e7 squared) — fits
        # int64 — but the SUM crosses int64 once the vocabulary nears
        # ~1e5 types (Spark 4 ANSI would throw ARITHMETIC_OVERFLOW;
        # DuckDB silently promotes to HUGEINT). Route the accumulation
        # through DECIMAL(38,0) on BOTH engines: exact 128-bit sums,
        # identical values, no overflow until ~1e24 types.
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("syy"),
        F.sum("n").cast("bigint").alias("n_tokens"),
    )
    num = s["k"] * s["sxy"] - s["sx"] * s["sy"]
    den = s["k"] * s["sxx"] - s["sx"] * s["sx"]
    slope = num / den
    return s.select(
        F.col("k").cast("bigint").alias("n_types"),
        "n_tokens",
        slope.alias("zipf_slope"),
        (
            (F.col("sy") - slope * F.col("sx"))
            / F.col("k")
            / F.lit(float(_ZIPF_MICRO))
        ).alias("intercept_ln"),
        (
            num * num
            / (den * (s["k"] * s["syy"] - s["sy"] * s["sy"]))
        ).alias("r2"),
    )


_ZIPF_SQL = rf"""
WITH freq AS (
  SELECT tok, COUNT(*) AS n
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents), UNNEST(t) AS u(tok)
  GROUP BY tok
),
ranked AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS r FROM freq
),
micro AS (
  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * {_ZIPF_MICRO}) AS BIGINT) AS x,
         CAST(round(ln(CAST(n AS DOUBLE)) * {_ZIPF_MICRO}) AS BIGINT) AS y,
         n
  FROM ranked
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS k,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
         CAST(SUM(n) AS BIGINT) AS n_tokens
  FROM micro
)
SELECT CAST(k AS BIGINT) AS n_types,
       n_tokens,
       (k * sxy - sx * sy) / (k * sxx - sx * sx) AS zipf_slope,
       (sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k
         / {float(_ZIPF_MICRO)} AS intercept_ln,
       (k * sxy - sx * sy) * (k * sxy - sx * sy)
         / ((k * sxx - sx * sx) * (k * syy - sy * sy)) AS r2
FROM s
"""


# --- percolator_match_counts: reverse search (stored-query alerting) ---------
# The percolator shape: queries are STORED, documents stream past them
# — which alerts fire per document? Each stored query is a conjunction
# of required terms plus optional forbidden terms; a doc matches when
# its token set contains every required term and no forbidden one.
#
# Scale shape: the stored-query table is a model (broadcast); matching
# is ONE pass over distinct doc tokens — an equi-join on the token,
# counted per (doc, query) and compared to the query's required-term
# count (set containment as counting, no per-query scan of the
# corpus); forbidden terms are the same join with an anti filter.
# Output is per-query match counts — the alert volume dashboard.

_PERCOLATOR_QUERIES = (
    # (query_id, required terms, forbidden terms)
    ("slow_tables", ("slow", "table"), ("fast",)),
    ("spark_sort", ("spark", "sort"), ()),
    ("hash_merge", ("hash", "merge"), ("scan",)),
    ("plain_rows", ("row",), ("window", "hash")),
)


def percolator_match_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode_outer(tokenize("text")).alias("tok")
    ).distinct()
    req = spark.createDataFrame(
        [(q, t) for q, terms, _ in _PERCOLATOR_QUERIES for t in terms],
        "query_id string, tok string",
    )
    n_req = spark.createDataFrame(
        [(q, len(terms)) for q, terms, _ in _PERCOLATOR_QUERIES],
        "query_id string, n_required long",
    )
    forb = spark.createDataFrame(
        [(q, t) for q, _, terms in _PERCOLATOR_QUERIES for t in terms]
        or [("__none__", "__none__")],
        "query_id string, tok string",
    )
    hits = (
        tok.join(F.broadcast(req), "tok")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(F.broadcast(n_req), "query_id")
        .filter(F.col("n_hit") == F.col("n_required"))
        .select("doc_id", "query_id")
    )
    blocked = (
        tok.join(F.broadcast(forb), "tok")
        .select("doc_id", "query_id")
        .distinct()
    )
    fired = hits.join(blocked, ["doc_id", "query_id"], "left_anti")
    qids = spark.createDataFrame(
        [(q,) for q, _, _ in _PERCOLATOR_QUERIES], "query_id string"
    )
    return (
        qids.join(fired, "query_id", "left")
        .groupBy("query_id")
        .agg(F.count("doc_id").cast("bigint").alias("n_matching_docs"))
    )


def _percolator_sql() -> str:
    req_rows = ",\n    ".join(
        f"('{q}', '{t}')" for q, terms, _ in _PERCOLATOR_QUERIES for t in terms
    )
    forb_rows = ",\n    ".join(
        f"('{q}', '{t}')" for q, _, terms in _PERCOLATOR_QUERIES for t in terms
    ) or "('__none__', '__none__')"
    nreq_rows = ",\n    ".join(
        f"('{q}', {len(terms)})" for q, terms, _ in _PERCOLATOR_QUERIES
    )
    qid_rows = ",\n    ".join(f"('{q}')" for q, _, _ in _PERCOLATOR_QUERIES)
    return rf"""
WITH tok AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents), UNNEST(t) AS u(tok)
),
req(query_id, tok) AS (VALUES
    {req_rows}
),
n_req(query_id, n_required) AS (VALUES
    {nreq_rows}
),
forb(query_id, tok) AS (VALUES
    {forb_rows}
),
hits AS (
  SELECT t.doc_id, r.query_id
  FROM tok t
  JOIN req r USING (tok)
  JOIN n_req n ON n.query_id = r.query_id
  GROUP BY t.doc_id, r.query_id, n.n_required
  HAVING COUNT(*) = n.n_required
),
blocked AS (
  SELECT DISTINCT doc_id, query_id FROM tok JOIN forb USING (tok)
),
fired AS (
  SELECT h.doc_id, h.query_id
  FROM hits h ANTI JOIN blocked b
    ON b.doc_id = h.doc_id AND b.query_id = h.query_id
),
qids(query_id) AS (VALUES
    {qid_rows}
)
SELECT q.query_id,
       CAST(COUNT(f.doc_id) AS BIGINT) AS n_matching_docs
FROM qids q LEFT JOIN fired f USING (query_id)
GROUP BY q.query_id
"""


# --- span_first_occurrence_dedup: keep-first exact span dedup ---------------
# The ExactSubstr REMOVAL semantics (Lee et al. 2022; C4's repeated-
# span strip): every occurrence of a repeated span is removed EXCEPT
# the globally first one (smallest (doc_id, span_id)). This differs
# from both dup_span_fraction (scores only, no removal) and
# boilerplate_span_strip (frequency-threshold gate that removes ALL
# occurrences including the first): here the corpus keeps exactly one
# copy of every span, the property token-budget accounting wants.
# Documents are cut into NON-overlapping _FO_W-token spans; the kept
# spans reassemble per doc in span order.
#
# Scale (100 TB): occurrence order is packed into one BIGINT key
# (doc_id * 2^20 + span_id — span_id is bounded by tokens/doc, far
# below 2^20, and the pack is range-asserted), so "first occurrence"
# is ONE map-side-combinable MIN per span_text, joined back on the
# span (shuffle-hash: the exploded side's size is misestimated from
# the compact parquet, the standard broadcast-misfire trap). Hot spans
# cost one combiner cell each, not a window sort; reassembly is one
# groupBy(doc_id). Nothing quadratic, nothing driver-side.

_FO_W = 3  # span width in tokens (non-overlapping)
_FO_PACK = 1 << 20  # span_id slots per doc in the packed order key


def span_first_occurrence_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize("text").alias("t"))
    n_spans = F.ceil(F.size("t") / F.lit(float(_FO_W)))
    spans = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), (n_spans - 1).cast("bigint"))
        ).alias("span_id"),
        F.col("t"),
    ).select(
        "doc_id",
        "span_id",
        F.concat_ws(
            " ", F.slice("t", F.col("span_id") * _FO_W + 1, F.lit(_FO_W))
        ).alias("span_text"),
    )
    # packed occurrence key: injective while span_id < 2^20; guard it
    okey = F.when(
        F.col("span_id") < _FO_PACK,
        F.col("doc_id") * _FO_PACK + F.col("span_id"),
    ).otherwise(
        F.raise_error(
            F.lit("span_first_occurrence_dedup: span_id >= 2^20")
        )
    )
    spans = spans.withColumn("okey", okey)
    firsts = spans.groupBy("span_text").agg(F.min("okey").alias("first_okey"))
    flagged = spans.join(firsts.hint("shuffle_hash"), "span_text").withColumn(
        "kept", F.col("okey") == F.col("first_okey")
    )
    kept_spans = F.array_sort(
        F.collect_list(
            F.when(F.col("kept"), F.struct("span_id", "span_text"))
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        F.sum((~F.col("kept")).cast("int")).cast("bigint").alias(
            "n_stripped"
        ),
        F.concat_ws(
            " ", F.transform(kept_spans, lambda s: s["span_text"])
        ).alias("clean_text"),
    )


_FIRST_OCC_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
spans AS (
  SELECT doc_id, span_id,
         array_to_string(
           t[span_id * {_FO_W} + 1 : span_id * {_FO_W} + {_FO_W}], ' ')
           AS span_text,
         doc_id * {_FO_PACK} + span_id AS okey
  FROM (
    SELECT doc_id, t,
           UNNEST(range(0, CAST(CEIL(len(t) / {float(_FO_W)}) AS BIGINT)))
             AS span_id
    FROM toks
  )
),
firsts AS (
  SELECT span_text, MIN(okey) AS first_okey FROM spans GROUP BY span_text
)
SELECT doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN okey = first_okey THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN okey = first_okey THEN 0 ELSE 1 END) AS BIGINT)
         AS n_stripped,
       COALESCE(string_agg(CASE WHEN okey = first_okey THEN span_text END,
                           ' ' ORDER BY span_id), '') AS clean_text
FROM spans JOIN firsts USING (span_text)
GROUP BY doc_id
"""


# --- ngram_coverage_curve: vocabulary-size planning ------------------------
# Tokenizer design input: the smallest vocabulary (by corpus frequency
# rank) whose cumulative token mass reaches 50% / 90% / 99% of the
# corpus — the coverage curve that decides vocab_size before training
# a tokenizer. The cut rule is INTEGER-exact (100*cum >= p*total), so
# no float mass enters the decision. The rank/cumsum window is GLOBAL
# but runs over the aggregated vocabulary — a model-sized frame, the
# documented exception in tests/test_plans.py's window audit.

_COVERAGE_PCTS = (50, 90, 99)


def ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokenize("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = freq.select(
        F.row_number().over(w).alias("rank"),
        F.sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("n").over(
            Window.partitionBy()
        ).alias("total"),
    )
    pcts = F.explode(
        F.array(*[F.lit(p) for p in _COVERAGE_PCTS])
    ).alias("threshold_pct")
    hit = ranked.select("rank", "cum", "total", pcts).filter(
        100 * F.col("cum") >= F.col("threshold_pct") * F.col("total")
    )
    return hit.groupBy("threshold_pct").agg(
        F.min("rank").alias("vocab_size"),
        F.min_by("cum", "rank").alias("covered_tokens"),
        F.max("total").alias("total_tokens"),
    )


_COVERAGE_SQL = f"""
WITH freq AS (
  SELECT tok, COUNT(*) AS n
  FROM (SELECT {_TOKS_SQL} AS t FROM documents), UNNEST(t) AS u(tok)
  GROUP BY tok
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS "rank",
         SUM(n) OVER (ORDER BY n DESC, tok ASC
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n) OVER () AS total
  FROM freq
),
hit AS (
  SELECT threshold_pct, "rank", cum, total
  FROM ranked, UNNEST([{", ".join(str(p) for p in _COVERAGE_PCTS)}])
       AS p(threshold_pct)
  WHERE 100 * cum >= threshold_pct * total
)
SELECT threshold_pct,
       CAST(MIN("rank") AS BIGINT) AS vocab_size,
       CAST(arg_min(cum, "rank") AS BIGINT) AS covered_tokens,
       CAST(MAX(total) AS BIGINT) AS total_tokens
FROM hit GROUP BY threshold_pct
"""


# --- bigram_pmi_collocations: phrase mining via pointwise MI ----------------
# The word2vec-phrases / collocation-extraction primitive (Church &
# Hanks 1990): PMI(w1,w2) = ln( c(w1,w2)·N / (c(w1,·)·c(·,w2)) ) over
# the corpus bigram table, all four counts integers from ONE bigram
# aggregation (N = total bigrams, marginals by position). Low-count
# pairs are gated (PMI explodes on rare pairs), and the top
# collocations are ranked by the micro-log PMI (house grid: exact
# BIGINT, cross-engine order identical).
#
# Scale: one bigram count (map-side combine), two marginal rollups of
# the COUNT table (vocab-sized), a 1-row total broadcast, TakeOrdered
# top-k. No corpus-sized window, no Python.

_PMI_MIN_COUNT = 25
_PMI_TOP = 50


def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize("text").alias("t"))
    # size >= 2 gate BEFORE the explode: sequence(1, 0) yields the
    # descending [1, 0] and element_at(t, 0) raises on a single-token
    # doc; the gate degrades to zero bigrams, matching the oracle.
    big = toks.where(F.size("t") >= 2).select(
        F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
        F.col("t"),
    ).select(
        F.element_at("t", F.col("i")).alias("w1"),
        F.element_at("t", F.col("i") + 1).alias("w2"),
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    c2 = c12.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = c12.agg(F.sum("c12").alias("n_bigrams"))
    pmi_micro = F.round(
        F.log(
            F.col("c12").cast("double")
            * F.col("n_bigrams").cast("double")
            / (F.col("c1").cast("double") * F.col("c2").cast("double"))
        )
        * 1_000_000
    ).cast("bigint")
    return (
        c12.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1", "w2", "c12", "c1", "c2", pmi_micro.alias("pmi_micro")
        )
        .orderBy(F.desc("pmi_micro"), F.asc("w1"), F.asc("w2"))
        .limit(_PMI_TOP)
    )


_PMI_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
),
big AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM toks, UNNEST(range(1, GREATEST(len(t), 1))) AS u(i)
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
c2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM c12 GROUP BY w2),
n AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_bigrams FROM c12)
SELECT w1, w2, c12, c1, c2,
       CAST(round(ln(CAST(c12 AS DOUBLE) * CAST(n_bigrams AS DOUBLE)
                     / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
                  * 1000000) AS BIGINT) AS pmi_micro
FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
WHERE c12 >= {_PMI_MIN_COUNT}
ORDER BY pmi_micro DESC, w1 ASC, w2 ASC
LIMIT {_PMI_TOP}
"""


# --- source_token_kl_divergence: data-mixture distribution shift ------------
# Mixture diagnostics: how far each source's token distribution sits
# from the corpus distribution, KL(p_source || p_corpus) =
# (1/N_s) * sum_i cnt_si * ln(p_si / q_i). The per-type log lands on
# the micro-log grid and is ACCUMULATED AS INTEGERS (cnt * micro-log,
# summed through DECIMAL(38,0)) — the KL total is one exact integer
# divided once at the end, so partial-agg order can never show (the
# same moment-sum discipline as CUPED/delta-method). q_i > 0 always
# (the corpus includes every source), so no smoothing is needed.
#
# Scale: two map-side-combinable counts (source x token, token), one
# vocab-sized join, one groupBy(source). The corpus-total frame is a
# broadcast scalar.


def source_token_kl_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    st = (
        docs.select("source", F.explode(tokenize("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c_st"))
    )
    corpus = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    n_s = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    n_tot = corpus.agg(F.sum("c_t").alias("n_tot"))
    j = (
        st.join(corpus.hint("shuffle_hash"), "tok")
        .join(F.broadcast(n_s), "source")
        .crossJoin(F.broadcast(n_tot))
    )
    # ln(p_si / q_i) = ln( (c_st * n_tot) / (n_s * c_t) ): one double
    # ratio of exact integer products, micro-log grid
    lr_micro = F.round(
        F.log(
            (F.col("c_st").cast("double") * F.col("n_tot").cast("double"))
            / (F.col("n_s").cast("double") * F.col("c_t").cast("double"))
        )
        * 1_000_000
    ).cast("bigint")
    return (
        j.select(
            "source",
            "n_s",
            (F.col("c_st") * lr_micro).cast("decimal(38,0)").alias("term"),
        )
        .groupBy("source", "n_s")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("term").alias("kl_micro_sum"),
        )
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_types",
            (
                F.col("kl_micro_sum").cast("double")
                / (F.col("n_s").cast("double") * 1_000_000.0)
            ).alias("kl_nats"),
        )
    )


_KL_SQL = f"""
WITH st AS (
  SELECT source, tok, COUNT(*) AS c_st
  FROM (SELECT source, {_TOKS_SQL} AS t FROM documents), UNNEST(t) AS u(tok)
  GROUP BY source, tok
),
corpus AS (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok),
n_s AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM st GROUP BY source),
n_tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_tot FROM corpus)
SELECT source,
       n_s AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CAST(c_st * CAST(round(
              ln((CAST(c_st AS DOUBLE) * CAST(n_tot AS DOUBLE))
                 / (CAST(n_s AS DOUBLE) * CAST(c_t AS DOUBLE))) * 1000000)
              AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE)
         / (CAST(n_s AS DOUBLE) * 1000000.0) AS kl_nats
FROM st JOIN corpus USING (tok) JOIN n_s USING (source), n_tot
GROUP BY source, n_s
"""


QUERIES = {
    "ngram_coverage_curve": ngram_coverage_curve,
    "bigram_pmi_collocations": bigram_pmi_collocations,
    "source_token_kl_divergence": source_token_kl_divergence,
    "span_first_occurrence_dedup": span_first_occurrence_dedup,
    "percolator_match_counts": percolator_match_counts,
    "zipf_fit_report": zipf_fit_report,
    "doc_chunk_overlap": doc_chunk_overlap,
    "blocklist_term_filter": blocklist_term_filter,
    "doc_char_diversity": doc_char_diversity,
    "boilerplate_span_strip": boilerplate_span_strip,
    "token_cooccurrence_topk": token_cooccurrence_topk,
    "quality_rank_normalize": quality_rank_normalize,
    "lang_id_confusion": lang_id_confusion,
    "token_rarity_score": token_rarity_score,
    "inverted_index_postings": inverted_index_postings,
    "doc_token_stats": doc_token_stats,
    "bpe_token_counts": bpe_token_counts,
    "tfidf_top_terms": tfidf_top_terms,
    "doc_quality_score": doc_quality_score,
    "lang_id_stopwords": lang_id_stopwords,
    "lang_stats": lang_stats,
    "exact_dedup": exact_dedup,
    "shingle_jaccard_pairs": shingle_jaccard_pairs,
    "shingle_containment_pairs": shingle_containment_pairs,
    "dup_span_fraction": dup_span_fraction,
    "jaccard_prefix_filter_pairs": jaccard_prefix_filter_pairs,
    "bigram_lm_quality": bigram_lm_quality,
    "flesch_readability": flesch_readability,
    "bm25_topk_docs": bm25_topk_docs,
    "text_normalize_dedup": text_normalize_dedup,
}

ORACLE = {
    "ngram_coverage_curve": _COVERAGE_SQL,
    "bigram_pmi_collocations": _PMI_SQL,
    "source_token_kl_divergence": _KL_SQL,
    "span_first_occurrence_dedup": _FIRST_OCC_SQL,
    "zipf_fit_report": _ZIPF_SQL,
    "percolator_match_counts": _percolator_sql(),
    "doc_chunk_overlap": _CHUNK_SQL,
    "blocklist_term_filter": _blocklist_sql(),
    "doc_char_diversity": _char_diversity_sql(),
    "boilerplate_span_strip": _BOILER_SQL,
    "token_cooccurrence_topk": _COOC_SQL,
    "quality_rank_normalize": _RANK_NORM_SQL,
    "lang_id_confusion": _lang_confusion_sql(),
    "token_rarity_score": _RARITY_SQL,
    "inverted_index_postings": _INVERTED_SQL,
    "doc_token_stats": _TOKEN_STATS_SQL,
    "bpe_token_counts": _BPE_SQL,
    "tfidf_top_terms": _TFIDF_SQL,
    "doc_quality_score": _QUALITY_SQL,
    "lang_id_stopwords": _lang_sql(),
    "lang_stats": _LANG_STATS_SQL,
    "exact_dedup": _EXACT_DEDUP_SQL,
    "shingle_jaccard_pairs": _JACCARD_SQL,
    "shingle_containment_pairs": _CONTAINMENT_SQL,
    "dup_span_fraction": _DUP_SPAN_SQL,
    # the oracle is the NAIVE all-shared-shingles formulation — the
    # driver's hash check proves the prefix filter loses no pairs
    "jaccard_prefix_filter_pairs": _JACCARD_SQL,
    "bigram_lm_quality": _BIGRAM_LM_SQL,
    "flesch_readability": _FLESCH_SQL,
    "bm25_topk_docs": _bm25_sql(),
    "text_normalize_dedup": _NORM_DEDUP_SQL,
}
