"""Document fingerprinting via winnowing (Schleimer, Wilkerson, Aiken,
SIGMOD 2003): hash every word k-gram, slide a window of w consecutive
gram hashes, keep each window's minimum — a position-robust fingerprint
set whose density is ~2/(w+1) of all grams. Word grams (not char grams)
are the fingerprint unit: same algorithm, ~7x fewer rows per document
at this corpus's word length.

Engine-parity trick: gram hashes are md5 *hex strings* and the window
minimum is lexicographic string MIN — both identical across Spark and
DuckDB, so the whole algorithm is oracle-checked exactly (no float, no
engine-specific hash function).

Scale notes: the explode produces ~tokens/doc narrow rows (doc_id, pos,
32-char hash) that stay within one partition for the windowing (single
shuffle on doc_id). Winnowing density bounds distinct-fingerprint state
to ~2/(w+1) per gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.text import tokenize
from big_data_pipeline_spark.io import read_table

_K = 4  # gram length (words)
_W = 4  # winnowing window (grams)


def doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize("text").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("t") - (_K - 1), F.lit(1)))
        ).alias("pos"),
        "t",
    ).select(
        "doc_id",
        "pos",
        F.md5(
            F.concat_ws(
                " ", *[F.try_element_at("t", F.col("pos") + i) for i in range(_K)]
            )
        ).alias("fp"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _W - 1)
    winnowed = grams.select("doc_id", F.min("fp").over(w).alias("wfp"))
    return winnowed.groupBy("doc_id").agg(
        F.countDistinct("wfp").alias("n_fingerprints"),
        F.min("wfp").alias("min_fp"),
        F.max("wfp").alias("max_fp"),
    )


_WINNOW_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
g AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(t) - {_K - 1}, 1))) AS pos,
         t
  FROM toks
),
h AS (
  SELECT doc_id, pos,
         md5(array_to_string(t[pos:pos + {_K - 1}], ' ')) AS fp
  FROM g
),
w AS (
  SELECT doc_id,
         MIN(fp) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS wfp
  FROM h
)
SELECT doc_id,
       COUNT(DISTINCT wfp) AS n_fingerprints,
       MIN(wfp) AS min_fp,
       MAX(wfp) AS max_fp
FROM w GROUP BY doc_id
"""


QUERIES = {"doc_fingerprint_winnow": doc_fingerprint_winnow}
ORACLE = {"doc_fingerprint_winnow": _WINNOW_SQL}
