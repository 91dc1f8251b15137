"""User-defined aggregate + table functions (§2.10 surface completion).

The reference's only UDF is a grouped-map closure (SURVEY.md §2.10);
this engine's extension surface also carries scalar pandas UDFs
(vectors.py, similarity/), grouped-map (ml/linreg.py), mapInPandas
(multimodal/) and stateful processors (streaming/stateful.py). This
module adds the two remaining kinds:

- ``exact_median`` — a GROUPED_AGG pandas UDF (Arrow-batched UDAF).
  Medians are rank statistics: order-insensitive and engine-portable
  (both numpy and DuckDB interpolate the two middle values for even
  counts), so unlike float sums they hash-match an oracle directly.
- ``BigramEmitter`` — a Python UDTF (Spark 4): one input row → many
  output rows with typed columns, composed via ``lateralJoin``. The
  token split is RE2-compatible (no lookbehind) so the DuckDB oracle
  can reproduce it with ``string_split_regex``.

Scale notes: GROUPED_AGG runs as partial-per-partition only when the
aggregate is algebraic — a median is NOT (it's holistic), so Spark
ships each group's full column to one task. That's the honest cost of
an exact median at scale; approx_percentile is the algebraic fallback
(see workloads/advanced.quantity_percentiles). The UDTF is row-wise
Python by design (the flexible path); bulk tokenization should use the
built-in split/posexplode (workloads/text.py) — the UDTF exists for
logic too irregular for expressions.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf(T.DoubleType())
def exact_median(v: pd.Series) -> float:
    """Exact holistic median (GROUPED_AGG pandas UDF)."""
    return float(v.median())


@pandas_udf(T.DoubleType())
def exact_p90(v: pd.Series) -> float:
    """Exact 90th percentile with DuckDB's quantile_cont interpolation:
    a*(1-frac) + b*frac over the two bracketing order statistics.
    (numpy/pandas compute a + (b-a)*frac — same real number, different
    IEEE rounding in the last ulp, which an order-insensitive value
    HASH still catches; the formula is pinned so both engines emit
    identical bits.)"""
    x = v.to_numpy(dtype=float)
    x = np.sort(x[~np.isnan(x)])  # NULLs ignored, matching quantile_cont; sort copies
    n = len(x)
    if n == 0:
        return None
    h = (n - 1) * 0.9
    k = int(h)
    frac = h - k
    a, b = x[k], x[min(k + 1, n - 1)]
    return float(a * (1 - frac) + b * frac)


_TOKEN_RE = re.compile(r"\s+")


@udtf(
    returnType=T.StructType(
        [
            T.StructField("pos", T.IntegerType()),
            T.StructField("bigram", T.StringType()),
        ]
    ),
    useArrow=True,
)
class BigramEmitter:
    """(pos, bigram) for each adjacent whitespace-token pair.

    Semantics shared with the SQL oracle: tokens are the non-empty
    pieces of an RE2 ``\\s+`` split; bigrams join adjacent tokens with
    one space; ``pos`` is the 0-based index of the pair.
    """

    def eval(self, text: str | None):
        toks = [t for t in _TOKEN_RE.split(text or "") if t != ""]
        for i in range(len(toks) - 1):
            yield i, toks[i] + " " + toks[i + 1]


def exact_quantile_udaf(q: float):
    """Factory for exact-quantile GROUPED_AGG UDAFs at arbitrary q, with
    the same pinned quantile_cont interpolation as ``exact_p90`` (the
    a*(1-frac) + b*frac form, bit-identical to DuckDB)."""

    @pandas_udf(T.DoubleType())
    def _q(v: pd.Series) -> float:
        x = v.to_numpy(dtype=float)
        x = np.sort(x[~np.isnan(x)])
        n = len(x)
        if n == 0:
            return None
        h = (n - 1) * q
        k = int(h)
        frac = h - k
        a, b = x[k], x[min(k + 1, n - 1)]
        return float(a * (1.0 - frac) + b * frac)

    return _q
