"""Secondary sort: per-key ordered streaming over partitions.

The classic MapReduce "secondary sort" pattern, DataFrame-native:
``repartition(key)`` + ``sortWithinPartitions(key, order)`` gives every
partition its keys contiguous and time-ordered — no global sort — and a
``mapInPandas`` pass then streams each partition ONCE in that order,
carrying O(1) state across Arrow batches. This is the escape hatch for
ordered per-key logic that window functions can't express (pattern
matching, decaying state, compaction); sessionization is implemented
here as the canonical, oracle-checkable instance of the pattern, with
results identical to the LAG/running-sum window formulation in
``workloads/events.py::session_windows``.

Scale shape: one hash shuffle on the key (same as any window function),
then Spark's external sorter sorts each partition with spill — memory
stays bounded at any partition size. The Python stage is
Arrow-vectorized: per batch it does a handful of numpy ops plus one
C-speed pandas groupby-cumsum, not a per-row loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

# NULL-key sentinel: NULL user_ids arrive as NaN (Arrow nullable→float64)
# and NaN != NaN would poison the equality-based grouping; one shared
# object restores NULL==NULL, matching SQL GROUP BY / window-PARTITION
# semantics where all NULL keys form one group.
_NULL_KEY = object()


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign 1-based per-user session ids: a new session starts when
    the gap since the user's previous event exceeds ``gap_seconds``
    (whole-second granularity, matching ``unix_timestamp`` /
    ``date_diff('second')`` semantics on the SQL side).

    Returns the input columns plus ``session_id``.
    """
    out_schema = StructType(df.schema.fields).add("session_id", LongType())

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_uid: object = None
        carry_sec = np.int64(0)
        carry_sess = np.int64(0)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            uid = pdf[user_col].to_numpy()
            null_mask = pdf[user_col].isna().to_numpy()
            if null_mask.any():
                uid = uid.astype(object)
                uid[null_mask] = _NULL_KEY
            sec = (
                pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
                // 1_000_000
            )
            # prepend the carried (user, ts) so row 0 compares across the
            # batch boundary; same-dtype placeholder on the very first batch
            fresh = carry_uid is None
            prev0 = uid[0] if fresh else carry_uid
            psec0 = sec[0] if fresh else carry_sec
            prev_uid = np.concatenate(([prev0], uid[:-1]))
            prev_sec = np.concatenate(([psec0], sec[:-1]))
            new_flag = (uid != prev_uid) | (sec - prev_sec > gap_seconds)
            if fresh:
                new_flag[0] = True  # no carry yet: first row opens a session
            sid = (
                pd.Series(new_flag.astype(np.int64))
                .groupby(pd.Series(uid), sort=False)
                .cumsum()
                .to_numpy()
            )
            # rows of the carried user (contiguous at the batch head under
            # the sort order) resume its session counter — whether row 0
            # continues the session (cumsum starts at 0) or opens a new one
            # (cumsum starts at 1, true id = carry_sess + 1)
            if not fresh:
                sid = sid + np.where(uid == carry_uid, carry_sess, 0)
            out = pdf.copy()
            out["session_id"] = sid
            carry_uid, carry_sec, carry_sess = uid[-1], sec[-1], sid[-1]
            yield out

    ordered = df.repartition(F.col(user_col)).sortWithinPartitions(
        user_col, ts_col, tiebreak_col
    )
    return ordered.mapInPandas(assign, schema=out_schema)
