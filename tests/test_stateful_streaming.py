"""applyInPandasWithState running stats vs batch pandas recomputation."""

from __future__ import annotations

import pandas as pd

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.streaming import run_available_now, stream_events
from big_data_pipeline_spark.streaming.stateful import _ALPHA, running_user_stats


def _expected(events: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for uid, g in events.sort_values(["ts", "event_id"]).groupby("user_id"):
        ewma = None
        for v in g["value"]:
            ewma = float(v) if ewma is None else _ALPHA * float(v) + (1 - _ALPHA) * ewma
        rows.append(
            {
                "user_id": uid,
                "n_events": len(g),
                "value_sum": float(g["value"].sum()),
                "ewma": ewma,
            }
        )
    return pd.DataFrame(rows).set_index("user_id").sort_index()


def test_running_stats_match_batch_recurrence(spark, sf_dir):
    stream = running_user_stats(stream_events(spark, sf_dir))
    got = (
        run_available_now(stream, "t_stateful", output_mode="update")
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    want = _expected(read_table(spark, sf_dir, "events").toPandas())
    assert list(got.index) == list(want.index)
    assert (got["n_events"] == want["n_events"]).all()
    assert (got["value_sum"] - want["value_sum"]).abs().max() < 1e-9
    assert (got["ewma"] - want["ewma"]).abs().max() < 1e-9
