"""Streaming anomaly detection: per-user expanding-history z-score flagging,
the stateful-operator formulation of ``operators.pipeline3.anomaly_zscore``.

Each user's state is three numbers — (count, sum, sum-of-squares) — updated
per micro-batch with vectorized numpy cumulatives (no per-row Python loop).
An event is flagged when at least 20 PRIOR observations exist and its value
sits more than 3σ from the prior mean, exactly like the batch query's
``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` window.

Scale design: state is O(1) per user (three doubles), partitioned by the
groupBy — a billion users is a billion tiny state rows spread over the
cluster's state store, never history. The batch twin carries the DuckDB
oracle; the streaming path is verified against it (same flagged set) in
``tests/test_streaming.py``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from hadrodb_spark.operators.pipeline3 import _ANOM_MIN_N, _ANOM_SIGMA

FLAGS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("ss", T.DoubleType()),
    ]
)


def flag_anomalies(events: DataFrame) -> DataFrame:
    """``events`` (streaming or batch relation with user_id/event_id/ts/
    value) → flagged rows, state updated per micro-batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n0, s0, ss0 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            v = pdf["value"].fillna(0.0).to_numpy(dtype=np.float64)
            cs = s0 + np.cumsum(v)
            css = ss0 + np.cumsum(v * v)
            pre_n = n0 + np.arange(len(v), dtype=np.int64)
            pre_s = cs - v
            pre_ss = css - v * v
            with np.errstate(divide="ignore", invalid="ignore"):
                mean = pre_s / pre_n
                var = (pre_ss - pre_s * pre_s / pre_n) / pre_n
                z = (v - mean) / np.sqrt(var)
            flag = (pre_n >= _ANOM_MIN_N) & (np.abs(z) > _ANOM_SIGMA)
            n0, s0, ss0 = int(pre_n[-1] + 1), float(cs[-1]), float(css[-1])
            if flag.any():
                yield pd.DataFrame(
                    {
                        "user_id": pdf["user_id"].to_numpy()[flag],
                        "event_id": pdf["event_id"].to_numpy()[flag],
                        "value": v[flag],
                        "z": np.round(z[flag], 6),
                    }
                )
        state.update((n0, s0, ss0))

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FLAGS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
