"""Custom stateful streaming operators (applyInPandasWithState).

The built-in windowed aggregations in streaming/windows.py cover
everything the declarative API can express; this module is the escape
hatch for operators that need explicit per-key state across
micro-batches. The state schema is declared, state is Arrow-batched
per group, and the operator emits one updated row per key per batch —
the Structured Streaming equivalent of a custom UDAF with visible
intermediate results.

Scale: state lives in the executor state store partitioned by the
grouping key, so per-key state is bounded and the shuffle is the same
(key-hash) shuffle a groupBy would do. Timeouts (not used here — the
totals are cumulative by design) are how production caps state size for
abandoned keys.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into (count, sum) state and
    emit the updated running totals. Sum quantized to cents before
    accumulation so the result is order/batching-independent (same
    discipline as operators/relational.exact_sum)."""
    (user_id,) = key
    n, s_cents = (state.get[0], int(state.get[1])) if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        s_cents += int(round(float(pdf["value"].sum()) * 100))
    state.update((n, float(s_cents)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [s_cents / 100.0]}
    )


def _batch_user_totals(pdf: pd.DataFrame) -> pd.DataFrame:
    """Single-batch form of the same fold: empty initial state, one pass."""
    s_cents = int(round(float(pdf["value"].sum()) * 100))
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "sum_value": [s_cents / 100.0],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum of value) maintained as explicit
    state across micro-batches; emits the updated totals for every user
    seen in each batch. On a static DataFrame (where Spark forbids the
    stateful API) the identical fold runs as a one-batch applyInPandas —
    the degenerate form the oracle check validates."""
    if events.isStreaming:
        return events.groupBy("user_id").applyInPandasWithState(
            _update_user_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return events.groupBy("user_id").applyInPandas(
        _batch_user_totals, schema=RUNNING_TOTALS_SCHEMA
    )


def run_stateful_stream_to_memory(spark, events_dir: str, table_name: str = "state_out"):
    """Drive running_user_totals over a file-source stream (one file per
    micro-batch) into an in-memory update sink. The LAST emitted row per
    user is the final running total."""
    from bigdatacw1_spark.streaming.windows import read_events_stream

    stream = read_events_stream(spark, events_dir).select("user_id", "value")
    return (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
