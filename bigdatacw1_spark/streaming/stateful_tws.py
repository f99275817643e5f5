"""Custom stateful operator on the Spark 4 transformWithState API.

transformWithStateInPandas supersedes applyInPandasWithState (see
stateful.py for that form): state is typed and named (ValueState /
ListState / MapState on a StatefulProcessorHandle), timers are
first-class, and the state store is RocksDB-backed — per-key state
lives off-heap and spills to disk, which is what makes 100M-key state
feasible where the in-memory HDFS-backed store would OOM. The shuffle
is still the grouping-key hash shuffle; only state residency changes.

Operator here: per-user top-K values — the "keep the K best offers per
customer ever seen" shape. State per key is K doubles, bounded by
construction, so state size is #keys x K regardless of stream length.

The batch degenerate form (one pass, empty initial state) runs the same
fold through applyInPandas, so the driver's oracle check pins the
semantics while tests/test_streaming.py checks the incremental path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

TOPK_OUT_SCHEMA = "user_id bigint, n_seen bigint, rank int, value double"


def _topk_fold(values: list[float], acc: list[float], k: int) -> list[float]:
    """Fold new values into a descending top-k accumulator. Pure, so the
    streaming and batch forms share it."""
    merged = acc + values
    merged.sort(reverse=True)
    return merged[:k]


class TopKValuesProcessor(StatefulProcessor):
    """transformWithState processor: ValueState holds (n_seen, topk
    array); every batch re-emits the updated top-k rows for keys that
    received input (Update mode)."""

    def __init__(self, k: int = 3) -> None:
        self.k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("topk", "n_seen bigint, vals array<double>")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n_seen, vals = self._state.get()
            acc = list(vals)
        else:
            n_seen, acc = 0, []
        for pdf in rows:
            n_seen += len(pdf)
            acc = _topk_fold([float(v) for v in pdf["value"]], acc, self.k)
        self._state.update((n_seen, acc))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)] * len(acc),
                "n_seen": [n_seen] * len(acc),
                "rank": list(range(1, len(acc) + 1)),
                "value": acc,
            }
        )

    def close(self) -> None:
        pass


def _topk_batch(k: int):
    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = _topk_fold([float(v) for v in pdf["value"]], [], k)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])] * len(acc),
                "n_seen": [len(pdf)] * len(acc),
                "rank": list(range(1, len(acc) + 1)),
                "value": acc,
            }
        )

    return fold


def topk_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k values per user. Streaming: transformWithStateInPandas with
    bounded per-key state (requires the RocksDB state store provider —
    see run_tws_stream_to_memory). Batch: the same fold over one
    applyInPandas pass (empty initial state, single batch)."""
    grouped = events.select("user_id", "value").groupBy("user_id")
    if events.isStreaming:
        return grouped.transformWithStateInPandas(
            TopKValuesProcessor(k),
            outputStructType=TOPK_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return grouped.applyInPandas(_topk_batch(k), schema=TOPK_OUT_SCHEMA)


def run_tws_stream_to_memory(
    spark,
    events_dir: str,
    table_name: str = "tws_out",
    k: int = 3,
):
    """File-replayed stream through the transformWithState top-k, Update
    mode to a memory sink. transformWithState requires the RocksDB state
    store (set per-query via the session conf, runtime-settable) and the
    ``protobuf`` package for the Python<->state-server wire format — on
    an environment without protobuf this raises at stream start; the
    batch form (topk_per_user on a static frame) has no such
    dependency."""
    from bigdatacw1_spark.streaming.windows import read_events_stream

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = read_events_stream(spark, events_dir)
    out = topk_per_user(stream, k)
    return (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
