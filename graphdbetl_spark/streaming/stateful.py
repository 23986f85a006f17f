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

from graphdbetl_spark.streaming.protobuf_bridge import install_protobuf_bridge

# At import time so the Python WORKER is bridged too: unpickling a
# StatefulProcessor imports this module before the TWS state client
# makes its first (method-local) StateMessage_pb2 import. No-op where
# a real google.protobuf exists; see protobuf_bridge docstring.
HAS_PROTOBUF = install_protobuf_bridge()

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
        # Cloudpickle serializes this locally-defined class BY VALUE,
        # so unpickling it in a Spark python worker does NOT import
        # this module — but the TWS driver worker's very first
        # protocol step (set_handle_state(PRE_INIT)) imports
        # StateMessage_pb2 before any processor method runs. The
        # unpickle-time hook below is therefore the one place early
        # enough to bridge google.protobuf in that process; the
        # install function itself is a module global, pickled by
        # reference, which is what pulls this package (and the
        # import-time bridge) into ordinary workers too.
        def __setstate__(self, state):
            install_protobuf_bridge()
            self.__dict__.update(state)

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
