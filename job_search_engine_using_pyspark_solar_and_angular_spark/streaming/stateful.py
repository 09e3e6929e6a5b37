"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in streaming operators cover windowed aggs and watermark dedup
(jobs.py); anything with per-key evolving state that isn't a windowed
aggregate — running per-user profiles, session windows, incremental
latest-wins without a full merge — needs the arbitrary-state API.

Scale notes: state lives in the executor state store partitioned by the group
key (one shuffle); each micro-batch touches only keys present in the batch.
Pair with watermark-based ``GroupStateTimeout`` in production to bound state
for keys that go quiet; the running-profile operator here uses NoTimeout
because its key domain (users) is bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_us", LongType()),  # timestamps kept as int64 in state
    ]
)


def running_user_profile(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running profile (event count, value total, freshest ts),
    updated each micro-batch — the stateful-streaming form of the reference's
    incremental user re-index (``Main/SolrIndexer.java:25-34``), emitting one
    updated row per active key per batch (update output mode)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, last_us = state.get
        else:
            n, total, last_us = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            batch_max = pdf[ts_col].max()
            batch_us = int(batch_max.value // 1000)
            last_us = batch_us if last_us is None else max(last_us, batch_us)
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---- transformWithStateInPandas (Spark 4 arbitrary-state v2) --------------
#
# The v2 API replaces the single implicit state value with named, typed
# state variables (value/list/map), timers, and TTL — the shape long-lived
# streaming services need. The processor below is the v2 form of
# running_user_profile; the replay-parity test pins that both APIs compute
# the same totals.

try:  # pragma: no cover - import guard for older builds / this container
    # the TWS python worker also needs a working protobuf (absent in some
    # containers, including this test environment) and the RocksDB state
    # store provider conf:
    #   spark.sql.streaming.stateStore.providerClass=
    #     org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    import google.protobuf.descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-key running (n_events, total_value) via a named ValueState.

        State is a single fixed-width row per key in the executor state
        store; each micro-batch reads/writes only the keys present in the
        batch. In production add TTL on the state var (the v2 API's native
        mechanism) to bound quiet-key state."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n LONG, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = 0, 0.0
            if self._totals.exists():
                n, total = self._totals.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    HAS_TWS = True
except ImportError:  # pragma: no cover
    HAS_TWS = False


TOTALS_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"


def running_totals_v2(events: DataFrame) -> DataFrame:
    """running_user_profile on the v2 arbitrary-state API
    (``transformWithStateInPandas``): same per-key totals, named state
    variables, update mode."""
    if not HAS_TWS:
        raise NotImplementedError("transformWithStateInPandas requires Spark 3.5.4+/4.x")
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
