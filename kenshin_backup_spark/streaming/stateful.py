"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.7; the operator class the reference cannot express at all —
its cache is flush-only state, while these maintain *computational* state
across micro-batches).

Implemented: per-metric EWMA (exponentially weighted moving average) and
counter-reset detection (the Graphite ``nonNegativeDerivative`` semantic
for monotonic counters that wrap/reset) — both classic TSDB stream
operators.

Scale notes (100 TB): state is O(#metrics) — a few doubles per key, far
smaller than windowed-agg state; the GroupStateTimeout reaps idle metrics.
Rows within a (key, micro-batch) pair are sorted by event time inside the
pandas function; cross-batch order is guaranteed by the engine feeding
batches in trigger order.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUTPUT_SCHEMA = "metric string, es long, value double, ewma double"
EWMA_STATE_SCHEMA = "ewma double"


def ewma_stream(
    stream: DataFrame,
    *,
    alpha: float = 0.3,
    key_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-metric EWMA over an event stream, state = one double per metric.

    ``ewma_t = alpha * v_t + (1 - alpha) * ewma_{t-1}`` (seeded with the
    first value). Emits one row per input point with the running EWMA.
    """
    import pandas as pd

    k, t, v = key_col, ts_col, value_col

    def _update(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (ewma,) = state.get if state.exists else (None,)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("__es")
            for es, val in zip(pdf["__es"], pdf[v]):
                ewma = val if ewma is None else alpha * val + (1 - alpha) * ewma
                out.append((key[0], int(es), float(val), float(ewma)))
        state.update((float(ewma),))
        yield pd.DataFrame(out, columns=["metric", "es", "value", "ewma"])

    prepped = stream.withColumn("__es", F.unix_timestamp(F.col(t)).cast("long"))
    return (
        prepped.groupBy(F.col(k))
        .applyInPandasWithState(
            _update,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RESET_OUTPUT_SCHEMA = "metric string, es long, value double, delta double, resets long"
RESET_STATE_SCHEMA = "last double, resets long"


def counter_reset_stream(
    stream: DataFrame,
    *,
    key_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Monotonic-counter derivative with reset detection: when a counter
    drops (restart/wrap), emit delta = new value (counter restarted from
    zero) and count the reset — graphite ``nonNegativeDerivative`` +
    ``resetCount`` in one stateful pass."""
    import pandas as pd

    k, t, v = key_col, ts_col, value_col

    def _update(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        last, resets = state.get if state.exists else (None, 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("__es")
            for es, val in zip(pdf["__es"], pdf[v]):
                if last is None:
                    delta = None
                elif val >= last:
                    delta = val - last
                else:
                    resets += 1
                    delta = val  # counter restarted from zero
                out.append((key[0], int(es), float(val),
                            None if delta is None else float(delta), int(resets)))
                last = val
        state.update((float(last), int(resets)))
        yield pd.DataFrame(out, columns=["metric", "es", "value", "delta", "resets"])

    prepped = stream.withColumn("__es", F.unix_timestamp(F.col(t)).cast("long"))
    return (
        prepped.groupBy(F.col(k))
        .applyInPandasWithState(
            _update,
            outputStructType=RESET_OUTPUT_SCHEMA,
            stateStructType=RESET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
