"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's async-job lifecycle keeps mutable per-job state in the
backend (reference api/routes/documents.py:255-339 polls it). The
streaming analog here: a per-conversation progress tracker that follows
turns as they arrive across micro-batches and maintains running counters
in Spark state — the ``applyInPandasWithState`` pattern for operators
Spark lacks natively (brief: custom stateful streaming operators).

State per conv_id: (turns_seen, errors_seen, max_turn_idx, complete?).
A conversation is 'complete' once a turn with role='system' and
tool='END' arrives (synthetic end-marker; the 10^12-turn framing would
use a session-close event). Completed conversations drop their state
(bounded memory — state size is O(live conversations), not O(history)).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turns_seen", T.LongType(), False),
        T.StructField("errors_seen", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), False),
        T.StructField("complete", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turns_seen", T.LongType(), False),
        T.StructField("errors_seen", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), False),
    ]
)


def _track(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    turns, errors, max_idx = state.get if state.exists else (0, 0, -1)
    complete = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue  # int(nan) from an empty chunk's max() would kill
            # the streaming query
        turns += len(pdf)
        if "status" in pdf.columns:
            errors += int((pdf["status"] == "error").sum())
        max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        if "role" in pdf.columns and "tool" in pdf.columns:
            complete = complete or bool(
                ((pdf["role"] == "system") & (pdf["tool"] == "END")).any()
            )
    if complete:
        state.remove()  # bounded state: closed conversations are dropped
    else:
        state.update((turns, errors, max_idx))
    yield pd.DataFrame(
        {"conv_id": [conv_id], "turns_seen": [turns], "errors_seen": [errors],
         "max_turn_idx": [max_idx], "complete": [complete]}
    )


def conversation_progress(stream: DataFrame) -> DataFrame:
    """Stateful per-conversation progress over a streaming DataFrame of
    (extracted) turns. Update output mode: each micro-batch emits the
    refreshed counters for conversations it touched."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _track,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
