"""Custom stateful streaming operator — conversation assembly with
``applyInPandasWithState``.

The reference's per-document ordered collect (``parser.py:183-190``)
lifted to an unbounded stream: turns arrive out of order across
micro-batches; per-``conv_id`` state accumulates (turn_idx, markdown)
pairs and emits one assembled document row when the conversation goes
idle past a processing-time timeout.  This is the class of operator
SQL cannot express (timeout-driven emission + evolving state), hence
no DuckDB oracle — pytest asserts assembly equality against the batch
path instead.

State design at 10^12-turn scale: state is keyed by conv_id and holds
only (idx, text) pairs for OPEN conversations; timeout eviction bounds
the state store.  GroupStateTimeout.ProcessingTimeTimeout keeps the
operator deterministic under replay (checkpointed offsets + versioned
state store give exactly-once emission).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

ASSEMBLED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", IntegerType(), False),
        StructField("document", StringType(), False),
    ]
)

# state: accumulated turn indices and texts (parallel ARRAY fields —
# delimiter-joined strings would desynchronize on payloads that happen
# to contain the delimiter byte; arrays are content-safe)
STATE_SCHEMA = StructType(
    [
        StructField("idxs", ArrayType(IntegerType()), False),
        StructField("texts", ArrayType(StringType()), False),
    ]
)


def assemble_conversations(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState function: accumulate turns per conv_id,
    emit the ordered assembled document on idle timeout."""
    (conv_id,) = key
    if state.hasTimedOut:
        st_idxs, st_texts = state.get
        ordered = [t for _, t in sorted(zip(list(st_idxs), list(st_texts)))]
        state.remove()
        yield pd.DataFrame(
            [{"conv_id": conv_id, "n_turns": len(ordered),
              "document": "\n".join(ordered)}]
        )
        return

    idxs: list[int] = []
    texts: list[str] = []
    if state.exists:
        st_idxs, st_texts = state.get
        idxs = [int(i) for i in st_idxs]
        texts = [str(t) for t in st_texts]
    for pdf in pdfs:
        idxs.extend(int(i) for i in pdf["turn_idx"])
        texts.extend(str(t) for t in pdf["markdown"])
    state.update((idxs, texts))
    state.setTimeoutDuration(2000)  # idle ms before emission
    yield pd.DataFrame(
        {"conv_id": pd.Series(dtype="object"),
         "n_turns": pd.Series(dtype="int32"),
         "document": pd.Series(dtype="object")}
    )


def assembled_stream(turns_stream):
    """Wire the stateful assembler onto a streaming DataFrame with
    (conv_id, turn_idx, markdown) columns."""
    return (
        turns_stream.groupBy("conv_id")
        .applyInPandasWithState(
            assemble_conversations,
            outputStructType=ASSEMBLED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
