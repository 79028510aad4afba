"""Custom stateful streaming operator — the ``applyInPandasWithState``
surface for semantics the built-in windowed aggregations can't express
(running per-key accumulators, custom eviction, alert emission).

The demo operator keeps one (n_events, total_value) accumulator per
``user_id`` in the state store, folds each Arrow micro-batch into it,
and emits the key's updated totals every batch (update mode). State
survives across micro-batches and restarts (checkpointed); at 100 TB/day
the state store holds one tiny row per active user — eviction for
dormant keys would use a ProcessingTimeTimeout instead of NoTimeout.

This is deliberately the (b) tier of the custom-operator ladder
(SURVEY.md §7.3): only reached because "cumulative per-key totals over
an unbounded stream, emitted per batch" has no window/watermark
formulation; everything upstream/downstream stays declarative.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _fold_user(
    key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [(key[0], n, total)], columns=["user_id", "n_events", "total_value"]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, value) over the whole stream,
    emitted on every batch that touches the user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fold_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
