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


# ---------------------------------------------------------------------
# online KMV (bottom-k) sketch — bounded state BY CONSTRUCTION (r16)
# ---------------------------------------------------------------------
KMV_OUTPUT_SCHEMA = "t string, upd bigint, rnk int, h bigint"
KMV_STATE_SCHEMA = "hs array<bigint>, upd bigint"


def _fold_kmv(
    key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    """Fold a micro-batch of per-type hashes into the bottom-k state:
    state = the k smallest DISTINCT hashes seen so far (the
    hash-identity Theta-sketch convention — ``np.unique`` dedups AND
    sorts, then the cut keeps k), plus an update counter so the
    drained sink can select each key's LAST emission independent of
    how many micro-batches the replay ran. State is ≤ k int64 per
    type — the sketch IS the state, bounded at any stream length."""
    import numpy as np
    import pandas as pd

    from mapreducecf_spark.queries.timeseries import KMV_K

    if state.exists:
        prev_hs, upd = state.get
        hs = np.asarray(prev_hs, dtype=np.int64)
    else:
        hs, upd = np.empty(0, dtype=np.int64), 0
    for pdf in pdfs:
        hs = np.unique(np.concatenate([hs, pdf["h"].to_numpy(np.int64)]))[
            :KMV_K
        ]
    upd += 1
    state.update(([int(x) for x in hs], upd))
    yield pd.DataFrame(
        {
            "t": key[0],
            "upd": upd,
            "rnk": np.arange(1, len(hs) + 1, dtype=np.int32),
            "h": hs,
        }
    )


def kmv_bottom_k(typed_hashes: DataFrame) -> DataFrame:
    """Per-type online bottom-k sketch over a (t, h) stream — the
    stateful-streaming twin of ``queries.timeseries._kmv_sketch``.
    Update mode: each batch that touches a type re-emits that type's
    whole (tiny) sketch with a bumped ``upd``."""
    return typed_hashes.groupBy("t").applyInPandasWithState(
        _fold_kmv,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
