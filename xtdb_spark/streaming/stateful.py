"""Custom stateful streaming operator: session windows via
applyInPandasWithState.

The reference has no streaming query operators (SURVEY §2.9 — its
"streaming" is log ingest), so this exceeds parity: per-key session
state is carried across micro-batches, the canonical custom-stateful
shape for a training-data pipeline (e.g. assembling user activity
episodes from an event firehose).

Scale design: state lives in the state store partitioned by the
group key — each executor holds only its keys' sessions; a gap-based
session cannot be expressed with tumbling windows, and Spark's
built-in `session_window` can't carry custom per-session payloads,
hence the pandas-with-state operator.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long, closed boolean")
# state keeps epoch-micros (long) — simplest stable state encoding
_STATE_SCHEMA = "start_us long, end_us long, n_events long"

_US = 1_000_000


def _sessionize_group(key, pdf_iter, state: GroupState, gap_us: int):
    (user_id,) = key
    if state.exists:
        start_us, end_us, n = state.get
    else:
        start_us, end_us, n = None, None, 0

    closed: list[tuple] = []
    batch = pd.concat(list(pdf_iter))
    for ts in sorted(batch["ts"]):
        ts_us = int(pd.Timestamp(ts).value // 1000)
        if start_us is None:
            start_us, end_us, n = ts_us, ts_us, 1
        elif ts_us - end_us > gap_us:
            closed.append((user_id, start_us, end_us, n, True))
            start_us, end_us, n = ts_us, ts_us, 1
        else:
            end_us, n = ts_us, n + 1

    state.update((start_us, end_us, n))
    # emit closed sessions plus a snapshot of the open one (update mode)
    rows = closed + [(user_id, start_us, end_us, n, False)]
    yield pd.DataFrame(
        [(u, pd.Timestamp(s * 1000, unit="ns"), pd.Timestamp(e * 1000, unit="ns"),
          cnt, cl) for u, s, e, cnt, cl in rows],
        columns=["user_id", "session_start", "session_end",
                 "n_events", "closed"])


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      key: str = "user_id") -> DataFrame:
    """Gap-based sessionization over a *streaming* frame; per-key
    session state survives micro-batch boundaries. Emits closed
    sessions as they are sealed and a live snapshot of each open
    session (closed=false) per batch."""
    gap_us = gap_minutes * 60 * _US

    def fn(key_, pdfs, state):
        yield from _sessionize_group(key_, pdfs, state, gap_us)

    return (events.groupBy(key).applyInPandasWithState(
        fn, SESSION_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout))
