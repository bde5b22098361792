"""Stateful streaming sessionization — a custom stateful operator on
``applyInPandasWithState`` (extension surface; the reference has no
streaming. SURVEY.md §1.4 marks streaming as driver-testdata-motivated).

Gap-based sessions (same 30-minute rule as the batch ``user_sessions``
query): consecutive events of a user belong to one session while the
event-time gap stays <= ``gap``; a larger gap closes the session. The
operator keeps ONE in-flight session per user in state and emits a row
per CLOSED session — closed either by a later event inside a batch or
by event-time timeout once the watermark passes last_event + gap.

Scale notes: state is O(active users) x 4 scalars; per micro-batch work
is a groupBy(user_id) shuffle of new events only. On a real cluster the
state store is RocksDB-backed and the watermark bounds state lifetime.

Determinism: with the availableNow trigger and a single input file the
whole table arrives in one batch, so the emitted set is exactly "every
session except each user's last" (the last stays in state, awaiting a
timeout that no further batch advances the watermark to fire). That set
is SQL-expressible, which gives this stateful streaming operator a full
value-hash DuckDB oracle — see ``__spark_entry__.user_sessions_stream``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, n_events bigint, sum_value double"
)
STATE_SCHEMA = "start long, last long, n long, s double"

_US_PER_MIN = 60_000_000


def sessionize_stream(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming gap-sessionization of a (user_id, ts, value) stream."""
    gap_us = gap_minutes * _US_PER_MIN

    def fn(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        closed: list[tuple[int, int, float]] = []  # (start_us, n, sum)

        if state.hasTimedOut:
            start, last, n, s = state.get
            closed.append((start, n, s))
            state.remove()
        else:
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
            ts_us = batch["ts"].astype("int64") // 1000  # ns -> us
            vals = batch["value"].astype("float64")

            cur = state.get if state.exists else None
            for t, v in zip(ts_us.to_numpy(), vals.to_numpy()):
                t = int(t)
                if cur is None:
                    cur = (t, t, 1, float(v))
                elif t - cur[1] > gap_us:
                    closed.append((cur[0], cur[2], cur[3]))
                    cur = (t, t, 1, float(v))
                else:
                    cur = (cur[0], t, cur[2] + 1, cur[3] + float(v))
            if cur is not None:
                state.update(cur)
                # fire once the watermark passes last + gap (ms epoch)
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "n_events": [c[1] for c in closed],
                    "sum_value": [c[2] for c in closed],
                }
            )

    ev = events.withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
