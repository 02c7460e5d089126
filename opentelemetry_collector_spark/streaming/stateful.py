"""Custom stateful streaming operator: cross-batch sessionization with
``applyInPandasWithState`` (SURVEY §2.8 "custom stateful operators").

The batch sessionizer (queries.q_sessionize) is a window over the full
table; a stream sees a conversation's turns across many micro-batches, so
the per-conv state (last event time + running session index) must survive
between triggers — exactly the state the collector would keep in a grouping
processor. GroupState carries (last_epoch, session_idx) per conv_id;
within a batch rows are processed in turn_idx order (arrival order is the
collector's contract; the file-source WAL preserves file order).

Scale notes: state is O(active conversations) x 12 bytes, hash-partitioned
by conv_id (the same key as the table's bucket layout, so state shuffle
aligns with storage partitioning); timeouts would evict idle convs in a
production deployment (omitted here — finite test streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, turn_idx int, session_idx int"
STATE_SCHEMA = "last_epoch long, session_idx int"


def sessionize_stateful(transcripts: DataFrame, gap_s: int = 600) -> DataFrame:
    """Streaming sessionization: session_idx increments whenever the gap
    from the previous turn exceeds gap_s, continuing across micro-batches."""

    gap = int(gap_s)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (conv_id,) = key
        last_epoch, session_idx = (
            state.get if state.exists else (None, 0)
        )
        # a group's micro-batch data may span multiple Arrow chunks with
        # arbitrary post-shuffle order — materialize and sort ONCE, or gaps
        # computed across chunk boundaries see out-of-order timestamps
        chunks = list(pdfs)
        if not chunks:  # timeout-only invocation: no data, keep state
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("turn_idx")
        out_turns, out_sessions = [], []
        for r in pdf.itertuples(index=False):
            epoch = int(pd.Timestamp(r.ts).value // 1_000_000_000)
            if last_epoch is not None and epoch - last_epoch > gap:
                session_idx += 1
            last_epoch = epoch
            out_turns.append(int(r.turn_idx))
            out_sessions.append(session_idx)
        state.update((last_epoch, session_idx))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id] * len(out_turns),
                "turn_idx": out_turns,
                "session_idx": out_sessions,
            }
        )

    return (
        transcripts.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EDGE_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, src_tool string, dst_tool string, "
    "dur_ms long, status string"
)
EDGE_STATE_SCHEMA = "last_turn_idx int, last_tool string"


def span_edges_stateful(parsed: DataFrame) -> DataFrame:
    """Streaming service-graph edge extraction: the previous tool of each
    conversation's span sequence must survive micro-batch boundaries, so
    the per-conv GroupState carries (last_turn_idx, last_tool) — the
    streaming twin of operators/traces.span_edges' lag window. Emits one
    raw edge row per span that has a predecessor; the per-(src,dst)
    aggregation composes downstream exactly as in batch (a plain streaming
    groupBy with watermark, or a batch rollup over the emitted edges).

    Late data: a span whose turn_idx is <= the stored last_turn_idx arrived
    AFTER a later turn was already processed in an earlier micro-batch —
    appending it would emit a (src, dst) edge the batch lag-window twin
    would never produce. Such rows are DROPPED (watermark-style late-data
    semantics; the stored last_turn_idx is the watermark), keeping every
    emitted edge one the batch twin also emits. Within a micro-batch,
    rows are sorted by turn_idx first, so only cross-batch reordering is
    ever late.

    Scale notes: state is O(active conversations) x (int + tool string),
    keyed on conv_id — the table's bucket key, so the state shuffle aligns
    with storage partitioning, like the sessionizer above.
    """

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (conv_id,) = key
        last_turn, last_tool = state.get if state.exists else (None, None)
        chunks = list(pdfs)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("turn_idx")
        rows = []
        for r in pdf.itertuples(index=False):
            if last_turn is not None and int(r.turn_idx) <= last_turn:
                continue  # late arrival from a prior batch window: drop
            if last_tool is not None:
                rows.append(
                    (
                        conv_id,
                        int(r.turn_idx),
                        last_tool,
                        r.parsed_tool,
                        int(r.dur_ms),
                        r.status,
                    )
                )
            last_turn, last_tool = int(r.turn_idx), r.parsed_tool
        state.update((last_turn, last_tool))
        yield pd.DataFrame(
            rows,
            columns=[
                "conv_id", "turn_idx", "src_tool", "dst_tool",
                "dur_ms", "status",
            ],
        )

    from pyspark.sql import functions as F

    return (
        parsed.filter(F.col("trace_id").isNotNull())
        .select("conv_id", "turn_idx", "parsed_tool", "dur_ms", "status")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=EDGE_OUTPUT_SCHEMA,
            stateStructType=EDGE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
