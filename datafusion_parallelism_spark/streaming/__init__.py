"""Structured Streaming operators (beyond the reference's scope).

The reference is strictly batch — every plan is ``ExecutionMode::Bounded``
(src/operator/parallel_hash_join.rs:89) and its ``StreamingTable`` is just
an in-memory batch source (src/lib.rs:851).  This module adds the streaming
layer a production pipeline needs, with the SAME event-time semantics as
the batch corpus so batch results are the streaming oracle.
"""

from .events import (  # noqa: F401
    hourly_counts_stream,
    read_events_stream,
    session_windows_stream,
    user_running_totals_stream,
)
