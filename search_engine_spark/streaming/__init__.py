"""Structured Streaming forms of the event operators.

The reference has no true streaming (its "streams" are cron-batch ETL,
SURVEY.md §2.D); these exist because the same declarative plans the batch
operators use (operators/events.py) run unchanged behind ``readStream`` —
that equivalence is the test contract (tests/test_streaming.py).
"""

from .ingest import (  # noqa: F401
    incremental_index_stream,
    ingest_batch,
    stream_documents,
)
from .windowed import (  # noqa: F401
    run_to_memory,
    session_window_counts,
    stateful_asof,
    stateful_asof_watermarked,
    stream_events,
    stream_hourly_rollup,
)
