"""Streaming analytics over the ingest stream: event-time windowed
aggregation with watermarked late-data handling, plus a custom stateful
operator via ``applyInPandasWithState``.

These complete the streaming plane beyond segment ingestion
(incremental.py): the windowed aggregate is the declarative path (Catalyst
plans the state store, partial aggregation, and watermark-driven eviction),
while the per-host running profile shows the imperative escape hatch for
semantics the built-in operators can't express (running byte totals with
first/last-seen tracking that must survive across micro-batches).

Scale notes: both operators shuffle once on their grouping key; state size
is O(open windows) resp. O(distinct hosts), bounded by the watermark /
timeout eviction — the state store never grows with stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_ingest_stats(stream_df: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "warc_ts") -> DataFrame:
    """Event-time windowed ingest statistics with late-data tolerance.

    Rows later than ``watermark`` behind the max seen event time are
    dropped by the engine (and their state evicted) — the standard
    bounded-state pattern. Returns a streaming DataFrame
    (window, n_docs, total_bytes, n_langs) suitable for append-mode sinks.
    """
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.coalesce(F.length("text"), F.lit(0))
                       + F.coalesce(F.length("html"), F.lit(0))).alias("total_bytes"),
                 # exact distinct via collect_set: lang is a bounded-
                 # cardinality code (~50 values), so per-window state is
                 # O(langs) — and the result is oracle-reproducible, unlike
                 # approx_count_distinct's HLL estimate (swap back for
                 # genuinely unbounded grouping columns)
                 F.size(F.collect_set("lang")).alias("n_langs")))


HOST_PROFILE_SCHEMA = ("host string, n_docs long, total_bytes long, "
                       "first_seen_us long, last_seen_us long")
_STATE_SCHEMA = "n long, bytes long, first_us long, last_us long"


def host_profile_stream(stream_df: DataFrame, timeout_ms: int = 0,
                        url_col: str = "url", ts_col: str = "warc_ts"):
    """Custom stateful operator: running per-host ingest profile.

    Built-in streaming aggregation cannot express "running totals emitted
    every batch with first/last-seen carried across batches" in update
    semantics with custom eviction — this is the applyInPandasWithState
    shape: one state row per host, updated per micro-batch, with optional
    processing-time timeout eviction to bound state for long-tail hosts.

    WARNING — the default ``timeout_ms=0`` DISABLES eviction: exact
    lifetime totals, but state grows with every distinct host ever seen,
    which is only safe for bounded key cardinality (a fixed crawl list, a
    test fixture). On an unbounded production stream SET A TIMEOUT (e.g.
    3_600_000 = 1 h): an idle host's state is then evicted after one final
    emission, making state O(recently-active hosts); a host reappearing
    after eviction restarts its totals, so merge re-emissions downstream
    if lifetime totals matter. The non-eviction default is kept because a
    timeout, once armed, makes ``processAllAvailable()`` unable to settle
    (the engine schedules timeout-check batches forever), which would hang
    the drain-the-source pattern fixtures and batch-parity harnesses use
    (see tests/test_streaming.py::test_host_profile_timeout_evicts_state
    for the polling pattern that works with eviction on).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..plans.partitioning import host_expr

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            (n, b, first, last) = state.get
            state.remove()
            yield pd.DataFrame([{"host": key[0], "n_docs": n, "total_bytes": b,
                                 "first_seen_us": first, "last_seen_us": last}])
            return
        n = b = 0
        first = last = None
        for pdf in pdfs:
            n += len(pdf)
            b += int(pdf["nbytes"].sum())
            ts = pdf["ts_us"]
            first = int(ts.min()) if first is None else min(first, int(ts.min()))
            last = int(ts.max()) if last is None else max(last, int(ts.max()))
        if state.exists:
            (pn, pb, pf, pl) = state.get
            n += pn
            b += pb
            first = min(first, pf)
            last = max(last, pl)
        state.update((n, b, first, last))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield __import__("pandas").DataFrame(
            [{"host": key[0], "n_docs": n, "total_bytes": b,
              "first_seen_us": first, "last_seen_us": last}])

    # rows with a null timestamp are dropped up front: unix_micros(NULL)
    # becomes NaN inside the pandas batch and int(ts.min()) would raise,
    # failing the whole streaming query
    prepared = (stream_df
                .where(F.col(ts_col).isNotNull())
                .select(
                    host_expr(url_col).alias("host"),
                    (F.coalesce(F.length("text"), F.lit(0))
                     + F.coalesce(F.length("html"), F.lit(0))).cast("long").alias("nbytes"),
                    F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us")))
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if timeout_ms > 0
               else GroupStateTimeout.NoTimeout)
    return (prepared.groupBy("host")
            .applyInPandasWithState(update, HOST_PROFILE_SCHEMA,
                                    _STATE_SCHEMA, "update", timeout))
