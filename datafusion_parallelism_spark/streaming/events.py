"""Event-stream operators: windowed aggregation, session windows, custom
stateful processing.

Design for scale:

* File-source streams partition work by file; at 100 TB the same code runs
  on a bucketed object-store path or Kafka with only the reader swapped.
* All aggregations are keyed by (window/session, key) — state store size is
  bounded by the WATERMARK, which evicts state for windows older than the
  lateness bound (here 2 hours of event time).
* The custom stateful operator uses ``applyInPandasWithState`` with an
  explicit per-key state schema + processing-time timeout — the Spark
  analog of a custom stateful ExecutionPlan.

Correctness contract: each streaming operator has identical event-time
semantics to a batch query over the same parquet, so tests run the stream
with ``trigger(availableNow)`` into a memory sink and diff against the
batch result (the strongest oracle available without a second engine).
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.parquet import _nanos_timestamp_columns, nanos_to_timestamp

WATERMARK = "2 hours"
SESSION_GAP = "30 minutes"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream (ns timestamps normalized to
    TimestampType exactly like the batch scan, sources/parquet.py).

    The file stream source requires a DIRECTORY; the driver data is a
    single file, so it is exposed through a symlink staging dir (the
    production shape — a stream of files landing in a path — needs no
    staging)."""
    import hashlib
    import os

    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isfile(path):
        stage = os.path.join(
            "/tmp/spark_graft_stream", hashlib.md5(path.encode()).hexdigest()[:12]
        )
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "events-0.parquet")
        if not os.path.exists(link):
            os.symlink(path, link)
        stream_path = stage
    else:
        stream_path = path
    batch_schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(batch_schema).parquet(stream_path)
    for name in _nanos_timestamp_columns(path):
        stream = stream.withColumn(name, nanos_to_timestamp(name))
    # Watermarks require TIMESTAMP (LTZ); µs-no-tz parquet columns arrive as
    # TIMESTAMP_NTZ.  The session timezone is pinned to UTC (session.py), so
    # the cast is value-identical to the batch scan's naive timestamps.
    from pyspark.sql.types import TimestampNTZType

    for field in stream.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            stream = stream.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return stream


def hourly_counts_stream(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows with a 2-hour watermark: count +
    value sum per (window, event_type).  Late data beyond the watermark is
    dropped and its state evicted — bounded memory at any scale."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def session_windows_stream(events: DataFrame) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap) — the built-in
    session_window operator under a watermark; the streaming twin of the
    batch events_sessionize query (lag/cumsum formulation)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


_STATE_SCHEMA = "n long, total double"
_OUT_SCHEMA = "user_id long, n_events long, value_total double"


def _update_user_totals(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Accumulate per-user event count + value total across micro-batches.

    State survives between triggers; each emission is the UPDATED running
    total for keys seen in this batch (update-mode semantics)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_total": [total]}
    )


#: Bucketized state: parallel arrays of per-user accumulators plus two
#: scalar slots for the (defensive) null-user_id group, which pandas
#: groupby cannot key through an int64 index.
_BUCKET_STATE_SCHEMA = (
    "users array<long>, ns array<long>, totals array<double>, "
    "null_n long, null_total double"
)


def _update_bucket_totals(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Per-BUCKET running totals: state holds every user of the bucket as
    parallel arrays; each batch is merged with one vectorized pandas
    groupby instead of one Python call per user.  Emits exactly the rows
    the per-user operator would have emitted this batch — one row per
    user PRESENT in the batch, carrying the accumulated totals — so the
    sink content is identical row-for-row."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        users, ns, totals, null_n, null_total = state.get
    else:
        users, ns, totals, null_n, null_total = [], [], [], 0, 0.0
    prev = pd.DataFrame(
        {"n": pd.Series(ns, dtype="int64"), "t": pd.Series(totals, dtype="float64")},
        index=pd.Index(pd.Series(users, dtype="int64")),
    )
    null_mask = batch["user_id"].isna()
    nb = batch[~null_mask]
    grouped = nb.groupby(nb["user_id"].astype("int64"), sort=False)["value"]
    cur = pd.DataFrame({"n": grouped.size().astype("int64"), "t": grouped.sum()})
    merged = prev.add(cur, fill_value=0)
    new_n = merged["n"].astype("int64")
    new_t = merged["t"].astype("float64")
    n_null = int(null_mask.sum())
    if n_null:
        null_n = (null_n or 0) + n_null
        null_total = (null_total or 0.0) + float(batch.loc[null_mask, "value"].sum())
    state.update(
        (
            new_n.index.tolist(),
            new_n.tolist(),
            new_t.tolist(),
            null_n,
            null_total,
        )
    )
    emit = cur.index
    out = pd.DataFrame(
        {
            "user_id": emit.to_numpy(dtype="int64"),
            "n_events": new_n.loc[emit].to_numpy(dtype="int64"),
            "value_total": new_t.loc[emit].to_numpy(dtype="float64"),
        }
    )
    if n_null:
        null_row = pd.DataFrame(
            {
                "user_id": pd.array([None], dtype="Int64"),
                "n_events": [null_n],
                "value_total": [null_total],
            }
        )
        out = pd.concat([out, null_row], ignore_index=True)
    yield out


def user_running_totals_stream(
    events: DataFrame, buckets: int | None = None
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (count, value sum).  The explicit state schema + Arrow-batched update
    function is the Spark-native form of a hand-written stateful operator
    (what the reference would have needed a custom ExecutionPlan for).

    State is keyed by HASH BUCKET, not by user (round 10):
    applyInPandasWithState invokes the Python function once per KEY, so
    per-user keys paid the fixed Python/Arrow/state round-trip per user —
    the x64 stage counters showed 1,167 s of task time against 45 s of
    CPU (JVM threads blocked on ~12 ms per single-user call across ~96 k
    users).  With ``pmod(xxhash64(user_id), buckets)`` as the state key
    (deterministic — guide §2.5's retry-safe synthetic key), each call
    merges ~users/buckets accumulators with one vectorized pandas
    groupby, and only (user_id, value) crosses the Arrow boundary
    (guide §4: the per-user form shipped all six event columns,
    ``props`` included).  Emitted rows are identical: one row per user
    present in the batch with its accumulated totals.  Bucket count
    scales with the session (4× defaultParallelism — enough keys to
    spread over any state-partition count; per-bucket state is
    |users|/buckets, the same shard-growth class as the state store
    itself).  Kill-switch: ``spark.graft.totals_buckets=0`` restores
    per-user keys; any positive value overrides the bucket count."""
    spark = events.sparkSession
    if buckets is None:
        conf = spark.conf.get("spark.graft.totals_buckets", "")
        buckets = (
            int(conf)
            if conf
            else 4 * spark.sparkContext.defaultParallelism
        )
    if buckets <= 0:
        return events.groupBy("user_id").applyInPandasWithState(
            _update_user_totals,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    keyed = events.select(
        F.pmod(F.xxhash64("user_id"), F.lit(buckets)).alias("bucket"),
        "user_id",
        "value",
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _update_bucket_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_BUCKET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Execute a streaming DataFrame to completion over the available data
    (availableNow trigger) into an in-memory table; returns the query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_to_table(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
    driver_bounded: bool = False,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) and
    return its accumulated output as a DataFrame, registered as temp view
    ``name`` — the DISTRIBUTED replacement for :func:`run_to_memory` on
    the query paths.

    Why not the memory sink: it collects every output row onto the
    DRIVER, and each downstream read is a ``LocalTableScan`` whose rows
    the driver must re-serialize and ship back to the executors — at the
    x64 replica that single-threaded driver hop was 37 s of
    stream_session_windows' 60 s wall (stage counters: the post-stream
    "save" job had 4.5 s of task time under a 37 s wall; the missing 32 s
    is driver-side serialization, exactly the guide §5 "driver does no
    data work" rule).  Here each micro-batch is written to parquet by the
    executors via ``foreachBatch`` (complete mode overwrites — the memory
    sink's truncate+add; append/update append — the memory sink's row
    accumulation, so the table CONTENT is identical in every mode), and
    the downstream read is an ordinary parallel parquet scan.

    The staging dir is keyed by (pid, name) and DELETED at entry, so
    every invocation recomputes from the stream — nothing persists across
    runs.

    ``driver_bounded=True`` marks queries whose output is bounded by the
    TIME RANGE, not the data volume (tumbling/sliding window aggregates:
    O(#windows) rows no matter how large the corpus) — those keep the
    memory sink, which the x64 pairs measured as ~2–3 s cheaper per query
    (no parquet write+scan round-trip) and which stays driver-safe at any
    scale because the row count cannot grow with the input.  Explicitly
    setting ``spark.graft.stream_sink`` (``parquet``/``memory``) overrides
    the flag in either direction — that is the paired-A/B kill-switch."""
    import shutil

    spark = stream_df.sparkSession
    sink = spark.conf.get("spark.graft.stream_sink", "")
    if not sink:
        sink = "memory" if driver_bounded else "parquet"
    if sink == "memory":
        run_to_memory(stream_df, name, output_mode)
        return spark.table(name)
    base = os.path.join("/tmp/spark_graft_stream_out", f"{os.getpid()}_{name}")
    shutil.rmtree(base, ignore_errors=True)
    out = os.path.join(base, "data")
    write_mode = "overwrite" if output_mode == "complete" else "append"

    def _write_batch(batch_df: DataFrame, _epoch_id: int) -> None:
        batch_df.write.mode(write_mode).parquet(out)

    q = (
        stream_df.writeStream.foreachBatch(_write_batch)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if os.path.isdir(out):
        df = spark.read.parquet(out)
    else:  # no micro-batch fired (empty source): preserve the schema
        df = spark.createDataFrame([], stream_df.schema)
    df.createOrReplaceTempView(name)
    return df


def purchase_click_join_stream(events: DataFrame) -> DataFrame:
    """STREAM-STREAM inner join: each purchase joined to the same user's
    clicks in the preceding 30 minutes.  Both sides carry watermarks and
    the join condition bounds event-time distance, so state for rows older
    than (watermark + interval) is evicted — the bounded-state form of a
    stream-stream join.  Append-mode output; batch twin = the identical
    interval join, which is the test/driver oracle."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", WATERMARK)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id"
    )


def sliding_counts_stream(events: DataFrame) -> DataFrame:
    """SLIDING 2-hour windows advancing every hour (each event belongs to
    two overlapping windows) with the standard watermark — the overlap
    factor multiplies state size, which is why the watermark bound matters
    twice as much as for tumbling windows."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "value_sum")
    )


def dedup_keys_stream(events: DataFrame) -> DataFrame:
    """Streaming exact deduplication: first occurrence of each
    (user_id, event_type) key passes, duplicates are dropped against the
    state store.  Only the KEY columns are emitted so the result is
    deterministic (which full row arrives first is race-dependent);
    dropDuplicatesWithinWatermark would bound state by event time when the
    key space is unbounded."""
    return (
        events.withWatermark("ts", WATERMARK)
        .select("user_id", "event_type", "ts")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def static_enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """STREAM-STATIC enrichment join — the most common production
    streaming join: each micro-batch hash-joins against a broadcast
    dimension snapshot.  Stateless (no watermark, no join state): the
    static side is re-broadcast per batch, so dimension updates between
    batches are picked up and state never accumulates.  At 100 TB/day the
    stream side stays partition-parallel and only the dim broadcasts."""
    from pyspark.sql import functions as F

    return events.join(
        F.broadcast(dim), events["user_id"] == dim["c_custkey"]
    ).select(
        "event_id",
        "user_id",
        F.col("c_mktsegment").alias("segment"),
        F.round("value", 2).alias("value"),
    )


_TWS_OUT_SCHEMA = (
    "user_id long, n_events long, n_types long, max_value double"
)


class _UserStatsProcessor:
    """transformWithStateInPandas processor: per-user event count, distinct
    event-type count (MapState — one entry per type, NOT per event), and
    max value (ValueState).  The typed-state API is Spark 4's successor to
    applyInPandasWithState: state variables are declared individually, so
    the store evolves per variable and timers/TTL attach per state.  State
    size per key is O(#event types) — bounded at any event volume."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n LONG, maxv DOUBLE")
        self._types = handle.getMapState("types", "t STRING", "c LONG")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, maxv = 0, None
        if self._totals.exists():
            n, maxv = self._totals.get()
        for pdf in rows:
            n += len(pdf)
            m = float(pdf["value"].max())
            maxv = m if maxv is None else max(maxv, m)
            for t, c in pdf.groupby("event_type").size().items():
                prev = (
                    self._types.getValue((t,))[0]
                    if self._types.containsKey((t,))
                    else 0
                )
                self._types.updateValue((t,), (prev + int(c),))
        self._totals.update((n, maxv))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_types": [n_types],
                "max_value": [maxv],
            }
        )

    def close(self) -> None:
        pass


def user_stats_tws_stream(events: DataFrame) -> DataFrame:
    """Typed-state custom operator via transformWithStateInPandas (the
    arbitrary-stateful-processing API): per-user count / distinct-type
    count / max value, emitted in update mode.

    GATED on protobuf: the transformWithState Python worker speaks a
    protobuf state protocol (pyspark/sql/streaming/proto); environments
    without ``google.protobuf`` (like this container) raise ImportError
    here rather than crashing the streaming runner mid-query.  The
    applyInPandasWithState operator above covers the same capability on
    the older, dependency-free API."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as ex:  # pragma: no cover - environment-dependent
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(pyspark's typed-state protocol); use "
            "user_running_totals_stream (applyInPandasWithState) instead"
        ) from ex
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type("UserStatsProcessor", (_UserStatsProcessor, StatefulProcessor), {})
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=cls(),
        outputStructType=_TWS_OUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def run_foreachbatch_upsert(
    spark: SparkSession, events: DataFrame, target_path: str, checkpoint: str
) -> None:
    """Stream → maintained snapshot table via ``foreachBatch`` upsert: each
    micro-batch is reduced to per-user partials (latest (ts, event_type)
    by struct max + event count) and MERGED into the parquet snapshot at
    ``target_path`` — the CDC sink pattern for keeping a serving table
    current from an event stream.

    The merge is associative (max-of-maxes, sum-of-counts), so the final
    snapshot is independent of micro-batch boundaries — which is what the
    registered oracle checks.  The read-merge-overwrite here uses an eager
    localCheckpoint to break the read→overwrite dependency; at production
    scale this seam is a transactional table format (Delta/Iceberg MERGE),
    which is not available in this container — the streaming semantics
    (exactly-once via checkpoint, associative merge) are what is real and
    tested."""

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        src = (
            batch_df.groupBy("user_id")
            .agg(
                F.max(F.struct("ts", "event_type")).alias("m"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                "user_id",
                F.col("m.ts").alias("last_ts"),
                F.col("m.event_type").alias("last_event_type"),
                "n_events",
            )
        )
        try:
            tgt = spark.read.parquet(target_path)
            has_target = True
        except Exception:
            has_target = False
        if has_target:
            merged = (
                tgt.unionByName(src)
                .groupBy("user_id")
                .agg(
                    F.max(F.struct("last_ts", "last_event_type")).alias("m"),
                    F.sum("n_events").alias("n_events"),
                )
                .select(
                    "user_id",
                    F.col("m.last_ts").alias("last_ts"),
                    F.col("m.last_event_type").alias("last_event_type"),
                    F.col("n_events").cast("bigint").alias("n_events"),
                )
            )
        else:
            merged = src
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            target_path
        )

    q = (
        events.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
