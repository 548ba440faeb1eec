"""Executor-side stage metrics: the engine's runtime instrumentation surface.

Parity note: the reference's operators implement DataFusion's
``ExecutionPlan::metrics()`` (``src/utils/static_table.rs:215``,
``src/bin/main.rs:302`` return ``MetricsSet``) — per-operator counters
readable after execution.  Spark's equivalents live in two places:

* :class:`pyspark.sql.Observation` — per-query aggregates collected during
  execution with no second data pass (tests/test_observability.py);
* the per-STAGE executor metrics (shuffle bytes/rows, spill, GC, peak
  execution memory) this module reads from the live UI's REST API — the
  AppStatusStore has no stable py4j surface, so the REST endpoint is the
  documented way to them.

The stage metrics are what settle scale questions walls cannot: the r9
join_inner_chain investigation found its "super-linear" x128→x256 leg was
an AQE-coalesce spill cliff purely from these rows — spill was the only
metric that flipped between the factors (BASELINE.md §Round 9,
docs/decomp_chain_r9.jsonl).  Wall clocks on a shared box drift ±20-70%;
task-time and byte counters do not.

Requires a session built with ``spark.ui.enabled=true`` (the measurement
harnesses pass it; the default session keeps the UI off to avoid the
listener-bus overhead on MB-scale runs).  Returns ``{}`` when the UI is
off rather than failing, so callers can attach metrics opportunistically.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession

#: StageData fields surfaced, REST name → short name.  MB fields keep
#: 3 decimals (KB resolution — correctness-scale stages shuffle KBs);
#: times are ms.
_FIELDS = (
    ("executorRunTime", "run_ms", 1),
    ("executorCpuTime", "cpu_ms", 1_000_000),  # reported in ns
    ("jvmGcTime", "gc_ms", 1),
    ("shuffleWriteBytes", "shuffle_write_mb", 1e6),
    ("shuffleReadBytes", "shuffle_read_mb", 1e6),
    ("shuffleWriteRecords", "shuffle_write_rows", 1),
    ("memoryBytesSpilled", "spill_mem_mb", 1e6),
    ("diskBytesSpilled", "spill_disk_mb", 1e6),
    ("inputBytes", "input_mb", 1e6),
    ("peakExecutionMemory", "peak_exec_mem_mb", 1e6),
)


def stage_metrics(spark: SparkSession, timeout: float = 10.0) -> dict[int, dict]:
    """Completed-stage executor metrics, ``{stageId: {field: value}}``.

    One row per completed Spark stage since the context started; callers
    doing per-query attribution snapshot the id set between queries (see
    ``scripts/decomp.py``).
    """
    base = spark.sparkContext.uiWebUrl
    if not base:
        return {}
    with urllib.request.urlopen(
        f"{base}/api/v1/applications", timeout=timeout
    ) as r:
        app_id = json.load(r)[0]["id"]
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=timeout) as r:
        stages = json.load(r)
    out: dict[int, dict] = {}
    # The REST endpoint returns one StageData per ATTEMPT; a retried stage
    # appears multiple times under the same stageId.  Keep the
    # highest-attempt row (the one that completed the stage) instead of
    # letting whichever attempt the server listed last win, and note the
    # retry so totals() consumers know earlier attempts' work is excluded.
    seen_attempt: dict[int, int] = {}
    for s in stages:
        sid = s["stageId"]
        attempt = s.get("attemptId", 0)
        if sid in seen_attempt:
            out[sid]["retried"] = True
            if attempt <= seen_attempt[sid]:
                continue
        seen_attempt[sid] = attempt
        row = out.get(sid, {})
        row.update(
            name=s.get("name", "").split("\n")[0][:60],
            tasks=s.get("numCompleteTasks", 0),
        )
        for rest_name, short, divisor in _FIELDS:
            # .get: a field absent from a REST row (version drift, pruned
            # detail) degrades to 0 rather than aborting the whole read.
            v = s.get(rest_name, 0) / divisor
            row[short] = round(v, 3) if divisor > 1 else int(v)
        out[sid] = row
    return out


#: Additive fields safe to sum across stages.
SUMMABLE = (
    "run_ms",
    "cpu_ms",
    "gc_ms",
    "shuffle_write_mb",
    "shuffle_read_mb",
    "spill_mem_mb",
    "spill_disk_mb",
    "input_mb",
)


def totals(rows: dict[int, dict] | list[dict]) -> dict[str, float]:
    """Sum the additive fields over stage rows (peak memory is a max, not
    a sum, and is deliberately excluded)."""
    vals = rows.values() if isinstance(rows, dict) else rows
    vals = list(vals)
    return {m: round(sum(v[m] for v in vals), 3) for m in SUMMABLE}
