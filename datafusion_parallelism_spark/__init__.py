"""datafusion_parallelism_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``jamesfer/datafusion-parallelism`` (a DataFusion research extension that adds
a shared-state parallel hash join + work-stealing repartition; see SURVEY.md).

Design stance (Spark-first, not a port):

* The reference's *capability envelope* — analytical SQL over Parquet,
  all eight hash-join types, statistics-driven join planning, subquery
  decorrelation, TPC-H-class aggregation/sort/limit — is expressed through
  the DataFrame/SQL API and optimized by Catalyst + Tungsten + AQE.
* The reference's *research contribution* — 10 concurrent build-side hash-map
  designs (reference ``src/operator/version*/``) and a work-stealing
  repartition operator (``src/operator/work_stealing_repartition_exec.rs:129``)
  — exists to scale a single-process engine across cores.  Spark's
  architecture already owns that layer: ShuffledHashJoin builds per-task hash
  relations, AQE splits skewed partitions
  (``spark.sql.adaptive.skewJoin.enabled``), and the scheduler load-balances
  tasks.  We configure these rather than reimplement them; see
  ``session.py`` and ``plans/`` for the plan-shaping knobs.
* Beyond the reference surface, the package adds LLM-data-pipeline operators
  (dedup, similarity search, multimodal columns, text analysis) engineered
  for 100 TB scale.
"""

__version__ = "0.1.0"

from .session import get_spark, register_tables, TABLE_NAMES

__all__ = ["get_spark", "register_tables", "TABLE_NAMES", "__version__"]
