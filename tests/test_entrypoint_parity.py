"""DataFrame-vs-SQL entry-point parity.

The reference runs every query through BOTH entry points: ``parse_sql``
(src/parse_sql.rs:73-76) and the DataFrame-flavored harness; its test
matrix asserts both yield the same rows.  The repo splits its corpus
roughly half/half between the two APIs (queries/tpch.py:15-18), so this
test closes the loop for representative DataFrame-flavor queries: the
registered DataFrame formulation and the SAME semantics expressed as SQL
(the oracle text, which Spark's parser also accepts) must produce
hash-identical results through Catalyst.  Catches analysis/optimizer drift
between the two APIs — e.g. a DataFrame join whose key resolution diverges
from the SQL binder's.
"""

import pytest

from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.session import register_tables
from datafusion_parallelism_spark.testing import _canon_rows

#: DataFrame-flavor queries whose oracle SQL is also valid Spark SQL:
#: scan-agg (q1), top-k join (q3), 5-way broadcast join (q5),
#: IN-subquery-on-HAVING semi join (q18).
PARITY = ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q18"]


@pytest.mark.parametrize("name", PARITY)
def test_dataframe_and_sql_entry_points_agree(spark, sf_dir_oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir_oracle)
    register_tables(spark, sf_dir_oracle)
    sql_df = spark.sql(spec.oracle)
    assert sorted(df.columns) == sorted(sql_df.columns)
    a = _canon_rows(list(df.columns), [tuple(r) for r in df.collect()])
    b = _canon_rows(list(sql_df.columns), [tuple(r) for r in sql_df.collect()])
    assert len(a) == len(b), f"{name}: row count {len(a)} (DF) vs {len(b)} (SQL)"
    assert a == b, f"{name}: DataFrame and spark.sql results differ"
