"""Property-based equivalence: salted_join ≡ plain equi join.

The salting transform (operators/skew.py) must be a pure physical rewrite
— identical multiset of output rows for ANY input, including NULL keys
(which never match in either formulation), duplicate keys on both sides
(cross-product fan-out), keys present on only one side, and left-outer
null-padding.  Hypothesis drives the row-level edge lattice; multisets are
compared so join-order differences cannot mask or fake a pass.
"""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_parallelism_spark.operators.skew import salted_join

keys = st.one_of(st.none(), st.integers(0, 3))
big_rows = st.lists(st.tuples(keys, st.integers(0, 9)), min_size=0, max_size=10)
small_rows = st.lists(st.tuples(keys, st.integers(0, 9)), min_size=0, max_size=6)


@pytest.mark.parametrize("how", ["inner", "left"])
@given(brows=big_rows, srows=small_rows, n_salts=st.sampled_from([1, 3, 8]))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_salted_join_equals_plain_join(spark, how, brows, srows, n_salts):
    big = spark.createDataFrame(brows, schema="k long, bv long") if brows else \
        spark.createDataFrame([], schema="k long, bv long")
    small = spark.createDataFrame(srows, schema="sk long, sv long") if srows else \
        spark.createDataFrame([], schema="sk long, sv long")

    salted = salted_join(big, small, [("k", "sk")], n_salts=n_salts, how=how)
    plain = big.join(small, big["k"] == small["sk"], how).select(
        big["k"], big["bv"], small["sk"], small["sv"]
    )
    a = Counter(tuple(r) for r in salted.collect())
    b = Counter(tuple(r) for r in plain.collect())
    assert a == b
