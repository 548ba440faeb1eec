"""Winnowing fingerprint dedup: the shared-span guarantee, concretely.

Schleimer et al. (SIGMOD 2003) theorem: with k-gram hashes and window w,
any substring shared verbatim by two documents with length >= k + w - 1
selects at least one identical fingerprint in both — regardless of where
the span sits in either document (selection is content-local).  These
tests construct adversarial alignments (span at head/middle/tail, docs of
different lengths, random filler) and assert detection; and assert the
converse sanity that disjoint-alphabet documents share nothing.
"""

import random
import string

import pytest

from datafusion_parallelism_spark.queries.llm import (
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
)

GUARANTEE_LEN = WINNOW_K + WINNOW_W - 1  # 34 chars


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _shared(spark, texts):
    fp = winnow_fingerprints(_docs_df(spark, texts))
    rows = fp.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.h)
    return by_doc


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("placement", ["head", "middle", "tail"])
def test_guaranteed_span_always_detected(spark, seed, placement):
    rng = random.Random(seed)
    span = "".join(rng.choice(string.ascii_lowercase) for _ in range(GUARANTEE_LEN))

    def filler(n):
        return "".join(rng.choice(string.ascii_uppercase) for _ in range(n))

    if placement == "head":
        a, b = span + filler(80), filler(200) + span
    elif placement == "middle":
        a, b = filler(37) + span + filler(61), filler(113) + span + filler(11)
    else:
        a, b = filler(150) + span, span + filler(45)

    by_doc = _shared(spark, [a, b])
    assert by_doc[0] & by_doc[1], (
        f"span of guarantee length {GUARANTEE_LEN} at {placement} missed"
    )


def test_disjoint_alphabets_share_nothing(spark):
    rng = random.Random(7)
    a = "".join(rng.choice(string.ascii_lowercase) for _ in range(300))
    b = "".join(rng.choice(string.digits) for _ in range(300))
    by_doc = _shared(spark, [a, b])
    assert not (by_doc[0] & by_doc[1])


def test_fingerprint_density_near_two_over_w_plus_one(spark):
    """Expected winnowing density is 2/(w+1) of gram positions (paper §4);
    allow a generous band to keep the test noise-proof."""
    rng = random.Random(3)
    text = "".join(rng.choice(string.ascii_lowercase) for _ in range(2000))
    by_doc = _shared(spark, [text])
    n_positions = len(text) - WINNOW_K + 1
    density = len(by_doc[0]) / n_positions
    expected = 2 / (WINNOW_W + 1)
    assert 0.5 * expected < density < 2.0 * expected
