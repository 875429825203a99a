"""tx12 heavy hitters: the Misra-Gries kernel's superset guarantee on
adversarial streams, and the end-to-end exactness of the two-pass
sketch-then-verify plan."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_project_spark.operators.text import (
    HH_K,
    misra_gries_kernel,
    tx12_heavy_hitters,
)


@given(
    st.lists(st.integers(min_value=0, max_value=40), max_size=600),
    st.integers(min_value=2, max_value=30),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_superset_guarantee(xs, k):
    """Every item with frequency >= n/k survives the k-counter sketch
    (the MG guarantee the distributed candidate union relies on)."""
    stream = [str(x) for x in xs]
    kept = set(misra_gries_kernel(stream, k))
    n = len(stream)
    for w, c in Counter(stream).items():
        if c * k >= n and c > 0:
            assert w in kept, (w, c, n, k)


def test_heavy_hitters_exact_end_to_end(spark, sf_dir):
    """tx12's output equals the exact brute-force heavy-hitter set with
    exact counts (the sketch only prunes; the recount restores
    exactness)."""
    got = {
        (r["w"], r["cnt"])
        for r in tx12_heavy_hitters(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = Counter(
        w for d in docs for w in d["text"].lower().split(" ")
    )
    n = sum(counts.values())
    expect = {
        (w, c) for w, c in counts.items() if c * HH_K >= n
    }
    assert got == expect and got, f"{len(got)} vs {len(expect)}"
