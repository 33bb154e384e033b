"""Property test: the suffix-automaton longest-common-substring used by
the substring tier equals a naive DP oracle on random inputs.

Pure Python (no Spark jobs), so hypothesis can afford many examples —
this is the trickiest hand-written algorithm in the engine and the one a
subtle clone/link bug would silently corrupt."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from duplicate_image_detector_spark.operators.substring import (
    py_longest_common_substring,
)


def naive_lcs(a: str, b: str) -> int:
    """O(|a|*|b|) DP oracle."""
    if not a or not b:
        return 0
    best = 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0] * (len(b) + 1)
        for j, cb in enumerate(b, 1):
            if ca == cb:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


small = st.text(alphabet="abc", max_size=60)  # tiny alphabet -> many repeats


@settings(max_examples=300, deadline=None)
@given(small, small)
def test_lcs_matches_naive_dp(a: str, b: str):
    assert py_longest_common_substring(a, b) == naive_lcs(a, b)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40), st.text(max_size=40))
def test_lcs_matches_naive_dp_unicode(a: str, b: str):
    assert py_longest_common_substring(a, b) == naive_lcs(a, b)


@given(st.text(alphabet="ab", min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_lcs_self_and_bounds(s: str):
    assert py_longest_common_substring(s, s) == len(s)
    assert py_longest_common_substring(s, "") == 0
    assert py_longest_common_substring("", s) == 0
