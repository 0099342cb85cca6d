"""Definition-level tests of the replay harness itself (VERDICT r11
item #6): a bug in compare_frames silently weakens every local oracle
replay, so its contract -- exact, order-insensitive, representation-
robust value comparison -- gets its own regression pins."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.oracle_utils import canonical_rows, compare_frames


def test_long_arrays_compare_elementwise_not_by_truncated_str():
    """str() of a >1000-element ndarray truncates with '...'; two
    different arrays share that string. The harness must diff them
    element-wise (the silent-false-PASS class)."""
    a = np.arange(2000.0)
    b = a.copy()
    b[1000] = -1.0
    assert str(a) == str(b)  # the trap this test exists for
    probs = compare_frames(
        pd.DataFrame({"v": [a]}), pd.DataFrame({"v": [b]})
    )
    assert probs, "differing long arrays compared equal"


def test_numpy_bool_and_python_bool_canonicalize_identically():
    """np.bool_ is not a bool subclass; both representations of the
    same truth value must canonicalize to the same token."""
    probs = compare_frames(
        pd.DataFrame({"f": pd.Series([True, False], dtype=object)}),
        pd.DataFrame({"f": np.array([True, False])}),
    )
    assert probs == []
    assert canonical_rows(pd.DataFrame({"f": np.array([True])})) == [("true",)]


def test_nested_arrays_and_order_insensitivity():
    """Element-wise canonicalization recurses through nested sequences,
    and row order never matters."""
    probs = compare_frames(
        pd.DataFrame({"v": [np.array([1.0, 2.0]), np.array([3.0])]}),
        pd.DataFrame({"v": [[3.0], [1.0, 2.0]]}),
    )
    assert probs == []


def test_mismatches_still_reported():
    """The robustness fixes must not loosen the compare: scalar value
    drift, row-count drift, and column drift all still report."""
    base = pd.DataFrame({"a": [1, 2]})
    assert compare_frames(base, pd.DataFrame({"a": [1, 3]}))
    assert compare_frames(base, pd.DataFrame({"a": [1]}))
    assert compare_frames(base, pd.DataFrame({"b": [1, 2]}))
