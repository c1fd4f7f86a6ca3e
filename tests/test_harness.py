"""Meta-tests for the correctness gate's hash: the comparator must be
order-insensitive (the driver sorts nothing) yet sensitive to value,
column, and row-count changes — a gate that can't fail is no gate."""

import pandas as pd

import sys
sys.path.insert(0, "tools")
from check_correctness import frame_hash, norm_cell  # noqa: E402


def test_hash_ignores_row_and_column_order():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = pd.DataFrame({"y": ["c", "a", "b"], "x": [3, 1, 2]})
    assert frame_hash(a) == frame_hash(b)


def test_hash_detects_value_change():
    a = pd.DataFrame({"x": [1, 2, 3]})
    b = pd.DataFrame({"x": [1, 2, 4]})
    assert frame_hash(a) != frame_hash(b)


def test_hash_detects_extra_row():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1, 2, 2]})
    assert frame_hash(a) != frame_hash(b)


def test_float_normalization_is_6_significant_digits():
    # the gate's tolerance: engines may differ below 6 sig. digits,
    # which is why every float output is ROUND()ed well above that
    assert norm_cell(1.0000000001) == norm_cell(1.0)
    assert norm_cell(1.00001) != norm_cell(1.00002)


def test_null_vs_value_differ():
    assert norm_cell(None) != norm_cell(0)
    assert norm_cell(float("nan")) != norm_cell(0.0)
