"""Smoke tests for scripts/sweep.py — the committed hardening-sweep
harness (README "Hardening sweeps"). The sweeps themselves are run
manually after plans/ changes; these tests only pin that the harness
stays importable, enumerates every sweep class, and that its
canonicalization survives the cell types the registry actually emits
(the r8 ADVICE found array-valued cells raised inside pd.isna)."""

from __future__ import annotations

import importlib.util
import math
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def sweep():
    spec = importlib.util.spec_from_file_location(
        "sweep", REPO_ROOT / "scripts" / "sweep.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["sweep"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_sweep_harness_enumerates_all_sweep_classes(sweep):
    expected = {
        "empty", "nulls", "multibyte", "bigid",
        "negative", "future_ts", "blank", "naninf", "skew",
    }
    assert expected <= set(sweep.SWEEPS)
    for name, (mutate, scope, streaming) in sweep.SWEEPS.items():
        assert callable(mutate), name
        assert scope is None or callable(scope), name
        assert isinstance(streaming, bool), name


def test_canon_cell_handles_every_registry_cell_type(sweep):
    c = sweep.canon_cell
    assert c(None) == "NULL"
    assert c(float("nan")) == "NULL"
    assert c(True) == "true"
    assert c(b"\x00\xff") == "00ff"
    assert c(1.23456789012) == c(1.234567890)  # 9-decimal canonicalization
    # array-valued cells (Spark array columns / DuckDB list()): must
    # canonicalize element-wise, not raise inside pd.isna
    assert c([1.0, None, 2.0]) == "[1.0,NULL,2.0]"
    assert c(np.array([1.0, math.nan])) == "[1.0,NULL]"
    assert c((1, 2)) == "[1,2]"


def test_canonical_rows_on_array_column_frames(sweep):
    df = pd.DataFrame({"k": [1, 2], "v": [np.array([1.0, 2.0]), np.array([3.0])]})
    rows = sweep.canonical_rows(df)
    assert rows == [("1", "[1.0,2.0]"), ("2", "[3.0]")]
