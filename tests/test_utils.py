"""Utils-module parity: reference latentblending/utils.py:181-262."""
import re

import numpy as np
import pytest

from latentblending_tpu.utils import (
    compare_dicts,
    get_spacing,
    get_time,
    json_load,
    json_save,
    yml_load,
    yml_save,
)


def test_get_spacing_linear_below_threshold():
    np.testing.assert_allclose(get_spacing(5, 1.0), np.linspace(0, 1, 5))
    np.testing.assert_allclose(get_spacing(4, 1.69), np.linspace(0, 1, 4))


@pytest.mark.parametrize("n", [4, 5, 8, 9])
@pytest.mark.parametrize("scaling", [1.7, 2.0, 3.5])
def test_get_spacing_matches_reference_formula(n, scaling):
    """Hand-derived from the reference (utils.py:181-200): symmetric around
    0.5, endpoints at 0 and 1, denser near the middle, n points."""
    got = get_spacing(n, scaling)
    assert len(got) == n
    assert got[0] == 0.0 and got[-1] == 1.0
    np.testing.assert_allclose(got + got[::-1], np.ones(n), atol=1e-12)  # symmetry
    assert np.all(np.diff(got) > 0)
    # density: the middle gap is smaller than the edge gap for scaling > 1.7
    gaps = np.diff(got)
    assert gaps[len(gaps) // 2] < gaps[0]
    # exact value spot-check against the reference's closed form
    per_side = n // 2 + 1
    left = np.abs(np.linspace(1, 0, per_side) ** scaling / 2 - 0.5)
    if n % 2 != 0:
        expect = np.hstack([left, 1 - left[::-1][1:]])
    else:
        expect = np.hstack([left[:-1], 1 - left[:-1][::-1]])
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_get_time_formats():
    assert re.fullmatch(r"\d{6}", get_time("day"))
    assert re.fullmatch(r"\d{6}_\d{4}", get_time("minute"))
    assert re.fullmatch(r"\d{6}_\d{6}", get_time())  # default: second
    assert re.fullmatch(r"\d{6}_\d{6}_\d{3}", get_time("millisecond"))
    with pytest.raises(ValueError):
        get_time("nanosecond")


def test_yml_and_json_roundtrip(tmp_path):
    d = {"a": 1, "nested": {"b": [1, 2, 3]}, "s": "x"}
    fy = str(tmp_path / "t.yml")
    yml_save(fy, d)
    assert yml_load(fy) == d
    fj = str(tmp_path / "t.json")
    json_save(fj, d)
    assert json_load(fj) == d


def test_compare_dicts_reference_semantics():
    """reference utils.py:224 — shared keys with differing values, stacked."""
    assert compare_dicts({"bobo": 4}, {"bobo": 5}) == {"bobo": [4, 5]}
    assert compare_dicts({"a": 1, "b": 2}, {"b": 2, "c": 3}) == {}
    assert compare_dicts({}, {"x": 1}) == {}
