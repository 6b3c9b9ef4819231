"""Property-based tests (hypothesis) for the pure-numpy S2 encoders —
no Spark session needed; invariants hold for arbitrary coordinates."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from wayproblems_spark.operators.cells import (
    MAX_LEVEL,
    cell_level,
    cell_to_center_latlon,
    faceij_to_id,
    id_to_faceij,
    latlon_to_cell,
    latlon_to_grid,
)

lat_s = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)
lon_s = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
level_s = st.integers(min_value=1, max_value=MAX_LEVEL)


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, level_s)
def test_cell_roundtrip_and_level(lat, lon, level):
    c = latlon_to_cell(np.array([lat]), np.array([lon]), level)
    assert cell_level(c)[0] == level
    # center of the cell re-encodes to the same cell
    clat, clon = cell_to_center_latlon(c)
    c2 = latlon_to_cell(clat, clon, level)
    assert c2[0] == c[0]


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, st.integers(min_value=2, max_value=MAX_LEVEL))
def test_parent_contains_child(lat, lon, level):
    child = latlon_to_cell(np.array([lat]), np.array([lon]), level)
    parent = latlon_to_cell(np.array([lat]), np.array([lon]), level - 1)
    # S2 parent id = child id with trailing bits snapped at the parent lsb
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - (level - 1)))
    snapped = (child.astype(np.uint64) & (~lsb + np.uint64(1))) | lsb
    assert snapped[0] == parent.astype(np.uint64)[0]


@settings(max_examples=100, deadline=None)
@given(lat_s, lon_s)
def test_faceij_bijection(lat, lon):
    leaf = latlon_to_cell(np.array([lat]), np.array([lon]), MAX_LEVEL)
    f, i, j, _ = id_to_faceij(leaf)
    assert faceij_to_id(f, i, j, MAX_LEVEL)[0] == leaf[0]


@settings(max_examples=100, deadline=None)
@given(lat_s, lon_s, st.integers(min_value=1, max_value=28))
def test_grid_and_cell_agree_on_equality(lat, lon, level):
    """Two encodings of the same point at the same level must agree with
    themselves under perturbation smaller than float epsilon — and the
    grid id must embed face/i/j consistent with the S2 id's."""
    g = latlon_to_grid(np.array([lat]), np.array([lon]), level)[0]
    f, i, j, _ = id_to_faceij(latlon_to_cell(np.array([lat]), np.array([lon]), MAX_LEVEL))
    gi = int(i[0]) >> (MAX_LEVEL - level)
    gj = int(j[0]) >> (MAX_LEVEL - level)
    assert g == (int(f[0]) << 58) | (gi << 29) | gj
