"""polygon_grid_weights / areal_interpolate vs closed-form areas."""

from __future__ import annotations

from pyspark.sql import functions as F

from wayproblems_spark.operators.areal import (
    areal_interpolate,
    polygon_grid_weights,
)

from tests.test_overlay import _poly_df, _square


def _ring(pts):
    return [(float(x), float(y)) for x, y in pts]


def _collect(df):
    return {
        (r["poly_id"], r["cell_x"], r["cell_y"]): (r["area"], r["frac"])
        for r in df.collect()
    }


def test_rect_triangle_concave_exact(spark):
    polys = [
        # rect [0.5, 2.5] x [10.25, 11.25]: straddles cells in both axes
        (1, _ring([(0.5, 10.25), (2.5, 10.25), (2.5, 11.25), (0.5, 11.25), (0.5, 10.25)])),
        # right triangle (20,0)-(22,0)-(20,2), area 2
        (2, _ring([(20.0, 0.0), (22.0, 0.0), (20.0, 2.0), (20.0, 0.0)])),
        # concave L: [40,42]^2 minus its NE quadrant, area 3, CW orientation
        (3, _ring([(40.0, 0.0), (40.0, 2.0), (41.0, 2.0), (41.0, 1.0),
                   (42.0, 1.0), (42.0, 0.0), (40.0, 0.0)])),
    ]
    got = _collect(polygon_grid_weights(spark, _poly_df(spark, polys), pitch=1.0))

    # rect: 2 wide x 2 tall cells; widths 0.5/1.0/0.5, heights 0.75/0.25
    exp_rect = {
        (0, 10): 0.5 * 0.75, (1, 10): 1.0 * 0.75, (2, 10): 0.5 * 0.75,
        (0, 11): 0.5 * 0.25, (1, 11): 1.0 * 0.25, (2, 11): 0.5 * 0.25,
    }
    for (cx, cy), a in exp_rect.items():
        area, frac = got[(1, cx, cy)]
        assert area == a and frac == a / 2.0, (cx, cy)

    # triangle: unit cell fully inside the hypotenuse cut, two halves
    assert got[(2, 20, 0)] == (1.0, 0.5)
    assert got[(2, 21, 0)][0] == 0.5 and got[(2, 20, 1)][0] == 0.5
    assert (2, 21, 1) not in got  # hypotenuse corner cell: zero area

    # L-shape (CW ring: abs() orientation handling): three full cells
    assert got[(3, 40, 0)] == (1.0, 1.0 / 3.0)
    assert got[(3, 41, 0)][0] == 1.0 and got[(3, 40, 1)][0] == 1.0
    assert (3, 41, 1) not in got

    # per-polygon fracs sum to 1
    for pid in (1, 2, 3):
        assert abs(sum(f for (p, _, _), (_, f) in got.items() if p == pid) - 1.0) < 1e-12


def test_donut_and_min_frac(spark):
    outer = _square(1.5, 1.5, 1.5)      # [0,3]^2
    hole = _square(1.5, 1.5, 0.5)       # [1,2]^2
    df = _poly_df(spark, [(1, outer)], {1: [hole]})

    whole = _collect(polygon_grid_weights(spark, df, pitch=4.0))
    assert whole == {(1, 0, 0): (8.0, 1.0)}

    cells = _collect(polygon_grid_weights(spark, df, pitch=1.0))
    assert (1, 1, 1) not in cells       # the hole cell vanishes
    assert len(cells) == 8 and all(v == (1.0, 0.125) for v in cells.values())

    capped = _collect(polygon_grid_weights(spark, df, pitch=1.0, min_frac=0.2))
    assert capped == {}                 # every cell is 1/8 < 0.2


def test_areal_interpolate(spark):
    polys = [
        (1, _ring([(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (0.0, 1.0), (0.0, 0.0)])),
        (2, _ring([(1.0, 0.0), (3.0, 0.0), (3.0, 1.0), (1.0, 1.0), (1.0, 0.0)])),
    ]
    w = polygon_grid_weights(spark, _poly_df(spark, polys), pitch=1.0)
    vals = spark.createDataFrame([(1, 10.0), (2, 40.0)], "poly_id long, value double")
    out = {
        (r["cell_x"], r["cell_y"]): r["value"]
        for r in areal_interpolate(w, vals).collect()
    }
    # poly 1 spreads 5/5 over cells 0,1; poly 2 spreads 20/20 over 1,2
    assert out == {(0, 0): 5.0, (1, 0): 25.0, (2, 0): 20.0}


def test_areal_antimeridian(spark):
    """A wrap rect (raw lons 179 / -179) clips in the shifted frame and
    its cells map back to the global graticule: lon columns 179 and
    -180, one unit cell each; a non-divisible pitch raises."""
    import pytest

    wrap = [(1, _ring([(179.0, 0.0), (-179.0, 0.0), (-179.0, 1.0),
                       (179.0, 1.0), (179.0, 0.0)]))]
    df = _poly_df(spark, wrap)
    got = _collect(polygon_grid_weights(spark, df, pitch=1.0))
    assert got == {
        (1, 179, 0): (1.0, 0.5),
        (1, -180, 0): (1.0, 0.5),
    }
    with pytest.raises(Exception, match="360 % pitch"):
        polygon_grid_weights(spark, df, pitch=0.7).collect()
