"""Spatial point()/distance() extension (the reference has no spatial
library; SURVEY.md §2.4 — Function.cs stops at string/cast functions).
Points are plain structs (x, y, crs); distance() is Euclidean for
cartesian pairs and spherical haversine (IUGG mean radius 6371008.8 m)
for geographic pairs. Differential against the same formulas in DuckDB.
"""

from __future__ import annotations

import pytest

from opencyphertranspiler_spark import (
    TranspilerBindingError,
    TranspilerNotSupportedError,
)


def test_cartesian_distance_vs_duckdb(engine, duck):
    got = {
        (r.k, round(r.d, 6))
        for r in engine.cypher(
            """
            MATCH (c:Customer) WHERE c.c_custkey <= 100
            RETURN c.c_custkey AS k,
                   distance(point({x: c.c_acctbal, y: c.c_custkey * 1.0}),
                            point({x: 0.0, y: 0.0})) AS d
            """
        ).collect()
    }
    exp = {
        (r[0], round(r[1], 6))
        for r in duck.sql(
            """
            SELECT c_custkey AS k,
                   sqrt(c_acctbal * c_acctbal
                        + c_custkey * c_custkey) AS d
            FROM customer WHERE c_custkey <= 100
            """
        ).fetchall()
    }
    assert got == exp


def test_geographic_distance_vs_duckdb(engine, duck):
    # haversine with the identical constant on both sides; coordinates
    # derived from table columns so the differential is non-trivial
    got = {
        r.k: r.d
        for r in engine.cypher(
            """
            MATCH (c:Customer) WHERE c.c_custkey <= 100
            RETURN c.c_custkey AS k,
                   distance(point({latitude: c.c_custkey % 80 * 1.0,
                                   longitude: c.c_acctbal % 180}),
                            point({latitude: 48.85, longitude: 2.35})) AS d
            """
        ).collect()
    }
    exp = {
        r[0]: r[1]
        for r in duck.sql(
            """
            SELECT c_custkey AS k,
                   2 * 6371008.8 * asin(sqrt(
                       sin(radians(48.85 - c_custkey % 80) / 2) ^ 2
                       + cos(radians(c_custkey % 80)) * cos(radians(48.85))
                         * sin(radians(2.35 - (c_acctbal % 180)) / 2) ^ 2
                   )) AS d
            FROM customer WHERE c_custkey <= 100
            """
        ).fetchall()
    }
    assert set(got) == set(exp)
    # same formula, different FP evaluation order (radians(a-b) vs
    # radians(a)-radians(b)) -> compare with relative tolerance
    assert all(got[k] == pytest.approx(exp[k], rel=1e-9) for k in exp)


def test_point_accessors(engine):
    rows = engine.cypher(
        """
        WITH point({latitude: 48.85, longitude: 2.35}) AS p,
             point({x: 3.0, y: 4.0}) AS q
        RETURN p.latitude AS lat, p.longitude AS lon, p.x AS px,
               p.crs AS pcrs, q.x AS qx, q.y AS qy, q.crs AS qcrs
        """
    ).collect()
    r = rows[0]
    assert (r.lat, r.lon, r.px, r.pcrs) == (48.85, 2.35, 2.35, "wgs-84")
    assert (r.qx, r.qy, r.qcrs) == (3.0, 4.0, "cartesian")


def test_mixed_crs_distance_is_null(engine):
    rows = engine.cypher(
        """
        RETURN distance(point({x: 1.0, y: 2.0}),
                        point({latitude: 1.0, longitude: 2.0})) AS d
        """
    ).collect()
    assert rows[0].d is None


def test_point_rejections(engine):
    with pytest.raises(TranspilerNotSupportedError, match="keys"):
        engine.cypher("RETURN point({x: 1.0}) AS p")
    with pytest.raises(TranspilerNotSupportedError, match="keys"):
        engine.cypher(
            "RETURN point({x: 1.0, y: 2.0, latitude: 3.0}) AS p"
        )
    with pytest.raises(TranspilerNotSupportedError, match="map literal"):
        engine.cypher("RETURN point(1) AS p")
    with pytest.raises(TranspilerBindingError, match="two point"):
        engine.cypher("RETURN distance(point({x: 1.0, y: 2.0})) AS d")


# ---------------------------------------------------------------------------
# round 6: 3D points
# ---------------------------------------------------------------------------


def test_point_3d_cartesian_distance_vs_duckdb(engine, duck):
    got = engine.cypher(
        """
        MATCH (r:Region)
        RETURN r.r_regionkey AS k,
               round(distance(
                   point({x: toFloat(r.r_regionkey), y: 2.0, z: 1.0}),
                   point({x: 0.0, y: 0.0, z: 5.0})), 6) AS d
        """
    ).collect()
    exp = dict(
        duck.sql(
            """
            SELECT r_regionkey AS k,
                   round(sqrt(r_regionkey * r_regionkey + 4.0 + 16.0), 6) AS d
            FROM region
            """
        ).fetchall()
    )
    assert {r["k"]: r["d"] for r in got} == exp and exp


def test_point_3d_accessors_and_crs(engine):
    row = engine.cypher(
        """
        RETURN point({x: 1.0, y: 2.0, z: 3.0}).z AS z,
               point({x: 1.0, y: 2.0, z: 3.0}).crs AS crs,
               point({latitude: 48.0, longitude: 2.0, height: 100.0}).height
                   AS h,
               point({latitude: 48.0, longitude: 2.0, height: 100.0}).crs
                   AS gcrs,
               point({x: 1.0, y: 2.0}).z AS z2
        """
    ).collect()[0]
    assert row["z"] == 3.0 and row["crs"] == "cartesian-3d"
    assert row["h"] == 100.0 and row["gcrs"] == "wgs-84-3d"
    assert row["z2"] is None


def test_point_3d_geographic_distance_adds_height(engine):
    rows = engine.cypher(
        """
        RETURN distance(point({latitude: 48.0, longitude: 2.0}),
                        point({latitude: 48.0, longitude: 2.0})) AS flat,
               distance(point({latitude: 48.0, longitude: 2.0, height: 0.0}),
                        point({latitude: 48.0, longitude: 2.0, height: 30.0}))
                   AS up,
               distance(point({x: 1.0, y: 1.0}),
                        point({x: 1.0, y: 1.0, z: 1.0})) AS mixed
        """
    ).collect()[0]
    assert rows["flat"] == 0.0
    assert abs(rows["up"] - 30.0) < 1e-9  # pure height delta
    assert rows["mixed"] is None  # 2D vs 3D CRS mismatch -> null


def test_dynamic_access_arithmetic_guard(engine):
    # Customer's schema mixes string and numeric property types, so a
    # computed-key access string-renders — arithmetic on it is a typed
    # error (ADVICE r5 nit #1), not a silent concat
    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    with pytest.raises(TranspilerNotSupportedError, match="arithmetic"):
        engine.cypher(
            "MATCH (c:Customer) WITH c, 'c_acctbal' AS k "
            "RETURN c[k] + 1 AS x"
        )
    # comparison / concat-free use still works
    df = engine.cypher(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 "
        "WITH c, 'c_name' AS k RETURN c[k] AS v"
    )
    assert df.collect()[0]["v"] == "Customer#000000001"
