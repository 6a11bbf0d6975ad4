"""Temporal function library (round-5 extension; the reference has no
temporal functions at all — SURVEY.md §2.4, Function.cs:120-348 stops at
string/cast functions). Differential against DuckDB on the sf0.001 orders
table plus typed-rejection checks."""

from __future__ import annotations

import pytest

from opencyphertranspiler_spark import TranspilerNotSupportedError


def test_accessors_vs_duckdb(engine, duck):
    got = {
        tuple(r)
        for r in engine.cypher(
            """
            MATCH (o:Orders) WHERE o.o_orderkey <= 100
            RETURN o.o_orderkey AS k, o.o_orderdate.year AS y,
                   o.o_orderdate.month AS m, o.o_orderdate.day AS d,
                   o.o_orderdate.quarter AS q, o.o_orderdate.week AS w,
                   o.o_orderdate.dayOfWeek AS dow,
                   o.o_orderdate.dayOfYear AS doy,
                   o.o_orderdate.epochMillis AS em
            """
        ).collect()
    }
    exp = {
        tuple(r)
        for r in duck.sql(
            """
            SELECT o_orderkey AS k, year(o_orderdate) AS y,
                   month(o_orderdate) AS m, day(o_orderdate) AS d,
                   quarter(o_orderdate) AS q, weekofyear(o_orderdate) AS w,
                   isodow(o_orderdate) AS dow, dayofyear(o_orderdate) AS doy,
                   epoch_ms(o_orderdate) AS em
            FROM orders WHERE o_orderkey <= 100
            """
        ).fetchall()
    }
    assert got == exp


def test_constructors_and_arithmetic_vs_duckdb(engine, duck):
    got = {
        tuple(map(str, r))
        for r in engine.cypher(
            """
            MATCH (o:Orders) WHERE o.o_orderkey <= 50
            RETURN o.o_orderkey AS k,
                   toString(date(o.o_orderdate)) AS d,
                   o.o_orderdate + duration({days: 2, hours: 3}) AS plus,
                   o.o_orderdate - duration({weeks: 1}) AS minus
            """
        ).collect()
    }
    exp = {
        tuple(map(str, r))
        for r in duck.sql(
            """
            SELECT o_orderkey AS k, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d,
                   o_orderdate + INTERVAL 2 DAY + INTERVAL 3 HOUR AS plus,
                   o_orderdate - INTERVAL 7 DAY AS minus
            FROM orders WHERE o_orderkey <= 50
            """
        ).fetchall()
    }
    assert got == exp


def test_datetime_string_parse_and_comparison(engine):
    rows = engine.cypher(
        """
        MATCH (o:Orders)
        WHERE o.o_orderdate = datetime('1995-01-01T00:00:00')
        RETURN count(*) AS n
        """
    ).collect()
    rows2 = engine.cypher(
        """
        MATCH (o:Orders)
        WHERE o.o_orderdate = datetime('1995-01-01 00:00:00')
        RETURN count(*) AS n
        """
    ).collect()
    assert rows[0].n == rows2[0].n  # 'T' and space forms parse alike


def test_accessor_through_with_value_alias(engine):
    # temporal accessor on a piped scalar (ValueRef property access)
    rows = engine.cypher(
        """
        MATCH (o:Orders) WITH o.o_orderdate AS d
        WHERE d.year = 1995 AND d.month = 3
        RETURN count(*) AS n, min(d.day) AS first_day
        """
    ).collect()
    assert rows[0].n > 0 and 1 <= rows[0].first_day <= 31


def test_timestamp_difference_yields_interval(engine, duck):
    row = engine.cypher(
        """
        MATCH (o:Orders)-[:CONTAINS]->(l:Lineitem)
        WHERE o.o_orderkey = 1
        RETURN min(l.l_shipdate - o.o_orderdate) AS lag
        """
    ).collect()[0]
    import datetime

    assert isinstance(row.lag, datetime.timedelta)
    exp = duck.sql(
        "SELECT min(l_shipdate - o_orderdate) FROM lineitem l "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey WHERE o.o_orderkey = 1"
    ).fetchone()[0]
    assert row.lag == exp


def test_year_month_durations_vs_duckdb(engine, duck):
    # month-or-coarser components compile to Spark's year-month interval;
    # calendar-aware addition (Jan 31 + 1 month = Feb 28) matches DuckDB
    got = {
        tuple(map(str, r))
        for r in engine.cypher(
            """
            MATCH (o:Orders) WHERE o.o_orderkey <= 50
            RETURN o.o_orderkey AS k,
                   date(o.o_orderdate) + duration({months: 1}) AS m1,
                   o.o_orderdate + duration({years: 1, months: 2}) AS ym,
                   date(o.o_orderdate) - duration({quarters: 1}) AS qm
            """
        ).collect()
    }
    exp = {
        tuple(map(str, r))
        for r in duck.sql(
            """
            SELECT o_orderkey AS k,
                   CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH
                        AS DATE) AS m1,
                   o_orderdate + INTERVAL 14 MONTH AS ym,
                   CAST(CAST(o_orderdate AS DATE) - INTERVAL 3 MONTH
                        AS DATE) AS qm
            FROM orders WHERE o_orderkey <= 50
            """
        ).fetchall()
    }
    assert got == exp


def test_duration_rejections(engine):
    # mixing the two interval families stays a typed error (Spark has no
    # single mixed-interval value)
    with pytest.raises(TranspilerNotSupportedError, match="cannot mix"):
        engine.cypher(
            "MATCH (o:Orders) "
            "RETURN o.o_orderdate + duration({months: 1, days: 2}) AS x"
        )
    with pytest.raises(TranspilerNotSupportedError, match="map literal"):
        engine.cypher("MATCH (o:Orders) RETURN duration(3) AS x")
    # non-additive temporal arithmetic keeps the reference's typed error
    with pytest.raises(TranspilerNotSupportedError, match="not supported"):
        engine.cypher("MATCH (o:Orders) RETURN o.o_orderdate * 2 AS x")
    with pytest.raises(TranspilerNotSupportedError, match="not supported"):
        engine.cypher(
            "MATCH (o:Orders) RETURN o.o_orderdate + o.o_orderdate AS x"
        )


def test_struct_field_access_still_works(engine):
    # the accessor path must not shadow struct fields: a piped map literal
    # with a member named `year` resolves by field, not F.year
    row = engine.cypher(
        """
        MATCH (o:Orders) WHERE o.o_orderkey = 1
        WITH {year: 1999, label: 'x'} AS m
        RETURN m.year AS y, m.label AS l
        """
    ).collect()[0]
    assert (row.y, row.l) == (1999, "x")


def test_bad_field_on_scalar_value(engine):
    # field access on a non-struct, non-temporal scalar rejects cleanly
    # at compile time (previously a plan-time binding error)
    from opencyphertranspiler_spark import TranspilerBindingError

    with pytest.raises(TranspilerBindingError, match="not accessible"):
        engine.cypher(
            "MATCH (c:Customer) WITH c.c_name AS n RETURN n.foo AS x"
        )


def test_truncate_and_duration_between_vs_duckdb(engine, duck):
    got = sorted(
        map(
            lambda r: tuple(map(str, r)),
            engine.cypher(
                """
                MATCH (o:Orders) WHERE o.o_orderkey <= 50
                RETURN o.o_orderkey AS k,
                       datetime.truncate('month', o.o_orderdate) AS m,
                       toString(date.truncate('week', o.o_orderdate)) AS w,
                       duration.between(datetime('1995-01-01'),
                                        o.o_orderdate) AS lag
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            lambda r: tuple(map(str, r)),
            duck.sql(
                """
                SELECT o_orderkey AS k,
                       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
                       CAST(CAST(date_trunc('week', o_orderdate) AS DATE)
                            AS VARCHAR) AS w,
                       o_orderdate - TIMESTAMP '1995-01-01' AS lag
                FROM orders WHERE o_orderkey <= 50
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_truncate_rejections(engine):
    with pytest.raises(TranspilerNotSupportedError, match="unit"):
        engine.cypher(
            "MATCH (o:Orders) RETURN datetime.truncate('fortnight', "
            "o.o_orderdate) AS x"
        )
    with pytest.raises(TranspilerNotSupportedError, match="literal unit"):
        engine.cypher(
            "MATCH (o:Orders) RETURN datetime.truncate(o.o_orderpriority, "
            "o.o_orderdate) AS x"
        )
