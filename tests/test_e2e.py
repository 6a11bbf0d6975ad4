"""End-to-end differential tests: every catalog query vs the DuckDB oracle
(SURVEY.md §5.3 comparison semantics) at sf0.001."""

from __future__ import annotations

import pytest

from opencyphertranspiler_spark.catalog import CATALOG, run_entry
from opencyphertranspiler_spark.testing import assert_frames_match

from .conftest import SF_DIR

ORACLED = [e for e in CATALOG if e.oracle is not None]
ROWS_ONLY = [e for e in CATALOG if e.oracle is None]


@pytest.mark.parametrize("entry", ORACLED, ids=[e.name for e in ORACLED])
def test_catalog_vs_duckdb(entry, spark, duck):
    actual = run_entry(entry, spark, SF_DIR).toPandas()
    expected = duck.sql(entry.oracle).df()
    assert_frames_match(actual, expected)


def test_every_catalog_entry_has_an_oracle():
    # every entry carries a full DuckDB oracle so the driver's gate checks
    # rows+schema+hash, never the weaker rows-only form; keep it that way
    # (a genuinely non-SQL-expressible op would relax this deliberately)
    assert ROWS_ONLY == []


def test_catalog_fits_driver_gate():
    # the driver records at most 50 entries per round (observed in round 1:
    # 52 in the catalog -> the last 2 got no CORRECTNESS row). Keep exactly
    # <= 50 so every operator gets a gate verdict; merge entries rather
    # than append past the cap.
    assert len(CATALOG) <= 50
