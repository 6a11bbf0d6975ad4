"""Schema-drift smoke tests (round-3 postmortem, VERDICT item 2).

Round 3 broke 4 components because the driver regenerated events.parquet
with TIMESTAMP(isAdjustedToUTC=false) (Spark 4: timestamp_ntz) and the
loader stopped normalizing. These tests catch that class of breakage
in-session:

1. ``load_events`` must yield a plain TIMESTAMP ``ts`` for every sf dir
   that exists (timestamp_ntz would break unix_micros / double casts /
   oracle schema comparison downstream).
2. An analysis-only pass over every catalog entry: ``df.schema`` forces
   Catalyst analysis without executing, so any entry that stops
   analyzing (bad cast, unresolved column, NTZ type mismatch) fails
   here in seconds instead of at the driver's correctness gate.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import TimestampType

from .conftest import SF_DIR

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
] or [SF_DIR]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_load_events_ts_is_plain_timestamp(spark, sf_dir):
    from opencyphertranspiler_spark.sources.tpch import load_events

    df = load_events(spark, sf_dir)
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"{sf_dir}: events.ts read as {df.schema['ts'].dataType}; "
        "load_events must normalize to TIMESTAMP (see _normalize_timestamps)"
    )


def test_all_base_tables_have_no_ntz_columns(spark):
    from opencyphertranspiler_spark.sources.tpch import tpch_table_registry

    reg = tpch_table_registry(spark, SF_DIR)
    for name in reg.names():
        ntz = [c for c, t in reg.get(name).dtypes if t == "timestamp_ntz"]
        assert not ntz, f"table {name}: NTZ columns leaked through: {ntz}"


def test_every_catalog_entry_analyzes(spark):
    """df.schema triggers full Catalyst analysis without running the job;
    a single sweep over all entries is the cheapest whole-surface gate."""
    from opencyphertranspiler_spark.catalog import CATALOG, run_entry

    failures = []
    for e in CATALOG:
        try:
            _ = run_entry(e, spark, SF_DIR).schema
        except Exception as exc:  # noqa: BLE001 - collect all, report once
            failures.append(f"{e.name}: {type(exc).__name__}: {exc}")
    assert not failures, "entries failed analysis:\n" + "\n".join(failures)
