"""Differential-test helpers: DuckDB oracle + tolerant result comparison.

Comparison semantics replicate the reference's DataTableComparisonHelper
(/root/reference/tests/SQLRenderer.Test/DataTableComparisonHelper.cs:16-163):
unordered rows, column match by name with approximate type-equivalence
groups (int-family -> int64, float-family -> double), numeric comparison
with 1e-4 relative tolerance for floats, and null ~ '' for strings.
"""

from __future__ import annotations

import math

import pandas as pd


def arrow_df(spark, rows, ddl: str):
    """Test-fixture helper: build a DataFrame from python rows through
    pandas + Arrow so the scan stays JVM-resident. A plain-list
    ``createDataFrame`` produces a pickled Python RDD whose EVERY scan
    re-pays a Python-worker round trip — expensive for fixtures that
    iterative/chained plans re-scan many times (~4x per action, measured).
    The Arrow conf is scoped to the (eager) conversion so session
    ``toPandas()`` behavior is untouched. Falls back to the plain path for
    schemas this simple parser doesn't cover (nested commas) or on any
    conversion difference."""
    try:
        fields = [f.strip().rsplit(" ", 1) for f in ddl.split(",")]
        if rows and len(fields) != len(rows[0]):
            raise ValueError("comma inside a type — not field-separable")
        data = {}
        for i, (name, typ) in enumerate(fields):
            col = [r[i] for r in rows]
            dtype = (
                "Int64"
                if typ.lower() in ("long", "bigint", "int", "integer", "smallint")
                else "object"
            )
            data[name] = pd.array(col, dtype=dtype)
        key = "spark.sql.execution.arrow.pyspark.enabled"
        old = spark.conf.get(key, "false")
        spark.conf.set(key, "true")
        try:
            return spark.createDataFrame(pd.DataFrame(data), ddl)
        finally:
            spark.conf.set(key, old)
    except Exception:
        return spark.createDataFrame(rows, ddl)


def duckdb_connection(sf_dir: str):
    """A DuckDB connection with the driver's tables registered as views,
    mirroring the driver's oracle environment."""
    import duckdb

    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Map every column into its type-equivalence group representative."""
    out = {}
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_bool_dtype(s):
            out[col] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            t = pd.to_datetime(s)
            if getattr(t.dt, "tz", None) is not None:
                t = t.dt.tz_localize(None)
            out[col] = t.astype("datetime64[us]")
        else:
            # strings: null ~ '' (reference DataTableComparisonHelper.cs:53-65)
            out[col] = s.map(_canon_object)
    return pd.DataFrame(out)


def _canon_object(v) -> str:
    """Canonical string for object-typed cells. Sequences normalize
    through Python lists so Spark's lists and DuckDB's numpy arrays
    compare equal ('[0, 1]' vs '[0 1]' otherwise); numpy scalars unwrap.
    Array floats compare exactly (the tolerant path covers scalar
    columns only)."""
    import numpy as np

    if v is None or v is pd.NA:
        return ""
    if isinstance(v, np.ndarray):
        v = v.tolist()
    # structs: Spark's toPandas yields Row objects, DuckDB yields dicts —
    # canonicalize both to the same `{k: v, ...}` text (declared order)
    if hasattr(v, "asDict") and not isinstance(v, dict):
        v = v.asDict()
    if isinstance(v, dict):
        return (
            "{"
            + ", ".join(f"{k}: {_canon_object(x)}" for k, x in v.items())
            + "}"
        )
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_canon_object(x) for x in v) + "]"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return ""
    return str(v)


def assert_frames_match(
    actual: pd.DataFrame, expected: pd.DataFrame, rel_tol: float = 1e-4
) -> None:
    """Unordered, type-group, float-tolerant comparison. Raises AssertionError."""
    a_cols, e_cols = sorted(actual.columns), sorted(expected.columns)
    assert a_cols == e_cols, f"Column sets differ: {a_cols} vs {e_cols}"
    assert len(actual) == len(expected), (
        f"Row counts differ: {len(actual)} vs {len(expected)}"
    )
    a = _normalize(actual[a_cols].copy())
    e = _normalize(expected[e_cols].copy())

    # sort rows by all columns (floats rounded for a stable sort key)
    def sort_key(df: pd.DataFrame) -> pd.DataFrame:
        keyed = df.copy()
        for c in keyed.columns:
            if pd.api.types.is_float_dtype(keyed[c]):
                keyed[c] = keyed[c].round(6)
        return keyed.sort_values(by=list(keyed.columns), na_position="first").index

    a = a.loc[sort_key(a)].reset_index(drop=True)
    e = e.loc[sort_key(e)].reset_index(drop=True)

    for col in a.columns:
        av, ev = a[col], e[col]
        if pd.api.types.is_float_dtype(av) != pd.api.types.is_float_dtype(ev):
            # one engine typed the column float, the other object/Int64
            # (e.g. head([]) -> None vs NaN, or 2 vs 2.0). If the
            # non-float side is numeric-coercible, compare through the
            # TOLERANT float path; only non-numeric content falls back to
            # the canonical object form (null ~ '')
            obj = ev if pd.api.types.is_float_dtype(av) else av
            conv = pd.to_numeric(obj, errors="coerce")
            introduced = conv.isna() & obj.map(
                lambda v: not (
                    v is None
                    or v is pd.NA
                    or (isinstance(v, float) and math.isnan(v))
                )
            )
            if not introduced.any():
                av = pd.to_numeric(a[col], errors="coerce").astype("float64")
                ev = pd.to_numeric(e[col], errors="coerce").astype("float64")
            else:
                av, ev = av.map(_canon_object), ev.map(_canon_object)
        if pd.api.types.is_float_dtype(av):
            for i, (x, y) in enumerate(zip(av, ev)):
                x_nan = x is None or (isinstance(x, float) and math.isnan(x))
                y_nan = y is None or (isinstance(y, float) and math.isnan(y))
                if x_nan and y_nan:
                    continue
                assert not (x_nan or y_nan), f"{col}[{i}]: {x!r} vs {y!r}"
                assert math.isclose(x, y, rel_tol=rel_tol, abs_tol=1e-9), (
                    f"{col}[{i}]: {x!r} vs {y!r}"
                )
        else:
            same = av.equals(ev)
            if not same:
                diff = av.compare(ev) if len(av) == len(ev) else None
                raise AssertionError(f"Column '{col}' differs:\n{diff}")
