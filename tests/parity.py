"""Local replica of the driver's Spark-vs-DuckDB oracle comparison:
row-count + column names + order-insensitive canonical value multiset.
Stricter than a hash — on mismatch it shows the first differing rows.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import numpy as np
import pandas as pd


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        # 12 significant digits: tolerant of cross-engine last-ulp noise,
        # strict enough to catch real value bugs. Integral floats keep a
        # ".0" marker so a float column never canonicalizes equal to an
        # int column — the DRIVER's hasher distinguishes 1.0 from 1, and a
        # local fold of the two let an oracle-typing bug (DuckDB HUGEINT →
        # float64 vs Spark bigint) slip through round 2's gate.
        s = f"{f:.12g}"
        if "." not in s and "e" not in s and "n" not in s:  # inf stays 'inf'
            s += ".0"
        return s
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if pd.isna(v):
        return "NULL"
    return str(v)


def canon_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def assert_parity(spark_df, duck_con, oracle_sql: str, name: str = "query") -> None:
    # The DRIVER's harness canonicalizes with pandas sort_values, which
    # raises on container cells (unhashable list/dict). Any oracled query
    # must project arrays/structs/maps to scalars (concat_ws / to_json /
    # element_at) — fail fast locally instead of shipping a broken gate.
    bad = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.typeName() in ("array", "struct", "map")
    ]
    assert not bad, (
        f"{name}: oracled query returns container-typed column(s) {bad}; the "
        "driver gate cannot hash these — project to scalar forms"
    )
    # Raw DECIMAL outputs canonicalize as scale-padded strings from Spark
    # ('7097.200000') but come out of DuckDB's fetchdf as float64
    # ('7097.2') — a guaranteed hash mismatch as soon as rows exist (and
    # invisible while a query returns 0 rows at the gate SF). The repo
    # discipline is sum/avg in exact decimal, then surface as double.
    dec = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.typeName() == "decimal"
    ]
    assert not dec, (
        f"{name}: oracled query returns decimal-typed column(s) {dec}; "
        "cast to double before returning"
    )
    got = spark_df.toPandas()
    want = duck_con.execute(oracle_sql).fetchdf()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch\n spark: {sorted(got.columns)}\n duck:  {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"

    g, w = canon_rows(got), canon_rows(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        # hoisted sets: building set(w) INSIDE the comprehension re-hashed
        # the full multiset once per row — O(n²), a 25-minute hang on a
        # 151k-row mismatch (found by the round-6 sf0.1 sweep)
        w_set, g_set = set(w), set(g)
        only_g = [r for r in g if r not in w_set][:3]
        only_w = [r for r in w if r not in g_set][:3]
        raise AssertionError(
            f"{name}: value mismatch (cols sorted: {sorted(got.columns)})\n"
            f"first pairwise diffs: {diffs}\n"
            f"spark-only rows: {only_g}\nduck-only rows: {only_w}"
        )
