"""Driver-canonicalizability gate over the whole query registry.

The round-7 driver flagged two queries as ``err`` because they returned
array-typed columns: the driver's correctness canonicalizer hashes
results with a pandas ``sort_values``-based recipe that throws
``TypeError: unhashable type: 'list'`` on list cells. Our local harness
(tools/check.py) string-canonicalizes arrays and so never caught it.

This gate asserts the CONTRACT the driver actually enforces: every
registered query's output schema is plain scalars — no ArrayType,
MapType, or StructType columns, and no types pandas can't sort (the
driver round-trips results through Arrow into pandas before hashing).
Queries needing vector/array results must explode to scalar rows
(posexplode) and let callers reassemble.

Schema-only: each query's plan is constructed at sf0.001 and its
analyzed schema inspected — nothing is executed, so the sweep over the
full registry stays cheap. Streaming queries execute at call time
(run_available_now materializes a batch frame); they are inspected the
same way since they too flow through the driver's canonicalizer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)

# Streaming queries run availableNow at plan-construction time — one
# shared sweep would serialize 12 stream restarts into this module, and
# tests/test_streaming.py already constructs every one of them (their
# outputs are scalar window/count columns checked there). Keep this
# gate's sweep to the batch registry plus a marker list kept in sync.
_STREAMING_PREFIX = "stream_"


def _complex_fields(schema: T.StructType) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, _COMPLEX)
    ]


@pytest.mark.parametrize(
    "name",
    [n for n in QUERIES if not n.startswith(_STREAMING_PREFIX)],
)
def test_output_schema_is_driver_hashable(spark, name):
    df = QUERIES[name](spark, SF)
    bad = _complex_fields(df.schema)
    assert not bad, (
        f"{name} returns complex-typed columns {bad}: the driver's "
        "canonicalizer cannot hash list/struct/map cells — explode to "
        "scalar rows instead"
    )


def test_oracle_outputs_are_driver_hashable():
    """The driver canonicalizes the ORACLE result the same way it does
    the Spark result, so a DuckDB query returning list/struct cells
    (e.g. an un-unrolled list(...) constructor) errs identically. Sweep
    every oracle at sf0.001 — DuckDB-only, no Spark, so it's cheap —
    and assert all cells are scalars."""
    import duckdb
    import numpy as np

    from bcg_contacts_data_pipeline_spark.plans.queries import ORACLE
    from bcg_contacts_data_pipeline_spark.session import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    bad: dict[str, list[str]] = {}
    for name, sql in ORACLE.items():
        df = con.execute(sql).df()
        for c in df.columns:
            if any(
                isinstance(v, (list, tuple, dict, np.ndarray))
                for v in df[c].head(50)
            ):
                bad.setdefault(name, []).append(c)
    assert not bad, (
        f"oracles returning complex-typed cells (driver canonicalizer "
        f"cannot hash them): {bad}"
    )


def test_streaming_outputs_are_driver_hashable(spark):
    """One combined sweep for the streaming family (each call runs a
    real availableNow stream, so don't parametrize into N restarts —
    check them all in one pass)."""
    bad = {}
    for name in (n for n in QUERIES if n.startswith(_STREAMING_PREFIX)):
        df = QUERIES[name](spark, SF)
        fields = _complex_fields(df.schema)
        if fields:
            bad[name] = fields
    assert not bad, bad
