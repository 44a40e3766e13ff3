"""Static schema catalog for the harness tables (guide §7.3 driver cost
+ §6 listing/inference cost).

``spark.read.parquet(path)`` with no schema runs a footer-inference JOB
on every call — measured 100-160 ms per read at sf0.1 (one 1-task job +
driver round-trips), paid once per table per query build, i.e. hundreds
of times per bench board and per pipeline composition. A production
deployment reads these tables through a catalog (metastore/Iceberg)
precisely so the driver never lists-and-infers per query; this module
is that catalog's schema-on-read contract, declared in code.

Scope: the 9 STABLE tables only. ``events`` is deliberately excluded —
its parquet encoding has legitimately drifted across driver rounds
(TIMESTAMP(NANOS) vs timestamp[us]; see io/events.py), and
``normalize_event_ts`` branches on the READ dtype, so events must keep
inference to keep that tolerance.

Drift guard: tests/test_io.py::test_static_schemas_match_inference pins
every declared schema equal to what inference produces on the shipped
fixtures — if the testdata schema ever drifts, the pin goes red with a
one-line message instead of queries silently mis-typing.
"""

from __future__ import annotations

#: Spark DDL per table — must stay EXACTLY what schema inference yields
#: on the fixtures (pinned by test_static_schemas_match_inference).
TABLE_DDL: dict[str, str] = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": (
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ),
    "supplier": (
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    ),
    "part": (
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ),
    "orders": (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    ),
    "lineitem": (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz"
    ),
    "documents": (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ),
    "embeddings": "vec_id bigint, embedding array<float>, label int",
}


def read_table(spark, sf_dir: str, name: str):
    """Read a harness table, using the static schema when the table is
    in the catalog (no footer-inference job) and plain inference
    otherwise (events, ad-hoc paths)."""
    path = f"{sf_dir}/{name}.parquet"
    ddl = TABLE_DDL.get(name)
    if ddl is not None:
        return spark.read.schema(ddl).parquet(path)
    return spark.read.parquet(path)
