"""Zero-row robustness gate over the whole query registry.

An engine that crashes on an empty partition of a 100 TB table is not an
engine — empty inputs are routine at scale (a fresh ingest hour, a filter
that eliminates a whole date range, a new tenant). This gate runs every
registered query against zero-row versions of all ten tables (real
schemas, no rows) and asserts each one *executes* — the classic crashers
being ANSI divide-by-zero on empty-count denominators, ``int(None)`` on
driver-side ``max()`` collects, and ``create_map()`` with zero entries
(``map<void,void>``) in the partition-offset cumsum. Each of those
shipped at least once; this keeps them from shipping again.

Row-content is NOT asserted (most queries legitimately return 0 rows; a
few return a single all-NULL/zero summary row) — only that the plan
builds, runs, and lands in the sink.
"""

from __future__ import annotations

import pytest

from bcg_contacts_data_pipeline_spark.plans.queries import QUERIES
from bcg_contacts_data_pipeline_spark.session import TABLES

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """All ten harness tables with their real schemas and zero rows."""
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = spark.read.parquet(f"{SRC}/{t}.parquet").schema
        spark.createDataFrame([], schema).coalesce(1).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


# One sweep per family (not 154 parametrized cases): the per-case fixture
# and reporting overhead would dominate, and the streaming queries each
# restart a real availableNow stream — batch them and report all failures
# at once.
def test_batch_queries_survive_empty_input(spark, empty_sf_dir):
    failures = {}
    for name, fn in QUERIES.items():
        if name.startswith("stream_"):
            continue
        try:
            fn(spark, empty_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
    assert not failures, failures


def test_streaming_queries_survive_empty_input(spark, empty_sf_dir):
    failures = {}
    for name, fn in QUERIES.items():
        if not name.startswith("stream_"):
            continue
        try:
            fn(spark, empty_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
    assert not failures, failures
