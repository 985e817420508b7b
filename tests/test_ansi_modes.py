"""The engine must be correct under BOTH spark.sql.ansi.enabled settings:
the driver harness (and Spark 4.x default) runs ANSI on — which the whole
suite already exercises via get_spark's pass-through default — while
defensive deployments may set ansi=false. This sweep runs every contract
query at sf0.001 under both toggles and requires identical results; no
kernel may depend on either mode's arithmetic/cast leniency.

spark.sql.ansi.enabled is a runtime SQL conf, so toggling it on the
shared session re-compiles subsequent plans under the other mode.
"""

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def _run_sorted(spark, fn):
    df = fn(spark, SF_DIR)
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_identical_under_both_ansi_modes(spark, queries, name):
    ansi_before = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        on = _run_sorted(spark, queries[name])
        spark.conf.set("spark.sql.ansi.enabled", "false")
        off = _run_sorted(spark, queries[name])
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_before)
    assert on == off, f"{name} differs between ANSI modes"
