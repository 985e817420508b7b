"""Driver-side call surface: from_rows (A38 from_dict), enforce (A61
binder), load_env_settings (A63 typed env settings) — all reusing the
SAME compiled plan the distributed jobs run."""

import pytest

from typical_spark.driverside import (
    TransmuteError,
    enforce,
    from_rows,
    load_env_settings,
)
from typical_spark.specs import (
    EnumCheck,
    FieldSpec,
    NotNullCheck,
    NumberCheck,
    TableSpec,
)

SPEC = TableSpec(
    name="job_config", key_columns=("name",),
    fields=(
        FieldSpec("name", "string", nullable=False, checks=(NotNullCheck(),)),
        FieldSpec("workers", "long", coerce_from="string",
                  checks=(NumberCheck(ge=1, le=1000),)),
        FieldSpec("mode", "string", checks=(EnumCheck(values=("fast", "safe")),)),
        FieldSpec("started", "timestamp", coerce_from="union:epoch|iso_strict"),
    ),
)


def test_from_rows_coerces_and_validates(spark):
    out = from_rows(
        [{"name": "a", "workers": "8", "mode": "fast",
          "started": "2021-03-02T19:48:10", "junk_key": "ignored"},
         {"name": "b", "workers": 12, "started": "1600000000"}],
        SPEC, spark=spark,
    )
    rows = {r["name"]: r for r in out.collect()}
    assert rows["a"]["workers"] == 8 and rows["a"]["started"].year == 2021
    assert rows["b"]["workers"] == 12 and rows["b"]["started"].year == 2020
    assert rows["b"]["mode"] is None
    assert "junk_key" not in out.columns


def test_from_rows_raises_on_violation(spark):
    with pytest.raises(TransmuteError, match="number_range"):
        from_rows([{"name": "a", "workers": "0"}], SPEC, spark=spark)
    with pytest.raises(TransmuteError, match="coerce"):
        from_rows([{"name": "a", "workers": "lots"}], SPEC, spark=spark)
    # non-raising mode returns the repaired frame instead
    df = from_rows([{"name": "a", "workers": "lots"}], SPEC, spark=spark,
                   raise_on_violation=False)
    assert df.collect()[0]["workers"] is None


def test_enforce_decorator(spark):
    calls = []

    @enforce(SPEC, spark=spark)
    def launch(name, workers=2, mode=None, extra="x"):
        calls.append((name, workers, mode, extra))
        return workers * 2

    assert launch(name="run1", workers="21") == 42
    assert calls[-1] == ("run1", 21, None, "x")
    # untouched non-spec kwargs pass through; fn defaults apply to absents
    assert launch(name="run2", extra="y") == 4
    assert calls[-1] == ("run2", 2, None, "y")
    with pytest.raises(TransmuteError):
        launch(name="run3", mode="warp")


def test_load_env_settings(spark):
    env = {
        "APP_NAME": "etl",
        "APP_WORKERS": "64",
        "APP_MODE": "safe",
        "APP_STARTED": "1600000000",
    }
    got = load_env_settings(SPEC, prefix="APP_", environ=env, spark=spark)
    assert got == {
        "name": "etl", "workers": 64, "mode": "safe",
        "started": got["started"],
    }
    assert got["started"].year == 2020
    with pytest.raises(TransmuteError, match="not_null"):
        load_env_settings(SPEC, prefix="APP_", environ={}, spark=spark)


def test_load_env_settings_uncoerced_numeric_field(spark):
    """Env vars are always strings: a field WITHOUT a declared coercion
    strategy must still parse (defaulted to try_cast) rather than fail
    createDataFrame with a TypeError, and an unparseable value must
    surface as a `coerce` violation."""
    spec = TableSpec(
        name="plain", key_columns=("port",),
        fields=(FieldSpec("port", "long", checks=(NumberCheck(ge=1),)),),
    )
    got = load_env_settings(spec, environ={"PORT": "8080"}, spark=spark)
    assert got == {"port": 8080}
    with pytest.raises(TransmuteError, match="coerce"):
        load_env_settings(spec, environ={"PORT": "not-a-port"}, spark=spark)


def test_from_rows_map_and_utf8_sources(spark):
    """Strategy-typed inputs: 'map' coercion takes a real mapping and
    'utf8' takes bytes (not their string reprs)."""
    from typical_spark.specs import FieldSpec, TableSpec

    spec = TableSpec(
        name="t", key_columns=("rid",),
        fields=(
            FieldSpec("rid", "long"),
            FieldSpec("m", "map<int,long>", coerce_from="map"),
            FieldSpec("b", "string", coerce_from="utf8"),
        ),
    )
    out = from_rows(
        [{"rid": 1, "m": {"1": "10"}, "b": "héllo".encode("utf-8")}],
        spec, spark=spark,
    ).collect()[0]
    assert out["m"] == {1: 10} and out["b"] == "héllo"
    with pytest.raises(TransmuteError):
        from_rows([{"rid": 2, "b": b"\xff\xfe"}], spec, spark=spark)
