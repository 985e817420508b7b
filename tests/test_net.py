"""URL/network-address parse-to-struct kernel (functions/net.py) — the
golden expectations are ported from the reference's URL suite
(tests/custom_types/test_url.py: the _abs/_rel/_orel/_dotl/_frag/_port
NetAddrInfo attribute table)."""

import pytest
from pyspark.sql import functions as F

from typical_spark.functions.net import (
    parse_url,
    url_base,
    url_is_absolute,
    url_is_default_port,
    url_is_internal,
    url_is_private,
)

OREL = "/path;attr=value?query=string#frag"
REL = f"www.foo.bar{OREL}"
ABS = f"http://{REL}"
PORT = f"http://www.foo.bar:100{OREL}"


def _parse(spark, value):
    df = spark.createDataFrame([(value,)], "s string")
    row = df.select(parse_url(F.col("s")).alias("u")).collect()[0]["u"]
    return None if row is None else row.asDict()


@pytest.mark.parametrize(
    "value,want",
    [
        (ABS, dict(scheme="http", auth="", host="www.foo.bar", port=80,
                   path="/path", params="attr=value", qs="query=string",
                   fragment="frag", is_ip=False)),
        (PORT, dict(scheme="http", auth="", host="www.foo.bar", port=100,
                    path="/path", params="attr=value", qs="query=string",
                    fragment="frag", is_ip=False)),
        (REL, dict(scheme="", auth="", host="www.foo.bar", port=0,
                   path="/path", params="attr=value", qs="query=string",
                   fragment="frag", is_ip=False)),
        (OREL, dict(scheme="", auth="", host="", port=0, path="/path",
                    params="attr=value", qs="query=string", fragment="frag",
                    is_ip=False)),
        ("foo", dict(scheme="", auth="", host="foo", port=0, path="",
                     params="", qs="", fragment="", is_ip=False)),
        ("#frag", dict(scheme="", auth="", host="", port=0, path="",
                       params="", qs="", fragment="frag", is_ip=False)),
        ("postgresql://user:pw@db.example.com/app",
         dict(scheme="postgresql", auth="user:pw", host="db.example.com",
              port=5432, path="/app", params="", qs="", fragment="",
              is_ip=False)),
        ("https://10.2.3.4:8443/x?a=1",
         dict(scheme="https", auth="", host="10.2.3.4", port=8443,
              path="/x", params="", qs="a=1", fragment="", is_ip=True)),
        # path keeps a non-final ';' segment, splits only the last
        ("/a;b/c;d;e", dict(scheme="", auth="", host="", port=0,
                            path="/a;b/c", params="d;e", qs="", fragment="",
                            is_ip=False)),
        ("", None),                 # NetworkAddressValueError analog
        ("not a url", None),
        (None, None),
    ],
)
def test_parse_url_goldens(spark, value, want):
    assert _parse(spark, value) == want


def test_url_predicates(spark):
    df = spark.createDataFrame(
        [(ABS,), (REL,), (OREL,), ("foo",), ("localhost",), ("0.0.0.0",),
         ("http://192.168.1.10/x",), ("https://[fc00::1]/y",)],
        "s string",
    )
    got = {
        r["s"]: r
        for r in df.select(
            "s",
            parse_url(F.col("s")).alias("u"),
        ).select(
            "s",
            url_is_absolute(F.col("u")).alias("absolute"),
            url_is_default_port(F.col("u")).alias("default_port"),
            url_is_private(F.col("u")).alias("private"),
            url_is_internal(F.col("u")).alias("internal"),
            url_base(F.col("u")).alias("base"),
        ).collect()
    }
    # reference test_relative / test_default_port / test_private /
    # test_internal / test_info_url expectations
    assert got[ABS]["absolute"] and not got[REL]["absolute"]
    assert not got[OREL]["absolute"] and not got["foo"]["absolute"]
    for v in (ABS, REL, OREL, "foo"):
        assert got[v]["default_port"]
    assert got["localhost"]["private"]
    assert got["0.0.0.0"]["internal"]
    assert got["http://192.168.1.10/x"]["internal"]
    assert got["https://[fc00::1]/y"]["internal"]
    assert not got[ABS]["internal"] and not got[ABS]["private"]
    assert got[ABS]["base"] == "http://www.foo.bar"
    assert got[REL]["base"] == "www.foo.bar"
    assert got[OREL]["base"] == ""
    assert got["foo"]["base"] == "foo"


def test_url_base_with_explicit_port(spark):
    assert _parse(spark, PORT)["port"] == 100
    df = spark.createDataFrame([(PORT,)], "s string")
    base = df.select(
        url_base(parse_url(F.col("s"))).alias("b")
    ).collect()[0]["b"]
    assert base == "http://www.foo.bar:100"
