"""As-of join operator (operators/asof.py): hand goldens + a randomized
equivalence check against pandas.merge_asof (the de-facto single-node
reference semantics for backward/forward as-of with tolerance)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from typical_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "p1"), ("u1", _ts(20), "p2"), ("u1", _ts(5), "p0"),
         ("u2", _ts(10), "p3"), ("u3", _ts(10), "p4"),
         (None, _ts(10), "p5"), ("u1", None, "p6")],
        "user string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(8), "c1"), ("u1", _ts(10), "c2"), ("u1", _ts(15), "c3"),
         ("u2", _ts(30), "c4"), (None, _ts(1), "c5"), ("u3", None, "c6")],
        "user string, ts timestamp, cid string",
    )
    return left, right


def test_backward_golden(spark, frames):
    left, right = frames
    got = {
        r["pid"]: (r["r_cid"])
        for r in asof_join(left, right, by=["user"]).collect()
    }
    assert got == {
        "p1": "c2",   # exact-ts match is visible (<= semantics)
        "p2": "c3",
        "p0": None,   # nothing at or before t=5
        "p3": None,   # u2's only click is later
        "p4": None,   # u3 right row has NULL ts -> never matches
        "p5": None,   # NULL key: kept with NULL match (left-join semantics)
        "p6": None,   # NULL ts: kept with NULL match
    }


def test_forward_and_tolerance(spark, frames):
    left, right = frames
    fwd = {
        r["pid"]: r["r_cid"]
        for r in asof_join(left, right, by=["user"], direction="forward").collect()
    }
    assert fwd == {"p1": "c2", "p2": None, "p0": "c1", "p3": "c4",
                   "p4": None, "p5": None, "p6": None}
    tol = {
        r["pid"]: r["r_cid"]
        for r in asof_join(left, right, by=["user"],
                           tolerance_seconds=4).collect()
    }
    assert tol == {"p1": "c2", "p2": None, "p0": None, "p3": None,
                   "p4": None, "p5": None, "p6": None}


def test_duplicate_right_ts_is_deterministic(spark):
    left = spark.createDataFrame([("k", _ts(10), 1)], "k string, ts timestamp, i int")
    right = spark.createDataFrame(
        [("k", _ts(10), "a"), ("k", _ts(10), "z"), ("k", _ts(10), "m")],
        "k string, ts timestamp, v string",
    )
    for _ in range(3):
        got = asof_join(left, right, by=["k"]).collect()
        assert [r["r_v"] for r in got] == ["z"]  # greatest payload wins


def test_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    base = np.datetime64("2024-01-01")
    lpdf = pd.DataFrame({
        "key": rng.integers(0, 8, n_l).astype(str),
        "ts": base + rng.integers(0, 10_000, n_l).astype("timedelta64[s]"),
        "lid": np.arange(n_l),
    })
    rpdf = pd.DataFrame({
        "key": rng.integers(0, 8, n_r).astype(str),
        "ts": base + rng.integers(0, 10_000, n_r).astype("timedelta64[s]"),
        "rid": np.arange(n_r),
    }).drop_duplicates(["key", "ts"])  # parity needs unique right (key, ts)

    for direction, tol in (("backward", None), ("forward", None),
                           ("backward", 500.0)):
        want = pd.merge_asof(
            lpdf.sort_values(["ts", "lid"]),
            rpdf.sort_values("ts"),
            on="ts", by="key", direction=direction,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        ).set_index("lid")["rid"].to_dict()
        got = {
            r["lid"]: r["r_rid"]
            for r in asof_join(
                spark.createDataFrame(lpdf),
                spark.createDataFrame(rpdf),
                by=["key"], direction=direction, tolerance_seconds=tol,
            ).collect()
        }
        assert len(got) == n_l
        for lid, rid in want.items():
            want_v = None if pd.isna(rid) else int(rid)
            assert got[lid] == want_v, (direction, tol, lid, rid, got[lid])


def test_prefix_collision_raises(spark, frames):
    left, right = frames
    # left already carries a column named like a prefixed right payload
    clash = left.withColumnRenamed("pid", "r_cid")
    with pytest.raises(ValueError, match="collision.*r_cid"):
        asof_join(clash, right, by=["user"])
    # a different prefix resolves it
    out = asof_join(clash, right, by=["user"], right_prefix="right_")
    assert "right_cid" in out.columns and out.count() == left.count()
