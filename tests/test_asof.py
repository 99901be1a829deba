"""As-of join: semantics (inclusive/strict/ties/left-join nulls) and the
no-Join plan shape that makes it scale."""

from pyspark.sql import functions as F

from airbyte_destination_spark.operators.asof import asof_join_backward
from airbyte_destination_spark.plans import executed_plan


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d"), (3, 10, "e")],
        "k int, t int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 150), (2, 11, 200), (2, 9, 90), (2, 9, 91)],
        "k int, t int, v int",
    )
    return left, right


def test_inclusive_backward(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, key="k", left_time="t", right_time="t",
        payload={"rv": F.col("v"), "rt": F.col("t")},
        tiebreak=F.col("v"),
    )
    got = {(r.k, r.t, r.tag): (r.rv, r.rt) for r in out.collect()}
    assert got[(1, 10, "a")] == (100, 10)      # inclusive: equal time matches
    assert got[(1, 20, "b")] == (150, 15)      # latest at-or-before
    assert got[(1, 5, "c")] == (None, None)    # nothing before -> left-join null
    assert got[(2, 10, "d")] == (91, 9)        # tie at t=9 broken to max tiebreak
    assert got[(3, 10, "e")] == (None, None)   # key absent on the right
    assert out.count() == left.count()


def test_strict_backward(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, key="k", left_time="t", right_time="t",
        payload={"rv": F.col("v")}, tiebreak=F.col("v"), strict=True,
    )
    got = {(r.k, r.t, r.tag): r.rv for r in out.collect()}
    assert got[(1, 10, "a")] is None           # strict: equal time excluded
    assert got[(1, 20, "b")] == 150


def test_no_join_in_plan(spark):
    left, right = _frames(spark)
    out = asof_join_backward(
        left, right, key="k", left_time="t", right_time="t",
        payload={"rv": F.col("v")},
    )
    plan = executed_plan(out)
    assert "Join" not in plan, plan            # union+window, never a join
    assert "CartesianProduct" not in plan


def test_payload_collision_rejected(spark):
    left, right = _frames(spark)
    try:
        asof_join_backward(
            left, right, key="k", left_time="t", right_time="t",
            payload={"tag": F.col("v")},
        )
    except ValueError:
        return
    raise AssertionError("collision with a left column must raise")
