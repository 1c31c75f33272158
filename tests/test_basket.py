"""Market-basket lift: exact metrics on a hand-computed basket set and
the dedup-within-basket rule."""

from __future__ import annotations

from openedx_event_sink_clickhouse_spark.operators.basket import basket_lift


def test_basket_lift_hand_computed(spark):
    # Baskets: {1,2}, {1,2}, {1,3}, {2}. N=4, n1=3, n2=3, n3=1.
    # c(1,2)=2: support .5, conf(1->2)=2/3, lift=2*4/(3*3)=8/9.
    rows = []
    for b, items in [(10, [1, 2]), (11, [1, 2]), (12, [1, 3]), (13, [2])]:
        rows += [(b, i) for i in items]
    df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    out = {(r.item_a, r.item_b): r for r in basket_lift(df).collect()}
    r12 = out[(1, 2)]
    assert r12.pair_count == 2
    assert r12.support == 0.5
    assert abs(r12.confidence - 2 / 3) < 1e-6
    assert abs(r12.lift - 8 / 9) < 1e-6
    r13 = out[(1, 3)]
    assert r13.pair_count == 1
    assert abs(r13.lift - 4 / 3) < 1e-6  # 1*4/(3*1)


def test_basket_duplicate_lines_count_once(spark):
    # The same part on two lines of one order must not inflate pairs.
    rows = [(10, 1), (10, 1), (10, 2)]
    df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    out = basket_lift(df).collect()
    assert len(out) == 1 and out[0].pair_count == 1
