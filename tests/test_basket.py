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


def test_item_neighbors_cosine_hand_computed(spark):
    # Baskets {1,2},{1,2},{1,3}: n1=3, n2=2, n3=1.
    # cos(1,2) = 2/sqrt(6); cos(1,3) = 1/sqrt(3); both directions emit.
    import math
    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3)]
    df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    from openedx_event_sink_clickhouse_spark.operators.basket import (
        item_neighbors)
    out = {(r.item, r.neighbor): r for r in item_neighbors(df).collect()}
    assert abs(out[(1, 2)].cosine - 2 / math.sqrt(6)) < 1e-6
    assert abs(out[(2, 1)].cosine - 2 / math.sqrt(6)) < 1e-6
    assert abs(out[(1, 3)].cosine - 1 / math.sqrt(3)) < 1e-6
    # item 1's rank order: neighbor 2 (0.816) above neighbor 3 (0.577)
    assert out[(1, 2)].rank == 1 and out[(1, 3)].rank == 2


def test_recommendations_exclude_owned_and_sum_support(spark):
    # User A owns {1,2}; user B owns {3}. Neighbors: 1~2, 1~3, 2~3.
    # A's only fresh candidate is 3 (supported by BOTH owned items ->
    # n_supporting 2, score = cos(1,3)+cos(2,3)); B gets 1 and 2.
    rows = [(10, 1), (10, 2), (11, 1), (11, 3), (12, 2), (12, 3)]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    orders = spark.createDataFrame(
        [(10, "A"), (11, "A"), (12, "B")], ["o_orderkey", "o_custkey"])
    from openedx_event_sink_clickhouse_spark.operators.basket import (
        recommend_items)
    out = {(r.user, r.rec_item): r for r in
           recommend_items(li, user_col="o_custkey",
                           orders=orders).collect()}
    # A owns 1,2,3? A's orders 10,11 -> items {1,2,3}: everything owned,
    # so A emits nothing. B owns {2,3} via order 12 -> candidate 1.
    users = {u for (u, _) in out}
    assert users == {"B"}
    assert ("B", 1) in out and out[("B", 1)].n_supporting == 2
