"""Association-rule mining: exact counts vs a hand-computed basket set,
apriori pruning, direction symmetry, and the mega-basket guard."""

import pytest
from pyspark.sql import functions as F

from tabata_spark.operators.assoc import association_rules

# 6 baskets over items a/b/c/x; x appears once (infrequent at minsup 2).
BASKETS = [
    (1, "a"), (1, "b"),
    (2, "a"), (2, "b"), (2, "c"),
    (3, "a"), (3, "c"),
    (4, "b"), (4, "c"),
    (5, "a"), (5, "b"),
    (6, "x"), (6, "a"),
    # duplicate (1, "a") row: quantity repeats must not inflate counts
    (1, "a"),
]


@pytest.fixture(scope="module")
def baskets(spark):
    return spark.createDataFrame(BASKETS, "basket int, item string")


def _rules(df, **kw):
    out = association_rules(df, "basket", "item", **kw)
    return {(r["antecedent"], r["consequent"]): r for r in out.collect()}


def test_exact_counts_and_ratios(baskets):
    rules = _rules(baskets, min_support=2)
    # hand-computed: baskets with a = {1,2,3,5,6} (5), b = {1,2,4,5} (4),
    # c = {2,3,4} (3); a&b = {1,2,5} (3), a&c = {2,3} (2), b&c = {2,4} (2).
    # x is infrequent -> pruned; basket 6 still counts (it contains a).
    r = rules[("a", "b")]
    assert (r["n_joint"], r["n_ante"], r["n_cons"]) == (3, 5, 4)
    assert r["support"] == round(3 / 6, 6)
    assert r["confidence"] == round(3 / 5, 6)
    assert r["lift"] == round((3 / 5) / (4 / 6), 6)
    # reverse direction shares the joint count, swaps the margins
    rb = rules[("b", "a")]
    assert (rb["n_joint"], rb["n_ante"], rb["n_cons"]) == (3, 4, 5)
    assert rb["confidence"] == round(3 / 4, 6)
    # lift is symmetric by definition
    assert r["lift"] == rb["lift"]


def test_apriori_prunes_infrequent_items(baskets):
    rules = _rules(baskets, min_support=2)
    assert not any("x" in k for k in rules)
    # pair threshold applies too: at minsup 3 only a->b / b->a survive
    high = _rules(baskets, min_support=3)
    assert set(high) == {("a", "b"), ("b", "a")}


def test_max_basket_items_drops_mega_baskets(baskets):
    # basket 2 has 3 items; capping at 2 removes it from every count,
    # margins included (the cap runs before item counting)
    rules = _rules(baskets, min_support=2, max_basket_items=2)
    r = rules[("a", "b")]
    # a = {1,3,5,6}, b = {1,4,5}, a&b = {1,5}; kept baskets = 5
    assert (r["n_joint"], r["n_ante"], r["n_cons"]) == (2, 4, 3)
    assert r["support"] == round(2 / 5, 6)
    assert r["confidence"] == round(2 / 4, 6)
    # a&c = {3} only -> below minsup, pruned
    assert ("a", "c") not in rules


def test_infrequent_only_basket_still_counts_in_denominator(spark):
    # basket 7 contains ONLY the infrequent item y: the apriori
    # prefilter removes its rows from pair generation, but classic
    # support semantics (joint / TOTAL transactions) still counts it
    # in the denominator
    rows = BASKETS + [(7, "y")]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(df, "basket", "item", min_support=2)
    r = {(x["antecedent"], x["consequent"]): x for x in out.collect()}[("a", "b")]
    assert r["support"] == round(3 / 7, 6)  # 7 baskets, not 6
    assert r["lift"] == round((3 / 5) / (4 / 7), 6)


def test_deterministic_under_repartition(baskets):
    a = _rules(baskets, min_support=2)
    b = _rules(baskets.repartition(13, "item"), min_support=2)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].asDict() == b[k].asDict()


def test_large_vocab_shuffle_path_matches_broadcast_path(baskets):
    # broadcast_bytes_limit=0 forces the non-broadcast (shuffle
    # semi-join + shuffle margins) plan; results must be identical
    a = _rules(baskets, min_support=2)
    b = _rules(baskets, min_support=2, broadcast_bytes_limit=0)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k].asDict() == b[k].asDict()
