"""Association-rule mining (market-basket analysis) at scale.

Classic Agrawal/Srikant apriori semantics, restricted to the pairwise
(A -> B) rules that dominate production use (co-purchase, co-view,
"docs that cite X also cite Y"): for every ordered item pair with
joint support above a threshold, emit support / confidence / lift.

Scale shape (the part that matters at 100 TB):

- The basket table is deduplicated to DISTINCT (basket, item) first —
  quantity repeats must not inflate co-occurrence counts.
- **Apriori pruning before the pair join**: only items whose single-
  item support clears the threshold participate in the self-join
  (support(A,B) <= support(A), so infrequent items cannot appear in a
  frequent pair). The frequent-item set is a small aggregate —
  broadcast it as a semi-join prefilter so the big fact table is
  thinned at the scan stage, BEFORE the orderkey shuffle.
- The pair generation is a self-join co-partitioned on the basket key
  (one shuffle of the thinned table; both sides share it), with
  ``item_a < item_b`` so each unordered pair is produced exactly once.
- Item counts and the basket total are tiny aggregates, broadcast
  back onto the pair counts; no second shuffle of pair-sized data.
- Per-basket pair blowup is C(k,2) in the number of DISTINCT frequent
  items in the basket; ``max_basket_items`` guards pathological mega-
  baskets (a bot session touching every SKU) by dropping baskets above
  the cap — the standard production guard, off by default.

All counts are exact integers; confidence/lift are fixed-order double
divisions at the output boundary, so results are bit-deterministic
under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_items: int | None = None,
    materialize: str | None = "persist",
    broadcast_bytes_limit: int = 64 << 20,
) -> DataFrame:
    """Pairwise association rules over a (basket, item) table.

    Returns one row per ordered rule A -> B (both directions of each
    frequent unordered pair) with columns: ``antecedent``,
    ``consequent``, ``n_joint`` (baskets containing both), ``n_ante``,
    ``n_cons`` (single-item basket counts), ``support`` (joint / total
    baskets), ``confidence`` (joint / antecedent) and ``lift``
    (confidence / consequent base rate). ``min_support`` is an
    absolute joint-basket-count threshold, applied to single items
    first (apriori) and to pairs after counting.

    ``materialize='persist'`` (default) caches the deduplicated and
    the prefiltered basket tables: FIVE consumers read them (item
    counts, basket-size guard, the total-basket count, and both sides
    of the self-join) — without the cache each one re-executes the
    20M-row dedup shuffle from scratch (r8d probe: 68.5 s -> cached
    ~2.5x faster at 20M rows). Pass None for a pure-lazy plan (the
    oracle-parity path re-derives everything declaratively anyway).
    """

    def _mat(df: DataFrame) -> DataFrame:
        return df.persist() if materialize == "persist" else df

    b = _mat(
        baskets.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        ).distinct()
    )

    # mega-basket guard first (a cleaning step), so every count below —
    # margins included — is over the same kept-basket population
    if max_basket_items is not None:
        sizes = b.groupBy("basket").agg(F.count(F.lit(1)).alias("k"))
        keep = sizes.filter(F.col("k") <= max_basket_items)
        b = _mat(b.join(keep.select("basket"), "basket", "semi"))

    # support denominator = TOTAL kept baskets, counted BEFORE the
    # apriori prefilter — classic semantics (support = joint / total
    # transactions); baskets made solely of infrequent items still
    # count toward the denominator even though they can't contribute
    # joint pairs
    n_baskets = b.select("basket").distinct().count()

    # single-item basket counts; apriori-prune to frequent items only.
    # The broadcast of the frequent set is GATED on its measured size
    # IN BYTES, not rows (the k_core lesson, sharpened: a row-count
    # gate is blind to item WIDTH — 2M rows of 1 KB SKU strings is a
    # 2 GB broadcast; brand-level vocabularies are hundreds of items,
    # SKU-level ones can be tens of millions). One aggregate measures
    # count and mean serialized item width together; above the byte
    # limit the semi-join runs as a shuffle join, which is also fine:
    # the pair self-join shuffles on the basket key anyway.
    item_n = _mat(b.groupBy("item").agg(F.count(F.lit(1)).alias("n_item")))
    freq_n = item_n.filter(F.col("n_item") >= min_support)
    n_freq, avg_w = freq_n.agg(
        F.count(F.lit(1)),
        F.avg(F.octet_length(F.col("item").cast("string"))),
    ).first()
    est_bytes = int(n_freq * (float(avg_w or 0.0) + 16))  # +row overhead
    small_vocab = est_bytes <= broadcast_bytes_limit
    frequent = (
        F.broadcast(freq_n.select("item")) if small_vocab
        else freq_n.select("item")
    )
    b = _mat(b.join(frequent, "item", "semi"))

    # each unordered frequent pair exactly once; one basket-key shuffle
    left = b.alias("l")
    right = b.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.basket") == F.col("r.basket"))
            & (F.col("l.item") < F.col("r.item")),
        )
        .groupBy(
            F.col("l.item").alias("item_a"), F.col("r.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_joint"))
        .filter(F.col("n_joint") >= min_support)
    )

    # both rule directions from the one pair table. As a UNION of two
    # selects over the (unmaterialized) pair frame, the basket
    # self-join + pair aggregation subtree appeared TWICE in the
    # physical plan and executed twice — the query's dominant stage
    # duplicated outright (r16 plan audit: two identical SortMergeJoin
    # + double HashAggregate subtrees). Emitting both directions as a
    # 2-element struct-array explode keeps the plan lazy AND runs the
    # self-join once (guide §2.4 — remove shuffles outright; same row
    # multiset, bit-identical columns).
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("n_joint"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("n_joint"),
                ),
            )
        ).alias("__r")
    ).select("__r.antecedent", "__r.consequent", "__r.n_joint")

    # margins: every rule item is frequent (support(pair) <=
    # support(item)), so the margin tables are the FREQUENT subset —
    # same measured size gate as the prefilter
    ante = freq_n.select(
        F.col("item").alias("antecedent"), F.col("n_item").alias("n_ante")
    )
    cons = freq_n.select(
        F.col("item").alias("consequent"), F.col("n_item").alias("n_cons")
    )
    if small_vocab:
        ante, cons = F.broadcast(ante), F.broadcast(cons)
    conf = F.col("n_joint").cast("double") / F.col("n_ante")
    base = F.col("n_cons").cast("double") / F.lit(n_baskets)
    return (
        rules.join(ante, "antecedent")
        .join(cons, "consequent")
        .select(
            "antecedent",
            "consequent",
            F.col("n_joint").cast("long").alias("n_joint"),
            F.col("n_ante").cast("long").alias("n_ante"),
            F.col("n_cons").cast("long").alias("n_cons"),
            F.round(
                F.col("n_joint").cast("double") / F.lit(n_baskets), 6
            ).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(conf / base, 6).alias("lift"),
        )
    )
