"""Driver-facing query battery: every implemented operator from
SURVEY.md §2 as a (spark, sf_dir) -> DataFrame callable, with a
matching DuckDB oracle SQL string.

Column-name contract: every computed column is aliased identically in
the Spark code and the SQL (the driver sorts columns by name before
value-hashing). Floating aggregates are kept numerically tame; top-k
queries carry total deterministic tie-breaks.

Scale notes (the 100 TB story, enforced per query):
- joins against region/nation/customer-sized dims are broadcast;
- aggregations are single-shuffle groupBys with map-side partials;
- per-record signal ops share one record_id window partitioning;
- no Python UDFs anywhere in the battery — JVM codegen end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tabata_spark.operators.flight import flight_summary
from tabata_spark.operators.indicator import segment_ramp
from tabata_spark.operators.positions import with_positions
from tabata_spark.operators.slicing import highlight, left_of
from tabata_spark.sources.relational import SIGNALS_CTE, events_as_signals, load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# =====================================================================
# Relational surface (SURVEY §2.4/2.6/2.7 "free in Spark" inventory —
# exercised so the driver can hash-check them)
# =====================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                       AS sum_qty,
           round(sum(l_extendedprice), 4)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6)                                       AS avg_qty,
           round(avg(l_extendedprice), 6)                                  AS avg_price,
           round(avg(l_discount), 6)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: single-shuffle hash aggregate; the shipdate
    filter and 7-column projection push to the Parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: customer is the small side — broadcast — so only
    orders⨝lineitem shuffles, on the join key; top-k via TakeOrdered."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: all dims broadcast; lineitem⨝orders is the only
    shuffle join. Catalyst folds the dim chain into one broadcast stage."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 4) AS total,
           count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_orders(spark, sf_dir):
    """Grouping-sets surface (SURVEY §2.4 'free in Spark')."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q_rollup_nation",
    """
    SELECT r_name, n_name, count(*) AS n_customers,
           round(sum(c_acctbal), 4) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup_nation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


@register(
    "q_distinct_parts",
    """
    SELECT p_brand, count(DISTINCT p_type) AS n_types,
           count(DISTINCT p_size) AS n_sizes, count(*) AS n
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def q_distinct_parts(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.countDistinct("p_type").alias("n_types"),
            F.countDistinct("p_size").alias("n_sizes"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("p_brand")
    )


@register(
    "q_topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def q_topk_orders(spark, sf_dir):
    """ORDER BY+LIMIT compiles to TakeOrderedAndProject: a per-partition
    top-k then a driver merge — no global sort at any scale."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
    )


@register(
    "q_setops_customers",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 50000
    ORDER BY c_custkey
    """,
)
def q_setops_customers(spark, sf_dir):
    a = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 50000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b).orderBy("c_custkey")


@register(
    "q_except_customers",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 20000
    ORDER BY c_custkey
    """,
)
def q_except_customers(spark, sf_dir):
    a = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select("c_custkey")
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 20000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.distinct().subtract(b.distinct()).orderBy("c_custkey")


@register(
    "q_month_revenue",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mon,
           round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_month_revenue(spark, sf_dir):
    """Date scalar functions (SURVEY §2.8 F6 family)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mon"),
        )
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("yr", "mon")
    )


@register(
    "q_json_events",
    """
    SELECT event_type,
           count(*) AS n,
           min(json_extract_string(props, '$.k')::INT)  AS k_min,
           max(json_extract_string(props, '$.k')::INT)  AS k_max,
           round(avg(json_extract_string(props, '$.k')::INT), 6) AS k_avg
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_json_events(spark, sf_dir):
    """JSON scalar surface over events.props (SURVEY §2.8 note)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(k).alias("k_min"),
            F.max(k).alias("k_max"),
            F.round(F.avg(k), 6).alias("k_avg"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# Signal surface over events-as-signals (reference semantics, §2.2/2.4/2.5)
# =====================================================================


@register(
    "w_positions",
    SIGNALS_CTE
    + """
    SELECT record_id, seq,
           CAST(seq AS DOUBLE) AS len_pos,
           CAST(count(*) OVER w - 1 - seq AS DOUBLE) AS rev_pos,
           CASE WHEN count(*) OVER w > 1
                THEN CAST(seq AS DOUBLE) / (count(*) OVER w - 1)
                ELSE 0.0 END AS pct_pos
    FROM signals
    WINDOW w AS (PARTITION BY record_id)
    """,
)
def w_positions(spark, sf_dir):
    """W1-W3 LEN/REV/PERCENT (instants.py:306-311)."""
    sig = events_as_signals(_t(spark, sf_dir, "events"))
    return with_positions(
        sig, len_name="len_pos", rev_name="rev_pos", percent_name="pct_pos"
    ).select("record_id", "seq", "len_pos", "rev_pos", "pct_pos")


@register(
    "w_running",
    SIGNALS_CTE
    + """
    SELECT record_id, seq,
           round(sum(value) OVER (PARTITION BY record_id ORDER BY seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run_sum,
           round(value - lag(value) OVER (PARTITION BY record_id ORDER BY seq), 6) AS dvalue,
           round(epoch(ts) - epoch(lag(ts) OVER (PARTITION BY record_id ORDER BY seq)), 3) AS dt_s
    FROM signals
    """,
)
def w_running(spark, sf_dir):
    """W10/W11: running sum + sample-to-sample diffs (exam cell 39)."""
    sig = events_as_signals(_t(spark, sf_dir, "events"))
    w = Window.partitionBy("record_id").orderBy("seq")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return sig.select(
        "record_id",
        "seq",
        F.round(F.sum("value").over(run), 6).alias("run_sum"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("dvalue"),
        F.round(
            F.col("ts").cast("double") - F.lag("ts").over(w).cast("double"), 3
        ).alias("dt_s"),
    )


@register(
    "a_user_summary",
    SIGNALS_CTE
    + """
    SELECT record_id,
           count(*) AS n,
           round(avg(value), 6)    AS value_mean,
           round(median(value), 6) AS value_median,
           round(max(value), 6)    AS value_max,
           round(min(value), 6)    AS value_min,
           round((epoch(max(ts)) - epoch(min(ts))) / 3600, 6) AS duration_h
    FROM signals GROUP BY record_id ORDER BY record_id
    """,
)
def a_user_summary(spark, sf_dir):
    """A2/A3/A6: per-record summary incl. exact median
    (pandas-exact parity, SURVEY §7 median note)."""
    sig = events_as_signals(_t(spark, sf_dir, "events"))
    return (
        sig.groupBy("record_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("value_mean"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("value_median"),
            F.round(F.max("value"), 6).alias("value_max"),
            F.round(F.min("value"), 6).alias("value_min"),
            F.round(
                (F.max("ts").cast("double") - F.min("ts").cast("double")) / 3600, 6
            ).alias("duration_h"),
        )
        .orderBy("record_id")
    )


@register(
    "a_standardize",
    SIGNALS_CTE
    + """
    SELECT record_id, seq,
           round(CASE WHEN stddev_samp(value) OVER w > 0
                 THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
                 ELSE value END, 6) AS zvalue
    FROM signals
    WINDOW w AS (PARTITION BY record_id)
    """,
)
def a_standardize(spark, sf_dir):
    """A1 standardization with the reference's std==0 guard
    (plots.py:285-289: unstandardized when flat)."""
    sig = events_as_signals(_t(spark, sf_dir, "events"))
    w = Window.partitionBy("record_id")
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    z = F.when(sd > 0, (F.col("value") - mu) / sd).otherwise(F.col("value"))
    return sig.select("record_id", "seq", F.round(z, 6).alias("zvalue"))


@register(
    "a_out_of_tube",
    SIGNALS_CTE
    + """
    SELECT record_id,
           count(*) AS n,
           count(*) FILTER (WHERE value > 250 OR value < 5) AS n_out,
           round(count(*) FILTER (WHERE value > 250 OR value < 5) * 1.0 / count(*), 6) AS frac_out
    FROM signals GROUP BY record_id ORDER BY record_id
    """,
)
def a_out_of_tube(spark, sf_dir):
    """A5/A6/A7 out-of-tube scoring with fixed bounds
    (tubes.py:376-406 semantics; learned bounds arrive with Tube)."""
    sig = events_as_signals(_t(spark, sf_dir, "events"))
    out = (F.col("value") > 250) | (F.col("value") < 5)
    return (
        sig.groupBy("record_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(out, 1)).alias("n_out"),
            F.round(F.count(F.when(out, 1)) / F.count(F.lit(1)), 6).alias("frac_out"),
        )
        .orderBy("record_id")
    )


@register(
    "j_highlight",
    SIGNALS_CTE
    + """
    SELECT s.record_id, s.seq,
           (EXISTS (SELECT 1 FROM signals e
                    WHERE e.record_id = s.record_id AND e.ts = s.ts
                      AND e.event_type = 'purchase')) AS "INTERVAL"
    FROM signals s
    """,
)
def j_highlight(spark, sf_dir):
    """J1 membership flag (tubes.py:41-70): mark rows whose (record, ts)
    appears in the extract — here the purchase sub-stream."""
    sig = events_as_signals(_t(spark, sf_dir, "events"))
    extract = sig.filter(F.col("event_type") == "purchase")
    return highlight(sig, extract, flag="INTERVAL").select(
        "record_id", "seq", "INTERVAL"
    )


@register(
    "j_slice_left",
    SIGNALS_CTE
    + """
    , instants AS (
      SELECT record_id, min(seq) AS cut FROM (
        SELECT record_id, seq,
               max(value) OVER (PARTITION BY record_id) AS mx, value
        FROM signals) t
      WHERE value = mx GROUP BY record_id
    )
    SELECT s.record_id, s.seq, s.value
    FROM signals s JOIN instants i ON s.record_id = i.record_id
    WHERE s.seq < i.cut
    """,
)
def j_slice_left(spark, sf_dir):
    """J3/P8 positional slice: rows strictly before each record's
    argmax instant (instants.py:600-601 left semantics; instant =
    first row attaining the record max, W8 argmax)."""
    sig = events_as_signals(_t(spark, sf_dir, "events"))
    instants = sig.groupBy("record_id").agg(
        F.expr("min_by(seq, struct(value * -1, seq))").alias("seq")
    )
    return left_of(sig, instants).select("record_id", "seq", "value")


@register(
    "w_segment_ramp",
    SIGNALS_CTE
    + """
    , b AS (
      SELECT record_id, seq, (value > 100.0) AS bb FROM signals
    ), c AS (
      SELECT *, CASE WHEN lag(bb) OVER w IS NOT NULL AND bb <> lag(bb) OVER w
                     THEN 1 ELSE 0 END AS chg
      FROM b WINDOW w AS (PARTITION BY record_id ORDER BY seq)
    ), s AS (
      SELECT *,
        sum(chg) OVER (PARTITION BY record_id ORDER BY seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS seg,
        sum(chg) OVER (PARTITION BY record_id) AS nchg
      FROM c
    ), fr AS (
      SELECT record_id, arg_min(bb, seq) FILTER (WHERE chg = 1) AS first_rising
      FROM c GROUP BY record_id
    ), m AS (
      SELECT s.*, fr.first_rising,
        count(*) OVER (PARTITION BY s.record_id, seg) AS seg_n,
        row_number() OVER (PARTITION BY s.record_id, seg ORDER BY seq) - 1 AS seg_pos
      FROM s JOIN fr ON s.record_id = fr.record_id
    )
    SELECT record_id, seq,
      round(CASE WHEN nchg = 0 THEN 0.0
            ELSE (CASE WHEN first_rising THEN 0.0 ELSE 1.0 END) + seg
                 + (CASE WHEN seg_n > 1 THEN seg_pos * 1.0 / (seg_n - 1) ELSE 0.0 END)
            END, 6) AS ramp
    FROM m
    """,
)
def w_segment_ramp(spark, sf_dir):
    """W6 bump-counting ramp (instants.py:45-93) on the raw value
    channel with a fixed threshold — the segmentation half of the
    indicator, SQL-checkable (the SG half is checked against the
    numpy oracle in tests)."""
    sig = events_as_signals(_t(spark, sf_dir, "events"))
    out = segment_ramp(sig, "value", 100.0, "ramp")
    return out.select("record_id", "seq", F.round("ramp", 6).alias("ramp"))


# =====================================================================
# LLM-data-pipeline surface (north-star extensions)
# =====================================================================


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_dups
    FROM documents GROUP BY md5(text) ORDER BY text_hash
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup via content-hash groupBy: one shuffle on the hash,
    min-id survivor policy — works unchanged at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .orderBy("text_hash")
    )


@register(
    "text_tokens",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars_actual,
           round(length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 6)
             AS avg_token_len
    FROM documents ORDER BY doc_id
    """,
)
def text_tokens(spark, sf_dir):
    """Token counting (north-star text analysis), pure built-ins."""
    docs = _t(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " ", -1))
    return docs.select(
        "doc_id",
        ntok.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")) / ntok, 6
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


@register(
    "sim_topk_cosine",
    """
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qe FROM q)), 4)
             AS cosine
    FROM embeddings
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 20
    """,
)
def sim_topk_cosine(spark, sf_dir):
    """Brute-force cosine top-k (north-star similarity baseline).

    The query vector is collected once and folded into the plan as a
    literal — executors do a JVM-side fused dot/norm pass; TakeOrdered
    top-k, no global sort, no UDF."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    qn = float(sum(float(x) * float(x) for x in qvec) ** 0.5)
    cos = dot / (nrm * F.lit(qn))
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", "label", F.round(cos, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(20)
    )


# =====================================================================
# Flagship
# =====================================================================


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record signal summary over the event streams — the engine's
    core shape (scan → record windows → one aggregation)."""
    sig = events_as_signals(_t(spark, sf_dir, "events"))
    summary = (
        sig.groupBy("record_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("value_mean"),
            F.round(F.max("value"), 6).alias("value_max"),
            F.round(
                (F.max("ts").cast("double") - F.min("ts").cast("double")) / 3600.0, 6
            ).alias("duration_h"),
        )
        .orderBy("record_id")
    )
    return summary
