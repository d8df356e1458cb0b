"""Relational operator coverage (SURVEY.md §2.2–2.8) as oracle-checked
queries over the driver's test tables.

Each entry: name -> (spark_fn, oracle_sql_or_None). The Spark side is a
declarative DataFrame plan (Catalyst does pushdown/pruning/join selection;
broadcast hints only where the dim side is known-small). Every computed
column is aliased identically in both engines (driver hash-compares by
column name). Queries that aren't ANSI-SQL-expressible carry sql=None and
get the driver's rows-only check.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# aggregations / filters / projections
# --------------------------------------------------------------------------

def q_pricing_summary(spark, sf):
    """TPC-H Q1 shape: filter → partial+final hash agg (map-side combine)."""
    l = T(spark, sf, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_filter_project(spark, sf):
    """Projection + predicate (pushed to parquet row groups)."""
    l = T(spark, sf, "lineitem")
    return (
        l.filter((F.col("l_quantity") >= 30) & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem WHERE l_quantity >= 30 AND l_discount > 0.05
"""


def q_join_agg(spark, sf):
    """3-way equi-join (fact ⋈ fact ⋈ dim) + agg; AQE picks the strategy."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    l = T(spark, sf, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


SQL_JOIN_AGG = """
SELECT c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_broadcast_chain(spark, sf):
    """Dim chain broadcast join: supplier→nation→region, agg per region."""
    s = T(spark, sf, "supplier")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_suppliers"), F.round(F.sum("s_acctbal"), 2).alias("total_bal"))
        .orderBy("r_name")
    )


SQL_BROADCAST_CHAIN = """
SELECT r_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def q_semi_join(spark, sf):
    """left semi: orders having a high-quantity lineitem (EXISTS)."""
    o = T(spark, sf, "orders")
    l = T(spark, sf, "lineitem")
    return (
        o.join(l.filter(F.col("l_quantity") >= 49), o.o_orderkey == l.l_orderkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
    )


SQL_SEMI = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
"""


def q_anti_join(spark, sf):
    """left anti: customers with no orders (the dedup primitive)."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


SQL_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_nonequi_join(spark, sf):
    """theta join (broadcast nested loop): region-pair counts."""
    n1 = T(spark, sf, "nation").alias("n1")
    n2 = T(spark, sf, "nation").alias("n2")
    return (
        n1.join(n2, F.col("n1.n_regionkey") < F.col("n2.n_regionkey"))
        .groupBy(F.col("n1.n_regionkey").alias("r_lo"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("r_lo")
    )


SQL_NONEQUI = """
SELECT n1.n_regionkey AS r_lo, count(*) AS n_pairs
FROM nation n1 JOIN nation n2 ON n1.n_regionkey < n2.n_regionkey
GROUP BY n1.n_regionkey ORDER BY r_lo
"""


# --------------------------------------------------------------------------
# windows
# --------------------------------------------------------------------------

def q_window_topk_per_group(spark, sf):
    """row_number ≤ k per group — the politeness-budget pattern (§2.5)."""
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


SQL_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


def q_window_funcs(spark, sf):
    """The window-function family in one plan over events (§2.5): running
    ROWS frame, lag (inter-event spacing — the crawl-delay check pattern),
    rank, dense_rank, lead, and a float RANGE frame. One query covers the
    family so the driver's 50-query correctness budget stretches further;
    each spec is still a distinct window in the plan."""
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(wrun), 4).alias("running_value"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).cast("long").alias("gap_s"),
        F.rank().over(Window.partitionBy("user_id").orderBy("event_id")).alias("seq"),
        F.dense_rank().over(Window.partitionBy("user_id").orderBy("event_type")).alias("type_rank"),
        F.lead("event_id", 1).over(w).alias("next_event"),
        # float RANGE frame — the DataFrame API only takes int offsets, so
        # this one window uses the SQL expression form
        F.expr(
            "count(*) OVER (PARTITION BY user_id ORDER BY value "
            "RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW)"
        ).alias("n_within_10"),
    )


SQL_WINDOW_FUNCS = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
       floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT AS gap_s,
       rank() OVER (PARTITION BY user_id ORDER BY event_id) AS seq,
       dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS type_rank,
       lead(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event,
       count(*) OVER (PARTITION BY user_id ORDER BY value
                      RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW) AS n_within_10
FROM events
"""


def q_asof_latest(spark, sf):
    """as-of pattern: latest event per user at/before a cutoff (the WARC
    re-crawl 'version as of t' encoding, §2.3)."""
    e = T(spark, sf, "events").filter(F.col("ts") <= F.lit("2024-01-03 00:00:00"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )


SQL_ASOF = """
SELECT user_id, event_id, ts, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '2024-01-03 00:00:00')
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# rollup / cube / grouping sets / stats
# --------------------------------------------------------------------------

def q_grouping_analytics(spark, sf):
    """rollup + cube + grouping sets in one result (§2.4): three Expand-
    based aggregations (lineitem rollup, orders cube, lineitem grouping
    sets) unioned with a source tag. Values are hash-compared as a set, so
    the union is a safe way to evidence all three grouping flavors in one
    driver correctness row."""
    l = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    ru = (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("val"), F.grouping_id().alias("gid"))
        .select(
            F.lit("rollup").alias("src"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "val",
            "gid",
        )
    )
    cu = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").cast("double").alias("val"), F.grouping_id().alias("gid"))
        .select(
            F.lit("cube").alias("src"),
            F.col("o_orderstatus").alias("k1"),
            F.col("o_orderpriority").alias("k2"),
            "val",
            "gid",
        )
    )
    l.createOrReplaceTempView("lineitem_gs")
    gs = spark.sql(
        """
        SELECT 'gsets' AS src, l_returnflag AS k1, l_linestatus AS k2,
               round(sum(l_quantity), 2) AS val,
               grouping_id(l_returnflag, l_linestatus) AS gid
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )
    return ru.unionByName(cu).unionByName(gs).orderBy("src", "gid", "k1", "k2")


SQL_GROUPING_ANALYTICS = """
SELECT 'rollup' AS src, l_returnflag AS k1, l_linestatus AS k2,
       round(sum(l_quantity), 2) AS val,
       grouping(l_returnflag, l_linestatus) AS gid
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube' AS src, o_orderstatus AS k1, o_orderpriority AS k2,
       count(*)::DOUBLE AS val, grouping(o_orderstatus, o_orderpriority) AS gid
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'gsets' AS src, l_returnflag AS k1, l_linestatus AS k2,
       round(sum(l_quantity), 2) AS val,
       grouping(l_returnflag, l_linestatus) AS gid
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
ORDER BY src, gid, k1, k2
"""


def q_extreme_aggs(spark, sf):
    """min_by / max_by (supplier) AND deterministic mode (documents) in one
    tagged union (§2.4). Built-in mode() breaks ties engine-specifically,
    so the mode tiebreak is explicit: highest count, then smallest lang."""
    s = T(spark, sf, "supplier")
    minmax = (
        s.groupBy("s_nationkey")
        .agg(
            F.max_by("s_name", "s_acctbal").alias("v1"),
            F.min_by("s_name", "s_acctbal").alias("v2"),
        )
        .select(
            F.lit("minmax").alias("src"),
            F.col("s_nationkey").cast("string").alias("k"),
            "v1",
            "v2",
        )
    )
    d = T(spark, sf, "documents")
    counts = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    w = Window.partitionBy("source").orderBy(F.desc("c"), "lang")
    top = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    totals = d.groupBy("source").agg(F.count("*").alias("n"))
    mode = (
        top.select("source", F.col("lang").alias("top_lang"))
        .join(totals, "source")
        .select(
            F.lit("mode").alias("src"),
            F.col("source").alias("k"),
            F.col("top_lang").alias("v1"),
            F.col("n").cast("string").alias("v2"),
        )
    )
    return minmax.unionByName(mode).orderBy("src", "k")


SQL_EXTREME_AGGS = """
SELECT 'minmax' AS src, s_nationkey::VARCHAR AS k,
       arg_max(s_name, s_acctbal) AS v1, arg_min(s_name, s_acctbal) AS v2
FROM supplier GROUP BY s_nationkey
UNION ALL
SELECT 'mode' AS src, t.source AS k, t.top_lang AS v1, n::VARCHAR AS v2
FROM (
  SELECT source, lang AS top_lang,
         row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
  FROM documents GROUP BY source, lang) t
JOIN (SELECT source, count(*) AS n FROM documents GROUP BY source) s2
  ON t.source = s2.source
WHERE rn = 1 ORDER BY src, k
"""


def q_approx_sketches(spark, sf):
    """Approximate-distinct family in one row (§2.4): HLL++ scalar
    (approx_count_distinct) AND mergeable HLL sketches (hll_sketch_agg →
    hll_union_agg → estimate — the seen-set sizing path at 10^10), next to
    the exact count. No SQL oracle (approximate by design; driver records
    the rows-only check); a sanity bound is asserted in unit tests."""
    l = T(spark, sf, "lineitem")
    scalar = l.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    merged = (
        l.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_union_orders"))
    )
    return scalar.crossJoin(merged)


# --------------------------------------------------------------------------
# sorts / limits / set ops
# --------------------------------------------------------------------------

def q_topk_global(spark, sf):
    """TakeOrderedAndProject: global top-k without a full sort."""
    l = T(spark, sf, "lineitem")
    return (
        l.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


SQL_TOPK = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
"""


def q_setops(spark, sf):
    """union / intersect / except over customer key sets."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders")
    buyers = o.select(F.col("o_custkey").alias("k")).distinct()
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    return (
        buyers.intersect(building)
        .union(rich.exceptAll(buyers))
        .distinct()
        .orderBy("k")
    )


SQL_SETOPS = """
SELECT k FROM (
  (SELECT DISTINCT o_custkey AS k FROM orders
   INTERSECT SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
  UNION
  (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
   EXCEPT ALL SELECT DISTINCT o_custkey AS k FROM orders)
) ORDER BY k
"""


# --------------------------------------------------------------------------
# scalar function families (string / date / json / array / conditional)
# --------------------------------------------------------------------------

def q_string_funcs(spark, sf):
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_u"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.when(F.col("p_name").startswith("a"), 1).otherwise(0).alias("starts_a"),
    )


SQL_STRING = """
SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name, 1, 5) AS name5,
       length(p_name) AS name_len,
       concat_ws('-', p_brand, p_type) AS brand_type,
       coalesce(regexp_extract(p_type, '^(\\w+)', 1), '') AS type_head,
       CASE WHEN p_name LIKE 'a%' THEN 1 ELSE 0 END AS starts_a
FROM part
"""


def q_date_funcs(spark, sf):
    o = T(spark, sf, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("month")
    )


SQL_DATE = """
SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1 ORDER BY month
"""


def q_event_windows(spark, sf):
    """TUMBLING + SLIDING event-time windows in one tagged union (§2.9).
    Tumbling: F.window(ts, '1 hour'). Sliding ('rolling fetch-rate'):
    F.window(ts, '10 minutes', '1 minute') — each event lands in 10
    overlapping windows; the oracle mirrors the slide by exploding each
    event into its 10 epoch-aligned window starts."""
    e = T(spark, sf, "events")
    tumble = (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.lit("tumbling").alias("kind"), F.col("w.start").alias("win_start"), "n", "sum_value")
    )
    slide = (
        e.groupBy(F.window("ts", "10 minutes", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.lit("sliding").alias("kind"), F.col("w.start").alias("win_start"), "n", "sum_value")
    )
    return tumble.unionByName(slide).orderBy("kind", "win_start")


SQL_EVENT_WINDOWS = """
SELECT 'tumbling' AS kind, date_trunc('hour', ts) AS win_start,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 2
UNION ALL
SELECT 'sliding' AS kind,
       date_trunc('minute', ts) - (k * INTERVAL 1 MINUTE) AS win_start,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events, UNNEST(range(10)) AS u(k)
GROUP BY 2 ORDER BY kind, win_start
"""


def q_session_window(spark, sf):
    """Session windows per user (30-min idle gap): F.session_window vs the
    SQL gaps-and-islands encoding — same sessions, same aggregates. Spark
    session windows are END-EXCLUSIVE (a gap of exactly 30 min starts a new
    session), so the SQL's new-session predicate is >=, not >."""
    e = T(spark, sf, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .orderBy("user_id", "session_start")
    )


SQL_SESSION_WINDOW = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sessions GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def q_json_funcs(spark, sf):
    """json family (§2.8): path extraction (get_json_object) AND schema'd
    parsing (from_json → typed struct field) in one plan."""
    e = T(spark, sf, "events")
    parsed = F.from_json("props", "k INT")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
            parsed.getField("k").alias("k_typed"),
        )
        .filter(F.col("k_val") > 50)
    )


SQL_JSON = """
SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k_val,
       json_extract_string(props, '$.k')::INT AS k_typed
FROM events WHERE json_extract_string(props, '$.k')::BIGINT > 50
"""


def q_collection_funcs(spark, sf):
    """Array + map families over embeddings (§2.8): size / element /
    higher-order aggregate (JVM-side), plus MapType round-trips
    (map_from_arrays / element_at / map_keys — the header-map pattern).
    The oracle validates the round-tripped VALUES (DuckDB need not build
    the map to check them)."""
    v = T(spark, sf, "embeddings")
    m = F.map_from_arrays(
        F.array(F.lit("id"), F.lit("dim")),
        F.array(F.col("vec_id").cast("string"), F.size("embedding").cast("string")),
    )
    return v.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 5).alias("first_val"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            ),
            5,
        ).alias("sq_norm"),
        F.element_at(m, "id").alias("map_id"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


SQL_COLLECTION = """
SELECT vec_id, len(embedding) AS dim,
       round(embedding[1]::DOUBLE, 5) AS first_val,
       round(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'), 5) AS sq_norm,
       vec_id::VARCHAR AS map_id, 2 AS n_keys
FROM embeddings
"""


def q_conditional(spark, sf):
    c = T(spark, sf, "customer")
    return (
        c.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "neg")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("high")
            .alias("bal_bucket"),
        )
        .groupBy("bal_bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bal_bucket")
    )


SQL_CONDITIONAL = """
SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_bucket,
       count(*) AS n
FROM customer GROUP BY 1 ORDER BY bal_bucket
"""


def q_correlated_scalar(spark, sf):
    """Decorrelated scalar subquery: parts above their brand's mean price."""
    p = T(spark, sf, "part")
    brand_avg = p.groupBy("p_brand").agg(F.avg("p_retailprice").alias("brand_avg"))
    return (
        p.join(F.broadcast(brand_avg), "p_brand")
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice")
    )


SQL_CORRELATED = """
SELECT p_partkey, p_brand, p_retailprice FROM part p
WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part p2
                       WHERE p2.p_brand = p.p_brand)
"""


def q_range_join(spark, sf):
    """Equi + range predicate: lineitems shipped within 30 days of order."""
    o = T(spark, sf, "orders")
    l = T(spark, sf, "lineitem")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate >= o.o_orderdate)
            & (l.l_shipdate <= F.date_add(o.o_orderdate, 30)),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_fast"))
        .orderBy("o_orderpriority")
    )


SQL_RANGE_JOIN = """
SELECT o_orderpriority, count(*) AS n_fast
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES: dict[str, tuple[Callable, str | None]] = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING),
    "filter_project": (q_filter_project, SQL_FILTER_PROJECT),
    "join_agg": (q_join_agg, SQL_JOIN_AGG),
    "broadcast_chain": (q_broadcast_chain, SQL_BROADCAST_CHAIN),
    "semi_join": (q_semi_join, SQL_SEMI),
    "anti_join": (q_anti_join, SQL_ANTI),
    "nonequi_join": (q_nonequi_join, SQL_NONEQUI),
    "range_join": (q_range_join, SQL_RANGE_JOIN),
    "window_topk_per_group": (q_window_topk_per_group, SQL_WINDOW_TOPK),
    "window_funcs": (q_window_funcs, SQL_WINDOW_FUNCS),
    "asof_latest": (q_asof_latest, SQL_ASOF),
    "grouping_analytics": (q_grouping_analytics, SQL_GROUPING_ANALYTICS),
    "extreme_aggs": (q_extreme_aggs, SQL_EXTREME_AGGS),
    "approx_sketches": (q_approx_sketches, None),
    "topk_global": (q_topk_global, SQL_TOPK),
    "setops": (q_setops, SQL_SETOPS),
    "string_funcs": (q_string_funcs, SQL_STRING),
    "date_funcs": (q_date_funcs, SQL_DATE),
    "event_windows": (q_event_windows, SQL_EVENT_WINDOWS),
    "session_window": (q_session_window, SQL_SESSION_WINDOW),
    "json_funcs": (q_json_funcs, SQL_JSON),
    "collection_funcs": (q_collection_funcs, SQL_COLLECTION),
    "conditional": (q_conditional, SQL_CONDITIONAL),
    "correlated_scalar": (q_correlated_scalar, SQL_CORRELATED),
}



def q_math_funcs(spark, sf):
    """math family: log1p / pmod / pow / sqrt / ceil / floor / sign."""
    l = T(spark, sf, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.log1p("l_extendedprice"), 6).alias("log1p_price"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("bucket7"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).cast("long").alias("tax_pct_floor"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("qty_side"),
    )


SQL_MATH = """
SELECT l_orderkey, l_linenumber,
       round(ln(1 + l_extendedprice), 6) AS log1p_price,
       l_orderkey % 7 AS bucket7,
       round(sqrt(l_quantity), 6) AS sqrt_qty,
       ceil(l_discount * 100)::BIGINT AS disc_pct_ceil,
       floor(l_tax * 100)::BIGINT AS tax_pct_floor,
       sign(l_quantity - 25)::INT AS qty_side
FROM lineitem
"""


def q_stats_funcs(spark, sf):
    """Statistical aggregates (§2.4 breadth): stddev/variance/corr/covar
    plus exact interpolating percentiles (median / p90), per group."""
    l = T(spark, sf, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 5).alias("sd_qty"),
            F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_tax"), 6).alias("covar_qty_tax"),
            F.round(F.percentile("l_extendedprice", 0.5), 4).alias("median_price"),
            F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


SQL_STATS = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 5) AS sd_qty,
       round(var_samp(l_discount), 8) AS var_disc,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_tax), 6) AS covar_qty_tax,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""




# --------------------------------------------------------------------------
# iterative link-graph analytics (frontier priority scoring)
# --------------------------------------------------------------------------

def q_link_pagerank(spark, sf):
    """Link-graph PageRank — 3 unrolled power iterations, damping 0.85 —
    the iterative-algorithm class a crawler uses to score frontier
    priority beyond BFS depth. Each iteration is ONE shuffle: join ranks
    onto the edge list by src, hash-aggregate contributions by dst
    (partial+final), recombine with the teleport term; at 10^10 edges the
    edge list is pre-partitioned by src and the rank table by dst, so the
    join reuses a stable partitioning across iterations. The deterministic
    synthetic edge list (each doc links to 3 arithmetic peers mod N) is
    constructible in plain SQL, so even the ITERATIVE loop is value-checked
    against the DuckDB oracle (unrolled CTEs)."""
    d = T(spark, sf, "documents").select("doc_id")
    n = d.count()  # scalar; the oracle uses a count(*) scalar subquery
    edges = None
    for a, b in ((7, 1), (13, 2), (31, 3)):
        e = d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * a + b) % n).alias("dst"),
        )
        edges = e if edges is None else edges.unionByName(e)
    ranks = d.select(F.col("doc_id").alias("nid"), F.lit(1.0 / n).alias("rank"))
    for _ in range(3):
        contrib = (
            edges.join(ranks.withColumnRenamed("nid", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / 3).alias("c"))
        )
        ranks = (
            d.select(F.col("doc_id").alias("nid"))
            .join(contrib.withColumnRenamed("dst", "nid"), "nid", "left")
            .select(
                "nid",
                (F.lit(0.15 / n) + F.lit(0.85) * F.coalesce("c", F.lit(0.0))).alias("rank"),
            )
        )
    return (
        ranks.select(F.col("nid").alias("doc_id"), F.round("rank", 9).alias("pagerank"))
        .orderBy("doc_id")
    )


def _sql_pagerank() -> str:
    nn = "(SELECT count(*) FROM documents)"
    edges = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id*{a}+{b}) % {nn} AS dst FROM documents"
        for a, b in ((7, 1), (13, 2), (31, 3))
    )
    out = [f"WITH edges AS ({edges}),",
           f"r0 AS (SELECT doc_id AS nid, 1.0/{nn} AS rank FROM documents)"]
    for k in range(3):
        out.append(
            f""", r{k + 1} AS (
  SELECT d.doc_id AS nid, 0.15/{nn} + 0.85 * coalesce(c.c, 0) AS rank
  FROM documents d LEFT JOIN (
    SELECT e.dst, sum(r.rank/3) AS c
    FROM edges e JOIN r{k} r ON r.nid = e.src GROUP BY e.dst) c
  ON c.dst = d.doc_id)"""
        )
    out.append("SELECT nid AS doc_id, round(rank, 9) AS pagerank FROM r3 ORDER BY doc_id")
    return "\n".join(out)


SQL_PAGERANK = _sql_pagerank()


QUERIES.update(
    {
        "math_funcs": (q_math_funcs, SQL_MATH),
        "stats_funcs": (q_stats_funcs, SQL_STATS),
        "link_pagerank": (q_link_pagerank, SQL_PAGERANK),
    }
)
