package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.operators.Relational.roundp

/** Relational/analytic coverage over the TPC-H-ish tables: scan+aggregate,
  * multi-way joins with broadcast dims, semi/anti joins, distinct
  * aggregation. These are the 100 TB-shaped plans: filters/projections reach
  * the parquet scan, dimension joins broadcast, fact-fact joins shuffle on
  * the join key, aggregates combine map-side.
  *
  * Float discipline: every floating aggregate goes through the portable
  * `roundp` fixed-point rounding (see [[graft.operators.Relational.roundp]])
  * mirrored verbatim as `floor(x*10^n+0.5)/10^n` in the oracle, with the
  * scale chosen ≥ the exact decimal width of the data so ULP-level
  * accumulation-order differences can't flip the driver's hash compare.
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1-shaped pricing summary: single scan, map-side partial agg.
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          roundp(sum(col("l_quantity")), 2).as("sum_qty"),
          roundp(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          roundp(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          roundp(avg(col("l_quantity")), 4).as("avg_qty"),
          roundp(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // Multi-way star join: fact lineitem ⋈ orders shuffles on orderkey;
    // customer/nation are broadcast (dimension-sized at every SF).
    "q_join_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          roundp(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Full outer join: per-customer order stats keeping BOTH orphan sides
    // (customers with no orders, orders whose customer fell outside a
    // filtered dimension) — the reconciliation shape. Shuffled hash join
    // on the key; no broadcast (both sides must keep their null-extended
    // rows).
    "q_full_outer" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_acctbal"))
      val o = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 250000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_acctbal"), col("n_big_orders"))
    }),

    // The manual skew guard in the gated surface: lineitem ⋈ supplier
    // executed through Relational.saltedJoin (big side salted into 8
    // deterministic sub-keys, supplier replicated once per salt), then
    // aggregated per nation. The oracle is the PLAIN join — salting must
    // be result-invariant, and a hash mismatch here means the salt leaked
    // into the semantics (the SPARK-23207 failure class the deterministic
    // salt exists to prevent).
    "q_salted_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      Relational.saltedJoin(li, sup, "l_suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          roundp(sum(col("l_extendedprice")), 2).as("revenue"))
    }),

    // Left-semi join (EXISTS): customers with at least one open order.
    "q_semi_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    }),

    // Left-anti join (NOT EXISTS): customers with no large order.
    "q_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), roundp(col("c_acctbal"), 2).as("acctbal"))
    }),

    // Distinct aggregation per segment (two-phase distinct under the hood).
    "q_distinct_agg" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          roundp(sum(col("o_totalprice")), 2).as("total"))
    }),

    // Sort + limit (the reference's lazy `take n` acts as LIMIT on
    // example mains, Taxi.hs:194-217): global top-20 by price with a
    // deterministic tiebreak. TopK-via-sort: Spark plans this as a
    // TakeOrderedAndProject (per-partition top-20 + merge), not a full sort.
    "q_sort_limit" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), roundp(col("o_totalprice"), 2).as("totalprice"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(20)),

    // As-of join as an engine primitive (absent from the reference,
    // SURVEY §2.6): each purchase event enriched with the user's most
    // recent at-or-before click. Join-free plan — one union + one keyed
    // window pass (see Relational.asofJoin); inner semantics via the
    // null-payload filter.
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
      Relational.asofJoin(purchases, clicks, key = "user_id", ts = "ts",
          rightCols = Seq("click_id", "click_ts"), rightOrder = Some("click_id"))
        .filter(col("click_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("click_id"), col("click_ts"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
    }),

    // Range (interval) join as an engine primitive: error events paired
    // with same-user view events within ±3 hours. Banded plan (see
    // Relational.rangeJoin): equi-join on (user, time-band) — never the
    // per-key cartesian a naive key-join + time filter materializes.
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("ts").as("view_ts"))
      Relational.rangeJoin(errors, views, key = "user_id", ts = "ts",
          toleranceMs = 3L * 3600 * 1000, rightCols = Seq("view_id", "view_ts"))
        .select(col("error_id"), col("view_id"), col("user_id"), col("ts"),
          (unix_micros(col("view_ts")) - unix_micros(col("ts"))).as("delta_us"))
    }),

    // Correlated-style aggregate filter: orders above their customer's
    // average order value (join against a pre-aggregated per-customer avg —
    // the decorrelated plan Catalyst would aim for).
    "q_above_avg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val avgPer = o.groupBy(col("o_custkey").as("k"))
        .agg(avg(col("o_totalprice")).as("cust_avg"))
      o.join(avgPer, col("o_custkey") === col("k"))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"),
          roundp(col("o_totalprice"), 2).as("totalprice"),
          roundp(col("cust_avg"), 4).as("cust_avg"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
        |       floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000 AS sum_disc_price,
        |       floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty,
        |       floor(avg(l_discount) * 10000 + 0.5) / 10000 AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_revenue" ->
      """SELECT n_name,
        |       floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5) / 10000 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_full_outer" ->
      """WITH c AS (SELECT c_custkey, c_acctbal FROM customer
        |           WHERE c_mktsegment = 'BUILDING'),
        |o AS (SELECT o_custkey, count(*) AS n_big_orders FROM orders
        |      WHERE o_totalprice > 250000 GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_acctbal, n_big_orders
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey""".stripMargin,

    // the plain join: the salted execution must be result-identical
    "q_salted_join" ->
      """SELECT s_nationkey, count(*) AS n,
        |       floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, floor(c_acctbal * 100 + 0.5) / 100 AS acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "q_distinct_agg" ->
      """SELECT c_mktsegment,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       count(*) AS n_orders,
        |       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) / 100 AS totalprice
        |FROM orders ORDER BY totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    // DuckDB's native ASOF JOIN is the independent formulation: it picks
    // the single greatest c.ts <= p.ts per left row — same contract the
    // union-trick window computes. (user_id, ts) is unique in the data,
    // so the rightOrder tiebreak never fires and both engines agree.
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, p.ts, p.value,
        |       c.event_id AS click_id, c.ts AS click_ts,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    // the oracle is the naive inequality join — fine at sf0.01, and an
    // independent formulation of the banded plan's semantics
    "q_range_join" ->
      """SELECT e.event_id AS error_id, v.event_id AS view_id,
        |       e.user_id, e.ts,
        |       epoch_us(v.ts) - epoch_us(e.ts) AS delta_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON e.user_id = v.user_id
        | AND abs(epoch_us(e.ts) - epoch_us(v.ts)) <= 10800000000""".stripMargin,

    "q_above_avg" ->
      """SELECT o_orderkey, o_custkey,
        |       floor(o_totalprice * 100 + 0.5) / 100 AS totalprice,
        |       floor(cust_avg * 10000 + 0.5) / 10000 AS cust_avg
        |FROM orders
        |JOIN (SELECT o_custkey AS k, avg(o_totalprice) AS cust_avg
        |      FROM orders GROUP BY o_custkey) a
        |  ON o_custkey = k
        |WHERE o_totalprice > cust_avg""".stripMargin
  )
}
