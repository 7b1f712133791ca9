package graft.analytics

import graft.{dec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational query surface under the pipelines: the analytics a user
  * of the reference runs against replicated tables. Declarative DataFrame
  * plans — Catalyst handles pushdown/pruning/join selection; small dims are
  * broadcast explicitly.
  */
object Relational {

  private def lineitemWithDec(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .withColumn("qty_d", dec(col("l_quantity")))
      .withColumn("price_d", dec(col("l_extendedprice")))
      .withColumn("disc_d", dec(col("l_discount")))
      .withColumn("tax_d", dec(col("l_tax")))

  /** TPC-H Q1-style pricing summary: group-agg with exact decimal sums. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    lineitemWithDec(spark, dir)
      .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty_d")).cast(DecimalType(28, 2)).as("sum_qty_d"),
        sum(col("price_d")).cast(DecimalType(28, 2)).as("sum_base_price_d"),
        sum(col("price_d") * (lit(1) - col("disc_d"))).cast(DecimalType(30, 4)).cast("double").as("sum_disc_price"),
        sum(col("price_d") * (lit(1) - col("disc_d")) * (lit(1) + col("tax_d"))).cast(DecimalType(32, 6)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty_d").cast("double") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price_d").cast("double") / col("count_order"))
      // Exact decimal sums internally; DOUBLE in the final projection (both
      // sides cast the same exact decimal → identical float64 bits).
      .withColumn("sum_qty", col("sum_qty_d").cast("double"))
      .withColumn("sum_base_price", col("sum_base_price_d").cast("double"))
      .drop("sum_qty_d", "sum_base_price_d")
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: customer⋈orders⋈lineitem, revenue per order, top-10. */
  def q3TopK(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val orders = Tables.load(spark, dir, "orders").where(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val lineitem = lineitemWithDec(spark, dir).where(col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("price_d") * (lit(1) - col("disc_d"))).cast(DecimalType(30, 4)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style 6-table star join; dims broadcast. */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").where(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val customer = Tables.load(spark, dir, "customer")
    val supplier = Tables.load(spark, dir, "supplier")
    val orders = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
             col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val lineitem = lineitemWithDec(spark, dir)
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("price_d") * (lit(1) - col("disc_d"))).cast(DecimalType(30, 4)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q7 shape: shipping volume between two nations by year, both
    * directions. Nation filter pushes into both broadcast sides before the
    * fact joins; one hash aggregation on (supp_nation, cust_nation, year). */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val pair = Set("NATION_0", "NATION_1", "NATION_2", "NATION_3")
    val n1 = Tables.load(spark, dir, "nation")
      .where(col("n_name").isin(pair.toSeq: _*))
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.load(spark, dir, "nation")
      .where(col("n_name").isin(pair.toSeq: _*))
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val supplier = Tables.load(spark, dir, "supplier")
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    lineitemWithDec(spark, dir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("price_d") * (lit(1) - col("disc_d")))
          .cast(DecimalType(30, 4)).cast("double").as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |       count(*) AS n_items,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(30,4)) AS DOUBLE) AS volume
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
      |  AND n2.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q10 shape: top 20 customers by revenue lost to returned items.
    * Selective returnflag filter reaches the lineitem scan; the top-k is
    * TakeOrderedAndProject over the aggregated (small) result. */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val orders = Tables.load(spark, dir, "orders")
    lineitemWithDec(spark, dir)
      .where(col("l_returnflag") === "R")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      // customer grows with SF (unlike nation) — no forced broadcast; the
      // optimizer/AQE picks broadcast whenever it actually fits
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_returned_items"),
        sum(col("price_d") * (lit(1) - col("disc_d")))
          .cast(DecimalType(30, 4)).cast("double").as("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnsSql: String =
    """SELECT c_custkey, c_name, n_name,
      |       count(*) AS n_returned_items,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(30,4)) AS DOUBLE) AS lost_revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY lost_revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Window rank: top-3 orders by total price within each market segment. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy("c_mktsegment").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      // unfiltered customer scales with SF: let the optimizer decide
      .join(customer, col("o_custkey") === col("c_custkey"))
      .withColumn("rnk", rank().over(w))
      .where(col("rnk") <= 3)
      .select(col("c_mktsegment"), col("rnk").cast("long").as("rnk"), col("o_orderkey"), dec(col("o_totalprice"), 18, 2).cast("double").as("o_totalprice"))
      .orderBy("c_mktsegment", "rnk", "o_orderkey")
  }

  /** Semi + anti join: per segment, customers with vs without orders. */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val withOrders = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    val withoutOrders = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
      .na.fill(0, Seq("n_with_orders", "n_without_orders"))
      .orderBy("c_mktsegment")
  }

  /** Multi-aggregate stats per order status. */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"),
        sum(dec(col("o_totalprice"))).cast(DecimalType(28, 2)).as("total_price_d"))
      .withColumn("avg_price", col("total_price_d").cast("double") / col("n_orders"))
      .withColumn("total_price", col("total_price_d").cast("double"))
      .drop("total_price_d")
      .orderBy("o_orderstatus")

  /** Hierarchical rollup: region → nation subtotals over customers. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast(DecimalType(28, 2)).cast("double").as("total_acctbal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  /** Pivot: customers per (region, market segment), segments as columns. */
  def pivotSegments(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .pivot("c_mktsegment", segs)
      .agg(count(lit(1)))
      .na.fill(0, segs)
      .orderBy("r_name")
  }

  /** EXISTS-style (TPC-H Q4): orders with a lineitem shipped after the
    * order date, counted per priority. */
  def existsLateShip(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders
      .join(lineitem,
        col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Correlated scalar subquery (TPC-H Q17 shape): revenue of lineitems
    * whose quantity is below half their part's average quantity. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitemWithDec(spark, dir)
    val partAvg = li.groupBy(col("l_partkey").as("p_key"))
      .agg((sum(col("qty_d")).cast(DecimalType(28, 2)).cast("double") / count(lit(1))).as("avg_qty"))
    li.join(partAvg, col("l_partkey") === col("p_key"))
      .where(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(
        sum(col("price_d")).cast(DecimalType(28, 2)).cast("double").as("total_price"),
        count(lit(1)).as("n_items"))
  }

  /** Set operations: customers active in 1996 ∩/∖ 1997. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    def activeIn(y: Int) = orders
      .where(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp_ntz") &&
             col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp_ntz"))
      .select(col("o_custkey")).distinct()
    // One lazy plan: full-outer flag join classifies each customer, then a
    // single aggregation — equivalent to INTERSECT/EXCEPT counts.
    val flags = activeIn(1996).withColumn("in96", lit(true))
      .join(activeIn(1997).withColumn("in97", lit(true)), Seq("o_custkey"), "full_outer")
    val counted = flags
      .select(
        when(col("in96").isNotNull && col("in97").isNotNull, "both_years")
          .when(col("in96").isNotNull, "only_1996")
          .otherwise("only_1997").as("cohort"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n_customers"))
    // the oracle's three UNION ALL'd scalar counts always emit 3 rows —
    // an empty cohort must surface as an explicit 0, not a missing row
    val allCohorts = spark.createDataFrame(
      Seq(Tuple1("both_years"), Tuple1("only_1996"), Tuple1("only_1997"))).toDF("cohort")
    allCohorts.join(counted, Seq("cohort"), "left")
      .select(col("cohort"), coalesce(col("n_customers"), lit(0L)).as("n_customers"))
      .orderBy("cohort")
  }

  /** Gap-based sessionization: a >30-minute silence starts a new session
    * (stream-analytics staple; windows partition by user, never global). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"),
        max(col("ts")).as("t_end"))
      .orderBy("user_id", "session_id")
  }

  /** Salted hot-key join — the skew-mitigation algebra as an
    * oracle-checked operator: the fact side is keyed to 5 synthetic hot
    * groups (user_id % 5 — each key holds a fifth of the stream, the
    * shape that melts one reducer in a plain hash join), so the join
    * runs salted: the fact side adds a deterministic salt (seq % 8) and
    * the 5-row dimension is replicated ×8, turning each hot key into 8
    * co-sized (key, salt) buckets. The oracle computes the UNSALTED
    * join — passing proves the salting is semantics-preserving, which
    * is the entire point of the technique.
    *
    * Determinism: the per-key rollup aggregates exact longs (value
    * quantized to millis before summing — a raw double sum would be
    * partition-order-dependent, and salting exists to change the
    * partitioning). */
  def saltedJoin(spark: SparkSession, dir: String, salts: Int = 8): DataFrame =
    saltedJoinOf(
      Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 1000.0).cast("long").as("v_millis")),
      nKeys = 5, salts = salts)

  /** The salted algebra over an arbitrary (user_id, event_id, v_millis)
    * fact frame — factored out so the property fuzz can prove
    * semantics-preservation for random key skews and salt counts. */
  def saltedJoinOf(ev0: DataFrame, nKeys: Int, salts: Int): DataFrame = {
    val spark = ev0.sparkSession
    val ev = ev0.select((col("user_id") % nKeys).as("k"),
      (col("event_id") % salts).as("salt"), col("v_millis"))
    // one Range leaf enumerates the (key × salt) replication directly —
    // no join at all in the dimension build
    val dimSalted = spark.range(nKeys.toLong * salts).select(
      (col("id") / salts).cast("long").as("k"),
      (col("id") % salts).as("salt"),
      ((col("id") / salts).cast("long") * 100L + 7L).as("w"))
    ev.join(broadcast(dimSalted), Seq("k", "salt"))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_events"),
        max(col("w")).as("w"),
        sum(col("v_millis")).as("v_millis_sum"))
      .orderBy("k")
  }

  val saltedJoinSql: String =
    """WITH ev AS (
      |  SELECT user_id % 5 AS k, CAST(floor(value * 1000.0) AS BIGINT) AS v_millis
      |  FROM events),
      |dim AS (SELECT i AS k, i * 100 + 7 AS w FROM (SELECT unnest(range(0, 5)) AS i))
      |SELECT ev.k, count(*) AS n_events,
      |       CAST(max(dim.w) AS BIGINT) AS w,
      |       CAST(sum(v_millis) AS BIGINT) AS v_millis_sum
      |FROM ev JOIN dim ON ev.k = dim.k
      |GROUP BY ev.k ORDER BY ev.k""".stripMargin

  /** First-vs-last order trajectory per market segment — the
    * first_value/last_value semantics WITHOUT a window: each customer's
    * first and last order (by date, orderkey tiebreak) come from one
    * struct-min/max aggregation (the (date, key) prefix is unique, so
    * the extremum is total), and the segment rollup reports how many
    * customers changed priority between them and the exact-decimal net
    * spend drift (last minus first order value).
    *
    * Scale shape: one per-customer HASH aggregation (graft_min_by /
    * graft_max_by argmax, ObjectHashAggregate — partials combine
    * map-side), a co-partitioned key join to customer, and a ≤|segments|
    * rollup — no per-customer ordering window anywhere. */
  def firstLast(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val ev = struct(col("o_orderpriority").as("prio"), dec(col("o_totalprice")).as("price"))
    val ord = struct(col("o_orderdate"), col("o_orderkey"))
    val perCust = orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.GraftFunctions.minByCol(orders, ev, ord).as("f"),
        graft.functions.GraftFunctions.maxByCol(orders, ev, ord).as("l"))
      .select(col("o_custkey"), col("n_orders"),
        col("f.prio").as("first_prio"), col("l.prio").as("last_prio"),
        (col("l.price") - col("f.price")).as("drift_d"))
    perCust
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") >= 2, lit(1L)).otherwise(lit(0L))).as("n_repeat"),
        sum(when(col("first_prio") =!= col("last_prio"), lit(1L)).otherwise(lit(0L)))
          .as("n_priority_changed"),
        sum(col("drift_d")).cast(DecimalType(28, 2)).cast("double").as("net_spend_drift"))
      .orderBy("c_mktsegment")
  }

  val firstLastSql: String =
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderpriority, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn_f,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_l,
      |         count(*) OVER (PARTITION BY o_custkey) AS n_orders
      |  FROM orders),
      |pc AS (
      |  SELECT f.o_custkey, f.n_orders,
      |         f.o_orderpriority AS first_prio, l.o_orderpriority AS last_prio,
      |         l.price - f.price AS drift_d
      |  FROM (SELECT * FROM ranked WHERE rn_f = 1) f
      |  JOIN (SELECT * FROM ranked WHERE rn_l = 1) l USING (o_custkey))
      |SELECT c_mktsegment,
      |       count(*) AS n_customers,
      |       CAST(sum(CASE WHEN pc.n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
      |       CAST(sum(CASE WHEN first_prio <> last_prio THEN 1 ELSE 0 END) AS BIGINT) AS n_priority_changed,
      |       CAST(CAST(sum(drift_d) AS DECIMAL(28,2)) AS DOUBLE) AS net_spend_drift
      |FROM pc JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Deterministic per-group mode — the MODE aggregate with an explicit
    * tie policy (highest count, then lexicographically LAST value), which
    * engine-native mode() functions leave unspecified: per order
    * priority, the most common lineitem return flag with its count and
    * group share. Two hash aggregations and a ≤|priorities×modes|-row
    * argmax via struct-max — no window, no shuffle beyond the group
    * keys.
    *
    * Tie policy note: the struct(cnt, value) ordering key breaks count
    * ties toward the LARGER value on both engines — pinned here so
    * replication between engines can diff the result byte-for-byte. */
  def modeReturnflag(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag"))
    val o = Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    val cells = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(count(lit(1)).as("cnt"))
    val totals = cells.groupBy("o_orderpriority").agg(sum(col("cnt")).as("n_rows"))
    cells
      .groupBy("o_orderpriority")
      .agg(graft.functions.GraftFunctions.maxByCol(cells,
        struct(col("cnt"), col("l_returnflag")),
        struct(col("cnt"), col("l_returnflag"))).as("m"))
      .join(totals, "o_orderpriority")
      .select(
        col("o_orderpriority"),
        col("m.l_returnflag").as("mode_returnflag"),
        col("m.cnt").as("mode_count"),
        col("n_rows"),
        (col("m.cnt").cast("double") / col("n_rows").cast("double")).as("mode_share"))
      .orderBy("o_orderpriority")
  }

  val modeReturnflagSql: String =
    """WITH cells AS (
      |  SELECT o_orderpriority, l_returnflag, count(*) AS cnt
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY o_orderpriority, l_returnflag),
      |totals AS (
      |  SELECT o_orderpriority, CAST(sum(cnt) AS BIGINT) AS n_rows
      |  FROM cells GROUP BY o_orderpriority),
      |best AS (
      |  SELECT o_orderpriority, l_returnflag, cnt,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |                            ORDER BY cnt DESC, l_returnflag DESC) AS rn
      |  FROM cells)
      |SELECT b.o_orderpriority, b.l_returnflag AS mode_returnflag,
      |       b.cnt AS mode_count, t.n_rows,
      |       CAST(b.cnt AS DOUBLE) / CAST(t.n_rows AS DOUBLE) AS mode_share
      |FROM best b JOIN totals t USING (o_orderpriority)
      |WHERE b.rn = 1
      |ORDER BY b.o_orderpriority""".stripMargin

  /** RFM customer segmentation — the classic marketing-analytics cube:
    * per customer, Recency (days since last order at the corpus' own
    * horizon), Frequency (order count) and Monetary (exact decimal
    * lifetime spend) are each scored 1–4 against their global quartile
    * boundaries, and the output is the 4×4×4 segment cube with customer
    * counts and segment spend.
    *
    * Determinism: quartile boundaries interpolate halves/quarters of
    * exact inputs identically on both engines; boundary comparisons see
    * the same doubles. Spend stays DECIMAL through the segment sum and
    * casts to double only in the final projection.
    *
    * Scale shape: one per-customer shuffle; the quartile row is a
    * broadcast scalar aggregate; scoring is per-row arithmetic and the
    * final aggregation carries ≤ 64 cells. */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val horizon = orders.agg(max(col("o_orderdate")).as("max_date"))
    // examined r19: pinning perCust (it feeds both the quartile agg and
    // the scoring pass) measured FLAT interleaved (0.87 raw vs 0.85 s
    // pinned median) — the per-customer rollup re-derivation is one
    // cheap scan+agg, not worth the checkpoint's executor storage.
    val perCust = orders
      .groupBy("o_custkey")
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(dec(col("o_totalprice"))).cast(DecimalType(28, 2)).as("monetary_d"))
      .crossJoin(broadcast(horizon))
      .select(
        col("o_custkey"),
        datediff(col("max_date").cast("date"), col("last_order").cast("date"))
          .cast("long").as("recency"),
        col("frequency"),
        col("monetary_d"),
        col("monetary_d").cast("double").as("monetary"))
    val qs = perCust.agg(
      expr("percentile(recency, 0.25)").as("r1"),
      expr("percentile(recency, 0.5)").as("r2"),
      expr("percentile(recency, 0.75)").as("r3"),
      expr("percentile(frequency, 0.25)").as("f1"),
      expr("percentile(frequency, 0.5)").as("f2"),
      expr("percentile(frequency, 0.75)").as("f3"),
      expr("percentile(monetary, 0.25)").as("m1"),
      expr("percentile(monetary, 0.5)").as("m2"),
      expr("percentile(monetary, 0.75)").as("m3"))
    def score(x: org.apache.spark.sql.Column, q1: String, q2: String, q3: String) =
      when(x <= col(q1), 1L).when(x <= col(q2), 2L).when(x <= col(q3), 3L).otherwise(4L)
    perCust.crossJoin(broadcast(qs))
      .select(
        score(col("recency").cast("double"), "r1", "r2", "r3").as("r_score"),
        score(col("frequency").cast("double"), "f1", "f2", "f3").as("f_score"),
        score(col("monetary"), "m1", "m2", "m3").as("m_score"),
        col("monetary_d"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("monetary_d")).cast(DecimalType(28, 2)).cast("double").as("segment_spend"))
      .orderBy("r_score", "f_score", "m_score")
  }

  val rfmSql: String =
    """WITH horizon AS (SELECT max(o_orderdate) AS max_date FROM orders),
      |pc AS (
      |  SELECT o_custkey,
      |         date_diff('day', CAST(max(o_orderdate) AS DATE), CAST((SELECT max_date FROM horizon) AS DATE)) AS recency,
      |         count(*) AS frequency,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS monetary_d,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY o_custkey),
      |qs AS (
      |  SELECT quantile_cont(CAST(recency AS DOUBLE), 0.25) AS r1,
      |         quantile_cont(CAST(recency AS DOUBLE), 0.5) AS r2,
      |         quantile_cont(CAST(recency AS DOUBLE), 0.75) AS r3,
      |         quantile_cont(CAST(frequency AS DOUBLE), 0.25) AS f1,
      |         quantile_cont(CAST(frequency AS DOUBLE), 0.5) AS f2,
      |         quantile_cont(CAST(frequency AS DOUBLE), 0.75) AS f3,
      |         quantile_cont(monetary, 0.25) AS m1,
      |         quantile_cont(monetary, 0.5) AS m2,
      |         quantile_cont(monetary, 0.75) AS m3
      |  FROM pc),
      |scored AS (
      |  SELECT CASE WHEN CAST(recency AS DOUBLE) <= r1 THEN 1 WHEN CAST(recency AS DOUBLE) <= r2 THEN 2
      |              WHEN CAST(recency AS DOUBLE) <= r3 THEN 3 ELSE 4 END AS r_score,
      |         CASE WHEN CAST(frequency AS DOUBLE) <= f1 THEN 1 WHEN CAST(frequency AS DOUBLE) <= f2 THEN 2
      |              WHEN CAST(frequency AS DOUBLE) <= f3 THEN 3 ELSE 4 END AS f_score,
      |         CASE WHEN monetary <= m1 THEN 1 WHEN monetary <= m2 THEN 2
      |              WHEN monetary <= m3 THEN 3 ELSE 4 END AS m_score,
      |         monetary_d
      |  FROM pc, qs)
      |SELECT CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
      |       CAST(m_score AS BIGINT) AS m_score,
      |       count(*) AS n_customers,
      |       CAST(CAST(sum(monetary_d) AS DECIMAL(28,2)) AS DOUBLE) AS segment_spend
      |FROM scored GROUP BY r_score, f_score, m_score
      |ORDER BY r_score, f_score, m_score""".stripMargin

  /** Inter-purchase gap analysis per market segment — the lag/lead
    * window family over a keyed business timeline: per customer, the
    * day gaps between consecutive orders (lag over a per-customer
    * window, orderkey tiebreak for same-day orders), rolled up to
    * segment-level repeat-rate and cadence numbers.
    *
    * Scale shape: the window partitions on o_custkey (bounded per-key
    * order counts, never a global sort); the per-customer aggregate
    * reuses the same hash partitioning, and the customer join is a
    * co-partitioned key join. The mean gap is one division of two
    * exact integer sums. */
  def orderGaps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val perCust = orders
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate").cast("date"), col("prev_date").cast("date")).cast("long"))
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        count(col("gap_days")).as("n_gaps"),
        sum(col("gap_days")).as("sum_gap"),
        max(col("gap_days")).as("max_gap"))
    perCust
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") >= 2, lit(1L)).otherwise(lit(0L))).as("n_repeat_customers"),
        sum(col("n_gaps")).as("n_gaps"),
        (sum(col("sum_gap")).cast("double") / sum(col("n_gaps")).cast("double")).as("avg_gap_days"),
        max(col("max_gap")).as("max_gap_days"))
      .orderBy("c_mktsegment")
  }

  val orderGapsSql: String =
    """WITH g AS (
      |  SELECT o_custkey, o_orderdate,
      |         lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
      |  FROM orders),
      |pc AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |         count(date_diff('day', CAST(prev_date AS DATE), CAST(o_orderdate AS DATE))) AS n_gaps,
      |         sum(date_diff('day', CAST(prev_date AS DATE), CAST(o_orderdate AS DATE))) AS sum_gap,
      |         max(date_diff('day', CAST(prev_date AS DATE), CAST(o_orderdate AS DATE))) AS max_gap
      |  FROM g GROUP BY o_custkey)
      |SELECT c_mktsegment,
      |       count(*) AS n_customers,
      |       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_customers,
      |       CAST(sum(n_gaps) AS BIGINT) AS n_gaps,
      |       CAST(sum(sum_gap) AS DOUBLE) / CAST(sum(n_gaps) AS DOUBLE) AS avg_gap_days,
      |       CAST(max(max_gap) AS BIGINT) AS max_gap_days
      |FROM pc JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** GROUPING SETS with explicit grouping indicators: (region, segment)
    * detail + per-region subtotal + grand total in one pass. Catalyst
    * expands grouping sets into a single Expand + hash aggregation — one
    * shuffle regardless of how many sets. gid disambiguates real NULLs
    * from subtotal NULLs (grouping(r)*2 + grouping(seg), portable). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    // Pure DataFrame plan (Dataset.groupingSets, Spark 4): no session-global
    // temp view, so concurrent callers on one SparkSession can't race on a
    // shared view name.
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("c_mktsegment")), Seq(col("r_name")), Seq.empty),
        col("r_name"), col("c_mktsegment"))
      .agg(
        (grouping(col("r_name")).cast("long") * 2 +
          grouping(col("c_mktsegment")).cast("long")).as("gid"),
        count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast(DecimalType(28, 2)).cast("double").as("total_acctbal"))
      .orderBy("gid", "r_name", "c_mktsegment")
  }

  val groupingSetsSql: String =
    """SELECT r_name, c_mktsegment,
      |       CAST(grouping(r_name) * 2 + grouping(c_mktsegment) AS BIGINT) AS gid,
      |       count(*) AS n_customers,
      |       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), ())
      |ORDER BY gid, r_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin

  /** 7-day moving average of daily order revenue: pre-aggregate to one
    * row per day (one shuffle), THEN run the frame window. The window's
    * single partition holds only calendar-day rows — bounded by date
    * range, not data volume, so the shape survives any SF. Frame sums
    * stay in exact decimal; the division is the only float op. */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast(DecimalType(28, 2)).as("dt"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("ma7",
        sum(col("dt")).over(w).cast(DecimalType(28, 2)).cast("double") /
          count(lit(1)).over(w).cast("double"))
      .select(col("day"), col("n_orders"), col("dt").cast("double").as("day_total"), col("ma7"))
      .orderBy("day")
  }

  val movingAvgSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS dt
      |  FROM orders GROUP BY day)
      |SELECT day, n_orders, CAST(dt AS DOUBLE) AS day_total,
      |       CAST(CAST(sum(dt) OVER w AS DECIMAL(28,2)) AS DOUBLE)
      |         / CAST(count(*) OVER w AS DOUBLE) AS ma7
      |FROM daily
      |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY day""".stripMargin

  /** Full CUBE over order status × priority: all four grouping
    * combinations in one Expand + hash aggregation pass (no re-scan per
    * subtotal level). Same single-shuffle shape as GROUPING SETS. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    // DataFrame cube, not SQL over a shared temp view (see groupingSets).
    Tables.load(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        (grouping(col("o_orderstatus")).cast("long") * 2 +
          grouping(col("o_orderpriority")).cast("long")).as("gid"),
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast(DecimalType(28, 2)).cast("double").as("revenue"))
      .orderBy("gid", "o_orderstatus", "o_orderpriority")

  val cubeAggSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
      |       count(*) AS n_orders,
      |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Exact interpolated percentiles (percentile_cont semantics) of order
    * value per priority class. Spark's `percentile` and DuckDB's
    * `quantile_cont` both interpolate linearly at (n-1)·p over the sorted
    * doubles, so the results are bit-identical. Exact percentiles need the
    * full value set per group — the group-by keys partition the shuffle;
    * for a 100 TB run the approx_percentile sketch is the drop-in
    * alternative when exactness is negotiable. */
  def percentileCont(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        max(col("o_totalprice")).as("p100"))
      .orderBy("o_orderpriority")

  val percentileContSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |       quantile_cont(o_totalprice, 0.25) AS p25,
      |       quantile_cont(o_totalprice, 0.5) AS p50,
      |       quantile_cont(o_totalprice, 0.9) AS p90,
      |       max(o_totalprice) AS p100
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Distribution-rank windows per segment: percent_rank, cume_dist and
    * quartile (ntile) of every customer's balance within its market
    * segment. The window ORDER BY carries c_custkey as a tiebreaker so
    * tied balances rank deterministically on both engines. Both rank
    * ratios are integer-count divisions in float64 — bit-identical. */
  def cumeNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    Tables.load(spark, dir, "customer")
      .select(
        col("c_mktsegment"), col("c_custkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  val cumeNtileSql: String =
    """SELECT c_mktsegment, c_custkey,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** Ordered string aggregation (LISTAGG surface): nations per region as
    * a sorted CSV. Sorting inside the aggregate makes the result
    * order-independent across partitions — the only portable way to
    * string-aggregate distributed. */
  def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_nations"),
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations_csv"))
      .orderBy("r_name")
  }

  val stringAggSql: String =
    """SELECT r_name, count(*) AS n_nations,
      |       string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Time-interval RANGE frame: revenue in the trailing 7 calendar days
    * per day — unlike the ROWS frame in [[movingAvg]], the frame bound is
    * event-time, so gaps in the calendar shrink the window. Runs over the
    * pre-aggregated daily table (bounded by date range, not data volume). */
  /** Per-brand Pareto frontier (skyline) over (price ↓, size ↑): the
    * parts no same-brand part dominates — cheaper-or-equal AND
    * larger-or-equal with at least one strict. The classic skyline
    * operator without the O(n²) dominance join: sort each brand by
    * (price asc, size desc, partkey), and a row is on the frontier iff
    * its size exceeds the running max over all STRICTLY preceding rows —
    * every preceding row has price ≤ this one, so a preceding max ≥ size
    * is precisely a dominator (same-price larger-size rows sort first
    * and dominate; exact (price, size) duplicates collapse to the lowest
    * partkey). One partitioned window, |brand| parallelism, scale-safe. */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("price").asc, col("size").desc, col("p_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"),
        col("p_retailprice").cast("double").as("price"),
        col("p_size").cast("long").as("size"))
      .withColumn("max_prev_size", max(col("size")).over(w))
      .where(col("max_prev_size").isNull || col("size") > col("max_prev_size"))
      .select("p_brand", "p_partkey", "price", "size")
      .orderBy("p_brand", "price", "p_partkey")
  }

  val skylineSql: String =
    """WITH p AS (
      |  SELECT p_brand, p_partkey, CAST(p_retailprice AS DOUBLE) AS price,
      |         CAST(p_size AS BIGINT) AS size
      |  FROM part),
      |m AS (
      |  SELECT p_brand, p_partkey, price, size,
      |         max(size) OVER (PARTITION BY p_brand
      |                         ORDER BY price ASC, size DESC, p_partkey ASC
      |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mps
      |  FROM p)
      |SELECT p_brand, p_partkey, price, size
      |FROM m WHERE mps IS NULL OR size > mps
      |ORDER BY p_brand, price, p_partkey""".stripMargin

  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    // DataFrame window, not SQL over a shared temp view (see groupingSets).
    // The interval RANGE frame becomes a numeric range over days-since-epoch
    // — identical semantics at daily granularity.
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast(DecimalType(28, 2)).as("dt"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")).cast("long"))
    val w = Window.orderBy("day_num").rangeBetween(-6, 0)
    daily
      .select(
        col("day"), col("n_orders"),
        col("dt").cast("double").as("day_total"),
        sum(col("dt")).over(w).cast(DecimalType(28, 2)).cast("double").as("trailing_7d"),
        count(lit(1)).over(w).as("n_days_in_frame"))
      .orderBy("day")
  }

  val rangeFrameSql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS dt
      |  FROM orders GROUP BY day)
      |SELECT day, n_orders,
      |       CAST(dt AS DOUBLE) AS day_total,
      |       CAST(CAST(sum(dt) OVER w AS DECIMAL(28,2)) AS DOUBLE) AS trailing_7d,
      |       count(*) OVER w AS n_days_in_frame
      |FROM daily
      |WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY day""".stripMargin

  /** UNPIVOT (wide → long): lineitem's four measure columns reshaped to
    * (measure, value) rows and aggregated per measure per return flag —
    * the inverse of [[pivotSegments]]. `stack` is a generator expression
    * (no shuffle for the reshape itself); the aggregate stays exact in
    * decimal. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    lineitemWithDec(spark, dir)
      .select(col("l_returnflag"),
        expr("stack(4, 'quantity', qty_d, 'price', price_d, 'discount', disc_d, 'tax', tax_d) AS (measure, v)"))
      .groupBy("l_returnflag", "measure")
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).cast(DecimalType(28, 2)).cast("double").as("total"))
      .orderBy("l_returnflag", "measure")

  val unpivotMeasuresSql: String =
    """WITH longf AS (
      |  SELECT l_returnflag, measure, CAST(v AS DECIMAL(12,2)) AS v
      |  FROM (
      |    SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v FROM lineitem
      |    UNION ALL SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
      |    UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem
      |    UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem))
      |SELECT l_returnflag, measure, count(*) AS n,
      |       CAST(CAST(sum(v) AS DECIMAL(28,2)) AS DOUBLE) AS total
      |FROM longf GROUP BY l_returnflag, measure
      |ORDER BY l_returnflag, measure""".stripMargin

  /** Forward fill (gap fill): missing sensor readings — synthesized
    * deterministically as every 5th event — carried forward from the
    * key's last known value via last_value IGNORE NULLS over the per-key
    * event-time order. The canonical time-series repair before windowed
    * aggregation; the window partitions on the key. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.load(spark, dir, "events")
      .withColumn("reading",
        when(col("event_id") % 5 === 0, lit(null).cast("double"))
          .otherwise(dec(col("value"), 18, 2).cast("double")))
      .withColumn("filled", last(col("reading"), ignoreNulls = true).over(w))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("reading")).as("n_present"),
        count(col("filled")).as("n_after_fill"),
        count(when(col("reading").isNull && col("filled").isNotNull, 1)).as("n_filled_in"))
      .orderBy("user_id")
  }

  val gapFillSql: String =
    """WITH r AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN event_id % 5 = 0 THEN NULL
      |              ELSE CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) END AS reading
      |  FROM events),
      |f AS (
      |  SELECT user_id, reading,
      |         last_value(reading IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS filled
      |  FROM r)
      |SELECT user_id, count(*) AS n_events,
      |       count(reading) AS n_present,
      |       count(filled) AS n_after_fill,
      |       count(CASE WHEN reading IS NULL AND filled IS NOT NULL THEN 1 END) AS n_filled_in
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Fixed-width histogram of order totals: pure integer bucketing (no
    * width_bucket dependency), min/max carried per bucket. One hash
    * aggregation; the bucket arithmetic is identical on both engines. */
  def histogram(spark: SparkSession, dir: String, width: Double = 25000.0, nBuckets: Int = 20): DataFrame =
    Tables.load(spark, dir, "orders")
      .withColumn("bucket",
        least(lit(nBuckets - 1L), floor(col("o_totalprice") / width).cast("long")))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("bucket")

  def histogramSql(width: Double = 25000.0, nBuckets: Int = 20): String =
    s"""SELECT least(${nBuckets - 1}, CAST(floor(o_totalprice / $width) AS BIGINT)) AS bucket,
       |       count(*) AS n_orders,
       |       min(o_totalprice) AS min_price,
       |       max(o_totalprice) AS max_price
       |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Cohort retention: users grouped by first-seen week, activity counted
    * per (cohort, weeks-since-cohort) cell — the standard product-
    * analytics retention triangle. First-seen is a per-user min (one
    * shuffle); the offset is integer day arithmetic, identical on both
    * engines. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val cohorts = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    ev.join(cohorts, "user_id")
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("long"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  val cohortRetentionSql: String =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('week', ts) AS week FROM events),
      |cohorts AS (
      |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id)
      |SELECT cohort_week,
      |       CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
      |       count(DISTINCT user_id) AS n_active
      |FROM ev JOIN cohorts USING (user_id)
      |GROUP BY cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Ordered funnel: users who progressed signup → click → purchase in
    * strict event-time order, per step. One per-user aggregation of three
    * conditional minima, then three boolean counts — no self-joins, so
    * the funnel costs one shuffle however long the event history is. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    def firstTs(t: String) = min(when(col("event_type") === t, col("ts")))
    Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        firstTs("signup").as("t_signup"),
        firstTs("click").as("t_click"),
        firstTs("purchase").as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t_signup")).as("n_signup"),
        count(when(col("t_click") > col("t_signup"), 1)).as("n_signup_click"),
        count(when(col("t_click") > col("t_signup") &&
          col("t_purchase") > col("t_click"), 1)).as("n_full_funnel"))
  }

  val funnelSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
      |         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |       count(t_signup) AS n_signup,
      |       count(CASE WHEN t_click > t_signup THEN 1 END) AS n_signup_click,
      |       count(CASE WHEN t_click > t_signup AND t_purchase > t_click THEN 1 END) AS n_full_funnel
      |FROM u""".stripMargin

  /** Interval-overlap sweep: each event is a 5-minute activity interval;
    * per user, the running +1/−1 sweep yields the maximum number of
    * simultaneously-open intervals. Ends sort before starts at the same
    * instant (delta ascending), so touching intervals do not count as
    * overlapping. The sweep window partitions by user — per-key state,
    * never a global order. */
  def intervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.load(spark, dir, "events")
      .select(col("user_id"), explode(array(
        struct(col("ts").as("t"), lit(1).as("delta")),
        struct((col("ts") + expr("INTERVAL 5 MINUTE")).as("t"), lit(-1).as("delta"))))
        .as("p"))
      .select(col("user_id"), col("p.t").as("t"), col("p.delta").as("delta"))
    val w = Window.partitionBy("user_id").orderBy("t", "delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("open", sum(col("delta")).over(w))
      .groupBy("user_id")
      .agg(
        (count(lit(1)) / 2).cast("long").as("n_intervals"),
        max(col("open")).cast("long").as("max_concurrent"))
      .orderBy("user_id")
  }

  val intervalOverlapSql: String =
    """WITH pts AS (
      |  SELECT user_id, ts AS t, 1 AS delta FROM events
      |  UNION ALL
      |  SELECT user_id, ts + INTERVAL 5 MINUTE AS t, -1 AS delta FROM events),
      |sweep AS (
      |  SELECT user_id, delta,
      |         sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
      |  FROM pts)
      |SELECT user_id,
      |       CAST(count(*) / 2 AS BIGINT) AS n_intervals,
      |       CAST(max(open) AS BIGINT) AS max_concurrent
      |FROM sweep GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Year-over-year growth: revenue per (priority, year) with the prior
    * year's revenue and the growth ratio pulled in by lag() over the
    * AGGREGATED rows — a window over |priorities|×|years| rows, never the
    * fact table. Growth is a double division of two exact decimals. */
  def yoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val yearly = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast(DecimalType(28, 2)).as("rev_d"))
    val w = Window.partitionBy("o_orderpriority").orderBy("o_year")
    yearly
      .withColumn("prev_d", lag(col("rev_d"), 1).over(w))
      .select(
        col("o_orderpriority"), col("o_year"), col("n_orders"),
        col("rev_d").cast("double").as("revenue"),
        col("prev_d").cast("double").as("prev_revenue"),
        (col("rev_d").cast("double") / col("prev_d").cast("double") - 1.0).as("yoy_growth"))
      .orderBy("o_orderpriority", "o_year")
  }

  val yoyGrowthSql: String =
    """WITH yearly AS (
      |  SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         count(*) AS n_orders,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS rev_d
      |  FROM orders GROUP BY o_orderpriority, o_year)
      |SELECT o_orderpriority, o_year, n_orders,
      |       CAST(rev_d AS DOUBLE) AS revenue,
      |       CAST(lag(rev_d) OVER w AS DOUBLE) AS prev_revenue,
      |       CAST(rev_d AS DOUBLE) / CAST(lag(rev_d) OVER w AS DOUBLE) - 1.0 AS yoy_growth
      |FROM yearly
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_year)
      |ORDER BY o_orderpriority, o_year""".stripMargin

  /** Market-basket mining: part pairs co-purchased in the same order.
    * The pair fan-out is bounded by basket size squared — independent of
    * table size, so the shape holds at any order count. Parts are
    * deduped within the order before pairing.
    *
    * r18 form (guide §3.3 "explode after the join", §2.4): collect each
    * order's distinct parts ONCE (sorted set, bounded by basket size —
    * the charDiversity bounded-collect argument) and emit the i<j
    * combinations with a per-row explode, instead of scanning +
    * distinct-ing the fact table twice and shuffle-joining the copies on
    * l_orderkey (the old plan ran the scan+distinct subtree twice — no
    * ReusedExchange — and shuffled the fact table three times; this one
    * scans once and shuffles twice). Equivalence: the i<j combinations
    * of a sorted distinct part set are exactly the part_a < part_b pairs
    * of the distinct self-join; counts and the deterministic top-k page
    * follow. Measured interleaved at sf0.1: min 2.23 → 1.94 s. */
  def marketBasket(spark: SparkSession, dir: String, topK: Int = 30): DataFrame = {
    val baskets = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    baskets
      .select(explode(flatten(transform(col("parts"), (x, i) =>
        transform(slice(col("parts"), i + lit(2), size(col("parts"))),
          y => struct(x.as("part_a"), y.as("part_b")))))).as("p"))
      .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  def marketBasketSql(topK: Int = 30): String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
       |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
       |FROM items a JOIN items b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |GROUP BY part_a, part_b
       |ORDER BY n_orders DESC, part_a, part_b LIMIT $topK""".stripMargin

  /** Lapse cohorts (the churn mirror of [[cohortRetention]]): users
    * grouped by the month of their LAST activity — the tail that shows
    * when users go dormant. One per-user max + one month aggregation. */
  def lapseCohorts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("user_id")
      .agg(max(col("ts")).as("last_seen"))
      .groupBy(date_trunc("month", col("last_seen")).as("lapse_month"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("lapse_month")

  val lapseCohortsSql: String =
    """WITH u AS (SELECT user_id, max(ts) AS last_seen FROM events GROUP BY user_id)
      |SELECT date_trunc('month', last_seen) AS lapse_month, count(*) AS n_users
      |FROM u GROUP BY lapse_month ORDER BY lapse_month""".stripMargin

  /** Share of total: each priority's revenue as a fraction of the whole —
    * the classic BI percent-of-total, computed as a window sum over the
    * AGGREGATED rows (|priorities| rows, not the fact table). Shares are
    * double divisions of exact decimals. */
  def percentOfTotal(spark: SparkSession, dir: String): DataFrame = {
    val byPriority = Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast(DecimalType(28, 2)).as("rev_d"))
    val wAll = Window.partitionBy(lit(1))
    byPriority
      .withColumn("total_d", sum(col("rev_d")).over(wAll).cast(DecimalType(28, 2)))
      .select(
        col("o_orderpriority"), col("n_orders"),
        col("rev_d").cast("double").as("revenue"),
        (col("rev_d").cast("double") / col("total_d").cast("double")).as("revenue_share"))
      .orderBy("o_orderpriority")
  }

  val percentOfTotalSql: String =
    """WITH p AS (
      |  SELECT o_orderpriority, count(*) AS n_orders,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS rev_d
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, n_orders,
      |       CAST(rev_d AS DOUBLE) AS revenue,
      |       CAST(rev_d AS DOUBLE)
      |         / CAST(CAST(sum(rev_d) OVER () AS DECIMAL(28,2)) AS DOUBLE) AS revenue_share
      |FROM p ORDER BY o_orderpriority""".stripMargin

  /** Day-of-week seasonality: order volume and revenue share per ISO
    * weekday (Spark `weekday`+1 == DuckDB `isodow` — the only portable
    * day-numbering across the two engines; `dayofweek` differs). */
  def dowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val byDow = Tables.load(spark, dir, "orders")
      .groupBy((expr("weekday(o_orderdate)") + 1).cast("long").as("isodow"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast(DecimalType(28, 2)).as("rev_d"))
    val wAll = Window.partitionBy(lit(1))
    byDow
      .withColumn("total_d", sum(col("rev_d")).over(wAll).cast(DecimalType(28, 2)))
      .select(
        col("isodow"), col("n_orders"),
        col("rev_d").cast("double").as("revenue"),
        (col("rev_d").cast("double") / col("total_d").cast("double")).as("revenue_share"))
      .orderBy("isodow")
  }

  val dowSeasonalitySql: String =
    """WITH d AS (
      |  SELECT CAST(isodow(o_orderdate) AS BIGINT) AS isodow, count(*) AS n_orders,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS rev_d
      |  FROM orders GROUP BY isodow)
      |SELECT isodow, n_orders,
      |       CAST(rev_d AS DOUBLE) AS revenue,
      |       CAST(rev_d AS DOUBLE)
      |         / CAST(CAST(sum(rev_d) OVER () AS DECIMAL(28,2)) AS DOUBLE) AS revenue_share
      |FROM d ORDER BY isodow""".stripMargin

  /** JSON field extraction from the events props payload. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(floor(col("k") / 10).cast("int").as("k_bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast(DecimalType(28, 2)).cast("double").as("sum_value"))
      .orderBy("k_bucket")

  /** Pearson correlation + OLS fit of price on quantity per return flag —
    * the statistical-profiling surface (does order size drive value?).
    * Built-in `corr`/`regr_slope` accumulate float moments in partition
    * order (non-deterministic bits under AQE re-splits), so the moments
    * are EXACT decimal sums (Σx, Σy, Σxy, Σx², Σy²) instead: partial-agg
    * + one small-key shuffle, then the closed-form corr/slope/intercept
    * as a fixed-order double expression over those exact sums —
    * bit-identical on any engine and any partitioning.
    *
    * The three output statistics are pinned to a 9-decimal grid: the
    * decimal→double cast of a >2^53-mantissa sum is itself
    * engine-specific (Spark single-rounds via BigDecimal, DuckDB
    * double-rounds via int128→double ÷ 10^scale), so the last ulp of
    * the raw doubles can legitimately differ — 9 decimals keeps ≥7
    * significant digits on every statistic while absorbing that. */
  def corrOls(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), dec(col("l_quantity")).as("x"), dec(col("l_extendedprice")).as("y"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(DecimalType(28, 2)).as("sx"),
        sum(col("y")).cast(DecimalType(28, 2)).as("sy"),
        sum(col("x") * col("y")).cast(DecimalType(38, 4)).as("sxy"),
        sum(col("x") * col("x")).cast(DecimalType(38, 4)).as("sxx"),
        sum(col("y") * col("y")).cast(DecimalType(38, 4)).as("syy"))
    val nd = col("n").cast("double")
    val cov = nd * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val varx = nd * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val vary = nd * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    s.select(col("l_returnflag"), col("n"),
        round(cov / (sqrt(varx) * sqrt(vary)), 9).as("corr_qty_price"),
        (cov / varx).as("slope_raw"),
        col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"))
      .withColumn("ols_intercept",
        round((col("syd") - col("slope_raw") * col("sxd")) / col("n").cast("double"), 9))
      .withColumn("ols_slope", round(col("slope_raw"), 9))
      .select("l_returnflag", "n", "corr_qty_price", "ols_slope", "ols_intercept")
      .orderBy("l_returnflag")
  }

  val corrOlsSql: String =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS sy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS sxy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS sxx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS syy
      |  FROM lineitem GROUP BY l_returnflag),
      |m AS (
      |  SELECT l_returnflag, n,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |      (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |       sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qty_price,
      |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |      (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS ols_slope,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      |  FROM s)
      |SELECT l_returnflag, n, round(corr_qty_price, 9) AS corr_qty_price,
      |       round(ols_slope, 9) AS ols_slope,
      |       round((syd - ols_slope * sxd) / CAST(n AS DOUBLE), 9) AS ols_intercept
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Median absolute deviation of order value per return flag — the
    * robust dispersion measure (outlier-insensitive, unlike stddev).
    * Two exact-percentile passes: the per-group median, then the median
    * of |x − median| with the 3-row median table broadcast back onto the
    * scan. Both shuffles are keyed by the group column; at 100 TB the
    * approx_percentile sketch is the drop-in when exactness is
    * negotiable (same trade as [[percentileCont]]).
    *
    * spread (r18, guide §2.5 single-split input): the exact-percentile
    * partial aggregate does a boxed per-row map update — the heaviest
    * per-row work in the relational family — and the single-row-group
    * test file would otherwise pipeline BOTH percentile passes into one
    * scan task. No-op at production split counts; result identical
    * (exact percentile is order-independent). Measured interleaved at
    * sf0.1: min 2.43 → 2.12 s, median 3.12 → 2.61 s. */
  def madByFlag(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.spread(
      Tables.load(spark, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice")))
    val med = li.groupBy("l_returnflag").agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
    li.join(broadcast(med), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("med")).as("median_price"),
        expr("percentile(abs(l_extendedprice - med), 0.5)").as("mad"))
      .withColumn("rel_mad", col("mad") / col("median_price"))
      .orderBy("l_returnflag")
  }

  val madByFlagSql: String =
    """WITH med AS (
      |  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l.l_returnflag, count(*) AS n_rows, max(m.med) AS median_price,
      |       quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad,
      |       quantile_cont(abs(l.l_extendedprice - m.med), 0.5) / max(m.med) AS rel_mad
      |FROM lineitem l JOIN med m USING (l_returnflag)
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin

  /** Daily unique-user growth — the audience/coverage curve every
    * event-stream dashboard carries: per day, the active distinct users,
    * the NEW users (first-ever appearance), and the cumulative unique
    * count. Computed scale-correctly: "cumulative distinct" is NOT a
    * distinct over an ever-growing window — each user contributes one
    * (user, first_day) row via a per-key min, daily news are a ≤|days|-key
    * rollup of that, and the running total is a window over the
    * pre-aggregated daily rows. At 100 TB the only big shuffle is the
    * per-user min, which map-side combines.
    */
  def cumulativeUniques(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(date_trunc("DAY", col("ts")).as("day"), col("user_id"))
    val active = ev.groupBy("day").agg(countDistinct(col("user_id")).as("n_active"))
    val news = ev.groupBy("user_id").agg(min(col("day")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("day")
    active.join(news, Seq("day"), "left")
      .select(col("day"), col("n_active"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_uniques", sum(col("n_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day")
  }

  val cumulativeUniquesSql: String =
    """WITH ev AS (
      |  SELECT date_trunc('day', ts) AS day, user_id FROM events),
      |active AS (SELECT day, count(DISTINCT user_id) AS n_active FROM ev GROUP BY day),
      |firsts AS (SELECT user_id, min(day) AS day FROM ev GROUP BY user_id),
      |news AS (SELECT day, count(*) AS n_new FROM firsts GROUP BY day)
      |SELECT a.day, a.n_active, coalesce(n.n_new, 0) AS n_new,
      |       CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY a.day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_uniques
      |FROM active a LEFT JOIN news n ON a.day = n.day
      |ORDER BY a.day""".stripMargin

  /** Last-touch attribution — per purchase, the user's most recent PRIOR
    * non-purchase event ("what did they do right before buying"), rolled
    * up per touch type with conversion volume and time-to-convert. The
    * classic marketing-attribution query, done stream-side: one window
    * per user carries the last non-purchase touch forward (IGNORE NULLS
    * over the preceding frame), so no self-join of the event table
    * against itself.
    *
    * Scale shape: one user-partitioned window (uniform keys), one
    * ≤|event-types|-key rollup; gaps summed as exact millisecond longs,
    * the mean a double ratio of exact ints. */
  def eventAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val touchMs = when(col("event_type") =!= "purchase", unix_millis(col("ts")))
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .withColumn("touch_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("touch_ms", last(touchMs, ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(coalesce(col("touch_type"), lit("none")).as("touch_type"),
        (unix_millis(col("ts")) - col("touch_ms")).as("gap_ms"))
      .groupBy("touch_type")
      .agg(
        count(lit(1)).as("n_purchases"),
        count(col("gap_ms")).as("n_attributed"),
        coalesce(sum(col("gap_ms")), lit(0L)).as("sum_gap_ms"),
        coalesce(max(col("gap_ms")), lit(0L)).as("max_gap_ms"))
      .select(col("touch_type"), col("n_purchases"),
        when(col("n_attributed") > 0L,
          col("sum_gap_ms").cast("double") / col("n_attributed").cast("double"))
          .otherwise(lit(0.0)).as("mean_gap_ms"),
        col("max_gap_ms"))
      .orderBy("touch_type")
  }

  val eventAttributionSql: String =
    """WITH t AS (
      |  SELECT event_id, ts, user_id, event_type,
      |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
      |         last_value(CASE WHEN event_type <> 'purchase' THEN epoch_ms(ts) END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ms
      |  FROM events),
      |p AS (
      |  SELECT coalesce(touch_type, 'none') AS touch_type,
      |         epoch_ms(ts) - touch_ms AS gap_ms
      |  FROM t WHERE event_type = 'purchase'),
      |a AS (
      |  SELECT touch_type, count(*) AS n_purchases, count(gap_ms) AS n_attributed,
      |         coalesce(sum(gap_ms), 0) AS sum_gap_ms,
      |         coalesce(max(gap_ms), 0) AS max_gap_ms
      |  FROM p GROUP BY touch_type)
      |SELECT touch_type, n_purchases,
      |       CASE WHEN n_attributed > 0
      |            THEN CAST(sum_gap_ms AS DOUBLE) / CAST(n_attributed AS DOUBLE)
      |            ELSE 0.0 END AS mean_gap_ms,
      |       CAST(max_gap_ms AS BIGINT) AS max_gap_ms
      |FROM a ORDER BY touch_type""".stripMargin

  /** Engagement-streak distribution — for each user the LONGEST run of
    * consecutive active days (any event counts as active), rolled up
    * into a streak-length histogram. The classic gaps-and-islands
    * window: within a user, consecutive days share the constant
    * `day − row_number(day)` island key, so streak length is a plain
    * count per island — no self-join of the event stream against a
    * shifted copy of itself.
    *
    * Scale shape: the dedup and both windows partition on user_id
    * (uniform keys); the histogram rollup is ≤|max-streak| keys, and the
    * share window runs over that already-tiny table. */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
    val longest = islands.groupBy("user_id").agg(max(col("len")).as("streak_days"))
    val hist = longest.groupBy("streak_days").agg(count(lit(1)).as("n_users"))
    hist
      .withColumn("share",
        col("n_users").cast("double")
          / sum(col("n_users")).over(Window.partitionBy()).cast("double"))
      .orderBy("streak_days")
  }

  val streaksSql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |r AS (
      |  SELECT user_id, day,
      |         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      |  FROM d),
      |s AS (
      |  SELECT user_id, count(*) AS len
      |  FROM r GROUP BY user_id, day - CAST(rn AS INTEGER)),
      |l AS (SELECT user_id, max(len) AS streak_days FROM s GROUP BY user_id),
      |h AS (SELECT streak_days, count(*) AS n_users FROM l GROUP BY streak_days)
      |SELECT streak_days, n_users,
      |       CAST(n_users AS DOUBLE) / CAST(sum(n_users) OVER () AS DOUBLE) AS share
      |FROM h ORDER BY streak_days""".stripMargin

  /** Top session journeys — the ordered head (first 5 events) of every
    * 30-minute-gap session rendered as a `a>b>c` path string, counted
    * corpus-wide: the "how do sessions start" view a funnel can't give
    * (q_funnel checks ONE fixed ordering; this surfaces whatever
    * orderings actually dominate). Session assignment is the
    * [[sessionize]] island sum; the head cap keeps the path domain —
    * and the final rollup — bounded by |event-types|⁵, not session
    * length.
    *
    * Scale shape: both windows partition on user_id; the path build is
    * a per-(user, session) aggregation of ≤5 rows; the rollup keys on
    * the bounded path domain and collapses to TakeOrderedAndProject. */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")))
    sessions.where(col("rn") <= 5)
      .groupBy("user_id", "session_id")
      .agg(concat_ws(">",
        transform(sort_array(collect_list(struct(col("rn"), col("event_type")))),
          e => e.getField("event_type"))).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(15)
  }

  val sessionPathsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, event_type, epoch_ms(ts) AS ms,
      |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id, ts, event_type,
      |         sum(CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM e),
      |r AS (
      |  SELECT user_id, session_id, event_type,
      |         row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS rn
      |  FROM s),
      |p AS (
      |  SELECT user_id, session_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 5 GROUP BY user_id, session_id)
      |SELECT path, count(*) AS n_sessions
      |FROM p GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 15""".stripMargin

  /** Benford first-digit audit over order totals — the classic
    * forensic-accounting / data-quality screen: natural multi-scale
    * amounts follow log10(1+1/d); fabricated, clamped, or
    * unit-converted data lurches away from it. Reports per digit the
    * observed share against the Benford expectation (hard-coded
    * 5-decimal constants — no runtime logarithm) and the absolute
    * deviation; synthetic uniform data SHOULD deviate, which is
    * exactly what makes the column informative.
    *
    * Determinism: the first digit comes from the INTEGER part cast to
    * string (integer formatting is identical across engines — never
    * string-format a double, scientific notation differs); shares are
    * single divisions of exact counts. Scale shape: one ≤9-key
    * map-side-combined aggregation, 9-row literal spine joined back,
    * 1-row total broadcast. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val expected = spark.createDataFrame(Seq(
      (1L, 0.30103), (2L, 0.17609), (3L, 0.12494), (4L, 0.09691), (5L, 0.07918),
      (6L, 0.06695), (7L, 0.05799), (8L, 0.05115), (9L, 0.04576)))
      .toDF("digit", "expected")
    val counts = Tables.load(spark, dir, "orders")
      .where(col("o_totalprice") >= 1.0)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    // total as a window over the 9-row digit panel (missing digits join
    // as null and add 0) — the broadcast form re-planned the orders
    // scan + aggregation twice
    expected.join(counts, Seq("digit"), "left")
      .withColumn("n_total", sum(coalesce(col("n"), lit(0L)))
        .over(Window.partitionBy(lit(1))).cast("long"))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        col("n_total"),
        (coalesce(col("n"), lit(0L)).cast("double") / col("n_total").cast("double")).as("share"),
        col("expected"),
        abs(coalesce(col("n"), lit(0L)).cast("double") / col("n_total").cast("double")
          - col("expected")).as("deviation"))
      .orderBy("digit")
  }

  /** Supplier-breadth histogram — sourcing concentration from observed
    * sales: per part, how many DISTINCT suppliers actually shipped it,
    * rolled to a breadth histogram. The single-sourced bucket is the
    * supply-chain risk register; a fat multi-source tail means the
    * catalog's supplier redundancy is real, not nominal.
    *
    * Scale shape: one (part, supplier) distinct pass (map-side
    * combined), a per-part count, then a ≤|max-breadth|-key histogram
    * with its share window over that bounded table. */
  def partSupplierBreadth(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
      .groupBy("l_partkey").agg(count(lit(1)).as("n_suppliers"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    per.groupBy("n_suppliers")
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("part_share",
        col("n_parts").cast("double") / sum(col("n_parts")).over(tot).cast("double"))
      .orderBy("n_suppliers")
  }

  val partSupplierBreadthSql: String =
    """WITH per AS (
      |  SELECT l_partkey, count(*) AS n_suppliers
      |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |  GROUP BY l_partkey)
      |SELECT n_suppliers, count(*) AS n_parts,
      |       CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE) AS part_share
      |FROM per GROUP BY n_suppliers ORDER BY n_suppliers""".stripMargin

  /** Supplier revenue concentration per nation — the Herfindahl–
    * Hirschman index (HHI) the sourcing desk reads before a supplier
    * outage drill: per nation, how concentrated is shipped revenue
    * across its suppliers? hhi → 1 means one supplier owns the nation;
    * effective_suppliers = 1/hhi is the "as if equal" supplier count;
    * top_share prices the single-point-of-failure directly.
    *
    * Exactness: per-supplier revenue is the DECIMAL-exact
    * Σ price·(1−discount), rescaled to INTEGER 1e-4 units before the
    * square (integer-valued DECIMAL(38,0) is the one decimal shape
    * whose →DOUBLE cast rounds identically on both engines; a
    * scale-bearing decimal double-rounds through DuckDB's int128/10^s
    * path and drifts an ulp). The 1e4 factors cancel inside HHI and
    * top_share; total_revenue divides once by 1e4 in the double
    * domain, fixed order on both sides.
    *
    * Scale shape: one lineitem groupBy(suppkey) with map-side combine
    * (the only big shuffle), a supplier-dim equi-join AQE resolves
    * (broadcast at dim scale), broadcast 25-row nation, ≤|nations|
    * rollup. No window, no sort beyond the 25-row output. */
  def supplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(BigDecimal(1)).cast("decimal(12,2)")
    val perSupp = Tables.load(spark, dir, "lineitem")
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (one - col("l_discount").cast("decimal(12,2)"))).as("rev"))
      .groupBy("l_suppkey")
      .agg((sum(col("rev")).cast("decimal(18,4)") * lit(10000))
        .cast("decimal(19,0)").as("srev_i"))
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val rolled = perSupp
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(col("srev_i")).cast("decimal(38,0)").as("total_i"),
        sum(col("srev_i") * col("srev_i")).cast("decimal(38,0)").as("ssq_i"),
        max(col("srev_i")).as("max_i"))
    val totD = col("total_i").cast("double")
    val ssqD = col("ssq_i").cast("double")
    rolled.select(
      col("n_name").as("nation"),
      col("n_suppliers"),
      (totD / lit(10000.0)).as("total_revenue"),
      (ssqD / (totD * totD)).as("hhi"),
      (lit(1.0) / (ssqD / (totD * totD))).as("effective_suppliers"),
      (col("max_i").cast("double") / totD).as("top_share"))
      .orderBy("nation")
  }

  val supplierHhiSql: String =
    """WITH per AS (
      |  SELECT l_suppkey,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                   * (1 - CAST(l_discount AS DECIMAL(12,2)))) * 10000 AS DECIMAL(19,0)) AS srev_i
      |  FROM lineitem GROUP BY l_suppkey),
      |r AS (
      |  SELECT n_name AS nation, count(*) AS n_suppliers,
      |         CAST(sum(srev_i) AS DECIMAL(38,0)) AS total_i,
      |         CAST(sum(srev_i * srev_i) AS DECIMAL(38,0)) AS ssq_i,
      |         max(srev_i) AS max_i
      |  FROM per
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT nation, n_suppliers,
      |       CAST(total_i AS DOUBLE) / 10000.0 AS total_revenue,
      |       CAST(ssq_i AS DOUBLE)
      |         / (CAST(total_i AS DOUBLE) * CAST(total_i AS DOUBLE)) AS hhi,
      |       1.0 / (CAST(ssq_i AS DOUBLE)
      |         / (CAST(total_i AS DOUBLE) * CAST(total_i AS DOUBLE))) AS effective_suppliers,
      |       CAST(max_i AS DOUBLE) / CAST(total_i AS DOUBLE) AS top_share
      |FROM r ORDER BY nation""".stripMargin

  /** Orders-per-customer fan-out histogram — the customer-axis twin of
    * [[basketSizeHist]] and the profile that sizes any per-customer
    * state (RFM, retention, sessionization): per order count the
    * customer count with share and cumulative share, INCLUDING the
    * zero bucket (registered customers who never ordered — the left
    * join the count-of-counts would silently drop).
    *
    * Scale shape: one per-customer map-side-combined count, a left join
    * from the customer dim to keep the zero bucket, a ≤|max-orders|-key
    * histogram with its windows over that bounded table. */
  def ordersPerCustomerHist(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    val cum = org.apache.spark.sql.expressions.Window.partitionBy()
      .orderBy("n_orders")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.load(spark, dir, "customer").select(col("c_custkey"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("customer_share",
        col("n_customers").cast("double") / sum(col("n_customers")).over(tot).cast("double"))
      .withColumn("cum_share",
        sum(col("n_customers")).over(cum).cast("double")
          / sum(col("n_customers")).over(tot).cast("double"))
      .orderBy("n_orders")
  }

  val ordersPerCustomerHistSql: String =
    """WITH per AS (
      |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey),
      |b AS (
      |  SELECT coalesce(n, 0) AS n_orders
      |  FROM customer LEFT JOIN per ON c_custkey = o_custkey),
      |h AS (SELECT n_orders, count(*) AS n_customers FROM b GROUP BY n_orders)
      |SELECT CAST(n_orders AS BIGINT) AS n_orders, n_customers,
      |       CAST(n_customers AS DOUBLE) / CAST(sum(n_customers) OVER () AS DOUBLE) AS customer_share,
      |       CAST(sum(n_customers) OVER (ORDER BY n_orders
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         / CAST(sum(n_customers) OVER () AS DOUBLE) AS cum_share
      |FROM h ORDER BY n_orders""".stripMargin

  /** TPC-H Q13 twin — customer order-count distribution: per qualifying
    * order count (LOW-priority orders excluded — the filtered-count
    * axis Q13 gets from its NOT LIKE '%special%requests%' comment
    * predicate; this export has no o_comment) the number of customers,
    * INCLUDING the zero bucket via the customer-dim left join, output
    * in Q13's (custdist DESC, c_count DESC) order. The unfiltered
    * histogram with shares lives in [[ordersPerCustomerHist]]; this is
    * the literal Q13 rollup completing the Q1–Q22 twin ladder.
    *
    * Scale shape: filter pushed to the orders scan, one per-customer
    * map-side-combined count, the AQE-broadcastable left join from the
    * customer dim, a ≤|max-orders|-key histogram, no windows. */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") =!= "5-LOW")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    Tables.load(spark, dir, "customer").select(col("c_custkey"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustomerDistributionSql: String =
    """WITH per AS (
      |  SELECT o_custkey, count(*) AS n FROM orders
      |  WHERE o_orderpriority <> '5-LOW'
      |  GROUP BY o_custkey)
      |SELECT CAST(coalesce(n, 0) AS BIGINT) AS c_count,
      |       count(*) AS custdist
      |FROM customer LEFT JOIN per ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Cross-nation trade matrix — the full (supplier nation → customer
    * nation) revenue flow table that TPC-H Q7 samples two cells of:
    * every pair's line count, DECIMAL-exact revenue, share of world
    * trade, and the intra-nation flag. The row a tariff/latency/region
    * placement decision actually reads: which lanes carry the volume,
    * and how much of the flow never crosses a border.
    *
    * Exactness: revenue rescaled to INTEGER 1e-4 units (the
    * [[supplierHhi]] convention — integer-valued DECIMAL(38,0) casts to
    * DOUBLE identically on both engines); shares are one fixed-order
    * double division against a broadcast world total.
    *
    * Scale shape: ONE big join (lineitem ⋈ orders on orderkey,
    * AQE-resolved), broadcast customer/supplier/nation dims, a
    * ≤|nations|²-key aggregation, and a 1-row broadcast total — no
    * windows. */
  def tradeMatrix(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(BigDecimal(1)).cast("decimal(12,2)")
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (one - col("l_discount").cast("decimal(12,2)"))).as("rev"))
    val o = Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.load(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val natS = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val natC = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val cells = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .groupBy("supp_nation", "cust_nation")
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("rev")).cast("decimal(34,4)") * lit(10000))
          .cast("decimal(38,0)").as("rev_i"))
    // total as a window over the ≤|nations|²-cell rollup — the broadcast
    // form re-planned the three-way join + aggregation twice
    cells
      .withColumn("tot_i", sum(col("rev_i")).over(Window.partitionBy(lit(1)))
        .cast("decimal(38,0)"))
      .select(col("supp_nation"), col("cust_nation"), col("n_lines"),
        (col("rev_i").cast("double") / lit(10000.0)).as("revenue"),
        (col("rev_i").cast("double") / col("tot_i").cast("double")).as("revenue_share"),
        (col("supp_nation") === col("cust_nation")).as("intra_nation"))
      .orderBy("supp_nation", "cust_nation")
  }

  val tradeMatrixSql: String =
    """WITH cells AS (
      |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |         count(*) AS n_lines,
      |         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                   * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(34,4))
      |              * 10000 AS DECIMAL(38,0)) AS rev_i
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  GROUP BY sn.n_name, cn.n_name),
      |t AS (SELECT CAST(sum(rev_i) AS DECIMAL(38,0)) AS tot_i FROM cells)
      |SELECT supp_nation, cust_nation, n_lines,
      |       CAST(rev_i AS DOUBLE) / 10000.0 AS revenue,
      |       CAST(rev_i AS DOUBLE) / CAST(tot_i AS DOUBLE) AS revenue_share,
      |       supp_nation = cust_nation AS intra_nation
      |FROM cells, t ORDER BY supp_nation, cust_nation""".stripMargin

  /** Repeat-purchase rate per part — the retention metric on the
    * product axis (the customer axis lives in [[rfm]]/[[newVsRepeat]]):
    * per part, the buyers who ordered it in MORE THAN ONE distinct
    * order, the repeat rate, and orders per buyer — rolled to the
    * top-20 repeat-rate parts above a 5-buyer support floor
    * (deterministic page: rate desc, then part key). Consumables
    * surface at the top, one-off purchases at zero.
    *
    * Scale shape: lineitem ⋈ orders on the order key (AQE-resolved),
    * a (part, customer) map-side distinct-order count, a per-part
    * rollup, TakeOrderedAndProject page. */
  def repeatPurchaseRate(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    // ONE data exchange (r19, guide §2.4 "two operations keyed the same
    // way share one exchange"): the explicit hash repartition on
    // l_partkey satisfies the 3-column distinct, the (part, cust) rollup
    // AND the per-part rollup (each clusters on a superset of
    // {l_partkey}), collapsing the r18 plan's three exchanges into one.
    // l_partkey is near-uniform (|parts| ≈ |lineitem|/30 — no skew), and
    // repartitioning moves rows only, so distinct/counts are unchanged.
    // Interleaved A/B at sf0.1: 1.97 → 1.37 s median.
    val perBuyer = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey"), col("o_custkey"), col("o_orderkey"))
      .repartition(col("l_partkey"))
      .distinct()
      .groupBy("l_partkey", "o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    perBuyer.groupBy("l_partkey")
      .agg(count(lit(1)).as("n_buyers"),
        sum(when(col("n_orders") > 1L, 1L).otherwise(0L)).as("n_repeat_buyers"),
        sum(col("n_orders")).as("n_orders"))
      .where(col("n_buyers") >= 5L)
      .select(col("l_partkey"), col("n_buyers"), col("n_repeat_buyers"),
        (col("n_repeat_buyers").cast("double") / col("n_buyers").cast("double"))
          .as("repeat_rate"),
        (col("n_orders").cast("double") / col("n_buyers").cast("double"))
          .as("orders_per_buyer"))
      .orderBy(col("repeat_rate").desc, col("l_partkey"))
      .limit(k)
  }

  def repeatPurchaseRateSql(k: Int = 20): String =
    s"""WITH pb AS (
       |  SELECT l_partkey, o_custkey, count(*) AS n_orders
       |  FROM (SELECT DISTINCT l_partkey, o_custkey, o_orderkey
       |        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       |  GROUP BY l_partkey, o_custkey),
       |p AS (
       |  SELECT l_partkey, count(*) AS n_buyers,
       |         CAST(sum(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_buyers,
       |         CAST(sum(n_orders) AS BIGINT) AS n_orders
       |  FROM pb GROUP BY l_partkey)
       |SELECT l_partkey, n_buyers, n_repeat_buyers,
       |       CAST(n_repeat_buyers AS DOUBLE) / CAST(n_buyers AS DOUBLE) AS repeat_rate,
       |       CAST(n_orders AS DOUBLE) / CAST(n_buyers AS DOUBLE) AS orders_per_buyer
       |FROM p WHERE n_buyers >= 5
       |ORDER BY repeat_rate DESC, l_partkey LIMIT $k""".stripMargin

  /** Ship-delay histogram — the full distribution behind
    * [[priorityShipping]]'s per-priority means: days from order to
    * line shipment, bucketed day by day with shares, cumulative shares,
    * and the 90-day SLA flag the priority rollup uses. The SLA
    * conversation needs the shape — a fat tail just past the threshold
    * argues for expediting a few lanes, a uniform spread for repricing
    * the promise itself.
    *
    * Scale shape: the lineitem ⋈ orders equi-join (AQE-resolved, the
    * q5/q10 shape), an integer datediff, a ≤|day-range|-key histogram
    * with its windows over that bounded table. */
  def shipDelayHist(spark: SparkSession, dir: String): DataFrame = {
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    val cum = org.apache.spark.sql.expressions.Window.partitionBy()
      .orderBy("delay_days")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("delay_days"))
      .groupBy("delay_days")
      .agg(count(lit(1)).as("n_lines"))
      .withColumn("line_share",
        col("n_lines").cast("double") / sum(col("n_lines")).over(tot).cast("double"))
      .withColumn("cum_share",
        sum(col("n_lines")).over(cum).cast("double")
          / sum(col("n_lines")).over(tot).cast("double"))
      .withColumn("within_sla", col("delay_days") <= 90L)
      .orderBy("delay_days")
  }

  val shipDelayHistSql: String =
    """WITH d AS (
      |  SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS delay_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |h AS (SELECT delay_days, count(*) AS n_lines FROM d GROUP BY delay_days)
      |SELECT delay_days, n_lines,
      |       CAST(n_lines AS DOUBLE) / CAST(sum(n_lines) OVER () AS DOUBLE) AS line_share,
      |       CAST(sum(n_lines) OVER (ORDER BY delay_days
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         / CAST(sum(n_lines) OVER () AS DOUBLE) AS cum_share,
      |       delay_days <= 90 AS within_sla
      |FROM h ORDER BY delay_days""".stripMargin

  /** Weekly-seasonality strength — the one-number ANOVA gate under
    * [[dowSeasonality]]'s per-day table: daily order counts grouped by
    * ISO day-of-week, decomposed into between-group vs total variance
    * (η² = SSB/SST over calendar days). η² near 0 says the weekly
    * pattern in the seasonality table is noise — don't build a
    * dow-partitioned forecast on it; η² near 1 says day-of-week alone
    * explains the volume, so capacity planning can key on it.
    *
    * Exactness: daily counts are integers; every Σc and Σc² (global
    * and per-dow) accumulates as DECIMAL(38,0); SSB/SST and η² are
    * fixed-order double math over those exact sums, NULL on a
    * degenerate (constant) series.
    *
    * Scale shape: one ≤|days|-key count (map-side combined), a ≤7-key
    * conditional rollup, a single-row fold. No windows. */
  def dowAnova(spark: SparkSession, dir: String): DataFrame = {
    val d19 = "decimal(19,0)"
    val d38 = "decimal(38,0)"
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("c"))
      .select((expr("weekday(day)") + 1).cast("long").as("isodow"), col("c"))
    // ONE aggregation with 7 FIXED conditional columns: a Σ over per-dow
    // double terms would be shuffle-order-dependent; pinned columns make
    // every later double op a fixed textual expression on both engines
    val aggs =
      Seq(count(lit(1)).as("n_days"),
        sum(col("c").cast(d19)).cast(d38).as("st"),
        sum(col("c").cast(d19) * col("c").cast(d19)).cast(d38).as("st2")) ++
      (1 to 7).flatMap(d => Seq(
        sum(when(col("isodow") === d, col("c").cast(d19))
          .otherwise(lit(0).cast(d19))).cast(d38).as(s"s$d"),
        sum(when(col("isodow") === d, 1L).otherwise(0L)).as(s"n$d")))
    val folded = daily.agg(aggs.head, aggs.tail: _*)
    def term(d: Int) = when(col(s"n$d") > 0L,
      col(s"s$d").cast("double") * col(s"s$d").cast("double")
        / col(s"n$d").cast("double")).otherwise(lit(0.0))
    def mean(d: Int) = when(col(s"n$d") > 0L,
      col(s"s$d").cast("double") / col(s"n$d").cast("double"))
    val ssbRaw = (1 to 7).map(term).reduce(_ + _)
    val peakMean = greatest((1 to 7).map(mean): _*)
    val peakDow = (1 to 7).foldRight(lit(null).cast("long")) { (d, rest) =>
      when(mean(d) === peakMean, lit(d.toLong)).otherwise(rest)
    }
    val nD = col("n_days").cast("double")
    val grand = col("st").cast("double") * col("st").cast("double") / nD
    val sst = col("st2").cast("double") - grand
    folded.select(
      col("n_days"),
      (1 to 7).map(d => when(col(s"n$d") > 0L, 1L).otherwise(0L)).reduce(_ + _).as("n_dows"),
      (col("st").cast("double") / nD).as("mean_daily_orders"),
      when(sst > 0.0, (ssbRaw - grand) / sst).as("eta_sq_dow"),
      peakDow.as("peak_isodow"),
      peakMean.as("peak_mean_daily_orders"))
  }

  val dowAnovaSql: String = {
    val condCols = (1 to 7).map(d =>
      s"""CAST(sum(CASE WHEN isodow = $d THEN CAST(c AS DECIMAL(19,0))
         |              ELSE CAST(0 AS DECIMAL(19,0)) END) AS DECIMAL(38,0)) AS s$d,
         |CAST(sum(CASE WHEN isodow = $d THEN 1 ELSE 0 END) AS BIGINT) AS n$d""".stripMargin)
      .mkString(",\n")
    def term(d: Int) =
      s"CASE WHEN n$d > 0 THEN CAST(s$d AS DOUBLE) * CAST(s$d AS DOUBLE) / CAST(n$d AS DOUBLE) ELSE 0.0 END"
    def mean(d: Int) =
      s"CASE WHEN n$d > 0 THEN CAST(s$d AS DOUBLE) / CAST(n$d AS DOUBLE) END"
    val ssbRaw = (1 to 7).map(term).mkString(" + ")
    val peakMean = s"greatest(${(1 to 7).map(mean).mkString(", ")})"
    val peakDow = (1 to 7).reverse.foldLeft("CAST(NULL AS BIGINT)") { (rest, d) =>
      s"CASE WHEN ${mean(d)} = $peakMean THEN CAST($d AS BIGINT) ELSE $rest END"
    }
    val grand = "CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n_days AS DOUBLE)"
    s"""WITH daily AS (
       |  SELECT o_orderdate AS day, count(*) AS c FROM orders GROUP BY o_orderdate),
       |dw AS (SELECT isodow(day) AS isodow, c FROM daily),
       |f AS (
       |  SELECT count(*) AS n_days,
       |         CAST(sum(CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS st,
       |         CAST(sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS st2,
       |$condCols
       |  FROM dw)
       |SELECT n_days,
       |       ${(1 to 7).map(d => s"CASE WHEN n$d > 0 THEN 1 ELSE 0 END").mkString(" + ")} AS n_dows,
       |       CAST(st AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_daily_orders,
       |       CASE WHEN CAST(st2 AS DOUBLE) - $grand > 0.0
       |            THEN (($ssbRaw) - $grand) / (CAST(st2 AS DOUBLE) - $grand)
       |       END AS eta_sq_dow,
       |       $peakDow AS peak_isodow,
       |       $peakMean AS peak_mean_daily_orders
       |FROM f""".stripMargin
  }

  /** Trade balance per nation — the row-wise summary of
    * [[tradeMatrix]]: gross cross-border exports and imports (intra-
    * nation flow carved out separately), the DECIMAL-exact net
    * position, and the export/import ratio. Below-zero net is a net
    * importer; the ratio prices how lopsided each nation's lanes are.
    *
    * Exactness: the same integer 1e-4-unit revenue convention as
    * [[tradeMatrix]]/[[supplierHhi]]; net is an integer subtraction,
    * doubles appear only in the final /1e4 and ratio projections.
    *
    * Scale shape: the same single big join, reduced to the ≤|nations|²
    * cell table, then two conditional ≤|nations| rollups folded in one
    * pass — no windows, no second fact scan. */
  def tradeBalance(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(BigDecimal(1)).cast("decimal(12,2)")
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (one - col("l_discount").cast("decimal(12,2)"))).as("rev"))
    val o = Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.load(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val natS = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val natC = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    // pin (r18, guide §2.4): the two union branches below otherwise each
    // re-plan this whole fact-join + aggregation subtree (the optional
    // exchange-reuse rewrite provably did not fire — PLANS_r17 shows the
    // 5-join subtree twice); the ≤|nations|²-row rollup is checkpointed
    // once and both branches read it. Measured interleaved at sf0.1:
    // min 1.88 → 1.64 s; at scale it halves the fact-side work outright.
    val cells = Tables.pin(li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .groupBy("supp_nation", "cust_nation")
      .agg((sum(col("rev")).cast("decimal(34,4)") * lit(10000))
        .cast("decimal(38,0)").as("rev_i")))
    val zero = lit(BigDecimal(0)).cast("decimal(38,0)")
    val sides = cells.select(col("supp_nation").as("nation"),
        when(col("supp_nation") =!= col("cust_nation"), col("rev_i")).otherwise(zero).as("export_i"),
        zero.as("import_i"),
        when(col("supp_nation") === col("cust_nation"), col("rev_i")).otherwise(zero).as("intra_i"))
      .unionAll(cells.where(col("supp_nation") =!= col("cust_nation"))
        .select(col("cust_nation").as("nation"), zero.as("export_i"),
          col("rev_i").as("import_i"), zero.as("intra_i")))
    sides.groupBy("nation")
      .agg(sum(col("export_i")).cast("decimal(38,0)").as("ex_i"),
        sum(col("import_i")).cast("decimal(38,0)").as("im_i"),
        sum(col("intra_i")).cast("decimal(38,0)").as("in_i"))
      .select(col("nation"),
        (col("ex_i").cast("double") / lit(10000.0)).as("exports"),
        (col("im_i").cast("double") / lit(10000.0)).as("imports"),
        (col("in_i").cast("double") / lit(10000.0)).as("intra_trade"),
        ((col("ex_i") - col("im_i")).cast("double") / lit(10000.0)).as("net_revenue"),
        when(col("im_i") > zero,
          col("ex_i").cast("double") / col("im_i").cast("double")).as("export_import_ratio"))
      .orderBy("nation")
  }

  val tradeBalanceSql: String =
    """WITH cells AS (
      |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                   * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(34,4))
      |              * 10000 AS DECIMAL(38,0)) AS rev_i
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  GROUP BY sn.n_name, cn.n_name),
      |sides AS (
      |  SELECT supp_nation AS nation,
      |         CASE WHEN supp_nation <> cust_nation THEN rev_i ELSE CAST(0 AS DECIMAL(38,0)) END AS export_i,
      |         CAST(0 AS DECIMAL(38,0)) AS import_i,
      |         CASE WHEN supp_nation = cust_nation THEN rev_i ELSE CAST(0 AS DECIMAL(38,0)) END AS intra_i
      |  FROM cells
      |  UNION ALL
      |  SELECT cust_nation, CAST(0 AS DECIMAL(38,0)), rev_i, CAST(0 AS DECIMAL(38,0))
      |  FROM cells WHERE supp_nation <> cust_nation),
      |r AS (
      |  SELECT nation,
      |         CAST(sum(export_i) AS DECIMAL(38,0)) AS ex_i,
      |         CAST(sum(import_i) AS DECIMAL(38,0)) AS im_i,
      |         CAST(sum(intra_i) AS DECIMAL(38,0)) AS in_i
      |  FROM sides GROUP BY nation)
      |SELECT nation,
      |       CAST(ex_i AS DOUBLE) / 10000.0 AS exports,
      |       CAST(im_i AS DOUBLE) / 10000.0 AS imports,
      |       CAST(in_i AS DOUBLE) / 10000.0 AS intra_trade,
      |       CAST(ex_i - im_i AS DOUBLE) / 10000.0 AS net_revenue,
      |       CASE WHEN im_i > 0 THEN CAST(ex_i AS DOUBLE) / CAST(im_i AS DOUBLE) END
      |         AS export_import_ratio
      |FROM r ORDER BY nation""".stripMargin

  /** Customer value-migration matrix — is the base upgrading or
    * churning? Each customer's DECIMAL-exact revenue in the first vs
    * second half of the order-date span (exact-ms midpoint), both
    * halves bucketed by revenue DIGIT COUNT (the [[revenueConcentration]]
    * trick — engine-identical integer formatting, no quantile sort),
    * bucket 0 = no orders in that half; the output is the ≤~10×10
    * transition matrix with counts and shares. Mass below the diagonal
    * is downgrade/churn, above is growth, the (0, j) row is
    * acquisition and the (i, 0) column is loss.
    *
    * Scale shape: one per-customer conditional aggregation (map-side
    * combined, both halves in ONE pass), the midpoint a broadcast
    * 1-row aggregate, the matrix a ≤~100-key rollup with its share
    * window over that bounded table. */
  def valueMigration(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), unix_millis(col("o_orderdate")).as("ms"),
        col("o_totalprice").cast("decimal(18,2)").as("rev"))
    val mid = o.agg(expr("(min(ms) + max(ms)) DIV 2").as("mid"))
    def bucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c <= 0, 0L)
        .otherwise(length(floor(c).cast("long").cast("string")).cast("long"))
    val per = o.crossJoin(broadcast(mid))
      .groupBy("o_custkey")
      .agg(
        sum(when(col("ms") < col("mid"), col("rev"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,2)"))).as("early_d"),
        sum(when(col("ms") >= col("mid"), col("rev"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,2)"))).as("late_d"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    per
      .select(bucket(col("early_d")).as("early_bucket"),
        bucket(col("late_d")).as("late_bucket"))
      .groupBy("early_bucket", "late_bucket")
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("share",
        col("n_customers").cast("double")
          / sum(col("n_customers")).over(tot).cast("double"))
      .withColumn("direction",
        when(col("late_bucket") > col("early_bucket"), lit("up"))
          .when(col("late_bucket") < col("early_bucket"), lit("down"))
          .otherwise(lit("flat")))
      .orderBy("early_bucket", "late_bucket")
  }

  val valueMigrationSql: String =
    """WITH o AS (
      |  SELECT o_custkey, epoch_ms(o_orderdate) AS ms,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS rev
      |  FROM orders),
      |mid AS (SELECT (min(ms) + max(ms)) // 2 AS mid FROM o),
      |per AS (
      |  SELECT o_custkey,
      |         sum(CASE WHEN ms < mid THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS early_d,
      |         sum(CASE WHEN ms >= mid THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS late_d
      |  FROM o CROSS JOIN mid GROUP BY o_custkey),
      |b AS (
      |  SELECT CASE WHEN early_d <= 0 THEN 0
      |              ELSE CAST(len(CAST(CAST(floor(early_d) AS BIGINT) AS VARCHAR)) AS BIGINT)
      |         END AS early_bucket,
      |         CASE WHEN late_d <= 0 THEN 0
      |              ELSE CAST(len(CAST(CAST(floor(late_d) AS BIGINT) AS VARCHAR)) AS BIGINT)
      |         END AS late_bucket
      |  FROM per)
      |SELECT early_bucket, late_bucket, count(*) AS n_customers,
      |       CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE) AS share,
      |       CASE WHEN late_bucket > early_bucket THEN 'up'
      |            WHEN late_bucket < early_bucket THEN 'down'
      |            ELSE 'flat' END AS direction
      |FROM b GROUP BY early_bucket, late_bucket
      |ORDER BY early_bucket, late_bucket""".stripMargin

  /** Top product movers — per part, DECIMAL-exact revenue in the first
    * vs second half of the order-date span (exact-ms midpoint split, the
    * [[Monitoring.valueDrift]] convention) and the growth between them;
    * page = the 20 largest absolute swings. The merchandising "what
    * changed" view; growth is NULL (not ∞) for parts that only sell in
    * the second half.
    *
    * Scale shape: lineitem ⋈ orders on the order key (co-partitioned
    * shuffle), the midpoint a broadcast 1-row aggregate, per-part
    * conditional DECIMAL sums in ONE hash aggregate (no union of two
    * filtered passes), and the page collapses to TakeOrderedAndProject —
    * ordering on the exact decimal delta with the part key as the tie
    * break, so the page is deterministic. */
  def productGrowth(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), unix_millis(col("o_orderdate")).as("ms"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("rev"))
    val mid = o.agg(expr("(min(ms) + max(ms)) DIV 2").as("mid"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .crossJoin(broadcast(mid))
      .groupBy("l_partkey")
      .agg(
        sum(when(col("ms") < col("mid"), col("rev"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,2)"))).as("early_d"),
        sum(when(col("ms") >= col("mid"), col("rev"))
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,2)"))).as("late_d"))
      .withColumn("delta_d", col("late_d") - col("early_d"))
      .orderBy(abs(col("delta_d")).desc, col("l_partkey"))
      .limit(k)
      .select(col("l_partkey"),
        col("early_d").cast("double").as("early_revenue"),
        col("late_d").cast("double").as("late_revenue"),
        col("delta_d").cast("double").as("delta"),
        when(col("early_d") > 0,
          (col("late_d") - col("early_d")).cast("double")
            / col("early_d").cast("double")).as("growth"))
  }

  def productGrowthSql(k: Int = 20): String =
    s"""WITH o AS (
       |  SELECT o_orderkey, epoch_ms(o_orderdate) AS ms FROM orders),
       |mid AS (SELECT (min(ms) + max(ms)) // 2 AS mid FROM o),
       |per AS (
       |  SELECT l.l_partkey,
       |         sum(CASE WHEN o.ms < mid.mid THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
       |                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS early_d,
       |         sum(CASE WHEN o.ms >= mid.mid THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
       |                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS late_d
       |  FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey CROSS JOIN mid
       |  GROUP BY l.l_partkey),
       |page AS (
       |  SELECT * FROM per ORDER BY abs(late_d - early_d) DESC, l_partkey LIMIT $k)
       |SELECT l_partkey,
       |       CAST(early_d AS DOUBLE) AS early_revenue,
       |       CAST(late_d AS DOUBLE) AS late_revenue,
       |       CAST(late_d - early_d AS DOUBLE) AS delta,
       |       CASE WHEN early_d > 0
       |            THEN CAST(late_d - early_d AS DOUBLE) / CAST(early_d AS DOUBLE)
       |       END AS growth
       |FROM page""".stripMargin

  /** Lines-per-order histogram — the fact-table fan-out profile every
    * join planner wants before sizing a lineitem-side shuffle: how many
    * orders have 1 line, 2 lines, …, and what share of ALL LINES the
    * big-basket tail carries (skew lives in the line share, not the
    * order share). Read next to [[Monitoring.partitionSkew]] — same
    * question, order-key domain.
    *
    * Scale shape: per-order counts are one map-side-combined
    * aggregation on the order key; the histogram is ≤|max-basket|
    * keys and the share windows run over that bounded table. */
  def basketSizeHist(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("lines"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    per.groupBy("lines")
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("n_lines", col("lines") * col("n_orders"))
      .withColumn("order_share",
        col("n_orders").cast("double") / sum(col("n_orders")).over(tot).cast("double"))
      .withColumn("line_share",
        col("n_lines").cast("double") / sum(col("n_lines")).over(tot).cast("double"))
      .orderBy("lines")
  }

  val basketSizeHistSql: String =
    """WITH per AS (
      |  SELECT l_orderkey, count(*) AS lines FROM lineitem GROUP BY 1),
      |h AS (
      |  SELECT lines, count(*) AS n_orders, lines * count(*) AS n_lines
      |  FROM per GROUP BY lines)
      |SELECT lines, n_orders, CAST(n_lines AS BIGINT) AS n_lines,
      |       CAST(n_orders AS DOUBLE) / CAST(sum(n_orders) OVER () AS DOUBLE) AS order_share,
      |       CAST(n_lines AS DOUBLE) / CAST(sum(n_lines) OVER () AS DOUBLE) AS line_share
      |FROM h ORDER BY lines""".stripMargin

  /** TPC-H Q6 twin — the forecast-revenue-change query, the classic
    * "how much margin would we recover by eliminating mid-range
    * discounts on small orders" single-scan aggregate, windowed to this
    * export's 1996 ship year. The one-row answer is Σ price·discount
    * over the filtered slice — every predicate pushes to the parquet
    * scan and the whole query is one map-side-combined fold with zero
    * shuffles of data rows.
    *
    * Exactness: price and discount are CAST TO DECIMAL before the
    * multiply and the sum (double accumulation is partition-order
    * dependent); the single output is the final double cast. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * col("l_discount").cast("decimal(8,2)")).cast("double")
        .as("forecast_revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q6ForecastRevenueSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS forecast_revenue,
      |       count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Per-discount-level pricing panel — the elasticity view Q6 samples
    * one slice of: for every discount percent actually offered, the
    * line volume, the average quantity (does a deeper discount move
    * more units?), the gross line revenue, and the discount dollars
    * given away with their share of gross. Flat avg_qty across levels
    * means discounting buys nothing — the full-distribution answer.
    *
    * Scale shape: one scan, one ≤|discount-levels|-key (≤11 here)
    * map-side-combined aggregation; the level key is the
    * integer-rounded percent, exact on both engines. All money sums
    * DECIMAL-exact, doubles only in final ratios. */
  def discountMix(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .select(
        round(col("l_discount") * 100.0, 0).cast("long").as("discount_pct"),
        col("l_quantity").cast("decimal(12,2)").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        (col("l_extendedprice").cast("decimal(18,2)")
          * col("l_discount").cast("decimal(8,2)")).as("disc_amt"))
      .groupBy("discount_pct")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("qty")).as("sum_qty"),
        sum(col("price")).as("gross"),
        sum(col("disc_amt")).as("disc_given"))
      .select(col("discount_pct"), col("n_lines"),
        (col("sum_qty").cast("double") / col("n_lines").cast("double"))
          .as("avg_qty"),
        col("gross").cast("double").as("gross_revenue"),
        col("disc_given").cast("double").as("discount_given"),
        (col("disc_given").cast("double") / col("gross").cast("double"))
          .as("discount_share"))
      .orderBy("discount_pct")
  }

  val discountMixSql: String =
    """WITH b AS (
      |  SELECT CAST(round(l_discount * 100.0, 0) AS BIGINT) AS discount_pct,
      |         CAST(l_quantity AS DECIMAL(12,2)) AS qty,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,2)) AS disc_amt
      |  FROM lineitem)
      |SELECT discount_pct, count(*) AS n_lines,
      |       CAST(sum(qty) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
      |       CAST(sum(price) AS DOUBLE) AS gross_revenue,
      |       CAST(sum(disc_amt) AS DOUBLE) AS discount_given,
      |       CAST(sum(disc_amt) AS DOUBLE) / CAST(sum(price) AS DOUBLE) AS discount_share
      |FROM b GROUP BY discount_pct ORDER BY discount_pct""".stripMargin

  /** 7-day rolling retention — the product-health curve next to cohort
    * retention's fixed grid: of the users active on day d, what share
    * came back within the next 7 days? Cohort retention tracks signup
    * classes; this tracks the WHOLE active base day over day, the
    * metric that moves first when an experience degrades. The stream's
    * final week is right-censored (no future to return in) — the curve
    * honestly falls there rather than inventing a correction, and the
    * oracle agrees.
    *
    * Scale shape: one distinct (user, day) pass (map-side combined),
    * a user-partitioned lead window (never global), and a ≤|days|-key
    * rollup of exact integer counts. */
  def rollingRetention(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val active = Tables.load(spark, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    active
      .withColumn("next_day", lead(col("day"), 1).over(w))
      .withColumn("returned",
        when(col("next_day").isNotNull &&
          datediff(col("next_day").cast("date"), col("day").cast("date")) <= 7,
          1L).otherwise(0L))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"), sum(col("returned")).as("n_returned"))
      .withColumn("retention_7d",
        col("n_returned").cast("double") / col("n_active").cast("double"))
      .orderBy("day")
  }

  val rollingRetentionSql: String =
    """WITH a AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |n AS (
      |  SELECT user_id, day,
      |         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
      |  FROM a)
      |SELECT day, count(*) AS n_active,
      |       CAST(sum(CASE WHEN next_day IS NOT NULL
      |                      AND date_diff('day', CAST(day AS DATE), CAST(next_day AS DATE)) <= 7
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
      |       CAST(sum(CASE WHEN next_day IS NOT NULL
      |                      AND date_diff('day', CAST(day AS DATE), CAST(next_day AS DATE)) <= 7
      |                     THEN 1 ELSE 0 END) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS retention_7d
      |FROM n GROUP BY day ORDER BY day""".stripMargin

  /** Revenue-concentration curve at order-of-magnitude resolution — the
    * scale-correct Lorenz/Pareto reading ("do 1% of customers hold 40%
    * of revenue?"): per-customer lifetime revenue bucketed by its DIGIT
    * COUNT (integer-part formatting is engine-identical — the same trick
    * as the Benford screen; no libm log anywhere), then customer and
    * revenue shares per bucket with cumulative-from-the-top shares. A
    * true per-customer rank curve needs a global sort over |customers|;
    * the digit histogram answers the concentration question with a
    * ≤~10-row table and no unbounded window.
    *
    * Scale shape: per-customer revenue is a map-side-combined DECIMAL
    * sum; the histogram is a ≤|digit-buckets|-key rollup; the
    * cumulative window runs over that bounded table. */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"))
      .select(col("revenue"),
        length(floor(col("revenue")).cast("long").cast("string")).cast("long")
          .as("digits"))
    val hist = perCust.groupBy("digits")
      .agg(count(lit(1)).as("n_customers"), sum(col("revenue")).as("rev"))
    val wTop = org.apache.spark.sql.expressions.Window
      .orderBy(col("digits").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    hist
      .withColumn("cum_cust", sum(col("n_customers")).over(wTop))
      .withColumn("cum_rev", sum(col("rev")).over(wTop))
      .withColumn("tot_cust", sum(col("n_customers")).over(tot))
      .withColumn("tot_rev", sum(col("rev")).over(tot))
      .select(col("digits"), col("n_customers"),
        col("rev").cast("double").as("bucket_revenue"),
        (col("n_customers").cast("double") / col("tot_cust").cast("double"))
          .as("cust_share"),
        (col("rev").cast("double") / col("tot_rev").cast("double"))
          .as("revenue_share"),
        (col("cum_cust").cast("double") / col("tot_cust").cast("double"))
          .as("cum_cust_share_from_top"),
        (col("cum_rev").cast("double") / col("tot_rev").cast("double"))
          .as("cum_revenue_share_from_top"))
      .orderBy(col("digits").desc)
  }

  val revenueConcentrationSql: String =
    """WITH pc AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      |  FROM orders GROUP BY 1),
      |d AS (
      |  SELECT revenue,
      |         CAST(len(CAST(CAST(floor(revenue) AS BIGINT) AS VARCHAR)) AS BIGINT) AS digits
      |  FROM pc),
      |h AS (
      |  SELECT digits, count(*) AS n_customers, sum(revenue) AS rev
      |  FROM d GROUP BY digits)
      |SELECT digits, n_customers,
      |       CAST(rev AS DOUBLE) AS bucket_revenue,
      |       CAST(n_customers AS DOUBLE) / CAST(sum(n_customers) OVER () AS DOUBLE) AS cust_share,
      |       CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE) AS revenue_share,
      |       CAST(sum(n_customers) OVER (ORDER BY digits DESC
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         / CAST(sum(n_customers) OVER () AS DOUBLE) AS cum_cust_share_from_top,
      |       CAST(sum(rev) OVER (ORDER BY digits DESC
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         / CAST(sum(rev) OVER () AS DOUBLE) AS cum_revenue_share_from_top
      |FROM h ORDER BY digits DESC""".stripMargin

  /** Order-to-ship latency by priority — the TPC-H Q12-flavored fulfil-
    * ment audit the schema supports (no commit/receipt dates in this
    * export): per order priority, how long lines actually took to ship
    * and what share blew the 90-day service bar. If URGENT ships no
    * faster than LOW, the priority field is decorative — a real
    * operations finding. Exact integer day-diffs summed exactly; the
    * mean is one fixed-order double ratio.
    *
    * Scale shape: the canonical fact-to-fact equi-join (lineitem ⋈
    * orders on the order key — co-partitioned shuffle join, AQE-
    * splittable), then a ≤|priorities|-key rollup with map-side
    * combine. */
  def priorityShipping(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_orderdate"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("delay_days"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("delay_days")).as("sum_delay"),
        max(col("delay_days")).as("max_delay_days"),
        min(col("delay_days")).as("min_delay_days"),
        sum(when(col("delay_days") > 90L, 1L).otherwise(0L)).as("n_late"))
      .select(col("o_orderpriority"), col("n_lines"),
        (col("sum_delay").cast("double") / col("n_lines").cast("double"))
          .as("avg_delay_days"),
        col("min_delay_days"), col("max_delay_days"), col("n_late"),
        (col("n_late").cast("double") / col("n_lines").cast("double"))
          .as("late_share"))
      .orderBy("o_orderpriority")
  }

  val priorityShippingSql: String =
    """WITH j AS (
      |  SELECT o.o_orderpriority,
      |         date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS delay_days
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |SELECT o_orderpriority, count(*) AS n_lines,
      |       CAST(sum(delay_days) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_delay_days,
      |       CAST(min(delay_days) AS BIGINT) AS min_delay_days,
      |       CAST(max(delay_days) AS BIGINT) AS max_delay_days,
      |       CAST(sum(CASE WHEN delay_days > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |       CAST(sum(CASE WHEN delay_days > 90 THEN 1 ELSE 0 END) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS late_share
      |FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Wald–Wolfowitz runs test over daily order volume — the time-series
    * randomness audit read next to [[benfordAudit]]'s digit screen: too
    * FEW runs of above/below-median days means trending or batching
    * (loads arriving in bursts), too MANY means oscillation
    * (over-correction or interleaved double-feeds). Days equal to the
    * median are excluded (the standard treatment); the z-score comes
    * from the exact run/count integers through fixed-order double
    * formulas, NULL when the variance degenerates (n1·n2 = 0 — an
    * all-above or all-below split has no defined randomness).
    *
    * Scale shape: the daily rollup is a ≤|days|-key map-side-combined
    * aggregation; everything after runs over that bounded table (the
    * median pick, the lag window, the scalar fold — all ≤|days| rows). */
  def runsTest(spark: SparkSession, dir: String): DataFrame =
    runsTestOfDaily(Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n")))

  /** The fold behind [[runsTest]] over an explicit (day, n) rollup —
    * exposed so the degenerate regimes (all days at the median, empty
    * input) are spec-testable without a synthetic parquet dir. */
  private[graft] def runsTestOfDaily(daily: DataFrame): DataFrame = {
    // n_days / median as STACKED windows over the ≤|days| rollup — the
    // three crossJoin(broadcast(...)) legs planned the orders rollup
    // three times (n_days, the median pick, and the signed base)
    val wAllR = Window.partitionBy(lit(1))
    // Every day stays through the fold: equal-to-median days carry a NULL
    // sign (excluded from the runs math by null-skipping aggregation, the
    // standard treatment) instead of being filtered out, so n_days is the
    // TRUE day count even when no day deviates from the median — the
    // degenerate input where a post-filter max() came back NULL while the
    // oracle's separate day-count CTE still reported it (ADVICE r15).
    val signed = daily
      .withColumn("n_days", count(lit(1)).over(wAllR))
      .withColumn("rk", row_number().over(Window.orderBy(col("n"), col("day"))))
      .withColumn("median", max(when(
        col("rk") === ceil(col("n_days").cast("double") * 0.5).cast("long"),
        col("n"))).over(wAllR))
      .withColumn("above",
        when(col("n") > col("median"), 1L).when(col("n") < col("median"), 0L))
    val folded = signed
      // lag over the non-NULL signs only: prev = the previous DEVIATING
      // day, exactly the oracle's lag over its filtered set
      .withColumn("prev",
        lag(col("above"), 1, null, ignoreNulls = true).over(Window.orderBy("day")))
      .agg(
        count(lit(1)).as("n_days"),
        // when() without otherwise: non-deviating rows contribute NULL, so
        // an all-equal-median input folds to NULL (the oracle's empty-set
        // sum), not a fabricated 0
        sum(when(col("above").isNotNull &&
          (col("prev").isNull || col("above") =!= col("prev")), 1L)).as("n_runs"),
        sum(col("above")).as("n_above"),
        sum(lit(1L) - col("above")).as("n_below"))
    folded
      .select(col("n_days"), col("n_above"), col("n_below"), col("n_runs"),
        (lit(2.0) * col("n_above") * col("n_below")
          / (col("n_above") + col("n_below")) + lit(1.0)).as("expected_runs"))
      .withColumn("z",
        when(col("n_above") > 0L && col("n_below") > 0L
            && col("n_above") + col("n_below") > 1L,
          (col("n_runs").cast("double") - col("expected_runs"))
            / sqrt(greatest(
              (lit(2.0) * col("n_above") * col("n_below")
                * (lit(2.0) * col("n_above") * col("n_below")
                  - col("n_above") - col("n_below")))
                / (((col("n_above") + col("n_below"))
                  * (col("n_above") + col("n_below"))
                  * (col("n_above") + col("n_below") - 1L)).cast("double")),
              lit(1e-300)))))
  }

  /** Daily new-vs-repeat order mix — the acquisition/retention split
    * every commerce dashboard leads with: per day, how many orders came
    * from customers placing their FIRST order vs returning ones. A
    * falling new share with flat volume means the business is coasting
    * on its installed base; read next to [[Events]]' cohort retention
    * (events-side) — this is the orders-side twin.
    *
    * Scale shape: first-order day is a per-customer MIN (map-side
    * combined, |customers| keys), attached back with one equi-join on
    * the same key (AQE broadcasts it when it fits), and the rollup is a
    * ≤|days|-key aggregation with exact integer counts. */
  def newVsRepeat(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), date_trunc("day", col("o_orderdate")).as("day"))
    val first = orders.groupBy("o_custkey").agg(min(col("day")).as("first_day"))
    orders.join(first, Seq("o_custkey"))
      .groupBy("day")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L)).as("n_repeat"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .withColumn("repeat_share",
        col("n_repeat").cast("double") / col("n_orders").cast("double"))
      .orderBy("day")
  }

  val newVsRepeatSql: String =
    """WITH o AS (
      |  SELECT o_custkey, date_trunc('day', o_orderdate) AS day FROM orders),
      |f AS (SELECT o_custkey, min(day) AS first_day FROM o GROUP BY 1)
      |SELECT day, count(*) AS n_orders,
      |       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |       CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
      |       count(DISTINCT o.o_custkey) AS n_customers,
      |       CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS repeat_share
      |FROM o JOIN f ON o.o_custkey = f.o_custkey
      |GROUP BY day ORDER BY day""".stripMargin

  val runsTestSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
      |  FROM orders GROUP BY 1),
      |nd AS (SELECT count(*) AS n_days FROM daily),
      |ranked AS (
      |  SELECT n, row_number() OVER (ORDER BY n, day) AS rk FROM daily),
      |med AS (
      |  SELECT n AS median FROM ranked CROSS JOIN nd
      |  WHERE rk = CAST(ceil(CAST(n_days AS DOUBLE) * 0.5) AS BIGINT)),
      |signed AS (
      |  SELECT day, CAST(n > median AS BIGINT) AS above
      |  FROM daily CROSS JOIN med WHERE n <> median),
      |runs AS (
      |  SELECT above, lag(above) OVER (ORDER BY day) AS prev FROM signed),
      |f AS (
      |  SELECT CAST(sum(CASE WHEN prev IS NULL OR above <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
      |         CAST(sum(above) AS BIGINT) AS n_above,
      |         CAST(sum(1 - above) AS BIGINT) AS n_below
      |  FROM runs),
      |e AS (
      |  SELECT nd.n_days, f.n_above, f.n_below, f.n_runs,
      |         2.0 * f.n_above * f.n_below / (f.n_above + f.n_below) + 1.0 AS expected_runs
      |  FROM f CROSS JOIN nd)
      |SELECT n_days, n_above, n_below, n_runs, expected_runs,
      |       CASE WHEN n_above > 0 AND n_below > 0 AND n_above + n_below > 1
      |            THEN (CAST(n_runs AS DOUBLE) - expected_runs)
      |                 / sqrt(greatest(
      |                     (2.0 * n_above * n_below
      |                       * (2.0 * n_above * n_below - n_above - n_below))
      |                     / CAST((n_above + n_below) * (n_above + n_below)
      |                            * (n_above + n_below - 1) AS DOUBLE),
      |                     1e-300)) END AS z
      |FROM e""".stripMargin

  val benfordAuditSql: String =
    """WITH expected(digit, expected) AS (VALUES
      |  (1, CAST(0.30103 AS DOUBLE)), (2, CAST(0.17609 AS DOUBLE)),
      |  (3, CAST(0.12494 AS DOUBLE)), (4, CAST(0.09691 AS DOUBLE)),
      |  (5, CAST(0.07918 AS DOUBLE)), (6, CAST(0.06695 AS DOUBLE)),
      |  (7, CAST(0.05799 AS DOUBLE)), (8, CAST(0.05115 AS DOUBLE)),
      |  (9, CAST(0.04576 AS DOUBLE))),
      |c AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |         count(*) AS n
      |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
      |SELECT CAST(e.digit AS BIGINT) AS digit,
      |       coalesce(c.n, 0) AS n_orders, t.n_total,
      |       CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
      |       e.expected,
      |       abs(CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(t.n_total AS DOUBLE) - e.expected) AS deviation
      |FROM expected e LEFT JOIN c ON e.digit = c.digit CROSS JOIN t
      |ORDER BY digit""".stripMargin

  /** TPC-H Q4 twin — order-priority checking: how many orders per
    * priority tier, placed in 1996 Q1, had at least one line item that
    * shipped more than 80 days after the order date (this export has no
    * commit/receipt dates, so lateness is ship-vs-order). The shape is
    * the classic decorrelated EXISTS: a LEFT SEMI join from the
    * (selectively filtered) orders side into lineitem on the order key
    * with the lateness predicate in the join condition, then a
    * ≤5-key hash aggregation.
    *
    * Scale shape: the quarter filter pushes to the orders scan; the
    * semi join shuffles both sides on the order key ONCE (no
    * duplication — semi joins emit each order at most once, so the
    * count needs no DISTINCT); the priority rollup is ≤5 keys,
    * map-side combined. */
  def q4PriorityLate(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
             col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    orders
      .join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 80 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")
  }

  val q4PriorityLateSql: String =
    """SELECT o_orderpriority, count(*) AS n_late_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 80 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q8 twin — national market share: of all STANDARD-part revenue
    * sold into ASIA, what share was supplied by NATION_2, per order
    * year. The numerator/denominator are ONE conditional aggregation
    * (no self-join): volume summed exactly in decimal, the NATION_2
    * slice via a conditional sum, the share a single double division
    * of the two exact sums.
    *
    * Scale shape: part/supplier/nation/region are broadcast (part is
    * filtered to one type first); customer joins pre-filtered to the
    * ASIA nations via a broadcast semi; the only data-row shuffles are
    * the lineitem⋈orders key shuffle and the final ≤|years| rollup. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part").where(col("p_type") === "STANDARD")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region").where(col("r_name") === "ASIA")
    val asiaNations = nation
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("asia_nkey"))
    val customer = Tables.load(spark, dir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("asia_nkey"), "left_semi")
    val supplier = Tables.load(spark, dir, "supplier")
    val suppNation = nation
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    lineitemWithDec(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .withColumn("vol", col("price_d") * (lit(1) - col("disc_d")))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2", col("vol"))
          .otherwise(lit(BigDecimal(0)).cast(DecimalType(12, 2))))
          .cast(DecimalType(30, 4)).cast("double").as("nation_volume"),
        sum(col("vol")).cast(DecimalType(30, 4)).cast("double").as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    """WITH v AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |         n2.n_name AS supp_nation,
      |         CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(12,2))) AS vol
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE p_type = 'STANDARD' AND r_name = 'ASIA')
      |SELECT o_year,
      |       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol
      |                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(30,4)) AS DOUBLE) AS nation_volume,
      |       CAST(CAST(sum(vol) AS DECIMAL(30,4)) AS DOUBLE) AS total_volume,
      |       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol
      |                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(30,4)) AS DOUBLE)
      |         / CAST(CAST(sum(vol) AS DECIMAL(30,4)) AS DOUBLE) AS mkt_share
      |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin

  /** TPC-H Q14 twin — promotion effect: per 1997 ship month, the share
    * of gross discounted revenue carried by PROMO-type parts. One
    * conditional aggregation over the month key; the part side is a
    * broadcast of only (partkey, is_promo).
    *
    * Scale shape: the ship-year filter pushes to the lineitem scan;
    * part is broadcast pruned to two columns; one ≤12-key rollup. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    lineitemWithDec(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .withColumn("vol", col("price_d") * (lit(1) - col("disc_d")))
      .groupBy(month(col("l_shipdate")).cast("long").as("ship_month"))
      .agg(
        sum(when(col("is_promo"), col("vol"))
          .otherwise(lit(BigDecimal(0)).cast(DecimalType(12, 2))))
          .cast(DecimalType(30, 4)).cast("double").as("promo_revenue"),
        sum(col("vol")).cast(DecimalType(30, 4)).cast("double").as("total_revenue"))
      .withColumn("promo_share",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
      .orderBy("ship_month")
  }

  val q14PromoShareSql: String =
    """WITH v AS (
      |  SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
      |         p_type = 'PROMO' AS is_promo,
      |         CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (1 - CAST(l_discount AS DECIMAL(12,2))) AS vol
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01')
      |SELECT ship_month,
      |       CAST(CAST(sum(CASE WHEN is_promo THEN vol
      |                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(30,4)) AS DOUBLE) AS promo_revenue,
      |       CAST(CAST(sum(vol) AS DECIMAL(30,4)) AS DOUBLE) AS total_revenue,
      |       100.0 * CAST(CAST(sum(CASE WHEN is_promo THEN vol
      |                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DECIMAL(30,4)) AS DOUBLE)
      |         / CAST(CAST(sum(vol) AS DECIMAL(30,4)) AS DOUBLE) AS promo_share
      |FROM v GROUP BY ship_month ORDER BY ship_month""".stripMargin

  /** TPC-H Q17 twin — small-quantity-order revenue: the average yearly
    * revenue that would be lost if Brand#12 orders below 20% of their
    * part's average order quantity were no longer filled. The
    * correlated per-part average is decorrelated into a per-part
    * aggregate re-joined to the same filtered slice; the 0.2·avg
    * threshold is evaluated OVERFLOW- and ROUNDING-free as
    * qty·cnt·5 < Σqty (both sides exact decimal/integer — no float
    * division whose rounding could flip a boundary row on one engine).
    *
    * Scale shape: the brand filter broadcasts (≤|parts of one brand|);
    * the per-part aggregate and the re-join shuffle on the part key
    * (AQE broadcasts the ≤80-row aggregate); one scalar fold at the
    * end. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.load(spark, dir, "part")
      .where(col("p_brand") === "Brand#12").select(col("p_partkey"))
    val li = lineitemWithDec(spark, dir)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("cnt"), sum(col("qty_d")).as("sum_qty"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .where(col("qty_d") * col("cnt") * lit(5) < col("sum_qty"))
      .agg(
        (sum(col("price_d")).cast(DecimalType(30, 4)).cast("double") / lit(7.0))
          .as("avg_yearly"),
        count(lit(1)).as("n_small_lines"))
  }

  val q17SmallQtySql: String =
    """WITH li AS (
      |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty_d,
      |         CAST(l_extendedprice AS DECIMAL(12,2)) AS price_d
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#12'),
      |pp AS (
      |  SELECT l_partkey AS pk, count(*) AS cnt, sum(qty_d) AS sum_qty
      |  FROM li GROUP BY 1)
      |SELECT CAST(CAST(sum(price_d) AS DECIMAL(30,4)) AS DOUBLE) / 7.0 AS avg_yearly,
      |       count(*) AS n_small_lines
      |FROM li JOIN pp ON l_partkey = pk
      |WHERE qty_d * cnt * 5 < sum_qty""".stripMargin

  /** TPC-H Q15 twin — top supplier(s): the supplier(s) with the maximum
    * discounted revenue over 1997 Q1, ties kept (the reference view +
    * scalar-subquery formulation). The max is a 1-row broadcast back
    * over the per-supplier aggregate; revenue equality compares the
    * SAME exact-decimal sum cast to double on both engines, so the
    * boundary cannot flip.
    *
    * Scale shape: quarter filter pushed to the scan; one ≤|suppliers|
    * aggregation; the max re-join is a broadcast of one row. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = lineitemWithDec(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
             col("l_shipdate") < lit("1997-04-01").cast("timestamp_ntz"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("price_d") * (lit(1) - col("disc_d")))
        .cast(DecimalType(30, 4)).cast("double").as("total_revenue"))
    // max as a window over the |suppliers|-row aggregate: the broadcast
    // form re-planned the whole lineitem aggregation — two full fact
    // passes vs one pass + a dimension-bounded single-partition window
    rev
      .withColumn("max_revenue",
        max(col("total_revenue")).over(Window.partitionBy(lit(1))))
      .where(col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.load(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(30,4)) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16 twin — parts/supplier relationship: how many distinct
    * suppliers shipped each (brand, type, size) combination, over a
    * size subset and excluding one brand (this export has no partsupp
    * table, so the relationship is read off shipped line items — same
    * question, observed rather than catalogued).
    *
    * Scale shape: the part filter broadcasts; the distinct-supplier
    * count is a two-level hash aggregation (partial distinct on
    * (brand,type,size,suppkey), then count) — Spark plans exactly
    * that from countDistinct; no row-level window anywhere. */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 5, 9, 13, 17, 21, 25, 29)
    val part = Tables.load(spark, dir, "part")
      .where(col("p_brand") =!= "Brand#1" && col("p_size").isin(sizes: _*))
    Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SupplierVarietySql: String =
    """SELECT p_brand, p_type, p_size,
      |       count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,9,13,17,21,25,29)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q18 twin — large-volume customers: orders whose total
    * quantity across all lines exceeds 300 units, with the customer
    * who placed them. The HAVING filter runs on the per-order
    * aggregate BEFORE the customer join, so only the ~dozens of
    * qualifying orders ever join.
    *
    * Scale shape: one per-order aggregation (map-side combined), the
    * >300 filter cuts it to a handful of rows, then two broadcast-able
    * joins (orders by key, customer by key) and a top-100. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = lineitemWithDec(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("qty_d")).as("sum_qty_d"))
      .where(col("sum_qty_d") > lit(BigDecimal(300)).cast(DecimalType(12, 2)))
      .withColumn("total_qty", col("sum_qty_d").cast("double"))
      .drop("sum_qty_d")
    big
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18LargeOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM big JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q19 twin — discounted revenue under a three-branch
    * disjunctive (brand, size-range, quantity-range) predicate — the
    * classic "OR across join columns" plan test: the per-branch
    * conjuncts stay in one filter after the broadcast part join, and
    * the common l_partkey = p_partkey conjunct is what the join keys
    * on (Catalyst extracts it; a naive engine cross-joins).
    *
    * Scale shape: part broadcast pruned to (key, brand, size); one
    * scan, one filter, one scalar fold — no shuffle of data rows. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val branch1 = col("p_brand") === "Brand#11" &&
      col("p_size").between(1, 5) && col("qty_d").between(1, 11)
    val branch2 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 10) && col("qty_d").between(10, 20)
    val branch3 = col("p_brand") === "Brand#13" &&
      col("p_size").between(1, 15) && col("qty_d").between(20, 30)
    lineitemWithDec(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .where(branch1 || branch2 || branch3)
      .agg(
        sum(col("price_d") * (lit(1) - col("disc_d")))
          .cast(DecimalType(30, 4)).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19DisjunctiveSql: String =
    """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |                      * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
      |       AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
      |       AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
      |       AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q9 twin — product-type profit by nation and year: for parts
    * whose name contains "gear", the per-(supplier-nation, order-year)
    * profit, with supply cost modelled as 60% of the part's retail
    * price (this export has no partsupp.ps_supplycost — the cost model
    * is a declared constant, not a lookup). All money math is exact
    * decimal up to the final double cast: revenue at scale 4, cost at
    * scale 6 (0.60 multiplier), so the subtraction is exact on both
    * engines.
    *
    * Scale shape: the name filter prunes part before broadcast;
    * supplier/nation broadcast; one lineitem⋈orders key shuffle and a
    * ≤|nations×years| rollup. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .where(col("p_name").contains("gear"))
      .select(col("p_partkey"), dec(col("p_retailprice")).as("retail_d"))
    val supplier = Tables.load(spark, dir, "supplier")
    val nation = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name").as("nation"))
    lineitemWithDec(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .withColumn("amount",
        (col("price_d") * (lit(1) - col("disc_d"))).cast(DecimalType(30, 6))
          - (col("retail_d") * col("qty_d")).cast(DecimalType(30, 4))
              * lit(BigDecimal("0.60")).cast(DecimalType(4, 2)))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(col("amount")).cast(DecimalType(32, 6)).cast("double").as("sum_profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProductProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |       CAST(CAST(sum(
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |              * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(30,6))
      |         - CAST(CAST(p_retailprice AS DECIMAL(12,2))
      |                * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(30,4))
      |             * CAST(0.60 AS DECIMAL(4,2))) AS DECIMAL(32,6)) AS DOUBLE) AS sum_profit,
      |       count(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE contains(p_name, 'gear')
      |GROUP BY 1, 2
      |ORDER BY 1, 2 DESC""".stripMargin

  /** TPC-H Q21 twin — suppliers who kept orders waiting: NATION_0
    * suppliers that shipped >100 days after the order date on a
    * multi-supplier order where NO other supplier was late (lateness is
    * ship-vs-order in this export — no commit/receipt dates). The
    * EXISTS becomes a LEFT SEMI on (same order, different supplier),
    * the NOT EXISTS a LEFT ANTI against the late-lines set.
    *
    * Scale shape: the nation filter prunes the base through a
    * broadcast semi; all three legs shuffle on the ORDER key only
    * (co-partitioned — AQE will reuse the exchange); the rollup is
    * ≤|suppliers| keys. */
  def q21LateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val nationSupp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")
          .where(col("n_name") === "NATION_0")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val withOrd = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    val late = withOrd
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS"))
      .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls"))
    val others = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ao"), col("l_suppkey").as("as_"))
    late
      .join(broadcast(nationSupp), col("ls") === col("s_suppkey"))
      .join(others, col("ao") === col("lo") && col("as_") =!= col("ls"), "left_semi")
      .join(late.select(col("lo").as("xo"), col("ls").as("xs")),
        col("xo") === col("lo") && col("xs") =!= col("ls"), "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21LateSupplierSql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON l1.l_orderkey = o_orderkey
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_0'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 100 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 100 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** TPC-H Q22 twin — global sales opportunity: per nation, the
    * above-average-balance customers who have placed NO order in the
    * export's final span (o_orderdate ≥ 2000-01-01) — lapsed capital.
    * The average is over positive balances only (the reference's
    * acctbal > 0.00 inner filter); this export has no phone country
    * codes, so the cohort key is the customer's nation.
    *
    * Scale shape: the positive-balance average is a 1-row broadcast;
    * the "no recent order" is a LEFT ANTI on the customer key against
    * the date-filtered orders (filter pushed to the orders scan);
    * ≤|nations| rollup. Balance sums are exact decimal to the final
    * double. */
  def q22IdleBalance(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
      .withColumn("bal_d", dec(col("c_acctbal")))
    val avgBal = customer.where(col("c_acctbal") > 0.0)
      .agg((sum(col("bal_d")).cast("double") / count(lit(1))).as("avg_bal"))
    val recent = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
      .select(col("o_custkey"))
    customer
      .crossJoin(broadcast(avgBal))
      .where(col("bal_d").cast("double") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("bal_d")).cast(DecimalType(30, 2)).cast("double").as("total_bal"))
      .orderBy("n_name")
  }

  val q22IdleBalanceSql: String =
    """SELECT n_name,
      |       count(*) AS n_custs,
      |       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(30,2)) AS DOUBLE) AS total_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) >
      |      (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
      |       FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q2 twin — minimum-cost supplier: for each LARGE small-size
    * part, the EUROPE supplier(s) offering it at the lowest observed
    * cost, ranked by supplier balance. This export has no partsupp
    * catalogue, so "offer cost" is observed: the minimum line price a
    * supplier ever shipped that part at. The correlated min-cost
    * subquery decorrelates into a per-part aggregate re-joined on
    * exact-decimal equality (min of DECIMAL(12,2) — identical on both
    * engines, the boundary cannot flip).
    *
    * Scale shape: the part slice and the EUROPE supplier set broadcast;
    * the (part, supplier) cost table shuffles once on its own key; the
    * per-part min re-join shuffles the ≤|parts-in-slice| aggregate
    * (AQE broadcasts it); output is a top-100. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .where(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_name"))
    val region = Tables.load(spark, dir, "region").where(col("r_name") === "EUROPE")
    val nation = Tables.load(spark, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supplier = Tables.load(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
    val cost = lineitemWithDec(spark, dir)
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select(col("s_suppkey").as("sk"))),
        col("l_suppkey") === col("sk"), "left_semi")
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(col("price_d")).as("cost_d"))
    val minCost = cost.groupBy(col("pk").as("mpk"))
      .agg(min(col("cost_d")).as("min_cost"))
    cost
      .join(minCost, col("pk") === col("mpk") && col("cost_d") === col("min_cost"))
      .join(broadcast(supplier), col("sk") === col("s_suppkey"))
      .join(broadcast(part), col("pk") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost_d").cast("double").as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2MinCostSupplierSql: String =
    """WITH cost AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |         min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost_d
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE p_type = 'LARGE' AND p_size <= 10 AND r_name = 'EUROPE'
      |  GROUP BY 1, 2),
      |mc AS (SELECT pk AS mpk, min(cost_d) AS min_cost FROM cost GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |       CAST(cost_d AS DOUBLE) AS cost
      |FROM cost
      |JOIN mc ON pk = mpk AND cost_d = min_cost
      |JOIN supplier ON sk = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN part ON pk = p_partkey
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** TPC-H Q11 twin — important parts: the parts carrying more than
    * 0.1% of the total observed supplied value from NATION_7's
    * suppliers (no partsupp in this export — "supplied value" is the
    * revenue those suppliers shipped per part). The Q11 threshold
    * scalar subquery is a 1-row broadcast; the fraction compare is
    * evaluated EXACTLY as value·1000 > total (integer-scaled decimal
    * multiply, no float division to flip a boundary part).
    *
    * Scale shape: the national supplier set broadcasts (semi); one
    * per-part aggregation (map-side combined); the total is a 1-row
    * broadcast back; ordered output with a partkey tiebreak so the
    * double-valued sort is total. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")
          .where(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = lineitemWithDec(spark, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(col("price_d")).cast(DecimalType(30, 2)).as("value_d"))
    val total = perPart.agg(sum(col("value_d")).cast(DecimalType(32, 2)).as("total"))
    perPart.crossJoin(broadcast(total))
      .where(col("value_d") * lit(1000) > col("total"))
      .select(col("p_partkey"), col("value_d").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val q11ImportantPartsSql: String =
    """WITH v AS (
      |  SELECT l_partkey AS p_partkey,
      |         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(30,2)) AS value_d
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_7'
      |  GROUP BY 1),
      |t AS (SELECT CAST(sum(value_d) AS DECIMAL(32,2)) AS total FROM v)
      |SELECT p_partkey, CAST(value_d AS DOUBLE) AS value
      |FROM v CROSS JOIN t
      |WHERE value_d * 1000 > total
      |ORDER BY value DESC, p_partkey""".stripMargin

  /** TPC-H Q12 twin — late-shipment priority mix: per return flag (the
    * line-side channel axis this export has; no l_shipmode), among
    * lines shipped more than 90 days after the order date, how many
    * came from URGENT/HIGH-priority orders vs the rest — Q12's exact
    * shape (order⋈line join, conditional priority-class counts,
    * tiny-key rollup) with lateness ship-vs-order.
    *
    * Scale shape: one lineitem⋈orders key shuffle (only (orderkey,
    * orderdate, priority) on the orders side), then a ≤3-key
    * map-side-combined conditional rollup. */
  def q12LatePriorityMix(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val q12LatePriorityMixSql: String =
    """SELECT l_returnflag,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q20 twin — dominant suppliers of a part family: suppliers
    * who shipped more than HALF of a *bolt*-part's total 1997 volume
    * single-handedly (the promotion-candidate read Q20 asks of
    * availqty; this export observes shipped quantity instead). The
    * half-share test is exact: 2·qty_sp > qty_p in integer-scaled
    * decimal — no float division.
    *
    * Scale shape: the name-filtered part set broadcasts; the
    * (supplier, part) and per-part aggregates shuffle on the part key
    * (co-partitioned — one exchange feeds both via AQE reuse); the
    * supplier attach is a broadcast; DISTINCT collapses ≤|suppliers|
    * rows. */
  def q20ExcessSupply(spark: SparkSession, dir: String): DataFrame = {
    val boltParts = Tables.load(spark, dir, "part")
      .where(col("p_name").contains("bolt")).select(col("p_partkey"))
    val li97 = lineitemWithDec(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(broadcast(boltParts), col("l_partkey") === col("p_partkey"))
    val perSuppPart = li97.groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(sum(col("qty_d")).cast(DecimalType(30, 2)).as("qty_sp"))
    val perPart = perSuppPart.groupBy(col("pk").as("ppk"))
      .agg(sum(col("qty_sp")).cast(DecimalType(32, 2)).as("qty_p"))
    perSuppPart
      .join(perPart, col("pk") === col("ppk"))
      .where(col("qty_sp") * lit(2) > col("qty_p"))
      .join(broadcast(Tables.load(spark, dir, "supplier")), col("sk") === col("s_suppkey"))
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name")).distinct()
      .orderBy("s_suppkey")
  }

  val q20ExcessSupplySql: String =
    """WITH q AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(30,2)) AS qty_sp
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE contains(p_name, 'bolt')
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1, 2),
      |p AS (SELECT pk AS ppk, CAST(sum(qty_sp) AS DECIMAL(32,2)) AS qty_p
      |      FROM q GROUP BY 1)
      |SELECT DISTINCT s_suppkey, s_name, n_name
      |FROM q
      |JOIN p ON pk = ppk
      |JOIN supplier ON sk = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE qty_sp * 2 > qty_p
      |ORDER BY s_suppkey""".stripMargin
}
