package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r18 optimization-round A/B variants (NOT registered; candidates are
  * promoted into the registered form only after an interleaved ProfileR18
  * win AND an oracle-equivalence pass). Each variant documents the guide
  * section that motivates it and the equivalence argument.
  */
object R18Variants {

  /** [[graft.analytics.Relational.tradeBalance]] with the ≤|nations|²-row
    * `cells` rollup pinned (localCheckpoint) before the two-branch union.
    * Guide §2.4/§3.3: the registered form plans the 5-join + aggregation
    * subtree TWICE (once per union branch — PLANS_r17/q_trade_balance.txt
    * nodes 1-34 and 35-67, no ReusedExchange); pinning materializes it
    * once. Equivalence: pin() only truncates lineage of the identical
    * rows; both branches read the same 625-row table. */
  def tradeBalancePinned(spark: SparkSession, dir: String): DataFrame = {
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

  /** [[graft.cdc.Monitoring.payloadProfile]] with ONE pass over the wire
    * serialization: the three per-level key explodes (root/after/before)
    * become one explode of the concatenated (level, key) arrays, so the
    * per-row to_json + json_object_keys pipeline — the query's dominant
    * cost — is evaluated once instead of three times (guide §2.3/§2.4;
    * PLANS_r17/cdc_payload_profile.txt shows 3 independent scan+spread+
    * generate branches). Equivalence: union-of-explodes and
    * explode-of-concat produce the same (topic, level, key) multiset —
    * a null key array contributes zero rows in both forms (explode skips
    * null/empty; coalesce to empty array keeps concat null-safe). */
  def payloadProfileOnePass(spark: SparkSession, dir: String): DataFrame = {
    val wire = graft.cdc.Cdc.toWire(spark, dir)
    val empty = array().cast("array<struct<level:string,key:string>>")
    def lk(level: String, arr: Column): Column =
      coalesce(transform(arr, k => struct(lit(level).as("level"), k.as("key"))), empty)
    val keyed = wire.select(col("topic"), explode(concat(
        lk("root", expr("json_object_keys(value)")),
        lk("after", expr("json_object_keys(get_json_object(value, '$.after'))")),
        lk("before", expr("json_object_keys(get_json_object(value, '$.before'))"))))
        .as("lk"))
      .select(col("topic"), col("lk.level").as("level"), col("lk.key").as("key"))
    val totals = wire.groupBy("topic").agg(count(lit(1)).as("n_msgs"))
    keyed.groupBy("topic", "level", "key")
      .agg(count(lit(1)).as("n_present"))
      .join(broadcast(totals), "topic")
      .select(col("topic"), col("level"), col("key"), col("n_present"), col("n_msgs"),
        (col("n_present").cast("double") / col("n_msgs").cast("double")).as("presence"))
      .orderBy("topic", "level", "key")
  }

  /** [[graft.analytics.Relational.marketBasket]] without the fact-table
    * self-join: collect each order's distinct parts ONCE (sorted), emit
    * all i<j pairs with a bounded per-row combination explode (guide
    * §3.3 "explode after the join", §2.4). The registered form scans +
    * distincts lineitem twice and shuffle-joins the two copies on
    * l_orderkey; this form scans once and shuffles once to group by
    * order. Equivalence: distinct (order, part) pairs → sorted distinct
    * part set per order; the i<j combinations of a sorted set are
    * exactly the part_a < part_b pairs of the self-join form; counts and
    * the deterministic top-k ordering follow. Basket size bounds the
    * per-row state (same bounded-collect argument as charDiversity). */
  def marketBasketPairs(spark: SparkSession, dir: String, topK: Int = 30): DataFrame = {
    val items = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val baskets = items.groupBy("l_orderkey")
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

  /** [[graft.analytics.Relational.madByFlag]] with the compute-stage
    * parallelism guard on the lineitem scan (guide §2.5 input skew /
    * single-split scan): the exact-percentile partial aggregation —
    * a boxed OpenHashMap update per row — otherwise runs on the ONE
    * task the single-row-group test file scans as. No-op at production
    * split counts (Tables.spread contract). Result identical: exact
    * percentile is order-independent. */
  def madByFlagSpread(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.spread(Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")))
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

  /** Attribution probe: just the med subtree of madByFlag. */
  def madMedOnly(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
      .groupBy("l_returnflag").agg(expr("percentile(l_extendedprice, 0.5)").as("med"))

  /** Attribution probe: plain scan+count-shaped pass over lineitem. */
  def scanOnly(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))

  /** Attribution probe: harness floor — trivial 1-row query. */
  def floor(spark: SparkSession, dir: String): DataFrame =
    spark.range(1).selectExpr("id")
}

/** Interleaved A/B runner for the r18 candidates: passes alternate
  * registered/variant within one JVM/window (the ProfileAB discipline) so
  * ambient drift hits both sides equally. */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "5").toInt
    val spark = Tables.localSession("graft-profile-r18",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val pairs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "floor" -> ((s, d) => R18Variants.floor(s, d)),
      "scan_only" -> ((s, d) => R18Variants.scanOnly(s, d)),
      "mad_med_only" -> ((s, d) => R18Variants.madMedOnly(s, d)),
      "q_mad_registered" -> ((s, d) => graft.analytics.Relational.madByFlag(s, d)),
      "q_mad_spread" -> ((s, d) => R18Variants.madByFlagSpread(s, d)),
      "trade_bal_registered" -> ((s, d) => graft.analytics.Relational.tradeBalance(s, d)),
      "trade_bal_pinned" -> ((s, d) => R18Variants.tradeBalancePinned(s, d)),
      "payload_registered" -> ((s, d) => graft.cdc.Monitoring.payloadProfile(s, d)),
      "payload_onepass" -> ((s, d) => R18Variants.payloadProfileOnePass(s, d)),
      "basket_registered" -> ((s, d) => graft.analytics.Relational.marketBasket(s, d)),
      "basket_pairs" -> ((s, d) => R18Variants.marketBasketPairs(s, d)))
    val chosen = if (args.nonEmpty) pairs.filter(p => args.contains(p._1)) else pairs
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to passes).foreach { _ =>
      chosen.foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    chosen.foreach { case (n, _) =>
      val ts = times(n).sorted
      println(f"$n%-24s median ${ts(ts.length / 2)}%.3f  min ${ts.head}%.3f  " +
        ts.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
