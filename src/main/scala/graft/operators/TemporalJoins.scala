package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from
  * existing ops so Catalyst still owns the physical plan.
  *
  * As-of join uses the union+window pattern: tag both sides, sort within
  * key by (time, side), and carry the last build-side row forward. One
  * hash shuffle by key, no range-condition join (which Spark would
  * execute as BroadcastNestedLoop), no per-event probe. This is the shape
  * that survives 100 TB — the probe side never amplifies.
  *
  * Events land in 2024 while orders live in 1995–2001, so event times are
  * shifted back 28 years to make the as-of relationship meaningful; both
  * engines do identical calendar arithmetic.
  */
object TemporalJoins {

  /** For each event: the customer's most recent order at-or-before the
    * (shifted) event time. FAMILY DEFAULT — routes through the native
    * codegen'd operator ([[graft.plans.AsOfJoinExec]]): it beats the
    * composed union+window form both warm (0.95 vs 1.06 s, r13 bench)
    * and cold (1.1 vs 3.5 s) while holding O(1) merge state instead of a
    * window buffer. The composed form stays registered as
    * `q_asof_join_composed` so the oracle keeps cross-checking both
    * plans against each other every round. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame =
    asofJoinNative(spark, dir)

  /** The union+window composition (tag both sides, one hash shuffle by
    * key, carry the last build-side row forward). Previously the family
    * default; now the registered cross-check twin for the native node. */
  def asofJoinComposed(spark: SparkSession, dir: String): DataFrame = {
    val ordersDedup = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("time"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val events = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id").as("key"),
        (col("ts") - expr("INTERVAL 28 YEARS")).as("time"))

    val tagged = ordersDedup
      .select(col("key"), col("time"), lit(0).as("is_event"),
        lit(null).cast("long").as("event_id"), col("o_orderkey"), col("time").as("o_time"))
      .unionByName(events
        .select(col("key"), col("time"), lit(1).as("is_event"),
          col("event_id"), lit(null).cast("long").as("o_orderkey"),
          lit(null).cast("timestamp_ntz").as("o_time")))

    // order rows sort before events at the same instant → >= semantics
    val w = Window.partitionBy("key").orderBy("time", "is_event")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_order",
        last(when(col("is_event") === 0, struct(col("o_orderkey"), col("o_time"))),
          ignoreNulls = true).over(w))
      .where(col("is_event") === 1)
      .select(
        col("event_id"),
        col("key").as("user_id"),
        col("last_order.o_orderkey").as("last_orderkey"),
        col("last_order.o_time").as("last_orderdate"))
      .orderBy("event_id")
  }

  /** Same as-of semantics through the NATIVE custom operator
    * ([[graft.plans.AsOfJoinNode]] → AsOfJoinStrategy → AsOfJoinExec):
    * co-partitioned sorted merge with O(1) state instead of the tagged
    * union + window pass. Shares [[asofJoin]]'s oracle — the correctness
    * gate proves the custom physical operator bit-matches the composed
    * plan. */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val right = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("otime"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("key"), col("otime"), col("o_orderkey"))
    val left = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id").as("key"),
        (col("ts") - expr("INTERVAL 28 YEARS")).as("time"))
    graft.plans.AsOf.asofJoin(left, right, "key", "time", "key", "otime")
      .select(
        col("event_id"),
        col("key").as("user_id"),
        col("o_orderkey").as("last_orderkey"),
        col("otime").as("last_orderdate"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """WITH od AS (
      |  SELECT o_custkey AS key, o_orderdate AS otime, max(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate),
      |ev AS (
      |  SELECT event_id, user_id, ts - INTERVAL 28 YEAR AS etime FROM events)
      |SELECT ev.event_id, ev.user_id,
      |       od.o_orderkey AS last_orderkey, od.otime AS last_orderdate
      |FROM ev ASOF LEFT JOIN od
      |  ON ev.user_id = od.key AND ev.etime >= od.otime
      |ORDER BY event_id""".stripMargin

  /** As-of join with a staleness tolerance (pandas merge_asof's
    * `tolerance`, kdb wj's window): the carried match only counts when it
    * is at most `toleranceDays` old at the probe instant — a stale match
    * is surfaced as NULLs plus an `is_stale` flag rather than silently
    * joining year-old state onto today's event. FAMILY DEFAULT — the
    * native merge does the as-of, the tolerance is the post-merge
    * projection it always was (the native node's right time column IS the
    * "matched at" timestamp, so freshness is a plain column comparison).
    * The union+window composition stays registered as
    * `q_asof_join_tolerance_composed`. */
  def asofJoinTolerance(
      spark: SparkSession, dir: String, toleranceDays: Int = 90): DataFrame = {
    val right = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("otime"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("key"), col("otime"), col("o_orderkey"))
    val left = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id").as("key"),
        (col("ts") - expr("INTERVAL 28 YEARS")).as("time"))
    graft.plans.AsOf.asofJoin(left, right, "key", "time", "key", "otime")
      .withColumn("fresh",
        col("otime") >= col("time") - expr(s"INTERVAL $toleranceDays DAYS"))
      .select(
        col("event_id"),
        col("key").as("user_id"),
        when(col("fresh"), col("o_orderkey")).as("last_orderkey"),
        when(col("fresh"), col("otime")).as("last_orderdate"),
        (col("otime").isNotNull && !coalesce(col("fresh"), lit(false)))
          .as("is_stale"))
      .orderBy("event_id")
  }

  /** The composed (union+window) tolerance variant — registered as the
    * oracle cross-check twin `q_asof_join_tolerance_composed`. */
  def asofJoinToleranceComposed(
      spark: SparkSession, dir: String, toleranceDays: Int = 90): DataFrame = {
    val ordersDedup = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("time"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val events = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id").as("key"),
        (col("ts") - expr("INTERVAL 28 YEARS")).as("time"))
    val tagged = ordersDedup
      .select(col("key"), col("time"), lit(0).as("is_event"),
        lit(null).cast("long").as("event_id"), col("o_orderkey"), col("time").as("o_time"))
      .unionByName(events
        .select(col("key"), col("time"), lit(1).as("is_event"),
          col("event_id"), lit(null).cast("long").as("o_orderkey"),
          lit(null).cast("timestamp_ntz").as("o_time")))
    val w = Window.partitionBy("key").orderBy("time", "is_event")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_order",
        last(when(col("is_event") === 0, struct(col("o_orderkey"), col("o_time"))),
          ignoreNulls = true).over(w))
      .where(col("is_event") === 1)
      .withColumn("fresh",
        col("last_order.o_time") >= col("time") - expr(s"INTERVAL $toleranceDays DAYS"))
      .select(
        col("event_id"),
        col("key").as("user_id"),
        when(col("fresh"), col("last_order.o_orderkey")).as("last_orderkey"),
        when(col("fresh"), col("last_order.o_time")).as("last_orderdate"),
        (col("last_order").isNotNull && !coalesce(col("fresh"), lit(false)))
          .as("is_stale"))
      .orderBy("event_id")
  }

  def asofJoinToleranceSql(toleranceDays: Int = 90): String =
    s"""WITH od AS (
       |  SELECT o_custkey AS key, o_orderdate AS otime, max(o_orderkey) AS o_orderkey
       |  FROM orders GROUP BY o_custkey, o_orderdate),
       |ev AS (
       |  SELECT event_id, user_id, ts - INTERVAL 28 YEAR AS etime FROM events)
       |SELECT ev.event_id, ev.user_id,
       |       CASE WHEN od.otime >= ev.etime - INTERVAL $toleranceDays DAY THEN od.o_orderkey END AS last_orderkey,
       |       CASE WHEN od.otime >= ev.etime - INTERVAL $toleranceDays DAY THEN od.otime END AS last_orderdate,
       |       od.otime IS NOT NULL AND od.otime < ev.etime - INTERVAL $toleranceDays DAY AS is_stale
       |FROM ev ASOF LEFT JOIN od
       |  ON ev.user_id = od.key AND ev.etime >= od.otime
       |ORDER BY event_id""".stripMargin

  /** Range join, bucketed: for each delete/error event, count the same
    * user's other events in the preceding hour. Instead of an inequality
    * join (nested-loop in Spark), both sides join on (user, hour-bucket)
    * over the 2 covering buckets — candidate sets stay bounded. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val probes = events.where(col("event_type") === "error")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val base = events
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))

    // each probe looks at its own hour bucket and the previous one
    val probeBuckets = probes.select(col("p_id"), col("p_user"), col("p_ts"),
      explode(array(
        floor(unix_millis(col("p_ts")) / 3600000L),
        floor(unix_millis(col("p_ts")) / 3600000L) - 1)).as("bucket"))
    val baseBuckets = base.withColumn("bucket", floor(unix_millis(col("b_ts")) / 3600000L))

    probeBuckets
      .join(baseBuckets, Seq("bucket"))
      .where(col("b_user") === col("p_user") &&
        col("b_id") =!= col("p_id") &&
        col("b_ts") <= col("p_ts") &&
        unix_millis(col("p_ts")) - unix_millis(col("b_ts")) <= 3600000L)
      .groupBy(col("p_id").as("event_id"))
      .agg(count(lit(1)).as("n_recent"))
      .orderBy("event_id")
  }

  val rangeJoinSql: String =
    """SELECT p.event_id, count(*) AS n_recent
      |FROM events p JOIN events b
      |  ON p.event_type = 'error'
      | AND b.user_id = p.user_id
      | AND b.event_id <> p.event_id
      | AND b.ts <= p.ts
      | AND epoch_ms(p.ts) - epoch_ms(b.ts) <= 3600000
      |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin
}
