package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Bucketed co-location: the write-once-shuffle, read-many-joins layout.
  * The assertions pin the property that matters at scale — the join and
  * the key aggregation plan with ZERO Exchange over bucketed scans. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("equal-bucket join and key aggregation plan with zero Exchange") {
    val base = Files.createTempDirectory("buckets").toString
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val customer = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", s"$base/o", nBuckets = 8)
    Bucketing.writeBucketed(customer, "b_customer", "o_custkey", s"$base/c", nBuckets = 8)

    // forbid broadcast so the test exercises the co-located SMJ path the
    // layout exists for (at scale neither side broadcasts)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_customer", "o_custkey")
      joined.collect()
      val jp = joined.queryExecution.executedPlan.toString
      assert(!jp.contains("Exchange"), s"bucketed join still shuffles:\n$jp")
      assert(jp.contains("SortMergeJoin") || jp.contains("ShuffledHashJoin"))

      val agg = Bucketing.bucketLocalAgg(spark, "b_orders", "o_custkey")
      agg.collect()
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"), s"bucketed agg still shuffles:\n$ap")

      // same answers as the unbucketed plan
      val expected = orders.join(
        Tables.load(spark, dir, "customer").select(col("c_custkey").as("o_custkey"), col("c_name")),
        "o_custkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("multiple-of bucket counts coalesce instead of shuffling (power-of-two rule)") {
    val base = Files.createTempDirectory("buckets2").toString
    val orders = Tables.load(spark, dir, "orders").select(col("o_custkey"), col("o_orderkey"))
    val customer = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    Bucketing.writeBucketed(orders, "b_orders8", "o_custkey", s"$base/o", nBuckets = 8)
    Bucketing.writeBucketed(customer, "b_customer4", "o_custkey", s"$base/c", nBuckets = 4)
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // without coalescing, mismatched counts shuffle BOTH sides — the
      // failure mode the Scaladoc's shared-power-of-two guidance avoids
      spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false")
      val strict = Bucketing.colocatedJoin(spark, "b_orders8", "b_customer4", "o_custkey")
      strict.collect()
      assert("Exchange hashpartitioning".r
        .findAllIn(strict.queryExecution.executedPlan.toString).length === 2)
      // with coalescing, 8 buckets fold onto 4 — zero Exchange again
      spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      val coalesced = Bucketing.colocatedJoin(spark, "b_orders8", "b_customer4", "o_custkey")
      coalesced.collect()
      val p = coalesced.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"coalesced bucket join still shuffles:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS b_orders8")
      spark.sql("DROP TABLE IF EXISTS b_customer4")
    }
  }
}
