package graft

import graft.cdc.Monitoring
import graft.similarity.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-9 operator batch. */
class Round9Spec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("kmeans converge: trajectory is partition-order independent bit-for-bit") {
    // the operator's 2^40-quantized sums must make the trajectory exactly
    // reproducible under a different shuffle layout — the property that
    // lets a 1000-executor run and a laptop agree on the same index
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = Ann.kmeansConverge(spark, dir).collect().map(_.toString)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Ann.kmeansConverge(spark, dir).collect().map(_.toString)
      assert(a.sameElements(b), "trajectory must not depend on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("kmeans converge: once converged, the fixed point persists") {
    val rows = Ann.kmeansConverge(spark, dir).collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_moved") >= 0L)
      assert(r.getAs[Long]("n_active_labels") >= 1L)
      assert(Option(r.getAs[Double]("max_shift")).forall(_ >= 0.0))
      assert(r.getAs[Boolean]("converged") === (r.getAs[Long]("n_moved") == 0L))
    }
    // Lloyd is idempotent at a fixed point: converged can never revert
    val flags = rows.map(_.getAs[Boolean]("converged"))
    flags.zip(flags.tail).foreach { case (prev, next) =>
      assert(!prev || next, "a converged round must stay converged")
    }
    // moving zero vectors forces a zero centroid shift
    rows.filter(_.getAs[Boolean]("converged")).foreach { r =>
      assert(r.getAs[Double]("max_shift") === 0.0)
    }
  }

  test("checkpoint browse: checkpoints tile the stream, positions are per-table maxima") {
    val rows = Monitoring.checkpointBrowse(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
    assert(rows.map(_.getAs[Long]("rows_processed")).sum === ev.count())
    assert(rows.map(r => (r.getAs[String]("pipeline_id"), r.getAs[String]("table_name"))).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getAs[String]("checkpoint_id") ===
        r.getAs[String]("pipeline_id") + "_" + r.getAs[String]("table_name"))
      assert(r.getAs[String]("checkpoint_type") === "lsn")
    }
    // re-derive one checkpoint from the raw events
    val first = rows.head
    val cohort = first.getAs[String]("pipeline_id").stripPrefix("pl_").toInt
    val expected = ev
      .where(col("user_id") % 3 === cohort && col("event_type") === first.getAs[String]("table_name"))
      .agg(max("event_id"), count(lit(1))).collect()(0)
    assert(first.getAs[Long]("lsn") === expected.getLong(0))
    assert(first.getAs[Long]("rows_processed") === expected.getLong(1))
  }

  test("sync stats: statuses partition the counts and the rate sits on the 2-decimal floor grid") {
    val rows = Monitoring.syncStats(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
    assert(rows.map(_.getAs[Long]("events_captured")).sum === ev.count())
    rows.foreach { r =>
      val total = r.getAs[Long]("events_captured")
      assert(r.getAs[Long]("events_applied") + r.getAs[Long]("events_failed") +
        r.getAs[Long]("events_pending") === total)
      val rate = r.getAs[Double]("success_rate")
      assert(rate === (r.getAs[Long]("events_applied") * 10000L / total).toDouble / 100.0)
      assert(rate >= 0.0 && rate <= 100.0)
    }
  }

}
