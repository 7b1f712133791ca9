package graft

import java.nio.file.Files

import graft.dedup.Dedup
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production admission path's shuffle budget: with the LSH band
  * index persisted bucketed by band_key, the admission join must not
  * re-shuffle the index — only the fresh batch side pays an Exchange.
  */
class BucketedAdmissionSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("band join against the bucketed signature index shuffles ONLY the batch side") {
    val base = Files.createTempDirectory("admission_idx").toString
    Dedup.writeAdmissionIndex(spark, dir, "adm_index", s"$base/idx", nBuckets = 8)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val savedAuto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      // forbid broadcast: at 100 TB neither the index nor a real crawl
      // batch broadcasts — the test must exercise the co-located path.
      // AQE off for the assertion: completed query stages hide their
      // Exchange nodes from plan.collect, and AQE's
      // DisableUnnecessaryBucketedScan can veto the bucketed scan on a
      // corpus this small — the static plan is the layout contract the
      // test pins.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val batch = Tables.loadSerial(spark, dir, "documents")
        .where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
      val cands = Dedup.admissionCandidates(spark, batch, "adm_index")
      cands.collect()
      val plan = cands.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.length == 1,
        s"expected exactly the batch-side shuffle, got ${shuffles.length}:\n$plan")
      val scans = plan.collect { case f: FileSourceScanExec => f }
      assert(scans.exists(_.toString.contains("Bucketed: true")),
        s"index scan must be bucketed:\n$plan")

      // semantics: every exact copy of an index doc must collide with its
      // source on all 4 bands (identical text -> identical signature)
      val copies = Tables.loadSerial(spark, dir, "documents")
        .where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 9000000L).as("doc_id"), col("doc_id").as("src_id"),
          col("text"))
      val rolled = Dedup.admitAgainstIndex(spark, copies.select("doc_id", "text"), "adm_index")
      val bySrc = rolled.join(
          copies.select(col("doc_id"), col("src_id")), "doc_id")
        .collect()
      assert(bySrc.nonEmpty)
      bySrc.foreach { r =>
        assert(r.getAs[Long]("n_index_candidates") >= 1L,
          s"copy of ${r.getAs[Long]("src_id")} must hit its source in the index")
        assert(r.getAs[Long]("n_band_hits") >= 4L,
          "an exact copy shares all 4 bands with its source")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", savedAuto)
      spark.sql("DROP TABLE IF EXISTS adm_index")
    }
  }
}
