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

  test("Bloom front-end: zero false drops vs the exact path, novel keys die at the broadcast pre-filter") {
    val base = Files.createTempDirectory("admission_idx_bloom").toString
    Dedup.writeAdmissionIndex(spark, dir, "adm_index_b", s"$base/idx", nBuckets = 8)
    try {
      // a half-and-half crawl batch: exact copies of index docs (must ALL
      // survive the Bloom stage — no false negatives) plus novel docs
      // (mostly filtered before the index join)
      val docs = Tables.loadSerial(spark, dir, "documents")
      val copies = docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
      val novel = docs.where(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 9500000L).as("doc_id"),
          concat(lit("zz novel "), col("text"), lit(" qq"), col("doc_id").cast("string")).as("text"))
      val batch = copies.unionByName(novel)
      val exact = Dedup.admissionCandidates(spark, batch, "adm_index_b")
        .collect().map(_.toString).sorted
      val twoStage = Dedup.admissionCandidatesBloom(spark, batch, "adm_index_b")
      val got = twoStage.collect().map(_.toString).sorted
      // zero false drops: Bloom has no false negatives, so the two-stage
      // path's candidate set is EXACTLY the single-stage one
      assert(exact.nonEmpty && got.toSeq == exact.toSeq,
        "the Bloom pre-filter must not drop a single real candidate")
      // the pre-filter is the cheap broadcast shape: the bits table joins
      // as a BroadcastHashJoin BEFORE the index join
      val plan = twoStage.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"the bit table must broadcast:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS adm_index_b")
    }
  }
}
