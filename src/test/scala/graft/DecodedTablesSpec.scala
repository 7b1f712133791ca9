package graft

import graft.multimodal.Decoded
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decoded.writeDecodedTables — the executable 100 TB shape of the
  * decode-once tables: persisted parquet bucketed by doc_id must (a) hold
  * exactly the memoized tables' rows, and (b) make per-document joins
  * across decode tables exchange-free on the bucketed sides (the whole
  * point of bucketing at ingest: downstream metric joins never reshuffle
  * the decoded corpus).
  */
class DecodedTablesSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  private val prefix = "graft_decoded_spec"

  private def withTables[A](f: => A): A =
    try f finally Seq("images", "audio", "video_frames", "video_scenes")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  test("persisted bucketed tables round-trip the memoized decode tables exactly") {
    withTables {
      val names = Decoded.writeDecodedTables(spark, dir, buckets = 4, tablePrefix = prefix)
      assert(names.size == 4)
      val memo = Decoded.images(spark, dir).collect().map(_.toString).sorted
      val disk = Decoded.readDecodedTable(spark, s"${prefix}_images")
        .collect().map(_.toString).sorted
      assert(disk.nonEmpty && disk.toSeq == memo.toSeq)
      val memoV = Decoded.videoFrames(spark, dir).collect().map(_.toString).sorted
      val diskV = Decoded.readDecodedTable(spark, s"${prefix}_video_frames")
        .collect().map(_.toString).sorted
      assert(diskV.toSeq == memoV.toSeq)
    }
  }

  test("per-document join across persisted decode tables is exchange-free (bucket co-partitioning)") {
    withTables {
      Decoded.writeDecodedTables(spark, dir, buckets = 4, tablePrefix = prefix)
      // disable broadcast so the bucket claim is load-bearing: a broadcast
      // join would be exchange-free vacuously
      val joined = org.apache.spark.sql.graftbridge.SessionBridge.rebindWithConf(
        Decoded.readDecodedTable(spark, s"${prefix}_images")
          .join(Decoded.readDecodedTable(spark, s"${prefix}_audio"), "doc_id")
          .select(col("doc_id"), col("n_pixels"), col("n_samples")),
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false")
      val n = joined.count()
      assert(n == Tables.load(spark, dir, "documents").count())
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
        case a: AdaptiveSparkPlanExec => a // AQE off above — must not appear
      }
      assert(shuffles.isEmpty,
        s"bucketed doc_id join must not reshuffle either side:\n${joined.queryExecution.executedPlan}")
    }
  }
}
