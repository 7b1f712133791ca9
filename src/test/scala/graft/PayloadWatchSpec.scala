package graft

import graft.cdc.Cdc
import graft.streaming.PayloadWatch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming payload-presence watch: a declared field dropping off the
  * wire surfaces as an alert row with exact counts and the first
  * offending offset, while deletes (which legitimately carry no
  * `after`) and a healthy wire never alert. */
class PayloadWatchSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("missing declared fields alert with exact counts; deletes and clean wire do not") {
    val base = Files.createTempDirectory("payloadwatch").toString
    val wire = s"$base/wire"

    // healthy traffic on the click topic only, plus crafted messages:
    // two clicks whose after omits `value`, one omitting `event_type`,
    // and a delete with no after at all (must NOT alert)
    Cdc.toWire(spark, dir)
      .where(col("topic") === "graft.public.click" && col("offset") < 100)
      .write.mode("append").json(wire)
    val crafted = Seq(
      """{"topic":"graft.public.click","offset":900001,"value":"{\"after\":{\"user_id\":1,\"event_type\":\"click\"},\"op\":\"c\",\"ts_ms\":1}"}""",
      """{"topic":"graft.public.click","offset":900002,"value":"{\"after\":{\"user_id\":2,\"event_type\":\"click\"},\"op\":\"c\",\"ts_ms\":2}"}""",
      """{"topic":"graft.public.click","offset":900003,"value":"{\"after\":{\"user_id\":3,\"value\":1.5},\"op\":\"c\",\"ts_ms\":3}"}""",
      """{"topic":"graft.public.error","offset":900004,"value":"{\"before\":{\"user_id\":4,\"event_type\":\"error\",\"value\":9.0},\"op\":\"d\",\"ts_ms\":4}"}""")
    import spark.implicits._
    crafted.toDF("value").coalesce(1).write.mode("append").text(wire)

    val nHealthy = Cdc.toWire(spark, dir)
      .where(col("topic") === "graft.public.click" && col("offset") < 100).count()

    val q = PayloadWatch.start(spark, wire, s"$base/alerts", s"$base/ckpt")
    q.processAllAvailable()
    q.stop()

    // the audit is PER MICRO-BATCH (drift is caught the batch it starts),
    // and file batching is not deterministic here — assert on the
    // batch-split-independent invariants instead
    val alerts = spark.read.parquet(s"$base/alerts").collect()
      .map(r => ((r.getAs[String]("topic"), r.getAs[String]("field")),
        (r.getAs[Long]("n_msgs"), r.getAs[Long]("n_present"),
          r.getAs[Long]("first_missing_offset"))))
    assert(nHealthy > 0)
    // only the click topic alerts, on exactly the two dropped fields
    assert(alerts.map(_._1).toSet === Set(
      ("graft.public.click", "value"), ("graft.public.click", "event_type")))
    def missing(field: String) = alerts.collect {
      case ((_, f), (m, p, _)) if f == field => m - p
    }.sum
    assert(missing("value") == 2L, "two crafted messages dropped `value`")
    assert(missing("event_type") == 1L)
    def firstMissing(field: String) = alerts.collect {
      case ((_, f), (_, _, o)) if f == field => o
    }.min
    assert(firstMissing("value") == 900001L)
    assert(firstMissing("event_type") == 900003L)
    // every alert row's presence is the exact in-batch ratio below 1
    alerts.foreach { case (_, (m, p, _)) => assert(p < m && p >= 0) }

    // a fully-populated wire (including its deletes) never alerts
    val clean = s"$base/wire_clean"
    Cdc.toWire(spark, dir).where(col("offset") < 100)
      .write.mode("append").json(clean)
    val q2 = PayloadWatch.start(spark, clean, s"$base/alerts_clean", s"$base/ckpt_clean")
    q2.processAllAvailable()
    q2.stop()
    assert(!new java.io.File(s"$base/alerts_clean").exists() ||
      spark.read.parquet(s"$base/alerts_clean").isEmpty)
  }
}
