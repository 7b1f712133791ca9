package graft

import graft.cdc.Cdc
import graft.streaming.SchemaWatch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming schema-drift watch: unknown envelope fields on the live wire
  * surface as alert rows carrying the cross-dialect ALTER delta, while
  * the declared-schema apply path stays oblivious (from_json drops
  * unknown fields silently — the watch sees what the apply ignored). */
class SchemaWatchSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("drifted wire fields produce alerts with the ALTER delta; clean wire produces none") {
    val base = Files.createTempDirectory("schemawatch").toString
    val wire = s"$base/wire"

    // normal traffic + 3 messages whose after carries an undeclared field
    Cdc.toWire(spark, dir).where(col("offset") < 200)
      .write.mode("append").json(wire)
    val drifted = Seq(
      """{"topic":"graft.public.click","offset":900001,"value":"{\"after\":{\"user_id\":1,\"event_type\":\"click\",\"value\":2.0,\"loyalty_tier\":\"gold\"},\"op\":\"c\",\"ts_ms\":1}"}""",
      """{"topic":"graft.public.click","offset":900002,"value":"{\"after\":{\"user_id\":2,\"event_type\":\"click\",\"value\":3.0,\"loyalty_tier\":\"silver\"},\"op\":\"c\",\"ts_ms\":2}"}""",
      """{"topic":"graft.public.click","offset":900003,"value":"{\"after\":{\"user_id\":3,\"event_type\":\"click\",\"value\":4.0,\"referrer_url\":\"x\"},\"op\":\"c\",\"ts_ms\":3}"}""")
    import spark.implicits._
    drifted.toDF("value").coalesce(1).write.mode("append").text(wire)

    val q = SchemaWatch.start(spark, wire, s"$base/alerts", s"$base/ckpt")
    q.processAllAvailable()
    q.stop()

    val alerts = spark.read.parquet(s"$base/alerts")
      .collect().map(r => r.getAs[String]("field") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("first_offset"), r.getAs[String]("alter_ddl")))
      .toMap
    assert(alerts.keySet === Set("loyalty_tier", "referrer_url"))
    assert(alerts("loyalty_tier")._1 === 2L)
    assert(alerts("loyalty_tier")._2 === 900001L)
    assert(alerts("loyalty_tier")._3 ===
      "ALTER TABLE \"events\" ADD COLUMN \"loyalty_tier\" TEXT")
    assert(alerts("referrer_url")._1 === 1L)

    // declared fields never alert: a clean wire yields an empty/absent sink
    val clean = s"$base/wire_clean"
    Cdc.toWire(spark, dir).where(col("offset") < 100)
      .write.mode("append").json(clean)
    val q2 = SchemaWatch.start(spark, clean, s"$base/alerts_clean", s"$base/ckpt_clean")
    q2.processAllAvailable()
    q2.stop()
    assert(!new java.io.File(s"$base/alerts_clean").exists() ||
      spark.read.parquet(s"$base/alerts_clean").isEmpty)
  }
}
