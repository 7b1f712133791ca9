package graft

import graft.cdc.{Cdc, Materialize}
import graft.sources.WireSource
import graft.streaming.{CdcStream, ChangeEvent}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The core engine equivalence: consuming the wire topic as a STREAM
  * through the stateful apply operator ends in exactly the state the
  * BATCH materializer computes — the CDC pipeline's replayability
  * guarantee.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("streamed wire apply ends in the batch-materialized state") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("parity").toString
    WireSource.publish(spark, dir, tmp)

    val changes = WireSource.readStream(spark, tmp)
      .select(
        col("op"),
        coalesce(col("after.user_id"), col("before.user_id")).as("pk"),
        timestamp_millis(col("ts_ms")).as("ts"),
        col("offset").as("seq"),
        coalesce(col("after.value"), col("before.value")).as("value"))
      .as[ChangeEvent]

    val q = CdcStream.applyChanges(changes)
      .writeStream.format("memory").queryName("parity_state").outputMode("update").start()
    q.processAllAvailable()
    q.stop()

    // last emission per key = final streamed state
    val streamed = spark.table("parity_state")
      .groupBy("pk")
      .agg(max_by(col("value"), col("seq")).as("value"))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toMap

    val batch = Materialize.latestSnapshot(Cdc.changelog(spark, dir))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap

    // keys whose final op was delete were emitted earlier but carry no
    // final state; batch is the ground truth for surviving keys
    batch.foreach { case (k, v) => assert(streamed.get(k).contains(v), s"key $k") }
  }
}
