package graft

import graft.cdc.{Cdc, Materialize}
import graft.sources.WireSource
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class PipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("streaming pipeline ends in the batch-materialized state") {
    val base = Files.createTempDirectory("pipeline").toString
    WireSource.publish(spark, dir, s"$base/wire")

    val q = Pipeline.start(spark, Pipeline.Config(
      wirePath = s"$base/wire",
      statePath = s"$base/state",
      checkpointPath = s"$base/ckpt"))
    q.processAllAvailable()
    val st = Pipeline.status(q)
    q.stop()

    assert(st("isActive") === true)
    assert(st("batchId").asInstanceOf[Long] >= 0L)

    val state = spark.read.parquet(s"$base/state")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Materialize.latestSnapshot(Cdc.changelog(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // streaming ts is ms-truncated; values must still agree because seq
    // breaks ordering ties identically
    assert(state.keySet === expected.keySet)
    expected.foreach { case (k, v) => assert(state(k) === v, s"key $k") }
  }

  test("pipeline routes poisoned messages to the DLQ, applies the rest") {
    val base = Files.createTempDirectory("dlq").toString
    WireSource.publish(spark, dir, s"$base/wire")
    // inject a poisoned wire file: valid (topic, offset) but garbage envelope
    Files.writeString(
      java.nio.file.Path.of(s"$base/wire/poison.json"),
      """{"topic":"graft.public.events","offset":999999999,"value":"NOT JSON"}""" + "\n")

    val q = Pipeline.start(spark, Pipeline.Config(
      wirePath = s"$base/wire",
      statePath = s"$base/state",
      checkpointPath = s"$base/ckpt",
      dlqPath = Some(s"$base/dlq")))
    q.processAllAvailable()
    q.stop()

    val dlq = spark.read.parquet(s"$base/dlq").collect()
    assert(dlq.map(_.getAs[Long]("offset")).toSet === Set(999999999L))
    // the apply still processed everything else
    val state = spark.read.parquet(s"$base/state")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Materialize.latestSnapshot(Cdc.changelog(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state.keySet === expected.keySet)
  }

  test("fanout pipeline materializes one state table per routed table") {
    val base = Files.createTempDirectory("fanout").toString
    WireSource.publish(spark, dir, s"$base/wire")
    val q = Pipeline.startFanout(spark, Pipeline.Config(
      wirePath = s"$base/wire", statePath = s"$base/state", checkpointPath = s"$base/ckpt"))
    q.processAllAvailable()
    q.stop()

    val expected = graft.cdc.Materialize.fanoutApply(
      graft.cdc.Cdc.parseEnvelope(graft.cdc.Cdc.toWire(spark, dir)))
    val tables = new java.io.File(s"$base/state").listFiles().filter(_.isDirectory).map(_.getName)
    // every live routed table materialized ('error' is all-deletes -> empty or absent)
    val expByTable = expected.collect().groupBy(_.getString(0))
    expByTable.foreach { case (t, rows) =>
      assert(tables.contains(t), s"missing state for table $t")
      val got = spark.read.parquet(s"$base/state/$t")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val exp = rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
      assert(got === exp, s"table $t")
    }
  }

  test("batch backfill produces the same state table") {
    val base = Files.createTempDirectory("pipelineb").toString
    WireSource.publish(spark, dir, s"$base/wire")
    val state = Pipeline.runBatch(spark, s"$base/wire", s"$base/state")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Materialize.latestSnapshot(Cdc.changelog(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state === expected)
  }
}
