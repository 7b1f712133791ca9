package graft

import graft.cdc.{Cdc, Materialize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Restart-from-checkpoint recovery (the reference's recovery.py concern):
  * stop mid-stream, deliver more wire files, restart with the same
  * checkpoint + state — only new files are processed and the final state
  * equals the one-shot materialization.
  */
class PipelineRecoverySpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("pipeline restart from checkpoint resumes incrementally") {
    val base = Files.createTempDirectory("recovery").toString
    val cfg = Pipeline.Config(s"$base/wire", s"$base/state", s"$base/ckpt")

    Cdc.toWire(spark, dir).where(col("offset") < 500)
      .write.mode("append").json(cfg.wirePath)
    val q1 = Pipeline.start(spark, cfg)
    q1.processAllAvailable()
    q1.stop()
    val midKeys = graft.sinks.TableSink.readLive(spark, cfg.statePath).count()
    assert(midKeys > 0)

    // second delivery + restart with the same checkpoint and state
    Cdc.toWire(spark, dir).where(col("offset") >= 500)
      .write.mode("append").json(cfg.wirePath)
    val q2 = Pipeline.start(spark, cfg)
    q2.processAllAvailable()
    q2.stop()

    val state = graft.sinks.TableSink.readLive(spark, cfg.statePath)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Materialize.latestSnapshot(Cdc.changelog(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state.keySet === expected.keySet)
    expected.foreach { case (k, v) => assert(state(k) === v, s"key $k") }
  }

  test("restart mid-swap (state only in .bak) recovers, never seeds empty") {
    val base = Files.createTempDirectory("midswap").toString
    val cfg = Pipeline.Config(s"$base/wire", s"$base/state", s"$base/ckpt")

    Cdc.toWire(spark, dir).where(col("offset") < 500)
      .write.mode("append").json(cfg.wirePath)
    val q1 = Pipeline.start(spark, cfg)
    q1.processAllAvailable()
    q1.stop()

    // simulate a crash between upsert's two renames: live state moved to
    // .bak, replacement never arrived
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(cfg.statePath),
      new org.apache.hadoop.fs.Path(cfg.statePath + ".bak")))

    Cdc.toWire(spark, dir).where(col("offset") >= 500)
      .write.mode("append").json(cfg.wirePath)
    val q2 = Pipeline.start(spark, cfg)
    q2.processAllAvailable()
    q2.stop()

    val state = graft.sinks.TableSink.readLive(spark, cfg.statePath)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Materialize.latestSnapshot(Cdc.changelog(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(state.keySet === expected.keySet)
    expected.foreach { case (k, v) => assert(state(k) === v, s"key $k") }
  }
}
