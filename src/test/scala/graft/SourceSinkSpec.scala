package graft

import graft.cdc.{Cdc, Discovery, Materialize}
import graft.sinks.TableSink
import graft.sources.WireSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourceSinkSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("wire source roundtrip: publish → batch read → unwrap matches direct path") {
    val tmp = Files.createTempDirectory("wire").toString
    WireSource.publish(spark, dir, tmp)
    val viaFiles = Cdc.unwrap(WireSource.readBatch(spark, tmp))
    assert(viaFiles.count() === 1000)
    val direct = Cdc.unwrap(Cdc.parseEnvelope(Cdc.toWire(spark, dir)))
    assert(viaFiles.agg(sum("user_id")).collect()(0).getLong(0) ===
      direct.agg(sum("user_id")).collect()(0).getLong(0))
  }

  test("wire source streams: file-source stream applies through CdcStream") {
    val tmp = Files.createTempDirectory("wirestream").toString
    WireSource.publish(spark, dir, tmp)
    val unwrapped = Cdc.unwrap(WireSource.readStream(spark, tmp))
    val q = unwrapped.writeStream.format("memory").queryName("wire_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("wire_out").count() === 1000)
  }

  test("table sink upsert replays to the same state as one-shot materialization") {
    val tmp = Files.createTempDirectory("sink").toString + "/state"
    val changelog = Cdc.changelog(spark, dir).cache()
    // split the changelog in half by seq, apply as full-load + increment
    val half = 500
    val first = changelog.where(col("seq") < half)
    val second = changelog.where(col("seq") >= half)
    TableSink.writeSnapshot(Materialize.latestSnapshot(first), "user_id", tmp)
    val after = TableSink.upsert(spark, tmp, second)

    val oneShot = Materialize.latestSnapshot(changelog)
    val a = after.select("user_id", "last_value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = oneShot.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }

  test("discovery lists all tables and describes columns") {
    val tables = Discovery.listTables(spark, dir).collect()
    assert(tables.map(_.getString(0)).toSeq === Tables.all.sorted)
    val cols = Discovery.describeTable(spark, dir, "orders").collect()
    assert(cols.map(_.getString(0)).contains("o_orderkey"))
    assert(cols.length === 6)
  }
}
