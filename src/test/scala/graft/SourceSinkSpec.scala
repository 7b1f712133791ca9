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

  test("upsert is replay-idempotent: re-applying a micro-batch changes nothing") {
    val tmp = Files.createTempDirectory("sinkreplay").toString + "/state"
    val changelog = Cdc.changelog(spark, dir).cache()
    val first = changelog.where(col("seq") < 500)
    val second = changelog.where(col("seq") >= 500 && col("seq") < 700)
    TableSink.writeSnapshot(Materialize.latestSnapshot(first), "user_id", tmp)
    TableSink.upsert(spark, tmp, second)
    val once = TableSink.readLive(spark, tmp).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("last_value"), r.getAs[Long]("n_changes")))).toMap
    // at-least-once redelivery of the SAME micro-batch
    val again = TableSink.upsert(spark, tmp, second).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("last_value"), r.getAs[Long]("n_changes")))).toMap
    assert(again === once, "values AND n_changes must survive a batch replay unchanged")
  }

  test("tombstones keep deleted keys' watermark and count across batch boundaries") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("sinktomb").toString + "/state"
    val schema = StructType(Seq(
      StructField("op", StringType), StructField("pk", LongType),
      StructField("ts", TimestampType), StructField("seq", LongType),
      StructField("value", DoubleType)))
    def batch(rows: (String, Long, Long, Long, Double)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (op, pk, ts, seq, v) =>
          Row(op, pk, new java.sql.Timestamp(ts * 1000L), seq, v) }, 2), schema)
    // batch 1 ends on a delete of key 1; batch 2 recreates it
    val b1 = batch(("c", 1L, 10L, 0L, 1.0), ("u", 1L, 11L, 1L, 2.0),
      ("d", 1L, 12L, 2L, 2.0), ("c", 2L, 10L, 3L, 5.0))
    val b2 = batch(("c", 1L, 20L, 4L, 7.0), ("u", 1L, 21L, 5L, 8.0))
    TableSink.writeSnapshot(Materialize.latestStateWeighted(
      b1.withColumn("weight", org.apache.spark.sql.functions.lit(1L))), "user_id", tmp)
    // mid-state: key 1 is dead in the live view but its tombstone row
    // retains watermark + count in the stored table
    assert(TableSink.readLive(spark, tmp).collect().map(_.getAs[Long]("user_id")).toSet === Set(2L))
    val stored = spark.read.parquet(tmp).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Boolean]("is_deleted")).toMap
    assert(stored === Map(1L -> true, 2L -> false))
    val after = TableSink.upsert(spark, tmp, b2).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("last_value"), r.getAs[Long]("n_changes")))).toMap
    // one-shot parity: the recreated key counts ALL 5 of its changes, not
    // just the post-recreate 2 — the boundary didn't reset its history
    val oneShot = Materialize.latestSnapshot(b1.unionByName(b2)).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("last_value"), r.getAs[Long]("n_changes")))).toMap
    assert(after === oneShot)
    assert(after(1L) === ((8.0, 5L)))
    // and a replay of a batch whose last op was the delete cannot revive
    // the key: its events sit at or below the tombstone's watermark
    val revived = TableSink.upsert(spark, tmp, b1)
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("n_changes")).toMap
    assert(revived === after.map { case (k, (_, n)) => k -> n })
  }

  test("upsert recovering from a crashed swap promotes .bak before touching it") {
    val base = Files.createTempDirectory("swapcrash").toString
    val tmp = s"$base/state"
    val changelog = Cdc.changelog(spark, dir).cache()
    TableSink.writeSnapshot(Materialize.latestSnapshot(changelog.where(col("seq") < 500)),
      "user_id", tmp)
    val before = spark.read.parquet(tmp).count()
    // simulate the crash window: live state moved aside, only .bak on disk
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(tmp + ".bak")))
    // the next upsert must read the backup AND leave a recoverable copy at
    // every instant (the old protocol deleted .bak first — the only copy)
    val after = TableSink.upsert(spark, tmp, changelog.where(col("seq") >= 500 && col("seq") < 600))
    assert(after.count() >= before)
    assert(fs.exists(new org.apache.hadoop.fs.Path(tmp)))
  }

  test("time-partitioned writes keep previously landed partitions") {
    val tmp = Files.createTempDirectory("tpart").toString + "/lake"
    val changelog = Cdc.changelog(spark, dir).cache()
    val d1 = changelog.where(col("seq") < 300)
    val d2 = changelog.where(col("seq") >= 300 && col("seq") < 600)
    TableSink.writeTimePartitioned(d1, "ts", tmp)
    val afterFirst = spark.read.parquet(tmp).count()
    TableSink.writeTimePartitioned(d2, "ts", tmp)
    val afterSecond = spark.read.parquet(tmp).count()
    // the second write may legitimately replace overlapping dt partitions,
    // but it must never erase dates it does not carry — on this changelog
    // the two slices share days, so the floor is the larger slice alone
    assert(afterSecond >= afterFirst || afterSecond >= d2.count(),
      s"incremental landings must not truncate the lake path ($afterFirst -> $afterSecond)")
  }

  test("discovery lists all tables and describes columns") {
    val tables = Discovery.listTables(spark, dir).collect()
    assert(tables.map(_.getString(0)).toSeq === Tables.all.sorted)
    val cols = Discovery.describeTable(spark, dir, "orders").collect()
    assert(cols.map(_.getString(0)).contains("o_orderkey"))
    assert(cols.length === 6)
  }
}
