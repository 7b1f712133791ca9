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

  test("streamed apply matches batch materialization on random changelogs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val evs = (0 until 200).map { i =>
        ChangeEvent(
          op = Seq("c", "u", "d")(rnd.nextInt(3)),
          pk = rnd.nextInt(15).toLong,
          ts = new java.sql.Timestamp(1700000000000L + rnd.nextInt(1000) * 1000L),
          seq = i.toLong,
          value = rnd.nextInt(10000) / 100.0)
      }
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ChangeEvent]
      val q = CdcStream.applyChanges(input.toDS())
        .writeStream.format("memory").queryName(s"rand_state_$trial").outputMode("update").start()
      evs.grouped(50).foreach { batch => input.addData(batch); q.processAllAvailable() }
      q.stop()

      // final streamed state per key = last emission (tombstones delete)
      val streamed = spark.table(s"rand_state_$trial")
        .groupBy("pk").agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.col("value"),
            org.apache.spark.sql.functions.col("deleted")),
          org.apache.spark.sql.functions.col("seq")).as("s"))
        .collect().flatMap { r =>
          val st = r.getStruct(1)
          if (st.getBoolean(1)) None else Some(r.getLong(0) -> st.getDouble(0))
        }.toMap
      // naive batch reference
      val expected = evs.groupBy(_.pk).flatMap { case (pk, es) =>
        val last = es.maxBy(e => (e.ts.getTime, e.seq))
        if (last.op == "d") None else Some(pk -> last.value)
      }
      assert(streamed === expected, s"trial $trial")
    }
  }

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

    // last emission per key (tombstones delete) = final streamed state
    val streamed = spark.table("parity_state")
      .groupBy("pk")
      .agg(max_by(struct(col("value"), col("deleted")), col("seq")).as("s"))
      .collect().flatMap { r =>
        val st = r.getStruct(1)
        if (st.getBoolean(1)) None
        else Some(r.getLong(0) -> BigDecimal(st.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      }.toMap

    val batch = Materialize.latestSnapshot(Cdc.changelog(spark, dir))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toMap

    // two-sided: the streamed live-key set must EQUAL the batch key set —
    // a resurrected (tombstone-lost) key would only show up as an extra
    // streamed key, which a one-sided containment check would miss
    assert(streamed.keySet === batch.keySet)
    batch.foreach { case (k, v) => assert(streamed.get(k).contains(v), s"key $k") }
  }

  test("streamed running aggregates equal one batch aggregation of the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val evs = (0 until 300).map { i =>
      ChangeEvent("u", rnd.nextInt(12).toLong,
        new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong,
        rnd.nextInt(10000) / 100.0)
    }
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ChangeEvent]
    val q = CdcStream.runningAggStream(input.toDS())
      .writeStream.format("memory").queryName("ragg_parity").outputMode("update").start()
    evs.grouped(40).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("ragg_parity")
      .groupBy("pk")
      .agg(max_by(struct(col("n_events"), col("running_sum")), col("n_events")).as("s"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getStruct(1).getLong(0), r.getStruct(1).getDecimal(1).toPlainString))).toMap

    val batch = evs.toDF()
      .groupBy("pk")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDecimal(2).toPlainString))).toMap

    assert(streamed === batch)
  }
}
