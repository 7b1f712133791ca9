package graft

import graft.streaming.{CdcStream, ChangeEvent, WindowedMetrics}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("stream_cdc_apply: stateful upsert materializes latest state, deletes clear") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val query = CdcStream.applyChanges(input.toDS())
      .writeStream.format("memory").queryName("state_out").outputMode("update").start()

    input.addData(
      ChangeEvent("c", 1L, ts(1), 1L, 10.0),
      ChangeEvent("c", 2L, ts(1), 2L, 20.0))
    query.processAllAvailable()
    input.addData(
      ChangeEvent("u", 1L, ts(2), 3L, 11.0),
      ChangeEvent("d", 2L, ts(2), 4L, 0.0),
      ChangeEvent("u", 1L, ts(1), 0L, 99.0)) // stale replay: must be ignored
    query.processAllAvailable()

    val last = spark.table("state_out")
      .groupBy("pk").agg(max_by(struct(col("value"), col("nChanges"), col("deleted")), col("seq")).as("s"))
      .select(col("pk"), col("s.value"), col("s.nChanges"), col("s.deleted"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getBoolean(3)))).toMap
    query.stop()

    assert(last(1L) === ((11.0, 2L, false)))   // upsert applied, stale replay ignored
    // pk=2: deleted in batch 2 -> explicit tombstone retraction emitted
    assert(last(2L)._3 === true)
  }

  test("stream windowed counts aggregate per minute with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val events = input.toDS().toDF()
    val query = WindowedMetrics.eventsPerWindow(events)
      .writeStream.format("memory").queryName("win_out").outputMode("update").start()

    input.addData(
      ChangeEvent("c", 1L, ts(1), 1L, 1.0),
      ChangeEvent("u", 1L, ts(1), 2L, 1.0),
      ChangeEvent("d", 2L, ts(2), 3L, 1.0))
    query.processAllAvailable()
    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    query.stop()

    assert(rows.contains((ts(1), "c", 1L)))
    assert(rows.contains((ts(1), "u", 1L)))
    assert(rows.contains((ts(2), "d", 1L)))
  }

  test("stream alert fires only above threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val query = WindowedMetrics.alertStream(input.toDS().toDF(), threshold = 2)
      .writeStream.format("memory").queryName("alert_out").outputMode("update").start()

    input.addData((1 to 5).map(i => ChangeEvent("d", i.toLong, ts(1), i.toLong, 0.0)): _*)
    input.addData(ChangeEvent("d", 9L, ts(7), 99L, 0.0)) // below threshold in its window
    query.processAllAvailable()
    val rows = spark.table("alert_out").collect()
    query.stop()

    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_errors") === 5L)
    assert(rows.head.getAs[String]("severity") === "critical")
  }

  test("stream scd2 emits closed versions matching the batch history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val query = graft.streaming.CdcStream.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName("scd2_out").outputMode("append").start()

    input.addData(ChangeEvent("c", 1L, ts(1), 1L, 10.0))
    query.processAllAvailable()
    input.addData(ChangeEvent("u", 1L, ts(2), 2L, 11.0))
    query.processAllAvailable()
    input.addData(ChangeEvent("d", 1L, ts(3), 3L, 0.0))
    query.processAllAvailable()

    val versions = spark.table("scd2_out").collect()
      .map(r => (r.getDouble(1), r.getTimestamp(2), r.getTimestamp(3)))
      .sortBy(_._2.getTime)
    query.stop()

    // two closed versions: v=10 closed by the update, v=11 closed by delete
    assert(versions.length === 2)
    assert(versions(0)._1 === 10.0 && versions(0)._3 === ts(2))
    assert(versions(1)._1 === 11.0 && versions(1)._3 === ts(3))
  }

  test("stream scd2 retains tombstones: stale event after a delete cannot re-open a version") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val query = graft.streaming.CdcStream.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName("scd2_ooo_out").outputMode("append").start()

    input.addData(ChangeEvent("c", 1L, ts(1), 1L, 10.0))
    query.processAllAvailable()
    input.addData(ChangeEvent("d", 1L, ts(3), 3L, 0.0))
    query.processAllAvailable()
    // out-of-order event OLDER than the applied delete: with state.remove()
    // this re-opened a version (resurrection); the tombstone must reject it
    input.addData(ChangeEvent("u", 1L, ts(2), 2L, 99.0))
    query.processAllAvailable()
    // a genuinely newer change after the delete starts a fresh version
    input.addData(ChangeEvent("c", 1L, ts(4), 4L, 42.0))
    input.addData(ChangeEvent("u", 1L, ts(5), 5L, 43.0))
    query.processAllAvailable()

    val versions = spark.table("scd2_ooo_out").collect()
      .map(r => (r.getDouble(1), r.getTimestamp(2), r.getTimestamp(3)))
      .sortBy(_._2.getTime)
    query.stop()

    // v=10 closed by the delete; v=42 closed by the later update. The
    // stale u@ts(2) must appear nowhere (no 99.0 version).
    assert(versions.toSeq === Seq(
      (10.0, ts(1), ts(3)),
      (42.0, ts(4), ts(5))))
  }

  test("stream session_window splits on the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    // session windows emit on APPEND only: a session is final once the
    // watermark passes its end
    val query = WindowedMetrics.sessionStream(input.toDS().toDF())
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()

    input.addData(
      ChangeEvent("c", 1L, ts(1), 1L, 1.0),
      ChangeEvent("u", 1L, ts(5), 2L, 1.0),   // same session (gap 4 min)
      ChangeEvent("u", 1L, ts(50), 3L, 1.0),  // new session (gap 45 min)
      ChangeEvent("c", 2L, ts(2), 4L, 1.0))
    query.processAllAvailable()
    // push the watermark (2h) past every session end so they all close
    input.addData(ChangeEvent("c", 99L,
      java.sql.Timestamp.valueOf("2024-01-01 06:00:00"), 5L, 1.0))
    query.processAllAvailable()
    val sessions = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
    query.stop()

    // pk=1: [ts1..ts5+gap] with 2 events, [ts50..] with 1; pk=2: 1 session
    assert(sessions.count(_._1 == 1L) === 2)
    assert(sessions.filter(_._1 == 1L).map(_._3).sorted.toSeq === Seq(1L, 2L))
    assert(sessions.count(_._1 == 2L) === 1)
  }

  test("stream-stream interval join enriches changes with preceding-hour alerts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val changes = MemoryStream[ChangeEvent]
    val alerts = MemoryStream[(java.sql.Timestamp, Long)]
    val alertsDf = alerts.toDS().toDF("rule_ts", "rule_pk_cohort")
    val query = WindowedMetrics.enrichWithAlerts(changes.toDS().toDF(), alertsDf)
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()

    alerts.addData((ts(10), 1L))                       // alert for cohort 1 at :10
    changes.addData(
      ChangeEvent("u", 1L, ts(30), 1L, 1.0),           // cohort 1, alert 20min earlier -> match
      ChangeEvent("u", 11L, ts(30), 2L, 1.0),          // cohort 1 (11%10) -> match
      ChangeEvent("u", 2L, ts(30), 3L, 1.0),           // cohort 2 -> no alert
      ChangeEvent("u", 1L, ts(5), 4L, 1.0))            // before the alert -> no match
    query.processAllAvailable()
    val rows = spark.table("enrich_out").collect().map(r => (r.getLong(0), r.getLong(1)))
    query.stop()

    assert(rows.toSet === Set((1L, 1L), (11L, 2L)))
  }

  test("stream dedup drops redelivered seqs within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val query = CdcStream.dedupStream(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()

    input.addData(
      ChangeEvent("c", 1L, ts(1), 1L, 1.0),
      ChangeEvent("c", 1L, ts(1), 1L, 1.0), // exact redelivery
      ChangeEvent("u", 1L, ts(2), 2L, 2.0))
    query.processAllAvailable()
    val n = spark.table("dedup_out").count()
    query.stop()
    assert(n === 2)
  }

  test("stream running agg maintains exact per-key sums across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val query = CdcStream.runningAggStream(input.toDS())
      .writeStream.format("memory").queryName("ragg_out").outputMode("update").start()

    input.addData(ChangeEvent("c", 1L, ts(1), 1L, 10.5), ChangeEvent("u", 1L, ts(2), 2L, 0.25))
    query.processAllAvailable()
    input.addData(ChangeEvent("u", 1L, ts(3), 3L, 1.25), ChangeEvent("c", 2L, ts(3), 4L, 7.0))
    query.processAllAvailable()

    // update mode re-emits a key's row each batch; latest n_events wins
    val last = spark.table("ragg_out")
      .groupBy("pk").agg(max_by(struct(col("n_events"), col("running_sum")), col("n_events")).as("s"))
      .select(col("pk"), col("s.n_events"), col("s.running_sum").cast("double"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    query.stop()

    assert(last(1L) === ((3L, 12.0)))  // 10.5 + 0.25 + 1.25 exact in decimal
    assert(last(2L) === ((1L, 7.0)))
  }

  test("stream content dedup drops same-text documents within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val query = CdcStream.contentDedupStream(
      input.toDS().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("cdedup_out").outputMode("append").start()

    input.addData(
      (ts(1), 1L, "hello world"),
      (ts(2), 2L, "hello world"),   // same content, different doc -> dropped
      (ts(3), 3L, "something else"))
    query.processAllAvailable()
    val kept = spark.table("cdedup_out").collect().map(_.getAs[Long]("doc_id")).toSet
    query.stop()
    assert(kept === Set(1L, 3L))
  }

  test("stream route sends unparseable envelopes to the DLQ, keeps consuming") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = """{"before":null,"after":{"user_id":1,"event_type":"click","value":2.0},""" +
      """"source":{"db":"g","schema":"p","table":"events","ts_ms":1},"op":"u","ts_ms":1}"""
    val input = MemoryStream[(String, Long, String)]
    val query = CdcStream.routeStream(
      input.toDS().toDF("topic", "offset", "value"))
      .select("offset", "route")
      .writeStream.format("memory").queryName("route_out").outputMode("append").start()

    input.addData(
      ("t", 1L, good),
      ("t", 2L, good.dropRight(5)),  // truncated JSON -> unparseable
      ("t", 3L, "not json at all"),
      ("t", 4L, good))
    query.processAllAvailable()
    val routes = spark.table("route_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    query.stop()

    assert(routes === Map(1L -> "main", 2L -> "dlq", 3L -> "dlq", 4L -> "main"))
  }
}
