package graft

import graft.cdc.{Cdc, Monitoring}
import graft.streaming.StreamSaltAdvisor
import graft.streaming.StreamSaltAdvisor.Config
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamSaltAdvisor — streamed ≡ batch parity for the salt-advisor
  * panel (the 21st streaming component): chunked replay of the changelog
  * must reproduce `Monitoring.saltAdvisor` bit-for-bit, the mid-stream
  * panel must equal the batch operator over the prefix, and an
  * at-least-once batch replay must not double-count.
  */
class StreamSaltAdvisorSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = TestSpark.dir

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("salt-adv").toString

  private def cfg() = Config(wirePath = "unused", statePath = tmp(), checkpointPath = "unused")

  private def assertRowsEqual(s: Row, b: Row): Unit = {
    assert(s.getAs[Long]("n_keys") == b.getAs[Long]("n_keys"))
    assert(s.getAs[Long]("n_events") == b.getAs[Long]("n_events"))
    assert(s.getAs[Double]("mean_events_per_key") == b.getAs[Double]("mean_events_per_key"))
    assert(s.getAs[Long]("p99_events_per_key") == b.getAs[Long]("p99_events_per_key"))
    assert(s.getAs[Long]("max_events_per_key") == b.getAs[Long]("max_events_per_key"))
    assert(s.getAs[Double]("skew_ratio") == b.getAs[Double]("skew_ratio"))
    assert(s.getAs[Long]("recommended_salt") == b.getAs[Long]("recommended_salt"))
    assert(s.getAs[Boolean]("needs_salting") == b.getAs[Boolean]("needs_salting"))
  }

  test("chunked replay reproduces the batch advisor bit-for-bit") {
    val c = cfg()
    val cl = Cdc.changelog(spark, dir).select(col("pk"), col("seq"))
    val n = cl.count()
    val cut1 = n / 3; val cut2 = 2 * n / 3
    // seq is a total order, so the split is deterministic
    StreamSaltAdvisor.monitorBatch(spark, c, cl.where(col("seq") % 3 === 0), 0L)
    StreamSaltAdvisor.monitorBatch(spark, c, cl.where(col("seq") % 3 === 1), 1L)
    StreamSaltAdvisor.monitorBatch(spark, c, cl.where(col("seq") % 3 === 2), 2L)
    assert(cut1 > 0 && cut2 > cut1)
    val streamed = StreamSaltAdvisor.panel(spark, c)
      .where(col("batch_id") === 2L).collect()
    val batch = Monitoring.saltAdvisor(spark, dir).collect()
    assert(streamed.length == 1 && batch.length == 1)
    assertRowsEqual(streamed.head, batch.head)
  }

  test("mid-stream panel is the batch advisor over the prefix") {
    val c = cfg()
    val cl = Cdc.changelog(spark, dir).select(col("pk"), col("seq"))
    StreamSaltAdvisor.monitorBatch(spark, c, cl.where(col("seq") % 2 === 0), 0L)
    val streamed = StreamSaltAdvisor.panel(spark, c)
      .where(col("batch_id") === 0L).collect()
    val prefix = Monitoring.saltAdvisorFromPerKey(
      cl.where(col("seq") % 2 === 0).groupBy("pk").agg(count(lit(1)).as("cnt"))).collect()
    assert(streamed.length == 1 && prefix.length == 1)
    assertRowsEqual(streamed.head, prefix.head)
  }

  test("end-to-end over the wire: final panel equals the batch advisor") {
    val base = java.nio.file.Files.createTempDirectory("salt-adv-e2e").toString
    val c = Config(wirePath = s"$base/wire", statePath = s"$base/state",
      checkpointPath = s"$base/ckpt")
    graft.sources.WireSource.publish(spark, dir, c.wirePath)
    val q = StreamSaltAdvisor.start(spark, c)
    q.processAllAvailable()
    q.stop()
    val rows = StreamSaltAdvisor.panel(spark, c).collect()
    val lastBatch = rows.map(_.getAs[Long]("batch_id")).max
    val streamed = rows.filter(_.getAs[Long]("batch_id") == lastBatch)
    val batch = Monitoring.saltAdvisor(spark, dir).collect()
    assert(streamed.length == 1 && batch.length == 1)
    assertRowsEqual(streamed.head, batch.head)
  }

  test("at-least-once replay of a batch does not double-count") {
    val c = cfg()
    val cl = Cdc.changelog(spark, dir).select(col("pk"), col("seq"))
    StreamSaltAdvisor.monitorBatch(spark, c, cl.where(col("seq") % 2 === 0), 0L)
    StreamSaltAdvisor.monitorBatch(spark, c, cl.where(col("seq") % 2 === 1), 1L)
    // redeliver batch 1 (same content, same id) — dynamic overwrite must
    // replace, not append
    StreamSaltAdvisor.monitorBatch(spark, c, cl.where(col("seq") % 2 === 1), 1L)
    val streamed = StreamSaltAdvisor.panel(spark, c)
      .where(col("batch_id") === 1L).collect()
    val batch = Monitoring.saltAdvisor(spark, dir).collect()
    assert(streamed.length == 1)
    assertRowsEqual(streamed.head, batch.head)
  }
}
