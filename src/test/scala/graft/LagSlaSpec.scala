package graft

import graft.streaming.LagSla
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming lag-SLA ladder: per micro-batch the 4-tier compliance ladder
  * must track the CUMULATIVE stream against its own moving high-water
  * mark, flag tiers under their compliance floor, replay idempotently,
  * and agree bit-for-bit with the batch `cdc_lag_sla` operator on a
  * minute-aligned stream (the quantization contract's exact case). */
class LagSlaSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  private val H = 3600000L
  private val D = 86400000L

  private def cfg(base: String) = LagSla.Config(
    s"$base/wire", s"$base/state", s"$base/ckpt")

  // minute-aligned events so bucket-start crediting is exact
  private def events(ms: Seq[Long]): DataFrame = {
    import spark.implicits._
    ms.toDF("ms").select(timestamp_millis(col("ms")).as("ts"))
  }

  test("on-SLA stream: all tiers compliant, bit-parity with the batch operator") {
    val base = Files.createTempDirectory("lagsla").toString
    val c = cfg(base)
    // 5 events inside one hour, minute-aligned
    val ms = Seq(0L, 600000L, 1200000L, 1800000L, 3600000L).map(_ + 86400000L)
    LagSla.monitorBatch(spark, c, events(ms), 0L)
    val got = LagSla.sla(spark, c).collect()
    assert(got.length === 4)
    assert(got.forall(_.getAs[Double]("compliance") === 1.0))
    assert(got.forall(!_.getAs[Boolean]("breach")))
    // parity with the batch twin on the same (minute-aligned) events
    val batch = graft.cdc.Monitoring.lagSla(events(ms)).collect()
      .map(r => (r.getAs[String]("slo"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_within"), r.getAs[Double]("compliance"))).toSet
    val stream = got
      .map(r => (r.getAs[String]("slo"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_within"), r.getAs[Double]("compliance"))).toSet
    assert(stream === batch)
  }

  test("a fresh batch moves the high-water mark and breaches stale tiers cumulatively") {
    val base = Files.createTempDirectory("lagsla2").toString
    val c = cfg(base)
    // batch 0: 4 events in one hour — on SLA at every tier
    val old = Seq(0L, 60000L, 120000L, 180000L).map(_ + D)
    LagSla.monitorBatch(spark, c, events(old), 0L)
    val after0 = LagSla.sla(spark, c).collect()
    assert(after0.forall(!_.getAs[Boolean]("breach")))
    // batch 1: one event 35 DAYS later — hwm jumps, the old events now lag
    // beyond every tier including 4_month
    LagSla.monitorBatch(spark, c, events(Seq(D + 35 * D)), 1L)
    val after1 = LagSla.sla(spark, c).collect()
      .filter(_.getAs[Long]("batch_id") == 1L)
      .map(r => r.getAs[String]("slo") -> r).toMap
    assert(after1.keySet === Set("1_hour", "2_day", "3_week", "4_month"))
    // cumulative: 5 events, only the newest within any tier
    after1.values.foreach { r =>
      assert(r.getAs[Long]("n_events") === 5L)
      assert(r.getAs[Long]("n_within") === 1L)
      assert(math.abs(r.getAs[Double]("compliance") - 0.2) < 1e-12)
    }
    // every tier's floor (0.95/0.99/1.0/1.0) is above 0.2 → all breach
    assert(after1.values.forall(_.getAs[Boolean]("breach")))
    // and batch 0's rows are untouched history (no breach)
    val b0 = LagSla.sla(spark, c).collect().filter(_.getAs[Long]("batch_id") == 0L)
    assert(b0.forall(!_.getAs[Boolean]("breach")))
  }

  test("error-budget view: exact integer budgets, exhausted on breach, parity with the batch twin") {
    val base = Files.createTempDirectory("lagslaeb").toString
    val c = cfg(base)
    // batch 0 on SLA, batch 1 blows every tier (the breach scenario)
    LagSla.monitorBatch(spark, c, events(Seq(D, D + 60000L, D + 120000L, D + 180000L)), 0L)
    LagSla.monitorBatch(spark, c, events(Seq(D + 35 * D)), 1L)
    val rows = LagSla.errorBudget(spark, c).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("slo")) -> r).toMap
    // objective rounding: 0.95 must become 9500 bps, never 9499
    assert(rows((0L, "1_hour")).getAs[Long]("objective_bps") === 9500L)
    assert(rows((0L, "4_month")).getAs[Long]("objective_bps") === 10000L)
    // batch 0: 4 events, zero violations, within budget everywhere
    assert(rows((0L, "1_hour")).getAs[Long]("violations") === 0L)
    assert(rows((0L, "1_hour")).getAs[String]("status") === "within_budget")
    // batch 1 cumulative: 5 events, 4 violations; 5·500/10000 = 0 allowed
    val b1h = rows((1L, "1_hour"))
    assert(b1h.getAs[Long]("violations") === 4L)
    assert(b1h.getAs[Long]("allowed") === 0L)
    assert(b1h.getAs[String]("status") === "exhausted")
    assert(b1h.isNullAt(b1h.fieldIndex("burn_ratio")), "burn of a zero budget must be null")
    // parity with the batch operator's budget arithmetic on the same events
    val batchRows = graft.cdc.Monitoring.errorBudget(
      events(Seq(D, D + 60000L, D + 120000L, D + 180000L, D + 35 * D))).collect()
      .map(r => r.getAs[String]("slo") ->
        ((r.getAs[Long]("violations"), r.getAs[Long]("allowed"), r.getAs[String]("status")))).toMap
    Seq("1_hour", "2_day", "3_week", "4_month").foreach { slo =>
      val s = rows((1L, slo))
      assert(batchRows(slo) ===
        ((s.getAs[Long]("violations"), s.getAs[Long]("allowed"), s.getAs[String]("status"))),
        s"tier $slo diverges from the batch twin")
    }
  }

  test("replaying a micro-batch neither double-counts events nor duplicates ladder rows") {
    val base = Files.createTempDirectory("lagsla3").toString
    val c = cfg(base)
    LagSla.monitorBatch(spark, c, events(Seq(D, D + H)), 0L)
    val b1 = events(Seq(D + 2 * H, D + 3 * H))
    LagSla.monitorBatch(spark, c, b1, 1L)
    val before = LagSla.sla(spark, c).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("slo"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_within"),
        r.getAs[Double]("compliance"))).toSet
    // at-least-once delivery: batch 1 fires again
    LagSla.monitorBatch(spark, c, b1, 1L)
    val after = LagSla.sla(spark, c).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("slo"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_within"),
        r.getAs[Double]("compliance"))).toSet
    assert(after === before)
    assert(after.filter(_._1 == 1L).forall(_._3 == 4L), "replay double-counted events")
  }

  test("end-to-end over the wire: 4 ladder rows per micro-batch, full event coverage") {
    val base = Files.createTempDirectory("lagsla4").toString
    val c = cfg(base)
    graft.sources.WireSource.publish(spark, dir, c.wirePath)
    val q = LagSla.start(spark, c)
    q.processAllAvailable()
    q.stop()
    val rows = LagSla.sla(spark, c).collect()
    val lastBatch = rows.map(_.getAs[Long]("batch_id")).max
    val last = rows.filter(_.getAs[Long]("batch_id") == lastBatch)
    assert(last.map(_.getAs[String]("slo")).toSet ===
      Set("1_hour", "2_day", "3_week", "4_month"))
    // the final ladder saw every wire event exactly once
    val total = graft.cdc.Cdc.changelog(spark, dir).count()
    assert(last.forall(_.getAs[Long]("n_events") === total))
    // bucket-start crediting is conservative: n_within never exceeds the
    // batch twin's exact count at any tier
    val exact = graft.cdc.Monitoring.lagSla(graft.cdc.Cdc.changelog(spark, dir))
      .collect().map(r => r.getAs[String]("slo") -> r.getAs[Long]("n_within")).toMap
    last.foreach { r =>
      assert(r.getAs[Long]("n_within") <= exact(r.getAs[String]("slo")),
        s"optimistic credit at tier ${r.getAs[String]("slo")}")
    }
  }
}
