package graft

import graft.analytics.Relational
import graft.cdc.{Cdc, Materialize, Monitoring, Quality}
import graft.governance.Masking
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GovernanceMonitoringSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("masking keeps keys joinable but hides values") {
    val masked = Masking.maskedCustomers(spark, dir).cache()
    assert(masked.count() === 150)
    // token is stable + not the original name
    val withOrig = masked.join(Tables.load(spark, dir, "customer"), "c_custkey")
    assert(withOrig.where(col("name_token") === col("c_name")).count() === 0)
    assert(masked.select("name_token").distinct().count() === 150)
    // banding coarsens: band is a multiple of 100 and within 100 of the value
    assert(withOrig.where(col("acctbal_band") > col("c_acctbal")).count() === 0)
    assert(withOrig.where(col("c_acctbal") - col("acctbal_band") >= 100).count() === 0)
  }

  test("health score ladder is consistent with its inputs") {
    val h = Monitoring.healthScore(Cdc.changelog(spark, dir)).collect()
    h.foreach { r =>
      val (n, e, s) = (r.getLong(1), r.getLong(2), r.getString(3))
      val expected = if (e > 10) "critical" else if (e > 5) "degraded" else if (n < 50) "idle" else "healthy"
      assert(s === expected)
    }
  }

  test("lag percentiles are ordered p50 <= p90 <= p99 <= max") {
    val p = Monitoring.lagPercentiles(Cdc.changelog(spark, dir)).collect()
    assert(p.length === 10)
    p.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getLong(3) <= r.getLong(4))
    }
  }

  test("sessionization covers all events with positive-length sessions") {
    val s = Relational.sessionize(spark, dir).cache()
    assert(s.agg(sum("n_events")).collect()(0).getLong(0) === 1000)
    assert(s.where(col("t_end") < col("t_start")).count() === 0)
    // session ids are dense per user starting at 1
    val bad = s.groupBy("user_id")
      .agg(min("session_id").as("mn"), max("session_id").as("mx"), count(lit(1)).as("n"))
      .where(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("snapshot handoff equals one-shot materialization at any cutover") {
    val cl = Cdc.changelog(spark, dir).cache()
    val oneShot = Materialize.latestSnapshot(cl)
      .select("user_id", "last_value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (cut <- Seq(0L, 250L, 999L)) {
      val h = Materialize.snapshotHandoff(cl, cut)
        .select("user_id", "last_value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(h === oneShot, s"cutover=$cut")
    }
  }

  test("schema evolution buckets old rows under the pre-evolution channel") {
    val e = Quality.schemaEvolve(spark, dir).collect()
    val byChan = e.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChan("(pre-evolution)") === 750)
    assert(byChan.keys.count(_.startsWith("chan_")) === 3)
    assert(byChan.values.sum === 1500)
  }
}
