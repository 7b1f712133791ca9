package graft

import graft.cdc.{Cdc, Materialize, Monitoring, Quality}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("changelog derives one row per event with valid ops") {
    val cl = Cdc.changelog(spark, dir).cache()
    assert(cl.count() === 1000)
    val ops = cl.select("op").distinct().collect().map(_.getString(0)).toSet
    assert(ops.subsetOf(Set("c", "u", "d")))
  }

  test("envelope wire roundtrip preserves rows, ops and payloads") {
    val parsed = Cdc.parseEnvelope(Cdc.toWire(spark, dir)).cache()
    assert(parsed.count() === 1000)
    // after populated iff not delete; before populated iff delete
    assert(parsed.where(col("op") =!= "d" && col("after").isNull).count() === 0)
    assert(parsed.where(col("op") === "d" && col("before").isNull).count() === 0)
    val unwrapped = Cdc.unwrap(parsed)
    assert(unwrapped.count() === 1000)
    assert(unwrapped.where(col("__deleted") && col("__op") =!= "d").count() === 0)
    assert(unwrapped.where(col("user_id").isNull).count() === 0)
  }

  test("latest snapshot keeps exactly the live keys with their last value") {
    val cl = Cdc.changelog(spark, dir).cache()
    val snap = Materialize.latestSnapshot(cl).cache()
    // reference computation via window on the driver
    val rows = cl.collect().map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
    val expected = rows.groupBy(_._2).flatMap { case (pk, evs) =>
      val last = evs.maxBy(e => (e._3.getTime, e._4))
      if (last._1 == "d") None else Some(pk -> BigDecimal(last._5).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }
    val actual = snap.collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toMap
    assert(actual === expected)
  }

  test("salted snapshot equals the plain materializer exactly") {
    val cl = Cdc.changelog(spark, dir).cache()
    val plain = Materialize.latestSnapshot(cl).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2), r.getLong(3))).toSet
    for (salt <- Seq(2, 16, 64)) {
      val salted = Materialize.latestSnapshotSalted(cl, salt).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2), r.getLong(3))).toSet
      assert(salted === plain, s"salt=$salt")
    }
  }

  test("scd2 has exactly one open version per live key and ordered validity") {
    val cl = Cdc.changelog(spark, dir)
    val hist = Materialize.scd2(cl).cache()
    val open = hist.where(col("is_current")).groupBy("user_id").count()
    assert(open.where(col("count") > 1).count() === 0)
    assert(hist.where(col("valid_to").isNotNull && col("valid_to") < col("valid_from")).count() === 0)
  }

  test("dedup replay collapses redeliveries to unique events") {
    val out = Materialize.dedupReplay(Cdc.changelog(spark, dir)).collect()
    val total = out.map(_.getLong(1)).sum
    val deliveries = out.map(_.getLong(2)).sum
    assert(total === 1000)
    assert(deliveries === 1100) // 10% redelivered
  }

  test("monitoring aggregates are consistent with the changelog") {
    val cl = Cdc.changelog(spark, dir).cache()
    val counts = Monitoring.eventCounts(cl).collect()
    assert(counts.map(_.getLong(1)).sum === 1000)
    val tp = Monitoring.throughput(cl)
    assert(tp.agg(sum("n_events")).collect()(0).getLong(0) === 1000)
    val lag = Monitoring.lagTrend(cl)
    assert(lag.where(col("max_lag_ms") < 0).count() === 0)
  }

  test("rowcount validation reports all tables matching") {
    val v = Quality.rowcountValidate(spark, dir).collect()
    assert(v.length === 4)
    assert(v.forall(_.getBoolean(4))) // "match" column
  }

  test("schema drift flags the simulated drift") {
    val drift = Quality.schemaDrift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(drift("o_totalprice") === "type_changed")
    assert(drift("o_orderpriority") === "removed_in_target")
    assert(drift("o_sync_ts") === "added_in_target")
    assert(drift("o_orderkey") === "ok")
  }
}
