package graft

import graft.analytics.Relational
import graft.cdc.Monitoring
import graft.dedup.Dedup
import graft.similarity.Ann
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-2 operator additions. */
class Round2OpsSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("containment flags the truncated near-copies that Jaccard under-scores") {
    val byPair = Dedup.containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("containment")).toMap
    assert(byPair.nonEmpty)
    assert(byPair.values.forall(c => c >= 0.9 && c <= 1.0))
    // every exact copy (doc_id+1M) is containment 1.0 of its source
    val exactPairs = byPair.keys.filter { case (a, b) => b == a + 1000000L }
    assert(exactPairs.nonEmpty)
    exactPairs.foreach(p => assert(byPair(p) === 1.0))
    // truncated copies (doc_id+2M, last 10 chars cut) score ≥0.9 containment
    assert(byPair.keys.exists { case (a, b) => b == a + 2000000L })
  }

  test("heartbeat gaps: known silence shows up in the right cohort") {
    import spark.implicits._
    val t0 = 1700000000000L
    // cohort 1 (pk=1): events at 0s, 10s, 200s => one gap > 60s
    // cohort 2 (pk=2): events at 0s, 5s, 10s => none
    val cl = Seq(
      ("c", 1L, t0, 1L, 1.0), ("u", 1L, t0 + 10000, 2L, 1.0), ("u", 1L, t0 + 200000, 3L, 1.0),
      ("c", 2L, t0, 4L, 1.0), ("u", 2L, t0 + 5000, 5L, 1.0), ("u", 2L, t0 + 10000, 6L, 1.0))
      .toDF("op", "pk", "ms", "seq", "value")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val got = Monitoring.heartbeatGaps(cl).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 190000L, 1L)))
    assert(got(2L) === ((2L, 5000L, 0L)))
  }

  test("partition skew: hot key dominates its bucket, ratios average to 1") {
    import spark.implicits._
    val rows = (1 to 310).map { i =>
      val pk = if (i <= 280) 7L else i.toLong  // bucket 7 is hot
      ("u", pk, 1700000000000L + i * 1000L, i.toLong, 1.0)
    }
    val cl = rows.toDF("op", "pk", "ms", "seq", "value")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val got = Monitoring.partitionSkew(cl).collect()
    assert(got.map(_.getAs[Long]("n_events")).sum === 310L)
    val hot = got.maxBy(_.getAs[Double]("skew_ratio"))
    assert(hot.getAs[Long]("bucket") === 7L)
    assert(hot.getAs[Double]("skew_ratio") > 10.0)
    // mean of skew_ratio weighted 1/nBuckets is 1 by construction
    val mean = got.map(_.getAs[Double]("skew_ratio")).sum / 32.0
    assert(math.abs(mean - 1.0) < 1e-9)
  }

  test("grouping sets: detail, subtotal and grand total agree") {
    val gs = Relational.groupingSets(spark, dir).collect()
    val detail = gs.filter(_.getAs[Long]("gid") == 0L)
    val regional = gs.filter(_.getAs[Long]("gid") == 1L)
    val grand = gs.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length === 1)
    val total = grand.head.getAs[Long]("n_customers")
    assert(detail.map(_.getAs[Long]("n_customers")).sum === total)
    assert(regional.map(_.getAs[Long]("n_customers")).sum === total)
    // subtotal rows have NULL segment but real region
    assert(regional.forall(r => r.isNullAt(r.fieldIndex("c_mktsegment")) &&
      !r.isNullAt(r.fieldIndex("r_name"))))
  }

  test("moving average matches a hand-rolled frame on collected days") {
    val ma = Relational.movingAvg(spark, dir).collect()
    assert(ma.nonEmpty)
    val totals = ma.map(_.getAs[Double]("day_total"))
    ma.zipWithIndex.foreach { case (r, i) =>
      val frame = totals.slice(math.max(0, i - 6), i + 1)
      val want = frame.sum / frame.length
      assert(math.abs(r.getAs[Double]("ma7") - want) < 1e-6, s"row $i")
    }
  }

  test("range search returns exactly the above-threshold cosines") {
    val got = Ann.rangeSearch(spark, dir, threshold = 0.25).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Double]("cosine") >= 0.25))
    assert(got.forall(_.getAs[Long]("vec_id") !== 0L))
    // brute-force cross-check: count all vectors meeting the threshold
    val brute = Ann.bruteForceTopK(spark, dir, k = Int.MaxValue).collect()
      .count(r => r.getAs[Double]("cosine") >= 0.25 && r.getAs[Long]("vec_id") != 0L)
    assert(got.length === brute)
  }

  test("term doc-frequency: df bounded by doc count, common stopwords on top") {
    val got = TextFunctions.termDocFreq(spark, dir).collect()
    assert(got.length === 20)
    val nDocs = got.head.getAs[Long]("n_docs")
    assert(got.forall(r => r.getAs[Long]("df") <= nDocs))
    assert(got.forall(r => r.getAs[Double]("df_ratio") <= 1.0))
    // descending df order
    val dfs = got.map(_.getAs[Long]("df"))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
  }

  test("outbox routing partitions the wire stream completely") {
    val wire = graft.cdc.Cdc.toWire(spark, dir)
    val got = Monitoring.outboxRoute(wire).collect()
    assert(got.forall(_.getAs[String]("destination").startsWith("outbox.")))
    assert(got.map(_.getAs[Long]("n_messages")).sum === wire.count())
  }
}
