package graft

import graft.analytics.{Relational, Sketches}
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contracts for the sketch-based scale path: the approximate
  * operators must land within their error bounds of the exact twins. */
class SketchesSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("approx percentiles track the exact ones within 2% relative error") {
    val exact = Relational.percentileCont(spark, dir).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        ((r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p90")))).toMap
    val approx = Sketches.approxOrderPercentiles(spark, dir).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        ((r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p90")))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (a25, a50, a90)) =>
      val (e25, e50, e90) = exact(k)
      Seq((a25, e25), (a50, e50), (a90, e90)).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.02, s"group $k: approx $a vs exact $e")
      }
    }
  }

  test("HLL distinct-token estimates land within 3x the configured rsd") {
    val exact = Sketches.exactCorpusDistinct(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("exact_distinct_tokens")).toMap
    val approx = Sketches.approxCorpusDistinct(spark, dir, rsd = 0.02).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("approx_distinct_tokens")).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (src, a) =>
      val e = exact(src)
      assert(math.abs(a.toDouble - e) / e < 0.06, s"source $src: approx $a vs exact $e")
    }
  }
}
