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

  test("count-min heavy hitters: estimate >= exact, overcount under N*depth/width") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.approxHeavyHitters(spark, dir).collect()
    assert(rows.length === 20)
    val nTotal = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .where(length(col("t")) >= 3).count()
    val bound = nTotal.toDouble * 4 / 1024
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cms_cnt")
      assert(est >= exact, s"${r.getAs[String]("token")}: CMS must never undercount")
      assert(est - exact <= bound,
        s"${r.getAs[String]("token")}: overcount ${est - exact} exceeds bound $bound")
    }
  }

  test("Bloom membership: zero false negatives, FP rate within 3x theory") {
    val k = 3; val m = 4096
    val rows = Sketches.approxMembership(spark, dir, k, m).collect()
      .map(r => r.getAs[Long]("expected") ->
        ((r.getAs[Long]("n_probes"), r.getAs[Long]("n_found")))).toMap
    assert(rows.keySet === Set(0L, 1L))
    val (nMembers, foundMembers) = rows(1L)
    assert(foundMembers === nMembers, "a Bloom filter can never miss a member")
    val (nAbsent, foundAbsent) = rows(0L)
    // distinct member keys set the bits; duplicate texts collapse
    val n = graft.Tables.load(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text"))).distinct().count()
    val theoreticalFp = math.pow(1.0 - math.exp(-k.toDouble * n / m), k)
    assert(foundAbsent.toDouble / nAbsent <= 3.0 * theoreticalFp + 0.01,
      s"FP rate ${foundAbsent.toDouble / nAbsent} exceeds 3x theoretical $theoreticalFp")
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

  test("q_mad_approx tracks the exact MAD within 2% relative error") {
    def byFlag(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("median_price"), r.getAs[Double]("mad")))).toMap
    val exact = byFlag(Relational.madByFlag(spark, dir))
    val approx = byFlag(Sketches.approxMad(spark, dir))
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (an, amed, amad)) =>
      val (en, emed, emad) = exact(k)
      assert(an === en, s"group $k: row counts are exact on both paths")
      assert(math.abs(amed - emed) / emed < 0.02, s"group $k: median $amed vs $emed")
      assert(math.abs(amad - emad) / emad < 0.02, s"group $k: MAD $amad vs $emad")
    }
  }

  test("cdc_lag_percentiles_approx tracks the exact lag quantiles within 2%") {
    val cl = graft.cdc.Cdc.changelog(spark, dir)
    def byCohort(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("cohort") ->
        ((r.getAs[Long]("p50_ms"), r.getAs[Long]("p90_ms"),
          r.getAs[Long]("p99_ms"), r.getAs[Long]("max_ms")))).toMap
    val exact = byCohort(graft.cdc.Monitoring.lagPercentiles(cl))
    val approx = byCohort(Sketches.approxLagPercentiles(cl))
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (c, (a50, a90, a99, amax)) =>
      val (e50, e90, e99, emax) = exact(c)
      assert(amax === emax, s"cohort $c: max is exact on both paths")
      Seq((a50, e50), (a90, e90), (a99, e99)).foreach { case (a, e) =>
        assert(math.abs(a - e).toDouble / math.max(e, 1L) < 0.02,
          s"cohort $c: approx $a vs exact $e")
      }
    }
  }
}
