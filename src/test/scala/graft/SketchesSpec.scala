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

  test("emb_dim_quantiles_approx lands inside the exact rank envelope p ± 0.005") {
    import org.apache.spark.sql.functions._
    // The right contract for a value-PICKING sketch vs an INTERPOLATING
    // exact percentile is rank-based, not value-based: approx_percentile
    // guarantees rank error ≤ n/accuracy (≪ half a percentile point
    // here), and the pick-vs-interpolate representation gap moves the
    // result by at most one order statistic — so every sketched quantile
    // must lie within the exact [p−0.005, p+0.005] envelope. A fixed
    // value tolerance would instead measure the local SPARSITY of the
    // sample's tail, which is a property of sf0.001, not of the sketch.
    val env = graft.Tables.load(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x").cast("double").as("x"))
      .groupBy("dim")
      .agg(expr("percentile(x, array(0.005, 0.015, 0.45, 0.55, 0.985, 0.995))").as("e"))
      .collect()
      .map(r => r.getAs[Long]("dim") -> r.getSeq[Double](1)).toMap
    val exactN = graft.similarity.Ann.dimQuantiles(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("n")).toMap
    val approx = Sketches.approxDimQuantiles(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p01"), r.getAs[Double]("p50"),
          r.getAs[Double]("p99")))).toMap
    assert(approx.keySet === env.keySet)
    approx.foreach { case (d, (an, a01, a50, a99)) =>
      assert(an === exactN(d), s"dim $d: row counts are exact on both paths")
      val e = env(d)
      Seq(("p01", a01, e(0), e(1)), ("p50", a50, e(2), e(3)), ("p99", a99, e(4), e(5)))
        .foreach { case (name, a, lo, hi) =>
          assert(a >= lo && a <= hi, s"dim $d $name: $a outside exact envelope [$lo, $hi]")
        }
    }
  }

  test("cdc_event_size_pcts_approx tracks the exact per-topic byte quantiles within 2%") {
    def byTopic(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("topic") ->
        ((r.getAs[Long]("n_messages"), r.getAs[Long]("min_bytes"), r.getAs[Long]("p50_bytes"),
          r.getAs[Long]("p90_bytes"), r.getAs[Long]("p99_bytes"), r.getAs[Long]("max_bytes")))).toMap
    val exact = byTopic(graft.cdc.Monitoring.eventSizePercentiles(spark, dir))
    val approx = byTopic(Sketches.approxEventSizePercentiles(spark, dir))
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (t, (an, amin, a50, a90, a99, amax)) =>
      val (en, emin, e50, e90, e99, emax) = exact(t)
      assert(an === en && amin === emin && amax === emax,
        s"topic $t: count/min/max are exact on both paths")
      Seq((a50, e50), (a90, e90), (a99, e99)).foreach { case (a, e) =>
        assert(math.abs(a - e).toDouble / math.max(e, 1L) < 0.02,
          s"topic $t: approx $a vs exact $e")
      }
    }
  }

  test("cdc_watermark_advise_approx agrees with the exact advisor within one rounding step") {
    val cl = graft.cdc.Cdc.changelog(spark, dir)
    val e = graft.cdc.Monitoring.watermarkAdvise(cl).collect()(0)
    val a = Sketches.approxWatermarkAdvise(cl).collect()(0)
    assert(a.getAs[Long]("n_events") === e.getAs[Long]("n_events"))
    assert(a.getAs[Long]("n_late") === e.getAs[Long]("n_late"),
      "the lateness derivation is identical — only the percentile core is sketched")
    Seq("p50_ms", "p95_ms", "p99_ms").foreach { c =>
      val (av, ev) = (a.getAs[Double](c), e.getAs[Double](c))
      assert(math.abs(av - ev) / math.max(ev, 1.0) < 0.02, s"$c: approx $av vs exact $ev")
    }
    val (aw, ew) = (a.getAs[Long]("advised_watermark_ms"), e.getAs[Long]("advised_watermark_ms"))
    assert(math.abs(aw - ew) <= 60000L,
      s"advised watermark $aw vs $ew — the ceil-to-minute grid may shift by at most one step")
  }

  test("cdc_hot_key_share_approx: CMS never undercounts a hot key, share within the CMS ceiling") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.approxHotKeyShare(spark, dir).collect()
    val nKeys = graft.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(rows.length === math.min(20L, nKeys).toInt,
      "probe set is the exact top-k, capped by the key population")
    val nTotal = graft.Tables.load(spark, dir, "events").count()
    val bound = nTotal.toDouble * 4 / 1024 // same empirical N·depth/width ceiling
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt"); val est = r.getAs[Long]("cms_cnt")
      assert(est >= exact, s"user ${r.getAs[Long]("user_id")}: CMS must never undercount")
      assert(est - exact <= bound, s"overcount ${est - exact} exceeds $bound")
      val share = r.getAs[Double]("est_share")
      assert(share >= exact.toDouble / nTotal && share <= (exact + bound) / nTotal,
        "share is the estimate over the exact broadcast total")
    }
  }

  test("text_doc_freq_approx: estimated df head matches the exact operator's head, one-sided error") {
    val exact = graft.text.TextFunctions.termDocFreq(spark, dir).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("df")).toMap
    val rows = Sketches.approxDocFreqHead(spark, dir).collect()
    assert(rows.length === 20)
    // identical probe semantics: the head terms and their exact df match
    // the exact operator (both dedupe terms per doc before counting)
    assert(rows.map(r => r.getAs[String]("term") -> r.getAs[Long]("df")).toMap === exact)
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    rows.foreach { r =>
      val df = r.getAs[Long]("df"); val est = r.getAs[Long]("df_est")
      assert(est >= df, s"${r.getAs[String]("term")}: CMS must never undercount")
      assert(r.getAs[Double]("df_ratio_est") === est.toDouble / nDocs)
    }
  }

  test("q_cumulative_uniques_approx: per-day and cumulative HLL estimates within 5%, final day near-exact union") {
    val exact = graft.analytics.Relational.cumulativeUniques(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("day"),
        r.getAs[Long]("n_active"), r.getAs[Long]("cum_uniques")))
    val approx = Sketches.approxCumulativeUniques(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("day"),
        r.getAs[Long]("n_active_approx"), r.getAs[Long]("cum_uniques_approx")))
    assert(approx.map(_._1).toSeq === exact.map(_._1).toSeq, "same day axis")
    exact.zip(approx).foreach { case ((d, ea, ec), (_, aa, ac)) =>
      assert(math.abs(aa.toDouble - ea) / ea < 0.05, s"$d: n_active $aa vs $ea")
      assert(math.abs(ac.toDouble - ec) / ec < 0.05, s"$d: cum_uniques $ac vs $ec")
    }
    // the union telescopes: cumulative estimates never decrease
    approx.map(_._3).toSeq.sliding(2).foreach { pair =>
      if (pair.size == 2) assert(pair(1) >= pair(0), "HLL union is monotone")
    }
  }

  test("deployment CMS: raw-stream cell build + external-candidate probe " +
       "reproduce the contract form's estimates exactly") {
    import org.apache.spark.sql.functions._
    // the same token stream approxHeavyHitters feeds its contract core
    val tokens = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("item"))
      .where(length(col("item")) >= 3)
    val cells = Sketches.cmsCellCounts(tokens).cache()
    // structure: at most depth*width cells, and mass conservation — every
    // raw item lands in exactly `depth` cells, so cell totals sum to
    // depth * |stream| regardless of how the counts were accumulated
    assert(cells.count() <= 4L * 1024L)
    val mass = cells.agg(sum("cnt")).collect()(0).getLong(0)
    assert(mass === 4L * tokens.count(), "each item increments depth cells")
    // identity: probing the contract form's own probe set (the exact
    // top-20) through the deployment cells gives the SAME estimates the
    // window-derived contract plan reports — same cells, same min-read
    val contract = Sketches.approxHeavyHitters(spark, dir).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("cms_cnt")).toMap
    val candidates = tokens.sparkSession.createDataFrame(
      contract.keys.toSeq.map(Tuple1(_))).toDF("item")
    val probed = Sketches.cmsProbe(cells, candidates).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[Long]("cms_cnt")).toMap
    assert(probed === contract,
      "deployment cells must be cell-identical to the contract topology")
    // an absent candidate still reads one-sided: estimate >= 0, and a key
    // hashing only to unhit cells coalesces to 0 rather than NULL
    val absent = Sketches.cmsProbe(cells,
      tokens.sparkSession.createDataFrame(
        Seq(Tuple1("__graft_absent_key_that_never_occurs__"))).toDF("item"))
      .collect()
    assert(absent.length === 1 && absent(0).getAs[Long]("cms_cnt") >= 0L)
    cells.unpersist()
  }
}
