package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the bench instrument's pure logic — the pieces the
  * per-round grading artifacts depend on. No SparkSession needed. */
class BenchMathSpec extends AnyFunSuite {

  test("parseBaseline reads the queries object, not metadata look-alikes") {
    // the r17 multi addendum shape: a comment mentioning queries, an
    // n_queries count, THEN the real object — the literal-"queries" key
    // match must skip both traps
    val txt =
      """{
        | "comment": "frozen queries: medians from a clean window",
        | "n_queries": 2,
        | "queries": {
        |  "q1_agg": 0.912,
        |  "cdc_unwrap": 1.26
        | }
        |}""".stripMargin
    assert(BenchMath.parseBaseline(txt) ===
      Map("q1_agg" -> 0.912, "cdc_unwrap" -> 1.26))
  }

  test("parseBaseline on garbage or missing structure is empty, never throws") {
    assert(BenchMath.parseBaseline("") === Map.empty)
    assert(BenchMath.parseBaseline("not json at all") === Map.empty)
    assert(BenchMath.parseBaseline("""{"querie": {"a": 1}}""") === Map.empty)
    assert(BenchMath.readBaseline("/nonexistent/path.json") === Map.empty)
  }

  test("median: upper-median convention, NaN passes excluded, all-NaN is None") {
    assert(BenchMath.median(Seq(3.0, 1.0, 2.0)) === Some(2.0))
    assert(BenchMath.median(Seq(1.0, 2.0)) === Some(2.0))
    assert(BenchMath.median(Seq(Double.NaN, 5.0, Double.NaN)) === Some(5.0))
    assert(BenchMath.median(Seq(Double.NaN)) === None)
    assert(BenchMath.median(Nil) === None)
  }

  test("medianWithRetime repairs a load-inflated median but never worsens a clean one") {
    // loaded window: passes [1.49, 3.94, 47.5] (the r16 driver artifact's
    // dedup_band_config_sweep), retime 1.6 → median over 4 drops to 3.94;
    // upper-median of even count keeps the statistic conservative
    assert(BenchMath.medianWithRetime(Seq(1.49, 3.94, 47.5), Some(1.6)) === Some(3.94))
    // clean window: a SLOWER retime must not move the median up
    assert(BenchMath.medianWithRetime(Seq(1.0, 1.1, 1.2), Some(9.0)) === Some(1.1))
    // NaN retime is ignored
    assert(BenchMath.medianWithRetime(Seq(1.0, 1.1, 1.2), Some(Double.NaN)) === Some(1.1))
    assert(BenchMath.medianWithRetime(Seq(1.0, 1.1, 1.2), None) === Some(1.1))
    assert(BenchMath.medianWithRetime(Seq(Double.NaN), Some(1.0)) === None)
  }

  test("retimeWorthy: ratio AND absolute spread, needs two successful passes") {
    assert(BenchMath.retimeWorthy(Seq(1.49, 3.94, 47.5)))
    assert(!BenchMath.retimeWorthy(Seq(1.0, 1.1, 1.2)), "clean spread")
    assert(!BenchMath.retimeWorthy(Seq(0.05, 0.2)), "ratio 4x but only 0.15s absolute")
    assert(!BenchMath.retimeWorthy(Seq(5.0, 6.0)), "1s absolute but ratio 1.2")
    assert(!BenchMath.retimeWorthy(Seq(4.0, Double.NaN, Double.NaN)), "one pass, no spread")
    assert(BenchMath.retimeWorthy(Seq(0.4, Double.NaN, 4.0)), "NaNs excluded, spread judged on the rest")
  }

  test("property: medianWithRetime is repair-only and bounded by the pass extremes") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val passGen: Gen[List[Double]] =
      Gen.chooseNum(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0.01, 60.0)))
    val retimeGen: Gen[Double] = Gen.chooseNum(0.01, 60.0)
    (1 to 300).foreach { i =>
      val passes = passGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val retime = retimeGen.pureApply(Gen.Parameters.default, Seed((i + 10000).toLong))
      val plain = BenchMath.median(passes).get
      val withR = BenchMath.medianWithRetime(passes, Some(retime)).get
      // repair-only: a retime can only lower the reported median
      assert(withR <= plain, s"retime worsened the median: $passes + $retime")
      // and never below the best pass or retime actually observed
      assert(withR >= math.min(passes.min, retime) - 1e-12,
        s"median fell below every observation: $passes + $retime -> $withR")
      // no-retime path is the plain median
      assert(BenchMath.medianWithRetime(passes, None).get === plain)
    }
  }

  test("property: retimeWorthy is scale-threshold consistent") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val passGen: Gen[List[Double]] =
      Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0.01, 60.0)))
    (1 to 300).foreach { i =>
      val passes = passGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val worthy = BenchMath.retimeWorthy(passes)
      val expected =
        passes.max / math.max(passes.min, 1e-9) > 3.0 && passes.max - passes.min > 0.3
      assert(worthy === expected, s"predicate disagrees on $passes")
      // permutation invariance: spread is a set property
      assert(BenchMath.retimeWorthy(passes.reverse) === worthy)
    }
  }

  test("familyOf folds relational variants into q, keeps the other prefixes") {
    assert(BenchMath.familyOf("q1_agg") === "q")
    assert(BenchMath.familyOf("q10_returns") === "q")
    assert(BenchMath.familyOf("q_mad_approx_gate") === "q")
    assert(BenchMath.familyOf("cdc_unwrap") === "cdc")
    assert(BenchMath.familyOf("dedup_minhash_lsh") === "dedup")
    assert(BenchMath.familyOf("ann_pq_rerank") === "ann")
    assert(BenchMath.familyOf("emb_norm_stats") === "emb")
    assert(BenchMath.familyOf("text_tokens") === "text")
    assert(BenchMath.familyOf("pipe_interleave") === "pipe")
    assert(BenchMath.familyOf("mm_image_phash") === "mm")
  }

  test("familyRatios: per-family sums over the frozen common subset only") {
    val frozen = Map(
      "q1_agg" -> 1.0, "q_mad" -> 1.0,       // q frozen sum 2.0
      "cdc_unwrap" -> 2.0,                   // cdc frozen sum 2.0
      "text_tokens" -> 1.0, "text_hapax" -> 1.0, // text frozen sum 2.0
      "mm_only_frozen" -> 5.0)               // no run median -> excluded
    val results = Map(
      "q1_agg" -> 1.5, "q_mad" -> 0.5,       // q ratio 1.0
      "cdc_unwrap" -> 3.0,                   // cdc ratio 1.5
      "text_tokens" -> 1.16, "text_hapax" -> 1.16, // text ratio 1.16
      "ann_new_query" -> 9.9)                // not frozen -> excluded
    val fams = BenchMath.familyRatios(results, frozen)
    assert(fams("q") === ((1.0, 2)))
    assert(fams("cdc") === ((1.5, 1)))
    assert(math.abs(fams("text")._1 - 1.16) < 1e-9)
    assert(!fams.contains("mm"), "family with no common queries is absent")
    assert(!fams.contains("ann"), "unfrozen query contributes to no family")
  }

  test("watchPair is epoch-matched: multi pair only when BOTH same-epoch pieces exist") {
    // full multi pair -> r16 freeze with the multi ratio
    assert(BenchMath.watchPair(isMulti = true, multiFreeze = Some(0.4),
      frozen = Some(0.3), singleRatio = Some(1.1), multiRatio = Some(0.9))
      === Some((0.4, 0.9)))
    // multi query with NO same-epoch freeze (the r17-ADVICE mm_image_*
    // case): adjudicate single-stage, never r12-median / r16-ratio
    assert(BenchMath.watchPair(isMulti = true, multiFreeze = None,
      frozen = Some(0.3), singleRatio = Some(1.1), multiRatio = Some(0.9))
      === Some((0.3, 1.1)))
    // multi ratio absent -> same single-stage fallback
    assert(BenchMath.watchPair(isMulti = true, multiFreeze = Some(0.4),
      frozen = Some(0.3), singleRatio = Some(1.1), multiRatio = None)
      === Some((0.3, 1.1)))
    // single-stage query: its own freeze with the single ratio
    assert(BenchMath.watchPair(isMulti = false, multiFreeze = Some(0.4),
      frozen = Some(0.3), singleRatio = Some(1.1), multiRatio = Some(0.9))
      === Some((0.3, 1.1)))
    // nothing to adjudicate against -> None
    assert(BenchMath.watchPair(isMulti = false, multiFreeze = None,
      frozen = None, singleRatio = Some(1.1), multiRatio = None) === None)
    assert(BenchMath.watchPair(isMulti = true, multiFreeze = None,
      frozen = Some(0.3), singleRatio = None, multiRatio = None) === None)
  }

  test("distinctShuffleExchanges dedupes cached-subtree re-prints and ignores broadcast/reused") {
    val plan =
      """AdaptiveSparkPlan (20)
        |+- Exchange (14) hashpartitioning(k, 32)
        |   +- BroadcastExchange (12) HashedRelationBroadcastMode
        |      +- InMemoryTableScan (1)
        |            +- Exchange (5) hashpartitioning(j, 32)
        |   +- InMemoryTableScan (2)
        |            +- Exchange (5) hashpartitioning(j, 32)
        |   +- ReusedExchange (14)
        |""".stripMargin
    // Exchange (14) once, Exchange (5) printed twice under two scans of
    // the same cached relation = one node; Broadcast/Reused don't count
    assert(BenchMath.distinctShuffleExchanges(plan) === 2)
    assert(BenchMath.distinctShuffleExchanges("no exchanges here") === 0)
  }
}
