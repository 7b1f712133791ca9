package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r17 sketch-contract gates: every verdict column must read 1 (the
  * value the DuckDB oracle pins), and the deployment-CMS registry query
  * must keep its bounded-shuffle topology. The gates' exact-side columns
  * are covered by the driver's hash compare (selfcheck/CORRECTNESS); here
  * we pin the verdicts themselves so a contract breach fails the suite
  * even before a driver run. */
class SketchGatesSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  private val gates = Seq(
    "q_mad_approx_gate", "cdc_lag_percentiles_approx_gate",
    "cdc_event_size_pcts_approx_gate", "cdc_watermark_advise_approx_gate",
    "emb_dim_quantiles_approx_gate", "cdc_hot_key_share_approx_gate",
    "text_doc_freq_approx_gate", "q_cumulative_uniques_approx_gate",
    "cdc_hot_key_share_cms")

  private val verdictCol =
    ".*(_ok|_equal|_within_.*|_in_envelope|_consistent|_one_step)$".r.pattern

  test("every contract verdict column reads 1 on every row of every gate") {
    gates.foreach { g =>
      val df = SparkEntry.queries(g)(spark, dir)
      val flags = df.schema.fields
        .filter(f => verdictCol.matcher(f.name).matches()).map(_.name)
      assert(flags.nonEmpty, s"$g: no verdict columns found — wrong schema?")
      val rows = df.collect()
      assert(rows.nonEmpty, s"$g returned no rows")
      rows.foreach { r =>
        flags.foreach { f =>
          assert(r.getAs[Long](f) === 1L, s"$g: verdict $f flipped to 0 on row $r")
        }
      }
    }
  }

  test("every gate has an oracle: the 8 rows-only twins are all driver-covered") {
    gates.foreach { g =>
      assert(SparkEntry.oracleSql.contains(g), s"$g missing its DuckDB oracle")
    }
    // and the pairing is complete: each rows-only twin has its gate
    Seq("q_mad_approx", "cdc_lag_percentiles_approx",
      "cdc_event_size_pcts_approx", "cdc_watermark_advise_approx",
      "emb_dim_quantiles_approx", "cdc_hot_key_share_approx",
      "text_doc_freq_approx", "q_cumulative_uniques_approx").foreach { t =>
      assert(SparkEntry.queries.contains(s"${t}_gate"), s"$t has no gate twin")
    }
  }

  test("the gates are non-vacuous: an impossible tolerance flips flags to 0") {
    // the verdicts are computed comparisons flowing through the real
    // twin-vs-twin wiring, not constants that happen to match the
    // oracle's literal 1s: demand bit-exactness (tol 1e-12) of a GK
    // sketch and the within-tolerance flags must flip
    val rows = graft.analytics.SketchGates.madGate(spark, dir, tol = 1e-12).collect()
    val flipped = rows.count(r =>
      r.getAs[Long]("median_within_2pct") == 0L || r.getAs[Long]("mad_within_2pct") == 0L)
    assert(flipped > 0,
      "a 1e-12 tolerance on a rank-picking sketch vs an interpolating exact " +
        "percentile must flip at least one verdict — if it doesn't, the gate " +
        "is comparing something vacuous")
    // and the exact-side columns stay correct even when verdicts flip
    rows.foreach(r => assert(r.getAs[Long]("n_equal") === 1L))
  }

  // r17 verdict item 2: the flip proof must cover EVERY verdict family,
  // not just madGate's 2%-relative flags — a refactor that rewrote any
  // other verdict to lit(1) would otherwise pass every test and every
  // driver hash forever. Each knob below is an IMPOSSIBLE parameter
  // (unsatisfiable comparison), so the flip is deterministic and flows
  // through the registered wiring; exact-side columns must stay intact.

  private def assertAllFlip(rows: Array[org.apache.spark.sql.Row],
                            flag: String, gate: String): Unit = {
    assert(rows.nonEmpty, s"$gate returned no rows")
    rows.foreach(r => assert(r.getAs[Long](flag) === 0L,
      s"$gate: $flag must flip to 0 under the impossible parameter"))
  }

  test("within-tolerance family: tol=0 flips the quantile gates' verdicts") {
    import graft.analytics.SketchGates
    // |a-e|/max(...) < 0 is unsatisfiable even at a==e
    val lag = SketchGates.lagPercentilesGate(
      graft.cdc.Cdc.changelog(spark, dir), tol = 0.0).collect()
    Seq("p50_within_2pct", "p90_within_2pct", "p99_within_2pct")
      .foreach(assertAllFlip(lag, _, "lagPercentilesGate"))
    lag.foreach(r => assert(r.getAs[Long]("max_equal") === 1L,
      "exact-side verdicts stay intact while tolerance verdicts flip"))
    val sizes = SketchGates.eventSizeGate(spark, dir, tol = 0.0).collect()
    Seq("p50_within_2pct", "p90_within_2pct", "p99_within_2pct")
      .foreach(assertAllFlip(sizes, _, "eventSizeGate"))
    sizes.foreach(r => assert(r.getAs[Long]("exact_fields_equal") === 1L))
  }

  test("step + within family: the watermark gate's verdicts each flip") {
    import graft.analytics.SketchGates
    val cl = graft.cdc.Cdc.changelog(spark, dir)
    val tol0 = SketchGates.watermarkAdviseGate(cl, tol = 0.0).collect()
    Seq("p50_within_2pct", "p95_within_2pct", "p99_within_2pct")
      .foreach(assertAllFlip(tol0, _, "watermarkAdviseGate"))
    tol0.foreach(r => assert(r.getAs[Long]("counts_equal") === 1L))
    // a negative step quantum makes the advised-watermark bound negative
    // — an absolute difference can never satisfy it
    val step = SketchGates.watermarkAdviseGate(cl, stepMs = -1L).collect()
    assertAllFlip(step, "advised_within_tol_steps", "watermarkAdviseGate")
  }

  test("rank-envelope family: an inverted envelope flips the dim-quantile verdicts") {
    import graft.analytics.SketchGates
    // envScale=-1 swaps each envelope's lo/hi ranks; membership in an
    // inverted interval is impossible for any non-constant dimension
    val rows = SketchGates.dimQuantilesGate(spark, dir, envScale = -1.0).collect()
    assert(rows.nonEmpty)
    val anyFlip = Seq("p01_in_envelope", "p50_in_envelope", "p99_in_envelope")
      .exists(f => rows.forall(_.getAs[Long](f) === 0L))
    assert(anyFlip,
      "at least one envelope verdict must flip to 0 on every dimension " +
        "under the inverted envelope")
    rows.foreach(r => assert(r.getAs[Long]("n_equal") === 1L))
  }

  test("CMS ceiling family: a negative ceiling flips the overcount verdicts") {
    import graft.analytics.SketchGates
    // the CMS overcount is structurally >= 0, so a negative ceiling is
    // unsatisfiable on every row of both CMS gates
    val hot = SketchGates.hotKeyShareGate(spark, dir, boundScale = -1.0).collect()
    assertAllFlip(hot, "overcount_within_bound", "hotKeyShareGate")
    hot.foreach(r => assert(r.getAs[Long]("one_sided_ok") === 1L,
      "the structural one-sided verdict stays 1 while the ceiling flips"))
    val cms = SketchGates.hotKeyShareCms(spark, dir, boundScale = -1.0).collect()
    assertAllFlip(cms, "overcount_within_bound", "hotKeyShareCms")
    cms.foreach(r => assert(r.getAs[Long]("one_sided_ok") === 1L))
  }

  test("CMS one-sided family: an impossible slack flips the docFreq verdict") {
    import graft.analytics.SketchGates
    // df_est >= df + 1e15 cannot hold at any corpus size this engine
    // will ever see — proves the one-sided verdict compares real columns
    val rows = SketchGates.docFreqGate(spark, dir, oneSidedSlack = 1e15).collect()
    assertAllFlip(rows, "one_sided_ok", "docFreqGate")
    rows.foreach(r => assert(r.getAs[Long]("ratio_consistent") === 1L))
  }

  test("monotone + HLL family: the cumulative-uniques verdicts each flip") {
    import graft.analytics.SketchGates
    val tol0 = SketchGates.cumulativeUniquesGate(spark, dir,
      tolActive = 0.0, tolCum = 0.0).collect()
    Seq("active_within_3rsd", "cum_within_5pct")
      .foreach(assertAllFlip(tol0, _, "cumulativeUniquesGate"))
    tol0.foreach(r => assert(r.getAs[Long]("monotone_ok") === 1L))
    // demanding each day's cumulative estimate exceed its predecessor by
    // 1e15 is impossible -> the monotone verdict is a computed comparison
    val mono = SketchGates.cumulativeUniquesGate(spark, dir,
      monotoneSlack = 1000000000000000L).collect()
    assertAllFlip(mono, "monotone_ok", "cumulativeUniquesGate")
  }

  test("cdc_hot_key_share_cms keeps the deployment topology in ONE plan") {
    val p = SparkEntry.queries("cdc_hot_key_share_cms")(spark, dir)
      .queryExecution.executedPlan.toString
    // the build side's only shuffle is the <=depth*width cell key —
    // exactly one (row, bucket) exchange may exist
    val cellEx = "hashpartitioning\\(row#\\d+L?, bucket#\\d+".r.findAllIn(p).length
    assert(cellEx === 1, s"expected exactly one (row,bucket) cell exchange, saw $cellEx:\n$p")
    // the <=4096-row cell table must broadcast to the candidate probes
    assert(p.contains("BroadcastHashJoin"), s"cells must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "neither the probe nor the verdict join may shuffle-join")
    // the exact top-k candidate list is a TakeOrdered pass, not a global sort
    assert(p.contains("TakeOrderedAndProject"),
      "candidate top-k must be TakeOrderedAndProject")
  }
}
