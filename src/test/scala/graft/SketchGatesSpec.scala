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
