package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14: the native as-of join is the family DEFAULT — `q_asof_join`
  * and `q_asof_join_tolerance` must plan through the codegen'd
  * [[graft.plans.AsOfJoinExec]], with the union+window compositions kept
  * registered (`*_composed`) as live cross-checks.
  */
class Round14Spec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // AQE materializes codegen stages only in the FINAL plan
    df.queryExecution.executedPlan.toString
  }

  test("q_asof_join default routes through the native codegen'd exec") {
    val p = finalPlan("q_asof_join")
    assert(p.split("\n").exists(l => l.contains("AsOfJoin") && l.contains("*(")),
      s"family default must plan AsOfJoinExec inside WholeStageCodegen:\n$p")
    assert(!p.contains("WindowExec"), "default must not be the union+window form")
  }

  test("q_asof_join_tolerance default routes native and agrees with the composed twin") {
    val p = finalPlan("q_asof_join_tolerance")
    assert(p.split("\n").exists(l => l.contains("AsOfJoin") && l.contains("*(")),
      s"tolerance default must plan AsOfJoinExec inside WholeStageCodegen:\n$p")
    val native = SparkEntry.queries("q_asof_join_tolerance")(spark, dir)
      .collect().map(_.toString).sorted
    val composed = SparkEntry.queries("q_asof_join_tolerance_composed")(spark, dir)
      .collect().map(_.toString).sorted
    assert(native.nonEmpty && native.sameElements(composed),
      "native-merge tolerance must agree bit-for-bit with the union+window twin")
  }

  test("eventBrowse limit=0 is falsy → the default 100-row page (api.py:8842), both twins") {
    import graft.cdc.Monitoring
    val dflt = Monitoring.eventBrowse(spark, dir, skip = 0, limit = 100).count()
    assert(dflt > 0)
    assert(Monitoring.eventBrowse(spark, dir, skip = 0, limit = 0).count() == dflt,
      "limit=0 must fall back to the 100-row default, not an empty page")
    assert(Monitoring.eventBrowseSql(skip = 0, limit = 0).contains("LIMIT 100"),
      "the SQL twin must carry the same falsy-limit fallback")
    // the seek variant shares the endpoint's clamp
    assert(Monitoring.eventBrowseSeek(spark, dir, limit = 0).count() ==
      Monitoring.eventBrowseSeek(spark, dir, limit = 100).count())
  }

  test("df-capped banding floor: closed-vocab flood EXECUTES with bounded candidates, " +
       "planted near-dups keep recall parity with the uncapped floor") {
    import spark.implicits._
    import graft.dedup.Dedup
    // flood mass: 3 fixed word patterns over a closed vocabulary, each
    // replicated 80× — every pattern shingle has df ≈ 80, so k5, k10 AND
    // the plain 16×1 floor all price over budget
    val vocab = Seq("alpha", "bravo", "carta", "delta", "excel", "forma",
      "gamma", "hotel", "india", "julep", "kilos", "limon")
    val patterns = Seq(
      vocab.mkString(" "),
      vocab.reverse.mkString(" "),
      (vocab.drop(6) ++ vocab.take(6)).mkString(" "))
    val flood = for (p <- patterns.indices; r <- 0 until 80)
      yield (p * 1000L + r, patterns(p))
    // planted near-dups: unique content + its 90%-prefix copy — their
    // shingles are RARE (df ≤ 2), exactly what the df cap must preserve
    val planted = (0 until 8).flatMap { i =>
      val words = (0 until 30).map(w => s"zq${i}x${w}tok${(w * 7 + i) % 13}")
      val base = (100000L + i, words.mkString(" "))
      val copy = (200000L + i, words.take(27).mkString(" "))
      Seq(base, copy)
    }
    val corpus = (flood ++ planted).toDF("doc_id", "t")
    val scheme = Dedup.containmentSchemeOf(corpus, budgetPerDoc = 64)
    assert(scheme.startsWith("band_16x1_dfcap:"),
      s"this corpus must exhaust the prefix rungs and the plain floor (got $scheme)")
    val ceiling = scheme.split(':')(1).toLong
    val capped = Dedup.bandCandidateIds16x1DfCappedOf(corpus, ceiling)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the flood regime EXECUTES: candidates per doc within the budget the
    // scheme priced against (the r13 rung refused here; now it runs)
    val nDocs = flood.size + planted.size
    assert(capped.size.toLong / nDocs <= 64,
      s"capped floor must stay within the priced budget (${capped.size} pairs / $nDocs docs)")
    // recall parity: every planted (base, copy) pair survives the cap
    (0 until 8).foreach { i =>
      assert(capped.contains((100000L + i, 200000L + i)),
        s"planted near-dup pair $i lost by the df cap")
    }
    // and parity with the UNCAPPED floor restricted to planted ids — the
    // cap drops only stop-shingle collisions, not discriminative ones
    val plantedIds = planted.map(_._1).toSet
    val uncappedPlanted = Dedup.bandCandidateIds16x1Of(Dedup.signaturesOf(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => plantedIds(p._1) && plantedIds(p._2))
    val cappedPlanted = capped.filter(p => plantedIds(p._1) && plantedIds(p._2))
    assert(uncappedPlanted == cappedPlanted,
      s"planted-set recall must match the uncapped floor (uncapped=$uncappedPlanted capped=$cappedPlanted)")
  }
}
