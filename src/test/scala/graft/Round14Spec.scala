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
}
