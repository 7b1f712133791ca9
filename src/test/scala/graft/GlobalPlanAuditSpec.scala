package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global plan audit over EVERY registered query: no operator may plan a
  * CartesianProduct — the one physical shape that is always wrong at
  * 100 TB. (BroadcastNestedLoopJoin against a 1-row scalar side is fine
  * and deliberately used for high-watermark / stats joins.) Runs against
  * the planner only — nothing executes, so the sweep stays fast. */
class GlobalPlanAuditSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }
}
