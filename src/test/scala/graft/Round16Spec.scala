package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 additions: the runs-test degenerate regimes (ADVICE r15) and
  * assorted hardening pins for this round's edits. */
class Round16Spec extends AnyFunSuite {
  import TestSpark.{spark, dir}
  import spark.implicits._

  test("runs test: all-days-at-median input keeps the true day count, NULL stats") {
    // every day's count equals the median → the deviating set is empty.
    // The oracle's separate day-count CTE still reports 4 days; n_days
    // must match it, and the runs stats must fold to NULL (the empty-set
    // sums), not fabricated zeros (ADVICE r15).
    val daily = Seq(("2024-01-01", 7L), ("2024-01-02", 7L),
      ("2024-01-03", 7L), ("2024-01-04", 7L)).toDF("day", "n")
      .select(to_date(col("day")).as("day"), col("n"))
    val r = graft.analytics.Relational.runsTestOfDaily(daily).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_days") === 4L, "true day count must survive")
    assert(r(0).isNullAt(r(0).fieldIndex("n_runs")), "no deviating day → NULL runs")
    assert(r(0).isNullAt(r(0).fieldIndex("n_above")))
    assert(r(0).isNullAt(r(0).fieldIndex("n_below")))
    assert(r(0).isNullAt(r(0).fieldIndex("z")))
  }

  test("runs test: empty input reports n_days = 0 like the oracle's count CTE") {
    val daily = Seq.empty[(java.sql.Date, Long)].toDF("day", "n")
    val r = graft.analytics.Relational.runsTestOfDaily(daily).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_days") === 0L)
    assert(r(0).isNullAt(r(0).fieldIndex("n_runs")))
  }

  test("runs test: ordinary input is unchanged by the degenerate-regime fix") {
    // 6 days around median 10 (rank-3 pick of the sorted counts): the
    // filtered-fold and null-sign-fold must agree on every statistic
    val daily = Seq(("2024-01-01", 12L), ("2024-01-02", 8L),
      ("2024-01-03", 10L), ("2024-01-04", 15L), ("2024-01-05", 9L),
      ("2024-01-06", 11L)).toDF("day", "n")
      .select(to_date(col("day")).as("day"), col("n"))
    val r = graft.analytics.Relational.runsTestOfDaily(daily).collect()(0)
    assert(r.getAs[Long]("n_days") === 6L)
    // sorted: 8,9,10,11,12,15 → rank ceil(6*.5)=3 → median 10; signs by
    // day: +,-,(excl),+,-,+ → runs: +|-|+|-|+ = 5
    assert(r.getAs[Long]("n_above") === 3L)
    assert(r.getAs[Long]("n_below") === 2L)
    assert(r.getAs[Long]("n_runs") === 5L)
    assert(!r.isNullAt(r.fieldIndex("z")))
  }
}
