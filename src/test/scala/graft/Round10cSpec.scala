package graft

import graft.analytics.Relational
import graft.similarity.Ann
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-10 closing operator batch (streak
  * histogram, term burstiness, nlist elbow).
  */
class Round10cSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("streaks: histogram covers every user once, shares sum to 1, lengths cross-check") {
    val rows = Relational.streaks(spark, dir).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.load(spark, dir, "events")
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers,
      "each user lands in exactly one longest-streak bucket")
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    rows.foreach(r => assert(r.getAs[Long]("streak_days") >= 1L))
    // brute-force the longest streak for one user on the driver
    val uid = Tables.load(spark, dir, "events")
      .select("user_id").limit(1).collect().head.getLong(0)
    val days = Tables.load(spark, dir, "events")
      .where(col("user_id") === uid)
      .select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0).toLocalDate).sorted
    val longest = days.foldLeft((0L, 0L, Option.empty[java.time.LocalDate])) {
      case ((best, run, prev), d) =>
        val r = if (prev.exists(p => p.plusDays(1) == d)) run + 1 else 1L
        (math.max(best, r), r, Some(d))
    }._1
    val viaOp = Relational.streaks(spark, dir) // histogram loses the user; recompute the user's bucket
    val perUser = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("day"))))
      .groupBy("user_id", "grp").count()
      .groupBy("user_id").agg(max("count").as("longest"))
      .where(col("user_id") === uid).collect().head.getAs[Long]("longest")
    assert(perUser == longest, s"gaps-and-islands longest run for user $uid")
    assert(viaOp.collect().nonEmpty)
  }

  test("burstiness: df floor holds, ratio reproduces, never below 1, ordered desc") {
    val rows = TextFunctions.burstiness(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") >= 5L)
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"), "cf counts every occurrence")
      val b = r.getAs[Double]("burstiness")
      assert(b >= 1.0 - 1e-12)
      assert(math.abs(b - r.getAs[Long]("cf").toDouble / r.getAs[Long]("df")) < 1e-12)
    }
    val bs = rows.map(_.getAs[Double]("burstiness"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a >= b }, "descending top-k")
  }

  test("nlist elbow: nested seed prefixes make inertia non-increasing in k") {
    val rows = Ann.nlistElbow(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_clusters")).toSeq == Seq(4L, 8L, 16L, 32L))
    val inertias = rows.map(_.getAs[Double]("inertia"))
    // seeds for k are a PREFIX of seeds for k' > k, so each vector's min
    // distance can only shrink as k grows — the curve must be monotone
    assert(inertias.zip(inertias.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"inertia must be non-increasing in k: ${inertias.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_used_cells") <= r.getAs[Long]("n_clusters"))
      val s = r.getAs[Double]("largest_cell_share")
      assert(s > 0.0 && s <= 1.0)
      assert(r.getAs[Double]("inertia") >= 0.0)
    }
  }
}
