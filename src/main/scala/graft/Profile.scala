package graft
import org.apache.spark.sql.SparkSession

/** Per-query profiling harness: runs the named queries N times each and
  * prints cold/warm timings, separating plan+codegen cost (first run) from
  * steady-state execution — the signal Bench totals hide.
  *
  * Usage: runMain graft.Profile <sfDir> <reps> [query ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = Tables.scanConfs.foldLeft(b) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          // same honest action as Bench: evaluate every output column
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-28s cold=${times.head}%6.2f warm_min=${times.tail.minOption.getOrElse(Double.NaN)}%6.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    spark.stop()
  }
}
