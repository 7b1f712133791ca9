package graft

/** Writes `explain("formatted")` physical plans for a list of queries to a
  * directory — the per-round scale-evidence artifact (PLANS_r{N}/) so the
  * plan shapes of the most expensive queries are reviewable from the repo
  * without re-running anything.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <query> [query...]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val spark = Tables.localSession("graft-plandump",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $name")
    }
    spark.stop()
  }
}
