package graft

/** Isolated timing of the dedup family's memoized shared builds — the
  * `shared:<name>` lines Bench emits, runnable WITHOUT the 300+-query
  * registry around them. Exists to attribute shared-chain regressions:
  * in one JVM the builds run in dependency order, so each line is its
  * marginal cost over the lines before it, exactly as in Bench.
  *
  * Usage: runMain graft.SharedBench <sfDir> [extraQuery ...]
  * Extra query names (from SparkEntry.queries) run AFTER the chain,
  * timed individually — e.g. pass dedup_band_config_sweep to measure
  * its marginal cost over a warm signature cache.
  */
object SharedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val extras = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Tables.localSession("graft-shared-bench", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    graft.dedup.Dedup.sharedBuilds.foreach { case (n, fn) =>
      time(s"shared:$n") {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    extras.foreach { q =>
      time(q) {
        SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
