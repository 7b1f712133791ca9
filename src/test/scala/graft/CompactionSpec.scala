package graft

import graft.sinks.TableSink
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Lake small-file compaction: the plan counts only data files, the
  * rewrite lands the planned file count without changing the data, and
  * an already-healthy table is left untouched.
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark.spark
  import org.apache.spark.sql.functions._

  private def dataFiles(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .toSeq

  test("fragmented table: plan prices the rewrite, compaction lands it data-intact") {
    val base = Files.createTempDirectory("compact").toString + "/t"
    spark.range(10000).select(col("id"), (col("id") * 7 % 100).as("v"))
      .repartition(24).write.parquet(base)
    assert(dataFiles(base).size === 24)

    val plan = TableSink.compactionPlan(spark, base)
    assert(plan.nFiles === 24L)
    assert(plan.totalBytes === dataFiles(base).map(_.length).sum)
    // tiny table: everything fits one 128 MiB target file
    assert(plan.targetFiles === 1L)
    assert(plan.worthCompacting)

    val before = spark.read.parquet(base).collect().map(_.toSeq).toSet
    val executed = TableSink.compactSmallFiles(spark, base)
    assert(executed === plan)
    assert(dataFiles(base).size === 1)
    assert(spark.read.parquet(base).collect().map(_.toSeq).toSet === before)
    // the crash-swap backup is cleaned up after a successful compaction
    assert(!new java.io.File(base + ".bak").exists())
  }

  test("healthy table: not worth compacting and left byte-identical") {
    val base = Files.createTempDirectory("compact2").toString + "/t"
    spark.range(100).coalesce(1).write.parquet(base)
    val files = dataFiles(base).map(f => f.getName -> f.length).toMap
    val plan = TableSink.compactSmallFiles(spark, base)
    assert(!plan.worthCompacting)
    assert(dataFiles(base).map(f => f.getName -> f.length).toMap === files)
  }
}
