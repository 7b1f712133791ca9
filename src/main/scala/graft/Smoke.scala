package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: read every test table, print schema + count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Tables.localSession("smoke")
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach { t =>
      try {
        val df = Tables.load(spark, dir, t)
        println(s"== $t (${df.count()} rows): ${df.schema.simpleString}")
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(300)}") }
    }
    spark.stop()
  }
}
