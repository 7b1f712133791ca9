package graft

import graft.streaming.MixMonitor
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Streaming mix monitor: per-batch drift rows must track the cumulative
  * ingested mix against the planner's target, flag the worst offender,
  * alert once the budget is exceeded, and stay idempotent under replay.
  */
class MixMonitorSpec extends AnyFunSuite {
  import TestSpark.spark

  // 4 tokens per doc → token math stays in the head
  private def doc(id: Long, source: String) =
    (id, source, "alpha beta gamma delta")

  private def writeDocs(path: String, file: String, docs: Seq[(Long, String, String)]): Unit = {
    Files.createDirectories(Paths.get(path))
    val lines = docs.map { case (id, s, t) => s"""{"doc_id":$id,"source":"$s","text":"$t"}""" }
    Files.write(Paths.get(path, file), lines.mkString("\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    ()
  }

  test("drift rows track the cumulative mix and alert past the budget") {
    val base = Files.createTempDirectory("mixmon").toString
    // plan: half web, half books
    val cfg = MixMonitor.Config(s"$base/docs", s"$base/state", s"$base/ckpt",
      targets = Map("web" -> 0.5, "books" -> 0.5), alertTv = 0.2)

    // batch 1 lands exactly on target: 1 web + 1 books doc
    writeDocs(cfg.docsPath, "b1.json", Seq(doc(1, "web"), doc(2, "books")))
    val q = MixMonitor.start(spark, cfg)
    q.processAllAvailable()

    // batch 2 floods web: cumulative = web 3/4, books 1/4
    writeDocs(cfg.docsPath, "b2.json", Seq(doc(3, "web"), doc(4, "web")))
    q.processAllAvailable()
    q.stop()

    val rows = MixMonitor.drift(spark, cfg).collect()
      .map(r => r.getAs[Long]("batch_id") -> r).toMap
    assert(rows.keySet === Set(0L, 1L))

    assert(rows(0L).getAs[Long]("corpus_tokens") === 8L)
    assert(rows(0L).getAs[Double]("tv_distance") === 0.0)
    assert(!rows(0L).getAs[Boolean]("alert"))

    // tv = (|0.75-0.5| + |0.25-0.5|)/2 = 0.25, worst offender ties
    // break to the larger source name ("web" > "books")
    assert(rows(1L).getAs[Long]("corpus_tokens") === 16L)
    assert(math.abs(rows(1L).getAs[Double]("tv_distance") - 0.25) < 1e-9)
    assert(math.abs(rows(1L).getAs[Double]("max_gap") - 0.25) < 1e-9)
    assert(rows(1L).getAs[String]("max_gap_source") === "web")
    assert(rows(1L).getAs[Boolean]("alert"))
  }

  test("a source absent from the plan and a planned source not yet seen both count as drift") {
    val base = Files.createTempDirectory("mixmon2").toString
    val cfg = MixMonitor.Config(s"$base/docs", s"$base/state", s"$base/ckpt",
      targets = Map("web" -> 1.0))
    spark.sparkContext.setLogLevel("WARN")
    // only an unplanned source arrives: current {code: 1.0}, target {web: 1.0}
    MixMonitor.monitorBatch(spark, cfg,
      spark.createDataFrame(Seq(doc(1, "code"))).toDF("doc_id", "source", "text"), 0L)
    val r = MixMonitor.drift(spark, cfg).collect().head
    assert(r.getAs[Long]("n_sources") === 2L)
    assert(math.abs(r.getAs[Double]("tv_distance") - 1.0) < 1e-9)
    assert(r.getAs[Boolean]("alert"))
  }

  test("empty and whitespace-only documents contribute zero tokens, not one") {
    val base = Files.createTempDirectory("mixmon4").toString
    val cfg = MixMonitor.Config(s"$base/docs", s"$base/state", s"$base/ckpt",
      targets = Map("web" -> 0.5, "books" -> 0.5))
    // books ships 3 empty/whitespace docs alongside web's 4 real tokens:
    // split(trim(''), '\s+') = [""] would credit books 3 phantom tokens
    // and fake a books share of 3/7
    val batch = spark.createDataFrame(Seq(
      doc(1, "web"), (2L, "books", ""), (3L, "books", "   "), (4L, "books", "\t\n")))
      .toDF("doc_id", "source", "text")
    MixMonitor.monitorBatch(spark, cfg, batch, 0L)
    val r = MixMonitor.drift(spark, cfg).collect().head
    assert(r.getAs[Long]("corpus_tokens") === 4L)
    // the whole corpus is web → gap vs the 50/50 plan is 0.5, not 3/7-skewed
    assert(math.abs(r.getAs[Double]("tv_distance") - 0.5) < 1e-9)
    assert(r.getAs[String]("max_gap_source") === "web")
  }

  test("replaying a batch neither double-counts tokens nor duplicates drift rows") {
    val base = Files.createTempDirectory("mixmon3").toString
    val cfg = MixMonitor.Config(s"$base/docs", s"$base/state", s"$base/ckpt",
      targets = Map("web" -> 0.5, "books" -> 0.5))
    val b0 = spark.createDataFrame(Seq(doc(1, "web"))).toDF("doc_id", "source", "text")
    val b1 = spark.createDataFrame(Seq(doc(2, "books"))).toDF("doc_id", "source", "text")
    MixMonitor.monitorBatch(spark, cfg, b0, 0L)
    MixMonitor.monitorBatch(spark, cfg, b1, 1L)
    val before = MixMonitor.drift(spark, cfg).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_tokens"),
        r.getAs[Double]("tv_distance"))).toSet
    // at-least-once delivery: batch 1 fires again
    MixMonitor.monitorBatch(spark, cfg, b1, 1L)
    val after = MixMonitor.drift(spark, cfg).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_tokens"),
        r.getAs[Double]("tv_distance"))).toSet
    assert(after === before)
    assert(after.map(_._1) === Set(0L, 1L))
    // cumulative after replay is still 8 tokens, on-target
    assert(after.find(_._1 == 1L).get._2 === 8L)
    assert(after.find(_._1 == 1L).get._3 === 0.0)
  }
}
