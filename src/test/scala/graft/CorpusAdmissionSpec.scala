package graft

import graft.streaming.CorpusAdmission
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Streaming corpus admission: the continuous near-dup guard must reject
  * within-batch copies, reject cross-batch copies against the persisted
  * index, and admit genuinely new text — with only admitted docs'
  * signatures entering the index state.
  */
class CorpusAdmissionSpec extends AnyFunSuite {
  import TestSpark.spark

  private val textA =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby every single morning"
  private val textB =
    "completely different content about distributed query engines shuffling partitioned columnar data across executor nodes at scale"
  private val textD =
    "yet another unrelated document describing minhash banding locality sensitive hashing and jaccard similarity verification stages"

  private def writeDocs(path: String, file: String, docs: Seq[(Long, String)]): Unit = {
    Files.createDirectories(Paths.get(path))
    val lines = docs.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
    Files.write(Paths.get(path, file), lines.mkString("\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    ()
  }

  test("admission rejects within-batch and cross-batch near-dups") {
    val base = Files.createTempDirectory("admission").toString
    val cfg = CorpusAdmission.Config(s"$base/docs", s"$base/state", s"$base/ckpt")

    // batch 1: A and B unique, C an exact copy of A (within-batch dup)
    writeDocs(cfg.docsPath, "b1.json", Seq(1L -> textA, 2L -> textB, 3L -> textA))
    val q = CorpusAdmission.start(spark, cfg)
    q.processAllAvailable()

    // batch 2: D unique, E a copy of A (cross-batch dup vs the index)
    writeDocs(cfg.docsPath, "b2.json", Seq(4L -> textD, 5L -> textA))
    q.processAllAvailable()
    q.stop()

    val rows = CorpusAdmission.decisions(spark, cfg).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(rows(1L).getAs[Long]("admitted") === 1L)
    assert(rows(2L).getAs[Long]("admitted") === 1L)
    // C rejected against in-batch lower-id copy A
    assert(rows(3L).getAs[Long]("admitted") === 0L)
    assert(rows(3L).getAs[Long]("match_id") === 1L)
    assert(rows(3L).getAs[Double]("jaccard") === 1.0)
    assert(rows(4L).getAs[Long]("admitted") === 1L)
    // E rejected against the PERSISTED index entry for A from batch 1
    assert(rows(5L).getAs[Long]("admitted") === 0L)
    assert(rows(5L).getAs[Long]("match_id") === 1L)
    assert(rows(5L).getAs[Double]("jaccard") === 1.0)

    // only admitted docs' signatures live in the index state
    val indexed = spark.read.parquet(s"${cfg.statePath}/shingles")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed === Set(1L, 2L, 4L))
  }

  test("near-duplicates (not just exact copies) are rejected cross-batch") {
    val base = Files.createTempDirectory("admission3").toString
    val cfg = CorpusAdmission.Config(s"$base/docs", s"$base/state", s"$base/ckpt")
    val truncatedA = textA.dropRight(12) // near-copy: high Jaccard, not equal
    CorpusAdmission.admitBatch(spark, cfg,
      spark.createDataFrame(Seq((1L, textA))).toDF("doc_id", "text"), 0L)
    CorpusAdmission.admitBatch(spark, cfg,
      spark.createDataFrame(Seq((2L, truncatedA), (3L, textD))).toDF("doc_id", "text"), 1L)
    val rows = CorpusAdmission.decisions(spark, cfg).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(2L).getAs[Long]("admitted") === 0L, "truncated near-copy must be rejected")
    assert(rows(2L).getAs[Long]("match_id") === 1L)
    val j = rows(2L).getAs[Double]("jaccard")
    assert(j >= 0.6 && j < 1.0, s"near-dup jaccard should be high but not exact, got $j")
    assert(rows(3L).getAs[Long]("admitted") === 1L)
  }

  test("a replayed batch overwrites its own partition (idempotent)") {
    val base = Files.createTempDirectory("admission2").toString
    val cfg = CorpusAdmission.Config(s"$base/docs", s"$base/state", s"$base/ckpt")
    val batch = spark.createDataFrame(Seq((10L, textA), (11L, textB)))
      .toDF("doc_id", "text")
    CorpusAdmission.admitBatch(spark, cfg, batch, batchId = 0L)
    CorpusAdmission.admitBatch(spark, cfg, batch, batchId = 0L) // replay
    val decisions = CorpusAdmission.decisions(spark, cfg)
    assert(decisions.count() === 2)
    assert(decisions.where(col("admitted") === 1L).count() === 2)
    assert(spark.read.parquet(s"${cfg.statePath}/shingles").count() === 2)
  }
}
