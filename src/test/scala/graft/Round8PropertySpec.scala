package graft

import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 property fuzz over the new governance/offset surfaces:
  *  - PII redaction is IDEMPOTENT for arbitrary text with injected
  *    email/digit spans (the placeholders contain neither an '@' nor a
  *    4-digit run, so a second pass is a fixed point — the property a
  *    governance pipeline needs to re-run the mask safely);
  *  - redaction is COMPLETE: no email-shaped span or 4+-digit run
  *    survives in the full redacted text;
  *  - streaming consumer-lag conserves messages for random batch
  *    streams: per partition, the lags across batches sum to the final
  *    end offset, and committed always equals the previous end.
  */
class Round8PropertySpec extends AnyFunSuite {
  import TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] =
    Gen.oneOf(Gen.alphaLowerStr.map(_.take(8)),
      Gen.const("a@b.example"),
      Gen.const("user.name+tag@mail-host.example"),
      Gen.choose(1000L, 999999999L).map(_.toString),
      Gen.choose(0, 999).map(_.toString),
      Gen.const("x9y"))

  private val doc: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("property: pii redaction is idempotent and complete on random PII-laden text") {
    import spark.implicits._
    val docs = samples(doc, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+".r
    val digits = "[0-9]{4,}".r
    val once = docs
      .withColumn("t1", regexp_replace(col("text"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"))
      .withColumn("redacted", regexp_replace(col("t1"), "[0-9]{4,}", "<NUM>"))
      .select(col("doc_id"), col("redacted")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("redacted")).toMap

    // completeness: nothing PII-shaped survives the full text
    once.values.foreach { t =>
      assert(email.findFirstIn(t).isEmpty, s"email survived in: $t")
      assert(digits.findFirstIn(t).isEmpty, s"digit run survived in: $t")
    }

    // idempotency: the operator's own pipeline over already-redacted text
    // is a fixed point (counts zero, bytes unchanged)
    val again = TextFunctions.piiRedactOf(
      once.toSeq.toDF("doc_id", "text")).collect()
    again.foreach { r =>
      assert(r.getAs[Long]("n_email_hits") === 0L)
      assert(r.getAs[Long]("n_digit_hits") === 0L)
      assert(r.getAs[Long]("redacted_chars") === r.getAs[Long]("orig_chars"))
    }
  }

  private val stream: Gen[List[List[(String, Long)]]] = for {
    nBatches <- Gen.choose(1, 5)
    batches <- Gen.listOfN(nBatches, for {
      n <- Gen.choose(0, 30)
      rows <- Gen.listOfN(n, for {
        t <- Gen.oneOf("orders", "customer", "part")
        uid <- Gen.choose(0L, 40L)
      } yield (t, uid))
    } yield rows)
  } yield batches

  test("property: streaming consumer lag conserves messages across random batch streams") {
    import graft.streaming.ConsumerLag
    import spark.implicits._
    samples(stream, 5).zipWithIndex.foreach { case (batches, si) =>
      val base = java.nio.file.Files.createTempDirectory(s"conslagp$si").toString
      val c = ConsumerLag.Config(s"$base/wire", s"$base/state", s"$base/ckpt")
      batches.zipWithIndex.foreach { case (rows, bi) =>
        val df = rows.toDF("table_name", "uid")
          .select(
            concat(lit("graft.public."), col("table_name")).as("topic"),
            col("table_name"),
            struct(col("uid").as("user_id")).as("after"),
            lit(null).cast("struct<user_id:bigint>").as("before"))
        ConsumerLag.monitorBatch(spark, c, df, bi.toLong)
      }
      if (batches.exists(_.nonEmpty)) {
        val rep = ConsumerLag.lag(spark, c).collect()
        val byPart = rep.groupBy(r => (r.getAs[String]("topic"), r.getAs[Long]("partition")))
        byPart.foreach { case ((topic, p), rows) =>
          val ordered = rows.sortBy(_.getAs[Long]("batch_id"))
          // committed is exactly the previous end
          ordered.sliding(2).foreach {
            case Array(a, b) =>
              assert(b.getAs[Long]("committed_offset") === a.getAs[Long]("end_offset"))
            case _ =>
          }
          // lags sum to the final end offset
          assert(ordered.map(_.getAs[Long]("lag")).sum +
            ordered.head.getAs[Long]("committed_offset") ===
            ordered.last.getAs[Long]("end_offset"))
          // the true per-partition arrival count matches the final end
          val expected = batches.flatten.count { case (t, uid) =>
            s"graft.public.$t" == topic && uid % 4 == p }
          assert(ordered.last.getAs[Long]("end_offset") === expected.toLong)
        }
      }
    }
  }
}
