package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins: the pq_rerank ProfileAB variant must be output-identical
  * to the registered form (both end in the same exact-L2 top-k — only the
  * plan shape differs), so the A/B adjudicates COST, never correctness. */
class Round17Spec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("pqRerankFused is row-identical to the registered pqRerank") {
    val a = graft.similarity.Ann.pqRerank(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("l2sq")))
    val b = graft.similarity.Ann.pqRerankFused(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("l2sq")))
    assert(a.toSeq === b.toSeq,
      "the fused-carry variant must produce the identical exact rerank")
  }

  test("the registered pqRerank never carries raw vectors through the ADC exchanges") {
    // the A/B's scale argument, pinned: the registered plan's shuffles
    // exchange codes only — raw vectors are fetched solely for the
    // bounded shortlist. Formatted mode prints each Exchange node's
    // Input attribute list; `embedding` appearing there means the
    // 256-byte payload rode the shuffle.
    val inputRe = "\\(\\d+\\) Exchange\\nInput \\[\\d+\\]: \\[([^\\]]*)\\]".r
    def exchangeInputs(df: org.apache.spark.sql.DataFrame): List[String] =
      inputRe.findAllMatchIn(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)).map(_.group(1)).toList
    // the carried vector crosses the exchange as the partial-first
    // aggregation buffer (`first#NN`), not under its column name
    def carriesVector(in: String): Boolean =
      in.contains("embedding") || "first#\\d+".r.findFirstIn(in).isDefined
    val fused = exchangeInputs(graft.similarity.Ann.pqRerankFused(spark, dir))
    assert(fused.exists(carriesVector),
      "detector sanity: the fused-carry variant by construction ships " +
        "embeddings through an exchange")
    val registered = exchangeInputs(graft.similarity.Ann.pqRerank(spark, dir))
    assert(registered.nonEmpty, "expected the ADC aggregation exchanges")
    registered.foreach { in =>
      assert(!carriesVector(in), s"raw vectors must not ride an ADC exchange: $in")
    }
  }
}
