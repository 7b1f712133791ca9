package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the round-11 containment blocking: the prefix filter
  * + PPJoin positional filter claim LOSSLESSNESS (the operator output IS
  * the brute-force containment join). This spec regenerates random
  * corpora — random word soup over a small shared vocabulary (the
  * closed-vocab worst case for blocking), plus injected prefix-copies —
  * writes each as a documents.parquet dir, and diffs
  * `Dedup.containment` against an in-memory brute force over ALL pairs
  * computed with the same normalization/shingling/digesting.
  */
class ContainmentPropertySpec extends AnyFunSuite {
  import TestSpark.spark

  // mirror of the pipeline's text derivation: normalize, 5-char shingles
  // at stride 3, distinct, md5 60-bit digest (digests only collide where
  // md5 does, which both sides would share)
  private def norm(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ").trim
  private def shingleDigests(t: String): Set[Long] = {
    val n = t.length
    val hi = math.max(n - 4, 1)
    (1 to hi by 3).map(i => t.substring(i - 1, math.min(i - 1 + 5, n)))
      .toSet[String]
      .map { s =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md.substring(0, 15), 16)
      }
  }

  private def writeCorpus(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("containment-prop").toString
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'fuzz' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def bruteforce(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    // the corpus injection the pipeline applies (exact %7 copies,
    // truncated %11 near-copies), then all-pairs containment >= 0.9
    val corpus = docs ++
      docs.collect { case (id, t) if id % 7 == 0 => (id + 1000000L, t) } ++
      docs.collect { case (id, t) if id % 11 == 0 =>
        (id + 2000000L, t.substring(0, math.max(t.length - 10, math.min(20, t.length)))) }
    val sh = corpus.map { case (id, t) => id -> shingleDigests(norm(t)) }
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      c = (sa intersect sb).size
      if c.toDouble / math.min(sa.size, sb.size) >= 0.9
    } yield (a, b)).toSet
  }

  private def run(seed: Int, nDocs: Int): Unit = {
    val rng = new scala.util.Random(seed)
    val vocab = Vector.tabulate(60)(i => s"w${i}${('a' + i % 26).toChar}")
    val docs: Seq[(Long, String)] = (0 until nDocs).map { i =>
      val words = Seq.fill(8 + rng.nextInt(30))(vocab(rng.nextInt(vocab.length)))
      (i.toLong, words.mkString(" "))
    } ++ Seq(
      // adversarial: a short doc fully contained in a long one (the
      // size-skew case the positional filter must NOT lose)
      (9000L, (0 until 40).map(k => vocab(k % vocab.length)).mkString(" ")),
      (9001L, (0 until 12).map(k => vocab(k % vocab.length)).mkString(" ")))
    val dir = writeCorpus(docs)
    // the losslessness property holds on the EXACT path — these corpora
    // must price within the auto-switch budget (they do: tiny corpus, so
    // df is bounded by |docs|); if this pin ever fires, the budget moved
    assert(graft.dedup.Dedup.containmentBlockingScheme(spark, dir) == "prefix_filter")
    val got = graft.dedup.Dedup.containment(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val want = bruteforce(docs)
    assert(got == want,
      s"seed=$seed: blocking lost ${(want -- got).take(5)} / invented ${(got -- want).take(5)}")
  }

  test("prefix+positional blocking is lossless on random closed-vocab corpora") {
    Seq(11, 42, 77).foreach(run(_, 40))
  }

  test("lossless with heavy duplication pressure (many exact/near copies)") {
    // ids dense in %7/%11 so the injection creates many true pairs
    run(seed = 5, nDocs = 66)
  }

  test("escalated k10 blocking keeps every exact-copy and truncation pair") {
    // A corpus that FLOODS the k5 budget (word-shuffled replicas over a
    // tiny vocabulary — every 5-gram's df scales with the replica count)
    // so the auto-switch must leave the exact path. The k10 path's recall
    // contract is heuristic-but-directed: contiguous duplication (exact
    // copies, truncations — the containment workload) shares long runs,
    // so 10-char blocking shingles still collide. This spec pins exactly
    // that: every injected exact/truncation pair survives the escalated
    // blocking, and (the verify being exact) nothing false is invented.
    val rng = new scala.util.Random(123)
    val vocab = Vector.tabulate(30)(i => s"w${i}x${i % 7}abc")
    val base = (0 until 40).map { d =>
      d -> Seq.tabulate(40)(j => vocab((d * 13 + j * 7) % 30))
    }
    val docs: Seq[(Long, String)] = for {
      (d, words) <- base
      rep <- 0 until 25
    } yield ((d * 1000 + rep).toLong, rng.shuffle(words).mkString(" "))
    val dir = writeCorpus(docs)
    val scheme = graft.dedup.Dedup.containmentBlockingScheme(spark, dir)
    assert(scheme != "prefix_filter", s"corpus must escalate (chose $scheme)")
    val got = graft.dedup.Dedup.containment(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val want = bruteforce(docs)
    // exact verify admits no false positives regardless of blocking
    assert((got -- want).isEmpty, s"invented pairs: ${(got -- want).take(5)}")
    // recall on the contiguous-duplication pairs: every pair involving an
    // injected copy (%7 exact at +1M, %11 truncation at +2M) must survive
    val contiguous = want.filter { case (a, b) => b >= 1000000L }
    assert(contiguous.nonEmpty, "injection must create true pairs")
    val lost = contiguous -- got
    assert(lost.isEmpty,
      s"escalated blocking lost contiguous-dup pairs: ${lost.take(5)}")
  }
}
