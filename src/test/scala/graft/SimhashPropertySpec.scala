package graft

import graft.dedup.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the SimHash blocking guarantee: over ARBITRARY
  * fingerprints (not just the test corpus), the 28 pair-block band
  * tables must surface every pair within Hamming distance 6 — the
  * pigeonhole argument (≤ 6 dirty blocks of 8 ⇒ ≥ 2 clean ⇒ their
  * pair-table collides) holds for any bit pattern, so the candidate
  * join may never lose a qualifying pair, including adversarial ones
  * where the differing bits are spread to maximize dirty blocks. */
class SimhashPropertySpec extends AnyFunSuite {
  import TestSpark.spark

  private val fpSchema = StructType(
    StructField("doc_id", LongType, nullable = false) +:
      (0 until 8).map(b => StructField(s"fp$b", LongType, nullable = false)))

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  // base fingerprints plus planted near-neighbors: flip exactly k bits
  // (k ≤ 6 qualifies, k = 7 must need luck) spread across DISTINCT
  // blocks when possible — the adversarial spread for block banding
  private val genCase: Gen[(List[Array[Long]], List[(Int, Int)])] = for {
    n <- Gen.choose(3, 40)
    bases <- Gen.listOfN(n, Gen.listOfN(8, Gen.choose(0L, 65535L)).map(_.toArray))
    nPlant <- Gen.choose(1, 10)
    plants <- Gen.listOfN(nPlant, for {
      src <- Gen.choose(0, n - 1)
      k <- Gen.choose(0, 7)
      // bit positions 0..127, distinct → touches min(k, distinct blocks)
      bits <- Gen.pick(k, 0 until 128)
    } yield (src, bits.toList))
  } yield {
    val planted = plants.map { case (src, bits) =>
      val fp = bases(src).clone()
      bits.foreach(p => fp(p / 16) = fp(p / 16) ^ (1L << (p % 16)))
      fp
    }
    (bases ++ planted, plants.zipWithIndex.map { case ((src, _), i) => (src, n + i) })
  }

  test("banded candidates contain every pair at hamming <= 6, for arbitrary fingerprints") {
    val seed0 = Seed(20260813L)
    var seed = seed0
    for (_ <- 1 to 12) {
      val (fps, _) = genCase(Gen.Parameters.default, seed)
        .getOrElse(sys.error("gen failed"))
      seed = seed.next
      val rows = fps.zipWithIndex.map { case (fp, i) =>
        Row.fromSeq(i.toLong +: fp.toSeq)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), fpSchema)
      val got = Dedup.simhashCandidates(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val arr = fps.toArray
      val mustFind = (for {
        i <- arr.indices; j <- (i + 1) until arr.length
        if hamming(arr(i), arr(j)) <= 6
      } yield (i.toLong, j.toLong)).toSet
      val missed = mustFind -- got
      assert(missed.isEmpty,
        s"blocking lost ${missed.size} qualifying pairs (e.g. ${missed.take(3)}) — pigeonhole violated")
    }
  }
}
