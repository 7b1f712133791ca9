package graft

import graft.analytics.Relational
import graft.cdc.Monitoring
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Round-7 property fuzz over the newest algebra (the r6 verdict's ask):
  *  - the salted hot-key join is semantics-preserving for ARBITRARY salt
  *    counts and key skews (vs an in-memory unsalted reference);
  *  - lag-SLA events landing EXACTLY on a tier edge count inside the tier
  *    (the `<=` contract both engines share);
  *  - the dedup waterfall's stages stay disjoint and its survivor
  *    arithmetic exact under random duplicate injection.
  */
class Round7PropertySpec extends AnyFunSuite {
  import TestSpark.spark

  /** Deterministic sampling (same bridge-free pattern as
    * MaterializePropertySpec). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // ── 1. salted join ≡ unsalted join ────────────────────────────────────

  private case class FactRow(userId: Long, eventId: Long, vMillis: Long)

  private val genSalted: Gen[(Int, Int, List[FactRow])] = for {
    nKeys <- Gen.choose(1, 10)
    salts <- Gen.choose(1, 32)
    n <- Gen.choose(1, 300)
    hot <- Gen.choose(0L, 1000L) // the key that soaks up most of the stream
    rows <- Gen.listOfN(n, for {
      skewed <- Gen.prob(0.7) // ~70% of events hit the hot key
      uid <- if (skewed) Gen.const(hot) else Gen.choose(0L, 1000L)
      v <- Gen.choose(-100000L, 100000L)
    } yield (uid, v))
  } yield (nKeys, salts,
    rows.zipWithIndex.map { case ((u, v), i) => FactRow(u, i.toLong, v) })

  test("property: salted join equals the unsalted join for random salt counts and key skews") {
    val schema = StructType(Seq(
      StructField("user_id", LongType, nullable = false),
      StructField("event_id", LongType, nullable = false),
      StructField("v_millis", LongType, nullable = false)))
    samples(genSalted, 6).foreach { case (nKeys, salts, rows) =>
      val ev = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(r.userId, r.eventId, r.vMillis)), 4), schema)
      val got = Relational.saltedJoinOf(ev, nKeys, salts).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // unsalted in-memory reference: plain k-join + rollup
      val expected = rows.groupBy(r => r.userId % nKeys).map { case (k, rs) =>
        k -> ((rs.length.toLong, k * 100L + 7L, rs.map(_.vMillis).sum))
      }
      assert(got === expected, s"nKeys=$nKeys salts=$salts n=${rows.length}")
    }
  }

  // ── 2. lag-SLA tier edges ─────────────────────────────────────────────

  private val slos = Seq(("1_hour", 3600000L), ("2_day", 86400000L),
    ("3_week", 604800000L), ("4_month", 2592000000L))

  private val genLags: Gen[List[Long]] = for {
    n <- Gen.choose(1, 80)
    random <- Gen.listOfN(n, Gen.choose(0L, 3000000000L))
    // force events EXACTLY on each tier edge, and one just past each
    edges <- Gen.someOf(slos.map(_._2) ++ slos.map(_._2 + 1L))
  } yield 0L :: (random ++ edges).toList // lag 0 pins the high-water mark

  test("property: lag-SLA events exactly at a tier edge land inside the tier") {
    samples(genLags, 6).foreach { lags =>
      val hwmMs = 4000000000L
      val schema = StructType(Seq(StructField("ts", TimestampType, nullable = false)))
      val changelog = spark.createDataFrame(
        spark.sparkContext.parallelize(
          lags.map(l => Row(new Timestamp(hwmMs - l))), 4), schema)
      val got = Monitoring.lagSla(changelog).collect()
        .map(r => r.getAs[String]("slo") ->
          ((r.getAs[Long]("n_events"), r.getAs[Long]("n_within")))).toMap
      val expected = slos.map { case (name, ms) =>
        // the shared contract: within ⇔ lag <= slo (closed boundary)
        name -> ((lags.length.toLong, lags.count(_ <= ms).toLong))
      }.toMap
      assert(got === expected, s"lags=${lags.take(12)}…")
      // the forced edge events are the regression: an exclusive `<` would
      // undercount every tier that got one
      slos.foreach { case (name, ms) =>
        if (lags.contains(ms))
          assert(got(name)._2 >= 1L, s"edge event fell outside $name")
      }
    }
  }

  // ── 3. dedup waterfall stage disjointness ─────────────────────────────

  private val genCorpus: Gen[List[String]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val doc = Gen.choose(8, 14).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    for {
      nBase <- Gen.choose(6, 14)
      base <- Gen.listOfN(nBase, doc)
      nDup <- Gen.choose(0, 6)
      dups <- Gen.listOfN(nDup, Gen.oneOf(base)) // exact duplicate injection
      nNear <- Gen.choose(0, 6)
      nears <- Gen.listOfN(nNear, Gen.oneOf(base).map(_ + " omega")) // near-dup injection
    } yield base ++ dups ++ nears
  }

  test("property: dedup waterfall stages stay disjoint under random dup injection") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    samples(genCorpus, 4).zipWithIndex.foreach { case (texts, si) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"wfprop$si").toString
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }, 2), schema)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = Dedup.dedupWaterfall(spark, tmp).collect()
        .map(r => r.getAs[String]("stage") ->
          ((r.getAs[Long]("n_removed"), r.getAs[Long]("survivors")))).toMap
      assert(rows.keySet === Set("1_exact", "2_near_dup", "3_containment"))
      val (n1, s1) = rows("1_exact")
      val (n2, s2) = rows("2_near_dup")
      val (n3, s3) = rows("3_containment")
      // the corpus() loader injects its own %7 exact copies and %11
      // truncations on top of ours — mirror it for the total and the
      // exact-stage reference
      val injected = texts.zipWithIndex.flatMap { case (t, i) =>
        val id = i.toLong
        val exact = if (id % 7 == 0) Seq(t) else Nil
        val near = if (id % 11 == 0)
          Seq(t.substring(0, math.max(t.length - 10, 20).min(t.length))) else Nil
        t +: (exact ++ near)
      }
      val total = injected.length.toLong
      // stage arithmetic: survivors are the running complement — any
      // double-removed doc would break one of these equalities
      assert(s1 === total - n1)
      assert(s2 === total - n1 - n2)
      assert(s3 === total - n1 - n2 - n3)
      assert(n1 >= 0 && n2 >= 0 && n3 >= 0 && s3 >= 1,
        s"negative stage or empty corpus: $rows")
      // exact stage is provable in-memory: normalized-text group sizes
      val exactExpected = injected
        .map(_.toLowerCase.replaceAll("\\s+", " ").trim)
        .groupBy(identity).values.map(_.size - 1L).sum
      assert(n1 === exactExpected, s"exact stage off (sample $si)")
    }
  }
}
