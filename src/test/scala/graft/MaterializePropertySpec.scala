package graft

import graft.cdc.Materialize
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Property tests: the materializer family agrees with a naive in-memory
  * reference implementation on arbitrary changelogs — keys collide, ops
  * interleave, timestamps duplicate (seq breaks ties), deletes interleave
  * with re-creates.
  */
class MaterializePropertySpec extends AnyFunSuite {
  import TestSpark.spark

  private val changelogSchema = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("pk", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private case class Ev(op: String, pk: Long, ts: Long, seq: Long, value: Double)

  private val genChangelog: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 120)
    evs <- Gen.listOfN(n, for {
      op <- Gen.oneOf("c", "u", "d")
      pk <- Gen.choose(1L, 12L)
      ts <- Gen.choose(0L, 50L) // coarse: forces ts collisions
      value <- Gen.choose(0, 99999).map(_ / 100.0)
    } yield Ev(op, pk, ts, 0L, value))
  } yield evs.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) }

  private def toDf(evs: List[Ev]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(evs.map(e =>
        Row(e.op, e.pk, new Timestamp(e.ts * 1000L), e.seq, e.value)), 4),
      changelogSchema)

  /** Deterministic sampling of the generator (scalatestplus bridge is not
    * on the classpath; fixed seeds keep runs reproducible). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def naiveLatest(evs: List[Ev]): Map[Long, BigDecimal] =
    evs.groupBy(_.pk).flatMap { case (pk, es) =>
      val last = es.maxBy(e => (e.ts, e.seq))
      if (last.op == "d") None
      else Some(pk -> BigDecimal(last.value).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }

  test("latestSnapshot matches the naive reference on arbitrary changelogs") {
    samples(genChangelog, 25).foreach { evs =>
      val got = Materialize.latestSnapshot(toDf(evs)).collect()
        .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toMap
      assert(got === naiveLatest(evs))
    }
  }

  test("salted == plain on arbitrary changelogs") {
    samples(genChangelog, 10).foreach { evs =>
      val df = toDf(evs)
      val plain = Materialize.latestSnapshot(df).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(3))).toSet
      val salted = Materialize.latestSnapshotSalted(df, 4).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(3))).toSet
      assert(salted === plain)
    }
  }

  test("handoff == one-shot at arbitrary cutovers") {
    samples(Gen.zip(genChangelog, Gen.choose(0L, 120L)), 10).foreach { case (evs, cut) =>
      val df = toDf(evs)
      val oneShot = Materialize.latestSnapshot(df).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val handoff = Materialize.snapshotHandoff(df, cut).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(handoff === oneShot)
    }
  }

  test("time travel == naive latest over the pre-cutoff prefix") {
    // day-scale timestamps so the (max ts − 1 day) cutoff bites mid-stream
    val genWide = genChangelog.map(_.map(e => e.copy(ts = e.ts * 4000L)))
    samples(genWide, 10).foreach { evs =>
      val cutoff = evs.map(_.ts).max - 86400L
      val expected = naiveLatest(evs.filter(_.ts <= cutoff))
      val got = Materialize.timeTravel(toDf(evs)).collect()
        .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toMap
      assert(got === expected)
    }
  }

  test("updateDiff matches a naive lag-based classification") {
    samples(genChangelog, 10).foreach { evs =>
      val naive = evs.groupBy(_.pk).toSeq.flatMap { case (pk, es) =>
        val sorted = es.sortBy(e => (e.ts, e.seq))
        sorted.zip(sorted.drop(1)).collect {
          case (prev, cur) if cur.op == "u" =>
            val d = (BigDecimal(cur.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) -
              BigDecimal(prev.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)).abs
            (pk % 10, d)
        }
      }
      val expected = naive.groupBy(_._1).map { case (b, ds) =>
        b -> ((ds.size.toLong, ds.count(_._2 == 0).toLong, ds.map(_._2).sum))
      }
      val got = graft.cdc.Monitoring.updateDiff(toDf(evs)).collect()
        .map(r => r.getAs[Long]("pk_bucket") ->
          ((r.getAs[Long]("n_updates"), r.getAs[Long]("n_noop"),
            BigDecimal(r.getAs[Double]("sum_abs_delta")).setScale(2, BigDecimal.RoundingMode.HALF_UP))))
        .toMap
      assert(got === expected)
    }
  }

  test("scd2 open versions are exactly the live keys") {
    samples(genChangelog, 10).foreach { evs =>
      val open = Materialize.scd2(toDf(evs)).collect()
        .filter(_.getBoolean(4)).map(_.getLong(0)).toSet
      assert(open === naiveLatest(evs).keySet)
    }
  }
}
