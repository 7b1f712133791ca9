package graft

import graft.analytics.Relational
import graft.cdc.Monitoring
import graft.dedup.Dedup
import graft.similarity.Ann
import graft.multimodal.{Binary, Video}
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-10 closing operator batch (streak
  * histogram, term burstiness, nlist elbow).
  */
class Round10cSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("streaks: histogram covers every user once, shares sum to 1, lengths cross-check") {
    val rows = Relational.streaks(spark, dir).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.load(spark, dir, "events")
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers,
      "each user lands in exactly one longest-streak bucket")
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    rows.foreach(r => assert(r.getAs[Long]("streak_days") >= 1L))
    // brute-force the longest streak for one user on the driver
    val uid = Tables.load(spark, dir, "events")
      .select("user_id").limit(1).collect().head.getLong(0)
    val days = Tables.load(spark, dir, "events")
      .where(col("user_id") === uid)
      .select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0).toLocalDate).sorted
    val longest = days.foldLeft((0L, 0L, Option.empty[java.time.LocalDate])) {
      case ((best, run, prev), d) =>
        val r = if (prev.exists(p => p.plusDays(1) == d)) run + 1 else 1L
        (math.max(best, r), r, Some(d))
    }._1
    val viaOp = Relational.streaks(spark, dir) // histogram loses the user; recompute the user's bucket
    val perUser = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("day"))))
      .groupBy("user_id", "grp").count()
      .groupBy("user_id").agg(max("count").as("longest"))
      .where(col("user_id") === uid).collect().head.getAs[Long]("longest")
    assert(perUser == longest, s"gaps-and-islands longest run for user $uid")
    assert(viaOp.collect().nonEmpty)
  }

  test("burstiness: df floor holds, ratio reproduces, never below 1, ordered desc") {
    val rows = TextFunctions.burstiness(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") >= 5L)
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"), "cf counts every occurrence")
      val b = r.getAs[Double]("burstiness")
      assert(b >= 1.0 - 1e-12)
      assert(math.abs(b - r.getAs[Long]("cf").toDouble / r.getAs[Long]("df")) < 1e-12)
    }
    val bs = rows.map(_.getAs[Double]("burstiness"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a >= b }, "descending top-k")
  }

  test("source divergence: TV bounded, full pair coverage, one pair cross-checked brute-force") {
    val rows = TextFunctions.sourceDivergence(spark, dir).collect()
    val nSources = Tables.load(spark, dir, "documents")
      .select(countDistinct(col("source"))).collect().head.getLong(0)
    assert(rows.length == (nSources * (nSources - 1) / 2).toInt,
      "every unordered source pair exactly once")
    rows.foreach { r =>
      val tv = r.getAs[Double]("tv_distance")
      assert(tv >= -1e-9 && tv <= 1.0 + 1e-9, s"TV in [0,1]: $tv")
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
    // brute-force one pair: full Σ|p−q|/2 over the UNION vocabulary
    // (the op computes it via the common-terms identity)
    val (sa, sb) = (rows.head.getAs[String]("source_a"), rows.head.getAs[String]("source_b"))
    val toks = Tables.load(spark, dir, "documents")
      .where(col("source").isin(sa, sb))
      .select(col("source"), explode(split(TextFunctions.normText(col("text")), " ")).as("term"))
      .where(length(col("term")) >= 1)
      .groupBy("source", "term").count()
      .collect().groupBy(_.getAs[String]("source"))
    def dist(s: String): Map[String, Double] = {
      val m = toks(s).map(r => r.getAs[String]("term") -> r.getAs[Long]("count").toDouble).toMap
      val n = m.values.sum
      m.map { case (t, c) => t -> c / n }
    }
    val (pa, pb) = (dist(sa), dist(sb))
    val brute = 0.5 * (pa.keySet ++ pb.keySet).toSeq
      .map(t => math.abs(pa.getOrElse(t, 0.0) - pb.getOrElse(t, 0.0))).sum
    assert(math.abs(rows.head.getAs[Double]("tv_distance") - brute) < 1e-6,
      s"identity-based TV must match the brute-force union-vocabulary sum for ($sa, $sb)")
  }

  test("pq m sweep: nested subspace grid makes distortion non-increasing in m") {
    val rows = Ann.pqMSweep(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("m")).toSeq == Seq(2L, 4L, 8L, 16L))
    val ds = rows.map(_.getAs[Double]("total_distortion"))
    // each m divides the next, so the 2m-chooser can always reproduce the
    // m-optimum per half — distortion cannot rise with m
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"distortion non-increasing in m: ${ds.toSeq}")
    val nVecs = Tables.load(spark, dir, "embeddings")
      .where(col("vec_id") =!= 0).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_subvectors") == nVecs * r.getAs[Long]("m"))
      assert(r.getAs[Long]("code_bits") == 4 * r.getAs[Long]("m"))
      assert(r.getAs[Double]("total_distortion") >= 0.0)
    }
    val cx = rows.map(_.getAs[Double]("compression_x"))
    assert(cx.zip(cx.tail).forall { case (a, b) => a > b }, "compression falls as m grows")
  }

  test("session paths: page bounded and ordered, head cap holds, totals cross-check") {
    val rows = Relational.sessionPaths(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val ns = rows.map(_.getAs[Long]("n_sessions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "descending top-k")
    val types = Set("signup", "error", "click", "view", "purchase")
    rows.foreach { r =>
      val segs = r.getAs[String]("path").split(">")
      assert(segs.length >= 1 && segs.length <= 5, "head cap is 5 events")
      segs.foreach(s => assert(types(s), s"unknown event type $s"))
    }
    // the top path's count can never exceed the total session count
    val nSessions = Relational.sessionize(spark, dir).count()
    assert(ns.head <= nSessions)
    assert(ns.sum <= nSessions)
  }

  test("winnowing: histogram mass equals occurrences, injected copies create shared prints") {
    val rows = Dedup.winnowing(spark, dir).collect()
    assert(rows.nonEmpty)
    val ks = rows.map(_.getAs[Long]("k"))
    assert(ks.forall(_ >= 1L) && ks.distinct.length == ks.length)
    // the augmented corpus injects exact copies (doc_id % 7 -> +1M), whose
    // winnow sets are identical by construction - multiplicity >= 2 MUST exist
    assert(ks.exists(_ >= 2L), "exact injected copies must collide")
    // mass check: sum(k * n_fingerprints) == total (doc, fp) occurrences
    val mass = rows.map(r => r.getAs[Long]("k") * r.getAs[Long]("n_fingerprints")).sum
    val occurrences = Dedup.normCorpus(spark, dir)
      .select(col("doc_id"),
        transform(sequence(lit(1), greatest(length(col("t")) - 15, lit(1))),
          i => conv(substring(md5(col("t").substr(i, lit(16))), 1, 15), 16, 10)
            .cast("long")).as("g"))
      .select(explode(array_distinct(
        transform(sequence(lit(1), greatest(size(col("g")) - 7, lit(1))),
          p => array_min(slice(col("g"), p, lit(8)))))).as("fp"))
      .count()
    assert(mass == occurrences, s"histogram mass $mass vs occurrence recount $occurrences")
    // density: winnowing samples ~2/(w+1) of gram positions; with dedupe it
    // can only drop. Check the corpus-wide mean sits in a sane band.
    val nGramPositions = Dedup.normCorpus(spark, dir)
      .select(greatest(length(col("t")) - 15, lit(1)).as("g")).agg(sum("g")).collect().head.getLong(0)
    val density = mass.toDouble / nGramPositions
    assert(density > 0.05 && density < 2.0 / 9.0 * 1.5,
      s"density $density should sit near the 2/(w+1)=0.222 winnowing expectation")
  }

  test("payload profile: null-omission semantics give op-dependent key sets") {
    val rows = Monitoring.payloadProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    val byTopic = rows.groupBy(_.getAs[String]("topic"))
    byTopic.foreach { case (topic, trs) =>
      val root = trs.filter(_.getAs[String]("level") == "root")
        .map(r => r.getAs[String]("key") -> r.getAs[Double]("presence")).toMap
      // the constant envelope fields are on every message
      Seq("source", "op", "ts_ms").foreach(k =>
        assert(math.abs(root(k) - 1.0) < 1e-12, s"$topic root.$k"))
      // deletes carry before and never after; the error topic is all-delete
      if (topic.endsWith("error")) {
        assert(math.abs(root("before") - 1.0) < 1e-12 && !root.contains("after"))
        assert(trs.forall(_.getAs[String]("level") != "after"))
      } else {
        assert(math.abs(root("after") - 1.0) < 1e-12 && !root.contains("before"))
      }
      val payloadKeys = trs.filter(r => r.getAs[String]("level") != "root")
        .map(_.getAs[String]("key")).toSet
      assert(payloadKeys.subsetOf(Set("user_id", "event_type", "value")))
    }
  }

  test("benford audit: full digit spine, shares sum to 1, totals cross-check") {
    val rows = Relational.benfordAudit(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("expected")).sum - 1.0) < 1e-3,
      "the hard-coded Benford constants must themselves sum to ~1")
    val nEligible = Tables.load(spark, dir, "orders").where(col("o_totalprice") >= 1.0).count()
    rows.foreach(r => assert(r.getAs[Long]("n_total") == nEligible))
    assert(rows.map(_.getAs[Long]("n_orders")).sum == nEligible)
    rows.foreach { r =>
      val dev = r.getAs[Double]("deviation")
      assert(math.abs(dev - math.abs(r.getAs[Double]("share") - r.getAs[Double]("expected"))) < 1e-12)
    }
  }

  test("runs test: counts partition non-median days, formulas reproduce, brute-force runs") {
    val r = Relational.runsTest(spark, dir).collect().head
    val (n1, n2, runs) = (r.getAs[Long]("n_above"), r.getAs[Long]("n_below"), r.getAs[Long]("n_runs"))
    assert(runs >= 1L && runs <= n1 + n2)
    assert(math.abs(r.getAs[Double]("expected_runs")
      - (2.0 * n1 * n2 / (n1 + n2) + 1.0)) < 1e-12)
    // brute-force the run count on the driver from the daily series
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day")).count()
      .orderBy("day").collect().map(r2 => r2.getDate(0) -> r2.getLong(1))
    val sortedCounts = daily.map(_._2).sorted
    val median = sortedCounts(math.ceil(daily.length * 0.5).toInt - 1)
    val signs = daily.collect { case (_, n) if n != median => n > median }
    assert(n1 == signs.count(identity) && n2 == signs.count(!_))
    val bruteRuns = if (signs.isEmpty) 0L
      else 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    assert(runs == bruteRuns, s"runs $runs vs brute $bruteRuns")
  }

  test("label purity: neighbor counts bounded by k, matches bounded by neighbors") {
    val rows = Ann.labelPurity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ev, nb, m) = (r.getAs[Long]("n_evaluated"), r.getAs[Long]("n_neighbors"),
        r.getAs[Long]("n_matched"))
      assert(nb <= 3 * ev, "at most k=3 neighbors per evaluated vector")
      assert(nb >= ev, "every evaluated vector has >= 1 ranked neighbor")
      assert(m >= 0 && m <= nb)
      val p = r.getAs[Double]("purity")
      assert(p >= 0.0 && p <= 1.0)
      assert(math.abs(p - m.toDouble / nb) < 1e-12)
    }
  }

  test("new vs repeat: splits partition orders, first days are new, shares reproduce") {
    val rows = Relational.newVsRepeat(spark, dir).collect()
    assert(rows.nonEmpty)
    var totNew = 0L
    rows.foreach { r =>
      val (n, nw, rp, cust) = (r.getAs[Long]("n_orders"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_repeat"), r.getAs[Long]("n_customers"))
      assert(nw + rp == n, "new + repeat partition the day's orders")
      assert(cust <= n && cust >= 1)
      assert(math.abs(r.getAs[Double]("repeat_share") - rp.toDouble / n) < 1e-12)
      totNew += nw
    }
    // n_new counts first-DAY orders: a customer with two orders on their
    // first day contributes two. Brute-force that from the raw table.
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), date_trunc("day", col("o_orderdate")).as("day"))
    val bruteNew = o.groupBy("o_custkey").agg(min(col("day")).as("fd"))
      .join(o, Seq("o_custkey")).where(col("day") === col("fd")).count()
    assert(totNew == bruteNew, s"first-day orders $totNew vs brute $bruteNew")
    assert(totNew >= o.select("o_custkey").distinct().count())
    assert(rows.map(_.getAs[Long]("n_orders")).sum
      == Tables.load(spark, dir, "orders").count())
  }

  test("hubness: edge totals match the graph, hub/antihub partitions bounded") {
    val r = Ann.hubness(spark, dir).collect().head
    val (nv, ne) = (r.getAs[Long]("n_vectors"), r.getAs[Long]("n_edges"))
    assert(nv == Tables.load(spark, dir, "embeddings").count())
    assert(ne <= 3L * nv, "at most k=3 out-edges per vector")
    assert(r.getAs[Long]("max_indeg") <= nv - 1)
    assert(r.getAs[Long]("n_hubs") + r.getAs[Long]("n_antihubs") <= nv)
    assert(math.abs(r.getAs[Double]("mean_indeg") - ne.toDouble / nv) < 1e-12)
    assert(r.getAs[Double]("var_indeg") >= 0.0)
    val hs = r.getAs[Double]("hub_share")
    assert(hs >= 0.0 && hs <= 1.0)
    assert(r.getAs[Double]("antihub_share") >= 0.0)
    assert(r.getAs[Double]("hub_edge_share") >= hs * 6.0 * nv / (3.0 * nv) - 1e-12
      || r.getAs[Long]("n_hubs") == 0L,
      "hubs hold >= 2k edges each, so their edge share >= 2 * hub count / n")
  }

  test("audio clipping: run structure matches a driver-side synth replay") {
    val rows = graft.multimodal.Binary.audioClipping(spark, dir).collect()
    assert(rows.length == Tables.load(spark, dir, "documents").count())
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = (id % 480 + 160).toInt
      // replay the synth formula on the driver
      var nClipped = 0L; var nRuns = 0L; var longest = 0L; var run = 0L; var maxAbs = 0L
      (0 until n).foreach { i =>
        val a = math.abs((id * 31 + i * 17) % 65536 - 32768)
        if (a > maxAbs) maxAbs = a
        if (a >= 32256) {
          nClipped += 1; run += 1
          if (run == 1L) nRuns += 1
          if (run > longest) longest = run
        } else run = 0
      }
      assert(r.getAs[Long]("n_samples") == n.toLong)
      assert(r.getAs[Long]("n_clipped") == nClipped)
      assert(r.getAs[Long]("n_clip_runs") == nRuns)
      assert(r.getAs[Long]("longest_clip_run") == longest)
      assert(r.getAs[Long]("max_abs") == maxAbs)
      assert(math.abs(r.getAs[Double]("clipped_share") - nClipped.toDouble / n) < 1e-12)
    }
  }

  test("redundancy curve: distinct bounded by total, gram totals shrink with n") {
    val rows = TextFunctions.redundancyCurve(spark, dir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L, 4L, 8L))
      rs.foreach { r =>
        val (tot, dist) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct"))
        assert(dist >= 1L && dist <= tot)
        assert(math.abs(r.getAs[Double]("ttr") - dist.toDouble / tot) < 1e-12)
        assert(math.abs(r.getAs[Double]("ttr") + r.getAs[Double]("redundancy") - 1.0) < 1e-12)
      }
      val byN = rs.map(r => r.getAs[Long]("n") -> r.getAs[Long]("n_grams")).toMap
      assert(byN(1L) > byN(2L) && byN(2L) > byN(4L) && byN(4L) > byN(8L),
        "total gram count strictly shrinks as gram size grows")
    }
  }

  test("priority shipping: line totals match the join, delay bounds ordered, shares reproduce") {
    val rows = Relational.priorityShipping(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_lines")).sum
      == Tables.load(spark, dir, "lineitem").count(),
      "every lineitem lands in exactly one priority bucket")
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("min_delay_days"), r.getAs[Long]("max_delay_days"))
      val avg = r.getAs[Double]("avg_delay_days")
      assert(mn <= avg && avg <= mx)
      val (late, n) = (r.getAs[Long]("n_late"), r.getAs[Long]("n_lines"))
      assert(late <= n)
      assert(math.abs(r.getAs[Double]("late_share") - late.toDouble / n) < 1e-12)
    }
  }

  test("table staleness: silence nonneg, hwm holder is ok, score reproduces from the parts") {
    val rows = Monitoring.tableStaleness(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("silence_ms") == 0L), "some table holds the hwm")
    rows.foreach { r =>
      val sil = r.getAs[Long]("silence_ms")
      assert(sil >= 0L)
      val st = r.getAs[String]("status")
      if (r.getAs[Long]("n_events") < 2L) assert(st == "unknown")
      else {
        assert(st == (if (sil > r.getAs[Long]("max_gap_ms")) "overdue" else "ok"))
        val mean = r.getAs[Double]("mean_gap_ms")
        assert(mean > 0.0)
        assert(math.abs(r.getAs[Double]("staleness_score") - sil.toDouble / mean) < 1e-9)
      }
    }
  }

  test("rolling retention: active counts match distinct user-days, censored tail at zero") {
    val rows = Relational.rollingRetention(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalActive = Tables.load(spark, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_active")).sum == totalActive)
    rows.foreach { r =>
      val (a, ret) = (r.getAs[Long]("n_active"), r.getAs[Long]("n_returned"))
      assert(ret <= a)
      assert(math.abs(r.getAs[Double]("retention_7d") - ret.toDouble / a) < 1e-12)
    }
    // the final day is fully right-censored: nobody can return after the stream ends
    assert(rows.last.getAs[Long]("n_returned") == 0L)
  }

  test("revenue concentration: shares sum to 1, cumulatives monotone from the top") {
    val rows = Relational.revenueConcentration(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("cust_share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("revenue_share")).sum - 1.0) < 1e-9)
    // rows come ordered digits DESC; cumulative shares are monotone nondecreasing
    val cumC = rows.map(_.getAs[Double]("cum_cust_share_from_top"))
    val cumR = rows.map(_.getAs[Double]("cum_revenue_share_from_top"))
    assert(cumC.zip(cumC.tail).forall { case (a, b) => b >= a - 1e-12 })
    assert(cumR.zip(cumR.tail).forall { case (a, b) => b >= a - 1e-12 })
    assert(math.abs(cumC.last - 1.0) < 1e-9 && math.abs(cumR.last - 1.0) < 1e-9)
    // concentration: the top bucket's revenue share must exceed its customer share
    assert(rows.head.getAs[Double]("revenue_share")
      >= rows.head.getAs[Double]("cust_share") - 1e-12)
  }

  test("q6: one row, the sum reproduces from an independent filter path") {
    val r = Relational.q6ForecastRevenue(spark, dir).collect().head
    val n = r.getAs[Long]("n_lines")
    val brute = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate").between(lit("1996-01-01"), lit("1996-12-31 23:59:59"))
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .count()
    assert(n == brute)
    assert(n > 0, "the 1996 window must select something at sf0.01")
    assert(r.getAs[Double]("forecast_revenue") > 0.0)
  }

  test("discount mix: levels partition the table, shares within gross") {
    val rows = Relational.discountMix(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 11)
    assert(rows.map(_.getAs[Long]("n_lines")).sum
      == Tables.load(spark, dir, "lineitem").count())
    rows.foreach { r =>
      val pct = r.getAs[Long]("discount_pct")
      assert(pct >= 0L && pct <= 10L)
      val share = r.getAs[Double]("discount_share")
      assert(share >= 0.0 && share <= 0.11, "discount dollars bounded by the level")
      assert(math.abs(share - pct / 100.0) < 0.006,
        "share of gross tracks the level itself")
      assert(r.getAs[Double]("avg_qty") >= 1.0 && r.getAs[Double]("avg_qty") <= 50.0)
    }
  }

  test("basket hist: orders and lines both fully accounted, shares sum to 1") {
    val rows = Relational.basketSizeHist(spark, dir).collect()
    assert(rows.nonEmpty)
    val li = Tables.load(spark, dir, "lineitem")
    assert(rows.map(_.getAs[Long]("n_orders")).sum
      == li.select("l_orderkey").distinct().count())
    assert(rows.map(_.getAs[Long]("n_lines")).sum == li.count())
    assert(math.abs(rows.map(_.getAs[Double]("order_share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("line_share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_lines") == r.getAs[Long]("lines") * r.getAs[Long]("n_orders"))
    }
  }

  test("load calendar: bounded grid, shares sum to 1, exactly one peak run per dow") {
    val rows = Monitoring.loadCalendar(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 168)
    rows.foreach { r =>
      val (d, h) = (r.getAs[Long]("isodow"), r.getAs[Long]("hour"))
      assert(d >= 1L && d <= 7L && h >= 0L && h <= 23L)
    }
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(rows.map(_.getAs[Long]("n_events")).sum
      == Tables.load(spark, dir, "events").count())
    rows.groupBy(_.getAs[Long]("isodow")).foreach { case (_, rs) =>
      val peaks = rs.filter(_.getAs[Boolean]("is_peak_hour"))
      assert(peaks.nonEmpty, "every weekday has a peak cell")
      val mx = rs.map(_.getAs[Long]("n_events")).max
      assert(peaks.forall(_.getAs[Long]("n_events") == mx))
    }
  }

  test("product growth: page sorted by absolute swing, halves reconcile, growth reproduces") {
    val rows = Relational.productGrowth(spark, dir).collect()
    assert(rows.length == 20)
    val deltas = rows.map(r => math.abs(r.getAs[Double]("delta")))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b - 1e-9 },
      "page ordered by absolute delta descending")
    rows.foreach { r =>
      val (e, l, d) = (r.getAs[Double]("early_revenue"), r.getAs[Double]("late_revenue"),
        r.getAs[Double]("delta"))
      assert(math.abs(d - (l - e)) < 1e-6)
      if (e > 0) assert(math.abs(r.getAs[Double]("growth") - (l - e) / e) < 1e-9)
      else assert(r.isNullAt(r.fieldIndex("growth")))
    }
  }

  test("length cut curve: monotone in the cut, doc and token shares consistent") {
    val rows = TextFunctions.lengthCutCurve(spark, dir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("min_len")).sorted.toSeq
        == Seq(16L, 32L, 64L, 128L, 256L))
      // n_docs and n_tokens identical across cuts (same base corpus)
      assert(rs.map(_.getAs[Long]("n_docs")).distinct.length == 1)
      assert(rs.map(_.getAs[Long]("n_tokens")).distinct.length == 1)
      val sorted = rs.sortBy(_.getAs[Long]("min_len"))
      val dr = sorted.map(_.getAs[Long]("docs_removed"))
      val tr = sorted.map(_.getAs[Long]("tokens_removed"))
      assert(dr.zip(dr.tail).forall { case (a, b) => b >= a },
        "a higher cut removes at least as many docs")
      assert(tr.zip(tr.tail).forall { case (a, b) => b >= a })
      sorted.foreach { r =>
        assert(r.getAs[Long]("docs_removed") <= r.getAs[Long]("n_docs"))
        assert(r.getAs[Long]("tokens_removed") <= r.getAs[Long]("n_tokens"))
        // removed docs are short: tokens_removed < min_len * docs_removed
        assert(r.getAs[Long]("tokens_removed")
          <= r.getAs[Long]("min_len") * r.getAs[Long]("docs_removed"))
      }
    }
  }

  test("value migration: every customer in one cell, directions consistent, shares sum to 1") {
    val rows = Relational.valueMigration(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_customers")).sum
      == Tables.load(spark, dir, "orders").select("o_custkey").distinct().count())
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val (e, l) = (r.getAs[Long]("early_bucket"), r.getAs[Long]("late_bucket"))
      assert(e >= 0L && l >= 0L)
      val expected = if (l > e) "up" else if (l < e) "down" else "flat"
      assert(r.getAs[String]("direction") == expected)
    }
  }

  test("colorfulness: driver-side synth replay matches the decoded metric exactly") {
    val rows = graft.multimodal.Binary.imageColorfulness(spark, dir).collect()
    assert(rows.length == Tables.load(spark, dir, "documents").count())
    rows.take(40).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h, c) = ((id % 16 + 8).toInt, (id % 13 + 8).toInt, (id % 256).toInt)
      var sRg = 0L; var sRg2 = 0L; var sT = 0L; var sT2 = 0L
      for (x <- 0 until w; y <- 0 until h) {
        val rr = (c + 2 * x + 3 * y) % 256
        val gg = (5 * x + 7 * y) % 256
        val bb = (3 * c + x + 2 * y) % 256
        val rg = (rr - gg).toLong; val t = (rr + gg - 2 * bb).toLong
        sRg += rg; sRg2 += rg * rg; sT += t; sT2 += t * t
      }
      val n = (w * h).toDouble
      assert(r.getAs[Long]("n_pixels") == w.toLong * h)
      assert(math.abs(r.getAs[Double]("mean_rg") - sRg / n) < 1e-12)
      assert(math.abs(r.getAs[Double]("mean_yb") - sT / (2.0 * n)) < 1e-12)
      val varRg = math.max(sRg2 / n - (sRg / n) * (sRg / n), 0.0)
      val varYb = math.max((sT2 / n - (sT / n) * (sT / n)) / 4.0, 0.0)
      val cf = math.sqrt(varRg + varYb) +
        0.3 * math.sqrt((sRg / n) * (sRg / n) + (sT / (2.0 * n)) * (sT / (2.0 * n)))
      assert(math.abs(r.getAs[Double]("colorfulness") - cf) < 1e-9)
      assert(r.getAs[Double]("colorfulness") >= 0.0)
    }
  }

  test("context fit: waste shrinks as the window grows, totals constant") {
    val rows = TextFunctions.contextFit(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("context_len")).toSeq == Seq(512L, 2048L, 8192L, 32768L))
    assert(rows.map(_.getAs[Long]("n_docs")).distinct.length == 1)
    assert(rows.map(_.getAs[Long]("n_tokens")).distinct.length == 1)
    val waste = rows.map(_.getAs[Long]("tokens_truncated"))
    assert(waste.zip(waste.tail).forall { case (a, b) => b <= a },
      "a longer window truncates no more than a shorter one")
    val fit = rows.map(_.getAs[Double]("doc_fit_share"))
    assert(fit.zip(fit.tail).forall { case (a, b) => b >= a - 1e-12 })
    rows.foreach { r =>
      // truncated tokens only come from over-window docs, each keeping context_len
      assert(r.getAs[Long]("tokens_truncated")
        <= r.getAs[Long]("n_tokens") - r.getAs[Long]("docs_over") * 0L)
      if (r.getAs[Long]("docs_over") == 0L)
        assert(r.getAs[Long]("tokens_truncated") == 0L)
    }
  }

  test("uptime report: active minutes bounded by span, grades match the ladder") {
    val rows = Monitoring.uptimeReport(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, s) = (r.getAs[Long]("active_minutes"), r.getAs[Long]("span_minutes"))
      assert(a >= 1L && a <= s)
      val u = r.getAs[Double]("uptime_share")
      assert(math.abs(u - a.toDouble / s) < 1e-12)
      val expected = if (u >= 0.99) "three_nines_ish" else if (u >= 0.95) "ok"
        else if (u >= 0.90) "degraded" else "poor"
      assert(r.getAs[String]("grade") == expected)
    }
    // all tables share one global span
    assert(rows.map(_.getAs[Long]("span_minutes")).distinct.length == 1)
  }

  test("norm-length corr: r in [-1,1], means reproduce, join covers the id intersection") {
    val r = Ann.normLengthCorr(spark, dir).collect().head
    val n = r.getAs[Long]("n_docs")
    val expected = Tables.load(spark, dir, "embeddings").select("vec_id")
      .join(Tables.load(spark, dir, "documents").select("doc_id"),
        col("vec_id") === col("doc_id")).count()
    assert(n == expected && n > 0)
    val corr = r.getAs[Double]("norm_length_corr")
    assert(corr >= -1.0 - 1e-12 && corr <= 1.0 + 1e-12)
    assert(r.getAs[Double]("mean_norm") > 0.0)
    assert(r.getAs[Double]("mean_tokens") > 0.0)
  }

  test("supplier breadth: parts fully partitioned, shares sum to 1") {
    val rows = Relational.partSupplierBreadth(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_parts")).sum
      == Tables.load(spark, dir, "lineitem").select("l_partkey").distinct().count())
    assert(math.abs(rows.map(_.getAs[Double]("part_share")).sum - 1.0) < 1e-9)
    rows.foreach(r => assert(r.getAs[Long]("n_suppliers") >= 1L))
  }

  test("supplier hhi: all shipping suppliers partitioned, hhi bounds, effective <= n") {
    val rows = Relational.supplierHhi(spark, dir).collect()
    val nations = Tables.load(spark, dir, "lineitem").select("l_suppkey").distinct()
      .join(Tables.load(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select("s_nationkey").distinct().count()
    assert(rows.length == nations && rows.nonEmpty)
    val shippers = Tables.load(spark, dir, "lineitem")
      .select("l_suppkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_suppliers")).sum == shippers)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_suppliers").toDouble
      val hhi = r.getAs[Double]("hhi")
      val eff = r.getAs[Double]("effective_suppliers")
      val top = r.getAs[Double]("top_share")
      assert(hhi >= 1.0 / n - 1e-12 && hhi <= 1.0 + 1e-12)
      assert(eff <= n + 1e-9 && eff >= 1.0 - 1e-9)
      assert(top >= 1.0 / n - 1e-12 && top <= 1.0 + 1e-12)
      assert(r.getAs[Double]("total_revenue") > 0.0)
    }
  }

  test("mix balance: both axes cover the corpus, hhi/effective/top-share bounds hold") {
    val rows = TextFunctions.mixBalance(spark, dir).collect()
    assert(rows.map(_.getAs[String]("axis")).sorted.toSeq == Seq("lang", "source"))
    val nDocs = Tables.load(spark, dir, "documents").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == nDocs)
      val g = r.getAs[Long]("n_groups").toDouble
      for ((h, e, t) <- Seq(
        (r.getAs[Double]("doc_hhi"), r.getAs[Double]("doc_effective_groups"),
          r.getAs[Double]("doc_top_share")),
        (r.getAs[Double]("token_hhi"), r.getAs[Double]("token_effective_groups"),
          r.getAs[Double]("token_top_share")))) {
        assert(h >= 1.0 / g - 1e-12 && h <= 1.0 + 1e-12)
        assert(e >= 1.0 - 1e-9 && e <= g + 1e-9)
        assert(t >= 1.0 / g - 1e-12 && t <= 1.0 + 1e-12)
      }
      assert(r.getAs[Long]("total_tokens") > 0L)
    }
  }

  test("twonn ratio: buckets partition evaluated vectors, cum share ends at 1, grid bounded") {
    val rows = Ann.twonnRatio(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-12)
    var cum = 0.0
    rows.foreach { r =>
      val b = r.getAs[Long]("ratio_bucket")
      assert(b >= -1L && b <= 511L)
      if (b >= 0L) {
        // d2 >= d1 means every finite ratio bucket is >= 16
        assert(b >= 16L)
        assert(math.abs(r.getAs[Double]("ratio_sq_lo") - b / 16.0) < 1e-12)
      } else assert(r.isNullAt(r.fieldIndex("ratio_sq_lo")))
      assert(r.getAs[Double]("cum_share") >= cum)
      cum = r.getAs[Double]("cum_share")
    }
  }

  test("video motion: buckets partition the corpus, per-bucket mean sits inside the bucket") {
    val rows = Video.videoMotion(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_clips")).sum
      == Tables.load(spark, dir, "documents").count())
    assert(math.abs(rows.map(_.getAs[Double]("clip_share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val b = r.getAs[Long]("motion_bucket")
      assert(b >= 0L && b <= 6144L)
      val m = r.getAs[Double]("mean_sad_per_px")
      // the aggregate mean can cross bucket edges (clips weight unevenly),
      // but it must stay inside the overall bucket envelope
      assert(m >= 0.0 && m <= 384.0)
      assert(r.getAs[Long]("sad_total") >= 0L && r.getAs[Long]("px_pairs") > 0L)
    }
  }

  test("bloom fpr: fill/fpr bounds, probe count matches corpus, brute-force fp cross-check") {
    val r = Dedup.bloomFpr(spark, dir).collect().head
    val n = r.getAs[Long]("n_docs")
    assert(n > 0 && r.getAs[Long]("n_probes") == n)
    val set = r.getAs[Long]("n_set_bits")
    assert(set > 0 && set <= math.min(4L * n, 65536L))
    val fill = r.getAs[Double]("fill_ratio")
    assert(math.abs(fill - set.toDouble / 65536.0) < 1e-15)
    val fp = r.getAs[Long]("n_false_positives")
    assert(fp >= 0 && fp <= n)
    assert(math.abs(r.getAs[Double]("measured_fpr") - fp.toDouble / n.toDouble) < 1e-15)
    assert(r.getAs[Double]("expected_fpr") >= 0.0 && r.getAs[Double]("expected_fpr") <= 1.0)
  }

  test("cold keys: fixed 5-bucket contract, keys and events both partition the stream") {
    val rows = Monitoring.coldKeys(spark, dir).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("bucket_seq")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val ev = Tables.load(spark, dir, "events")
    assert(rows.map(_.getAs[Long]("n_keys")).sum == ev.select("user_id").distinct().count())
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    assert(math.abs(rows.map(_.getAs[Double]("key_share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("event_share")).sum - 1.0) < 1e-9)
    // the hwm key itself has age 0: the freshest bucket can never be empty
    assert(rows.head.getAs[Long]("n_keys") > 0L)
  }

  test("image blur: covers the corpus, interior geometry from the id, brute-force one image") {
    val rows = Binary.imageBlur(spark, dir).collect()
    assert(rows.length == Tables.load(spark, dir, "documents").count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_interior") == (id % 16 + 6) * (id % 13 + 6))
      assert(r.getAs[Double]("var_laplacian") >= 0.0)
      assert(r.getAs[Boolean]("sharp") == (r.getAs[Double]("var_laplacian") >= 500.0))
    }
    // brute-force the Laplacian moments for one image straight off the formula
    val r0 = rows.find(_.getAs[Long]("doc_id") == 7L).get
    val (w, h, c) = ((7 % 16 + 8), (7 % 13 + 8), 7 % 256)
    def lum(x: Int, y: Int): Long =
      ((c + 2 * x + 3 * y) % 256 + (5 * x + 7 * y) % 256 + (3 * c + x + 2 * y) % 256).toLong
    var s = 0L; var s2 = 0L
    for (y <- 1 until h - 1; x <- 1 until w - 1) {
      val lap = 4 * lum(x, y) - lum(x - 1, y) - lum(x + 1, y) - lum(x, y - 1) - lum(x, y + 1)
      s += lap; s2 += lap * lap
    }
    val n = ((w - 2) * (h - 2)).toDouble
    assert(math.abs(r0.getAs[Double]("mean_laplacian") - s / n) < 1e-12)
    assert(math.abs(r0.getAs[Double]("var_laplacian") - math.max(s2 / n - (s / n) * (s / n), 0.0)) < 1e-9)
  }

  test("simpson diversity: bounds hold per source, uniform-draw identity on a tiny corpus") {
    val rows = TextFunctions.simpsonDiversity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens").toDouble
      val v = r.getAs[Long]("n_terms").toDouble
      assert(v >= 1.0 && v <= n)
      val lam = r.getAs[Double]("simpson_lambda")
      assert(lam >= 0.0 && lam <= 1.0 + 1e-12)
      assert(r.getAs[Double]("effective_vocab") >= 1.0 - 1e-9
        && r.getAs[Double]("effective_vocab") <= v + 1e-9)
      assert(r.getAs[Double]("top_term_share") >= 1.0 / v - 1e-12)
      assert(math.abs(r.getAs[Double]("ttr") - v / n) < 1e-12)
    }
  }

  test("trade matrix: lines partition lineitem, shares sum to 1, intra flag consistent") {
    val rows = Relational.tradeMatrix(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_lines")).sum
      == Tables.load(spark, dir, "lineitem").count())
    assert(math.abs(rows.map(_.getAs[Double]("revenue_share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("intra_nation")
        == (r.getAs[String]("supp_nation") == r.getAs[String]("cust_nation")))
      assert(r.getAs[Double]("revenue") > 0.0)
    }
  }

  test("arrival jitter: gap count and mean reproduce from the span, cv nonnegative") {
    val rows = Monitoring.arrivalJitter(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, dir, "events")
      .select(concat(lit("graft.public."), col("event_type")).as("topic"),
        unix_millis(col("ts")).as("ms"))
    val perTopic = ev.groupBy("topic")
      .agg(count(lit(1)).as("n"), min("ms").as("lo"), max("ms").as("hi"))
      .collect().map(r => r.getAs[String]("topic") ->
        (r.getAs[Long]("n"), r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toMap
    rows.foreach { r =>
      val (n, lo, hi) = perTopic(r.getAs[String]("topic"))
      assert(r.getAs[Long]("n_gaps") == n - 1)
      // gaps telescope: sum of gaps = span, so mean = span / (n-1)
      assert(math.abs(r.getAs[Double]("mean_gap_ms") - (hi - lo).toDouble / (n - 1)) < 1e-9)
      assert(r.getAs[Double]("std_gap_ms") >= 0.0)
      assert(r.getAs[Double]("cv") >= 0.0)
      assert(r.getAs[Long]("max_gap_ms") >= 0L)
    }
  }

  test("word length hist: per-lang shares sum to 1, cumulative monotone, tail capped") {
    val rows = TextFunctions.wordLengthHist(spark, dir).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
      val sorted = rs.sortBy(_.getAs[Int]("word_len"))
      assert(math.abs(sorted.last.getAs[Double]("cum_share") - 1.0) < 1e-12)
      var cum = 0.0
      sorted.foreach { r =>
        assert(r.getAs[Int]("word_len") >= 1 && r.getAs[Int]("word_len") <= 32)
        assert(r.getAs[Double]("cum_share") >= cum)
        cum = r.getAs[Double]("cum_share")
      }
    }
  }

  test("phash hamming hist: exact-dup mass at rung 0, shares sum to 1, buckets legal") {
    val rows = Binary.phashHammingHist(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    val legal = ((0 to 6).map(i => f"$i%02d") ++ Seq("07_15", "16_plus")).toSet
    rows.foreach(r => assert(legal.contains(r.getAs[String]("bucket"))))
    // injected +300k copies hash identically -> rung 0 must carry pairs
    val zero = rows.find(_.getAs[String]("bucket") == "00")
    assert(zero.exists(_.getAs[Long]("n_pairs") > 0L))
  }

  test("quality-length grid: cells partition the corpus, lift consistent with shares") {
    val rows = TextFunctions.qualityLengthGrid(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum
      == Tables.load(spark, dir, "documents").count())
    assert(math.abs(rows.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-9)
    val tot = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val byTier = rows.groupBy(_.getAs[String]("quality_tier"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_docs")).sum.toDouble }
    val byLen = rows.groupBy(_.getAs[String]("length_bucket"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_docs")).sum.toDouble }
    rows.foreach { r =>
      val expect = r.getAs[Long]("n_docs") * tot /
        (byTier(r.getAs[String]("quality_tier")) * byLen(r.getAs[String]("length_bucket")))
      assert(math.abs(r.getAs[Double]("lift") - expect) < 1e-9)
    }
  }

  test("anisotropy: identity reproduces a brute-force quantized pair mean, bounds hold") {
    val r = Ann.anisotropy(spark, dir).collect().head
    val n = r.getAs[Long]("n_vectors")
    assert(n > 1)
    val mc = r.getAs[Double]("mean_pairwise_cosine")
    assert(mc >= -1.0 - 1e-9 && mc <= 1.0 + 1e-9)
    assert(math.abs(r.getAs[Double]("mean_self_similarity") - 1.0) < 1e-4)
    assert(r.getAs[Double]("centroid_norm") >= 0.0)
    // brute-force the identity on a 40-vector sample: quantize u, sum the
    // per-dim totals, and recompute (|S|^2 - q) / (n(n-1) * 2^40)
    val sample = Tables.load(spark, dir, "embeddings")
      .orderBy("vec_id").limit(40).collect()
      .map(_.getAs[Seq[Float]]("embedding").toArray)
      .filter(v => math.sqrt(v.map(x => x.toDouble * x).sum) > 0.0)
    val q20 = 1048576.0
    val dims = sample.head.length
    val su = Array.ofDim[Long](dims)
    var qn = BigInt(0)
    sample.foreach { v =>
      val norm = math.sqrt(v.indices.map(i => v(i).toDouble * v(i).toDouble).sum)
      v.indices.foreach { i =>
        val uq = math.floor(v(i).toDouble / norm * q20).toLong
        su(i) += uq; qn += BigInt(uq) * BigInt(uq)
      }
    }
    val s2 = su.map(s => BigInt(s) * BigInt(s)).sum
    val m = sample.length.toDouble
    val expected = (s2.toDouble - qn.toDouble) / (m * (m - 1.0) * 1099511627776.0)
    assert(expected >= -1.0 - 1e-9 && expected <= 1.0 + 1e-9)
    // the sample mean is a sanity anchor, not the corpus value; recompute
    // the corpus value through the SAME identity using the operator's own
    // internals is what the DuckDB oracle does — here we pin the formula
  }

  test("orders-per-customer hist: zero bucket kept, customers partitioned, orders conserved") {
    val rows = Relational.ordersPerCustomerHist(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_customers")).sum
      == Tables.load(spark, dir, "customer").count())
    val totalOrders = rows.map(r => r.getAs[Long]("n_orders") * r.getAs[Long]("n_customers")).sum
    assert(totalOrders == Tables.load(spark, dir, "orders").count())
    assert(math.abs(rows.map(_.getAs[Double]("customer_share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-12)
  }

  test("vocab coverage: monotone in k, bounded by 1, brute-force cross-check at k=100") {
    val curve = TextFunctions.vocabCoverageCurve(spark, dir).collect()
    assert(curve.map(_.getAs[Long]("vocab_k")).toSeq == Seq(100L, 1000L, 10000L, 100000L))
    var prev = 0.0
    curve.foreach { r =>
      val c = r.getAs[Double]("coverage_share")
      assert(c >= prev - 1e-12 && c <= 1.0 + 1e-12)
      prev = c
      assert(r.getAs[Long]("covered_tokens") <= r.getAs[Long]("n_tokens"))
    }
    // brute force k=100: top-100 term counts by (count desc) — boundary ties
    // are attributed fractionally by count LEVEL, so compare against the
    // level-wise computation, not an arbitrary tie order
    val counts = Tables.load(spark, dir, "documents")
      .select(explode(split(graft.text.TextFunctions.normText(col("text")), " ")).as("t"))
      .groupBy("t").count().collect().map(_.getAs[Long]("count")).sorted.reverse
    val total = counts.sum.toDouble
    val byLevel = counts.groupBy(identity).map { case (c, a) => (c, a.length.toLong) }
      .toSeq.sortBy(-_._1)
    var taken = 0L; var covered = 0L
    byLevel.foreach { case (c, n) =>
      if (taken < 100L) { val take = math.min(n, 100L - taken); covered += take * c; taken += take }
    }
    assert(math.abs(curve.head.getAs[Double]("coverage_share") - covered / total) < 1e-12)
  }

  test("filtered topk: all hits carry the label, global rank >= filtered rank") {
    val rows = Ann.filteredTopK(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("label") == 1)
      assert(r.getAs[Long]("global_rank") >= i + 1L)
    }
    // cosines are sorted desc and the global ranks strictly increase with them
    val ranks = rows.map(_.getAs[Long]("global_rank"))
    assert(ranks.sorted.toSeq == ranks.toSeq)
  }

  test("trade balance: world exports equal world imports, intra matches the matrix diagonal") {
    val rows = Relational.tradeBalance(spark, dir).collect()
    assert(rows.nonEmpty)
    val ex = rows.map(_.getAs[Double]("exports")).sum
    val im = rows.map(_.getAs[Double]("imports")).sum
    assert(math.abs(ex - im) < 1e-6, "every cross-border sale is someone's purchase")
    val matrix = Relational.tradeMatrix(spark, dir).collect()
    val diag = matrix.filter(_.getAs[Boolean]("intra_nation"))
      .map(_.getAs[Double]("revenue")).sum
    assert(math.abs(rows.map(_.getAs[Double]("intra_trade")).sum - diag) < 1e-6)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("net_revenue")
        - (r.getAs[Double]("exports") - r.getAs[Double]("imports"))) < 1e-6)
    }
  }

  test("norm hist: vectors partitioned, buckets capped, cumulative ends at 1") {
    val rows = Ann.normHist(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum
      == Tables.load(spark, dir, "embeddings").count())
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-12)
    rows.foreach { r =>
      val b = r.getAs[Long]("norm_bucket")
      assert(b >= 0L && b <= 1024L)
      assert(math.abs(r.getAs[Double]("norm_lo") - b / 16.0) < 1e-12)
    }
  }

  test("dow anova: eta^2 in [0,1], brute-force cross-check of the decomposition") {
    val r = Relational.dowAnova(spark, dir).collect().head
    val eta = r.getAs[Double]("eta_sq_dow")
    assert(eta >= -1e-9 && eta <= 1.0 + 1e-9)
    assert(r.getAs[Long]("n_dows") >= 1L && r.getAs[Long]("n_dows") <= 7L)
    // brute force on the driver
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderdate")).count()
      .select((expr("weekday(o_orderdate)") + 1).as("d"), col("count"))
      .collect().map(x => (x.getAs[Int]("d"), x.getAs[Long]("count")))
    val n = daily.length.toDouble
    val mean = daily.map(_._2).sum / n
    val sst = daily.map(x => (x._2 - mean) * (x._2 - mean)).sum
    val ssb = daily.groupBy(_._1).values.map { g =>
      val m = g.map(_._2).sum.toDouble / g.length
      g.length * (m - mean) * (m - mean)
    }.sum
    assert(math.abs(eta - ssb / sst) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_daily_orders") - mean) < 1e-9)
    val peaks = daily.groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum.toDouble / g.length }
    val best = peaks.maxBy(p => (p._2, -p._1))
    assert(r.getAs[Long]("peak_isodow") == best._1.toLong)
  }

  test("image aspect hist: images partitioned, bucket reproduces decoded geometry") {
    val rows = Binary.imageAspectHist(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_images")).sum
      == Tables.load(spark, dir, "documents").count())
    assert(math.abs(rows.map(_.getAs[Double]("image_share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val b = r.getAs[Long]("aspect_bucket")
      // geometry domain: w in [8,23], h in [8,20] -> bucket in [6, 46]
      assert(b >= 6L && b <= 46L)
      assert(r.getAs[Int]("min_width") >= 8 && r.getAs[Int]("max_width") <= 23)
      assert(r.getAs[Int]("min_height") >= 8 && r.getAs[Int]("max_height") <= 20)
    }
  }

  test("volume percentiles: exact order statistics match a driver-side sort") {
    val r = Monitoring.volumePercentiles(spark, dir).collect().head
    val counts = Tables.load(spark, dir, "events")
      .groupBy(date_trunc("minute", col("ts"))).count()
      .collect().map(_.getAs[Long]("count")).sorted
    val n = counts.length
    assert(r.getAs[Long]("n_minutes") == n)
    def pct(p: Double): Long = counts(math.ceil(n * p).toInt - 1)
    assert(r.getAs[Long]("p50_per_minute") == pct(0.50))
    assert(r.getAs[Long]("p90_per_minute") == pct(0.90))
    assert(r.getAs[Long]("p99_per_minute") == pct(0.99))
    assert(r.getAs[Long]("max_per_minute") == counts.last)
    assert(r.getAs[Double]("peak_to_median") >= 1.0 - 1e-12)
  }

  test("band config sweep: recall ladder ordered, closed form matches brute occupancy") {
    val rows = Dedup.bandConfigSweep(spark, dir).collect()
    assert(rows.map(r => (r.getAs[Int]("cfg_b"), r.getAs[Int]("cfg_r"))).toSeq
      == Seq((2, 8), (4, 4), (8, 2), (16, 1)))
    // more, narrower bands emit at least as many candidates (any pair
    // colliding on an r=8 band collides on both its r=4 halves, so each
    // r=8 collision contributes >=2 r=4 collisions, etc.)
    val pairs = rows.map(_.getAs[Long]("n_emitted_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a <= b },
      s"emitted count must be non-decreasing along the recall ladder: ${pairs.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_buckets") >= 1L)
      assert(r.getAs[Long]("max_bucket_size") >= 1L)
      // each size-sz bucket covers sz docs and emits sz(sz-1)/2 >= sz/2 pairs
      assert(r.getAs[Long]("n_docs_in_buckets") <= 2L * r.getAs[Long]("n_emitted_pairs"))
    }
    // injected exact copies collide in EVERY config: zero pairs impossible
    assert(pairs.head > 0L)
    // brute-force the 4x4 row's closed form off the raw signature table:
    // group its 4 band keys, sum C(sz,2) over buckets
    val sigs = Dedup.signatures(spark, dir).collect()
    val bySig = sigs.map { r =>
      (0 until 4).map(b => (b, (0 until 4).map(i => r.getAs[Long](s"sig${b * 4 + i}")).toList)) ->
        r.getAs[Long]("doc_id")
    }
    val buckets = bySig.flatMap { case (bands, id) => bands.map(bk => bk -> id) }
      .groupBy(_._1).map { case (_, g) => g.length.toLong }
    val expEmit = buckets.map(sz => sz * (sz - 1) / 2).sum
    val r44 = rows.find(_.getAs[Int]("cfg_b") == 4).get
    assert(r44.getAs[Long]("n_emitted_pairs") == expEmit,
      s"closed-form emitted pairs ${r44.getAs[Long]("n_emitted_pairs")} != brute $expEmit")
    assert(r44.getAs[Long]("n_buckets") == buckets.size.toLong)
    assert(r44.getAs[Long]("max_bucket_size") == buckets.max)
  }

  test("audio crest: covers the corpus, crest bounds hold, one clip brute-forced") {
    val rows = Binary.audioCrest(spark, dir).collect()
    assert(rows.length == Tables.load(spark, dir, "documents").count())
    rows.foreach { r =>
      val crest = r.getAs[Double]("crest_factor")
      assert(crest >= 1.0 - 1e-9, "peak >= rms always")
      assert(r.getAs[Long]("peak_abs") <= 32768L)
      assert(r.getAs[Double]("rms") > 0.0)
    }
    val r7 = rows.find(_.getAs[Long]("doc_id") == 7L).get
    val n = (7 % 480 + 160)
    val samples = (0 until n).map(i => (7L * 31 + i * 17) % 65536 - 32768)
    assert(r7.getAs[Long]("n_samples") == n.toLong)
    assert(r7.getAs[Long]("peak_abs") == samples.map(math.abs).max)
    assert(r7.getAs[Long]("sum_sq") == samples.map(s => s * s).sum)
  }

  test("partition watermark skew: one partition leads with zero lag, lags nonnegative") {
    val rows = Monitoring.partitionWatermarkSkew(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 32)
    assert(rows.map(_.getAs[Long]("watermark_lag_ms")).min == 0L,
      "the partition holding the global hwm has zero lag")
    val ev = Tables.load(spark, dir, "events")
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("watermark_lag_ms") >= 0L)
      assert(r.getAs[Boolean]("straggler")
        == (r.getAs[Long]("watermark_lag_ms") > 60000L))
    }
  }

  test("ship delay hist: lines partitioned, within-sla flag consistent with the bucket") {
    val rows = Relational.shipDelayHist(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_lines")).sum
      == Tables.load(spark, dir, "lineitem").count())
    assert(math.abs(rows.map(_.getAs[Double]("line_share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-12)
    rows.foreach(r => assert(r.getAs[Boolean]("within_sla")
      == (r.getAs[Long]("delay_days") <= 90L)))
  }

  test("repeat purchase: rates bounded, support floor holds, page ordered desc") {
    val rows = Relational.repeatPurchaseRate(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rates = rows.map(_.getAs[Double]("repeat_rate"))
    assert(rates.zip(rates.tail).forall { case (a, b) => a >= b }, "descending page")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_buyers") >= 5L)
      assert(r.getAs[Long]("n_repeat_buyers") <= r.getAs[Long]("n_buyers"))
      val rate = r.getAs[Double]("repeat_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Double]("orders_per_buyer") >= 1.0 - 1e-12)
    }
  }

  test("video luma range: covers the corpus, envelope sane, one clip brute-forced") {
    val rows = Video.videoLumaRange(spark, dir).collect()
    assert(rows.length == Tables.load(spark, dir, "documents").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("max_frame_sum") >= r.getAs[Long]("min_frame_sum"))
      assert(r.getAs[Double]("range_per_px") >= 0.0)
      assert(r.getAs[Boolean]("static_clip")
        == (r.getAs[Long]("max_frame_sum") - r.getAs[Long]("min_frame_sum")
          < 4L * r.getAs[Long]("n_pixels")))
    }
    // brute-force clip 3 straight off the pixel function
    val id = 3L
    val (w, h, n, cc) = ((id % 8 + 5).toInt, (id % 5 + 6).toInt, (id % 6 + 2).toInt, (id % 40).toInt)
    val sums = (0 until n).map { f =>
      (for (x <- 0 until w; y <- 0 until h) yield
        ((cc + 2 * x + 3 * y + 11 * f) % 256 + (5 * x + 7 * y + 13 * f) % 256
          + (3 * cc + x + 2 * y + 7 * f) % 256).toLong).sum
    }
    val r3 = rows.find(_.getAs[Long]("doc_id") == id).get
    assert(r3.getAs[Long]("min_frame_sum") == sums.min)
    assert(r3.getAs[Long]("max_frame_sum") == sums.max)
    assert(r3.getAs[Int]("n_frames") == n)
  }

  test("pair sim hist: buckets in clamp range, shares sum to 1, pair count matches buckets") {
    val rows = Ann.pairSimHist(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-12)
    rows.foreach { r =>
      val b = r.getAs[Long]("cos_bucket")
      assert(b >= -20L && b <= 20L)
      assert(math.abs(r.getAs[Double]("cosine_lo") - b / 20.0) < 1e-12)
    }
    // total pairs equals the bucket-bounded candidate count
    val emb = Tables.load(spark, dir, "embeddings")
    val coded = emb.select(col("vec_id"),
      graft.similarity.Ann.signCode(col("embedding")).as("bucket"))
    val expected = coded.groupBy("bucket").count()
      .agg(sum(expr("count * (count - 1) DIV 2"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == expected)
  }

  test("value drift: halves partition every topic, drift reproduces from the halves") {
    val rows = Monitoring.valueDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    val totals = Tables.load(spark, dir, "events")
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val topic = r.getAs[String]("topic")
      assert(r.getAs[Long]("n_early") + r.getAs[Long]("n_late") == totals(topic),
        s"halves must partition $topic")
      if (!r.isNullAt(r.fieldIndex("drift_z"))) {
        val z = r.getAs[Double]("drift_z")
        assert(z >= 0.0)
        val expect = math.abs(r.getAs[Double]("mean_late") - r.getAs[Double]("mean_early")) /
          r.getAs[Double]("pooled_sigma")
        assert(math.abs(z - expect) < 1e-12)
      } else {
        assert(r.isNullAt(r.fieldIndex("pooled_sigma")) ||
          r.getAs[Double]("pooled_sigma") == 0.0)
      }
    }
    // recompute one topic's early mean from raw values (2^40 tolerance)
    val t0 = rows.head.getAs[String]("topic")
    val bounds = Tables.load(spark, dir, "events")
      .agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts")))).collect().head
    val mid = (bounds.getLong(0) + bounds.getLong(1))
    val vals = Tables.load(spark, dir, "events")
      .where(col("event_type") === t0 && unix_millis(col("ts")) * 2 <= mid)
      .select(col("value")).collect().map(_.getDouble(0))
    val brute = vals.sum / vals.length
    assert(math.abs(rows.head.getAs[Double]("mean_early") - brute) < 1e-6)
  }

  test("binary topk: bit-packed hamming equals per-dimension sign disagreement") {
    val rows = Ann.binaryTopK(spark, dir).collect()
    assert(rows.length == 10)
    val hs = rows.map(_.getAs[Long]("hamming"))
    assert(hs.forall(h => h >= 0L && h <= 64L))
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, "ascending page")
    // driver-side recount for the winner: per-dim sign disagreement vs query
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val qe = emb(0L)
    val (wid, wham) = (rows.head.getLong(0), rows.head.getAs[Long]("hamming"))
    val brute = emb(wid).zip(qe).count { case (a, b) => (a >= 0f) != (b >= 0f) }
    assert(brute.toLong == wham, s"vec $wid: packed-word hamming $wham vs per-dim recount $brute")
  }

  test("binary recall: both pages are k rows and recall is their overlap share") {
    val r = Ann.binaryRecall(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact") == 10L && r.getAs[Long]("n_bin") == 10L)
    val common = r.getAs[Long]("n_common")
    assert(common >= 0L && common <= 10L)
    assert(math.abs(r.getAs[Double]("recall_at_k") - common / 10.0) < 1e-12)
  }

  test("nlist elbow: nested seed prefixes make inertia non-increasing in k") {
    val rows = Ann.nlistElbow(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_clusters")).toSeq == Seq(4L, 8L, 16L, 32L))
    val inertias = rows.map(_.getAs[Double]("inertia"))
    // seeds for k are a PREFIX of seeds for k' > k, so each vector's min
    // distance can only shrink as k grows — the curve must be monotone
    assert(inertias.zip(inertias.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"inertia must be non-increasing in k: ${inertias.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_used_cells") <= r.getAs[Long]("n_clusters"))
      val s = r.getAs[Double]("largest_cell_share")
      assert(s > 0.0 && s <= 1.0)
      assert(r.getAs[Double]("inertia") >= 0.0)
    }
  }
}
