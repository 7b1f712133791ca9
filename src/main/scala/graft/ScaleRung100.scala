package graft

import graft.cdc.{Cdc, Materialize, Monitoring}
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ×100 rung of the scale-smoke growth ladder — one more decade past
  * ScaleSmoke's ×10–×50 lines, focused on the three shapes whose scale
  * story is a DATA-CHOSEN switch (the knobs must keep choosing correctly
  * as the data grows, not just execute):
  *
  *   1. the latest-row materializer at ×100 (uniform AND hot-key skew),
  *      with the ADVISED path dispatching between them;
  *   2. the salt advisor's panel at ×100 skew — recommended_salt must
  *      flip past 1 exactly when the hottest key outgrows a task;
  *   3. the containment blocking switch on the closed-vocab flooding
  *      corpus at ×1 / ×10 / ×100 — the priced k5 workload keeps
  *      crossing the budget, the chosen path's candidates/doc must stay
  *      bounded another decade.
  *
  * Run: sbt "runMain graft.ScaleRung100 [sfDir]"  (writes stdout lines
  * consumed into SCALE_r13.txt).
  */
object ScaleRung100 {

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // optional section filter: "materialize" | "advisor" | "containment"
    val only = args.lift(1)
    def section(name: String): Boolean = only.forall(_ == name)
    val factor = 100
    val spark = Tables.localSession("scale-rung-100", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String, rows: Long)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"== $name: $n%d result rows from $rows%d input in $s%.1f s (${rows / s / 1e6}%.2f M rows/s)")
    }

    // ── 1. materializer at ×100 ─────────────────────────────────────────
    val ev = Tables.spread(Tables.load(spark, dir, "events"))
    val reps = spark.range(factor).select(col("id").as("rep"))
    // disjoint key spaces per replica: uniform regime
    val uniform = ev.crossJoin(reps).select(
      Cdc.opFromEventType(col("event_type")).as("op"),
      (col("user_id") + col("rep") * 1000000L).as("pk"),
      col("ts"),
      (col("event_id") + col("rep") * 10000000L).as("seq"),
      col("value"), col("props"))
    // all replicas FOLDED onto 300 keys: hot-key regime (~33k changes per
    // key at ×100 — past the advisor's 10k/task target, where plain
    // user_id keys at sf0.1 land at 9.9k/key, one task-width short of hot)
    val skewed = ev.crossJoin(reps).select(
      Cdc.opFromEventType(col("event_type")).as("op"),
      pmod(col("user_id"), lit(300)).as("pk"), col("ts"),
      (col("event_id") + col("rep") * 10000000L).as("seq"),
      col("value"), col("props"))
    val nEv = ev.count() * factor
    if (section("materialize")) {
      t(s"x$factor materialize_latest (uniform)", nEv)(
        Materialize.latestSnapshot(uniform).count())
      t(s"x$factor materialize_advised (uniform — advisor must pick salt 1)", nEv)(
        Materialize.latestSnapshotAdvised(uniform).count())
      t(s"x$factor materialize_advised (hot-key — advisor must pick salt > 1)", nEv)(
        Materialize.latestSnapshotAdvised(skewed).count())
    }

    // ── 2. salt advisor panel at ×100 skew ──────────────────────────────
    def panel(cl: DataFrame, tag: String): Int = {
      val row = Monitoring.saltAdvisorFromPerKey(
        cl.groupBy("pk").agg(count(lit(1)).as("cnt"))).collect()(0)
      val salt = row.getAs[Long]("recommended_salt").toInt
      println(s"== x$factor salt advisor [$tag]: " +
        row.schema.fieldNames.zip(row.toSeq).map { case (k, v) => s"$k=$v" }.mkString(" "))
      salt
    }
    if (section("advisor")) {
      val saltUniform = panel(uniform, "uniform")
      val saltSkewed = panel(skewed, "hot-key")
      require(saltUniform == 1,
        s"advisor must not pay the two-phase premium on disjoint keys (got $saltUniform)")
      require(saltSkewed > 1,
        s"advisor must salt the ×$factor hot-key regime (got $saltSkewed)")
      println(s"== x$factor advisor verdict: uniform→salt $saltUniform, hot-key→salt $saltSkewed")
    }

    // ── 3. containment blocking switch ×1 / ×10 / ×100 ──────────────────
    // word-shuffled replicas share the k=5 shingle vocabulary without
    // being true containment dups (ScaleSmoke's flooding construction) —
    // candidate volume measures the BLOCKING, not true-pair mass
    import graft.text.TextFunctions.normText
    val docs = Tables.spread(Tables.load(spark, dir, "documents"))
    def shuffled(nReps: Int): DataFrame =
      docs.limit(1200)
        .crossJoin(spark.range(nReps).select(col("id").as("rep")))
        .select((col("doc_id") * 1000L + col("rep")).as("doc_id"),
          concat_ws(" ", transform(
            array_sort(transform(split(normText(col("text")), " "),
              w => struct(md5(concat(w, col("rep").cast("string"))).as("k"), w.as("w")))),
            s => s.getField("w"))).as("t"))
    if (section("containment")) for ((nReps, tag) <- Seq((2, "x1"), (20, "x10"), (200, "x100"))) {
      val c = shuffled(nReps).cache()
      val n = c.count()
      val k5Hits = Dedup.prefixWorkloadHitsOf(c, 5)
      val scheme = Dedup.containmentSchemeOf(c)
      val cands = scheme match {
        case "prefix_filter" => Dedup.prefixCandidateIdsOf(c, 5).count()
        case "prefix_k10"    => Dedup.prefixCandidateIdsOf(c, 10).count()
        // the switch's floor: when even the k10 prefix workload floods
        // (×100 pushes the shared intra-word shingle df past the budget),
        // the ladder prices the plain 16×1 banding closed-form and — new
        // this round (r13 verdict item 3) — walks document-frequency
        // ceilings until the CAPPED floor prices within budget. The ×100
        // closed-vocab regime therefore EXECUTES now: stop-shingles (df
        // over the data-chosen ceiling) are dropped before the minhash,
        // so the word-shuffled replica flood — whose shared mass is
        // exactly those omnipresent intra-word shingles — stops banding
        // together, while true near-dups keep colliding on their rare
        // shingles (recall parity pinned in Round14Spec).
        case s if s.startsWith("band_16x1_dfcap:") =>
          val ceiling = s.split(':')(1).toLong
          println(s"== containment auto-switch [$tag]: plain floor priced at " +
            s"${Dedup.banding16x1PricedPairs(Dedup.signaturesOf(c))} pairs → " +
            s"df-capped at ceiling $ceiling, EXECUTING")
          Dedup.bandCandidateIds16x1DfCappedOf(c, ceiling).count()
        case "band_16x1" =>
          Dedup.banding16x1PricedPairs(Dedup.signaturesOf(c))
        case other => sys.error(s"unexpected scheme $other on this corpus")
      }
      val label = if (scheme == "band_16x1") "priced_pairs_upper" else "candidates"
      println(s"== containment auto-switch [$tag]: docs=$n k5_closed_form_hits=$k5Hits " +
        s"chosen=$scheme $label=$cands (per-doc ${cands / math.max(n, 1)})")
      c.unpersist()
    }

    // ── 4. native-corpus containment growth ×50 → ×100 ──────────────────
    // token-suffixed replicas (open vocabulary: every word carries its
    // replica id, so replicas share no shingles) — the REALISTIC regime,
    // where the lossless prefix filter must stay chosen and candidates
    // per doc must stay bounded across the last doubling of the ladder.
    if (section("native")) {
      def suffixed(nReps: Int): DataFrame =
        docs.crossJoin(spark.range(nReps).select(col("id").as("rep")))
          .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
            normText(regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"), col("rep")))).as("t"))
      for ((nReps, tag) <- Seq((50, "x50"), (100, "x100"))) {
        val c = suffixed(nReps).cache()
        val n = c.count()
        val scheme = Dedup.containmentSchemeOf(c)
        // suffixed replicas still share intra-word k5 shingles with their
        // base doc (the suffix only appends), so at ×50 the priced k5
        // workload crosses the budget and the switch escalates to the
        // k10 prefix — an EXACT scheme, not the banding floor; what must
        // hold across the decade is that an exact prefix path stays
        // chosen and its candidates/doc stay bounded
        require(scheme.startsWith("prefix"),
          s"suffixed corpus must keep an exact prefix scheme (got $scheme)")
        val k = if (scheme == "prefix_filter") 5 else 10
        val cands = Dedup.prefixCandidateIdsOf(c, k).count()
        println(s"== containment native growth [$tag]: docs=$n chosen=$scheme " +
          s"candidates=$cands (per-doc ${cands / math.max(n, 1)})")
        c.unpersist()
      }
    }
    spark.stop()
  }
}
