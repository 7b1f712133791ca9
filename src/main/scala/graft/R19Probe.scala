package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Ann
import graft.cdc.Materialize

/** r19 optimization-round A/B variants (NOT registered). Each pair is the
  * r18 registered shape ("…_raw") against the r19 candidate, run
  * interleaved in one JVM window (ProfileR19) so ambient drift hits both
  * sides equally; candidates are promoted only after an interleaved win
  * AND an oracle-equivalence pass (tools/selfcheck.py).
  */
object R19Variants {

  /** r18 shapes of the ANN iterative/sweep family: the embeddings source
    * NOT redistributed, so on the single-row-group test corpus the
    * |data|·k·d distance arithmetic pipelines into one scan task
    * (guide §2.5). The r19 registered forms pass
    * Tables.spreadBy(…, vec_id) instead. */
  def kmeansConvergeRaw(s: SparkSession, d: String): DataFrame =
    Ann.kmeansConvergeOf(s, Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")))
  def kmeansRefineRaw(s: SparkSession, d: String): DataFrame =
    Ann.kmeansRefineOf(s, Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")))
  def nlistElbowRaw(s: SparkSession, d: String): DataFrame =
    Ann.nlistElbowOf(s, Tables.load(s, d, "embeddings"))
  def pqMSweepRaw(s: SparkSession, d: String): DataFrame =
    Ann.pqMSweepOf(s, Tables.load(s, d, "embeddings"))

  /** cdc_materialize_composite changelog projection (the registered inline
    * shape in SparkEntry), with the loader strategy parameterized:
    * r18 registered = spread the FULL-width lineitem then project
    * (round-robin exchange carries all 16 columns — guide §2.3 "project
    * before the exchange"); candidates = project THEN spread, and serial
    * (no spread — the op is one narrow projection into a groupBy, the
    * pure-hash-agg-consumer profile where the spread exchange costs more
    * than the per-row work it parallelizes). */
  private def compositeOf(li: DataFrame): DataFrame = {
    import graft.dec
    val cl = li.select(
      when(col("l_returnflag") === "R", "d").otherwise("u").as("op"),
      col("l_suppkey"), col("l_partkey"),
      col("l_shipdate"), col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      dec(col("l_extendedprice"), 18, 2).cast("double").as("price"))
    Materialize.latestSnapshotKeyed(cl,
        keyCols = Seq("l_suppkey", "l_partkey"),
        orderCols = Seq("l_shipdate", "l_orderkey", "l_linenumber"),
        opCol = "op",
        payloadCols = Seq("price"))
      .orderBy("l_suppkey", "l_partkey")
  }
  private val compositeCols = Seq(
    "l_returnflag", "l_suppkey", "l_partkey", "l_shipdate", "l_orderkey",
    "l_linenumber", "l_extendedprice")
  def compositeRaw(s: SparkSession, d: String): DataFrame =
    compositeOf(Tables.spread(Tables.load(s, d, "lineitem")))
  def compositeProjected(s: SparkSession, d: String): DataFrame =
    compositeOf(Tables.spread(
      Tables.load(s, d, "lineitem").select(compositeCols.map(col): _*)))
  def compositeSerial(s: SparkSession, d: String): DataFrame =
    compositeOf(Tables.load(s, d, "lineitem").select(compositeCols.map(col): _*))

  /** kmeans_converge with carry-forward fusion: each round's pinned
    * assignment carries old_label and each pinned centroid table carries
    * c_prev, so the per-round moved/shift stats become plain aggregations
    * over the pinned tables instead of checkpoint ⋈ checkpoint SMJs in
    * the final stats query (guide §2.4: two ops keyed the same way share
    * one pass). Equivalence: the moved join (old ⋈ new on vec_id, both
    * total over the same vec set) and the shift join (cents_old ⋈
    * cents_new on (label, pos); new labels ⊆ old labels since assignment
    * targets the old centroid set, so the inner join keeps every new
    * row) are relocated verbatim into the pin, not changed. */
  def kmeansConvergeFused(s: SparkSession, d: String, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.GraftFunctions
    val Q = 1099511627776.0
    val emb = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    val long = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x").cast("double").as("x"))
      .localCheckpoint(true)
    def qMean(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(floor(c * Q).cast("long").cast(DecimalType(38, 0))).cast("double") / Q / count(lit(1))
    def centroidsOf(assign: DataFrame): DataFrame =
      long.join(assign, "vec_id").groupBy("label", "pos").agg(qMean(col("x")).as("c"))
    def assignTo(cents: DataFrame): DataFrame =
      long.join(broadcast(cents.select(col("label").as("cand_label"), col("pos"), col("c"))), "pos")
        .withColumn("dq",
          floor((col("x") - col("c")) * (col("x") - col("c")) * Q)
            .cast("long").cast(DecimalType(38, 0)))
        .groupBy("vec_id", "cand_label").agg(sum(col("dq")).as("d2q"))
        .groupBy("vec_id").agg(GraftFunctions.minByCol(long, col("cand_label"),
          struct(col("d2q"), col("cand_label"))).as("m"))
        .select(col("vec_id"), col("m").as("label"))
    var assign = emb.select(col("vec_id"), col("label"))
    var cents = centroidsOf(assign).localCheckpoint(true)
    val stats = Seq.newBuilder[DataFrame]
    for (r <- 1 to rounds) {
      val newAssign = assignTo(cents.select("label", "pos", "c"))
        .join(assign.select(col("vec_id"), col("label").as("old_label")), "vec_id")
        .localCheckpoint(true)
      val newCents = centroidsOf(newAssign.select("vec_id", "label"))
        .join(cents.select(col("label"), col("pos"), col("c").as("c_prev")), Seq("label", "pos"))
        .localCheckpoint(true)
      val moved = newAssign
        .agg(sum(when(col("old_label") =!= col("label"), 1L).otherwise(0L)).as("n_moved"))
      val shift = newCents
        .withColumn("sq",
          floor((col("c") - col("c_prev")) * (col("c") - col("c_prev")) * Q)
            .cast("long").cast(DecimalType(38, 0)))
        .groupBy("label").agg(sqrt(sum(col("sq")).cast("double") / Q).as("s"))
        .agg(max(col("s")).as("max_shift"))
      val active = newAssign.agg(countDistinct(col("label")).as("n_active_labels"))
      stats += moved.crossJoin(broadcast(shift)).crossJoin(broadcast(active))
        .select(lit(r).cast("long").as("round"), col("n_moved"), col("max_shift"),
          col("n_active_labels"), (col("n_moved") === 0L).as("converged"))
      assign = newAssign.select(col("vec_id"), col("label"))
      cents = newCents
    }
    stats.result().reduce(_ unionAll _).orderBy("round")
  }

  /** q_mad_approx_gate r18 shape: the exact side re-computed inside the
    * gate (vs the r19 memoized shared build). */
  def madGateUnshared(s: SparkSession, d: String, tol: Double = 0.02): DataFrame = {
    val e = graft.analytics.Relational.madByFlag(s, d)
      .select(col("l_returnflag"), col("n_rows"),
        col("median_price").as("e_med"), col("mad").as("e_mad"))
    val a = graft.analytics.Sketches.approxMad(s, d)
      .select(col("l_returnflag"), col("n_rows").as("a_n"),
        col("median_price").as("a_med"), col("mad").as("a_mad"))
    def within(x: org.apache.spark.sql.Column, ex: org.apache.spark.sql.Column) =
      (abs(x - ex) / greatest(abs(ex), lit(1.0)) < tol).cast("long")
    e.join(a, "l_returnflag")
      .select(col("l_returnflag"), col("n_rows"),
        (col("a_n") === col("n_rows")).cast("long").as("n_equal"),
        within(col("a_med"), col("e_med")).as("median_within_2pct"),
        within(col("a_mad"), col("e_mad")).as("mad_within_2pct"))
      .orderBy("l_returnflag")
  }
}

/** Attribution probe for kmeans_converge: where do its ~3.6 s go — the
  * eager per-round pins (construction-time jobs) or the final stats
  * query? */
object KmeansAttrib {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.localSession("graft-kmeans-attrib",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    (1 to 4).foreach { p =>
      val t0 = System.nanoTime()
      val df = Ann.kmeansConverge(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"pass $p construct(pins) ${(t1 - t0) / 1e9}%.3f  stats ${(t2 - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}

/** Interleaved A/B runner (the ProfileAB discipline): each pass times every
  * chosen variant once, suite order fixed, so registered/candidate
  * alternate within one JVM/window. Report = median + min + raws. */
object ProfileR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "5").toInt
    val spark = Tables.localSession("graft-profile-r19",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val pairs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "kmeans_converge_raw" -> (R19Variants.kmeansConvergeRaw _),
      "kmeans_converge_spread" -> ((s, d) => Ann.kmeansConverge(s, d)),
      "kmeans_converge_fused" -> ((s, d) => R19Variants.kmeansConvergeFused(s, d)),
      "kmeans_refine_raw" -> (R19Variants.kmeansRefineRaw _),
      "kmeans_refine_spread" -> ((s, d) => Ann.kmeansRefine(s, d)),
      "nlist_elbow_raw" -> (R19Variants.nlistElbowRaw _),
      "nlist_elbow_spread" -> ((s, d) => Ann.nlistElbow(s, d)),
      "pq_m_sweep_raw" -> (R19Variants.pqMSweepRaw _),
      "pq_m_sweep_spread" -> ((s, d) => Ann.pqMSweep(s, d)),
      "composite_raw" -> (R19Variants.compositeRaw _),
      "composite_projected" -> (R19Variants.compositeProjected _),
      "composite_serial" -> (R19Variants.compositeSerial _),
      "mad_gate_unshared" -> ((s, d) => R19Variants.madGateUnshared(s, d)),
      "mad_gate_shared" -> ((s, d) => graft.analytics.SketchGates.madGate(s, d)))
    val chosen = if (args.nonEmpty) pairs.filter(p => args.contains(p._1)) else pairs
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to passes).foreach { _ =>
      chosen.foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    chosen.foreach { case (n, _) =>
      val ts = times(n).sorted
      println(f"$n%-26s median ${ts(ts.length / 2)}%.3f  min ${ts.head}%.3f  " +
        times(n).map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
