package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 hardening: degenerate-input and boundary behavior flagged by
  * the r12 advisory — empty-changelog advisor, exact-diameter label
  * propagation — plus the per-query conf scoping bridge
  * ([[Tables.collectAggGuard]]) that re-sizes the ObjectHashAggregate
  * spill guard for unbounded collect buffers without touching the shared
  * session.
  */
class Round13Spec extends AnyFunSuite {
  import TestSpark.{spark, dir}
  import spark.implicits._

  test("latestSnapshotAdvised returns an empty snapshot on an empty changelog (no NPE)") {
    val empty = Seq.empty[(Long, Long, Long, String, String)]
      .toDF("pk", "ts", "seq", "op", "value")
    assert(graft.cdc.Materialize.latestSnapshotAdvised(empty).count() == 0L,
      "the advisor's max(cnt) is null on empty input — must degrade to salt 1, not throw")
  }

  test("propagateLabels converges when component diameter EQUALS maxRounds") {
    // a 1-2-3-4-5-6 chain: label 1 reaches node 6 on round 5 (diameter 5).
    // The loop's movement flag trails by one round, so maxRounds = 5 used
    // to throw despite the labeling being at fixpoint; the post-loop
    // confirmation check must accept it.
    val ids = (1L to 6L).toDF("doc_id")
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (undirected ++ undirected.map(_.swap)).toDF("id_a", "id_b")
    val labels = graft.dedup.Dedup.propagateLabels(ids, edges, maxRounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == (1L to 6L).map(_ -> 1L).toMap)
    // one short of the diameter is genuinely unconverged — still refuses
    assertThrows[IllegalArgumentException] {
      graft.dedup.Dedup.propagateLabels(ids, edges, maxRounds = 4).collect()
    }
  }

  test("collectAggGuard scopes the fallback threshold to one query's session clone") {
    val guarded = Tables.collectAggGuard(
      Tables.load(spark, dir, "events").groupBy("user_id")
        .agg(collect_list(col("event_type")).as("evs"))
        .select(col("user_id"), size(col("evs")).as("n")))
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    assert(guarded.sparkSession ne spark, "the plan is rebound onto a clone")
    assert(guarded.sparkSession.conf.get(key) == "65536",
      "the clone carries the collect-shape spill guard")
    assert(spark.conf.get(key) == "2000000",
      "the shared session keeps the argmax-sized raise")
    // and the rebind is transparent to results
    val direct = Tables.load(spark, dir, "events").groupBy("user_id")
      .agg(size(collect_list(col("event_type"))).as("n"))
    assert(guarded.orderBy("user_id").collect().toSeq ==
      direct.orderBy("user_id").collect().toSeq)
  }

  test("matryoshka recall: full-dim row is exactly 1.0, truncated rows are valid recalls") {
    val rows = graft.similarity.Ann.matryoshkaRecall(spark, dir).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("prefix_den")).toSeq == Seq(4L, 2L, 1L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_retrieved") == 10L, "each level returns a full top-k page")
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_common") == math.round(rec * 10))
    }
    val full = rows.find(_.getAs[Long]("prefix_den") == 1L).get
    assert(full.getAs[Double]("recall_at_k") == 1.0,
      "the untruncated level IS the ground truth — recall 1.0 by construction")
  }

  test("whitening effect: whitened corpus is near-isotropic, raw anisotropy reproduced") {
    val r = graft.similarity.Ann.whiteningEffect(spark, dir).collect()(0)
    val aniso = graft.similarity.Ann.anisotropy(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_vectors") == aniso.getAs[Long]("n_vectors"))
    assert(math.abs(r.getAs[Double]("mpc_raw") -
      aniso.getAs[Double]("mean_pairwise_cosine")) < 1e-12,
      "the raw leg IS the anisotropy operator's measurement")
    // per-dim standardization centers every dimension, so the whitened
    // centroid is ~0 and the mean pairwise cosine collapses toward
    // -1/(n-1) (the exact value for any centered cloud)
    val n = r.getAs[Long]("n_vectors").toDouble
    assert(math.abs(r.getAs[Double]("mpc_whitened") + 1.0 / (n - 1.0)) < 0.02,
      s"whitened mpc ${r.getAs[Double]("mpc_whitened")} should sit near ${-1.0 / (n - 1.0)}")
    assert(r.getAs[Double]("isotropy_gain") ==
      r.getAs[Double]("mpc_raw") - r.getAs[Double]("mpc_whitened"))
  }

  test("decontaminate: per-source partition is exact, drops cover the exact-hash detector") {
    val rows = graft.dedup.Dedup.decontaminate(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") == r.getAs[Long]("n_train"),
        s"source ${r.getString(0)}: kept + dropped must partition the training split")
      assert(r.getAs[Double]("drop_share") ==
        r.getAs[Long]("n_dropped").toDouble / r.getAs[Long]("n_train"))
    }
    // the drop set is the UNION of both detectors, so it can never be
    // smaller than the exact-hash detector's own count
    val totalDropped = rows.map(_.getAs[Long]("n_dropped")).sum
    val exact = graft.dedup.Dedup.contamination(spark, dir).collect()(0)
    assert(totalDropped >= exact.getAs[Long]("n_contaminated"),
      "union of detectors must cover the exact-hash flag set")
    assert(rows.map(_.getAs[Long]("n_train")).sum == exact.getAs[Long]("n_train"),
      "per-source totals must re-add to the detector's train count")
  }

  test("collectAggGuard's memoized clone re-mirrors the parent's layout confs per call") {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val guarded = Tables.collectAggGuard(
        Tables.load(spark, dir, "events").groupBy("user_id")
          .agg(count(lit(1)).as("n")))
      assert(guarded.sparkSession.conf.get("spark.sql.shuffle.partitions") == "5",
        "a layout override set AFTER the clone was born must reach the guarded plan " +
          "(otherwise the invariance sweep is vacuous for guarded queries)")
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("native as-of join compiles into whole-stage codegen (no silent fallback)") {
    val df = SparkEntry.queries("q_asof_join_native")(spark, dir)
    df.collect() // AQE materializes codegen stages only in the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("\n").exists(l => l.contains("AsOfJoin") && l.contains("*(")),
      s"AsOfJoinExec must sit INSIDE a WholeStageCodegen stage (the '*(n)' prefix):\n$plan")
    // fallback=false turns a generated-code compile failure into a hard
    // error instead of a silent interpreted retry — executing under it
    // proves the stage actually compiled
    val old = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val native = SparkEntry.queries("q_asof_join_native")(spark, dir)
        .collect().map(_.toString).sorted
      val composed = SparkEntry.queries("q_asof_join_composed")(spark, dir)
        .collect().map(_.toString).sorted
      assert(native.nonEmpty && native.sameElements(composed),
        "codegen'd merge must agree bit-for-bit with the composed form")
    } finally spark.conf.set("spark.sql.codegen.fallback", old)
  }

  test("native as-of join interpreted fallback still agrees (codegen off)") {
    val old = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val native = SparkEntry.queries("q_asof_join_native")(spark, dir)
        .collect().map(_.toString).sorted
      val composed = SparkEntry.queries("q_asof_join_composed")(spark, dir)
        .collect().map(_.toString).sorted
      assert(native.nonEmpty && native.sameElements(composed))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }

  test("guarded queries (paragraphRewrite, auditChain) execute under the clone and stay correct") {
    val pr = graft.dedup.Dedup.paragraphRewrite(spark, dir)
    assert(pr.sparkSession ne spark)
    assert(pr.count() >= 0L) // executes without error under the clone
    val ac = graft.cdc.Monitoring.auditChain(graft.cdc.Cdc.changelog(spark, dir))
    assert(ac.sparkSession ne spark)
    val row = ac.limit(1).collect()
    assert(row.nonEmpty && row(0).getString(2).length == 32, "md5 chain hash present")
  }
}
