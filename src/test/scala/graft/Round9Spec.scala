package graft

import graft.cdc.Monitoring
import graft.similarity.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-9 operator batch. */
class Round9Spec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("kmeans converge: trajectory is partition-order independent bit-for-bit") {
    // the operator's 2^40-quantized sums must make the trajectory exactly
    // reproducible under a different shuffle layout — the property that
    // lets a 1000-executor run and a laptop agree on the same index
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = Ann.kmeansConverge(spark, dir).collect().map(_.toString)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Ann.kmeansConverge(spark, dir).collect().map(_.toString)
      assert(a.sameElements(b), "trajectory must not depend on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("kmeans converge: once converged, the fixed point persists") {
    val rows = Ann.kmeansConverge(spark, dir).collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_moved") >= 0L)
      assert(r.getAs[Long]("n_active_labels") >= 1L)
      assert(Option(r.getAs[Double]("max_shift")).forall(_ >= 0.0))
      assert(r.getAs[Boolean]("converged") === (r.getAs[Long]("n_moved") == 0L))
    }
    // Lloyd is idempotent at a fixed point: converged can never revert
    val flags = rows.map(_.getAs[Boolean]("converged"))
    flags.zip(flags.tail).foreach { case (prev, next) =>
      assert(!prev || next, "a converged round must stay converged")
    }
    // moving zero vectors forces a zero centroid shift
    rows.filter(_.getAs[Boolean]("converged")).foreach { r =>
      assert(r.getAs[Double]("max_shift") === 0.0)
    }
  }

  test("checkpoint browse: checkpoints tile the stream, positions are per-table maxima") {
    val rows = Monitoring.checkpointBrowse(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
    assert(rows.map(_.getAs[Long]("rows_processed")).sum === ev.count())
    assert(rows.map(r => (r.getAs[String]("pipeline_id"), r.getAs[String]("table_name"))).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getAs[String]("checkpoint_id") ===
        r.getAs[String]("pipeline_id") + "_" + r.getAs[String]("table_name"))
      assert(r.getAs[String]("checkpoint_type") === "lsn")
    }
    // re-derive one checkpoint from the raw events
    val first = rows.head
    val cohort = first.getAs[String]("pipeline_id").stripPrefix("pl_").toInt
    val expected = ev
      .where(col("user_id") % 3 === cohort && col("event_type") === first.getAs[String]("table_name"))
      .agg(max("event_id"), count(lit(1))).collect()(0)
    assert(first.getAs[Long]("lsn") === expected.getLong(0))
    assert(first.getAs[Long]("rows_processed") === expected.getLong(1))
  }

  test("schema catalog: the static catalog the SQL byte model derives from equals the live schemas") {
    // sizeEstimateSql is generated from Discovery.schemaCatalog (the SQL
    // string must exist before any session does); this pin makes a schema
    // change fail HERE, loudly, instead of as a bench-time hash mismatch
    graft.cdc.Discovery.schemaCatalog.foreach { case (t, cols) =>
      val live = Tables.load(spark, dir, t).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toSeq
      assert(cols === live, s"schemaCatalog diverged from live schema for $t")
    }
  }

  test("preview: deterministic PK-ordered head, full schema, clamped limit") {
    val p = graft.cdc.Discovery.preview(spark, dir, "events", 50)
    assert(p.columns.toSeq === Tables.load(spark, dir, "events").columns.toSeq)
    val a = p.collect()
    val b = graft.cdc.Discovery.preview(spark, dir, "events", 50).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)), "preview must be reproducible")
    assert(a.length === 50)
    val ids = a.map(_.getAs[Long]("event_id"))
    assert(ids.sorted.sameElements(ids), "preview rows must arrive in PK order")
    intercept[IllegalArgumentException] {
      graft.cdc.Discovery.preview(spark, dir, "events", 0)
    }
    intercept[IllegalArgumentException] {
      graft.cdc.Discovery.preview(spark, dir, "events", 1001)
    }
  }

  test("connection test: per-type validation verdicts and the parquet_dir probe") {
    import graft.cdc.Discovery.connectionTest
    val none = connectionTest(Map.empty)
    assert(!none.success && none.status === "FAILED" && none.error.contains("database_type is required"))
    val unknown = connectionTest(Map("database_type" -> "sqlite"))
    assert(!unknown.success && unknown.error.contains("Unsupported database_type"))
    val s3NoBucket = connectionTest(Map("database_type" -> "s3",
      "username" -> "AKIA", "password" -> "secret"))
    assert(!s3NoBucket.success && s3NoBucket.error.contains("Bucket name is required"))
    val s3Ok = connectionTest(Map("database_type" -> "S3",
      "database" -> "bkt", "username" -> "AKIA", "password" -> "secret"))
    assert(s3Ok.success && s3Ok.status === "VALIDATED" && !s3Ok.probed)
    val pgNoHost = connectionTest(Map("database_type" -> "postgresql",
      "port" -> "5432", "database" -> "db", "username" -> "u", "password" -> "p"))
    assert(!pgNoHost.success && pgNoHost.error === "Host is required")
    val probed = connectionTest(Map("database_type" -> "parquet_dir", "path" -> dir))
    assert(probed.success && probed.status === "SUCCESS" && probed.probed)
    val missing = connectionTest(Map("database_type" -> "parquet_dir", "path" -> "/no/such/dir"))
    assert(!missing.success && missing.error.contains("No graft tables"))
  }

  test("load levels: a convention-edge cycle fails loudly instead of hanging") {
    val cyclic = Map("a" -> Set("b"), "b" -> Set("a"))
    intercept[IllegalArgumentException] {
      graft.cdc.Discovery.loadLevels(Seq("a", "b"), cyclic)
    }
    // and the DAG path still assigns longest-path levels
    val dag = Map("lineitem" -> Set("orders", "part"), "orders" -> Set("customer"),
      "customer" -> Set.empty[String], "part" -> Set.empty[String])
    val lv = graft.cdc.Discovery.loadLevels(Seq("lineitem", "orders", "customer", "part"), dag)
    assert(lv("customer") === 0 && lv("part") === 0 && lv("orders") === 1 && lv("lineitem") === 2)
  }

  test("lsn latency trend: the bucket spine is dense — no missing bucket ids") {
    val rows = Monitoring.lsnLatencyTrend(spark, dir).collect()
    val ts = rows.map(_.getAs[java.sql.Timestamp]("bucket").getTime).sorted
    ts.zip(ts.tail).foreach { case (a, b) =>
      assert(b - a === 600000L, "adjacent buckets must be exactly one bucket apart")
    }
    // empty buckets surface with zero arrivals, never as absent rows
    assert(rows.map(_.getAs[Long]("n_arrived")).forall(_ >= 0L))
  }

  test("sync stats: statuses partition the counts and the rate sits on the 2-decimal floor grid") {
    val rows = Monitoring.syncStats(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
    assert(rows.map(_.getAs[Long]("events_captured")).sum === ev.count())
    rows.foreach { r =>
      val total = r.getAs[Long]("events_captured")
      assert(r.getAs[Long]("events_applied") + r.getAs[Long]("events_failed") +
        r.getAs[Long]("events_pending") === total)
      val rate = r.getAs[Double]("success_rate")
      assert(rate === (r.getAs[Long]("events_applied") * 10000L / total).toDouble / 100.0)
      assert(rate >= 0.0 && rate <= 100.0)
    }
  }

}
