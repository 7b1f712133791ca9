package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Scala-visibility bridge into two `private[sql]` session APIs
  * (`SparkSession.cloneSession`, `Dataset.ofRows`) — both public at the
  * bytecode level and stable across the 3.x/4.x line (streaming's
  * micro-batch executor clones sessions the same way).
  *
  * Why it exists: a physical plan reads SQLConf from the session its
  * TERMINAL Dataset is bound to (Dataset actions run under
  * `SparkSession.withActive(sparkSession)`, and `SparkPlan.conf` delegates
  * to that session's state). So the only way to scope a conf override to
  * ONE query — without mutating the shared session around a lazy plan the
  * caller executes later — is to rebind the logical plan onto a
  * conf-tweaked clone. The clone shares the SparkContext, shared state,
  * cached data and (cloned) function registry/temp views, and copies the
  * parent's runtime conf at clone time, so layout confs a harness just set
  * (shuffle partitions, AQE) carry through.
  */
object SessionBridge {

  /** `df`'s plan, rebound onto a clone of its session with `confs`
    * applied — execution of the returned frame (whenever the caller
    * triggers it) sees the overrides; the parent session is untouched. */
  def rebindWithConf(df: DataFrame, confs: (String, String)*): DataFrame = {
    val cdf = df.asInstanceOf[Dataset[Row]]
    val clone: SparkSession = cdf.sparkSession.cloneSession()
    confs.foreach { case (k, v) => clone.conf.set(k, v) }
    Dataset.ofRows(clone, cdf.queryExecution.logical)
  }

  /** Clone `spark` (same SparkContext, shared state — including the
    * shared CacheManager — copied session state). */
  def cloneSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[SparkSession].cloneSession()

  /** Rebind `df`'s logical plan onto `target` (re-analyzed there). */
  def rebind(target: org.apache.spark.sql.SparkSession, df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[Dataset[Row]]
    Dataset.ofRows(target.asInstanceOf[SparkSession], cdf.queryExecution.logical)
  }
}
