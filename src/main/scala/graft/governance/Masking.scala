package graft.governance

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-governance masking — the enforcement half of the reference's
  * policy surface (frontend governance/policy-modal + backend audit):
  * PII columns are tokenized or banded before replication exposes them.
  */
object Masking {

  /** Masked customer replica: name → stable md5 token (joinable but not
    * reversible), account balance → 100-unit band, segment kept. */
  def maskedCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(
        col("c_custkey"),
        substring(md5(col("c_name")), 1, 12).as("name_token"),
        (floor(col("c_acctbal") / 100) * 100).cast(DecimalType(18, 2)).cast("double").as("acctbal_band"),
        col("c_mktsegment"))
      .orderBy("c_custkey")

  val maskedCustomersSql: String =
    """SELECT c_custkey,
      |       substr(md5(c_name), 1, 12) AS name_token,
      |       CAST(CAST(floor(c_acctbal / 100) * 100 AS DECIMAL(18,2)) AS DOUBLE) AS acctbal_band,
      |       c_mktsegment
      |FROM customer ORDER BY c_custkey""".stripMargin
}
