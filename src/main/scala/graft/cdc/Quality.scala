package graft.cdc

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-quality / validation operators — Spark-native form of the
  * reference's post-replication checks:
  *   - row-count source vs target (data_quality.py:23-116,
  *     validation.validate_target_row_count)
  *   - per-column integrity aggregates for sampled compare
  *     (validation.validate_data_integrity)
  *   - schema-drift detection (data_quality.py:117-213)
  */
object Quality {

  /** Source vs target row counts, one row per replicated table. The
    * "target" is the materialized snapshot this engine derives, so count
    * equality is a real end-to-end invariant, not a tautology. */
  def rowcountValidate(spark: SparkSession, dir: String): DataFrame = {
    val changelog = Cdc.changelog(spark, dir)
    // Source-side expectation: keys whose LAST change is not a delete —
    // computed independently of the materializer it validates.
    val expectedLive = changelog
      .groupBy(col("pk"))
      // graft_max_by, not built-in max_by: string-valued MaxBy is not
      // UnsafeRow-mutable, so the built-in plans a grouped SortAggregate
      // over the raw changelog (GlobalPlanAuditSpec's SortAggregate sweep)
      .agg(graft.functions.GraftFunctions.maxByCol(changelog,
        col("op"), struct(col("ts"), col("seq"))).as("last_op"))
      .where(col("last_op") =!= "d")
      .agg(count(lit(1)).as("n"))
      .select(lit("events_keys").as("table_name"), col("n").as("source_rows"))
    val targetKeys = Materialize.latestSnapshot(changelog)
      .agg(count(lit(1)).as("n"))
      .select(lit("events_keys").as("table_name"), col("n").as("target_rows"))

    // Replicated-table invariant: row count equals distinct primary keys.
    val pks: Seq[(String, Seq[String])] = Seq(
      "orders" -> Seq("o_orderkey"),
      "customer" -> Seq("c_custkey"),
      "part" -> Seq("p_partkey"))
    val tableCounts = pks.map { case (t, keys) =>
      Tables.load(spark, dir, t)
        .agg(count(lit(1)).as("source_rows"),
          countDistinct(keys.head, keys.tail: _*).as("target_rows"))
        .select(lit(t).as("table_name"), col("source_rows"), col("target_rows"))
    }.reduce(_ unionAll _)   // one lazy plan, not one driver action per table

    expectedLive.join(targetKeys, "table_name")
      .select(col("table_name"), col("source_rows"), col("target_rows"))
      .unionAll(tableCounts)
      .withColumn("diff", col("source_rows") - col("target_rows"))
      .withColumn("match", col("source_rows") === col("target_rows"))
      .orderBy("table_name")
  }

  /** Per-column integrity aggregates on orders (long format): row count,
    * null count, distinct count, and an exact decimal sum for numerics. */
  def integrityStats(spark: SparkSession, dir: String): DataFrame = {
    // spread: the one-scan multi-aggregate evaluates every per-column
    // expression per row; keep that off a single-split scan task
    val orders = Tables.spread(Tables.load(spark, dir, "orders"))
    // ONE scan computing every per-column aggregate, exploded to the
    // long format afterwards — a union of per-column aggregations would
    // read the table once per column (5 scans here, ruinous at scale)
    val cols = Seq(
      ("o_orderkey", true), ("o_custkey", true), ("o_orderstatus", false),
      ("o_totalprice", true), ("o_orderpriority", false))
    val aggs = cols.flatMap { case (c, numeric) =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        (if (numeric) sum(graft.dec(col(c))).cast(DecimalType(28, 2)).cast("double")
         else lit(null).cast("double")).as(s"${c}_sum"))
    }
    val wide = orders.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = cols.map { case (c, _) =>
      struct(lit(c).as("column_name"), col("n_rows"),
        col(s"${c}_nulls").as("n_nulls"), col(s"${c}_distinct").as("n_distinct"),
        col(s"${c}_sum").as("sum_value"))
    }
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.column_name"), col("e.n_rows"), col("e.n_nulls"),
        col("e.n_distinct"), col("e.sum_value"))
      .orderBy("column_name")
  }

  /** Schema-evolution apply (the sink's auto.evolve: new upstream column
    * appears mid-stream; old rows take NULL). Old-schema and new-schema
    * batches union by name; output verifies the evolved shape. */
  def schemaEvolve(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val oldBatch = orders.where(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val newBatch = orders.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        concat(lit("chan_"), (col("o_orderkey") % 3).cast("string")).as("o_channel"))
    oldBatch.unionByName(newBatch, allowMissingColumns = true)
      .groupBy(coalesce(col("o_channel"), lit("(pre-evolution)")).as("o_channel"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(graft.dec(col("o_totalprice"))).cast(DecimalType(28, 2)).cast("double").as("total_price"))
      .orderBy("o_channel")
  }

  /** Schema-drift report: canonical-type compare of the live source schema
    * vs the deployed target schema (simulated as the source minus
    * o_orderpriority with o_totalprice re-typed to string — the classic
    * drift the reference detects). Output: one row per column with status
    * ok / type_changed / removed_in_target / added_in_target. */
  /** Sampled row-level data-integrity compare
    * (validation.validate_data_integrity's sampled mode): a deterministic
    * digest sample of source keys is joined against the target and each
    * sampled row's value compared. The "target" here is the materialized
    * snapshot with a deterministic fault injection (value drift on
    * pk≡0 mod 97, missing rows on pk≡0 mod 131) so the comparator
    * provably detects both failure classes. Sampling by content digest —
    * not rand() — keeps the check reproducible across runs and engines.
    * Costs one key-partitioned join over the ~10% sample only. */
  def sampleCompare(spark: SparkSession, dir: String): DataFrame = {
    val source = Materialize.latestSnapshot(Cdc.changelog(spark, dir))
      .select(col("user_id"), col("last_value"))
    val target = source
      .where(pmod(col("user_id"), lit(131)) =!= 0)
      .select(col("user_id"),
        when(pmod(col("user_id"), lit(97)) === 0, col("last_value") + 0.01)
          .otherwise(col("last_value")).as("target_value"))
    val sampled = source
      .where(conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10 < 3)
    sampled.join(target, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_sampled"),
        count(when(col("target_value").isNull, 1)).as("n_missing_target"),
        count(when(col("target_value") === col("last_value"), 1)).as("n_match"),
        count(when(col("target_value").isNotNull &&
          col("target_value") =!= col("last_value"), 1)).as("n_mismatch"))
  }

  def sampleCompareSql(changelogSql: String): String =
    s"""$changelogSql, ranked AS (
       |  SELECT pk, op, value, ts,
       |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn
       |  FROM changelog),
       |source AS (
       |  SELECT pk AS user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
       |  FROM ranked WHERE rn = 1 AND op <> 'd'),
       |target AS (
       |  SELECT user_id,
       |         CASE WHEN user_id % 97 = 0 THEN last_value + 0.01 ELSE last_value END AS target_value
       |  FROM source WHERE user_id % 131 <> 0),
       |sampled AS (
       |  SELECT * FROM source
       |  WHERE CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 10 < 3)
       |SELECT count(*) AS n_sampled,
       |       count(CASE WHEN t.target_value IS NULL THEN 1 END) AS n_missing_target,
       |       count(CASE WHEN t.target_value = s.last_value THEN 1 END) AS n_match,
       |       count(CASE WHEN t.target_value IS NOT NULL AND t.target_value <> s.last_value THEN 1 END) AS n_mismatch
       |FROM sampled s LEFT JOIN target t USING (user_id)""".stripMargin

  /** Right-to-be-forgotten propagation (the governance operation behind
    * the reference's masking/audit surface): an erasure list — keys whose
    * LAST op is a delete — is anti-joined out of the materialized state,
    * and the audit row reports how many state rows and history rows the
    * erasure touches. The erasure list derives from the data itself so
    * both engines construct it identically; the anti join is a broadcast
    * of the (small) erasure list against the state. A delete already
    * drops the live row, so the interesting number is the HISTORY rows a
    * full GDPR purge must also rewrite. */
  def gdprErasure(spark: SparkSession, dir: String): DataFrame = {
    val changelog = Cdc.changelog(spark, dir)
    val erasure = changelog
      .groupBy(col("pk"))
      // graft_max_by keeps this on the hash-aggregate path (see
      // rowcountValidate) — the erasure list scans the full changelog
      .agg(graft.functions.GraftFunctions.maxByCol(changelog,
        col("op"), struct(col("ts"), col("seq"))).as("last_op"))
      .where(col("last_op") === "d")
      .select(col("pk"))
    val historyTouched = changelog.join(broadcast(erasure), "pk")
    val stateRows = Materialize.latestSnapshot(changelog)
    erasure.agg(count(lit(1)).as("n_erased_keys"))
      .crossJoin(historyTouched.agg(count(lit(1)).as("n_history_rows_purged")))
      .crossJoin(stateRows.agg(count(lit(1)).as("n_state_rows_remaining")))
  }

  def gdprErasureSql(changelogSql: String): String =
    s"""$changelogSql, ranked AS (
       |  SELECT pk, op, row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn
       |  FROM changelog),
       |erasure AS (SELECT pk FROM ranked WHERE rn = 1 AND op = 'd')
       |SELECT (SELECT count(*) FROM erasure) AS n_erased_keys,
       |       (SELECT count(*) FROM changelog c JOIN erasure e USING (pk)) AS n_history_rows_purged,
       |       (SELECT count(*) FROM ranked WHERE rn = 1 AND op <> 'd') AS n_state_rows_remaining""".stripMargin

  /** Order-independent table checksums: one row per replicated table with
    * a content checksum (exact integer sum of per-row digests) — the
    * cheap replica comparison that replaces row-by-row diffing when the
    * counts already match. Any changed, missing or duplicated row moves
    * the sum; summation order cannot (exact BIGINT addition is
    * commutative on both engines). */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    // per-row digests sum in DECIMAL(38,0) — a BIGINT sum would silently
    // wrap past ~9.2e9 rows on Spark while DuckDB's HUGEINT sum errors on
    // the cast, making matching replicas compare as corrupt; the final
    // mod-P fold keeps the published checksum a stable BIGINT
    def sumOf(name: String, keyExpr: org.apache.spark.sql.Column) =
      // spread: per-row md5 digests below the scalar aggregate
      Tables.spread(Tables.load(spark, dir, name))
        .select((conv(substring(md5(keyExpr), 1, 15), 16, 10).cast("long") % P)
          .cast(DecimalType(38, 0)).as("h"))
        .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("hs"))
        .select(lit(name).as("table_name"), col("n_rows"),
          (col("hs") % P).cast("long").as("checksum"))
    sumOf("orders", concat_ws("|", col("o_orderkey"), col("o_orderstatus")))
      .unionAll(sumOf("customer", concat_ws("|", col("c_custkey"), col("c_mktsegment"))))
      .unionAll(sumOf("part", concat_ws("|", col("p_partkey"))))
      .orderBy("table_name")
  }

  val tableChecksumSql: String =
    """SELECT * FROM (
      |  SELECT 'orders' AS table_name, count(*) AS n_rows,
      |         CAST(sum(CAST('0x' || substr(md5(concat_ws('|', o_orderkey, o_orderstatus)), 1, 15) AS BIGINT) % 1000000007) % 1000000007 AS BIGINT) AS checksum
      |  FROM orders
      |  UNION ALL
      |  SELECT 'customer', count(*),
      |         CAST(sum(CAST('0x' || substr(md5(concat_ws('|', c_custkey, c_mktsegment)), 1, 15) AS BIGINT) % 1000000007) % 1000000007 AS BIGINT)
      |  FROM customer
      |  UNION ALL
      |  SELECT 'part', count(*),
      |         CAST(sum(CAST('0x' || substr(md5(concat_ws('|', p_partkey)), 1, 15) AS BIGINT) % 1000000007) % 1000000007 AS BIGINT)
      |  FROM part)
      |ORDER BY table_name""".stripMargin

  /** Pre-provisioning schema-compatibility verdict — the yes/no a user
    * runs BEFORE creating a pipeline, rolled up from the column diff the
    * way the reference's `validate_schema_compatibility` does
    * (schema_service.py:1455-1539): compatibility is decided on column
    * NAMES only — any source column missing in the target ⇒ incompatible;
    * extra target columns are tolerated; an absent target table is
    * compatible ("can be created"). One row per table: `customer` drifts
    * by one extra audit column (compatible), `orders` drifts by a dropped
    * column (incompatible, same drift scenario as [[schemaDrift]]), and
    * `part` has no target yet. Schema metadata lives on the driver, so
    * this is a bounded 3-row toDF, like [[schemaDrift]]. */
  def schemaCompat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def verdict(table: String, source: DataFrame,
                target: Option[DataFrame]): (String, Boolean, String, Long, Long, String, String) = {
      val c = SchemaDdl.compatibility(source.schema, target.map(_.schema))
      (table, c.compatible, c.message, c.sourceColumns.toLong,
        c.targetColumns.toLong, c.missingColumns.mkString(","),
        c.extraColumns.mkString(","))
    }
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val part = Tables.load(spark, dir, "part")
    Seq(
      verdict("customer", customer,
        Some(customer.withColumn("c_sync_ts", current_timestamp()))),
      verdict("orders", orders,
        Some(orders.drop("o_orderpriority")
          .withColumn("o_totalprice", col("o_totalprice").cast("string"))
          .withColumn("o_sync_ts", col("o_orderdate")))),
      verdict("part", part, None),
    ).toDF("table_name", "compatible", "message", "n_source_columns",
      "n_target_columns", "missing_columns", "extra_columns")
      .orderBy("table_name")
  }

  val schemaCompatSql: String =
    """WITH so AS (SELECT column_name FROM (DESCRIBE SELECT * FROM orders)),
      |tg AS (SELECT column_name FROM (DESCRIBE SELECT o_orderkey, o_custkey, o_orderstatus,
      |       CAST(o_totalprice AS VARCHAR) AS o_totalprice, o_orderdate,
      |       o_orderdate AS o_sync_ts FROM orders)),
      |sc AS (SELECT column_name FROM (DESCRIBE SELECT * FROM customer)),
      |tc AS (SELECT column_name FROM (DESCRIBE SELECT *, now() AS c_sync_ts FROM customer))
      |SELECT * FROM (
      |  SELECT 'customer' AS table_name,
      |         (SELECT count(*) FROM sc WHERE column_name NOT IN (SELECT column_name FROM tc)) = 0 AS compatible,
      |         CASE WHEN (SELECT count(*) FROM sc WHERE column_name NOT IN (SELECT column_name FROM tc)) = 0
      |              THEN 'Compatible' ELSE 'Incompatible - missing columns in target' END AS message,
      |         (SELECT count(*) FROM sc) AS n_source_columns,
      |         (SELECT count(*) FROM tc) AS n_target_columns,
      |         coalesce((SELECT string_agg(column_name, ',' ORDER BY column_name) FROM sc
      |                   WHERE column_name NOT IN (SELECT column_name FROM tc)), '') AS missing_columns,
      |         coalesce((SELECT string_agg(column_name, ',' ORDER BY column_name) FROM tc
      |                   WHERE column_name NOT IN (SELECT column_name FROM sc)), '') AS extra_columns
      |  UNION ALL
      |  SELECT 'orders',
      |         (SELECT count(*) FROM so WHERE column_name NOT IN (SELECT column_name FROM tg)) = 0,
      |         CASE WHEN (SELECT count(*) FROM so WHERE column_name NOT IN (SELECT column_name FROM tg)) = 0
      |              THEN 'Compatible' ELSE 'Incompatible - missing columns in target' END,
      |         (SELECT count(*) FROM so), (SELECT count(*) FROM tg),
      |         coalesce((SELECT string_agg(column_name, ',' ORDER BY column_name) FROM so
      |                   WHERE column_name NOT IN (SELECT column_name FROM tg)), ''),
      |         coalesce((SELECT string_agg(column_name, ',' ORDER BY column_name) FROM tg
      |                   WHERE column_name NOT IN (SELECT column_name FROM so)), '')
      |  UNION ALL
      |  SELECT 'part', TRUE, 'Target table does not exist - can be created',
      |         (SELECT count(*) FROM (DESCRIBE SELECT * FROM part)), 0, '', '')
      |ORDER BY table_name""".stripMargin

  def schemaDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val source = Tables.load(spark, dir, "orders")
    val target = source
      .drop("o_orderpriority")
      .withColumn("o_totalprice", col("o_totalprice").cast("string"))
      .withColumn("o_sync_ts", col("o_orderdate"))

    def canon(t: org.apache.spark.sql.types.DataType): String = t.simpleString match {
      case s if s.startsWith("timestamp") => "timestamp"
      case s if s.startsWith("decimal") => "decimal"
      case "int" => "int"
      case s => s
    }
    val src = source.schema.fields.map(f => f.name -> canon(f.dataType)).toMap
    val tgt = target.schema.fields.map(f => f.name -> canon(f.dataType)).toMap
    (src.keySet ++ tgt.keySet).toSeq.sorted.map { name =>
      (name, src.get(name).orNull, tgt.get(name).orNull,
        (src.get(name), tgt.get(name)) match {
          case (Some(s), Some(t)) => if (s == t) "ok" else "type_changed"
          case (Some(_), None) => "removed_in_target"
          case _ => "added_in_target"
        })
    }.toDF("column_name", "source_type", "target_type", "status")
      .orderBy("column_name")
  }
}
