package graft.cdc

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, StringType}

/** Catalog discovery — the Spark-native form of the reference's
  * discovery_service.py (list databases/schemas/tables/columns for the
  * pipeline wizard). Here the "database" is a scale-factor directory of
  * parquet tables; against a warehouse the same surface binds to
  * spark.catalog / JDBC metadata.
  */
object Discovery {

  /** One row per table: name, column count, schema DDL. */
  def listTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.all.map { t =>
      val schema = Tables.load(spark, dir, t).schema
      (t, schema.fields.length, schema.toDDL)
    }.toDF("table_name", "n_columns", "schema_ddl")
      .orderBy("table_name")
  }

  /** One row per column of a table: name, type, nullability. */
  def describeTable(spark: SparkSession, dir: String, table: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, table).schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("column_name", "data_type", "nullable")
  }

  /** Table size estimation — the pre-transfer planning probe behind the
    * reference's `/tables/size-estimate` endpoint (api.py; feeds
    * transfer.py's chunked full-load): per table, the row count, a
    * data-driven byte estimate from a fixed per-column model
    * (4/8 bytes for int32 / 64-bit scalars & timestamps, character
    * counts for strings, 4·len for float arrays — the same arithmetic on
    * both engines, so the estimate is oracle-checkable), the mean row
    * width and the chunk count a 16 MB-target chunked copy would plan
    * ([[graft.cdc.Materialize]]'s snapshot chunking consumes this).
    *
    * Scale shape: one scan + one scalar aggregation per table (each
    * aggregate is a map-side-combined sum over the scan — no shuffle of
    * rows), unioned into a |tables|-row result. */
  def sizeEstimate(spark: SparkSession, dir: String,
                   chunkBytes: Long = 16L * 1024 * 1024): DataFrame = {
    val per = Tables.all.map { t =>
      val df = Tables.load(spark, dir, t)
      val rowBytes: Column = df.schema.fields.map { f =>
        f.dataType match {
          case StringType => coalesce(length(col(f.name)).cast("long"), lit(0L))
          case IntegerType => lit(4L)
          case ArrayType(FloatType, _) =>
            coalesce(size(col(f.name)).cast("long") * 4L, lit(0L))
          case _ => lit(8L) // int64 / double / timestamp
        }
      }.reduce(_ + _)
      df.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(rowBytes), lit(0L)).as("est_bytes"))
        .select(lit(t).as("table_name"), col("n_rows"), col("est_bytes"))
    }
    per.reduce(_ unionAll _)
      .withColumn("est_row_bytes",
        col("est_bytes").cast("double") / col("n_rows").cast("double"))
      .withColumn("n_chunks",
        greatest(expr(s"(est_bytes + ${chunkBytes - 1}L) div ${chunkBytes}L"), lit(1L)))
      .orderBy("table_name")
  }

  val sizeEstimateSql: String = {
    val models = Seq(
      "region" -> "4 + length(r_name)",
      "nation" -> "4 + length(n_name) + 4",
      "customer" -> "8 + length(c_name) + 4 + 8 + length(c_mktsegment)",
      "supplier" -> "8 + length(s_name) + 4 + 8",
      "part" -> "8 + length(p_name) + length(p_brand) + length(p_type) + 4 + 8",
      "orders" -> "8 + 8 + length(o_orderstatus) + 8 + 8 + length(o_orderpriority)",
      "lineitem" -> "8 + 8 + 8 + 4 + 8 + 8 + 8 + 8 + length(l_returnflag) + length(l_linestatus) + 8",
      "events" -> "8 + 8 + 8 + length(event_type) + 8 + length(props)",
      "documents" -> "8 + length(text) + length(lang) + length(source) + 8",
      "embeddings" -> "8 + 4 * len(embedding) + 4")
    val union = models.map { case (t, m) =>
      s"""SELECT '$t' AS table_name, count(*) AS n_rows,
         |       CAST(coalesce(sum($m), 0) AS BIGINT) AS est_bytes FROM $t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH s AS (
       |$union)
       |SELECT table_name, n_rows, est_bytes,
       |       CAST(est_bytes AS DOUBLE) / CAST(n_rows AS DOUBLE) AS est_row_bytes,
       |       greatest((est_bytes + ${16L * 1024 * 1024 - 1}) // ${16L * 1024 * 1024}, 1) AS n_chunks
       |FROM s ORDER BY table_name""".stripMargin
  }

  /** Dependency-ordered load plan — the reference's
    * `/tables/{t}/dependencies` surface applied to full-load planning
    * (api.py; the reference's fix-pipeline scripts exist because loading
    * child tables before parents violates FKs): foreign keys are derived
    * by the TPC-H column-name convention (a column `x_<stem>key` in T
    * references the other table whose name starts with `<stem>`), then
    * each table gets its longest-path depth — load level L tables can
    * start once L-1 finished, tables sharing a level copy in parallel.
    *
    * This is CATALOG work: inputs are the ≤|tables|·|columns| schema
    * fields, not data, so the plan is computed driver-side and emitted
    * as a literal frame (the ConnectorConfig generation-only pattern) —
    * the oracle recomputes it independently from information_schema via
    * a recursive CTE, so the convention itself is cross-checked. */
  def loadOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pat = "^[a-z]+_([a-z]+)key$".r
    val cols = Tables.all.map(t => t -> Tables.load(spark, dir, t).schema.fieldNames.toSeq).toMap
    val edges: Map[String, Set[String]] = cols.map { case (t, cs) =>
      t -> cs.flatMap(c => pat.findFirstMatchIn(c).map(_.group(1)))
        .flatMap(stem => Tables.all.filter(u => u != t && u.startsWith(stem)))
        .toSet
    }
    var level = Tables.all.map(_ -> 0).toMap
    var changed = true
    while (changed) {
      changed = false
      for (t <- Tables.all; d <- edges(t))
        if (level(t) < level(d) + 1) { level += t -> (level(d) + 1); changed = true }
    }
    Tables.all.map { t =>
      val deps = edges(t).toSeq.sorted
      (t, level(t).toLong, deps.length.toLong, deps.mkString(","))
    }.toDF("table_name", "load_level", "n_deps", "depends_on")
      .orderBy("load_level", "table_name")
  }

  val loadOrderSql: String = {
    val tabs = Tables.all.map(t => s"'$t'").mkString(", ")
    s"""WITH RECURSIVE cols AS (
       |  SELECT table_name, column_name FROM information_schema.columns
       |  WHERE table_name IN ($tabs)),
       |tabs AS (SELECT DISTINCT table_name FROM cols),
       |stems AS (
       |  SELECT table_name, regexp_extract(column_name, '^[a-z]+_([a-z]+)key$$', 1) AS stem
       |  FROM cols WHERE regexp_matches(column_name, '^[a-z]+_([a-z]+)key$$')),
       |edges AS (
       |  SELECT DISTINCT s.table_name AS tbl, t.table_name AS dep
       |  FROM stems s JOIN tabs t
       |    ON t.table_name <> s.table_name AND starts_with(t.table_name, s.stem)),
       |paths AS (
       |  SELECT table_name AS tbl, 0 AS depth FROM tabs
       |  UNION ALL
       |  SELECT e.tbl, p.depth + 1 FROM edges e JOIN paths p ON e.dep = p.tbl),
       |lv AS (SELECT tbl, CAST(max(depth) AS BIGINT) AS load_level FROM paths GROUP BY tbl),
       |deps AS (
       |  SELECT tbl, CAST(count(*) AS BIGINT) AS n_deps,
       |         string_agg(dep, ',' ORDER BY dep) AS depends_on
       |  FROM edges GROUP BY tbl)
       |SELECT l.tbl AS table_name, l.load_level,
       |       coalesce(d.n_deps, 0) AS n_deps,
       |       coalesce(d.depends_on, '') AS depends_on
       |FROM lv l LEFT JOIN deps d ON d.tbl = l.tbl
       |ORDER BY load_level, table_name""".stripMargin
  }
}
