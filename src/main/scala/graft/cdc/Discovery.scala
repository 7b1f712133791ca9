package graft.cdc

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
