package graft.cdc

import org.apache.spark.sql.types._

/** Cross-dialect DDL generation — the Spark-native form of the reference's
  * target-table creation (reference: backend/ingestion/schema_service.py
  * create_target_table / _create_sqlserver_table / _create_postgresql_table
  * / _create_oracle_table / _create_snowflake_table and
  * transfer.py:163-192 _get_type_mapping).
  *
  * Input is a Catalyst schema (the engine's single source of truth);
  * output is the CREATE TABLE statement for the target warehouse dialect.
  */
object SchemaDdl {

  sealed trait Dialect { def name: String }
  case object Postgres extends Dialect { val name = "postgresql" }
  case object SqlServer extends Dialect { val name = "sqlserver" }
  case object Oracle extends Dialect { val name = "oracle" }
  case object Snowflake extends Dialect { val name = "snowflake" }

  /** Spark type → target dialect column type. */
  def columnType(dt: DataType, dialect: Dialect): String = (dt, dialect) match {
    case (LongType, Postgres) => "BIGINT"
    case (LongType, SqlServer) => "BIGINT"
    case (LongType, Oracle) => "NUMBER(19)"
    case (LongType, Snowflake) => "NUMBER(19,0)"
    case (IntegerType, Postgres) => "INTEGER"
    case (IntegerType, SqlServer) => "INT"
    case (IntegerType, Oracle) => "NUMBER(10)"
    case (IntegerType, Snowflake) => "NUMBER(10,0)"
    case (DoubleType, Postgres) => "DOUBLE PRECISION"
    case (DoubleType, SqlServer) => "FLOAT"
    case (DoubleType, Oracle) => "BINARY_DOUBLE"
    case (DoubleType, Snowflake) => "DOUBLE"
    case (FloatType, Postgres) => "REAL"
    case (FloatType, SqlServer) => "REAL"
    case (FloatType, Oracle) => "BINARY_FLOAT"
    case (FloatType, Snowflake) => "FLOAT"
    case (BooleanType, Postgres) => "BOOLEAN"
    case (BooleanType, SqlServer) => "BIT"
    case (BooleanType, Oracle) => "NUMBER(1)"
    case (BooleanType, Snowflake) => "BOOLEAN"
    case (d: DecimalType, Postgres) => s"NUMERIC(${d.precision},${d.scale})"
    case (d: DecimalType, SqlServer) => s"DECIMAL(${d.precision},${d.scale})"
    case (d: DecimalType, Oracle) => s"NUMBER(${d.precision},${d.scale})"
    case (d: DecimalType, Snowflake) => s"NUMBER(${d.precision},${d.scale})"
    case (StringType, Postgres) => "TEXT"
    case (StringType, SqlServer) => "NVARCHAR(MAX)"
    case (StringType, Oracle) => "CLOB"
    case (StringType, Snowflake) => "VARCHAR"
    case (BinaryType, Postgres) => "BYTEA"
    case (BinaryType, SqlServer) => "VARBINARY(MAX)"
    case (BinaryType, Oracle) => "BLOB"
    case (BinaryType, Snowflake) => "BINARY"
    case (TimestampType | TimestampNTZType, Postgres) => "TIMESTAMP"
    case (TimestampType | TimestampNTZType, SqlServer) => "DATETIME2"
    case (TimestampType | TimestampNTZType, Oracle) => "TIMESTAMP"
    case (TimestampType | TimestampNTZType, Snowflake) => "TIMESTAMP_NTZ"
    case (DateType, Postgres) => "DATE"
    case (DateType, SqlServer) => "DATE"
    case (DateType, Oracle) => "DATE"
    case (DateType, Snowflake) => "DATE"
    case (other, d) =>
      throw new IllegalArgumentException(s"no ${d.name} mapping for ${other.simpleString}")
  }

  /** Quote an identifier, escaping embedded quote characters — an
    * upstream column literally named `a"b` (legal in Postgres) or `a]b`
    * must not break out of the quoting and inject into the DDL. */
  private def quote(ident: String, dialect: Dialect): String = dialect match {
    case SqlServer => "[" + ident.replace("]", "]]") + "]"
    case _ => "\"" + ident.replace("\"", "\"\"") + "\""
  }

  /** Bounded-string key type: NVARCHAR(MAX)/CLOB/TEXT cannot be index or
    * key columns; Debezium's JDBC sink sizes key strings the same way. */
  private def keyStringType(dialect: Dialect): String = dialect match {
    case Postgres => "VARCHAR(255)"
    case SqlServer => "NVARCHAR(255)"
    case Oracle => "VARCHAR2(255)"
    case Snowflake => "VARCHAR(255)"
  }

  /** CREATE TABLE DDL for a Catalyst schema, with optional primary key —
    * what the sink's auto.create would issue on the target. Primary-key
    * columns are forced NOT NULL (parquet-derived Catalyst schemas are
    * nullable by default, and e.g. SQL Server rejects a PK over a
    * nullable column outright) and string keys take the bounded type. */
  def createTableDdl(
      table: String,
      schema: StructType,
      dialect: Dialect,
      primaryKey: Seq[String] = Nil): String = {
    val pkSet = primaryKey.toSet
    val cols = schema.fields.map { f =>
      val isKey = pkSet(f.name)
      val nullable = if (f.nullable && !isKey) "" else " NOT NULL"
      val tpe =
        if (isKey && f.dataType == StringType) keyStringType(dialect)
        else columnType(f.dataType, dialect)
      s"  ${quote(f.name, dialect)} $tpe$nullable"
    }
    val pk =
      if (primaryKey.isEmpty) Nil
      else Seq(s"  PRIMARY KEY (${primaryKey.map(quote(_, dialect)).mkString(", ")})")
    s"CREATE TABLE ${quote(table, dialect)} (\n${(cols ++ pk).mkString(",\n")}\n)"
  }

  /** The ALTER statements (and warnings) that bring a live target table
    * in line with a drifted source schema. */
  case class AlterPlan(statements: Seq[String], warnings: Seq[String]) {
    def hasChanges: Boolean = statements.nonEmpty
  }

  /** Cross-dialect schema sync: the delta DDL that updates a LIVE target
    * to match a drifted source (reference: backend/ingestion/
    * schema_service.py:1346 sync_schema — added / removed / modified
    * column classification — executed rather than just reported).
    *
    * Policy, matching the reference and safe replication practice:
    *  - columns only in the source → ALTER TABLE ADD, but always
    *    nullable: the target already has rows, and a NOT NULL add
    *    without a default fails on every dialect. A source NOT NULL
    *    becomes a warning telling the operator to backfill then
    *    tighten.
    *  - type changed (canonical Catalyst type differs) → the dialect's
    *    column-retype form (ALTER COLUMN … TYPE / ALTER COLUMN …  /
    *    MODIFY / SET DATA TYPE).
    *  - nullability relaxed or tightened (same type) → SET/DROP NOT
    *    NULL where the dialect has it; SQL Server restates the type.
    *    Tightening emits a warning (fails if existing rows hold nulls).
    *  - columns only in the target → NO statement, a warning only: the
    *    reference never drops target columns, and neither do we.
    */
  def alterTableDdl(
      table: String,
      source: StructType,
      target: StructType,
      dialect: Dialect): AlterPlan = {
    val t = quote(table, dialect)
    val tgtByName = target.fields.map(f => f.name -> f).toMap
    val srcNames = source.fields.map(_.name).toSet
    val stmts = scala.collection.mutable.ArrayBuffer.empty[String]
    val warns = scala.collection.mutable.ArrayBuffer.empty[String]

    source.fields.foreach { f =>
      val c = quote(f.name, dialect)
      val tpe = columnType(f.dataType, dialect)
      tgtByName.get(f.name) match {
        case None =>
          stmts += (dialect match {
            case Postgres | Snowflake => s"ALTER TABLE $t ADD COLUMN $c $tpe"
            case SqlServer => s"ALTER TABLE $t ADD $c $tpe"
            case Oracle => s"ALTER TABLE $t ADD ($c $tpe)"
          })
          if (!f.nullable)
            warns += s"column ${f.name}: source is NOT NULL but added nullable " +
              "(a NOT NULL add without default fails on a populated table) — " +
              "backfill, then tighten nullability"
        case Some(g) if g.dataType != f.dataType =>
          stmts += (dialect match {
            case Postgres => s"ALTER TABLE $t ALTER COLUMN $c TYPE $tpe USING $c::$tpe"
            case SqlServer =>
              val nn = if (f.nullable) "NULL" else "NOT NULL"
              s"ALTER TABLE $t ALTER COLUMN $c $tpe $nn"
            case Oracle => s"ALTER TABLE $t MODIFY ($c $tpe)"
            case Snowflake => s"ALTER TABLE $t ALTER COLUMN $c SET DATA TYPE $tpe"
          })
        case Some(g) if g.nullable != f.nullable =>
          stmts += (dialect match {
            case Postgres | Snowflake =>
              val op = if (f.nullable) "DROP NOT NULL" else "SET NOT NULL"
              s"ALTER TABLE $t ALTER COLUMN $c $op"
            case SqlServer =>
              val nn = if (f.nullable) "NULL" else "NOT NULL"
              s"ALTER TABLE $t ALTER COLUMN $c $tpe $nn"
            case Oracle =>
              val nn = if (f.nullable) "NULL" else "NOT NULL"
              s"ALTER TABLE $t MODIFY ($c $nn)"
          })
          if (!f.nullable)
            warns += s"column ${f.name}: tightening to NOT NULL fails if the " +
              "target holds nulls — backfill first"
        case _ => // identical: nothing to do
      }
    }
    target.fields.filterNot(f => srcNames(f.name)).foreach { f =>
      warns += s"column ${f.name}: exists in target but not in source — NOT " +
        "dropped (sync never destroys target data; drop manually if intended)"
    }
    AlterPlan(stmts.toSeq, warns.toSeq)
  }

  /** Pre-provisioning compatibility verdict (reference: backend/ingestion/
    * schema_service.py:1455-1539 validate_schema_compatibility). Decided on
    * column NAMES only, exactly like the reference: a source column missing
    * in the target ⇒ incompatible (replication would drop data); extra
    * target columns are tolerated; an absent target is compatible because
    * [[syncDdl]] can create it. */
  case class Compat(
      compatible: Boolean,
      message: String,
      sourceColumns: Int,
      targetColumns: Int,
      missingColumns: Seq[String],
      extraColumns: Seq[String])

  def compatibility(source: StructType, target: Option[StructType]): Compat =
    target match {
      case None =>
        Compat(compatible = true, "Target table does not exist - can be created",
          source.size, 0, Nil, Nil)
      case Some(t) =>
        val srcNames = source.fieldNames.toSet
        val tgtNames = t.fieldNames.toSet
        val missing = (srcNames -- tgtNames).toSeq.sorted
        Compat(missing.isEmpty,
          if (missing.isEmpty) "Compatible"
          else "Incompatible - missing columns in target",
          source.size, t.size, missing, (tgtNames -- srcNames).toSeq.sorted)
    }

  /** Full sync entry point, reference sync_schema's control flow: target
    * absent → CREATE TABLE; present → the ALTER delta. */
  def syncDdl(
      table: String,
      source: StructType,
      target: Option[StructType],
      dialect: Dialect,
      primaryKey: Seq[String] = Nil): AlterPlan = target match {
    case None => AlterPlan(Seq(createTableDdl(table, source, dialect, primaryKey)), Nil)
    case Some(tgt) => alterTableDdl(table, source, tgt, dialect)
  }
}
