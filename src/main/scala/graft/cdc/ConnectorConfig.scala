package graft.cdc

/** Connector-config generation: the reference's pipeline-provisioning
  * surface, re-expressed as pure functions from a pipeline spec to the
  * source/sink property maps a Kafka-Connect-compatible runtime consumes.
  *
  * Semantics mirrored (not ported) from:
  *   - backend/ingestion/debezium_config.py:100-230 (postgres source:
  *     include-list assembly, slot/publication sanitization, snapshot-mode
  *     resolution ladder, JSON converters, errors.tolerance)
  *   - backend/ingestion/sink_config.py:115-230 (JDBC sink: per-dialect
  *     connection URL, insert/pk/delete mode bundles, ExtractNewRecordState
  *     unwrap SMT with rewrite delete handling, table.name.format from the
  *     topic's last segment)
  *
  * In this engine the "runtime" is the Structured Streaming pipeline
  * ([[graft.streaming.CdcStream]] + [[graft.sinks.TableSink]]); the config
  * maps drive which topics are read and which apply mode the sink uses, so
  * a user of the reference can carry their pipeline definitions over.
  */
object ConnectorConfig {

  sealed trait Dialect { def name: String }
  case object Postgres extends Dialect { val name = "postgresql" }
  case object SqlServer extends Dialect { val name = "sqlserver" }
  case object OracleDb extends Dialect { val name = "oracle" }

  /** Sink apply mode: Upsert = current-state table (latest per key,
    * deletes drop); History = SCD2-style append (every change a row). */
  sealed trait ApplyMode
  case object Upsert extends ApplyMode
  case object History extends ApplyMode

  final case class SourceSpec(
      pipeline: String,
      dialect: Dialect,
      host: String,
      port: Int,
      user: String,
      database: String,
      schema: String,
      tables: Seq[String],
      snapshotMode: String = "never",
      fullLoadDone: Boolean = false)

  final case class SinkSpec(
      connector: String,
      dialect: Dialect,
      host: String,
      port: Int,
      user: String,
      database: String,
      schema: String,
      topics: Seq[String],
      mode: ApplyMode = Upsert,
      batchSize: Int = 500)

  /** Postgres identifiers (slots, publications) allow only [a-z0-9_]
    * (debezium_config.py:139-151). */
  def sanitizeIdentifier(name: String): String =
    name.toLowerCase.replaceAll("[^a-z0-9_]", "_")

  /** Snapshot-mode resolution ladder (debezium_config.py:155-167):
    * `never` stays never (CDC-only); `schema_only` becomes initial_only
    * once a full load ran, else initial; any mode after a full load
    * collapses to initial_only (data already copied, schema only). */
  def resolveSnapshotMode(requested: String, fullLoadDone: Boolean): String =
    (requested, fullLoadDone) match {
      case ("never", _)           => "never"
      case ("schema_only", true)  => "initial_only"
      case ("schema_only", false) => "initial"
      case (_, true)              => "initial_only"
      case (other, false)         => other
    }

  def defaultSchema(dialect: Dialect, schema: String): String =
    if (schema != null && schema.trim.nonEmpty) schema
    else dialect match {
      case Postgres  => "public"
      case SqlServer => "dbo"
      case OracleDb  => ""
    }

  def connectorClass(dialect: Dialect): String = dialect match {
    case Postgres  => "io.debezium.connector.postgresql.PostgresConnector"
    case SqlServer => "io.debezium.connector.sqlserver.SqlServerConnector"
    case OracleDb  => "io.debezium.connector.oracle.OracleConnector"
  }

  private val converterProps = Map(
    "key.converter" -> "org.apache.kafka.connect.json.JsonConverter",
    "key.converter.schemas.enable" -> "false",
    "value.converter" -> "org.apache.kafka.connect.json.JsonConverter",
    "value.converter.schemas.enable" -> "true",
    "errors.tolerance" -> "all",
    "errors.log.enable" -> "true")

  /** Source connector properties. Topics come out as
    * `{pipeline}.{schema}.{table}` — the routing format
    * [[Cdc.parseEnvelope]] parses back. */
  def sourceConfig(spec: SourceSpec): Map[String, String] = {
    require(spec.tables.nonEmpty, s"no tables for pipeline ${spec.pipeline}")
    val schema = defaultSchema(spec.dialect, spec.schema)
    val includeList = spec.tables.map(t => s"$schema.$t").mkString(",")
    val base = Map(
      "connector.class" -> connectorClass(spec.dialect),
      "tasks.max" -> "1",
      "database.hostname" -> spec.host,
      "database.port" -> spec.port.toString,
      "database.user" -> spec.user,
      "database.dbname" -> spec.database,
      "database.server.name" -> spec.pipeline,
      "topic.prefix" -> spec.pipeline,
      "table.include.list" -> includeList,
      "snapshot.mode" -> resolveSnapshotMode(spec.snapshotMode, spec.fullLoadDone)) ++
      converterProps
    spec.dialect match {
      case Postgres =>
        val ident = sanitizeIdentifier(spec.pipeline)
        base ++ Map(
          "plugin.name" -> "pgoutput",
          "slot.name" -> s"${ident}_slot",
          "publication.name" -> s"${ident}_pub",
          "publication.autocreate.mode" -> "filtered",
          "snapshot.locking.mode" -> "none")
      case SqlServer =>
        base + ("database.encrypt" -> "false")
      case OracleDb =>
        base + ("database.connection.adapter" -> "logminer")
    }
  }

  def jdbcUrl(dialect: Dialect, host: String, port: Int, database: String): String =
    dialect match {
      case Postgres  => s"jdbc:postgresql://$host:$port/$database"
      case SqlServer => s"jdbc:sqlserver://$host:$port;databaseName=$database"
      case OracleDb  => s"jdbc:oracle:thin:@$host:$port/$database"
    }

  /** Sink connector properties. [[Upsert]] is the current-state bundle
    * (upsert on record key, deletes enabled); [[History]] is the SCD2
    * bundle (plain inserts, no pk, deletes kept as __deleted=rewrite
    * rows). Both unwrap the Debezium envelope with tombstone drop +
    * rewrite delete handling — exactly the semantics [[Cdc.unwrap]]
    * implements on the Spark side. */
  def sinkConfig(spec: SinkSpec): Map[String, String] = {
    val schema = defaultSchema(spec.dialect, spec.schema)
    val modeProps = spec.mode match {
      case Upsert => Map(
        "insert.mode" -> "upsert",
        "pk.mode" -> "record_key",
        "delete.enabled" -> "true")
      case History => Map(
        "insert.mode" -> "insert",
        "pk.mode" -> "none",
        "delete.enabled" -> "false")
    }
    val tableName = spec.topics.headOption
      .map(_.split("\\.").last)
      .map(t => s"$schema.$t")
    Map(
      "connector.class" -> "io.confluent.connect.jdbc.JdbcSinkConnector",
      "tasks.max" -> "1",
      "topics" -> spec.topics.mkString(","),
      "connection.url" -> jdbcUrl(spec.dialect, spec.host, spec.port, spec.database),
      "connection.user" -> spec.user,
      "batch.size" -> spec.batchSize.toString,
      "auto.create" -> "true",
      "auto.evolve" -> "true",
      "transforms" -> "unwrap",
      "transforms.unwrap.type" -> "io.debezium.transforms.ExtractNewRecordState",
      "transforms.unwrap.drop.tombstones" -> "true",
      "transforms.unwrap.delete.handling.mode" -> "rewrite",
      "transforms.unwrap.add.fields" -> "op,source.ts_ms",
      "consumer.override.auto.offset.reset" -> "earliest") ++
      converterProps ++ modeProps ++
      tableName.map("table.name.format" -> _).toMap
  }
}
