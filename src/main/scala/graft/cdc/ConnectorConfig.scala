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
  /** IBM i (AS400) via the journal-based RPC connector — the reference's
    * marquee source (debezium_config.py:64-75 routes `as400|ibm_i` here). */
  case object As400 extends Dialect { val name = "as400" }
  /** Db2 LUW via the standard Db2 connector (debezium_config.py:76-85
    * routes `db2` here — distinct from AS400's RPC connector). */
  case object Db2 extends Dialect { val name = "db2" }

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
      fullLoadDone: Boolean = false,
      // dialect-specific extras, mirroring the reference connection's
      // additional_config: AS400 reads `library`, `default_library`,
      // `journal_library`, `docker_hostname`, `schema.history.bootstrap`
      additionalConfig: Map[String, String] = Map.empty)

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
      case As400     => "QSYS"
      case Db2       => "DB2INST1"
    }

  def connectorClass(dialect: Dialect): String = dialect match {
    case Postgres  => "io.debezium.connector.postgresql.PostgresConnector"
    case SqlServer => "io.debezium.connector.sqlserver.SqlServerConnector"
    case OracleDb  => "io.debezium.connector.oracle.OracleConnector"
    case As400     => "io.debezium.connector.db2as400.As400RpcConnector"
    case Db2       => "io.debezium.connector.db2.Db2Connector"
  }

  /** Db2 snapshot ladder (debezium_config.py:486-498) — like AS400's but
    * schema-only without a full load maps to Db2's `no_data` mode. */
  def resolveDb2SnapshotMode(requested: String, fullLoadDone: Boolean): String =
    (requested, fullLoadDone) match {
      case ("never", false)       => "initial"
      case ("never", true)        => "never"
      case ("schema_only", true)  => "schema_only"
      case ("schema_only", false) => "no_data"
      case (_, true)              => "never"
      case (other, false)         => if (other.nonEmpty) other else "initial"
    }

  /** AS400 library resolution (debezium_config.py:349-361): explicit
    * schema, else additional_config `library`, else the database name,
    * else QSYS. Returns (library, fellBackToDefault) — the boolean is the
    * reference's warning path ("Schema/library not provided"). */
  def resolveAs400Library(
      schema: String, database: String,
      additionalConfig: Map[String, String]): (String, Boolean) =
    if (schema != null && schema.trim.nonEmpty) (schema, false)
    else additionalConfig.get("library").filter(_.nonEmpty).map((_, false))
      .orElse(Option(database).filter(_.nonEmpty).map((_, false)))
      .getOrElse(("QSYS", true))

  /** AS400 snapshot ladder (debezium_config.py:378-398) — differs from the
    * generic one: with no full-load offset the connector MUST take an
    * initial snapshot to establish a journal baseline; with one, it starts
    * from the offset (`never`). */
  def resolveAs400SnapshotMode(requested: String, fullLoadDone: Boolean): String =
    (requested, fullLoadDone) match {
      case ("never", false)       => "initial"
      case ("never", true)        => "never"
      case ("schema_only", true)  => "schema_only"
      case ("schema_only", false) => "initial"
      case (_, true)              => "never"
      case (_, false)             => "initial"
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
    if (spec.dialect == As400) return as400SourceConfig(spec)
    if (spec.dialect == Db2) return db2SourceConfig(spec)
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
      case As400 | Db2 => base // unreachable: routed above
    }
  }

  /** Db2 LUW source properties (debezium_config.py:461-531): standard Db2
    * connector, Kafka schema history, unwrap SMT; port defaults to 50000. */
  private def db2SourceConfig(spec: SourceSpec): Map[String, String] = {
    val schema = defaultSchema(Db2, spec.schema)
    val host = spec.additionalConfig.getOrElse("docker_hostname", spec.host)
    val port = if (spec.port > 0) spec.port else 50000
    Map(
      "connector.class" -> connectorClass(Db2),
      "tasks.max" -> "1",
      "database.hostname" -> host,
      "database.port" -> port.toString,
      "database.user" -> spec.user,
      "database.dbname" -> (if (spec.database.nonEmpty) spec.database else schema),
      "database.server.name" -> spec.pipeline,
      "topic.prefix" -> spec.pipeline,
      "table.include.list" -> spec.tables.map(t => s"$schema.$t").mkString(","),
      "snapshot.mode" -> resolveDb2SnapshotMode(spec.snapshotMode, spec.fullLoadDone),
      "schema.history.internal" -> "io.debezium.storage.kafka.history.KafkaSchemaHistory",
      "schema.history.internal.kafka.topic" -> s"${spec.pipeline}.schema.history.internal",
      "transforms" -> "unwrap",
      "transforms.unwrap.type" -> "io.debezium.transforms.ExtractNewRecordState",
      "transforms.unwrap.drop.tombstones" -> "true",
      "transforms.unwrap.delete.handling.mode" -> "rewrite",
      "transforms.unwrap.add.fields" -> "op,source.ts_ms") ++
      spec.additionalConfig.get("schema.history.bootstrap")
        .map("schema.history.internal.kafka.bootstrap.servers" -> _).toMap ++
      converterProps
  }

  /** AS400/IBM i source properties (debezium_config.py:326-459):
    * journal-based CDC via As400RpcConnector. `database.dbname` is the
    * connection's default library (QGPL unless overridden), while
    * `database.schema` is the library the tables live in — resolved by
    * [[resolveAs400Library]]. The journal library defaults to QSYS. */
  private def as400SourceConfig(spec: SourceSpec): Map[String, String] = {
    val (library, _) = resolveAs400Library(spec.schema, spec.database, spec.additionalConfig)
    val host = spec.additionalConfig.getOrElse("docker_hostname", spec.host)
    val port = if (spec.port > 0) spec.port else 446
    val dbname = spec.additionalConfig.get("default_library").filter(_.nonEmpty)
      .orElse(Option(spec.database).filter(_.nonEmpty))
      .getOrElse("QGPL")
    Map(
      "connector.class" -> connectorClass(As400),
      "tasks.max" -> "1",
      "database.hostname" -> host,
      "database.port" -> port.toString,
      "database.user" -> spec.user,
      "database.dbname" -> dbname,
      "database.schema" -> library,
      "database.server.name" -> spec.pipeline,
      "topic.prefix" -> spec.pipeline,
      "table.include.list" -> spec.tables.map(t => s"$library.$t").mkString(","),
      "snapshot.mode" -> resolveAs400SnapshotMode(spec.snapshotMode, spec.fullLoadDone),
      "snapshot.locking.mode" -> "none",
      "database.history.skip.unparseable.ddl" -> "true",
      "schema.history.internal" -> "io.debezium.storage.kafka.history.KafkaSchemaHistory",
      "schema.history.internal.kafka.topic" -> s"${spec.pipeline}.schema.history.internal",
      "database.journal.library" -> spec.additionalConfig.getOrElse("journal_library", "QSYS"),
      "transforms" -> "unwrap",
      "transforms.unwrap.type" -> "io.debezium.transforms.ExtractNewRecordState",
      "transforms.unwrap.drop.tombstones" -> "true",
      "transforms.unwrap.delete.handling.mode" -> "rewrite",
      "transforms.unwrap.add.fields" -> "op,source.ts_ms") ++
      spec.additionalConfig.get("schema.history.bootstrap")
        .map("schema.history.internal.kafka.bootstrap.servers" -> _).toMap ++
      converterProps
  }

  def jdbcUrl(dialect: Dialect, host: String, port: Int, database: String): String =
    dialect match {
      case Postgres  => s"jdbc:postgresql://$host:$port/$database"
      case SqlServer => s"jdbc:sqlserver://$host:$port;databaseName=$database"
      // service-name form (sink_config.py:329-333); service defaults to ORCL
      case OracleDb  => s"jdbc:oracle:thin:@//$host:$port/${if (database.nonEmpty) database else "ORCL"}"
      case As400     => s"jdbc:as400://$host/$database"
      case Db2       => s"jdbc:db2://$host:$port/$database"
    }

  /** Sink connector naming convention (sink_config.py:374-401):
    * `sink-{pipeline}-{dbShort}-{schema}`, lowercased. */
  def sinkConnectorName(pipeline: String, dbType: String, schema: String): String = {
    val short = dbType.toLowerCase match {
      case "postgresql"         => "pg"
      case "sqlserver" | "mssql" => "mssql"
      case "oracle"             => "oracle"
      case "s3"                 => "s3"
      case other                => other.take(4)
    }
    s"sink-${pipeline.toLowerCase.replace(" ", "_")}-$short-${schema.toLowerCase}"
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
    // Oracle targets address tables as UPPERSCHEMA.table (sink_config.py:335-336)
    val schemaForTable = if (spec.dialect == OracleDb) schema.toUpperCase else schema
    val tableName = spec.topics.headOption
      .map(_.split("\\.").last)
      .map(t => s"$schemaForTable.$t")
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

  /** S3 lake sink spec (sink_config.py:404-493). `flushSize` defaults to
    * 10 — the reference's small default for immediate data visibility
    * (sink_config.py:70-74); raise it for throughput in production.
    * `timePartitioned` emits the time-based partitioner whose directory
    * layout matches [[graft.sinks.TableSink.writeTimePartitioned]]
    * (dt=YYYY-MM-dd), so Spark readers prune by date either way. */
  final case class S3SinkSpec(
      connector: String,
      bucket: String,
      accessKeyId: String,
      secretAccessKey: String,
      topics: Seq[String],
      prefix: String = "",
      region: String = "us-east-1",
      flushSize: Int = 10,
      endpointUrl: Option[String] = None,
      timePartitioned: Boolean = false)

  def s3SinkConfig(spec: S3SinkSpec): Map[String, String] = {
    require(spec.topics.nonEmpty, "S3 sink: no Kafka topics provided")
    require(spec.bucket.nonEmpty, "S3 sink: bucket name is missing")
    require(spec.accessKeyId.nonEmpty, "S3 sink: access key id is missing")
    require(spec.secretAccessKey.nonEmpty, "S3 sink: secret access key is missing")
    val prefix =
      if (spec.prefix.isEmpty || spec.prefix.endsWith("/")) spec.prefix
      else spec.prefix + "/"
    val partitioner =
      if (spec.timePartitioned) Map(
        "partitioner.class" -> "io.confluent.connect.storage.partitioner.TimeBasedPartitioner",
        "partition.duration.ms" -> "86400000",
        "path.format" -> "'dt'=YYYY-MM-dd",
        "locale" -> "en-US",
        "timezone" -> "UTC",
        "timestamp.extractor" -> "Record")
      else Map(
        "partitioner.class" -> "io.confluent.connect.storage.partitioner.DefaultPartitioner")
    Map(
      "connector.class" -> "io.confluent.connect.s3.S3SinkConnector",
      "tasks.max" -> "1",
      "topics" -> spec.topics.mkString(","),
      "s3.region" -> spec.region,
      "s3.bucket.name" -> spec.bucket,
      "s3.part.size" -> "5242880",
      "flush.size" -> (if (spec.flushSize > 0) spec.flushSize else 10).toString,
      "storage.class" -> "io.confluent.connect.s3.storage.S3Storage",
      "format.class" -> "io.confluent.connect.s3.format.json.JsonFormat",
      "schema.compatibility" -> "NONE",
      "aws.access.key.id" -> spec.accessKeyId,
      "aws.secret.access.key" -> spec.secretAccessKey) ++
      partitioner ++
      (if (prefix.nonEmpty) Map("s3.prefix" -> prefix) else Map.empty) ++
      spec.endpointUrl.map("s3.endpoint.url" -> _).toMap
  }

  /** Snowflake sink spec (sink_config.py:496-642). The connector lands the
    * FULL Debezium envelope in RECORD_CONTENT (VARIANT) — op/before/after
    * preserved for CDC consumers; a typed landing table instead comes from
    * [[SchemaDdl]]'s Snowflake dialect. Auth prefers key-pair over
    * password, exactly one is required. */
  final case class SnowflakeSinkSpec(
      connector: String,
      account: String,
      user: String,
      database: String,
      schema: String,
      topics: Seq[String],
      password: Option[String] = None,
      privateKey: Option[String] = None,
      privateKeyPassphrase: Option[String] = None,
      warehouse: Option[String] = None,
      role: Option[String] = None,
      batchSize: Int = 0)

  /** Account → canonical URL (sink_config.py:525-535): strip protocol and
    * domain, lowercase, rebuild `https://{account}.snowflakecomputing.com`. */
  def snowflakeUrl(account: String): String = {
    val clean = account
      .replace("https://", "").replace("http://", "")
      .replace(".snowflakecomputing.com", "")
      .reverse.dropWhile(_ == '/').reverse
      .toLowerCase
    s"https://$clean.snowflakecomputing.com"
  }

  def snowflakeSinkConfig(spec: SnowflakeSinkSpec): Map[String, String] = {
    require(spec.topics.nonEmpty, "Snowflake sink: no Kafka topics provided")
    require(spec.account.nonEmpty, "Snowflake sink: account is missing")
    require(spec.user.nonEmpty, "Snowflake sink: username is missing")
    require(spec.database.nonEmpty, "Snowflake sink: database name is missing")
    require(spec.schema.nonEmpty, "Snowflake sink: schema name is missing")
    require(spec.password.exists(_.nonEmpty) || spec.privateKey.exists(_.nonEmpty),
      "Snowflake sink: either password or private_key must be provided")
    val auth = spec.privateKey.filter(_.nonEmpty) match {
      case Some(key) =>
        Map("snowflake.private.key" -> key) ++
          spec.privateKeyPassphrase.map("snowflake.private.key.passphrase" -> _).toMap
      case None =>
        Map("snowflake.password" -> spec.password.get)
    }
    Map(
      "connector.class" -> "com.snowflake.kafka.connector.SnowflakeSinkConnector",
      "tasks.max" -> "1",
      "topics" -> spec.topics.mkString(","),
      "snowflake.url.name" -> snowflakeUrl(spec.account),
      "snowflake.user.name" -> spec.user,
      "snowflake.database.name" -> spec.database,
      "snowflake.schema.name" -> spec.schema,
      "buffer.count.records" -> (if (spec.batchSize > 0) spec.batchSize else 10000).toString,
      "buffer.flush.time" -> "60",
      "buffer.size.bytes" -> "5000000",
      "key.converter" -> "org.apache.kafka.connect.storage.StringConverter",
      "value.converter" -> "org.apache.kafka.connect.json.JsonConverter",
      "value.converter.schemas.enable" -> "true",
      "errors.tolerance" -> "all",
      "errors.log.enable" -> "true",
      "errors.log.include.messages" -> "true",
      // topic → lowercase last segment of {server}.{schema}.{table}
      "snowflake.topic2table.map" -> spec.topics
        .map(t => s"$t:${t.split("\\.").last.toLowerCase}").mkString(",")) ++
      auth ++
      spec.warehouse.map("snowflake.warehouse.name" -> _).toMap ++
      spec.role.map("snowflake.role.name" -> _).toMap
  }

  /** Chunked full-load read spec — the reference's batched table copy
    * (transfer.py:831-1150 transfer_data pages LIMIT/OFFSET batches of
    * `batch_size`). Spark's native form of the same copy is a
    * partitioned `spark.read.jdbc`: `partitionColumn` + bounds +
    * `numPartitions` make each executor read one key-range chunk
    * concurrently, which strictly dominates serial OFFSET paging (OFFSET
    * re-scans skipped rows on every page; range predicates hit the PK
    * index once per chunk). */
  final case class ChunkedReadSpec(
      dialect: Dialect,
      host: String,
      port: Int,
      user: String,
      database: String,
      schema: String,
      table: String,
      /** numeric/temporal column to range-partition on — the snapshot
        * chunking key (usually the PK, like cdc_snapshot_chunked) */
      partitionColumn: String,
      /** min(partitionColumn) / max(partitionColumn), from the bounds
        * query the reference runs before chunking */
      lowerBound: Long,
      upperBound: Long,
      /** target rows (key-range width) per chunk — the reference's
        * batch_size, scaled for range- rather than row-chunking */
      chunkSize: Long = 100000L,
      /** cap on concurrent JDBC partitions so a huge table can't open
        * thousands of connections against the source */
      maxPartitions: Int = 64,
      /** per-roundtrip row fetch hint (reference batch_size default) */
      fetchSize: Int = 1000)

  /** JDBC driver class per dialect (all public driver coordinates). */
  def jdbcDriver(dialect: Dialect): String = dialect match {
    case Postgres  => "org.postgresql.Driver"
    case SqlServer => "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    case OracleDb  => "oracle.jdbc.OracleDriver"
    case As400     => "com.ibm.as400.access.AS400JDBCDriver"
    case Db2       => "com.ibm.db2.jcc.DB2Driver"
  }

  /** Dialect-quoted `schema.table` for the `dbtable` option. Oracle,
    * Db2 and AS400 catalog unquoted identifiers UPPERCASE, so an
    * all-lowercase name there (the way an unquoted `CREATE TABLE orders`
    * reads back) is uppercased before quoting — quoting it lowercase
    * would fail to bind (ORA-00942). A name that already carries ANY
    * uppercase is treated as intentional casing (a quoted-created
    * case-sensitive identifier) and passed through verbatim, so both
    * conventions stay addressable. An empty schema (Oracle's default:
    * the connecting user's own schema) omits the qualifier rather than
    * emitting an illegal zero-length identifier. */
  def qualifiedTable(dialect: Dialect, schema: String, table: String): String = {
    def q(ident: String): String = dialect match {
      case SqlServer => "[" + ident.replace("]", "]]") + "]"
      case _ => "\"" + ident.replace("\"", "\"\"") + "\""
    }
    def cased(ident: String): String = dialect match {
      case OracleDb | Db2 | As400 if !ident.exists(_.isUpper) => ident.toUpperCase
      case _ => ident
    }
    val s = cased(defaultSchema(dialect, schema))
    if (s.isEmpty) q(cased(table))
    else s"${q(s)}.${q(cased(table))}"
  }

  /** The option map for `spark.read.format("jdbc").options(...)` that
    * performs the reference's chunked copy as a parallel partitioned
    * read. Partition count = key range / chunkSize, capped at
    * `maxPartitions`, floored at 1 — Spark turns that into
    * numPartitions range predicates on `partitionColumn`. */
  def chunkedReadOptions(spec: ChunkedReadSpec): Map[String, String] = {
    require(spec.partitionColumn.nonEmpty, "chunked read: partitionColumn is required")
    require(spec.upperBound >= spec.lowerBound,
      s"chunked read: upperBound ${spec.upperBound} < lowerBound ${spec.lowerBound}")
    require(spec.chunkSize > 0, "chunked read: chunkSize must be positive")
    val span = spec.upperBound - spec.lowerBound + 1
    val parts = math.max(1L, math.min(
      (span + spec.chunkSize - 1) / spec.chunkSize,
      spec.maxPartitions.toLong))
    Map(
      "url" -> jdbcUrl(spec.dialect, spec.host, spec.port, spec.database),
      "driver" -> jdbcDriver(spec.dialect),
      "user" -> spec.user,
      "dbtable" -> qualifiedTable(spec.dialect, spec.schema, spec.table),
      "partitionColumn" -> spec.partitionColumn,
      "lowerBound" -> spec.lowerBound.toString,
      "upperBound" -> spec.upperBound.toString,
      "numPartitions" -> parts.toString,
      "fetchsize" -> spec.fetchSize.toString)
  }

  /** Kafka consumer-side read spec — the wire-reader half of a provisioned
    * pipeline. Generation-only in this sandbox (no broker), exactly like
    * [[chunkedReadOptions]]: the map plugs straight into
    * `spark.readStream.format("kafka").options(...)`, replacing
    * [[graft.sources.WireSource.readStream]]'s file source. */
  final case class KafkaReadSpec(
      bootstrap: String,
      source: SourceSpec,
      /** bounded micro-batches — the Kafka twin of WireSource's
        * maxFilesPerTrigger: caps per-trigger work so one giant backlog
        * drain cannot blow executor memory */
      maxOffsetsPerTrigger: Long = 100000L,
      /** CDC topics are retention-compacted; an aged-out offset after a
        * long pause should warn and continue, not kill the pipeline */
      failOnDataLoss: Boolean = false)

  /** The Debezium topic names a SourceSpec's connector produces:
    * `{topic.prefix}.{schema}.{table}` per included table — the same
    * naming [[sourceConfig]] provisions (`topic.prefix` = pipeline) and
    * [[Cdc.parseEnvelope]] parses back. AS400 resolves its library the
    * way the source connector does. */
  def kafkaTopics(spec: SourceSpec): Seq[String] = {
    val schema = spec.dialect match {
      case As400 => resolveAs400Library(spec.schema, spec.database, spec.additionalConfig)._1
      case d => defaultSchema(d, spec.schema)
    }
    spec.tables.map(t => s"${spec.pipeline}.$schema.$t")
  }

  /** Option map for `spark.readStream.format("kafka")` consuming a
    * provisioned pipeline's topics. Mirrors the reference consumer
    * (cdc_event_logger.py:181-185): subscribe to the pipeline's Debezium
    * topics, `auto_offset_reset='earliest'` with committed offsets
    * thereafter — Spark's checkpoint plays the committed-offset role, so
    * `startingOffsets` only applies on FIRST start. After a completed
    * full load the topic backlog up to the handoff is already in the
    * state table, so the first read starts at `latest` (the consumer
    * twin of [[resolveSnapshotMode]]'s initial_only collapse and of
    * cdc_snapshot_handoff's cutover). */
  def kafkaReadOptions(spec: KafkaReadSpec): Map[String, String] = {
    require(spec.bootstrap.nonEmpty, "kafka read: bootstrap servers required")
    require(spec.source.tables.nonEmpty,
      s"kafka read: no tables for pipeline ${spec.source.pipeline}")
    require(spec.maxOffsetsPerTrigger > 0,
      "kafka read: maxOffsetsPerTrigger must be positive")
    Map(
      "kafka.bootstrap.servers" -> spec.bootstrap,
      "subscribe" -> kafkaTopics(spec.source).mkString(","),
      "startingOffsets" -> (if (spec.source.fullLoadDone) "latest" else "earliest"),
      "maxOffsetsPerTrigger" -> spec.maxOffsetsPerTrigger.toString,
      "failOnDataLoss" -> spec.failOnDataLoss.toString)
  }
}
