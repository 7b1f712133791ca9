package graft

import graft.cdc.ConnectorConfig
import graft.cdc.ConnectorConfig._
import org.scalatest.funsuite.AnyFunSuite

/** Config-generation semantics: snapshot-mode ladder, identifier
  * sanitization, include-list assembly, mode bundles, URL dialects. */
class ConnectorConfigSpec extends AnyFunSuite {

  private val src = SourceSpec(
    pipeline = "My-Pipe.v2", dialect = Postgres, host = "db", port = 5432,
    user = "cdc", database = "app", schema = "", tables = Seq("users", "orders"))

  test("snapshot-mode resolution ladder") {
    assert(resolveSnapshotMode("never", fullLoadDone = false) === "never")
    assert(resolveSnapshotMode("never", fullLoadDone = true) === "never")
    assert(resolveSnapshotMode("schema_only", fullLoadDone = true) === "initial_only")
    assert(resolveSnapshotMode("schema_only", fullLoadDone = false) === "initial")
    assert(resolveSnapshotMode("initial", fullLoadDone = true) === "initial_only")
    assert(resolveSnapshotMode("initial", fullLoadDone = false) === "initial")
  }

  test("postgres source: defaults, sanitized slot, include list") {
    val c = sourceConfig(src)
    assert(c("connector.class") === "io.debezium.connector.postgresql.PostgresConnector")
    assert(c("table.include.list") === "public.users,public.orders") // schema defaulted
    assert(c("slot.name") === "my_pipe_v2_slot")
    assert(c("publication.name") === "my_pipe_v2_pub")
    assert(c("topic.prefix") === "My-Pipe.v2")
    assert(c("snapshot.mode") === "never")
    assert(c("errors.tolerance") === "all")
  }

  test("sqlserver source defaults schema to dbo") {
    val c = sourceConfig(src.copy(dialect = SqlServer))
    assert(c("connector.class") === "io.debezium.connector.sqlserver.SqlServerConnector")
    assert(c("table.include.list") === "dbo.users,dbo.orders")
    assert(!c.contains("slot.name"))
  }

  test("empty table list is rejected") {
    assertThrows[IllegalArgumentException](sourceConfig(src.copy(tables = Nil)))
  }

  test("sink upsert bundle vs history bundle") {
    val base = SinkSpec(
      connector = "sink1", dialect = Postgres, host = "tgt", port = 5432,
      user = "w", database = "dw", schema = "rep",
      topics = Seq("pipe.public.users"))
    val up = sinkConfig(base)
    assert(up("insert.mode") === "upsert")
    assert(up("pk.mode") === "record_key")
    assert(up("delete.enabled") === "true")
    assert(up("table.name.format") === "rep.users")
    assert(up("transforms.unwrap.delete.handling.mode") === "rewrite")
    val hist = sinkConfig(base.copy(mode = History))
    assert(hist("insert.mode") === "insert")
    assert(hist("pk.mode") === "none")
    assert(hist("delete.enabled") === "false")
  }

  test("jdbc url per dialect") {
    assert(jdbcUrl(Postgres, "h", 5432, "d") === "jdbc:postgresql://h:5432/d")
    assert(jdbcUrl(SqlServer, "h", 1433, "d") === "jdbc:sqlserver://h:1433;databaseName=d")
    // Oracle service-name form; empty service falls back to ORCL
    assert(jdbcUrl(OracleDb, "h", 1521, "d") === "jdbc:oracle:thin:@//h:1521/d")
    assert(jdbcUrl(OracleDb, "h", 1521, "") === "jdbc:oracle:thin:@//h:1521/ORCL")
    assert(jdbcUrl(Db2, "h", 50000, "d") === "jdbc:db2://h:50000/d")
  }

  test("oracle sink addresses tables as UPPERSCHEMA.table") {
    val c = sinkConfig(SinkSpec(
      connector = "osink", dialect = OracleDb, host = "tgt", port = 1521,
      user = "w", database = "ORCLPDB", schema = "rep",
      topics = Seq("pipe.public.users")))
    assert(c("table.name.format") === "REP.users")
    assert(c("connection.url") === "jdbc:oracle:thin:@//tgt:1521/ORCLPDB")
  }

  test("db2 source: connector class, no_data schema-only mode, port default") {
    assert(resolveDb2SnapshotMode("schema_only", fullLoadDone = false) === "no_data")
    assert(resolveDb2SnapshotMode("schema_only", fullLoadDone = true) === "schema_only")
    assert(resolveDb2SnapshotMode("never", fullLoadDone = false) === "initial")
    assert(resolveDb2SnapshotMode("initial", fullLoadDone = true) === "never")
    val c = sourceConfig(SourceSpec(
      pipeline = "d2", dialect = Db2, host = "h", port = 0,
      user = "u", database = "SAMPLE", schema = "", tables = Seq("T1")))
    assert(c("connector.class") === "io.debezium.connector.db2.Db2Connector")
    assert(c("database.port") === "50000")
    assert(c("table.include.list") === "DB2INST1.T1") // schema defaulted
    assert(c("database.dbname") === "SAMPLE")
    assert(c("schema.history.internal.kafka.topic") === "d2.schema.history.internal")
  }

  test("sink connector naming convention") {
    assert(sinkConnectorName("My Pipe", "postgresql", "Rep") === "sink-my_pipe-pg-rep")
    assert(sinkConnectorName("p", "mssql", "dbo") === "sink-p-mssql-dbo")
    assert(sinkConnectorName("p", "snowflake", "cdc") === "sink-p-snow-cdc")
    assert(sinkConnectorName("p", "s3", "raw") === "sink-p-s3-raw")
  }

  test("as400 source: library resolution ladder and fallback warning path") {
    // explicit schema wins
    assert(resolveAs400Library("SEGLIB", "QGPL", Map.empty) === (("SEGLIB", false)))
    // additional_config library next
    assert(resolveAs400Library("", "QGPL", Map("library" -> "APPLIB")) === (("APPLIB", false)))
    // database-as-library next
    assert(resolveAs400Library("", "QGPL", Map.empty) === (("QGPL", false)))
    // nothing provided → QSYS with the warning flag set
    assert(resolveAs400Library("", "", Map.empty) === (("QSYS", true)))
  }

  test("as400 snapshot ladder: never needs a baseline unless a full load ran") {
    assert(resolveAs400SnapshotMode("never", fullLoadDone = false) === "initial")
    assert(resolveAs400SnapshotMode("never", fullLoadDone = true) === "never")
    assert(resolveAs400SnapshotMode("schema_only", fullLoadDone = true) === "schema_only")
    assert(resolveAs400SnapshotMode("schema_only", fullLoadDone = false) === "initial")
    assert(resolveAs400SnapshotMode("initial", fullLoadDone = true) === "never")
    assert(resolveAs400SnapshotMode("initial", fullLoadDone = false) === "initial")
  }

  test("as400 source: RPC connector class, library/journal semantics, URL shape") {
    val c = sourceConfig(SourceSpec(
      pipeline = "ibmi-pipe", dialect = As400, host = "ibmi.example", port = 9471,
      user = "repl", database = "QGPL", schema = "APPLIB",
      tables = Seq("ORDERS", "ITEMS"),
      additionalConfig = Map("journal_library" -> "JRNLIB")))
    assert(c("connector.class") === "io.debezium.connector.db2as400.As400RpcConnector")
    assert(c("database.dbname") === "QGPL")       // default library
    assert(c("database.schema") === "APPLIB")     // library the tables live in
    assert(c("table.include.list") === "APPLIB.ORDERS,APPLIB.ITEMS")
    assert(c("database.journal.library") === "JRNLIB")
    assert(c("database.port") === "9471")
    assert(c("snapshot.mode") === "initial")      // never + no full load → baseline
    assert(c("database.history.skip.unparseable.ddl") === "true")
    assert(c("transforms.unwrap.delete.handling.mode") === "rewrite")
    // defaults: port 446, journal QSYS, dbname QGPL
    val d = sourceConfig(SourceSpec(
      pipeline = "p", dialect = As400, host = "h", port = 0,
      user = "u", database = "", schema = "LIB1", tables = Seq("T")))
    assert(d("database.port") === "446")
    assert(d("database.journal.library") === "QSYS")
    assert(d("database.dbname") === "QGPL")
  }

  test("s3 sink: bucket/flush defaults, prefix slash, partitioner choices") {
    val base = S3SinkSpec(
      connector = "s3sink", bucket = "lake", accessKeyId = "AK", secretAccessKey = "SK",
      topics = Seq("pipe.public.users", "pipe.public.orders"), prefix = "cdc/raw")
    val c = s3SinkConfig(base)
    assert(c("connector.class") === "io.confluent.connect.s3.S3SinkConnector")
    assert(c("topics") === "pipe.public.users,pipe.public.orders")
    assert(c("s3.bucket.name") === "lake")
    assert(c("flush.size") === "10")              // reference default for visibility
    assert(c("s3.part.size") === "5242880")
    assert(c("s3.prefix") === "cdc/raw/")         // trailing slash added
    assert(c("format.class") === "io.confluent.connect.s3.format.json.JsonFormat")
    assert(c("partitioner.class") === "io.confluent.connect.storage.partitioner.DefaultPartitioner")
    assert(!c.contains("s3.endpoint.url"))
    val t = s3SinkConfig(base.copy(timePartitioned = true, endpointUrl = Some("http://minio:9000")))
    assert(t("partitioner.class") === "io.confluent.connect.storage.partitioner.TimeBasedPartitioner")
    assert(t("path.format") === "'dt'=YYYY-MM-dd") // matches TableSink.writeTimePartitioned layout
    assert(t("s3.endpoint.url") === "http://minio:9000")
    assertThrows[IllegalArgumentException](s3SinkConfig(base.copy(topics = Nil)))
    assertThrows[IllegalArgumentException](s3SinkConfig(base.copy(bucket = "")))
    assertThrows[IllegalArgumentException](s3SinkConfig(base.copy(secretAccessKey = "")))
  }

  test("snowflake sink: url normalization, auth precedence, topic2table map") {
    assert(snowflakeUrl("xy12345") === "https://xy12345.snowflakecomputing.com")
    assert(snowflakeUrl("https://XY12345.us-east-1.snowflakecomputing.com/")
      === "https://xy12345.us-east-1.snowflakecomputing.com")
    val base = SnowflakeSinkSpec(
      connector = "sf", account = "xy12345", user = "loader",
      database = "DW", schema = "CDC",
      topics = Seq("pipe.public.Users"), password = Some("pw"))
    val c = snowflakeSinkConfig(base)
    assert(c("connector.class") === "com.snowflake.kafka.connector.SnowflakeSinkConnector")
    assert(c("snowflake.url.name") === "https://xy12345.snowflakecomputing.com")
    assert(c("snowflake.password") === "pw")
    assert(c("buffer.count.records") === "10000")
    assert(c("snowflake.topic2table.map") === "pipe.public.Users:users") // lowercased table
    assert(!c.contains("snowflake.private.key"))
    // key-pair auth wins over password; optional warehouse/role pass through
    val kp = snowflakeSinkConfig(base.copy(
      privateKey = Some("PEM"), privateKeyPassphrase = Some("pp"),
      warehouse = Some("WH"), role = Some("R"), batchSize = 500))
    assert(kp("snowflake.private.key") === "PEM")
    assert(kp("snowflake.private.key.passphrase") === "pp")
    assert(!kp.contains("snowflake.password"))
    assert(kp("snowflake.warehouse.name") === "WH")
    assert(kp("snowflake.role.name") === "R")
    assert(kp("buffer.count.records") === "500")
    assertThrows[IllegalArgumentException](
      snowflakeSinkConfig(base.copy(password = None)))
    assertThrows[IllegalArgumentException](
      snowflakeSinkConfig(base.copy(schema = "")))
  }

  test("chunked JDBC read options drive a parallel range copy per dialect") {
    def spec(d: ConnectorConfig.Dialect) = ChunkedReadSpec(
      dialect = d, host = "db", port = 5432, user = "cdc",
      database = "app", schema = "", table = "orders",
      partitionColumn = "o_orderkey", lowerBound = 1L, upperBound = 1500000L,
      chunkSize = 100000L)
    val pg = chunkedReadOptions(spec(Postgres))
    assert(pg("url") === "jdbc:postgresql://db:5432/app")
    assert(pg("driver") === "org.postgresql.Driver")
    assert(pg("dbtable") === "\"public\".\"orders\"")
    assert(pg("partitionColumn") === "o_orderkey")
    assert(pg("lowerBound") === "1" && pg("upperBound") === "1500000")
    assert(pg("numPartitions") === "15", "1.5M keys / 100k chunk = 15 ranges")
    assert(pg("fetchsize") === "1000")
    val mssql = chunkedReadOptions(spec(SqlServer))
    assert(mssql("url") === "jdbc:sqlserver://db:5432;databaseName=app")
    assert(mssql("driver") === "com.microsoft.sqlserver.jdbc.SQLServerDriver")
    assert(mssql("dbtable") === "[dbo].[orders]")
    val ora = chunkedReadOptions(spec(OracleDb).copy(schema = "app"))
    assert(ora("driver") === "oracle.jdbc.OracleDriver")
    assert(ora("dbtable") === "\"APP\".\"ORDERS\"",
      "Oracle catalogs unquoted identifiers uppercase — schema AND table")
    // Oracle's empty schema default = the connecting user's own schema:
    // no qualifier, never a zero-length quoted identifier
    val oraDefault = chunkedReadOptions(spec(OracleDb))
    assert(oraDefault("dbtable") === "\"ORDERS\"")
    val as4 = chunkedReadOptions(spec(As400).copy(database = "LIB1"))
    assert(as4("url") === "jdbc:as400://db/LIB1")
    assert(as4("driver") === "com.ibm.as400.access.AS400JDBCDriver")
    val db2 = chunkedReadOptions(spec(Db2))
    assert(db2("url") === "jdbc:db2://db:5432/app")
    assert(db2("dbtable") === "\"DB2INST1\".\"ORDERS\"")
  }

  test("chunked read caps partitions and never emits zero") {
    val base = ChunkedReadSpec(
      dialect = Postgres, host = "db", port = 5432, user = "cdc",
      database = "app", schema = "", table = "t",
      partitionColumn = "id", lowerBound = 0L, upperBound = 0L)
    // single-key table: 1 partition, not 0
    assert(chunkedReadOptions(base)("numPartitions") === "1")
    // 10B keys at 100k/chunk would be 100k connections — capped
    val huge = base.copy(upperBound = 10_000_000_000L, maxPartitions = 64)
    assert(chunkedReadOptions(huge)("numPartitions") === "64")
    assertThrows[IllegalArgumentException](
      chunkedReadOptions(base.copy(upperBound = -1L)))
    assertThrows[IllegalArgumentException](
      chunkedReadOptions(base.copy(partitionColumn = "")))
  }

  test("source topics parse back through the envelope router") {
    // topic format {prefix}.{schema}.{table} is what Cdc.parseEnvelope splits
    val c = sourceConfig(src.copy(pipeline = "pipe"))
    val topic = s"${c("topic.prefix")}.public.users"
    assert(topic.split("\\.").toSeq === Seq("pipe", "public", "users"))
  }

  test("kafka read options subscribe to exactly the provisioned topics") {
    val spec = KafkaReadSpec(
      bootstrap = "broker-1:9092,broker-2:9092",
      source = src.copy(pipeline = "pipe", schema = "",
        tables = Seq("users", "orders")))
    val opts = kafkaReadOptions(spec)
    assert(opts("kafka.bootstrap.servers") === "broker-1:9092,broker-2:9092")
    // Debezium topic naming {prefix}.{schema}.{table}, schema defaulted per
    // dialect — the SAME topics sourceConfig's connector will produce
    assert(opts("subscribe") === "pipe.public.users,pipe.public.orders")
    assert(opts("maxOffsetsPerTrigger") === "100000")
    assert(opts("failOnDataLoss") === "false")
    // every subscribed topic routes back through the envelope parser
    opts("subscribe").split(",").foreach { t =>
      assert(t.split("\\.").length === 3, s"unroutable topic $t")
    }
    // AS400 topics use the resolved library, like the source connector
    val as4 = kafkaReadOptions(spec.copy(source = spec.source.copy(
      dialect = As400, schema = "", database = "LIB1", tables = Seq("members"))))
    assert(as4("subscribe") === "pipe.LIB1.members")
  }

  test("kafka read starting offsets follow the full-load handoff") {
    val base = KafkaReadSpec(bootstrap = "b:9092",
      source = src.copy(tables = Seq("users")))
    // no full load: consume the topic from the beginning (the reference
    // consumer's auto_offset_reset='earliest'); checkpoint rules thereafter
    assert(kafkaReadOptions(base)("startingOffsets") === "earliest")
    // completed full load: the backlog is already in the state table —
    // starting earliest would replay the whole snapshot through the wire
    val afterLoad = base.copy(source = base.source.copy(fullLoadDone = true))
    assert(kafkaReadOptions(afterLoad)("startingOffsets") === "latest")
    assertThrows[IllegalArgumentException](kafkaReadOptions(base.copy(bootstrap = "")))
    assertThrows[IllegalArgumentException](
      kafkaReadOptions(base.copy(source = base.source.copy(tables = Nil))))
    assertThrows[IllegalArgumentException](kafkaReadOptions(base.copy(maxOffsetsPerTrigger = 0)))
  }
}
