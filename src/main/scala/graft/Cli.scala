package graft

import graft.cdc.Discovery

/** Operational CLI — the reference's cli.py counterpart.
  *
  * Usage (via sbt or spark-submit):
  *   graft.Cli tables <sfDir>              list tables + schemas
  *   graft.Cli describe <sfDir> <table>    per-column describe
  *   graft.Cli run <sfDir> <query> [n]     run a named operator, show n rows
  *   graft.Cli queries                     list operator names
  *   graft.Cli pipeline <wire> <state> <ckpt> [sfDir]
  *                                         publish wire from sfDir (if given)
  *                                         then run the streaming pipeline
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    lazy val spark = Tables.localSession("graft-cli",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    args(0) match {
      case "tables" =>
        spark.sparkContext.setLogLevel("WARN")
        Discovery.listTables(spark, args(1)).show(100, truncate = false)
      case "describe" =>
        spark.sparkContext.setLogLevel("WARN")
        Discovery.describeTable(spark, args(1), args(2)).show(100, truncate = false)
      case "queries" =>
        SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      case "run" =>
        spark.sparkContext.setLogLevel("WARN")
        val n = if (args.length > 3) args(3).toInt else 20
        SparkEntry.queries.get(args(2)) match {
          case Some(fn) => fn(spark, args(1)).show(n, truncate = false)
          case None =>
            System.err.println(s"unknown query '${args(2)}'; see `graft.Cli queries`")
            sys.exit(2)
        }
      case "connector" =>
        // connector <source|sink> <pipeline> <dialect> <host> <port> <db> <schema> <tables-csv>
        import graft.cdc.ConnectorConfig
        import graft.cdc.ConnectorConfig._
        val dialect = parseDialect(args(3))
        if (args(1) == "sink" && (dialect == As400 || dialect == Db2)) {
          System.err.println(s"dialect '${args(3)}' is source-only (sinks: jdbc dialects, s3, snowflake)")
          sys.exit(2)
        }
        val cfgMap = args(1) match {
          case "source" => ConnectorConfig.sourceConfig(SourceSpec(
            pipeline = args(2), dialect = dialect, host = args(4), port = args(5).toInt,
            user = "cdc", database = args(6), schema = args(7),
            tables = args(8).split(",").toSeq))
          case "sink" => ConnectorConfig.sinkConfig(SinkSpec(
            connector = args(2), dialect = dialect, host = args(4), port = args(5).toInt,
            user = "cdc", database = args(6), schema = args(7),
            topics = args(8).split(",").toSeq))
          case k => System.err.println(s"unknown connector kind '$k'"); sys.exit(2)
        }
        cfgMap.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"$k=$v") }
      case "pipeline" =>
        spark.sparkContext.setLogLevel("WARN")
        if (args.length > 4) graft.sources.WireSource.publish(spark, args(4), args(1))
        val q = Pipeline.start(spark, Pipeline.Config(args(1), args(2), args(3)))
        q.processAllAvailable()
        println(Pipeline.status(q))
        q.stop()
        println(s"state rows: ${spark.read.parquet(args(2)).count()}")
      case "sync-ddl" =>
        // sync-ddl <sfDir> <table> <dialect>: the schema-sync delta DDL
        // against the same synthetic drift cdc_schema_drift reports
        import graft.cdc.SchemaDdl
        spark.sparkContext.setLogLevel("ERROR")
        val dialect: SchemaDdl.Dialect = args(3) match {
          case "postgresql" => SchemaDdl.Postgres
          case "sqlserver"  => SchemaDdl.SqlServer
          case "oracle"     => SchemaDdl.Oracle
          case "snowflake"  => SchemaDdl.Snowflake
          case d => System.err.println(s"unknown dialect '$d'"); sys.exit(2)
        }
        val source = Tables.load(spark, args(1), args(2))
        val target = source.drop(source.columns.last)
          .withColumn("legacy_sync_ts", org.apache.spark.sql.functions.current_timestamp())
        val plan = SchemaDdl.alterTableDdl(args(2), source.schema,
          target.schema, dialect)
        plan.statements.foreach(s => println(s"$s;"))
        plan.warnings.foreach(w => System.err.println(s"-- WARNING: $w"))
      case "chunked-read" =>
        // chunked-read <dialect> <host> <port> <db> <schema> <table> <pk> <lo> <hi>
        import graft.cdc.ConnectorConfig
        import graft.cdc.ConnectorConfig._
        ConnectorConfig.chunkedReadOptions(ChunkedReadSpec(
          dialect = parseDialect(args(1)), host = args(2), port = args(3).toInt, user = "cdc",
          database = args(4), schema = args(5), table = args(6),
          partitionColumn = args(7), lowerBound = args(8).toLong, upperBound = args(9).toLong))
          .toSeq.sortBy(_._1).foreach { case (k, v) => println(s"$k=$v") }
      case other =>
        System.err.println(s"unknown command '$other'"); usage(); sys.exit(2)
    }
    if (args(0) != "queries") spark.stop()
  }

  /** CLI name → connector dialect; the reference routes both AS400
    * spellings to the same connector (debezium_config.py:64-75). */
  private def parseDialect(name: String): graft.cdc.ConnectorConfig.Dialect = {
    import graft.cdc.ConnectorConfig._
    name match {
      case "postgresql" => Postgres
      case "sqlserver"  => SqlServer
      case "oracle"     => OracleDb
      case "as400" | "ibm_i" => As400
      case "db2" => Db2
      case d => System.err.println(s"unknown dialect '$d'"); sys.exit(2)
    }
  }

  private def usage(): Unit =
    System.err.println(
      "usage: graft.Cli tables <sfDir> | describe <sfDir> <table> | queries | " +
        "run <sfDir> <query> [n] | pipeline <wire> <state> <ckpt> [sfDir] | " +
        "sync-ddl <sfDir> <table> <dialect> | " +
        "chunked-read <dialect> <host> <port> <db> <schema> <table> <pk> <lo> <hi>")
}
