package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.1). Each object maps one reference
  * ingestion pattern onto the Spark-native equivalent; the JDBC/Kafka
  * builders carry the batching knobs the reference tuned by hand
  * (fetchmany/chunksize/yield_per → fetchsize/batchsize options).
  */
object Jdbc {

  /** S1/S4: whole-table JDBC read (`sparkFiles/sparkProcess.py:181-188`).
    * `fetchSize` is the reference's cursor batch (1000,
    * `dags/hanger_lane.py:367-371`). */
  def read(spark: SparkSession, url: String, table: String,
           fetchSize: Int = 1000): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", fetchSize)
      .load()

  /** S3: pushed-down query with a partitioned range read — the distributed
    * upgrade of the reference's single pyodbc cursor: N executors each pull
    * a cursor slice. */
  def readPartitioned(spark: SparkSession, url: String, query: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int, fetchSize: Int = 1000): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      // Spark forbids 'query' together with 'partitionColumn'
      // (JDBCOptions require) — the pushed query rides as a dbtable
      // subquery. No leading underscore in the alias: Derby (and the ANSI
      // grammar) reject identifiers that start with '_'
      .option("dbtable", s"($query) graft_q")
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("fetchsize", fetchSize)
      .load()

  /** S2/S14/S16: JDBC write; `batchSize` is the reference's commit batch
    * (1000 rows, `dags/hanger_lane.py:483-504`). */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Append, batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode(mode)
      .save()
}

object Files {

  /** S6 (CSV flavor): directory of delimited files with explicit schema —
    * the delimited twin of the Excel reference-data load
    * (`etl_load_reference_data.py:22-34`). */
  def csvDir(spark: SparkSession, dir: String, schema: StructType,
             header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header).csv(dir)

  /** S6 (native .xlsx flavor): real workbook parse — zip + StAX on the bare
    * JDK, one task per file (see [[Excel]]); same schema-bound positional
    * contract as [[csvDir]]. */
  def excelDir(spark: SparkSession, dir: String, schema: StructType,
               header: Boolean = true): DataFrame =
    Excel.readDir(spark, dir, schema, header)

  /** S5/S7 write side. */
  def writeCsv(df: DataFrame, dir: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.option("header", true).mode(mode).csv(dir)
}

object Rest {

  /** S8: REST JSON landed driver-side, parallelized, schema-inferred or
    * bound (`dags/get_data_api.py:17-22`). The fetch itself stays at the
    * edge (driver or upstream job); the engine takes the payload strings. */
  def fromJsonStrings(spark: SparkSession, payloads: Seq[String],
                      schema: Option[StructType] = None): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(payloads)
    schema.map(s => spark.read.schema(s).json(ds)).getOrElse(spark.read.json(ds))
  }
}

object Kafka {

  /** S9/T3: Debezium-style CDC topics → streaming DataFrame. Config-only
    * builder (the connector jar ships separately); route by topic and apply
    * via `EventStream.upsertBatch` (`scripts/test/transform.py:46-83`). */
  def readStream(spark: SparkSession, brokers: String, topics: Seq[String],
                 startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .load()

  /** S10/T2: value-column producer (`dags/get_data_api.py:42-64`). */
  def writeStream(df: DataFrame, brokers: String, topic: String,
                  checkpointDir: String) =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
}

object Synthetic {

  /** S12: deterministic faker-twin (`dags/get_data_faker.py:10-25`) —
    * `spark.range` + seeded hash expressions instead of a driver-side RNG
    * loop: fully distributed, reproducible, any size. */
  def transactions(spark: SparkSession, n: Long, seed: Int = 42): DataFrame = {
    val categories = Seq("grocery", "fuel", "apparel", "electronics", "dining")
    // independent hash per field — a single shared hash would make category
    // a deterministic function of the amount's cents (100000 % 5 == 0), and
    // created_at correlated with both. pmod, not abs: abs(Long.MinValue)
    // stays negative (two's complement).
    def h(field: Int) = pmod(xxhash64(col("id"), lit(seed), lit(field)), lit(Long.MaxValue))
    spark.range(n).select(
      col("id").as("txn_id"),
      md5(concat(col("id").cast("string"), lit(seed))).as("txn_uuid"),
      (h(1) % 100000 / lit(100.0)).as("amount"),
      element_at(typedlit(categories), (h(2) % categories.size).cast("int") + 1)
        .as("category"),
      timestamp_micros(lit(1704067200000000L) + (h(3) % 31536000000L) * 1000).as("created_at"))
  }
}

object Catalog {

  /** S13: table-name-driven dynamic ETL loop
    * (`build_etl_pipeline_python.py:23-30`): the catalog is the work list. */
  def tablesMatching(spark: SparkSession, database: String,
                     wanted: Set[String]): Seq[String] =
    spark.catalog.listTables(database).collect()
      .map(_.name).filter(wanted.contains).toSeq
}
