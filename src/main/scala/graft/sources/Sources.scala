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

  /** S1–S3 upgraded to DataSource V2: register a JDBC *table catalog* under
    * `name`, so `spark.read.table("<name>.<schema>.<table>")` plans through
    * the V2 scan builder — which pushes AGGREGATES (partial aggregation
    * with group-by columns), limits and offsets down into the database, on
    * top of the filter/column pruning the V1 `format("jdbc")` path already
    * does. This is the Spark-native analog of the reference pushing its
    * whole 7-way join+aggregate into MSSQL as one SQL string
    * (`dags/hanger_lane.py:287-357`): the database does the reduction, the
    * cluster receives pre-aggregated rows. JdbcRoundTripSpec proves the
    * plan (`PushedAggregates`/`PushedGroupByExpressions`/`PushedFilters`)
    * against embedded Derby and cross-checks results vs the in-engine
    * aggregation.
    *
    * At 100 TB this is the difference between shipping a fact table
    * through the network to aggregate it and shipping its GROUP BY result:
    * push the reduction to where the data lives whenever the source can
    * run it. */
  def registerCatalog(spark: SparkSession, name: String, url: String,
                      options: Map[String, String] = Map.empty): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    // explicit, not default-trusting: these are the point of the V2 path
    spark.conf.set(s"spark.sql.catalog.$name.pushDownAggregate", "true")
    spark.conf.set(s"spark.sql.catalog.$name.pushDownLimit", "true")
    spark.conf.set(s"spark.sql.catalog.$name.pushDownOffset", "true")
    options.foreach { case (k, v) =>
      spark.conf.set(s"spark.sql.catalog.$name.$k", v)
    }
  }
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

  /** S7 (native .xlsx flavor): single workbook, the `df.to_excel(...)`
    * twin — driver-streamed, small-frame contract (see
    * [[Excel.writeWorkbook]]); one-workbook-per-partition via
    * [[Excel.writeDir]] is the scale path. */
  def writeExcel(df: DataFrame, file: String, header: Boolean = true): Unit =
    Excel.writeWorkbook(df, file, header)

  /** ORC flavor of the columnar interchange surface (Spark's built-in
    * reader/writer — footer statistics, predicate pushdown, and column
    * pruning work exactly as for parquet; SourcesSpec pins the pushdown in
    * the plan). Avro is the one mainstream format this build CANNOT serve:
    * the spark-avro connector jar is absent from the offline environment
    * (only avro-core ships with Spark), the Kafka-jar situation again. */
  def orcDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)

  def writeOrc(df: DataFrame, dir: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(dir)
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

  /** Default transport: plain GET, body as UTF-8. Kept tiny — auth headers,
    * throttling etc. belong in a caller-supplied `get`. */
  def httpGet(url: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  /** The driver-side GET loop the reference runs inside its DAG
    * (`dags/get_data_api.py:17-22` — `requests.get` under Airflow's
    * `retries`/`retry_delay`): page-numbered pagination with per-request
    * retry/backoff via [[graft.etl.Retry]]. Fetches `urlForPage(0..)` until
    * `hasMore(page, body)` says stop or `maxPages` is reached (a hard cap —
    * an API that never drains must not spin the driver forever). Transport
    * is injectable for tests and for auth/throttle decoration; the result
    * feeds [[fromJsonStrings]].
    *
    * Driver-side BY DESIGN: the fetch is edge I/O bounded by `maxPages`,
    * not data-scale work — the engine parallelizes the parsed payloads,
    * never the HTTP calls. */
  def fetchPaginated(urlForPage: Int => String,
                     hasMore: (Int, String) => Boolean,
                     maxPages: Int = 1000,
                     policy: graft.etl.Retry.Policy = graft.etl.Retry.Policy(),
                     get: String => String = httpGet): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = 0
    var more = true
    while (more && page < maxPages) {
      val (body, _) = graft.etl.Retry.withRetry(policy)(get(urlForPage(page)))
      out += body
      more = hasMore(page, body)
      page += 1
    }
    out.toSeq
  }

  /** Cursor-style twin of [[fetchPaginated]]: follow `nextUrl(body)` links
    * from `firstUrl` until the API stops supplying one (or `maxPages`). */
  def fetchCursor(firstUrl: String,
                  nextUrl: String => Option[String],
                  maxPages: Int = 1000,
                  policy: graft.etl.Retry.Policy = graft.etl.Retry.Policy(),
                  get: String => String = httpGet): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var url = Option(firstUrl)
    while (url.isDefined && out.length < maxPages) {
      val (body, _) = graft.etl.Retry.withRetry(policy)(get(url.get))
      out += body
      url = nextUrl(body)
    }
    out.toSeq
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
    * (`build_etl_pipeline_python.py:23-30`): the catalog is the work list.
    * Matching is case-insensitive — the analyzer lower-cases catalog
    * identifiers, so a wanted set carrying the source DB's native casing
    * ("ORDERS") would otherwise silently select nothing. */
  def tablesMatching(spark: SparkSession, database: String,
                     wanted: Set[String]): Seq[String] = {
    val wantedLower = wanted.map(_.toLowerCase(java.util.Locale.ROOT))
    spark.catalog.listTables(database).collect()
      .map(_.name)
      .filter(n => wantedLower.contains(n.toLowerCase(java.util.Locale.ROOT)))
      .toSeq
  }
}

/** Bucketed-table layout — the storage-level answer to "this fact table is
  * joined/aggregated on the same key every day". Writing pays ONE shuffle
  * into `buckets` hash buckets (optionally sorted within each); every later
  * equi-join between tables bucketed the same way, and every aggregation on
  * the bucket key, then runs with NO Exchange — at 100 TB that converts the
  * nightly star join from a corpus-sized shuffle into a co-located zip
  * (BucketedJoinSpec proves the Exchange-free plans). Catalyst only uses
  * bucketing through the catalog, so these are `saveAsTable`/`table` rather
  * than path reads; both sides of a join must agree on bucket count.
  */
object Bucketed {

  /** Write `df` as a bucketed catalog table (overwrite). */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
            sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
