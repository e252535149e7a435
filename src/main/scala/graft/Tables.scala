package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  *
  * Every operator in this library is written against generic DataFrames; these
  * helpers only bind them to the synthetic parquet fixtures. At production
  * scale the same operators run over whatever the catalog serves — the parquet
  * reader here is the only fixture-specific code.
  */
object Tables {
  /** Per-(session, path) plan cache: `spark.read.parquet` re-lists files and
    * re-reads footers for the schema on every call, and a Verify/Bench pass
    * issues ~100 loads of the same ten files. The cached value is just the
    * immutable logical plan — rows are not pinned, every query still scans.
    *
    * ASSUMES IMMUTABLE PATHS: the cached plan keeps its first file listing,
    * so a path that is rewritten/appended in the same session would read
    * stale files through `load`. That is the right trade for the read-only
    * test fixtures this object binds; a writer-then-reader flow must call
    * [[invalidate]] after the write (or read via `spark.read` directly, as
    * the etl/SnapshotIO paths do — nothing in graft writes under these
    * fixture dirs). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  /** Drop cached plans for `path` (every session), re-listing on next load —
    * for the rare rewrite-then-reload flow. Also the session-leak valve: the
    * map retains SparkSession keys until invalidated. */
  def invalidate(path: String): Unit =
    cache.keySet.removeIf(_._2.startsWith(path))

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events fixture's `ts` physical type has varied across driver
    * generations: parquet TIMESTAMP(MICROS) without UTC adjustment (reads as
    * TIMESTAMP_NTZ) in current data, TIMESTAMP(NANOS) (which Spark 4 refuses
    * by default, PARQUET_TYPE_ILLEGAL) in earlier ones. Adapt by the type
    * actually read, normalizing to session-TZ TIMESTAMP either way — the
    * session runs UTC, so the NTZ→TZ cast is value-identity and downstream
    * plans (windows, watermarks, parquet output read back by the oracle
    * comparison) behave identically across fixture generations. */
  /** True when `PARQUET_TYPE_ILLEGAL` appears anywhere in the failure —
    * message OR cause chain: Spark 4 sometimes surfaces the error class only
    * on a nested cause (e.g. wrapped in a file-reader or execution
    * exception), so a top-level-message test silently misses it. The visited
    * set guards against pathological cause cycles. */
  private[graft] def isNanosTypeRefusal(t: Throwable): Boolean = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    var cur = t
    while (cur != null && seen.add(cur)) {
      if (String.valueOf(cur.getMessage).contains("PARQUET_TYPE_ILLEGAL")) return true
      cur = cur.getCause
    }
    false
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df =
      try load(spark, dir, "events")
      catch {
        case e: Exception if isNanosTypeRefusal(e) => loadEventsNanos(spark, dir)
      }
    df.schema("ts").dataType match {
      case LongType => // nanos read as long: truncate to micros, as DuckDB does
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
      case TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Legacy TIMESTAMP(NANOS) read path (nanos surfaced as LongType). */
  private def loadEventsNanos(spark: SparkSession, dir: String): DataFrame = {
    // The conf is only needed during eager schema conversion at read time —
    // leaving it set would silently turn every later TIMESTAMP(NANOS) column
    // session-wide into LongType. The set/read/unset triple is guarded by a
    // JVM-wide lock: sbt runs suites in parallel on one SparkSession, and an
    // unsynchronized unset could race another thread mid schema-inference
    // (flaky PARQUET_TYPE_ILLEGAL) or leak the flag into unrelated reads.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    nanosLock.synchronized {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try load(spark, dir, "events")
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
  private val nanosLock = new Object
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
