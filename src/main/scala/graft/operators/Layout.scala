package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-dimensional data layout: z-order clustering, a parquet-footer skip
  * index, and incremental cell-grain re-clustering.
  *
  * The reference engine stores extracts as flat row-ordered tables and
  * re-scans them per query (`scripts/Python_ETL/product/product_pipeline.py:23`
  * extracts with a bare `select *` and `:35` lands a full replace — no
  * clustering, no file statistics; every downstream predicate pays a full
  * scan).
  * At 100 TB the scan bill is decided by LAYOUT, not by the query engine:
  * a table clustered so that file-level min/max statistics bound each file's
  * key ranges lets a reader skip files wholesale, and a z-order (Morton)
  * interleave gives that bound on SEVERAL columns at once — a box predicate
  * on (a, b) touches O(sqrt) of the files instead of all of them, and a
  * predicate on either single dimension still prunes, which no single-column
  * sort can offer for the non-leading dimension.
  *
  * Design choices, all driven by the multi-executor model:
  *
  *  - The z-value is a pure codegen'd expression tree (shifts + masks, no
  *    UDF), so clustering is one `repartition` + local sort — the same
  *    shuffle any global sort pays, nothing extra.
  *  - Bucketization is EXACT integer math `((c - min) * 2^bits) div span`,
  *    replayable bit-for-bit in any engine (the DuckDB oracles replay it);
  *    bounds are frozen at first write into `_zmeta` so later batches
  *    bucket IDENTICALLY (out-of-range values clamp to the edge buckets —
  *    re-bucketing the whole table because one new row exceeded max would
  *    defeat incrementality).
  *  - The skip index is built from parquet FOOTER statistics only — O(files)
  *    metadata reads fanned out over executors, ZERO data bytes. At 100 TB
  *    this is the difference between an index build that costs a listing
  *    and one that costs a table scan.
  *  - Incremental optimize rewrites ONLY the z-cells the new batch touches,
  *    via the same dynamic-partition-overwrite discipline the streaming
  *    dedup sinks use (cell = partition directory). Untouched files are
  *    never opened, never rewritten; planning reads only the skip index.
  */
object Layout {

  /** Exact integer bucket of `c` into [0, 2^bits) given frozen bounds.
    * Values outside [minC, maxC] clamp to the edge buckets (see scaladoc).
    * Integer division via the SQL `div` operator — no double rounding.
    * Everything is cast to long HERE so every call site inherits the
    * overflow guard: an IntegerType dimension whose span exceeds
    * 2^(31-bits) would otherwise wrap in the `clamped - minC` subtraction
    * before the long-literal multiply promotes. */
  def zBucket(c: Column, minC: Column, maxC: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits out of range: $bits")
    val lo = minC.cast("long")
    val hi = maxC.cast("long")
    val clamped = greatest(lo, least(hi, c.cast("long")))
    call_function("div",
      (clamped - lo) * lit(1L << bits),
      hi - lo + lit(1L))
  }

  /** Morton interleave of two bucket columns (each in [0, 2^bits)): bit i of
    * `a` lands at position 2i+1, bit i of `b` at 2i. Pure shift/mask tree —
    * whole-stage-codegen-friendly, 4·bits integer ops per row. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Frozen bucketization bounds for a clustered layout. */
  final case class ZBounds(aMin: Long, aMax: Long, bMin: Long, bMax: Long)

  private val ZMETA = "_zmeta"
  private val SKIPINDEX = "_skipindex"

  /** Columns appended by [[withZ]]. */
  val ZVAL = "zval"
  val ZCELL = "zcell"

  /** Append `zval` (2·bits-bit Morton code of dims) and `zcell` (its top
    * `cellBits` bits — the partition-directory grain) to `df`. */
  def withZ(df: DataFrame, dimA: String, dimB: String, bounds: ZBounds,
            bits: Int, cellBits: Int): DataFrame = {
    require(cellBits >= 1 && cellBits <= 12, s"cellBits out of range: $cellBits")
    require(cellBits <= 2 * bits, "cellBits must not exceed the z-value width")
    val span = math.max(bounds.aMax - bounds.aMin, bounds.bMax - bounds.bMin)
    require(span <= (Long.MaxValue >> bits),
      s"dimension span $span overflows at $bits bucket bits")
    // zBucket casts its operands to long itself (the overflow guard lives
    // there so direct callers inherit it too)
    val ab = zBucket(col(dimA), lit(bounds.aMin), lit(bounds.aMax), bits)
    val bb = zBucket(col(dimB), lit(bounds.bMin), lit(bounds.bMax), bits)
    df.withColumn(ZVAL, zValue2(ab, bb, bits))
      .withColumn(ZCELL, shiftright(col(ZVAL), 2 * bits - cellBits))
  }

  /** Cluster `df` by the z-order of two long columns and land it under
    * `outDir` as one partition directory per z-cell (`zcell=N/`), rows
    * sorted by the full z-value within each cell. Also freezes the
    * bucketization bounds into `_zmeta` and builds the footer skip index.
    *
    * The bounds collect is ONE 1-row aggregate — the only driver-side read.
    * The write is one hash shuffle on `zcell` (≤ 2^cellBits reducers) plus
    * a local sort: exactly what any clustering must pay, and at 1000
    * executors each cell lands as a handful of large sorted files. */
  def clusterByZOrder(df: DataFrame, dimA: String, dimB: String,
                      outDir: String, bits: Int = 16, cellBits: Int = 6,
                      statsCols: Seq[String] = Nil,
                      bloomCols: Seq[String] = Nil): ZBounds = {
    val r = df.agg(
      min(col(dimA)).cast("long"), max(col(dimA)).cast("long"),
      min(col(dimB)).cast("long"), max(col(dimB)).cast("long")).head()
    require(!r.anyNull, s"cannot cluster an empty frame or null-only dims")
    val bounds = ZBounds(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    withZ(df, dimA, dimB, bounds, bits, cellBits)
      .repartition(col(ZCELL))
      .sortWithinPartitions(ZCELL, ZVAL)
      .drop(ZVAL)
      .write.mode("overwrite")
      .options(bloomCols.map(c =>
        s"parquet.bloom.filter.enabled#$c" -> "true").toMap)
      .partitionBy(ZCELL).parquet(outDir)
    val idxCols = if (statsCols.nonEmpty) statsCols else Seq(dimA, dimB)
    writeSkipIndex(df.sparkSession, outDir, idxCols)
    // _zmeta lands LAST: it is the layout's commit marker — a streaming
    // replay that finds no _zmeta re-clusters from scratch (overwrite), one
    // that finds it routes through the idempotent optimize path.
    writeZMeta(df.sparkSession, outDir, bounds, bits, cellBits, bloomCols,
      idxCols)
    bounds
  }

  private def writeZMeta(spark: SparkSession, dir: String, bounds: ZBounds,
                         bits: Int, cellBits: Int, bloomCols: Seq[String],
                         indexCols: Seq[String] = Nil): Unit = {
    import spark.implicits._
    // index_cols makes an ABSENT _skipindex recoverable: validatedSkipIndex
    // rebuilds from footers with exactly the columns the layout indexed
    Seq((bounds.aMin, bounds.aMax, bounds.bMin, bounds.bMax, bits, cellBits,
        bloomCols.mkString(","), indexCols.mkString(",")))
      .toDF("a_min", "a_max", "b_min", "b_max", "bits", "cell_bits",
        "bloom_cols", "index_cols")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$ZMETA")
  }

  /** (bounds, bits, cellBits) as frozen by [[clusterByZOrder]]. */
  def readZMeta(spark: SparkSession, dir: String): (ZBounds, Int, Int) = {
    val r = spark.read.parquet(s"$dir/$ZMETA")
      .select("a_min", "a_max", "b_min", "b_max", "bits", "cell_bits").head()
    (ZBounds(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
      r.getInt(4), r.getInt(5))
  }


  // -------------------------------------------------------------------
  // Footer skip index
  // -------------------------------------------------------------------

  /** Per-file statistics row: path, row count, and min/max per indexed
    * column (null when the footer carries no stats for it — such a file is
    * never pruned, the safe direction). */
  private def skipIndexSchema(cols: Seq[String]): StructType =
    StructType(
      StructField("file", StringType, nullable = false) +:
        StructField("n_rows", LongType, nullable = false) +:
        cols.flatMap(c => Seq(
          StructField(s"min_$c", LongType, nullable = true),
          StructField(s"max_$c", LongType, nullable = true))))

  /** Build the skip index for `cols` (integral columns) over every data
    * file under `dir`, from parquet FOOTERS only. The file list is read on
    * the driver (the same O(files) listing any scan pays); footer reads fan
    * out over executors — zero data pages are touched. */
  def buildSkipIndex(spark: SparkSession, dir: String,
                     cols: Seq[String]): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    buildSkipIndexFiles(spark, listDataFiles(hconf, dir), cols)
  }

  /** Footer-stats rows for an explicit file list (the incremental-refresh
    * entry: an optimize re-reads only the touched cells' footers). */
  private def buildSkipIndexFiles(spark: SparkSession, files: Array[String],
                                  cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one stats column required")
    val schema = skipIndexSchema(cols)
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val hconf = spark.sparkContext.hadoopConfiguration
    // Ship the session's hadoop conf as plain pairs (the WebDatasetV2
    // discipline): one copy per task closure, not per partition.
    val confKv = hconf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    val statCols = cols.toArray
    val slices = math.max(1, math.min(files.length,
      spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(files.toIndexedSeq, slices).map { file =>
      val c = new Configuration(false)
      confKv.foreach { case (k, v) => c.set(k, v) }
      footerStatsRow(c, file, statCols)
    }
    spark.createDataFrame(rows, schema)
  }

  /** Data files under `dir`, recursive, skipping `_`/`.`-prefixed names
    * (sidecars, temp files) at every level — the same hidden-path rule
    * Spark's own file index applies. */
  private def listDataFiles(hconf: Configuration, dir: String): Array[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    def walk(p: Path): Array[String] =
      fs.listStatus(p).flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) Array.empty[String]
        else if (st.isDirectory) walk(st.getPath)
        else if (name.endsWith(".parquet")) Array(st.getPath.toString)
        else Array.empty[String]
      }
    walk(root)
  }

  /** One skip-index row from a single file's footer. Min/max aggregate
    * across row groups; a column missing from the footer (pruned file
    * schema) or carrying no statistics yields nulls. */
  private def footerStatsRow(conf: Configuration, file: String,
                             cols: Array[String]): Row = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val nRows = blocks.map(_.getRowCount).sum
      val perCol: Map[String, (Option[Long], Option[Long])] =
        cols.map { name =>
          var mn: Option[Long] = None
          var mx: Option[Long] = None
          var ok = true
          blocks.foreach { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == name) match {
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null || st.isEmpty || !st.hasNonNullValue) ok = false
                else st.genericGetMin match {
                  case n: java.lang.Number =>
                    val lo = n.longValue()
                    val hi = st.genericGetMax.asInstanceOf[java.lang.Number].longValue()
                    mn = Some(mn.fold(lo)(math.min(_, lo)))
                    mx = Some(mx.fold(hi)(math.max(_, hi)))
                  case _ => ok = false // non-integral column: never prune
                }
              case None => ok = false
            }
          }
          name -> (if (ok) (mn, mx) else (None, None))
        }.toMap
      Row.fromSeq(
        file +: nRows +: cols.flatMap { c =>
          val (mn, mx) = perCol(c)
          Seq(mn.map(Long.box).orNull, mx.map(Long.box).orNull)
        }.toSeq)
    } finally reader.close()
  }

  /** Build and land the skip index under `dir/_skipindex` (hidden from data
    * scans by the `_` prefix, the `_delta_log` convention). */
  def writeSkipIndex(spark: SparkSession, dir: String,
                     cols: Seq[String]): Unit =
    buildSkipIndex(spark, dir, cols)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/$SKIPINDEX")

  /** The landed skip index. */
  def readSkipIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$SKIPINDEX")

  /** Rewrite the landed skip index's absolute `file` paths from
    * `fromPrefix` to `toPrefix` — the relocation hook for a layout that
    * was MOVED wholesale (a restored backup, a fixture copy): the index's
    * stats are location-independent, only the path strings go stale, and
    * without the rebase a validated read would see zero overlap with the
    * live listing and pay a full footer rebuild. One tiny-sidecar rewrite;
    * stats untouched. */
  def rebaseSkipIndex(spark: SparkSession, dir: String,
                      fromPrefix: String, toPrefix: String): Unit = {
    // anchored + replacement-quoted: only a path's LEADING fromPrefix may
    // rewrite — an unanchored pattern would corrupt a data file whose
    // relative path happened to contain the prefix string mid-path
    val rebased = readSkipIndex(spark, dir)
      .withColumn("file", regexp_replace(col("file"),
        "^" + java.util.regex.Pattern.quote(fromPrefix),
        java.util.regex.Matcher.quoteReplacement(toPrefix)))
      .localCheckpoint()
    rebased.coalesce(1).write.mode("overwrite").parquet(s"$dir/$SKIPINDEX")
  }

  /** The skip index VALIDATED against the live file listing — the crash
    * contract for [[optimizeIncremental]]: a failure between its
    * dynamic-overwrite data commit and the `_skipindex` rewrite leaves the
    * index referencing deleted files (a pruned read would throw
    * FileNotFound) and missing the fresh ones (a silent FALSE NEGATIVE,
    * violating the never-a-false-negative contract). Every pruned read
    * already pays an O(files) listing somewhere; paying it HERE buys
    * self-healing: dead entries drop, unknown files get fresh footer
    * reads, and when drift was found the healed index is re-landed so the
    * window closes instead of being re-paid forever. The happy path
    * (no drift) adds one listing + one tiny-sidecar collect and writes
    * nothing.
    *
    * READ paths get the healed frame IN-MEMORY ONLY (`persistHealed` =
    * false, the default): a pruned scan must never require write
    * permission on the dataset directory, and two concurrent readers
    * healing the same drift must not race each other's overwrite of
    * `_skipindex`. Only the explicit maintenance entry point
    * ([[optimizeIncremental]], which already owns the single-writer
    * window) passes `persistHealed = true`, and the landing is staged:
    * the healed index is written to a temp sidecar and swapped in with
    * two renames, so a concurrent reader sees either the old index or
    * the new one, never a partially-written directory. */
  def validatedSkipIndex(spark: SparkSession, dir: String,
                         persistHealed: Boolean = false,
                         colsIfAbsent: Seq[String] = Nil): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = listDataFiles(hconf, dir)
    val fsys = new Path(dir).getFileSystem(hconf)
    if (persistHealed) sweepStaleIndexDirs(fsys, dir)
    // ABSENT index (a crashed swap between persistHealed's two renames, or
    // a never-indexed dir): rebuild wholesale from footers — the heal path
    // with nothing to keep — instead of throwing. The stats columns come
    // from the caller (readPruned/statsCount know their column) or the
    // `_zmeta` sidecar; with neither, the absence is unrecoverable here.
    if (!fsys.exists(new Path(s"$dir/$SKIPINDEX"))) {
      val cols =
        if (colsIfAbsent.nonEmpty) colsIfAbsent else zmetaIndexCols(spark, dir)
      require(cols.nonEmpty,
        s"$dir/$SKIPINDEX is absent and no stats columns are recoverable " +
          "(pass colsIfAbsent or rebuild via writeSkipIndex)")
      val rebuilt = buildSkipIndexFiles(spark, live, cols).localCheckpoint()
      if (persistHealed) {
        // stage-then-rename even with no live index to displace: an
        // in-place write would let a racing reader observe the dir
        // mid-write (exists() true, footers partial) — the same reason
        // the drift-heal branch below stages its swap
        val stamp = java.util.UUID.randomUUID().toString.take(8)
        val stageP = new Path(s"$dir/${SKIPINDEX}__stage-$stamp")
        rebuilt.coalesce(1).write.mode("overwrite").parquet(stageP.toString)
        if (!fsys.rename(stageP, new Path(s"$dir/$SKIPINDEX")))
          throw new java.io.IOException(
            s"skip-index rebuild failed: cannot land $stageP as " +
              s"$dir/$SKIPINDEX")
      }
      return rebuilt
    }
    val idx = readSkipIndex(spark, dir)
    val rows = idx.collect()
    val fileAt = idx.columns.indexOf("file")
    val idxFiles = rows.map(_.getString(fileAt)).toSet
    val liveSet = live.toSet
    if (idxFiles == liveSet) idx
    else {
      val statsCols = idx.columns.toSeq
        .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
      val keep = rows.filter(r => liveSet.contains(r.getString(fileAt)))
      val kept = spark.createDataFrame(
        spark.sparkContext.parallelize(keep.toIndexedSeq,
          math.max(1, math.min(keep.length,
            spark.sparkContext.defaultParallelism))),
        skipIndexSchema(statsCols))
      val fresh = live.filterNot(idxFiles.contains)
      val healed = kept.unionByName(buildSkipIndexFiles(spark, fresh, statsCols))
        .localCheckpoint()
      if (persistHealed) {
        // stage-then-swap: land the healed index beside the live one, then
        // rename old→trash, new→live, trash deleted last — a racing reader
        // sees the old index or the new one, never a partially-written
        // directory (between the two renames the index is briefly ABSENT,
        // but this branch runs only inside optimizeIncremental's
        // single-writer maintenance window, which already owns the table)
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val liveP = new org.apache.hadoop.fs.Path(s"$dir/$SKIPINDEX")
        val stamp = java.util.UUID.randomUUID().toString.take(8)
        val stageP = new org.apache.hadoop.fs.Path(s"$dir/${SKIPINDEX}__stage-$stamp")
        val trashP = new org.apache.hadoop.fs.Path(s"$dir/${SKIPINDEX}__old-$stamp")
        healed.coalesce(1).write.mode("overwrite").parquet(stageP.toString)
        // rename results CHECKED: a silently failed swap would leave the
        // live index stale (or absent) while this call reports healed
        if (fs.exists(liveP) && !fs.rename(liveP, trashP))
          throw new java.io.IOException(
            s"skip-index swap failed: cannot move $liveP aside")
        if (!fs.rename(stageP, liveP))
          throw new java.io.IOException(
            s"skip-index swap failed: cannot land $stageP as $liveP " +
              "(live index is ABSENT; the next validated read self-heals)")
        fs.delete(trashP, true)
      }
      healed
    }
  }

  /** Sweep `_skipindex__stage-*` / `_skipindex__old-*` leftovers of a
    * swap that crashed mid-flight — called only from the single-writer
    * maintenance window (`persistHealed = true`), where no concurrent
    * swap can own them. */
  private def sweepStaleIndexDirs(fs: org.apache.hadoop.fs.FileSystem,
                                  dir: String): Unit = {
    val root = new Path(dir)
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(s"${SKIPINDEX}__stage-") ||
          n.startsWith(s"${SKIPINDEX}__old-")) {
        fs.delete(st.getPath, true); ()
      }
    }
  }

  /** The `index_cols` list frozen in `_zmeta` (layouts written by a
    * [[clusterByZOrder]] that records it) — `Nil` when the sidecar or the
    * field is absent. */
  private def zmetaIndexCols(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(s"$dir/$ZMETA")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return Nil
    val df = spark.read.parquet(p.toString)
    if (!df.columns.contains("index_cols")) Nil
    else Option(df.select("index_cols").head().getString(0))
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
  }

  /** Read only the files whose `[min_col, max_col]` can intersect
    * `[lo, hi]`, then apply the exact predicate. Files with null stats are
    * kept (never a false negative). The index collect is O(surviving
    * files) strings — the same order as the file listing every scan
    * already pays; the files NOT collected are exactly the read's win. */
  def readPruned(spark: SparkSession, dir: String, colName: String,
                 lo: Long, hi: Long): DataFrame = {
    val idx = validatedSkipIndex(spark, dir, colsIfAbsent = Seq(colName))
    val keep = idx.filter(
      col(s"min_$colName").isNull ||
        (col(s"max_$colName") >= lo && col(s"min_$colName") <= hi))
      .select("file").collect().map(_.getString(0))
    val exact = col(colName) >= lo && col(colName) <= hi
    if (keep.isEmpty)
      spark.read.parquet(dir).where(exact).where(lit(false))
    else
      // basePath keeps the zcell partition column in the schema: the
      // leaf-file read must return the same shape as the keep-empty
      // directory read above
      spark.read.option("basePath", dir)
        .parquet(keep.toIndexedSeq: _*).where(exact)
  }

  /** Equality-predicate pruning for a STRING column — the case min/max
    * ranges cannot serve (a clustered layout scatters an unrelated string
    * column across every file's full value range). Two exact-or-safe
    * metadata tests per row group, the Trino/Presto discipline:
    *
    *  1. fully dictionary-encoded chunk → decode the dictionary page and
    *     test membership EXACTLY (parquet-mr deliberately omits blooms for
    *     these — the dictionary already is the better filter);
    *  2. otherwise a bloom filter if the writer landed one
    *     (`bloomCols` on [[clusterByZOrder]]) → might-contain;
    *  3. neither → admit (never a false negative).
    *
    * Only footer + dictionary/bloom pages are read for the decision —
    * no data pages; the tests fan out over executors. */
  def readPrunedEq(spark: SparkSession, dir: String, colName: String,
                   value: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val files = listDataFiles(hconf, dir)
    val confKv = hconf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    val slices = math.max(1, math.min(files.length,
      spark.sparkContext.defaultParallelism))
    val keep = spark.sparkContext.parallelize(files, slices).filter { f =>
      val c = new Configuration(false)
      confKv.foreach { case (k, v) => c.set(k, v) }
      fileMightContain(c, f, colName, value)
    }.collect()
    val exact = col(colName) === value
    if (keep.isEmpty)
      spark.read.parquet(dir).where(exact).where(lit(false))
    else
      // same-schema contract as readPruned: retain the partition column
      spark.read.option("basePath", dir)
        .parquet(keep.toIndexedSeq: _*).where(exact)
  }

  /** Might `file` contain `value` in `colName`? Per row group: dictionary
    * membership when fully dict-encoded, bloom when present, admit
    * otherwise. */
  private def fileMightContain(conf: Configuration, file: String,
                               colName: String, value: String): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val fmd = reader.getFooter.getFileMetaData
      reader.getFooter.getBlocks.asScala.exists { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == colName) match {
          case None => true // column absent from this file: cannot exclude
          case Some(cc) =>
            if (cc.getPrimitiveType.getPrimitiveTypeName != PrimitiveTypeName.BINARY)
              true // non-string column: this path only serves strings
            else {
              val es = cc.getEncodingStats
              val fullyDict = es != null && !es.hasNonDictionaryEncodedPages
              if (fullyDict) {
                val cd = fmd.getSchema.getColumnDescription(cc.getPath.toArray)
                val store: org.apache.parquet.column.page.DictionaryPageReadStore =
                  reader.getDictionaryReader(b)
                val page = store.readDictionaryPage(cd)
                if (page == null) true
                else {
                  val dict = page.getEncoding.initDictionary(cd, page)
                  (0 to dict.getMaxId).exists(i =>
                    dict.decodeToBinary(i).toStringUsingUTF8 == value)
                }
              } else {
                val bf = reader.readBloomFilter(cc)
                if (bf == null) true
                else bf.findHash(bf.hash(Binary.fromString(value)))
              }
            }
        }
      }
    } finally reader.close()
  }

  /** Range COUNT answered from metadata with an exact residual: files whose
    * `[min, max]` lies fully inside `[lo, hi]` contribute their footer row
    * counts WITHOUT being opened; only boundary-straddling files are
    * scanned (with the exact predicate); disjoint files contribute nothing.
    * Returns one row:
    * `(exact_count, files_total, files_meta_only, files_scanned,
    * rows_scanned)` — the last two are the scan bill a naive count pays in
    * full. At 100 TB an interior range over a clustered key is almost all
    * metadata: the scan touches only the two boundary slabs. Files with
    * null stats count as straddling (scanned — the safe direction). */
  def statsCount(spark: SparkSession, dir: String, colName: String,
                 lo: Long, hi: Long): DataFrame = {
    val idx = validatedSkipIndex(spark, dir,
      colsIfAbsent = Seq(colName)).select(
      col("file"), col("n_rows"),
      col(s"min_$colName").as("mn"), col(s"max_$colName").as("mx"))
      .collect()
    val contained = idx.filter(r => !r.isNullAt(2) &&
      r.getLong(2) >= lo && r.getLong(3) <= hi)
    val straddling = idx.filter(r => (r.isNullAt(2) ||
      (r.getLong(3) >= lo && r.getLong(2) <= hi)) &&
      !(!r.isNullAt(2) && r.getLong(2) >= lo && r.getLong(3) <= hi))
    val metaCount = contained.map(_.getLong(1)).sum
    val rowsScanned = straddling.map(_.getLong(1)).sum
    val scanCount =
      if (straddling.isEmpty) 0L
      else spark.read.parquet(straddling.map(_.getString(0)).toIndexedSeq: _*)
        .where(col(colName) >= lo && col(colName) <= hi).count()
    import spark.implicits._
    Seq((metaCount + scanCount, idx.length.toLong, contained.length.toLong,
      straddling.length.toLong, rowsScanned))
      .toDF("exact_count", "files_total", "files_meta_only", "files_scanned",
        "rows_scanned")
  }

  // -------------------------------------------------------------------
  // Incremental optimize
  // -------------------------------------------------------------------

  /** Fold `batch` into the z-clustered layout at `baseDir`, rewriting ONLY
    * the z-cells the batch touches. Returns the per-cell plan that was
    * executed: `(zcell, rows_base, rows_added, rewritten)` for every cell
    * present in either side, ordered by cell.
    *
    * Planning reads NO base data: `rows_base` per cell comes from the skip
    * index's footer row counts (cell recovered from the partition path).
    * The rewrite reads base rows only for touched cells (partition-pruned
    * scan — `zcell` is the directory key), unions the bucketized batch,
    * re-sorts, and lands via dynamic partition overwrite. A job that dies
    * BEFORE commit leaves the base untouched (retry-safe for free); to make
    * replaying an ALREADY-committed batch idempotent too, pass the table's
    * primary key in `key` — the merge then dedups on it, so the second
    * replay rewrites the same cells to the same content instead of doubling
    * the batch rows (the moral twin of the streaming sinks' batch_id
    * discipline). Untouched cells' files are never opened. */
  def optimizeIncremental(spark: SparkSession, baseDir: String,
                          batch: DataFrame, dimA: String, dimB: String,
                          key: Seq[String] = Nil): DataFrame = {
    // One read of each sidecar: the meta row (bounds + geometry + bloom
    // cols) and the skip index (report counts + indexed-column names).
    val metaRow = spark.read.parquet(s"$baseDir/$ZMETA").head()
    val bounds = ZBounds(metaRow.getAs[Long]("a_min"), metaRow.getAs[Long]("a_max"),
      metaRow.getAs[Long]("b_min"), metaRow.getAs[Long]("b_max"))
    val (bits, cellBits) =
      (metaRow.getAs[Int]("bits"), metaRow.getAs[Int]("cell_bits"))
    val bloomCols = Option(metaRow.getAs[String]("bloom_cols"))
      .filter(_.nonEmpty).map(_.split(',').toSeq).getOrElse(Nil)
    // validated: a prior optimize that died between its data commit and
    // its index rewrite heals HERE, before this run plans against it —
    // and this maintenance entry point is the ONE place the healed index
    // persists back to disk (read paths heal in-memory only)
    val idx = validatedSkipIndex(spark, baseDir, persistHealed = true)
    val statsCols = idx.columns.toSeq
      .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))

    // Pin the bucketized batch ONCE: it is micro-batch-sized by contract
    // and feeds three consumers (the report, the touched-cell set, the
    // rewrite union) — without the pin, an expensive batch lineage would
    // recompute per consumer.
    val batchCells = withZ(batch, dimA, dimB, bounds, bits, cellBits)
      .localCheckpoint()
    val touched = batchCells.groupBy(ZCELL)
      .agg(count(lit(1)).as("rows_added"))
    // rows_base per cell from footer metadata alone: the partition path
    // carries the cell id (`.../zcell=N/part-...`).
    val baseCells = idx
      .withColumn(ZCELL,
        regexp_extract(col("file"), "zcell=(\\d+)", 1).cast("long"))
      .groupBy(ZCELL).agg(sum(col("n_rows")).as("rows_base"))
    val report = baseCells.join(touched, Seq(ZCELL), "full_outer")
      .select(
        col(ZCELL),
        coalesce(col("rows_base"), lit(0L)).as("rows_base"),
        coalesce(col("rows_added"), lit(0L)).as("rows_added"))
      .withColumn("rewritten", col("rows_added") > 0)
      .orderBy(ZCELL)
      // The report is ≤ 2^cellBits rows; pin it before the rewrite mutates
      // the directory it was planned from.
      .localCheckpoint()

    val dataCols = batch.columns.toSeq
    val base = spark.read.parquet(baseDir)
      .withColumn(ZCELL, col(ZCELL).cast("long"))
    val touchedBase = base
      .join(broadcast(touched.select(ZCELL)), Seq(ZCELL), "left_semi")
      .select((dataCols.map(col) :+ col(ZCELL)): _*)
    val unioned = touchedBase
      .unionByName(batchCells.select((dataCols.map(col) :+ col(ZCELL)): _*))
    val merged = if (key.nonEmpty) unioned.dropDuplicates(key) else unioned
    withZ(merged.drop(ZCELL), dimA, dimB, bounds, bits, cellBits)
      .repartition(col(ZCELL))
      .sortWithinPartitions(ZCELL, ZVAL)
      .drop(ZVAL)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .options(bloomCols.map(c =>
        s"parquet.bloom.filter.enabled#$c" -> "true").toMap)
      .partitionBy(ZCELL).parquet(baseDir)
    // Incremental index refresh: untouched cells' rows survive verbatim
    // (pinned before the overwrite below); only the touched cells' files
    // get fresh footer reads — O(touched), not O(table files).
    val touchedIds = touched.select(ZCELL).collect().map(_.getLong(0))
    val keepIdx = idx.filter(!regexp_extract(col("file"), "zcell=(\\d+)", 1)
        .cast("long").isin(touchedIds.toIndexedSeq: _*))
      .localCheckpoint()
    val hconf = spark.sparkContext.hadoopConfiguration
    val freshFiles = touchedIds.flatMap(cid =>
      listDataFiles(hconf, s"$baseDir/$ZCELL=$cid"))
    keepIdx.unionByName(buildSkipIndexFiles(spark, freshFiles, statsCols))
      .coalesce(1).write.mode("overwrite").parquet(s"$baseDir/$SKIPINDEX")
    report
  }

  // -------------------------------------------------------------------
  // Streaming ingest
  // -------------------------------------------------------------------

  /** Micro-batch sink body (`foreachBatch` target) keeping a table
    * continuously z-clustered — the streaming member of the layout family:
    * [[clusterByZOrder]] is the batch form, [[optimizeIncremental]] the
    * incremental one, this folds each arriving micro-batch into the layout.
    *
    * The first non-empty batch clusters from scratch and FREEZES the
    * bucketization bounds (later batches clamp — the incremental contract);
    * every later batch routes through [[optimizeIncremental]]. `key` is
    * required: it is what makes a replayed micro-batch (foreachBatch's
    * at-least-once delivery) converge to the same layout instead of
    * doubling rows. Crash safety: `_zmeta` is written last by the initial
    * cluster, so a replay of a half-landed first batch re-clusters
    * (overwrite) rather than optimizing against an uncommitted layout. */
  def clusterBatch(batch: DataFrame, baseDir: String, dimA: String,
                   dimB: String, key: Seq[String], bits: Int = 16,
                   cellBits: Int = 6, bloomCols: Seq[String] = Nil): Unit = {
    require(key.nonEmpty,
      "a primary key is required for replay-idempotent streaming ingest")
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaPath = new Path(s"$baseDir/$ZMETA")
    val committed = metaPath.getFileSystem(hconf).exists(metaPath)
    if (!committed) {
      clusterByZOrder(batch.dropDuplicates(key), dimA, dimB, baseDir,
        bits, cellBits, bloomCols = bloomCols)
      ()
    } else {
      optimizeIncremental(spark, baseDir, batch, dimA, dimB, key)
      ()
    }
  }
}
