package graft.etl

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Version-pinned snapshot reads (time travel) over immutable data files —
  * the history [[SnapshotIO]]'s atomic swap deliberately discards, and the
  * snapshot-grain twin of the reference's audit discipline (every load
  * recorded in `etl_extract_log`, `dags/hanger_lane.py:510-537`): a
  * `datasetFingerprint` (q151) names a corpus state; this makes that state
  * RECOVERABLE.
  *
  * Layout (the Delta/Iceberg manifest idea reduced to its core):
  *
  * {{{
  *   dir/_versions/v{N}.manifest   // schema line + relative data-file list
  *   dir/data/c{token}/part-*.parquet   // immutable; never rewritten
  * }}}
  *
  * The manifest RENAME is the commit point: data files land first under a
  * fresh `c{token}` subdir (invisible — no manifest references them), then
  * the manifest appears atomically, so a reader sees every version fully or
  * not at all, and a crash before the rename leaves only unreferenced files
  * for the next vacuum. Single-writer contract (the reference's Airflow
  * DAGs serialize loads the same way); readers never write.
  *
  * Scale: a new version costs exactly its NEW bytes — [[commitAppend]]
  * reuses every prior file by reference (the append-only ingest case: a
  * 100 TB corpus grows by manifests + deltas, never rewrites);
  * [[commit]] pins a full-replacement version. [[vacuum]] deletes data
  * files referenced ONLY by versions below the caller's retention barrier
  * (files shared with surviving versions stay — reference counting over
  * manifest lists, a driver-side set union over file NAMES, never data).
  */
object VersionedSnapshot {

  private val VersionsDir = "_versions"
  private val ManifestRe = """v(\d+)\.manifest""".r

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The latest committed version, 0 when none. */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val vd = new Path(dir, VersionsDir)
    if (!f.exists(vd)) 0L
    else f.listStatus(vd).toSeq.map(_.getPath.getName).collect {
      case ManifestRe(n) => n.toLong
    }.foldLeft(0L)(math.max)
  }

  private def manifestPath(dir: String, v: Long) =
    new Path(s"$dir/$VersionsDir/v$v.manifest")

  /** Filesystem contract for the commit point: the rename below must be
    * ATOMIC and FAIL when the destination exists (HDFS / local-FS
    * semantics). On an object store whose rename is copy+delete and can
    * clobber (S3A), the 'concurrent writer?' detection degrades to
    * last-writer-wins — deploy there behind the documented single-writer
    * contract, or add a create-with-overwrite=false marker beside the
    * manifest as the commit gate. */
  private def writeManifest(spark: SparkSession, dir: String, v: Long,
                            schema: StructType, files: Seq[String],
                            batchId: Option[Long] = None): Unit = {
    val f = fs(spark, dir)
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"$dir/$VersionsDir/.tmp-v$v-$token")
    val header = s"#schema:${schema.json}\n" +
      batchId.map(b => s"#batch:$b\n").getOrElse("")
    val out = f.create(tmp, false)
    try out.write((header + files.mkString("\n"))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, manifestPath(dir, v))) {
      f.delete(tmp, true)
      throw new java.io.IOException(
        s"version $v already committed at $dir (concurrent writer?)")
    }
  }

  private def readManifest(spark: SparkSession, dir: String,
                           v: Long): (StructType, Seq[String]) = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, v)
    require(f.exists(p), s"no version $v at $dir (vacuumed or never committed)")
    val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
    val in = f.open(p)
    val text =
      try { in.readFully(0, buf); new String(buf, StandardCharsets.UTF_8) }
      finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val schema = DataType.fromJson(
      lines.find(_.startsWith("#schema:")).get.stripPrefix("#schema:"))
      .asInstanceOf[StructType]
    (schema, lines.filterNot(_.startsWith("#")))
  }

  /** The `#batch:` stamp of version `v`, if it was committed by
    * [[commitBatch]]. */
  private def batchStampOf(spark: SparkSession, dir: String,
                           v: Long): Option[Long] = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, v)
    if (!f.exists(p)) return None
    val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
    val in = f.open(p)
    val text =
      try { in.readFully(0, buf); new String(buf, StandardCharsets.UTF_8) }
      finally in.close()
    text.split("\n").find(_.startsWith("#batch:"))
      .map(_.stripPrefix("#batch:").trim.toLong)
  }

  /** Land `df`'s files under a fresh immutable commit dir; returns their
    * dir-relative paths. */
  private def landFiles(spark: SparkSession, df: DataFrame,
                        dir: String): Seq[String] = {
    val token = java.util.UUID.randomUUID().toString.take(8)
    val rel = s"data/c$token"
    df.write.parquet(s"$dir/$rel")
    val f = fs(spark, dir)
    f.listStatus(new Path(s"$dir/$rel")).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => s"$rel/${s.getPath.getName}")
  }

  /** Commit `df` as the next version's FULL content (replacement
    * semantics — e.g. an upserted snapshot). Prior versions stay readable
    * until vacuumed. Returns the new version number. */
  def commit(spark: SparkSession, df: DataFrame, dir: String): Long = {
    val v = currentVersion(spark, dir) + 1
    writeManifest(spark, dir, v, df.schema, landFiles(spark, df, dir))
    v
  }

  /** Commit `df` as an APPEND to the latest version: the new manifest
    * reuses every prior file by reference and adds only the batch's own —
    * the append-only ingest path where a version costs its new bytes. */
  def commitAppend(spark: SparkSession, df: DataFrame, dir: String): Long = {
    val cur = currentVersion(spark, dir)
    val prior = if (cur == 0) Nil else priorFilesChecked(spark, df, dir, cur)
    writeManifest(spark, dir, cur + 1, df.schema,
      prior ++ landFiles(spark, df, dir))
    cur + 1
  }

  /** The latest manifest's file list, with the append-schema guard: the
    * new manifest stamps the BATCH's schema over every reused prior file,
    * so a drifted batch (renamed/added column) would silently null-fill
    * historical rows on read — refuse loudly instead; evolve schemas
    * through a full [[commit]], which reuses no files. */
  private def priorFilesChecked(spark: SparkSession, df: DataFrame,
                                dir: String, cur: Long): Seq[String] = {
    val (priorSchema, files) = readManifest(spark, dir, cur)
    def shape(s: StructType) = s.fields.toSeq.map(f => (f.name, f.dataType))
    require(shape(df.schema) == shape(priorSchema),
      s"commitAppend schema drift at $dir: batch ${df.schema.simpleString} " +
        s"vs version $cur ${priorSchema.simpleString} — appended versions " +
        "reuse prior files under the batch's schema; use commit() to evolve")
    files
  }

  /** `foreachBatch` sink: append each micro-batch as ONE new version,
    * idempotently — the streaming member of the family. Every
    * [[commitBatch]]-made manifest carries a `#batch:` stamp; an
    * at-least-once REPLAY of batch K finds a manifest already stamped K
    * and becomes a no-op (its data files were landed under the prior
    * attempt's commit; a replay whose first attempt died BEFORE the
    * manifest rename re-lands files and commits — the orphans from the
    * dead attempt stay unreferenced until vacuum sweeps them, the
    * documented crash contract). The stamp check scans manifests
    * NEWEST-FIRST: Structured Streaming only ever replays the most recent
    * uncommitted epoch, so the replay case resolves in O(1) manifest
    * reads; the fresh-commit case pays one pass over tiny manifest files
    * (O(versions) driver-side reads, bounded by retention/vacuum).
    * Returns the version holding batch K. */
  def commitBatch(spark: SparkSession, df: DataFrame, dir: String,
                  batchId: Long): Long = {
    val cur = currentVersion(spark, dir)
    val already = (cur to 1L by -1L)
      .find(v => batchStampOf(spark, dir, v).contains(batchId))
    already.getOrElse {
      val prior = if (cur == 0) Nil else priorFilesChecked(spark, df, dir, cur)
      writeManifest(spark, dir, cur + 1, df.schema,
        prior ++ landFiles(spark, df, dir), batchId = Some(batchId))
      cur + 1
    }
  }

  /** The snapshot AS OF `version` — the manifest's exact file set under
    * its pinned schema (schema evolution in later versions cannot leak
    * backwards). An empty version reads as an empty frame of its schema. */
  def readAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val (schema, files) = readManifest(spark, dir, version)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files.map(f => s"$dir/$f"): _*)
  }

  /** The latest version. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAt(spark, dir, currentVersion(spark, dir))

  /** Drop history strictly below `keepFrom` (the caller-owned retention /
    * replay barrier, the compactMediaIndex discipline): manifests below it
    * delete, and a data file deletes only when NO surviving manifest
    * references it — shared files (the commitAppend case) stay readable
    * from every surviving version. Unreferenced leftovers from crashed
    * commits are swept too. Returns the number of data files deleted. */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Long): Long = {
    val cur = currentVersion(spark, dir)
    require(keepFrom >= 1 && keepFrom <= cur,
      s"vacuum barrier $keepFrom outside committed range [1, $cur]")
    val f = fs(spark, dir)
    val survivors = (keepFrom to cur)
      .filter(v => f.exists(manifestPath(dir, v)))
    val referenced = survivors
      .flatMap(v => readManifest(spark, dir, v)._2).toSet
    var deleted = 0L
    val dataRoot = new Path(s"$dir/data")
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).toSeq.filter(_.isDirectory).foreach { cdir =>
        val cname = cdir.getPath.getName
        f.listStatus(cdir.getPath).toSeq.foreach { st =>
          val rel = s"data/$cname/${st.getPath.getName}"
          val isData = st.getPath.getName.endsWith(".parquet")
          // manifests reference exactly depth-1 files, so any DIRECTORY
          // here (a dead write's _temporary tree) is unreferenced by
          // construction — sweep it recursively, or crashed commits
          // accumulate forever
          if (!referenced.contains(rel)) {
            if (f.delete(st.getPath, st.isDirectory) && isData) deleted += 1
          }
        }
        if (f.listStatus(cdir.getPath).isEmpty) f.delete(cdir.getPath, true)
      }
    }
    (1L until keepFrom).foreach(v => f.delete(manifestPath(dir, v), false))
    deleted
  }
}
