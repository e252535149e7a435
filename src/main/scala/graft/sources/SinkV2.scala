package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK (`format("graft-sink")`) with a real two-phase commit
  * protocol — the write-side twin of the `graft-synthetic` reader and the
  * engine form of the reference's declared-target loads (ORM tables created
  * ahead of load, `dags/create_target_pg_hl_table.py:134-136`; bulk insert
  * `dags/hanger_lane.py:483-504`).
  *
  * Protocol (the miniature of every table-format commit design):
  *  - tasks write JSON-lines files into `_staging/<queryId>/`, one file per
  *    task ATTEMPT (attempt id in the name → speculative/retried attempts
  *    never collide);
  *  - `DataWriter.commit()` seals a file and reports it to the driver;
  *  - `BatchWrite.commit()` — and ONLY it — moves reported files into
  *    `data/` and atomically swaps `_MANIFEST.txt` (append merges with the
  *    previous manifest; truncate replaces it);
  *  - `BatchWrite.abort()` deletes the staging area; uncommitted files are
  *    invisible because readers resolve the MANIFEST, never the directory.
  * A crash between task-commit and job-commit therefore leaves garbage
  * bytes, not wrong rows — exactly the property FileOutputCommitter /
  * manifest-based table formats provide.
  *
  * The target is declared first ([[GraftSink.create]] writes `_SCHEMA.ddl`),
  * so appends validate by-name against the declared schema, like the
  * reference's pre-created ORM targets. Local-filesystem paths (java.nio);
  * a cluster deployment swaps in the Hadoop FileSystem API — the protocol
  * does not change.
  *
  * Concurrency model: SINGLE WRITER per target (like every manifest-swap
  * table format without a lock service) — concurrent jobs committing to one
  * target can lose one job's manifest entries to the other's swap. Readers
  * are always safe: they see the pre- or post-swap manifest, never a
  * partial state.
  *
  * Supported field types: long/int/double/boolean/string.
  */
class GraftSinkProvider extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-sink"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSink.readSchema(GraftSink.root(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftSinkTable(
      GraftSink.root(new CaseInsensitiveStringMap(properties)), schema)
}

object GraftSink {
  def root(options: CaseInsensitiveStringMap): Path = {
    val p = options.get("path")
    require(p != null, "graft-sink requires .option(\"path\", dir)")
    Paths.get(p)
  }

  /** `Files.list` with a guaranteed close — the raw stream holds an open
    * directory descriptor until GC; one leak per epoch commit starves the
    * driver of FDs on a long-running streaming query. */
  private[v2] def listAnd[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  /** Declare the target (the CREATE TABLE step): records the schema the
    * sink validates every append against. */
  def create(path: String, schema: StructType): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    Files.write(dir.resolve("_SCHEMA.ddl"),
      schema.toDDL.getBytes(StandardCharsets.UTF_8))
  }

  def readSchema(dir: Path): StructType = {
    val f = dir.resolve("_SCHEMA.ddl")
    require(Files.exists(f),
      s"graft-sink target $dir not declared — call GraftSink.create(path, schema) first")
    StructType.fromDDL(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
  }

  private def manifestLines(path: String): Seq[String] = {
    val f = Paths.get(path).resolve("_MANIFEST.txt")
    if (!Files.exists(f)) Seq.empty
    else new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).toSeq
  }

  /** Committed files per the manifest (name -> rows); empty before any commit. */
  def manifest(path: String): Seq[(String, Long)] =
    manifestLines(path).filterNot(_.startsWith("#")).map { l =>
      val Array(name, rows) = l.split("\t"); (name, rows.toLong)
    }

  /** Epochs already committed by streaming queries — `#epoch` marker lines.
    * The streaming commit consults this set to make epoch re-commits (post-
    * recovery replays) no-ops: the manifest is the exactly-once ledger. */
  def committedEpochs(path: String): Set[(String, Long)] =
    manifestLines(path).collect {
      case l if l.startsWith("#epoch\t") =>
        val Array(_, qid, eid) = l.split("\t"); (qid, eid.toLong)
    }.toSet

  /** Atomic manifest swap: append `entries` (and an optional marker line)
    * to the current manifest — or replace the FILE entries when `truncate`.
    * Truncation preserves `#epoch` marker lines: they are the streaming
    * exactly-once ledger, and dropping them on a Complete-mode epoch swap
    * would let a post-recovery replay of an older epoch re-publish. */
  private[v2] def swapManifest(dir: Path, entries: Seq[(String, Long)],
                               marker: Option[String], truncate: Boolean): Unit = {
    val previous =
      if (truncate) manifestLines(dir.toString).filter(_.startsWith("#epoch\t"))
      else manifestLines(dir.toString)
    val content =
      (previous ++ entries.map { case (n, r) => s"$n\t$r" } ++ marker)
        .mkString("\n")
    val tmp = dir.resolve("_MANIFEST.txt.tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("_MANIFEST.txt"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read ONLY manifest-listed files — orphaned staging/partial files are
    * invisible by construction. */
  def readCommitted(spark: SparkSession, path: String): DataFrame = {
    val schema = readSchema(Paths.get(path))
    val files = manifest(path).map(f => Paths.get(path, "data", f._1).toString)
    if (files.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(files: _*)
  }
}

class GraftSinkTable(dir: Path, declared: StructType)
  extends Table with SupportsWrite {
  override def name(): String = s"graft_sink($dir)"
  override def schema(): StructType = declared
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(dir, info.schema(), info.queryId(),
      clusterBy = Option(info.options.get("clusterby"))
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty),
      sortBy = Option(info.options.get("sortby"))
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty),
      truncate = false)
}

/** Write-side distribution and ordering: `.option("clusterBy", "col")`
  * makes the Write REQUIRE a clustered distribution — Spark plans the
  * exchange, so every cluster key's rows land in exactly one task (one
  * file); `.option("sortBy", "col")` additionally requests a within-
  * partition sort. Clustered + sorted shards are the layout a training-data
  * reader wants: one sequential scan per shard, no cross-file merges. */
class GraftWriteBuilder(dir: Path, schema: StructType, queryId: String,
                        clusterBy: Seq[String], sortBy: Seq[String],
                        truncate: Boolean)
  extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftWriteBuilder(dir, schema, queryId, clusterBy, sortBy, truncate = true)
  override def build(): Write = new Write with RequiresDistributionAndOrdering {
    override def requiredDistribution(): Distribution =
      if (clusterBy.isEmpty) Distributions.unspecified()
      else Distributions.clustered(
        clusterBy.map(c => Expressions.identity(c): org.apache.spark.sql.connector.expressions.Expression).toArray)
    override def requiredOrdering(): Array[SortOrder] =
      sortBy.map(c => Expressions.sort(
        Expressions.identity(c), SortDirection.ASCENDING)).toArray
    override def toBatch: BatchWrite =
      new GraftBatchWrite(dir, schema, queryId, truncate)
    override def toStreaming: StreamingWrite =
      new GraftStreamingWrite(dir, schema, queryId, truncate)
  }
}

case class GraftCommitMessage(fileName: String, rows: Long)
  extends WriterCommitMessage

class GraftBatchWrite(dir: Path, schema: StructType, queryId: String,
                      truncate: Boolean) extends BatchWrite {
  private def staging = dir.resolve("_staging").resolve(queryId)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    // queryId in the data file name: task ids restart per APPLICATION, so a
    // second JVM appending to this target would otherwise mint a name the
    // manifest already holds and fail mid-commit on the ATOMIC_MOVE
    new GraftWriterFactory(staging.toString, schema, prefix = s"$queryId-part")
  }

  /** The ONLY place files become visible: move task-committed files into
    * data/ and swap the manifest atomically. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dataDir = dir.resolve("data")
    Files.createDirectories(dataDir)
    val committed = messages.collect {
      case GraftCommitMessage(name, rows) if name != null => (name, rows)
    }
    committed.foreach { case (name, _) =>
      Files.move(staging.resolve(name), dataDir.resolve(name),
        StandardCopyOption.ATOMIC_MOVE)
    }
    // truncate = replace: SWAP FIRST, delete after. Deleting the previous
    // generation before the swap would leave a crash (or a concurrent
    // reader that just resolved the old manifest) pointing at vanished
    // files; swapping first means a crash mid-delete only strands orphans
    // no manifest references — invisible to readers, reclaimable later.
    val previousGen = if (truncate) GraftSink.manifest(dir.toString) else Seq.empty
    GraftSink.swapManifest(dir, committed.toSeq, marker = None, truncate = truncate)
    previousGen.foreach { case (name, _) =>
      Files.deleteIfExists(dataDir.resolve(name))
    }
    cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging()

  private def cleanupStaging(): Unit =
    if (Files.exists(staging)) {
      GraftSink.listAnd(staging)(_.foreach(Files.deleteIfExists(_)))
      Files.deleteIfExists(staging)
      // best-effort: drop _staging/ itself when no other query is active
      val parent = staging.getParent
      if (Files.exists(parent) && GraftSink.listAnd(parent)(_.isEmpty))
        Files.deleteIfExists(parent)
    }
}

class GraftWriterFactory(stagingDir: String, schema: StructType, prefix: String)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(stagingDir, schema, partitionId, taskId, prefix)
}

/** Streaming face of the sink: per-epoch staging + the manifest as an
  * exactly-once ledger. Spark can re-commit an epoch after a driver
  * recovery; `commit` consults the `#epoch` markers and turns replays into
  * no-ops, so each micro-batch's rows publish exactly once. `truncate`
  * (OutputMode.Complete) replaces the published file set each epoch —
  * epoch markers survive the swap, so replay detection still works —
  * where dropping the flag would silently union every epoch's full
  * aggregate snapshot. */
class GraftStreamingWrite(dir: Path, schema: StructType, queryId: String,
                          truncate: Boolean = false)
  extends StreamingWrite {
  private def staging(epochId: Long) =
    dir.resolve("_staging").resolve(queryId).resolve(epochId.toString)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(dir.toString, queryId, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    if (GraftSink.committedEpochs(dir.toString).contains((queryId, epochId))) {
      cleanup(epochId) // replayed commit: publish nothing twice
      return
    }
    val dataDir = dir.resolve("data")
    Files.createDirectories(dataDir)
    val committed = messages.collect {
      case GraftCommitMessage(name, rows) if name != null => (name, rows)
    }
    committed.foreach { case (name, _) =>
      Files.move(staging(epochId).resolve(name), dataDir.resolve(name),
        StandardCopyOption.ATOMIC_MOVE)
    }
    // Complete mode: swap first, delete the superseded generation after
    // (same ordering rationale as the batch path)
    val previousGen = if (truncate) GraftSink.manifest(dir.toString) else Seq.empty
    GraftSink.swapManifest(dir, committed.toSeq,
      marker = Some(s"#epoch\t$queryId\t$epochId"), truncate = truncate)
    previousGen.foreach { case (name, _) =>
      Files.deleteIfExists(dataDir.resolve(name))
    }
    cleanup(epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    cleanup(epochId)

  private def cleanup(epochId: Long): Unit = {
    val s = staging(epochId)
    if (Files.exists(s)) {
      GraftSink.listAnd(s)(_.foreach(Files.deleteIfExists(_)))
      Files.deleteIfExists(s)
    }
  }
}

class GraftStreamingWriterFactory(root: String, queryId: String,
                                  schema: StructType)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val staging = Paths.get(root, "_staging", queryId, epochId.toString)
    Files.createDirectories(staging)
    // epoch AND queryId in the file name: task ids repeat across epochs and
    // restart per application — the pair makes names globally unique
    new GraftDataWriter(staging.toString, schema, partitionId, taskId,
      prefix = f"$queryId%s-epoch$epochId%05d-part")
  }
}

/** JSON-lines task writer. The file carries the task ATTEMPT id — two
  * attempts of one partition write two distinct files, and only the one
  * whose commit message reaches the driver is published. Files are created
  * lazily so empty partitions publish nothing. */
class GraftDataWriter(stagingDir: String, schema: StructType,
                      partitionId: Int, taskId: Long, prefix: String = "part")
  extends DataWriter[InternalRow] {
  private val fileName = f"$prefix-$partitionId%05d-$taskId.jsonl"
  private var out: java.io.BufferedWriter = _
  private var rows = 0L

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      // every remaining control char must escape too: a raw \b or \f is
      // invalid JSON, and Spark's PERMISSIVE reader would null the whole
      // row — silent corruption under the sink's exactly-once contract
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  override def write(row: InternalRow): Unit = {
    if (out == null)
      out = Files.newBufferedWriter(Paths.get(stagingDir, fileName),
        StandardCharsets.UTF_8)
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType => row.getDouble(i).toString
          case BooleanType => row.getBoolean(i).toString
          case StringType => "\"" + esc(row.getUTF8String(i).toString) + "\""
          case dt => throw new UnsupportedOperationException(
            s"graft-sink does not support $dt (field ${f.name})")
        }
      s""""${f.name}":$v"""
    }
    out.write(cells.mkString("{", ",", "}"))
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    GraftCommitMessage(if (rows > 0) fileName else null, rows)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    Files.deleteIfExists(Paths.get(stagingDir, fileName))
  }

  override def close(): Unit = ()
}
