package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for [[graft.sources.WebDataset]] shard layouts
  * (`format("graft-webdataset").load(dir)`): shard tars BIN-PACKED into
  * InputPartitions by file size up to the session's
  * `files.maxPartitionBytes` (budget-sized shards get a task each; a
  * fragmented micro-batch landing of thousands of tiny tars packs into a
  * core-count's worth of tasks instead of paying per-tar task launch —
  * the read side of the small-files problem [[graft.sources.WebDataset
  * .compactShards]] solves on disk), schema
  * `(shard, key, ext, size, content)`, with REQUIRED-COLUMN pruning
  * pushed through the tar walk itself and `shard` / `ext` FILTER
  * pushdown pruning whole tar files at planning time.
  *
  * Why a DSv2 source when [[graft.sources.WebDataset.read]] already
  * round-trips: the helper is a binaryFile scan — it materializes every
  * shard's FULL byte payload into a row before the flatMap can parse it,
  * so a manifest-style query (`groupBy(shard).agg(count, sum(size))`) or
  * a key listing pays the entire corpus's media bytes. The ustar header
  * carries each member's size, so a reader that knows `content` was
  * pruned can stream headers and `seek` PAST every payload — the scan
  * cost becomes 512 bytes per member instead of the member. At 100 TB of
  * media that is the difference between a metadata query and a full-read.
  * (The payload-byte counter below makes this assertable in the spec —
  * single-JVM/local only, a test hook, not a metric.)
  *
  * Filter pushdown (the planning half of the same economics):
  *   - predicates on `shard` (=, IN, <, <=, >, >=) resolve against the
  *     shard NUMBER in the file name, so matching is decided before any
  *     file opens — a `shard = 7` scan over a 10⁶-shard corpus opens ONE
  *     tar ([[WebDatasetV2.tarFilesOpened]] pins this in the spec);
  *   - predicates on `ext` (=, IN) can't prune files (a shard interleaves
  *     every ext) but skip non-matching MEMBERS inside the walk: the
  *     reader seeks past the payload without materializing it, so an
  *     `ext = 'txt'` scan over an image-heavy corpus reads text bytes
  *     only.
  *   Accepted filters are claimed as fully handled (shard comes from the
  *   file name and ext from the member name — both exact), so Spark does
  *   not re-evaluate them; everything else returns as residual.
  *
  * Planning lists `shard-*.tar` once on the driver; each reader re-opens
  * its one shard via the Hadoop FileSystem API with the SESSION's
  * hadoopConfiguration entries shipped ONCE through the reader factory
  * (the [[graft.sources.WebDataset.writeShards]] rule — a bare
  * `new Configuration()` in the task would drop fs.defaultFS/credentials;
  * shipping it per-InputPartition would serialize the whole conf into
  * every task at thousands-of-shards scale).
  *
  * Key/ext split contract: member names split at the LAST dot, matching
  * [[graft.sources.WebDataset.read]]; `writeShards` rejects exts that
  * contain a dot, so the round trip is exact and keys may contain dots.
  */
class WebDatasetTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-webdataset"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebDatasetV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-webdataset: a shard directory is required — .load(dir)"))
    new WebDatasetTable(path)
  }
}

object WebDatasetV2 {
  val Schema: StructType = new StructType()
    .add("shard", LongType, nullable = false)
    .add("key", StringType, nullable = false)
    .add("ext", StringType, nullable = false)
    .add("size", LongType, nullable = false)
    .add("content", BinaryType, nullable = false)

  /** TEST HOOK (meaningful in local/single-JVM mode only): payload bytes
    * actually materialized by readers. The pruning spec asserts a
    * metadata-only scan leaves this at zero. */
  val payloadBytesRead = new java.util.concurrent.atomic.LongAdder

  /** TEST HOOK (local/single-JVM only): shard tar files actually OPENED
    * by readers. The filter-pushdown spec asserts a `shard = N` scan
    * opens exactly the matching tars. */
  val tarFilesOpened = new java.util.concurrent.atomic.LongAdder

  /** Evaluate the pushed `shard` predicates against one shard number —
    * driver-side, at planning, before any file opens. */
  private[v2] def shardMatches(filters: Seq[Filter], shard: Long): Boolean =
    filters.forall {
      case EqualTo("shard", v: Number) => shard == v.longValue
      case In("shard", vs) => vs.exists {
        case v: Number => shard == v.longValue
        case _ => false
      }
      case GreaterThan("shard", v: Number) => shard > v.longValue
      case GreaterThanOrEqual("shard", v: Number) => shard >= v.longValue
      case LessThan("shard", v: Number) => shard < v.longValue
      case LessThanOrEqual("shard", v: Number) => shard <= v.longValue
      case _ => true // not a shard predicate — no constraint here
    }

  /** The accepted ext whitelist from the pushed filters, if any: members
    * whose ext is absent are seeked past inside the walk. */
  private[v2] def extWhitelist(filters: Seq[Filter]): Option[Set[String]] = {
    val sets = filters.collect {
      case EqualTo("ext", v: String) => Set(v)
      case In("ext", vs) => vs.collect { case s: String => s }.toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  private[v2] def isSupported(f: Filter): Boolean = f match {
    case EqualTo("shard", _: Number) => true
    case In("shard", vs) => vs.forall(_.isInstanceOf[Number])
    case GreaterThan("shard", _: Number) => true
    case GreaterThanOrEqual("shard", _: Number) => true
    case LessThan("shard", _: Number) => true
    case LessThanOrEqual("shard", _: Number) => true
    case EqualTo("ext", _: String) => true
    case In("ext", vs) => vs.forall(_.isInstanceOf[String])
    case _ => false
  }
}

class WebDatasetTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_webdataset($path)"
  override def schema(): StructType = WebDatasetV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WebDatasetScanBuilder(path)
}

class WebDatasetScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  private var required: StructType = WebDatasetV2.Schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(WebDatasetV2.isSupported)
    pushed = ok
    residual // shard/ext matches are exact — Spark need not re-check ours
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new WebDatasetScan(path, required, pushed)
}

class WebDatasetScan(path: String, required: StructType,
                     filters: Array[Filter])
  extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaced in the physical plan: pruning is assertable from explain()
  override def description(): String =
    s"graft-webdataset[$path, cols=${required.fieldNames.mkString(",")}" +
      (if (filters.isEmpty) "]"
       else s", pushed=${filters.mkString(";")}]")

  /** Matched shard files AFTER shard-predicate pruning: computed once on
    * the driver, shared by partition planning and statistics. */
  private lazy val matched: Array[(String, Long, Long)] = {
    val spark = SparkSession.active
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    val shards = fs.globStatus(
      new org.apache.hadoop.fs.Path(path, "shard-*.tar"))
    if (shards == null) Array.empty
    else shards.flatMap { s =>
      val n = s.getPath.getName.stripPrefix("shard-").stripSuffix(".tar").toLong
      // shard predicates resolve against the FILE NAME: pruned tars are
      // never opened, never even become partitions
      if (WebDatasetV2.shardMatches(filters.toSeq, n))
        Some((s.getPath.toString, n, s.getLen))
      else None
    }.sortBy(_._2)
  }

  /** POST-PRUNING size estimate, so join planning sees what the scan will
    * actually produce: a `shard = N` slice of a million-shard corpus
    * reports one tar's bytes and becomes broadcast-eligible — without
    * this, Catalyst sizes a DSv2 relation at defaultSizeInBytes
    * (effectively infinite) and shuffles the big side of every container
    * join. When `content` is pruned away the rows are ~64-byte metadata
    * tuples, not payloads — estimate an upper-bound member count
    * (every member costs ≥ 512 header bytes, so members ≤ bytes/512)
    * times the metadata row width; still conservative (an overestimate
    * can only suppress a broadcast, never plan an oversized one). */
  override def estimateStatistics(): Statistics = {
    val tarBytes = matched.map(_._3).sum
    val est =
      if (required.fieldNames.contains("content")) tarBytes
      else (tarBytes / 512L) * 64L
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(est)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    // BIN-PACK small shards into partitions: one-task-per-tar is right for
    // budget-sized shards but quadratic-overhead-wrong for fragmented
    // layouts (a micro-batch landing at a small budget lays out thousands
    // of tiny tars — 1000 task launches to read 16 MB). Spark's own file
    // split sizing: each file costs its length PLUS files.openCostInBytes
    // (so tiny tars don't collapse into one task), the split target is
    // min(files.maxPartitionBytes, max(openCost, total / minPartitionNum))
    // — WITHOUT the minPartitionNum floor a whole small corpus packs into
    // ONE task and everything downstream of the scan (the q167 decode
    // pass) runs serial (measured: q167 7.2 → 8.0 s on exactly that).
    // Shards stay sorted within and across partitions, so per-partition
    // member order is the deterministic (shard, member) order either way.
    val conf = spark.sessionState.conf
    val openCost = math.max(0L, conf.filesOpenCostInBytes)
    val minParts = conf.filesMinPartitionNum
      .getOrElse(spark.sparkContext.defaultParallelism).max(1)
    val totalCost = matched.map(f => f._3 + openCost).sum
    val maxBytes = math.max(1L, math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, totalCost / minParts)))
    val parts = Array.newBuilder[InputPartition]
    var cur = Array.newBuilder[(String, Long)]
    var curBytes = 0L
    var curN = 0
    matched.foreach { case (file, n, len) =>
      val cost = len + openCost
      if (curN > 0 && curBytes + cost > maxBytes) {
        parts += WebDatasetInputPartition(cur.result())
        cur = Array.newBuilder[(String, Long)]; curBytes = 0L; curN = 0
      }
      cur += ((file, n)); curBytes += cost; curN += 1
    }
    if (curN > 0) parts += WebDatasetInputPartition(cur.result())
    parts.result()
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val hconf = spark.sparkContext.hadoopConfiguration
    // session conf shipped ONCE via the factory (serialized one time and
    // broadcast with the task binary), not per-InputPartition — at 10⁶
    // shards a per-partition conf dump would dominate task bytes
    val kv = {
      val it = hconf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    new WebDatasetReaderFactory(required.fieldNames, kv,
      WebDatasetV2.extWhitelist(filters.toSeq))
  }
}

/** One scan task: a size-packed run of shard tars, `(file, shardNo)`. */
case class WebDatasetInputPartition(files: Array[(String, Long)])
  extends InputPartition

class WebDatasetReaderFactory(cols: Array[String],
                              confKv: Array[(String, String)],
                              extWhitelist: Option[Set[String]])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WebDatasetInputPartition]
    new WebDatasetShardReader(p.files, cols, confKv, extWhitelist)
  }
}

/** Streams a packed run of shard tars member by member. When `content` is
  * pruned away the reader seeks past each payload — 512 header bytes per
  * member is the whole scan cost. Members whose ext misses the pushed
  * whitelist are seeked past the same way, payload untouched. One
  * FileSystem handle serves the whole run (rebuilt Configuration once per
  * task, not per tar). */
class WebDatasetShardReader(files: Array[(String, Long)], cols: Array[String],
                            confKv: Array[(String, String)],
                            extWhitelist: Option[Set[String]])
  extends PartitionReader[InternalRow] {
  private val needContent = cols.contains("content")
  private val conf = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    confKv.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private var fileIdx = -1
  private var in: org.apache.hadoop.fs.FSDataInputStream = _
  private var shard = -1L
  private val header = new Array[Byte](512)
  private var off = 0L
  private var curKey: String = _
  private var curExt: String = _
  private var curSize: Long = _
  private var curContent: Array[Byte] = _
  // scratch for read-and-discard of tar pad bytes (< 512 by construction):
  // a seek on a checksummed/remote stream re-aligns per call (~ms), while a
  // sub-block sequential read comes straight out of the stream buffer
  private val padBuf = new Array[Byte](512)
  // skip-by-read bound (r14): skipping a PAYLOAD has the same trade as the
  // pad bytes above — a seek discards the stream buffer and re-aligns the
  // checksum chunk (or reopens the connection on an object store), while a
  // small sequential drain comes straight out of the buffer. Payloads up to
  // this bound are drained; only genuinely large payloads pay a seek.
  private val SkipReadMax = 128 * 1024
  private val skipBuf = new Array[Byte](64 * 1024)

  /** Skip `gap` bytes forward from the current position: sequential drain
    * for small gaps, seek for large ones (`target` = absolute end offset). */
  private def skipPast(gap: Long, target: Long): Unit = {
    if (gap <= SkipReadMax) {
      var left = gap
      while (left > 0) {
        val n = in.read(skipBuf, 0, math.min(left, skipBuf.length.toLong).toInt)
        if (n < 0) throw new java.io.EOFException(
          s"truncated tar member: $left bytes short of the entry end")
        left -= n
      }
    } else in.seek(target)
  }

  /** Advance to the next tar in the run; false when the run is done. */
  private def openNext(): Boolean = {
    if (in != null) { in.close(); in = null }
    fileIdx += 1
    if (fileIdx >= files.length) return false
    val (file, n) = files(fileIdx)
    val p = new org.apache.hadoop.fs.Path(file)
    WebDatasetV2.tarFilesOpened.increment()
    // a 128 KiB stream buffer (vs the 4 KiB io.file.buffer.size default)
    // amortizes the per-read syscall across ~256 header blocks — the
    // metadata walk is hundreds of 512-byte reads per tar
    in = p.getFileSystem(conf).open(p, 128 * 1024)
    shard = n
    off = 0L
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (in == null && !openNext()) return false
      // SEQUENTIAL reads + forward-only seeks, never positioned reads: the
      // tar walk is strictly monotone, and a positioned read
      // (readFully(pos, buf)) on Hadoop input streams is a synchronized
      // seek + read + seek-BACK — on the checksummed LocalFileSystem each
      // call re-aligns the checksum chunk twice, which made the per-member
      // header/payload pair cost ~ms each (measured: q167's scan stages at
      // 6-22 s of task time for a 10 MB corpus; sequential streaming is
      // also the right pattern on object stores, where positioned reads
      // can reopen the connection)
      in.readFully(header)
      if (header(0) == 0) { // terminator blocks: this tar is done
        in.close(); in = null
      } else {
        val name = new String(header, 0, 100, "UTF-8").takeWhile(_ != 0.toChar)
        val size = java.lang.Long.parseLong(
          new String(header, 124, 11, "US-ASCII").trim, 8)
        // LAST dot, the writeShards contract: exts are dot-free by
        // construction (rejected at write time), keys may contain dots
        val dot = name.lastIndexOf('.')
        val ext = if (dot >= 0) name.substring(dot + 1) else ""
        val entryEnd = 512 + (size + 511) / 512 * 512
        if (extWhitelist.forall(_.contains(ext))) {
          curKey = if (dot >= 0) name.substring(0, dot) else name
          curExt = ext
          curSize = size
          if (needContent) {
            curContent = new Array[Byte](size.toInt)
            in.readFully(curContent)
            WebDatasetV2.payloadBytesRead.add(size)
            val pad = (entryEnd - 512L - size).toInt
            if (pad > 0) in.readFully(padBuf, 0, pad) // sub-block: stay buffered
          } else { // pruned: skip past the payload, never materialized,
            // never counted (drained small payloads stay out of
            // payloadBytesRead — the metric counts MATERIALIZED bytes)
            curContent = null
            skipPast(entryEnd - 512L, off + entryEnd)
          }
          off += entryEnd
          return true
        }
        // filtered out: skip past, payload never materialized
        skipPast(entryEnd - 512L, off + entryEnd)
        off += entryEnd
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = {
    val values: Array[Any] = cols.map {
      case "shard" => java.lang.Long.valueOf(shard)
      case "key" => UTF8String.fromString(curKey)
      case "ext" => UTF8String.fromString(curExt)
      case "size" => java.lang.Long.valueOf(curSize)
      case "content" => curContent
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(values)
  }
  override def close(): Unit = if (in != null) in.close()
}
