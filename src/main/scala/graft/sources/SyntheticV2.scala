package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, XxHash64Function}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the S12 synthetic-transaction generator
  * (`format("graft-synthetic")`): a real `TableProvider` →
  * `SupportsRead` table → `ScanBuilder` with COLUMN PRUNING →
  * `Batch`/`PartitionReader` pipeline, instead of a driver-built
  * `spark.range` plan.
  *
  * Why DSv2 rather than the expression form (`Synthetic.transactions`):
  * the generator becomes a named catalog-ready source with its own
  * partition planning — `numPartitions` readers each generate a disjoint
  * id range directly on executors (nothing flows from the driver), and
  * Spark pushes required-column pruning into the reader so an
  * `agg(count)` over the table never materializes uuids or categories.
  *
  * Row content is BIT-IDENTICAL to `Synthetic.transactions` (the reader
  * reuses Spark's own XxHash64 and the same md5 derivation), asserted by
  * SourcesSpec.
  *
  * Options: `rows` (default 1000), `numPartitions` (default 8),
  * `seed` (default 42).
  */
class SyntheticTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synthetic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // getTable receives the raw (case-sensitive) map; DSv2 option convention
    // is case-insensitive, so normalize — .option("Rows", …) must configure,
    // not silently fall back to the default row count
    val opts = new CaseInsensitiveStringMap(properties)
    new SyntheticTable(
      rows = Option(opts.get("rows")).getOrElse("1000").toLong,
      numPartitions = Option(opts.get("numpartitions")).getOrElse("8").toInt,
      seed = Option(opts.get("seed")).getOrElse("42").toInt)
  }
}

object SyntheticV2 {
  val Schema: StructType = new StructType()
    .add("txn_id", LongType, nullable = false)
    .add("txn_uuid", StringType, nullable = false)
    .add("amount", DoubleType, nullable = false)
    .add("category", StringType, nullable = false)
    .add("created_at", TimestampType, nullable = false)

  val Categories: IndexedSeq[String] =
    IndexedSeq("grocery", "fuel", "apparel", "electronics", "dining")

  /** Same per-field hash as `Synthetic.transactions`'s
    * `xxhash64(id, seed, field)` (Spark's xxhash64 starts at seed 42). */
  def fieldHash(id: Long, seed: Int, field: Int): Long = {
    var h = XxHash64Function.hash(id, LongType, 42L)
    h = XxHash64Function.hash(seed, IntegerType, h)
    h = XxHash64Function.hash(field, IntegerType, h)
    val m = Long.MaxValue
    // pmod without the (r + m) overflow a naive ((h % m) + m) % m hits
    val r = h % m
    if (r < 0) r + m else r
  }

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}

class SyntheticTable(rows: Long, numPartitions: Int, seed: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_synthetic($rows rows, seed $seed)"
  override def schema(): StructType = SyntheticV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, numPartitions, seed)
}

class SyntheticScanBuilder(rows: Long, numPartitions: Int, seed: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  private var required: StructType = SyntheticV2.Schema
  private var lo: Long = 0L // inclusive txn_id bound
  private var hi: Long = Long.MaxValue // exclusive
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** txn_id range predicates are absorbed into the GENERATED id range —
    * the readers produce fewer rows instead of filtering them. Anything
    * else stays residual (Spark re-evaluates it above the scan). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (push, residual) = filters.partition {
      case EqualTo("txn_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("txn_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("txn_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("txn_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("txn_id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    def num(v: Any): Long = v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    push.foreach {
      case EqualTo(_, v) => lo = math.max(lo, num(v)); hi = math.min(hi, num(v) + 1)
      case GreaterThan(_, v) => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, num(v))
      case LessThan(_, v) => hi = math.min(hi, num(v))
      case LessThanOrEqual(_, v) => hi = math.min(hi, num(v) + 1)
      case _ => ()
    }
    accepted = push
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new SyntheticScan(rows, numPartitions, seed, required, lo, hi)
}

class SyntheticScan(rows: Long, numPartitions: Int, seed: Int,
                    required: StructType, lo: Long, hi: Long)
  extends Scan with Batch {
  private val first = math.max(0L, lo)
  private val last = math.min(rows, hi) // exclusive
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaced in the physical plan: makes pruning and pushdown assertable
  override def description(): String =
    s"graft-synthetic[ids=[$first,$last), cols=${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, last - first)
    if (n == 0) return Array.empty
    val per = math.max(1L, (n + numPartitions - 1) / numPartitions)
    (first until last by per).map(s =>
      SyntheticInputPartition(s, math.min(s + per, last)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required.fieldNames, seed)
}

case class SyntheticInputPartition(start: Long, end: Long) extends InputPartition

class SyntheticReaderFactory(cols: Array[String], seed: Int)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticInputPartition]
    new SyntheticReader(p.start, p.end, cols, seed)
  }
}

/** Generates its id slice on the executor; emits ONLY the pruned columns. */
class SyntheticReader(start: Long, end: Long, cols: Array[String], seed: Int)
  extends PartitionReader[InternalRow] {
  import SyntheticV2._
  private var id = start - 1
  override def next(): Boolean = { id += 1; id < end }
  override def get(): InternalRow = {
    val values = cols.map {
      case "txn_id" => java.lang.Long.valueOf(id)
      case "txn_uuid" => UTF8String.fromString(md5Hex(s"$id$seed"))
      case "amount" => java.lang.Double.valueOf(fieldHash(id, seed, 1) % 100000 / 100.0)
      case "category" => UTF8String.fromString(
        Categories((fieldHash(id, seed, 2) % Categories.size).toInt))
      case "created_at" => java.lang.Long.valueOf(
        1704067200000000L + fieldHash(id, seed, 3) % 31536000000L * 1000)
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }
  override def close(): Unit = ()
}
