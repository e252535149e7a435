package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Fixture-loader behavior: the legacy TIMESTAMP(NANOS) events path. The
  * driver's earlier fixture generations wrote parquet TIMESTAMP(NANOS),
  * which Spark 4 refuses by default (PARQUET_TYPE_ILLEGAL); current data is
  * MICROS-NTZ, so nothing in the normal suite exercises the fallback — this
  * spec builds a real NANOS-typed parquet via parquet-mr (on Spark's own
  * classpath) and drives it through `Tables.events` end to end.
  */
class TablesSpec extends SparkSpec {

  test("isNanosTypeRefusal finds the error class anywhere in the cause chain") {
    val top = new RuntimeException("[PARQUET_TYPE_ILLEGAL] nanos not allowed")
    assert(Tables.isNanosTypeRefusal(top))
    val nested = new RuntimeException("reading file failed",
      new RuntimeException("wrapper", new RuntimeException(
        "[PARQUET_TYPE_ILLEGAL] Illegal Parquet type: INT64 (TIMESTAMP(NANOS,false))")))
    assert(Tables.isNanosTypeRefusal(nested),
      "error class only on a nested cause must still route to the nanos path")
    assert(!Tables.isNanosTypeRefusal(new RuntimeException("disk on fire",
      new RuntimeException("some other cause"))))
  }

  test("events falls back to the nanos read path on a TIMESTAMP(NANOS) fixture and truncates to micros") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}

    val dir = Files.createTempDirectory("graft-nanos").toString
    val schema = Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveType.PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    val gf = new SimpleGroupFactory(schema)
    val nanos = 1700000000123456789L // 2023-11-14T22:13:20.123456789Z
    writer.write(gf.newGroup().append("event_id", 1L).append("ts", nanos))
    writer.write(gf.newGroup().append("event_id", 2L).append("ts", nanos + 999L))
    writer.close()

    // the direct read must refuse — otherwise this fixture no longer
    // exercises the branch and the spec is lying
    val refusal = intercept[Exception] {
      spark.read.parquet(s"$dir/events.parquet").collect()
    }
    assert(Tables.isNanosTypeRefusal(refusal),
      s"expected PARQUET_TYPE_ILLEGAL somewhere in: $refusal")

    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val got = df.orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq
    // sub-microsecond digits truncate (floor), as DuckDB does
    assert(got === Seq(nanos / 1000L, (nanos + 999L) / 1000L))

    // the nanosAsLong conf must not leak out of the guarded read (the
    // session default is "false"; only an explicit leftover "true" is a leak)
    assert(!spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false").toBoolean)
    Tables.invalidate(dir)
  }
}
