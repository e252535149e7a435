package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** Executed JDBC round-trip over the Derby engine Spark already bundles (the
  * hive-metastore dependency doubles as an embeddable test database): the
  * write path (S2/S14 batchsize), whole-table read (S1/S15 fetchsize), and
  * the partitioned cursor read (S3) all run against a real DBMS — the same
  * `spark.read/write.format("jdbc")` calls the reference aims at MSSQL/PG
  * (`sparkFiles/sparkProcess.py:181-188,333-341`).
  */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val url =
    s"jdbc:derby:memory:graft${java.util.UUID.randomUUID().toString.take(8)};create=true"

  private def fixture = Seq(
    (1L, "alice", 12.5, true),
    (2L, "bob", -3.25, false),
    (3L, null.asInstanceOf[String], 0.0, true),
    (4L, "dora", 99.75, false)
  ).toDF("id", "name", "amount", "flag")

  test("S2/S1: write with batchsize, read back with fetchsize — values and nulls survive") {
    Jdbc.write(fixture, url, "t_roundtrip", SaveMode.Overwrite, batchSize = 2)
    val back = Jdbc.read(spark, url, "t_roundtrip", fetchSize = 2)
    assert(back.schema.fieldNames.toSet === Set("id", "name", "amount", "flag"))
    val got = back.orderBy("id")
      .as[(Long, Option[String], Double, Boolean)].collect().toSeq
    val want = fixture.orderBy("id")
      .as[(Long, Option[String], Double, Boolean)].collect().toSeq
    assert(got === want)
  }

  test("S14: append mode accumulates batches like the ORM bulk insert") {
    Jdbc.write(fixture, url, "t_append", SaveMode.Overwrite, batchSize = 1000)
    Jdbc.write(fixture.withColumn("id", col("id") + 10), url, "t_append",
      SaveMode.Append, batchSize = 1000)
    assert(Jdbc.read(spark, url, "t_append").count() === 8)
  }

  test("S3: partitioned range read splits the cursor and returns every row once") {
    // Spark's JDBC writer quotes identifiers, making them case-sensitive in
    // Derby — uppercase df columns keep the pushed (unquoted) SQL resolvable
    val rows = spark.range(0, 1000).select(col("id").as("ID"),
      (col("id") % 7).cast("double").as("V"))
    Jdbc.write(rows, url, "t_part", SaveMode.Overwrite)
    val part = Jdbc.readPartitioned(spark, url,
      "SELECT ID, V FROM t_part WHERE V >= 0", "ID",
      lowerBound = 0, upperBound = 1000, numPartitions = 4, fetchSize = 100)
    // N executors each pull a cursor slice — the plan must carry 4 partitions
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === 1000)
    assert(part.agg(sum("ID")).as[Long].head() === (0L until 1000L).sum)
  }

  test("DSv2 catalog: aggregates and filters push down into Derby; results match in-engine") {
    // uppercase identifiers: the quoting writer makes them case-sensitive
    val rows = spark.range(0, 500).select(
      (col("id") % 5).cast("long").as("K"),
      (col("id") % 11).cast("double").as("V"))
    Jdbc.write(rows, url, "T_PUSH", SaveMode.Overwrite)
    Jdbc.registerCatalog(spark, "derbycat", url)
    val t = spark.read.table("derbycat.APP.T_PUSH")

    // aggregate + group-by pushdown: the DB computes the partial SUM/COUNT
    val agg = t.filter(col("V") >= 2.0).groupBy(col("K"))
      .agg(sum(col("V")).as("SV"), count(lit(1)).as("N"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"aggregate must reach the JDBC scan:\n${plan.take(2000)}")
    assert(plan.contains("PushedFilters") && plan.contains("V"),
      s"filter must reach the JDBC scan:\n${plan.take(2000)}")

    // and the pushed plan computes the same answer as the in-engine one
    val viaV2 = agg.orderBy("K").as[(Long, Double, Long)].collect().toSeq
    val inEngine = rows.filter(col("V") >= 2.0).groupBy(col("K"))
      .agg(sum(col("V")).as("SV"), count(lit(1)).as("N"))
      .orderBy("K").as[(Long, Double, Long)].collect().toSeq
    assert(viaV2 === inEngine)
  }

  test("timestamps and decimals round-trip through the dialect") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-02-29 23:59:59"), BigDecimal("1234.56")),
      (2L, java.sql.Timestamp.valueOf("1999-01-01 00:00:00"), BigDecimal("-0.01"))
    ).toDF("id", "ts", "amt")
    Jdbc.write(df, url, "t_types", SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "t_types").orderBy("id")
      .select(col("id"), col("ts"), col("amt").cast("decimal(10,2)"))
      .as[(Long, java.sql.Timestamp, BigDecimal)].collect().toSeq
    assert(back === df.orderBy("id")
      .as[(Long, java.sql.Timestamp, BigDecimal)].collect().toSeq)
  }
}
