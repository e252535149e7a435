package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.{col, max, min}
import graft.sources.{Catalog, Files => FileSrc, Rest, Synthetic}

/** Source surface (§2.1): files, REST payloads, synthetic generator,
  * catalog-driven loop. (JDBC/Kafka builders are config-only — no server in
  * this container; their knobs mirror the reference's batch sizes.)
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csvDir round-trips with a bound schema (S5-S7)") {
    val dir = Files.createTempDirectory("csv").toString + "/out"
    val df = Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("id", "name", "v")
    FileSrc.writeCsv(df, dir)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val back = FileSrc.csvDir(spark, dir, schema)
      .as[(Int, String, Double)].collect().sortBy(_._1)
    assert(back.toSeq === Seq((1, "a", 1.5), (2, "b", 2.5)))
  }

  test("REST JSON payloads flatten to typed columns (S8/F21)") {
    val payloads = Seq(
      """{"user":{"name":{"first":"Ada","last":"L"},"location":{"street":{"number":7,"name":"Main"}}},"age":36}""",
      """{"user":{"name":{"first":"Alan","last":"T"},"location":{"street":{"number":9,"name":"Side"}}},"age":41}""")
    val df = Rest.fromJsonStrings(spark, payloads)
      .selectExpr("user.name.first AS first", "user.location.street.number AS street_no", "age")
    val got = df.as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("Ada", 7L, 36L), ("Alan", 9L, 41L)))
  }

  test("paginated fetch: drains pages, retries transient failures, feeds the JSON source") {
    // fake API: 3 pages; page 1's first GET fails with a connection reset
    var failOnce = true
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    def fakeGet(url: String): String = {
      calls += url
      if (url.endsWith("page=1") && failOnce) {
        failOnce = false
        throw new java.net.ConnectException("Connection refused: fake")
      }
      val p = url.split("page=")(1).toInt
      s"""{"page":$p,"rows":[{"v":${p * 10}}],"last":${p == 2}}"""
    }
    val policy = graft.etl.Retry.Policy(maxAttempts = 3, sleep = _ => ())
    val pages = Rest.fetchPaginated(
      p => s"http://api.test/items?page=$p",
      hasMore = (_, body) => !body.contains("\"last\":true"),
      policy = policy, get = fakeGet)
    assert(pages.length === 3)
    assert(calls.length === 4, "one retry for the transient failure")
    val rows = Rest.fromJsonStrings(spark, pages)
      .selectExpr("page", "explode(rows.v) AS v").as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((0L, 0L), (1L, 10L), (2L, 20L)))
  }

  test("cursor fetch follows next links and honors the page cap") {
    def fakeGet(url: String): String = url match {
      case "u0" => """{"v":0,"next":"u1"}"""
      case "u1" => """{"v":1,"next":"u2"}"""
      case _ => """{"v":2}"""
    }
    def next(body: String): Option[String] =
      "\"next\":\"([^\"]+)\"".r.findFirstMatchIn(body).map(_.group(1))
    val all = Rest.fetchCursor("u0", next, get = fakeGet)
    assert(all.length === 3)
    val capped = Rest.fetchCursor("u0", next, maxPages = 2, get = fakeGet)
    assert(capped.length === 2)
  }

  test("synthetic transactions are deterministic, distributed, and well-typed (S12)") {
    val a = Synthetic.transactions(spark, 1000).collect()
    val b = Synthetic.transactions(spark, 1000).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.length === 1000)
    val cats = a.map(_.getAs[String]("category")).toSet
    assert(cats.subsetOf(Set("grocery", "fuel", "apparel", "electronics", "dining")))
    assert(a.map(_.getAs[String]("txn_uuid")).distinct.length === 1000)
    // different seed → different stream
    val c = Synthetic.transactions(spark, 1000, seed = 7).collect()
    assert(c.map(_.toSeq).toSeq !== a.map(_.toSeq).toSeq)
  }

  test("catalog-driven table loop sees temp views (S13)") {
    Tables.orders(spark, sf).createOrReplaceTempView("cat_orders")
    Tables.customer(spark, sf).createOrReplaceTempView("cat_customer")
    val found = Catalog.tablesMatching(spark, "default",
      Set("cat_orders", "cat_customer", "cat_missing"))
    assert(found.toSet === Set("cat_orders", "cat_customer"))
  }

  test("DSv2 synthetic source is bit-identical to the expression generator") {
    val v2 = spark.read.format("graft-synthetic")
      .option("rows", "1000").option("seed", "7").load()
    assert(v2.schema === graft.sources.v2.SyntheticV2.Schema)
    val exprForm = Synthetic.transactions(spark, 1000, seed = 7)
    assert(v2.exceptAll(exprForm).isEmpty && exprForm.exceptAll(v2).isEmpty)
    assert(v2.count() === 1000)
  }

  test("DSv2 synthetic source: partition planning and column pruning reach the reader") {
    val v2 = spark.read.format("graft-synthetic")
      .option("rows", "100").option("numPartitions", "5").load()
    assert(v2.rdd.getNumPartitions === 5)

    val pruned = v2.select("txn_id")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("graft-synthetic")).getOrElse("")
    // the Scan.description surfaces the column set handed to the reader
    assert(scanLine.contains("cols=txn_id"), s"pruning did not reach the scan: $scanLine")
    assert(!scanLine.contains("txn_uuid"), s"uuid column still read: $scanLine")
  }

  test("DSv2 synthetic source: txn_id range filters shrink the GENERATED id range") {
    val v2 = spark.read.format("graft-synthetic")
      .option("rows", "1000").option("numPartitions", "4").load()
    val filtered = v2.filter(col("txn_id") >= 100 && col("txn_id") < 110)
    val scanLine = filtered.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("graft-synthetic")).getOrElse("")
    assert(scanLine.contains("ids=[100,110)"),
      s"pushdown did not reach the scan: $scanLine")
    // semantics preserved, and the source produced only the 10 matching ids
    assert(filtered.count() === 10)
    assert(filtered.agg(min(col("txn_id")), max(col("txn_id")))
      .head.toSeq === Seq(100L, 109L))
    // non-range predicates stay residual but still evaluate correctly
    val res = v2.filter(col("txn_id") < 50 && col("category") === "fuel")
    assert(res.collect().forall(_.getAs[String]("category") == "fuel"))
  }

  test("ORC round-trips, pushes predicates, and prunes columns like parquet") {
    val dir = Files.createTempDirectory("orc").toString + "/out"
    val df = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    FileSrc.writeOrc(df, dir)
    val back = FileSrc.orcDir(spark, dir)
    // parity: same rows, same schema
    assert(back.schema === df.schema)
    assert(back.count() === df.count())
    val got = back.filter(col("event_id") < 100)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = df.filter(col("event_id") < 100)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // the scan carries the pushed filter and the pruned two-column schema
    val plan = back.filter(col("event_id") < 100)
      .select("event_id", "value").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)]"),
      s"ORC pushdown missing:\n${plan.take(1200)}")
    assert(plan.contains("ReadSchema: struct<event_id:bigint,value:double>"),
      s"ORC column pruning missing:\n${plan.take(1200)}")
  }
}
