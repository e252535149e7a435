package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.v2.GraftSink

/** DSv2 sink: manifest-based two-phase commit — appends merge, truncate
  * replaces, failed jobs publish nothing, orphan files are invisible. */
class SinkV2Spec extends SparkSpec {
  import spark.implicits._

  private def newTarget(): String = {
    val dir = Files.createTempDirectory("graft-sink").toString
    GraftSink.create(dir, new StructType()
      .add("id", LongType).add("name", StringType))
    dir
  }

  test("append twice: both batches visible, manifest tracks each file's rows") {
    val dir = newTarget()
    (1L to 10L).map(i => (i, s"row$i")).toDF("id", "name")
      .repartition(2)
      .write.format("graft-sink").option("path", dir).mode("append").save()
    (11L to 15L).map(i => (i, s"row$i")).toDF("id", "name")
      .write.format("graft-sink").option("path", dir).mode("append").save()

    val got = GraftSink.readCommitted(spark, dir)
    assert(got.count() === 15)
    assert(got.agg(sum("id")).as[Long].head() === (1L to 15L).sum)
    assert(GraftSink.manifest(dir).map(_._2).sum === 15)
    // no staging leftovers after a clean commit
    assert(!Files.exists(Paths.get(dir, "_staging")))
  }

  test("overwrite truncates: only the new generation is visible, old files gone") {
    val dir = newTarget()
    (1L to 10L).map(i => (i, s"a$i")).toDF("id", "name")
      .write.format("graft-sink").option("path", dir).mode("append").save()
    (100L to 102L).map(i => (i, s"b$i")).toDF("id", "name")
      .write.format("graft-sink").option("path", dir).mode("overwrite").save()

    val got = GraftSink.readCommitted(spark, dir).as[(Long, String)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(100L, 101L, 102L))
    // replaced generation's bytes are actually removed, not just unlisted
    val dataFiles = Files.list(Paths.get(dir, "data")).iterator()
    val names = GraftSink.manifest(dir).map(_._1).toSet
    while (dataFiles.hasNext) {
      val f = dataFiles.next().getFileName.toString
      assert(names.contains(f), s"unmanaged file $f survived truncate")
    }
  }

  test("failed job publishes nothing: manifest and data unchanged, staging cleaned") {
    val dir = newTarget()
    (1L to 5L).map(i => (i, s"keep$i")).toDF("id", "name")
      .write.format("graft-sink").option("path", dir).mode("append").save()

    // id div (id - 3) throws at id=3 (ANSI divide-by-zero) mid-write
    val failing = (1L to 100L).toDF("id")
      .withColumn("id", expr("id div (id - 3)"))
      .withColumn("name", lit("boom"))
    intercept[Exception] {
      failing.write.format("graft-sink").option("path", dir).mode("append").save()
    }
    assert(GraftSink.readCommitted(spark, dir).count() === 5,
      "aborted job must not publish rows")
    assert(GraftSink.manifest(dir).map(_._2).sum === 5)
    assert(!Files.exists(Paths.get(dir, "_staging")),
      "abort must clean the staging area")
  }

  test("readers resolve the manifest, so orphaned data files are invisible") {
    val dir = newTarget()
    (1L to 3L).map(i => (i, s"x$i")).toDF("id", "name")
      .write.format("graft-sink").option("path", dir).mode("append").save()
    // simulate a crashed job that moved a file but died before the
    // manifest swap
    Files.write(Paths.get(dir, "data", "part-99999-0.jsonl"),
      """{"id":999,"name":"ghost"}""".getBytes("UTF-8"))
    assert(GraftSink.readCommitted(spark, dir).count() === 3)
    assert(!GraftSink.readCommitted(spark, dir)
      .filter(col("id") === 999).as[(Long, String)].collect().nonEmpty)
  }

  test("appends validate by name against the declared schema") {
    val dir = newTarget()
    intercept[Exception] {
      Seq((1L, "x")).toDF("id", "wrong_name")
        .write.format("graft-sink").option("path", dir).mode("append").save()
    }
    assert(GraftSink.manifest(dir).isEmpty)
  }

  test("streaming sink: micro-batches append through epoch commits") {
    implicit val sqlCtx = spark.sqlContext
    val dir = newTarget()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "name")
      .writeStream.format("graft-sink")
      .option("path", dir)
      .option("checkpointLocation", Files.createTempDirectory("graft-sink-ckpt").toString)
      .outputMode("append").start()
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()

    val got = GraftSink.readCommitted(spark, dir).as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(graft.sources.v2.GraftSink.committedEpochs(dir).size >= 2,
      "each micro-batch must leave an epoch marker")
  }

  test("Complete-mode streaming truncates per epoch: latest aggregate only, ledger intact") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sink-complete").toString
    GraftSink.create(dir, new StructType()
      .add("name", StringType).add("n", LongType))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "name")
      .groupBy("name").agg(count(lit(1)).as("n"))
      .writeStream.format("graft-sink")
      .option("path", dir)
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt-c").toString)
      .outputMode("complete").start()
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "a"))
    q.processAllAvailable()
    q.stop()

    // append semantics would union both epochs' FULL snapshots ((a,1) AND
    // (a,2)); Complete mode must leave only the latest generation
    val got = GraftSink.readCommitted(spark, dir)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("a", 2L), ("b", 1L)))
    // the epoch ledger survives the truncating swaps (replay protection)
    assert(GraftSink.committedEpochs(dir).size >= 2)
    // superseded generations' files are physically gone
    val dataFiles = new java.io.File(dir, "data").list().toSeq
    assert(dataFiles.forall(f => GraftSink.manifest(dir).exists(_._1 == f)),
      s"unreferenced files left behind: $dataFiles")
  }

  test("end-to-end: streaming sessionize lands closed sessions in the exactly-once sink") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream
    import graft.streaming.EventStream.Event
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val dir = Files.createTempDirectory("graft-sink-sessions").toString
    GraftSink.create(dir, new StructType()
      .add("user_id", LongType).add("n_events", LongType))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMs = 10 * 60 * 1000)
      .select(col("user_id"), col("n_events"))
      .writeStream.format("graft-sink")
      .option("path", dir)
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt2").toString)
      .outputMode("append").start()
    input.addData(
      Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 00:05:00"), 1, "view", 2.0))
    q.processAllAvailable()
    // watermark far past the gap: user 1's session must close and publish
    input.addData(Event(3, ts("2024-01-01 03:00:00"), 2, "click", 5.0))
    q.processAllAvailable()
    input.addData(Event(4, ts("2024-01-01 06:00:00"), 3, "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val sessions = GraftSink.readCommitted(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(sessions.get(1L) === Some(2L),
      s"user 1's closed 2-event session must be in the sink, got $sessions")
  }

  test("epoch re-commit after recovery is a no-op (exactly-once ledger)") {
    val dir = newTarget()
    val schema = GraftSink.readSchema(Paths.get(dir))
    val sw = new graft.sources.v2.GraftStreamingWrite(
      Paths.get(dir), schema, "recovery-test-query")
    // stage one task file for epoch 7, as a task commit would leave it
    val staging = Paths.get(dir, "_staging", "recovery-test-query", "7")
    Files.createDirectories(staging)
    Files.write(staging.resolve("epoch00007-part-00000-1.jsonl"),
      """{"id":1,"name":"once"}""".getBytes("UTF-8"))
    val msg = graft.sources.v2.GraftCommitMessage("epoch00007-part-00000-1.jsonl", 1L)

    sw.commit(7L, Array(msg))
    assert(GraftSink.readCommitted(spark, dir).count() === 1)
    // driver recovery replays the epoch commit: nothing publishes twice,
    // nothing throws on the already-moved file
    sw.commit(7L, Array(msg))
    assert(GraftSink.readCommitted(spark, dir).count() === 1)
    assert(GraftSink.manifest(dir).size === 1)
  }

  test("clusterBy: every cluster key lands in exactly one committed file, sorted within") {
    val dir = Files.createTempDirectory("graft-sink-clustered").toString
    GraftSink.create(dir, new StructType()
      .add("shard", LongType).add("pos", LongType))
    // unsorted, shards interleaved across input partitions
    val rows = for (p <- 0L until 40L) yield (p % 4, 40L - p)
    rows.toDF("shard", "pos").repartition(8)
      .write.format("graft-sink").option("path", dir)
      .option("clusterBy", "shard").option("sortBy", "shard,pos")
      .mode("append").save()

    // which files contain which shards — read each committed file alone
    val files = GraftSink.manifest(dir).map(_._1)
    val byFile = files.map { f =>
      val content = new String(Files.readAllBytes(Paths.get(dir, "data", f)), "UTF-8")
      f -> content.linesIterator.map { l =>
        val m = """"shard":(\d+),"pos":(\d+)""".r.findFirstMatchIn(l).get
        (m.group(1).toLong, m.group(2).toLong)
      }.toSeq
    }.toMap
    val fileOfShard = byFile.toSeq
      .flatMap { case (f, rs) => rs.map(_._1).distinct.map(_ -> f) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    (0L until 4L).foreach { s =>
      assert(fileOfShard(s).size === 1,
        s"shard $s split across files: ${fileOfShard(s)}")
    }
    // sortBy: rows inside each file arrive in (shard, pos) order
    byFile.values.foreach { rs => assert(rs === rs.sortBy(identity)) }
    assert(GraftSink.readCommitted(spark, dir).count() === 40)
  }

  test("undeclared target fails fast with the create() hint") {
    val dir = Files.createTempDirectory("graft-sink-undeclared").toString
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("id", "name")
        .write.format("graft-sink").option("path", dir).mode("append").save()
    }
    assert(e.getMessage.contains("create") || e.getCause != null)
  }
}
