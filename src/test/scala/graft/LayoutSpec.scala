package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Physical claims of the data-layout family that the q176–q178 oracles
  * cannot see: the interleave math against a plain-Scala reference, real
  * file skipping (fewer files opened, zero false negatives), footer stats
  * agreeing with the data, cell files z-sorted, and incremental optimize
  * leaving untouched cells' files byte-identical on disk while a keyed
  * replay of the same batch stays idempotent.
  */
class LayoutSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_layout_$tag").toString

  private def refZ(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i + 1)
      z |= ((b >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  test("zValue2 matches the reference interleave bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(256)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue2(col("a"), col("b"), 16).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == refZ(r.getLong(0), r.getLong(1), 16),
        s"interleave mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("zBucket is exact integer math and clamps out-of-range to edge buckets") {
    import spark.implicits._
    val got = Seq(-50L, 0L, 5L, 9L, 1000L).toDF("c")
      .select(Layout.zBucket(col("c"), lit(0L), lit(9L), 4).as("bk"))
      .collect().map(_.getLong(0)).toSeq
    // (5*16) div 10 = 8, (9*16) div 10 = 14; -50 and 1000 clamp to 0 and 9.
    assert(got == Seq(0L, 0L, 8L, 14L, 14L))
  }

  test("pruned read opens fewer files and returns exactly the filter's rows") {
    val dir = tmp("prune")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    Layout.clusterByZOrder(ev, "event_id", "user_id", dir)
    val total = spark.read.parquet(dir).inputFiles.length
    val pruned = Layout.readPruned(spark, dir, "event_id", 100L, 199L)
    val opened = pruned.inputFiles.length
    assert(opened > 0 && opened < total,
      s"expected a strict subset of files: opened $opened of $total")
    val got = pruned.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = ev.filter(col("event_id").between(100L, 199L))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
  }

  test("footer skip index agrees with data-computed per-file statistics") {
    val dir = tmp("stats")
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"))
    Layout.clusterByZOrder(ev, "event_id", "user_id", dir)
    def keyOf(path: String): String = path.split('/').takeRight(2).mkString("/")
    val idx = Layout.readSkipIndex(spark, dir).collect()
      .map(r => keyOf(r.getAs[String]("file")) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("min_event_id"),
          r.getAs[Long]("max_event_id"))).toMap
    val data = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), min("event_id").as("mn"), max("event_id").as("mx"))
      .collect()
      .map(r => keyOf(r.getAs[String]("f")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("mn"), r.getAs[Long]("mx"))).toMap
    assert(idx.keySet == data.keySet)
    idx.foreach { case (k, v) => assert(v == data(k), s"stats mismatch for $k") }
    assert(idx.values.map(_._1).sum == ev.count())
  }

  test("cell files are sorted by the z-value within each file") {
    val dir = tmp("sorted")
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"))
    Layout.clusterByZOrder(ev, "event_id", "user_id", dir)
    val (bounds, bits, cellBits) = Layout.readZMeta(spark, dir)
    val file = spark.read.parquet(dir).inputFiles.head
    val zs = Layout.withZ(spark.read.parquet(file), "event_id", "user_id",
        bounds, bits, cellBits)
      .select(Layout.ZVAL).collect().map(_.getLong(0)).toSeq
    assert(zs == zs.sorted, "rows inside a cell file must be z-ordered")
  }

  test("statsCount: interior range is mostly metadata, count stays exact") {
    val dir = tmp("cnt")
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"))
    Layout.clusterByZOrder(ev, "event_id", "user_id", dir)
    val (bounds, _, _) = Layout.readZMeta(spark, dir)
    val span = bounds.aMax - bounds.aMin + 1
    val (lo, hi) = (bounds.aMin + span / 8, bounds.aMin + span / 2)
    val r = Layout.statsCount(spark, dir, "event_id", lo, hi).head()
    assert(r.getAs[Long]("exact_count") ==
      ev.filter(col("event_id").between(lo, hi)).count())
    assert(r.getAs[Long]("files_meta_only") > 0,
      "interior slabs must be answered from footer counts alone")
    assert(r.getAs[Long]("files_scanned") < r.getAs[Long]("files_total"))
    assert(r.getAs[Long]("rows_scanned") < ev.count(),
      "the residual scan must be a strict subset of the table")
  }

  test("bloom pruning: a rare high-cardinality string opens few files, exactly") {
    import spark.implicits._
    val dir = tmp("bloom")
    // High-cardinality tag → parquet writes real bloom filters (parquet-mr
    // skips them for fully dict-encoded chunks — the next test's path).
    val df = (0 until 20000).map { i =>
      (i.toLong, (i * 7 % 20000).toLong,
        if (i == 7777) "needle-tag" else s"val_$i")
    }.toDF("a", "b", "tag")
    Layout.clusterByZOrder(df, "a", "b", dir, bloomCols = Seq("tag"))
    val total = spark.read.parquet(dir).inputFiles.length
    val pruned = Layout.readPrunedEq(spark, dir, "tag", "needle-tag")
    assert(pruned.inputFiles.length < total,
      s"bloom should exclude most files: ${pruned.inputFiles.length} of $total")
    assert(pruned.select("a").collect().map(_.getLong(0)).toSeq == Seq(7777L))
    // And an absent value admits nothing (bloom may false-positive a few
    // files, but the exact filter on top returns zero rows).
    assert(Layout.readPrunedEq(spark, dir, "tag", "absent-xyz").count() == 0)
  }

  test("dictionary pruning: a cell-confined low-cardinality string skips files") {
    import spark.implicits._
    val dir = tmp("dict")
    // tag correlates with the A dimension, so each cell's dictionary holds
    // 1–2 values and EXACT membership excludes the rest. No bloom needed.
    val df = (0 until 20000).map { i =>
      (i.toLong, (i * 13 % 20000).toLong, s"grp${i / 5000}")
    }.toDF("a", "b", "tag")
    Layout.clusterByZOrder(df, "a", "b", dir)
    val total = spark.read.parquet(dir).inputFiles.length
    val pruned = Layout.readPrunedEq(spark, dir, "tag", "grp0")
    assert(pruned.inputFiles.length < total,
      s"dictionary should exclude files: ${pruned.inputFiles.length} of $total")
    val got = pruned.select("a").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 5000L))
  }

  test("streaming fold: clusterBatch is first-cluster + idempotent optimize") {
    val dir = tmp("stream") + "/table"
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val b1 = ev.filter(col("event_id") % 3 === 0)
    val b2 = ev.filter(col("event_id") % 3 === 1)
    def ids(): Seq[Long] = spark.read.parquet(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    def want(fs: org.apache.spark.sql.DataFrame*): Seq[Long] =
      fs.flatMap(_.select("event_id").collect().map(_.getLong(0))).sorted

    Layout.clusterBatch(b1, dir, "event_id", "user_id", key = Seq("event_id"))
    assert(ids() == want(b1))
    Layout.clusterBatch(b2, dir, "event_id", "user_id", key = Seq("event_id"))
    assert(ids() == want(b1, b2))
    // at-least-once delivery: replaying either committed batch is a no-op
    Layout.clusterBatch(b2, dir, "event_id", "user_id", key = Seq("event_id"))
    Layout.clusterBatch(b1, dir, "event_id", "user_id", key = Seq("event_id"))
    assert(ids() == want(b1, b2))
    // later batches keep pruning working (index refreshed per fold)
    val lo = spark.read.parquet(dir).agg(min("event_id")).head().getLong(0)
    val pr = Layout.readPruned(spark, dir, "event_id", lo, lo)
    assert(pr.count() == 1)
    // a half-landed FIRST batch (no _zmeta commit marker) re-clusters
    val dir2 = tmp("stream2") + "/table"
    Layout.clusterBatch(b1, dir2, "event_id", "user_id", key = Seq("event_id"))
    val meta = Paths.get(s"$dir2/_zmeta")
    import scala.jdk.CollectionConverters._
    Files.walk(meta).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    Layout.clusterBatch(b1, dir2, "event_id", "user_id", key = Seq("event_id"))
    val got2 = spark.read.parquet(dir2)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got2 == want(b1), "replay of an uncommitted first batch must re-cluster")
  }

  test("optimize's base scan partition-prunes to touched cells (DPP plan guard)") {
    val dir = tmp("dpp")
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"))
    Layout.clusterByZOrder(ev.filter(col("event_id") % 10 =!= 0),
      "event_id", "user_id", dir)
    val (bounds, bits, cellBits) = Layout.readZMeta(spark, dir)
    val batch = ev.filter(col("event_id") % 10 === 0 && col("event_id") < 200)
    val touched = Layout.withZ(batch, "event_id", "user_id", bounds, bits, cellBits)
      .groupBy(Layout.ZCELL).agg(count(lit(1)).as("rows_added"))
    val base = spark.read.parquet(dir)
      .withColumn(Layout.ZCELL, col(Layout.ZCELL).cast("long"))
    val tb = base.join(broadcast(touched.select(Layout.ZCELL)),
      Seq(Layout.ZCELL), "left_semi")
    tb.collect()
    val plan = tb.queryExecution.executedPlan.toString
    // The rewrite's read side must carry a dynamic partition-pruning filter
    // on the cell directory — untouched cells are never opened.
    assert(plan.contains("dynamicpruningexpression"),
      s"expected DPP on the zcell partition column, got:\n${plan.take(1500)}")
  }

  test("optimize rewrites only touched cells; keyed replay is idempotent") {
    val dir = tmp("opt")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val maxE = ev.agg(max("event_id")).head().getLong(0)
    Layout.clusterByZOrder(ev.filter(col("event_id") % 10 =!= 0),
      "event_id", "user_id", dir)
    // A batch confined to the low quarter of the key range: it can only
    // reach z-cells whose A-prefix is 0 or 1, so most cells stay untouched.
    val batch = ev.filter(col("event_id") % 10 === 0 &&
      col("event_id") < maxE / 4)

    def fileState(): Map[String, (Long, Long)] = {
      val root = Paths.get(dir)
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          !p.toString.contains("/_"))
        .map(p => p.toString ->
          (Files.getLastModifiedTime(p).toMillis, Files.size(p)))
        .toMap
    }
    val before = fileState()
    val report = Layout.optimizeIncremental(spark, dir, batch,
      "event_id", "user_id", key = Seq("event_id")).collect()
    val after = fileState()

    val untouchedCells = report.filter(!_.getAs[Boolean]("rewritten"))
      .map(_.getAs[Long]("zcell")).toSet
    val touchedCells = report.filter(_.getAs[Boolean]("rewritten"))
      .map(_.getAs[Long]("zcell")).toSet
    assert(untouchedCells.nonEmpty && touchedCells.nonEmpty)
    def cellOf(path: String): Long =
      "zcell=(\\d+)".r.findFirstMatchIn(path).get.group(1).toLong
    // Untouched cells: files byte-identical on disk (same path, mtime, size).
    before.filter { case (p, _) => untouchedCells.contains(cellOf(p)) }
      .foreach { case (p, st) =>
        assert(after.get(p).contains(st), s"untouched cell file changed: $p")
      }
    // Touched cells: rewritten (old files gone or replaced).
    val touchedBefore = before.keys.filter(p => touchedCells.contains(cellOf(p)))
    assert(touchedBefore.forall(p => !after.contains(p)),
      "touched cells must be rewritten, not appended to")

    // Content: base ∪ batch, exactly once each.
    def ids(): Seq[Long] = spark.read.parquet(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = (ev.filter(col("event_id") % 10 =!= 0).select("event_id")
      .collect().map(_.getLong(0)) ++
      batch.select("event_id").collect().map(_.getLong(0))).sorted.toSeq
    assert(ids() == want)

    // Replaying the SAME batch with the key: no duplicates, same content.
    Layout.optimizeIncremental(spark, dir, batch,
      "event_id", "user_id", key = Seq("event_id"))
    assert(ids() == want, "keyed replay of the same batch must be a no-op")
  }

  test("drift heal: read paths heal IN-MEMORY only; persistHealed lands the index via staged swap") {
    val dir = tmp("heal")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    Layout.clusterByZOrder(ev, "event_id", "user_id", dir)

    def idxState(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(dir, "_skipindex")).iterator().asScala
        .filter(Files.isRegularFile(_)).map(p => p.toString -> Files.size(p))
        .toMap
    }
    // create drift: delete one data file out from under the landed index
    val victim = spark.read.parquet(dir).inputFiles.head
    Files.delete(Paths.get(new java.net.URI(victim)))
    val before = idxState()

    // a pruned read over the FULL key range: correct rows (dead entry
    // dropped in-memory — no FileNotFound), and the on-disk index is
    // untouched (read paths must not need write permission, and two
    // concurrent readers must not race an overwrite)
    val maxE = ev.agg(max("event_id")).head().getLong(0)
    val got = Layout.readPruned(spark, dir, "event_id", 0L, maxE).count()
    val live = spark.read.parquet(dir).count()
    assert(got == live, s"healed read returned $got of $live live rows")
    assert(idxState() == before, "a READ path rewrote _skipindex")

    // the maintenance entry point persists the heal; the landed index
    // matches the live listing exactly
    Layout.validatedSkipIndex(spark, dir, persistHealed = true)
    assert(idxState() != before, "persistHealed must land the healed index")
    def norm(s: String): String = s.replaceFirst("^file:/+", "/")
    val idxFiles = Layout.readSkipIndex(spark, dir)
      .select("file").collect().map(r => norm(r.getString(0))).toSet
    val liveFiles = spark.read.parquet(dir).inputFiles.map(norm).toSet
    assert(idxFiles == liveFiles)
    // and no stage/trash residue from the swap
    locally {
      import scala.jdk.CollectionConverters._
      assert(!Files.list(Paths.get(dir)).iterator().asScala
        .exists(_.getFileName.toString.contains("__")),
        "staged-swap residue left behind")
    }
  }

  test("absent _skipindex self-heals: pruned reads rebuild from footers, " +
       "persistHealed re-lands the index and sweeps stale swap dirs") {
    val dir = tmp("absent")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
    Layout.clusterByZOrder(ev, "event_id", "user_id", dir)
    // simulate a swap that crashed between rename(live->trash) and
    // rename(stage->live): no _skipindex, stale trash + stage residue
    def rmTree(root: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
    rmTree(Paths.get(s"$dir/_skipindex"))
    Files.createDirectories(Paths.get(s"$dir/_skipindex__old-deadbeef"))
    Files.createDirectories(Paths.get(s"$dir/_skipindex__stage-deadbeef"))

    // read path: rebuilds in memory (colsIfAbsent), correct rows, no write
    val got = Layout.readPruned(spark, dir, "event_id", 100L, 199L)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = ev.filter(col("event_id").between(100L, 199L))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    assert(!Files.exists(Paths.get(s"$dir/_skipindex")),
      "a READ path must not write the index")

    // maintenance path: index_cols recovered from _zmeta, index re-landed,
    // stale __stage-/__old- residue swept
    Layout.validatedSkipIndex(spark, dir, persistHealed = true)
    assert(Files.exists(Paths.get(s"$dir/_skipindex")))
    assert(!Files.exists(Paths.get(s"$dir/_skipindex__old-deadbeef")))
    assert(!Files.exists(Paths.get(s"$dir/_skipindex__stage-deadbeef")))
    val n = Layout.readSkipIndex(spark, dir).count()
    assert(n == spark.read.parquet(dir).inputFiles.length.toLong)
  }

  test("rebaseSkipIndex rewrites only the LEADING prefix of each path") {
    val dir = tmp("rebase")
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"))
    Layout.clusterByZOrder(ev, "event_id", "user_id", dir)
    // adversarial: the from-prefix string also occurs mid-path
    val before = Layout.readSkipIndex(spark, dir)
      .select("file").collect().map(_.getString(0)).sorted.toSeq
    val from = "/old/base"
    val crafted = before.map(p => s"$from/x$from/y/" + p.split('/').last)
    import spark.implicits._
    val idx = Layout.readSkipIndex(spark, dir).drop("file").collect()
    // rewrite the landed index with crafted paths, preserving schema
    val craftedDf = Layout.readSkipIndex(spark, dir)
      .orderBy("file")
      .withColumn("file",
        element_at(typedlit(crafted),
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy("file"))).cast("int")))
      .localCheckpoint()
    craftedDf.coalesce(1).write.mode("overwrite").parquet(s"$dir/_skipindex")
    Layout.rebaseSkipIndex(spark, dir, from, "/new/base")
    val after = Layout.readSkipIndex(spark, dir)
      .select("file").collect().map(_.getString(0)).sorted.toSeq
    // leading occurrence rewritten, the mid-path one untouched
    assert(after.forall(_.startsWith(s"/new/base/x$from/y/")), after.take(2))
    assert(idx.nonEmpty && after.length == before.length)
  }
}
