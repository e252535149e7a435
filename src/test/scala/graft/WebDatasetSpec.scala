package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.WebDataset

/** WebDataset tar shard export: the container contract a multimodal
  * training loader depends on — byte-exact payload round trips, sample
  * members adjacent within a shard, byte budget honored, and re-exports
  * byte-identical (shard-level caching / rsync delta pushes). */
class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  private val bmpUdf = udf((id: Long) => Multimodal.syntheticBmpGray8(id, 8, 8))

  private def media = Tables.documents(spark, sf)
    .filter(col("doc_id") < 60)
    .select(col("doc_id"), col("text"),
      bmpUdf(col("doc_id")).as("img"),
      encode(col("text"), "UTF-8").as("txt"))

  private def export(dirName: String): (String, org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory(dirName).toString
    val manifest = WebDataset.writeShards(media, dir, col("doc_id"),
      Seq("bmp" -> col("img"), "txt" -> col("txt")),
      maxBytesPerShard = 8192L)
    (dir, manifest)
  }

  test("round-trip composition: shards -> decode -> media-index dedup -> byte-identical survivor re-export") {
    // the container as a first-class pipeline citizen, not just an
    // exporter: a shard layout is READ back, its image members DECODE
    // through the real BMP parser, near-dups drop via the q158 media
    // index, and the survivors RE-EXPORT byte-identically — the daily
    // multimodal crawl loop end-to-end
    val dir1 = java.nio.file.Files.createTempDirectory("graft_wds_loop").toString
    // seed = id % 7: every seed class spans the seen/batch halves
    val dupUdf = udf((id: Long) => Multimodal.syntheticBmpGray8(id % 7, 8, 8))
    val src = Tables.documents(spark, sf).filter(col("doc_id") < 60)
      .select(col("doc_id"), dupUdf(col("doc_id")).as("img"),
        encode(col("text"), "UTF-8").as("txt"))
    WebDataset.writeShards(src, dir1, col("doc_id"),
      Seq("bmp" -> col("img"), "txt" -> col("txt")), maxBytesPerShard = 8192L)
    // READ the container back and fingerprint the decoded image members
    val hashed = WebDataset.read(spark, dir1)
      .filter(col("ext") === "bmp")
      .select(col("key").cast("long").as("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val (_, _, px) = Multimodal.decodeBmpGray8(bytes)
        val (hi, lo) = Multimodal.aHash64(px)
        (id, hi, lo)
      }.toDF("doc_id", "hi", "lo")
    val seen = hashed.filter(col("doc_id") < 30)
    val batch = hashed.filter(col("doc_id") >= 30)
    val idx = Multimodal.buildMediaIndex(seen, "doc_id", "hi", "lo", 32, 32, "img")
    val dupIds = Multimodal.mediaIncrementalPairs(batch, idx,
        "doc_id", "hi", "lo", 32, 32, "img", maxHamming = 0)
      .select(col("batch_id").as("doc_id")).distinct()
    // every batch id whose seed class appears in seen must drop; the
    // constant-tile seed classes all hash alike, so assert via seeds
    val dropped = dupIds.as[Long].collect().toSet
    assert(dropped.nonEmpty && dropped.forall(_ >= 30L))
    val survivors = src.join(dupIds, Seq("doc_id"), "left_anti")
    val nSurv = survivors.count()
    assert(nSurv < 60 && nSurv >= 30, s"survivors: $nSurv")
    // survivor re-export is byte-identical across runs (shard caching /
    // rsync delta pushes keep working after the dedup pass)
    def export(tag: String): (String, Map[String, Array[Byte]]) = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_wds_$tag").toString
      WebDataset.writeShards(survivors, d, col("doc_id"),
        Seq("bmp" -> col("img"), "txt" -> col("txt")), maxBytesPerShard = 8192L)
      d -> new java.io.File(d).listFiles().filter(_.getName.endsWith(".tar"))
        .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath)).toMap
    }
    val (d1, e1) = export("surv1")
    val (_, e2) = export("surv2")
    assert(e1.keySet === e2.keySet && e1.keySet.nonEmpty)
    e1.foreach { case (name, bytes) =>
      assert(java.util.Arrays.equals(bytes, e2(name)), s"$name differs across re-exports")
    }
    // and the survivor container round-trips: every surviving sample present
    val back = WebDataset.read(spark, d1)
      .filter(col("ext") === "bmp")
      .select("key").as[String].collect().map(_.toLong).toSet
    assert(back === survivors.select("doc_id").as[Long].collect().toSet)
  }

  test("null payload lands as a zero-byte member (no NPE, cumsum stays exact)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_null").toString
    val withNulls = media.withColumn("txt",
      when(col("doc_id") % 3 === 0, lit(null).cast("binary"))
        .otherwise(col("txt")))
    WebDataset.writeShards(withNulls, dir, col("doc_id"),
      Seq("bmp" -> col("img"), "txt" -> col("txt")),
      maxBytesPerShard = 8192L)
    val back = WebDataset.read(spark, dir)
      .select("key", "ext", "content")
      .as[(String, String, Array[Byte])].collect()
    assert(back.count(_._2 == "txt") === 60)
    back.filter(r => r._1.toLong % 3 == 0 && r._2 == "txt")
      .foreach(r => assert(r._3.isEmpty, s"null payload must land 0-byte: ${r._1}"))
    back.filter(r => r._1.toLong % 3 != 0 && r._2 == "txt")
      .foreach(r => assert(r._3.nonEmpty))
  }

  test("tarHeader rejects members past the ustar 11-digit octal size field") {
    intercept[IllegalArgumentException] {
      WebDataset.tarHeader("big.bin", 8589934592L)
    }
    WebDataset.tarHeader("ok.bin", 8589934591L) // boundary fits
  }

  test("payloads round-trip byte-exact; every sample lands once") {
    val (dir, manifest) = export("graft_wds")
    val back = WebDataset.read(spark, dir)
      .select("key", "ext", "content")
      .as[(String, String, Array[Byte])].collect()
    val byKey = back.groupBy(_._1)
    assert(byKey.size === 60)
    val texts = Tables.documents(spark, sf).filter(col("doc_id") < 60)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    byKey.foreach { case (key, members) =>
      val id = key.toLong
      val m = members.map(r => r._2 -> r._3).toMap
      assert(m.keySet === Set("bmp", "txt"))
      assert(java.util.Arrays.equals(m("bmp"), Multimodal.syntheticBmpGray8(id, 8, 8)),
        s"bmp payload corrupted for $key")
      assert(new String(m("txt"), "UTF-8") === texts(id),
        s"txt payload corrupted for $key")
    }
    // the manifest counts what landed
    val total = manifest.agg(sum("n_samples")).as[Long].collect().head
    assert(total === 60L)
  }

  test("DSv2 source: format read == helper read; pruned metadata scan never touches payload bytes") {
    import graft.sources.v2.WebDatasetV2
    val (dir, _) = export("graft_wds_v2")
    val v2 = spark.read.format("graft-webdataset").load(dir)
    // full read equals the binaryFile helper row for row (content via md5)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, String)] =
      df.select(col("shard"), col("key"), col("ext"), md5(col("content")).as("m"))
        .as[(Long, String, String, String)].collect().toSet
    assert(rows(v2) === rows(WebDataset.read(spark, dir)))
    // size column is the true payload size
    val sizes = v2.select(col("size") === octet_length(col("content")))
      .as[Boolean].collect()
    assert(sizes.nonEmpty && sizes.forall(identity))
    // PRUNING: a manifest-style scan reads 512-byte headers only — the
    // payload counter (test hook, single-JVM) must not move, and the
    // BatchScan's read schema must not carry content
    val metaQ = spark.read.format("graft-webdataset").load(dir)
      .groupBy("shard").agg(count(lit(1)).as("n"), sum("size").as("bytes"))
    val plan = metaQ.queryExecution.executedPlan.toString
    assert(plan.contains("graft-webdataset["), plan)
    assert(!plan.split("graft-webdataset\\[")(1).split("]")(0).contains("content"),
      s"content must be pruned from the scan: $plan")
    WebDatasetV2.payloadBytesRead.reset()
    val manifest = metaQ.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(WebDatasetV2.payloadBytesRead.sum() === 0L,
      "metadata scan must not materialize payload bytes")
    // and the skipped-scan manifest agrees with the full-read one
    val full = WebDataset.read(spark, dir)
      .groupBy("shard").agg(count(lit(1)).as("n"),
        sum(octet_length(col("content")).cast("long")).as("bytes"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(manifest === full)
    // a content read DOES move the counter
    WebDatasetV2.payloadBytesRead.reset()
    v2.select("content").collect()
    assert(WebDatasetV2.payloadBytesRead.sum() > 0L)
  }

  test("DSv2 filter pushdown: a shard predicate opens ONLY matching tars") {
    import graft.sources.v2.WebDatasetV2
    val (dir, manifest) = export("graft_wds_push")
    val nShards = manifest.count()
    assert(nShards > 2, s"fixture needs several shards, got $nShards")
    val v2 = spark.read.format("graft-webdataset").load(dir)
    // point predicate: exactly one tar opens
    WebDatasetV2.tarFilesOpened.reset()
    val one = v2.filter(col("shard") === 1L)
      .groupBy("shard").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSeq
    assert(one.map(_._1) === Seq(1L))
    assert(WebDatasetV2.tarFilesOpened.sum() === 1L,
      s"shard=1 scan must open exactly 1 tar of $nShards")
    // range predicate: only the range's tars open
    WebDatasetV2.tarFilesOpened.reset()
    val rng = v2.filter(col("shard") >= 1L && col("shard") < 3L)
      .select("shard").distinct().as[Long].collect().sorted.toSeq
    assert(rng === Seq(1L, 2L))
    assert(WebDatasetV2.tarFilesOpened.sum() === 2L)
    // the pushed filters are visible in the physical plan (plan guard)
    val plan = v2.filter(col("shard") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("pushed=") && plan.contains("shard"), plan)
    // and an unfiltered scan still opens everything
    WebDatasetV2.tarFilesOpened.reset()
    v2.select("shard").distinct().count()
    assert(WebDatasetV2.tarFilesOpened.sum() === nShards)
  }

  test("DSv2 filter pushdown: an ext predicate seeks past non-matching payloads") {
    import graft.sources.v2.WebDatasetV2
    val (dir, _) = export("graft_wds_ext")
    val v2 = spark.read.format("graft-webdataset").load(dir)
    // txt-only scan: result matches the post-filter helper read, and the
    // payload counter moved by exactly the txt bytes — bmp payloads were
    // seeked past, never materialized
    WebDatasetV2.payloadBytesRead.reset()
    val txt = v2.filter(col("ext") === "txt")
      .select(col("key"), md5(col("content")).as("m"))
      .as[(String, String)].collect().toSet
    val txtBytes = WebDatasetV2.payloadBytesRead.sum()
    val expected = WebDataset.read(spark, dir).filter(col("ext") === "txt")
      .select(col("key"), md5(col("content")).as("m"))
      .as[(String, String)].collect().toSet
    assert(txt === expected && txt.size === 60)
    val totalTxt = WebDataset.read(spark, dir).filter(col("ext") === "txt")
      .agg(sum(octet_length(col("content")).cast("long"))).as[Long].collect().head
    assert(txtBytes === totalTxt,
      s"ext=txt scan read $txtBytes payload bytes, expected exactly $totalTxt (txt only)")
    // ext + metadata-only: zero payload bytes even with the member filter
    WebDatasetV2.payloadBytesRead.reset()
    val n = v2.filter(col("ext") === "bmp").select("key").count()
    assert(n === 60L && WebDatasetV2.payloadBytesRead.sum() === 0L)
  }

  test("manifest fast path: q169-class stats with ZERO tar opens; verifyManifest catches drift") {
    import graft.sources.v2.WebDatasetV2
    val (dir, _) = export("graft_wds_mf")
    WebDatasetV2.tarFilesOpened.reset()
    val fast = WebDataset.manifestStats(spark, dir)
      .select("shard", "n_members", "n_samples", "payload_bytes")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast.nonEmpty)
    assert(WebDatasetV2.tarFilesOpened.sum() === 0L,
      "the manifest fast path must not open a single tar")
    // agreement with the pruned header walk (the q169 read path)
    val walk = spark.read.format("graft-webdataset").load(dir)
      .groupBy("shard").agg(count(lit(1)).as("m"),
        countDistinct(col("key")).as("s"), sum("size").as("p"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast === walk)
    // verification mode passes on the untouched layout...
    assert(WebDataset.verifyManifest(spark, dir).isEmpty)
    // ...and surfaces out-of-band drift (a shard deleted behind the
    // manifest's back shows up with walk-side nulls)
    val victim = java.nio.file.Paths.get(dir).toFile.listFiles()
      .filter(_.getName.endsWith(".tar")).maxBy(_.getName)
    java.nio.file.Files.delete(victim.toPath)
    val drift = WebDataset.verifyManifest(spark, dir)
      .select("shard", "walk_members").as[(Long, Option[Long])].collect()
    assert(drift.length === 1 && drift.head._2.isEmpty,
      s"deleted shard must surface as manifest-only: ${drift.toSeq}")
  }

  test("DSv2 statistics: post-pruning size estimate makes a metadata container scan broadcast-eligible") {
    val (dir, _) = export("graft_wds_stats")
    // metadata join: per-sample sizes back onto the documents table — the
    // container side is a few KB of metadata tuples after pruning and
    // must BROADCAST (without SupportsReportStatistics a DSv2 relation
    // sizes at defaultSizeInBytes and the big side shuffles instead)
    val meta = spark.read.format("graft-webdataset").load(dir)
      .filter(col("ext") === "txt")
      .select(col("key"), col("size"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id").cast("string").as("key"), col("text"))
    val plan = docs.join(meta, "key").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"pruned container scan must broadcast: $plan")
    // and the broadcast side is the container scan, not the corpus
    val bcIdx = plan.indexOf("BroadcastExchange")
    assert(bcIdx >= 0 && plan.indexOf("graft-webdataset[", bcIdx) >= 0, plan)
  }

  test("compactShards: fragment layouts re-land byte-identical to a direct export; duplicate members refuse") {
    // land the corpus as two fragmented batch namespaces (tiny budget)
    val frag = java.nio.file.Files.createTempDirectory("graft_wds_frag").toString
    val (aDir, bDir) = (s"$frag/batch_id=0", s"$frag/batch_id=1")
    WebDataset.writeShards(media.filter(col("doc_id") % 2 === 0), aDir,
      col("doc_id"), Seq("bmp" -> col("img"), "txt" -> col("txt")), 4096L)
    WebDataset.writeShards(media.filter(col("doc_id") % 2 =!= 0), bDir,
      col("doc_id"), Seq("bmp" -> col("img"), "txt" -> col("txt")), 4096L)
    val nFrag = Seq(aDir, bDir).map(d => new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".tar"))).sum
    assert(nFrag > 4, s"fixture must fragment, got $nFrag shards")
    // compact to the big budget; compare byte-for-byte to a direct export
    val compacted = java.nio.file.Files.createTempDirectory("graft_wds_cmp").toString
    WebDataset.compactShards(spark, Seq(aDir, bDir), compacted,
      Seq("bmp", "txt"), 8192L)
    val (direct, _) = export("graft_wds_direct")
    def digests(d: String): Map[String, String] =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".tar"))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
          f.getName -> md.map("%02x".format(_)).mkString
        }.toMap
    val (cd, dd) = (digests(compacted), digests(direct))
    assert(cd === dd && cd.size > 1,
      "compaction must be byte-identical to the direct export")
    assert(WebDataset.verifyManifest(spark, compacted).isEmpty)
    // an overlapping landing (same key in both sources) refuses loudly
    val dup = java.nio.file.Files.createTempDirectory("graft_wds_dup").toString
    val err = intercept[Exception] {
      WebDataset.compactShards(spark, Seq(aDir, aDir), dup,
        Seq("bmp", "txt"), 8192L)
    }
    assert(err.getMessage.contains("duplicate member") ||
      Option(err.getCause).exists(_.getMessage.contains("duplicate member")),
      s"got: ${err.getMessage}")
  }

  test("writeShards rejects dotted exts (the key/ext round-trip contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_dotext").toString
    val err = intercept[IllegalArgumentException] {
      WebDataset.writeShards(media, dir, col("doc_id"),
        Seq("json.gz" -> col("txt")), maxBytesPerShard = 8192L)
    }
    assert(err.getMessage.contains("dot-free"))
  }

  test("commit sweeps stale temp files from attempts that died mid-write") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_tmp").toString
    // a dead attempt's orphan: right shard-name pattern, never renamed
    val stale = java.nio.file.Paths.get(dir, ".shard-00000.tar.99999.tmp")
    java.nio.file.Files.write(stale, Array[Byte](1, 2, 3))
    WebDataset.writeShards(media, dir, col("doc_id"),
      Seq("bmp" -> col("img"), "txt" -> col("txt")),
      maxBytesPerShard = 8192L)
    assert(!java.nio.file.Files.exists(stale),
      "shard-0's commit must sweep the dead attempt's temp file")
    val leftovers = java.nio.file.Paths.get(dir).toFile.listFiles()
      .map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"no temp files may outlive the job: ${leftovers.toSeq}")
  }

  test("DSv2 InputPartition stays O(path): serialized task bytes carry no conf dump") {
    val (dir, _) = export("graft_wds_partbytes")
    val scan = new graft.sources.v2.WebDatasetScan(
      dir, graft.sources.v2.WebDatasetV2.Schema, Array.empty)
    val parts = scan.planInputPartitions()
    assert(parts.nonEmpty)
    def serializedBytes(o: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close()
      bos.size()
    }
    // the session hadoopConf dump (what a per-partition conf embed would
    // cost EVERY task) dwarfs any path list
    val hconf = spark.sparkContext.hadoopConfiguration
    val confBytes = {
      val it = hconf.iterator(); var n = 0
      while (it.hasNext) { val e = it.next(); n += e.getKey.length + e.getValue.length }
      n
    }
    parts.foreach { p =>
      val files = p.asInstanceOf[graft.sources.v2.WebDatasetInputPartition].files
      val pathBytes = files.map(_._1.length).sum
      val bytes = serializedBytes(p)
      assert(bytes < pathBytes + 1024,
        s"partition serialized to $bytes B for $pathBytes B of paths — smells like an embedded conf ($confBytes B)")
      assert(bytes < confBytes,
        s"partition bytes $bytes must stay below the conf dump size $confBytes")
    }
  }

  test("sweep is speculation-safe: a concurrent attempt's live temp file survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_spec").toString
    // simulate a CONCURRENT (speculative) attempt still writing shard 0:
    // same name pattern as a dead attempt's orphan, but under speculation
    // the sweep cannot tell them apart — so it must not run at all
    val live = java.nio.file.Paths.get(dir, ".shard-00000.tar.424242.tmp")
    java.nio.file.Files.write(live, Array[Byte](9, 9, 9))
    val env = org.apache.spark.SparkEnv.get
    env.conf.set("spark.speculation", "true")
    try {
      WebDataset.writeShards(media, dir, col("doc_id"),
        Seq("bmp" -> col("img"), "txt" -> col("txt")),
        maxBytesPerShard = 8192L)
      assert(java.nio.file.Files.exists(live),
        "under speculation the sweep must leave a possibly-live concurrent temp alone")
      // the commit itself is unaffected: shard 0 landed
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "shard-00000.tar")))
    } finally env.conf.set("spark.speculation", "false")
  }

  test("members of one sample sit adjacently inside the shard tar") {
    val (dir, _) = export("graft_wds_adj")
    val shard0 = java.nio.file.Paths.get(dir).toFile.listFiles()
      .filter(_.getName.endsWith(".tar")).minBy(_.getName)
    val names = WebDataset.parseTar(
      java.nio.file.Files.readAllBytes(shard0.toPath)).map(_._1)
    assert(names.nonEmpty && names.length % 2 === 0)
    names.grouped(2).foreach { case Seq(a, b) =>
      assert(a.stripSuffix(".bmp") === b.stripSuffix(".txt"),
        s"sample members not adjacent: $a / $b")
    }
  }

  test("byte budget: every shard stays within max + one sample of spill") {
    val (_, manifest) = export("graft_wds_budget")
    val sizes = manifest.select("n_bytes").as[Long].collect()
    assert(sizes.length > 1, "budget should force multiple shards")
    // worst case: budget + the sample that crossed the line + terminator
    val maxSample = 2 * 512 + 1536 + 1024 + 1024 // two headers + padded payloads
    sizes.foreach(s => assert(s <= 8192L + maxSample + 1024L, s"shard too big: $s"))
  }

  test("re-export of the same data is byte-identical per shard") {
    val (d1, _) = export("graft_wds_a")
    val (d2, _) = export("graft_wds_b")
    def digests(d: String): Map[String, String] =
      java.nio.file.Paths.get(d).toFile.listFiles()
        .filter(_.getName.endsWith(".tar"))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
          f.getName -> md.map("%02x".format(_)).mkString
        }.toMap
    assert(digests(d1) === digests(d2))
  }
}
