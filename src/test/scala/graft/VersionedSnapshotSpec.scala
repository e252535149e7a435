package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.VersionedSnapshot

/** Time-travel contracts: manifest-pinned reads survive later commits,
  * appends reuse prior files by reference, vacuum respects the retention
  * barrier and refuses to cross it. */
class VersionedSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_vsnap").toString

  private def fileState(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir, "data")
    if (!java.nio.file.Files.exists(root)) Map.empty
    else java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
  }

  test("write v1 -> upsert v2 -> readAt(1) is byte-identical; vacuum below the barrier") {
    val dir = tmp()
    val v1rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    assert(VersionedSnapshot.commit(spark, v1rows, dir) == 1L)
    val v1files = fileState(dir)

    // upsert: v2 replaces k=2 and adds k=4 (full-replacement commit)
    val merged = Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")).toDF("k", "v")
    assert(VersionedSnapshot.commit(spark, merged, dir) == 2L)

    // v1's files are untouched on disk (same paths, same sizes) and
    // readAt(1) returns exactly the v1 content
    assert(v1files.forall { case (p, sz) => fileState(dir).get(p).contains(sz) },
      "a later commit must never rewrite an earlier version's files")
    assert(VersionedSnapshot.readAt(spark, dir, 1).collect().toSet ==
      v1rows.collect().toSet)
    assert(VersionedSnapshot.read(spark, dir).collect().toSet ==
      merged.collect().toSet)

    // vacuum below barrier 2: v1's (unshared) files delete, v2 intact,
    // readAt(1) now refuses
    val deleted = VersionedSnapshot.vacuum(spark, dir, keepFrom = 2L)
    assert(deleted >= 1, "v1-only files must be reclaimed")
    assert(VersionedSnapshot.read(spark, dir).collect().toSet ==
      merged.collect().toSet)
    intercept[IllegalArgumentException](
      VersionedSnapshot.readAt(spark, dir, 1).collect())
    // and the barrier itself is enforced
    intercept[IllegalArgumentException](
      VersionedSnapshot.vacuum(spark, dir, keepFrom = 99L))
  }

  test("commitAppend reuses prior files by reference; vacuum keeps shared files") {
    val dir = tmp()
    VersionedSnapshot.commit(spark, Seq((1L, 10L)).toDF("k", "n"), dir)
    val v1files = fileState(dir).keySet
    VersionedSnapshot.commitAppend(spark, Seq((2L, 20L)).toDF("k", "n"), dir)
    // v2 = v1 ∪ delta, and v1's physical files are part of v2
    assert(VersionedSnapshot.readAt(spark, dir, 2).collect().toSet ==
      Set(org.apache.spark.sql.Row(1L, 10L), org.apache.spark.sql.Row(2L, 20L)))
    assert(v1files.subsetOf(fileState(dir).keySet))
    // vacuum to barrier 2: v1's manifest goes, but its files are SHARED
    // with v2 — they must survive and v2 must stay complete
    VersionedSnapshot.vacuum(spark, dir, keepFrom = 2L)
    assert(v1files.subsetOf(fileState(dir).keySet),
      "files referenced by a surviving version must not be vacuumed")
    assert(VersionedSnapshot.readAt(spark, dir, 2).count() == 2L)
    intercept[IllegalArgumentException](
      VersionedSnapshot.readAt(spark, dir, 1).collect())
  }

  test("commitBatch: one version per micro-batch, at-least-once replay is a no-op") {
    val dir = tmp()
    val v0 = VersionedSnapshot.commitBatch(spark,
      Seq((1L, "a")).toDF("k", "v"), dir, batchId = 0L)
    val v1 = VersionedSnapshot.commitBatch(spark,
      Seq((2L, "b")).toDF("k", "v"), dir, batchId = 1L)
    assert(v0 == 1L && v1 == 2L)
    assert(VersionedSnapshot.read(spark, dir).count() == 2L)
    // replay of batch 1: finds its stamped manifest, commits nothing new
    val vReplay = VersionedSnapshot.commitBatch(spark,
      Seq((2L, "b")).toDF("k", "v"), dir, batchId = 1L)
    assert(vReplay == 2L, "replay must return the existing version")
    assert(VersionedSnapshot.currentVersion(spark, dir) == 2L)
    assert(VersionedSnapshot.read(spark, dir).count() == 2L,
      "replay must not duplicate rows")
    // history intact: version 1 still reads as batch 0 alone
    assert(VersionedSnapshot.readAt(spark, dir, 1).collect().toSeq ==
      Seq(org.apache.spark.sql.Row(1L, "a")))
  }

  test("append schema drift refuses loudly; the refused snapshot is untouched") {
    val dir = tmp()
    VersionedSnapshot.commit(spark, Seq((1L, "a")).toDF("k", "v"), dir)
    // appends refuse schema drift instead of null-filling history (a
    // drifted batch's schema would be stamped over the reused v1 files)
    intercept[IllegalArgumentException](
      VersionedSnapshot.commitAppend(spark,
        Seq((2L, "b", true)).toDF("k", "v", "extra"), dir))
    intercept[IllegalArgumentException](
      VersionedSnapshot.commitBatch(spark,
        Seq((2L, "b", true)).toDF("k", "v", "extra"), dir, batchId = 5L))
    // the snapshot is untouched by both refusals
    assert(VersionedSnapshot.currentVersion(spark, dir) == 1L)
    assert(VersionedSnapshot.read(spark, dir).collect().toSeq ==
      Seq(org.apache.spark.sql.Row(1L, "a")))
    // ...and a full commit() is the sanctioned evolution path
    assert(VersionedSnapshot.commit(spark,
      Seq((2L, "b", true)).toDF("k", "v", "extra"), dir) == 2L)
    assert(VersionedSnapshot.read(spark, dir).columns.toSeq ==
      Seq("k", "v", "extra"))
  }

  test("schema pins per version; empty commit reads as an empty frame of its schema") {
    val dir = tmp()
    VersionedSnapshot.commit(spark, Seq((1L, "x")).toDF("k", "v"), dir)
    // later version evolves the schema — v1's pinned schema must not leak
    VersionedSnapshot.commit(spark,
      Seq((1L, "x", true)).toDF("k", "v", "flag"), dir)
    assert(VersionedSnapshot.readAt(spark, dir, 1).columns.toSeq == Seq("k", "v"))
    assert(VersionedSnapshot.readAt(spark, dir, 2).columns.toSeq ==
      Seq("k", "v", "flag"))
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val v3 = VersionedSnapshot.commit(spark, empty.filter(lit(false)), dir)
    val got = VersionedSnapshot.readAt(spark, dir, v3)
    assert(got.count() == 0L && got.columns.toSeq == Seq("k", "v"))
  }
}
