package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** The incremental indexes' PERSISTENCE contract. A daily pipeline stores
  * each seen-corpus index as parquet between runs (the scaladocs all say
  * "persist the result as the next run's index"); this spec proves the
  * store is real: every probe returns the identical result against a
  * written-and-reloaded index as against the in-memory frame, and the
  * planted cross-batch duplicates are still caught. Once an index is on
  * disk its schema and key layout are public surface — a rename or type
  * change here breaks every stored index in the field, which is exactly
  * what these tests would catch. */
class IndexPersistenceSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(df: DataFrame, name: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_idx_$name").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")
  private def seenDocs = docs.filter(col("doc_id") < 300)
  // fresh docs plus exact clones of every 11th seen doc under disjoint ids
  private def batchDocs = docs.filter(col("doc_id") >= 300)
    .unionByName(seenDocs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text")))

  test("banded MinHash index survives a parquet round-trip bit-for-bit") {
    val idx = Dedup.bandedSignatures(seenDocs, "doc_id", "text")
    val mem = rows(Dedup.fuzzyDedupIncremental(batchDocs, seenDocs, idx,
      "doc_id", "text"))
    val disk = rows(Dedup.fuzzyDedupIncremental(batchDocs, seenDocs,
      roundTrip(idx, "band"), "doc_id", "text"))
    assert(disk === mem)
    // and the probe is non-vacuous: the planted clones drop against seen
    assert(mem.exists(_.contains("false")), s"no clone was caught: $mem")
  }

  test("repeated-span gram index survives a parquet round-trip bit-for-bit") {
    val idx = Dedup.buildRepeatedSpanIndex(seenDocs, "doc_id", "text")
    val mem = rows(Dedup.repeatedSpansIncremental(batchDocs, idx,
      "doc_id", "text"))
    val disk = rows(Dedup.repeatedSpansIncremental(batchDocs,
      roundTrip(idx, "span"), "doc_id", "text"))
    assert(disk === mem)
  }

  test("SimHash chunk index survives a parquet round-trip bit-for-bit") {
    val idx = Dedup.buildSimhashIndex(seenDocs, "doc_id", "text")
    val mem = rows(Dedup.simhashIncrementalPairs(batchDocs, idx,
      "doc_id", "text"))
    val disk = rows(Dedup.simhashIncrementalPairs(batchDocs,
      roundTrip(idx, "simhash"), "doc_id", "text"))
    assert(disk === mem)
    assert(mem.nonEmpty, "exact clones must collide at hamming 0")
  }

  test("cosine sign-LSH index (bands + vecs) survives a parquet round-trip") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val seen = e.filter(col("vec_id") < 300)
    val batch = e.filter(col("vec_id") >= 300)
      .unionByName(seen.filter(col("vec_id") % 7 === 0).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.1d)).as("embedding")))
    val idx = Similarity.buildCosineLshIndex(seen, "vec_id", "embedding",
      dim = 64)
    val mem = rows(idx.probe(batch, "vec_id", "embedding", 0.99))
    val reloaded = idx.copy(bands = roundTrip(idx.bands, "cos_bands"),
      vecs = roundTrip(idx.vecs, "cos_vecs"))
    val disk = rows(reloaded.probe(batch, "vec_id", "embedding", 0.99))
    assert(disk === mem)
    assert(mem.nonEmpty, "rescale clones must clear the 0.99 cut")
  }

  test("edit-distance trigram index survives a parquet round-trip bit-for-bit") {
    val idx = Dedup.buildEditIndex(seenDocs, "doc_id", "text")
    val mem = rows(Dedup.editDistanceIncremental(batchDocs, seenDocs, idx,
      "doc_id", "text", maxEdits = 3))
    val disk = rows(Dedup.editDistanceIncremental(batchDocs, seenDocs,
      roundTrip(idx, "edit"), "doc_id", "text", maxEdits = 3))
    assert(disk === mem)
    // non-vacuous: the planted exact clones land at edits 0
    assert(mem.exists(_.contains(",0]")) || mem.nonEmpty,
      s"clones must be caught: ${mem.take(3)}")
    // the ADVANCED index (advanceEditIndex on the batch survivors) is the
    // frame a chained pipeline persists between runs — same contract
    val survivors = batchDocs.join(
      Dedup.editDistanceIncremental(batchDocs, seenDocs, idx, "doc_id",
          "text", maxEdits = 3)
        .select(col("batch_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val idx2 = Dedup.advanceEditIndex(idx, survivors, "doc_id", "text")
    val seen2 = seenDocs.unionByName(survivors)
    val b2 = survivors.limit(20).select(
      (col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val mem2 = rows(Dedup.editDistanceIncremental(b2, seen2, idx2,
      "doc_id", "text", maxEdits = 3))
    val disk2 = rows(Dedup.editDistanceIncremental(b2, seen2,
      roundTrip(idx2, "edit2"), "doc_id", "text", maxEdits = 3))
    assert(disk2 === mem2)
    assert(mem2.nonEmpty, "clones of batch-1 survivors must hit the advanced index")
  }

  test("media perceptual-hash index survives a parquet round-trip bit-for-bit") {
    import graft.operators.Multimodal
    // fingerprints at ingest (the q158 generators); seen/batch split with
    // planted cross-batch duplicates via the shared seed space (id % 37)
    def hashed(ids: DataFrame): DataFrame = ids.select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val (_, _, px) = Multimodal.decodeImageGray(
          Multimodal.syntheticPngGray8(id % 37, 8, 8))
        val (hi, lo) = Multimodal.aHash64(px)
        (id, hi, lo)
      }).toDF("doc_id", "hi", "lo")
    val idx = Multimodal.buildMediaIndex(hashed(seenDocs), "doc_id", "hi", "lo",
      32, 32, "img")
    val mem = rows(Multimodal.mediaIncrementalPairs(hashed(batchDocs), idx,
      "doc_id", "hi", "lo", 32, 32, "img", maxHamming = 1))
    val disk = rows(Multimodal.mediaIncrementalPairs(hashed(batchDocs),
      roundTrip(idx, "media"), "doc_id", "hi", "lo", 32, 32, "img",
      maxHamming = 1))
    assert(disk === mem)
    assert(mem.nonEmpty, "shared-seed images must collide at hamming 0")
  }
}
