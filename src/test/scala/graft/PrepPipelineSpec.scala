package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text
import graft.operators.{Packing, Vocab}
import graft.sources.v2.GraftSink

/** End-to-end training-data prep: the operators compose into the pipeline a
  * real corpus run executes — tokenize → vocab-encode → pack into context
  * windows → shard → publish exactly-once — and the composition preserves
  * every invariant the stages promise individually.
  */
class PrepPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize -> encode -> pack -> shard -> exactly-once publish, invariants intact") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val nDocs = docs.count()

    // 1. vocab + encoding: every token of every doc gets an id, no OOV
    //    (the vocab was built from this same corpus)
    val vocab = Vocab.build(docs, "text")
    val enc = Vocab.encode(docs, "doc_id", "text", vocab).persist()
    assert(enc.filter(col("token_id") < 0).count() === 0, "self-vocab must cover the corpus")
    val encCounts = enc.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val direct = docs.select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_direct"))
    assert(encCounts.join(direct, "doc_id")
      .filter(col("n_tokens") =!= col("n_direct")).count() === 0,
      "encoded token count must equal the tokenizer's")

    // 2. pack the encoded docs into 512-token contexts: offsets are a
    //    permutation-free exact cover of the global token stream
    val packed = Packing.packSequences(encCounts, col("doc_id"), col("n_tokens"),
      capacity = 512L, idBucketSize = 64L)
    val totalTokens = encCounts.agg(sum("n_tokens")).as[Long].head()
    val lastEnd = packed.agg(max(col("start_tok") + col("n_tokens"))).as[Long].head()
    assert(lastEnd === totalTokens, "packed stream must cover every token exactly once")
    assert(packed.count() === nDocs)

    // 3. shard: every doc lands in exactly one shard with a dense position
    val sharded = Packing.shardAssign(packed, col("doc_id"), numShards = 8)
    assert(sharded.count() === nDocs)
    assert(sharded.select("doc_id").distinct().count() === nDocs)
    val perShard = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("maxPos"))
      .filter(col("n") =!= col("maxPos")).count()
    assert(perShard === 0, "positions must be dense 1..n within each shard")

    // 4. publish through the exactly-once sink and read back byte-equal
    val out = sharded.select(col("doc_id"), col("pack_id"), col("shard"), col("pos"))
    val dir = Files.createTempDirectory("graft-prep-publish").toString
    GraftSink.create(dir, StructType(Seq(
      StructField("doc_id", LongType), StructField("pack_id", LongType),
      StructField("shard", IntegerType), StructField("pos", IntegerType))))
    out.write.format("graft-sink").option("path", dir).mode("append").save()
    val back = GraftSink.readCommitted(spark, dir)
    assert(back.count() === nDocs)
    assert(back.exceptAll(out).isEmpty && out.exceptAll(back).isEmpty,
      "published shard table must round-trip exactly")
    enc.unpersist()
  }
}
