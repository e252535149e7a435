package graft

import org.apache.spark.sql.functions._
import graft.functions.{Coercions, Decodes}

/** Coercion + decode expression semantics (SURVEY §2.3), incl. the
  * reference's quirky digit-guard (`dags/hanger_lane.py:380-433`).
  */
class CoercionsSpec extends SparkSpec {
  import spark.implicits._

  test("digitGuardInt: digits parse; signs, decimals, garbage, null → default") {
    val df = Seq("12", "-5", "3.2", "abc", "", null).toDF("x")
      .select(Coercions.digitGuardInt(col("x")).as("v"))
    assert(df.as[Int].collect().toSeq === Seq(12, 0, 0, 0, 0, 0))
  }

  test("floatOrDefault: `float(x) or default` — null, garbage AND 0.0 → default") {
    val df = Seq("1.5", "0.0", "x", null).toDF("x")
      .select(Coercions.floatOrDefault(col("x"), -1.0).as("v"))
    assert(df.as[Double].collect().toSeq === Seq(1.5, -1.0, -1.0, -1.0))
  }

  test("strOrNull: empty string → null") {
    val df = Seq("a", "", null).toDF("x").select(Coercions.strOrNull(col("x")).as("v"))
    assert(df.as[Option[String]].collect().toSeq === Seq(Some("a"), None, None))
  }

  test("boolOrFalse") {
    val df = Seq(Some(true), Some(false), None).toDF("x")
      .select(Coercions.boolOrFalse(col("x")).as("v"))
    assert(df.as[Boolean].collect().toSeq === Seq(true, false, false))
  }

  test("floatThenInt truncates like astype(float).astype(int)") {
    val df = Seq("3.9", "-2.7").toDF("x").select(Coercions.floatThenInt(col("x")).as("v"))
    assert(df.as[Int].collect().toSeq === Seq(3, -2))
  }
}

class DecodesSpec extends SparkSpec {
  import spark.implicits._

  test("twoWay: shift decode (F1)") {
    val df = Seq(1, 2, 3).toDF("shift")
      .select(Decodes.twoWay(col("shift"), 1, "Day", "Night").as("v"))
    assert(df.as[String].collect().toSeq === Seq("Day", "Night", "Night"))
  }

  test("remap with pass-through fallback (F2)") {
    val m = Seq("Loading/Panel Segregation" -> "Loading", "Pressing" -> "Un-Loading")
    val df = Seq("Pressing", "Sewing").toDF("oc")
      .select(Decodes.remap(col("oc"), m, None).as("v"))
    assert(df.as[String].collect().toSeq === Seq("Un-Loading", "Sewing"))
  }

  test("remap with constant fallback (F5)") {
    val df = Seq("OE", "??").toDF("atp")
      .select(Decodes.remap(col("atp"), Seq("OE" -> "Owner Equity"), Some("N/A")).as("v"))
    assert(df.as[String].collect().toSeq === Seq("Owner Equity", "N/A"))
  }

  test("measureIf splits a measure by condition (F3)") {
    val df = Seq(("Loading", 5), ("Other", 7)).toDF("oc", "qty")
      .select(Decodes.measureIf(col("oc") === "Loading", col("qty")).as("v"))
    assert(df.as[Int].collect().toSeq === Seq(5, 0))
  }

  test("prefixClass: LEFT(id,2) classification (F4)") {
    val classes = Seq(Seq("50", "55") -> "Asset", Seq("60") -> "Liability")
    val df = Seq("5012", "6001", "9999").toDF("id")
      .select(Decodes.prefixClass(col("id"), 2, classes, "Other").as("v"))
    assert(df.as[String].collect().toSeq === Seq("Asset", "Liability", "Other"))
  }

  test("sign split into debit/credit (F6)") {
    val df = Seq(10.0, -4.0, 0.0).toDF("amt").select(
      Decodes.debitOf(col("amt")).as("d"), Decodes.creditOf(col("amt")).as("c"))
    assert(df.as[(Double, Double)].collect().toSeq
      === Seq((10.0, 0.0), (0.0, 4.0), (0.0, 0.0)))
  }

  test("safeDiv guards zero/null denominators (F9)") {
    val df = Seq((1.0, 4.0), (1.0, 0.0)).toDF("n", "d")
      .select(Decodes.safeDiv(col("n"), col("d")).as("v"))
    assert(df.as[Option[Double]].collect().toSeq === Seq(Some(0.25), None))
  }
}

/** URL canonicalization — the web-corpus dedup key (q96). */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(graft.functions.Url.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq

  test("case, default ports, www, fragments, trailing slash") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/Docs/1/?a=1#frag",
      "https://example.com:443/Docs/1?a=1",
      "http://example.com:8080/x/"
    ) === Seq(
      "http://example.com/Docs/1?a=1",   // scheme+host lowered, path case KEPT
      "https://example.com/Docs/1?a=1",  // :443 dropped on https only
      "http://example.com:8080/x"        // non-default port kept
    ))
  }

  test("query params: utm_* dropped, survivors sorted, bare ? dropped, empty path is /") {
    assert(canon(
      "https://a.com/p?b=2&utm_source=x&a=1",
      "https://a.com/p?utm_campaign=y",
      "https://a.com?a=1",
      "https://a.com/"
    ) === Seq(
      "https://a.com/p?a=1&b=2",
      "https://a.com/p",
      "https://a.com/?a=1",
      "https://a.com/"
    ))
  }

  test("equivalent messy URLs collapse to one canonical key") {
    val variants = Seq(
      "http://www.site.com:80/a/b/?y=2&x=1&utm_medium=m#top",
      "HTTP://SITE.com/a/b?x=1&y=2",
      "http://site.com/a/b/?utm_source=s&y=2&x=1")
    assert(canon(variants: _*).distinct.size === 1)
  }

  test("schemeless input passes through unchanged (idempotence on processed corpora)") {
    // the earlier reassembly turned these into '://example.com/p' — a second
    // canonicalization pass then split dedup keys
    val inputs = Seq("example.com/p", "www.Example.com/p?b=2&a=1", "", "not a url")
    assert(canon(inputs: _*) === inputs)
  }
}

/** DSIR hashed-bigram importance weights (q97). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-like docs score higher; short docs come back with weight 0") {
    // target style: "spark merge" bigrams; raw style: "disk scan" bigrams
    val docs = ((1L to 20L).map(i => (i, "spark merge spark merge spark merge")) ++
      (21L to 60L).map(i => (i, "disk scan disk scan disk scan")) ++
      Seq((61L, "solo"), (62L, ""))).toDF("doc_id", "text")
    val got = graft.operators.Dsir.importanceWeights(
        docs, "doc_id", "text", targetPred = col("doc_id") <= 20, buckets = 32)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got.size === 62, "every input doc must come back")
    assert(got(61L) === ((0, 0.0)) && got(62L) === ((0, 0.0)),
      "docs with < 2 tokens have no bigrams")
    val targetScore = got(1L)._2
    val rawScore = got(30L)._2
    assert(targetScore > rawScore,
      s"target-distribution docs must outscore raw-only docs ($targetScore vs $rawScore)")
    assert(targetScore > 0 && rawScore < 0,
      "log-ratio sign separates target-like from raw-only text")
  }

  test("weights are deterministic across repartitionings") {
    val docs = Tables.documents(spark, sf).limit(100)
    val a = graft.operators.Dsir.importanceWeights(
      docs, "doc_id", "text", col("doc_id") % 10 === 0).collect().toSet
    val b = graft.operators.Dsir.importanceWeights(
      docs.repartition(13), "doc_id", "text", col("doc_id") % 10 === 0).collect().toSet
    assert(a === b)
  }
}
