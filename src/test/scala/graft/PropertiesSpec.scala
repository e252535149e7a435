package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties}

import graft.etl.ChangeDetect
import graft.operators.{Merge, StockLedgerRow, Valuation}

/** ScalaCheck properties (SURVEY §5 item 3): the invariants the reference
  * implicitly relies on, checked over generated inputs.
  */
object GraftProperties extends Properties("graft") {
  import org.apache.spark.sql.functions._

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side multiset equality — avoids exceptAll over self-related
    * generated lineages (Catalyst attribute-binding issue with
    * dropDuplicates-derived self-referential exceptAll plans). */
  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Boolean = {
    def ms(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).groupBy(identity).map { case (k, v) => (k, v.length) }
    ms(a) == ms(b)
  }

  private val keyGen = Gen.chooseNum(1, 30)
  private val rowGen = for {
    k <- keyGen; s <- Gen.alphaLowerStr.map(_.take(4)); v <- Gen.chooseNum(-100, 100)
  } yield (k, s, v)
  private val tableGen = Gen.listOfN(40, rowGen)

  property("merge idempotence: upsert(upsert(t,u),u) == upsert(t,u)") =
    Prop.forAll(tableGen, tableGen) { (t, u) =>
      val target = t.distinctBy(_._1).toDF("k", "s", "v")
      val updates = u.distinctBy(_._1).toDF("k", "s", "v")
      val once = Merge.upsert(target, updates, Seq("k"))
      val twice = Merge.upsert(once, updates, Seq("k"))
      sameRows(once, twice)
    }

  property("merge output keys = target keys ∪ update keys, key-unique") =
    Prop.forAll(tableGen, tableGen) { (t, u) =>
      val target = t.distinctBy(_._1).toDF("k", "s", "v")
      val updates = u.distinctBy(_._1).toDF("k", "s", "v")
      val out = Merge.upsert(target, updates, Seq("k"))
      val expected = (t.map(_._1) ++ u.map(_._1)).toSet
      val got = out.select("k").as[Int].collect()
      got.toSet == expected && got.length == got.distinct.length
    }

  property("change detect: modified ∪ inserted == changed, disjoint") =
    Prop.forAll(tableGen, tableGen) { (s, t) =>
      val source = s.distinctBy(_._1).toDF("k", "s", "v")
      val target = t.distinctBy(_._1).toDF("k", "s", "v")
      val cs = ChangeDetect.split(source, target, Seq("k"))
      val union = cs.modified.unionByName(cs.inserted)
      val modKeys = cs.modified.select("k").as[Int].collect().toSet
      val insKeys = cs.inserted.select("k").as[Int].collect().toSet
      sameRows(union, cs.changed) && modKeys.intersect(insKeys).isEmpty
    }

  private val ledgerRowGen = for {
    item <- Gen.oneOf("I1", "I2")
    wh <- Gen.oneOf("W1", "W2")
    t <- Gen.chooseNum(1, 1000)
    vt <- Gen.frequency(5 -> "Purchase Receipt", 3 -> "Delivery Note",
      1 -> "Stock Reconciliation", 1 -> "Received from Subcontractor")
    qty <- Gen.chooseNum(1, 50)
    rate <- Gen.chooseNum(1, 99)
  } yield StockLedgerRow(item, wh, new Timestamp(t * 60000L), new Timestamp(t),
    vt, if (vt == "Delivery Note") -qty.toDouble else qty.toDouble,
    qty.toDouble, rate / 4.0, rate / 4.0, qty * rate / 4.0, qty * rate / 4.0)

  property("valuation: distributed fold == sequential fold") =
    Prop.forAll(Gen.listOfN(60, ledgerRowGen)) { rows0 =>
      // unique (key, ts) so ordering is total
      val rows = rows0.groupBy(r => (r.item_code, r.warehouse, r.posting_ts))
        .map(_._2.head).toSeq
      val ds = spark.createDataset(rows)
      val dist = Valuation.revalue(ds).collect()
        .sortBy(r => (r.item_code, r.warehouse, r.posting_ts.getTime))
      val seqr = rows.groupBy(r => (r.item_code, r.warehouse)).toSeq
        .flatMap { case (_, rs) => Valuation.foldGroup(rs.iterator, Valuation.zeroState) }
        .sortBy(r => (r.item_code, r.warehouse, r.posting_ts.getTime))
      dist.toSeq == seqr
    }

  property("watermark monotonicity: incremental extraction never re-reads") =
    Prop.forAll(Gen.listOfN(30, Gen.chooseNum(1L, 1000L))) { times =>
      val df = times.zipWithIndex
        .map { case (t, i) => (i, new Timestamp(t * 1000)) }
        .toDF("id", "created_at")
      val wm = new Timestamp(times.max * 1000)
      // after advancing the watermark to the data max, a strict re-extract is empty
      graft.etl.EtlLog.incremental(df, "created_at", wm, strict = true).isEmpty
    }

  property("bucketedCumSum == single-window cumsum for arbitrary ids/values/bucket sizes") =
    Prop.forAll(
      Gen.listOfN(50, Gen.zip(Gen.chooseNum(0L, 5000L), Gen.chooseNum(1L, 100L))),
      Gen.chooseNum(1L, 500L)) { (pairs, bucketSize) =>
      val rows = pairs.distinctBy(_._1) // unique order keys → total order
      rows.isEmpty || {
        val df = rows.toDF("id", "v")
        val got = graft.operators.Packing.bucketedCumSum(
            df, col("id"), floor(col("id") / bucketSize.toDouble).cast("long"),
            col("v"), "cum")
          .select("id", "cum").as[(Long, Long)].collect().toMap
        val expected = rows.sortBy(_._1)
          .scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
          .drop(1).toMap
        got == expected
      }
    }

  property("topK aggregator == sort-take for random feeds and merge splits") =
    Prop.forAll(
      Gen.listOfN(60, Gen.zip(Gen.chooseNum(0.0, 20.0), Gen.chooseNum(0L, 1000L))),
      Gen.chooseNum(1, 8), Gen.chooseNum(0, 60)) { (pairs, k, cut) =>
      val entries = pairs.distinctBy(_._2).map { case (o, i) => graft.operators.TopK.Entry(o, i) }
      val agg = graft.operators.TopK.aggregator(k)
      val (l, r) = entries.splitAt(math.min(cut, entries.size))
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val expected = entries.sortBy(e => (-e.ord, e.id)).take(k)
      merged == expected
    }

  property("Misra-Gries guarantee holds for arbitrary token streams and splits") =
    Prop.forAll(
      Gen.listOfN(200, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")),
      Gen.chooseNum(2, 6), Gen.chooseNum(0, 200)) { (tokens, k, cut) =>
      val agg = graft.operators.Sketches.misraGries(k)
      val (l, r) = tokens.splitAt(math.min(cut, tokens.size))
      val summary = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val counts = tokens.groupBy(identity).view.mapValues(_.size.toLong)
      val threshold = tokens.size.toDouble / (k + 1)
      counts.forall { case (t, c) => c <= threshold || summary.contains(t) } &&
        summary.size <= k
    }

  property("winnowing: a shared w+k-1-word run always yields a shared fingerprint") =
    Prop.forAll(
      Gen.listOfN(6, Gen.identifier.map(_.take(6))),
      Gen.listOfN(8, Gen.identifier.map(_.take(6))),
      Gen.listOfN(8, Gen.identifier.map(_.take(6)))) { (shared, pre, post) =>
      // vacuously true when the generator produced blank words
      (shared.size != 6 || shared.exists(_.isEmpty)) || {
        val run = shared.mkString(" ")
        val df = Seq(
          (1L, (pre.filter(_.nonEmpty) :+ run).mkString(" ")),
          (2L, (run +: post.filter(_.nonEmpty)).mkString(" "))).toDF("doc_id", "text")
        val fps = graft.operators.Dedup.winnowFingerprints(df, "doc_id", "text")
          .as[(Long, Long)].collect()
        val byDoc = fps.groupBy(_._1).map { case (d, v) => d -> v.map(_._2).toSet }
        (byDoc.getOrElse(1L, Set.empty) & byDoc.getOrElse(2L, Set.empty)).nonEmpty
      }
    }

  // --- PortableHash: the integer primitives every oracle-checked hash
  // pipeline (q29/q30/q32/q54/q59) rests on ---

  property("mixp stays in [0, 2^31) and is non-constant on any input window") =
    Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { x =>
      val h = graft.functions.PortableHash.mixp(x)
      h >= 0L && h < 2147483648L &&
        (0 until 8).map(i => graft.functions.PortableHash.mixp(x + i)).distinct.length > 1
    }

  property("mixp low bit is balanced on sequential inputs (the property the affine mix2 lacks)") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L)) { start =>
      val n = 512
      val ones = (0 until n).count(i =>
        graft.functions.PortableHash.mixp(start + i) % 2L == 0L)
      // binomial(512, .5): |ones - 256| > 96 is a ~1e-17 event
      math.abs(ones - n / 2) < 96
    }

  property("poly is sensitive to transpositions and stays in [0, PolyMod)") =
    Prop.forAll(Gen.alphaNumStr.suchThat(s => s.length >= 2 && s.toSet.size >= 2)) { s =>
      val swapped = {
        val i = s.indices.find(i => i + 1 < s.length && s(i) != s(i + 1))
        i.fold(s)(i => s.updated(i, s(i + 1)).updated(i + 1, s(i)))
      }
      val h = graft.functions.PortableHash.poly(s, 31L)
      h >= 0L && h < graft.functions.PortableHash.PolyMod &&
        (swapped == s || graft.functions.PortableHash.poly(swapped, 31L) != h)
    }

  property("tokenHash60 fits in 60 bits (packing 64 would overflow the oracle's int64)") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      val h = graft.functions.PortableHash.tokenHash60(s)
      h >= 0L && h < (1L << 60)
    }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
  private val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(40).mkString(" "))

  property("cdcChunks reconstruct the tokenized document for arbitrary texts") =
    Prop.forAll(Gen.nonEmptyListOf(docGen).map(_.take(8))) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val rebuilt = graft.operators.Dedup.cdcChunks(df, "id", "text")
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).mkString(" ")).toMap
      docs.indices.forall(i =>
        rebuilt(i.toLong) == docs(i).trim.split("\\s+").mkString(" "))
    }

  property("apportion: quotas sum to total, each within 1 of its exact share") =
    Prop.forAll(
      Gen.nonEmptyMap(Gen.zip(Gen.identifier.map(_.take(6)), Gen.chooseNum(0.01, 10.0)))
        .map(_.take(8)),
      Gen.chooseNum(0, 1000)) { (w, total) =>
      val q = graft.operators.Packing.apportion(w, total)
      val wSum = w.values.sum
      q.values.sum == total && w.forall { case (k, v) =>
        math.abs(q(k) - v / wSum * total) < 1.0 + 1e-9
      }
    }

  property("slidingChunks: windows tile [0,n) exactly, sizes capped, reassembly = tokens") =
    Prop.forAll(Gen.listOfN(4, docGen),
      Gen.chooseNum(2, 12), Gen.chooseNum(1, 12)) { (docs, chunkSize, stride0) =>
      val stride = math.min(stride0, chunkSize)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val rows = graft.operators.Packing
        .slidingChunks(df, col("id"), col("text"), chunkSize, stride)
        .select("id", "chunk_idx", "start_tok", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      docs.indices.forall { i =>
        val n = docs(i).trim.split("\\s+").count(_.nonEmpty)
        val mine = rows.filter(_._1 == i.toLong).sortBy(_._2)
        val covered = mine.flatMap(r => r._3 until (r._3 + r._4)).toSet
        mine.forall(r => r._4 <= chunkSize && r._3 == r._2 * stride) &&
          covered == (0 until n).toSet &&
          mine.length == (if (n == 0) 0 else (n - 1) / stride + 1)
      }
    }

  property("vocab encode/decode round-trips every document's token sequence") =
    Prop.forAll(Gen.nonEmptyListOf(docGen).map(_.take(6))) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val vocab = graft.operators.Vocab.build(df, "text")
      val idToTok = vocab.collect().map(r => r.getLong(2) -> r.getString(0)).toMap
      val enc = graft.operators.Vocab.encode(df, "doc_id", "text", vocab)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getInt(1)).map(r => idToTok(r.getLong(2)))).toMap
      // dense ids 0..V-1, and decoding reproduces the exact token stream
      idToTok.keys.toSeq.sorted == (0L until idToTok.size.toLong) &&
        docs.indices.forall(i =>
          enc(i.toLong).toSeq == docs(i).trim.split("\\s+").filter(_.nonEmpty).toSeq)
    }

  property("count-min never underestimates for arbitrary weighted keys and merge splits") =
    Prop.forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.identifier.map(_.take(5)), Gen.chooseNum(1L, 50L))).map(_.take(20)),
      Gen.chooseNum(1, 19)) { (items, cut) =>
      val agg = graft.operators.Sketches.countMin(3, 32)
      val (a, b) = items.splitAt(math.min(cut, items.length))
      val sk = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      val truth = items.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      truth.forall { case (k, n) =>
        (0 until 3).map(r => sk(r * 32 +
          (graft.functions.PortableHash.poly(k, graft.operators.Sketches.CmsBases(r)) % 32).toInt)).min >= n
      }
    }

  property("decontamination n_shared == |distinct k-gram intersection| (brute force)") =
    Prop.forAll(Gen.listOfN(4, docGen), Gen.listOfN(2, docGen)) { (train, eval) =>
      def grams(t: String) =
        t.trim.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
      val trainDf = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val evalDf = eval.zipWithIndex.map { case (t, i) => (100L + i, t) }.toDF("id", "text")
      val got = graft.operators.Dedup.decontaminationPairs(trainDf, evalDf, "id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expected = (for {
        (t, i) <- train.zipWithIndex
        (e, j) <- eval.zipWithIndex
        // sliding(3) on a <3-token doc yields the whole doc, like shingles()
        n = (grams(t) & grams(e)).size if n > 0
      } yield (i.toLong, 100L + j) -> n.toLong).toMap
      got == expected
    }

  /** Generated messy URLs: random case, optional default/nondefault port,
    * utm and real params in random order, optional fragment + trailing
    * slash — plus SCHEMELESS variants (empty scheme → no `://`), which must
    * pass through unchanged: the idempotence property broke on them before
    * canonicalize learned to skip the scheme://host reassembly. */
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.oneOf("example.com", "Example.COM", "cdn.site.org")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/a", "/a/b", "/a/b/")
    params <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x", "utm_b=y", "id=7"))
    reversed <- Gen.oneOf(true, false)
    frag <- Gen.oneOf("", "#top", "#s1")
  } yield {
    val ordered = if (reversed) params.toList.reverse else params.toList
    val q = if (ordered.isEmpty) "" else "?" + ordered.mkString("&")
    val prefix = if (scheme.isEmpty) "" else s"$scheme://"
    s"$prefix$www$host$port$path$q$frag"
  }

  property("url canonicalization is idempotent (stable dedup keys)") =
    Prop.forAll(Gen.listOfN(30, urlGen)) { urls =>
      val df = urls.toDF("u")
        .select(graft.functions.Url.canonicalize(col("u")).as("c1"))
        .select(col("c1"), graft.functions.Url.canonicalize(col("c1")).as("c2"))
      df.filter(col("c1") =!= col("c2")).isEmpty
    }

  property("url canonicalization is invariant to param order, case, fragments, default ports") =
    Prop.forAll(Gen.oneOf("http", "HTTP"), Gen.oneOf("", "www."),
        Gen.oneOf("", ":80"), Gen.oneOf("", "#f")) { (sch, www, port, frag) =>
      val base = "http://example.com/p?a=1&b=2"
      val messy = s"$sch://${www}Example.COM$port/p?b=2&utm_x=1&a=1$frag"
      val got = Seq(messy, base).toDF("u")
        .select(graft.functions.Url.canonicalize(col("u")).as("c"))
        .as[String].collect()
      got(0) == got(1)
    }

  // hostile-ish text: unicode letters, symbols, newlines, hashes, dots
  private val hostileTextGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)), Gen.const("#"), Gen.const("..."),
    Gen.const("\n"), Gen.const("•"), Gen.const("é"), Gen.const(" "),
    Gen.const("- item"))).map(_.mkString(" ")).map(_.take(400))

  property("gopherFlags is a total function: no NaN/null flags on hostile text, word count consistent") =
    Prop.forAll(Gen.listOfN(8, hostileTextGen)) { texts =>
      val rows = texts.toDF("text")
        .select(col("text"),
          graft.functions.Text.gopherFlags(col("text")).as("g"))
        .select(col("text"), col("g.*")).collect()
      rows.forall { r =>
        val mwl = r.getAs[Double]("mean_word_len")
        val expectWords = r.getAs[String]("text").trim
          .split("\\s+").count(_.nonEmpty)
        !mwl.isNaN && r.getAs[Int]("n_words") == expectWords &&
          !(0 until r.length).exists(r.isNullAt)
      }
    }

  property("repeatedSpans accounting: cover bounded by doc, cleaned = uncovered tokens, doubling saturates") =
    Prop.forAll(Gen.listOfN(5,
        Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"))
          .map(_.take(24)))) { docs =>
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      // append every doc pasted twice — its whole body must come back covered
      val doubled = docs.zipWithIndex.collect { case (toks, i) if toks.size >= 4 =>
        (100L + i, (toks ++ toks).mkString(" "))
      }.toDF("doc_id", "text")
      val out = graft.operators.Dedup
        .repeatedSpans(df.unionByName(doubled), "doc_id", "text", minLen = 4)
        .collect()
      out.forall { r =>
        val (id, n, spans, rep, frac, cleaned) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getDouble(4), r.getString(5))
        val cleanedCount = cleaned.split("\\s+").count(_.nonEmpty)
        val bounds = rep >= 0 && rep <= n && spans <= (rep + 3) / 4 &&
          cleanedCount == n - rep && frac >= 0.0 && frac <= 1.0
        // a doubled doc (id >= 100, length >= 2*minLen) is fully covered
        val saturated = id < 100L || n < 8 || (rep == n && cleaned.isEmpty)
        bounds && saturated
      }
    }

  property("curriculumOrder: contiguous equal-population stages, in-stage permutations, any scores") =
    Prop.forAll(Gen.chooseNum(1, 8),
        Gen.listOfN(40, Gen.chooseNum(0, 300))) { (b, scores) =>
      val df = scores.zipWithIndex
        .map { case (s, i) => (i.toLong, s / 100.0) }.toDF("id", "score")
      val got = graft.operators.Packing.curriculumOrder(df, "id", "score", b)
        .select("id", "difficulty_rank", "bucket", "pos_in_bucket")
        .as[(Long, Long, Int, Int)].collect().toSeq
      val n = got.size
      val byB = got.groupBy(_._3)
      val contiguous = byB.keys.toSeq.sorted.sliding(2).forall {
        case Seq(x, y) => byB(x).map(_._2).max < byB(y).map(_._2).min
        case _ => true
      }
      got.map(_._2).sorted == (1L to n.toLong) &&
        byB.keySet == (0 until b).toSet &&
        (byB.values.map(_.size).max - byB.values.map(_.size).min) <= 1 &&
        contiguous &&
        byB.values.forall(g => g.map(_._4).sorted == (1 to g.size))
    }

  // the round-6 advisory's adversarial case: ids spanning the FULL long
  // range (negative, ≥ 2³¹, near ±2⁶³) and scores far beyond ±4.3e5 — the
  // ranges where the retired packed `round(score·1e4)·2³¹ + id` key
  // silently mis-ordered. difficulty_rank must equal a driver-side
  // ROW_NUMBER over (score, id) exactly.
  property("curriculumOrder ranks exactly by (score, id) for full-long-range ids and huge scores") =
    Prop.forAll(
        Gen.listOfN(30, Gen.zip(
          Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue),
            Gen.oneOf(Long.MinValue, -2147483649L, -1L, 0L, 2147483648L, Long.MaxValue)),
          Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.chooseNum(-500.0, 500.0))))) { rows =>
      // + 0.0 normalizes any -0.0 (Spark sorts -0.0 == 0.0; TotalOrdering
      // would not) — the operator's own score convention
      val distinctRows = rows.distinctBy(_._1).map { case (id, s) => (id, s + 0.0) }
      val df = distinctRows.toDF("id", "score")
      val got = graft.operators.Packing.curriculumOrder(df, "id", "score", 4)
        .select("id", "difficulty_rank").as[(Long, Long)].collect().toMap
      val expected = distinctRows.sortBy { case (id, s) => (s, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      got == expected
    }

  property("epochMix emits exactly floor(e) + hash-rate-hit copies for any schedule") =
    Prop.forAll(Gen.listOfN(12, Gen.choose(0L, 100000L)),
        Gen.oneOf(0.0, 0.3, 0.5, 1.0, 2.5, 3.0)) { (ids0, e) =>
      val ids = ids0.distinct
      val df = ids.map(i => (i, "s")).toDF("id", "src")
      val got = graft.operators.Packing.epochMix(df, col("id"), col("src"),
        Map("s" -> e)).count()
      // the operator's own contract, recomputed scalar-side
      val m = 2147483648L
      def mix2(id: Long): Long = {
        val h1 = ((id % m) * 1664525L + 1013904223L) % m
        (h1 * 1103515245L + 12345L) % m
      }
      val thr = math.floor((e - math.floor(e)) * m).toLong
      val expected = ids.map(i =>
        math.floor(e).toLong + (if (mix2(i) < thr) 1L else 0L)).sum
      got == expected
    }

  property("jaccard <= containment: every Jaccard pair appears in BOTH containment directions") =
    Prop.forAll(Gen.listOfN(5,
        Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))) { docs =>
      // J = |I|/|U| <= |I|/max(na,nb) <= min(c_ab, c_ba): a pair clearing a
      // Jaccard threshold must clear the same containment threshold both ways
      val df = docs.zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val t = 0.5
      val jac = graft.operators.Dedup.jaccardPairs(df, "doc_id", "text", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val cont = graft.operators.Dedup.containmentPairs(df, "doc_id", "text", t, k = 1)
        .select("id_sub", "id_super").as[(Long, Long)].collect().toSet
      jac.forall(p => cont.contains(p) && cont.contains(p.swap))
    }

  property("spanCorrupt conserves the token multiset for arbitrary token streams") =
    Prop.forAll(Gen.listOfN(6,
        Gen.listOf(Gen.alphaNumStr.map(_.take(5)).suchThat(_.nonEmpty))
          .map(_.take(40)))) { docs =>
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = graft.operators.Packing.spanCorrupt(df, col("doc_id"), col("text"))
        .join(df, "doc_id")
        .select("input", "target", "text").collect()
      val sentinel = "<extra_id_\\d+>".r
      out.forall { r =>
        def ws(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq.sorted
        val got = ws(sentinel.replaceAllIn(r.getString(0), "")) ++
          ws(sentinel.replaceAllIn(r.getString(1), ""))
        got.sorted == ws(r.getString(2))
      }
    }
}
