package graft.functions

/** Engine-portable integer hash primitives — every function here is pure
  * int64 arithmetic (no overflow past 2^62, no engine-specific intrinsics),
  * so an external SQL oracle can replicate results bit-for-bit. They back
  * the MinHash / SimHash / sign-LSH operators whose driver oracles rebuild
  * the same pipelines in DuckDB (see TextQueries / SimilarityQueries).
  *
  * Two mixers with different contracts:
  *   - [[mix2]] is AFFINE mod 2^31 (an LCG composition): a fine uniform
  *     sampler / pseudo-random ORDER (it is a bijection of the key space —
  *     used for centroid/codebook sampling and stratified splits), but its
  *     low bits carry periodic structure, so never use it to derive ±1
  *     signs or bucket bits from CONSECUTIVE inputs.
  *   - [[mixp]] is non-affine (xorshift-multiply, the classic 32-bit
  *     avalanche shape restricted to 31 bits so products stay < 2^58):
  *     safe for sign/bit derivation from sequential indices — measured on
  *     the LSH plane grid, affine signs collapsed recall to 0.22 while
  *     mixp signs match gaussian-plane recall.
  */
object PortableHash {

  /** Modulus for the polynomial string hashes (fits products in int64). */
  val PolyMod = 1000000007L

  /** Scalar twin of `Packing.mix2` (same constants, same result). */
  def mix2(x: Long): Long = {
    val m = 2147483648L
    val h1 = (java.lang.Math.floorMod(x, m) * 1664525L + 1013904223L) % m
    (h1 * 1103515245L + 12345L) % m
  }

  /** Non-affine 31-bit mixer: xorshift-multiply rounds, result in
    * [0, 2^31). DuckDB twin: `xor(h, h >> k)` + `(h * 73244475) %
    * 2147483648` chains. */
  def mixp(x: Long): Long = {
    var h = x & 0x7FFFFFFFL
    h ^= h >>> 16; h = (h * 73244475L) & 0x7FFFFFFFL
    h ^= h >>> 13; h = (h * 73244475L) & 0x7FFFFFFFL
    h ^= h >>> 16
    h
  }

  /** SQL-expression twin of [[poly]] over the string bound to `v` — the ONE
    * Spark-side definition every poly-hashing operator (winnowing k-grams,
    * CDC chunk boundaries, count-min rows) compiles from, so they cannot
    * drift from each other or from the DuckDB `list_reduce` twin. */
  def polySql(v: String, base: Long = 31L): String =
    s"aggregate(sequence(1, length($v)), 0L, " +
      s"(acc, i) -> (acc * $base + ascii(substring($v, i, 1))) % $PolyMod)"

  /** Polynomial rolling hash mod [[PolyMod]] — the same recurrence the
    * winnowing fingerprints use Spark-side (`(acc*base + codepoint) % p`),
    * which DuckDB replicates with `list_reduce` over `ascii(substr(...))`.
    *
    * Iterates CODEPOINTS, not UTF-16 units: [[polySql]] compiles to Spark's
    * `length`/`substring`/`ascii`, which are codepoint-based (as are
    * DuckDB's), so a char-unit fold here would make the scalar and
    * expression forms of the SAME hash disagree on any non-BMP character —
    * e.g. a count-min sketch built by the scalar (Aggregator) and probed by
    * the expression would read the wrong cell and underestimate. */
  def poly(s: String, base: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp.toLong) % PolyMod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column twin of [[mixp]] — the same three xorshift-multiply rounds as
    * a pure shift/xor/multiply expression tree (codegen'd, no UDF), so a
    * SAMPLING predicate built from it selects bit-for-bit the same rows in
    * Spark and in the DuckDB oracle's `xor(h, h >> k) * 73244475 %
    * 2147483648` chain. Input must be non-negative (the & mask truncates,
    * it does not firewall sign). */
  def mixpCol(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod, shiftright}
    val m = lit(2147483648L)
    val h0 = x.bitwiseAND(lit(0x7FFFFFFFL))
    val h1 = pmod(h0.bitwiseXOR(shiftright(h0, 16)) * lit(73244475L), m)
    val h2 = pmod(h1.bitwiseXOR(shiftright(h1, 13)) * lit(73244475L), m)
    h2.bitwiseXOR(shiftright(h2, 16))
  }

  /** 60-bit token hash: four independent polynomial hashes (bases 31, 131,
    * 137, 139), 15 bits each — 60 bits keeps every intermediate positive
    * and < 2^62 in both engines (packing 4×16 bits overflows signed int64
    * in the top chunk). */
  def tokenHash60(t: String): Long =
    ((poly(t, 31L) % 32768L) << 45) |
      ((poly(t, 131L) % 32768L) << 30) |
      ((poly(t, 137L) % 32768L) << 15) |
      (poly(t, 139L) % 32768L)
}
