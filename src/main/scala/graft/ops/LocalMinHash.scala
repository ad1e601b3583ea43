package graft.ops

import java.math.RoundingMode

/**
 * Row-local Scala replica of the [[Dedup]] minhash/LSH/Jaccard column
 * expressions, for the STREAMING near-dedup path where signatures must be
 * computed per event inside typed operators. Every function is
 * byte-equivalent to its batch column twin (StreamingNearDupSpec pins the
 * equality against the Spark expressions on real rows):
 *
 *  - words      ≡ `TextStats.words` (lower ∘ space-trim ∘ \s+ split,
 *    empties dropped)
 *  - shingles   ≡ `Dedup.contentShingles` (distinct word n-grams; short
 *    docs contribute the whole text, ZERO-word docs contribute nothing —
 *    the cross-document candidacy contract)
 *  - minhash    ≡ `min(md5(seed:shingle))` per seed (lexicographic min of
 *    lowercase hex, exactly Spark's StringType min)
 *  - bandBuckets≡ `Dedup.lshBucketsFromWide` (md5 of the sorted
 *    `seed@minhash` parts joined by `|`)
 *  - jaccard    ≡ `Dedup.jaccard`'s `round(common/(na+nb-common), 4)`
 *    (HALF_UP, Spark's `round`)
 */
private[graft] object LocalMinHash {

  def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Spark `trim` strips ' ' only — NOT java.lang.String#trim (≤ 0x20). */
  private def sparkTrim(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  def words(text: String): Vector[String] =
    sparkTrim(if (text == null) "" else text).toLowerCase
      .split("\\s+").iterator.filter(_.nonEmpty).toVector

  /** Distinct word n-gram shingles; < n words → the whole text as one;
   * ZERO words → empty (≡ [[Dedup.contentShingles]]: no content, no
   * near-dup candidacy — an empty doc must never bucket with another). */
  def shingles(text: String, n: Int = 5): Vector[String] = {
    val ws = words(text)
    val all =
      if (ws.isEmpty) Vector.empty
      else if (ws.length < n) Vector(ws.mkString(" "))
      else ws.sliding(n).map(_.mkString(" ")).toVector
    all.distinct
  }

  /** k-seed minhash signature over the distinct shingle set; empty set →
   * empty signature (the doc emits no bands — see [[shingles]]). */
  def minhash(sh: Vector[String], k: Int): Array[String] =
    if (sh.isEmpty) Array.empty
    else Array.tabulate(k)(s => sh.iterator.map(x => md5Hex(s"$s:$x")).min)

  /** (band, bucket) pairs from a signature — `Dedup.lshBucketsFromWide`
   * bytes. */
  def bandBuckets(sig: Array[String], rowsPerBand: Int): Vector[(Int, String)] = {
    val k = sig.length
    (0 until k by rowsPerBand).zipWithIndex.map { case (s0, b) =>
      val parts = (s0 until math.min(s0 + rowsPerBand, k))
        .map(s => s"$s@${sig(s)}").sorted
      (b, md5Hex(parts.mkString("|")))
    }.toVector
  }

  /** Exact Jaccard of two distinct-shingle sets, 4dp HALF_UP. */
  def jaccard(a: Set[String], b: Set[String]): Double = {
    val common = a.count(b.contains)
    val union = a.size + b.size - common
    // exact-integer 4dp half-up on the rational common/union — the local
    // twin of Cols.ratio4dp, bit-equivalent to Dedup.jaccard's column
    if (union == 0) 0.0
    else ((common.toLong * 20000L + union) / (2L * union)) / 10000.0
  }
}
