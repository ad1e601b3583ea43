package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/**
 * Positive-path dedup tests with PLANTED duplicate texts (the driver
 * oracles run on a corpus whose near-dup count may be trivially small).
 */
class DedupSpec extends SparkSpec {

  // base docs + near-duplicates (one word changed) + one exact duplicate
  private def docs() = {
    val sparkS = spark
    import sparkS.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank " +
      "while the miller grinds his grain and the baker bakes his bread every morning"
    val variant = base.replace("every morning", "each evening")
    val other = "completely different text about spark catalyst optimizer rules " +
      "and distributed shuffle exchanges across executor boundaries in large clusters"
    Seq(
      (0L, base), (1L, base), (2L, variant),
      (3L, other),
      (4L, "short unrelated note"),
      (5L, other + " with an extra trailing sentence appended here")
    ).toDF("doc_id", "text")
  }

  test("exact dedup marks byte-identical docs as duplicates of the keeper") {
    val rows = Dedup.exact(docs()).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("keeper_id"), r.getAs[Boolean]("is_dup"))).toMap
    assert(rows(0L) == (0L, false))
    assert(rows(1L) == (0L, true), s"doc 1 must be a dup of 0: ${rows(1L)}")
    assert(!rows(2L)._2 && !rows(3L)._2)
  }

  test("minhash LSH surfaces the planted near-dup pair; jaccard confirms") {
    val d = docs()
    val pairs = Dedup.minhashCandidates(d, k = 16, rowsPerBand = 4)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)), s"exact pair missed: $got")
    assert(got.contains((0L, 2L)) || got.contains((1L, 2L)),
      s"near-dup pair missed: $got")
    val j = Dedup.jaccard(d, pairs).collect()
      .map(r => ((r.getAs[Long]("a"), r.getAs[Long]("b")), r.getAs[Double]("jaccard"))).toMap
    assert(j((0L, 1L)) == 1.0)
    j.get((0L, 2L)).foreach(v => assert(v > 0.6 && v < 1.0))
  }

  test("simhash of near-identical docs differs in few bits") {
    val sh = Dedup.simhash16(docs()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("simhash")).toMap
    assert(sh(0L) == sh(1L))
    val hamming = Integer.bitCount(sh(0L) ^ sh(2L))
    assert(hamming <= 4, s"near-dup simhash hamming distance too large: $hamming")
  }

  test("keepCanonical keeps one doc per planted duplicate cluster") {
    val d = docs()
    val kept = Dedup.keepCanonical(d, Dedup.minhashStarEdges(d, k = 16, rowsPerBand = 4))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(1L),
      s"canonical selection wrong: $kept")
    assert(kept.contains(3L) && kept.contains(4L))
  }

  test("star edges are identical in connectivity to all-pairs candidates") {
    val d = docs()
    val viaStar = Dedup.components(Dedup.minhashStarEdges(d, k = 16, rowsPerBand = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPairs = Dedup.components(Dedup.minhashCandidates(d, k = 16, rowsPerBand = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStar == viaPairs, s"star=$viaStar pairs=$viaPairs")
  }

  test("verifiedEdges rejects an LSH false-positive collision; both docs " +
      "survive canonicalization") {
    val sparkS = spark
    import sparkS.implicits._
    // 12 six-word docs sharing ONE 5-gram ("lot number one hundred fifty")
    // but otherwise unique: pairwise jaccard = 1/3 < tau. With
    // rowsPerBand=1 each band is a single minhash — for any seed where the
    // shared shingle is BOTH docs' argmin the pair collides (p=1/4 per
    // seed per pair, 8 seeds × 66 pairs ⇒ collisions certain), which is
    // exactly the LSH false-positive regime the verification must reject.
    val common = "lot number one hundred fifty"
    val uniq = Seq("aardvark", "bramble", "cormorant", "dirigible", "eggshell",
      "fulcrum", "gossamer", "hinterland", "isotope", "juggernaut",
      "kumquat", "lodestone")
    val d = uniq.zipWithIndex.map { case (u, i) => (i.toLong, s"$common $u") }
      .toDF("doc_id", "text")
    val raw = Dedup.minhashCandidates(d, k = 8, rowsPerBand = 1)
    assert(raw.count() > 0, "test precondition: LSH must produce false positives")
    val verified = Dedup.verifiedEdges(d, k = 8, rowsPerBand = 1, tau = 0.5)
    assert(verified.isEmpty,
      s"jaccard=1/3 candidates must be rejected at tau=0.5: ${verified.collect().mkString(",")}")
    val kept = Dedup.keepCanonical(d, verified).count()
    assert(kept == 12, s"no document may be dropped on an unverified collision, kept=$kept")
    // and true duplicates still pass verification end-to-end
    val withDup = d.union(Seq((100L, s"$common aardvark")).toDF("doc_id", "text"))
    val v2 = Dedup.verifiedEdges(withDup, k = 8, rowsPerBand = 1, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v2 == Set((0L, 100L)), s"the exact duplicate must survive verification: $v2")
  }

  test("a 10^4-duplicate cluster emits O(d) star edges, not O(d^2) pairs") {
    val sparkS = spark
    import sparkS.implicits._
    val dup = "identical boilerplate footer text repeated across the whole " +
      "crawl with the same words in the same order every single time"
    val dN = 10000
    val big = spark.range(dN).select(col("id").as("doc_id"), lit(dup).as("text"))
      .union(Seq((dN.toLong, "one unrelated document to keep the corpus honest"))
        .toDF("doc_id", "text"))
    val edges = Dedup.minhashStarEdges(big, k = 8, rowsPerBand = 4)
    // d-1 edges per bucket-cluster, all anchored at the minimum id — linear,
    // where the all-pairs self-join would emit ~5*10^7 rows
    assert(edges.count() == dN - 1)
    assert(edges.agg(min("a"), max("a")).collect().head.toSeq == Seq(0L, 0L))
    val clusters = Dedup.components(edges).where(col("cluster_id") === 0).count()
    assert(clusters == dN)
  }

  test("lshPlan picks the S-curve banding closest to the target threshold") {
    // k=16: thresholds are (1/16)=0.0625, (1/8)^(1/2)=0.3536,
    // (1/4)^(1/4)=0.7071, (1/2)^(1/8)=0.9170, 1.0
    assert(Dedup.lshPlan(16, 0.5).rowsPerBand === 2)   // 0.3536 nearest
    assert(Dedup.lshPlan(16, 0.7).rowsPerBand === 4)   // 0.7071 nearest
    assert(Dedup.lshPlan(16, 0.9).rowsPerBand === 8)   // 0.9170 nearest
    val p = Dedup.lshPlan(8, 0.9)                      // (1/2)^(1/4)=0.8409
    assert(p.rowsPerBand === 4 && p.bands === 2)
    assert(math.abs(p.pAtTau - (1 - math.pow(1 - math.pow(0.9, 4), 2))) < 1e-12)
    intercept[IllegalArgumentException](Dedup.lshPlan(16, 1.0))
  }
}
