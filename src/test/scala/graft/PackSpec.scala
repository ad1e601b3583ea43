package graft

import graft.ops.Pack

/** Hand-computed packing cases: start-offset rule, boundary overflow,
 * bucket independence, and the fill report. */
class PackSpec extends SparkSpec {

  private def docOf(n: Int): String = Seq.fill(n)("tok").mkString(" ")

  test("start-offset packing with overflow into the starting pack") {
    val sparkS = spark
    import sparkS.implicits._
    // one bucket (ids ≡ 0 mod 4): token counts 50, 50, 30, 100
    val docs = Seq(
      (0L, docOf(50)), (4L, docOf(50)), (8L, docOf(30)), (12L, docOf(100))
    ).toDF("doc_id", "text")
    val got = Pack.packSequences(docs, budget = 100, nBuckets = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) === ((0L, 0L)))
    assert(got(4L) === ((50L, 0L)))   // fills pack 0 exactly
    assert(got(8L) === ((100L, 1L)))  // next pack starts
    assert(got(12L) === ((130L, 1L))) // overflows pack 1 (stays in it)

    val stats = Pack.packStats(Pack.packSequences(docs, 100, 4))
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(stats((0, 0L)) === ((2L, 100L)))
    assert(stats((0, 1L)) === ((2L, 130L)))
  }

  test("null text packs as zero tokens") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq((0L, null: String), (2L, docOf(5))).toDF("doc_id", "text")
    val got = Pack.packSequences(docs, budget = 10, nBuckets = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got(0L) === 0)
    assert(got(2L) === 5)
  }

  test("buckets pack independently and deterministically") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = (0L until 40L).map(i => (i, docOf(10 + (i % 3).toInt)))
      .toDF("doc_id", "text")
    val a = Pack.packSequences(docs, budget = 25, nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(4))).sorted.toSeq
    val b = Pack.packSequences(docs.repartition(7), budget = 25, nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(4))).sorted.toSeq
    assert(a === b) // assignment independent of physical partitioning
    // every bucket restarts at pack 0
    val firstPacks = Pack.packSequences(docs, 25, 4)
      .collect().filter(_.getLong(3) == 0L).map(_.getLong(4))
    assert(firstPacks.forall(_ == 0L) && firstPacks.length === 4)
  }
}
