package graft

import org.apache.spark.sql.functions._
import graft.extract.Eval

/** Closed-form check of the eval.txt-style report algebra on a
 * hand-computed pair frame, plus the gold-corpus floors the driver pins
 * via zone_eval_floors. */
class EvalReportSpec extends SparkSpec {

  test("labelReport per-label / micro / macro / instance rows are exact") {
    val sparkS = spark
    import sparkS.implicits._
    val pairs = Seq(
      ("d1", "a", "a"), ("d1", "a", "b"), ("d1", "b", "b"),
      ("d2", "b", "b"))
      .toDF("conv_id", "gold", "pred")
    val rows = Eval.labelReport(pairs).collect()
      .map(r => r.getString(0) -> r).toMap

    val a = rows("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) == ((2L, 1L, 0L, 1L)))
    assert((a.getLong(5), a.getLong(6), a.getLong(7), a.getLong(8)) ==
      ((10000L, 5000L, 6666L, 7500L)))

    val b = rows("b")
    assert((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4)) == ((2L, 2L, 1L, 0L)))
    assert((b.getLong(5), b.getLong(6), b.getLong(7), b.getLong(8)) ==
      ((6666L, 10000L, 8000L, 7500L)))

    val mi = rows("all_micro")
    assert(Seq(5, 6, 7, 8).map(mi.getLong) == Seq(7500L, 7500L, 7500L, 7500L))

    val ma = rows("all_macro")
    assert(Seq(5, 6, 7, 8).map(ma.getLong) == Seq(8333L, 7500L, 7333L, 7500L))

    val in = rows("all_instance")
    assert((in.getLong(1), in.getLong(2)) == ((2L, 1L)))
    assert(in.getLong(6) == 5000L)
  }

  test("zone eval floors hold on the gold corpus (driver-pinned levels)") {
    assume(Fixtures.available)
    val gold = Eval.segGoldLines(spark)
    val pred = graft.extract.Labeler.zonesContent(
      gold.select("conv_id", "turn_idx", "line_in_turn", "line"))
    val pairs = pred.select(col("conv_id"), col("turn_idx"), col("zone"))
      .join(gold.select("conv_id", "turn_idx", "gold"),
        Seq("conv_id", "turn_idx"))
    val rep = Eval.labelReport(pairs, "gold", "zone").collect()
      .map(r => r.getString(0) -> r).toMap
    val acc = rep("all_micro").getLong(8)
    val ff1 = rep("<front>").getLong(7)
    val bf1 = rep("<body>").getLong(7)
    info(s"micro acc=$acc bp, front f1=$ff1 bp, body f1=$bf1 bp, " +
      s"instance recall=${rep("all_instance").getLong(6)} bp")
    assert(acc >= 9300, s"zone accuracy regressed: $acc bp")
    assert(ff1 >= 6200, s"front F1 regressed: $ff1 bp")
    assert(bf1 >= 9600, s"body F1 regressed: $bf1 bp")
  }
}
