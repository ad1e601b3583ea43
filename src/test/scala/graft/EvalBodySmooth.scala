package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.extract.{Features, Labeler, Structure, ZoneModel}

/** Experiment: does score smoothing (±k line log-score averaging) push the
 * trained body line model past the FSM hint on the held-out docs?
 * Run: sbt "Test/runMain graft.EvalBodySmooth" */
object EvalBodySmooth {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sparkS = spark
    import sparkS.implicits._
    require(Fixtures.available, "reference fixtures not mounted")

    val fxs = Fixtures.bodyFixtureNames.map(Fixtures.loadBody)
    val turns = fxs.map(fx => (fx.name, 0, "user", fx.sourceText, null: String,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val feats = Features.body(Structure.tokens(turns))
      .select("conv_id", "turn_idx", "line_in_turn", "tok_idx",
        "tok", "sep_before", "line_trailing", "f_capitalisation")
    val pred = Labeler.bodyLabels(feats)
      .withColumn("unit_idx", row_number().over(Window.partitionBy("conv_id")
        .orderBy("turn_idx", "line_in_turn", "tok_idx")).cast("long") - 1)
      .select("conv_id", "line_in_turn", "unit_idx", "label")
      .collect()
    val gold = fxs.flatMap(fx => fx.goldLabels.zipWithIndex.map {
      case (l, i) => (fx.name, i.toLong) -> l.stripPrefix("I-")
    }).toMap
    def base(l: String) = l.stripPrefix("I-")
    val byLine = pred.groupBy(r => (r.getString(0), r.getInt(1))).map {
      case ((conv, line), rows) =>
        def majority(xs: Seq[String]) = xs.groupBy(identity).maxBy(_._2.size)._1
        val g = majority(rows.toSeq.map(r => gold((conv, r.getLong(2)))))
        val h = majority(rows.toSeq.map(r => base(r.getString(3))))
        (conv, line, g, h)
    }.toSeq
    val srcLines = fxs.map(fx => fx.name -> fx.sourceText.split("\n", -1)).toMap
    val lineDf = byLine.map { case (conv, line, g, h) =>
      (conv, 0, line, srcLines(conv)(line), g, h)
    }.toDF("conv_id", "turn_idx", "line_in_turn", "line", "zone", "hint")

    // 4 rotated splits: every 4th doc held out, offset 0..3
    val names = fxs.map(_.name).sorted
    for (off <- 0 to 3) {
      val evalDocs = names.zipWithIndex.collect {
        case (n, i) if i % 4 == off => n }.toSet
      val train = lineDf.where(!col("conv_id").isin(evalDocs.toSeq: _*))
      val eval_ = lineDf.where(col("conv_id").isin(evalDocs.toSeq: _*))
      val model = ZoneModel.train(train)
      val res = (0 to 3).map { sm =>
        val out = ZoneModel.apply(eval_, model, smooth = sm)
          .select("zone", "hint", "zone_pred")
          .as[(String, String, String)].collect()
        val n = out.length
        (sm, out.count(p => p._1 == p._3).toDouble / n,
          out.count(p => p._1 == p._2).toDouble / n)
      }
      val hintAcc = res.head._3
      println(f"[sm] split=$off hint=${hintAcc * 100}%.2f%% " +
        res.map(r => f"s${r._1}=${r._2 * 100}%.2f%%").mkString(" "))
    }
    spark.stop()
  }
}
