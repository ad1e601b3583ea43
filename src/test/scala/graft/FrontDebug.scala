package graft

import graft.extract.Labeler

/** Scratch diagnostic for front-zone misses (not a test). */
object FrontDebug {
  def main(args: Array[String]): Unit = {
    val spark = Bench.mkSpark("16")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val fxs = Fixtures.segFixtureNames
      .filter(n => java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"${Fixtures.segTei}/$n.training.datacat.tei.xml")))
      .map(Fixtures.loadSeg)
    val lines = fxs.flatMap { fx =>
      fx.lines.zipWithIndex.map { case (l, i) => (fx.name, i, 0, l.text) }
    }.toDF("conv_id", "turn_idx", "line_in_turn", "line")

    val predicted = Labeler.zonesContent(lines)
      .select("conv_id", "turn_idx", "zone")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap

    // per-doc front-miss profile
    case class D(name: String, nLines: Int, goldFront: Int, frontHit: Int,
      missTo: Map[String, Int], goldFrontFrac: Double)
    val perDoc = fxs.map { fx =>
      val gold = fx.lines.zipWithIndex.map { case (l, i) => i -> l.label.stripPrefix("I-") }
      val gf = gold.filter(_._2 == "<front>")
      val missTo = gf.map { case (i, _) => predicted((fx.name, i)) }
        .filter(_ != "<front>").groupBy(identity).map { case (k, v) => k -> v.size }
      D(fx.name, gold.size, gf.size, gf.size - missTo.values.sum, missTo,
        gf.size.toDouble / gold.size)
    }
    val totFront = perDoc.map(_.goldFront).sum
    val totMiss = perDoc.map(_.missTo.values.sum).sum
    println(s"[front] gold front lines=$totFront missed=$totMiss")
    // docs where gold front covers >60% of the doc = the known annotation-noise shape
    val noiseDocs = perDoc.filter(_.goldFrontFrac > 0.6)
    println(s"[front] noise-shaped docs (>60% of doc is gold <front>): ${noiseDocs.size}, " +
      s"their missed lines: ${noiseDocs.map(_.missTo.values.sum).sum}")
    val rest = perDoc.filterNot(_.goldFrontFrac > 0.6)
    println(s"[front] remaining docs: ${rest.size}, missed: ${rest.map(_.missTo.values.sum).sum}")
    rest.sortBy(-_.missTo.values.sum).take(12).foreach { d =>
      println(f"[front]   ${d.name}%-28s lines=${d.nLines}%5d goldFront=${d.goldFront}%4d " +
        f"hit=${d.frontHit}%4d missTo=${d.missTo.toSeq.sortBy(-_._2).mkString(",")}")
    }
    // sample missed lines from the top non-noise miss doc
    rest.sortBy(-_.missTo.values.sum).take(3).foreach { d =>
      val fx = fxs.find(_.name == d.name).get
      val gold = fx.lines.zipWithIndex
      println(s"[front] --- ${d.name} missed front lines (first 15):")
      gold.filter { case (l, i) =>
        l.label.stripPrefix("I-") == "<front>" && predicted((d.name, i)) != "<front>"
      }.take(15).foreach { case (l, i) =>
        println(f"[front]   #$i%4d pred=${predicted((d.name, i))}%-9s ${l.text.take(70)}")
      }
    }
    spark.stop()
  }
}
