package graft

import java.nio.file.Paths

import graft.extract.{Labeler, ZoneModel, ZoneModelArtifact}

/**
 * Build-time trainer for the shipped zone-model artifact (the E3 trainer
 * lifecycle, `DatacatSegmenterTrainer.java:48-57`, as a reproducible build
 * step): trains the naive-Bayes stage-1 on ALL gold segmenter docs
 * (heuristic-stacked, exactly like ZoneModelSpec's split harness trains on
 * its 80%) and writes `src/main/resources/graft/zone_model/model.tsv`.
 *
 *   sbt "Test/runMain graft.TrainZoneModel"
 *
 * Lives in test scope because training reads the reference gold corpus via
 * [[Fixtures]]; held-out quality floors are asserted by ZoneModelSpec on a
 * seeded 80/20 split (the artifact itself trains on everything — the spec's
 * split model is the honest quality measurement, the artifact maximizes
 * shipped coverage).
 */
object TrainZoneModel {
  def main(args: Array[String]): Unit = {
    require(Fixtures.available, s"reference gold corpus not found at ${Fixtures.refRoot}")
    val spark = TestSpark.spark
    import spark.implicits._

    val fxs = Fixtures.segFixtureNames
      .filter(n => java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"${Fixtures.segTei}/$n.training.datacat.tei.xml")))
      .map(Fixtures.loadSeg)
    println(s"training on ${fxs.size} gold segmenter docs")

    val base = fxs.flatMap { fx =>
      fx.lines.zipWithIndex.map { case (l, i) =>
        (fx.name, i, 0, l.text, l.label.stripPrefix("I-"))
      }
    }.toDF("conv_id", "turn_idx", "line_in_turn", "line", "gold")
    val trainDf = Labeler.zonesContent(base)
      .withColumnRenamed("zone", "hint").drop("zone_label")
      .withColumnRenamed("gold", "zone")

    val model = ZoneModel.train(trainDf)
    val out = Paths.get(
      sys.props.getOrElse("graft.model.out",
        "src/main/resources/graft/zone_model/model.tsv"))
    ZoneModelArtifact.save(model, out)
    println(s"wrote ${out.toAbsolutePath} (${java.nio.file.Files.size(out)} bytes, " +
      s"${model.weights.count()} features, labels ${model.labels.mkString(",")})")
    spark.stop()
  }
}
