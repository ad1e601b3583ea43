package graft.extract

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Turn

/**
 * Deterministic synthetic transcript generator (seeded, splittable): the
 * per-conversation RNG is derived from (seed, conv_id) so generation is
 * order- and partitioning-independent — the same conv always has the same
 * turns no matter the parallelism. Content is catalogue-shaped (titles,
 * numbered lot entries, boilerplate headers) so the labeling heuristics and
 * dedup operators have realistic structure, with a heavy-tailed conv-length
 * distribution to exercise skew handling.
 */
object Synthetic {

  private val vocab: Array[String] =
    ("bronze gravure tableau aquarelle pastel marbre monnaie médaille estampe " +
      "porcelaine faïence vase buste statuette pendule cadre signé encadré " +
      "ancien doré argent cuivre collection lot pièce grand petit rare").split(" ")

  private val titles: Array[String] =
    Array("GRAVURES, TABLEAUX", "MONNAIES ANTIQUES", "OBJETS D'ART",
      "FAÏENCES ET PORCELAINES", "DESSINS ET AQUARELLES", "BIJOUX")

  def turnsPerConv(convId: Long): Int =
    if (convId % 97 == 0) 120 else 4 + (convId % 13).toInt // heavy tail

  /** ONE conversation with `nTurns` catalogue-shaped turns — the
   * single-conversation skew benchmark input ([[graft.ChunkBench]]).
   * Same splittable per-turn RNG derivation, so generation itself is
   * parallel even though the conversation is one group. */
  def giantConv(spark: SparkSession, nTurns: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    spark.range(nTurns).map { turnIdx =>
      val rng = new java.util.Random(seed * 1000003L ^ turnIdx * 2654435761L)
      def word() = vocab(rng.nextInt(vocab.length))
      def sentence(n: Int) = (1 to n).map(_ => word()).mkString(" ")
      val sb = new StringBuilder
      if (rng.nextInt(8) == 0) sb ++= titles(rng.nextInt(titles.length))
      else {
        var lot = 1 + rng.nextInt(20)
        (1 to 2 + rng.nextInt(3)).foreach { _ =>
          if (sb.nonEmpty) sb += '\n'
          sb ++= s"$lot - ${sentence(3 + rng.nextInt(7)).capitalize}."
          lot += 1 + rng.nextInt(3)
        }
      }
      Turn("giant", turnIdx.toInt, "user", sb.toString, null,
        new Timestamp(base + turnIdx * 1000L))
    }.toDF()
  }

  /** Generate `nConvs` conversations as a Turn dataset. */
  def transcripts(spark: SparkSession, nConvs: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    spark.range(nConvs).flatMap { convId =>
      val rng = new java.util.Random(seed * 1000003L ^ convId * 2654435761L)
      def word() = vocab(rng.nextInt(vocab.length))
      def sentence(n: Int) = (1 to n).map(_ => word()).mkString(" ")
      val n = turnsPerConv(convId)
      (0 until n).map { turnIdx =>
        val role =
          if (turnIdx == 0) "system"
          else if (turnIdx % 4 == 3) "tool"
          else if (turnIdx % 2 == 1) "user" else "assistant"
        val tool = if (role == "tool") "search" else null
        val text = role match {
          case "system" =>
            s"CATALOGUE DES VENTES No ${convId % 500}\nCONDITIONS DE LA VENTE ORDINAIRES"
          case "tool" => s"resultats: ${sentence(6 + rng.nextInt(6))}"
          case _ =>
            val sb = new StringBuilder
            sb ++= titles(rng.nextInt(titles.length))
            var lot = 1 + rng.nextInt(20)
            val nLots = 2 + rng.nextInt(4)
            (1 to nLots).foreach { _ =>
              sb ++= s"\n$lot - ${sentence(3 + rng.nextInt(7)).capitalize}."
              lot += 1 + rng.nextInt(3)
            }
            if (rng.nextInt(4) == 0) sb ++= "\n\n" + sentence(8 + rng.nextInt(8))
            sb.toString
        }
        Turn(s"conv$convId", turnIdx, role, text, tool,
          new Timestamp(base + convId * 3600000L + turnIdx * 30000L))
      }
    }.toDF()
  }
}
