package graft.sources

import graft.text.Tok

/**
 * S4: gold-TEI training source — extracts `(token, label)` sequences from
 * annotated TEI, reproducing the SAX trainers' semantics
 * (`TEIDatacatSegmenterSaxParser.java:123-189`,
 * `TEIDatacatBodySegmentationSaxParser.java:92-148`): span tags carry the
 * label, the first unit of a span gets the `I-` prefix, `<lb/>` separates
 * lines, content outside tags is `<other>`.
 */
object TeiGold {

  private val textRe = """(?s)<text[^>]*>\n?(.*?)\n*[\t ]*</text>""".r

  def decodeEntities(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")

  private def pieces(body: String, tagRe: scala.util.matching.Regex): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var pos = 0
    tagRe.findAllMatchIn(body).foreach { m =>
      if (m.start > pos) out += (("<other>", body.substring(pos, m.start)))
      out += ((s"<${m.group(1)}>", m.group(2)))
      pos = m.end
    }
    if (pos < body.length) out += (("<other>", body.substring(pos)))
    out.result()
  }

  private val bodyTagRe = """(?s)<(entry|title|titledesc)>(.*?)</\1>""".r
  private val zoneTagRe = """(?s)<(front|body|back|annex|other)>(.*?)</\1>""".r

  /** Body model gold: one `(token, BIO label)` per delimiter token. */
  def bodyTokenLabels(tei: String): Vector[(String, String)] = {
    val body = textRe.findFirstMatchIn(tei)
      .map(_.group(1)).getOrElse(return Vector.empty)
    val segs = pieces(body, bodyTagRe).map { case (l, x) => (l, decodeEntities(x)) }
    val source = segs.map(_._2).mkString
    val starts = segs.scanLeft(0)(_ + _._2.length)
    def segOf(o: Int): Int = {
      var i = segs.size - 1; while (i > 0 && starts(i) > o) i -= 1; i
    }
    val toks = Tok.tokenize(source)
    var off = 0
    var prevSeg = -1
    toks.map { t =>
      off += t.sepBefore.length
      val si = segOf(off)
      off += t.text.length
      val lab = segs(si)._1
      val bio = if (si != prevSeg) s"I-$lab" else lab
      prevSeg = si
      (t.text, bio)
    }
  }

  /** Segmenter model gold: one `(line text, BIO zone label)` per kept line
   * (whitespace-first-token convention downstream). */
  def segmenterLineLabels(tei: String): Vector[(String, String)] = {
    val body = textRe.findFirstMatchIn(tei)
      .map(_.group(1)).getOrElse(return Vector.empty)
      .replaceAll("</?(unit|reference)>", "")
    val segs = pieces(body, zoneTagRe)
    val stripped = segs.map(_._2).mkString
    val starts = segs.scanLeft(0)(_ + _._2.length)
    def segOf(o: Int): Int = {
      var i = segs.size - 1; while (i > 0 && starts(i) > o) i -= 1; i
    }
    val lb = "<lb/>"
    val out = Vector.newBuilder[(String, String)]
    var off = 0
    var prevSeg = -1
    stripped.split(java.util.regex.Pattern.quote(lb), -1).foreach { piece =>
      val norm = decodeEntities(piece).replace("\n", " ").replace("\r", " ").trim
      if (norm.nonEmpty && !norm.contains("@IMAGE") && !norm.contains("@PAGE")) {
        val lead = piece.indexWhere(!_.isWhitespace) match { case -1 => 0; case i => i }
        val si = segOf(off + lead)
        val label = segs(si)._1
        val bio = if (si != prevSeg && label != "<other>") s"I-$label" else label
        prevSeg = si
        out += ((norm, bio))
      }
      off += piece.length + lb.length
    }
    out.result()
  }
}
