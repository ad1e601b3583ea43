package graft.text

/**
 * Deterministic text tokenization shared by the whole engine.
 *
 * Semantics are pinned against the reference corpus of
 * DataCatalogue/grobid-datacat (read-only at /root/reference): tokenizing the
 * decoded gold TEI span text with [[delimiters]] reproduces, byte-for-byte,
 * the token column of all 14 body-segmentation raw fixture files
 * (`resources/dataset/datacat-body-segmentation/corpus/raw, glob *.text`), i.e. the
 * token stream produced by the reference's analyzer at
 * `DatacatBodySegmentationParser.java:213` (`block.getTokens()`).
 *
 * The delimiter characters are emitted as stand-alone tokens; whitespace is
 * dropped from the token stream but captured in each token's `sepBefore`
 * (the exact whitespace string between the previous token and this one),
 * which is what makes later byte-exact span re-assembly possible without a
 * re-alignment join (reference re-scan at
 * `DatacatBodySegmentationParser.java:800-831` disappears by construction).
 */
object Tok {

  /** Whitespace characters (dropped from the token stream, kept in sepBefore). */
  final val whitespace: Set[Char] = Set(' ', '\n', '\r', '\t', '\f', ' ')

  /**
   * Non-whitespace delimiter characters, each becoming its own token.
   * Empirically verified against the reference corpus (see object doc).
   * Notably NOT delimiters (observed inside multi-char fixture tokens):
   * `^ % ° ‰ & < > \ ~ _ ■`.
   */
  final val punctDelims: Set[Char] =
    "([•*,:;?.!/)-–−‐«»„”“‘’'`$]\"".toSet

  @inline def isDelim(c: Char): Boolean = whitespace(c) || punctDelims(c)

  /** One token plus the exact whitespace that preceded it in the source. */
  final case class RawTok(text: String, sepBefore: String)

  /**
   * Tokenize `text` into delimiter-separated tokens, carrying the exact
   * preceding whitespace of each token. Concatenating
   * `sepBefore + text` over all tokens plus [[trailing]] reproduces `text`.
   */
  def tokenize(text: String): Vector[RawTok] = {
    val out = Vector.newBuilder[RawTok]
    val sep = new StringBuilder
    val cur = new StringBuilder
    var i = 0
    def flushCur(): Unit = if (cur.nonEmpty) {
      out += RawTok(cur.toString, sep.toString); sep.clear(); cur.clear()
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (whitespace(c)) { flushCur(); sep.append(c) }
      else if (punctDelims(c)) {
        flushCur()
        out += RawTok(c.toString, sep.toString); sep.clear()
      } else cur.append(c)
      i += 1
    }
    flushCur()
    out.result()
  }

  /** Trailing whitespace of `text` after the last token (for byte round-trips). */
  def trailing(text: String): String = {
    var i = text.length
    while (i > 0 && whitespace(text.charAt(i - 1))) i -= 1
    text.substring(i)
  }

  /** Whitespace-only split used by the segmenter for first/second lexical
   * token of a line (reference `DatacatSegmenterParser.java:434`:
   * `new StringTokenizer(line, " \t\f ")`). */
  def whitespaceSplit(line: String): Vector[String] =
    line.split("[ \t\f ]+").toVector.filter(_.nonEmpty)
}
