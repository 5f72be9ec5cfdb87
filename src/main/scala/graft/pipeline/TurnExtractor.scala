package graft.pipeline

import graft.core._

/** Pure per-turn extraction: route the turn text to the right tokenizer
  * (HTML strip vs line markup), run the segmentation state machine, and
  * capture failures as an error column. One turn = one independent
  * document; no state crosses rows (SURVEY.md §2.3), which makes this
  * function safe at any parallelism and embarrassingly scalable.
  */
object TurnExtractor {

  /** Per-row input cap — the analog of the reference's zip-bomb guard
    * (ZipSecureFile.setMinInflateRatio, DocumentParser.java:72) plus its
    * declared-but-unenforced maxBodyLength (:64): we enforce a hard cap so
    * one pathological row cannot blow task memory at 10^12-turn scale.
    */
  val maxTurnBytes: Int = 10 * 1024 * 1024

  /** UTF-8 byte length without materializing the byte array (the
    * getBytes copy was a top allocation site at 10^6 turns/sec).
    */
  def utf8Length(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      n += (if (c < 0x80) 1
            else if (c < 0x800) 2
            else if (Character.isHighSurrogate(c)) { i += 1; 4 }
            else 3)
      i += 1
    }
    n
  }

  def extract(turn: Turn): ExtractedTurn =
    extract(turn.conv_id, turn.turn_idx, turn.text)

  def extract(turn: TurnLite): ExtractedTurn =
    extract(turn.conv_id, turn.turn_idx, turn.text)

  def extract(convId: String, turnIdx: Int, rawText: String): ExtractedTurn = {
    val text = if (rawText == null) "" else rawText
    if (text.length > maxTurnBytes) {
      ExtractedTurn(convId, turnIdx, Nil, "", Nil,
        graft.BuildInfo.version,
        s"input too large: ${text.length} chars > $maxTurnBytes",
        0, text.length.toLong)
    } else {
      try {
        val elements =
          if (HtmlExtract.looksLikeHtml(text)) HtmlExtract.tokenize(text)
          else Tokenizer.tokenize(text)
        val md = Segmenter.segment(elements)
        val extracted = Segmenter.extractedText(md)
        var nParas = 0
        var di = 0
        while (di < md.documents.size) {
          nParas += md.documents(di).paragraphs.size
          di += 1
        }
        ExtractedTurn(convId, turnIdx, md.documents, extracted,
          md.spans, md.version, null, nParas, utf8Length(extracted))
      } catch {
        case e: Exception =>
          ExtractedTurn(convId, turnIdx, Nil, "", Nil,
            graft.BuildInfo.version,
            s"${e.getClass.getSimpleName}: ${e.getMessage}",
            0, 0L)
      }
    }
  }
}
