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

  def extract(turn: Turn): ExtractedTurn = {
    val text = if (turn.text == null) "" else turn.text
    if (text.length > maxTurnBytes) {
      ExtractedTurn(turn.conv_id, turn.turn_idx, Nil, "", Nil,
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
        ExtractedTurn(turn.conv_id, turn.turn_idx, md.documents, extracted,
          md.spans, md.version, null,
          md.documents.iterator.map(_.paragraphs.size).sum,
          extracted.getBytes("UTF-8").length.toLong)
      } catch {
        case e: Exception =>
          ExtractedTurn(turn.conv_id, turn.turn_idx, Nil, "", Nil,
            graft.BuildInfo.version,
            s"${e.getClass.getSimpleName}: ${e.getMessage}",
            0, 0L)
      }
    }
  }
}
