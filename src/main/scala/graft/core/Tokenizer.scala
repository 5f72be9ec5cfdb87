package graft.core

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** Turn-text tokenizer: one transcript turn's `text` -> `BodyElement`
  * stream for the segmenter.
  *
  * The reference derives element attributes from POI object models; for
  * plain-text transcript turns we derive them from a small deterministic
  * line markup (FIXTURES.md §2), so every style path of the state machine
  * is reachable from a string:
  *
  *   - `**bold**`     -> bold style run
  *   - `^C ` / `^R `  -> center / right alignment (header route :904-906)
  *   - `^B `          -> paragraph style-chain bold (XOR chain :914-925)
  *   - `^P `          -> page-break-before => CanBeHeader.Must (:218)
  *   - `^D `          -> DOC (HWPF) dialect header predicate (:809-859)
  *   - `^A3 `         -> DOC fontAlignment == 3 (header route :828-832)
  *   - `^J1 ` / `^J2 `-> DOC justification 1 / 2 (header route :828-832)
  *   - `>>>> `        -> indentRatio 0.3 (> 0.25 threshold :67,:899)
  *   - `|a|b|`        -> table row (consecutive lines form one table);
  *                       `||` inside a cell separates cell paragraphs
  *   - `#N(id,lvl[,start[,template]]) ` -> numbered list item
  *   - `#B(id,lvl) ` or `#B `          -> bullet list item
  *   - `[TOC]`        -> table-of-contents field (skip route :496-499)
  *
  * HTML-looking turns are routed through [[HtmlExtract]] by the pipeline
  * before reaching this tokenizer.
  */
object Tokenizer {

  private val tableRow: Regex = "^\\|(.*)\\|$".r
  private val numList: Regex =
    "^#N\\((\\d+),(\\d+)(?:,(\\d+))?(?:,([^)]*))?\\)\\s".r
  private val bulletList: Regex = "^#B(?:\\((\\d+),(\\d+)\\))?\\s".r
  private val boldRun: Regex = "\\*\\*(.*?)\\*\\*".r

  /** Manual line splitter (handles \n and \r\n) — regex split was a top
    * allocation/CPU site at millions of turns/sec.
    */
  private def splitLines(text: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String]
    var start = 0
    var i = 0
    val n = text.length
    while (i < n) {
      if (text.charAt(i) == '\n') {
        val end = if (i > start && text.charAt(i - 1) == '\r') i - 1 else i
        out += text.substring(start, end)
        start = i + 1
      }
      i += 1
    }
    val end = if (n > start && text.charAt(n - 1) == '\r') n - 1 else n
    out += text.substring(start, end)
    out
  }

  def tokenize(text: String): Seq[BodyElement] = {
    // single-line fast path (most transcript turns): no buffers at all
    if (text.indexOf('\n') < 0 && text.indexOf('\r') < 0 &&
        !(text.length >= 2 && text.charAt(0) == '|' &&
          text.charAt(text.length - 1) == '|')) {
      return ParaElement(parseLine(text)) :: Nil
    }
    val lines = splitLines(text)
    val out = new ArrayBuffer[BodyElement]
    val pendingTable = new ArrayBuffer[Seq[Seq[Element]]]
    def flushTable(): Unit = {
      if (pendingTable.nonEmpty) {
        out += TableElement(pendingTable.toSeq)
        pendingTable.clear()
      }
    }
    for (line <- lines) {
      // cheap guard before the table regex: must start and end with '|'
      val isRow = line.length >= 2 && line.charAt(0) == '|' &&
        line.charAt(line.length - 1) == '|' &&
        tableRow.findFirstMatchIn(line).isDefined
      if (isRow) {
        val cells = splitCells(line.substring(1, line.length - 1)).map {
          cellText => cellText.split("¶", -1).toSeq.map(parseLine)
        }
        pendingTable += cells
      } else {
        flushTable()
        out += ParaElement(parseLine(line))
      }
    }
    flushTable()
    out.toSeq
  }

  /** Split a table-row interior on single `|` (cells). */
  private def splitCells(interior: String): Seq[String] =
    interior.split("\\|", -1).toSeq

  /** Parse one line's markup prefixes + bold runs into an Element. */
  def parseLine(line: String): Element = {
    var rest = line
    var align: Align = Align.Left
    var indent = 0f
    var styleBold = List.empty[Boolean]
    var cbh: Option[CanBeHeader] = None
    var listRef: Option[ListRef] = None
    var isToc = false
    var docDialect = false
    var fontAlignment = 0
    var justification = 0
    var changed = true
    while (changed) {
      changed = false
      if (rest.startsWith("^C ")) { align = Align.Center; rest = rest.drop(3); changed = true }
      else if (rest.startsWith("^R ")) { align = Align.Right; rest = rest.drop(3); changed = true }
      else if (rest.startsWith("^B ")) { styleBold = true :: styleBold; rest = rest.drop(3); changed = true }
      else if (rest.startsWith("^P ")) { cbh = Some(CanBeHeader.Must); rest = rest.drop(3); changed = true }
      else if (rest.startsWith("^D ")) { docDialect = true; rest = rest.drop(3); changed = true }
      else if (rest.startsWith("^A3 ")) { fontAlignment = 3; rest = rest.drop(4); changed = true }
      else if (rest.startsWith("^J1 ")) { justification = 1; rest = rest.drop(4); changed = true }
      else if (rest.startsWith("^J2 ")) { justification = 2; rest = rest.drop(4); changed = true }
      else if (rest.startsWith(">>>> ")) { indent = 0.3f; rest = rest.drop(5); changed = true }
      else if (rest.length > 1 && rest.charAt(0) == '#') {
        numList.findFirstMatchIn(rest) match {
          case Some(m) =>
            val lvl = m.group(2).toInt
            val start = Option(m.group(3)).map(_.toInt).getOrElse(1)
            val tpl = Option(m.group(4)).getOrElse(
              (1 to lvl + 1).map(i => s"%$i").mkString(".") + ".")
            listRef = Some(ListRef(m.group(1).toInt, lvl, "decimal", tpl, start))
            rest = rest.drop(m.end)
            changed = true
          case None =>
            bulletList.findFirstMatchIn(rest) match {
              case Some(m) =>
                val id = Option(m.group(1)).map(_.toInt).getOrElse(-1)
                val lvl = Option(m.group(2)).map(_.toInt).getOrElse(0)
                listRef = Some(ListRef(id, lvl, "bullet", "", 1))
                rest = rest.drop(m.end)
                changed = true
              case None => ()
            }
        }
      }
    }
    if (rest.indexOf('[') >= 0 && rest.contains("[TOC]")) {
      isToc = true
      rest = rest.replace("[TOC]", "")
    }
    val (plainText, runs) = parseRuns(rest)
    Element(plainText, runs, align, indent, styleBold, cbh, listRef, isToc,
      boilerplate = false, docDialect = docDialect,
      fontAlignment = fontAlignment, justification = justification)
  }

  /** `**bold**` spans -> bold runs; everything else -> unset-bold runs
    * (falling back to styleBold XOR paragraphBold, :986-992).
    */
  private def parseRuns(s: String): (String, Seq[Run]) = {
    if (s.indexOf('*') < 0) { // fast path: no bold markup
      return (s, if (s.isEmpty) Seq.empty else Run(s) :: Nil)
    }
    val runs = new ArrayBuffer[Run]
    val plain = new StringBuilder
    var last = 0
    for (m <- boldRun.findAllMatchIn(s)) {
      if (m.start > last) {
        val t = s.substring(last, m.start)
        runs += Run(t)
        plain ++= t
      }
      runs += Run(m.group(1), bold = Some(true))
      plain ++= m.group(1)
      last = m.end
    }
    if (last < s.length) {
      val t = s.substring(last)
      runs += Run(t)
      plain ++= t
    }
    if (runs.isEmpty && s.isEmpty) (s, Seq.empty)
    else (plain.toString, runs.toSeq)
  }
}
