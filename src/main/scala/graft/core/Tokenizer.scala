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
  private val SomeTrue: Some[Boolean] = Some(true) // avoid per-run boxing

  // the list-prefix grammars "#N(id,lvl[,start[,template]]) " and
  // "#B[(id,lvl)] " and the "**bold**" run markup are parsed with manual
  // char scans below — regex Matchers were a top allocation site on the
  // markup path; the scans implement exactly the original patterns
  // ^#N\\((\\d+),(\\d+)(?:,(\\d+))?(?:,([^)]*))?\\)\\s ,
  // ^#B(?:\\((\\d+),(\\d+)\\))?\\s  and  \\*\\*(.*?)\\*\\* (non-greedy)

  /** Default numbering template per level: "%1.", "%1.%2.", ... */
  private val defaultTemplates: Array[String] =
    Array.tabulate(12)(lvl => (1 to lvl + 1).map(i => s"%$i").mkString(".") + ".")

  private def defaultTemplate(lvl: Int): String =
    if (lvl < defaultTemplates.length) defaultTemplates(lvl)
    else (1 to lvl + 1).map(i => s"%$i").mkString(".") + "."

  private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def digitsEnd(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    i
  }

  def tokenize(text: String): Seq[BodyElement] = {
    // single-line fast path (most transcript turns): no buffers at all
    if (text.indexOf('\n') < 0 && text.indexOf('\r') < 0 &&
        !(text.length >= 2 && text.charAt(0) == '|' &&
          text.charAt(text.length - 1) == '|')) {
      return ParaElement(parseLine(text)) :: Nil
    }
    // fused line iteration (handles \n and \r\n): no intermediate line
    // buffer — each line substring feeds parseLine directly; the table
    // accumulator is lazy (most multi-line turns carry no tables)
    val out = new ArrayBuffer[BodyElement]
    var pendingTable: ArrayBuffer[Seq[Seq[Element]]] = null
    def flushTable(): Unit = {
      if (pendingTable != null && pendingTable.nonEmpty) {
        out += TableElement.ofParas(pendingTable.toSeq)
        pendingTable.clear()
      }
    }
    def handleLine(line: String): Unit = {
      // cheap guard before the table regex: must start and end with '|'
      val isRow = line.length >= 2 && line.charAt(0) == '|' &&
        line.charAt(line.length - 1) == '|' &&
        tableRow.findFirstMatchIn(line).isDefined
      if (isRow) {
        val cells = splitCells(line.substring(1, line.length - 1)).map {
          cellText => cellText.split("¶", -1).toSeq.map(parseLine)
        }
        if (pendingTable == null) {
          pendingTable = new ArrayBuffer[Seq[Seq[Element]]](4)
        }
        pendingTable += cells
      } else {
        flushTable()
        out += ParaElement(parseLine(line))
      }
    }
    var start = 0
    var i = 0
    val n = text.length
    while (i < n) {
      if (text.charAt(i) == '\n') {
        val end = if (i > start && text.charAt(i - 1) == '\r') i - 1 else i
        handleLine(text.substring(start, end))
        start = i + 1
      }
      i += 1
    }
    val end = if (n > start && text.charAt(n - 1) == '\r') n - 1 else n
    handleLine(text.substring(start, end))
    flushTable()
    out.toSeq
  }

  /** Split a table-row interior on single `|` (cells). */
  private def splitCells(interior: String): Seq[String] =
    interior.split("\\|", -1).toSeq

  /** Parse one line's markup prefixes + bold runs into an Element.
    * Offset-based: prefixes advance an index into `line` instead of
    * re-copying the remainder per prefix (`drop` was one substring copy
    * per markup prefix at millions of turns/sec).
    */
  def parseLine(line: String): Element = {
    var off = 0
    var align: Align = Align.Left
    var indent = 0f
    var styleBold = List.empty[Boolean]
    var cbh: Option[CanBeHeader] = None
    var listRef: Option[ListRef] = None
    var isToc = false
    var docDialect = false
    var fontAlignment = 0
    var justification = 0
    val n = line.length
    var changed = true
    while (changed) {
      changed = false
      if (line.startsWith("^C ", off)) { align = Align.Center; off += 3; changed = true }
      else if (line.startsWith("^R ", off)) { align = Align.Right; off += 3; changed = true }
      else if (line.startsWith("^B ", off)) { styleBold = true :: styleBold; off += 3; changed = true }
      else if (line.startsWith("^P ", off)) { cbh = Some(CanBeHeader.Must); off += 3; changed = true }
      else if (line.startsWith("^D ", off)) { docDialect = true; off += 3; changed = true }
      else if (line.startsWith("^A3 ", off)) { fontAlignment = 3; off += 4; changed = true }
      else if (line.startsWith("^J1 ", off)) { justification = 1; off += 4; changed = true }
      else if (line.startsWith("^J2 ", off)) { justification = 2; off += 4; changed = true }
      else if (line.startsWith(">>>> ", off)) { indent = 0.3f; off += 5; changed = true }
      else if (off + 1 < n && line.charAt(off) == '#') {
        // manual "#N(id,lvl[,start[,template]]) " scan (grammar in the
        // header comment; start only binds when its digits end at , or ))
        if (line.startsWith("#N(", off)) {
          val idEnd = digitsEnd(line, off + 3)
          if (idEnd > off + 3 && idEnd < n && line.charAt(idEnd) == ',') {
            val lvlEnd = digitsEnd(line, idEnd + 1)
            if (lvlEnd > idEnd + 1 && lvlEnd < n) {
              var pos = lvlEnd
              var startAt = 1
              var tpl: String = null
              var ok = true
              if (line.charAt(pos) == ',') {
                val dEnd = digitsEnd(line, pos + 1)
                if (dEnd > pos + 1 && dEnd < n &&
                    (line.charAt(dEnd) == ',' || line.charAt(dEnd) == ')')) {
                  startAt = line.substring(pos + 1, dEnd).toInt
                  pos = dEnd
                  if (pos < n && line.charAt(pos) == ',') {
                    val close = line.indexOf(')', pos + 1)
                    if (close < 0) ok = false
                    else { tpl = line.substring(pos + 1, close); pos = close }
                  }
                } else {
                  val close = line.indexOf(')', pos + 1)
                  if (close < 0) ok = false
                  else { tpl = line.substring(pos + 1, close); pos = close }
                }
              }
              if (ok && pos < n && line.charAt(pos) == ')' &&
                  pos + 1 < n && isWs(line.charAt(pos + 1))) {
                val lvl = line.substring(idEnd + 1, lvlEnd).toInt
                val template = if (tpl != null) tpl else defaultTemplate(lvl)
                listRef = Some(ListRef(line.substring(off + 3, idEnd).toInt,
                  lvl, "decimal", template, startAt))
                off = pos + 2
                changed = true
              }
            }
          }
        } else if (line.startsWith("#B", off)) {
          // manual "#B[(id,lvl)] " scan
          var pos = off + 2
          var id = -1
          var lvl = 0
          var parenOk = true
          if (pos < n && line.charAt(pos) == '(') {
            val idEnd = digitsEnd(line, pos + 1)
            parenOk = idEnd > pos + 1 && idEnd < n && line.charAt(idEnd) == ','
            if (parenOk) {
              val lvlEnd = digitsEnd(line, idEnd + 1)
              parenOk = lvlEnd > idEnd + 1 && lvlEnd < n &&
                line.charAt(lvlEnd) == ')'
              if (parenOk) {
                id = line.substring(pos + 1, idEnd).toInt
                lvl = line.substring(idEnd + 1, lvlEnd).toInt
                pos = lvlEnd + 1
              }
            }
            if (!parenOk) pos = off + 2 // optional group unmatched
          }
          if (pos < n && isWs(line.charAt(pos)) && (parenOk || pos == off + 2)) {
            listRef = Some(ListRef(id, lvl, "bullet", "", 1))
            off = pos + 1
            changed = true
          }
        }
      }
    }
    var rest = if (off == 0) line else line.substring(off)
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
    * (falling back to styleBold XOR paragraphBold, :986-992). Manual scan
    * of the non-greedy \*\*(.*?)\*\* grammar: a bold run closes at the
    * FIRST following "**"; an unmatched opener stays plain text.
    */
  private def parseRuns(s: String): (String, Seq[Run]) = {
    if (s.indexOf('*') < 0) { // fast path: no bold markup
      return (s, if (s.isEmpty) Seq.empty else Run(s) :: Nil)
    }
    val runs = new ArrayBuffer[Run](4)
    val plain = new java.lang.StringBuilder(s.length)
    var last = 0
    var i = s.indexOf("**")
    while (i >= 0) {
      val j = s.indexOf("**", i + 2)
      if (j < 0) i = -1
      else {
        if (i > last) {
          val t = s.substring(last, i)
          runs += Run(t)
          plain.append(t)
        }
        val b = s.substring(i + 2, j)
        runs += Run(b, bold = SomeTrue)
        plain.append(b)
        last = j + 2
        i = s.indexOf("**", last)
      }
    }
    if (last < s.length) {
      val t = s.substring(last)
      runs += Run(t)
      plain.append(t)
    }
    if (runs.isEmpty && s.isEmpty) (s, Seq.empty)
    else (plain.toString, runs.toSeq)
  }
}
