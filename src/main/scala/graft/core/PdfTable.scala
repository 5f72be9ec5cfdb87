package graft.core

import scala.collection.mutable.ArrayBuffer

/** PDF ruled-table reconstruction from vector geometry — the reference's
  * stakeholder-PDF kernel (PdfParser.java) re-expressed as pure functions
  * over per-page geometry. No PDF decoding here: the Spark pipeline feeds
  * `(pageText, glyph lines, filled rectangles)` per page (the reference
  * extracts those with PDFBox — PdfTextPositionStripper.java:55-75,
  * LineCatcher.java:100-135; this sandbox has no PDF lib, so the decode
  * step is a documented stub and the geometry logic is tested with
  * synthetic fixtures per FIXTURES.md p01-p08).
  */
object PdfTable {

  final case class Rect(x: Float, y: Float, w: Float, h: Float) {
    def maxX: Float = x + w
    def maxY: Float = y + h
  }
  final case class Glyph(x: Float, y: Float, text: String)
  /** One text line: glyphs with text-matrix positions. */
  final case class GlyphLine(glyphs: Seq[Glyph])
  /** One PDF page: full text + positioned lines + filled-path rects. */
  final case class Page(text: String, lines: Seq[GlyphLine], rects: Seq[Rect])

  final case class Reason(var text: String = null,
                          var date: java.time.LocalDate = null)
  final case class Stakeholder(
      var name: String = null,
      reasons: ArrayBuffer[Reason] = new ArrayBuffer[Reason],
      var share: BigDecimal = null)

  // constants — PdfParser.java:33-42
  private val maxLineThickness = 10f
  private val maxDiff = 1.0f
  val startPagePattern = "Состав аффилированных лиц"
  val endPagePattern = "Изменения, произошедшие в списке аффилированных лиц"
  private val nameColumnPattern = "Полное фирменное наименование"
  private val reasonColumnPattern = "Основание"
  private val reasonDateColumnPattern = "Дата наступления основания"
  private val shareColumnPattern = "Доля участия"
  private val datePattern =
    "(0[1-9]|[12][0-9]|3[01])\\.(0[1-9]|1[012])\\.((19|2[0-9])[0-9]{2})".r
  private val numberPattern = "[0-9]+([,.][0-9]*)?".r

  /** P2 — orientation split (PdfParser.java:183-193). A rect thinner than
    * the threshold on both axes lands in both lists, like the reference.
    */
  def splitOrientation(rects: Seq[Rect]): (Seq[Rect], Seq[Rect]) = {
    val horizontals = rects.filter(_.h < maxLineThickness)
    val verticals = rects.filter(_.w < maxLineThickness)
    (horizontals, verticals)
  }

  /** P3 — collinear concatenation, horizontal variant
    * (PdfParser.java:248-266): sort by x; for each rect not already
    * covered by an emitted long line, greedily extend right while the
    * next segment starts within `maxDiff` of the current end.
    */
  def concatenateHorizontals(input: Seq[Rect]): Seq[Rect] = {
    val tmp = input.sortBy(_.x)
    val result = new ArrayBuffer[Rect]
    for (rect <- tmp) {
      if (!isAlreadyIncluded(rect, result)) {
        var line = rect
        for (candidate <- tmp) {
          if (math.abs(candidate.y - line.y) < maxDiff &&
              math.abs(candidate.x - (line.x + line.w)) < maxDiff) {
            line = line.copy(w = candidate.x + candidate.w - line.x)
          }
        }
        result += line
      }
    }
    result.toSeq
  }

  /** P3 — vertical variant (PdfParser.java:228-246). */
  def concatenateVerticals(input: Seq[Rect]): Seq[Rect] = {
    val tmp = input.sortBy(_.y)
    val result = new ArrayBuffer[Rect]
    for (rect <- tmp) {
      if (!isAlreadyIncluded(rect, result)) {
        var line = rect
        for (candidate <- tmp) {
          if (math.abs(candidate.x - line.x) < maxDiff &&
              math.abs(candidate.y - (line.y + line.h)) < maxDiff) {
            line = line.copy(h = candidate.y + candidate.h - line.y)
          }
        }
        result += line
      }
    }
    result.toSeq
  }

  /** Containment dedupe (PdfParser.java:268-280). */
  private def isAlreadyIncluded(shortLine: Rect,
                                longLines: collection.Seq[Rect]): Boolean =
    longLines.exists { longLine =>
      (math.abs(longLine.x - shortLine.x) < maxDiff &&
        longLine.y <= shortLine.y && longLine.maxY >= shortLine.y) ||
      (math.abs(longLine.y - shortLine.y) < maxDiff &&
        longLine.x <= shortLine.x && longLine.maxX >= shortLine.x)
    }

  /** P4 — grid selection (PdfParser.java:194-201): horizontals >= 90% of
    * page width; verticals >= 90% of the tallest; sort verticals by x,
    * horizontals by y descending (page-top first in PDF user space).
    */
  def selectGrid(horizontals: Seq[Rect], verticals: Seq[Rect],
                 pageWidth: Float): (Seq[Rect], Seq[Rect]) = {
    val h1 = concatenateHorizontals(horizontals)
      .filter(_.w >= pageWidth * 0.9f)
    val v0 = concatenateVerticals(verticals)
    val maxH = if (v0.isEmpty) 0f else v0.map(_.h).max
    val v1 = v0.filter(_.h * 1.0 >= maxH * 0.9).sortBy(_.x)
    (h1.sortBy(-_.y), v1)
  }

  /** P5 — border synthesis (PdfParser.java:282-306): if the grid lacks a
    * top/bottom horizontal within 10pt of the verticals' average extent,
    * synthesize one across the horizontals' average x-range.
    */
  def addBorderLines(horizontals: Seq[Rect], verticals: Seq[Rect]): Seq[Rect] = {
    if (horizontals.isEmpty || verticals.isEmpty) return horizontals
    val avgMinY = verticals.map(_.y).sum / verticals.size
    val avgMaxY = verticals.map(_.maxY).sum / verticals.size
    val avgMinX = horizontals.map(_.x).sum / horizontals.size
    val avgMaxX = horizontals.map(_.maxX).sum / horizontals.size
    var result = horizontals
    if (math.abs(avgMinY - result.last.y) > 10) {
      result = result :+ Rect(avgMinX, avgMinY, avgMaxX - avgMinX, 1.0f)
    }
    if (math.abs(avgMaxY - result.head.y) > 10) {
      result = Rect(avgMinX, avgMaxY, avgMaxX - avgMinX, 1.0f) +: result
    }
    result
  }

  /** P6 — cell assignment (PdfParser.java:204-225): for each grid cell,
    * concatenate the glyphs whose text-matrix position falls inside it,
    * line by line (an in-row glyph x cell interval join).
    */
  def tableFromGrid(lines: Seq[GlyphLine], horizontals: Seq[Rect],
                    verticals: Seq[Rect]): Array[Array[String]] = {
    if (horizontals.size < 2 || verticals.size < 2) {
      return Array.empty
    }
    val table = Array.fill(horizontals.size - 1, verticals.size - 1)("")
    for (row <- 0 until horizontals.size - 1;
         column <- 0 until verticals.size - 1) {
      val yLo = horizontals(row + 1).y
      val yHi = horizontals(row).y
      val xLo = verticals(column).x
      val xHi = verticals(column + 1).x
      for (line <- lines) {
        val sb = new java.lang.StringBuilder
        for (g <- line.glyphs) {
          if (g.y >= yLo && g.y <= yHi && g.x >= xLo && g.x <= xHi) {
            sb.append(g.text)
          }
        }
        if (sb.length > 0) table(row)(column) += sb.toString
      }
    }
    table
  }

  /** Full per-page grid reconstruction (PdfParser.java:171-226). */
  def tableFromPage(page: Page, pageWidth: Float): Array[Array[String]] = {
    val (h0, v0) = splitOrientation(page.rects)
    val (h1, v1) = selectGrid(h0, v0, pageWidth)
    val h2 = addBorderLines(h1, v1)
    tableFromGrid(page.lines, h2, v1)
  }

  /** X6 — reason splitter (PdfParser.java:308-317): split on `\d\.`;
    * if that yields <= 1 part, split on `\.`; empties dropped.
    */
  def splitReason(cellText: String): Seq[String] = {
    val first = cellText.split("\\d\\.").toSeq.filter(_.nonEmpty)
    if (first.size > 1) first
    else cellText.split("\\.").toSeq.filter(_.nonEmpty)
  }

  /** X3 — strict dotted dates, every match (PdfParser.java:319-326). */
  def splitDates(cellText: String): Seq[String] =
    datePattern.findAllIn(cellText).toSeq

  /** X4 — first decimal number, comma normalized (PdfParser.java:165-168). */
  def parseShare(cellText: String): Option[BigDecimal] =
    numberPattern.findFirstIn(cellText)
      .map(s => BigDecimal(s.replace(",", ".")))

  /** P7/P8 — the multi-page fold: page-range gate, header-column
    * discovery (the row AFTER the row containing a header title is
    * skipped — the reference sets skipRow while processing row r and
    * tests it at the top of row r+1, PdfParser.java:89-117), held-back
    * last row stitched into the next page's first row iff that row's
    * first cell is blank and widths match (:75-88,:124-131).
    */
  def parseStakeholderPages(pages: Seq[Page], pageWidth: Float): Seq[Stakeholder] = {
    val result = new ArrayBuffer[Stakeholder]
    var lastRowFromPreviousPage: Array[String] = null
    var nameIdx, reasonIdx, reasonDateIdx, shareIdx = -1
    var tableFound = false
    var stopped = false

    def emit(row: Array[String]): Unit = {
      val st = Stakeholder()
      for (c <- row.indices) {
        processCell(nameIdx, reasonIdx, reasonDateIdx, shareIdx, st, c, row)
      }
      result += st
    }

    for (page <- pages if !stopped) {
      if (page.text.contains(endPagePattern)) {
        stopped = true
      } else {
        if (page.text.contains(startPagePattern)) tableFound = true
        if (tableFound) {
          val table = tableFromPage(page, pageWidth)
          if (table.nonEmpty) {
            if (lastRowFromPreviousPage != null) {
              if (table(0)(0).trim.isEmpty &&
                  table(0).length == lastRowFromPreviousPage.length) {
                for (c <- lastRowFromPreviousPage.indices) {
                  table(0)(c) = lastRowFromPreviousPage(c) + table(0)(c)
                }
              } else {
                emit(lastRowFromPreviousPage)
              }
            }
            var skipRow = false
            for (r <- 0 until table.length - 1) {
              val row = table(r)
              if (skipRow) {
                skipRow = false
              } else {
                val st = Stakeholder()
                for (column <- row.indices) {
                  val cellText = row(column)
                  if (nameIdx < 0 && cellText.contains(nameColumnPattern)) {
                    nameIdx = column; skipRow = true
                  } else if (reasonIdx < 0 &&
                      cellText.contains(reasonColumnPattern)) {
                    reasonIdx = column; skipRow = true
                  } else if (reasonDateIdx < 0 &&
                      cellText.contains(reasonDateColumnPattern)) {
                    reasonDateIdx = column; skipRow = true
                  } else if (shareIdx < 0 &&
                      cellText.contains(shareColumnPattern)) {
                    shareIdx = column; skipRow = true
                  } else {
                    processCell(nameIdx, reasonIdx, reasonDateIdx, shareIdx,
                      st, column, row)
                  }
                }
                if (st.name != null) result += st
              }
            }
            lastRowFromPreviousPage = table(table.length - 1)
          }
        }
      }
    }
    if (lastRowFromPreviousPage != null) emit(lastRowFromPreviousPage)
    result.toSeq
  }

  /** ~ processCell (PdfParser.java:137-169). The reference indexes
    * reasons by the other column's split size and can throw out of
    * bounds when the lists disagree (:150-152); we clamp to the shorter
    * length — the only deliberate divergence (a crash is not a behavior
    * to preserve at 10^12 rows).
    */
  def processCell(nameIdx: Int, reasonIdx: Int, reasonDateIdx: Int,
                  shareIdx: Int, st: Stakeholder, column: Int,
                  row: Array[String]): Unit = {
    val cellText = row(column)
    if (column == nameIdx) st.name = cellText.trim
    if (column == reasonIdx) {
      val split = splitReason(cellText)
      while (st.reasons.size < split.size) st.reasons += Reason()
      for (r <- 0 until math.min(st.reasons.size, split.size)) {
        st.reasons(r).text = split(r)
      }
    }
    if (column == reasonDateIdx) {
      val split = splitDates(cellText)
      while (st.reasons.size < split.size) st.reasons += Reason()
      val dtf = java.time.format.DateTimeFormatter.ofPattern("dd.MM.yyyy")
      for (r <- split.indices) {
        st.reasons(r).date = java.time.LocalDate.parse(split(r), dtf)
      }
    }
    if (column == shareIdx) {
      parseShare(cellText).foreach(v => st.share = v)
    }
  }
}
