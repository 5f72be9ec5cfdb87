package graft.core

import scala.collection.mutable.ArrayBuffer

/** Spreadsheet beneficiary extraction — the reference's live Excel path
  * (ExcelParser.java:144-188) re-expressed over a plain cell model. POI
  * decoding is the per-row tokenizer's job at the pipeline edge (no POI
  * in this sandbox); a sheet is `Seq[Row]`, a row `Seq[Cell]`, matching
  * SURVEY.md §2.1 S5.
  */
object SheetTable {

  /** Cell with a type discriminator — only STRING cells are considered
    * (ExcelParser.java:160; FIXTURES.md e-cases).
    */
  final case class Cell(columnIndex: Int, cellType: String, value: String)
  final case class Row(cells: Seq[Cell])
  final case class Sheet(name: String, rows: Seq[Row])

  final case class Beneficiary(name: String, namePerson: String)

  // patterns — ExcelParser.java:26-36
  private val nameColumnTitle = "^наименование\\s*(компании)?$".r
  private val namePersonColumnTitle = "наименование.+фио".r
  private val dateRegex =
    ("(?i)(?<day>[1-2][0-9]|3[01]|0?[1-9])?\\.?\\s*(?<month>1[0-2]|0[1-9]|январь|февраль|март|" +
      "апрель|май|июнь|июль|август|сентябрь|октябрь|ноябрь|декабрь).\\.?\\s*(?<year>[1-2]\\d{3})").r
  private val months = Array("январь", "февраль", "март", "апрель", "май",
    "июнь", "июль", "август", "сентябрь", "октябрь", "ноябрь", "декабрь")

  /** E1+E2 — column-title discovery then row->record projection
    * (ExcelParser.java:144-188): the first STRING cell matching each
    * title pattern fixes that column; later rows emit a Beneficiary when
    * either discovered column is non-empty. Title cells themselves
    * `continue`, so the title row emits nothing.
    */
  def parseBeneficiaries(sheets: Seq[Sheet]): Seq[Beneficiary] = {
    val out = new ArrayBuffer[Beneficiary]
    for (sheet <- sheets) {
      var nameIdx: Option[Int] = None
      var personIdx: Option[Int] = None
      for (row <- sheet.rows) {
        var name: String = null
        var person: String = null
        var empty = true
        for (cell <- row.cells if cell.cellType == "STRING") {
          val v = cell.value.trim
          val lower = v.toLowerCase
          if (nameIdx.isEmpty && nameColumnTitle.findFirstIn(lower).isDefined) {
            nameIdx = Some(cell.columnIndex)
          } else if (personIdx.isEmpty &&
              namePersonColumnTitle.findFirstIn(lower).isDefined) {
            personIdx = Some(cell.columnIndex)
          } else {
            if (nameIdx.contains(cell.columnIndex)) { empty = false; name = v }
            if (personIdx.contains(cell.columnIndex)) { empty = false; person = v }
          }
        }
        if (!empty) out += Beneficiary(name, person)
      }
    }
    out.toSeq
  }

  /** X2 — sheet-name date (ExcelParser.java:190-217): optional day
    * (default 1), month by full name or number, 4-digit year.
    */
  def parseDateFromSheetName(sheetName: String): Option[java.time.LocalDate] =
    dateRegex.findFirstMatchIn(sheetName.toLowerCase).map { m =>
      val day = Option(m.group("day")).getOrElse("01")
      val month = m.group("month")
      val monthNum =
        if (month.forall(_.isDigit)) month.toInt
        else months.indexWhere(_.equalsIgnoreCase(month)) + 1
      java.time.LocalDate.of(m.group("year").toInt, monthNum, day.toInt)
    }

  /** Cell emptiness (ExcelParser.java:219-228). */
  def isEmpty(cell: Cell): Boolean = cell.cellType match {
    case "BLANK" | "ERROR" => true
    case "STRING" => cell.value.isEmpty
    case _ => false
  }
}
