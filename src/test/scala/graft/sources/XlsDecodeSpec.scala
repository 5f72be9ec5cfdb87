package graft.sources

import graft.core.SheetTable
import org.scalatest.funsuite.AnyFunSuite

/** Real-decode net for the BIFF8 (.xls) tokenizer: synthesized
  * byte-stable workbooks in, the POI cell model out, beneficiary
  * extraction and sheet-name dates running unchanged on binary bytes.
  */
class XlsDecodeSpec extends AnyFunSuite {

  test("biff8 round-trip: sheets, SST strings (8-bit + UTF-16), cells") {
    val bytes = XlsSynth.xls(Seq(
      "Sheet One" -> Seq(Seq("alpha", "beta"), Seq("gamma")),
      "Лист 2" -> Seq(Seq("Кириллица", "mixed"))))
    assert(bytes.sameElements(XlsSynth.xls(Seq(
      "Sheet One" -> Seq(Seq("alpha", "beta"), Seq("gamma")),
      "Лист 2" -> Seq(Seq("Кириллица", "mixed"))))), "byte-stable")
    val sheets = XlsDecode.decodeXls(bytes)
    assert(sheets.map(_.name) == Seq("Sheet One", "Лист 2"))
    assert(sheets(0).rows.map(_.cells.map(_.value)) ==
      Seq(Seq("alpha", "beta"), Seq("gamma")))
    assert(sheets(0).rows.head.cells.head ==
      SheetTable.Cell(0, "STRING", "alpha"))
    assert(sheets(1).rows.head.cells.map(_.value) ==
      Seq("Кириллица", "mixed"))
  }

  test("q63 workbook: beneficiaries + sheet date from real .xls bytes") {
    val sheets = XlsDecode.decodeXls(OoxmlCorpus.xlsBytes(3))
    assert(sheets.map(_.name) == Seq("Выписка 15.03.2023"))
    val bens = SheetTable.parseBeneficiaries(sheets)
    assert(bens.map(b => (b.name, b.namePerson)) ==
      Seq(("ООО Фирма 3-1", "Иванов И.3"), ("АО Завод 3-2", "Петров П.3")))
    assert(SheetTable.parseDateFromSheetName(sheets.head.name)
      .contains(java.time.LocalDate.of(2023, 3, 15)))
  }

  test("RK/MulRk numeric cells: all three encodings decode to NUMERIC") {
    import XlsSynth.{SCell, RkCell}
    // 123.45 / 0.07 → fDiv100+fInt, -7.0 → fInt, 2.5 → truncated-double
    // (low 34 mantissa bits zero); runs of >=2 ride as one MulRk record.
    val bytes = XlsSynth.xlsTyped(Seq("S" -> Seq(
      Seq(SCell("hdr"), RkCell(123.45), RkCell(-7.0), RkCell(0.07)),
      Seq(RkCell(2.5)))))
    val sheets = XlsDecode.decodeXls(bytes)
    val cells = sheets.head.rows.map(_.cells.map(c => (c.cellType, c.value)))
    assert(cells == Seq(
      Seq(("STRING", "hdr"), ("NUMERIC", "123.45"), ("NUMERIC", "-7.0"),
        ("NUMERIC", "0.07")),
      Seq(("NUMERIC", "2.5"))))
  }

  test("inline Label (0x0204) cells decode as STRING exactly like " +
      "LabelSst (cp1252 and UTF-16 forms)") {
    import XlsSynth.{SCell, LCell}
    val sheets = XlsDecode.decodeXls(XlsSynth.xlsTyped(Seq("S" -> Seq(
      Seq(SCell("via sst"), LCell("inline latin"), LCell("Кириллица"))))))
    assert(sheets.head.rows.head.cells.map(c => (c.cellType, c.value)) ==
      Seq(("STRING", "via sst"), ("STRING", "inline latin"),
        ("STRING", "Кириллица")))
  }

  test("q63 numeric and formula rows are typed NUMERIC/FORMULA and " +
      "invisible to the STRING-only beneficiary scan (F9)") {
    val sheets = XlsDecode.decodeXls(OoxmlCorpus.xlsBytes(3))
    // row 2 is the type-confusion trap: a Formula record whose cached
    // String-record text ("ООО Фальшь 3") matches the name column —
    // POI parity demands FORMULA (ExcelParser.java:160 skips it), with
    // the cached text still decoded into the sheet model
    val trap = sheets.head.rows(2).cells
    assert(trap.map(c => (c.cellType, c.value)) ==
      Seq(("FORMULA", "ООО Фальшь 3")))
    val tail = sheets.head.rows.drop(4)
    assert(tail.map(_.cells.map(_.cellType)) ==
      Seq(Seq("NUMERIC", "NUMERIC", "NUMERIC"), Seq("NUMERIC")))
    // oracle invariance: beneficiaries unchanged by the typed rows —
    // a FORMULA->STRING confusion would add "ООО Фальшь 3" here
    val bens = SheetTable.parseBeneficiaries(sheets)
    assert(bens.size == 2)
    assert(!bens.exists(b => Option(b.name).exists(_.contains("Фальшь"))))
  }

  test("Continue-record SST: strings split across records (incl. " +
      "mid-string UTF-16 splits) decode identically to one-record SST") {
    val sheets = Seq(
      "S" -> Seq(
        Seq("a long latin shared string that will straddle records",
          "Кириллическая строка достаточной длины для разреза"),
        Seq("short", "Ещё одна строка")))
    val oneRec = XlsDecode.decodeXls(XlsSynth.xls(sheets))
    // cap far below every string length: headers, mid-char-data splits
    // with per-continuation option bytes, and between-string splits all
    // occur across the spilled records
    for (cap <- Seq(16, 23, 48)) {
      val split = XlsDecode.decodeXls(XlsSynth.xlsTyped(
        sheets.map { case (n, rows) => n -> rows.map(_.map(XlsSynth.SCell(_))) },
        sstCap = cap))
      assert(split == oneRec, s"cap=$cap must not change decoded sheets")
    }
  }

  test("not-an-xls containers are rejected") {
    intercept[IllegalArgumentException] {
      XlsDecode.decodeXls(DocSynth.cfb(Seq("Other" -> new Array[Byte](4096))))
    }
  }

  test("cached formula text survives an interposed ShrFmla record " +
      "(MS-XLS 2.4.268; ADVICE r05)") {
    import XlsSynth.{FCell, FCellShared}
    val sheets = XlsDecode.decodeXls(XlsSynth.xlsTyped(Seq("S" -> Seq(
      Seq(FCellShared("CONCATENATE(A1)", "shared cached")),
      Seq(FCell("CONCATENATE(A2)", "plain cached"))))))
    assert(sheets.head.rows.map(_.cells.map(c => (c.cellType, c.value))) ==
      Seq(Seq(("FORMULA", "shared cached")),
        Seq(("FORMULA", "plain cached"))))
  }
}
