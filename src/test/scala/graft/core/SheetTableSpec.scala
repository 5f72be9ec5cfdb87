package graft.core

import org.scalatest.funsuite.AnyFunSuite
import SheetTable._

/** Fixtures e01-e03 (FIXTURES.md §4). */
class SheetTableSpec extends AnyFunSuite {

  private def str(i: Int, v: String) = Cell(i, "STRING", v)

  test("e01 column-title discovery fixes name/person columns") {
    val sheet = Sheet("s", Seq(
      Row(Seq(str(0, "№"), str(1, "Наименование компании"),
        str(2, "Наименование / ФИО владельца"))),
      Row(Seq(str(0, "1"), str(1, "ООО Ромашка"), str(2, "Иванов И. И."))),
      Row(Seq(str(0, "2"), str(1, "АО Лютик")))))
    val out = parseBeneficiaries(Seq(sheet))
    assert(out == Seq(
      Beneficiary("ООО Ромашка", "Иванов И. И."),
      Beneficiary("АО Лютик", null)))
  }

  test("e02 non-string and unmatched cells ignored; title row emits nothing") {
    val sheet = Sheet("s", Seq(
      Row(Seq(str(0, "наименование"))),
      Row(Seq(Cell(0, "NUMERIC", "42"), str(1, "ignored — wrong column"))),
      Row(Seq(str(0, "ЗАО Колос")))))
    val out = parseBeneficiaries(Seq(sheet))
    assert(out == Seq(Beneficiary("ЗАО Колос", null)))
  }

  test("e03 sheet-name date parse: named month, numeric month, no day") {
    assert(parseDateFromSheetName("Список на 15.03.2021") ==
      Some(java.time.LocalDate.of(2021, 3, 15)))
    assert(parseDateFromSheetName("Август 2020") ==
      Some(java.time.LocalDate.of(2020, 8, 1)))
    assert(parseDateFromSheetName("без даты") == None)
    assert(isEmpty(Cell(0, "BLANK", "")))
    assert(isEmpty(Cell(0, "STRING", "")))
    assert(!isEmpty(Cell(0, "NUMERIC", "5")))
  }
}
