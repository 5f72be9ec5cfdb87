package graft.core

/** Dead-path scalar functions of the reference, rebuilt for surface
  * completeness (SURVEY.md §2.4 X5/X7/X8). Their call sites are commented
  * out in the reference (findDocumentNumber, DocumentParser.java:298-326;
  * the XLS stakeholder path, ExcelParser.java:73-142,241-255) but the
  * patterns define extraction dialects the engine exposes as plain
  * functions for `mapPartitions` / typed maps.
  */
object DocScalars {

  // X5 — documentNumberPattern + validation (DocumentParser.java:31-32)
  private val documentNumberPattern =
    "№[ \\t]*(?<number>\\S+)(\\s+|$)".r
  private val documentNumberValidationPattern =
    "([A-Za-zА-Яа-я0-9]+)".r

  /** First `№ <number>` in the text whose number contains at least one
    * alphanumeric (the validation gate at DocumentParser.java:319-323).
    */
  def findDocumentNumber(text: String): Option[String] =
    documentNumberPattern.findFirstMatchIn(text)
      .map(_.group("number"))
      .filter(n => documentNumberValidationPattern.findFirstIn(n).isDefined)

  // X7 — namePattern (ExcelParser.java:32, used :114-121)
  private val namePattern =
    "^(?<name>.*)\\(\\s*сокращенное\\s*-?\\s*(?<shortName>.*)\\)$".r

  /** Split `Full Name (сокращенное - Short)` into trimmed (name,
    * shortName); None when the pattern doesn't apply (the reference then
    * keeps the whole cell as name, ExcelParser.java:119-121).
    */
  def splitNameShort(cell: String): Option[(String, String)] =
    namePattern.findFirstMatchIn(cell)
      .map(m => (m.group("name").trim, m.group("shortName").trim))

  // X8 — shortNamePattern (ExcelParser.java:34, used :241-254): initials
  // before or after a (possibly hyphenated) capitalized surname
  private val personPattern =
    ("(?<person>(([А-Я]\\.\\s*){2}[А-Я][а-я]+(-[А-Я][а-я]+)?)|" +
      "([А-Я][а-я]+(-[А-Я][а-я]+)?\\s*([А-Я]\\.\\s*){2}))").r

  /** All person mentions (initials + surname, either order). */
  def findPersons(text: String): Seq[String] =
    personPattern.findAllMatchIn(text).map(_.group("person")).toSeq
}
