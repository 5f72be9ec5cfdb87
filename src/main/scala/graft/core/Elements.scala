package graft.core

/** Input element stream of the segmentation state machine.
  *
  * The reference consumes POI object models (style runs, alignment,
  * indentation, table context, list ids — DocumentParser.java:809-994);
  * our tokenizer derives an equivalent `Element` per line of a transcript
  * turn (FIXTURES.md §2). Every attribute below drives a specific branch
  * of the reference logic, cited at the declaration.
  */

/** A style run — per-run (text, bold) as tracked by the DOCX header
  * predicate (DocumentParser.java:935-945,968-994).
  *
  * @param bold      explicit run-level bold (cTRPr.isSetB — :982-984);
  *                  None = unset, falls back to styleBold XOR paragraphBold
  *                  (:986-992)
  * @param styleBold bold resolved from the run's character style chain
  *                  (:973-977,949-966)
  */
final case class Run(text: String, bold: Option[Boolean] = None,
                     styleBold: Boolean = false)

sealed trait Align
object Align {
  case object Left extends Align
  case object Center extends Align
  case object Right extends Align
}

/** One Word97 list level as the DOC numbering machine consumes it
  * (DocumentParser.java:140-179 reads the same triple off POI's
  * ListLevel: getStartAt / getNumberFormat / getNumberText).
  *
  * @param startAt level start value (LVLF iStartAt)
  * @param nfc     number format code; 23 = bullet (:169-171)
  * @param xst     number text with `(char)l` level placeholders (:174-178)
  */
final case class DocLevel(startAt: Int, nfc: Int, xst: String)

/** List reference — the DOCX numbering triple the prefix machine needs
  * (DocumentParser.java:537-643).
  *
  * @param template  numLevelText, e.g. "%1.%2." (:571,:627-629)
  * @param startAt   level start value; 0 = unset (:560,:614-617,:645-662)
  * @param docLevels non-empty on the REAL-DOC decode path only: the full
  *                  per-level table (lsid -> LSTF levels) the reference's
  *                  DOC branch walks (:140-179). When set, the prefix
  *                  machine uses the DOC algorithm — which differs from
  *                  getNumberPrefix (root pre-seeded with level-0 startAt,
  *                  `(char)l` placeholders) — instead of the DOCX one.
  */
final case class ListRef(listId: Int, ilvl: Int, numFmt: String,
                         template: String, startAt: Int,
                         docLevels: Seq[DocLevel] = Nil)

/** One paragraph-like element.
  *
  * @param runs            style runs (bold tracking, F3/F4)
  * @param align           Center/Right => header (:904-906)
  * @param indentRatio     indentationLeft/pageWidth; > 0.25 => header
  *                        (:67,:899-901)
  * @param styleBoldChain  bold flags of the enclosing paragraph/table style
  *                        chain; paragraphBold = XOR-fold (:914-925)
  * @param canBeHeader     override gate; Must models the page-break rule
  *                        (:218,:452-453), CanNot is set by the segmenter
  *                        for multi-column non-bilingual table rows
  *                        (:443-458) — tokenizer-set Must wins
  * @param listRef         numbering state key (A3)
  * @param isToc           PAGEREF _Toc field => element skipped, header
  *                        state reset (:54,:496-499,:708-716)
  * @param boilerplate     tokenizer-classified boilerplate (HTML strip
  *                        path) — same skip route as isToc, but recorded
  *                        under its own span kind
  * @param docDialect      route the header predicate through the DOC
  *                        (HWPF) variant (DocumentParser.java:809-859)
  *                        instead of the DOCX one (:885-947): per-run
  *                        caps check, direct run bold, the
  *                        fontAlignment/justification route
  * @param fontAlignment   DOC paragraph.getFontAlignment(); == 3 is a
  *                        header route (:828-832)
  * @param justification   DOC paragraph.getJustification(); 1 (center)
  *                        or 2 (right) is a header route (:828-832)
  */
final case class Element(
    text: String,
    runs: Seq[Run] = Nil,
    align: Align = Align.Left,
    indentRatio: Float = 0f,
    styleBoldChain: Seq[Boolean] = Nil,
    canBeHeader: Option[CanBeHeader] = None,
    listRef: Option[ListRef] = None,
    isToc: Boolean = false,
    boilerplate: Boolean = false,
    docDialect: Boolean = false,
    fontAlignment: Int = 0,
    justification: Int = 0)

/** Body-element stream: paragraphs or tables (BodyElementType dispatch,
  * DocumentParser.java:404-475). A table is rows -> cells -> body
  * streams: a cell holds paragraphs AND nested tables in document
  * order, and the segmenter recurses into nested tables with their own
  * per-table gating exactly like the reference's processBodyElement
  * recursion over `cell.getBodyElements()` (:446-447).
  */
sealed trait BodyElement
final case class ParaElement(el: Element) extends BodyElement
final case class TableElement(rows: Seq[Seq[Seq[BodyElement]]]) extends BodyElement

object TableElement {
  /** Rows of single-paragraph-stream cells (the flat common case). */
  def ofParas(rows: Seq[Seq[Seq[Element]]]): TableElement =
    TableElement(rows.map(_.map(_.map(e => ParaElement(e): BodyElement))))
}
