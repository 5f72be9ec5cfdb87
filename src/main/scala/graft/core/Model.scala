package graft.core

/** Output data model of the extraction kernel.
  *
  * Shapes mirror the reference beans (re-expressed as immutable Scala case
  * classes that Spark encodes as nested StructTypes):
  *   - TextSeg  ~ TextSegment.java:3-35  (offset -1 = absent)
  *   - Para     ~ Paragraph.java:3-22
  *   - Doc      ~ DocumentStructure.java:11-33
  *   - MultiDoc ~ MultiDocumentStructure.java:6-25
  */
final case class TextSeg(offset: Int, text: String, length: Int)

object TextSeg {
  val empty: TextSeg = TextSeg(-1, "", 0)
}

final case class Para(header: TextSeg, body: TextSeg)

final case class Doc(docType: String, paragraphs: Seq[Para])

final case class Span(kind: String, offset: Int, length: Int)

final case class MultiDoc(documents: Seq[Doc], spans: Seq[Span], version: String)

/** Document types — DocumentType.java:3-15 (enum names kept verbatim). */
object DocType {
  val UNKNOWN = "UNKNOWN"
  val CONTRACT = "CONTRACT"
  val CHARTER = "CHARTER"
  val PROTOCOL = "PROTOCOL"
  val REGULATION = "REGULATION"
  val CHARITY_POLICY = "CHARITY_POLICY"
  val ORDER = "ORDER"
  val WORK_PLAN = "WORK_PLAN"
  val SUPPLEMENTARY_AGREEMENT = "SUPPLEMENTARY_AGREEMENT"
  val ANNEX = "ANNEX"
  val AGREEMENT = "AGREEMENT"
}

/** 3-valued header gate — CanBeHeader.java:3-7. */
sealed trait CanBeHeader
object CanBeHeader {
  case object CanNot extends CanBeHeader
  case object Can extends CanBeHeader
  case object Must extends CanBeHeader
}

/** Mutable text-segment accumulator with the reference's separator-join
  * rule (TextSegment.java:27-34): `addText` inserts one line separator
  * unless the buffer is empty or already ends with one. The separator is
  * fixed to "\n" (the reference uses System.lineSeparator(), i.e. "\n" on
  * the Linux deployment target); length always equals text length.
  */
final class SegBuilder(val offset: Int, init: String) {
  // single-chunk fast path: most segments never see a second addText, so
  // the char-copy into a builder is deferred until one arrives
  private var first: String = init
  private var sb: java.lang.StringBuilder = _
  def text: String = if (sb == null) first else sb.toString
  def length: Int = if (sb == null) first.length else sb.length
  /** trim().isEmpty() without materializing the text (reference trim
    * semantics: all chars <= ' ').
    */
  def isBlankTrim: Boolean = {
    if (sb == null) SegBuilder.blankTrim(first)
    else {
      var i = 0
      val n = sb.length
      while (i < n) {
        if (sb.charAt(i) > ' ') return false
        i += 1
      }
      true
    }
  }
  def addText(t: String): Unit = {
    if (sb == null) { sb = new java.lang.StringBuilder(first); first = null }
    val sep = SegBuilder.LineSep
    if (sb.length > 0 &&
        !(sb.length >= sep.length &&
          sb.lastIndexOf(sep) == sb.length - sep.length)) {
      sb.append(sep)
    }
    sb.append(t)
  }
  def toSeg: TextSeg = {
    val t = text
    TextSeg(offset, t, t.length)
  }
}

object SegBuilder {
  val LineSep: String = "\n"
  def empty: SegBuilder = new SegBuilder(-1, "")
  /** Exactly `s.trim.isEmpty` (all chars <= ' ') without allocating. */
  def blankTrim(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) > ' ') return false
      i += 1
    }
    true
  }
}
