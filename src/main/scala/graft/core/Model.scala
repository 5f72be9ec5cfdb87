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
  *
  * Allocation profile (the kernel is memory-bandwidth-bound at 32 cores,
  * BENCH/BASELINE.md): chunks are kept as references and the final string
  * is built ONCE, exact-size, on the first `text`/`toSeg` read — the old
  * StringBuilder path copied every chunk on append, again on each buffer
  * growth, and once more on toString. Separator decisions are a pure
  * function of prior content (buffer non-empty x ends-with-sep), so they
  * replay identically at build time; `length`/ends-with-sep are tracked
  * incrementally for the guards that read them mid-accumulation.
  */
final class SegBuilder(val offset: Int, init: String) {
  private var first: String = init
  private var rest: scala.collection.mutable.ArrayBuffer[String] = _
  private var len: Int = init.length
  private var endsSep: Boolean =
    init.length > 0 && init.charAt(init.length - 1) == '\n'

  def length: Int = len

  def text: String = {
    if (rest == null) first
    else {
      val sb = StrScratch.seg(len)
      sb.append(first)
      var l = first.length
      var ends = l > 0 && first.charAt(l - 1) == '\n'
      var i = 0
      while (i < rest.length) {
        val t = rest(i)
        if (l > 0 && !ends) { sb.append('\n'); l += 1; ends = true }
        sb.append(t)
        l += t.length
        if (t.length > 0) ends = t.charAt(t.length - 1) == '\n'
        i += 1
      }
      val s = sb.toString
      first = s // cache the build; further reads are O(1)
      rest = null
      s
    }
  }

  /** trim().isEmpty() without materializing the text (reference trim
    * semantics: all chars <= ' '; the separators we insert are <= ' ').
    */
  def isBlankTrim: Boolean = {
    if (!SegBuilder.blankTrim(first)) return false
    if (rest == null) return true
    var i = 0
    while (i < rest.length) {
      if (!SegBuilder.blankTrim(rest(i))) return false
      i += 1
    }
    true
  }

  def addText(t: String): Unit = {
    if (this eq SegBuilder.Empty) { // shared-singleton guard (see Empty)
      throw new IllegalStateException("addText on SegBuilder.Empty")
    }
    val sepAdded = len > 0 && !endsSep
    if (rest == null) rest = new scala.collection.mutable.ArrayBuffer(4)
    rest += t
    len += (if (sepAdded) 1 else 0) + t.length
    endsSep =
      if (t.length > 0) t.charAt(t.length - 1) == '\n'
      else sepAdded || endsSep
  }

  def toSeg: TextSeg = {
    if (offset == -1 && len == 0) TextSeg.empty
    else {
      val t = text
      TextSeg(offset, t, t.length)
    }
  }
}

/** Per-thread reusable StringBuilders for the two string-build sites of
  * the kernel (segment text build, extracted-text join). Tasks are
  * single-threaded per row, and the two sites can nest (extractedText
  * reads segment texts mid-join), so each site gets its OWN scratch.
  * Oversized requests bypass the scratch so no thread retains a huge
  * buffer.
  */
private[core] object StrScratch {
  private val MaxRetained = 1 << 20
  private val segTl = ThreadLocal.withInitial[java.lang.StringBuilder](
    () => new java.lang.StringBuilder(1024))
  private val joinTl = ThreadLocal.withInitial[java.lang.StringBuilder](
    () => new java.lang.StringBuilder(1024))

  private def get(tl: ThreadLocal[java.lang.StringBuilder],
      cap: Int): java.lang.StringBuilder = {
    if (cap > MaxRetained) new java.lang.StringBuilder(cap)
    else {
      val sb = tl.get()
      sb.setLength(0)
      sb
    }
  }

  def seg(cap: Int): java.lang.StringBuilder = get(segTl, cap)
  def join(cap: Int): java.lang.StringBuilder = get(joinTl, cap)
}

object SegBuilder {
  val LineSep: String = "\n"

  /** Shared immutable-by-convention empty segment — the default header/
    * body of every paragraph builder (TextSegment default `(-1, "")`,
    * Paragraph.java:5-6). Call sites REPLACE it before mutating; addText
    * throws if the convention is ever broken.
    */
  val Empty: SegBuilder = new SegBuilder(-1, "")

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
