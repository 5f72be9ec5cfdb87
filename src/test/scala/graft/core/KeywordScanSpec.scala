package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Parity of the allocation-free scanners with the regex grammars they
  * replace (Segmenter keyword probes, Tokenizer list/bold markup): the
  * scans must agree with the original compiled patterns on every input.
  */
class KeywordScanSpec extends AnyFunSuite {

  private val rnd = new Random(0xC0FFEE)

  // --- keyword probes vs <literal>([^А-Яа-я]|$) regexes ---

  private def regexAt(lower: String, pattern: String): Int =
    pattern.r.findFirstMatchIn(lower).map(_.start).getOrElse(-1)

  private val alphabet =
    "абвгдеёжзиклмнопрстуфхцчшщыьэюя АБВГДЕЖПРСТУЯ abcXYZ0123.,-\t\n"

  private def randomText(maxLen: Int): String = {
    val n = rnd.nextInt(maxLen)
    val sb = new StringBuilder
    for (_ <- 0 until n) {
      // bias toward keyword fragments so matches actually occur
      rnd.nextInt(6) match {
        case 0 => sb ++= Seq("договор", "устав", "у с т а в", "УСТАВ",
          "протокол", "приказ", "план работ", "дополнительное",
          "соглашение", "дополнительное  соглашение", "приложение",
          "контракт", "решение", "положение", "договора",
          "уст ав", "решением")(rnd.nextInt(17))
        case _ => sb += alphabet.charAt(rnd.nextInt(alphabet.length))
      }
    }
    sb.toString
  }

  test("keywordAt / charterAt / supplementaryAt == reference regexes") {
    val simple = Seq("договор", "протокол", "положение", "приказ",
      "план работ", "приложение", "контракт", "решение", "соглашение")
    for (_ <- 1 to 3000) {
      val raw = randomText(60)
      val lower = raw.toLowerCase
      for (lit <- simple) {
        assert(Segmenter.keywordAt(raw, lit) ==
          regexAt(lower, java.util.regex.Pattern.quote(lit) + "([^А-Яа-я]|$)"),
          s"keywordAt($lit) on <$raw>")
      }
      assert(Segmenter.charterAt(raw) ==
        regexAt(lower, "у *с *т *а *в([^А-Яа-я]|$)"), s"charterAt on <$raw>")
      assert(Segmenter.supplementaryAt(raw) ==
        regexAt(lower, "дополнительное\\s+соглашение([^А-Яа-я]|$)"),
        s"supplementaryAt on <$raw>")
    }
  }

  // --- tokenizer list/bold markup vs the original regex grammars ---

  private val numList =
    "^#N\\((\\d+),(\\d+)(?:,(\\d+))?(?:,([^)]*))?\\)\\s".r
  private val bulletList = "^#B(?:\\((\\d+),(\\d+)\\))?\\s".r
  private val boldRun = "\\*\\*(.*?)\\*\\*".r

  private def regexParse(line: String): Element = {
    // the ORIGINAL regex-based parseLine semantics, re-implemented here
    // as the test oracle for the manual scanner
    var rest = line
    var listRef: Option[ListRef] = None
    var changed = true // parseLine consumes repeated prefixes; mirror it
    while (changed) {
      changed = false
      if (rest.length > 1 && rest.charAt(0) == '#') {
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
            bulletList.findFirstMatchIn(rest).foreach { m =>
              val id = Option(m.group(1)).map(_.toInt).getOrElse(-1)
              val lvl = Option(m.group(2)).map(_.toInt).getOrElse(0)
              listRef = Some(ListRef(id, lvl, "bullet", "", 1))
              rest = rest.drop(m.end)
              changed = true
            }
        }
      }
    }
    val runs = new scala.collection.mutable.ArrayBuffer[Run]
    val plain = new StringBuilder
    if (rest.indexOf('*') < 0) {
      if (rest.nonEmpty) { runs += Run(rest); plain ++= rest }
    } else {
      var last = 0
      for (m <- boldRun.findAllMatchIn(rest)) {
        if (m.start > last) {
          runs += Run(rest.substring(last, m.start))
          plain ++= rest.substring(last, m.start)
        }
        runs += Run(m.group(1), bold = Some(true)); plain ++= m.group(1)
        last = m.end
      }
      if (last < rest.length) {
        runs += Run(rest.substring(last)); plain ++= rest.substring(last)
      }
    }
    Element(plain.toString, runs.toSeq, listRef = listRef)
  }

  test("manual list-prefix + bold-run scans == original regex grammar") {
    val frags = Seq("#N(1,0) x", "#N(12,3,7) y", "#N(1,0,2,%1-%2) z",
      "#N(1,0,abc) q", "#N(1,0,) q", "#N(1,0", "#N(1,0)x", "#N(1,0)\tx",
      "#B a", "#B(3,1) b", "#B(3,1)c", "#B(x,1) d", "#Bq", "#B",
      "**bold**", "a **b** c", "**a** **b**", "***x***", "a ** b",
      "****", "**", "*a*", "#N(5,1,3) **bold** tail")
    for (f <- frags) {
      val m = Tokenizer.parseLine(f)
      val r = regexParse(f)
      assert(m.listRef == r.listRef, s"listRef on <$f>")
      assert(m.text == r.text, s"text on <$f>")
      assert(m.runs == r.runs, s"runs on <$f>")
    }
    // randomized cross-check
    val pieces = Seq("#N(", "#B(", ")", ",", " ", "1", "23", "%1.", "*",
      "**", "x", "тест", "\t")
    for (_ <- 1 to 3000) {
      val f = (0 until rnd.nextInt(8)).map(_ =>
        pieces(rnd.nextInt(pieces.length))).mkString
      val line = if (rnd.nextBoolean()) "#N(" + f else f
      val m = Tokenizer.parseLine(line)
      val r = regexParse(line)
      assert(m.listRef == r.listRef, s"listRef on <$line>")
      assert(m.text == r.text, s"text on <$line>")
      assert(m.runs == r.runs, s"runs on <$line>")
    }
  }
}
