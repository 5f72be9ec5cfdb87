package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.Random

/** Deterministic synthetic transcript generator (FIXTURES.md §1).
  *
  * Every turn is a pure function of (seed, conv_id, turn_idx): generation
  * distributes over `spark.range` with no driver-side loop and no wall
  * clock, so the same (seed, nConvs) always yields the identical table at
  * any parallelism — the precondition for the two-parallelism scaling
  * measurement (BASELINE.md).
  *
  * Conversation lengths are zipf-ish (quantile-inverted power law) so a
  * few conversations are ~1000x the median — genuine conv_id skew for the
  * salting story (SURVEY.md §7.3).
  */
object Transcripts {

  val defaultSeed: Long = 42L

  private val ruWords = Vector("договор", "поставка", "сторона", "обязанность",
    "приложение", "протокол", "устав", "решение", "пункт", "раздел",
    "соглашение", "условие", "оплата", "срок", "товар", "услуга")
  private val enWords = Vector("the", "model", "agent", "tool", "call",
    "result", "data", "clause", "section", "content", "answer", "question",
    "analysis", "response", "summary", "detail")
  private val roles = Vector("user", "assistant", "tool", "system")
  private val tools = Vector(null, "search", "browser", "python", "sql")

  /** Zipf-ish conversation length: median ~8, p99 ~300, max ~8000. */
  def convLength(rnd: Random): Int = {
    val u = rnd.nextDouble()
    val len = math.pow(1.0 - u, -0.7) * 6.0
    math.min(len, 8000.0).toInt.max(1)
  }

  private def sentence(rnd: Random, words: Int): String =
    (0 until words).map { _ =>
      if (rnd.nextInt(3) == 0) ruWords(rnd.nextInt(ruWords.size))
      else enWords(rnd.nextInt(enWords.size))
    }.mkString(" ")

  /** One turn's text: mixes plain prose, markup-styled document turns and
    * HTML turns so every kernel path is exercised at benchmark scale.
    */
  def turnText(rnd: Random): String = {
    rnd.nextInt(10) match {
      case 0 => // document-like turn with markup
        val lines = Vector(
          s"^C ${sentence(rnd, 3).toUpperCase}",
          sentence(rnd, 12),
          s"#N(1,0) ${sentence(rnd, 6)}",
          s"#N(1,1) ${sentence(rnd, 5)}",
          s"**${sentence(rnd, 2)}**",
          sentence(rnd, 15))
        lines.mkString("\n")
      case 1 => // HTML turn
        s"""<html><body><nav><a href="/">home</a></nav>
           |<h1>${sentence(rnd, 4)}</h1>
           |<p>${sentence(rnd, 20)}</p>
           |<p>${sentence(rnd, 15)}</p>
           |<footer>${sentence(rnd, 3)}</footer></body></html>""".stripMargin
      case 2 => // multi-paragraph prose
        (0 until 2 + rnd.nextInt(4)).map(_ => sentence(rnd, 10 + rnd.nextInt(20)))
          .mkString("\n")
      case _ => // short plain turn (the common case in transcripts)
        sentence(rnd, 3 + rnd.nextInt(25))
    }
  }

  /** The deterministic table: nConvs conversations, zipf lengths. */
  def generate(spark: SparkSession, nConvs: Long,
               seed: Long = defaultSeed): Dataset[Turn] = {
    import spark.implicits._
    val baseTs = 1735689600000L // 2025-01-01T00:00:00Z, fixed epoch
    spark.range(nConvs).flatMap { cid =>
      // splitmix64 mix: java.util.Random's first draws correlate across
      // consecutive seeds, which flattens the zipf tail — mix first
      var z = seed * 1000003L + cid + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      val rnd = new Random(z ^ (z >>> 31))
      val len = convLength(rnd)
      val convId = f"conv-$cid%010d"
      (0 until len).map { i =>
        val role = roles(rnd.nextInt(roles.size))
        val tool =
          if (role == "tool") tools(1 + rnd.nextInt(tools.size - 1)) else null
        Turn(convId, i, role, turnText(rnd), tool,
          new java.sql.Timestamp(baseTs + cid * 3600000L + i * 15000L))
      }
    }
  }
}
