package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Decode-tier N -> 4N scaling: the q65 path (binaryFile scan ->
  * content-magic dispatch -> real format decoders) over a mixed
  * five-format corpus, measured at local[8] and local[32] with the
  * bench's interleaved best-of protocol. The tier is a stateless
  * per-file map — no shuffle, no cross-row state — so its scaling
  * ceiling is the host's, and this probe evidences that the decode
  * path inherits the kernel pair's envelope rather than adding a
  * bottleneck of its own (allocation-heavy inflate/XML work is MORE
  * bandwidth-bound than the transcript kernel, so expect a similar or
  * lower single-box ratio for the same reason).
  *
  * Writes BENCH/DECODE.md (a file Bench.scala does not overwrite) and
  * prints one JSON line.
  */
object DecodeScaleProbe {

  val corpusDir = "/tmp/graft_decode_scale_corpus_v1"
  val nFiles = 12000

  def ensureCorpus(): Unit = {
    val d = Paths.get(corpusDir)
    if (Files.exists(d.resolve("_SUCCESS"))) return
    Files.createDirectories(d)
    import graft.sources.OoxmlCorpus._
    for (i <- 0 until nFiles) {
      val id = i / 5
      val (ext, bytes) = (i % 5) match {
        case 0 => ("pdf", pdfBytes(id))
        case 1 => ("docx", docxBytes(id))
        case 2 => ("doc", docBytes62(id))
        case 3 => ("xls", xlsBytes(id))
        case _ => ("xlsx", xlsxBytes(id))
      }
      Files.write(d.resolve(f"doc_$i%06d.$ext"), bytes)
    }
    Files.write(d.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  def session(cores: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      // binaryFile packs small files by size + open cost; 1 MiB open
      // cost over 12k files yields ~hundreds of splits — enough waves
      // for both 8 and 32 cores on one corpus
      .config("spark.sql.files.openCostInBytes", 1024 * 1024)
      .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One timed pass: decode every file, count ok rows (the q65 unit
    * summary keeps the decoded structures alive past any dead-code
    * elimination). Returns files/sec.
    */
  def pass(s: SparkSession): Double = {
    import s.implicits._
    val t0 = System.nanoTime()
    val ok = s.read.format("binaryFile").load(corpusDir + "/*.*")
      .select("content")
      .as[Array[Byte]]
      .map(b => graft.sources.BinaryDispatch.safeDecode(b).status)
      .filter(_ == "ok")
      .count()
    require(ok == nFiles, s"decode regressions: $ok ok of $nFiles")
    nFiles / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    ensureCorpus()
    val sizes = Seq(8, 32)
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val best = scala.collection.mutable.Map(8 -> 0.0, 32 -> 0.0)
    val log = new StringBuilder
    for (r <- 1 to rounds; n <- sizes) {
      val s = session(n)
      pass(s) // JIT/scan warm
      val tps = (1 to 3).map(_ => pass(s))
      s.stop()
      best(n) = math.max(best(n), tps.max)
      val load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      log ++= f"| $r | $n | ${tps.max}%.0f | $load%.1f |\n"
      System.err.println(f"round $r local[$n] best=${tps.max}%.0f f/s load=$load%.1f")
    }
    val eff = best(32) / best(8) / 4.0
    val md =
      s"""# Decode-tier N -> 4N scaling (DecodeScaleProbe)
         |
         |The q65 path — binaryFile scan -> content-magic dispatch ->
         |real decoders (PDF object scan + Flate + content interpreter,
         |OOXML zip + StAX, MS-CFB + Word97, BIFF8) — over a mixed
         |$nFiles-file five-format corpus. Stateless per-file map: no
         |shuffle, no cross-row state; splits packed by size + 1 MiB
         |open cost. Interleaved sessions, best-of (same protocol and
         |host caveats as BASELINE.md).
         |
         || pair | files/sec @8 | files/sec @32 | efficiency |
         ||---|---|---|---|
         || local[8] -> local[32] | ${best(8).toInt} | ${best(32).toInt} | ${f"$eff%.3f"} |
         |
         |Per-round bests (files/sec):
         |
         || round | threads | best | load |
         ||---|---|---|---|
         |$log
         |At 100 TB this tier fans out per-FILE with zero shuffle, so
         |cluster scaling is governed by the scheduler's split packing
         |(bounded by openCostInBytes) and per-executor memory bandwidth
         |— the same envelope the kernel pair measures; there is no
         |decode-specific coordination to lose efficiency to.
         |""".stripMargin
    Files.writeString(Paths.get("BENCH/DECODE.md"), md)
    println(s"""{"metric":"decode_scale","files":$nFiles,""" +
      s""""fps_8":${best(8).toInt},"fps_32":${best(32).toInt},""" +
      s""""efficiency":${f"$eff%.4f"}}""")
  }
}
