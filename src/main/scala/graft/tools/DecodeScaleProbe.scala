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

  val corpusDir = "/tmp/graft_decode_scale_corpus_v2"
  val nFiles = 48000

  def ensureCorpus(): Unit = {
    val d = Paths.get(corpusDir)
    if (Files.exists(d.resolve("_SUCCESS"))) return
    Files.createDirectories(d)
    import graft.sources.OoxmlCorpus._
    java.util.stream.IntStream.range(0, nFiles).parallel().forEach { i =>
      val id = i / 5
      val (ext, bytes) = (i % 5) match {
        case 0 => ("pdf", pdfBytes(id))
        case 1 => ("docx", docxBytes(id))
        case 2 => ("doc", docBytes62(id))
        case 3 => ("xls", xlsBytes(id))
        case _ => ("xlsx", xlsxBytes(id))
      }
      Files.write(d.resolve(f"doc_$i%06d.$ext"), bytes)
      ()
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
      // binaryFile packs small files by size + open cost; 512 KiB open
      // cost / 64 MiB splits over 48k files yields ~375 splits of
      // ~128 files (~30 ms tasks) — enough waves for both 8 and 32
      // cores without task-overhead domination
      .config("spark.sql.files.openCostInBytes", 512 * 1024)
      .config("spark.sql.files.maxPartitionBytes", 64 * 1024 * 1024)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The decode Dataset over ONE root path. Loading a `*.*` glob under
    * the directory instead
    * would glob-expand every file into its own root path and push the
    * file index through a driver-coordinated parallel-listing job on
    * EVERY resolution — measured here at ~20 s per pass over 48k local
    * files, flattening the scaling pair to ~0.25 regardless of cores.
    * One directory root + pathGlobFilter is one readdir; the index is
    * resolved once per session and reused across passes — exactly the
    * 10^8-file discipline (a corpus is cataloged once, scanned many
    * times), and the reason the oracled decode queries' tiny corpora
    * stay glob-styled while anything at scale must not be.
    */
  def decodeDs(s: SparkSession)
      : org.apache.spark.sql.Dataset[String] = {
    import s.implicits._
    s.read.format("binaryFile")
      .option("pathGlobFilter", "doc_*")
      .load(corpusDir)
      .select("content")
      .as[Array[Byte]]
      .map(b => graft.sources.BinaryDispatch.safeDecode(b).status)
  }

  /** One timed pass over the pre-resolved Dataset: decode every file,
    * count ok rows (the q65 unit summary keeps the decoded structures
    * alive past any dead-code elimination). Returns files/sec.
    */
  def pass(ds: org.apache.spark.sql.Dataset[String]): Double = {
    val t0 = System.nanoTime()
    val ok = ds.filter(_ == "ok").count()
    require(ok == nFiles, s"decode regressions: $ok ok of $nFiles")
    nFiles / ((System.nanoTime() - t0) / 1e9)
  }

  /** The Spark job's exact per-file work under a plain thread pool —
    * the host's N -> 4N envelope for the decode workload (the same
    * attribution discipline as the bench's kernel envelope). Returns
    * best files/sec at `threads`.
    */
  def kernelPair(bytes: Array[Byte] => String,
                 corpus: Array[Array[Byte]], threads: Int): Double = {
    import java.util.concurrent.{Executors, TimeUnit}
    import java.util.concurrent.atomic.AtomicInteger
    def run(): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val next = new AtomicInteger(0)
      val ok = new AtomicInteger(0)
      val t0 = System.nanoTime()
      for (_ <- 0 until threads) pool.execute { () =>
        var i = next.getAndIncrement()
        while (i < corpus.length) {
          if (bytes(corpus(i)) == "ok") ok.incrementAndGet()
          i = next.getAndIncrement()
        }
      }
      pool.shutdown()
      pool.awaitTermination(600, TimeUnit.SECONDS)
      require(ok.get == corpus.length, s"ok=${ok.get}")
      corpus.length / ((System.nanoTime() - t0) / 1e9)
    }
    run() // warm
    (1 to 3).map(_ => run()).max
  }

  def main(args: Array[String]): Unit = {
    ensureCorpus()
    val sizes = Seq(8, 32)
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val best = scala.collection.mutable.Map(8 -> 0.0, 32 -> 0.0)
    val log = new StringBuilder
    for (r <- 1 to rounds; n <- sizes) {
      val s = session(n)
      val ds = decodeDs(s)
      pass(ds) // listing + JIT warm
      val tps = (1 to 3).map(_ => pass(ds))
      s.stop()
      best(n) = math.max(best(n), tps.max)
      val load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      log ++= f"| $r | $n | ${tps.max}%.0f | $load%.1f |\n"
      System.err.println(f"round $r local[$n] best=${tps.max}%.0f f/s load=$load%.1f")
    }
    val eff = best(32) / best(8) / 4.0
    // unconditional pure-thread envelope, measured right after the
    // Spark pair (same files, same decode, no Spark)
    val corpus = new java.io.File(corpusDir).listFiles()
      .filter(_.getName.startsWith("doc_")).sortBy(_.getName)
      .map(f => Files.readAllBytes(f.toPath))
    val k8 = kernelPair(
      b => graft.sources.BinaryDispatch.safeDecode(b).status, corpus, 8)
    val k32 = kernelPair(
      b => graft.sources.BinaryDispatch.safeDecode(b).status, corpus, 32)
    val kEff = k32 / k8 / 4.0
    val md =
      s"""# Decode-tier N -> 4N scaling (DecodeScaleProbe)
         |
         |The q65 path — binaryFile scan -> content-magic dispatch ->
         |real decoders (PDF object scan + Flate + content interpreter,
         |OOXML zip + StAX, MS-CFB + Word97, BIFF8) — over a mixed
         |$nFiles-file five-format corpus. Stateless per-file map: no
         |shuffle, no cross-row state; ONE directory root resolved once
         |per session (see Findings), splits packed by size + 512 KiB
         |open cost. Interleaved sessions, best-of (same protocol and
         |host caveats as BASELINE.md).
         |
         |## Findings — two decode-tier serializers found and fixed
         |
         |1. `XMLInputFactory.newInstance()` per reader() call ran the
         |   JAXP ServiceLoader lookup under classloader locks on every
         |   XML part of every OOXML file: 8 pure decode threads
         |   measured 1.9x ONE thread. A per-thread factory
         |   (OoxmlDecode.factories) made the 8-thread fold 6.1x faster
         |   and restored near-linear 1 -> 8 scaling.
         |2. Loading the corpus as a `*.*` glob expanded every file
         |   into its own FileIndex root path, pushing resolution
         |   through a driver-coordinated listing job on EVERY pass
         |   (~20 s over 48k local files) — the Spark pair flatlined at
         |   ~2.1k files/s on 8 AND 32 cores. One directory root +
         |   pathGlobFilter, resolved once per session, is one readdir:
         |   ~10x. At 10^8 files the same discipline holds: catalog the
         |   corpus once, never glob per query.
         |3. Sniffing and decode no longer inflate archives wholesale:
         |   zip entry NAMES come from the central directory at zero
         |   inflation and only the consumed parts are read
         |   (sources/ZipRandom) — real-world files whose bulk is
         |   embedded media cost only their XML.
         |
         || pair | files/sec @8 | files/sec @32 | efficiency |
         ||---|---|---|---|
         || local[8] -> local[32] | ${best(8).toInt} | ${best(32).toInt} | ${f"$eff%.3f"} |
         |
         |Per-round bests (files/sec):
         |
         || round | threads | best | load |
         ||---|---|---|---|
         |@LOG@
         |
         |Pure-thread envelope (the same safeDecode fold under a plain
         |thread pool, no Spark — the host's N -> 4N ceiling for this
         |allocation-heavy workload, measured unconditionally right
         |after the Spark pair):
         |
         || threads | files/sec | envelope efficiency |
         ||---|---|---|
         || 8 | ${k8.toInt} | |
         || 32 | ${k32.toInt} | ${f"$kEff%.3f"} |
         |
         |The decode tier allocates far more per core-second than the
         |transcript kernel (inflate buffers, StAX events, piece-table
         |strings), so its single-box 8 -> 32 envelope sits BELOW the
         |kernel pair's — the residual is the same shared-socket memory
         |physics, hit harder. A Spark pair at-or-above this envelope
         |means the distributed shell adds no decode-specific loss. At
         |100 TB this tier fans out per-FILE with zero shuffle, so
         |cluster scaling is governed by split packing (bounded by
         |openCostInBytes) and per-executor memory bandwidth; each
         |added executor brings its own memory buses, which this box
         |cannot model.
         |""".stripMargin.replace("@LOG@\n", log.toString)
    Files.writeString(Paths.get("BENCH/DECODE.md"), md)
    println(s"""{"metric":"decode_scale","files":$nFiles,""" +
      s""""fps_8":${best(8).toInt},"fps_32":${best(32).toInt},""" +
      s""""efficiency":${f"$eff%.4f"},""" +
      s""""kernel_fps_8":${k8.toInt},"kernel_fps_32":${k32.toInt},""" +
      s""""kernel_envelope":${f"$kEff%.4f"}}""")
  }
}
