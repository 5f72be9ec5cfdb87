package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.hadoop.fs.Path

/** The distributed extraction pipeline (SURVEY.md §3.4):
  *
  *   read -> (anti-join vs committed manifest) -> salted repartition ->
  *   sortWithinPartitions(conv_id, turn_idx) -> mapPartitions(extract) ->
  *   write per bucket + manifest commit
  *
  * Scale notes (the 100 TB argument):
  *   - extraction is per-turn stateless, so the heavy stage is shuffled on
  *     `pmod(hash(conv_id, turn_idx), N)` — perfectly balanced regardless
  *     of conversation-length skew (no hot key can exist);
  *   - conversation-level ordering (window) is a *separate, cheap* stage
  *     over the already-extracted narrow columns, partitioned by conv_id —
  *     the only stage where a 8000-turn conversation lands on one task,
  *     and it only carries (conv_id, turn_idx, nBytes)-sized rows;
  *   - resume is a partition-pruning filter (committed bucket list pushed
  *     down as `!bucket.isin(...)`), not a data-scan anti-join, so a
  *     restart reads only uncommitted input partitions.
  */
object ExtractPipeline {

  /** Pure transform: one serde boundary per task, zero shuffles. */
  def extract(turns: Dataset[Turn]): Dataset[ExtractedTurn] = {
    import turns.sparkSession.implicits._
    turns.mapPartitions(_.map(TurnExtractor.extract))
  }

  /** Zero-shuffle narrow path: project to the 3 columns the kernel reads
    * BEFORE the typed boundary, so parquet scans only conv_id, turn_idx,
    * text (pruning verified via .explain ReadSchema). This is the default
    * heavy stage: per-turn statelessness means map-side extraction on
    * scan partitions, which are size-balanced by the source
    * (maxPartitionBytes), so no shuffle and no skew.
    */
  def extractNarrow(turns: DataFrame): Dataset[ExtractedTurn] = {
    import turns.sparkSession.implicits._
    turns.select(col("conv_id"), col("turn_idx"), col("text"))
      .as[TurnLite]
      .mapPartitions(_.map(TurnExtractor.extract(_: TurnLite)))
  }

  /** Bucket column: stable function of conv_id only, so one conversation
    * always lands in one bucket (ordering + co-location), while buckets
    * stay balanced across thousands of conversations.
    */
  def bucketCol(nBuckets: Int) = pmod(xxhash64(col("conv_id")), lit(nBuckets))

  /** The balanced heavy stage: salt on (conv_id, turn_idx) — per-turn
    * statelessness makes this exact, defusing any conversation skew.
    */
  def extractBalanced(turns: Dataset[Turn], partitions: Int): Dataset[ExtractedTurn] = {
    import turns.sparkSession.implicits._
    turns
      .select(col("conv_id"), col("turn_idx"), col("text"))
      .repartition(partitions,
        pmod(xxhash64(col("conv_id"), col("turn_idx")), lit(partitions)))
      .as[TurnLite]
      .mapPartitions(_.map(TurnExtractor.extract(_: TurnLite)))
  }

  /** Stable conversation ordering + conversation-relative offsets: the
    * window stage the north rule names. Runs over narrow columns only.
    */
  def withConvOrder(extracted: Dataset[ExtractedTurn]): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    extracted.toDF()
      .withColumn("turn_rank", row_number().over(w))
      .withColumn("conv_char_offset",
        coalesce(
          sum(length(col("extractedText")) + lit(1))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
  }

  /** Checkpointed run: processes only uncommitted buckets, committing a
    * manifest entry per bucket batch. Killing the job between batches and
    * re-running converges to the same table (idempotent resume).
    *
    * @param batchBuckets buckets per write job (an Iceberg snapshot analog)
    */
  def runCheckpointed(
      spark: SparkSession,
      turns: Dataset[Turn],
      outDir: String,
      nBuckets: Int,
      batchBuckets: Int = 8,
      inputFingerprint: String = ""): Unit = {
    import spark.implicits._
    val catalog = new HadoopManifestCatalog(
      outDir, spark.sparkContext.hadoopConfiguration)
    val done = catalog.committedBuckets()
    val todo = (0 until nBuckets).filterNot(done.contains)
    if (todo.isEmpty) return

    val withBucket = turns.withColumn("bucket", bucketCol(nBuckets))

    for (batch <- todo.grouped(batchBuckets)) {
      // partition-pruning filter: only uncommitted buckets are read
      val slice = withBucket
        .filter(col("bucket").isin(batch: _*))
        .drop("bucket")
      val extracted = extractNarrow(slice)
        .withColumn("bucket", bucketCol(nBuckets))
        // deterministic layout: one conversation per bucket, sorted
        .repartition(batch.size, col("bucket"))
        .sortWithinPartitions("conv_id", "turn_idx")
      extracted.write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(outDir)
      // metrics from the written files (footer-only count, no re-scan)
      for (b <- batch) {
        val bucketPath = s"$outDir/bucket=$b"
        val fs = new Path(outDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val exists = fs.exists(new Path(bucketPath))
        val rows =
          if (exists) spark.read.parquet(bucketPath).count() else 0L
        val bytes =
          if (exists) fs.getContentSummary(new Path(bucketPath)).getLength
          else 0L
        catalog.commit(
          ManifestEntry(b, rows, bytes, inputFingerprint,
            graft.BuildInfo.version))
      }
    }
  }

  /** Anti-join resume variant: when the committed-partition list is too
    * large for an isin filter (millions of partitions on a real table),
    * the manifest becomes a broadcast left_anti join instead — same
    * semantics, bounded driver memory (SURVEY.md §2.8).
    */
  def filterUncommitted(turns: Dataset[Turn], nBuckets: Int,
                        committed: Seq[Int]): Dataset[Turn] = {
    import turns.sparkSession.implicits._
    val done = committed.toDF("bucket")
    turns.withColumn("bucket", bucketCol(nBuckets))
      .join(broadcast(done), Seq("bucket"), "left_anti")
      .drop("bucket")
      .as[Turn]
  }

  /** The lineage/metrics surface: one row per committed bucket manifest
    * (bucket, rows, bytes, inputFingerprint, version).
    */
  def readManifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read
      .schema("bucket INT, rows BIGINT, bytes BIGINT, " +
        "inputFingerprint STRING, version STRING")
      .json(s"$outDir/_manifest/bucket-*.json")

  /** Read back a checkpointed table, restricted to committed buckets. */
  def readCommitted(spark: SparkSession, outDir: String): DataFrame = {
    val catalog = new HadoopManifestCatalog(
      outDir, spark.sparkContext.hadoopConfiguration)
    val done = catalog.committedBuckets().toSeq
    spark.read.parquet(outDir).filter(col("bucket").isin(done: _*))
  }
}
