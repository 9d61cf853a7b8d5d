package graft.streaming

import graft.operators.Dedup
import graft.sink.IdempotentSink
import org.apache.spark.sql.{AnalysisException, Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Incremental MinHash-LSH near-duplicate detection over a document STREAM —
  * the continuously-running form of [[graft.operators.Dedup.minhashLshPairs]]
  * for a training-data ingest pipeline: every micro-batch of new documents is
  * checked against everything seen so far, without ever recomputing the
  * historical corpus.
  *
  * State is a persisted band index (doc_id, band, key) partitioned by band,
  * plus stored signatures — both append-only parquet, deduped by doc_id on
  * replay, so the stream is idempotent under checkpoint recovery. Per batch:
  *
  *   1. signatures + band keys for the NEW docs only;
  *   2. candidates = new×new (band self-join) ∪ new×index (probe the
  *      persisted band index — an equi-join on (band, key) that touches only
  *      the index partitions the new keys hash into);
  *   3. exact est_jaccard verify from stored signatures, emit pairs ≥
  *      threshold to `pairsDir` (idempotent append keyed "a_b");
  *   4. append the new docs' bands + signatures to the index.
  *
  * At corpus scale the index probe is the whole point: cost is proportional
  * to the NEW batch and its bucket collisions, never to corpus size.
  */
object DedupStream {

  private def readOpt(spark: SparkSession, dir: String): Option[DataFrame] =
    try Some(spark.read.parquet(dir)) catch { case _: AnalysisException => None }

  /** Band key as a portable string (parquet/partition friendly). */
  private def bandKeys(sigs: DataFrame, numPerms: Int, bands: Int): DataFrame = {
    val rows = numPerms / bands
    sigs.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          concat_ws(",", transform(slice(col("sig"), b * rows + 1, lit(rows)),
            _.cast("string"))).as("key")))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  private def estJaccard(numPerms: Int): Column =
    round((0 until numPerms).map(p =>
      when(element_at(col("sig_a"), p + 1) === element_at(col("sig_b"), p + 1), 1)
        .otherwise(0)).reduce(_ + _).cast("double") / lit(numPerms.toDouble), 4)

  /** Process one batch of new documents against the persisted index.
    * Returns the number of new near-dup pairs written. Package-visible so
    * the spec can drive it without a streaming harness.
    */
  private[graft] def processBatch(batch: DataFrame, indexDir: String, pairsDir: String,
                                  n: Int, numPerms: Int, bands: Int,
                                  threshold: Double): Long = {
    val spark = batch.sparkSession
    val sigsDir = s"$indexDir/sigs"
    val bandsDir = s"$indexDir/bands"
    // replay safety: drop docs already indexed BEFORE computing anything
    val seenIds = readOpt(spark, sigsDir).map(_.select("doc_id"))
    val fresh = seenIds.fold(batch)(s => batch.join(s, Seq("doc_id"), "left_anti"))
    val newSigs = Dedup.minhashSignatures(fresh, n, numPerms)
      .repartition(col("doc_id")).cache()
    try {
      if (newSigs.isEmpty) return 0L
      val newBands = bandKeys(newSigs, numPerms, bands)
      // new × new candidates within the batch
      val nn = newBands.as("a").join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      // new × history candidates via the persisted band index; the join key
      // includes the partition column `band`, so the probe prunes to the
      // band partitions the new keys live in
      val nh = readOpt(spark, bandsDir) match {
        case Some(idx) =>
          newBands.as("a").join(idx.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.doc_id") =!= col("b.doc_id"))
            .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
              greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        case None => nn.limit(0)
      }
      val cand = nn.union(nh).distinct()
      val allSigs = readOpt(spark, sigsDir).fold(newSigs)(old =>
        newSigs.unionByName(old.select("doc_id", "sig")))
      val pairs = cand
        .join(allSigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(allSigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .withColumn("est_jaccard", estJaccard(numPerms))
        .where(col("est_jaccard") >= threshold)
        .select(concat_ws("_", col("doc_a"), col("doc_b")).as("id"),
          col("doc_a"), col("doc_b"), col("est_jaccard"))
      val written = IdempotentSink.appendDedup(pairs, pairsDir)
      // index updates last: a replayed batch re-dedups against `seenIds`
      newBands.write.mode(SaveMode.Append).partitionBy("band").parquet(bandsDir)
      newSigs.write.mode(SaveMode.Append).parquet(sigsDir)
      written
    } finally { newSigs.unpersist(); () }
  }

  /** Wire the incremental dedup onto a document stream
    * (columns: doc_id long, text string). */
  def start(docs: DataFrame, indexDir: String, pairsDir: String, checkpointDir: String,
            n: Int = 5, numPerms: Int = 64, bands: Int = 16,
            threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          processBatch(batch, indexDir, pairsDir, n, numPerms, bands, threshold)
        ()
      }
      .start()
}
