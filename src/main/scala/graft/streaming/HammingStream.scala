package graft.streaming

import graft.operators.Dedup
import graft.sink.{EpochKeyedStore, IdempotentSink, KeyedStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Incremental banded-Hamming near-duplicate detection over a STREAM of
  * 64-bit sketches — the continuously-running form of
  * [[graft.operators.Dedup.bandedHamming64Pairs]], closing the ingest
  * loop for the sketch modalities [[DedupStream]] (MinHash bands) does
  * not cover: text SimHash ([[Dedup.simhash64Portable]]) and image pHash
  * ([[graft.sources.Multimodal.perceptualHashes]]) both produce the
  * (id, lo, hi) shape this front door indexes, so re-encoded images and
  * boilerplate-templated text are caught AT INGEST against everything
  * seen so far — the reference's dedup-scan-before-append discipline
  * (write_pipeline.py:151-183), applied to sketch near-dup instead of
  * exact row ids.
  *
  * State under `indexDir` — two [[EpochKeyedStore]] tables:
  *   - `ids/`   — ledger of indexed ids, written LAST per batch (same
  *                replay contract as [[DedupStream]]: a doc reaches the
  *                ledger only if the whole batch landed before it);
  *   - `bands/` — (id, band, kb, key, lo, hi): the four 16-bit band
  *                postings with the full sketch DENORMALIZED onto each
  *                row, so the history probe verifies exact Hamming
  *                distance from the posting itself — no second store
  *                round-trip per batch. Partitioned (band, kb) on the
  *                fold tiers only (flat deltas — the [[DedupStream]]
  *                band-store lesson).
  *
  * Per batch: ledger anti-join → within-batch pairs via the chunk-
  * hardened batch join (identical code path, so the crowd discipline
  * and its ScaleCheck gates apply verbatim) → new×history candidates
  * via a (band, kb, key) equi-join against the pruned posting store →
  * exact bit_count verify → pairs append idempotently → bands upsert →
  * ledger append. Within-batch and cross-batch pairs are disjoint by
  * construction (fresh is anti-joined against the ledger), and the
  * 4×16 banding is complete to Hamming ≤ 3 across the split — any
  * qualifying pair shares a band whichever batches its ends arrived
  * in — so a replayed corpus yields EXACTLY the batch operator's pairs
  * (spec-pinned).
  *
  * Scale posture: index writes are one flat O(batch) delta per batch;
  * the probe prunes to the (band, kb) combos the batch hashes into.
  * The history-probe join is chunk-hardened on BOTH sides: the batch
  * side rides [[Dedup.bandedHamming64Pairs]]'s chunking for its
  * within-batch pairs, and the pruned history slice splits into
  * id-ordered 512-row chunks per (band, key) before the probe join —
  * a hot history key (a flat-color crowd accumulated over months)
  * spreads its per-batch candidates across |key postings|/512 tasks
  * instead of one, spread-gated by the DedupScaleCheck hot-history
  * probe.
  */
object HammingStream {

  /** Key-hash fan-out of the band store — the probe's pruning granularity
    * (shared shape with [[DedupStream.KeyBuckets]]). */
  val KeyBuckets = 64

  final case class HammingStores(ids: KeyedStore, bands: KeyedStore) {
    def maintain(spark: SparkSession): Unit = {
      ids.maintain(spark); bands.maintain(spark)
    }
  }

  def epochStores(indexDir: String, compactAfterDeltas: Int = 6,
                  deferCompaction: Boolean = false): HammingStores = HammingStores(
    ids = new EpochKeyedStore(s"$indexDir/ids", mergeKeys = Seq("id"),
      compactAfterDeltas = compactAfterDeltas, deferCompaction = deferCompaction,
      fullCompactEvery = 4),
    bands = new EpochKeyedStore(s"$indexDir/bands",
      mergeKeys = Seq("id", "band", "kb"), partitionCols = Seq("band", "kb"),
      partitionDeltas = false,
      coalesceTo = None, compactAfterDeltas = compactAfterDeltas,
      deferCompaction = deferCompaction, fullCompactEvery = 4))

  /** The four 16-bit band keys of a (id, lo, hi) sketch relation, plus
    * the kb pruning bucket, sketch denormalized onto every row.
    * Package-visible so the DedupScaleCheck hot-history gate can build
    * the probe input the way the batch body does. */
  private[graft] def bandPostings(sketches: DataFrame): DataFrame =
    sketches.select(col("id"), col("lo"), col("hi"),
      explode(array(
        struct(lit(0).as("band"), col("lo").bitwiseAND(0xFFFFL).as("key")),
        struct(lit(1).as("band"),
          call_function("shiftright", col("lo"), lit(16)).bitwiseAND(0xFFFFL).as("key")),
        struct(lit(2).as("band"), col("hi").bitwiseAND(0xFFFFL).as("key")),
        struct(lit(3).as("band"),
          call_function("shiftright", col("hi"), lit(16)).bitwiseAND(0xFFFFL).as("key"))
      )).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"),
        col("lo"), col("hi"))
      .withColumn("kb", pmod(xxhash64(col("key")), lit(KeyBuckets)))

  /** New×history candidate probe, BEFORE the pair dedup — one row per
    * (pair, agreeing band meeting). `newBands`/`idx` are band-posting
    * relations ([[bandPostings]] shape; `idx` already pruned to the
    * batch's combos).
    *
    * Hot-history hardening ([[Dedup.bandedHamming64PairsRaw]]'s
    * 512-chunk discipline applied to the pruned history slice): a
    * months-old flat-color/boilerplate crowd on ONE (band, key) would
    * otherwise meet the whole batch in one join task. Each key's
    * history postings split into id-ordered 512-row chunks; batch
    * postings fan across their key's OBSERVED chunk ids (a 1-posting
    * key fans ×1), and the probe join distributes over
    * (band, key, hcid). The explicit-count repartition anchors the
    * spread against AQE coalescing and the shuffle_hash hints pin the
    * strategy so no small side broadcasts the chunked exchange out of
    * the join — both hazards measured and gated on the batch operator
    * (NOTES_r11 §4). Exposed pre-dedup so the DedupScaleCheck
    * hot-history gate can census rows per task at the join output (the
    * dedup exchange re-hashes on the pair key and would erase the
    * spread being asserted).
    */
  private[graft] def historyPairsRaw(newBands: DataFrame, idx: DataFrame,
                                     maxHamming: Int): DataFrame = {
    val spark = newBands.sparkSession
    val chunk = 512
    val parts = spark.sessionState.conf.numShufflePartitions
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("key")).orderBy(col("id"))
    val hx = idx
      .withColumn("hcid", ((row_number().over(wKey) - 1) / chunk).cast("long"))
      .repartition(parts, col("band"), col("key"), col("hcid"))
    val hchunks = hx.select(col("band"), col("kb"), col("key"), col("hcid"))
      .distinct()
    val probes = newBands
      .join(hchunks.hint("shuffle_hash"), Seq("band", "kb", "key"))
    probes
      .join(hx.select(col("band"), col("key"), col("hcid"),
          col("id").as("hid"), col("lo").as("hlo"), col("hi").as("hhi"))
          .hint("shuffle_hash"),
        Seq("band", "key", "hcid"))
      .where(col("id") =!= col("hid"))
      .select(least(col("id"), col("hid")).as("id_a"),
        greatest(col("id"), col("hid")).as("id_b"),
        (bit_count(col("lo").bitwiseXOR(col("hlo"))) +
          bit_count(col("hi").bitwiseXOR(col("hhi")))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Process one micro-batch of 64-bit sketches (columns: id long,
    * lo long, hi long — e.g. [[Dedup.simhash64Portable]] output renamed,
    * or [[graft.sources.Multimodal.perceptualHashes]]) against the
    * persisted index. Returns the number of new near-dup pairs written.
    */
  def processBatch(sketches: DataFrame, stores: HammingStores, pairsDir: String,
                   maxHamming: Int = 3): Long = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4×16-bit banding is complete only up to Hamming 3")
    val spark = sketches.sparkSession
    val fresh0 = stores.ids.read(spark) match {
      case Some(ex) => sketches.join(ex.select("id").distinct(), Seq("id"), "left_anti")
      case None => sketches
    }
    val fresh = fresh0.cache()
    try {
      if (fresh.isEmpty) return 0L
      val newBands = bandPostings(fresh)
      // within-batch pairs ride the batch operator itself — identical
      // banding, chunk-hardening, and dedup semantics
      val nn = Dedup.bandedHamming64Pairs(fresh, maxHamming)
        .select(col("id_a"), col("id_b"), col("hamming"))
      // new × history: equi-join on (band, kb, key) against the pruned
      // posting store; the posting carries the historical sketch, so the
      // exact verify needs no second store read
      val nh = stores.bands.read(spark) match {
        case Some(idx0) =>
          historyPairsRaw(newBands, DedupStream.pruneToBatchCombos(idx0, newBands),
            maxHamming).dropDuplicates("id_a", "id_b")
        case None => nn.limit(0)
      }
      // within-batch and history pairs are disjoint in the HAPPY path
      // (fresh is ledger-anti-joined), but a crashed batch that upserted
      // bands and lost the ids append re-ingests its docs as "fresh" —
      // a pair can then arrive from BOTH legs, and appendDedup only
      // anti-joins against the sink, not within the batch
      val pairs = nn.unionByName(nh)
        .select(concat_ws("_", col("id_a"), col("id_b")).as("id"),
          col("id_a"), col("id_b"), col("hamming"))
        .dropDuplicates("id")
      val written = IdempotentSink.appendDedup(pairs, pairsDir)
      // bands upsert replay-idempotently at (id, band) granularity; the
      // ledger lands LAST as an unchecked append (fresh was anti-joined
      // against it at the top) — do not reorder these writes
      stores.bands.upsert(newBands, Seq("id", "band"))
      stores.ids.append(fresh.select("id"))
      written
    } finally { fresh.unpersist(); () }
  }

  /** Wire the incremental sketch near-dup onto a STREAM of (id, lo, hi)
    * sketches — [[DedupStream.start]]'s shape for the sketch modalities:
    * long-lived deferred-compaction stores (the write path never folds;
    * `maintain` after every batch — including empty ones — harvests and
    * publishes background folds at quiescent points), one persisted
    * micro-batch frame so the ledger anti-join and the band derivations
    * read one materialization.
    */
  def start(sketches: DataFrame, indexDir: String, pairsDir: String,
            checkpointDir: String, maxHamming: Int = 3): StreamingQuery = {
    val stores = epochStores(indexDir, deferCompaction = true)
    sketches.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val batch = b.persist()
        try {
          if (!batch.isEmpty) {
            processBatch(batch, stores, pairsDir, maxHamming)
            ()
          }
        } finally { batch.unpersist(); () }
        stores.maintain(batch.sparkSession)
      }
      .start()
  }

  /** TEXT front door: gate → sketch → index → pairs over a document
    * stream (columns: doc_id long, text string) — the SimHash sibling of
    * [[DedupStream.start]]'s gated MinHash ingest, sharing its
    * [[DedupStream.DocGate]] (rejects quarantined with reasons, never
    * indexed; the quarantine write is id-deduped so a replayed batch
    * re-rejects without duplicating audit rows).
    */
  def startText(docs: DataFrame, indexDir: String, pairsDir: String,
                checkpointDir: String, maxHamming: Int = 3,
                docGate: Option[DedupStream.DocGate] = None): StreamingQuery = {
    val stores = epochStores(indexDir, deferCompaction = true)
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val batch = b.persist()
        try {
          if (!batch.isEmpty) {
            // one cached triage pass, DedupStream's gate discipline:
            // rejects land id-deduped with reasons, admitted docs sketch
            val triage = docGate.map(g =>
              DedupStream.triageBatch(batch, Some(g), None))
            try {
              val admitted = triage.fold(batch)(
                DedupStream.writeTriage(_, docGate, None))
              val sk = graft.operators.Dedup.simhash64Portable(admitted)
                .select(col("doc_id").as("id"), col("simhash_lo").as("lo"),
                  col("simhash_hi").as("hi"))
              processBatch(sk, stores, pairsDir, maxHamming)
              ()
            } finally { triage.foreach(_.unpersist()); () }
          }
        } finally { batch.unpersist(); () }
        stores.maintain(batch.sparkSession)
      }
      .start()
  }
}
