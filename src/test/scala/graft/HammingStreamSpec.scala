package graft

import graft.operators.Dedup
import graft.streaming.HammingStream
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HammingStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sketch corpus with a controlled Hamming ladder around two seeds:
    * per seed, perturbations at distances 0..5 (bit flips spread across
    * both halves so every band participates), plus distant noise. */
  private def ladder(): Seq[(Long, Long, Long)] = {
    val s1 = 0x0123456789ABCDEFL
    val s2 = 0x0FF0123456789ABCL
    def flip(v: Long, bits: Seq[Int]) = bits.foldLeft(v)((a, b) => a ^ (1L << b))
    Seq(
      (1L, s1, s2),                                  // seed A
      (2L, s1, s2),                                  // distance 0 copy
      (3L, flip(s1, Seq(3)), s2),                    // distance 1
      (4L, flip(s1, Seq(3)), flip(s2, Seq(40))),     // distance 2
      (5L, flip(s1, Seq(3, 17)), flip(s2, Seq(40))), // distance 3
      (6L, flip(s1, Seq(3, 17)), flip(s2, Seq(40, 55))), // distance 4 from A
      (7L, ~s1, s2),                                 // far from everything
      (8L, s2, s1),                                  // seed B (swapped halves)
      (9L, s2, flip(s1, Seq(60)))                    // distance 1 from B
    )
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet

  test("replayed corpus yields exactly the batch operator's pairs (new×new + new×history)") {
    val root = Files.createTempDirectory("graft-hstream").toString
    val stores = HammingStream.epochStores(s"$root/index")
    val all = ladder()
    val full = all.toDF("id", "lo", "hi")
    // three interleaved batches: ladder members split across batches so
    // most qualifying pairs are CROSS-batch (the history probe's job)
    val batches = Seq(
      all.filter(_._1 % 3 == 1), all.filter(_._1 % 3 == 2), all.filter(_._1 % 3 == 0))
    batches.foreach { b =>
      HammingStream.processBatch(b.toDF("id", "lo", "hi"), stores, s"$root/pairs")
    }
    val streamed = pairsOf(spark.read.parquet(s"$root/pairs"))
    val batch = pairsOf(Dedup.bandedHamming64Pairs(full, 3))
    assert(batch.nonEmpty && streamed === batch)
    // sanity: the fixture exercises BOTH joins — some pair within one
    // batch, some pair across batches
    val batchOf = all.map(t => t._1 -> t._1 % 3).toMap
    assert(streamed.exists(p => batchOf(p._1) == batchOf(p._2)))
    assert(streamed.exists(p => batchOf(p._1) != batchOf(p._2)))
    // replay of the last batch: full no-op (ledger short-circuit)
    val again = HammingStream.processBatch(
      batches.last.toDF("id", "lo", "hi"), stores, s"$root/pairs")
    assert(again === 0L)
    assert(pairsOf(spark.read.parquet(s"$root/pairs")) === batch)
  }

  test("text SimHash front door: streamed pairs match simhashPairsPortable") {
    val root = Files.createTempDirectory("graft-hstream-txt").toString
    val stores = HammingStream.epochStores(s"$root/index")
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank " +
      "while morning light spreads across the valley and distant hills glow softly"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("quiet", "silent")),
      (3L, base.replace("quick", "rapid").replace("lazy", "idle")),
      (4L, "entirely unrelated content about catalyst optimizer rules and shuffles")
    )
    // batch 1: docs 1 and 4; batch 2: docs 2 and 3 (cross-batch pairs)
    Seq(docs.filter(d => d._1 == 1L || d._1 == 4L), docs.filter(d => d._1 == 2L || d._1 == 3L))
      .foreach { b =>
        val sk = Dedup.simhash64Portable(b.toDF("doc_id", "text"))
          .select(col("doc_id").as("id"), col("simhash_lo").as("lo"),
            col("simhash_hi").as("hi"))
        HammingStream.processBatch(sk, stores, s"$root/pairs")
      }
    val streamed = pairsOf(spark.read.parquet(s"$root/pairs"))
    val batch = Dedup.simhashPairsPortable(docs.toDF("doc_id", "text"), 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("2-session restart e2e: index survives, replay no-op, pairs equal the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-hrunner").toString
    val cfg = graft.app.IngestRunner.Config(s"$root/index", s"$root/pairs",
      s"$root/ckpt1", s"$root/syslog")
    val all = ladder()
    val b1 = all.filter(_._1 <= 4)
    val b2 = all.filter(t => t._1 > 4 && t._1 <= 7)
    val b3 = all.filter(_._1 > 7)
    // SESSION 1: supervised front door, two micro-batches, clean stop
    val s1 = MemoryStream[(Long, Long, Long)]
    val r1 = graft.app.IngestRunner.startSketches(
      s1.toDF().toDF("id", "lo", "hi"), cfg)
    try {
      s1.addData(b1: _*); r1.query.processAllAvailable()
      s1.addData(b2: _*); r1.query.processAllAvailable()
    } finally r1.stop()
    val afterS1 = pairsOf(spark.read.parquet(s"$root/pairs"))
    // SESSION 2: a NEW runner over the SAME index/pairs dirs (the restart:
    // fresh store handles, fresh checkpoint — a memory source cannot
    // resume offsets, so the at-least-once contract is modeled by
    // REPLAYING batch 2 before the new batch arrives)
    val s2 = MemoryStream[(Long, Long, Long)]
    val r2 = graft.app.IngestRunner.startSketches(
      s2.toDF().toDF("id", "lo", "hi"),
      cfg.copy(checkpointDir = s"$root/ckpt2"))
    try {
      s2.addData(b2: _*); r2.query.processAllAvailable() // replay: ledger no-op
      assert(pairsOf(spark.read.parquet(s"$root/pairs")) === afterS1)
      s2.addData(b3: _*); r2.query.processAllAvailable()
    } finally r2.stop()
    // the union of both sessions' pairs is EXACTLY the batch operator's
    val batch = pairsOf(Dedup.bandedHamming64Pairs(all.toDF("id", "lo", "hi"), 3))
    assert(pairsOf(spark.read.parquet(s"$root/pairs")) === batch)
    // ledger survived the restart: every id indexed exactly once
    val stores = HammingStream.epochStores(s"$root/index")
    assert(stores.ids.read(spark).get.count() === all.size.toLong)
    assert(stores.ids.read(spark).get.select("id").distinct().count() === all.size.toLong)
    // ops channel: both sessions logged their front-door startup row
    val log = spark.read.parquet(s"$root/syslog")
      .where(col("event") === "ingest_start")
    assert(log.count() === 2L)
  }

  test("supervise fronts the ingest runner: a failed first attempt restarts and completes") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-hsupervise").toString
    val cfg = graft.app.IngestRunner.Config(s"$root/index", s"$root/pairs",
      s"$root/ckpt", s"$root/syslog")
    val stream = MemoryStream[(Long, Long, Long)]
    stream.addData(ladder(): _*)
    @volatile var live: graft.app.IngestRunner.Running = null
    var attempts = 0
    val mk: () => graft.app.StreamRunner.Supervised = () => {
      attempts += 1
      if (attempts == 1) throw new RuntimeException("injected start failure")
      val r = graft.app.IngestRunner.startSketches(
        stream.toDF().toDF("id", "lo", "hi"), cfg)
      live = r
      r
    }
    @volatile var outcome: graft.app.StreamRunner.Outcome = null
    val t = new Thread(() => {
      outcome = graft.app.StreamRunner.supervise(mk,
        graft.recover.RetryPolicy.Config(baseDelayMs = 1L, maxAttempts = 3),
        _ => ())
    })
    t.start()
    val deadline = System.currentTimeMillis() + 30000
    while (live == null && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(live != null, "supervised ingest query never started")
    live.query.processAllAvailable()
    live.query.stop() // clean stop → supervise completes
    t.join(30000)
    assert(outcome === graft.app.StreamRunner.Completed(1))
    val batch = pairsOf(Dedup.bandedHamming64Pairs(ladder().toDF("id", "lo", "hi"), 3))
    assert(pairsOf(spark.read.parquet(s"$root/pairs")) === batch)
  }

  test("gated text front door: rejects stay out of the sketch index; pairs match the batch operator on admitted docs") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-htext-gate").toString
    val cfg = graft.app.IngestRunner.Config(s"$root/index", s"$root/pairs",
      s"$root/ckpt", s"$root/syslog")
    val base = "the quick brown fox jumps over the lazy dog near the quiet river bank " +
      "while morning light spreads across the valley and distant hills glow softly"
    val piiDoc = base + " contact someone@example.com now"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("quiet", "silent")),
      (3L, piiDoc)) // rejected at the door — never sketched or indexed
    val gate = graft.streaming.DedupStream.DocGate(s"$root/rejects")
    val stream = MemoryStream[(Long, String)]
    val r = graft.app.IngestRunner.startText(
      stream.toDF().toDF("doc_id", "text"), cfg, docGate = Some(gate))
    try {
      stream.addData(docs: _*)
      r.query.processAllAvailable()
    } finally r.stop()
    val streamed = pairsOf(spark.read.parquet(s"$root/pairs"))
    val admitted = docs.filter(_._1 <= 2L)
    val batch = Dedup.simhashPairsPortable(admitted.toDF("doc_id", "text"), 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch && streamed.nonEmpty)
    assert(spark.read.parquet(s"$root/rejects")
      .select("doc_id").as[Long].collect().toSet === Set(3L))
    val stores = HammingStream.epochStores(s"$root/index")
    assert(stores.ids.read(spark).get.as[Long].collect().toSet === Set(1L, 2L))
  }

  test("sustained ingest: deferred compaction keeps the band-store delta tier bounded (cadence gate)") {
    // the r12-verdict carry-over: under sustained ingest the per-batch
    // maintain step must keep FOLDING — the delta tier (and hence the
    // read-side merge window) must saw-tooth, not grow with batch count.
    // One batch per ladder id => 9 delta writes against
    // compactAfterDeltas=2, exactly the compaction-pressure regime.
    val root = Files.createTempDirectory("graft-hstream").toString
    val stores = HammingStream.epochStores(s"$root/index",
      compactAfterDeltas = 2, deferCompaction = true)
    val all = ladder()
    def committed(tier: String): Array[String] = {
      val d = new java.io.File(s"$root/index/bands/$tier")
      if (!d.exists) Array.empty
      else d.listFiles().filter(e => new java.io.File(e, "_COMMIT").exists)
        .map(_.getName).sorted
    }
    val observed = all.map { row =>
      HammingStream.processBatch(Seq(row).toDF("id", "lo", "hi"),
        stores, s"$root/pairs")
      stores.maintain(spark) // the start() loop's per-batch step
      committed("delta").length
    }
    stores.ids.asInstanceOf[graft.sink.EpochKeyedStore].awaitMaintenance(spark)
    stores.bands.asInstanceOf[graft.sink.EpochKeyedStore].awaitMaintenance(spark)
    stores.maintain(spark)
    // folds actually ran off the write path and published
    assert(committed("base").nonEmpty || committed("merge").nonEmpty,
      "no background fold ever published under sustained ingest")
    // the saw-tooth: mid-run sweeps kept the tier from tracking batch count
    assert(observed.max < all.length,
      s"delta tier grew monotonically with ingest: $observed")
    // after draining, at most one fold-threshold of deltas remains
    assert(committed("delta").length <= 3,
      s"delta tier not reclaimed after drain: ${committed("delta").toSeq}")
    // and the streamed pair set still equals the batch operator's
    val streamed = pairsOf(spark.read.parquet(s"$root/pairs"))
    val batch = pairsOf(Dedup.bandedHamming64Pairs(all.toDF("id", "lo", "hi"), 3))
    assert(batch.nonEmpty && streamed === batch)
  }

  test("band deltas are flat; the probe prunes to the batch's (band, kb) combos") {
    val root = Files.createTempDirectory("graft-hstream-prune").toString
    val indexDir = s"$root/index"
    val stores = HammingStream.epochStores(indexDir)
    HammingStream.processBatch(ladder().toDF("id", "lo", "hi"), stores, s"$root/pairs")
    val bandDelta = new java.io.File(s"$indexDir/bands/delta").listFiles()
      .filter(_.isDirectory).head
    assert(!bandDelta.listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("band=")))
    // empty second batch: no pairs, no new ledger rows
    val w = HammingStream.processBatch(
      Seq.empty[(Long, Long, Long)].toDF("id", "lo", "hi"), stores, s"$root/pairs")
    assert(w === 0L)
    assert(stores.ids.read(spark).get.count() === ladder().size.toLong)
  }
}
