package graft

import graft.streaming.DedupStream
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the quiet river bank today " +
    "while morning light spreads across the valley and distant hills glow softly under a pale winter sun " +
    "as birds begin their familiar songs in the tall oak trees beside the old stone bridge"
  private val nearDup = base.replace("quiet", "silent")
  private val other = "completely different words about spark catalyst optimizer plans and shuffles everywhere"

  test("incremental index catches cross-batch near-dups; replays are idempotent") {
    val root = Files.createTempDirectory("graft-dstream").toString
    val (indexDir, pairsDir) = (s"$root/index", s"$root/pairs")
    def batch(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

    // batch 1: base + unrelated — no pairs yet, index gets 2 docs
    val w1 = DedupStream.processBatch(batch(1L -> base, 3L -> other),
      indexDir, pairsDir, n = 5, numPerms = 64, bands = 16, threshold = 0.3)
    assert(w1 === 0L)
    assert(spark.read.parquet(s"$indexDir/sigs").count() === 2L)

    // batch 2: the near-dup of doc 1 arrives later → cross-batch pair found
    // via the persisted band index, plus an exact duplicate of doc 3
    val w2 = DedupStream.processBatch(batch(2L -> nearDup, 4L -> other),
      indexDir, pairsDir, n = 5, numPerms = 64, bands = 16, threshold = 0.3)
    assert(w2 === 2L)
    val pairs = spark.read.parquet(pairsDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)))

    // replay of batch 2 (checkpoint recovery): nothing recomputed, nothing
    // duplicated — docs are already indexed, pairs already written
    val w3 = DedupStream.processBatch(batch(2L -> nearDup, 4L -> other),
      indexDir, pairsDir, n = 5, numPerms = 64, bands = 16, threshold = 0.3)
    assert(w3 === 0L)
    assert(spark.read.parquet(pairsDir).count() === 2L)
    assert(spark.read.parquet(s"$indexDir/sigs").count() === 4L)
    // band index is partitioned for pruned probes; the id ledger has one
    // row per doc and no duplicates even across the replay
    val bandDirs = new java.io.File(s"$indexDir/bands").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(bandDirs.nonEmpty && bandDirs.forall(_.startsWith("band=")))
    assert(spark.read.parquet(s"$indexDir/ids").distinct().count() === 4L)
    assert(spark.read.parquet(s"$indexDir/ids").count() === 4L)
    assert(spark.read.parquet(s"$indexDir/bands").count() === 4L * 16)
  }

  test("band-store probe scans only the batch's (band, kb) partitions") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-dprune").toString
    val (indexDir, pairsDir) = (s"$root/index", s"$root/pairs")
    def batch(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    DedupStream.processBatch(batch(1L -> base, 3L -> other),
      indexDir, pairsDir, n = 5, numPerms = 64, bands = 16, threshold = 0.3)
    val totalFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$indexDir/bands"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    // probe with a copy of doc 1: its (band, kb) combos miss most of the
    // unrelated doc 3's buckets, so the pruned scan must list fewer files
    val sigs = graft.operators.Dedup.minhashSignatures(batch(5L -> base), 5, 64)
    val nb = graft.operators.Dedup.bandKeys(sigs, 64, 16, stringKey = true)
      .withColumn("kb", pmod(xxhash64(col("key")), lit(DedupStream.KeyBuckets)))
    val pruned = DedupStream.pruneToBatchCombos(
      spark.read.parquet(s"$indexDir/bands"), nb)
    // collect() (not count()) so the metrics below come from THIS plan
    val hits = pruned.collect()
    assert(hits.length >= 16) // doc 1's 16 identical band rows are all retained
    val scans = pruned.queryExecution.executedPlan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scanned = scans.head.metrics("numFiles").value
    assert(scanned > 0 && scanned < totalFiles,
      s"scanned $scanned of $totalFiles files — partition pruning did not engage")
  }

  test("the dataflow is backend-agnostic: true-upsert stores behave like parquet") {
    val root = Files.createTempDirectory("graft-dstream3").toString
    val pairsDir = s"$root/pairs"
    val stores = DedupStream.IndexStores(
      ids = new graft.sink.InMemoryKeyedStore,
      bands = new graft.sink.InMemoryKeyedStore,
      sigs = new graft.sink.InMemoryKeyedStore)
    def batch(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    assert(DedupStream.processBatch(batch(1L -> base, 3L -> other),
      stores, pairsDir, n = 5, numPerms = 64, bands = 16, threshold = 0.3) === 0L)
    assert(DedupStream.processBatch(batch(2L -> nearDup, 4L -> other),
      stores, pairsDir, n = 5, numPerms = 64, bands = 16, threshold = 0.3) === 2L)
    val pairs = spark.read.parquet(pairsDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)))
    // replay is a no-op against the upsert backend too
    assert(DedupStream.processBatch(batch(2L -> nearDup, 4L -> other),
      stores, pairsDir, n = 5, numPerms = 64, bands = 16, threshold = 0.3) === 0L)
    assert(spark.read.parquet(pairsDir).count() === 2L)
    assert(stores.sigs.read(spark).get.count() === 4L)
    assert(stores.ids.read(spark).get.distinct().count() === 4L)
    assert(stores.ids.read(spark).get.count() === 4L)
    assert(stores.bands.read(spark).get.count() === 4L * 16)
  }

  test("in-memory keyed store: the NEW row wins a key collision") {
    val s = new graft.sink.InMemoryKeyedStore
    s.upsert(Seq((1L, "v1")).toDF("k", "v"), Seq("k"))
    s.upsert(Seq((1L, "v2"), (2L, "w")).toDF("k", "v"), Seq("k"))
    val got = s.read(spark).get.as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "v2", 2L -> "w")) // MERGE shape: update replaces
    s.append(Seq((3L, "x")).toDF("k", "v"))
    assert(s.read(spark).get.count() === 3L)
  }

  test("streaming wiring: two micro-batches through foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-dstream2").toString
    val stream = MemoryStream[(Long, String)]
    val q = DedupStream.start(stream.toDF().toDF("doc_id", "text"),
      s"$root/index", s"$root/pairs", s"$root/ckpt", threshold = 0.3)
    try {
      stream.addData(1L -> base, 3L -> other)
      q.processAllAvailable()
      stream.addData(2L -> nearDup)
      q.processAllAvailable()
      val pairs = spark.read.parquet(s"$root/pairs")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 2L)))
    } finally q.stop()
  }
}
