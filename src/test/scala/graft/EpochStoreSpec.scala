package graft

import graft.sink.{EpochKeyedStore, ParquetKeyedStore}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class EpochStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-epoch").toString + "/store"

  /** Run `body` with AQE off: the merge-window plan gains an exchange, and
    * AQE wraps executed scans in query stages `collectWithSubqueries`
    * cannot see — the scan-metric assertions need the plain plan. */
  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def deltaDirs(dir: String) = {
    val f = new java.io.File(s"$dir/delta")
    if (!f.exists()) Array.empty[String] else f.listFiles().filter(_.isDirectory).map(_.getName)
  }
  private def baseDirs(dir: String) = {
    val f = new java.io.File(s"$dir/base")
    if (!f.exists()) Array.empty[String] else f.listFiles().filter(_.isDirectory).map(_.getName)
  }
  private def mergeDirs(dir: String) = {
    val f = new java.io.File(s"$dir/merge")
    if (!f.exists()) Array.empty[String] else f.listFiles().filter(_.isDirectory).map(_.getName)
  }

  test("MERGE semantics: the NEW row wins a key collision, appends accumulate") {
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"))
    s.upsert(Seq((1L, "v1")).toDF("k", "v"), Seq("k"))
    s.upsert(Seq((1L, "v2"), (2L, "w")).toDF("k", "v"), Seq("k"))
    val got = s.read(spark).get.as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "v2", 2L -> "w")) // same contract InMemoryKeyedStore pins
    s.append(Seq((3L, "x")).toDF("k", "v"))
    assert(s.read(spark).get.count() === 3L)
    // each write is one committed delta epoch; no base until compaction
    assert(deltaDirs(dir).sorted === Array("epoch=1", "epoch=2", "epoch=3"))
    assert(baseDirs(dir).isEmpty)
  }

  test("uncommitted epochs are invisible: a crashed write never surfaces") {
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"))
    s.upsert(Seq((1L, "v1")).toDF("k", "v"), Seq("k"))
    // simulate a crash mid-write: stage a delta WITHOUT its _COMMIT marker
    Seq((9L, "ghost")).toDF("k", "v").write.parquet(s"$dir/delta/epoch=99")
    assert(s.read(spark).get.as[(Long, String)].collect().toMap === Map(1L -> "v1"))
    // the next real write allocates ABOVE the crashed stage (no collision)
    s.upsert(Seq((2L, "w")).toDF("k", "v"), Seq("k"))
    assert(deltaDirs(dir).contains("epoch=100"))
    assert(s.read(spark).get.count() === 2L)
  }

  test("auto-compaction folds deltas into a base and bounds the files a read scans") {
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"), compactAfterDeltas = 3)
    (1 to 5).foreach(i => s.upsert(Seq((i.toLong, s"v$i")).toDF("k", "v"), Seq("k")))
    // 4th delta crossed the threshold → compacted at epoch 4; 5th is a new delta
    assert(baseDirs(dir) === Array("epoch=4"))
    assert(deltaDirs(dir) === Array("epoch=5"))
    withoutAqe {
      val merged = s.read(spark).get
      val rows = merged.collect()
      assert(rows.length === 5)
      // the read's scans list base + one delta — NOT one file per historical batch
      val scans = merged.queryExecution.executedPlan.collectWithSubqueries {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      val scanned = scans.map(_.metrics("numFiles").value).sum
      assert(scanned === 2L, s"read listed $scanned files; compaction should bound it at 2")
    }
    // update an already-compacted key: the delta must beat the base
    s.upsert(Seq((1L, "v1b")).toDF("k", "v"), Seq("k"))
    assert(s.read(spark).get.as[(Long, String)].collect().toMap.apply(1L) === "v1b")
  }

  test("a ParquetKeyedStore layout reads as the legacy tier and compaction folds it") {
    val dir = tmp()
    val old = new ParquetKeyedStore(dir, coalesceTo = Some(1))
    old.upsert(Seq((1L, "v1"), (2L, "w")).toDF("k", "v"), Seq("k"))
    // rebind the same directory to the epoch store: content visible as-is
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"))
    assert(s.read(spark).get.as[(Long, String)].collect().toMap ===
      Map(1L -> "v1", 2L -> "w"))
    // first write folds the legacy files into a real base and sweeps them
    s.upsert(Seq((1L, "v2")).toDF("k", "v"), Seq("k"))
    assert(baseDirs(dir).nonEmpty)
    assert(!new java.io.File(dir).listFiles().exists(f =>
      f.isFile && f.getName.endsWith(".parquet"))) // legacy files swept
    assert(s.read(spark).get.as[(Long, String)].collect().toMap ===
      Map(1L -> "v2", 2L -> "w"))
  }

  test("partitioned epoch store: pruning predicates push through the merge window") {
    import org.apache.spark.sql.functions._
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("id", "band", "kb"),
      partitionCols = Seq("band", "kb"), coalesceTo = None)
    val rows = (0 until 64).map(i => (i.toLong, i % 4, i % 8, s"payload$i"))
    s.upsert(rows.toDF("id", "band", "kb", "payload"), Seq("id", "band"))
    val totalFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet")).count()
    withoutAqe {
      val probe = s.read(spark).get.where(col("band") === 1 && col("kb") === 1)
      val hits = probe.collect()
      assert(hits.length === 8 && hits.forall(_.getAs[Int]("band") === 1))
      val scans = probe.queryExecution.executedPlan.collectWithSubqueries {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      val scanned = scans.map(_.metrics("numFiles").value).sum
      assert(scanned > 0 && scanned < totalFiles,
        s"scanned $scanned of $totalFiles — (band, kb) pruning did not push through the merge")
    }
  }

  test("mixed delta layouts: partitioned and flat epochs read side by side") {
    import org.apache.spark.sql.functions._
    val dir = tmp()
    // a store that switched partitionDeltas mid-life: epoch 1 partitioned,
    // epoch 2 flat — per-dir delta reads must auto-detect each layout and
    // the merge must still resolve newest-wins across them
    val partitioned = new EpochKeyedStore(dir, mergeKeys = Seq("id", "band", "kb"),
      partitionCols = Seq("band", "kb"), coalesceTo = None)
    partitioned.upsert(Seq((1L, 0, 0, "old"), (2L, 1, 1, "keep"))
      .toDF("id", "band", "kb", "payload"), Seq("id", "band"))
    val flat = new EpochKeyedStore(dir, mergeKeys = Seq("id", "band", "kb"),
      partitionCols = Seq("band", "kb"), partitionDeltas = false, coalesceTo = None)
    flat.upsert(Seq((1L, 0, 0, "new"), (3L, 2, 2, "added"))
      .toDF("id", "band", "kb", "payload"), Seq("id", "band"))
    // layout on disk matches each epoch's own setting
    assert(new java.io.File(s"$dir/delta/epoch=1").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("band=")))
    assert(!new java.io.File(s"$dir/delta/epoch=2").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("band=")))
    val got = flat.read(spark).get.select("id", "payload")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "new", 2L -> "keep", 3L -> "added"))
    // pruning predicate still selects correctly across both layouts
    assert(flat.read(spark).get.where(col("band") === 1 && col("kb") === 1)
      .select("payload").as[String].collect().toSeq === Seq("keep"))
    // and the fold writes one hive-partitioned base over the mix
    flat.compact(spark)
    assert(new java.io.File(s"$dir/base").listFiles().filter(_.isDirectory)
      .head.listFiles().exists(f => f.isDirectory && f.getName.startsWith("band=")))
    assert(flat.read(spark).get.count() === 3L)
  }

  test("a data file missing under a committed marker raises instead of reading empty") {
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"))
    s.upsert(Seq((1L, "v1")).toDF("k", "v"), Seq("k"))
    assert(s.read(spark).get.count() === 1L)
    // corrupt the committed epoch: delete its data file, keep the marker
    val part = new java.io.File(s"$dir/delta/epoch=1").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(part.length === 1)
    part.foreach(_.delete())
    // a silent None here would hand DedupStream an empty index and
    // re-admit its whole history — must fail loudly
    val e = intercept[IllegalStateException] { s.read(spark) }
    assert(e.getMessage.contains("files=1"))
  }

  test("a zero-row upsert commits a legitimately-empty epoch, not corruption") {
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"))
    s.upsert(Seq.empty[(Long, String)].toDF("k", "v"), Seq("k"))
    assert(s.read(spark).map(_.count()).getOrElse(0L) === 0L)
    s.upsert(Seq((1L, "v1")).toDF("k", "v"), Seq("k"))
    assert(s.read(spark).get.as[(Long, String)].collect().toMap === Map(1L -> "v1"))
  }

  test("concurrent writers: the epoch claim is exclusive, second claimer errors") {
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"))
    s.upsert(Seq((1L, "v1")).toDF("k", "v"), Seq("k"))
    // every delta write goes through the claim: the marker is in the dir
    assert(new java.io.File(s"$dir/delta/epoch=1/_STAGE").exists())
    // two writers that raced to the same computed epoch: second create fails
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(s"$dir/delta/epoch=2")
    s.claimEpoch(f, target)
    val e = intercept[IllegalStateException] { s.claimEpoch(f, target) }
    assert(e.getMessage.contains("concurrent writer"))
    // the loser's crashed claim stays invisible and is never renumbered
    s.upsert(Seq((2L, "w")).toDF("k", "v"), Seq("k"))
    assert(deltaDirs(dir).sorted === Array("epoch=1", "epoch=2", "epoch=3"))
    assert(s.read(spark).get.count() === 2L)
  }

  test("debug mode catches a violated merge-key functional dependency at write time") {
    val dir = tmp()
    // kb pretends to be functionally dependent on k but isn't: the same
    // caller key arrives with two different kb values across epochs, so
    // the (k, kb)-wide merge keeps both rows where replace was expected
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k", "kb"),
      verifyMergeDependency = true)
    s.upsert(Seq((1L, 10, "v1")).toDF("k", "kb", "v"), Seq("k"))
    val e = intercept[IllegalStateException] {
      s.upsert(Seq((1L, 11, "v2")).toDF("k", "kb", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("functionally dependent"))
    // honest inputs never trip it
    val ok = new EpochKeyedStore(tmp(), mergeKeys = Seq("k", "kb"),
      verifyMergeDependency = true)
    ok.upsert(Seq((1L, 10, "v1")).toDF("k", "kb", "v"), Seq("k"))
    ok.upsert(Seq((1L, 10, "v2"), (2L, 20, "w")).toDF("k", "kb", "v"), Seq("k"))
    assert(ok.read(spark).get.count() === 2L)
  }

  test("randomized MERGE-equivalence soak vs the in-memory model (20 ops, compaction crossings)") {
    import graft.sink.InMemoryKeyedStore
    val rnd = new scala.util.Random(11)
    val dir = tmp()
    // compactAfterDeltas=3: the sequence crosses several folds, so the
    // equivalence holds across base rewrites, not just delta accumulation
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"), compactAfterDeltas = 3)
    val m = new InMemoryKeyedStore
    for (op <- 1 to 20) {
      // unique keys per batch: within-batch collisions would make the
      // surviving row backend-arbitrary (dropDuplicates picks one)
      val batch = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(12).toLong).distinct
        .map(k => (k, s"v$op-$k-${rnd.nextInt(100)}"))
      val df = batch.toDF("k", "v")
      if (op % 5 == 0) {
        // append of provably-fresh keys (shifted range never collides)
        val fresh = batch.map { case (k, v) => (k + 1000L * op, v) }.toDF("k", "v")
        s.append(fresh); m.append(fresh)
      } else {
        s.upsert(df, Seq("k")); m.upsert(df, Seq("k"))
      }
      val got = s.read(spark).get.as[(Long, String)].collect().toSet
      val want = m.read(spark).get.as[(Long, String)].collect().toSet
      assert(got === want, s"diverged after op $op")
    }
  }

  test("deferred compaction: writes never fold; maintain folds in the background while reads serve old epochs") {
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"), compactAfterDeltas = 2,
      deferCompaction = true)
    (1 to 5).foreach(i => s.upsert(Seq((i.toLong, s"v$i")).toDF("k", "v"), Seq("k")))
    // inline mode would have folded at the 3rd delta; the deferred write
    // path NEVER does — that is the decoupling (no fold stall in a batch)
    assert(baseDirs(dir).isEmpty && deltaDirs(dir).length === 5)
    s.maintain(spark) // starts the background fold
    // reads stay correct while the fold runs: old committed epochs serve
    assert(s.read(spark).get.count() === 5L)
    // a write racing the fold lands above the fold's target epoch, so it
    // wins the merge whether or not the fold's snapshot caught it
    s.upsert(Seq((1L, "v1b"), (6L, "v6")).toDF("k", "v"), Seq("k"))
    s.awaitMaintenance(spark) // drain the fold, publish its sweep
    assert(baseDirs(dir).nonEmpty)
    assert(s.read(spark).get.as[(Long, String)].collect().toMap ===
      Map(1L -> "v1b", 2L -> "v2", 3L -> "v3", 4L -> "v4", 5L -> "v5", 6L -> "v6"))
  }

  test("a crash mid-fold leaves an uncommitted staged base: reads ignore it, the next compact recovers") {
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"), compactAfterDeltas = 99)
    (1 to 3).foreach(i => s.upsert(Seq((i.toLong, s"v$i")).toDF("k", "v"), Seq("k")))
    // simulate a fold killed between its parquet write and its _COMMIT:
    // a staged base dir holding (stale) data but no marker
    Seq((1L, "stale"), (9L, "ghost")).toDF("k", "v").write.parquet(s"$dir/base/epoch=3")
    assert(s.read(spark).get.as[(Long, String)].collect().toMap ===
      Map(1L -> "v1", 2L -> "v2", 3L -> "v3")) // old epochs still serve
    s.compact(spark) // Overwrites the crashed attempt, publishes, sweeps
    assert(baseDirs(dir) === Array("epoch=3") && deltaDirs(dir).isEmpty)
    assert(s.read(spark).get.as[(Long, String)].collect().toMap ===
      Map(1L -> "v1", 2L -> "v2", 3L -> "v3"))
  }

  test("deferred-compaction soak: model equivalence across fold cycles, delta tier stays bounded") {
    import graft.sink.InMemoryKeyedStore
    val rnd = new scala.util.Random(23)
    val dir = tmp()
    // compactAfterDeltas=3 over 10 ops: several background folds run
    // CONCURRENTLY with later upserts/reads — the spec-scale version of
    // DedupScaleCheck's bounded saw-tooth, locked against regressions
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"), compactAfterDeltas = 3,
      deferCompaction = true)
    val m = new InMemoryKeyedStore
    for (op <- 1 to 10) {
      val batch = Seq.fill(rnd.nextInt(5) + 1)(rnd.nextInt(10).toLong).distinct
        .map(k => (k, s"v$op-$k"))
      val df = batch.toDF("k", "v")
      s.upsert(df, Seq("k")); m.upsert(df, Seq("k"))
      s.maintain(spark)
      assert(s.read(spark).get.as[(Long, String)].collect().toSet ===
        m.read(spark).get.as[(Long, String)].collect().toSet, s"diverged after op $op")
    }
    s.awaitMaintenance(spark)
    // folds actually happened off the write path, and the delta tier is
    // bounded by one fold cycle's accumulation — not the whole history
    assert(baseDirs(dir).nonEmpty, "no background fold ever published")
    assert(deltaDirs(dir).length <= 8,
      s"delta tier grew unbounded: ${deltaDirs(dir).length} deltas after draining")
    assert(s.read(spark).get.as[(Long, String)].collect().toSet ===
      m.read(spark).get.as[(Long, String)].collect().toSet)
  }

  test("tiered compaction: partial folds build an L1 merge, every k-th fold goes to base") {
    import graft.sink.InMemoryKeyedStore
    val dir = tmp()
    val s = new EpochKeyedStore(dir, mergeKeys = Seq("k"), compactAfterDeltas = 1,
      deferCompaction = true, fullCompactEvery = 3)
    val m = new InMemoryKeyedStore
    def step(op: Int): Unit = {
      val df = Seq((op.toLong % 5, s"v$op")).toDF("k", "v")
      s.upsert(df, Seq("k")); m.upsert(df, Seq("k"))
      s.maintain(spark)         // starts a fold when pending > 1
      s.awaitMaintenance(spark) // drain + sweep, so the tier state is deterministic
      assert(s.read(spark).get.as[(Long, String)].collect().toSet ===
        m.read(spark).get.as[(Long, String)].collect().toSet, s"diverged after op $op")
    }
    (1 to 2).foreach(step)
    // fold #1 goes FULL (no base existed — a partial would cost the same
    // without establishing the base that makes later partials cheap)
    assert(baseDirs(dir) === Array("epoch=2") && mergeDirs(dir).isEmpty)
    assert(deltaDirs(dir).isEmpty)
    (3 to 4).foreach(step)
    // fold #2 PARTIAL: deltas 3-4 fold into merge epoch=4 ABOVE the base
    assert(baseDirs(dir) === Array("epoch=2") && mergeDirs(dir) === Array("epoch=4"))
    (5 to 6).foreach(step)
    // fold #3 PARTIAL: old merge + deltas 5-6 -> merge epoch=6, old swept
    assert(baseDirs(dir) === Array("epoch=2") && mergeDirs(dir) === Array("epoch=6"))
    (7 to 8).foreach(step)
    // fold #4 is the k-th since the base: FULL — sweeps the merge tier
    assert(baseDirs(dir) === Array("epoch=8") && mergeDirs(dir).isEmpty)
    assert(deltaDirs(dir).isEmpty)
    // a crashed partial fold (no _COMMIT) is invisible and gets replaced
    Seq((99L, "ghost")).toDF("k", "v").write.parquet(s"$dir/merge/epoch=11")
    val before = s.read(spark).get.as[(Long, String)].collect().toSet
    assert(!before.exists(_._1 == 99L))
    (9 to 10).foreach(step)
    // fold #5 PARTIAL above base=8; the ghost dir never surfaced
    assert(baseDirs(dir) === Array("epoch=8") && mergeDirs(dir).nonEmpty)
    assert(s.read(spark).get.as[(Long, String)].collect().toSet ===
      m.read(spark).get.as[(Long, String)].collect().toSet)
  }

  test("mergeKeys must cover partitionCols and upsert keys") {
    intercept[IllegalArgumentException] {
      new EpochKeyedStore("/tmp/x", mergeKeys = Seq("a"), partitionCols = Seq("b"))
    }
    val s = new EpochKeyedStore(tmp(), mergeKeys = Seq("a"))
    intercept[IllegalArgumentException] {
      s.upsert(Seq((1L, 2L)).toDF("a", "b"), Seq("b"))
    }
  }
}
