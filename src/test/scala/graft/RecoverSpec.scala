package graft

import graft.recover.{Reconcile, RetryPolicy}
import graft.sink.EdgeFormat
import org.scalatest.funsuite.AnyFunSuite

class RecoverSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def state(rows: (String, Double, Double)*) =
    rows.toSeq.toDF("symbol", "last_close", "last_atr")

  test("reconcile 4-case matrix") {
    val local = Reconcile.Snapshot(Some("2026-02-02T09:30:00"), state(("A", 10.0, 1.0)))
    val sinkBehind = Reconcile.Snapshot(Some("2026-02-02T09:25:00"), state(("A", 9.0, 1.0)))
    val sinkAhead = Reconcile.Snapshot(Some("2026-02-02T09:35:00"), state(("A", 11.0, 1.0)))

    assert(Reconcile.decide(None, None).source === Reconcile.Fresh)
    assert(Reconcile.decide(None, Some(sinkAhead)).source === Reconcile.FromSink)
    assert(Reconcile.decide(Some(local), None).source === Reconcile.FromLocal)
    assert(Reconcile.decide(Some(local), Some(sinkBehind)).source === Reconcile.FromLocal)
    assert(Reconcile.decide(Some(local), Some(sinkAhead)).source === Reconcile.FromSink)
    assert(Reconcile.decide(Some(local), Some(local)).source === Reconcile.FromLocal) // consistent
    // one-sided window knowledge: the side with evidence wins
    val noWindowLocal = Reconcile.Snapshot(None, state(("A", 1.0, 1.0)))
    assert(Reconcile.decide(Some(noWindowLocal), Some(sinkAhead)).source === Reconcile.FromSink)
    val noWindowSink = Reconcile.Snapshot(None, state(("A", 2.0, 2.0)))
    assert(Reconcile.decide(Some(local), Some(noWindowSink)).source === Reconcile.FromLocal)
  }

  test("divergence audit counts |Δatr| > 1e-4 only") {
    val l = state(("A", 1.0, 1.0000), ("B", 1.0, 2.0), ("C", 1.0, 3.0))
    val s = state(("A", 9.9, 1.00005), ("B", 9.9, 2.5), ("D", 9.9, 4.0))
    assert(Reconcile.divergences(l, s) === 1L) // only B; A within tol, C/D unmatched
  }

  test("resolve merges winner-first with full-outer coverage") {
    val local = Reconcile.Snapshot(Some("w2"), state(("A", 10.0, 1.0), ("B", 20.0, 2.0)))
    val sink = Reconcile.Snapshot(Some("w1"), state(("B", 99.0, 9.0), ("C", 30.0, 3.0)))
    val d = Reconcile.decide(Some(local), Some(sink))
    val merged = Reconcile.resolve(d, Some(local), Some(sink)).get
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(merged.toSeq === Seq(("A", 10.0, 1.0), ("B", 20.0, 2.0), ("C", 30.0, 3.0)))
  }

  test("retry policy: exponential growth, cap, jitter bounds, alert ladder") {
    val cfg = RetryPolicy.Config()
    val delays = (1 to 10).map(a => RetryPolicy.delayMs(cfg, a))
    // within ±25% of 2s, 4s, 8s …, capped at 120s
    assert(delays(0) >= 1500 && delays(0) <= 2500)
    assert(delays(1) >= 3000 && delays(1) <= 5000)
    assert(delays.forall(_ <= 150000))
    assert(delays(9) >= 90000) // capped region: 120s ± 25%
    assert(RetryPolicy.delayMs(cfg, 3) === RetryPolicy.delayMs(cfg, 3)) // deterministic
    assert(RetryPolicy.alertFor(cfg, 1) === RetryPolicy.Warning)
    assert(RetryPolicy.alertFor(cfg, 3) === RetryPolicy.Critical)
    assert(RetryPolicy.alertFor(cfg, 10) === RetryPolicy.Exhausted)
    assert(!RetryPolicy.canRetry(cfg, 10))
  }

  test("checkpoint store: round-trip, rotation keep-3, corrupt-primary fallback") {
    import graft.model.AtrState
    import graft.recover.CheckpointStore
    import graft.recover.CheckpointStore.Checkpoint
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    def cp(w: String) = Checkpoint(Some(w),
      Map("RELIANCE" -> AtrState(Some(2050.25), Some(13.4567), List(1.5, 2.0), 20),
          "TCS" -> AtrState(Some(3311.0), None, List(0.5), 3)),
      savedAt = s"$w+z", sheetsWriteConfirmed = true)
    CheckpointStore.save(dir, cp("2026-02-02T09:15:00"))
    CheckpointStore.save(dir, cp("2026-02-02T09:20:00"))
    CheckpointStore.save(dir, cp("2026-02-02T09:25:00"))
    CheckpointStore.save(dir, cp("2026-02-02T09:30:00"))
    // keep=3 counts BACKUPS (reference MAX_BACKUPS): primary + 3 on disk,
    // named checkpoint.json / checkpoint_1..3.json like the reference layout
    assert(CheckpointStore.generations(dir).size === 4)
    assert(CheckpointStore.generations(dir).map(_.getFileName.toString) ===
      Seq("checkpoint.json", "checkpoint_1.json", "checkpoint_2.json", "checkpoint_3.json"))
    // legacy checkpoint.<n>.json backups from the pre-rename layout still
    // load as fallback generations and migrate on the next save
    val legacyDir = java.nio.file.Files.createTempDirectory("graft-ckpt-legacy").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(legacyDir, "checkpoint.1.json"),
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, "checkpoint_1.json")))
    assert(CheckpointStore.load(legacyDir).isDefined)
    CheckpointStore.save(legacyDir, cp("2026-02-02T09:35:00"))
    val names = new java.io.File(legacyDir).listFiles().map(_.getName).sorted
    assert(!names.contains("checkpoint.1.json"))
    assert(names.contains("checkpoint_2.json")) // migrated legacy rotated to gen 2
    val loaded = CheckpointStore.load(dir).get
    assert(loaded.lastWindow.contains("2026-02-02T09:30:00"))
    assert(loaded.atrState("RELIANCE") ===
      AtrState(Some(2050.25), Some(13.4567), List(1.5, 2.0), 20))
    assert(loaded.atrState("TCS").prevAtr.isEmpty)
    assert(loaded.sheetsWriteConfirmed)
    // corrupt the primary → loader falls back to the previous generation
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "checkpoint.json"), "{not json")
    val fallback = CheckpointStore.load(dir).get
    assert(fallback.lastWindow.contains("2026-02-02T09:25:00"))
  }

  test("edge format: 13 string columns, null→empty, bool→TRUE/FALSE") {
    val enriched = Seq(
      ("RELIANCE", "2026-02-02 09:15:00", 10.0, 12.0, 9.0, 11.0, 5L, false, Some(3.0), None: Option[Double]),
      ("TCS", "2026-02-02 09:15:00", 1.0, 1.0, 1.0, 1.0, 0L, true, Some(0.0), Some(2.5))
    ).toDF("symbol", "window_start", "open", "high", "low", "close", "tick_count", "gap_filled", "tr", "atr")
    val rows = EdgeFormat.sheetRows(enriched, "2026-02-02T10:00:00")
    assert(rows.columns.toSeq === EdgeFormat.Header)
    assert(rows.schema.fields.forall(_.dataType.typeName === "string"))
    val r = rows.orderBy("ticker").collect()
    assert(r(0).getAs[String]("id") === "RELIANCE_20260202_0915")
    assert(r(0).getAs[String]("atr") === "")        // warmup null → empty at edge
    assert(r(0).getAs[String]("gap_filled") === "FALSE")
    assert(r(1).getAs[String]("gap_filled") === "TRUE")
    assert(r(1).getAs[String]("atr") === "2.5000")  // fixed 4-decimal rendering
  }
}
