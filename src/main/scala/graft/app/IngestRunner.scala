package graft.app

import graft.streaming.{Alerts, DedupStream, HammingStream, Monitors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import scala.util.control.NonFatal

/** The supervised INGEST entrypoint — [[StreamRunner]]'s treatment (ops
  * listeners + buffered alert channel + restart supervision) applied to
  * the training-data ingest streams, so sketch near-dup has the same
  * production front door as the market stream:
  *
  *   - [[startDocs]] — gated MinHash-LSH document dedup
  *     ([[DedupStream.start]]: doc gates → decontamination → index →
  *     pairs);
  *   - [[startSketches]] — banded-Hamming near-dup over any (id, lo, hi)
  *     64-bit sketch stream ([[HammingStream.start]]: image pHash, or
  *     sketches derived upstream);
  *   - [[startText]] — the SimHash text front door
  *     ([[HammingStream.startText]]: doc gates → sketch → index →
  *     pairs).
  *
  * Reference analog: the write pipeline's dedup-scan-before-append loop
  * under the supervised runner (write_pipeline.py:151-183,
  * main.py:107-151) — here the "scan" is the persisted index probe and
  * supervision is [[StreamRunner.supervise]] over [[Running]].
  *
  * Restart contract: every piece is already replay-idempotent — the
  * stores' id ledgers short-circuit replayed docs, the pair / reject /
  * quarantine sinks anti-join on id — so a restart is pure wiring: back
  * off per [[graft.recover.RetryPolicy]], rebuild the query on the SAME
  * dirs, and the checkpoint resumes offsets while the index survives on
  * disk (spec-pinned by the 2-session restart e2e in HammingStreamSpec).
  */
object IngestRunner {

  final case class Config(
      indexDir: String,
      pairsDir: String,
      checkpointDir: String,
      systemLogDir: String,
      heartbeatTimeoutMs: Long = 30000L,
      compactLogAfterFiles: Int = 64)

  /** A started ingest runner: the query plus the ops handles around it —
    * [[StreamRunner.Supervised]], so [[StreamRunner.supervise]] fronts
    * it unchanged. */
  final case class Running(
      query: StreamingQuery,
      heartbeat: Monitors.HeartbeatMonitor,
      alerts: Alerts.AlertManager,
      listener: StreamingQueryListener) extends StreamRunner.Supervised {

    def detach(): Unit =
      query.sparkSession.streams.removeListener(listener)

    def stop(): Unit =
      try { query.stop() } finally detach()
  }

  /** Banded-Hamming sketch ingest (image pHash / pre-derived sketches). */
  def startSketches(sketches: DataFrame, cfg: Config,
                    maxHamming: Int = 3): Running =
    wire(sketches, cfg, "hamming_sketch_ingest")(() =>
      HammingStream.start(sketches, cfg.indexDir, cfg.pairsDir,
        cfg.checkpointDir, maxHamming))

  /** SimHash text ingest: gate → sketch → index → pairs. */
  def startText(docs: DataFrame, cfg: Config, maxHamming: Int = 3,
                docGate: Option[DedupStream.DocGate] = None): Running =
    wire(docs, cfg, "simhash_text_ingest")(() =>
      HammingStream.startText(docs, cfg.indexDir, cfg.pairsDir,
        cfg.checkpointDir, maxHamming, docGate))

  /** Gated MinHash-LSH document ingest. */
  def startDocs(docs: DataFrame, cfg: Config,
                n: Int = 5, numPerms: Int = 64, bands: Int = 16,
                threshold: Double = 0.5,
                gate: Option[DedupStream.ContaminationGate] = None,
                docGate: Option[DedupStream.DocGate] = None): Running =
    wire(docs, cfg, "minhash_doc_ingest")(() =>
      DedupStream.start(docs, cfg.indexDir, cfg.pairsDir, cfg.checkpointDir,
        n, numPerms, bands, threshold, gate, docGate))

  /** Shared ops wiring: buffered system-log alerts, heartbeat listener,
    * a startup row naming the front door (the audit that the index dirs
    * are being reused lands BEFORE the first micro-batch), and listener
    * cleanup when query construction itself fails. */
  private def wire(input: DataFrame, cfg: Config, door: String)(
      mk: () => StreamingQuery): Running = {
    val spark = input.sparkSession
    val alerts = Alerts.buffered(spark, cfg.systemLogDir, cfg.compactLogAfterFiles)
    alerts.dispatch("INFO", "ingest_start", door,
      s"index=${cfg.indexDir} pairs=${cfg.pairsDir} ckpt=${cfg.checkpointDir}")
    alerts.flush()
    val hb = new Monitors.HeartbeatMonitor(cfg.heartbeatTimeoutMs)
    val listener = Monitors.listener(hb, alerts = Some(alerts))
    spark.streams.addListener(listener)
    try Running(mk(), hb, alerts, listener)
    catch {
      case NonFatal(e) => spark.streams.removeListener(listener); throw e
    }
  }
}
