package graft.streaming

import graft.model.{AtrState, Candle, EnrichedCandle}
import graft.operators.Atr
import graft.sink.{EdgeFormat, IdempotentSink}
import org.apache.spark.sql.{AnalysisException, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** The complete streaming assembly WITH gap-fill — the reference's
  * per-window cycle (main.py:275-328, SURVEY.md §3.2) as a `foreachBatch`
  * over watermark-finalized candles:
  *
  *   finalize → gap-fill vs expected symbols (last-close state seeded from a
  *   persisted snapshot, gap_fill.py:29-88) → Wilder ATR continuing from the
  *   persisted per-symbol state (atr_engine.py:194-242) → 13-column edge
  *   rows → idempotent dedup append (🔒3) → state snapshot overwrite
  *   (write_pipeline.py:328-362).
  *
  * Gap-fill needs per-window completeness across ALL symbols, which a
  * per-symbol stateful operator cannot see (a silent symbol contributes no
  * input row). Running the enrich step as a batch job per micro-batch —
  * exactly the reference's one-batch-per-window design — keeps the
  * semantics, while state lives in two tiny overwritten parquet snapshots
  * (one row per symbol), the same shape as the reference's `atr_state`
  * sheet. Restart recovery = streaming checkpoint (offsets/agg state) + the
  * snapshots; replays dedup via the id anti-join.
  */
object FullPipeline {

  final case class AtrStateRow(
      symbol: String,
      prev_close: Option[Double],
      prev_atr: Option[Double],
      tr_history: Seq[Double],
      candle_count: Int)

  final case class SymbolOut(rows: Seq[EnrichedCandle], state: AtrStateRow)

  /** The per-cycle snapshots (`last_close`, `atr_state`, `meta`) commit as
    * ONE staged epoch under `stateRoot/state/e<n>/`: every part is written
    * into the new epoch directory, then a `_COMMIT` marker (one atomic file
    * create) publishes all of them together. A replayed batch therefore
    * seeds from either ALL of the previous cycle's state or NONE of it —
    * never a mix, and never the post-batch state of a half-finished cycle
    * (the divergence the old per-dir delete+rename swap could expose). A
    * crash mid-epoch leaves an unmarked directory that readers ignore and
    * the next commit sweeps. Epochs never overwrite the directory a live
    * plan is reading, so no tmp materialization dance is needed either.
    */
  private def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Same `_COMMIT` plumbing as [[graft.sink.EpochKeyedStore]], different
    * shape on top: here one epoch is an atomic MULTI-PART snapshot
    * (last_close + atr_state + meta publish together or not at all), there
    * it's a per-key MERGE tier.
    */
  private val layout = new graft.sink.EpochLayout("e")

  private def committedEpochs(spark: SparkSession, stateRoot: String): Seq[(Long, String)] = {
    val (fs, root) = hadoopFs(spark, s"$stateRoot/state")
    layout.list(fs, root).collect { case (n, p, true) => (n, p.toString) }
  }

  /** Read one state part from the newest committed epoch; pre-epoch layouts
    * are read as a legacy fallback so existing state roots keep working —
    * including a root whose LAST write under the old per-dir swap crashed
    * between delete and rename, leaving only `<part>.tmp` with a `_SUCCESS`
    * marker (the old reader's recovery case; dropping it would silently
    * cold-start the ATR recursion on upgrade).
    */
  private[graft] def readState(spark: SparkSession, stateRoot: String,
                                   part: String): Option[DataFrame] =
    committedEpochs(spark, stateRoot).lastOption match {
      case Some((_, dir)) =>
        try Some(spark.read.parquet(s"$dir/$part"))
        catch { case _: AnalysisException => None }
      case None =>
        try Some(spark.read.parquet(s"$stateRoot/$part"))
        catch {
          case _: AnalysisException =>
            val tmp = new org.apache.hadoop.fs.Path(s"$stateRoot/$part.tmp", "_SUCCESS")
            val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (fs.exists(tmp))
              try Some(spark.read.parquet(s"$stateRoot/$part.tmp"))
              catch { case _: AnalysisException => None }
            else None
        }
    }

  /** Stage and publish one state epoch; keeps the latest `retain` committed
    * epochs and sweeps older ones plus any unmarked (crashed) stage dirs.
    */
  private[graft] def commitState(spark: SparkSession, stateRoot: String,
                                     parts: Map[String, DataFrame],
                                     retain: Int = 2): Unit = {
    val (fs, root) = hadoopFs(spark, s"$stateRoot/state")
    val next = layout.next(fs, Seq(root))
    val dir = s"$stateRoot/state/${layout.dirName(next)}"
    parts.foreach { case (name, df) =>
      df.write.mode(SaveMode.Overwrite).parquet(s"$dir/$name")
    }
    layout.commit(fs, new org.apache.hadoop.fs.Path(dir))
    val keep = (committedEpochs(spark, stateRoot).map(_._1).sorted
      .takeRight(retain).toSet) + next
    layout.sweep(fs, root) { case (n, _) => !keep.contains(n) && n < next }
  }

  /** Gap-fill one micro-batch of candles against the expected symbol set,
    * seeding forward-fill with the persisted last-close snapshot.
    *
    * The window axis is DENSIFIED from `sinceWindow` (exclusive — the
    * persisted high-watermark of the previous batch) to the batch max: a
    * window in which NO symbol ticked appears in no micro-batch at all, but
    * the reference clock-triggers every window and synthesizes flat candles
    * for the whole universe (main.py:231-265 + gap_fill.py). Sequencing
    * over the persisted watermark reproduces that — including empty windows
    * that fall between micro-batches.
    */
  private[streaming] def gapFillBatch(candles: DataFrame, expectedSymbols: DataFrame,
                                      lastClose: Option[DataFrame],
                                      sinceWindow: Option[java.sql.Timestamp] = None,
                                      intervalMinutes: Int = 5): DataFrame = {
    val bounds = candles.agg(min(col("window_start")).as("bmin"),
      max(col("window_start")).as("bmax"))
    // start at prev-watermark+interval (to cover globally-empty windows
    // between batches) but never later than the batch's own min, in case a
    // window finalizes out of order
    val lo = sinceWindow
      .map(t => least(lit(t) + expr(s"interval $intervalMinutes minutes"), col("bmin")))
      .getOrElse(col("bmin"))
    val wins = bounds.select(explode(sequence(
      lo, col("bmax"), expr(s"interval $intervalMinutes minutes"))).as("window_start"))
    val grid = wins.crossJoin(broadcast(expectedSymbols))
    val seeded = grid
      .join(candles, Seq("window_start", "symbol"), "left_outer")
      .join(broadcast(lastClose.getOrElse(
        expectedSymbols.select(col("symbol"), lit(null).cast("double").as("seed_close"))
          .limit(0))), Seq("symbol"), "left_outer")
    val withSeed =
      if (seeded.columns.contains("seed_close")) seeded
      else seeded.withColumn("seed_close", lit(null).cast("double"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withSeed
      .withColumn("prev_close",
        coalesce(last(col("close"), ignoreNulls = true).over(w), col("seed_close")))
      .withColumn("gap_filled", col("tick_count").isNull && col("prev_close").isNotNull)
      .where(col("tick_count").isNotNull || col("prev_close").isNotNull)
      .select(col("window_start"), col("symbol"),
        coalesce(col("open"), col("prev_close")).as("open"),
        coalesce(col("high"), col("prev_close")).as("high"),
        coalesce(col("low"), col("prev_close")).as("low"),
        coalesce(col("close"), col("prev_close")).as("close"),
        coalesce(col("tick_count"), lit(0L)).as("tick_count"),
        col("gap_filled"))
  }

  /** ATR enrichment continuing from persisted per-symbol state. Returns the
    * enriched rows, the updated state, and a release handle that unpersists
    * the shared cached pass once both outputs have been materialized.
    */
  private[streaming] def atrWithState(filled: DataFrame, state: Option[DataFrame]): (DataFrame, DataFrame, () => Unit) = {
    val spark = filled.sparkSession
    import spark.implicits._
    val st = state.getOrElse(Seq.empty[AtrStateRow].toDF())
    val joined = StreamingPipeline.toCandleDS(filled).toDF()
      .join(broadcast(st), Seq("symbol"), "left_outer")
    val cols = joined.columns.toSet
    val withStateCols = Seq("prev_close", "prev_atr", "tr_history", "candle_count")
      .foldLeft(joined) { (df, c) =>
        if (cols.contains(c)) df else df.withColumn(c,
          if (c == "tr_history") lit(null).cast("array<double>")
          else if (c == "candle_count") lit(null).cast("int")
          else lit(null).cast("double"))
      }
    val out = withStateCols
      .as[(String, Long, String, Double, Double, Double, Double, Long, Boolean,
           Option[Double], Option[Double], Option[Seq[Double]], Option[Int])]
      .groupByKey(_._1)
      .mapGroups { (sym, it) =>
        val rows = it.toIndexedSeq.sortBy(_._2)
        val h = rows.head
        var state = AtrState(h._10, h._11, h._12.map(_.toList).getOrElse(Nil), h._13.getOrElse(0))
        val enriched = rows.map { r =>
          val (next, tr, atr) = Atr.step(state, r._5, r._6, r._7)
          state = next
          EnrichedCandle(r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9, Some(tr), atr)
        }
        SymbolOut(enriched,
          AtrStateRow(sym, state.prevClose, state.prevAtr, state.trHistory, state.candleCount))
      }
      .cache()
    (out.flatMap(_.rows).toDF(), out.map(_.state).toDF(), () => { out.unpersist(); () })
  }

  /** Wire the full pipeline onto a finalized-candle stream.
    * @param stateRoot holds `last_close/` and `atr_state/` snapshots
    */
  def start(candles: DataFrame, expectedSymbols: Seq[String], sinkDir: String,
            deadLetterDir: String, checkpointDir: String, stateRoot: String): StreamingQuery =
    candles.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        // persist once: a foreachBatch frame re-executes its incremental
        // plan per action, and this body takes several (empty gate + the
        // gap-fill grid join's scan)
        val batch = b.persist()
        try if (!batch.isEmpty) {
          val spark = batch.sparkSession
          import spark.implicits._
          // metadata config table, written once (schema_manager.py:34-43)
          graft.sink.Schemas.initMetadata(spark, s"$stateRoot/metadata",
            expectedSymbols.size)
          IdempotentSink.drainDeadLetters(spark, deadLetterDir, sinkDir,
            partitionCol = Some("dt"))
          val expected = expectedSymbols.toDF("symbol")
          val prevWindow = readState(spark, stateRoot, "meta")
            .flatMap(df => Option(df.agg(max(col("last_window"))).head().getTimestamp(0)))
          val filled = gapFillBatch(batch, expected,
            readState(spark, stateRoot, "last_close"), prevWindow).cache()
          val (enriched, newAtrState, releaseAtr) =
            atrWithState(filled, readState(spark, stateRoot, "atr_state"))
          // dt partition column (the window's date) → appends are laid out
          // partitionBy(dt) and the dedup read-back prunes to the batch's
          // date range (sheets_client.py:128-148 narrows the same way)
          val edgeRows = EdgeFormat.sheetRows(enriched,
            createdAt = java.time.Instant.now.toString)
          // declared-schema gate before the append (schema_manager.py:104-135)
          graft.sink.Schemas.validate(edgeRows, graft.sink.Schemas.MarketData, "market_data")
          val rows = edgeRows.withColumn("dt", substring(col("timestamp"), 1, 10))
          IdempotentSink.appendWithRetry(rows, sinkDir, deadLetterDir,
            maxRetries = 3, baseDelayMs = 100L, pruneCol = Some("timestamp"),
            partitionCol = Some("dt"))
          // last-close snapshot includes synthesized closes (gap_fill.py:77-79)
          val w = Window.partitionBy(col("symbol")).orderBy(col("window_start").desc)
          val newLastClose = filled
            .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
            .select(col("symbol"), col("close").as("seed_close"))
          // window high-watermark: lets the next batch densify over
          // globally-empty windows between batches
          val newMax = filled.agg(max(col("window_start"))).head().getTimestamp(0)
          commitState(spark, stateRoot, Map(
            "last_close" -> newLastClose,
            "atr_state" -> newAtrState,
            "meta" -> Seq(Tuple1(newMax)).toDF("last_window")))
          releaseAtr()
          filled.unpersist()
          ()
        } finally { batch.unpersist(); () }
      }
      .start()
}
