package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Durable TRUE-UPSERT keyed store: an epoch-versioned parquet MERGE table
  * — the Delta/Iceberg-shaped backend the [[KeyedStore]] contract was
  * written for, built from plain parquet + the create-file `_COMMIT`
  * publication pattern (no table-format jars needed; same machinery as
  * [[graft.streaming.FullPipeline]]'s state epochs and
  * [[graft.operators.Similarity]]'s versioned ANN index).
  *
  * Layout (LSM shape):
  * {{{
  *   dir/base/epoch=<n>/   one compacted snapshot holding every epoch ≤ n
  *   dir/delta/epoch=<n>/  one upsert/append batch
  * }}}
  * Both tiers share one increasing epoch sequence; every epoch directory
  * publishes via a `_COMMIT` marker (one atomic file create — object-store
  * safe, never a directory rename). Readers see only committed epochs, so
  * a crash mid-write leaves an invisible stage dir that the next
  * compaction sweeps.
  *
  * The contract costs, versus [[ParquetKeyedStore]]'s append emulation:
  *   - `upsert` is WRITE-ONLY — one delta per batch, O(batch) work, no
  *     existing-keys scan of the store at all (the emulation's O(store)
  *     anti-join per batch is gone). Key collisions resolve at READ time:
  *     for each merge-key tuple the row from the newest epoch wins —
  *     exactly the MERGE shape [[InMemoryKeyedStore]] spec-pins.
  *   - `read` unions the newest committed base with the committed deltas
  *     above it and resolves newest-wins with one window over `mergeKeys`;
  *     [[compact]] (auto-triggered once the delta tier exceeds
  *     `compactAfterDeltas`) folds deltas into a new base so the file
  *     count — and the merge window's duplicate work — stays bounded.
  *
  * Filter pushdown survives the merge: predicates over `mergeKeys` columns
  * (and hence over `partitionCols`, which must be covered by `mergeKeys` —
  * extend the logical key with functionally-dependent columns like the
  * band store's key bucket) push below the window to the scan, so
  * partition-pruned probes keep pruning.
  *
  * A directory previously written by [[ParquetKeyedStore]] (flat or
  * hive-partitioned, no epoch tiers) reads as an implicit epoch-0 base, so
  * swapping backends on an existing store is a binding change, not a
  * migration; the first compaction folds the legacy files into a real base
  * and sweeps them.
  *
  * Single-writer, like the reference's sheet protocol — concurrent
  * upserts would race the epoch counter.
  *
  * @param mergeKeys  read-side resolution key: one surviving row per tuple,
  *   newest epoch wins. Must cover `partitionCols` so pruning predicates
  *   push through the merge window.
  * @param partitionCols hive layout beneath each epoch (e.g. the band
  *   store's (band, kb)) — the probe side's pruning granularity
  * @param compactAfterDeltas committed deltas above the base tolerated
  *   before a write auto-compacts
  * @param coalesceTo small-file control applied to delta AND base writes;
  *   None keeps the plan's natural parallelism (big partitioned stores)
  */
final class EpochKeyedStore(dir: String,
                            mergeKeys: Seq[String],
                            partitionCols: Seq[String] = Nil,
                            compactAfterDeltas: Int = 16,
                            coalesceTo: Option[Int] = Some(1)) extends KeyedStore {
  require(mergeKeys.nonEmpty, "EpochKeyedStore needs at least one merge key")
  require(partitionCols.forall(mergeKeys.contains),
    s"partitionCols ${partitionCols.mkString(",")} must be covered by mergeKeys " +
      s"${mergeKeys.mkString(",")} or pruning predicates cannot push through the merge")

  private def fs(spark: SparkSession): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def epochOf(name: String): Option[Long] =
    if (name.startsWith("epoch=")) name.drop(6).toLongOption else None

  /** (epoch, path, committed) for one tier; empty when the tier is absent. */
  private def listEpochs(fs: FileSystem, tier: String): Seq[(Long, Path, Boolean)] = {
    val root = new Path(s"$dir/$tier")
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).filter(_.isDirectory).toSeq
      .flatMap(s => epochOf(s.getPath.getName).map(n =>
        (n, s.getPath, fs.exists(new Path(s.getPath, "_COMMIT")))))
      .sortBy(_._1)
  }

  /** Pre-epoch [[ParquetKeyedStore]] content directly under `dir`: data
    * files / hive dirs that are not the base/delta tiers. Read as an
    * implicit epoch-0 base until a compaction folds and sweeps it.
    */
  private def legacyPaths(fs: FileSystem): Seq[Path] = {
    val root = new Path(dir)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter { s =>
        val n = s.getPath.getName
        n != "base" && n != "delta" && !n.startsWith("_") && !n.startsWith(".") &&
          (s.isDirectory || n.endsWith(".parquet"))
      }
      .map(_.getPath)
  }

  override def read(spark: SparkSession): Option[DataFrame] = try {
    val f = fs(spark)
    val bases = listEpochs(f, "base").filter(_._3)
    val baseOpt = bases.lastOption
    val floor = baseOpt.map(_._1).getOrElse(-1L)
    val deltas = listEpochs(f, "delta").filter(d => d._3 && d._1 > floor)
    val legacy = legacyPaths(f)
    val members = Seq.newBuilder[DataFrame]
    // legacy tier = epoch 0; a committed base always supersedes it per key
    // (the base folded it in), so including both is crash-safe, never wrong
    if (legacy.nonEmpty)
      members += spark.read.option("basePath", dir)
        .parquet(legacy.map(_.toString): _*)
        .withColumn("__epoch", lit(0L))
    baseOpt.foreach { case (n, p, _) =>
      members += spark.read.parquet(p.toString).withColumn("__epoch", lit(n))
    }
    if (deltas.nonEmpty)
      members += spark.read.option("basePath", s"$dir/delta")
        .parquet(deltas.map(_._2.toString): _*)
        .withColumn("__epoch", col("epoch").cast("long")).drop("epoch")
    val parts = members.result()
    if (parts.isEmpty) None
    else {
      val all = parts.reduce(_ unionByName _)
      val w = Window.partitionBy(mergeKeys.map(col): _*).orderBy(col("__epoch").desc)
      Some(all
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .drop("__rn", "__epoch"))
    }
  } catch {
    // every committed epoch empty (schema-less) reads as an empty store
    case _: org.apache.spark.sql.AnalysisException => None
  }

  private def nextEpoch(f: FileSystem): Long =
    (0L +: (listEpochs(f, "base") ++ listEpochs(f, "delta")).map(_._1)).max + 1

  private def commitMarker(f: FileSystem, epochDir: String): Unit =
    f.create(new Path(epochDir, "_COMMIT"), false).close()

  private def writeDelta(rows: DataFrame): Unit = {
    val spark = rows.sparkSession
    val f = fs(spark)
    val target = s"$dir/delta/epoch=${nextEpoch(f)}"
    val shaped = coalesceTo.fold(rows)(rows.coalesce)
    val w = shaped.write.mode(SaveMode.Overwrite)
    if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*).parquet(target)
    else w.parquet(target)
    commitMarker(f, target)
    val floor = listEpochs(f, "base").filter(_._3).lastOption.map(_._1).getOrElse(-1L)
    val pending = listEpochs(f, "delta").count(d => d._3 && d._1 > floor)
    if (pending > compactAfterDeltas || (legacyPaths(f).nonEmpty && pending > 0))
      compact(spark)
  }

  /** MERGE write: one delta, deduped within the batch on the caller's key
    * (which must be covered by `mergeKeys` — same tuple, possibly minus the
    * functionally-dependent extensions). No store scan.
    */
  override def upsert(rows: DataFrame, keys: Seq[String]): Unit = {
    require(keys.forall(mergeKeys.contains),
      s"upsert keys ${keys.mkString(",")} not covered by mergeKeys ${mergeKeys.mkString(",")}")
    writeDelta(rows.dropDuplicates(keys))
  }

  /** Caller-proved-fresh rows: same write path, minus the in-batch dedup. */
  override def append(rows: DataFrame): Unit = writeDelta(rows)

  /** Fold the current merged view into a new base epoch and sweep what it
    * supersedes: older bases, folded deltas, legacy flat files, and
    * crashed (uncommitted) stage dirs below the new epoch. Publication is
    * the `_COMMIT` create, so readers switch atomically and a crash mid-
    * sweep only leaves already-superseded directories for the next call to
    * finish sweeping.
    */
  def compact(spark: SparkSession): Unit = {
    val f = fs(spark)
    val committed = (listEpochs(f, "base") ++ listEpochs(f, "delta"))
      .filter(_._3).map(_._1)
    val hasLegacy = legacyPaths(f).nonEmpty
    if (committed.isEmpty && !hasLegacy) return
    val n = if (committed.isEmpty) 1L else committed.max
    val current = listEpochs(f, "base").filter(_._3).lastOption
    if (current.exists(_._1 == n)) {
      // base n is already published — a previous compact crashed after
      // its _COMMIT but before the sweep. Everything ≤ n (and the legacy
      // tier, which that base folded in) is superseded: finish the sweep,
      // never rewrite the directory readers are on.
      sweepBelow(f, n)
      return
    }
    read(spark).foreach { merged =>
      val target = s"$dir/base/epoch=$n"
      val shaped = coalesceTo.fold(merged)(merged.coalesce)
      val w = shaped.write.mode(SaveMode.Overwrite)
      if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*).parquet(target)
      else w.parquet(target)
      commitMarker(f, target)
      sweepBelow(f, n)
    }
  }

  /** Delete everything the committed base at epoch `n` supersedes. */
  private def sweepBelow(f: FileSystem, n: Long): Unit = {
    listEpochs(f, "base").foreach { case (e, p, _) => if (e < n) f.delete(p, true) }
    listEpochs(f, "delta").foreach { case (e, p, _) => if (e <= n) f.delete(p, true) }
    legacyPaths(f).foreach(p => f.delete(p, true))
  }
}
