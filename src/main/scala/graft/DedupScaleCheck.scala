package graft

import graft.streaming.DedupStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: incremental-dedup scale probe — drives [[DedupStream]]'s
  * batch body over a growing persisted index and reports per-batch wall
  * time for BOTH KeyedStore backends, making the epoch store's O(batch)
  * write claim measurable: the parquet-append emulation re-scans the
  * store's existing keys on every upsert (per-batch cost grows with the
  * corpus), the epoch store writes one delta per table per batch
  * (per-batch cost stays flat; reads pay a bounded merge window instead).
  *
  * Batches are the sf documents table with a batch token interleaved
  * after every second word, so every 5-gram shingle carries the token:
  * batches are mutually DISSIMILAR (cross-batch pair output stays zero,
  * keeping per-batch verify/write volume constant — the trend then
  * measures the index machinery, not a growing true-pair flood) while
  * each batch keeps the base corpus's natural within-batch dup structure.
  *
  * Shuffle parallelism is deliberately small: the bands store partitions
  * by (band, kb) and every delta epoch writes up to
  * shufflePartitions × activePartitions part files — at probe scale the
  * local-FS small-file overhead would otherwise drown the trend being
  * measured. (At production scale the same product is the object-count
  * knob: bound it with coalesceTo or fewer key buckets.)
  *
  * Usage: runMain graft.DedupScaleCheck [sfDir] [batches] [docFactor] [backendSubstr]
  * (backendSubstr filters the backend list by label substring — e.g.
  * "deferred" probes only the tiered-deferred leg.)
  */
object DedupScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val docFactor = args.lift(2).map(_.toInt).getOrElse(1) // docs/batch = 500 × this
    val backendFilter = args.lift(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir).cache()
    val nBase = base.count()

    def batchDf(i: Int) = base
      .withColumn("rep", explode(sequence(lit(0), lit(docFactor - 1))))
      .select(
        (col("doc_id") + lit(i.toLong * docFactor * nBase) + col("rep") * nBase).as("doc_id"),
        concat(
          regexp_replace(col("text"), "(\\S+\\s+\\S+)", s"$$1 batch$i"),
          lit(" rep"), col("rep")).as("text"))

    Seq(
      "epoch" -> ((d: String) => DedupStream.epochStores(d)),
      "epoch-deferred" -> ((d: String) => DedupStream.epochStores(d, deferCompaction = true)),
      "parquet-emulation" -> ((d: String) => DedupStream.parquetStores(d))
    ).filter { case (label, _) => backendFilter.forall(label.contains) }
      .foreach { case (label, mk) =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-dscale-$label").toString
      val stores = mk(s"$root/index")
      val times = (0 until nBatches).map { i =>
        val t0 = System.nanoTime()
        val written = DedupStream.processBatch(batchDf(i), stores, s"$root/pairs",
          n = 5, numPerms = 32, bands = 8, threshold = 0.5)
        // the between-batches maintenance point (no-op except deferred
        // mode, where it harvests/starts background folds); deliberately
        // OUTSIDE the timed window — that is the decoupling being measured
        val s = (System.nanoTime() - t0) / 1e9
        stores.maintain(spark)
        println(f"[dedup-scale] $label batch=$i docs=${nBase * docFactor} pairs=$written t=$s%.2f s")
        s
      }
      val head3 = times.take(3).sum / 3
      val tail3 = times.takeRight(3).sum / 3
      println(f"[dedup-scale] $label SUMMARY: batches=$nBatches docs/batch=${nBase * docFactor} " +
        f"first3=$head3%.2f s last3=$tail3%.2f s max=${times.max}%.2f s " +
        f"growth=${tail3 / head3}%.2fx (index grew ${nBatches}x over the run)")
    }

    // HAMMING SKETCH INDEX growth: per-batch cost of the incremental
    // banded-Hamming front door (text SimHash / image pHash near-dup at
    // ingest) over a growing persisted index — writes are one flat
    // O(batch) delta per batch, so the trend must stay flat like the
    // MinHash index's
    locally {
      val root = java.nio.file.Files.createTempDirectory("graft-hscale").toString
      val stores = graft.streaming.HammingStream.epochStores(s"$root/index")
      val times = (0 until nBatches).map { i =>
        val sk = graft.operators.Dedup.simhash64Portable(batchDf(i))
          .select(col("doc_id").as("id"), col("simhash_lo").as("lo"),
            col("simhash_hi").as("hi"))
        val t0 = System.nanoTime()
        val written = graft.streaming.HammingStream.processBatch(
          sk, stores, s"$root/pairs")
        val s = (System.nanoTime() - t0) / 1e9
        stores.maintain(spark)
        println(f"[dedup-scale] hamming-index batch=$i docs=${nBase * docFactor} pairs=$written t=$s%.2f s")
        s
      }
      val head3 = times.take(3).sum / 3
      val tail3 = times.takeRight(3).sum / 3
      println(f"[dedup-scale] hamming-index SUMMARY: batches=$nBatches " +
        f"docs/batch=${nBase * docFactor} first3=$head3%.2f s last3=$tail3%.2f s " +
        f"growth=${tail3 / head3}%.2fx (index grew ${nBatches}x over the run)")
    }

    // GATED INGEST THROUGHPUT (VERDICT r9 #5): the number a 100 TB ingest
    // design actually needs — the sf corpus replayed as DISJOINT
    // micro-batch slices (a real ingest, unlike the mutually-dissimilar
    // replica batches above) through the full front door: per-doc gate
    // stack (PII/quality/language/classifier) → decontamination gate →
    // incremental LSH index on the epoch backend. Reports input rows/s
    // over the whole run plus per-batch p50/p95 seconds.
    locally {
      val root = java.nio.file.Files.createTempDirectory("graft-ingest-tp").toString
      val stores = DedupStream.epochStores(s"$root/index")
      // ~1% of the corpus plays the benchmark/eval set (broadcast side)
      val bench = base.where(pmod(col("doc_id"), lit(97)) === 0)
      val gate = DedupStream.ContaminationGate(bench, s"$root/quarantine")
      val docGate = DedupStream.DocGate(s"$root/rejects", minQuality = 0.2,
        classifierThreshold = -1.0)
      val times = (0 until nBatches).map { i =>
        val slice = base.where(pmod(col("doc_id"), lit(nBatches)) === i)
        val t0 = System.nanoTime()
        val pairs = DedupStream.processBatch(slice, stores, s"$root/pairs",
          n = 5, numPerms = 32, bands = 8, threshold = 0.5,
          gate = Some(gate), docGate = Some(docGate))
        val s = (System.nanoTime() - t0) / 1e9
        stores.maintain(spark)
        println(f"[dedup-scale] gated-ingest batch=$i docs~${nBase / nBatches} pairs=$pairs t=$s%.2f s")
        s
      }
      val sorted = times.sorted
      def pct(p: Double) = sorted(math.min(sorted.length - 1,
        math.ceil(p * sorted.length).toInt - 1))
      val total = times.sum
      println(f"[dedup-scale] gated-ingest SUMMARY: docs=$nBase batches=$nBatches " +
        f"total=$total%.1f s rows/s=${nBase / total}%.0f " +
        f"p50=${pct(0.5)}%.2f s p95=${pct(0.95)}%.2f s max=${sorted.last}%.2f s")
    }
    spark.stop()
  }
}
