package graft

import graft.operators.Dedup
import graft.streaming.HammingStream
import java.nio.file.Files
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
