package graft

import graft.operators.{Dedup, Stats, TextAnalysis}
import graft.streaming.HammingStream
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 semantics pins: the null-measure exclusion convention in the
  * counting-quantile machinery, the tick-exact count-ratio rounds (with
  * the 34/64 half-tie that motivated them), the pinInput value-identity
  * contract, and the HammingStream crash-replay pair dedup.
  */
class NewOpsR12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantileBuckets: null measures shape no cut; null rows land in bucket 1") {
    // 8 non-null values 1..8, k=4 -> cuts at 2,4,6; two nulls must not
    // shift the targets (pre-fix they cumulated FIRST and moved every cut)
    val df = (Seq.fill(2)(Option.empty[Long]) ++ (1L to 8L).map(Some(_)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = Stats.quantileBuckets(df, "v", k = 4)
      .select(col("v"), col("bucket")).as[(Option[Long], Int)].collect()
    val byV = got.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byV(None) === Seq(1)) // cuts < NULL filters every cut
    assert(byV(Some(2L)) === Seq(1) && byV(Some(3L)) === Seq(2) &&
      byV(Some(4L)) === Seq(2) && byV(Some(5L)) === Seq(3) &&
      byV(Some(8L)) === Seq(4))
  }

  test("quantileBuckets: pinInput=true is value-identical to pinInput=false") {
    val df = (1L to 40L).map(i => (i, i % 7)).toDF("id", "v")
    def run(pin: Boolean) =
      Stats.quantileBuckets(df, "v", k = 5, pinInput = pin)
        .orderBy("id").as[(Long, Long, Int)].collect().toSeq
    assert(run(true) === run(false))
  }

  test("dedupLines: pinned line stream is value-identical to pin.mode=none") {
    val docs = Seq(
      (1L, "a\nb\nc"), (2L, "a\nx\ny"), (3L, "b\nz"), (4L, "only")
    ).toDF("doc_id", "text")
    def run() = TextAnalysis.dedupLines(docs).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val pinned = run()
    val prior = spark.conf.getOption("spark.graft.pin.mode")
    spark.conf.set("spark.graft.pin.mode", "none")
    try assert(run() === pinned)
    finally prior match {
      case Some(m) => spark.conf.set("spark.graft.pin.mode", m)
      case None => spark.conf.unset("spark.graft.pin.mode")
    }
  }

  test("dedupSpans: pinned token base is value-identical to pin.mode=none") {
    // doc 1 is the first container of the repeated 3-gram; docs 2 and 3
    // must lose it; doc 4 is clean and survives whole
    val docs = Seq(
      (1L, "a b c d e"), (2L, "x a b c y"), (3L, "a b c"), (4L, "p q r")
    ).toDF("doc_id", "text")
    def run() = TextAnalysis.dedupSpans(docs, n = 3).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val pinned = run()
    val prior = spark.conf.getOption("spark.graft.pin.mode")
    spark.conf.set("spark.graft.pin.mode", "none")
    try assert(run() === pinned)
    finally prior match {
      case Some(m) => spark.conf.set("spark.graft.pin.mode", m)
      case None => spark.conf.unset("spark.graft.pin.mode")
    }
  }

  test("quantileNormTable: pinned quality projection is value-identical to pin.mode=none") {
    val docs = Seq(
      (1L, "s1", "alpha beta gamma delta"), (2L, "s1", "alpha alpha alpha"),
      (3L, "s2", "the quick brown fox jumps"), (4L, "s2", "zz"),
      (5L, "s1", "one two three four five six")
    ).toDF("doc_id", "source", "text")
    def run() = TextAnalysis.quantileNormTable(docs, q = 4)
      .as[(String, Long, Option[Double], Option[Double])].collect().toSeq
    val pinned = run()
    val prior = spark.conf.getOption("spark.graft.pin.mode")
    spark.conf.set("spark.graft.pin.mode", "none")
    try assert(run() === pinned)
    finally prior match {
      case Some(m) => spark.conf.set("spark.graft.pin.mode", m)
      case None => spark.conf.unset("spark.graft.pin.mode")
    }
  }

  test("estJaccardExpr: 34 of 64 matching perms (0.53125, an exact 4dp half-tie) rounds HALF_UP") {
    // signatures agreeing on exactly the first 34 of 64 positions
    val a = (0 until 64).map(_.toLong)
    val b = (0 until 64).map(i => if (i < 34) i.toLong else -1L)
    val got = Seq((a, b)).toDF("sig_a", "sig_b")
      .select(Dedup.estJaccardExpr(64).as("est")).as[Double].head()
    assert(got === 0.5313) // float round was engine-dependent at the tie
  }

  test("repetitionStats: dup fraction at an exact half-tie (17/32 distinct of 32 words)") {
    // 32 words, 17 distinct -> dup_word_frac = 15/32 = 0.46875: HALF_UP
    // 4dp = 0.4688 on BOTH engines under the tick form
    val words = ((0 until 17).map(i => s"w$i") ++ Seq.fill(15)("w0")).mkString(" ")
    val got = TextAnalysis.repetitionStats(Seq((1L, words)).toDF("doc_id", "text"))
      .select(col("dup_word_frac")).as[Double].head()
    assert(got === 0.4688)
  }

  test("oovRate: count ratio ties (odd/128) round HALF_UP exactly") {
    // one doc of 128 tokens, exactly 1 OOV under a 100-token vocab built
    // from a second doc is hard to control; drive the tick arithmetic
    // directly through qualityScore's sibling instead: 1/128 = 0.0078125
    // -> 6dp HALF_UP = 0.007813
    val docs = Seq(
      (1L, (Seq.fill(127)("common") :+ "rareword1").mkString(" ")),
      (2L, "common")).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(docs, vocabSize = 1)
      .where(col("doc_id") === 1L).select(col("oov_rate")).as[Double].head()
    assert(got === 0.007813)
  }

  test("Multimodal ticks6 overflow guard: past the Long wrap point the BigInt path stays exact") {
    val num = 5000000000000L // 5e12 > the ~4.6e12 Long fast-path bound
    val den = 7L * 1000000L
    assert(2L * num * 1000000L < 0L) // the unguarded formula WOULD wrap
    val expect = ((BigInt(2) * num * 1000000 + den) / (BigInt(2) * den)).toDouble / 1e6
    assert(graft.sources.Multimodal.ticks6(num, den) === expect)
    // the fast path still matches the exact rational in range
    assert(graft.sources.Multimodal.ticks6(1L, 128L) === 0.007813) // odd/128 tie
    assert(graft.sources.Multimodal.ticks6(34L, 64L * 100L) === 0.005313)
  }

  test("HammingStream: crash-replay duplicate pairs dedup before the append") {
    val root = Files.createTempDirectory("graft-hcrash").toString
    val stores = HammingStream.epochStores(s"$root/index")
    val sketches = Seq(
      (1L, 0x1234L, 0x5678L),
      (2L, 0x1234L, 0x5678L)).toDF("id", "lo", "hi") // a Hamming-0 pair
    // simulate the crash: bands upserted, ids-ledger append LOST
    val w1 = HammingStream.processBatch(sketches, stores, s"$root/pairs")
    assert(w1 === 1L)
    // drop the ledger wholesale (stronger than the partial-crash case)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete(); ()
    }
    rmrf(new java.io.File(s"$root/index/ids"))
    val stores2 = HammingStream.epochStores(s"$root/index")
    // re-ingest: both docs look fresh, their postings are already in the
    // band store -> the pair arrives from BOTH the nn and nh legs; the
    // batch-level dedup plus the sink's id anti-join must keep ONE row
    val w2 = HammingStream.processBatch(sketches, stores2, s"$root/pairs")
    assert(w2 === 0L) // the sink already holds 1_2
    val pairs = spark.read.parquet(s"$root/pairs")
    assert(pairs.count() === 1L)
    assert(pairs.select("id_a", "id_b").as[(Long, Long)].head() === ((1L, 2L)))
  }
}
