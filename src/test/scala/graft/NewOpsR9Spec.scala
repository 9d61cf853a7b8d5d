package graft

import graft.operators.{Dedup, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the round-9 operator batch (q298–q300):
  * two-engine agreement can hide a shared formula bug, so every new
  * statistic also pins its arithmetic against values computed by hand.
  */
class NewOpsR9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // A={a,b,c,d} B={a,b,c,d,e} C={a,b} D={a,b} E={a,b,c,d,e,f}; at 2/3:
  // (A,B) c=4 u=5 band 80; (A,E) c=4 u=6 gate 12>=12 band 66;
  // (B,E) c=5 u=6 band 83; (C,D) identical band 100
  private lazy val bandDocs = Seq(
    (1L, "a b c d"), (2L, "a b c d e"), (3L, "a b"),
    (4L, "b  a"), (5L, "a b c d e f")
  ).toDF("doc_id", "text")

  test("jaccard band census: integer percent bands over the exact 2/3 pair graph") {
    val got = Dedup.jaccardBandCensus(bandDocs, 2, 3)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((66L, 1L), (80L, 1L), (83L, 1L), (100L, 1L)))
  }

  test("dup degree census: both orientations counted, zero-degree docs excluded") {
    val got = Dedup.dupDegreeCensus(bandDocs, 2, 3)
      .as[(Long, Long)].collect().toSeq
    // degrees: A=2 (B,E), B=2 (A,E), E=2 (A,B), C=1, D=1
    assert(got === Seq((1L, 2L), (2L, 3L)))
  }

  test("dup degree census at 19/20: only identical small sets pair") {
    // sets under 20 tokens can only reach J >= 19/20 when identical
    val got = Dedup.dupDegreeCensus(bandDocs, 19, 20)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L))) // C and D, degree 1 each
  }

  test("arrival novelty decay: first-seen split, short/null docs drop, HALF_UP bp") {
    val docs = Seq(
      (0L, Option("x y z x y z")),     // shingles {xyz, yzx, zxy}: all novel
      (5L, Option("a b")),             // < 3 tokens: no shingles
      (7L, Option.empty[String]),      // null text: no shingles (but in max id)
      (9L, Option("x y z w"))          // {xyz (seen in doc 0), yzw (novel)}
    ).toDF("doc_id", "text")
    val got = TextAnalysis.arrivalNoveltyDecay(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // max_id 9 -> band = (10*id) div 10 = id; doc0: 3/3 -> 10000;
    // doc9: 1/2 -> HALF_UP(5000.0) = (20000+2) div 4 = 5000
    assert(got === Seq((0L, 3L, 3L, 10000L), (9L, 2L, 1L, 5000L)))
  }

  test("arrival novelty decay: empty corpus yields an empty curve") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.arrivalNoveltyDecay(empty).count() === 0L)
  }

  test("shingle df spectrum: bit-length bands, postings sum to df mass") {
    val docs = Seq(
      (1L, "a b c d e f"),  // shingles: "a b c d e", "b c d e f"
      (2L, "a b c d e f"),  // same two
      (3L, "a b c d e"),    // "a b c d e" again -> its df = 3
      (4L, "x y z w v")     // unique shingle, df = 1
    ).toDF("doc_id", "text")
    val got = Dedup.shingleDfSpectrum(docs, n = 5)
      .as[(Long, Long, Long)].collect().toSeq
    // df=1 -> band 0 (1 shingle); df=2 and df=3 -> band 1 (2 shingles,
    // 5 postings)
    assert(got === Seq((0L, 1L, 1L), (1L, 2L, 5L)))
  }

  test("minhash error census: identical docs land in band 10 with zero error") {
    val docs = (1L to 4L).map(i => (i, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashErrorCensus(docs)
      .as[(Long, Long, Long)].collect().toSeq
    // all 4 docs share every shingle: every LSH bucket collides, est = 1,
    // exact = 1 -> band 10, C(4,2) = 6 pairs, error 0
    assert(got === Seq((10L, 6L, 0L)))
  }

  test("simhash hamming census: identical docs at distance 0, sums match the pair relation") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta"), (4L, "totally different words here"),
      (5L, "unrelated content entirely now")
    ).toDF("doc_id", "text")
    val census = Dedup.simhashHammingCensus(docs)
      .as[(Long, Long)].collect().toMap
    assert(census.getOrElse(0L, 0L) >= 3L) // the three identical-doc pairs
    assert(census.values.sum === Dedup.simhashPairsPortable(docs).count())
  }

}
