package graft

import graft.operators.{Dedup, Similarity, Stats, TextAnalysis}
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the round-8 operator batch (q287–q293):
  * two-engine agreement can hide a shared formula bug, so every new
  * statistic also pins its arithmetic against values computed by hand.
  */
class NewOpsR8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hapax census: occurrence-count hapax, per-source vocab, HALF_UP bp") {
    val docs = Seq(
      (1L, "alpha beta alpha", Option("s1")), // alpha df=2 (within doc!), beta df=2
      (2L, "beta gamma", Option("s1")),       // gamma df=1 -> hapax of s1
      (3L, "delta", Option.empty[String])     // delta df=1 -> hapax of <none>
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.hapaxCensus(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    // s1 vocab {alpha, beta, gamma}: alpha tf=2, beta tf=2, gamma tf=1
    // -> 1 hapax of 3 = HALF_UP(10000/3) = 3333
    assert(got === Seq(("<none>", 1L, 1L, 10000L), ("s1", 3L, 1L, 3333L)))
  }

  test("dup inflation: copies inflate, null text excluded, sentinel source") {
    val docs = Seq(
      (1L, Option("Hello  World"), Option("s1")),
      (2L, Option("hello world"), Option("s1")),   // same normalized fp
      (3L, Option("different"), Option("s1")),
      (4L, Option.empty[String], Option("s1")),    // no fingerprint
      (5L, Option("x"), Option.empty[String])
    ).toDF("doc_id", "text", "source")
    val got = Dedup.dupInflation(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    // s1: 3 docs, 2 unique -> HALF_UP(30000/2) = 15000
    assert(got === Seq(("<none>", 1L, 1L, 10000L), ("s1", 3L, 2L, 15000L)))
  }

  test("token dispersion: floor-bp distinct-doc share, (tf desc, token) rank") {
    val docs = Seq(
      (1L, "spam spam spam eggs"),
      (2L, "spam eggs")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenDispersion(docs, k = 2)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // spam tf=4 df=2 -> 5000; eggs tf=2 df=2 -> 10000
    assert(got === Seq((1L, "spam", 4L, 2L, 5000L), (2L, "eggs", 2L, 2L, 10000L)))
  }

  test("label margin: a vector on the wrong side of two axis clusters goes negative") {
    val emb = Seq(
      (1L, Array(1f, 0f), Option(0)), (2L, Array(1f, 0f), Option(0)),
      (3L, Array(0f, 1f), Option(1)), (4L, Array(0f, 1f), Option(1)),
      (5L, Array(0f, 1f), Option(0)), // mislabeled: sits on label-1's axis
      (6L, Array(0f, 0f), Option(1)), // zero vector: cosine 0 to every centroid
      (7L, Array(1f, 1f), Option.empty[Int]) // unlabeled: excluded
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelMarginWorst(emb, k = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    // worst margin must be the mislabeled vector 5, rival label 1,
    // and its margin strictly negative
    assert(got.head._2 === 5L && got.head._4 === 1L && got.head._5 < 0L)
    // the zero vector's cosines are all 0.0 -> margin exactly 0
    val zeroRow = got.find(_._2 === 6L)
    assert(zeroRow.forall(_._5 === 0L))
  }

  test("neyman allocation: zero-variance stratum gets nothing; remainders to largest") {
    val df1 = Seq(("a", 0L), ("a", 2L), ("b", 5L), ("b", 5L))
      .toDF("k", "t")
    val got1 = Stats.neymanAllocation(df1, "k", "t", budget = 10L)
      .as[(String, Long, Long, Long)].collect().toSeq
    // a: 2·(0+4) − 4 = 4, w=2; b: 2·50 − 100 = 0, w=0 -> all 10 to a
    assert(got1 === Seq(("a", 2L, 2L, 10L), ("b", 2L, 0L, 0L)))
    val df2 = Seq(("a", 0L), ("a", 2L), ("b", 0L), ("b", 2L), ("c", 0L), ("c", 2L))
      .toDF("k", "t")
    val got2 = Stats.neymanAllocation(df2, "k", "t", budget = 10L)
      .as[(String, Long, Long, Long)].collect().toSeq
    // equal weights 2,2,2: base 3 each, leftover 1 -> key-ascending tie
    assert(got2 === Seq(("a", 2L, 2L, 4L), ("b", 2L, 2L, 3L), ("c", 2L, 2L, 3L)))
    // allocations always sum to the budget exactly
    assert(got2.map(_._4).sum === 10L)
  }

  test("mutual best match: reciprocal best survives, one-directional best does not") {
    // even docs 0,2; odd docs 1,3. 0~1 strongly similar (mutual best);
    // 2 is closest to 1 too, but 1's best is 0 -> (2,1) is one-directional
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon eta"),
      (2L, "alpha beta gamma theta iota kappa"),
      (3L, "completely unrelated words here nothing shared")
    ).toDF("doc_id", "text")
    val got = Dedup.mutualBestMatch(docs, n = 2, numPerms = 16, bands = 8,
      threshold = 0.05).as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) === Seq((0L, 1L)))
  }

  test("heaps law: one new token per doc gives vocab(n)=n and slope exactly 1000 milli") {
    val docs = Seq(
      (1L, "t1"), (2L, "t1 t2"), (3L, "t2 t3"), (4L, "t3 t4")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.heapsLawCurve(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 1000L), (2L, 2L, 1000L), (4L, 4L, 1000L)))
  }

  test("cluster purity: pure axis cells read 10000 bp, a mixed cell reads its majority") {
    val emb = Seq(
      (0L, Array(1f, 0f), Option(0)),  // seed 0 (cluster 0, axis e1)
      (1L, Array(0f, 1f), Option(1)),  // seed 1 (cluster 1, axis e2)
      (2L, Array(2f, 0f), Option(0)),
      (3L, Array(3f, 0f), Option(0)),
      (4L, Array(0f, 2f), Option(1)),
      (5L, Array(0f, 3f), Option(0)),  // mislabeled into cluster 1
      (6L, Array(0f, 0f), Option(0)),  // zero norm: excluded
      (7L, Array(1f, 1f), Option.empty[Int]) // unlabeled: excluded
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.clusterLabelPurity(emb, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // cluster 0 = {0,2,3} all label 0 -> 10000; cluster 1 = {1,4,5}
    // labels (1,1,0) -> majority 1, HALF_UP(20000*2+3 / 6) = 3334? no:
    // (2*20000+3) div 6 = 40003 div 6 = 6667
    assert(got === Seq((0L, 3L, 0L, 10000L), (1L, 3L, 1L, 6667L)))
  }

  test("lsh design: candidate volume from bucket sizes; exact rational recall constants") {
    // two identical docs share every shingle -> same signature -> in
    // EVERY config each band has one bucket of size 2 => pairs = bands
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "k l m n o p q r s t")
    ).toDF("doc_id", "text")
    val got = Dedup.lshDesignTable(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    got.foreach { case (b, r, nb, pairs, est) =>
      assert(r === 16L / b)
      assert(pairs === b, s"bands=$b: dup pair once per band")
      assert(nb === 2L * b, s"bands=$b: dup bucket + the lone doc's bucket per band")
    }
    // est recall at θ=1/2: 1 − ((2^r−1)^b)/2^16, HALF_UP micro
    assert(got.map(_._5) === Seq(7797L, 227524L, 899887L))
  }

  test("lognormal fit: constant lengths give sigma 0 and mu = ln micro") {
    val docs = Seq(("s", 100L), ("s", 100L), ("t", 1L)).toDF("k", "v")
    val got = Stats.lognormalFit(docs, "k", "v")
      .as[(String, Long, Long, Long)].collect().toSeq
    val ln100 = math.round(math.log(100.0) * 1e6)
    assert(got === Seq(("s", 2L, ln100, 0L), ("t", 1L, 0L, 0L)))
  }

  test("ivf probe curve: recall grows monotonically with probes and tops out exact") {
    val emb = Seq.tabulate(40) { i =>
      (i.toLong * 100, Array.tabulate(4)(j => if (j == i % 4) 1f + i / 8f else 0.1f * (i % 3)))
    }.toDF("vec_id", "embedding")
    val got = Similarity.ivfProbeCurve(emb, pmod(col("vec_id"), lit(100)) === 0,
      k = 5, nLists = 4, probes = Seq(1, 2, 4))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 4L))
    val recalls = got.map(_._5)
    assert(recalls === recalls.sorted, s"recall must be monotone in probes: $recalls")
    assert(recalls.last === 10000L, "probing every list is exhaustive -> exact recall")
  }
}
