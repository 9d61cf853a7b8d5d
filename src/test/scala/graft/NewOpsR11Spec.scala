package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions: the gap-slice rewrite of dedupSpans' cut (the
  * O(len + drops) path replacing the per-position coverage scan).
  */
class NewOpsR11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedupSpans gap cut: overlapping, touching, and dense drop intervals") {
    val docs = Seq(
      // origin holds both 3-grams "a b c" and "b c d"
      (1L, "a b c d"),
      // OVERLAPPING drops in the re-poster: starts {2, 3}, covered [2,5]
      (2L, "x1 a b c d x2"),
      // TOUCHING drops: starts {2, 5} with n=3 -> covered [2,4]+[5,7],
      // the between-gap is exactly empty
      (3L, "y1 a b c a b c y2"),
      // drop at position 1 (empty head gap) and at the end (empty tail)
      (4L, "a b c w a b c")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupSpans(docs, n = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, 4L, "a b c d"),
      (2L, 6L, 2L, "x1 x2"),
      (3L, 8L, 2L, "y1 y2"),
      (4L, 7L, 1L, "w")))
  }

  test("dedupSpans gap cut: single drop start exercises the size(d)=1 branch") {
    val docs = Seq(
      (1L, "p q r"),
      (2L, "h1 h2 p q r t1 t2") // one drop at 3 -> covered [3,5]
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupSpans(docs, n = 3, minDocs = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 3L, "p q r"),
      (2L, 7L, 4L, "h1 h2 t1 t2")))
  }

  test("noveltyDecayByEpoch excludes null-epoch docs instead of banding them") {
    val docs = Seq(
      (1L, "a b c d", Some(10L)),
      (2L, "a b c d", Some(20L)),   // all shingles first seen at epoch 10
      (3L, "a b c d", None)         // null epoch: excluded, not a null band
    ).toDF("doc_id", "text", "epoch")
    val got = TextAnalysis.noveltyDecayByEpoch(docs, col("epoch"), n = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(10L, 20L)) // no null band in the output
    assert(got === Seq((10L, 2L, 2L, 10000L), (20L, 2L, 0L, 0L)))
  }

  test("dedupSpans gap cut: randomized parity with the per-position coverage formula") {
    // 40 docs over a 6-token alphabet: dense repeated 3-grams with every
    // overlap/touch/containment pattern. The gap-slice cut must equal the
    // r10 per-position formula token for token.
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (1L to 40L).map { id =>
      val len = 3 + rnd.nextInt(30)
      (id, (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val n = 3
    val fast = TextAnalysis.dedupSpans(docs, n = n, minDocs = 2)
      .select("doc_id", "n_tokens", "n_kept", "cleaned")
    // reference cut: re-derive drop starts independently and filter with
    // the per-position exists() scan (the r10 shape, kept as the oracle)
    val base = docs.select(col("doc_id"),
      coalesce(TextAnalysis.tokens(TextAnalysis.asciiLower(col("text"))), array()).as("__w"))
    val spans = base.where(size(col("__w")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("__w")) - (n - 1)),
          s => struct(s.as("s"),
            array_join(slice(col("__w"), s, lit(n)), " ").as("shingle")))).as("__sp"))
      .select(col("doc_id"), col("__sp.s").as("s"), col("__sp.shingle").as("shingle"))
    val rep = spans.select(col("shingle"), col("doc_id")).distinct()
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"), min(col("doc_id")).as("__first"))
      .where(col("__df") >= 2)
    val dropStarts = spans.join(rep, Seq("shingle"))
      .where(col("doc_id") =!= col("__first"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("s"))).as("__drops"))
    val slow = base.join(dropStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("__w")).cast("long").as("n_tokens"),
        when(col("__drops").isNull, col("__w"))
          .otherwise(transform(
            filter(sequence(lit(1), size(col("__w"))),
              p => !exists(col("__drops"), s => s <= p && p < s + lit(n))),
            p => element_at(col("__w"), p))).as("__kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), " ").as("cleaned"))
    val f = fast.orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val s = slow.orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(f === s)
    // sanity: the corpus actually produced cuts (not a vacuous pass)
    assert(f.exists(r => r._3 < r._2))
  }
}
