package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition a data pipeline
  * actually runs, built entirely from this library's operators:
  *
  *   quality gate ([[TextAnalysis.qualityScore]]) →
  *   language gate ([[TextAnalysis.languageId]]) →
  *   exact dedup (keep the lowest doc_id per normalized fingerprint,
  *   [[TextAnalysis.fingerprint]]) →
  *   near-dup removal (connected components over the MinHash-LSH pair
  *   graph, [[Dedup.dupClusters]]: only each cluster's minimum doc_id
  *   survives — transitively canonical, unlike a greedy per-pair drop).
  *
  * Every stage is independently oracle-checked (q31/q32/q33/q46/q53); the
  * composition is oracle-checked as q52. All joins are on doc_id (or the
  * tiny fingerprint aggregate) — no stage is quadratic, so the pipeline
  * scales exactly as far as its dedup stage does.
  */
object CorpusPrep {

  /** @return surviving (doc_id, n_tokens, quality) rows.
    *
    * The MinHash stage is parameterized on its base hash because at corpus
    * scale the per-shingle digest dominates the whole pipeline's cost: the
    * production default is [[Dedup.xxhashBase]] (codegen'd, digest-free);
    * the md5-portable base ([[Dedup.md5Base]], 16 perms × 8 bands) exists
    * only so the q52 oracle can replay the identical arithmetic in DuckDB.
    */
  def prepare(docs: DataFrame, minQuality: Double = 0.4, lang: String = "en",
              nearDupThreshold: Double = 0.5,
              numPerms: Int = 64, bands: Int = 16,
              baseHash: Column => Column = Dedup.xxhashBase): DataFrame = {
    // qualityScore is already one row per doc_id — no extra join with docs
    val quality = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"), col("n_tokens"))
    val language = TextAnalysis.languageId(docs)
      .select(col("doc_id"), col("predicted_lang"))
    val gated = quality.where(col("quality") >= minQuality)
      .join(language.where(col("predicted_lang") === lang), Seq("doc_id"))
    // exact dedup: lowest doc_id per normalized-text fingerprint survives
    val fp = TextAnalysis.fingerprint(docs).select(col("doc_id"), col("fingerprint"))
    val canon = fp.groupBy(col("fingerprint")).agg(min(col("doc_id")).as("keep_id"))
    val exactKept = fp.join(canon, Seq("fingerprint"))
      .where(col("doc_id") === col("keep_id")).select("doc_id")
    // near-dup removal: non-canonical members of every dup CLUSTER drop
    // (cluster label = min reachable doc_id through any chain of pairs)
    val nearDropped = Dedup.dupClusters(
      Dedup.minhashLshPairs(docs, numPerms = numPerms, bands = bands,
        threshold = nearDupThreshold, baseHash = baseHash))
      .where(col("cluster_id") =!= col("doc_id"))
      .select("doc_id")
    gated
      .join(exactKept, Seq("doc_id"))
      .join(nearDropped, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"), col("quality"))
  }
}
