package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[knnCosineBrute]]: exact brute-force top-k — the correctness baseline.
  *     The query set is broadcast, so the scan side streams once with no
  *     shuffle of the corpus; cost is O(|queries| · |corpus| · dim) of pure
  *     codegen'd arithmetic.
  *   - [[annLshTopK]]: random-hyperplane LSH — the 100 TB path. Vectors are
  *     bucketed by sign-pattern hashes; only same-bucket pairs are scored,
  *     replacing the full cross product with per-bucket joins.
  *
  * Dot products use `zip_with` + `aggregate` higher-order functions over
  * double-cast floats: a strictly sequential left-to-right fold, so results
  * are bit-deterministic regardless of partitioning.
  *
  * Rounding policy for every `round(cosine, 6)` in this file: the quotient
  * is DOUBLE-on-DOUBLE — both engines derive the identical IEEE double
  * from identical float inputs (same fold order, correctly-rounded sqrt),
  * so the only divergence window is an exact decimal half-tie at the 6th
  * place, which a continuous dot-product quotient does not land on
  * (measured: zero cosine divergences across the sf0.1 stress sweep that
  * DID flag the count-derived ratios). The integer-rational ticks
  * discipline ([[graft.operators.TextAnalysis.qualityExpr]], Multimodal's
  * ticks6) applies to COUNT-derived ratios, where exact .5 ties are
  * dense; forcing these float quotients through it would add a lossy
  * quantization step for no parity gain.
  */
object Similarity {

  /** Dot product via the native codegen expression
    * ([[graft.functions.DotProduct]]): a primitive loop instead of the HOF
    * `aggregate(zip_with(...))`, which materializes an intermediate array
    * per row. Same sequential summation order — bit-identical results.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_product(a, b)

  def l2norm(v: Column): Column =
    graft.functions.VectorFunctions.l2_norm(v)

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Exact cosine top-k for a query subset.
    *
    * @param queryPred picks the query rows (e.g. vec_id % 100 === 0)
    * @return query_id, neighbor_id, cosine (rounded 6dp), rank — rank ordered
    *         by rounded cosine desc then neighbor_id, so ordering is stable
    *         under float noise below the rounding grid.
    */
  def knnCosineBrute(embeddings: DataFrame, queryPred: Column, k: Int = 10): DataFrame =
    rankTopK(cosineScoredBrute(embeddings, queryPred), k)

  /** Metadata-filtered exact top-k — the vector-store "filtered search":
    * candidates are restricted by a predicate over their OWN columns
    * (label, source, date …) BEFORE ranking. Pre-filter semantics by
    * design: every query gets its k best matches FROM the admissible
    * set, where post-filtering an unfiltered top-k would return fewer
    * than k (or none) once the filter bites. Queries are drawn from the
    * unfiltered relation — a query need not satisfy the candidate
    * predicate. The filter is a plain pushed-down scan predicate on the
    * candidate side, so selective filters make the search CHEAPER, and
    * at corpus scale the same predicate composes with the IVF cell
    * probe ([[annIvfTopK]]) unchanged.
    */
  def knnCosineFiltered(embeddings: DataFrame, queryPred: Column,
                        candidatePred: Column, k: Int = 10): DataFrame =
    rankTopK(cosineScoredBrute(embeddings, queryPred, candidatePred), k)

  /** All (query, candidate) cosines for a query subset: the broadcast
    * brute scorer shared by [[knnCosineBrute]], [[knnCosineFiltered]]
    * and [[hardNegatives]]. Cosines are rounded to 6dp BEFORE any
    * downstream ranking or band filter, so ordering and band membership
    * are stable under float noise below the rounding grid.
    */
  private def cosineScoredBrute(embeddings: DataFrame, queryPred: Column,
                                candidatePred: Column = lit(true)): DataFrame = {
    def prep(df: DataFrame): DataFrame =
      df.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("norm", l2norm(col("v")))
        // cosine is undefined for the zero vector: it can be neither a
        // query nor a neighbor (ANSI would raise on the 0-norm division)
        .where(col("norm") > 0)
    val queries = prep(embeddings.where(queryPred))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm"))
    prep(embeddings.where(candidatePred))
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("v"), col("qv")) / (col("norm") * col("qnorm")), 6).as("cosine"))
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Contrastive hard-negative mining: for each query vector, the top-k
    * candidates whose cosine lies in `[lo, hi)` — similar enough to be
    * informative negatives for embedding/reranker training, but below
    * the near-dup band (`hi`) where a "negative" would actually be a
    * positive, and above the floor (`lo`) where negatives are trivial.
    * The band is evaluated on the 6dp-rounded cosine, so membership is
    * engine-portable.
    *
    * Same broadcast brute scorer as [[knnCosineBrute]] — exact, and the
    * right baseline while the query set broadcasts. At corpus scale,
    * mid-band candidates defeat high-similarity LSH buckets by design,
    * so the scale path is IVF: probe the query's nearest few centroid
    * cells ([[annIvfTopK]]'s machinery) and band-filter within them —
    * same semantics, candidates bounded by probed-cell volume.
    */
  def hardNegatives(embeddings: DataFrame, queryPred: Column, k: Int = 10,
                    lo: Double = 0.1, hi: Double = 0.8): DataFrame = {
    require(lo < hi, "hard-negative band must be non-empty (lo < hi)")
    rankTopK(cosineScoredBrute(embeddings, queryPred)
      .where(col("cosine") >= lo && col("cosine") < hi), k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with cosine ≥
    * threshold, as a naive non-equi self-join (BroadcastNestedLoopJoin).
    * Test-oracle baseline ONLY — the shipped path is
    * [[cosineDupPairsBlocked]] (same output, block-partitioned equi-join).
    */
  def cosineDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0) // zero-norm: no cosine, excluded on both sides
    base.as("a").join(base.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Semantic benchmark decontamination: for every corpus vector, its
    * single best cosine against the BENCHMARK set and a contamination
    * flag at `threshold` — the embedding-space complement of the n-gram
    * decontamination scan ([[TextAnalysis]] shingle overlap), catching
    * paraphrased eval leakage that exact n-grams miss. The benchmark
    * side is broadcast (eval suites are bounded by construction — the
    * same contract as the n-gram variant's broadcast shingle set), so
    * the corpus streams once with zero shuffle: cost is
    * O(|corpus|·|bench|·dim) of codegen'd arithmetic, embarrassingly
    * parallel at any corpus size. The argmax is a struct extreme on
    * (cosine, −bench_id) — max cosine, ties to the LOWEST benchmark id,
    * no window. Flags compare the 6dp-ROUNDED cosine (portable).
    * Zero-norm vectors are excluded on BOTH sides (cosine undefined —
    * they surface in the [[embeddingAudit]]-style pre-flight instead
    * of silently flagging as NaN). Output: vec_id, best_bench_id,
    * cosine, contaminated.
    */
  def semanticDecontamination(embeddings: DataFrame, benchPred: Column,
                              threshold: Double = 0.95): DataFrame = {
    def prep(df: DataFrame): DataFrame =
      df.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("norm", l2norm(col("v")))
        .where(col("norm") > 0)
    val bench = prep(embeddings.where(benchPred))
      .select(col("vec_id").as("bench_id"), col("v").as("bv"),
        col("norm").as("bnorm"))
    prep(embeddings.where(!benchPred))
      .join(broadcast(bench))
      .select(col("vec_id"),
        round(dot(col("v"), col("bv")) / (col("norm") * col("bnorm")), 6)
          .as("cosine"),
        col("bench_id"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cosine"), (-col("bench_id")).as("nb"))).as("__m"))
      .select(col("vec_id"), (-col("__m.nb")).as("best_bench_id"),
        col("__m.cosine").as("cosine"),
        (col("__m.cosine") >= threshold).as("contaminated"))
      .orderBy(col("vec_id"))
  }

  /** Mutual-kNN pairs over a sample: (a, b) where each is in the
    * other's exact top-k — the reciprocal-neighbor graph that seeds
    * density clustering and chunk-level near-dup review (one-directional
    * kNN edges are dominated by hubs; mutuality is the standard hub
    * filter). Exact brute kNN within the sample (both sides of each
    * dot product come from the broadcast sample — sample² work by
    * declaration); at corpus scale the same mutuality join composes
    * over [[annIvfTopK]] output unchanged. Pairs emit once (a < b)
    * with both directed ranks. Output: vec_a, vec_b, cosine, rnk_ab,
    * rnk_ba.
    */
  def mutualKnnPairs(embeddings: DataFrame, samplePred: Column,
                     k: Int = 5): DataFrame = {
    val knn = knnCosineBrute(embeddings.where(samplePred), lit(true), k)
    knn.as("f").join(knn.as("r"),
        col("f.query_id") === col("r.neighbor_id") &&
          col("f.neighbor_id") === col("r.query_id"))
      .where(col("f.query_id") < col("f.neighbor_id"))
      .select(col("f.query_id").as("vec_a"),
        col("f.neighbor_id").as("vec_b"), col("f.cosine").as("cosine"),
        col("f.rnk").as("rnk_ab"), col("r.rnk").as("rnk_ba"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Exact cosine-threshold pair join, block-partitioned: vectors are
    * assigned to `blocks` buckets by vec_id, every unordered block pair
    * (i ≤ j) becomes one equi-join key, and each input row is replicated to
    * exactly the block pairs it participates in (B+1 copies total). The
    * cross product then happens inside shuffle partitions of bounded size —
    * a SortMerge/ShuffledHash equi-join, never a BroadcastNestedLoopJoin
    * that ships one whole side to every executor.
    *
    * Exact all-pairs is inherently O(n²·dim); this is the standard way to
    * *distribute* that work. (An LSH pre-filter cannot replace it here
    * without changing answers: sign-LSH collision probability at cosine 0.3
    * is 1 − acos(0.3)/π ≈ 0.6 per plane, so banded recall at the threshold
    * is far below 1 on isotropic data — see [[cosineDupPairsLsh]] for the
    * recall-bounded sub-quadratic variant with its own contract.)
    * Output matches [[cosineDupPairs]] bit-for-bit: vec_a < vec_b, cosine
    * (rounded 6dp) ≥ threshold.
    *
    * @param blocks block count; per-task work is (n/blocks)²·dim, so at
    *               corpus scale pick blocks ≈ n·dim / flops-per-task. Block
    *               pair count B(B+1)/2 should be ≥ shuffle parallelism.
    *               Default 0 = derive from the session: the smallest B with
    *               B(B+1)/2 ≥ spark.sql.shuffle.partitions (≈ √(2·parts)),
    *               so the pair stage can occupy every shuffle slot whatever
    *               the cluster size — a FIXED B caps the exact path at
    *               B(B+1)/2 tasks no matter how many executors exist (the
    *               old blocks=8 ceiling was 36 tasks). Output is identical
    *               for any B: blocking only partitions the pair space.
    */
  def cosineDupPairsBlocked(embeddings: DataFrame, threshold: Double,
                            blocks: Int = 0): DataFrame = {
    val blocks0 =
      if (blocks > 0) blocks
      else {
        val parts = embeddings.sparkSession.sessionState.conf.numShufflePartitions
        // smallest B with B(B+1)/2 >= parts (ceil of the quadratic root)
        math.max(2, math.ceil((math.sqrt(8.0 * parts + 1) - 1) / 2).toInt)
      }
    cosineDupPairsBlockedAt(embeddings, threshold, blocks0)
  }

  private def cosineDupPairsBlockedAt(embeddings: DataFrame, threshold: Double,
                                      blocks: Int): DataFrame = {
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0) // zero-norm: no cosine, excluded on both sides
      .withColumn("blk", pmod(col("vec_id"), lit(blocks)).cast("int"))
    // row in block b joins pairs (b, j) j ≥ b on the left, (i, b) i ≤ b on
    // the right — each unordered block pair meets exactly once
    val lhs = base.select(col("vec_id").as("a_id"), col("v").as("a_v"),
      col("norm").as("a_norm"), col("blk").as("a_blk"),
      explode(sequence(col("blk"), lit(blocks - 1))).as("pj"))
      .withColumn("pi", col("a_blk"))
    val rhs = base.select(col("vec_id").as("b_id"), col("v").as("b_v"),
      col("norm").as("b_norm"), col("blk").as("b_blk"),
      explode(sequence(lit(0), col("blk"))).as("pi"))
      .withColumn("pj", col("b_blk"))
    lhs.join(rhs, Seq("pi", "pj"))
      // same-block pairs arrive in both orders; cross-block pairs once
      .where(col("a_blk") < col("b_blk") || col("a_id") < col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("vec_a"),
        greatest(col("a_id"), col("b_id")).as("vec_b"),
        round(dot(col("a_v"), col("b_v")) / (col("a_norm") * col("b_norm")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** (vec_id, table, bucket) rows: one sign-pattern bucket per hash table,
    * with the table index salted into the plane family — the shared bucket
    * hashing for every LSH path (in-plan ANN, pair dedup, persisted index).
    */
  private def tableBuckets(base: DataFrame, vecCol: String, numPlanes: Int,
                           numTables: Int, dim: Int): DataFrame =
    base.select(col("vec_id"),
      explode(array((0 until numTables).map(t =>
        struct(lit(t).as("table"),
          lshBucket(col(vecCol), numPlanes, t * numPlanes, dim).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))

  /** Exact-cosine scoring + per-query top-k — the shared tail of every ANN
    * path. Expects (query_id, neighbor_id, v, qv, norm, qnorm). */
  private def topKByCosine(cand: DataFrame, k: Int): DataFrame = {
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      round(dot(col("v"), col("qv")) / (col("norm") * col("qnorm")), 6).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Persist an LSH ANN index for query serving. Each build lands as a new
    * VERSION `dir/v<n>/` holding `vectors` (vec_id, v, norm), `buckets`
    * ((vec_id, table, bucket), PARTITIONED BY (table, bucket) so a query's
    * candidate fetch prunes to exactly the bucket directories its hash
    * lands in) and `meta` (the hash-family parameters, so [[queryLshIndex]]
    * can never probe with mismatched planes) — then a `_COMMIT` marker
    * (one atomic file create) publishes the version. Readers always
    * resolve the newest COMMITTED version ([[currentIndexDir]]): a crashed
    * rebuild leaves an unmarked directory that readers ignore and the next
    * build sweeps, the previous good index stays recoverable throughout,
    * and concurrent readers mid-rebuild keep serving the old version —
    * directory renames (not atomic on object stores) are never relied on.
    * Build cost is one pass over the corpus; the latest two committed
    * versions are retained.
    */
  def buildLshIndex(embeddings: DataFrame, dir: String, numPlanes: Int = 12,
                    numTables: Int = 4, dim: Int = 64): Unit = {
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0) // zero-norm: no cosine, excluded on both sides
    writeVersion(base, dir, numPlanes, numTables, dim)
  }

  /** Write one full index version from prepared (vec_id, v, norm) rows —
    * the shared tail of [[buildLshIndex]] and [[appendToLshIndex]]'s
    * threshold-triggered rebuild. */
  private def writeVersion(base: DataFrame, dir: String, numPlanes: Int,
                           numTables: Int, dim: Int): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = indexVersions(spark, dir, committedOnly = false)
    val next = (0L +: all.map(_._1)).max + 1
    val vdir = s"$dir/v$next"
    base.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$vdir/vectors")
    tableBuckets(base, "v", numPlanes, numTables, dim)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("table", "bucket").parquet(s"$vdir/buckets")
    Seq((numPlanes, numTables, dim)).toDF("num_planes", "num_tables", "dim")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$vdir/meta")
    fs.create(new org.apache.hadoop.fs.Path(vdir, "_COMMIT"), false).close()
    // retention: newest 2 committed versions; older ones and crashed
    // (unmarked) stages below the new version are swept
    val committed = indexVersions(spark, dir, committedOnly = true).map(_._1)
    val keep = committed.sorted.takeRight(2).toSet + next
    all.foreach { case (n, d) =>
      if (!keep.contains(n) && n < next)
        fs.delete(new org.apache.hadoop.fs.Path(d), true)
    }
  }

  /** Incrementally append new embeddings to the CURRENT committed index
    * version — a training-data pipeline appends vectors continuously, and
    * a full [[buildLshIndex]] rebuild per batch would be O(corpus) each
    * time. The batch lands as one delta epoch `v<n>/delta/epoch=<k>/`
    * (vectors + bucket-partitioned buckets, hashed with the version's OWN
    * meta parameters so probes can never mismatch planes), published by
    * one `_COMMIT` create — a crash before the marker leaves an invisible
    * delta and the old index keeps serving, the same contract as
    * [[graft.sink.EpochKeyedStore]]. [[queryLshIndex]] reads base +
    * committed deltas; once the delta count exceeds `rebuildAfterDeltas`,
    * the union is folded into a fresh full version (O(corpus), amortized
    * to O(corpus / rebuildAfterDeltas) per append) and retention sweeps
    * the delta-carrying version in due course.
    *
    * Caller contract: appended vec_ids are NEW (an id re-appended would
    * surface twice — dedupe upstream, e.g. via the dedup stream's ledger).
    * With no committed version yet, the append IS the first full build.
    */
  def appendToLshIndex(embeddings: DataFrame, dir: String,
                       rebuildAfterDeltas: Int = 8): Unit = {
    val spark = embeddings.sparkSession
    indexVersions(spark, dir, committedOnly = true).lastOption match {
      case None => buildLshIndex(embeddings, dir)
      case Some((_, vdir)) =>
        val meta = spark.read.parquet(s"$vdir/meta").head()
        val (numPlanes, numTables, dim) =
          (meta.getAs[Int]("num_planes"), meta.getAs[Int]("num_tables"), meta.getAs[Int]("dim"))
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val layout = new graft.sink.EpochLayout("epoch=")
        val deltaRoot = new org.apache.hadoop.fs.Path(s"$vdir/delta")
        val edir = s"$vdir/delta/${layout.dirName(layout.next(fs, Seq(deltaRoot)))}"
        val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
          .withColumn("norm", l2norm(col("v")))
        base.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$edir/vectors")
        tableBuckets(base, "v", numPlanes, numTables, dim)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("table", "bucket").parquet(s"$edir/buckets")
        layout.commit(fs, new org.apache.hadoop.fs.Path(edir))
        if (layout.list(fs, deltaRoot).count(_._3) > rebuildAfterDeltas)
          writeVersion(indexMembers(spark, vdir)._1, dir, numPlanes, numTables, dim)
    }
  }

  /** (vectors, buckets) of one version: its base plus every committed
    * delta epoch appended since — both unioned member-wise, so the bucket
    * side keeps its per-member (table, bucket) partition pruning. */
  private def indexMembers(spark: org.apache.spark.sql.SparkSession,
                           vdir: String): (DataFrame, DataFrame) = {
    val fs = new org.apache.hadoop.fs.Path(vdir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val layout = new graft.sink.EpochLayout("epoch=")
    val deltas = layout.list(fs, new org.apache.hadoop.fs.Path(s"$vdir/delta"))
      .filter(_._3).map(_._2.toString)
    val vectors = (spark.read.parquet(s"$vdir/vectors") +:
      deltas.map(d => spark.read.parquet(s"$d/vectors"))).reduce(_ unionByName _)
    val buckets = (spark.read.parquet(s"$vdir/buckets") +:
      deltas.map(d => spark.read.parquet(s"$d/buckets"))).reduce(_ unionByName _)
    (vectors, buckets)
  }

  private def indexVersions(spark: org.apache.spark.sql.SparkSession, dir: String,
                            committedOnly: Boolean): Seq[(Long, String)] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).filter(_.isDirectory).toSeq
      .flatMap { s =>
        val name = s.getPath.getName
        (if (name.startsWith("v")) name.drop(1).toLongOption else None)
          .map(_ -> s.getPath.toString)
      }
      .filter { case (_, d) =>
        !committedOnly || fs.exists(new org.apache.hadoop.fs.Path(d, "_COMMIT"))
      }
      .sortBy(_._1)
  }

  /** Resolve the directory the newest committed index version lives in;
    * a pre-versioning flat layout (vectors/buckets/meta directly under
    * `dir`) resolves to `dir` itself as a legacy fallback.
    */
  def currentIndexDir(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    indexVersions(spark, dir, committedOnly = true).lastOption.map(_._2).getOrElse(dir)

  /** Approximate top-k against a persisted [[buildLshIndex]] index. The
    * query side is hashed in-plan and broadcast, so the bucket-store join
    * dynamic-partition-prunes to the queries' buckets; only those
    * candidates' vectors are fetched and scored. Output contract matches
    * [[annLshTopK]] — running it over the same corpus/parameters returns
    * identical rows.
    */
  def queryLshIndex(spark: org.apache.spark.sql.SparkSession, rootDir: String,
                    queries: DataFrame, k: Int = 10): DataFrame = {
    val dir = currentIndexDir(spark, rootDir)
    val meta = spark.read.parquet(s"$dir/meta").head()
    val (numPlanes, numTables, dim) =
      (meta.getAs[Int]("num_planes"), meta.getAs[Int]("num_tables"), meta.getAs[Int]("dim"))
    val (vectors, buckets) = indexMembers(spark, dir) // base + committed deltas
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
      .withColumn("qnorm", l2norm(col("qv")))
    val qb = tableBuckets(q.withColumnRenamed("query_id", "vec_id"), "qv",
      numPlanes, numTables, dim)
      .withColumnRenamed("vec_id", "query_id")
    val cand = buckets.join(broadcast(qb), Seq("table", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    topKByCosine(cand
      .join(vectors.select(col("vec_id").as("neighbor_id"), col("v"), col("norm")),
        Seq("neighbor_id"))
      .join(q.select(col("query_id"), col("qv"), col("qnorm")), Seq("query_id")), k)
  }

  /** Recall-bounded sub-quadratic near-dup pairs: md5-portable sign-LSH
    * buckets generate candidates (only same-bucket pairs in any of
    * `numTables` tables), then candidates are exactly verified against the
    * cosine threshold. The candidate step makes this approximate — recall
    * per pair is 1 − (1 − p^numPlanes)^numTables with p = 1 − θ/π — but
    * every emitted pair is exact, and the whole path (buckets included) is
    * reproducible in any md5-capable engine, so it carries its own DuckDB
    * oracle. This is the 100 TB near-dup path; [[cosineDupPairsBlocked]] is
    * the exact (quadratic-work) fallback.
    */
  def cosineDupPairsLsh(embeddings: DataFrame, threshold: Double,
                        numPlanes: Int = 8, numTables: Int = 4, dim: Int = 64): DataFrame = {
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0) // zero-norm: no cosine, excluded on both sides
    // pinch-point: bucket hashing feeds both sides of the self-join
    val tabled = tableBuckets(base, "v", numPlanes, numTables, dim)
      .repartition(col("vec_id"))
    // candidate ids only — vectors re-join after the dedup so the
    // dropDuplicates shuffle doesn't carry dim-sized payloads
    val cand = tabled.as("a")
      .join(tabled.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(base.select(col("vec_id").as("vec_a"), col("v").as("av"), col("norm").as("an")), Seq("vec_a"))
      .join(base.select(col("vec_id").as("vec_b"), col("v").as("bv"), col("norm").as("bn")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("av"), col("bv")) / (col("an") * col("bn")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * signed unit derived from an md5-prefix hash (`int(md5("plane#p#j")
    * [0:8],16) % 2`) — reproducible with no RNG state AND portable to any
    * md5-capable engine, so the LSH bucketing itself is oracle-checkable
    * (q42). The components are data-independent, so they're computed ONCE
    * driver-side and embedded as literal arrays — an in-expression hash
    * would recompute planes·dims md5 digests per input row.
    */
  private def planeSign(globalPlane: Int, j: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane#$globalPlane#$j".getBytes("UTF-8"))
    val prefix = digest.take(4).map(b => f"$b%02x").mkString
    if (java.lang.Long.parseLong(prefix, 16) % 2 == 1) 1.0 else -1.0
  }

  private def planeLit(globalPlane: Int, dim: Int): Column =
    typedLit((0 until dim).map(planeSign(globalPlane, _)))

  /** Sign-pattern LSH bucket id for a vector: numPlanes sign bits packed
    * into a long; `planeOffset` salts the plane family (used for
    * independent hash tables). Cosine-similar vectors agree on most sign
    * bits, so they collide. `dim` is the embedding dimensionality (plane
    * literals are materialized at plan time).
    */
  def lshBucket(v: Column, numPlanes: Int, planeOffset: Int = 0, dim: Int = 64): Column =
    (0 until numPlanes).map { p =>
      when(dot(v, planeLit(p + planeOffset, dim)) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Deterministic sampled k-means (Lloyd's) for IVF centroid training: a
    * hash-ordered sample of at most `maxSample` vectors is collected and
    * clustered driver-side, then the centroids are broadcast — the standard
    * corpus-scale recipe (train on a bounded sample, never shuffle the
    * corpus for training). Determinism: the sample is the `maxSample`
    * lowest `xxhash64(vec_id)` rows (TakeOrdered, no RNG), initial centroids
    * are the first k sample points in that hash order, ties in assignment
    * break toward the lower list id. Empty clusters keep their previous
    * centroid. Returns (list_id, unit centroid) rows.
    */
  def trainCentroids(embeddings: DataFrame, k: Int = 16, iters: Int = 5,
                     maxSample: Int = 4096): Seq[(Int, Seq[Double])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sample = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(maxSample)
      .select(col("v")).as[Seq[Double]].collect()
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v.toArray else v.map(_ / n).toArray
      }
    require(sample.length >= k, s"need at least $k sample vectors")
    var cents = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](cents(0).length))
      val counts = new Array[Int](k)
      sample.foreach { p =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < p.length) { d += p(i) * cents(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else {
          val m = sums(c).map(_ / counts(c))
          val n = math.sqrt(m.map(x => x * x).sum)
          if (n == 0) old else m.map(_ / n)
        }
      }
    }
    cents.zipWithIndex.map { case (v, i) => (i + 1, v.toSeq) }.toSeq
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nLists` Voronoi
    * cells around centroid vectors, then search only the `nProbe` cells
    * nearest to each query — the classic sub-linear ANN layout (IVF-Flat).
    *
    * Default centroid selection is deterministic (the `nLists` lowest
    * vec_ids) so the whole query is oracle-reproducible; pass
    * `centroidsOpt = Some(trainCentroids(...))` for honest ANN quality —
    * the search path is identical either way. Cell assignment is one
    * broadcast join + per-id argmin; no shuffle of the corpus beyond the
    * final per-cell candidate join.
    */
  def annIvfTopK(embeddings: DataFrame, queryPred: Column, k: Int = 10,
                 nLists: Int = 16, nProbe: Int = 4,
                 centroidsOpt: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0) // zero-norm: no cosine, excluded on both sides
    // TakeOrderedAndProject (per-partition top-k, no global shuffle) picks
    // the default centroid rows; list ids are then assigned driver-side over
    // the collected nLists rows — a window over an unpartitioned frame, even
    // a tiny one, plans a single-partition WindowExec and spams warnings
    val spark = base.sparkSession
    import spark.implicits._
    val centroidRows: Seq[(Int, Seq[Double], Double)] = centroidsOpt match {
      case Some(cs) => cs.map { case (id, v) => (id, v, math.sqrt(v.map(x => x * x).sum)) }
      case None =>
        base.orderBy(col("vec_id")).limit(nLists)
          .select(col("v"), col("norm")).as[(Seq[Double], Double)].collect()
          .zipWithIndex.map { case ((v, n), i) => (i + 1, v, n) }.toSeq
    }
    val centroids = broadcast(centroidRows.toDF("list_id", "cv", "cnorm"))
    def nearestLists(df: DataFrame, keep: Int, idCol: String): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(col("csim").desc, col("list_id"))
      df.join(broadcast(centroids), lit(true))
        .withColumn("csim", dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
        .withColumn("crank", row_number().over(w))
        .where(col("crank") <= keep)
        .drop("cv", "cnorm", "csim", "crank")
    }
    val assigned = nearestLists(base, 1, "vec_id") // corpus: 1 cell each
    val queries = nearestLists(base.where(queryPred), nProbe, "vec_id")
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qnorm"), col("list_id"))
    val cand = assigned.join(queries, Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("v"), col("qv")) / (col("norm") * col("qnorm")), 6).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Approximate top-k: score only pairs sharing an LSH bucket across
    * `numTables` independent hash tables. Recall grows with tables; cost is
    * per-bucket instead of all-pairs. Output schema matches
    * [[knnCosineBrute]] (rank within retrieved candidates).
    */
  def annLshTopK(embeddings: DataFrame, queryPred: Column, k: Int = 10,
                 numPlanes: Int = 12, numTables: Int = 4, dim: Int = 64): DataFrame = {
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0) // zero-norm: no cosine, excluded on both sides
    // one bucket id per table, with the table index salted into the planes;
    // only (vec_id, table, bucket) flows into the candidate join — vectors
    // re-join AFTER the distinct, so the dedup shuffle moves ids, not
    // dim-sized payloads
    // pinch-point: bucket hashing (numTables × numPlanes dot products per
    // vector) feeds both the corpus and query sides — compute once
    val tabled = tableBuckets(base, "v", numPlanes, numTables, dim)
      .repartition(col("vec_id"))
    val queries = tabled.where(queryPred)
      .select(col("vec_id").as("query_id"), col("table"), col("bucket"))
    val cand = tabled.join(queries, Seq("table", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    topKByCosine(cand
      .join(base.select(col("vec_id").as("neighbor_id"), col("v"), col("norm")), Seq("neighbor_id"))
      .join(base.select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qnorm")),
        Seq("query_id")), k)
  }

  /** Symmetric per-vector int8 quantization — the standard memory lever
    * for ANN serving (4× smaller than float32, dot products in integer
    * SIMD): q_i = round(x_i · 127 / max|x|), reconstructed as q_i · scale
    * with scale = max|x| / 127. Rounding is floor(v + 0.5) — identical
    * IEEE-double arithmetic in any engine, so the output is
    * oracle-reproducible bit-for-bit (a bankers'-rounding `round` would
    * not be). Zero vectors quantize to all zeros with scale 0.
    *
    * Output exploded to scalar rows for the driver's hash compare:
    * (vec_id, scale rounded 6dp, i [1-based], q ∈ [-127, 127]).
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val scale = array_max(transform(col("embedding"), x => abs(x.cast("double")))) / lit(127.0)
    embeddings
      .select(col("vec_id"), scale.as("scale"), posexplode(col("embedding")))
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale"),
        (col("pos") + 1).cast("long").as("i"),
        when(col("scale") > 0,
          floor(col("col").cast("double") / col("scale") + lit(0.5)).cast("long"))
          .otherwise(0L).as("q"))
  }

  /** Int8 reconstruction-error report — the acceptance gate run BEFORE a
    * corpus commits to [[quantizeInt8]]'s 4× memory saving: dequantize
    * q·scale against the original component and report per-vector
    * absolute-error stats. Every step (scale = max|x|/127, q =
    * floor(x/scale + 0.5), recon = q·scale, |x − recon|) is plain IEEE
    * double arithmetic, identical in any engine; per-dim errors are
    * fixed to integer micro-ticks before the per-vector sum, so totals
    * are exact in any fold order. One scan, no shuffle beyond the
    * per-vector agg; zero vectors reconstruct exactly (0 error ticks).
    * Output: vec_id, n_dims, max_err_ticks, sum_err_ticks,
    * mean_err_ticks (HALF_UP integer).
    */
  def reconstructionError(embeddings: DataFrame): DataFrame = {
    val scale = array_max(transform(col("embedding"), x => abs(x.cast("double")))) / lit(127.0)
    embeddings
      .select(col("vec_id"), scale.as("__s"), posexplode(col("embedding")))
      .select(col("vec_id"),
        when(col("__s") > 0,
          floor(abs(col("col").cast("double") -
            floor(col("col").cast("double") / col("__s") + lit(0.5)) * col("__s"))
            * 1000000 + 0.5).cast("long"))
          .otherwise(0L).as("__t"))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"), max(col("__t")).as("max_err_ticks"),
        sum(col("__t")).as("sum_err_ticks"))
      .withColumn("mean_err_ticks",
        expr("CAST((2 * sum_err_ticks + n_dims) DIV (2 * n_dims) AS BIGINT)"))
  }

  /** Matryoshka dim-slice retrieval audit: recall@k of exact cosine
    * search over only the FIRST `dims` components against the full-
    * dimension ground truth — the tuning table for MRL-style truncated
    * embeddings, where serving at d/8 dims is an 8× dot-product and
    * memory win IF recall holds. Both sides are the [[knnCosineBrute]]
    * broadcast scorer (the sliced side just scans `slice(embedding)`),
    * the recall join moves two k-row-per-query relations, and the
    * verdict is floor-bp integer arithmetic.
    * Output: query_id, n_hit, recall_bp.
    */
  def dimSliceRecall(embeddings: DataFrame, queryPred: Column,
                     dims: Int = 8, k: Int = 10): DataFrame = {
    require(dims >= 1, "need at least one retained dimension")
    val full = knnCosineBrute(embeddings, queryPred, k)
      .select(col("query_id"), col("neighbor_id"))
    val low = knnCosineBrute(
      embeddings.withColumn("embedding", slice(col("embedding"), 1, dims)),
      queryPred, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    full.join(low, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("__k"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        expr("CAST((n_hit * 10000) DIV __k AS BIGINT)").as("recall_bp"))
  }

  /** Pairwise-cosine histogram over a deterministic pair sample — the
    * anisotropy check run before trusting any cosine threshold: a
    * healthy embedding space puts random-pair cosines in a band near 0;
    * a collapsed (anisotropic) one piles them toward 1 and every dedup/
    * ANN threshold silently loses meaning. Pairs are (v, v+`offset`) —
    * an id-derived sample, no RNG, and an equi-join on the derived key
    * rather than any crossJoin, so the pair count is ≤ n at every scale.
    * Cosines round to 6dp (the engine-wide grid), then bucket by
    * floor(cos·10) ∈ [−10, 10]; the share window runs over ≤ 21 rows.
    * Zero-norm vectors take the [[semanticDedup]] convention (cos ≡ 0).
    * Output: bucket, n_pairs, share_bp.
    */
  def cosinePairHistogram(embeddings: DataFrame, offset: Long = 250): DataFrame = {
    require(offset != 0, "offset 0 would pair every vector with itself")
    def prep(df: DataFrame): DataFrame =
      df.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("n", l2norm(col("v")))
    val a = prep(embeddings)
      .select(col("vec_id"), col("v").as("va"), col("n").as("na"))
    val b = prep(embeddings)
      .select((col("vec_id") - offset).as("vec_id"),
        col("v").as("vb"), col("n").as("nb"))
    a.join(b, Seq("vec_id"))
      .select(when(col("na") * col("nb") === 0, lit(0.0))
        .otherwise(round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
        .as("__cos"))
      .select(floor(col("__cos") * 10).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
      .withColumn("share_bp", expr(
        "CAST((n_pairs * 10000) DIV sum(n_pairs) OVER () AS BIGINT)"))
  }

  /** Cluster-scoped semantic deduplication (the SemDeDup recipe): assign
    * every embedding to its nearest centroid, then drop any vector with an
    * EARLIER same-cluster vector at cosine ≥ `threshold` — near-duplicate
    * meaning is checked only within a cell, so the all-pairs cross product
    * becomes a per-cluster equi-join with pair volume Σ n_c². `k` is the
    * scale knob: production runs k ~ 10⁴–10⁵ so cells stay small while the
    * corpus grows; the centroid side stays a broadcast either way.
    *
    * Default centroids are deterministic (the k lowest vec_ids, a bounded
    * driver collect like [[annIvfTopK]]'s) so the whole operator is
    * oracle-reproducible; pass `centroidsOpt = Some(trainCentroids(...))`
    * for honest cells — the dedup path is identical. Assignment and the
    * pair gate compare cosines ROUNDED to 6dp (argmax ties broken by
    * cluster id), so float-fold noise below the rounding grid cannot flip
    * a cluster or a verdict between engines.
    *
    * Output: vec_id, cluster (0-based centroid ordinal), keep.
    */
  /** Nearest-centroid assignment shared by [[semanticDedup]] and
    * [[ivfCellReport]]: argmax as a pure column expression over the
    * centroid LITERALS — no window, no shuffle, no nested-loop join;
    * assignment fuses into the scan. Struct ordering compares csim
    * first, then -cluster, so array_max is "highest ROUNDED cosine
    * (6dp — float-fold noise below the grid cannot flip a cell between
    * engines), ties to the lowest cluster". Adds `cluster` and the
    * winning `csim` to `base` (which must carry v/norm).
    */
  private def assignToCells(base: DataFrame,
                            centroidRows: Seq[(Long, Seq[Double], Double)]): DataFrame = {
    // total over degenerate rows: a zero-norm vector (or centroid) has no
    // direction, so its cosine is DEFINED as 0.0 — under ANSI SQL the bare
    // division would throw, and the argmax then ties it to the lowest cell
    val scored = centroidRows.map { case (j, cv, cn) =>
      struct(
        when(col("norm") * lit(cn) > 0,
          round(dot(col("v"), typedLit(cv)) / (col("norm") * lit(cn)), 6))
          .otherwise(lit(0.0)).as("csim"),
        lit(-j).as("nj"))
    }
    val best = array_max(array(scored: _*))
    base.select(col("vec_id"),
      (-best.getField("nj")).as("cluster"),
      best.getField("csim").as("csim"),
      col("v"), col("norm"))
  }

  /** Deterministic-default centroid rows (id, vector, norm) — the k
    * lowest vec_ids, bounded driver collect, oracle-reproducible;
    * `centroidsOpt` plugs in [[trainCentroids]] for honest cells. */
  private def centroidRowsOf(base: DataFrame, k: Int,
                             centroidsOpt: Option[Seq[(Int, Seq[Double])]])
      : Seq[(Long, Seq[Double], Double)] = {
    val spark = base.sparkSession
    import spark.implicits._
    centroidsOpt match {
      case Some(cs) => cs.map { case (id, v) =>
        (id.toLong, v, math.sqrt(v.map(x => x * x).sum)) }
      case None =>
        base.orderBy(col("vec_id")).limit(k)
          .select(col("v"), col("norm")).as[(Seq[Double], Double)].collect()
          .zipWithIndex.map { case ((v, n), j) => (j.toLong, v, n) }.toSeq
    }
  }

  /** IVF cell-quality report — the tuning signal an ANN deployment reads
    * before fixing nLists/nProbe: per Voronoi cell, member count plus
    * mean and max cosine DISTANCE to the centroid (inertia). Imbalance
    * says the centroids need re-training; high inertia says k is too
    * small for the within-cell pair volume that [[semanticDedup]] and
    * probe recall depend on. Assignment is the engine-portable argmax
    * shared with [[semanticDedup]]; per-member distances are fixed to
    * integer MICRO-units (floor(x·1e6 + 0.5), the int8-quantization
    * rounding) BEFORE summation, so the mean is exact in any fold order
    * — the integer-tick discipline every rounded ratio here follows.
    * One scan + one k-row aggregate; centroids broadcast as literals.
    * Output: cluster, n_vectors, mean_dist (6dp), max_dist (6dp).
    */
  def ivfCellReport(embeddings: DataFrame, k: Int = 8,
                    centroidsOpt: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0) // zero-norm: no cosine, excluded on both sides
    val centroidRows = centroidRowsOf(base, k, centroidsOpt)
    require(centroidRows.nonEmpty, "no centroids: empty input")
    assignToCells(base, centroidRows)
      .select(col("cluster"),
        floor((lit(1.0) - col("csim")) * 1e6 + 0.5).cast("long").as("__d"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("__d")).as("__sd"), max(col("__d")).as("__md"))
      .select(col("cluster"), col("n_vectors"),
        (expr("(2 * __sd + n_vectors) div (2 * n_vectors)") / lit(1e6))
          .as("mean_dist"),
        (col("__md").cast("double") / lit(1e6)).as("max_dist"))
  }

  /** Label-centroid similarity matrix — per-label mean embeddings and
    * the pairwise cosine between them: the class-separability card an
    * embedding table ships with (two labels whose centroids sit at
    * cosine ≈ 1 are indistinguishable to any downstream classifier —
    * re-label or re-embed before training on them).
    *
    * Determinism: components are fixed to integer micro-ticks BEFORE
    * the centroid sums (exact in any fold order, the [[ivfCellReport]]
    * discipline), so each centroid component is one exact integer sum
    * and one division; the pairwise dot/norm sums then run over the
    * bounded dim axis (≤ dims rows per label pair) and round to 6dp —
    * the q36 norm convention. Scale shape: one (label, i) hash agg over
    * the component explode, then joins on the TINY (labels × dims)
    * centroid relation only.
    * Output: label_a < label_b, cosine (6dp).
    */
  def labelCentroidMatrix(embeddings: DataFrame): DataFrame = {
    val cent = embeddings
      .select(col("label").cast("long").as("label"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))).as(Seq("i", "t")))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("t")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("i"),
        (col("s").cast("double") / col("n") / lit(1e6)).as("m"))
    cent.as("a")
      .join(cent.as("b"),
        col("a.i") === col("b.i") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.m") * col("b.m")).as("__dp"),
        sum(col("a.m") * col("a.m")).as("__na2"),
        sum(col("b.m") * col("b.m")).as("__nb2"))
      .select(col("label_a"), col("label_b"),
        round(col("__dp") / (sqrt(col("__na2")) * sqrt(col("__nb2"))), 6)
          .as("cosine"))
  }

  /** Per-label embedding drift between two halves of the table — the
    * train/serve-skew or epoch-drift check: split each label's vectors
    * by `groupExpr` (true → group A), compare the two half-centroids by
    * cosine. Centroid cosine equals SUM-vector cosine (scale
    * invariance), so no mean is ever materialized: per (label, half,
    * dim) integer micro-tick sums (exact in any fold order, the
    * [[labelCentroidMatrix]] discipline), one equi-join on (label, dim)
    * over the bounded (labels × dims) relation, decimal(38,0) products,
    * one final rounded double. A degenerate half (zero sum vector)
    * yields the defined cosine 0.0 rather than an error. Drift ≈ 1 is
    * healthy; a label whose halves diverge is the one whose upstream
    * changed. Output: label, n_a, n_b, drift_cosine.
    */
  def embeddingDrift(embeddings: DataFrame, groupExpr: Column): DataFrame = {
    val base = embeddings
      .select(col("label").cast("long").as("label"),
        when(groupExpr, 0L).otherwise(1L).as("__g"), col("embedding"))
    val sums = base
      .select(col("label"), col("__g"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))).as(Seq("i", "t")))
      .groupBy(col("label"), col("__g"), col("i"))
      .agg(sum(col("t")).as("s"))
    val counts = base.groupBy(col("label"))
      .agg(sum(when(col("__g") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__g") === 1L, 1L).otherwise(0L)).as("n_b"))
    val paired = sums.where(col("__g") === 0L).as("a")
      .join(sums.where(col("__g") === 1L).as("b"),
        col("a.label") === col("b.label") && col("a.i") === col("b.i"))
      .groupBy(col("a.label").as("label"))
      .agg(sum(col("a.s").cast("decimal(38,0)") * col("b.s")).as("__dp"),
        sum(col("a.s").cast("decimal(38,0)") * col("a.s")).as("__na2"),
        sum(col("b.s").cast("decimal(38,0)") * col("b.s")).as("__nb2"))
    // LEFT join: a label whose split puts every vector in ONE half has
    // no paired row — the docstring's defined cosine 0.0, not a dropped
    // label (the oracle mirrors with LEFT JOIN + the same CASE)
    counts.join(paired, Seq("label"), "left")
      .select(col("label"), col("n_a"), col("n_b"),
        coalesce(
          when(col("__na2") === 0 || col("__nb2") === 0, lit(0.0))
            .otherwise(round(col("__dp").cast("double") /
              (sqrt(col("__na2").cast("double")) *
                sqrt(col("__nb2").cast("double"))), 6)),
          lit(0.0)).as("drift_cosine"))
      .orderBy(col("label").asc_nulls_last)
  }

  /** Embedding-table health audit — the pre-flight check before any
    * similarity/dedup stage trusts the vectors: per (dimension,
    * 0.25-wide norm bucket), vector count, zero-norm count (degenerate
    * rows that poison cosine — division by zero — and centroid
    * training), and the exact norm range. A mixed-dim cell or a fat
    * zero bucket is the "embedding job half-failed" signature caught
    * here instead of as NaNs downstream.
    *
    * One scan + one bounded aggregate (dims × norm buckets). Norm
    * extrema follow the integer micro-tick discipline ([[ivfCellReport]]):
    * fixed to ticks BEFORE min/max so results are exact in any fold
    * order and engine-portable.
    * Output: dim, norm_bucket (= floor(norm·4)), n_vecs, n_zero,
    * min_norm, max_norm (micro-tick exact).
    */
  def embeddingAudit(embeddings: DataFrame): DataFrame =
    embeddings
      .select(size(col("embedding")).cast("long").as("dim"),
        l2norm(asDouble(col("embedding"))).as("norm"))
      .select(col("dim"),
        floor(col("norm") * 4).cast("long").as("norm_bucket"),
        floor(col("norm") * 1e6 + 0.5).cast("long").as("__nt"))
      .groupBy(col("dim"), col("norm_bucket"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("__nt") === 0, 1L).otherwise(0L)).as("n_zero"),
        min(col("__nt")).as("__mn"), max(col("__nt")).as("__mx"))
      .select(col("dim"), col("norm_bucket"), col("n_vecs"), col("n_zero"),
        (col("__mn").cast("double") / lit(1e6)).as("min_norm"),
        (col("__mx").cast("double") / lit(1e6)).as("max_norm"))

  /** Per-dimension moment audit — [[embeddingAudit]]'s companion on the
    * COMPONENT axis: mean and variance per dimension, the numbers a
    * pipeline reads before whitening/mean-centering an embedding table
    * (a dimension with runaway variance dominates every cosine; a
    * constant dimension is dead weight in the index). Components are
    * fixed to integer micro-ticks BEFORE the sums and the square-sum
    * accumulates in DECIMAL(38,0) — exact in any fold order and immune
    * to long overflow at any corpus size (t² ~ 10¹² per row leaves
    * headroom of ~10²⁶ rows). One scan, one (dims)-row aggregate.
    * Output: i (1-based dim), n_vecs, mean, variance (population,
    * exact-integer arithmetic until two final IEEE divisions).
    */
  def embeddingMoments(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(transform(col("embedding"),
        x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))).as(Seq("i0", "t")))
      .groupBy((col("i0") + 1).cast("long").as("i"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("t")).as("__s"),
        sum((col("t") * col("t")).cast("decimal(38,0)")).as("__q"))
      .select(col("i"), col("n_vecs"),
        (col("__s").cast("double") / col("n_vecs") / lit(1e6)).as("mean"),
        ((col("__q").cast("double") / col("n_vecs") -
          (col("__s").cast("double") / col("n_vecs")) *
            (col("__s").cast("double") / col("n_vecs"))) / lit(1e12))
          .as("variance"))

  /** Distributed power iteration for the corpus's top principal
    * direction — the PCA scale path: each round is ONE corpus scan
    * (score p = x·v against the broadcast current direction, accumulate
    * per-dimension Σ x_i·p in integer micro-ticks) plus a (dims)-row
    * aggregate, exactly the [[kmeansRefineStep]] shape with a vector in
    * place of a codebook. The start direction is deterministic
    * (uniform 1/√d), scores round to 6dp before the tick products, and
    * the per-round normalization happens driver-side on the bounded
    * dims vector — so every round is engine-portable and the whole
    * computation is oracle-replayable. Uncentered (Gram-matrix)
    * iteration: run [[embeddingMoments]] first and center if means are
    * material.
    * Output: i (1-based dim), component (6dp of the normalized
    * direction after `iters` rounds), growth (6dp ‖y‖/‖v‖ of the last
    * round — the Rayleigh-quotient-style dominance signal).
    */
  def powerIterationTop(embeddings: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, "need at least one round")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = embeddings.select(asDouble(col("embedding")).as("v"))
    val d = base.select(size(col("v"))).as[Int].first()
    var dir = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var growth = 0.0
    for (_ <- 0 until iters) {
      val p = round(dot(col("v"), typedLit(dir.toSeq)), 6)
      val ticks = base
        .select(posexplode(transform(col("v"),
          x => floor(x * p * 1e6 + 0.5).cast("long"))).as(Seq("i0", "t")))
        .groupBy(col("i0")).agg(sum(col("t")).as("s"))
        .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
      // ‖y‖ from the EXACT integer square-sum (BigInt — no fold-order or
      // accumulation noise), so the normalized direction is bit-identical
      // in any engine that reproduces the integer ticks
      val n = math.sqrt(
        ticks.map(s => BigInt(s) * BigInt(s)).sum.toDouble / 1e12)
      require(n > 0, "degenerate direction: zero matvec")
      growth = n
      dir = ticks.map(s => (s.toDouble / 1e6) / n)
    }
    dir.zipWithIndex.map { case (c, i) =>
      ((i + 1).toLong, math.floor(c * 1e6 + 0.5) / 1e6,
        math.floor(growth * 1e6 + 0.5) / 1e6)
    }.toSeq.toDF("i", "component", "growth")
  }

  def semanticDedup(embeddings: DataFrame, k: Int = 8, threshold: Double = 0.85,
                    centroidsOpt: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0) // zero-norm: no cosine, excluded on both sides
    val centroidRows = centroidRowsOf(base, k, centroidsOpt)
    require(centroidRows.nonEmpty, "no centroids: empty input")
    val assigned = assignToCells(base, centroidRows)
      .select(col("vec_id"), col("cluster"), col("v"), col("norm"))
    val lhs = assigned.select(col("cluster"), col("vec_id").as("vec_a"),
      col("v").as("va"), col("norm").as("na"))
    val rhs = assigned.select(col("cluster"), col("vec_id").as("vec_b"),
      col("v").as("vb"), col("norm").as("nb"))
    val dups = lhs.join(rhs, Seq("cluster"))
      .where(col("vec_a") < col("vec_b") &&
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6) >= threshold)
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("dup", lit(true))
    assigned.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dup").isNull.as("keep"))
  }

  /** ANN recall calibration — the tuning report a deployment reads before
    * trusting [[annIvfTopK]]'s (nLists, nProbe): per query, the exact
    * brute-force top-k ([[knnCosineBrute]], ground truth) is compared to
    * the IVF-retrieved set, and recall@k = |exact ∩ ivf| / |exact| is
    * reported in HALF_UP basis points of pure integer arithmetic. The
    * companion to [[ivfCellReport]] (cell geometry) and the LSH sketch
    * calibration (estimation error): exact verification is affordable
    * exactly where the approximation made a claim — the bounded query
    * sample — while the corpus pays only the probed-cell candidate join.
    * Raising nProbe until mean recall_bp clears the deployment's floor is
    * the whole tuning loop, and both sides of the comparison here scale:
    * ground truth is |queries| broadcast rows against one corpus scan,
    * IVF is the production probe itself.
    *
    * Output: query_id, n_exact (= min(k, admissible)), n_hit, recall_bp.
    */
  def annRecallReport(embeddings: DataFrame, queryPred: Column, k: Int = 10,
                      nLists: Int = 16, nProbe: Int = 4,
                      centroidsOpt: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val exact = knnCosineBrute(embeddings, queryPred, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = annIvfTopK(embeddings, queryPred, k, nLists, nProbe, centroidsOpt)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        expr("(n_hit * 20000 + n_exact) div (2 * n_exact)").as("recall_bp"))
  }

  /** One distributed Lloyd refinement step — the full-corpus companion to
    * [[trainCentroids]]' bounded-sample recipe: every vector is assigned
    * to its nearest current centroid (the engine-portable rounded-argmax
    * of [[assignToCells]] — k centroid literals fused into the scan, no
    * window, no shuffle of the corpus beyond one (k · dim)-row aggregate),
    * and each cell's refined centroid is the per-dimension mean of its
    * members' UNIT-normalized components. Components are fixed to integer
    * micro-ticks BEFORE the sums ([[labelCentroidMatrix]]'s discipline) so
    * every mean is exact in any fold order and engine-portable; zero-norm
    * vectors contribute zero ticks (they carry no direction). This is the
    * honest k-means scale path at 100 TB: the bounded sample picks the
    * codebook, then one (or a few) full-data passes of exactly this shape
    * harden it — each pass one scan plus a bounded aggregate, the
    * centroids broadcast both ways.
    *
    * Output: cluster (0-based), i (1-based dim), n_members, c_new
    * (tick-mean / 1e6 — an exact-integer ratio, IEEE-deterministic).
    */
  def kmeansRefineStep(embeddings: DataFrame, k: Int = 8,
                       centroidsOpt: Option[Seq[(Int, Seq[Double])]] = None): DataFrame = {
    val base = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0) // zero-norm: no cosine, excluded on both sides
    val centroidRows = centroidRowsOf(base, k, centroidsOpt)
    require(centroidRows.nonEmpty, "no centroids: empty input")
    assignToCells(base, centroidRows)
      .select(col("cluster"),
        posexplode(transform(col("v"),
          x => when(col("norm") > 0,
            floor(round(x / col("norm"), 6) * 1e6 + 0.5).cast("long"))
            .otherwise(0L))).as(Seq("i0", "t")))
      .groupBy(col("cluster"), (col("i0") + 1).cast("long").as("i"))
      .agg(count(lit(1)).as("n_members"), sum(col("t")).as("__s"))
      .select(col("cluster"), col("i"), col("n_members"),
        (col("__s").cast("double") / col("n_members") / lit(1e6)).as("c_new"))
  }

  /** Nearest-centroid classifier accuracy — the label-separability eval
    * (a corpus whose label centroids can't even classify their OWN
    * members has no business driving label-conditioned sampling).
    * Centroids are the [[labelCentroidMatrix]] exact micro-tick means
    * (a bounded labels × dims dim, broadcast); every vector scores
    * against every centroid through one i-keyed join + hash agg (the
    * brute-kNN shape against a BOUNDED candidate set), cosines round to
    * 6dp BEFORE the argmax so the (cos desc, label asc) rank is total
    * and engine-portable; zero norms define cosine 0.0 (the
    * [[kmeansRefineStep]] convention).
    * Output: label, n_vecs, n_correct, acc_bp (floor).
    */
  def nearestCentroidAccuracy(embeddings: DataFrame): DataFrame = {
    val cent = embeddings
      .select(col("label").cast("long").as("clabel"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))).as(Seq("i", "t")))
      .groupBy(col("clabel"), col("i"))
      .agg(sum(col("t")).as("__s"), count(lit(1)).as("__n"))
      .select(col("clabel"), col("i"),
        (col("__s").cast("double") / col("__n") / lit(1e6)).as("m"))
    val cnorm = cent.groupBy(col("clabel"))
      .agg(sqrt(sum(col("m") * col("m"))).as("__nc"))
    val vcomp = embeddings
      .select(col("vec_id"), col("label").cast("long").as("true_label"),
        posexplode(transform(col("embedding"), _.cast("double")))
          .as(Seq("i", "x")))
    val vnorm = vcomp.groupBy(col("vec_id"))
      .agg(sqrt(sum(col("x") * col("x"))).as("__nv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("clabel").asc)
    vcomp.join(broadcast(cent), Seq("i"))
      .groupBy(col("vec_id"), col("true_label"), col("clabel"))
      .agg(sum(col("x") * col("m")).as("__dp"))
      .join(vnorm, Seq("vec_id"))
      .join(broadcast(cnorm), Seq("clabel"))
      .select(col("vec_id"), col("true_label"), col("clabel"),
        when(col("__nv") * col("__nc") === 0, lit(0.0))
          .otherwise(round(col("__dp") / (col("__nv") * col("__nc")), 6))
          .as("cos"))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .groupBy(col("true_label").as("label"))
      // null-safe correctness term: a null true_label can never be
      // "correct" (0, not NULL — the SQL CASE ... ELSE 0 semantics)
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("clabel") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n_vecs"), col("n_correct"),
        expr("(n_correct * 10000) DIV n_vecs").as("acc_bp"))
  }

  /** Label-noise candidates by centroid margin: per labeled vector,
    * cosine to its OWN label centroid minus the best cosine to any
    * OTHER label's centroid — a negative margin means another class
    * explains the vector better than its own, the standard cheap
    * mislabel detector run before trusting label-conditioned sampling.
    * Exactly [[nearestCentroidAccuracy]]'s machinery (micro-tick
    * centroid means broadcast, one i-keyed join + hash agg per vector,
    * 6dp cosines, zero norms define cosine 0.0); margins are exact
    * integer micro differences of the 6dp cosines, worst-k by
    * (margin asc, vec_id) — TakeOrdered, no global sort.
    * Output: rank, vec_id, label, rival_label, margin_micro.
    */
  def labelMarginWorst(embeddings: DataFrame, k: Int = 20): DataFrame = {
    val labeled = embeddings.where(col("label").isNotNull)
    val cent = labeled
      .select(col("label").cast("long").as("clabel"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))).as(Seq("i", "t")))
      .groupBy(col("clabel"), col("i"))
      .agg(sum(col("t")).as("__s"), count(lit(1)).as("__n"))
      .select(col("clabel"), col("i"),
        (col("__s").cast("double") / col("__n") / lit(1e6)).as("m"))
    val cnorm = cent.groupBy(col("clabel"))
      .agg(sqrt(sum(col("m") * col("m"))).as("__nc"))
    val vcomp = labeled
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(transform(col("embedding"), _.cast("double")))
          .as(Seq("i", "x")))
    val vnorm = vcomp.groupBy(col("vec_id"))
      .agg(sqrt(sum(col("x") * col("x"))).as("__nv"))
    val scored = vcomp.join(broadcast(cent), Seq("i"))
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(sum(col("x") * col("m")).as("__dp"))
      .join(vnorm, Seq("vec_id"))
      .join(broadcast(cnorm), Seq("clabel"))
      .select(col("vec_id"), col("label"), col("clabel"),
        when(col("__nv") * col("__nc") === 0, lit(0.0))
          .otherwise(round(col("__dp") / (col("__nv") * col("__nc")), 6))
          .as("cos"))
    val own = scored.where(col("clabel") === col("label"))
      .select(col("vec_id"), col("cos").as("__own"))
    val wBest = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("clabel").asc)
    val rival = scored.where(col("clabel") =!= col("label"))
      .withColumn("__rn", row_number().over(wBest)).where(col("__rn") === 1)
      .select(col("vec_id"), col("label"), col("clabel").as("rival_label"),
        col("cos").as("__riv"))
    val ord = Seq(col("margin_micro").asc, col("vec_id").asc)
    val margins = rival.join(own, Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("rival_label"),
        (round(col("__own") * 1e6) - round(col("__riv") * 1e6)).cast("long")
          .as("margin_micro"))
    margins.orderBy(ord: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select(col("rank"), col("vec_id"), col("label"), col("rival_label"),
        col("margin_micro"))
  }

  /** Cluster-label purity: per IVF/Voronoi cell, the majority label's
    * HALF_UP bp share — the unsupervised-vs-labels agreement card (pure
    * cells mean the embedding geometry respects the labels; a 50%-pure
    * cell poisons any cell-level curation decision). Assignment is the
    * engine-portable [[assignToCells]] argmax over the deterministic
    * codebook; the purity fold runs on the bounded (cell × label) grid.
    * Zero-norm and unlabeled vectors are excluded on both sides.
    * Output: cluster, n_vectors, majority_label, purity_bp.
    */
  def clusterLabelPurity(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val base = embeddings.where(col("label").isNotNull)
      .select(col("vec_id"), col("label").cast("long").as("__lbl"),
        asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0)
    val centroidRows = centroidRowsOf(base, k, None)
    require(centroidRows.nonEmpty, "no centroids: empty labeled input")
    val grid = assignToCells(base, centroidRows)
      .join(base.select(col("vec_id"), col("__lbl")), Seq("vec_id"))
      .groupBy(col("cluster"), col("__lbl"))
      .agg(count(lit(1)).as("__c"))
    grid.groupBy(col("cluster"))
      .agg(sum(col("__c")).as("n_vectors"),
        max(struct(col("__c"), (-col("__lbl")).as("__nl"))).as("__m"))
      .select(col("cluster"), col("n_vectors"),
        (-col("__m.__nl")).as("majority_label"),
        expr("(20000 * __m.__c + n_vectors) div (2 * n_vectors)").as("purity_bp"))
      .orderBy(col("cluster"))
  }

  /** IVF probe-count tuning curve: micro-averaged recall@k against the
    * exact brute top-k, one row per nProbe design point — the table an
    * ANN deployment reads to buy recall with probes instead of lists.
    * Each point rides [[annRecallReport]] (same deterministic codebook,
    * same query sample); the micro-average is exact integer arithmetic
    * over the summed hit/exact counts.
    * Output: n_probe, n_queries, n_exact, n_hit, recall_bp.
    */
  def ivfProbeCurve(embeddings: DataFrame, queryPred: Column, k: Int = 10,
                    nLists: Int = 16, probes: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    require(probes.nonEmpty, "need at least one probe count")
    // shared work hoisted out of the probe loop (r12): the brute-force
    // ground truth is probe-INDEPENDENT — pin its (queries × k)-row
    // result once instead of re-running the query×corpus scoring join
    // per probe point — and the default-centroid driver collect resolves
    // once instead of once per annIvfTopK call. Same selection rule as
    // annIvfTopK's default path (lowest vec_ids, unit of the same
    // index-order sums), so results are identical.
    val exact = Pins.pin(
      knnCosineBrute(embeddings, queryPred, k)
        .select(col("query_id"), col("neighbor_id")))
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents: Seq[(Int, Seq[Double])] = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2norm(col("v")))
      .where(col("norm") > 0)
      .orderBy(col("vec_id")).limit(nLists)
      .select(col("v")).as[Seq[Double]].collect()
      .zipWithIndex.map { case (v, i) => (i + 1, v) }.toSeq
    probes.map { p =>
      val approx = annIvfTopK(embeddings, queryPred, k, nLists, p, Some(cents))
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"),
          coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("n_exact")).as("n_exact"), sum(col("n_hit")).as("n_hit"))
        .select(lit(p.toLong).as("n_probe"), col("n_queries"),
          col("n_exact"), col("n_hit"),
          expr("(n_hit * 20000 + n_exact) div (2 * n_exact)").as("recall_bp"))
    }.reduce(_ unionByName _).orderBy(col("n_probe"))
  }
}
