package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: Z-order (Morton) interleave keys for
  * multi-dimension data clustering. At 100 TB the layout IS the query
  * plan: files sorted by z(a, b) give file-level min/max zones that
  * prune range predicates on EITHER dimension (the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` recipe), where a single-column sort prunes only
  * its own. The key is a pure unrolled bit-interleave — a plan-time
  * constant number of codegen'd integer ops, no UDF, no shuffle.
  */
object Layout {

  /** Morton key: bit i of `a` lands at bit 2i, bit i of `b` at 2i+1.
    * Inputs are masked to `bits` (callers bucket first), so a stray
    * outlier saturates its dimension instead of scrambling high bits.
    */
  def zOrderKey(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Layout audit over the (length-bucket, token-bucket) grid: z-key
    * every doc, then report per z-range (`z DIV rangeSize`) extents.
    * Each range must cover a small RECTANGLE of the bucket grid — the
    * locality z-order buys — which the min/max extent columns make
    * visible (and an oracle replays bit-for-bit: the key is integer
    * arithmetic, not an opaque hash).
    * Output: z_range, n_docs, min_len_b, max_len_b, min_tok_b,
    * max_tok_b.
    */
  def zOrderLayoutReport(docs: DataFrame, bits: Int = 4,
                         rangeSize: Int = 16): DataFrame = {
    require(rangeSize >= 1, "rangeSize must be positive")
    val cap = lit((1L << bits) - 1)
    val lenB = least(floor(length(col("text")) / 64).cast("long"), cap)
    val tokB = least(floor(size(TextAnalysis.tokens(col("text"))) / 16)
      .cast("long"), cap)
    docs
      .select(lenB.as("len_b"), tokB.as("tok_b"))
      .withColumn("z", zOrderKey(col("len_b"), col("tok_b"), bits))
      .withColumn("z_range", expr(s"z DIV $rangeSize"))
      .groupBy(col("z_range"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("len_b")).as("min_len_b"), max(col("len_b")).as("max_len_b"),
        min(col("tok_b")).as("min_tok_b"), max(col("tok_b")).as("max_tok_b"))
  }

  /** Sort-key advisor: how well would each candidate sort key cluster
    * `probeCol` into file zones? Rows bucket into `k` size-balanced
    * zones by the candidate's counting quantiles (the
    * [[Stats.quantileBuckets]] machinery — no global sort), each zone
    * records its probe min/max, and the score is the mean normalized
    * zone span in floor bp — exactly the fraction of files a random
    * probe-range predicate would FAIL to skip under that layout. Lower
    * is better; a key uncorrelated with the probe scores ≈ 10000 (every
    * zone spans everything). This is the measured version of the
    * "ORDER BY which column?" table-layout decision.
    * Output: one row per candidate — sort_key, n_zones, avg_span_bp.
    */
  def sortKeyAdvisor(df: DataFrame, candidates: Seq[(String, String)],
                     probeCol: String, k: Int = 16): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate key")
    val scored = candidates.map { case (name, keyCol) =>
      val zones = Stats.quantileBuckets(
        df.select(col(keyCol).cast("long").as("__key"),
          col(probeCol).cast("long").as("__p")),
        "__key", k)
        .groupBy(col("bucket"))
        .agg(min(col("__p")).as("__lo"), max(col("__p")).as("__hi"))
      zones
        .agg(count(lit(1)).as("n_zones"),
          sum(col("__hi") - col("__lo")).as("__spans"),
          max(col("__hi")).as("__gmax"), min(col("__lo")).as("__gmin"))
        .select(lit(name).as("sort_key"), col("n_zones"),
          when(col("__gmax") === col("__gmin"), lit(0L))
            .otherwise(expr("(__spans * 10000) DIV (n_zones * (__gmax - __gmin))"))
            .as("avg_span_bp"))
    }
    scored.reduce(_.unionByName(_))
  }
}
