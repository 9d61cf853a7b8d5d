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
      // a row with a null key or null probe has no zone: excluded on
      // both engine and oracle sides (null-ordering inside the cut
      // window would otherwise diverge between engines)
      val zones = Stats.quantileBuckets(
        df.select(col(keyCol).cast("long").as("__key"),
          col(probeCol).cast("long").as("__p"))
          .where(col("__key").isNotNull && col("__p").isNotNull),
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

  /** Partition-skew advisor: for each candidate shuffle/bucket key, how
    * evenly would the table's rows spread over `buckets` hash
    * partitions? The answer that decides a bucketing/partitioning DDL
    * before anyone pays the 100 TB shuffle — a key whose hottest bucket
    * carries 40× the ideal share is disqualified no matter how natural
    * it reads. Hashing is salted-free md5-low-32 mod `buckets`
    * (engine-portable, like [[graft.operators.Bloom]]'s slots), nulls
    * fixed to a sentinel BEFORE concat so (null, "a") ≠ ("a", null) and
    * multi-column keys separate on the \\u0001 sentinel separator.
    *
    * One scan: each row explodes to (candidate, bucket) — candidate
    * count is a plan-time constant — then two bounded hash aggs; the
    * shuffle carries at most candidates × `buckets` rows per upstream
    * partition (map-side partials). skew_x_bp = hottest bucket / ideal
    * share in HALF_UP bp (10000 = perfectly even).
    * Output: key_name, n_rows, n_buckets_hit, max_bucket_rows, skew_x_bp.
    */
  def partitionSkew(df: DataFrame, candidates: Seq[(String, Seq[String])],
                    buckets: Int = 64): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate key")
    require(buckets >= 1, "buckets must be positive")
    def bucketOf(cols: Seq[String]): Column = pmod(
      graft.functions.md5_prefix_long(concat_ws("\u0001",
        cols.map(c => coalesce(col(c).cast("string"), lit("∅"))): _*), 8),
      lit(buckets.toLong))
    val tagged = df.select(explode(array(candidates.map { case (name, cols) =>
      struct(lit(name).as("key_name"), bucketOf(cols).as("bucket"))
    }: _*)).as("kb"))
    tagged
      .groupBy(col("kb.key_name").as("key_name"), col("kb.bucket").as("bucket"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("key_name"))
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_buckets_hit"),
        max(col("__n")).as("max_bucket_rows"))
      .select(col("key_name"), col("n_rows"), col("n_buckets_hit"),
        col("max_bucket_rows"),
        floor(col("max_bucket_rows") * buckets.toLong * 10000.0 /
          col("n_rows") + 0.5).cast("long").as("skew_x_bp"))
      .orderBy(col("key_name"))
  }
}
