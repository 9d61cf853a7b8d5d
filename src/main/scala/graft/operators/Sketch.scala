package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-min sketch: the fixed-size heavy-hitter summary for streams and
  * shuffles too wide to hash-aggregate exactly.
  *
  * A d×w counter grid where every key increments one salted-hash slot
  * per row; a point estimate reads the MINIMUM of its d slots, so
  * estimates only ever OVER-count (collisions add, never subtract).
  * Like [[Bloom]], the hashes are salted-md5 arithmetic — deterministic
  * and engine-replayable — and the sketch materializes as a bounded
  * (row, slot, count) relation rather than an opaque binary (Spark's
  * own `count_min_sketch` agg exists but its sketch bytes are not
  * portable to an oracle).
  *
  * Counts are additive, so the sketch builds from the exact per-key
  * aggregate when one is affordable (as here, for the audit) or from
  * raw occurrences map-side at stream scale — same result either way.
  */
object Sketch {

  /** slot_r(key) = md5("r:key") low-32 mod w — one salt per hash row. */
  def slotExpr(row: Int, key: Column, w: Int): Column =
    pmod(graft.functions.md5_prefix_long(concat(lit(s"$row:"), key), 8),
      lit(w.toLong))

  /** Heavy-hitter audit of the (d, w) design point: the exact top-`k`
    * tokens with their CMS point estimates and the relative
    * over-estimate in floor-bp — the table that says whether w is wide
    * enough before a pipeline trusts the sketch at stream scale. The
    * sketch is a d×w bounded relation (broadcast to the probe join);
    * the probe side is k rows.
    * Output: rank, tok, n_exact, n_est (≥ n_exact always), over_bp.
    */
  def cmsHeavyHitterAudit(docs: DataFrame, d: Int = 4, w: Int = 1024,
                          k: Int = 20): DataFrame = {
    require(d >= 1 && w >= 1, "need d >= 1 hash rows and w >= 1 slots")
    // explicit no-op filter: branch subtrees must stay identical for the
    // exact-aggregate exchange to be reused across the sketch and top-k
    // branches (the r12 plan-audit lesson, see sharedShinglePairStats)
    val exact = docs
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
      .where(col("tok").isNotNull)
      .groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    // d rows per token via ONE explode over a struct array — a union of
    // d selects of `exact` plants d copies of the whole tokenize+agg
    // subtree in the plan (the r12 audit counted 5 surviving text scans
    // here); the explode keeps one copy and emits the same rows
    val cms = exact.select(explode(array((0 until d).map { r =>
        struct(lit(r).as("__row"), slotExpr(r, col("tok"), w).as("__slot"),
          col("n_exact").as("__c"))
      }: _*)).as("__e"))
      .select(col("__e.__row").as("__row"), col("__e.__slot").as("__slot"),
        col("__e.__c").as("__c"))
      .groupBy(col("__row"), col("__slot")).agg(sum(col("__c")).as("__sc"))
    val ord = Seq(col("n_exact").desc, col("tok").asc)
    val top = exact.orderBy(ord: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
    val probes = top.select(col("rank"), col("tok"), col("n_exact"),
      explode(array((0 until d).map { r =>
        struct(lit(r).as("__row"), slotExpr(r, col("tok"), w).as("__slot"))
      }: _*)).as("__p"))
      .select(col("rank"), col("tok"), col("n_exact"),
        col("__p.__row").as("__row"), col("__p.__slot").as("__slot"))
    probes.join(broadcast(cms), Seq("__row", "__slot"))
      .groupBy(col("rank"), col("tok"), col("n_exact"))
      .agg(min(col("__sc")).as("n_est"))
      .withColumn("over_bp",
        expr("CAST(((n_est - n_exact) * 10000) DIV n_exact AS BIGINT)"))
      .select(col("rank"), col("tok"), col("n_exact"), col("n_est"),
        col("over_bp"))
  }

  /** HyperLogLog registers: 64 slots, rank capped at 20 bits. */
  val HllM = 64
  val HllRankCap = 20

  /** rank = index of the lowest set bit of `w` (1-based), capped — the
    * geometric observable HLL keys on, as a pure modulo cascade
    * (w mod 2^r == 2^(r-1) ⟺ rank r) so no engine-specific bit ops.
    * The generated text is plain ANSI CASE/%, valid in both Spark SQL
    * and the DuckDB oracle — one generator, two engines.
    */
  def hllRankSql(w: String): String = {
    val cases = (1 until HllRankCap).map { r =>
      s"WHEN ($w) % ${1L << r} = ${1L << (r - 1)} THEN $r"
    }.mkString(" ")
    s"CASE $cases ELSE $HllRankCap END"
  }

  def hllRankExpr(w: String): Column = expr(hllRankSql(w))

  /** Distinct-count audit of the 64-register HLL design point, per key:
    * the exact COUNT(DISTINCT id) next to the sketch's raw estimate, so
    * a pipeline knows the error band before trusting the sketch where
    * an exact distinct is unaffordable (per-window uniques at stream
    * scale, cross-epoch union cardinality).
    *
    * Engine-portable by construction: the hash is md5 (15 hex digits →
    * a 60-bit integer), register = h mod 64, rank = lowest-set-bit of
    * h div 64 via [[hllRankExpr]], and the harmonic denominator is the
    * EXACT integer Σ 2^(cap − rank) (every term a bigint power of two —
    * no float fold anywhere), so the α·m²/Z estimate is one integer
    * division: (709·m²·2^cap) DIV (1000·Z). Registers are a bounded
    * m-row state per key — mergeable across epochs/partitions with
    * max(), which is what makes HLL the scale answer; the relation here
    * IS that state, not an opaque binary. The raw estimator is reported
    * as-is (production HLL switches to linear counting below 2.5m using
    * ln(), whose last ulp is engine-specific — the zero-register count
    * `v_zero` that correction keys on is in the output instead).
    * Output: key, n_exact, v_zero, z_scaled, n_est, err_abs_bp.
    */
  def hllDistinctAudit(df: DataFrame, keyCol: String,
                       idCol: String): DataFrame = {
    val m = HllM
    val cap = HllRankCap
    val base = df
      .select(col(keyCol).as("key"), col(idCol).cast("string").as("__id"))
      .where(col("key").isNotNull && col("__id").isNotNull)
    val hashed = base
      .withColumn("__h",
        graft.functions.md5_prefix_long(col("__id"), 15))
      .withColumn("__reg", pmod(col("__h"), lit(m.toLong)))
      .withColumn("__rank", hllRankExpr(s"__h div $m"))
    val regs = hashed.groupBy(col("key"), col("__reg"))
      .agg(max(col("__rank")).as("__mr"))
    val sketch = regs.groupBy(col("key"))
      .agg(count(lit(1)).as("__present"),
        sum(expr(s"CAST(${1L << cap} div shiftleft(CAST(1 AS BIGINT), __mr) AS BIGINT)"))
          .as("__zp"))
      .withColumn("v_zero", lit(m.toLong) - col("__present"))
      .withColumn("z_scaled",
        col("__zp") + col("v_zero") * lit(1L << cap))
      .withColumn("n_est",
        expr(s"CAST(${709L * m * m * (1L << cap)} DIV (1000 * z_scaled) AS BIGINT)"))
    val exact = base.groupBy(col("key"))
      .agg(countDistinct(col("__id")).as("n_exact"))
    exact.join(sketch, Seq("key"))
      .withColumn("err_abs_bp",
        expr("CAST((abs(n_est - n_exact) * 10000) DIV n_exact AS BIGINT)"))
      .select(col("key"), col("n_exact"), col("v_zero"), col("z_scaled"),
        col("n_est"), col("err_abs_bp"))
  }

  /** Equi-join cardinality estimation audit — the cost-model primitive
    * every join-order decision rides on, graded against ground truth.
    * The estimator is the classic heavy-hitter + uniform-tail model: the
    * top-`hh` keys by combined frequency contribute their EXACT c₁·c₂
    * products (skew lives in the head, and a histogram that misses it
    * mis-orders joins by orders of magnitude), the tail contributes
    * N₁ᵗ·N₂ᵗ / max(d₁ᵗ, d₂ᵗ) — the System-R containment-of-values
    * assumption. Ground truth Σ c₁(k)·c₂(k) comes from the same per-key
    * count relation (never a physical join). All products and sums run
    * in decimal(38,0): at corpus scale c₁·c₂ of a hot key alone can
    * pass int64.
    * Output per probed join: join_name, n_est, n_actual, err_abs_bp.
    */
  def joinCardinalityAudit(joins: Seq[(String, DataFrame, String, DataFrame, String)],
                           hh: Int = 8): DataFrame = {
    require(joins.nonEmpty, "need at least one join to audit")
    joins.map { case (name, left, lKey, right, rKey) =>
      val c1 = left.where(col(lKey).isNotNull)
        .groupBy(col(lKey).cast("string").as("k")).agg(count(lit(1)).as("c1"))
      val c2 = right.where(col(rKey).isNotNull)
        .groupBy(col(rKey).cast("string").as("k")).agg(count(lit(1)).as("c2"))
      val m = c1.join(c2, Seq("k"), "full_outer")
        .select(col("k"),
          coalesce(col("c1"), lit(0L)).as("c1"),
          coalesce(col("c2"), lit(0L)).as("c2"))
      val head = m.orderBy((col("c1") + col("c2")).desc, col("k").asc).limit(hh)
      val tail = m.join(head.select(col("k")), Seq("k"), "left_anti")
      val headEst = head.agg(
        coalesce(sum(col("c1").cast("decimal(38,0)") *
          col("c2").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
          .as("he"))
      val tailEst = tail.agg(
        coalesce(sum(col("c1")), lit(0L)).as("n1t"),
        coalesce(sum(col("c2")), lit(0L)).as("n2t"),
        count(when(col("c1") > 0, 1)).as("d1t"),
        count(when(col("c2") > 0, 1)).as("d2t"))
      val actual = m.agg(
        coalesce(sum(col("c1").cast("decimal(38,0)") *
          col("c2").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
          .as("act"))
      headEst.crossJoin(tailEst).crossJoin(actual)
        .select(lit(name).as("join_name"),
          expr("""CAST(he + (CAST(n1t AS DECIMAL(38,0)) * n2t)
                  DIV greatest(d1t, d2t, CAST(1 AS BIGINT)) AS BIGINT)""")
            .as("n_est"),
          expr("CAST(act AS BIGINT)").as("n_actual"))
        .withColumn("err_abs_bp",
          expr("""CAST(CASE WHEN n_actual = 0 THEN 0
                  ELSE (abs(n_est - n_actual) * CAST(10000 AS DECIMAL(38,0)))
                       DIV n_actual END AS BIGINT)"""))
    }.reduce(_ unionByName _).orderBy(col("join_name"))
  }
}
