package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics over bounded-cardinality measures.
  *
  * The scale story: a global `ntile(k)` needs one total order over the
  * corpus — a single-partition sort of every row, the same trap
  * [[TextAnalysis.packDocs]] documents. But calibration measures
  * (quality scores rounded to 4dp, integer token counts, deciles of any
  * discretized signal) have BOUNDED value cardinality, so exact order
  * statistics reduce to counting: aggregate per distinct value (one
  * hash agg), cumulate over the value dimension (a window bounded by
  * the cardinality, not the corpus), pick cuts, and assign buckets with
  * a plan-time literal array — the assignment pass is a pure column
  * expression with ZERO shuffles.
  *
  * Bucket semantics are value-deterministic: cut_j = smallest v whose
  * cumulative count reaches ceil(j·n/k) (integer ceil — no float
  * targets), bucket(v) = 1 + #{cuts < v}. Equal values ALWAYS share a
  * bucket (unlike ntile, which splits ties by row order — not
  * reproducible across partitionings); heavy ties may leave buckets
  * empty, which is the honest answer for a discrete distribution.
  */
object Stats {

  /** Adds `bucketCol` (1..k) to `df` by exact k-quantile cuts of
    * `valueCol`. The distinct-value dimension is materialized on the
    * driver for the cut literals — bounded by `maxDistinct` and enforced
    * (the [[Similarity]] centroid-sample / [[Dedup]] union-find gating
    * discipline: bounded driver work is declared, unbounded raises).
    *
    * No window function anywhere: `orderBy().limit(cap+1)` plans as
    * TakeOrderedAndProject — a per-partition top-(cap+1) heap plus a
    * bounded driver merge, so an UNBOUNDED measure still finishes the
    * job in O(n log cap) and hits the gate without ever paying a
    * corpus-wide sort (the earlier shape ran a single-partition cumsum
    * window over ALL distinct values and only then checked the cap).
    * The cumulative counts are then driver arithmetic over ≤ cap rows.
    * Driver payload at the merge is min(cardinality, cap+1) rows per
    * upstream partition of ~16 bytes each — bounded and declared.
    */
  def quantileBuckets(df: DataFrame, valueCol: String, k: Int,
                      bucketCol: String = "bucket",
                      maxDistinct: Int = 100000): DataFrame = {
    require(k >= 2, "need at least two buckets")
    val counts = df.groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    // ascending, nulls first (Spark default) — the collected order IS the
    // cumulation order, so null measures keep their pre-r7 semantics
    val capped = counts.orderBy("__v").limit(maxDistinct + 1)
      .collect().map(r => (r.get(0), r.getLong(1)))
    require(capped.length <= maxDistinct,
      s"$valueCol has more than $maxDistinct distinct values: " +
        "quantile bucketing by counting needs a bounded measure — " +
        "round/discretize the column first (see quantileBucketsTicked)")
    var running = 0L
    val cum = capped.map { case (v, c) => running += c; (v, running) }
    val n = running
    val cuts: Seq[Any] = (1 until k).flatMap { j =>
      val target = (j * n + k - 1) / k // integer ceil(j*n/k)
      cum.find(_._2 >= target).map(_._1)
    }
    if (cuts.isEmpty) df.withColumn(bucketCol, lit(1)) // empty input
    else {
      val cutArr = array(cuts.map(c => lit(c)).toIndexedSeq: _*)
      df.withColumn(bucketCol,
        (lit(1) + size(filter(cutArr, c => c < col(valueCol)))).cast("int"))
    }
  }

  /** The unbounded-measure path: discretize `valueCol` onto a fixed
    * `tick` grid first (grid index = floor(v / tick), a long), then
    * bucket the grid index with [[quantileBuckets]]. Values within one
    * tick share a bucket BY CONSTRUCTION — the declared resolution trade
    * that makes quantile calibration well-defined at any corpus size:
    * the value dimension is bounded by range/tick, not by the corpus, so
    * a per-doc mean like LM surprisal (whose distinct count grows with
    * the corpus) stops being a cardinality-gate hazard. Cut positions
    * move by at most one tick relative to the exact path; pick `tick`
    * at the measure's decision resolution (e.g. 1e-3 nats for
    * curriculum pacing) and the buckets are exact for every value pair
    * further than one tick apart.
    */
  def quantileBucketsTicked(df: DataFrame, valueCol: String, k: Int,
                            tick: Double,
                            bucketCol: String = "bucket",
                            maxDistinct: Int = 100000): DataFrame = {
    require(tick > 0, "tick must be positive")
    val g = s"__grid_$valueCol"
    quantileBuckets(df.withColumn(g, floor(col(valueCol) / tick)),
      g, k, bucketCol, maxDistinct).drop(g)
  }

  /** Trailing-`windowDays`-day distinct-id count per active day — the
    * "rolling 7-day active users" engagement measure.
    *
    * `count(distinct)` over a sliding RANGE window is the trap here:
    * Spark (correctly) refuses it, and the workarounds — a
    * `collect_set` window or a self-join on `BETWEEN` — materialize
    * per-day id sets or plan a per-key range filter, both of which die
    * when days hold millions of ids. This stays linear instead: dedupe
    * to (day, id) once, replicate each pair to the `windowDays` window
    * ends it contributes to (a bounded plan-time constant ×W map-side
    * expansion, no join), and count distinct ids per window end — two
    * hash aggregates, no window function, no range join, no per-day set
    * in memory. 100 TB posture: shuffles carry (day, id) pairs only,
    * and W is a literal, so cost is W × |distinct (day,id)| regardless
    * of row count or skew in events-per-user.
    *
    * Emits one row per day PRESENT in `df` (`day` date, `outCol`
    * long) — a day with no activity has no trailing-window row, which
    * is the honest answer for an activity measure; densify against a
    * calendar dimension downstream if gap rows are wanted.
    */
  def rollingDistinctCount(df: DataFrame, tsCol: String, idCol: String,
                           windowDays: Int = 7,
                           outCol: String = "active_ids"): DataFrame = {
    require(windowDays >= 1, "window must span at least one day")
    val active = df.select(to_date(col(tsCol)).as("__day"), col(idCol).as("__id"))
      .where(col("__day").isNotNull && col("__id").isNotNull)
      .distinct()
    val counts = active
      .withColumn("__i", explode(sequence(lit(0), lit(windowDays - 1))))
      .select(date_add(col("__day"), col("__i")).as("__wend"), col("__id"))
      .groupBy("__wend")
      .agg(countDistinct(col("__id")).as(outCol))
    // restrict to observed days: the day dim is bounded by the calendar,
    // so the join broadcasts
    active.select(col("__day")).distinct()
      .join(counts, col("__day") === col("__wend"))
      .select(col("__day").as("day"), col(outCol))
  }
}
