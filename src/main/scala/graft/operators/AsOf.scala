package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — the timeseries primitive relational joins
  * can't express directly: each left row picks the LATEST right row with
  * `right.ts <= left.ts` (inclusive) within the same key. The canonical
  * uses are "tick → prevailing candle/state/quote" lookups.
  *
  * Spark has no asof join, and the two obvious encodings die at scale: a
  * broadcast of the right side assumes it is small, and a range-bucketed
  * equi-join duplicates every row once per bucket it spans. This is the
  * shape that survives when BOTH sides are huge: tag the two inputs,
  * UNION them (no join at all), and run ONE window partitioned by key in
  * (ts, side) order in which every left row reads the last carried right
  * payload. One shuffle on the key, sort-based window, no duplication —
  * exactly the merge-interleave a purpose-built timeseries engine does,
  * expressed declaratively so Catalyst/AQE still handle skew and
  * partition sizing.
  *
  * Contract: the right side should be unique per (key, ts) — the
  * standard as-of precondition. If duplicates DO arrive, the result is
  * still deterministic (the payload participates in the window ordering,
  * so ties resolve to the GREATEST payload struct in field order) — a
  * contract violation degrades to a documented tie-break, never to
  * partition-dependent output. Left rows before any right row get NULL
  * payload columns (left-join semantics). `valueCols` must not collide
  * with left column names — rename upstream (the join emits
  * left.* ++ valueCols).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asof join needs at least one payload column")
    require(valueCols.intersect(left.columns.toSeq).isEmpty,
      s"payload columns ${valueCols.intersect(left.columns.toSeq).mkString(", ")} " +
        "collide with left columns; rename upstream")
    val lType = StructType(left.schema.fields)
    val vType = StructType(right.select(valueCols.map(col): _*).schema.fields)
    val lU = left.select(
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(vType).as("__v"))
    val rU = right.select(
      lit(null).cast(lType).as("__l"),
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(valueCols.map(col).toIndexedSeq: _*).as("__v"))
    // right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    // right row exactly at the left timestamp is visible: <= semantics.
    // __v last in the ordering: duplicate (key, ts) right rows — a
    // contract violation — still resolve deterministically (greatest
    // payload wins) instead of partition-dependently; left rows all
    // carry a null __v, so their relative order stays immaterial
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("__carried", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*") +: valueCols.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** Convenience overload when both sides share the timestamp column name. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame =
    asofJoin(left, right, key, ts, ts, valueCols)

  /** As-of join with a staleness tolerance (pandas `merge_asof
    * tolerance` semantics): the carried right row must lie within
    * `toleranceSeconds` of the left timestamp or the payload reads NULL
    * — a quote from last Tuesday should not price today's trade. Same
    * single-shuffle merge-interleave: the right timestamp rides as one
    * extra payload field and the gate is a row-local integer-µs
    * residual, so the tolerance costs nothing at any scale.
    */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String,
                        valueCols: Seq[String],
                        toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0, "tolerance must be non-negative")
    val tsTag = "__asof_rts"
    require(!left.columns.contains(tsTag), s"$tsTag collides; rename upstream")
    val joined = asofJoin(left,
      right.withColumn(tsTag, col(rightTs)), key, leftTs, rightTs,
      tsTag +: valueCols)
    val fresh = col(tsTag).isNotNull &&
      unix_micros(col(leftTs).cast("timestamp")) -
        unix_micros(col(tsTag).cast("timestamp")) <=
        toleranceSeconds * 1000000L
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }.drop(tsTag)
  }

  /** Banded value join (|left.val − right.val| ≤ eps within a key) —
    * the inequality join Spark would otherwise plan as a per-key
    * Cartesian filter. Buckets of width eps turn it into an equi-join:
    * a qualifying pair's buckets differ by at most 1, so the left side
    * replicates to its bucket ± 1 (a plan-time ×3, the standard band
    * trick) and joins on (key, bucket) with the exact |Δ| residual
    * row-local. Bucketing uses integer micro-ticks (floor), so bucket
    * assignment is engine-portable at any value. Output: left.* ++
    * valueCols ++ val_diff_micro.
    */
  def bandJoin(left: DataFrame, right: DataFrame, key: String,
               leftVal: String, rightVal: String, eps: Double,
               valueCols: Seq[String]): DataFrame = {
    require(eps > 0, "eps must be positive")
    require(valueCols.intersect(left.columns.toSeq).isEmpty,
      "payload columns collide with left columns; rename upstream")
    val epsMicro = math.round(eps * 1e6)
    def tick(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
    // exact integer bucket — the join key is the floor MULTIPLE
    // t - pmod(t, eps) itself (pmod is always non-negative, so this is
    // floorDiv·eps for every long tick), never a quotient: both long
    // `/` and a double floor-divide lose ulps past 2^53 and would land
    // boundary ticks in the wrong bucket, silently dropping true pairs
    // in an operator advertised as exact. Neighbor probes step by
    // ±epsMicro instead of ±1.
    def bucket(t: Column): Column = t - pmod(t, lit(epsMicro))
    val l = left
      .withColumn("__lt", tick(col(leftVal)))
      .withColumn("__off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__b", col("__off") * lit(epsMicro) + bucket(col("__lt")))
      .drop("__off")
    val r = right
      .withColumn("__rt", tick(col(rightVal)))
      .withColumn("__b", bucket(col("__rt")))
    l.join(r.select((col(key) +: col("__b") +: col("__rt") +:
        valueCols.map(col)): _*), Seq(key, "__b"))
      .where(abs(col("__lt") - col("__rt")) <= epsMicro)
      .withColumn("val_diff_micro", abs(col("__lt") - col("__rt")))
      .drop("__b", "__rt", "__lt")
  }

  /** Batch CDC apply (MERGE semantics): fold a change log into a base
    * snapshot — the latest change per key wins on the pinned (ts, id)
    * order, `delete` removes the key, any other op upserts its payload;
    * untouched base rows pass through. The change log collapses to one
    * row per key FIRST (a struct-extreme hash agg — never a window over
    * the log), then ONE full-outer equi-join against the base: both
    * sides scale, and a key churned a million times costs one max, not
    * a million joined rows. Output: key, `valCol` (post-merge), status
    * (kept | updated | inserted); deleted keys are absent.
    */
  def cdcApply(base: DataFrame, changes: DataFrame, key: String,
               tsCol: String, idCol: String, opCol: String,
               valCol: String): DataFrame = {
    val latest = changes
      .where(col(key).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(key))
      .agg(max(struct(col(tsCol).as("__ts"), col(idCol).as("__id"),
        col(opCol).as("__op"), col(valCol).as("__v"))).as("__m"))
      .select(col(key), col("__m.__op").as("__op"), col("__m.__v").as("__v"))
    base.select(col(key), col(valCol).as("__base"), lit(true).as("__inBase"))
      .join(latest, Seq(key), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "delete")
      .select(col(key),
        when(col("__op").isNotNull, col("__v")).otherwise(col("__base"))
          .as(valCol),
        when(col("__op").isNull, "kept")
          .when(col("__inBase").isNotNull, "updated")
          .otherwise("inserted").as("status"))
  }

  /** Point-in-validity (interval) join: each left row picks the right
    * interval containing its timestamp — `start <= ts < end` within the
    * same key — the SCD-2 / session / rate-card lookup.
    *
    * The naive encoding is a range join (`ON key AND ts >= start AND
    * ts < end`), which Spark plans as a per-key Cartesian filter. This
    * reduces to the [[asofJoin]] merge-interleave instead: the only
    * candidate is the interval with the LATEST `start <= ts` (one
    * union + one keyed window, both sides scale, no per-bucket row
    * duplication), and containment becomes a residual null-out — a
    * candidate whose `end` has already passed yields NULL payloads,
    * preserving left-join semantics for rows that fall in a gap.
    *
    * Contract: intervals must be non-overlapping per key (the standard
    * validity-dimension precondition). Overlap degrades
    * deterministically to latest-start-wins (ties on `start` resolve to
    * the greatest `(end, valueCols...)` struct) — an earlier still-open
    * interval is never consulted once a later one has started, and the
    * output is never partition-dependent.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, start: String, end: String,
                   valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "interval join needs at least one payload column")
    require(!left.columns.contains(end),
      s"end column $end collides with a left column; rename upstream")
    val joined = asofJoin(left, right, key, leftTs, start, end +: valueCols)
    val contained = col(end).isNotNull && col(leftTs) < col(end)
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(contained, col(c)))
    }.drop(end)
  }

  /** Build an SCD Type-2 dimension from a change log — the producer side
    * of the interval tables [[asofJoin]]/[[intervalJoin]] consume: per
    * key, collapse consecutive observations with an UNCHANGED state into
    * one version (run-length compression — a change log mostly restates
    * the current value), open a new version at every change point, and
    * close it when the next one opens. The current version stays open
    * (null valid_to).
    *
    * Two stacked windows per key, both on the pinned (ts, id) total
    * order (the q95 precision discipline): `lag` marks change points,
    * then `row_number`/`lead` over the SURVIVORS number versions and
    * chain validity — the second window's input is already collapsed,
    * so its cost tracks the number of CHANGES, not the log volume.
    * Output: key, version, valid_from, valid_to (null = current), state.
    */
  def scd2FromChangeLog(events: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__id"))
    val changes = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(stateCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(stateCol).as("__s"))
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col("__s"))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("__ts"), 1).over(w))
      .select(col("__k").as(keyCol), col("version"),
        col("__ts").as("valid_from"), col("valid_to"),
        col("__s").as(stateCol))
  }

  /** Nearest-event join — the bidirectional sibling of [[asofJoin]]:
    * each left row picks the right row MINIMIZING |Δts| within the key,
    * ties resolving backward (the earlier candidate), the sensor-fusion
    * / "closest quote to this trade" alignment primitive.
    *
    * Same merge-interleave shape as [[asofJoin]] — tag, union, ONE
    * window per key — but with BOTH frames: the backward candidate is
    * the last carried right payload before the row, the forward one the
    * first after it; the winner is a row-local comparison of the two
    * integer-µs gaps. No join node at all, both sides scale, one
    * shuffle. A right row at the exact left timestamp sorts before the
    * left row (side order), so it wins at gap 0 through the backward
    * frame. Equal-(ts) right duplicates resolve deterministically like
    * [[asofJoin]]: greatest payload struct backward, smallest forward.
    * Left rows with no right row in the key at all keep NULL payloads
    * (left-join semantics). Output: left.* ++ valueCols ++ nearest_gap_us.
    */
  def nearestJoin(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "nearest join needs at least one payload column")
    require(valueCols.intersect(left.columns.toSeq).isEmpty,
      s"payload columns ${valueCols.intersect(left.columns.toSeq).mkString(", ")} " +
        "collide with left columns; rename upstream")
    val lType = StructType(left.schema.fields)
    val vType = StructType(
      right.select((unix_micros(col(rightTs)).as("__rus") +:
        valueCols.map(col)): _*).schema.fields)
    val lU = left.select(
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      col(key).as("__k"), unix_micros(col(leftTs)).as("__us"),
      lit(1).as("__side"), lit(null).cast(vType).as("__v"))
    val rU = right.select(
      lit(null).cast(lType).as("__l"),
      col(key).as("__k"), unix_micros(col(rightTs)).as("__us"),
      lit(0).as("__side"),
      struct((unix_micros(col(rightTs)).as("__rus") +:
        valueCols.map(col)): _*).as("__v"))
    val ord = Seq(col("__us"), col("__side"), col("__v"))
    val wB = Window.partitionBy("__k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wF = Window.partitionBy("__k").orderBy(ord: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val gapB = col("__us") - col("__bv.__rus")
    val gapF = col("__fv.__rus") - col("__us")
    val pick = when(col("__bv").isNull, col("__fv"))
      .when(col("__fv").isNull, col("__bv"))
      .when(gapF < gapB, col("__fv"))
      .otherwise(col("__bv"))
    lU.unionByName(rU)
      .withColumn("__bv", last(col("__v"), ignoreNulls = true).over(wB))
      .withColumn("__fv", first(col("__v"), ignoreNulls = true).over(wF))
      .where(col("__side") === 1)
      .withColumn("__w", pick)
      .select(col("__l.*") +:
        (valueCols.map(c => col(s"__w.$c").as(c)) :+
          abs(col("__us") - col("__w.__rus")).as("nearest_gap_us")): _*)
  }
}
