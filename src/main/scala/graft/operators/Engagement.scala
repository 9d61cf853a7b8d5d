package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream engagement analytics: ordered funnels and cohort
  * retention — the two queries every product/event pipeline runs daily
  * over its raw event log.
  *
  * Both are kept strictly relational (hash aggregates + equi-joins on
  * the user key) rather than the tempting per-user
  * `collect_list + sort` fold: a collected per-user event array is
  * bounded by the heaviest user's history — exactly the skew that blows
  * an executor at 100 TB — while these plans shuffle only (user,
  * timestamp) pairs per step and never materialize a user's history
  * anywhere.
  */
object Engagement {

  /** Ordered funnel: how many users complete each prefix of `steps`, in
    * order. A user reaches step k at the EARLIEST event of type
    * `steps(k)` at-or-after their step-(k−1) time (inclusive `>=` —
    * micro-precision ties count as progress, deterministically).
    *
    * The sequential dependency makes one fused pass impossible
    * relationally, so the plan is a fold: step 1 is a hash agg
    * (`min(ts)` per user), each later step filters its own event type,
    * joins the survivors of the previous step, and re-aggregates —
    * every stage keyed on the user, so AQE reuses the exchange and the
    * per-stage shuffle carries only that step's (user, ts) pairs. Step
    * count is a plan-time constant; no stage sees more than the raw
    * event volume of its own type.
    *
    * Emits one row per step: (step_idx 1-based int, step_name, users
    * long) — the classic funnel table, monotone non-increasing.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             maxLagSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, "funnel steps must be distinct")
    val base = events.select(col(userCol).as("__u"), col(tsCol).as("__ts"),
      col(typeCol).as("__t"))
      .where(col("__u").isNotNull && col("__ts").isNotNull)
    val first = base.where(col("__t") === steps.head)
      .groupBy("__u").agg(min("__ts").as("__tk"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      val joined = base.where(col("__t") === step)
        .join(prev.select(col("__u"), col("__tk").as("__prev")), Seq("__u"))
        .where(col("__ts") >= col("__prev"))
      // windowed variant: a step only counts when it lands within
      // maxLagSeconds of the previous step's completion — the "convert
      // within N days" form every product funnel also ships; integer
      // micros end-to-end, so the window edge is exact
      val gated = maxLagSeconds.fold(joined)(lag =>
        joined.where(
          unix_micros(col("__ts").cast("timestamp")) -
            unix_micros(col("__prev").cast("timestamp")) <= lag * 1000000L))
      gated.groupBy("__u").agg(min("__ts").as("__tk"))
    }
    reached.zip(steps).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step_idx"), lit(name).as("step_name"),
          col("users"))
    }.reduce(_ unionByName _)
  }

  /** Conversion-lag histogram: for each user who completes
    * `fromStep -> toStep` (first `fromStep` event, then first `toStep`
    * at-or-after it, same inclusive semantics as [[funnel]]), the lag
    * bucketed into `bucketSecs`-wide bins.
    *
    * Lag arithmetic is integer end-to-end — epoch micros subtracted,
    * then integral `div` into buckets — no float seconds, so bin edges
    * are exact and engine-portable. Plan shape is the funnel's step-2
    * stage plus one tiny hash agg on the bucket dimension; the bucket
    * dim is bounded by the observable time span over `bucketSecs`,
    * never by user count.
    *
    * Emits (lag_bucket long — bucket i covers [i·bucketSecs,
    * (i+1)·bucketSecs) —, users long) for converting users only;
    * non-converters simply don't reach the histogram, which is the
    * funnel table's job to count.
    */
  def conversionLag(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, fromStep: String, toStep: String,
                    bucketSecs: Long = 3600L): DataFrame = {
    require(bucketSecs >= 1, "bucket must span at least one second")
    val base = events.select(col(userCol).as("__u"), col(tsCol).as("__ts"),
      col(typeCol).as("__t"))
      .where(col("__u").isNotNull && col("__ts").isNotNull)
    val first = base.where(col("__t") === fromStep)
      .groupBy("__u").agg(min("__ts").as("__t0"))
    base.where(col("__t") === toStep)
      .join(first, Seq("__u"))
      .where(col("__ts") >= col("__t0"))
      .groupBy("__u").agg(min(col("__ts")).as("__t1"), min(col("__t0")).as("__t0"))
      .select(expr(s"(unix_micros(__t1) - unix_micros(__t0)) div ${bucketSecs * 1000000L}")
        .as("lag_bucket"))
      .groupBy("lag_bucket")
      .agg(count(lit(1)).as("users"))
  }

  /** Event-flow transition matrix: for each consecutive pair of events
    * per user (ordered by timestamp, `tieCol` breaking equal-timestamp
    * ties deterministically), count `from_type -> to_type` — the input
    * to every Sankey / user-flow / Markov-chain analysis.
    *
    * One window partitioned by user for the `lead`, one hash agg on the
    * (from, to) pair — the type-pair dimension is squared-cardinality
    * small, so the second agg is trivial. The per-user window partition
    * holds one user's history, the same bound as [[funnel]]'s worst
    * stage input; nothing is per-user collected.
    *
    * `prob_bp` is the row-conditional transition probability in basis
    * points, integer HALF_UP ((20000·n + tot) div (2·tot)) — exact and
    * engine-portable, per the repo's rounded-ratio discipline.
    *
    * A NULL `typeCol` is a real observation (an untyped event is still a
    * step in the flow) but a poisonous output key: Spark sorts NULLS
    * FIRST, DuckDB NULLS LAST, so any downstream ORDER BY on the pair
    * diverges in row order with identical row multisets. It is bucketed
    * as the `'<none>'` sentinel on BOTH sides (the linearAttribution
    * pattern), keeping every output key non-null and totally ordered.
    *
    * Emits (from_type, to_type, n long, prob_bp long).
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
    val pairs = events.select(col(userCol).as("__u"), col(tsCol).as("__ts"),
      col(tieCol).as("__tie"),
      coalesce(col(typeCol).cast("string"), lit("<none>")).as("__t"))
      .where(col("__u").isNotNull && col("__ts").isNotNull)
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col("__t").as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("prob_bp",
        expr("(20000 * n + sum(n) OVER (PARTITION BY from_type)) div " +
          "(2 * sum(n) OVER (PARTITION BY from_type))"))
  }

  /** Next-event predictability: Shannon entropy of each type's
    * transition distribution, in floored micro-nats — 0 means the next
    * event is fully determined (a rigid funnel step), ln(k) means
    * uniform chaos over k continuations. Rides the [[transitions]]
    * counts: H = Σ c·ln(n/c) / n with each log a round-half-away
    * micro-nat term (the PMI/lnMicros discipline — deterministic given
    * IEEE libm, accepted engine-wide), the weighted sum exact integer,
    * one final floor DIV. Type-grid aggregates only.
    * Output: from_type, n, n_next_types, entropy_micro.
    */
  def transitionEntropy(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, tieCol: String): DataFrame = {
    val counts = transitions(events, userCol, tsCol, typeCol, tieCol)
      .select(col("from_type"), col("to_type"), col("n"))
    val tot = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"), count(lit(1)).as("n_next_types"))
    counts.join(tot, Seq("from_type"))
      .select(col("from_type"), col("__tot"), col("n_next_types"),
        (col("n") * round(log(col("__tot").cast("double") / col("n")) * 1e6)
          .cast("long")).as("__term"))
      .groupBy(col("from_type"))
      .agg(max(col("__tot")).as("n"), max(col("n_next_types")).as("n_next_types"),
        sum(col("__term")).as("__s"))
      .select(col("from_type"), col("n"), col("n_next_types"),
        expr("__s DIV n").as("entropy_micro"))
      .orderBy(col("from_type"))
  }

  /** Audience-overlap matrix: per event-type pair, how many distinct
    * users do both — the "are these features the same crowd" planning
    * table. Jaccard of user SETS in floor bp; everything runs on the
    * distinct (type, user) relation (one exchange collapses raw
    * volume), and the pair join keys on the USER so a type done by
    * everyone fans out |types|² per user, never user². Output:
    * type_a < type_b, n_a, n_b, n_common, jaccard_bp.
    */
  def audienceOverlap(events: DataFrame, userCol: String = "user_id",
                      typeCol: String = "event_type"): DataFrame = {
    val tu = events
      .where(col(userCol).isNotNull && col(typeCol).isNotNull)
      .select(col(typeCol).as("__t"), col(userCol).as("__u"))
      .distinct()
    val sz = tu.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    tu.as("a").join(tu.as("b"),
        col("a.__u") === col("b.__u") && col("a.__t") < col("b.__t"))
      .groupBy(col("a.__t").as("type_a"), col("b.__t").as("type_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sz.select(col("__t").as("type_a"), col("__n").as("n_a")),
        Seq("type_a"))
      .join(sz.select(col("__t").as("type_b"), col("__n").as("n_b")),
        Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_common"),
        expr("(n_common * 10000) DIV (n_a + n_b - n_common)").as("jaccard_bp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Run-length census: distribution of consecutive same-type runs per
    * user stream — the "do users binge one action or alternate" shape
    * (and the retry-storm detector at run lengths no [[doubleFire]]
    * window catches). One keyed window marks run starts on the pinned
    * (µs, id) order, a second cumulative sum numbers runs, then two
    * hash aggs to the (type, run length) grid.
    * Output: event_type, run_len, n_runs.
    */
  def runLengthCensus(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
    val wCum = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), col(typeCol).as("__t"))
      .withColumn("__start",
        when(lag(col("__t"), 1).over(w).isNull ||
          lag(col("__t"), 1).over(w) =!= col("__t"), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__start")).over(wCum))
      .groupBy(col("__u"), col("__run"), col("__t"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col("__t").as("event_type"), col("__len").as("run_len"))
      .agg(count(lit(1)).as("n_runs"))
      .orderBy(col("event_type"), col("run_len"))
  }

  /** Per-user feature extract — the classic churn-model feature-store
    * row: recency (days since last event, vs the corpus max day),
    * frequency (events), monetary (exact purchase cents), breadth
    * (distinct types), active days, and tenure (first→last span). ONE
    * hash aggregate over the user key plus a broadcast max-day scalar;
    * this is the table every downstream model join starts from, so it
    * stays one exchange wide. Output: user_id, recency_days, frequency,
    * monetary_cents, n_types, active_days, tenure_days.
    */
  def userFeatures(events: DataFrame, userCol: String = "user_id",
                   tsCol: String = "ts", typeCol: String = "event_type",
                   valueCol: String = "value",
                   purchaseType: String = "purchase"): DataFrame = {
    val mx = events.where(col(tsCol).isNotNull)
      .agg(max(to_date(col(tsCol))).as("__mx"))
    events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .crossJoin(broadcast(mx))
      .groupBy(col(userCol).as("user_id"))
      .agg(
        datediff(max(col("__mx")), max(to_date(col(tsCol)))).cast("long")
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(when(col(typeCol) === purchaseType && col(valueCol).isNotNull && !isnan(col(valueCol)),
          floor(col(valueCol) * 100 + 0.5).cast("long")).otherwise(0L))
          .as("monetary_cents"),
        countDistinct(col(typeCol)).as("n_types"),
        countDistinct(to_date(col(tsCol))).as("active_days"),
        datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol))))
          .cast("long").as("tenure_days"))
      .orderBy(col("user_id"))
  }

  /** Weekly ARPU / ARPPU: revenue cents per active user and per paying
    * user on the Monday week grid — the unit-economics dashboard pair.
    * Floor cents-per-user division (exact integers end-to-end).
    * Output: week, actives, payers, revenue_cents, arpu_cents,
    * arppu_cents (0 when no payers).
    */
  def weeklyArpu(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts", typeCol: String = "event_type",
                 valueCol: String = "value",
                 purchaseType: String = "purchase"): DataFrame = {
    events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(date_trunc("week", col(tsCol)).as("week"))
      .agg(countDistinct(col(userCol)).as("actives"),
        countDistinct(when(col(typeCol) === purchaseType, col(userCol)))
          .as("payers"),
        sum(when(col(typeCol) === purchaseType && col(valueCol).isNotNull && !isnan(col(valueCol)),
          floor(col(valueCol) * 100 + 0.5).cast("long")).otherwise(0L))
          .as("revenue_cents"))
      .select(col("week"), col("actives"), col("payers"), col("revenue_cents"),
        expr("revenue_cents DIV actives").as("arpu_cents"),
        when(col("payers") === 0, 0L)
          .otherwise(expr("revenue_cents DIV payers")).as("arppu_cents"))
      .orderBy(col("week"))
  }

  /** Cohort retention: users bucketed by first-activity day (their
    * cohort), counted distinct per (cohort, periods-since-cohort).
    *
    * Three relational stages: dedupe activity to (user, day), hash-agg
    * the cohort day per user, join back on the user key and count
    * distinct per (cohort, offset) — the join and both aggregates all
    * shuffle on the user, so the whole plan is two exchanges end-to-end
    * and nothing is ever per-user materialized. Offsets use integral
    * division (`div`), not float division-and-truncate.
    *
    * Emits (cohort_day date, period_offset int, users long); offset 0
    * is the cohort's own period, so every cohort has at least that row.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, "period must span at least one day")
    val active = events.select(col(userCol).as("__u"),
      to_date(col(tsCol)).as("__d"))
      .where(col("__u").isNotNull && col("__d").isNotNull)
      .distinct()
    val cohort = active.groupBy("__u").agg(min("__d").as("__c"))
    active.join(cohort, Seq("__u"))
      .groupBy(col("__c").as("cohort_day"),
        expr(s"CAST(datediff(__d, __c) div $periodDays AS INT)")
          .as("period_offset"))
      .agg(countDistinct(col("__u")).as("users"))
  }

  /** Top-k session-opening paths — "how do sessions start": sessions cut
    * at a `gapMinutes` inactivity gap (the q20 sessionize convention,
    * same (ts, tie) ordering), each session reduced to its FIRST `depth`
    * event types joined by `>`. The path assembles as a conditional-max
    * pivot over the plan-time-constant depth — a plain hash aggregate,
    * never a per-session `collect_list` (the heavy-session skew trap) —
    * and all three windows partition on the user key, so one exchange
    * serves the whole chain. Top-k is a TakeOrdered heap; the rank
    * window touches k rows only. Sessions shorter than `depth` emit
    * their shorter path (concat_ws skips the empty slots).
    * Output: rank (n desc, path asc), path, n_sessions.
    */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, tieCol: String,
                   gapMinutes: Int = 30, depth: Int = 3, k: Int = 20): DataFrame = {
    require(depth >= 1 && k >= 1, "depth and k must be positive")
    val wo = Window.partitionBy(col("__u")).orderBy(col("__us"), col("__tie"))
    val base = events.select(col(userCol).as("__u"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(tieCol).as("__tie"), col(typeCol).as("__t"))
      .where(col("__u").isNotNull && col("__us").isNotNull)
      .withColumn("__prev", lag(col("__us"), 1).over(wo))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("__u"), col("__sid"))
      .orderBy(col("__us"), col("__tie"))
    val firsts = base.withColumn("__rk", row_number().over(ws))
      .where(col("__rk") <= depth)
    val slots = (1 to depth).map(i =>
      max(when(col("__rk") === i, col("__t"))).as(s"__s$i"))
    val ord = Seq(col("n_sessions").desc, col("path").asc)
    firsts.groupBy(col("__u"), col("__sid"))
      .agg(slots.head, slots.tail: _*)
      .select(concat_ws(">", (1 to depth).map(i => col(s"__s$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(ord: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select("rank", "path", "n_sessions")
  }

  /** Top event-flow trigrams: the most common 3-step consecutive-type
    * sequences in user streams — the n=3 extension of [[transitions]]'
    * bigram matrix (a bigram can't separate "view→click→purchase" from
    * "view→click→bounce"; the trigram table can). Two leads on ONE
    * user-keyed window (same exchange as transitions, null/ordering
    * parity per the q95 lesson), hash-agg counts, TakeOrdered top-k
    * with the (n desc, path asc) total tie order.
    * Output: rank, path ("a>b>c"), n.
    */
  def flowTrigrams(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, tieCol: String, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__us"), col("__tie"))
    val ord = Seq(col("n").desc, col("path").asc)
    events
      .select(col(userCol).as("__u"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(typeCol).as("__t"), col(tieCol).as("__tie"))
      .where(col("__u").isNotNull && col("__us").isNotNull)
      .withColumn("__t2", lead(col("__t"), 1).over(w))
      .withColumn("__t3", lead(col("__t"), 2).over(w))
      // __t too: concat_ws would silently SKIP a null first step where a
      // SQL `||` chain nulls the whole path — filter on both engines
      .where(col("__t").isNotNull && col("__t2").isNotNull &&
        col("__t3").isNotNull)
      .select(concat_ws(">", col("__t"), col("__t2"), col("__t3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(ord: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select(col("rank"), col("path"), col("n"))
  }

  /** Gap-sessionized duration/depth percentiles — the two distributions
    * a session-timeout or capacity decision reads (how long sessions
    * run, how many events they hold). Sessionization is the
    * [[sessionPaths]] prologue verbatim (user-keyed lag + cumulative
    * new-session flags — one exchange serves the whole chain); per
    * (user, session) the agg emits integer whole-second duration and
    * event depth, both metrics stack into one (metric × value) counting
    * grid, and the percentile windows run over CELLS (bounded by value
    * cardinality), never sessions.
    * Output: metric ("depth" | "duration_s"), n_sessions, p50, p90, p99.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   tieCol: String, gapMinutes: Int = 30): DataFrame = {
    val wo = Window.partitionBy(col("__u")).orderBy(col("__us"), col("__tie"))
    val sessions = events
      .select(col(userCol).as("__u"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(tieCol).as("__tie"))
      .where(col("__u").isNotNull && col("__us").isNotNull)
      .withColumn("__prev", lag(col("__us"), 1).over(wo))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__u"), col("__sid"))
      .agg(count(lit(1)).as("__depth"),
        expr("(max(__us) - min(__us)) DIV 1000000").as("__dur"))
    val stacked = sessions.select(lit("depth").as("__m"), col("__depth").as("__v"))
      .unionByName(sessions.select(lit("duration_s").as("__m"), col("__dur").as("__v")))
    val wCum = Window.partitionBy(col("__m")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(col("__m"))
    def pick(p: Int): Column =
      min(when(col("__cum") * 100 >= col("__n") * p, col("__v")))
        .cast("double").as(s"p$p")
    stacked.groupBy(col("__m"), col("__v")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wKey))
      .groupBy(col("__m"))
      .agg(max(col("__n")).as("n_sessions"), pick(50), pick(90), pick(99))
      .select(col("__m").as("metric"), col("n_sessions"),
        col("p50"), col("p90"), col("p99"))
  }

  /** Session entry/exit census with bounce rates — "where do sessions
    * start, where do they end, and how many are one-and-done". The
    * sessionization prologue is [[sessionStats]]' verbatim (user-keyed
    * gap cut, same (ts, tie) total order); per session one aggregate
    * picks the first/last event type as min/max over (ts, tie, type)
    * structs — the (ts, tie) prefix is unique per row, so the struct
    * extreme IS the rank-1 row, without a second window pass — and the
    * census agg runs on the bounded (entry × exit) dim. A bounce
    * (depth 1) necessarily lands on the diagonal.
    * Output: entry_type, exit_type, n_sessions, n_bounce, bounce_bp.
    */
  def sessionEntryExit(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String,
                       gapMinutes: Int = 30): DataFrame = {
    val wo = Window.partitionBy(col("__u")).orderBy(col("__us"), col("__tie"))
    events
      .select(col(userCol).as("__u"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(typeCol).as("__t"), col(tieCol).as("__tie"))
      .where(col("__u").isNotNull && col("__us").isNotNull)
      .withColumn("__prev", lag(col("__us"), 1).over(wo))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__u"), col("__sid"))
      .agg(min(struct(col("__us"), col("__tie"), col("__t"))).as("__f"),
        max(struct(col("__us"), col("__tie"), col("__t"))).as("__l"),
        count(lit(1)).as("__depth"))
      .groupBy(col("__f.__t").as("entry_type"), col("__l.__t").as("exit_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__depth") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .withColumn("bounce_bp",
        expr("CAST((n_bounce * 10000) DIV n_sessions AS BIGINT)"))
  }

  /** RFM segmentation census: every user scored 1–`q` on Recency (days
    * since last event, ascending — segment 1 is the most recent),
    * Frequency (event count) and Monetary (value summed in exact cents,
    * reported in whole units), then counted per (r, f, m) cell — the
    * classic lifecycle-marketing cube, ≤ q³ rows out.
    *
    * Segment cuts are RANK-based on a (metric × value) counting grid,
    * never a per-user sort: ties share the segment of their first
    * position (seg = min(q, (q·cum0) DIV n + 1) with cum0 = users
    * strictly below the value — IDENTICALLY 1 + |{j : cut_j < v}| with
    * cut_j the first grid value whose inclusive cum reaches ⌈j·n/q⌉,
    * because cum0(v) ≥ ⌈j·n/q⌉ ⟺ cut_j < v on an ordered grid). The
    * cut values come off the counting grid through the same gated
    * driver collect as [[Stats.quantileBuckets]] (loud `require` above
    * `maxDistinct` cells per metric — recency is bounded by the day
    * span, frequency by activity skew, monetary by whole-unit
    * discretization; a measure that still exceeds the cap must be
    * re-ticked, per the quantileBucketsTicked discipline), so the plan
    * carries NO data-cardinality window — 3·(q−1) cut literals
    * broadcast back instead of a per-metric sorted prefix sum. Per-
    * event values fix to integer cents before summing so the monetary
    * metric is fold-order exact.
    * Output: r_seg, f_seg, m_seg, n_users, share_bp.
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String, q: Int = 4): DataFrame = {
    require(q >= 2, "need at least two segments")
    // NULL/NaN value → 0 cents, pinned on BOTH engine and oracle sides:
    // a null __cents would make an all-null user's sum NULL, flow a NULL
    // row through stack (Spark emits it; SQL UNPIVOT silently excludes
    // it) and land a NULL segment key in the final ORDER BY — three
    // distinct engine-divergence paths closed by one zero-coalesce.
    val per = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"),
        floor(coalesce(nanvl(col(valueCol).cast("double"), lit(0.0)), lit(0.0))
          * 100 + 0.5).cast("long").as("__cents"))
      .where(col("__u").isNotNull && col("__d").isNotNull)
      .groupBy(col("__u"))
      .agg(max(col("__d")).as("__last"), count(lit(1)).as("__freq"),
        sum(col("__cents")).as("__sc"))
    val ref = per.agg(max(col("__last")).as("__ref"))
    val stacked = per.crossJoin(broadcast(ref))
      .select(col("__u"), expr(
        """stack(3,
          |  'r', CAST(datediff(__ref, __last) AS BIGINT),
          |  'f', __freq,
          |  'm', __sc DIV 100) AS (__m, __v)""".stripMargin))
    val maxDistinct = 100000
    val spark = events.sparkSession
    import spark.implicits._
    // counting grid, collected under the quantileBuckets cap discipline:
    // ≤ 3·maxDistinct cells of ~24 bytes, ordered so the scan order IS
    // the cumulation order — the driver does only the prefix sums and
    // the q−1 target lookups per metric
    val gridRows = stacked.groupBy(col("__m"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .orderBy(col("__m"), col("__v"))
      .limit(3 * maxDistinct + 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cuts: Map[String, Seq[Long]] = gridRows.groupBy(_._1).map {
      case (metric, cells) =>
        require(cells.length <= maxDistinct,
          s"rfm metric '$metric' has more than $maxDistinct distinct " +
            "grid values: discretize the measure onto a coarser tick " +
            "first (see Stats.quantileBucketsTicked)")
        var running = 0L
        val cum = cells.map { case (_, v, c) => running += c; (v, running) }
        val n = running
        metric -> (1 until q).flatMap { j =>
          val target = (j * n + q - 1) / q // integer ceil(j*n/q)
          cum.find(_._2 >= target).map(_._1)
        }
    }
    val segCuts = broadcast(Seq("r", "f", "m")
      .map(mk => (mk, cuts.getOrElse(mk, Seq.empty)))
      .toDF("__m", "__cuts"))
    val cube = stacked.join(segCuts, Seq("__m"))
      .withColumn("__seg",
        least(lit(q.toLong),
          lit(1L) + size(filter(col("__cuts"), c => c < col("__v"))).cast("long")))
      .groupBy(col("__u"))
      .agg(max(when(col("__m") === "r", col("__seg"))).as("r_seg"),
        max(when(col("__m") === "f", col("__seg"))).as("f_seg"),
        max(when(col("__m") === "m", col("__seg"))).as("m_seg"))
      .groupBy(col("r_seg"), col("f_seg"), col("m_seg"))
      .agg(count(lit(1)).as("n_users"))
    cube.withColumn("share_bp", expr(
      "CAST((n_users * 10000) DIV sum(n_users) OVER () AS BIGINT)"))
  }

  /** First-touch census: the distribution of each user's FIRST event
    * type — the acquisition-mix / broken-instrumentation audit (a user
    * whose first event is `purchase` never saw an attributable touch).
    * One user-keyed window rank picks the (ts, id)-earliest event per
    * user deterministically; the share denominator is all users.
    * Output: event_type, n_users, share_bp (floor).
    */
  def firstTouchCensus(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val wo = Window.partitionBy(col("__u")).orderBy(col("__us"), col("__tie"))
    val census = events
      .select(col(userCol).as("__u"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(typeCol).as("__t"), col(tieCol).as("__tie"))
      .where(col("__u").isNotNull && col("__us").isNotNull)
      .withColumn("__rn", row_number().over(wo))
      .where(col("__rn") === 1)
      .groupBy(col("__t")).agg(count(lit(1)).as("n_users"))
    val total = census.agg(sum(col("n_users")).as("__tot"))
    census.crossJoin(broadcast(total))
      .select(col("__t").as("event_type"), col("n_users"),
        expr("(n_users * 10000) DIV __tot").as("share_bp"))
  }

  /** Weekly growth accounting: the new / retained / resurrected /
    * churned user ledger per observed week — the canonical growth table
    * one level richer than [[retention]]'s cohort curves. Presence
    * collapses to distinct (user, week) FIRST (bounded by users ×
    * weeks, immune to per-user event skew); "new" compares against the
    * user's first week, "retained" against presence in week−7d,
    * "churned" is the anti-join of week−7d presence into the current
    * week, attributed to the week the user went missing. Every join is
    * user-keyed; weeks with zero presence rows are skipped (the honest
    * answer — there is no activity ledger for a dead week).
    * Output: week (date), n_new, n_retained, n_resurrected, n_churned.
    */
  def growthAccounting(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val uw = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        to_date(date_trunc("week", col(tsCol).cast("timestamp"))).as("__w"))
      .distinct()
    val firsts = uw.groupBy(col("__u")).agg(min(col("__w")).as("__w0"))
    val prev = uw.select(col("__u"), date_add(col("__w"), 7).as("__wn"))
    val statuses = uw
      .join(firsts, Seq("__u"))
      .join(prev.withColumn("__had_prev", lit(1L))
          .withColumnRenamed("__wn", "__w").dropDuplicates("__u", "__w"),
        Seq("__u", "__w"), "left")
      .select(col("__w"),
        (col("__w") === col("__w0")).cast("long").as("__new"),
        (col("__had_prev") === 1L).cast("long").as("__ret"),
        (col("__w") =!= col("__w0") && col("__had_prev").isNull)
          .cast("long").as("__res"))
      .groupBy(col("__w"))
      .agg(sum(col("__new")).as("n_new"), sum(coalesce(col("__ret"), lit(0L)))
        .as("n_retained"), sum(col("__res")).as("n_resurrected"))
    val churned = prev
      .join(uw.select(col("__u"), col("__w").as("__wn")), Seq("__u", "__wn"),
        "left_anti")
      .join(uw.select(col("__w").as("__wn")).distinct(), Seq("__wn"), "left_semi")
      .groupBy(col("__wn").as("__w")).agg(count(lit(1)).as("n_churned"))
    statuses.join(churned, Seq("__w"), "left")
      .select(col("__w").as("week"), col("n_new"), col("n_retained"),
        col("n_resurrected"), coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** Top-decile concentration — how unequal each event type's volume is
    * across users: the share of events produced by the top 10% most
    * active users (k = ⌈n_users/10⌉), in HALF_UP basis points. Computed
    * WITHOUT a per-type sort of users: per-user counts collapse onto the
    * (type × count-value) grid, cumulative sums run DESCENDING over that
    * bounded grid, and the threshold row splits exactly — users tied at
    * the threshold count contribute their count value times however many
    * of them fit in k (pure integer arithmetic, deterministic in any
    * engine). A share near 10000 bp is the bot/power-user signature a
    * rate-limit or weighting decision reads.
    * Output: event_type, n_users, n_events, top_users (= k),
    * top_share_bp.
    */
  def topDecileConcentration(events: DataFrame, userCol: String,
                             typeCol: String): DataFrame = {
    val cells = events
      .select(col(typeCol).as("event_type"), col(userCol).as("__u"))
      .where(col("__u").isNotNull)
      .groupBy(col("event_type"), col("__u")).agg(count(lit(1)).as("__c"))
      .groupBy(col("event_type"), col("__c"))
      .agg(count(lit(1)).as("__users"), (col("__c") * count(lit(1))).as("__events"))
    val wDesc = Window.partitionBy(col("event_type")).orderBy(col("__c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT = Window.partitionBy(col("event_type"))
    val g = cells
      .withColumn("__cumU", sum(col("__users")).over(wDesc))
      .withColumn("__cumE", sum(col("__events")).over(wDesc))
      .withColumn("__nU", sum(col("__users")).over(wT))
      .withColumn("__nE", sum(col("__events")).over(wT))
      .withColumn("__k", expr("(__nU + 9) div 10"))
    val thr = g.where(col("__cumU") >= col("__k"))
      .groupBy(col("event_type")).agg(max(col("__c")).as("__v"))
    g.join(thr, Seq("event_type")).where(col("__c") === col("__v"))
      .select(col("event_type"), col("__nU").as("n_users"),
        col("__nE").as("n_events"), col("__k").as("top_users"),
        expr("((__cumE - (__cumU - __k) * __v) * 20000 + __nE) div (2 * __nE)")
          .as("top_share_bp"))
  }

  /** Inter-event gap percentiles — per event type, p50/p90/p99 of the
    * seconds between a user's consecutive events of that type (the
    * cadence signal behind session-timeout and anomaly thresholds).
    * One (user, type)-keyed lag window produces the gaps; the quantiles
    * ride [[graft.operators.Stats.tickQuantiles]]' counting grid, so no
    * per-type sort ever happens — grid cells are bounded by
    * range/tick at any event volume.
    * Output: event_type, n_rows (gaps), p50, p90, p99 (second ticks).
    */
  def interEventGapQuantiles(events: DataFrame, userCol: String,
                             tsCol: String, typeCol: String, tieCol: String,
                             tick: Double = 1.0): DataFrame = {
    val wo = Window.partitionBy(col("__u"), col("__t"))
      .orderBy(col("__us"), col("__tie"))
    val gaps = events.select(col(userCol).as("__u"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(tieCol).as("__tie"), col(typeCol).as("__t"))
      .where(col("__u").isNotNull && col("__us").isNotNull)
      .withColumn("__prev", lag(col("__us"), 1).over(wo))
      .where(col("__prev").isNotNull)
      .select(col("__t").as("event_type"),
        ((col("__us") - col("__prev")).cast("double") / 1e6).as("gap_s"))
    Stats.tickQuantiles(gaps, "event_type", "gap_s", tick)
  }

  /** Event-type affinity matrix — which behaviors co-occur in the same
    * users: per unordered type pair, the distinct-user overlap and its
    * LIFT against independence, `P(a∧b) / (P(a)·P(b))` in HALF_UP basis
    * points. The input collapses to distinct (user, type) FIRST — one
    * row per adoption, so the self-join fan-out per user is bounded by
    * the (small) type dimension squared, never by the user's raw event
    * volume; type totals and the user count ride along as broadcasts.
    * Lift > 10000 bp = types adopted together; ≪ 10000 = substitutes.
    * Output: type_a < type_b, n_both, n_a, n_b, lift_bp.
    */
  /** Last-touch attribution: each `target` conversion is credited to the
    * user's most recent PRECEDING event of any other type within
    * `maxLagSeconds` (strictly before by the (ts, id) total order —
    * micro-precision ties resolve by the id tiebreak, deterministically,
    * the q95 ordering-parity lesson). Conversions with no touch inside
    * the window credit to `"<none>"` and stay in the denominator, so
    * share_bp sums to 10000 (± the HALF_UP remainders).
    *
    * One keyed window pass — no self-join, no per-user history array:
    * the carried (touch type, touch micros) pair rides two frame-bounded
    * `last(..., ignoreNulls)` calls over rows strictly before the
    * current one; both carry expressions are null exactly on target
    * rows, so they always land on the SAME touch row. The only shuffle
    * is the user-keyed exchange the window needs; the share denominator
    * is a one-row broadcast.
    * Output: attr_type, n, share_bp.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, idCol: String, target: String,
                           maxLagSeconds: Long = 86400L): DataFrame = {
    val ev = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__us"),
        col(typeCol).as("__t"), col(idCol).as("__id"))
    val w = Window.partitionBy(col("__u")).orderBy(col("__us"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("__t") =!= lit(target), col("__t"))
    val touchUs = when(col("__t") =!= lit(target), col("__us"))
    val credited = ev
      .withColumn("__at", last(touch, ignoreNulls = true).over(w))
      .withColumn("__aus", last(touchUs, ignoreNulls = true).over(w))
      .where(col("__t") === lit(target))
      .select(
        when(col("__aus").isNotNull &&
             col("__us") - col("__aus") <= lit(maxLagSeconds * 1000000L),
          col("__at")).otherwise(lit("<none>")).as("attr_type"))
      .groupBy(col("attr_type")).agg(count(lit(1)).as("n"))
    val total = credited.agg(sum(col("n")).as("__tot"))
    credited.crossJoin(broadcast(total))
      .select(col("attr_type"), col("n"),
        floor(col("n") * 10000.0 / col("__tot") + 0.5).cast("long").as("share_bp"))
  }

  /** Double-fire audit: consecutive same-user same-type events closer
    * than `withinSeconds` — the client-retry / duplicate-ingestion
    * signature an event pipeline checks before trusting its volume
    * numbers. One (user, type)-keyed lag (the [[interEventGapQuantiles]]
    * exchange), gaps in integer micros, per-type rate in HALF_UP bp over
    * the type's GAP count (an event with no predecessor can't
    * double-fire, so it isn't in the denominator).
    * Output: event_type, n_gaps, n_dups, dup_rate_bp.
    */
  def doubleFire(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, idCol: String,
                 withinSeconds: Long = 1L): DataFrame = {
    val ev = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__us"),
        col(typeCol).as("__t"), col(idCol).as("__id"))
    val w = Window.partitionBy(col("__u"), col("__t"))
      .orderBy(col("__us"), col("__id"))
    ev.withColumn("__prev", lag(col("__us"), 1).over(w))
      .where(col("__prev").isNotNull)
      .select(col("__t").as("event_type"),
        (col("__us") - col("__prev") <= lit(withinSeconds * 1000000L))
          .cast("long").as("__dup"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__dup")).as("n_dups"))
      .select(col("event_type"), col("n_gaps"), col("n_dups"),
        floor(col("n_dups") * 10000.0 / col("n_gaps") + 0.5).cast("long")
          .as("dup_rate_bp"))
  }

  /** Watermark-lateness audit: how far behind the event-time
    * high-watermark each event ARRIVED, per type — the distribution that
    * sizes a streaming watermark delay (the per-type p99 here IS the
    * `withWatermark` value that would have kept 99% of that type's
    * events). Arrival order is `idCol`, the ingest sequence;
    * lateness(e) = max event-time among events with id ≤ e.id, minus
    * e's event-time (≥ 0, floored to whole seconds).
    *
    * The running max over arrival order is a GLOBAL prefix scan — the
    * one shape that naively costs a single-partition window over the
    * corpus. It runs two-phase instead (the [[TextAnalysis.packDocs]] /
    * orderManifest prefix shape, max monoid): `buckets` contiguous id
    * ranges (width from one min/max aggregate — a bounded driver
    * scalar), per-bucket inclusive running max (each partition scans
    * ~n/buckets rows), and a bucket-level EXCLUSIVE prefix max cumulated
    * over the ≤`buckets`-row bucket dim; the global running max is their
    * `greatest`. Quantiles then ride the (type × second) counting grid —
    * no global sort, no corpus-wide window anywhere.
    * Output: event_type, n_rows, p50, p95, p99 (whole seconds).
    */
  def watermarkLateness(events: DataFrame, tsCol: String, idCol: String,
                        typeCol: String, buckets: Int = 256,
                        tieCol: Option[String] = None): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    val ev = events
      .where(col(tsCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("__id"), unix_micros(col(tsCol)).as("__us"),
        col(typeCol).as("__t"),
        tieCol.map(col).getOrElse(lit(0L)).as("__tie"))
    val bounds = ev.agg(min(col("__id")).as("lo"), max(col("__id")).as("hi"))
      .collect()(0)
    if (bounds.isNullAt(0))
      return ev.select(col("__t").as("event_type"), lit(0L).as("n_rows"),
        lit(0.0).as("p50"), lit(0.0).as("p95"), lit(0.0).as("p99")).limit(0)
    val width = math.max(1L, (bounds.getLong(1) - bounds.getLong(0)) / buckets + 1)
    val bucketed = ev.withColumn("__b",
      ((col("__id") - lit(bounds.getLong(0))) / lit(width)).cast("long"))
    // the tie column makes the arrival total order deterministic even if
    // a hash-derived id ever collides (the q154 fixture's 48-bit keys)
    val wIn = Window.partitionBy(col("__b")).orderBy(col("__id"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = bucketed.groupBy(col("__b")).agg(max(col("__us")).as("__bm"))
      .withColumn("__pre", max(col("__bm")).over(wOff))
      .select(col("__b"), col("__pre"))
    val lateness = bucketed
      .withColumn("__rin", max(col("__us")).over(wIn))
      .join(broadcast(prefixes), Seq("__b"))
      .select(col("__t"),
        expr("(greatest(__rin, coalesce(__pre, __rin)) - __us) DIV 1000000")
          .as("__v"))
    val wCum = Window.partitionBy(col("__t")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(col("__t"))
    def pick(p: Int): Column =
      min(when(col("__cum") * 100 >= col("__n") * p, col("__v")))
        .cast("double").as(s"p$p")
    lateness.groupBy(col("__t"), col("__v")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wKey))
      .groupBy(col("__t"))
      .agg(max(col("__n")).as("n_rows"), pick(50), pick(95), pick(99))
      .select(col("__t").as("event_type"), col("n_rows"),
        col("p50"), col("p95"), col("p99"))
  }

  /** Cohort retention triangle: users bucketed by the WEEK they first
    * appeared (Monday-anchored `date_trunc`, identical in both engines),
    * then counted per (cohort_week, week_offset) with the share of the
    * cohort still active — the classic product-analytics triangle that
    * [[retention]]'s per-day offsets feed, pivoted to a bounded matrix.
    *
    * Same relational shape as [[retention]]: activity deduped to
    * (user, day), one hash agg for each user's first day, a user-keyed
    * join back, and the triangle agg — two exchanges end-to-end, nothing
    * per-user ever materialized. The cohort size needed for the bp share
    * is the triangle's own offset-0 cell (every user is active in their
    * first week by construction), read back with a window over the
    * bounded (weeks × offsets) output, never a third pass over events.
    * retention_bp is floor-exact integer arithmetic.
    * Output: cohort_week (date string), week_offset, n_active,
    * cohort_size, retention_bp.
    */
  def cohortTriangle(events: DataFrame, userCol: String,
                     tsCol: String): DataFrame = {
    val active = events.select(col(userCol).as("__u"),
        to_date(col(tsCol)).as("__d"))
      .where(col("__u").isNotNull && col("__d").isNotNull)
      .distinct()
    val cohort = active.groupBy("__u")
      .agg(date_trunc("week", min(col("__d"))).cast("date").as("__cw"))
    val tri = active.join(cohort, Seq("__u"))
      .groupBy(col("__cw"),
        expr("CAST(datediff(__d, __cw) div 7 AS INT)").as("week_offset"))
      .agg(countDistinct(col("__u")).as("n_active"))
    val wCohort = Window.partitionBy(col("__cw"))
    tri
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(wCohort))
      .select(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        expr("CAST((n_active * 10000) DIV cohort_size AS BIGINT)")
          .as("retention_bp"))
  }

  def eventAffinity(events: DataFrame, userCol: String, typeCol: String): DataFrame = {
    val ut = events.select(col(userCol).as("__u"), col(typeCol).as("__t"))
      .where(col("__u").isNotNull).distinct()
    val totals = ut.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val nu = ut.agg(countDistinct(col("__u")).as("__nu"))
    ut.as("a").join(ut.as("b"),
        col("a.__u") === col("b.__u") && col("a.__t") < col("b.__t"))
      .groupBy(col("a.__t").as("type_a"), col("b.__t").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(totals.select(col("__t").as("type_a"), col("__n").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(totals.select(col("__t").as("type_b"), col("__n").as("n_b"))),
        Seq("type_b"))
      .crossJoin(broadcast(nu))
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"), col("n_b"),
        floor(col("n_both").cast("double") * col("__nu") / col("n_a") / col("n_b")
          * 10000 + 0.5).cast("long").as("lift_bp"))
  }

  /** Discrete survival curve with right-censoring — retention's honest
    * sibling: per day-offset k since a user's first activity, how many
    * users were still at risk, how many churned exactly at k (last
    * activity on day first+k), and the share surviving past k. The
    * censoring rule is what [[retention]] doesn't model: a user whose
    * observation window ends at or before offset k (first activity too
    * close to the corpus end) is EXCLUDED at k — their silence after k
    * is unobservable, not churn.
    *
    * All-integer estimator: eligible(k) = window > k; at-risk = eligible
    * with activity span ≥ k; churned = span == k exactly; survival =
    * eligible with span > k, over eligible — every rate an integer
    * bp division over exact counts, no cumulative float product (the
    * Kaplan-Meier chain) anywhere. Users collapse to the (span, window)
    * grid — bounded by the observation span squared, NOT the user count —
    * before the offset explode, so the fan-out is grid×(maxOffset+1)
    * regardless of corpus size.
    * Output: day_offset, n_at_risk, n_churned, hazard_bp, survival_bp.
    */
  def survivalCurve(events: DataFrame, maxOffset: Int = 14): DataFrame = {
    val ev = events
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
    val obsEnd = ev.agg(max(col("d")).as("obs_end"))
    val grid = users.crossJoin(broadcast(obsEnd))
      .select(datediff(col("l"), col("f")).as("act"),
        datediff(col("obs_end"), col("f")).as("w"))
      .groupBy(col("act"), col("w")).agg(count(lit(1)).as("m"))
    grid
      .select(col("act"), col("w"), col("m"),
        explode(sequence(lit(0), lit(maxOffset))).as("k"))
      .where(col("w") > col("k"))
      .groupBy(col("k"))
      .agg(
        sum(when(col("act") >= col("k"), col("m")).otherwise(0L)).as("n_at_risk"),
        sum(when(col("act") === col("k"), col("m")).otherwise(0L)).as("n_churned"),
        sum(col("m")).as("__elig"),
        sum(when(col("act") > col("k"), col("m")).otherwise(0L)).as("__surv"))
      .select(col("k").cast("long").as("day_offset"),
        col("n_at_risk"), col("n_churned"),
        expr("CAST(CASE WHEN n_at_risk = 0 THEN 0 ELSE (n_churned * 10000) DIV n_at_risk END AS BIGINT)")
          .as("hazard_bp"),
        expr("CAST(CASE WHEN __elig = 0 THEN 0 ELSE (__surv * 10000) DIV __elig END AS BIGINT)")
          .as("survival_bp"))
      .orderBy(col("day_offset"))
  }

  /** Peak concurrent sessions per day — the capacity-planning number: of
    * all gap-cut sessions (the q20 30-minute rule), how many were live
    * at the busiest instant of each day. Classic sweep line: every
    * session contributes +1 at its start and −1 after its end, the
    * running sum is the live count, the max is the peak.
    *
    * Determinism pins: sessions clip to day segments (a session crossing
    * midnight is live in both days), boundary order within a day is
    * (µs, +1-before-−1) so a session starting at the very instant
    * another ends counts as concurrent — ties beyond that don't matter,
    * the prefix-sum max is invariant within an equal-(µs, delta) run.
    * The sweep window partitions BY DAY; at corpus scale a single day's
    * boundary stream is still large, and the two-phase prefix sum
    * [[TextAnalysis.packDocs]] documents is the drop-in replacement —
    * the per-day partition is the declared simulation boundary here.
    * Output: d, n_sessions (starting or continuing that day), peak.
    */
  def peakConcurrency(events: DataFrame,
                      gapMinutes: Int = 30): DataFrame = {
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("__us"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    val sess = events
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(wo))
      .withColumn("__new",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(wo))
      .groupBy(col("user_id"), col("__sid"))
      .agg(min(col("__us")).as("__s0"), max(col("__us")).as("__s1"))
    val seg = sess
      .withColumn("d", explode(sequence(
        to_date(timestamp_micros(col("__s0"))),
        to_date(timestamp_micros(col("__s1"))))))
      .withColumn("__day0", unix_micros(col("d").cast("timestamp")))
      .select(col("d"),
        greatest(col("__s0"), col("__day0")).as("__a"),
        least(col("__s1"), col("__day0") + (86400000000L - 1L)).as("__b"))
    val bounds = seg.select(col("d"), col("__a").as("__us"), lit(1L).as("__delta"))
      .unionByName(seg.select(col("d"), col("__b").as("__us"),
        lit(-1L).as("__delta")))
    val wSweep = org.apache.spark.sql.expressions.Window
      .partitionBy(col("d")).orderBy(col("__us").asc, col("__delta").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    bounds
      .withColumn("__c", sum(col("__delta")).over(wSweep))
      .groupBy(col("d"))
      .agg(((count(lit(1)) / 2).cast("long")).as("n_sessions"),
        max(col("__c")).as("peak"))
      .orderBy(col("d"))
  }

  /** Linear (multi-touch) attribution — the even-split complement of
    * [[lastTouchAttribution]]/[[firstTouchCensus]]: every non-target
    * event strictly between two conversions shares the NEXT conversion's
    * credit equally. Credit is integer micro-units — `1e6 DIV n` per
    * touch, floor on non-negatives so both engines truncate identically;
    * the ≤(n−1) dropped remainder micros are the declared cost of exact
    * cross-engine arithmetic. Conversions with no preceding touch land
    * in the `<none>` bucket at full credit (emitted even when zero, so
    * the row set is schema-stable).
    *
    * One keyed window assigns every event its running conversion count
    * on the pinned (µs, id) order: a conversion's 1-based index is that
    * count, a touch attaches to index+1 (the conversion AFTER it).
    * Everything downstream is hash aggregation + one equi-join on
    * (user, index) — trailing touches after a user's last conversion
    * drop out of the inner join, never skewing anything.
    * Output: attr_type, n_touches, credit_micro.
    */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, idCol: String,
                        target: String): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__us"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), unix_micros(col(tsCol)).as("__us"),
        col(typeCol).as("__t"), col(idCol).as("__id"))
      .withColumn("__cb",
        sum(when(col("__t") === lit(target), 1L).otherwise(0L)).over(w))
    val conv = ev.where(col("__t") === lit(target))
      .select(col("__u"), col("__cb").as("__cidx"))
    val touches = ev.where(col("__t") =!= lit(target))
      .select(col("__u"), (col("__cb") + 1L).as("__cidx"), col("__t"))
      .join(conv, Seq("__u", "__cidx"))
    val groupN = touches.groupBy(col("__u"), col("__cidx"))
      .agg(count(lit(1)).as("__n"))
    val credited = touches.join(groupN, Seq("__u", "__cidx"))
      .groupBy(col("__t").as("attr_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(expr("CAST(1000000 AS BIGINT) DIV __n")).as("credit_micro"))
    val bare = conv.join(groupN, Seq("__u", "__cidx"), "left_anti")
      .agg(count(lit(1)).as("n_touches"))
      .select(lit("<none>").as("attr_type"), col("n_touches"),
        (col("n_touches") * 1000000L).as("credit_micro"))
    credited.unionByName(bare).orderBy(col("attr_type"))
  }

  /** DAU/MAU stickiness — the engagement-health ratio every consumer
    * dashboard leads with: per calendar month, monthly actives, the sum
    * of daily-active counts, active days, and stickiness = avg DAU / MAU
    * in HALF_UP basis points (computed from the three integer aggregates
    * in one expression — no intermediate float mean). The corpus
    * collapses to DISTINCT (day, user) presence first, so one exchange
    * carries at most one row per user-day regardless of event volume,
    * and the month rollup is a bounded-dim hash agg over that grid.
    * Output: month, mau, sum_dau, n_days, stickiness_bp.
    */
  def stickiness(events: DataFrame, userCol: String = "user_id",
                 tsCol: String = "ts"): DataFrame = {
    events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(date_trunc("month", col(tsCol)).as("month"),
        date_trunc("day", col(tsCol)).as("__d"), col(userCol).as("__u"))
      .distinct()
      .groupBy(col("month"))
      .agg(countDistinct(col("__u")).as("mau"),
        count(lit(1)).as("sum_dau"),
        countDistinct(col("__d")).as("n_days"))
      .select(col("month"), col("mau"), col("sum_dau"), col("n_days"),
        floor(col("sum_dau") * 10000.0 / (col("n_days") * col("mau")) + 0.5)
          .cast("long").as("stickiness_bp"))
      .orderBy(col("month"))
  }
}
