package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pre-filter: the shuffle-reduction primitive for
  * large fact ⋈ selective-dim joins at 100 TB.
  *
  * A selective build side (filtered dim keys) is reduced to a bounded
  * m-slot / k-hash bit set; the fact side probes the BROADCAST bit set
  * before the real join, so fact rows whose key cannot possibly match
  * never enter the join exchange. Spark's own runtime bloom rewrite
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does this
  * opportunistically with a non-portable sketch; this operator is the
  * DETERMINISTIC variant — slots are salted-md5 arithmetic, so the
  * filter's exact keep/false-positive behavior is replayable in any
  * engine and the false-positive rate can be AUDITED against the exact
  * semi-join before a pipeline commits to (m, k).
  *
  * The bit set materializes as ≤ m distinct slot ids (a broadcast
  * relation, not a bitmap object — same pruning power, plan-visible),
  * the probe explodes each key's k plan-time-constant slots against the
  * broadcast, and a key passes iff ALL k match (`count = k` after the
  * inner join — duplicate slots from hash collisions within one key
  * still match iff present). Probe keys are distinct-first, so the
  * explode is bounded by |keys|·k, never |rows|·k.
  */
object Bloom {

  /** slot_i(key) = md5("i:key") low-32 mod m — portable integer hashing,
    * one independent salt per hash function. */
  def slotExprs(key: Column, m: Int, k: Int): Seq[Column] =
    (0 until k).map { i =>
      pmod(graft.functions.md5_prefix_long(
        concat(lit(s"$i:"), key.cast("string")), 8), lit(m.toLong))
    }

  /** The bounded build-side bit set: distinct occupied slot ids. */
  def buildBits(build: DataFrame, keyCol: String, m: Int, k: Int): DataFrame =
    build.select(explode(array(slotExprs(col(keyCol), m, k): _*)).as("slot"))
      .distinct()

  /** One-row audit of the (m, k) design point against the exact
    * semi-join truth: how many distinct probe keys pass the filter, how
    * many truly match, and the false-positive rate in floor-bp — plus
    * the slot occupancy the FP rate derives from. Everything after the
    * two distinct aggs is broadcast-sized.
    * Output: n_build_keys, n_slots_set, n_probe_keys, n_pass, n_true,
    * n_false_pos, fp_bp, pass_bp.
    */
  def prefilterAudit(build: DataFrame, buildKey: String,
                     probe: DataFrame, probeKey: String,
                     m: Int = 65536, k: Int = 3): DataFrame = {
    require(m > 0 && k > 0, "bloom needs m > 0 slots and k > 0 hashes")
    val bKeys = build.select(col(buildKey).as("__k"))
      .where(col("__k").isNotNull).distinct()
    val bits = buildBits(bKeys, "__k", m, k)
    val pKeys = probe.select(col(probeKey).as("__k"))
      .where(col("__k").isNotNull).distinct()
    val passed = pKeys
      .select(col("__k"), explode(array(slotExprs(col("__k"), m, k): _*)).as("slot"))
      .join(broadcast(bits), Seq("slot"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__hits"))
      .where(col("__hits") === k)
      .select(col("__k"))
    val trueMatch = pKeys.join(bKeys, Seq("__k"), "left_semi")
    val counts = pKeys.agg(count(lit(1)).as("n_probe_keys"))
      .crossJoin(broadcast(bKeys.agg(count(lit(1)).as("n_build_keys"))))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_slots_set"))))
      .crossJoin(broadcast(passed.agg(count(lit(1)).as("n_pass"))))
      .crossJoin(broadcast(trueMatch.agg(count(lit(1)).as("n_true"))))
    counts.select(
      col("n_build_keys"), col("n_slots_set"), col("n_probe_keys"),
      col("n_pass"), col("n_true"),
      (col("n_pass") - col("n_true")).as("n_false_pos"),
      expr("CAST(((n_pass - n_true) * 10000) DIV n_probe_keys AS BIGINT)")
        .as("fp_bp"),
      expr("CAST((n_pass * 10000) DIV n_probe_keys AS BIGINT)").as("pass_bp"))
  }
}
