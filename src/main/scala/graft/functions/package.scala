package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{VectorFunctions => Shim}

/** Public Column API for graft's native Catalyst expressions. The
  * implementations live under org.apache.spark.sql.graftshim because
  * Spark's expression SPI types (AbstractDataType, the Column constructor)
  * are private[sql].
  */
package object functions {
  object VectorFunctions {
    def dot_product(a: Column, b: Column): Column = Shim.dot_product(a, b)
    def l2_norm(a: Column): Column = Shim.l2_norm(a)
  }

  /** Wilder ATR recursion as a native aggregate:
    * `wilder_atr(struct(wkey, high, low, close))` →
    * array<struct(wkey, tr, atr)> sorted by wkey.
    */
  def wilder_atr(c: Column): Column =
    org.apache.spark.sql.graftshim.WilderAtrAgg.wilder_atr(c)

  /** Winnowing fingerprints (md5-portable k-gram hashes, distinct sorted
    * window minima) as one native codegen expression → array<long>.
    */
  def winnow_fingerprints(text: Column, k: Int, w: Int,
                          prodHash: Boolean = false): Column =
    org.apache.spark.sql.graftshim.WinnowFunctions
      .winnow_fingerprints(text, k, w, prodHash)
}
