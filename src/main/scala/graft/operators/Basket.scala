package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: which items appear together in
  * the same basket (order, session, document …) more often than any
  * recommender or bundling decision can ignore.
  */
object Basket {

  /** Top-k frequent item PAIRS with support — the first Apriori level,
    * which in practice answers most bundling questions without the full
    * lattice. Items dedupe to (basket, item) first, the pair join is an
    * equi-join ON THE BASKET KEY (pair volume Σ size² over baskets —
    * bounded by the largest basket, never by a hot item: a ubiquitous
    * item costs one row per basket here, where an item-keyed join would
    * square it), support is against all baskets, and the top-k is a
    * TakeOrdered heap with the (n desc, pair asc) total tie order.
    * Output: rank, item_a, item_b (a < b), n_baskets, support_bp.
    */
  def frequentPairs(items: DataFrame, basketCol: String, itemCol: String,
                    k: Int = 20): DataFrame = {
    val b = items.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
    val nB = b.agg(countDistinct(col("__b")).as("__n"))
    val ord = Seq(col("n_baskets").desc, col("item_a").asc, col("item_b").asc)
    b.as("x").join(b.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .crossJoin(broadcast(nB))
      .withColumn("support_bp",
        expr("CAST((n_baskets * 10000) DIV __n AS BIGINT)"))
      .orderBy(ord: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .select(col("rank"), col("item_a"), col("item_b"), col("n_baskets"),
        col("support_bp"))
  }
}
