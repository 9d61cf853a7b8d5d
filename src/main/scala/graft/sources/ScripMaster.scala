package graft.sources

import graft.model.Instrument
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scrip-master CSV → instrument dimension.
  *
  * Reference: /root/reference/fetch_tokens.py:100-211 downloads a 78-column
  * exchange scrip-master CSV (header at
  * /root/reference/data/scrip_master_nse_cm.csv:1) and resolves each
  * configured symbol to its token by sniffing likely column names, keeping
  * the first matching row per symbol (fetch_tokens.py:202-209).
  *
  * Engine version: a declared-schema-column CSV scan (header=true, no
  * inference in the selected columns' types — everything read as string and
  * cast explicitly), segment filter, and deterministic first-match
  * (`row_number() = 1` ordered by token) — no driver-side loops, so the same
  * code handles a 78-column × 10⁷-row master on a cluster.
  */
object ScripMaster {

  /** Columns of interest in the exchange master: pSymbol = numeric token,
    * pSymbolName/pTrdSymbol = symbol spellings, pExchSeg = segment.
    */
  def load(spark: SparkSession, path: String, segment: String = "nse_cm"): DataFrame =
    spark.read
      .option("header", "true")
      .csv(path)
      .where(col("pExchSeg") === segment)
      .select(
        col("pSymbol").cast("string").as("token"),
        coalesce(col("pSymbolName"), col("pTrdSymbol")).cast("string").as("symbol"),
        col("pExchSeg").cast("string").as("segment"))
      .where(col("token").isNotNull && col("symbol").isNotNull)

  /** First row per symbol wins (fetch_tokens.py:202-209), deterministically:
    * lowest token. Restricts to `universe` when given (the reference's 178
    * configured instruments).
    */
  def instruments(master: DataFrame, universe: Option[Seq[String]] = None): Dataset[Instrument] = {
    import master.sparkSession.implicits._
    val scoped = universe match {
      case Some(syms) => master.where(col("symbol").isin(syms: _*))
      case None => master
    }
    val w = Window.partitionBy(col("symbol")).orderBy(col("token"))
    scoped
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("symbol"), col("token"), col("segment"))
      .as[Instrument]
  }
}
