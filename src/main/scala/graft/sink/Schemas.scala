package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Declared sink schemas + validation — the engine's analog of the
  * reference's SchemaManager (schema_manager.py:20-43 sheet headers,
  * :104-135 header validation, :34-43 metadata rows).
  *
  * Schemas are CONSTANTS, never inferred (SURVEY §1.3): every sink table
  * has a declared `StructType`, live frames are checked against it before
  * writing, and a drifted frame fails fast with the exact column-level
  * differences instead of appending mixed-schema files.
  */
object Schemas {

  /** market_data: the 13-column all-string edge shape ([[EdgeFormat.Header]];
    * schema_manager.py:20-24 plus the gap_filled column its row writer
    * actually emits).
    */
  val MarketData: StructType =
    StructType(EdgeFormat.Header.map(StructField(_, StringType)))

  /** atr_state (schema_manager.py:26-28): one row per ticker, overwritten
    * per cycle. */
  val AtrState: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("last_close", DoubleType),
    StructField("last_atr", DoubleType),
    StructField("last_timestamp", StringType),
    StructField("updated_at", StringType)))

  /** system_log (schema_manager.py:30-32): append-only event log. */
  val SystemLog: StructType = StructType(
    Seq("timestamp", "level", "event", "window", "details")
      .map(StructField(_, StringType)))

  /** metadata (schema_manager.py:34-43): 4-row key/value config table. */
  val Metadata: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))

  /** The reference's 4 metadata rows, with tickers_count parameterized by
    * the actual universe instead of the hard-coded 178. */
  def metadataRows(tickersCount: Int): Seq[(String, String)] = Seq(
    "schema_version" -> "1.0",
    "atr_period" -> graft.operators.Atr.Period.toString,
    "timezone" -> "IST",
    "tickers_count" -> tickersCount.toString)

  /** Column-level differences between a live schema and a declared one:
    * order-sensitive on names (the reference compares the full header row),
    * type-sensitive, nullability/metadata-insensitive. Empty = valid.
    */
  def mismatches(actual: StructType, expected: StructType): Seq[String] = {
    val order =
      if (actual.fields.map(_.name).toSeq == expected.fields.map(_.name).toSeq) Nil
      else {
        val missing = expected.fieldNames.diff(actual.fieldNames).toSeq
        val extra = actual.fieldNames.diff(expected.fieldNames).toSeq
        val reorder =
          if (missing.isEmpty && extra.isEmpty)
            Seq(s"column order ${actual.fieldNames.mkString(",")} != expected ${expected.fieldNames.mkString(",")}")
          else Nil
        missing.map(c => s"missing column $c") ++ extra.map(c => s"unexpected column $c") ++ reorder
      }
    val typeDiffs = expected.fields.flatMap { ef =>
      actual.fields.find(_.name == ef.name).collect {
        case af if af.dataType != ef.dataType =>
          s"column ${ef.name}: ${af.dataType.simpleString} != expected ${ef.dataType.simpleString}"
      }
    }.toSeq
    order ++ typeDiffs
  }

  /** Assert a frame matches a declared sink schema; throws with every
    * difference listed (the validate_schema analog, but failing the write
    * instead of logging and proceeding).
    */
  def validate(df: DataFrame, expected: StructType, table: String): Unit = {
    val diffs = mismatches(df.schema, expected)
    require(diffs.isEmpty,
      s"schema mismatch for $table: ${diffs.mkString("; ")}")
  }

  /** Write the metadata table once (initialize_if_empty semantics): a
    * no-op when the directory already exists. */
  def initMetadata(spark: SparkSession, dir: String, tickersCount: Int): Unit = {
    import spark.implicits._
    val exists =
      try { spark.read.parquet(dir).head(1); true }
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (!exists) {
      val df = metadataRows(tickersCount).toDF("key", "value")
      validate(df, Metadata, "metadata")
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)
    }
  }
}
