package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source router + scan operators beyond CSV (reference §2.1 S9-S12).
  *
  *  - S12: env/config-driven dispatch (`DATA_SOURCE=csv|db|parquet`,
  *    `binance_analysis.py:198-206`)
  *  - S9/S10: the candles DB scan with its pushed-down predicates — on JDBC
  *    the `tf`/`symbol` filters and column list push into the remote query
  *    via Catalyst's JDBC pushdown; on parquet they push into the scan
  *  - S11: single-object JSON artifact reads (multiLine).
  */
object Readers {

  sealed trait Source
  case class CsvGlob(glob: String) extends Source
  case class ParquetTable(path: String) extends Source
  case class Jdbc(url: String, table: String, props: java.util.Properties) extends Source

  /** S12 router: pick the candles source from config. */
  def candlesSource(conf: Map[String, String]): Source =
    conf.getOrElse("data_source", "csv") match {
      case "db" => Jdbc(conf("jdbc_url"), conf.getOrElse("jdbc_table", "candles"),
        new java.util.Properties())
      case "parquet" => ParquetTable(conf("parquet_path"))
      case _ => CsvGlob(conf.getOrElse("csv_glob", "data/klines_*.csv"))
    }

  /** S9: candles scan filtered to (tf, symbols), ordered — the filters sit
    * directly above the scan so Catalyst pushes them down (JDBC: into the
    * remote SQL; parquet: into row-group pruning). */
  def loadCandles(spark: SparkSession, source: Source, tf: String,
                  symbols: Seq[String]): DataFrame = {
    val base = source match {
      case CsvGlob(g) => CsvReaders.readKlinesCsv(spark, g)
      case ParquetTable(p) => spark.read.parquet(p)
      case Jdbc(url, table, props) => spark.read.jdbc(url, table, props)
    }
    base.where(col("tf") === tf && col("symbol").isin(symbols: _*))
      .orderBy(col("symbol"), col("open_time"))
  }

  /** S10: distinct symbols for a timeframe. */
  def distinctSymbols(candles: DataFrame, tf: String): DataFrame =
    candles.where(col("tf") === tf).select(col("symbol")).distinct()
      .orderBy(col("symbol"))

  /** S11: single-object JSON artifact (pretty-printed file ⇒ multiLine). */
  def readJsonArtifact(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
}
