package graft

import org.apache.spark.sql.SparkSession
import graft.operators.UpsertWriter
import graft.sources.CsvReaders

/** ETL glob dispatcher — the reference's `load_all.py:42-79`: route every
  * CSV under the data dir by filename substring to the right (reader,
  * table, primary key) triple, then idempotently upsert. Unknown files are
  * skipped with a note, exactly like the reference.
  *
  * The per-file loop is a driver-side dispatch over file NAMES only; each
  * file's CONTENTS load through the distributed CSV readers and the keyed
  * upsert (one shuffle per batch on the primary key). Same-table files
  * could be globbed together; per-file loading preserves the reference's
  * per-file idempotency (re-running any subset of files is a no-op).
  */
object EtlLoader {

  /** (substring, table, primary key, reader) routing table — keys mirror
    * db/schema.sql via load_all.py. */
  private def routes(spark: SparkSession)
      : Seq[(String, String, Seq[String], String => org.apache.spark.sql.DataFrame)] = Seq(
    ("kline", "candles", Seq("symbol", "tf", "open_time"),
      p => CsvReaders.readKlinesCsv(spark, p)),
    ("trade", "trades", Seq("symbol", "trade_id"),
      p => CsvReaders.readTradesCsv(spark, p)),
    ("orderbook", "order_books", Seq("symbol", "side", "price", "update_id"),
      p => CsvReaders.readOrderbookCsv(spark, p)))

  /** Loads every `*.csv` under `dataDir` into `warehouseDir/<table>`;
    * returns (file, table|"skipped") in deterministic name order. */
  def loadAll(spark: SparkSession, dataDir: String,
              warehouseDir: String): Seq[(String, String)] = {
    val files = Option(new java.io.File(dataDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.toLowerCase.endsWith(".csv") ||
        (f.isDirectory && f.getName.toLowerCase.contains(".csv")))
      .sortBy(_.getName)
    files.toSeq.map { f =>
      val name = f.getName.toLowerCase
      routes(spark).find { case (sub, _, _, _) => name.contains(sub) } match {
        case Some((_, table, keys, read)) =>
          val df = read(if (f.isDirectory) s"${f.getPath}/*.csv" else f.getPath)
          UpsertWriter.upsert(spark, df, s"$warehouseDir/$table", keys)
          f.getName -> table
        case None => f.getName -> "skipped"
      }
    }
  }
}
