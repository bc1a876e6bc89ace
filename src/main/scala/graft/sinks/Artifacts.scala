package graft.sinks

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Artifact sinks (reference §2.2 K1-K3).
  *
  *  - K1/K2: CSV with header, fixed column order, timestamps rendered as
  *    `yyyy-MM-dd HH:mm:ss` strings (`prices_collector.py:27-45`). The
  *    reference's single-file contract maps to `coalesce(1)` — correct for
  *    small summary artifacts; large datasets should keep natural
  *    parallelism and drop the flag.
  *  - K3: tiny single-object JSON summaries — these are scalar REPORTS, not
  *    datasets: collect the one row driver-side and write plain JSON.
  */
object Artifacts {

  /** CSV artifact write; timestamp columns rendered ISO-seconds like the
    * reference collectors. */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val rendered = df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType.typeName == "timestamp")
        d.withColumn(f.name, date_format(col(f.name), "yyyy-MM-dd HH:mm:ss"))
      else d
    }
    val out = if (singleFile) rendered.coalesce(1) else rendered
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** JSON summary: the DataFrame must be a one-row report; written as one
    * pretty JSON object (reference `binance_analysis.py:71-72`). */
  def writeJsonSummary(df: DataFrame, path: String): Unit = {
    val row = df.toJSON.head()
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    Files.writeString(Paths.get(path), row)
  }

  /** [[writeJsonSummary]] with a BOUNDED row list spliced in as an array
    * field — the reference's `summary_large_trades.json` shape (scalar
    * report + `top_rows`, `binance_analysis.py:417-440`). `rows` must be a
    * top-k/report-sized frame: it is collected driver-side in its frame
    * order (a LIMIT-ed sorted frame collects sorted). `toJSON` omits null
    * fields per row, like the scalars in [[writeJsonSummary]]. */
  def writeJsonSummaryWithRows(summary: DataFrame, rows: DataFrame,
                               rowsField: String, path: String): Unit = {
    val head = summary.toJSON.head()
    val items = rows.toJSON.collect()
    val base = if (head == "{}") "{" else head.dropRight(1) + ","
    val json = base + s""""$rowsField":[${items.mkString(",")}]}"""
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    Files.writeString(Paths.get(path), json)
  }
}
