package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TimeOps

/** Permissive CSV ingestion (reference §2.1 S7/S8, §1.3).
  *
  * Reference behaviors reproduced:
  *  - dual-format timestamp sniffing — epoch-ms ints OR ISO strings in the
  *    same column (`binance_analysis.py:108-119`, `load_postgres.py:29-36`)
  *  - permissive numeric coercion — bad cells become null, then required
  *    columns are na-dropped (`load_postgres.py:49`)
  *  - column aliasing — e.g. the trades count arriving as any of
  *    trades|num_trades|trade_count|count (`load_postgres.py:39-49`)
  *  - symbol/timeframe recovered from the FILENAME when absent as columns
  *    (`binance_analysis.py:75-90`) — via `input_file_name()`, so the
  *    recovery stays distributed and works across a multi-file glob
  *  - multi-file union is a single multi-path scan, not a driver loop
  *    (`binance_analysis.py:99-145`).
  */
object CsvReaders {

  /** Rename the first alias present in `df` to `target`; if none present,
    * add `target` as `default` (with the reference's warning semantics left
    * to the caller). */
  def resolveAlias(df: DataFrame, target: String, aliases: Seq[String],
                   default: Option[Column] = None): DataFrame = {
    val present = aliases.find(df.columns.contains)
    present match {
      case Some(a) if a == target => df
      case Some(a) => df.withColumnRenamed(a, target)
      case None => default match {
        case Some(c) => df.withColumn(target, c)
        case None => df
      }
    }
  }

  /** Klines CSV glob → normalized candles frame. Columns: symbol, tf,
    * open_time (sniffed), open/high/low/close/volume (coerced double),
    * num_trades (aliased, default 0).
    *
    * Files may have HETEROGENEOUS headers (the reference reads per-file and
    * concats by name, `binance_analysis.py:99-145`). Headers are sampled
    * driver-side (first line per file — metadata-sized reads); a
    * UNIFORM-header fleet collapses into ONE multi-path scan, so the
    * Catalyst plan stays O(1) in file count (the common 10k+-collector-file
    * case; per-row `input_file_name()` still recovers symbol/tf). Only a
    * genuinely mixed fleet falls back to per-header scans reduced with
    * `unionByName` — and then one scan per DISTINCT header, not per file. */
  def readKlinesCsv(spark: SparkSession, pathGlob: String): DataFrame = {
    val paths = globPaths(spark, pathGlob)
    require(paths.nonEmpty, s"no files match $pathGlob")
    val byHeader = headerLines(spark, paths).groupMap(_._2)(_._1).values.toSeq
      .sortBy(_.head) // deterministic union order
    val frames = byHeader.map(ps => normalizeKlines(
      spark.read.option("header", "true").csv(ps: _*)))
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
      .na.drop(Seq("symbol", "open_time", "close"))
      .select("symbol", "tf", "open_time", "open", "high", "low", "close",
        "volume", "num_trades")
  }

  /** (path, header) for every path — header reads run on a bounded thread
    * pool (each is an independent metadata-sized round-trip; serial opens
    * would add minutes of driver latency on a 10k-file object-store fleet). */
  private def headerLines(spark: SparkSession,
                          paths: Seq[String]): Seq[(String, String)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, math.max(1, paths.length)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futs = paths.map(p => scala.concurrent.Future(p -> headerLine(conf, p)))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(10, "min"))
    } finally pool.shutdown()
  }

  /** First line of a file — the CSV header — read driver-side without
    * scanning the body (bounded read through the Hadoop FS). A DIRECTORY
    * path (a Spark-written `.csv` artifact of part files) resolves to its
    * first contained data file, matching what the multi-path scan reads. */
  private def headerLine(conf: org.apache.hadoop.conf.Configuration,
                         path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val target =
      if (!fs.getFileStatus(p).isDirectory) Some(p)
      else fs.listStatus(p).filter(s => s.isFile && {
          val n = s.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }).map(_.getPath).sortBy(_.getName).headOption
    target.fold("") { t =>
      val in = fs.open(t)
      try {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
        Option(r.readLine()).getOrElse("")
      } finally in.close()
    }
  }

  private def globPaths(spark: SparkSession, pathGlob: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = fs.globStatus(p)
    if (matched == null) Seq.empty else matched.map(_.getPath.toString).toSeq
  }

  private def normalizeKlines(raw: DataFrame): DataFrame = {
    // regexp_extract returns EMPTY STRING (not null) on no-match; nullif so
    // rows from non-conforming filenames hit the required-column na.drop
    // instead of silently surviving with symbol=""/tf="".
    val fileName = nullif(
      regexp_extract(input_file_name(), """klines_([A-Z0-9]+)_([a-z0-9]+)\.csv""", 1), lit(""))
    val fileTf = nullif(
      regexp_extract(input_file_name(), """klines_([A-Z0-9]+)_([a-z0-9]+)\.csv""", 2), lit(""))
    val withIds = Seq(
      ("symbol", fileName), ("tf", fileTf)).foldLeft(raw) { case (d, (c, fromFile)) =>
      if (d.columns.contains(c)) d else d.withColumn(c, fromFile)
    }
    val aliased = resolveAlias(
      resolveAlias(withIds, "open_time", Seq("open_time", "timestamp", "ts")),
      "num_trades", Seq("num_trades", "trades", "trade_count", "count"),
      default = Some(lit(0L)))
    aliased
      .withColumn("open_time", TimeOps.tsMillisOrIso(col("open_time")))
      .withColumn("open", col("open").try_cast("double"))
      .withColumn("high", col("high").try_cast("double"))
      .withColumn("low", col("low").try_cast("double"))
      .withColumn("close", col("close").try_cast("double"))
      .withColumn("volume", col("volume").try_cast("double"))
      .withColumn("num_trades", col("num_trades").try_cast("long"))
  }

  /** Monetary columns carry the reference's NUMERIC(20,8) storage contract
    * (`db/schema.sql:20-22,31-32`) through ingest: warehouse-bound rows keep
    * 8-dp EXACTNESS; the analytics layer converts to double at its own
    * boundary. */
  val MoneyType = "decimal(20,8)"

  /** Trades CSV: permissive read with time-column aliasing
    * (`binance_analysis.py:358-375`). price/qty/quote_qty are
    * NUMERIC(20,8)-exact per the warehouse DDL. */
  def readTradesCsv(spark: SparkSession, pathGlob: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(pathGlob)
    val withQuote =
      if (raw.columns.contains("quote_qty"))
        raw.withColumn("quote_qty", col("quote_qty").try_cast(MoneyType))
      else raw
    resolveAlias(withQuote, "trade_time", Seq("trade_time", "timestamp", "ts"))
      .withColumn("trade_time", TimeOps.tsMillisOrIso(col("trade_time")))
      .withColumn("price", col("price").try_cast(MoneyType))
      .withColumn("qty", col("qty").try_cast(MoneyType))
      .na.drop(Seq("trade_time", "price", "qty"))
  }

  /** Orderbook CSV: side normalization + CHECK-constraint filter
    * (`binance_analysis.py:465-494`, `db/schema.sql:33`). price/qty are
    * NUMERIC(20,8)-exact per the warehouse DDL. */
  def readOrderbookCsv(spark: SparkSession, pathGlob: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(pathGlob)
    resolveAlias(raw, "update_time", Seq("update_time", "timestamp", "ts"))
      .withColumn("update_time", TimeOps.tsMillisOrIso(col("update_time")))
      .withColumn("price", col("price").try_cast(MoneyType))
      .withColumn("qty", col("qty").try_cast(MoneyType))
      .withColumn("side", lower(trim(col("side"))))
      .where(col("side").isin("bid", "ask"))
      .na.drop(Seq("update_time", "price", "qty"))
  }
}
