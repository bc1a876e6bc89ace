package graft.operators

import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Staged-merge JDBC upsert against embedded Derby (the Derby jars ship
  * with Spark) — proves the reference's COPY → temp table → conflict-merge
  * protocol (load_postgres.py:63-103) end-to-end against a real SQL engine:
  * insert, overlapping re-upsert (update wins), idempotent replay. */
class JdbcUpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("derby").toString
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    s"jdbc:derby:$dir/graftdb;create=true"
  }

  test("staged merge: insert, update on conflict, idempotent replay") {
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE candles (symbol VARCHAR(16) NOT NULL, tf VARCHAR(8) NOT NULL, " +
        "open_time BIGINT NOT NULL, close_px DOUBLE, " +
        "PRIMARY KEY (symbol, tf, open_time))")
    finally conn.close()

    val keys = Seq("symbol", "tf", "open_time")
    val batch1 = Seq(("AAA", "1m", 1L, 10.0), ("AAA", "1m", 2L, 11.0))
      .toDF("symbol", "tf", "open_time", "close_px")
    JdbcUpsert.upsert(batch1, url, "candles", keys)

    // Overlap: key (AAA,1m,2) updated, key 3 inserted.
    val batch2 = Seq(("AAA", "1m", 2L, 99.0), ("AAA", "1m", 3L, 12.0))
      .toDF("symbol", "tf", "open_time", "close_px")
    JdbcUpsert.upsert(batch2, url, "candles", keys)
    // Replaying the same batch is a no-op (idempotency, K4).
    JdbcUpsert.upsert(batch2, url, "candles", keys)

    val got = spark.read.jdbc(url, "candles", new java.util.Properties())
      .orderBy("open_time")
      .select("open_time", "close_px").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0), (2L, 99.0), (3L, 12.0)))

    // In-batch duplicate keys: with a precedence ordering the HIGHEST row
    // wins deterministically (last-write-wins on the event sequence).
    val conn2 = DriverManager.getConnection(url)
    try conn2.createStatement().executeUpdate(
      "CREATE TABLE candles_seq (symbol VARCHAR(16) NOT NULL, tf VARCHAR(8) NOT NULL, " +
        "open_time BIGINT NOT NULL, close_px DOUBLE, seq BIGINT, " +
        "PRIMARY KEY (symbol, tf, open_time))")
    finally conn2.close()
    val dup = Seq(("AAA", "1m", 11L, 1.0, 1L), ("AAA", "1m", 11L, 7.0, 2L))
      .toDF("symbol", "tf", "open_time", "close_px", "seq")
    JdbcUpsert.upsert(dup, url, "candles_seq", keys,
      precedence = Seq(org.apache.spark.sql.functions.col("seq")))
    val win = spark.read.jdbc(url, "candles_seq", new java.util.Properties())
      .select("close_px").as[Double].collect().toSeq
    assert(win == Seq(7.0))
  }

  test("stage VARCHAR width fits keys longer than any fixed cap") {
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE longkeys (k VARCHAR(4000) NOT NULL, v DOUBLE, PRIMARY KEY (k))")
    finally conn.close()
    val longKey = "k" * 2000 // over the old 1024 stage cap
    val df = Seq((longKey, 1.0), ("short", 2.0)).toDF("k", "v")
    JdbcUpsert.upsert(df, url, "longkeys", Seq("k"))
    JdbcUpsert.upsert(Seq((longKey, 9.0)).toDF("k", "v"), url, "longkeys", Seq("k"))
    val got = spark.read.jdbc(url, "longkeys", new java.util.Properties())
      .orderBy("v").select("v").as[Double].collect().toSeq
    assert(got == Seq(2.0, 9.0))
  }

  test("NUMERIC(20,8) round-trips through staged merge with 8-dp exactness") {
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE money (id BIGINT NOT NULL, price NUMERIC(20,8), " +
        "PRIMARY KEY (id))")
    finally conn.close()
    // Not exactly representable as a binary double.
    val exact = new java.math.BigDecimal("42000.10000001")
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, exact)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("price",
          org.apache.spark.sql.types.DecimalType(20, 8)))))
    JdbcUpsert.upsert(df, url, "money", Seq("id"))
    val back = spark.read.jdbc(url, "money", new java.util.Properties())
      .select("price").head().getDecimal(0)
    assert(back.compareTo(exact) == 0, s"lost exactness: $back")
  }

  test("identifiers needing quoting are rejected before reaching SQL") {
    val df = Seq((1L, 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      JdbcUpsert.upsert(df, url, "bad table; DROP", Seq("k"))
    }
    intercept[IllegalArgumentException] {
      JdbcUpsert.upsert(df.withColumnRenamed("v", "select\"ion"), url,
        "candles", Seq("k"))
    }
  }
}
