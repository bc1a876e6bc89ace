package graft.operators

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}

/** JDBC staged-merge upsert — the reference's canonical Postgres sink
  * protocol (`src/etl/load_postgres.py:63-103`): COPY into a staging table,
  * then ONE set-based conflict-resolving statement into the target. Here:
  * distributed batch INSERT into a fresh stage table via Spark's JDBC
  * writer (the COPY analogue — executors write in parallel), then a single
  * `MERGE INTO` keyed on the primary key, then drop the stage.
  *
  * A MERGE source must not carry duplicate keys; the batch is reduced to
  * one row per key first. With `precedence` columns the kept row is the
  * highest by that ordering (deterministic last-write-wins — pass the
  * event/ingest time); without it a cheap arbitrary-row dedup applies and
  * callers must send at most one row per key for deterministic replays.
  *
  * Scale: the stage write is as parallel as the DataFrame (numPartitions
  * JDBC connections); the merge is one server-side set operation — no
  * per-row driver round-trips anywhere. Each invocation stages into its
  * own uniquely-named table, so concurrent upserts into one target never
  * share (or clobber) a stage, and the stage is dropped even when the
  * MERGE fails.
  *
  * ==ClickHouse dialect note==
  * BASELINE.json's north-star blurb names a ClickHouse sink; that engine
  * speaks this exact protocol with one substitution, because ClickHouse
  * has no `MERGE INTO` — upsert is a TABLE ENGINE property instead. Make
  * the target `ENGINE = ReplacingMergeTree(ver) ORDER BY (key cols)`
  * (`ver` = the precedence column; last-write-wins collapses at merge
  * time, `FINAL`/`OPTIMIZE ... FINAL` forces it read-side) and the merge
  * step degenerates to `INSERT INTO target SELECT * FROM stage` — the
  * in-batch dedup this object already performs stays required, since
  * ReplacingMergeTree collapses across parts, not within an insert block.
  * Connection options: `Properties("driver" ->
  * "com.clickhouse.jdbc.ClickHouseDriver")` against
  * `jdbc:clickhouse://host:8123/db`, and the stage table wants
  * `createTableOptions = "ENGINE = Memory"` (plain Spark JDBC `CREATE
  * TABLE` fails on ClickHouse without an engine clause). Semantics are
  * unchanged from the MERGE path: key-deduped batch in, last-write-wins
  * per key out. No code here special-cases it — this paragraph exists so
  * the dialect swap is a config decision, not a design one.
  */
object JdbcUpsert {

  /** Identifiers are interpolated unquoted into the MERGE (quoting the
    * target would change engine case-folding semantics — see the comment at
    * the MERGE below), so anything that is not a plain unquoted-safe SQL
    * identifier is rejected up front rather than emitted into SQL. */
  private val SafeIdent = java.util.regex.Pattern.compile("[A-Za-z_][A-Za-z0-9_]*")
  private def requireSafe(kind: String, name: String): Unit =
    require(SafeIdent.matcher(name).matches(),
      s"$kind '$name' needs quoting and cannot be used in an unquoted MERGE; " +
        "rename it to [A-Za-z_][A-Za-z0-9_]* or pre-quote via a view")

  /** Upserts `df` into `table` at `url`, keyed by `keys`. The target table
    * must exist (DDL ownership stays with the warehouse, as in the
    * reference's schema.sql). */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             props: Properties = new Properties(),
             precedence: Seq[Column] = Seq.empty): Unit = {
    requireSafe("table", table)
    df.columns.foreach(requireSafe("column", _))
    keys.foreach(requireSafe("key", _))
    require(keys.nonEmpty && keys.forall(df.columns.contains),
      s"keys ${keys.mkString(",")} must be non-empty and present in " +
        s"df columns ${df.columns.mkString(",")}")
    // Stage-name prefix is truncated so table + 7 + 32 suffix chars stays
    // inside every major engine's 128-char identifier limit.
    val stage = s"${table.take(80)}_stage_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val deduped =
      if (precedence.nonEmpty) {
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(precedence.map(_.desc): _*)
        df.withColumn("__pr", row_number().over(w)).where(col("__pr") === 1)
          .drop("__pr")
      } else df.dropDuplicates(keys)
    // Stage KEY string columns as VARCHAR: some engines (Derby) default
    // StringType to CLOB/TEXT, which cannot join against the target's
    // VARCHAR keys. Non-key strings (free text) keep the engine default so
    // long values are never truncated or rejected by a length cap. The
    // width is sized to the batch's longest observed key value (one cheap
    // agg pass; the stage is per-invocation so it only has to fit THIS
    // batch) — a fixed cap rejected keys over it at stage-write time.
    val stringKeys = df.schema.fields
      .filter(f => keys.contains(f.name) &&
        f.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSeq
    // The sizing agg and the stage write are two actions over `deduped`;
    // persist so the (possibly windowed) dedup computes once — and so both
    // actions see the SAME rows even over a non-deterministic input (a
    // narrower re-computed width would fail the stage insert).
    if (stringKeys.nonEmpty) deduped.persist()
    try {
      val varchars =
        if (stringKeys.isEmpty) ""
        else {
          import org.apache.spark.sql.functions.{length, max}
          val aggs = stringKeys.map(k => max(length(col(k))).as(k))
          val row = deduped.agg(aggs.head, aggs.tail: _*).head()
          stringKeys.map { k =>
            val w = if (row.isNullAt(row.fieldIndex(k))) 1024
                    else math.max(row.getAs[Int](k), 1)
            s"$k VARCHAR($w)"
          }.mkString(", ")
        }
      val stageWriter =
        if (varchars.isEmpty) deduped.write
        else deduped.write.option("createTableColumnTypes", varchars)
      stageWriter.mode(SaveMode.Overwrite).jdbc(url, stage, props)
      val conn = DriverManager.getConnection(url, props)
      try {
        // Spark's JDBC writer creates the stage with QUOTED column names
        // (exact DataFrame case), while the target's unquoted DDL folds per
        // the engine (upper on Derby, lower on Postgres) — so stage-side
        // references must be quoted verbatim and target-side left unquoted.
        // SET targets are unqualified (the standard; Derby rejects t.c there).
        def sq(c: String) = "s.\"" + c + "\""
        val on = keys.map(k => s"t.$k = ${sq(k)}").mkString(" AND ")
        val setClause = nonKeys.map(c => s"$c = ${sq(c)}").mkString(", ")
        val insertCols = cols.mkString(", ")
        val insertVals = cols.map(sq).mkString(", ")
        val matched =
          if (nonKeys.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setClause " else ""
        val st = conn.createStatement()
        try st.executeUpdate(
          s"MERGE INTO $table t USING $stage s ON $on " + matched +
            s"WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)")
        finally st.close()
      } finally conn.close()
    } finally {
      if (stringKeys.nonEmpty) deduped.unpersist(blocking = false)
      dropStage(url, props, stage) // GC even if the stage write died
    }
  }

  /** Best-effort stage drop on its own connection — runs whether the stage
    * write, the MERGE, or nothing at all failed (a half-created stage from
    * a failed distributed write must not accumulate in the warehouse). */
  private def dropStage(url: String, props: Properties, stage: String): Unit =
    try {
      val c = DriverManager.getConnection(url, props)
      try {
        val st = c.createStatement()
        try st.executeUpdate(s"DROP TABLE $stage")
        finally st.close()
      } finally c.close()
    } catch { case _: java.sql.SQLException => () }
}
