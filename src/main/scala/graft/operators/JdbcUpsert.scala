package graft.operators

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC staged-merge upsert — the reference's canonical Postgres sink
  * protocol (`src/etl/load_postgres.py:63-103`): COPY into a staging table,
  * then ONE set-based conflict-resolving statement into the target. Here:
  * distributed batch INSERT into a fresh stage table via Spark's JDBC
  * writer (the COPY analogue — executors write in parallel), then a single
  * `MERGE INTO` keyed on the primary key, then drop the stage.
  *
  * Last-write-wins per key within the staged batch is resolved BEFORE the
  * merge (SetOps.upsert of the batch against itself would be overkill —
  * a MERGE source must not have duplicate keys, so we pre-dedup), matching
  * `ON CONFLICT DO UPDATE` semantics where the final arriving row wins.
  *
  * Scale: the stage write is as parallel as the DataFrame (numPartitions
  * JDBC connections); the merge is one server-side set operation — no
  * per-row driver round-trips anywhere.
  */
object JdbcUpsert {

  /** Upserts `df` into `table` at `url`, keyed by `keys`. The target table
    * must exist (DDL ownership stays with the warehouse, as in the
    * reference's schema.sql). */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             props: Properties = new Properties()): Unit = {
    val stage = s"${table}_stage"
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    // MERGE requires unique keys in the source: keep one row per key
    // (arbitrary-but-deterministic max over non-keys is wrong in general,
    // so require upstream to send one row per key; cheap dedup for safety).
    val deduped = df.dropDuplicates(keys)
    // Stage string columns as VARCHAR: some engines (Derby) default
    // StringType to CLOB/TEXT, which cannot join against the target's
    // VARCHAR keys.
    val varchars = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(1024)").mkString(", ")
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
      try {
        st.executeUpdate(
          s"MERGE INTO $table t USING $stage s ON $on " + matched +
            s"WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)")
        st.executeUpdate(s"DROP TABLE $stage")
      } finally st.close()
    } finally conn.close()
  }
}
