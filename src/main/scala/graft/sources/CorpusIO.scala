package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Corpus-format ingest beyond CSV/parquet: JSON-lines (the de-facto wire
  * format for web-scraped training corpora) and ORC (the other mainstream
  * columnar format a warehouse may hand over).
  *
  * JSONL rules for 100 TB: ALWAYS pass an explicit schema — schema
  * inference is a full extra pass over the data before the real read.
  * Read PERMISSIVE with a corrupt-record column, so one mangled line in a
  * billion quarantines instead of failing the job or silently vanishing.
  */
object CorpusIO {

  /** documents-table schema (SURVEY §1.2) + corrupt-line capture. */
  val documentsJsonSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** JSONL documents read: explicit schema (single pass), permissive mode,
    * corrupt lines kept in `_corrupt_record` for quarantine routing.
    *
    * Route AFTER materializing (cache for a batch in memory, or land the
    * parsed frame to parquet): Spark refuses raw-scan queries whose
    * referenced columns reduce to only the corrupt-record column
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — which is exactly what a pruned
    * `cleanDocs(...).count()` becomes. At corpus scale the landing write
    * is the natural materialization; in tests, `.cache()`. */
  def readJsonlDocs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsJsonSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Rows whose line failed to parse — route to a quarantine sink
    * (requires a materialized frame, see [[readJsonlDocs]]). */
  def corruptLines(docs: DataFrame): DataFrame =
    docs.select("_corrupt_record", "doc_id")
      .where(docs.col("_corrupt_record").isNotNull)

  /** Clean rows with the capture column dropped. */
  def cleanDocs(docs: DataFrame): DataFrame =
    docs.where(docs.col("_corrupt_record").isNull).drop("_corrupt_record")

  /** ORC round-trip — Spark's built-in ORC source keeps predicate pushdown
    * and column pruning just like parquet (asserted in SourcesSpec). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** `mergeSchema = true` reconciles files written under EVOLVED schemas
    * (added columns null-fill) at the cost of a per-file footer read at
    * planning — leave it off (the default) for schema-uniform corpora,
    * where Spark plans from one footer. */
  def readOrc(spark: SparkSession, path: String,
              mergeSchema: Boolean = false): DataFrame =
    spark.read.option("mergeSchema", mergeSchema.toString).orc(path)
}
