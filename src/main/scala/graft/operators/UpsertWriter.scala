package graft.operators

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Idempotent keyed upsert into a parquet table directory — the engine-side
  * equivalent of the reference's `COPY → temp table → INSERT … ON CONFLICT
  * DO UPDATE` protocol (§2.2 K4–K7, `src/etl/load_postgres.py:63-103`).
  *
  * Semantics preserved: batch re-ingest of overlapping windows is
  * idempotent, last-write-wins per primary key; re-running the same batch
  * is a no-op. Implementation: read current table ∪ updates → rank-1 per
  * key (SetOps.upsert) → write to a fresh generation dir → atomic pointer
  * flip. Readers always see a complete generation.
  *
  * Scale: this local sink rewrites the table per batch; the 100 TB path is
  * the same logical plan targeted at a MERGE-capable table format (Delta/
  * Iceberg `MERGE INTO`) or partition-pruned dynamic overwrite so only the
  * partitions containing updated keys rewrite. The operator API is the
  * stable part; the sink strategy is pluggable.
  */
object UpsertWriter {

  private def gen(dir: Path): Option[Path] = {
    val ptr = dir.resolve("CURRENT")
    if (Files.exists(ptr)) Some(dir.resolve(Files.readString(ptr).trim)) else None
  }

  /** Reads the current generation of an upsert table (empty-safe). */
  def read(spark: SparkSession, tableDir: String): Option[DataFrame] =
    gen(Paths.get(tableDir)).map(p => spark.read.parquet(p.toString))

  /** Upserts `updates` into the table at `tableDir` keyed by `keys`. */
  def upsert(spark: SparkSession, updates: DataFrame, tableDir: String,
             keys: Seq[String]): Unit = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir)
    val merged = read(spark, tableDir) match {
      case Some(base) => SetOps.upsert(base, updates, keys)
      case None => SetOps.upsert(updates.limit(0), updates, keys)
    }
    val next = s"gen-${System.currentTimeMillis()}-${scala.util.Random.nextInt(100000)}"
    merged.write.mode("overwrite").parquet(dir.resolve(next).toString)
    val tmp = dir.resolve("CURRENT.tmp")
    Files.writeString(tmp, next)
    val prev = gen(dir)
    Files.move(tmp, dir.resolve("CURRENT"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // GC superseded generations (a streaming sink upserting every trigger
    // would otherwise leak one full table copy per micro-batch). The
    // just-replaced generation is kept for in-flight readers; everything
    // older is deleted.
    val keep = Set(Some(dir.resolve(next)), prev).flatten.map(_.getFileName.toString)
    Files.list(dir).forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("gen-") && !keep(n)) deleteRecursively(p)
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
