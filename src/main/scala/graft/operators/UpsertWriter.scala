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

  /** Upserts `updates` into the table at `tableDir` keyed by `keys`.
    *
    * `retainMillis`: superseded generations younger than this survive GC so
    * a reader that resolved CURRENT before several subsequent upserts can
    * finish its scan (with a 1 s streaming trigger, a fixed keep-one policy
    * gave only a ~2 s window). The just-written and just-replaced
    * generations are always kept regardless of age. */
  def upsert(spark: SparkSession, updates: DataFrame, tableDir: String,
             keys: Seq[String], retainMillis: Long = 60000L): Unit = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir)
    val merged = read(spark, tableDir) match {
      case Some(base) => SetOps.upsert(base, updates, keys)
      case None => SetOps.upsert(updates.limit(0), updates, keys)
    }
    val now = System.currentTimeMillis()
    val next = s"gen-$now-${scala.util.Random.nextInt(100000)}"
    merged.write.mode("overwrite").parquet(dir.resolve(next).toString)
    val tmp = dir.resolve("CURRENT.tmp")
    Files.writeString(tmp, next)
    val prev = gen(dir)
    Files.move(tmp, dir.resolve("CURRENT"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // GC superseded generations (a streaming sink upserting every trigger
    // would otherwise leak one full table copy per micro-batch). Deletion
    // requires BOTH superseded (not next/prev) and aged out of the
    // retention window; unparseable gen timestamps are never deleted.
    val keep = Set(Some(dir.resolve(next)), prev).flatten.map(_.getFileName.toString)
    listDir(dir).foreach { p =>
      val n = p.getFileName.toString
      val bornAt = genMillis(n)
      if (n.startsWith("gen-") && !keep(n) &&
          bornAt.exists(now - _ >= retainMillis)) deleteRecursively(p)
    }
  }

  private def genMillis(name: String): Option[Long] =
    name.split('-') match {
      case Array("gen", ms, _) => ms.toLongOption
      case _ => None
    }

  /** Files.list streams hold a directory FD until closed — the forEach
    * one-liner leaked one per micro-batch in the streaming upsert path. */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ListBuffer.empty[Path]
      while (it.hasNext) buf += it.next()
      buf.toList
    } finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
