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
  * Scale: this local sink rewrites the table per batch — fine for small
  * artifact tables; for anything that grows with the data, use
  * [[BucketedUpsertWriter]], the partition-pruned variant that rewrites
  * ONLY the key-hash buckets containing updated keys (the same protocol a
  * MERGE-capable table format executes). The operator API is the stable
  * part; the sink strategy is pluggable.
  */
object UpsertWriter {

  /** One monitor per canonical table path: same-JVM writers serialize here
    * (an OS FileLock alone cannot — overlapping locks within one JVM throw
    * OverlappingFileLockException rather than block). Keyed on the REAL
    * path (symlinks resolved) so two writers reaching one table via
    * aliased paths collapse to one monitor — a lexical normalize would
    * hand them distinct monitors and the second in-JVM `FileChannel.lock`
    * on the same underlying LOCK file would throw instead of block.
    * Falls back to the lexical form only when the directory does not
    * exist yet (first writer creates it before locking). */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def monitorFor(dir: Path): Object = {
    val canonical =
      try dir.toRealPath().toString
      catch { case _: java.io.IOException => dir.toAbsolutePath.normalize.toString }
    monitors.computeIfAbsent(canonical, _ => new Object)
  }

  /** Serializes the read→merge→write→flip critical section against other
    * writers of the SAME table: JVM monitor for in-process threads, then an
    * OS-level advisory `FileLock` on the table's LOCK file for other
    * processes. FileLock is released by the OS when a holder dies, so a
    * crashed writer cannot wedge the table (no stale-lock sweeper needed).
    * Cross-table writers share nothing and proceed in parallel. */
  private[operators] def withWriterLock[A](dir: Path)(body: => A): A =
    monitorFor(dir).synchronized {
      val ch = java.nio.channels.FileChannel.open(dir.resolve("LOCK"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val fl = ch.lock() // blocks until any other process's writer exits
        try body finally fl.release()
      } finally ch.close()
    }

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
    // The whole read→merge→write→flip sequence is one critical section:
    // without it, two interleaved writers both merge against the same base
    // generation and the second pointer flip silently discards the first
    // writer's rows (lost update). Readers need no lock — they resolve
    // CURRENT once and scan an immutable generation.
    withWriterLock(dir) {
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
  }

  private[operators] def genMillis(name: String): Option[Long] =
    name.split('-') match {
      case Array("gen", ms, _) => ms.toLongOption
      case _ => None
    }

  /** Files.list streams hold a directory FD until closed — the forEach
    * one-liner leaked one per micro-batch in the streaming upsert path. */
  private[operators] def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ListBuffer.empty[Path]
      while (it.hasNext) buf += it.next()
      buf.toList
    } finally s.close()
  }

  private[operators] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
