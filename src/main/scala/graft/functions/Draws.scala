package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's ONE deterministic pseudo-uniform draw.
  *
  * `md5(id)`'s first 8 hex chars as an integer, modulo the caller's scale —
  * integer-only, seeded by row identity, so the same row draws the same
  * fate in every engine and every run, and a DuckDB oracle reproduces it
  * verbatim as `CAST('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 8) AS
  * BIGINT) % M`. Used by split assignment (M=100), importance sampling
  * (M=1000) and temperature sampling (M=1e6).
  *
  * Centralized because the cross-engine contract is BIT-exactness: the
  * substring width, the cast order and the hex decode must stay identical
  * at every call site AND in every oracle mirror — one stray edit to a
  * copy-pasted variant would silently desynchronize that site from its
  * oracle. Change this function only together with every oracle SQL string
  * that mirrors it.
  */
object Draws {

  /** Pseudo-uniform integer draw in [0, modulus) keyed by `id`. Null id →
    * null draw (every comparison on it is null) — callers that cannot
    * tolerate silently-dropped rows must guard, as `Splits.assignSplit`
    * does with its raise_error tripwire. */
  def md5Draw(id: Column, modulus: Long): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % modulus
}
