package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructType}

/** Prefix-scan operators — linear recurrences (EWMA and friends) that no
  * built-in Spark construct expresses per-row: window functions have no
  * position-weighted frame, and higher-order `aggregate` folds to the LAST
  * value only (Spark has no `scanl`). The naive sum formulation
  * y_i = a·Σ x_j·c^(i−j) = a·c^i·Σ x_j·c^(−j) overflows DOUBLE past a few
  * thousand rows (c^(−j) explodes), so a real scan is required.
  *
  * Recurrence (pandas `ewm(alpha).mean()` with `adjust=False`):
  *   y_0 = x_0;  y_i = (1−a)·y_{i−1} + a·x_i
  *
  * Two shapes, chosen by series size:
  *
  *  - [[ewmaPerKey]] — many independent series, each bounded (per-symbol /
  *    per-user time series). ONE hash shuffle on the key collects each
  *    series as a sorted in-row array; the fold then runs sequentially
  *    inside the row, so per-key work is linear and BIT-EXACT vs a
  *    single-threaded reference — results are oracle-comparable. The typed
  *    `map` is the deliberate (d)-tier escape hatch: it breaks codegen for
  *    exactly one project, because no Catalyst expression can scan.
  *    State per task is one series array — the same bound any per-key
  *    window operator carries; a series too big for one row belongs to
  *    [[ewmaGlobal]].
  *
  *  - [[ewmaGlobal]] — ONE series too large for any single row/executor
  *    (a whole exchange feed as one stream). Classic two-phase segmented
  *    scan (Blelloch-style over an associative affine monoid):
  *    range-partition + sort, each partition summarises itself as an affine
  *    map y_out = A·y_in + B (A = c^n, B = fold seeded from 0), the driver
  *    composes the #partitions summaries sequentially (tiny), and each
  *    partition replays with its exact incoming state. Two passes over a
  *    localCheckpoint, no global single-task sort. The affine composition
  *    reorders float ops vs a pure sequential fold — agreement is ~1e-12
  *    relative (spec-asserted), not bitwise, which is why the ORACLE path
  *    is ewmaPerKey and ewmaGlobal is the documented scale escape.
  */
object ScanOps {

  /** Per-key exact EWMA. Returns (keys..., order..., valueOut, out) — one
    * row per input row, the fold running in `order` within each key.
    *
    * @param keys     grouping columns (the series identity)
    * @param order    in-series sort columns — must be a deterministic total
    *                 order within each key (thread a unique tiebreaker)
    * @param value    the observed series (cast to double)
    * @param alpha    smoothing factor in (0, 1]
    * @param valueOut output name for the observed value column
    * @param out      output name for the EWMA column
    */
  def ewmaPerKey(df: DataFrame, keys: Seq[String], order: Seq[String],
                 value: Column, alpha: Double,
                 valueOut: String, out: String): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(order.nonEmpty, "order columns are required")
    val c = 1.0 - alpha
    // A struct array sorts lexicographically field-by-field, so sorting
    // (order..., __v) structs orders each series by the order columns with
    // the value along for the ride. collect_list is unordered across tasks;
    // array_sort makes the series deterministic.
    val series = struct((order.map(col) :+ value.cast("double").as("__v")): _*)
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(series)).as("__series"))
    val seriesIdx = grouped.schema.length - 1
    val vIdx = order.length // __v is the last struct field
    val scanned = grouped.map { row =>
      val s = row.getSeq[Row](seriesIdx)
      val ewma = new Array[Double](s.length)
      var y = 0.0
      var i = 0
      s.foreach { r =>
        val x = r.getDouble(vIdx)
        y = if (i == 0) x else c * y + alpha * x
        ewma(i) = y
        i += 1
      }
      Row.fromSeq(row.toSeq :+ ewma.toSeq)
    }(Encoders.row(grouped.schema.add("__ewma", ArrayType(DoubleType, containsNull = false))))
    // arrays_zip pairs each series struct with its scan value positionally;
    // explode restores one row per observation.
    scanned
      .select((keys.map(col) :+
        explode(arrays_zip(col("__series"), col("__ewma"))).as("__z")): _*)
      .select((keys.map(col) ++
        order.map(o => col("__z.__series").getField(o).as(o)) :+
        col("__z.__series.__v").as(valueOut) :+
        col("__z.__ewma").as(out)): _*)
  }

  /** Whole-frame EWMA over ONE global series: returns (order..., valueOut,
    * out). Scale shape: `numPartitions`-way range partition + in-partition
    * sort (no single-task global sort), one summary pass, driver-side
    * composition over `numPartitions` affine maps, one replay pass.
    *
    * The order columns must be a deterministic TOTAL order (unique keys);
    * ties across a partition boundary would make the scan order, and thus
    * the result, nondeterministic.
    */
  def ewmaGlobal(df: DataFrame, order: Seq[String], value: Column,
                 alpha: Double, valueOut: String, out: String,
                 numPartitions: Int = 0): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(order.nonEmpty, "order columns are required")
    val spark = df.sparkSession
    val c = 1.0 - alpha
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val slim = df.select((order.map(col) :+ value.cast("double").as(valueOut)): _*)
    // localCheckpoint: both the summary pass and the replay pass read the
    // SAME materialized sorted partitions — without it the replay would
    // re-shuffle and could land rows in different partitions than the ones
    // the summaries were computed from.
    val sorted = graft.Materialize(slim
      .repartitionByRange(parts, order.map(col): _*)
      .sortWithinPartitions(order.map(col): _*))
    val vIdx = order.length

    // Pass 1 — per-partition affine summary (n, A = c^n, B = fold from 0,
    // S = fold seeded by the partition's first element). Driver receives
    // exactly `parts` summaries.
    val summaries = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var a = 1.0; var b = 0.0; var s = 0.0
      it.foreach { r =>
        val x = r.getDouble(vIdx)
        if (n == 0L) s = x else s = c * s + alpha * x
        a *= c; b = c * b + alpha * x
        n += 1L
      }
      Iterator.single((pid, n, a, b, s))
    }.collect().sortBy(_._1)

    // Driver-side sequential composition: the incoming state of partition p
    // is the folded state of everything before it (None = p sees the global
    // head and seeds itself).
    val incoming = new Array[Option[Double]](summaries.length)
    var st: Option[Double] = None
    summaries.foreach { case (pid, n, a, b, s) =>
      incoming(pid) = st
      if (n > 0L) st = Some(st match {
        case Some(y) => a * y + b
        case None    => s
      })
    }
    val bc = spark.sparkContext.broadcast(incoming)

    // Pass 2 — replay each partition's fold from its exact incoming state.
    val outRows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var y = 0.0
      var seeded = bc.value(pid) match {
        case Some(v) => y = v; true
        case None    => false
      }
      it.map { r =>
        val x = r.getDouble(vIdx)
        y = if (!seeded) { seeded = true; x } else c * y + alpha * x
        Row.fromSeq(r.toSeq :+ y)
      }
    }
    val schema = StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField(out, DoubleType, nullable = false))
    spark.createDataFrame(outRows, schema)
  }
}
