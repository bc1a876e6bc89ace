package graft.sources

import scala.io.Source
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Parquet-type-drift tripwire (round-7 advice item 4).
  *
  * Between rounds 6 and 7 the driver testdata silently changed `events.ts`
  * from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * — surfacing in Spark as TIMESTAMP_NTZ — and the symptom was three opaque
  * query failures (q64/q68/q93) instead of one named diff. This spec pins
  * the POST-normalization schema of every table (`Tables.load`, which is
  * what all queries consume) against a committed expected-schema file.
  *
  * On a legitimate testdata change: update
  * `src/test/resources/expected_schemas_sf0.001.txt` — editing that file is
  * the explicit act of accepting the new shape, and the diff names exactly
  * which column changed type. If the change re-breaks an epoch extraction,
  * the NTZ parity tests in TimeOpsSpec/RangeJoinSpec localize it further.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val expected: Map[String, String] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/expected_schemas_sf0.001.txt"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(name, cols) = line.split("\\|", 2)
      name -> cols
    }.toMap
    finally src.close()
  }

  test("expected-schema file covers exactly the Tables.names inventory") {
    assert(expected.keySet == Tables.names.toSet)
  }

  for (name <- Tables.names) {
    test(s"table $name post-normalization schema matches the committed expectation") {
      val got = Tables.load(spark, SparkTestSession.sf, name)
        .schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
        .mkString(",")
      assert(got == expected(name),
        s"\nschema drift in $name —\n  expected: ${expected(name)}\n  actual:   $got\n" +
          "If this is an accepted testdata change, update " +
          "src/test/resources/expected_schemas_sf0.001.txt (and re-check every " +
          "epoch/interval consumer of the changed column).")
    }
  }
}
