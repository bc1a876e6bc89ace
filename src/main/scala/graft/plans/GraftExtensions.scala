package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the engine's custom Catalyst
  * expressions for every session, including pure-SQL users —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
  *   spark.sql("SELECT doc_id, rolling_hash(text), simhash64(split(text, ' ')) FROM docs")
  * }}}
  *
  * Programmatic sessions can equivalently call `Expressions.register(spark)`
  * (temp-function route). No custom planner rules are injected: SURVEY §4's
  * audit found Catalyst's built-in planning optimal for every operator here,
  * so the extension surface is deliberately expressions-only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[Expressions.RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => Expressions.RollingHash(children.head)))
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Expressions.SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => Expressions.SimHash64(children.head)))
  }
}
