package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the native text expressions with the session's function
  * registry (the idiomatic `SparkSessionExtensions` path — usable from
  * SQL text and via `functions.call_function`). Install with
  * `SparkSession.builder.withExtensions(new GraftExtensions)`; cluster
  * deployments would set `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash60" -> (es => Simhash60(es.head)),
    "graft_shingle_hashes" -> (es => ShingleHashes(es.head)),
    "graft_shingle_strings" -> (es => ShingleStrings(es.head)))
}
