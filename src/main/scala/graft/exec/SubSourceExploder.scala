package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P9: multi-value explode into "sub-source records"
  * (reference etl/target/c3dc_etl.py:1407-1460).
  *
  * When a single-valued enum output's source value contains ';', the source
  * row is cloned once per distinct sorted trimmed value with derived ids
  * `{id}_{1..n}`; single-valued rows pass through unchanged. One narrow
  * `posexplode` — no shuffle, fully pipelined.
  *
  * The value-set derivation is the codegen'd `graft_multi_values` kernel
  * (`expressions/TextKernels.multiValues`), not the equivalent HOF tree:
  * Catalyst re-evaluates the derivation THREE times per row (the inferred
  * `size(vals) > 0` Generate filter, the `multi` arm, the value arm), and
  * lambda-bearing HOFs run interpreted AND fence off whole-stage codegen —
  * the tree form was the entire cost of P9 at decade scale.
  */
object SubSourceExploder {
  def explode(source: DataFrame, sourceField: String, idField: String): DataFrame = {
    val f = col("`" + sourceField + "`").cast("string")
    val id = col("`" + idField + "`").cast("string")
    val vals = call_function("graft_multi_values", coalesce(f, lit("")))
    val multi = size(vals) > 1
    source
      .withColumn("__vals", when(multi, vals).otherwise(array(f)))
      .select(col("*"), posexplode(col("__vals")).as(Seq("__pos", "__val")))
      .withColumn(idField,
        when(size(col("__vals")) > 1, concat(id, lit("_"), col("__pos") + 1)).otherwise(id))
      .withColumn(sourceField, col("__val"))
      .drop("__vals", "__pos", "__val")
  }
}
