package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dsl.{MappingCompiler, Transformation}
import graft.model.C3dcSchema

/** The engine's warn channel (SURVEY §7.5.6): the reference logs a
  * warning and nulls the field when a source value is not among a
  * mapping's allowed values (etl/target/c3dc_etl.py:1295-1322). A
  * distributed engine can't usefully log per row — instead the same
  * admission predicates the compiler nulls with produce a QUERYABLE
  * frame of distinct rejected values with occurrence counts per mapping.
  *
  * One narrow aggregation per gated mapping over a shared source scan —
  * run it next to the harmonization job when a study's rejection report
  * is wanted; it costs nothing when not asked for.
  */
object MappingDiagnostics {

  /** @return frame (output_field, source_field, value, occurrences) of
    *         values the P5 gate rejects; empty when nothing is gated
    */
  def gateRejections(
      schema: C3dcSchema, xform: Transformation, source: DataFrame): DataFrame = {
    val compiler = new MappingCompiler(schema)
    val frames = xform.mappings.flatMap { m =>
      compiler.gateAdmitted(m).map { admitted =>
        source.filter(!coalesce(admitted, lit(false)))
          .groupBy(compiler.defaultedSource(m).as("value"))
          .agg(count(lit(1)).as("occurrences"))
          .select(
            lit(m.outputField).as("output_field"),
            lit(m.sourceField).as("source_field"),
            col("value"), col("occurrences"))
      }
    }
    frames.reduceOption(_.unionByName(_)).getOrElse(
      source.limit(0).select(
        lit("").as("output_field"), lit("").as("source_field"),
        lit("").as("value"), lit(0L).as("occurrences")))
  }
}
