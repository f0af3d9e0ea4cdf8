package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S5/S6: per-subject JSON form documents → one wide row per subject
  * (reference etl/mci/c3dc_etl.py:903-1032 document walk + mapped-field
  * extraction; :335-355 mapped-field cache).
  *
  * Semantics implemented exactly:
  *  - only MAPPED fields become columns (genuine projection pushdown —
  *    the document scan prunes to `upi` + `forms` and the pivot width is
  *    the mapping's field set, not the union of all form fields);
  *  - a form-qualified name `FORM.FIELD` matches only entries of that
  *    form and WINS over a bare `FIELD` mapping of the same name
  *    (reference :990-1004);
  *  - FIRST value per (subject, field) in document order (form ordinal,
  *    then entry ordinal) — one `min_by` per field inside a single
  *    aggregation, no generic pivot and no second shuffle.
  *
  * Scale: explode produces (subjects x entries) narrow rows; the single
  * groupBy(upi) partial-aggregates map-side, so the shuffle carries one
  * pre-aggregated row per subject per partition.
  */
object FormFlattener {

  /** The canonical MCI-style document shape for SourceReader.jsonDocs. */
  val DocSchema: StructType = StructType(Seq(
    StructField("upi", StringType),
    StructField("forms", ArrayType(StructType(Seq(
      StructField("form_id", StringType),
      StructField("data", ArrayType(StructType(Seq(
        StructField("form_field_id", StringType),
        StructField("value", StringType)))))))))))

  /** @param docs frame of (upi, forms[...]) per [[DocSchema]]
    * @param mappedFields field names to extract — bare `FIELD` or
    *                     qualified `FORM.FIELD`
    * @return one row per upi with one string column per mapped field
    *         (named exactly as passed, qualified names included)
    */
  def flatten(docs: DataFrame, mappedFields0: Seq[String]): DataFrame = {
    // `upi` is the group key — a mapping reading the subject id itself gets
    // it from the key column, not from a form entry
    val mappedFields = mappedFields0.distinct.filterNot(_ == "upi")
    require(mappedFields.nonEmpty, "no mapped fields to extract")
    val entries = docs
      .select(col("upi"), posexplode(col("forms")).as(Seq("__fidx", "__form")))
      .select(col("upi"), col("__fidx"), col("__form.form_id").as("__formId"),
        posexplode(col("__form.data")).as(Seq("__didx", "__e")))
      .select(col("upi"), col("__formId"),
        col("__e.form_field_id").as("__field"), col("__e.value").as("__value"),
        // document order across forms and entries: struct ordering is
        // lexicographic, so (form ordinal, entry ordinal) needs no packed
        // encoding (a packed long would overflow/collide on forms with
        // over a million entries)
        struct(col("__fidx"), col("__didx")).as("__ord"))

    val aggs = mappedFields.map { f =>
      val cond = f.split("\\.", 2) match {
        case Array(form, field) if f.contains(".") =>
          col("__formId") === form && col("__field") === field
        case _ => col("__field") === f
      }
      min_by(when(cond, col("__value")), when(cond, col("__ord"))).as(f)
    }
    entries.groupBy(col("upi")).agg(aggs.head, aggs.tail: _*)
  }
}
