package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("permille matches DuckDB integer // semantics, including den=0 → NULL") {
    // (num, den, expected): DuckDB `num*1000 // den`; `// 0` is NULL —
    // the unguarded double path used to NaN-cast that to a silent 0
    val cases = Seq(
      (7L, 10L, Some(700L)),
      (1L, 3L, Some(333L)),
      (0L, 5L, Some(0L)),
      (5L, 5L, Some(1000L)),
      (0L, 0L, None),
      (42L, 0L, None))
    val got = cases.map { case (n, d, _) => (n, d) }.toDF("n", "d")
      .select(col("n"), col("d"), TextFunctions.permille(col("n"), col("d")).as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSeq
    assert(got == cases.map { case (n, d, e) => (n, d, e) })
  }

  test("empty-text document: every permille quality signal is NULL, not 0") {
    // the t2/t8 shape on a doc with no tokens: a 0 here would be
    // indistinguishable from "1000 tokens, none of them stopwords"
    val df = Seq(("d0", ""), ("d1", "the cat sat")).toDF("doc_id", "text")
    val toks = TextFunctions.tokens(col("text"))
    val out = df.select(
        col("doc_id"),
        TextFunctions.permille(
          size(filter(toks, t => t.isin("the", "a", "of"))), size(toks)).as("stop"),
        TextFunctions.permille(size(array_distinct(toks)), size(toks)).as("div"))
      .orderBy("doc_id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getLong(1) == 333L && out(1).getLong(2) == 1000L)
  }
}
