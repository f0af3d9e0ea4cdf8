package graft.exec

import graft.SparkTestBase

/** P9 semantics (reference etl/target/c3dc_etl.py:1407-1460): multi-value
  * source rows clone per distinct sorted trimmed value with `{id}_{1..n}`
  * derived ids; single-valued rows pass through with their original id.
  */
class SubSourceExploderSpec extends SparkTestBase {
  import spark.implicits._

  private def explode(rows: (String, String)*) =
    SubSourceExploder.explode(rows.toDF("id", "v"), "v", "id")
      .select("id", "v").as[(String, String)].collect().toSeq.sorted

  test("multi-value rows clone per distinct sorted value with derived ids") {
    assert(explode(("R1", "b; a ;b")) == Seq(("R1_1", "a"), ("R1_2", "b")))
  }

  test("single-value rows keep their original id and value") {
    assert(explode(("R1", "only")) == Seq(("R1", "only")))
  }

  test("blank segments are dropped; an all-blank source passes through") {
    assert(explode(("R1", "x; ;y")) == Seq(("R1_1", "x"), ("R1_2", "y")))
    assert(explode(("R1", "")) == Seq(("R1", "")))
  }

  test("other columns replicate into every clone") {
    val out = SubSourceExploder.explode(
      Seq(("R1", "b;a", "keep")).toDF("id", "v", "other"), "v", "id")
      .select("id", "other").as[(String, String)].collect().toSeq.sorted
    assert(out == Seq(("R1_1", "keep"), ("R1_2", "keep")))
  }
}
