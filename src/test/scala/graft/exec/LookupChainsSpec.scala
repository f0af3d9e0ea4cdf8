package graft.exec

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** F7/F8 semantics from the reference (etl/mci/c3dc_etl.py:1540-1629):
  * Preferred beats Synonym per code, casefolded enum canonicalization,
  * default on miss, chained category hop.
  */
class LookupChainsSpec extends SparkTestBase {
  import spark.implicits._

  private val icdo = Seq(
    ("9380/3", "Glioma, malignant", "Preferred"),
    ("9380/3", "Glioma, NOS", "Synonym"),
    ("9440/3", "Glioblastoma, NOS", "Synonym"),
    ("C71.9", "Brain, NOS", "Preferred")).toDF("code", "term", "term_type")

  private val enumCanon = Seq(
    ("glioma, malignant", "Glioma, Malignant"),
    ("glioblastoma, nos", "Glioblastoma, NOS"))
    .toDF("term", "canonical")
    .select(col("term"), col("canonical"))

  private val categories = Seq(
    ("glioma, malignant", "CNS Tumor"))
    .toDF("diagnosis", "category")
    .select(col("diagnosis"), col("category"))

  test("Preferred term beats Synonym for the same code") {
    val collapsed = LookupChains.collapseIcdo(icdo)
      .as[(String, String)].collect().toMap
    assert(collapsed("9380/3") == "Glioma, malignant")
    assert(collapsed("9440/3") == "Glioblastoma, NOS") // synonym-only code resolves
  }

  test("diagnosis chain: code -> term -> canonical PV, default on miss") {
    val facts = Seq("9380/3", "9440/3", "0000/0").toDF("icdo_code")
    val out = LookupChains.diagnosis(
        facts, col("icdo_code"), LookupChains.collapseIcdo(icdo),
        enumCanon, default = "Not Reported")
      .select("icdo_code", "diagnosis").as[(String, String)].collect().toMap
    assert(out("9380/3") == "Glioma, Malignant")   // canonical casing applied
    assert(out("9440/3") == "Glioblastoma, NOS")
    assert(out("0000/0") == "Not Reported")        // miss -> default
  }

  test("category chain: second broadcast hop, null on unmapped") {
    val facts = Seq("9380/3", "9440/3").toDF("icdo_code")
    val withDiag = LookupChains.diagnosis(
      facts, col("icdo_code"), LookupChains.collapseIcdo(icdo),
      enumCanon, default = "Not Reported")
    val out = LookupChains.diagnosisCategory(withDiag, categories)
      .select("icdo_code", "diagnosis_category")
      .as[(String, Option[String])].collect().toMap
    assert(out("9380/3").contains("CNS Tumor"))
    assert(out("9440/3").isEmpty) // unmapped -> warn channel null
  }

  test("both lookup hops plan broadcast joins") {
    val facts = Seq("9380/3").toDF("icdo_code")
    val plan = LookupChains.diagnosisCategory(
        LookupChains.diagnosis(facts, col("icdo_code"),
          LookupChains.collapseIcdo(icdo), enumCanon, "Not Reported"),
        categories)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
