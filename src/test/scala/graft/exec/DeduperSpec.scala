package graft.exec

import graft.SparkTestBase

/** A7/K2/K3: cross-file dedup — identical records from different
  * transformations (differing only in generated ids) are suppressed
  * (reference etl/target/c3dc_etl.py:1926-2124).
  */
class DeduperSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(ids: Seq[(String, String, String)]) =
    ids.toDF("diagnosis_id", "diagnosis", "participant.participant_id")

  test("identical records with different generated ids dedupe; first transformation wins") {
    val t1 = frame(Seq(("uuid-a", "Neuroblastoma", "P1"), ("uuid-b", "Glioma", "P2")))
    val t2 = frame(Seq(("uuid-c", "Neuroblastoma", "P1"), ("uuid-d", "Astrocytoma", "P3")))
    val (deduped, report) = Deduper.dedupe(
      "diagnosis",
      Seq(("xform1", 0, t1), ("xform2", 1, t2)),
      Some("participant.participant_id"))
    val rows = deduped.orderBy("diagnosis").collect()
    assert(rows.length == 3)
    // the survivor of the duplicate pair is xform1's record
    val nb = rows.find(_.getAs[String]("diagnosis") == "Neuroblastoma").get
    assert(nb.getAs[String]("diagnosis_id") == "uuid-a")
    val rep = report.collect()
    assert(rep.length == 1)
    assert(rep(0).getAs[Long]("occurrences") == 2)
    assert(rep(0).getAs[scala.collection.Seq[String]]("transformations") ==
      Seq("xform1", "xform2"))
  }

  test("content hash is invariant to column order, array order, and volatile fields") {
    import org.apache.spark.sql.functions.col
    // participant node: own id and observation id-lists are volatile
    // (blanked before hashing); segment is real content
    val a = Seq(("P1", Seq("s2", "s1"), "AUTO"))
      .toDF("participant_id", "survival.survival_id", "segment")
    // different id, different survival list, reversed array, reordered cols
    val b = Seq(("OTHER", Seq("zz"), "AUTO"))
      .toDF("participant_id", "survival.survival_id", "segment")
      .select(col("segment"), col("`survival.survival_id`"), col("participant_id"))
    def hash(df: org.apache.spark.sql.DataFrame): String =
      df.select(Deduper.contentHash("participant", df)).as[String].collect().head
    assert(hash(a) == hash(b), "volatile fields and orderings must not affect the hash")

    val c = Seq(("P1", Seq("s1"), "BUILDING"))
      .toDF("participant_id", "survival.survival_id", "segment")
    assert(hash(a) != hash(c), "real content must affect the hash")
  }

  test("struct content key groups exactly where the sha1 canonical-JSON hash does") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    // normalization invariance must carry over from contentHash to
    // contentKey: volatile fields/array order blanked or sorted the same
    // way, so the two keyings induce the same partition of the rows
    val df = Seq(
      ("P1", Seq("s2", "s1"), "AUTO", null.asInstanceOf[String]),
      ("OTHER", Seq("zz"), "AUTO", null.asInstanceOf[String]),   // dup of row 1
      ("P1", Seq("s1"), "BUILDING", null.asInstanceOf[String]),
      ("P2", Seq.empty[String], "BUILDING", "x"))
      .toDF("participant_id", "survival.survival_id", "segment", "note")
    val keys = df.select(
      Deduper.contentHash("participant", df).as("h"),
      Deduper.contentKey("participant", df).as("k"))
    // each sha1 class maps to exactly one struct class and vice versa
    val classes = keys.groupBy(col("h"))
      .agg(countDistinct(col("k")).as("nk")).collect()
    assert(classes.forall(_.getAs[Long]("nk") == 1L))
    assert(keys.select(col("h")).distinct.count() ==
      keys.select(col("k")).distinct.count())
  }

  test("min(struct) dedup equals the legacy sha1-keyed window plan") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val t1 = frame(Seq(
      ("uuid-a", "Neuroblastoma", "P1"), ("uuid-b", "Glioma", "P2"),
      ("uuid-e", "Glioma", "P2")))                     // in-transformation dup
    val t2 = frame(Seq(
      ("uuid-c", "Neuroblastoma", "P1"), ("uuid-d", "Astrocytoma", "P3")))
    val frames = Seq(("xform1", 0, t1), ("xform2", 1, t2))
    val (deduped, _) = Deduper.dedupe(
      "diagnosis", frames, Some("participant.participant_id"))

    // the pre-round-6 plan: sha1(canonical JSON) string key + row_number
    val tagged = frames.map { case (n, o, df) =>
      df.withColumn("__xform", lit(n)).withColumn("__xorder", lit(o))
    }.reduce(_ unionByName _)
    val keyed = tagged.withColumn("__key", concat_ws("",
      Deduper.contentHash("diagnosis", tagged),
      col("`participant.participant_id`")))
    val w = Window.partitionBy(col("__key")).orderBy(col("__xorder"), col("__xform"))
    val legacy = keyed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__xform", "__xorder", "__key", "__rn")

    // survivors differ only in generated id on tie groups, so compare the
    // content columns (set equality) and the winning id on untied groups
    val got = deduped.select("diagnosis", "`participant.participant_id`")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = legacy.select("diagnosis", "`participant.participant_id`")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want)
    assert(deduped.count() == legacy.count())
    val nb = deduped.filter(col("diagnosis") === "Neuroblastoma").collect()
    assert(nb.head.getAs[String]("diagnosis_id") == "uuid-a")
  }

  test("same content for different participants is NOT deduped") {
    val t1 = frame(Seq(("u1", "Glioma", "P1"), ("u2", "Glioma", "P2")))
    val (deduped, report) = Deduper.dedupe(
      "diagnosis", Seq(("x", 0, t1)), Some("participant.participant_id"))
    assert(deduped.count() == 2)
    assert(report.isEmpty)
  }
}
