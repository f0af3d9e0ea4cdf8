package graft.sink

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkTestBase

class HarmonizedJsonSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def nodes = Map(
    "participant" -> Seq(("P1", "Auto"), ("P2", null))
      .toDF("participant_id", "segment"),
    "study" -> Seq("ST1").toDF("study_id"))

  test("document mode: pluralized arrays, sorted fields, nulls kept") {
    val doc = new ObjectMapper().readTree(HarmonizedJsonSink.document(nodes))
    assert(doc.get("participants").size() == 2)
    assert(doc.get("studies").size() == 1)
    val p2 = doc.get("participants").elements().asScala
      .find(_.get("participant_id").asText() == "P2").get
    assert(p2.has("segment") && p2.get("segment").isNull) // nulls serialized
  }

  test("distributed mode: one JSON-lines dir per pluralized node") {
    val dir = Files.createTempDirectory("graft_k1").toString
    HarmonizedJsonSink.writeDistributed(nodes, dir)
    val parts = spark.read.json(s"$dir/participants")
    assert(parts.count() == 2)
    assert(parts.columns.sorted.toSeq == Seq("participant_id", "segment"))
    assert(spark.read.json(s"$dir/studies").count() == 1)
  }

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
