package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.NodeType

/** K1: the harmonized JSON document sink — one doc per transformation keyed
  * by pluralized node names (reference etl/target/c3dc_etl.py:630-636,
  * 1614-1617).
  *
  * Two modes:
  *  - `document`: assemble the single pretty JSON object on the driver
  *    (reference-parity output; fine at study scale, thousands of records);
  *  - `writeDistributed`: one JSON-lines directory per node type — the
  *    100 TB path; each record is the same flat JSON object, nulls kept.
  */
object HarmonizedJsonSink {

  private def recordJson(df: DataFrame) = {
    val fields = df.columns.filterNot(_.startsWith("__")).sorted
      .map(c => col("`" + c + "`"))
    df.select(to_json(struct(fields.toIndexedSeq: _*),
      Map("ignoreNullFields" -> "false")).as("json"))
  }

  /** Whole harmonized document as one JSON string (driver-side assembly). */
  def document(nodes: Map[String, DataFrame]): String = {
    val parts = nodes.toSeq.sortBy(_._1).map { case (node, df) =>
      val records = recordJson(df).collect().map(_.getString(0))
      "\"" + NodeType.pluralize(node) + "\": [\n    " +
        records.mkString(",\n    ") + "\n  ]"
    }
    parts.mkString("{\n  ", ",\n  ", "\n}")
  }

  def writeDocument(nodes: Map[String, DataFrame], path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), document(nodes))

  /** Scale path: per-node JSON-lines directories under `dir`. */
  def writeDistributed(nodes: Map[String, DataFrame], dir: String): Unit =
    nodes.foreach { case (node, df) =>
      recordJson(df).write.mode("overwrite")
        .text(s"$dir/${NodeType.pluralize(node)}")
    }
}
