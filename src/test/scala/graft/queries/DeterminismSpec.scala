package graft.queries

import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types.MapType

import graft.SparkTestBase

/** Every registry query must be bit-identical across two executions in
  * the same session: content-derived ids, total-order tie-breaks, and
  * integer-quantized similarity math are the engine's determinism
  * story (stable under partitioning, retries, and speculative
  * execution), and this converts it from a README claim into a
  * machine-checked invariant. Any future rand()/monotonic-id leak or a
  * partial tie-break in a top-k shows up here as a diff.
  */
class DeterminismSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("every registry query is bit-identical across two runs") {
    Registry.all.foreach { q =>
      def run() = {
        val df = q.fn(spark, sf)
        // set ops reject MapType columns — compare their JSON form
        val mapCols = df.schema.fields.filter(_.dataType.isInstanceOf[MapType]).map(_.name)
        mapCols.foldLeft(df)((d, c) => d.withColumn(c, to_json(col(c))))
      }
      val (a, b) = (run(), run())
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"${q.name} differs between two runs")
    }
  }
}
