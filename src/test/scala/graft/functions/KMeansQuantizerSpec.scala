package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KMeansQuantizerSpec extends SparkTestBase {
  import spark.implicits._

  /** Three well-separated blobs around (0,0), (10000,0), (0,10000) milli. */
  private def blobs = {
    val rnd = new scala.util.Random(99)
    val centers = Seq((0L, 0L), (10000L, 0L), (0L, 10000L))
    (0 until 90).map { i =>
      val (cx, cy) = centers(i % 3)
      (i.toLong, Seq(cx + rnd.nextInt(400) - 200, cy + rnd.nextInt(400) - 200))
    }.toDF("id", "q")
  }

  test("training separates well-separated blobs into their own cells") {
    val (cents, assign) = KMeansQuantizer.train(blobs, "id", "q", k = 3, iters = 5)
    // every point of a blob lands in one cell, and cells are distinct
    val cellsPerBlob = assign.withColumn("blob", col("id") % 3)
      .groupBy(col("blob")).agg(countDistinct(col("cell")).as("nc"))
      .select("nc").as[Long].collect()
    assert(cellsPerBlob.forall(_ == 1L), s"blob split across cells: ${cellsPerBlob.toSeq}")
    assert(assign.select("cell").distinct().count() == 3)
    // centroids converge near the true blob centers (within the noise)
    val trueCenters = Set((0L, 0L), (10000L, 0L), (0L, 10000L))
    cents.foreach { c =>
      assert(trueCenters.exists { case (x, y) =>
        math.abs(c(0) - x) <= 250 && math.abs(c(1) - y) <= 250
      }, s"centroid ${c.toSeq} far from every true center")
    }
  }

  test("objective is monotonically non-increasing over iterations") {
    val costs = (0 to 4).map { it =>
      val (cents, _) = KMeansQuantizer.train(blobs, "id", "q", k = 3, iters = it)
      KMeansQuantizer.cost(blobs, "q", cents)
    }
    costs.sliding(2).foreach { case Seq(a, b) => assert(b <= a, s"cost rose: $costs") }
  }

  test("training is bit-deterministic under repartitioning") {
    val a = KMeansQuantizer.train(blobs, "id", "q", 3, 4)._1.map(_.toSeq).toSeq
    val b = KMeansQuantizer.train(blobs.repartition(7), "id", "q", 3, 4)._1.map(_.toSeq).toSeq
    assert(a == b)
  }

  test("assignment ties break to the lowest centroid index") {
    val cents = Array(Array(0L, 0L), Array(2L, 0L))
    val df = Seq((1L, Seq(1L, 0L))).toDF("id", "q") // equidistant
    val cell = df.select(KMeansQuantizer.assignCell(col("q"), cents)).as[Int].collect().head
    assert(cell == 0)
  }
}
