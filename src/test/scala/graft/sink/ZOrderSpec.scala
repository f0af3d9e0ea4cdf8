package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {

  /** Reference interleave on the driver, bit by bit. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zorderValue matches the bitwise reference interleave") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (255L, 256L))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), TableLayout.zorderValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"($x,$y)")
    }
  }

  /** File-level min/max boxes under each layout: how many of the written
    * files could contain rows matching a box predicate? (At parquet scale
    * each file here stands in for a row group — same stats, same pruning.)
    */
  private def filesIntersecting(path: String, xr: (Long, Long), yr: (Long, Long)): (Long, Long) = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("xmin"), max("x").as("xmax"),
        min("y").as("ymin"), max("y").as("ymax"))
    val total = stats.count()
    val hit = stats.filter(
      col("xmax") >= xr._1 && col("xmin") <= xr._2 &&
        col("ymax") >= yr._1 && col("ymin") <= yr._2).count()
    (hit, total)
  }

  test("Z-order layout prunes 2-D boxes where a linear sort layout cannot") {
    import spark.implicits._
    // uniform 256x256 grid of (x, y) keys
    val grid = for { x <- 0L until 256L; y <- 0L until 256L } yield (x, y)
    val df = grid.toDF("x", "y")
    val dir = Files.createTempDirectory("zorder").toFile.getAbsolutePath

    TableLayout.writeZOrdered(df, s"$dir/z", 16, col("x"), col("y"))
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/linear")

    // box selective ONLY on y (the non-leading dimension): the linear
    // layout must touch every file; the Z layout touches only the files
    // whose tiles intersect the y band.
    val (zHit, zTotal) = filesIntersecting(s"$dir/z", (0L, 255L), (0L, 63L))
    val (lHit, lTotal) = filesIntersecting(s"$dir/linear", (0L, 255L), (0L, 63L))
    assert(zTotal == 16 && lTotal == 16)
    assert(lHit == 16, s"x-sorted layout should be unprunable on y (hit $lHit)")
    assert(zHit <= 8, s"Z layout should prune the y band to tiles (hit $zHit)")

    // box selective on BOTH dims: Z keeps pruning
    val (zBox, _) = filesIntersecting(s"$dir/z", (0L, 63L), (0L, 63L))
    assert(zBox <= 4, s"Z layout should isolate a quadrant corner (hit $zBox)")
  }

  test("compact rewrites a small-files dataset into the target count, data intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact").toFile.getAbsolutePath + "/t"
    val df = (1L to 10000L).toDF("k")
    df.repartition(64).write.parquet(dir)
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (before, after) = TableLayout.compact(spark, dir, targetFileBytes = bytes / 4)
    assert(before == 64 && after <= 5, s"$before -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000L && back.agg(sum("k")).first.getLong(0) == 10000L * 10001L / 2)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) == after)
  }
}
