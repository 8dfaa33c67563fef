package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Landing

/** Z-order layout: bit-interleave correctness against a reference
  * implementation, and the data-skipping claim itself — per-file min/max
  * ranges must prune point queries on the SECOND dimension, which a linear
  * sort on the first cannot.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits matches a reference Morton encoding") {
    def morton(xs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (i <- xs.indices; j <- 0 until bits)
        z |= ((xs(i) >> j) & 1L) << (j * xs.size + i)
      z
    }
    val rnd = new scala.util.Random(5)
    val rows = (1 to 200).map(_ => (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val df = rows.toDF("a", "b")
    val got = df.select(
        graft.plans.GraftFunctions.interleaveBits(df, Seq(col("a"), col("b")), 12).as("z"),
        col("a"), col("b"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (z, a, b) => assert(z === morton(Seq(a, b), 12)) }
    // locality sanity: z is monotone when both dims move together
    assert(morton(Seq(1L, 1L), 12) < morton(Seq(2L, 2L), 12))
  }

  test("z-ordered files prune point queries on the second dimension; x-sort cannot") {
    val rnd = new scala.util.Random(17)
    val df = (1 to 20000).map(_ => (rnd.nextDouble() * 1000, rnd.nextDouble() * 1000))
      .toDF("x", "y")
    val nFiles = 16

    def fileRanges(dir: String): Array[(Double, Double)] = {
      // per parquet file: (min(y), max(y)) — what footer-based skipping sees
      spark.read.parquet(dir)
        .select(col("y"), input_file_name().as("f"))
        .groupBy("f").agg(min("y").as("lo"), max("y").as("hi"))
        .select("lo", "hi").as[(Double, Double)].collect()
    }

    val zDir = Files.createTempDirectory("zorder").toString + "/t"
    Landing.writeZOrdered(df, zDir, Seq("x", "y"), numFiles = nFiles)
    val linDir = Files.createTempDirectory("linsort").toString + "/t"
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.parquet(linDir)

    val zRanges = fileRanges(zDir)
    val linRanges = fileRanges(linDir)
    assert(zRanges.length === nFiles && linRanges.length === nFiles)
    // candidate files for 50 random point-ish queries on y
    def candidates(ranges: Array[(Double, Double)]): Double = {
      val qs = (1 to 50).map(_ => rnd.nextDouble() * 1000)
      qs.map(q => ranges.count { case (lo, hi) => q >= lo && q <= hi }).sum / 50.0
    }
    val zCand = candidates(zRanges)
    val linCand = candidates(linRanges)
    // x-sorted files each span ~the full y range → ~all files are candidates;
    // z-ordered files must prune to a strict subset on average
    assert(linCand > nFiles * 0.8, s"control should not prune y: $linCand")
    assert(zCand < linCand * 0.7, s"z-order should prune y: $zCand vs $linCand")
    // and the data round-trips intact
    assert(spark.read.parquet(zDir).count() === 20000)
  }
}
