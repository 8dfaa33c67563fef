package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[GenScale]], the deterministic sfN scaling generator: identical
  * bytes across runs (cross-round sfN bench comparisons assume it),
  * copy 0 verbatim-equal to the source (probe literals in the suite must
  * hit the same rows at every scale), counts scaling by K with the
  * fixed-dims exception, and join preservation under the key shifts.
  */
class GenScaleSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Order- and layout-insensitive content fingerprint. */
  private def contentHash(df: DataFrame): (Long, java.math.BigDecimal) = {
    val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
    (h.count(),
      h.agg(sum(col("h").cast("decimal(38,0)"))).head().getDecimal(0))
  }

  test("K=3 over sf0.001: deterministic across runs, counts ×K, copy 0 verbatim, joins preserved") {
    val k = 3
    val d1 = Files.createTempDirectory("genscale1").toString
    val d2 = Files.createTempDirectory("genscale2").toString
    GenScale.run(spark, src, d1, k)
    GenScale.run(spark, src, d2, k)
    tables.foreach { t =>
      val a = spark.read.parquet(s"$d1/$t.parquet")
      val b = spark.read.parquet(s"$d2/$t.parquet")
      assert(contentHash(a) === contentHash(b), s"$t not deterministic")
      val srcN = spark.read.parquet(s"$src/$t.parquet").count()
      // nation/region are fixed dims (TPC-H law): they do not scale
      val want = if (t == "region" || t == "nation") srcN else srcN * k
      assert(a.count() === want, s"$t count must scale by K")
    }
    // copy 0 (keys below the copy-1 offset) is the source VERBATIM —
    // including text bytes and n_chars, which copies 1..K−1 perturb
    Seq("documents" -> "doc_id", "embeddings" -> "vec_id",
      "orders" -> "o_orderkey").foreach { case (t, key) =>
      val off = t match { case "orders" => 10000000L; case _ => 1000000L }
      val copy0 = spark.read.parquet(s"$d1/$t.parquet").filter(col(key) < off)
      val source = spark.read.parquet(s"$src/$t.parquet")
      assert(copy0.exceptAll(source).isEmpty && source.exceptAll(copy0).isEmpty,
        s"copy 0 of $t must be byte-identical to the source")
    }
    // join preservation: every scaled order references a scaled customer
    val orphans = spark.read.parquet(s"$d1/orders.parquet")
      .join(spark.read.parquet(s"$d1/customer.parquet"),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans === 0L, "key shifts must preserve the orders→customer join")
  }
}
