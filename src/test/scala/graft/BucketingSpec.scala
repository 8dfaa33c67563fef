package graft

import org.apache.spark.sql.functions._

import graft.sources.Landing

/** Proof that the bucketed layout buys shuffle-free keyed joins: two tables
  * bucketed by the same key join with zero Exchange operators, where the
  * plain-parquet join shuffles both sides. This is the plan property the
  * 100 TB merge path depends on.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(p: String): Int = "Exchange".r.findAllIn(p).size

  test("bucketed-by-key join plans zero exchanges; plain parquet join shuffles") {
    val n = 10000
    val facts = (1 to n).map(i => (i.toLong % 500, i.toLong, s"e$i"))
      .toDF("user_id", "event_id", "payload")
    val dims = (0L until 500L).map(u => (u, s"user-$u")).toDF("user_id", "attr")
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")
    Landing.writeBucketed(facts, "b_facts", "user_id", buckets = 8, mode = "overwrite")
    Landing.writeBucketed(dims, "b_dims", "user_id", buckets = 8, mode = "overwrite")
    // force the sort-merge path so the assertion is about bucketing, not a
    // broadcast that would also skip the exchange
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = spark.table("b_facts").join(spark.table("b_dims"), "user_id")
      val bp = bucketed.queryExecution.executedPlan.toString
      assert(bucketed.count() === n)
      assert(exchanges(bp) === 0, "bucketed join must not shuffle:\n" + bp.take(800))
      // control: the same join over non-bucketed data shuffles both sides
      val plain = facts.join(dims, "user_id")
      val pp = plain.queryExecution.executedPlan.toString
      assert(exchanges(pp) >= 2, "control should shuffle:\n" + pp.take(400))
      // row parity between the two paths
      assert(bucketed.select("user_id", "event_id", "attr")
        .exceptAll(plain.select("user_id", "event_id", "attr")).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("bucketed group-by on the bucket key aggregates without an exchange") {
    val df = (1 to 5000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "v")
    spark.sql("DROP TABLE IF EXISTS b_agg")
    Landing.writeBucketed(df, "b_agg", "k", buckets = 4, mode = "overwrite")
    try {
      val agg = spark.table("b_agg").groupBy("k").agg(sum("v").as("s"))
      val p = agg.queryExecution.executedPlan.toString
      assert(agg.count() === 100)
      assert(exchanges(p) === 0, "bucketed agg must not shuffle:\n" + p.take(800))
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
