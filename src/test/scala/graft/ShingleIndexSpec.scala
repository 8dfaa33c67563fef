package graft

import java.nio.file.Files

import graft.functions.NearDup
import graft.pipeline.ShingleIndex

/** The maintained Jaccard near-dup index must be a CACHE of work, never a
  * change of semantics: admission through the persisted postings/shingle
  * tables equals [[NearDup.admitBatch]] over the equivalent in-memory
  * corpus at every maintenance step.
  */
class ShingleIndexSpec extends SparkSpec {
  import spark.implicits._

  private val p = ShingleIndex.Params(n = 3, minJaccard = 0.5)

  test("persisted-index admission ≡ on-the-fly admission across maintenance steps") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = Files.createTempDirectory("graft-shindex").toString
    val batches = (0 until 3).map(i => docs.filter($"doc_id" % 3 === i))

    var corpus = docs.filter($"doc_id" < 0) // empty, right schema
    batches.zipWithIndex.foreach { case (batch, step) =>
      val viaIndex = ShingleIndex.admitAndAppend(spark, dir, batch, p)
        .select($"doc_id").as[Long].collect().toSet
      val direct = NearDup.admitBatch(corpus, batch, "text", "doc_id",
        p.n, p.minJaccard).select($"doc_id").as[Long].collect().toSet
      assert(viaIndex === direct, s"index diverged from direct admission at step $step")
      corpus = corpus.unionByName(batch.filter($"doc_id".isin(viaIndex.toSeq: _*)))
      // the index tables hold exactly the admitted corpus so far
      val held = ShingleIndex.shingles(spark, dir).select($"_id").as[Long].collect().toSet
      assert(held === corpus.select($"doc_id").as[Long].collect().toSet)
    }
    // postings stay consistent with the shingle sets: same ids, and each
    // doc's posting count equals its distinct-shingle count
    val postingCounts = ShingleIndex.postings(spark, dir)
      .groupBy($"_id").count().as[(Long, Long)].collect().toMap
    val shingleSizes = ShingleIndex.shingles(spark, dir)
      .select($"_id", org.apache.spark.sql.functions.size($"_sh").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(postingCounts === shingleSizes.filter(_._2 > 0L))
    // the dedup really dropped something and kept something
    val all = docs.select($"doc_id").as[Long].collect().toSet
    val held = shingleSizes.keySet
    assert(held.nonEmpty && held.size < all.size)
  }

  test("admission hot-key counting runs on the batch-restricted postings (plan shape)") {
    // the ∝-corpus-per-batch term the round-12 admission probe measured:
    // hot-key pruning must aggregate the postings AFTER the leftsemi
    // restriction to the batch's probe keys, never the full corpus index.
    // lazyHotKeys keeps the whole admission in ONE inspectable plan (eager
    // mode checkpoints the hot set at construction, hiding the aggregate).
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = Files.createTempDirectory("graft-shindex-plan").toString
    ShingleIndex.append(spark, dir, docs.filter($"doc_id" % 2 === 0), p)
    spark.conf.set("spark.graft.lazyHotKeys", "true")
    try {
      // inspect the pair-generation plan directly: admit() eagerly
      // materializes the pairs, which hides the candidate machinery
      // behind a checkpointed leaf in admit()'s own plan
      val df = NearDup.incrementalJaccardPairsIndexed(
        ShingleIndex.postings(spark, dir), ShingleIndex.shingles(spark, dir),
        docs.filter($"doc_id" % 2 === 1), "text", "doc_id", p.n, p.minJaccard,
        p.maxBucket)
      val plan = df.queryExecution.optimizedPlan
      // only aggregates that READ the corpus postings TABLE (a parquet
      // LogicalRelation leaf) — the batch-key distinct is also an Aggregate
      // on _h, but it reads the checkpointed batch (LogicalRDD), and it
      // legitimately has no semi
      val hotAggs = plan.collect {
        case a: Aggregate if a.groupingExpressions.exists(
            _.references.exists(_.name == "_h")) &&
          a.collectLeaves().exists(
            _.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]) => a
      }
      assert(hotAggs.nonEmpty, "expected the hot-key aggregate in the plan")
      assert(hotAggs.forall(a =>
        a.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty),
        "hot-key count must aggregate the semi-restricted postings, " +
          s"not the full corpus index\n${plan.treeString}")
    } finally spark.conf.unset("spark.graft.lazyHotKeys")
  }

  test("admit is a pure read: admitting twice without append gives the same answer") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = Files.createTempDirectory("graft-shindex-pure").toString
    ShingleIndex.append(spark, dir, docs.filter($"doc_id" % 2 === 0), p)
    val batch = docs.filter($"doc_id" % 2 === 1)
    val a = ShingleIndex.admit(spark, dir, batch, p).select($"doc_id").as[Long].collect().toSet
    val b = ShingleIndex.admit(spark, dir, batch, p).select($"doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(ShingleIndex.shingles(spark, dir).count() ===
      docs.filter($"doc_id" % 2 === 0).count(), "admit must not mutate the index")
  }
}
