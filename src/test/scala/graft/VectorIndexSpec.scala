package graft

import java.nio.file.Files

import graft.functions.Similarity
import graft.pipeline.VectorIndex

/** The maintained semantic-dedup index must be a CACHE of work, never a
  * change of semantics: admission through the persisted postings/vectors
  * tables equals [[Similarity.admitVectorBatch]] over the equivalent
  * in-memory corpus at every maintenance step.
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val p = VectorIndex.Params(dim = 64)
  private val tau = 0.4

  test("persisted-index admission ≡ on-the-fly admission across maintenance steps") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val dir = Files.createTempDirectory("graft-vecindex").toString
    // three daily batches carve up the corpus deterministically
    val batches = (0 until 3).map(i => emb.filter($"vec_id" % 3 === i))

    var corpus = emb.filter($"vec_id" < 0) // empty, right schema
    batches.zipWithIndex.foreach { case (batch, step) =>
      val viaIndex = VectorIndex.admitAndAppend(spark, dir, batch, tau, p)
        .select($"vec_id").as[Long].collect().toSet
      val direct = Similarity.admitVectorBatch(corpus, batch, tau, dim = 64)
        .select($"vec_id").as[Long].collect().toSet
      assert(viaIndex === direct, s"index diverged from direct admission at step $step")
      // the in-memory corpus mirror grows by exactly the admitted rows
      corpus = corpus.unionByName(batch.filter($"vec_id".isin(viaIndex.toSeq: _*)))
      // and the index tables hold exactly the admitted corpus so far
      val held = VectorIndex.vectors(spark, dir).select($"_id").as[Long].collect().toSet
      assert(held === corpus.select($"vec_id").as[Long].collect().toSet)
    }
    // postings stay consistent with vectors: same ids, `tables` rows each
    val postingCounts = VectorIndex.postings(spark, dir)
      .groupBy($"_id").count().as[(Long, Long)].collect().toMap
    val heldIds = VectorIndex.vectors(spark, dir).select($"_id").as[Long].collect().toSet
    assert(postingCounts.keySet === heldIds)
    assert(postingCounts.values.forall(_ === p.tables.toLong))
    // step-2 admission really exercised the cross path (non-trivial corpus)
    assert(heldIds.nonEmpty && heldIds.size < emb.count())
  }

  test("admit is a pure read: admitting twice without append gives the same answer") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = Files.createTempDirectory("graft-vecindex-pure").toString
    VectorIndex.append(spark, dir, emb.filter($"vec_id" % 2 === 0), p)
    val batch = emb.filter($"vec_id" % 2 === 1)
    val a = VectorIndex.admit(spark, dir, batch, tau, p).select($"vec_id").as[Long].collect().toSet
    val b = VectorIndex.admit(spark, dir, batch, tau, p).select($"vec_id").as[Long].collect().toSet
    assert(a === b)
    val held = VectorIndex.vectors(spark, dir).count()
    assert(held === emb.filter($"vec_id" % 2 === 0).count(), "admit must not mutate the index")
  }
}
