package graft

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestStore
import graft.sources.ManifestStore.MergeClause

/** Randomized semantics check for the general MERGE engine
  * ([[ManifestStore.mergeRows]]): random clause lattices — conditional
  * matched UPDATE/DELETE chains, conditional inserts, by-source clauses,
  * including the canonical star/star shape the image-elision fast path
  * takes — must match a plain-Scala reference evaluator row for row on
  * random tables and sources. Conditions come from a tiny DSL evaluated
  * BOTH ways (as Catalyst columns and as Scala lambdas), so the oracle
  * shares no code with the engine.
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k BIGINT, a BIGINT, b BIGINT")

  private def tmpDir(): String =
    Files.createTempDirectory("graft-merge-prop").toString

  /** cond DSL: (column, modulus, remainder) ⇒ col % modulus == remainder;
    * None = unconditional. Target side draws from (k, a, b), source side
    * from the __s_ twins.
    */
  private case class Cnd(colName: String, m: Long, r: Long) {
    def column: Column = col(colName) % m === r
    def eval(row: Map[String, Long]): Boolean = row(colName) % m == r
  }

  private case class Row3(k: Long, a: Long, b: Long) {
    def m: Map[String, Long] = Map("k" -> k, "a" -> a, "b" -> b)
  }

  test("random clause lattices match the reference evaluator") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val dir = tmpDir()
      def rndRows(n: Int, keyLo: Long, keyHi: Long): Seq[Row3] =
        // keys drawn WITH replacement: duplicate target keys exercise the
        // row-preserving path, duplicate source keys the cardinality error
        (1 to n).map(_ => Row3(keyLo + rnd.nextLong(keyHi - keyLo),
          rnd.nextLong(50), rnd.nextLong(50)))
      val target = rndRows(30, 0, 25)
      ManifestStore.append(target.map(r => (r.k, r.a, r.b))
        .toDF("k", "a", "b").repartition(3), dir)
      // source keys half-overlap the target key space; de-dup source keys
      // so cardinality violations stay a SEPARATELY tested case
      val source = rndRows(20, 10, 40)
        .groupBy(_.k).map(_._2.head).toSeq.sortBy(_.k)

      def someCnd(side: String): Option[Cnd] =
        if (rnd.nextBoolean()) None
        else Some(Cnd((side match {
          case "t" => Seq("k", "a", "b")
          case "s" => Seq("__s_k", "__s_a", "__s_b")
          case _ => Seq("k", "a", "b", "__s_a", "__s_b")
        })(rnd.nextInt(3)), 2 + rnd.nextInt(3), rnd.nextInt(2)))

      // matched clauses: 0-2, each DELETE or UPDATE (partial or star)
      val matched = (0 until rnd.nextInt(3)).map { _ =>
        val cnd = someCnd("ts")
        if (rnd.nextBoolean()) (cnd, None) // DELETE
        else if (rnd.nextBoolean()) // star update (canonical candidate)
          (cnd, Some(Map("k" -> "__s_k", "a" -> "__s_a", "b" -> "__s_b")))
        else (cnd, Some(Map("a" -> "__s_a"))) // partial
      }
      val notMatched = (0 until rnd.nextInt(2)).map { _ =>
        (someCnd("s"), Some(Map("k" -> "__s_k", "a" -> "__s_a", "b" -> "__s_b")))
      }
      val bySource = (0 until rnd.nextInt(2)).map { _ =>
        val cnd = someCnd("t")
        if (rnd.nextBoolean()) (cnd, None) else (cnd, Some(Map("b" -> "a")))
      }
      if (matched.isEmpty && notMatched.isEmpty && bySource.isEmpty) ()
      else {
        // --- engine ---
        val srcDf = source.map(r => (r.k, r.a, r.b)).toDF("k", "a", "b")
          .select(col("k").as("__s_k"), col("a").as("__s_a"), col("b").as("__s_b"))
        def toClause(c: (Option[Cnd], Option[Map[String, String]])): MergeClause =
          MergeClause(c._1.map(_.column),
            c._2.map(_.map { case (t, s) => t -> col(s) }))
        val res = ManifestStore.mergeRows(spark, dir, schema, srcDf,
          col("k") === col("__s_k"),
          matched.map(toClause), notMatched.map(toClause),
          bySource.map(toClause), Seq("k" -> col("__s_k")))
        assert(res.nonEmpty, s"seed $seed: merge lost a race with nothing racing")

        // --- reference ---
        def applies(c: Option[Cnd], row: Map[String, Long]): Boolean =
          c.forall(_.eval(row))
        val srcByKey = source.map(r => r.k -> r).toMap
        val kept = scala.collection.mutable.Buffer[Row3]()
        target.foreach { t =>
          srcByKey.get(t.k) match {
            case Some(s) => // matched: first applicable clause wins
              val both = t.m ++ s.m.map { case (c, v) => s"__s_$c" -> v }
              matched.find(c => applies(c._1, both)) match {
                case None => kept += t // no clause: row stays
                case Some((_, None)) => () // DELETE
                case Some((_, Some(set))) =>
                  def nv(c: String, old: Long) =
                    set.get(c).map(sc => both(sc)).getOrElse(old)
                  kept += Row3(nv("k", t.k), nv("a", t.a), nv("b", t.b))
              }
            case None => // not matched by source
              bySource.find(c => applies(c._1, t.m)) match {
                case None => kept += t
                case Some((_, None)) => ()
                case Some((_, Some(set))) =>
                  def nv(c: String, old: Long) =
                    set.get(c).map(tc => t.m(tc)).getOrElse(old)
                  kept += Row3(nv("k", t.k), nv("a", t.a), nv("b", t.b))
              }
          }
        }
        val targetKeys = target.map(_.k).toSet
        source.filterNot(s => targetKeys(s.k)).foreach { s =>
          val srow = s.m.map { case (c, v) => s"__s_$c" -> v }
          notMatched.find(c => applies(c._1, srow)).foreach { case (_, Some(set)) =>
            def nv(c: String) = set.get(c).map(sc => srow(sc)).getOrElse(0L)
            kept += Row3(nv("k"), nv("a"), nv("b"))
          case _ => ()
          }
        }
        val got = ManifestStore.readLatest(spark, dir)
          .as[(Long, Long, Long)].collect().toSeq.sorted
        val want = kept.map(r => (r.k, r.a, r.b)).toSeq.sorted
        assert(got === want, s"seed $seed lattice m=$matched nm=$notMatched bs=$bySource")
      }
    }
  }

  test("duplicate matched source rows error; duplicate targets row-preserve") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, 0L, 0L), (1L, 1L, 1L), (2L, 2L, 2L))
      .toDF("k", "a", "b"), dir)
    def src(rows: (Long, Long, Long)*) = rows.toSeq.toDF("k", "a", "b")
      .select(col("k").as("__s_k"), col("a").as("__s_a"), col("b").as("__s_b"))
    val star = Seq(MergeClause(None,
      Some(Map("k" -> col("__s_k"), "a" -> col("__s_a"), "b" -> col("__s_b")))))
    // two target rows share k=1: each updates (multiplicity preserved)
    assert(ManifestStore.mergeRows(spark, dir, schema, src((1L, 9L, 9L)),
      col("k") === col("__s_k"), star, star).nonEmpty)
    assert(ManifestStore.readLatest(spark, dir).as[(Long, Long, Long)]
      .collect().toSeq.sorted ===
      Seq((1L, 9L, 9L), (1L, 9L, 9L), (2L, 2L, 2L)))
    // two SOURCE rows hit one target row: cardinality violation, no commit
    val v = ManifestStore.currentSnapshot(spark, dir).get.version
    intercept[UnsupportedOperationException] {
      ManifestStore.mergeRows(spark, dir, schema,
        src((2L, 7L, 7L), (2L, 8L, 8L)),
        col("k") === col("__s_k"), star, star)
    }
    assert(ManifestStore.currentSnapshot(spark, dir).get.version === v)
  }
}
