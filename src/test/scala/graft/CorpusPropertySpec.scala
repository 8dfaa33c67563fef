package graft

import org.apache.spark.sql.functions._
import graft.functions.Corpus
import graft.operators.Merge

/** Property-style invariants for the deterministic corpus operators over
  * seeded random fixtures: the md5 disciplines must be pure functions of
  * (id, salt) — blind to partitioning, ordering, and unrelated rows — and
  * the diff/sample operators must agree with brute-force references.
  */
class CorpusPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomDocs(seed: Int, n: Int = 40): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed)
    (1 to n).map { i =>
      val words = Seq.fill(3 + r.nextInt(8))(
        Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")(r.nextInt(6)))
      (r.nextInt(1000).toLong * 100 + i, words.mkString(" "))
    }
  }

  test("snapshot diff statuses partition the id space and match a brute-force reference") {
    (1 to 6).foreach { seed =>
      val r = new scala.util.Random(seed)
      val olds = randomDocs(seed).toMap
      val news = randomDocs(seed + 1).filter(_ => r.nextBoolean()).toMap ++
        olds.filter(_ => r.nextBoolean()).map { case (k, v) =>
          k -> (if (r.nextBoolean()) v + " edited" else v)
        }
      val out = Merge.snapshotDiff(olds.toSeq.toDF("id", "content"),
        news.toSeq.toDF("id", "content"), "id", "content")
        .as[(Long, String)].collect().toMap
      val expected = (olds.keySet ++ news.keySet).map { id =>
        id -> ((olds.get(id), news.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a == b => "unchanged"
          case _ => "changed"
        })
      }.toMap
      assert(out === expected, s"seed $seed")
    }
  }

  test("weighted sample: raising a sampled row's weight never evicts it") {
    (1 to 6).foreach { seed =>
      val r = new scala.util.Random(seed)
      val rows = (1L to 60L).map(i => (i, 1L + r.nextInt(50).toLong))
      val df = rows.toDF("id", "w")
      val picked = Corpus.weightedSample(df, "id", $"w", k = 12, salt = s"s$seed")
        .as[(Long, Double, Double)].collect()
      assert(picked.length === 12)
      // bump one sampled row's weight: its ln(u)/w key only improves, all
      // other keys are untouched, so it must survive the cut
      val bumpId = picked(r.nextInt(picked.length))._1
      val bumped = rows.map { case (i, w) => (i, if (i == bumpId) w * 3 else w) }
      val again = Corpus.weightedSample(bumped.toDF("id", "w"), "id", $"w",
        k = 12, salt = s"s$seed").as[(Long, Double, Double)].collect()
      assert(again.map(_._1).contains(bumpId), s"seed $seed: $bumpId evicted by a raise")
    }
  }

  test("split assignment is blind to unrelated rows: adding docs never moves a doc") {
    (1 to 6).foreach { seed =>
      val base = randomDocs(seed).toDF("id", "content")
      val more = (randomDocs(seed) ++ randomDocs(seed + 7).map {
        case (i, t) => (i + 1000000L, t)
      }).toDF("id", "content")
      val a = Corpus.splitAssign(base, "id", salt = "v1")
        .select($"id", $"split").as[(Long, String)].collect().toMap
      val b = Corpus.splitAssign(more, "id", salt = "v1")
        .select($"id", $"split").as[(Long, String)].collect().toMap
      a.foreach { case (id, s) => assert(b(id) === s, s"seed $seed: doc $id moved") }
    }
  }

  test("canonicalize is idempotent and caps the alphabet over random fixtures") {
    (1 to 6).foreach { seed =>
      val r = new scala.util.Random(seed)
      val noisy = randomDocs(seed).map { case (i, t) =>
        // inject case flips, punctuation, and whitespace runs
        val chars = t.flatMap { c =>
          val v = r.nextInt(6)
          if (v == 0) c.toUpper.toString
          else if (v == 1) s"$c  " else if (v == 2) s"$c," else c.toString
        }
        (i, chars)
      }.toDF("id", "content")
      import graft.functions.TextAnalysis.canonicalize
      val once = noisy.select($"id", canonicalize($"content").as("c1"))
      val twice = once.select($"id", $"c1", canonicalize($"c1").as("c2"))
      assert(twice.filter($"c1" =!= $"c2").isEmpty, s"seed $seed: not idempotent")
      val offAlphabet = twice.filter($"c1".rlike("[^a-z0-9 ]|^ | $|  "))
      assert(offAlphabet.isEmpty, s"seed $seed: alphabet/whitespace violation")
    }
  }

  test("budgetSelect invariants: prefix-closed, within budget, monotone in budget, order-blind") {
    (1 to 5).foreach { seed =>
      val r = new scala.util.Random(seed)
      val rows = (1L to 80L).map(i =>
        (i, 1L + r.nextInt(40).toLong, r.nextInt(12).toLong))
      val df = rows.toDF("doc_id", "n_tokens", "score")
      val kept = Corpus.budgetSelect(df, "doc_id", $"n_tokens", $"score", 1, 3)
        .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toMap
      val total = rows.map(_._2).sum
      // within budget, and cum matches the brute-force prefix order
      val order = rows.sortBy { case (id, _, sc) => (-sc, id) }
      var cum = 0L
      val expect = scala.collection.mutable.Map[Long, Long]()
      order.foreach { case (id, nt, _) =>
        cum += nt; if (cum <= total / 3) expect(id) = cum
      }
      assert(kept === expect.toMap, s"seed $seed")
      // a larger budget keeps a superset
      val keptBig = Corpus.budgetSelect(df, "doc_id", $"n_tokens", $"score", 2, 3)
        .select($"doc_id").as[Long].collect().toSet
      assert(kept.keySet.subsetOf(keptBig), s"seed $seed: not monotone")
      // partitioning/order blind
      val shuffled = Corpus.budgetSelect(df.repartition(7).sortWithinPartitions($"n_tokens"),
        "doc_id", $"n_tokens", $"score", 1, 3)
        .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toMap
      assert(shuffled === kept, s"seed $seed: order-dependent")
    }
  }

  test("kAnonymize invariants: k-guarantee on published prefixes, row count preserved, order-blind") {
    import graft.functions.Privacy
    (1 to 4).foreach { seed =>
      val r = new scala.util.Random(seed)
      val rows = (1L to 100L).map { i =>
        (i, s"s${r.nextInt(4)}", s"l${r.nextInt(5)}") }
      val df = rows.toDF("id", "src", "lang")
      val k = 7
      val out = Privacy.kAnonymize(df, "id",
        Seq("src" -> $"src", "lang" -> $"lang"), k)
      assert(out.count() === rows.size.toLong)
      // every non-* (src, lang) pair and every non-* src prefix crowds >= k
      assert(out.filter($"src" =!= "*" && $"lang" =!= "*")
        .groupBy($"src", $"lang").count().filter($"count" < k).isEmpty, s"seed $seed")
      assert(out.filter($"src" =!= "*")
        .groupBy($"src").count().filter($"count" < k).isEmpty, s"seed $seed")
      // a row is generalized the MINIMAL amount: level-1 rows' base pair
      // must genuinely crowd < k in the raw data
      val pairCounts = rows.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
      val lvl1 = out.filter($"anon_level" === 1).select($"id").as[Long].collect().toSet
      rows.filter(t => lvl1(t._1)).foreach { t =>
        assert(pairCounts((t._2, t._3)) < k, s"seed $seed: over-generalized ${t._1}")
      }
      val shuffled = Privacy.kAnonymize(df.repartition(5), "id",
        Seq("src" -> $"src", "lang" -> $"lang"), k)
      assert(out.exceptAll(shuffled).isEmpty && shuffled.exceptAll(out).isEmpty,
        s"seed $seed: order-dependent")
    }
  }

  test("rankNormalize invariants: pct in [0,1], strictly increasing in (score,id), order-blind") {
    (1 to 4).foreach { seed =>
      val r = new scala.util.Random(seed)
      val rows = (1L to 60L).map(i => (i, s"g${r.nextInt(3)}", r.nextInt(9).toLong))
      val df = rows.toDF("id", "g", "sc")
      val out = Corpus.rankNormalize(df, Seq("g"), $"sc", "id")
        .select($"id", $"g", $"score", $"pct").as[(Long, String, Long, Double)].collect()
      assert(out.forall(t => t._4 >= 0.0 && t._4 <= 1.0))
      out.groupBy(_._2).foreach { case (_, grp) =>
        val sorted = grp.sortBy(t => (t._3, t._1))
        // pct strictly increases along the stratum's total order
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._4 < b._4, s"seed $seed")
          case _ =>
        }
        assert(sorted.head._4 === 0.0 && (grp.length == 1 || sorted.last._4 === 1.0))
      }
      val shuffled = Corpus.rankNormalize(df.repartition(6), Seq("g"), $"sc", "id")
        .select($"id", $"pct").as[(Long, Double)].collect().toMap
      assert(shuffled === out.map(t => t._1 -> t._4).toMap, s"seed $seed")
    }
  }

  test("dup-span stats invariants: bounded fractions, blind to doc order, short docs null") {
    (1 to 4).foreach { seed =>
      val docs = randomDocs(seed, n = 30).toDF("doc_id", "text")
      import graft.functions.NearDup
      val out = NearDup.dupSpanStats(docs, "text", "doc_id", k = 3)
      // dup_windows never exceeds n_windows; frac only NULL when windowless
      assert(out.filter($"dup_windows" > $"n_windows").isEmpty)
      assert(out.filter($"dup_frac".isNull && $"n_windows" > 0).isEmpty)
      assert(out.filter($"dup_frac".isNotNull && $"n_windows" === 0).isEmpty)
      // repartitioning/shuffling the corpus cannot change any stat
      val shuffled = NearDup.dupSpanStats(
        docs.repartition(7).sortWithinPartitions($"text"), "text", "doc_id", k = 3)
      assert(out.exceptAll(shuffled).isEmpty && shuffled.exceptAll(out).isEmpty,
        s"seed $seed: order-dependent result")
    }
  }
}
