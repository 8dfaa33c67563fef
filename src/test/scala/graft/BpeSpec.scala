package graft

import org.apache.spark.sql.functions._

/** BPE merge learning against the Sennrich et al. 2016 worked example:
  * corpus {low×5, lower×2, newest×6, widest×3} (no end-of-word marker).
  * Hand-derived merge sequence:
  *   1. (e,s)  count 9 — ties (s,t) at 9, left-asc tiebreak picks e
  *   2. (es,t) count 9
  *   3. (l,o)  count 7 — ties (o,w) at 7, left-asc picks l
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.Bpe

  private def sennrich = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq(words.mkString(" ")).toDF("text")
  }

  test("mergePairCounts ranks iteration-1 pairs by (count desc, pair asc)") {
    val top = Bpe.mergePairCounts(sennrich, $"text", k = 4)
      .as[(String, Long)].collect().toSeq
    // es/st tie at 9 → pair-asc puts es first; we=8; lo/ow tie at 7 → lo
    assert(top === Seq(("es", 9L), ("st", 9L), ("we", 8L), ("lo", 7L)))
  }

  test("train learns the Sennrich merge sequence with deterministic tiebreaks") {
    val merges = Bpe.train(sennrich, $"text", merges = 3)
    assert(merges === Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)))
  }

  test("train merge application is greedy left-to-right, non-overlapping") {
    // aaaa under (a,a): [aa, aa] — so iteration 2's top pair is (aa, aa)
    val df = Seq("aaaa aaaa aaaa").toDF("text")
    val merges = Bpe.train(df, $"text", merges = 2)
    assert(merges.head === (("a", "a", 9L))) // 3 adjacent pairs × 3 words
    assert(merges(1) === (("aa", "aa", 3L)))
  }

  test("train stops early when fully merged; null/empty text contribute nothing") {
    val df = Seq(Some("ab ab"), None, Some(""), Some("   ")).toDF("text")
    val merges = Bpe.train(df, $"text", merges = 10)
    assert(merges === Seq(("a", "b", 2L))) // after (a,b) no pairs remain
  }

  test("segment applies learned merges in order; train→segment round-trips the vocab") {
    val merges = Bpe.train(sennrich, $"text", merges = 3)
      .map { case (l, r, _) => (l, r) }
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o")))
    val words = Seq("low", "lower", "newest", "widest", "lowest", "", "slow")
      .toDF("w")
    val seg = words.select($"w", Bpe.segment(words, $"w", merges).as("s"))
      .as[(String, Seq[String])].collect().toMap
    // the training words segment exactly as the final vocab table held them
    assert(seg("low") === Seq("lo", "w"))
    assert(seg("lower") === Seq("lo", "w", "e", "r"))
    assert(seg("newest") === Seq("n", "e", "w", "est"))
    assert(seg("widest") === Seq("w", "i", "d", "est"))
    // an UNSEEN word reuses the learned subwords
    assert(seg("lowest") === Seq("lo", "w", "est"))
    assert(seg("slow") === Seq("s", "lo", "w"))
    assert(seg("") === Seq.empty)
  }

  test("encodedTokenCount shrinks monotonically as merges are learned") {
    val df = sennrich
    val counts = (0 to 3).map { m =>
      val merges = Bpe.train(df, $"text", merges = m).map { case (l, r, _) => (l, r) }
      df.select(Bpe.encodedTokenCount(df, $"text", merges).as("c"))
        .as[Long].collect().head
    }
    // 16 words × their char lengths = 3·5+2·5... compute: low(3)×5 + lower(5)×2 +
    // newest(6)×6 + widest(6)×3 = 15+10+36+18 = 79 chars at 0 merges
    assert(counts.head === 79L)
    assert(counts.sliding(2).forall(p => p(1) < p.head), s"not shrinking: $counts")
  }

  test("wordFrequencies collapses the corpus to vocab-sized rows") {
    val wf = Bpe.wordFrequencies(sennrich, $"text")
      .as[(String, Long)].collect().toMap
    assert(wf === Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
  }
}
