package graft

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.sources.ManifestStore

/** Per-file bloom indexes ([[ManifestStore.buildBlooms]]): the point-lookup
  * pruning layer for UNCLUSTERED tables, where every append spans the key
  * space and min/max footer stats admit every file. Contracts pinned here:
  * pruning is evidence-only (lookup results always equal the full scan),
  * builds are incremental (only un-bloomed files are scanned), blooms
  * travel the lineage exactly like stats (carried by appends, dropped by
  * rewrites, rekeyed by shallow clones), and an all-null column yields the
  * all-zero bloom that prunes every value probe.
  */
class ManifestBloomSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k BIGINT, v STRING")

  private def tmpDir(): String =
    Files.createTempDirectory("graft-bloom").toString

  private def strideDf(start: Int) =
    (start until 300 by 3).map(i => (i.toLong, s"s$i")).toDF("k", "v").repartition(1)

  private def snap(dir: String) = ManifestStore.currentSnapshot(spark, dir).get

  private def rows(dir: String): Set[(Long, String)] =
    ManifestStore.read(spark, dir, schema).as[(Long, String)].collect().toSet

  test("unclustered point lookup prunes via blooms, results equal the full scan") {
    val dir = tmpDir()
    ManifestStore.append(strideDf(0), dir) // keys ≡ 0 (mod 3)
    ManifestStore.append(strideDf(1), dir) // keys ≡ 1 (mod 3)
    ManifestStore.append(strideDf(2), dir) // keys ≡ 2 (mod 3)
    val before = snap(dir)
    assert(before.files.size === 3)
    // every file spans [start, ~299]: range stats cannot prune a point
    assert(ManifestStore.pruneFiles(before, "k", 4L, 4L).size === 3)

    val v = ManifestStore.buildBlooms(spark, dir, Seq("k", "v"))
    val after = snap(dir)
    assert(after.version === v && after.op === "bloom")
    assert(after.files === before.files) // metadata-only commit
    assert(after.blooms.keySet === before.files.toSet)

    // key 4 lives only in the stride-1 file; blooms must keep that file
    // and prune at least one of the others (≤1 deterministic false
    // positive tolerated at 1024 bits / 100 keys)
    val kept4 = ManifestStore.pruneFiles(after, "k", 4L, 4L)
    assert(kept4.size <= 2 && kept4.size < after.files.size)
    assert(ManifestStore.lookup(spark, dir, schema, "k", Seq(4L))
      .as[(Long, String)].collect().toSet === Set(4L -> "s4"))
    // an Int probe canonicalizes like the Long it is
    assert(ManifestStore.pruneFiles(after, "k", 4, 4).toSet === kept4.toSet)
    // absent key: every file should prune (no stride contains 1000)
    assert(ManifestStore.pruneFiles(after, "k", 1000L, 1000L).size <= 1)
    assert(ManifestStore.lookup(spark, dir, schema, "k", Seq(1000L)).count() === 0)
    // string-column blooms prune the same way
    val keptS = ManifestStore.pruneFiles(after, "v", "s17", "s17")
    assert(keptS.size <= 2)
    assert(ManifestStore.lookup(spark, dir, schema, "v", Seq("s17"))
      .as[(Long, String)].collect().toSet === Set(17L -> "s17"))
    // a RANGE probe ignores blooms (they answer only points)
    assert(ManifestStore.pruneFiles(after, "k", 0L, 10L).size === 3)
    // conjunctive planner sees the same point evidence
    assert(ManifestStore.pruneFilesWhere(after,
      Seq(("k", 4L, 4L))).toSet === kept4.toSet)
  }

  test("incremental build covers only new files; rewrites drop blooms; clone rekeys them") {
    val dir = tmpDir()
    ManifestStore.append(strideDf(0), dir)
    ManifestStore.append(strideDf(1), dir)
    ManifestStore.buildBlooms(spark, dir, Seq("k"))
    val v1 = snap(dir).version

    // an already-covered table: build is a no-op returning the current version
    assert(ManifestStore.buildBlooms(spark, dir, Seq("k")) === v1)

    // new append: its file is un-bloomed (kept by every probe — safe),
    // lookups stay correct
    ManifestStore.append(Seq((1000L, "x")).toDF("k", "v").repartition(1), dir)
    val mid = snap(dir)
    assert(mid.blooms.size === 2 && mid.files.size === 3)
    assert(ManifestStore.pruneFiles(mid, "k", 1000L, 1000L).size >= 1)
    assert(rows(dir).contains(1000L -> "x"))

    // incremental pass blooms just the new file
    val v2 = ManifestStore.buildBlooms(spark, dir, Seq("k"))
    assert(v2 > v1)
    val full = snap(dir)
    assert(full.blooms.size === 3)
    val kept = ManifestStore.pruneFiles(full, "k", 1000L, 1000L)
    assert(kept.size <= 2 &&
      kept.exists(r => full.blooms(r).get("k").exists(_.contains("1000"))))

    // compaction rewrites files: fresh files carry no blooms until rebuilt
    ManifestStore.compact(spark, dir, schema, numFiles = 1)
    val compacted = snap(dir)
    assert(compacted.files.size === 1 && compacted.blooms.isEmpty)
    assert(rows(dir).size === 201)
    ManifestStore.buildBlooms(spark, dir, Seq("k"))
    assert(snap(dir).blooms.keySet === compacted.files.toSet)

    // shallow clone: blooms rekey with the files and keep pruning
    val dst = tmpDir()
    ManifestStore.cloneShallow(spark, dir, dst)
    val cloned = snap(dst)
    assert(cloned.blooms.size === 1)
    assert(ManifestStore.lookup(spark, dst, schema, "k", Seq(4L))
      .as[(Long, String)].collect().toSet === Set(4L -> "s4"))
  }

  test("all-null column yields the all-zero bloom that prunes every probe") {
    val dir = tmpDir()
    ManifestStore.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1), dir)
    ManifestStore.append(
      Seq((3L, Option.empty[String]), (4L, Option.empty[String]))
        .toDF("k", "v").repartition(1), dir)
    ManifestStore.buildBlooms(spark, dir, Seq("v"))
    val s = snap(dir)
    // the null-only file can contain no value: pruned for ANY probe
    assert(ManifestStore.pruneFiles(s, "v", "a", "a").size === 1)
    assert(ManifestStore.pruneFiles(s, "v", "zzz", "zzz").size <= 1)
    assert(ManifestStore.lookup(spark, dir, schema, "v", Seq("a"))
      .as[(Long, String)].collect().toSet === Set(1L -> "a"))
    // a double column is refused (no canonical string space)
    val e = intercept[IllegalArgumentException] {
      ManifestStore.buildBlooms(spark, dir, Seq("missing"))
    }
    assert(e.getMessage.contains("missing"))
  }

  test("concurrent bloom builds on different columns compose") {
    import org.apache.hadoop.fs.{FileSystem, Path}
    import graft.sources.ManifestPublisher
    val dir = tmpDir()
    ManifestStore.append(strideDf(0), dir)
    ManifestStore.append(strideDf(1), dir)
    val underlying = ManifestPublisher.LocalLink
    @volatile var injected = false
    // the moment buildBlooms("v") publishes, land a REAL buildBlooms("k")
    // commit first: v's planning snapshot is now stale. The retry must
    // merge v's fresh blooms into the files' k blooms (prev at publish
    // time), not replace the per-file map from the stale snapshot.
    ManifestStore.publisherOverride = Some(new ManifestPublisher {
      def publish(f: FileSystem, target: Path, body: Array[Byte]): Boolean = {
        val s = new String(body, java.nio.charset.StandardCharsets.UTF_8)
        if (s.contains("\"op\":\"bloom\"") && !injected) {
          injected = true
          ManifestStore.publisherOverride = None
          try ManifestStore.buildBlooms(spark, dir, Seq("k"))
          finally ManifestStore.publisherOverride = Some(this)
        }
        underlying.publish(f, target, body)
      }
    })
    try {
      ManifestStore.buildBlooms(spark, dir, Seq("v"))
      assert(injected)
    } finally ManifestStore.publisherOverride = None
    val after = snap(dir)
    after.files.foreach { rel =>
      val cols = after.blooms.getOrElse(rel, Map.empty).keySet
      assert(cols === Set("k", "v"),
        s"file $rel lost a concurrently-built bloom column: $cols")
    }
    // and both prune correctly
    assert(ManifestStore.lookup(spark, dir, schema, "k", Seq(4L))
      .as[(Long, String)].collect().toSet === Set(4L -> "s4"))
  }
}
