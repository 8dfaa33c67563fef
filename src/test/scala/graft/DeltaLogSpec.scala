package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestStore

/** The manifest DELTA LOG: commits write adds/removes/metadata patches
  * with an explicit base pointer instead of re-serializing the full file
  * list, checkpointing every `graft.checkpoint.interval` commits — the
  * structural fix for the round-13 measured metadata term (bounded
  * maintenance paying manifest parse + rewrite ∝ TOTAL table files per
  * commit; BASELINE.md §Round 13). These specs pin:
  *   - the on-disk shape (deltas between checkpoints, full manifests at
  *     the interval and for table-rewriting commits),
  *   - COLD reconstruction equality (cache cleared) for every metadata
  *     plane the manifest carries — rows, stats pruning, blooms,
  *     partition values, dv tombstones, schema, props,
  *   - time travel / history / CDF / restore across delta chains,
  *   - vacuum retaining the base-chain closure of kept versions,
  *   - corpse-skipping base pointers (a crashed writer's unparseable
  *     claim is never anyone's base).
  */
class DeltaLogSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k BIGINT, v STRING")
  private val mapper = new ObjectMapper()

  private def tmpDir(): String =
    Files.createTempDirectory("graft-deltalog").toString

  private def df(pairs: (Long, String)*) = pairs.toDF("k", "v")

  private def contents(dir: String): Set[(Long, String)] =
    ManifestStore.read(spark, dir, schema).as[(Long, String)].collect().toSet

  private def rawManifest(dir: String, v: Long) =
    mapper.readTree(new String(Files.readAllBytes(
      JPath.of(dir, "_manifests", f"v$v%08d.json")), StandardCharsets.UTF_8))

  private def isDelta(dir: String, v: Long): Boolean =
    rawManifest(dir, v).hasNonNull("base")

  test("appends write deltas between interval checkpoints; cold reads reconstruct") {
    val dir = tmpDir()
    (1 to 25).foreach(i => ManifestStore.append(df(i.toLong -> s"r$i"), dir))
    // v1 has no base snapshot → full; v2..v20 are deltas (chain 1..19);
    // v21 hits the default interval (20) → checkpoint; v22.. delta again
    assert(!isDelta(dir, 1L))
    (2 to 20).foreach(v => assert(isDelta(dir, v.toLong), s"v$v should be a delta"))
    assert(!isDelta(dir, 21L), "v21 must checkpoint at the default interval")
    (22 to 25).foreach(v => assert(isDelta(dir, v.toLong), s"v$v should be a delta"))
    // a delta is ∝ the commit, not the table: v25 adds one file to a
    // 25-file table and must be far smaller than the v21 checkpoint
    val d25 = Files.size(JPath.of(dir, "_manifests", "v00000025.json"))
    val c21 = Files.size(JPath.of(dir, "_manifests", "v00000021.json"))
    assert(d25 * 3 < c21, s"delta $d25 B vs checkpoint $c21 B")
    // cold reconstruction: drop every cached parse, then read the chain
    ManifestStore.snapCacheClear()
    assert(contents(dir) === (1 to 25).map(i => i.toLong -> s"r$i").toSet)
    assert(ManifestStore.countRows(spark, dir) === Some(25L))
    // time travel to a mid-chain delta and to the checkpoint
    ManifestStore.snapCacheClear()
    assert(ManifestStore.readVersion(spark, dir, 7L, schema)
      .as[(Long, String)].collect().toSet ===
      (1 to 7).map(i => i.toLong -> s"r$i").toSet)
    assert(ManifestStore.readVersion(spark, dir, 21L, schema).count() === 21L)
    // history sees every version through reconstruction
    val hist = ManifestStore.history(spark, dir)
    assert(hist.count() === 25L)
    assert(hist.agg(sum(when(col("n_rows").isNull, 1).otherwise(0)))
      .head.getLong(0) === 0L, "every version's exact row count must survive")
  }

  test("every metadata plane survives delta reconstruction cold") {
    val dir = tmpDir()
    // k is clustered per commit → per-file stats prune; dv delete and a
    // bloom build land as PATCH entries on surviving files
    ManifestStore.append(Seq(1L -> "a", 2L -> "b").toDF("k", "v"), dir)     // v1 full
    ManifestStore.append(Seq(10L -> "c", 11L -> "d").toDF("k", "v"), dir)   // v2 delta add
    // buildBlooms patches EVERY file → the size heuristic rightly
    // checkpoints it (a patch-all delta is no smaller than a full body)
    ManifestStore.buildBlooms(spark, dir, Seq("v"))                         // v3 full
    // the dv delete now patches an already-bloomed file: the patch entry
    // must carry the file's COMPLETE metadata — blooms AND dv together
    ManifestStore.deleteWhere(spark, dir, schema, col("k") === 10L)         // v4 delta dv+bloom patch
    ManifestStore.setProperties(spark, dir, Map("owner" -> "graft"))        // v5 delta props only
    assert(isDelta(dir, 2L) && isDelta(dir, 4L) && isDelta(dir, 5L))
    assert(rawManifest(dir, 4L).path("patch").size() >= 1)
    ManifestStore.snapCacheClear()
    val s = ManifestStore.currentSnapshot(spark, dir).get
    // rows plane: metadata-only count subtracts the dv tombstone
    assert(ManifestStore.countRows(spark, dir) === Some(3L))
    // stats plane: range pruning still sees both commits' bounds
    assert(ManifestStore.pruneFiles(s, "k", 10L, 20L).nonEmpty)
    assert(ManifestStore.pruneFiles(s, "k", 100L, 200L).isEmpty,
      "carried stats must prune an out-of-range probe")
    // bloom plane: the patched blooms admit a present value and prune an
    // absent one on the v column (string, unclustered)
    assert(s.blooms.nonEmpty, "bloom patch must survive")
    assert(ManifestStore.lookup(spark, dir, schema, "v", Seq("d")).count() === 1L)
    // dv plane: the tombstoned row stays invisible through a cold read
    assert(contents(dir) === Set(1L -> "a", 2L -> "b", 11L -> "d"))
    // schema + props planes
    assert(s.schema.exists(_.fieldNames.sameElements(Array("k", "v"))))
    assert(s.props.get("owner") === Some("graft"))
    // partition-values plane: hive-partitioned adds carry parts in deltas
    val pdir = tmpDir()
    val pschema = StructType.fromDDL("k BIGINT, v STRING, lang STRING")
    ManifestStore.appendPartitioned(
      Seq((1L, "a", "en")).toDF("k", "v", "lang"), pdir, Seq("lang"))       // v1 full
    ManifestStore.appendPartitioned(
      Seq((2L, "b", "de")).toDF("k", "v", "lang"), pdir, Seq("lang"))       // v2 delta
    assert(isDelta(pdir, 2L))
    ManifestStore.snapCacheClear()
    val ps = ManifestStore.currentSnapshot(spark, pdir).get
    assert(ps.parts.values.flatMap(_.get("lang")).toSet === Set("en", "de"))
    assert(ManifestStore.pruneFilesIn(ps, "lang", Seq("de")).size === 1)
  }

  test("table-rewriting commits checkpoint and reset the chain; restore stays full") {
    val dir = tmpDir()
    ManifestStore.append(df(1L -> "a"), dir)       // v1 full
    ManifestStore.append(df(2L -> "b"), dir)       // v2 delta
    ManifestStore.overwrite(df(9L -> "z"), dir)    // v3 rewrites the table → full
    assert(isDelta(dir, 2L) && !isDelta(dir, 3L))
    ManifestStore.append(df(3L -> "c"), dir)       // v4 delta on the new chain
    assert(isDelta(dir, 4L) &&
      rawManifest(dir, 4L).path("base").asLong() === 3L)
    // restore publishes through the external (full-only) path
    val rv = ManifestStore.restore(spark, dir, 2L) // v5
    assert(!isDelta(dir, rv))
    ManifestStore.snapCacheClear()
    assert(contents(dir) === Set(1L -> "a", 2L -> "b"))
    // compaction of everything is a rewrite → full
    ManifestStore.append(df(4L -> "d"), dir)       // v6 delta
    val cv = ManifestStore.compact(spark, dir, schema, numFiles = 1)
    assert(!isDelta(dir, cv))
    ManifestStore.snapCacheClear()
    assert(contents(dir) === Set(1L -> "a", 2L -> "b", 4L -> "d"))
  }

  test("graft.checkpoint.interval=1 forces all-full manifests") {
    val dir = tmpDir()
    ManifestStore.append(df(1L -> "a"), dir)
    ManifestStore.setProperties(spark, dir,
      Map("graft.checkpoint.interval" -> "1"))
    ManifestStore.append(df(2L -> "b"), dir)
    ManifestStore.append(df(3L -> "c"), dir)
    // v2 carries the property commit itself; from then on every commit
    // reads interval 1 and checkpoints
    assert(!isDelta(dir, 3L) && !isDelta(dir, 4L))
    assert(contents(dir) === Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("CDF and keyed changes replay identically across a delta chain") {
    val dir = tmpDir()
    ManifestStore.append(df(1L -> "a"), dir)                         // v1
    ManifestStore.append(df(2L -> "b"), dir)                         // v2 delta
    ManifestStore.deleteWhere(spark, dir, schema, col("k") === 1L)   // v3 delta
    ManifestStore.append(df(3L -> "c"), dir)                         // v4 delta
    ManifestStore.snapCacheClear()
    // (fromVersion, toVersion] — v2's insert, v3's delete, v4's insert
    val ch = ManifestStore.changes(spark, dir, 1L, 4L, schema)
      .select("_change_type", "k", "v").as[(String, Long, String)]
      .collect().toSet
    assert(ch === Set(("insert", 2L, "b"), ("delete", 1L, "a"),
      ("insert", 3L, "c")))
  }

  test("a corpse claim is never a base: the next delta points past it") {
    val dir = tmpDir()
    ManifestStore.append(df(1L -> "a"), dir)
    Files.write(JPath.of(dir, "_manifests", "v00000002.json"),
      "{not json".getBytes(StandardCharsets.UTF_8)) // crashed writer
    assert(ManifestStore.append(df(2L -> "b"), dir) === 3L)
    assert(isDelta(dir, 3L) &&
      rawManifest(dir, 3L).path("base").asLong() === 1L,
      "the v3 delta must base on v1, skipping the v2 corpse")
    ManifestStore.snapCacheClear()
    assert(contents(dir) === Set(1L -> "a", 2L -> "b"))
  }

  test("vacuum keeps the base-chain closure of kept versions") {
    val dir = tmpDir()
    (1 to 8).foreach(i => ManifestStore.append(df(i.toLong -> s"r$i"), dir))
    // keep window = v7, v8 (both deltas); their chain runs back to the
    // v1 checkpoint — every base manifest must survive the vacuum or the
    // kept versions become unreconstructable cold
    val (dropped, _) =
      ManifestStore.vacuum(spark, dir, keepVersions = 2, retainMillis = 0)
    assert(dropped === 0, "the whole chain is needed by v7/v8")
    ManifestStore.snapCacheClear()
    assert(contents(dir) === (1 to 8).map(i => i.toLong -> s"r$i").toSet)
    // after an overwrite checkpoint, the old chain is droppable
    ManifestStore.overwrite(df(99L -> "z"), dir)  // v9 full
    ManifestStore.append(df(100L -> "y"), dir)    // v10 delta base 9
    val (dropped2, _) =
      ManifestStore.vacuum(spark, dir, keepVersions = 2, retainMillis = 0)
    assert(dropped2 === 8, s"v1..v8 droppable once the keep window is v9/v10")
    ManifestStore.snapCacheClear()
    assert(contents(dir) === Set(99L -> "z", 100L -> "y"))
    assert(ManifestStore.readVersion(spark, dir, 10L, schema).count() === 2L)
  }

  test("metadata-only commits are tiny deltas on a wide table") {
    val dir = tmpDir()
    // 40 files via 8-way repartitioned appends
    (1 to 5).foreach { i =>
      ManifestStore.append(
        (1 to 64).map(j => (i * 1000L + j) -> s"v$j").toDF("k", "v")
          .repartition(8), dir)
    }
    val before = ManifestStore.currentSnapshot(spark, dir).get
    assert(before.files.size === 40)
    ManifestStore.setProperties(spark, dir, Map("a" -> "b")) // v6
    val sz = Files.size(JPath.of(dir, "_manifests", "v00000006.json"))
    val full = Files.size(JPath.of(dir, "_manifests", "v00000001.json"))
    assert(isDelta(dir, 6L))
    assert(sz < full,
      s"a props-only delta ($sz B) must undercut even the 8-file v1 ($full B)")
    ManifestStore.snapCacheClear()
    val after = ManifestStore.currentSnapshot(spark, dir).get
    assert(after.files === before.files)
    assert(after.rows === before.rows && after.sizes === before.sizes)
    assert(after.props.get("a") === Some("b"))
  }
}
