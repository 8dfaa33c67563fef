package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.StructType

import graft.sources.{ManifestPublisher, ManifestStore}

/** Contract suite for the [[ManifestPublisher]] seam — the object-store
  * port point. Every backend (the local hard-link publisher and an
  * in-memory conditional-PUT fake standing in for S3 `If-None-Match:*`)
  * must satisfy the same three clauses: first claim wins and lands the
  * full body; a second claim of the same slot reports a lost race without
  * touching the winner's body; racing claims admit exactly one winner.
  * Then the fake is installed under the REAL store and the racing-upsert
  * convergence scenario must hold unchanged — proving an object-store
  * backend is a drop-in, not a rewrite.
  */
class ManifestPublisherSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k BIGINT, v STRING")

  private def fs(dir: String): FileSystem =
    new Path(dir).getFileSystem(new Configuration())

  /** S3-style conditional PUT: an atomic in-memory claim table plays the
    * store's `If-None-Match:*` arbitration; the winner (and only the
    * winner) then lands the body. The claim is the linearization point, so
    * the body write races nobody.
    */
  private final class FakeConditionalPut extends ManifestPublisher {
    val claims = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    @volatile var lostRaces = 0
    def publish(f: FileSystem, target: Path, body: Array[Byte]): Boolean =
      if (!claims.add(target.toString)) { lostRaces += 1; false }
      else {
        val out = f.create(target, true) // we own the slot: overwrite safe
        try out.write(body) finally out.close()
        true
      }
  }

  private def contractClauses(name: String, pub: ManifestPublisher): Unit = {
    val dir = Files.createTempDirectory(s"graft-pub-$name").toString
    val f = fs(dir)
    val slot = new Path(dir, "v00000001.json")
    // 1. first claim wins and lands the full body
    assert(pub.publish(f, slot, "winner".getBytes), s"$name: first claim must win")
    assert(new String(Files.readAllBytes(Paths.get(slot.toUri.getPath))) === "winner")
    // 2. a second claim reports a lost race and leaves the body intact
    assert(!pub.publish(f, slot, "loser".getBytes), s"$name: second claim must lose")
    assert(new String(Files.readAllBytes(Paths.get(slot.toUri.getPath))) === "winner",
      s"$name: a lost race must not clobber the winner's body")
    // 3. racing claims on a fresh slot admit exactly one winner
    val slot2 = new Path(dir, "v00000002.json")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val futures = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean = {
            gate.await(); pub.publish(f, slot2, s"w$i".getBytes)
          }
        })
      }
      gate.countDown()
      val wins = futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(wins.count(identity) === 1, s"$name: exactly one racing claim may win, got $wins")
      val body = new String(Files.readAllBytes(Paths.get(slot2.toUri.getPath)))
      assert((0 until 4).map(i => s"w$i").contains(body), s"$name: body must be a full claim")
    } finally pool.shutdownNow()
  }

  test("local hard-link publisher satisfies the contract") {
    contractClauses("local", ManifestPublisher.LocalLink)
  }

  test("in-memory conditional-PUT fake satisfies the contract") {
    contractClauses("fake", new FakeConditionalPut)
  }

  test("the store converges under racing upserts on the fake conditional-PUT backend") {
    val fake = new FakeConditionalPut
    ManifestStore.publisherOverride = Some(fake)
    try {
      val dir = Files.createTempDirectory("graft-pub-store").toString
      ManifestStore.upsertKeyed(spark, dir, schema,
        Seq(1L -> "base").toDF("k", "v"), "k")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val gate = new java.util.concurrent.CountDownLatch(1)
        val futures = Seq("A", "B").map { tag =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long = {
              gate.await()
              var v: Option[Long] = None
              while (v.isEmpty) // lost race → re-base against the fresh snapshot
                v = ManifestStore.upsertKeyed(spark, dir, schema,
                  Seq(1L -> tag).toDF("k", "v"), "k")
              v.get
            }
          })
        }
        gate.countDown()
        val versions = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        assert(versions.toSet.size === 2, s"both upserts must land, got $versions")
        val out = ManifestStore.read(spark, dir, schema)
          .as[(Long, String)].collect().toSet
        assert(out.size === 1 && Set("A", "B").contains(out.head._2),
          s"key-uniqueness broke under racing merges on the fake backend: $out")
        // every published manifest went through the fake — the override
        // really is the only path a commit takes to visibility
        assert(fake.claims.size() >= 3, s"fake saw ${fake.claims.size()} claims")
      } finally pool.shutdownNow()
    } finally ManifestStore.publisherOverride = None
  }
}
