package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single seam through which a [[ManifestStore]] commit becomes
  * visible: atomically claim a version slot AND land its manifest body in
  * one indivisible step. `publish` returns false ONLY on a lost race (the
  * slot is already claimed — the caller re-bases and retries); any other
  * I/O failure propagates, because misclassifying a dead filesystem as a
  * lost race would burn the optimistic retry budget against it.
  *
  * The claim and the body must be indivisible: claim-then-write (create
  * the file, then stream the bytes) has a mid-write window in which a
  * concurrently RE-BASING writer reads the claimed-but-empty manifest,
  * skips it as unparseable, bases its commit on the previous snapshot —
  * and the in-flight commit's files silently vanish from the new lineage
  * (readers skipping a corpse is safe; writers skipping one is lost data;
  * caught by the racing-threads specs).
  *
  * Implementations:
  *  - [[ManifestPublisher.LocalLink]] — `file:` URIs; hard-link claim.
  *  - [[ManifestPublisher.HadoopCreate]] — any Hadoop FS; atomic
  *    NAMESPACE claim, but retains the mid-write body window.
  *  - An object store ports by implementing the conditional PUT
  *    (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`) — one method,
  *    installed via [[ManifestStore.publisherOverride]]; the contract
  *    suite in ManifestPublisherSpec is the drop-in acceptance test.
  */
trait ManifestPublisher {
  /** Atomically claim `target` with `body`; false = slot already taken. */
  def publish(f: FileSystem, target: Path, body: Array[Byte]): Boolean
}

object ManifestPublisher {

  /** POSIX publisher for `file:` URIs: write the full body to a hidden
    * temp file, then claim the slot with `Files.createLink` — hard-link
    * creation is an atomic all-or-nothing publish that fails with
    * `FileAlreadyExistsException` if the slot is taken (POSIX `rename`
    * would silently OVERWRITE an existing slot, so it cannot claim). A
    * crashed writer can never leave a partial manifest: crash before the
    * link → no manifest; after → a complete one.
    */
  object LocalLink extends ManifestPublisher {
    def publish(f: FileSystem, target: Path, body: Array[Byte]): Boolean = {
      val local = java.nio.file.Paths.get(target.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      val tmp = local.resolveSibling(
        s".${local.getFileName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      java.nio.file.Files.write(tmp, body)
      try {
        java.nio.file.Files.createLink(local, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally {
        java.nio.file.Files.deleteIfExists(tmp): Unit
      }
    }
  }

  /** Generic Hadoop publisher: `create(overwrite = false)` is an atomic
    * namespace claim on HDFS, but the body streams AFTER the claim — the
    * mid-write window remains, so HDFS deployments should prefer a
    * rename-based or object-store-conditional implementation.
    */
  object HadoopCreate extends ManifestPublisher {
    def publish(f: FileSystem, target: Path, body: Array[Byte]): Boolean = {
      val out = try f.create(target, false)
                catch {
                  case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
                  case e: java.io.IOException
                    if Option(e.getMessage).exists(_.contains("already exists")) =>
                    return false
                }
      try out.write(body) finally out.close()
      true
    }
  }

  /** Scheme-based default: hard-link publisher on `file:`, namespace-claim
    * publisher elsewhere.
    */
  def default(f: FileSystem): ManifestPublisher =
    if ("file" == Option(f.getUri.getScheme).getOrElse("")) LocalLink else HadoopCreate
}
