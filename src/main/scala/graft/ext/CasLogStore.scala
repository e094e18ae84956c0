package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}

/** Conditional-PUT coordination for the commit log — the [[LogStore]]
  * an OBJECT-STORE deployment runs, where [[HadoopLogStore]]'s
  * atomic-rename/hard-link tricks do not exist (S3 renames are
  * copy+delete; two writers CAN both "create" the same key).
  *
  * The publish primitive becomes the store's own compare-and-set:
  *
  *   - S3: `PutObject` with `If-None-Match: *` — succeeds iff the key
  *     does not exist; a racing writer gets `412 Precondition Failed`.
  *   - GCS: upload with `x-goog-if-generation-match: 0` (generation 0
  *     = "no live object"); the loser gets `412`.
  *   - ADLS/ABFS: create with `If-None-Match: *` on the blob endpoint.
  *   - Pre-conditional-PUT S3: the SAME four-method shape rides an
  *     external claim table (one DynamoDB `attribute_not_exists`
  *     conditional write per version) — only [[ConditionalPutClient
  *     .putIfNoneMatch]]'s implementation changes, which is exactly
  *     why the client is its own seam.
  *
  * No temp files, no rename: a conditional PUT is atomic
  * all-or-nothing server-side, so the staged-then-publish dance
  * [[HadoopLogStore]] needs is simply absent here.
  *
  * MIGRATION CONSTRAINT (the Delta LogStore rule): moving a live table
  * from [[HadoopLogStore]] to this store requires ALL writers to
  * switch in one step. The pre-adoption guard in [[ObjectStoreLogStore
  * .writeIfAbsent]] is check-then-act — during a mixed rollout a
  * legacy writer can rename version N onto the filesystem after this
  * writer's exists-check but before its CAS, letting both believe they
  * published N. The post-win re-verify below turns that split-brain
  * into a LOUD error on the CAS side (the legacy side cannot detect
  * it), but the only safe deployment is an atomic switch.
  */
trait ConditionalPutClient {
  /** Atomic whole-object put-if-absent: true iff THIS call created
    * the object (the `If-None-Match: *` / generation-0 success case);
    * false on the 412 a racing writer sees. Never partial: a reader
    * either gets the whole object or a miss. */
  def putIfNoneMatch(key: String, content: String): Boolean
  def get(key: String): Option[String]
  /** Immediate children NAMES under `prefix` (S3 LIST with
    * `delimiter=/` — one page is plenty: the log dir holds one entry
    * per retained version plus periodic checkpoints). */
  def listPrefix(prefix: String): Seq[String]
  def delete(key: String): Unit
}

/** [[LogStore]] over a [[ConditionalPutClient]]. The client is the
  * COORDINATION truth (who won version N); winners also materialize
  * the object onto the table's filesystem so everything that reads
  * the log dir as plain files — Spark's file source streaming
  * `_graft_log/` for the change feed, external inspection tooling —
  * keeps working. On a real object store client and filesystem are
  * the same service and the write-through is the PUT itself; the
  * split here exists so an in-memory CAS double can coordinate while
  * Spark still reads bytes off local disk. Reads prefer the client
  * (read-after-CAS is guaranteed there) and fall back to the
  * filesystem for objects written before this store was adopted —
  * the migration path from [[HadoopLogStore]].
  *
  * Crash-window REPAIR: a winner that dies between its CAS and the
  * filesystem write-through leaves version N visible only through the
  * client — correct for every log read (which prefers the client) but
  * invisible to plain file sources, forever. Any reader that hits
  * such a client-only entry re-materializes the filesystem copy
  * itself ([[read]]): the content is immutable and the claim already
  * decided, so concurrent repairers are harmless (first rename wins,
  * the rest discard their temp file).
  */
final class ObjectStoreLogStore(client: ConditionalPutClient, fs: FileSystem)
    extends LogStore {

  import ObjectStoreLogStore.CasNativeMarker

  private def key(p: Path): String = fs.makeQualified(p).toUri.toString

  override def list(dir: Path): Seq[String] = {
    val fromClient = client.listPrefix(key(dir) + "/")
    // CAS-NATIVE SHORT-CIRCUIT: a table whose version 1 was published
    // through this store (marker set at creation) has never had a
    // pre-adoption entry, so the client listing is authoritative and
    // the filesystem LIST — one object-store round-trip per log
    // listing — buys nothing. Migrated tables (no marker) keep the
    // union: pre-adoption entries exist ONLY on the filesystem.
    // CONSTRAINT the marker hardens: a legacy HadoopLogStore writer
    // joining a CAS-native table publishes filesystem-only versions
    // this listing will never surface — not merely unsafe but
    // INVISIBLE. The first CAS writer to target such a squatted
    // version fails loudly (see writeIfAbsent's split-brain check);
    // until then those commits are unreadable here by design, which
    // is why the migration rule is an atomic all-writers switch.
    val fromFs =
      if (fromClient.contains(CasNativeMarker)) Seq.empty
      else if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
    // union, not either-or: a winner that crashed between CAS and
    // write-through is visible ONLY in the client; pre-adoption
    // entries ONLY on the filesystem
    (fromClient.filterNot(_ == CasNativeMarker) ++ fromFs).distinct
  }

  override def read(path: Path): String =
    client.get(key(path)) match {
      case Some(content) =>
        // crash-window repair: client-only entry (winner died before
        // its write-through) → re-materialize for plain file sources.
        // Off the happy path: one exists() probe only when the client
        // held the bytes, and on a real object store client==fs so
        // the probe answers from the same LIST/HEAD the read warmed.
        // BEST-EFFORT: the reader already HOLDS the bytes, so repair
        // capability is never a precondition for reading — a client
        // without filesystem write permission logs and serves the
        // content (the next privileged reader repairs). Only I/O
        // failures are absorbed; the SPLIT-BRAIN error inside
        // materialize stays loud — that is a consistency violation,
        // not a permission problem.
        try { if (!fs.exists(path)) materialize(path, content) }
        catch { case e: java.io.IOException =>
          System.err.println(s"[caslog] best-effort repair of $path " +
            s"skipped (${e.getMessage}); serving the client copy") }
        content
      case None =>
        val in = fs.open(path)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
    }

  /** Publish `content` at `path` on the FILESYSTEM side (the claim is
    * already held): stage dot-prefixed (hidden from Spark file
    * sources), then publish no-overwrite — hard-link on local fs
    * (POSIX rename REPLACES silently, [[HadoopLogStore]]'s finding),
    * exists+rename elsewhere. Losing the publish is then a DETECTED
    * state, and the loser verifies the occupant:
    *   - bytes match ours → a concurrent repairer (or earlier repair)
    *     of the same immutable claim — benign;
    *   - bytes differ → a legacy [[HadoopLogStore]] writer published
    *     the same version during a mixed-store rollout (the
    *     check-then-act window on the pre-adoption guard): the claim
    *     side and the filesystem side have SPLIT-BRAINED — fail
    *     loudly naming the constraint, and leave the legacy bytes
    *     untouched for manual reconciliation. */
  private def materialize(path: Path, content: String): Unit = {
    fs.mkdirs(path.getParent)
    def verifyOccupant(): Unit = {
      val onFs =
        try {
          val in = fs.open(path)
          try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
          finally in.close()
        } catch { case _: java.io.IOException => None }
      if (!onFs.contains(content)) sys.error(
        s"SPLIT-BRAIN at $path: this writer holds the CAS claim but the " +
          "filesystem carries a DIFFERENT object — a legacy HadoopLogStore " +
          "writer published the same version during a mixed-store rollout. " +
          "Migration to ObjectStoreLogStore requires ALL writers to switch " +
          "stores atomically; the filesystem copy must be reconciled by hand.")
    }
    if (fs.exists(path)) { verifyOccupant(); return }
    val tmp = new Path(path.getParent,
      s".cas-tmp-${java.util.UUID.randomUUID().toString}.json")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
    val published =
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(path.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else !fs.exists(path) && fs.rename(tmp, path)
    if (!published || fs.getScheme == "file") fs.delete(tmp, false)
    if (!published) verifyOccupant()
  }

  override def writeIfAbsent(path: Path, content: String): Boolean = {
    // guard against pre-adoption entries the client has never seen:
    // version N published by the old HadoopLogStore must still lose —
    // EXCEPT on a CAS-NATIVE table, where a pre-adoption entry cannot
    // exist: a filesystem-only object there means a legacy
    // HadoopLogStore writer is publishing versions CAS readers will
    // never list (the silent-loss direction of the mixed-rollout
    // hazard). Losing quietly would also wedge this writer's OCC
    // retry loop forever (list() never surfaces the squatter, so every
    // retry re-targets the same occupied version) — fail loudly
    // naming the constraint instead.
    if (fs.exists(path) && client.get(key(path)).isEmpty) {
      if (client.listPrefix(key(path.getParent) + "/").contains(CasNativeMarker))
        sys.error(
          s"SPLIT-BRAIN at $path: this table's log is CAS-NATIVE (born under " +
            "ObjectStoreLogStore) yet the filesystem carries a log object the " +
            "coordination client never saw — a legacy HadoopLogStore writer is " +
            "publishing versions that CAS readers will silently never list. " +
            "Migration requires ALL writers to switch stores atomically; " +
            "reconcile the filesystem copy by hand.")
      return false
    }
    val won = client.putIfNoneMatch(key(path), content)
    if (won) {
      // first CAS-published entry of a fresh table ⇒ no pre-adoption
      // entries can ever exist — set the marker that lets list() skip
      // the filesystem union forever. "Fresh" = the client now holds
      // exactly this one entry and the filesystem side had no log dir
      // before materialization.
      val dirKey = key(path.getParent) + "/"
      if (!fs.exists(path.getParent) &&
          client.listPrefix(dirKey).forall(n =>
            n == path.getName || n == CasNativeMarker)) {
        client.putIfNoneMatch(dirKey + CasNativeMarker, "")
        ()
      }
      materialize(path, content)
    }
    won
  }

  override def delete(path: Path): Unit = {
    client.delete(key(path))
    fs.delete(path, false)
    ()
  }
}

/** In-memory [[ConditionalPutClient]] double: one JVM-global
  * concurrent map whose `putIfAbsent` IS the conditional PUT — the
  * atomicity model of S3's `If-None-Match: *`, minus the network. The
  * map must be global (not per-instance): [[TxTable]] resolves its
  * store per OPERATION through the factory seam, and two racing
  * writers only contend when they share the claim table, exactly as
  * two Spark drivers share one S3 bucket. */
object InMemoryCasClient extends ConditionalPutClient {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  override def putIfNoneMatch(key: String, content: String): Boolean =
    objects.putIfAbsent(key, content) == null

  override def get(key: String): Option[String] = Option(objects.get(key))

  override def listPrefix(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.toSeq.collect {
      case k if k.startsWith(prefix) && !k.stripPrefix(prefix).contains("/") =>
        k.stripPrefix(prefix)
    }
  }

  override def delete(key: String): Unit = { objects.remove(key); () }

  /** Test hygiene: forget everything (fresh bucket). */
  def reset(): Unit = objects.clear()
}

object ObjectStoreLogStore {
  /** Client-side marker object (never materialized to the filesystem,
    * never returned by [[ObjectStoreLogStore.list]]): present iff the
    * table's log was BORN through CAS coordination, i.e. no
    * pre-adoption [[HadoopLogStore]] entry can exist — the license for
    * the list() filesystem short-circuit. Not a `.json` name, so even
    * a leak could never parse as a manifest. */
  private[ext] val CasNativeMarker = "_cas_native"

  /** Factory for [[graft.ext.TxTable.withLogStore]]: the CAS-
    * coordinated store over the in-memory double. */
  val inMemoryFactory: FileSystem => LogStore =
    fs => new ObjectStoreLogStore(InMemoryCasClient, fs)
}
