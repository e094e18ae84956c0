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
  */
final class ObjectStoreLogStore(client: ConditionalPutClient, fs: FileSystem)
    extends LogStore {

  private def key(p: Path): String = fs.makeQualified(p).toUri.toString

  override def list(dir: Path): Seq[String] = {
    val fromFs =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
    // union, not either-or: a winner that crashed between CAS and
    // write-through is visible ONLY in the client; pre-adoption
    // entries ONLY on the filesystem
    (client.listPrefix(key(dir) + "/") ++ fromFs).distinct
  }

  override def read(path: Path): String =
    client.get(key(path)).getOrElse {
      val in = fs.open(path)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }

  override def writeIfAbsent(path: Path, content: String): Boolean = {
    // guard against pre-adoption entries the client has never seen:
    // version N published by the old HadoopLogStore must still lose
    if (fs.exists(path) && client.get(key(path)).isEmpty) return false
    val won = client.putIfNoneMatch(key(path), content)
    if (won) {
      // exclusivity is already decided by the CAS — but the
      // FILESYSTEM copy is read by plain file sources (the change
      // feed streams the log dir), so it must still appear atomically
      // there: stage dot-prefixed (hidden from Spark file sources),
      // then rename. Nobody else can be renaming onto this path — we
      // hold the claim. A crash between CAS and rename leaves the
      // entry readable through the client, which read() prefers.
      fs.mkdirs(path.getParent)
      val tmp = new Path(path.getParent,
        s".cas-tmp-${java.util.UUID.randomUUID().toString}.json")
      val out = fs.create(tmp, false)
      try out.write(content.getBytes("UTF-8"))
      finally out.close()
      if (!fs.rename(tmp, path)) {
        fs.delete(tmp, false)
        sys.error(s"CAS winner failed to materialize $path — the claim " +
          "is held but the filesystem copy could not be published")
      }
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
  /** Factory for [[graft.ext.TxTable.withLogStore]]: the CAS-
    * coordinated store over the in-memory double. */
  val inMemoryFactory: FileSystem => LogStore =
    fs => new ObjectStoreLogStore(InMemoryCasClient, fs)
}
