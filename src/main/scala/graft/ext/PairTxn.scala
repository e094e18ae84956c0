package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE atomic commit over [[TxTable]] — the r14/r15 gap: a
  * fact table and its derived summary must move in step, and a crash
  * between their two publishes must never strand the pair
  * inconsistent.
  *
  * Shape: WRITE-AHEAD INTENT + ROLL-FORWARD (the lakehouse analog of
  * primary-lock commit protocols, reduced to the two-phase core):
  *
  *   1. STAGE both sides completely — data files written into their
  *      own immutable commit dirs, manifests + cadence checkpoints
  *      RENDERED to bytes ([[TxTable.stageCommit]] is pure). Nothing
  *      is visible yet; a crash here leaves only vacuum-able orphans.
  *   2. Publish ONE intent record carrying both staged manifests
  *      verbatim (put-if-absent under `_graft_pairtxn/`). This is the
  *      transaction's durability point: from here the pair ALWAYS
  *      completes — any reader/writer/recovery that finds the intent
  *      can finish the publishes by byte replay, no recomputation.
  *   3. Execute: publish table A's manifest, then table B's, then the
  *      `.done` marker — each step idempotent (a replayer that finds
  *      the slot occupied verifies the occupant IS the staged bytes
  *      and moves on), so the writer and any number of concurrent
  *      [[recoverPairs]] calls can race harmlessly.
  *
  * Crash matrix: before the intent → nothing visible, orphan data
  * files; between intent and A → roll-forward publishes both; between
  * A and B → table A is visible alone ONLY until the next
  * [[recoverPairs]] (the documented roll-forward window), which
  * completes B from the intent's bytes; after B → recovery just adds
  * the marker. All-or-nothing is therefore eventual-forward: the pair
  * can lag, it can never diverge.
  *
  * CONTENTION CONTRACT (documented, loud): the coordinator assumes
  * the PAIR WRITER owns both tables while a pair commit is in flight
  * — the single-pipeline shape the fact+summary use case has. A
  * foreign writer stealing table A's version slot before anything
  * published aborts the whole transaction cleanly
  * ([[TxTable.CommitConflictException]], `.aborted` marker, nothing
  * visible). A foreign writer stealing table B's slot AFTER table A
  * published is the one genuinely stranded state two-phase commit
  * without locks cannot repair — it fails loudly naming both tables
  * for manual reconciliation instead of silently leaving the pair
  * diverged. Specs cover every cell of this matrix.
  *
  * Visibility note: published manifests stay REAL versions (the
  * change feed and plain-file log subscribers need no gate-resolution
  * logic — the TxTable scaladoc's argument against gated visibility
  * holds); what the intent adds is a completion guarantee, not a
  * visibility gate.
  */
object PairTxn {

  /** One side of a pair commit: `replace=false` APPENDS `df` as a
    * delta commit (fresh files added, carried entries kept — skipping
    * metadata re-derived per the base manifest's recipe);
    * `replace=true` publishes a full-replace commit recording
    * `statsCols` sketches, [[TxTable.commitReplace]]'s semantics. */
  final case class PairCommit(
      dir: String, df: DataFrame, replace: Boolean = false,
      partitionCol: Option[String] = None,
      statsCols: Seq[String] = Seq.empty)

  private final case class StagedSide(
      dir: String, version: Long, manifest: String, checkpoint: Option[String])

  private final case class Intent(id: String, sides: Seq[StagedSide])

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def txnDir(coordRoot: Path) = new Path(coordRoot, "_graft_pairtxn")
  private def intentPath(coordRoot: Path, id: String) =
    new Path(txnDir(coordRoot), s"$id.json")
  private def donePath(coordRoot: Path, id: String) =
    new Path(txnDir(coordRoot), s"$id.done")
  private def abortPath(coordRoot: Path, id: String) =
    new Path(txnDir(coordRoot), s"$id.aborted")

  private def renderIntent(i: Intent): String = {
    val n = mapper.createObjectNode()
    n.put("id", i.id)
    val arr = n.putArray("tables")
    i.sides.foreach { s =>
      val t = arr.addObject()
      t.put("dir", s.dir)
      t.put("version", s.version)
      t.put("manifest", s.manifest)
      s.checkpoint.foreach(c => t.put("checkpoint", c))
    }
    mapper.writeValueAsString(n)
  }

  private def parseIntent(text: String): Intent = {
    val n = mapper.readTree(text)
    val arr = n.get("tables")
    Intent(n.get("id").asText(),
      (0 until arr.size()).map { i =>
        val t = arr.get(i)
        StagedSide(t.get("dir").asText(), t.get("version").asLong(),
          t.get("manifest").asText(),
          Option(t.get("checkpoint")).map(_.asText()))
      })
  }

  /** Stage one side: write the data files, derive per-file metadata,
    * enforce constraints, render the manifest — NO publish. */
  private def stage(spark: SparkSession, p: PairCommit): StagedSide = {
    val (fs, root) = TxTable.fsOf(spark, p.dir)
    val base = TxTable.latestVersion(spark, p.dir).getOrElse(0L)
    val baseManifest =
      if (base == 0L) TxTable.Manifest(0L, Seq.empty)
      else TxTable.readManifest(spark, p.dir, base)
    val commitDir = TxTable.newCommitDir(root, base + 1)
    val writer = p.df.write.mode("errorifexists")
    p.partitionCol.fold(writer)(c => writer.partitionBy(c))
      .parquet(commitDir.toString)
    val listed = TxTable.listCommitFiles(fs, root, commitDir, p.partitionCol)
    val entries =
      if (p.replace)
        TxTable.gatherFileMeta(spark, root, listed, p.statsCols, None,
          ndvMirrorable = false)
      else
        TxTable.propagateSkipping(spark, root, baseManifest, listed,
          p.df.columns.toSeq)
    TxTable.enforceConstraints(spark, root, baseManifest, entries,
      Some(p.df.schema.json))
    val newFiles = if (p.replace) entries else baseManifest.files ++ entries
    val extraProps =
      if (p.replace && p.statsCols.nonEmpty) Map(TxTable.NdvLaneProp -> "xx")
      else Map.empty[String, String]
    val staged = TxTable.stageCommit(baseManifest, newFiles,
      Some(p.df.schema.json), if (p.replace) "pairreplace" else "pairappend",
      full = p.replace, extraProps = extraProps)
    StagedSide(root.toString, staged.version, staged.manifest, staged.checkpoint)
  }

  /** Idempotent executor shared by the commit path and recovery: every
    * step is publish-or-verify, so any number of replayers converge on
    * the same log bytes. Throws [[TxTable.CommitConflictException]]
    * when a foreign occupant squats the FIRST side's slot (clean
    * abort, marker written, nothing of this txn visible); fails loudly
    * when a later side's slot is foreign while an earlier side already
    * published (the stranded cell of the contention matrix). */
  private def execute(
      spark: SparkSession, coordStore: LogStore, coordRoot: Path,
      intent: Intent, owner: Boolean): Unit = {
    intent.sides.zipWithIndex.foreach { case (side, idx) =>
      val (store, root) = TxTable.storeOf(spark, side.dir)
      val mp = TxTable.manifestPath(root, side.version)
      if (!store.writeIfAbsent(mp, side.manifest)) {
        val occupant = try store.read(mp) catch { case _: Exception => "" }
        if (occupant != side.manifest) {
          if (idx == 0) {
            // nothing of this txn is visible yet: abort cleanly. The
            // OWNER throws so its OCC retry restages against the new
            // base; a RECOVERER just records the abort — the txn is
            // dead, which is a completed recovery, not its failure.
            coordStore.writeIfAbsent(abortPath(coordRoot, intent.id), "")
            if (owner) throw new TxTable.CommitConflictException(
              s"pair txn ${intent.id}: version ${side.version} of " +
                s"${side.dir} taken by a concurrent writer — transaction " +
                "aborted before publishing anything; retry against the new base")
            return
          } else sys.error(
            s"pair txn ${intent.id} STRANDED: ${intent.sides.head.dir} " +
              s"published its side but version ${side.version} of " +
              s"${side.dir} was taken by a foreign writer. The pair-commit " +
              "contract requires the pair writer to own both tables while " +
              "a transaction is in flight; reconcile the second table by " +
              "hand (re-derive it from the first), then mark the intent " +
              s"done or aborted under ${txnDir(coordRoot)}")
        }
      }
      side.checkpoint.foreach(c =>
        store.writeIfAbsent(TxTable.checkpointPath(root, side.version), c))
    }
    coordStore.writeIfAbsent(donePath(coordRoot, intent.id), "")
    ()
  }

  /** Commit `a` then `b` atomically-in-effect (see the object doc's
    * crash matrix): returns the versions published on each table.
    * `coordDir` holds the intent log — any durable location both
    * writers and recovery agree on (conventionally the pipeline's own
    * directory, beside the tables). Open intents found under it are
    * ROLLED FORWARD first, so a previous crash can never make this
    * writer stage against a half-committed base. */
  def commitPair(
      spark: SparkSession, coordDir: String,
      a: PairCommit, b: PairCommit): (Long, Long) = {
    // compare NORMALIZED roots, not raw strings: "/x/t" and "/x/t/"
    // alias one table, and a raw compare would let both sides stage
    // the same version slot — side A publishes, side B then dies with
    // a misleading STRANDED error blaming a foreign writer
    require(TxTable.fsOf(spark, a.dir)._2 != TxTable.fsOf(spark, b.dir)._2,
      "commitPair coordinates two DISTINCT tables; same-table multi-writes " +
        "are one ordinary commit")
    recoverPairs(spark, coordDir)
    val (coordStore, coordRoot) = TxTable.storeOf(spark, coordDir)
    val stagedA = stage(spark, a)
    val stagedB = stage(spark, b)
    val id = java.util.UUID.randomUUID().toString
    val intent = Intent(id, Seq(stagedA, stagedB))
    // durability point: from here the pair always completes
    require(coordStore.writeIfAbsent(
      intentPath(coordRoot, id), renderIntent(intent)),
      s"intent $id collided — UUIDs must not collide")
    execute(spark, coordStore, coordRoot, intent, owner = true)
    (stagedA.version, stagedB.version)
  }

  /** Roll forward every OPEN intent under `coordDir` (no `.done`, no
    * `.aborted`); returns how many were resolved (completed or
    * recorded aborted). A pipeline holds at most ONE open intent —
    * [[commitPair]] only returns after its marker lands and rolls
    * forward any predecessor before staging — so order is
    * deterministic-but-immaterial. Safe
    * to call concurrently with writers and other recoverers — every
    * step is publish-or-verify byte replay. */
  def recoverPairs(spark: SparkSession, coordDir: String): Int = {
    val (coordStore, coordRoot) = TxTable.storeOf(spark, coordDir)
    val names = coordStore.list(txnDir(coordRoot))
    val done = names.filter(_.endsWith(".done")).map(_.stripSuffix(".done")).toSet
    val aborted =
      names.filter(_.endsWith(".aborted")).map(_.stripSuffix(".aborted")).toSet
    val open = names.filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json"))
      .filterNot(id => done(id) || aborted(id))
      .sorted
    open.foreach { id =>
      val intent = parseIntent(coordStore.read(intentPath(coordRoot, id)))
      execute(spark, coordStore, coordRoot, intent, owner = false)
    }
    open.size
  }
}
