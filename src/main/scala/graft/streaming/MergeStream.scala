package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming MERGE sink: a change feed (insert/update/delete rows)
  * drained micro-batch by micro-batch into a PARTITIONED parquet
  * snapshot, rewriting ONLY the partitions a batch touches — the
  * incremental-upsert shape that replaces "recompute the snapshot
  * nightly" with "apply the day's changes", and the streaming face of
  * [[graft.ext.Cdc.applyChangeSet]].
  *
  * Per batch: the affected partition values are the distinct change
  * buckets (a bounded driver collect — ≤ #partitions by definition),
  * the snapshot is read WITH a partition filter (only those
  * directories are listed/scanned), the merge runs on that slice, and
  * `partitionOverwriteMode=dynamic` writes back just the touched
  * directories. Cost per batch ∝ touched partitions, not snapshot
  * size — the property that makes a 100 TB snapshot maintainable.
  *
  * Correctness contract: at most one change per key across the whole
  * feed (CDC-compacted upstream), so batch boundaries and file order
  * cannot change the final state; the result equals the one-shot
  * batch [[graft.ext.Cdc.applyChangeSet]] — which is exactly what the
  * q138 oracle replays relationally.
  *
  * Crash-replay caveat ([[mergeAvailable]] only): foreachBatch is
  * at-least-once, and this legacy dynamic-overwrite variant has no
  * transaction ledger — a crash between a batch's directory rewrite
  * and the stream checkpoint commit re-applies that batch on restart
  * (duplicating its inserts). [[mergeAvailableVersioned]] is the
  * crash-safe sibling: every batch is one TxTable commit tagged with
  * (appId, batchId) in the idempotent-writer ledger, so ANY replay —
  * including a fully rebuilt stream checkpoint — is a no-op. New
  * pipelines should use the versioned variant; this one remains as
  * the plain-directory recipe for sinks that cannot carry a log.
  */
object MergeStream {

  /** Observable counters for the best-effort maintenance cadence —
    * named Spark accumulators, so the ticks/publishes/skips show up
    * in the Spark UI and the status API instead of vanishing into
    * stderr (a production operator alarms on `skipped` climbing while
    * `published` stalls: the table's layout debt is then growing
    * unswept). One instance per (session, table), memoized so the
    * stream and the operator's monitoring read the SAME counters. */
  final case class MaintenanceMetrics(
      attempted: org.apache.spark.util.LongAccumulator,
      published: org.apache.spark.util.LongAccumulator,
      skipped: org.apache.spark.util.LongAccumulator)

  // WEAK-keyed by session: a long-lived process that creates many
  // sessions must not retain every stopped session (and its registered
  // accumulators) through this cache forever — a session's entry (and
  // its per-table inner map) dies with the session's last strong
  // reference. MaintenanceMetrics holds no session back-reference, so
  // the weak key is the ONLY thing keeping the entry alive. The outer
  // map is synchronized (WeakHashMap is not thread-safe); the inner
  // per-table map is concurrent, so the steady-state lookup contends
  // only on the brief outer get.
  private val metricsCache: java.util.Map[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, MaintenanceMetrics]] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, MaintenanceMetrics]]())

  def maintenanceMetrics(
      spark: SparkSession, tableDir: String): MaintenanceMetrics =
    metricsCache.computeIfAbsent(spark, _ =>
        new java.util.concurrent.ConcurrentHashMap[String, MaintenanceMetrics]())
      .computeIfAbsent(tableDir, _ =>
        MaintenanceMetrics(
          spark.sparkContext.longAccumulator(
            s"graft.maintenance.attempted:$tableDir"),
          spark.sparkContext.longAccumulator(
            s"graft.maintenance.published:$tableDir"),
          spark.sparkContext.longAccumulator(
            s"graft.maintenance.skipped:$tableDir")))

  /** Drain `changesDir` (parquet change files, one micro-batch per
    * file) into the snapshot at `snapshotDir` (parquet partitioned by
    * `partitionCol`). Returns the number of micro-batches applied.
    *
    * Column contract: `changesSchema` must carry `keyCol` (the merge
    * key), `opCol` ∈ {insert, update, delete} and `partitionCol` (the
    * snapshot's partition column) — all three default to the q138
    * lane's names but are parameters precisely so a caller whose
    * schema happens to contain, say, an unrelated "op" column merges
    * on the columns it MEANS. */
  def mergeAvailable(
      spark: SparkSession,
      snapshotDir: String,
      changesDir: String,
      changesSchema: org.apache.spark.sql.types.StructType,
      checkpoint: String,
      keyCol: String = "event_id",
      opCol: String = "op",
      partitionCol: String = "pbucket"): Long = {
    Seq(keyCol, opCol, partitionCol).foreach { c =>
      require(changesSchema.fieldNames.contains(c),
        s"changesSchema must carry '$c': ${changesSchema.fieldNames.mkString(", ")}")
    }
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    try {
      val stream = spark.readStream
        .schema(changesSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(changesDir)
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (rawChanges: DataFrame, _: Long) =>
          // one evaluation per batch: the touched-partition collect and
          // the merge below both consume the changeset — materialize it
          // once (TxTable releases nothing here: the blocks are ours,
          // freed when the wrapper exits)
          graft.ext.TxTable.withMaterializedChanges(rawChanges) { changes =>
          // bounded collect: ≤ #partition values by definition.
          // Values must be path-literal (see TxTable.requirePathSafe):
          // the emptied-partition delete below matches the RAW value
          // against the directory name, while Spark escapes exotic
          // values when writing it — a silent mismatch would resurrect
          // the stale-directory divergence this path exists to prevent.
          val touched = changes.select(col(partitionCol)).distinct()
            .collect().map(_.get(0))
          graft.ext.TxTable.requirePathSafe(
            touched.map(String.valueOf(_)), partitionCol)
          if (touched.nonEmpty) {
            val slice = spark.read.parquet(snapshotDir)
              .where(col(partitionCol).isin(touched.toIndexedSeq: _*))
            // localCheckpoint: the merged plan lazily READS the very
            // partitions the write below overwrites — Spark rejects
            // overwrite-from-own-input; materializing the (touched-
            // partition-sized) merge breaks the file dependency
            val merged = graft.ext.Cdc.applyChangeSet(
              slice, changes, keyCol, opCol).localCheckpoint()
            // dynamic overwrite: ONLY the touched partition directories
            // are replaced; untouched partitions are never read or
            // written
            merged.write.mode("overwrite")
              .partitionBy(partitionCol).parquet(snapshotDir)
            // dynamic overwrite replaces only partitions the write
            // EMITS — a batch that deletes a partition's last row
            // writes nothing for it, and the stale directory would
            // survive (diverging from the batch apply). Drop touched
            // partitions the merge left empty explicitly; the distinct
            // is bounded by #touched. Deletion goes through the SAME
            // Hadoop FS abstraction as the snapshot read/write — a
            // java.nio local-path delete would silently no-op on
            // hdfs://-s3a://-style snapshot URIs, resurrecting exactly
            // the stale-directory divergence this block prevents.
            val present = merged.select(col(partitionCol)).distinct()
              .collect().map(_.get(0)).toSet
            val hconf = spark.sessionState.newHadoopConf()
            touched.filterNot(present).foreach { b =>
              val dir = new org.apache.hadoop.fs.Path(
                snapshotDir, s"$partitionCol=$b")
              val fs = dir.getFileSystem(hconf)
              if (fs.exists(dir)) fs.delete(dir, true)
            }
            batches.incrementAndGet()
          }
          }
          ()
        }
        .start()
      q.awaitTermination()
      batches.get()
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** One BEST-EFFORT maintenance attempt ([[graft.ext.TxTable
    * .maintainIfNeeded]] under the OCC retry loop). Maintenance is
    * optional by definition — the batch's own merge has already
    * committed — so a pass that still loses after the retries, or
    * fails for any environmental reason, must NOT kill the ingest
    * stream it runs inside: the decay it failed to sweep is simply
    * still there for the next cadence tick. Returns whether a
    * compaction version was published; every outcome lands in the
    * table's [[MaintenanceMetrics]] (attempted / published / skipped)
    * so the skip is VISIBLE to monitoring, not just a stderr line. */
  private[streaming] def runMaintenance(
      spark: SparkSession, tableDir: String, partitionCol: String): Boolean = {
    val metrics = maintenanceMetrics(spark, tableDir)
    metrics.attempted.add(1L)
    try {
      val published = graft.ext.TxTable.withConflictRetry() {
        graft.ext.TxTable.maintainIfNeeded(spark, tableDir, partitionCol)
      }.isDefined
      if (published) metrics.published.add(1L)
      published
    } catch {
      case scala.util.control.NonFatal(e) =>
        metrics.skipped.add(1L)
        System.err.println(
          s"[merge-stream] maintenance pass on $tableDir skipped: ${e.getMessage}")
        false
    }
  }

  /** [[mergeAvailable]]'s SNAPSHOT-ISOLATED sibling: drain the change
    * feed into a [[graft.ext.TxTable]] (manifest commit log), one
    * atomic version per non-empty micro-batch. Same touched-partition
    * economics — [[graft.ext.TxTable.mergeChangeSet]] rewrites only
    * the files of partitions the batch touches and carries every
    * other file forward by reference — but readers racing the stream
    * see only complete committed versions (and can time-travel to any
    * previous batch boundary), concurrent writers conflict loudly
    * instead of corrupting the directory, and the emptied-partition
    * reconciliation [[mergeAvailable]] needs is structural here (an
    * emptied partition simply has no files in the new manifest).
    * `tableDir` must hold an initialized TxTable (version ≥ 1).
    * Returns the number of versions committed.
    *
    * `moR = true` switches each batch to merge-on-read
    * ([[graft.ext.TxTable.mergeChangeSetDv]]): identical content and
    * exactly-once semantics, but a batch writes tombstone sidecars +
    * its own rows instead of rewriting every touched partition — the
    * sustainable shape for a steady trickle against a huge table
    * (per-trigger cost ∝ batch, not ∝ touched partitions).
    *
    * `maintainEvery = n` closes that loop: after every `n`th batch the
    * stream asks [[graft.ext.TxTable.maintainIfNeeded]] (a manifest-
    * only decision — one log read) whether the layout decayed past its
    * budgets, and compacts only then, under [[graft.ext.TxTable
    * .withConflictRetry]] so a racing producer never kills the
    * maintenance pass. Maintenance is deliberately OUTSIDE the batch's
    * txn tag: compaction is content-identical, so replaying a batch
    * whose maintenance ran is harmless, and a maintenance commit
    * interleaving with another writer is just a normal OCC loser.
    * Maintenance versions are NOT counted in the returned number of
    * committed versions (the return stays "batches ingested", the
    * replay-dedup observable), and a cadence tick landing on an EMPTY
    * micro-batch still runs — the sweep is deferred by decay, never by
    * an idle CDC window.
    *
    * `maxFilesPerTrigger` batches that many change FILES per
    * micro-batch (default 1 preserves the historical one-file-one-
    * commit cadence). A consumer catching up on a long feed then pays
    * one commit per N files instead of per file; correctness is
    * untouched because the feed contract (at most one change per key
    * across the WHOLE feed) makes any batching of the files equal to
    * the one-shot apply, and the (appId, batchId) ledger tag covers a
    * batch of any width — replay semantics are unchanged (a rebuilt
    * checkpoint re-plans the same deterministic file order into the
    * same batches). */
  def mergeAvailableVersioned(
      spark: SparkSession,
      tableDir: String,
      changesDir: String,
      changesSchema: org.apache.spark.sql.types.StructType,
      checkpoint: String,
      keyCol: String = "event_id",
      opCol: String = "op",
      partitionCol: String = "pbucket",
      txnAppId: String = null,
      moR: Boolean = false,
      maintainEvery: Int = 0,
      maxFilesPerTrigger: Int = 1): Long = {
    require(maxFilesPerTrigger >= 1,
      s"maxFilesPerTrigger must be >= 1: $maxFilesPerTrigger")
    Seq(keyCol, opCol, partitionCol).foreach { c =>
      require(changesSchema.fieldNames.contains(c),
        s"changesSchema must carry '$c': ${changesSchema.fieldNames.mkString(", ")}")
    }
    // foreachBatch is AT-LEAST-ONCE: a crash between the table commit
    // and the stream's checkpoint commit replays the batch on restart
    // (and a deleted/fresh checkpoint replays ALL batches). Each merge
    // therefore carries a (txnAppId, batchId) tag — TxTable's
    // idempotent-writer ledger turns any re-application into a no-op
    // instead of a double apply (inserts would duplicate). The app id
    // must be stable across restarts of the SAME logical pipeline:
    // default is the source directory (one feed = one producer), which
    // also survives a rebuilt checkpoint re-numbering its batches over
    // the same deterministic file order. The raw string is NOT stable
    // enough — "changes/" vs "./changes" vs an absolute spelling would
    // mint a fresh ledger and silently defeat replay dedup — so the
    // default derives from the FileSystem-qualified URI of the
    // directory, which collapses relative paths, trailing slashes and
    // scheme defaults to one canonical form.
    val appId = Option(txnAppId).getOrElse {
      val p = new org.apache.hadoop.fs.Path(changesDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val canonical = s"merge-stream:${fs.makeQualified(p).toUri}"
      // upgrade path: tables created before the canonical-URI default
      // hold their ledger under the RAW-string key. Adopting the new
      // key there would orphan that history — a rebuilt checkpoint
      // replaying old batches would no longer be deduped until the
      // new key accumulates its own. So if the table already carries
      // ledger history under the legacy key and NONE under the
      // canonical one, keep writing the legacy key.
      val legacy = s"merge-stream:$changesDir"
      val ledger =
        graft.ext.TxTable.latestVersion(spark, tableDir)
          .map(v => graft.ext.TxTable.readManifest(spark, tableDir, v).txns)
          .getOrElse(Map.empty[String, Long])
      if (legacy != canonical &&
          ledger.contains(legacy) && !ledger.contains(canonical)) legacy
      else canonical
    }
    val committed = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream
      .schema(changesSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(changesDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (rawChanges: DataFrame, batchId: Long) =>
        // one evaluation per batch: the isEmpty probe and the merge's
        // three consumptions (touched collect, vacating-key join,
        // image projection) all read the same materialized blocks —
        // the merge detects the existing checkpoint and passes through
        graft.ext.TxTable.withMaterializedChanges(rawChanges) { changes =>
        if (!changes.isEmpty) {
          val before = graft.ext.TxTable.latestVersion(spark, tableDir)
          val after =
            if (moR) graft.ext.TxTable.mergeChangeSetDv(
              spark, tableDir, changes, keyCol, opCol, partitionCol,
              txn = Some((appId, batchId)))
            else graft.ext.TxTable.mergeChangeSet(
              spark, tableDir, changes, keyCol, opCol, partitionCol,
              txn = Some((appId, batchId)))
          if (!before.contains(after)) committed.incrementAndGet()
        }
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1)
          runMaintenance(spark, tableDir, partitionCol)
        }
        ()
      }
      .start()
    q.awaitTermination()
    committed.get()
  }

  /** Streaming fact + derived view moving IN STEP (r18): each
    * non-empty micro-batch commits ONE multi-table intent —
    * [[graft.ext.PairTxn.MergeDvCommit]] applies the batch to the
    * fact at merge-on-read economics (tombstone sidecars + fresh
    * rows, zero rewrites) and a replace side publishes the view over
    * the post-batch state — so a reader NEVER sees a fact the view
    * lags behind past the roll-forward window, at any crash point
    * (the [[graft.ext.PairTxn]] matrix; `commitAll` rolls forward any
    * predecessor before staging, so the stream self-heals).
    *
    * Exactly-once under at-least-once foreachBatch: the fact side
    * carries the (appId, batchId) ledger tag — a replayed batch
    * re-applies NOTHING (it stages an empty delta; the group still
    * moves in step) — and the view content is derived from what the
    * LEDGER says, not from blind recomputation: a batch the ledger
    * already records is applied IN the current fact, so the view
    * recompute is literally `viewOf(currentFact)`; a fresh batch
    * recomputes as anti-join the batch's keys out, union the batch's
    * insert/update images back — which equals `viewOf` of the
    * post-merge fact because the INSERT CONTRACT below forbids the
    * one divergent case. Same canonical-URI appId derivation as
    * [[mergeAvailableVersioned]].
    *
    * INSERT CONTRACT (enforced loudly, the r18 ADVICE hole): an
    * `op = 'insert'` key must be ABSENT from the current fact.
    * [[graft.ext.TxTable.mergeChangeSetDv]] tombstones only
    * update/delete keys, so an insert-of-existing-key would DUPLICATE
    * the row in the committed fact while the view recompute replaced
    * it — silently breaking the group invariant `view ==
    * viewOf(fact)`. The batch fails BEFORE anything stages (nothing
    * of the intent exists yet); the producer re-tags the row as
    * `update` for upsert semantics. The check is one semi-join
    * LIMIT 1 against the fact's key column — column-pruned, and only
    * on the not-yet-applied path (a replayed batch skips it: its
    * insert keys are in the fact by construction).
    *
    * `maxFilesPerTrigger` batches that many change files per intent
    * (default 1 = one intent per file, the historical cadence) —
    * same argument as [[mergeAvailableVersioned]]: the feed contract
    * (at most one change per key across the whole feed) makes any
    * file batching equal to the one-shot apply, the ledger tag is
    * per-BATCH, and the view is recomputed from the post-batch fact
    * either way, so a catch-up consumer pays one intent (two staged
    * commits + a view recompute) per N files instead of per file.
    *
    * `viewOf` maps the post-batch fact frame to the view's content —
    * the pipeline's own aggregate. Returns the number of intents
    * committed. */
  def pairAvailable(
      spark: SparkSession,
      coordDir: String,
      factDir: String,
      viewDir: String,
      changesDir: String,
      changesSchema: org.apache.spark.sql.types.StructType,
      checkpoint: String,
      viewOf: DataFrame => DataFrame,
      keyCol: String = "event_id",
      opCol: String = "op",
      partitionCol: String = "pbucket",
      txnAppId: String = null,
      maxFilesPerTrigger: Int = 1): Long = {
    Seq(keyCol, opCol, partitionCol).foreach { c =>
      require(changesSchema.fieldNames.contains(c),
        s"changesSchema must carry '$c': ${changesSchema.fieldNames.mkString(", ")}")
    }
    require(maxFilesPerTrigger >= 1,
      s"maxFilesPerTrigger must be >= 1: $maxFilesPerTrigger")
    val appId = Option(txnAppId).getOrElse {
      val p = new org.apache.hadoop.fs.Path(changesDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      s"pair-stream:${fs.makeQualified(p).toUri}"
    }
    val committed = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream
      .schema(changesSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(changesDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (rawChanges: DataFrame, batchId: Long) =>
        // one evaluation per batch: WITHOUT this the changeset is
        // re-planned and re-scanned by the isEmpty probe, the
        // insert-contract semi-join, the view recompute's anti-join
        // keys + images, and the MoR staging's three consumptions —
        // six-plus executions of the same batch frame. The staged
        // merge detects the existing checkpoint and passes through.
        graft.ext.TxTable.withMaterializedChanges(rawChanges) { changes =>
        if (!changes.isEmpty) {
          // roll forward any crashed predecessor BEFORE reading the
          // fact: TxTable.read pins its version eagerly, and a view
          // derived from a pre-recovery snapshot would silently miss
          // the recovered batch (commitAll recovers too, but only
          // after this read would have happened)
          graft.ext.PairTxn.recoverPairs(spark, coordDir)
          val cur = graft.ext.TxTable.read(spark, factDir)
          // the LEDGER decides the recompute shape: a batch already
          // recorded is applied IN `cur`, so anti-join/union would
          // re-add its insert images (duplicating them in the view's
          // input) — the identity is the only correct replay recompute
          val replayed = graft.ext.TxTable.latestVersion(spark, factDir)
            .map(v => graft.ext.TxTable.readManifest(spark, factDir, v).txns)
            .exists(_.get(appId).exists(_ >= batchId))
          val applied =
            if (replayed) cur
            else {
              // insert contract (see the scaladoc): enforced BEFORE
              // anything stages, so a violating batch leaves no debris
              val insertKeys = changes.where(col(opCol) === "insert")
                .select(col(keyCol)).distinct()
              require(cur.join(insertKeys, Seq(keyCol), "left_semi").isEmpty,
                s"pairAvailable batch $batchId: an op='insert' key already " +
                  s"exists in the fact at $factDir — the MoR merge would " +
                  "duplicate the row while the view recompute replaced it, " +
                  "breaking view == viewOf(fact); re-tag the change as " +
                  "op='update' for upsert semantics")
              val images = changes
                .where(col(opCol).isin("insert", "update"))
                .select(cur.columns.map(col).toSeq: _*)
              cur.join(changes.select(col(keyCol)).distinct(),
                  Seq(keyCol), "left_anti")
                .unionByName(images)
            }
          graft.ext.PairTxn.commitAll(spark, coordDir, Seq(
            graft.ext.PairTxn.MergeDvCommit(factDir, changes, keyCol,
              opCol, partitionCol, txn = Some((appId, batchId))),
            graft.ext.PairTxn.PairCommit(viewDir, viewOf(applied),
              replace = true)))
          committed.incrementAndGet()
        }
        }
        ()
      }
      .start()
    q.awaitTermination()
    committed.get()
  }
}
