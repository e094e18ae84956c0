package graft.ext

import graft.SparkSpec
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Store-level contract tests for [[ObjectStoreLogStore]] that the
  * whole-table battery ([[TxTableCasStoreSpec]]) cannot reach: the
  * crash window between CAS and filesystem write-through, the
  * reader-side repair of such client-only entries, the CAS-native
  * list() short-circuit, and the split-brain loud-fail during a mixed
  * HadoopLogStore/ObjectStoreLogStore rollout. */
class CasLogStoreSpec extends SparkSpec {

  private def rawFs(dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def keyOf(fs: FileSystem, p: Path): String =
    fs.makeQualified(p).toUri.toString

  private def fsText(p: Path): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p.toUri.getPath)), "UTF-8")

  /** Counts filesystem LIST calls — the operation the CAS-native
    * short-circuit exists to save. */
  private final class CountingFs(underlying: FileSystem)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    val lists = new java.util.concurrent.atomic.AtomicInteger(0)
    override def listStatus(p: Path): Array[FileStatus] = {
      lists.incrementAndGet(); super.listStatus(p)
    }
    // FilterFileSystem does NOT delegate getScheme (base throws)
    override def getScheme: String = underlying.getScheme
  }

  test("writer killed between CAS and materialize: readers still see the version AND repair the fs copy") {
    graft.QueryUtil.inTempDir("graft_cas_crash") { dir =>
      val fs = rawFs(dir)
      val log = new Path(new Path(dir), "_graft_log")
      val store = new ObjectStoreLogStore(InMemoryCasClient, fs)
      assert(store.writeIfAbsent(new Path(log, "00000000000000000001.json"), "v1"))
      // a client that dies AFTER its conditional PUT succeeds — the
      // exact crash window CasLogStore.scala documents
      val dying = new ConditionalPutClient {
        override def putIfNoneMatch(key: String, content: String): Boolean = {
          val won = InMemoryCasClient.putIfNoneMatch(key, content)
          if (won) sys.error("killed between CAS and materialize")
          won
        }
        override def get(key: String) = InMemoryCasClient.get(key)
        override def listPrefix(prefix: String) = InMemoryCasClient.listPrefix(prefix)
        override def delete(key: String): Unit = InMemoryCasClient.delete(key)
      }
      val v2 = new Path(log, "00000000000000000002.json")
      val crashing = new ObjectStoreLogStore(dying, fs)
      intercept[RuntimeException] { crashing.writeIfAbsent(v2, "v2") }
      // claim is held, fs copy missing: the version must be VISIBLE
      // through list+read on a healthy store...
      assert(!fs.exists(v2), "precondition: the crash left no fs copy")
      assert(store.list(log).contains(v2.getName))
      assert(store.read(v2) === "v2")
      // ...and the read must have REPAIRED the filesystem copy for
      // plain file sources (the change feed streams this directory)
      assert(fs.exists(v2), "reader must re-materialize a client-only entry")
      assert(fsText(v2) === "v2")
      // a loser against the crashed claim still loses
      assert(!store.writeIfAbsent(v2, "usurper"))
    }
  }

  test("concurrent repairers of the same client-only entry are harmless") {
    graft.QueryUtil.inTempDir("graft_cas_repair2") { dir =>
      val fs = rawFs(dir)
      val log = new Path(new Path(dir), "_graft_log")
      val p = new Path(log, "00000000000000000001.json")
      fs.mkdirs(log)
      // client-only entry, planted directly (a crashed winner)
      InMemoryCasClient.putIfNoneMatch(keyOf(fs, p), "content")
      val store = new ObjectStoreLogStore(InMemoryCasClient, fs)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 4).map(_ => new Thread(() =>
        try { assert(store.read(p) === "content") }
        catch { case t: Throwable => errs.add(t) }))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"racing repairers must not fail: ${errs.peek()}")
      assert(fsText(p) === "content")
      // no stray staging files left behind by the losing repairers
      assert(fs.listStatus(log).map(_.getPath.getName)
        .count(_.startsWith(".cas-tmp")) === 0)
    }
  }

  test("CAS-native table skips the filesystem LIST; migrated table still unions pre-adoption entries") {
    graft.QueryUtil.inTempDir("graft_cas_list") { dir =>
      // CAS-NATIVE: version 1 born through the store → marker set at
      // creation → list() never pays the fs LIST
      val nativeLog = new Path(new Path(dir), "native/_graft_log")
      val counting = new CountingFs(rawFs(dir))
      val store = new ObjectStoreLogStore(InMemoryCasClient, counting)
      assert(store.writeIfAbsent(
        new Path(nativeLog, "00000000000000000001.json"), "v1"))
      assert(store.writeIfAbsent(
        new Path(nativeLog, "00000000000000000002.json"), "v2"))
      counting.lists.set(0)
      val names = store.list(nativeLog)
      assert(names.toSet === Set(
        "00000000000000000001.json", "00000000000000000002.json"),
        s"marker must never leak into list(): $names")
      assert(counting.lists.get() === 0,
        "CAS-native table must answer list() from the client alone")

      // MIGRATED: a pre-adoption entry exists only on the filesystem →
      // no marker → list() unions, and the entry is visible
      val migratedLog = new Path(new Path(dir), "migrated/_graft_log")
      val fs = rawFs(dir)
      fs.mkdirs(migratedLog)
      val legacy = new Path(migratedLog, "00000000000000000001.json")
      val out = fs.create(legacy, false)
      try out.write("legacy-v1".getBytes("UTF-8")) finally out.close()
      assert(store.writeIfAbsent(
        new Path(migratedLog, "00000000000000000002.json"), "v2"))
      assert(store.list(migratedLog).toSet === Set(
        "00000000000000000001.json", "00000000000000000002.json"))
      // pre-adoption version still wins its own number
      assert(!store.writeIfAbsent(legacy, "usurper"))
      assert(store.read(legacy) === "legacy-v1")
    }
  }

  test("change feed across a CAS crash window: the next writer's replay repairs version N; the file source delivers N and N+1 in order") {
    // A crashed winner leaves version N client-only — invisible to the
    // PLAIN FILE SOURCE the change feed runs on. The r15 repair makes
    // this self-healing: the next writer's commit REPLAYS the log
    // through the store (read() re-materializes N onto the filesystem)
    // strictly BEFORE it publishes N+1, so the feed can never observe
    // N+1 without N. Simulated by deleting N's filesystem copy while
    // the client keeps the claim — the exact post-crash state.
    TxTable.withLogStore(ObjectStoreLogStore.inMemoryFactory) {
      graft.QueryUtil.inTempDir("graft_cas_feed") { dir =>
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val base = (0 until 8).map(i => (i.toLong, i * 10.0, (i % 2).toLong))
          .toDF("event_id", "value", "pbucket")
        TxTable.commitReplace(spark, dir, base, Some("pbucket"))
        val ch2 = Seq((100L, "insert", 1.0, 0L))
          .toDF("event_id", "op", "value", "pbucket")
        TxTable.mergeChangeSet(spark, dir, ch2, "event_id", "op", "pbucket")
        // crash simulation: v2's claim survives, its fs copy does not
        val fs = rawFs(dir)
        val v2 = new Path(new Path(dir), "_graft_log/00000000000000000002.json")
        assert(fs.delete(v2, false), "precondition: fs copy removed")
        // next writer replays (repairing v2) then publishes v3
        val ch3 = Seq((101L, "insert", 2.0, 1L))
          .toDF("event_id", "op", "value", "pbucket")
        TxTable.mergeChangeSet(spark, dir, ch3, "event_id", "op", "pbucket")
        assert(fs.exists(v2), "the v3 writer's replay must have repaired v2")
        // the plain-file change feed sees the full, ordered history
        val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
        graft.QueryUtil.inTempDir("graft_cas_feed_ckpt") { ckpt =>
          graft.streaming.ChangeFeedStream.followAvailable(
            spark, dir, "event_id", s"$ckpt/cp") { (v, changes) =>
            seen += ((v, changes.select(col("event_id"))
              .collect().map(_.getLong(0)).toSet))
          }
        }
        assert(seen.map(_._1).toSeq == Seq(2L, 3L),
          s"feed must deliver every version in order: ${seen.map(_._1)}")
        assert(seen.toMap.apply(2L) == Set(100L) && seen.toMap.apply(3L) == Set(101L))
      }
    }
  }

  test("read repair is BEST-EFFORT: a reader without fs write permission still gets the bytes") {
    graft.QueryUtil.inTempDir("graft_cas_ro") { dir =>
      val fs = rawFs(dir)
      val log = new Path(new Path(dir), "_graft_log")
      val p = new Path(log, "00000000000000000001.json")
      // client-only entry (a crashed winner), read through a store
      // whose filesystem refuses writes — the r16 ADVICE case: repair
      // capability must never be a precondition for reading
      InMemoryCasClient.putIfNoneMatch(keyOf(fs, p), "content")
      val readOnly = new org.apache.hadoop.fs.FilterFileSystem(fs) {
        override def getScheme: String = this.fs.getScheme
        override def mkdirs(f: Path, perm: org.apache.hadoop.fs.permission.FsPermission) =
          throw new java.io.IOException("read-only filesystem")
        override def create(f: Path, overwrite: Boolean) =
          throw new java.io.IOException("read-only filesystem")
      }
      val store = new ObjectStoreLogStore(InMemoryCasClient, readOnly)
      assert(store.read(p) === "content",
        "a failed repair must not fail the read")
      assert(!fs.exists(p), "nothing materialized through a read-only fs")
      // a writable store later repairs the same entry as usual
      val writable = new ObjectStoreLogStore(InMemoryCasClient, fs)
      assert(writable.read(p) === "content")
      assert(fsText(p) === "content")
    }
  }

  test("legacy HadoopLogStore writer on a CAS-NATIVE table fails LOUDLY instead of publishing invisible versions") {
    graft.QueryUtil.inTempDir("graft_cas_legacy_native") { dir =>
      val fs = rawFs(dir)
      val log = new Path(new Path(dir), "_graft_log")
      val store = new ObjectStoreLogStore(InMemoryCasClient, fs)
      // table BORN through CAS — marker set, list() filesystem-free
      assert(store.writeIfAbsent(new Path(log, "00000000000000000001.json"), "v1"))
      // a legacy writer renames version 2 straight onto the filesystem
      // (the silent-loss direction: CAS readers would never list it)
      val squatted = new Path(log, "00000000000000000002.json")
      val out = fs.create(squatted, false)
      try out.write("LEGACY CONTENT".getBytes("UTF-8")) finally out.close()
      // the first CAS writer to target that version detects the
      // squatter and names the constraint — without this it would
      // return false forever and wedge the OCC retry loop
      val e = intercept[RuntimeException] { store.writeIfAbsent(squatted, "cas v2") }
      assert(e.getMessage.contains("CAS-NATIVE"))
      assert(e.getMessage.contains("silently never list"), e.getMessage)
      assert(fsText(squatted) === "LEGACY CONTENT", "legacy bytes untouched")
    }
  }

  test("chaos property: writers × random kill points × racing repairers → one linear history, fs and client agree") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val writers = 4
    val versions = 5
    // kill mode per (version, writer): 0 = healthy, 1 = dies BEFORE its
    // CAS (no claim), 2 = dies BETWEEN CAS and materialize (client-only
    // claim) — the generalization of the two hand-written crash specs
    val gen = Gen.listOfN(versions * writers, Gen.choose(0, 2))
    val prop = Prop.forAll(gen) { kills =>
      graft.QueryUtil.inTempDir("graft_cas_chaos") { dir =>
        val fs = rawFs(dir)
        val log = new Path(new Path(dir), "_graft_log")
        def clientWith(mode: Int): ConditionalPutClient = new ConditionalPutClient {
          override def putIfNoneMatch(key: String, content: String): Boolean = {
            if (mode == 1) sys.error("killed before CAS")
            val won = InMemoryCasClient.putIfNoneMatch(key, content)
            if (won && mode == 2) sys.error("killed between CAS and materialize")
            won
          }
          override def get(key: String) = InMemoryCasClient.get(key)
          override def listPrefix(prefix: String) = InMemoryCasClient.listPrefix(prefix)
          override def delete(key: String): Unit = InMemoryCasClient.delete(key)
        }
        def pathOf(v: Int) = new Path(log, f"$v%020d.json")
        for (v <- 1 to versions) {
          val threads = (0 until writers).map { w =>
            new Thread(() => {
              val st = new ObjectStoreLogStore(
                clientWith(kills((v - 1) * writers + w)), fs)
              try { st.writeIfAbsent(pathOf(v), s"w$w-v$v"); () }
              catch { case _: RuntimeException => () } // the kill
            })
          }
          threads.foreach(_.start()); threads.foreach(_.join())
          // a slot every writer died before claiming is re-driven by a
          // recovery writer (the OCC retry any real pipeline runs)
          new ObjectStoreLogStore(InMemoryCasClient, fs)
            .writeIfAbsent(pathOf(v), s"recovery-v$v")
        }
        val store = new ObjectStoreLogStore(InMemoryCasClient, fs)
        val names = store.list(log)
        // racing repairers sweep the log concurrently
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val repairers = (1 to 4).map(_ => new Thread(() =>
          try names.foreach(n => store.read(new Path(log, n)))
          catch { case t: Throwable => errs.add(t) }))
        repairers.foreach(_.start()); repairers.foreach(_.join())
        val linear = names.toSet ==
          (1 to versions).map(v => f"$v%020d.json").toSet
        errs.isEmpty && linear && (1 to versions).forall { v =>
          val p = pathOf(v)
          val claimed = InMemoryCasClient.get(keyOf(fs, p))
          // exactly one winner; reads, filesystem and client all agree;
          // the decided claim can never be re-won
          claimed.nonEmpty && store.read(p) == claimed.get &&
            fs.exists(p) && fsText(p) == claimed.get &&
            !store.writeIfAbsent(p, "late usurper")
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.toString)
  }

  test("split-brain during a mixed-store rollout fails LOUDLY naming the constraint") {
    graft.QueryUtil.inTempDir("graft_cas_split") { dir =>
      val fs = rawFs(dir)
      val log = new Path(new Path(dir), "_graft_log")
      fs.mkdirs(log)
      val p = new Path(log, "00000000000000000002.json")
      // a legacy HadoopLogStore writer publishes version 2 in the
      // window between this writer's exists-check and its CAS — the
      // injection point is the client call itself
      val racing = new ConditionalPutClient {
        override def putIfNoneMatch(key: String, content: String): Boolean = {
          val won = InMemoryCasClient.putIfNoneMatch(key, content)
          if (won && key.endsWith("00000000000000000002.json")) {
            val out = fs.create(p, false)
            try out.write("LEGACY CONTENT".getBytes("UTF-8")) finally out.close()
          }
          won
        }
        override def get(key: String) = InMemoryCasClient.get(key)
        override def listPrefix(prefix: String) = InMemoryCasClient.listPrefix(prefix)
        override def delete(key: String): Unit = InMemoryCasClient.delete(key)
      }
      val store = new ObjectStoreLogStore(racing, fs)
      val e = intercept[RuntimeException] { store.writeIfAbsent(p, "cas content") }
      assert(e.getMessage.contains("SPLIT-BRAIN"))
      assert(e.getMessage.contains("switch"), "error must name the migration constraint")
      // the legacy bytes were NOT clobbered — reconciliation is manual
      assert(fsText(p) === "LEGACY CONTENT")
    }
  }
}
