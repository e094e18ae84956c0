package graft.ext

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-matrix proof for [[PairTxn]]: a writer killed at every point
  * of the intent → publish-A → publish-B → done sequence, plus both
  * foreign-writer contention cells (clean abort / loud strand). */
class PairTxnSpec extends SparkSpec {

  private def fact(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i * 10.0)).toDF("event_id", "value")
  }

  private def summarize(df: DataFrame): DataFrame =
    df.groupBy((col("event_id") % 3).as("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** LogStore factory that throws ON the Nth manifest publish matching
    * `needle` — the kill switch for each crash window. The underlying
    * write never happens: the "process" dies before it. */
  private def killingFactory(
      needle: String, alive: java.util.concurrent.atomic.AtomicBoolean)
      : FileSystem => LogStore = { fs =>
    val real = new HadoopLogStore(fs)
    new LogStore {
      override def list(dir: Path): Seq[String] = real.list(dir)
      override def read(path: Path): String = real.read(path)
      override def writeIfAbsent(path: Path, content: String): Boolean = {
        if (alive.get() && path.toString.contains(needle) &&
            path.getName.endsWith(".json") && !path.getName.startsWith("_ckpt"))
          sys.error(s"killed before publishing $path")
        real.writeIfAbsent(path, content)
      }
      override def delete(path: Path): Unit = real.delete(path)
    }
  }

  private def inDir[T](f: String => T): T =
    graft.QueryUtil.inTempDir("graft_pairtxn")(f)

  private def pair(tmp: String, n: Int): (PairTxn.PairCommit, PairTxn.PairCommit) = {
    val f = fact(n)
    (PairTxn.PairCommit(s"$tmp/fact", f, replace = true),
      PairTxn.PairCommit(s"$tmp/summary", summarize(f), replace = true))
  }

  test("happy path: both tables move in step; reads at the shared state agree") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      val (v1, v2) = PairTxn.commitPair(spark, tmp, a, b)
      assert(v1 === 1L && v2 === 1L)
      // second txn: append to the fact, replace the summary
      val delta = fact(20).where(col("event_id") >= 12)
      val (v3, v4) = PairTxn.commitPair(spark, tmp,
        PairTxn.PairCommit(s"$tmp/fact", delta),
        PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
      assert(v3 === 2L && v4 === 2L)
      assert(rows(TxTable.read(spark, s"$tmp/summary")) ===
        rows(summarize(TxTable.read(spark, s"$tmp/fact"))))
      assert(TxTable.read(spark, s"$tmp/fact").count() === 20L)
      // nothing left open: recovery finds no work
      assert(PairTxn.recoverPairs(spark, tmp) === 0)
    }
  }

  test("writer killed BETWEEN the two publishes: recovery rolls the pair forward") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b) // healthy seed at v1
      val delta = fact(20).where(col("event_id") >= 12)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      // dies on the SUMMARY publish — after the intent and the fact's v2
      val e = intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/summary/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", delta),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      assert(e.getMessage.contains("killed"), e.getMessage)
      // the crash window is OBSERVABLE: fact moved, summary lagged
      assert(TxTable.latestVersion(spark, s"$tmp/fact") === Some(2L))
      assert(TxTable.latestVersion(spark, s"$tmp/summary") === Some(1L))
      // roll-forward completes the pair from the intent's bytes
      alive.set(false)
      assert(PairTxn.recoverPairs(spark, tmp) === 1)
      assert(TxTable.latestVersion(spark, s"$tmp/summary") === Some(2L))
      assert(rows(TxTable.read(spark, s"$tmp/summary")) ===
        rows(summarize(TxTable.read(spark, s"$tmp/fact"))))
      // recovery is idempotent; re-running finds nothing open
      assert(PairTxn.recoverPairs(spark, tmp) === 0)
    }
  }

  test("writer killed BEFORE the first publish: neither table visible, recovery publishes both") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/fact/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp, a, b)
        }
      }
      // all-or-nothing before recovery: NEITHER table exists yet
      assert(TxTable.latestVersion(spark, s"$tmp/fact").isEmpty)
      assert(TxTable.latestVersion(spark, s"$tmp/summary").isEmpty)
      alive.set(false)
      assert(PairTxn.recoverPairs(spark, tmp) === 1)
      assert(TxTable.latestVersion(spark, s"$tmp/fact") === Some(1L))
      assert(TxTable.latestVersion(spark, s"$tmp/summary") === Some(1L))
      assert(rows(TxTable.read(spark, s"$tmp/summary")) === rows(summarize(fact(12))))
    }
  }

  test("foreign writer steals the FIRST slot before anything published: clean abort") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b) // seed v1 on both
      // crash a second txn before its first publish, leaving an open intent
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/fact/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", fact(20).where(col("event_id") >= 12)),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      alive.set(false)
      // a FOREIGN writer takes the fact's v2 slot while the txn is down
      TxTable.commitReplace(spark, s"$tmp/fact", fact(5))
      assert(TxTable.latestVersion(spark, s"$tmp/fact") === Some(2L))
      // recovery detects the foreign occupant at the FIRST side and
      // aborts: the stale summary replace must NOT land
      assert(PairTxn.recoverPairs(spark, tmp) === 1)
      assert(TxTable.latestVersion(spark, s"$tmp/summary") === Some(1L),
        "an aborted pair txn must publish nothing")
      assert(TxTable.read(spark, s"$tmp/fact").count() === 5L,
        "the foreign commit owns the slot")
      // the abort is recorded: nothing remains open
      assert(PairTxn.recoverPairs(spark, tmp) === 0)
    }
  }

  test("foreign writer steals the SECOND slot after the first published: loud strand, never silent divergence") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b) // seed v1 on both
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/summary/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", fact(20).where(col("event_id") >= 12)),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      alive.set(false)
      // contention-contract violation: a foreign writer replaces the
      // summary while the pair txn is mid-flight
      TxTable.commitReplace(spark, s"$tmp/summary", summarize(fact(3)))
      val e = intercept[RuntimeException] { PairTxn.recoverPairs(spark, tmp) }
      assert(e.getMessage.contains("STRANDED"), e.getMessage)
      assert(e.getMessage.contains("reconcile"), e.getMessage)
    }
  }

  // ---- N-table generalization (r17): fact + two derived views ----

  private def view2(df: DataFrame): DataFrame =
    df.groupBy((col("event_id") % 2).as("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))

  private def commit3(tmp: String, n: Int): Seq[PairTxn.PairCommit] = {
    val f = fact(n)
    Seq(PairTxn.PairCommit(s"$tmp/fact", f, replace = true),
      PairTxn.PairCommit(s"$tmp/va", summarize(f), replace = true),
      PairTxn.PairCommit(s"$tmp/vb", view2(f), replace = true))
  }

  test("3-table txn killed at EVERY publish point: prefix-only visibility, " +
      "roll-forward completes the remainder from the intent's bytes") {
    inDir { tmp =>
      val tables = Seq("fact", "va", "vb")
      assert(PairTxn.commitAll(spark, tmp, commit3(tmp, 6)) === Seq(1L, 1L, 1L))
      // kill window k = dying ON table k's publish: tables 0..k-1
      // visible at the new version, k..2 lagging — never a gap
      tables.zipWithIndex.foreach { case (victim, k) =>
        val before = tables.map(t =>
          TxTable.latestVersion(spark, s"$tmp/$t").get)
        val next = before.head + 1
        val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
        val e = intercept[RuntimeException] {
          TxTable.withLogStore(killingFactory(s"/$victim/_graft_log", alive)) {
            PairTxn.commitAll(spark, tmp, commit3(tmp, 6 + k))
          }
        }
        assert(e.getMessage.contains("killed"), e.getMessage)
        val seen = tables.map(t => TxTable.latestVersion(spark, s"$tmp/$t").get)
        assert(seen === tables.indices.map(i => if (i < k) next else next - 1),
          s"kill window $k must expose exactly the $k-prefix")
        alive.set(false)
        assert(PairTxn.recoverPairs(spark, tmp) === 1)
        tables.foreach(t =>
          assert(TxTable.latestVersion(spark, s"$tmp/$t") === Some(next)))
        // group invariant at the recovered state
        val f = TxTable.read(spark, s"$tmp/fact")
        assert(rows(TxTable.read(spark, s"$tmp/va")) === rows(summarize(f)))
        assert(rows(TxTable.read(spark, s"$tmp/vb")) === rows(view2(f)))
      }
    }
  }

  test("commitAll refuses fewer than two tables and any duplicate dir") {
    inDir { tmp =>
      val f = fact(4)
      val e1 = intercept[IllegalArgumentException] {
        PairTxn.commitAll(spark, tmp,
          Seq(PairTxn.PairCommit(s"$tmp/only", f, replace = true)))
      }
      assert(e1.getMessage.contains("at least two"))
      val e2 = intercept[IllegalArgumentException] {
        PairTxn.commitAll(spark, tmp, Seq(
          PairTxn.PairCommit(s"$tmp/a", f, replace = true),
          PairTxn.PairCommit(s"$tmp/b", f, replace = true),
          PairTxn.PairCommit(s"$tmp/a/", f, replace = true)))
      }
      assert(e2.getMessage.contains("DISTINCT"))
    }
  }

  // ---- orphan vacuum (r17): every resolution path reclaims to zero ----

  private def parquetCount(dir: String): Int = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) 0
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
  }

  test("killed BEFORE the intent: staged files are orphans of NO txn — " +
      "age-guarded vacuum reclaims both never-born tables to zero parquet") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      val e = intercept[RuntimeException] {
        // the intent record lives under _graft_pairtxn/<id>.json — dying
        // on ITS publish is the crash window after staging, before the
        // durability point
        TxTable.withLogStore(killingFactory("_graft_pairtxn", alive)) {
          PairTxn.commitPair(spark, tmp, a, b)
        }
      }
      assert(e.getMessage.contains("killed"), e.getMessage)
      alive.set(false)
      // nothing visible, no intent — recovery correctly finds no work
      assert(TxTable.latestVersion(spark, s"$tmp/fact").isEmpty)
      assert(TxTable.latestVersion(spark, s"$tmp/summary").isEmpty)
      assert(PairTxn.recoverPairs(spark, tmp) === 0)
      assert(parquetCount(s"$tmp/fact") > 0, "staged debris must exist")
      // retention guard: fresh debris is indistinguishable from an
      // in-flight first commit — spared
      assert(TxTable.vacuum(spark, s"$tmp/fact") === 0)
      assert(parquetCount(s"$tmp/fact") > 0)
      // past the window (0 = decommission/test), the never-born table
      // sweeps clean — the pre-r17 early-return left this forever
      assert(TxTable.vacuum(spark, s"$tmp/fact", retentionMs = 0L) > 0)
      assert(TxTable.vacuum(spark, s"$tmp/summary", retentionMs = 0L) > 0)
      assert(parquetCount(s"$tmp/fact") === 0)
      assert(parquetCount(s"$tmp/summary") === 0)
    }
  }

  test("vacuumTxns reclaims an ABORTED txn's staged files and retires the " +
      "record; published/foreign data untouched; idempotent") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b) // seed v1 (also leaves a .done record)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/fact/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", fact(20).where(col("event_id") >= 12)),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      alive.set(false)
      TxTable.commitReplace(spark, s"$tmp/fact", fact(5)) // foreign steals v2
      assert(PairTxn.recoverPairs(spark, tmp) === 1) // abort recorded
      val factBefore = parquetCount(s"$tmp/fact")
      val sumBefore = parquetCount(s"$tmp/summary")
      // retention guard: a fresh abort is spared (its owner may be
      // inspecting the staged state)
      assert(PairTxn.vacuumTxns(spark, tmp) === 0)
      val reclaimed = PairTxn.vacuumTxns(spark, tmp, retentionMs = 0L)
      assert(reclaimed > 0, "the aborted txn staged files on both sides")
      assert(parquetCount(s"$tmp/fact") < factBefore)
      assert(parquetCount(s"$tmp/summary") < sumBefore)
      // every PUBLISHED version still reads intact
      assert(TxTable.read(spark, s"$tmp/fact").count() === 5L)
      assert(rows(TxTable.read(spark, s"$tmp/summary")) ===
        rows(summarize(fact(12))))
      // records retired (the seed's .done too), second sweep is a no-op
      assert(new java.io.File(s"$tmp/_graft_pairtxn").listFiles()
        .count(f => !f.getName.startsWith(".")) === 0)
      assert(PairTxn.vacuumTxns(spark, tmp, retentionMs = 0L) === 0)
    }
  }

  test("vacuumTxns never touches an OPEN intent — record and staged files " +
      "survive, roll-forward still completes from them") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b) // seed v1
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/summary/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", fact(20).where(col("event_id") >= 12)),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      alive.set(false)
      // even at retention 0, the open intent is live work: untouched
      assert(PairTxn.vacuumTxns(spark, tmp, retentionMs = 0L) === 0)
      assert(new java.io.File(s"$tmp/_graft_pairtxn").listFiles()
        .exists(_.getName.endsWith(".json")), "open intent record must survive")
      // the staged bytes it references still roll forward
      assert(PairTxn.recoverPairs(spark, tmp) === 1)
      assert(TxTable.latestVersion(spark, s"$tmp/summary") === Some(2L))
      assert(rows(TxTable.read(spark, s"$tmp/summary")) ===
        rows(summarize(TxTable.read(spark, s"$tmp/fact"))))
    }
  }

  test("resolveStranded records the operator verdict exactly once; an " +
      "aborted stranded txn vacuums ONLY its unpublished sides") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b) // seed v1
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/summary/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", fact(20).where(col("event_id") >= 12)),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      alive.set(false)
      // contention-contract violation strands the txn: fact published
      // v2, a foreign writer then takes the summary's v2 slot
      TxTable.commitReplace(spark, s"$tmp/summary", summarize(fact(3)))
      val e = intercept[RuntimeException] { PairTxn.recoverPairs(spark, tmp) }
      val id = """txn (\S+) STRANDED""".r.findFirstMatchIn(e.getMessage)
        .map(_.group(1)).getOrElse(fail(s"no id in: ${e.getMessage}"))
      assert(e.getMessage.contains("resolveStranded"), e.getMessage)
      // unknown ids and double-resolution are refused
      val e1 = intercept[IllegalArgumentException] {
        PairTxn.resolveStranded(spark, tmp, "no-such-txn", abort = true)
      }
      assert(e1.getMessage.contains("no intent"))
      PairTxn.resolveStranded(spark, tmp, id, abort = true)
      val e2 = intercept[IllegalArgumentException] {
        PairTxn.resolveStranded(spark, tmp, id, abort = false)
      }
      assert(e2.getMessage.contains("already resolved"))
      // the verdict ends the replay loop: nothing open any more
      assert(PairTxn.recoverPairs(spark, tmp) === 0)
      // vacuum reclaims the never-published summary side's staged dir,
      // and ONLY that: the fact's PUBLISHED v2 keeps every byte
      val n = PairTxn.vacuumTxns(spark, tmp, retentionMs = 0L)
      assert(n > 0, "the stranded txn staged an unpublished summary commit")
      assert(TxTable.read(spark, s"$tmp/fact").count() === 20L,
        "the published side of the aborted stranded txn must survive")
      assert(rows(TxTable.read(spark, s"$tmp/summary")) ===
        rows(summarize(fact(3))), "the foreign commit owns the summary")
    }
  }

  test("open-intent sentinel: table-level vacuum at retention 0 spares an " +
      "OPEN txn's staged files; after resolution the claim is stale debris") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b) // seed v1
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        // dies on the FACT publish: intent durable, nothing published —
        // every staged file is invisible to both tables' manifests
        TxTable.withLogStore(killingFactory("/fact/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", fact(20).where(col("event_id") >= 12)),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      alive.set(false)
      val factBefore = parquetCount(s"$tmp/fact")
      // the r17 exposure: an aggressive table-level vacuum cannot see
      // the coordinator's intent log — the sentinel under the table
      // root is what keeps roll-forward's bytes alive
      assert(TxTable.vacuum(spark, s"$tmp/fact", retentionMs = 0L) === 0,
        "an open intent's staged files must survive vacuum at ANY age")
      assert(TxTable.vacuum(spark, s"$tmp/summary", retentionMs = 0L) === 0)
      assert(parquetCount(s"$tmp/fact") === factBefore)
      // roll-forward publishes the spared bytes
      assert(PairTxn.recoverPairs(spark, tmp) === 1)
      assert(TxTable.read(spark, s"$tmp/fact").count() === 20L)
      assert(rows(TxTable.read(spark, s"$tmp/summary")) ===
        rows(summarize(fact(20))))
      // published sides dropped their claims; a second vacuum finds
      // only live data and no sentinel debris
      assert(TxTable.vacuum(spark, s"$tmp/fact", retentionMs = 0L) === 0)
      assert(TxTable.read(spark, s"$tmp/fact").count() === 20L)
      val sDir = new java.io.File(s"$tmp/fact/_graft_intent")
      assert(!sDir.exists() || sDir.listFiles().isEmpty,
        "published sides must not leave sentinel claims behind")
    }
  }

  test("vacuumTxns ages a txn by the RESOLUTION STAMP in the marker's " +
      "bytes, not the marker file's mtime") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/fact/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", fact(20).where(col("event_id") >= 12)),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      alive.set(false)
      TxTable.commitReplace(spark, s"$tmp/fact", fact(5)) // foreign steals v2
      assert(PairTxn.recoverPairs(spark, tmp) === 1)      // abort recorded NOW
      // a fresh abort is spared under an hour's retention
      assert(PairTxn.vacuumTxns(spark, tmp, retentionMs = 3600_000L) === 0)
      // rewrite the marker with a two-hour-old STAMP; the file's mtime
      // is brand new (exactly the touched/copied-marker shape object
      // stores produce) — the recorded resolution time must win
      val coordFs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf())
      val markers = new java.io.File(s"$tmp/_graft_pairtxn").listFiles()
        .filter(_.getName.endsWith(".aborted"))
      assert(markers.length === 1)
      val old = (System.currentTimeMillis() - 7200_000L).toString
      java.nio.file.Files.write(markers.head.toPath, old.getBytes("UTF-8"))
      assert(PairTxn.vacuumTxns(spark, tmp, retentionMs = 3600_000L) > 0,
        "a marker stamped two hours ago must age out of a 1h window " +
          "even with a fresh mtime")
      assert(coordFs != null) // fs handle used only to pin local scheme
    }
  }

  test("a dangling resolution marker (record already retired) is tolerated " +
      "and cleaned, never a wedged sweep") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/fact/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", fact(20).where(col("event_id") >= 12)),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      alive.set(false)
      TxTable.commitReplace(spark, s"$tmp/fact", fact(5))
      assert(PairTxn.recoverPairs(spark, tmp) === 1) // abort recorded
      // simulate the crash window between the sweep's record delete and
      // marker delete: the record vanishes, the marker survives
      new java.io.File(s"$tmp/_graft_pairtxn").listFiles()
        .filter(_.getName.endsWith(".json")).foreach(_.delete())
      // r17 behavior: parseIntent(read(ip)) threw on every sweep forever
      assert(PairTxn.vacuumTxns(spark, tmp, retentionMs = 0L) === 0)
      assert(new java.io.File(s"$tmp/_graft_pairtxn").listFiles()
        .count(f => !f.getName.startsWith(".")) === 0,
        "the dangling marker must retire on the tolerant sweep")
      assert(PairTxn.vacuumTxns(spark, tmp, retentionMs = 0L) === 0)
    }
  }

  test("vacuumTxns treats an UNREADABLE manifest slot on a reachable " +
      "version as published — version retention must never reclassify " +
      "landed data as staged (the r17 data-loss hole)") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b) // seed v1
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/summary/_graft_log", alive)) {
          PairTxn.commitPair(spark, tmp,
            PairTxn.PairCommit(s"$tmp/fact", fact(20).where(col("event_id") >= 12)),
            PairTxn.PairCommit(s"$tmp/summary", summarize(fact(20)), replace = true))
        }
      }
      alive.set(false)
      // strand: fact published v2 (append), foreign writer takes the
      // summary slot; the operator aborts the txn
      TxTable.commitReplace(spark, s"$tmp/summary", summarize(fact(3)))
      val e = intercept[RuntimeException] { PairTxn.recoverPairs(spark, tmp) }
      val id = """txn (\S+) STRANDED""".r.findFirstMatchIn(e.getMessage)
        .map(_.group(1)).getOrElse(fail(s"no id in: ${e.getMessage}"))
      PairTxn.resolveStranded(spark, tmp, id, abort = true)
      // the fact keeps moving: v3 appends, CARRYING v2's files live
      PairTxn.commitPair(spark, tmp,
        PairTxn.PairCommit(s"$tmp/fact", fact(24).where(col("event_id") >= 20)),
        PairTxn.PairCommit(s"$tmp/summary", summarize(fact(24)), replace = true))
      // version retention retires the v2 manifest FILE — the published
      // bytes vacuumTxns used to compare against are gone
      TxTable.vacuum(spark, s"$tmp/fact", keepVersions = Some(1),
        retentionMs = 0L)
      val before = TxTable.read(spark, s"$tmp/fact").count()
      assert(before === 24L)
      // r17 behavior: read(v2 manifest) threw → published=false → the
      // v2 data dir (still live in v3!) was deleted
      PairTxn.vacuumTxns(spark, tmp, retentionMs = 0L)
      assert(TxTable.read(spark, s"$tmp/fact").count() === before,
        "aborting a stranded txn must never delete data a later " +
          "version still carries")
    }
  }

  // ---- MoR side under the multi-table intent (r18) ----

  private def factP(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, i * 10.0, i % 2)).toDF("event_id", "value", "pb")
  }

  private def mergedP(n: Int): DataFrame = {
    import spark.implicits._
    // changeset below: update id 1 → 111.0, delete id 2, insert id 100
    ((0 until n).filterNot(i => i == 1 || i == 2)
      .map(i => (i.toLong, i * 10.0, i % 2)) ++
      Seq((1L, 111.0, 1), (100L, 1000.0, 0)))
      .toDF("event_id", "value", "pb")
  }

  private def changesP(): DataFrame = {
    import spark.implicits._
    Seq((1L, "update", 111.0, 1),
      (2L, "delete", 0.0, 0),
      (100L, "insert", 1000.0, 0)).toDF("event_id", "op", "value", "pb")
  }

  private def factRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Double, Long)] =
    df.select(col("event_id"), col("value"), col("pb").cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet

  private def morSeed(tmp: String): Unit =
    PairTxn.commitAll(spark, tmp, Seq(
      PairTxn.PairCommit(s"$tmp/fact", factP(12), replace = true,
        partitionCol = Some("pb")),
      PairTxn.PairCommit(s"$tmp/view", summarize(factP(12)), replace = true)))

  private def morTxn(tmp: String): Seq[PairTxn.SideCommit] = Seq(
    PairTxn.MergeDvCommit(s"$tmp/fact", changesP(), "event_id", "op", "pb"),
    PairTxn.PairCommit(s"$tmp/view", summarize(mergedP(12)), replace = true))

  private def dvCount(dir: String): Int = {
    val root = new java.io.File(s"$dir/dv")
    if (!root.exists()) 0 else root.listFiles().count(_.isDirectory)
  }

  test("MergeDvCommit side: a DV-writing fact and a replaced view move " +
      "under ONE intent; killed at EVERY window including the sidecar " +
      "stage, the merge applies exactly once or not at all") {
    // happy path first: MoR shape + group invariant
    inDir { tmp =>
      morSeed(tmp)
      val before = TxTable.readManifest(spark, s"$tmp/fact", 1L)
        .files.map(_.path).toSet
      assert(PairTxn.commitAll(spark, tmp, morTxn(tmp)) === Seq(2L, 2L))
      val m2 = TxTable.readManifest(spark, s"$tmp/fact", 2L)
      assert(m2.files.exists(_.dvs.nonEmpty), "tombstones must be DVs")
      assert(before.subsetOf(m2.files.map(_.path).toSet),
        "zero fact files rewritten")
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(mergedP(12)))
      assert(rows(TxTable.read(spark, s"$tmp/view")) ===
        rows(summarize(mergedP(12))))
    }
    // killed ON the intent publish — sidecar + fresh files staged but
    // the txn never became durable: NOTHING visible (tombstones are
    // invisible until their manifest names them), recovery finds no
    // work, the debris vacuums
    inDir { tmp =>
      morSeed(tmp)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      val e = intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("_graft_pairtxn", alive)) {
          PairTxn.commitAll(spark, tmp, morTxn(tmp))
        }
      }
      assert(e.getMessage.contains("killed"), e.getMessage)
      alive.set(false)
      assert(dvCount(s"$tmp/fact") === 1, "the staged sidecar exists")
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(factP(12)),
        "an unpublished tombstone sidecar must not apply")
      assert(PairTxn.recoverPairs(spark, tmp) === 0)
      // decommission sweep reclaims the sidecar and the staged commit
      assert(TxTable.vacuum(spark, s"$tmp/fact", retentionMs = 0L) > 0)
      assert(dvCount(s"$tmp/fact") === 0, "the orphan sidecar must vacuum")
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(factP(12)))
    }
    // killed ON the fact publish — intent durable: roll-forward
    // publishes the SAME staged bytes, merge applied exactly once
    inDir { tmp =>
      morSeed(tmp)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/fact/_graft_log", alive)) {
          PairTxn.commitAll(spark, tmp, morTxn(tmp))
        }
      }
      alive.set(false)
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(factP(12)))
      // the open intent's staged sidecar + files survive vacuum at ANY
      // age (the sentinel claim covers the MoR shape too)
      assert(TxTable.vacuum(spark, s"$tmp/fact", retentionMs = 0L) === 0)
      assert(dvCount(s"$tmp/fact") === 1)
      assert(PairTxn.recoverPairs(spark, tmp) === 1)
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(mergedP(12)))
      assert(rows(TxTable.read(spark, s"$tmp/view")) ===
        rows(summarize(mergedP(12))))
    }
    // killed ON the view publish — the documented prefix window: the
    // merged fact is visible alone until recovery completes the view
    inDir { tmp =>
      morSeed(tmp)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/view/_graft_log", alive)) {
          PairTxn.commitAll(spark, tmp, morTxn(tmp))
        }
      }
      alive.set(false)
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(mergedP(12)))
      assert(TxTable.latestVersion(spark, s"$tmp/view") === Some(1L))
      assert(PairTxn.recoverPairs(spark, tmp) === 1)
      assert(rows(TxTable.read(spark, s"$tmp/view")) ===
        rows(summarize(mergedP(12))))
    }
    // aborted MoR txn: vacuumTxns reclaims the never-published sidecar
    // AND staged data dir; the foreign winner keeps every byte
    inDir { tmp =>
      morSeed(tmp)
      val alive = new java.util.concurrent.atomic.AtomicBoolean(true)
      intercept[RuntimeException] {
        TxTable.withLogStore(killingFactory("/fact/_graft_log", alive)) {
          PairTxn.commitAll(spark, tmp, morTxn(tmp))
        }
      }
      alive.set(false)
      TxTable.commitReplace(spark, s"$tmp/fact", factP(5)) // foreign steals v2
      assert(PairTxn.recoverPairs(spark, tmp) === 1)       // abort recorded
      assert(PairTxn.vacuumTxns(spark, tmp, retentionMs = 0L) > 0)
      assert(dvCount(s"$tmp/fact") === 0,
        "the aborted txn's staged sidecar must reclaim")
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(factP(5)))
    }
  }

  test("a LEDGERED MergeDvCommit replay re-applies nothing while the " +
      "group still moves in step — the at-least-once foreachBatch shape") {
    inDir { tmp =>
      morSeed(tmp)
      def txn(b: Long) = Seq(
        PairTxn.MergeDvCommit(s"$tmp/fact", changesP(), "event_id", "op",
          "pb", txn = Some(("feed", b))),
        PairTxn.PairCommit(s"$tmp/view", summarize(mergedP(12)), replace = true))
      assert(PairTxn.commitAll(spark, tmp, txn(0L)) === Seq(2L, 2L))
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(mergedP(12)))
      val dvsAfter = TxTable.readManifest(spark, s"$tmp/fact", 2L)
        .files.map(_.dvs.size).sum
      // the REPLAY: same (appId, batchId) — the ledger no-ops the fact
      // (an empty delta, no new tombstones, no duplicate inserts); the
      // idempotent view replace republishes the same frame; versions
      // move in step regardless
      assert(PairTxn.commitAll(spark, tmp, txn(0L)) === Seq(3L, 3L))
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(mergedP(12)),
        "a replayed batch must re-apply nothing")
      assert(TxTable.readManifest(spark, s"$tmp/fact", 3L)
        .files.map(_.dvs.size).sum === dvsAfter,
        "no new tombstones on replay")
      // a NEW batch id applies normally (delete the inserted row)
      import spark.implicits._
      val next = Seq((100L, "delete", 0.0, 0)).toDF("event_id", "op", "value", "pb")
      PairTxn.commitAll(spark, tmp, Seq(
        PairTxn.MergeDvCommit(s"$tmp/fact", next, "event_id", "op", "pb",
          txn = Some(("feed", 1L))),
        PairTxn.PairCommit(s"$tmp/view",
          summarize(mergedP(12).where(col("event_id") =!= 100L)), replace = true)))
      assert(TxTable.read(spark, s"$tmp/fact").count() === 11L)
    }
  }

  test("an UNREADABLE/garbage sentinel claim protects only within " +
      "retention, then retires as debris — never a permanent vacuum block") {
    inDir { tmp =>
      val (a, b) = pair(tmp, 12)
      PairTxn.commitPair(spark, tmp, a, b)
      // hand-plant a garbage claim beside real table state
      val sDir = new java.io.File(s"$tmp/fact/_graft_intent")
      sDir.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(sDir, "v7").toPath, "not a claim".getBytes("UTF-8"))
      // within retention: conservative — the claim (and data) survive
      assert(TxTable.vacuum(spark, s"$tmp/fact") === 0)
      assert(new java.io.File(sDir, "v7").exists())
      // past retention: the stale claim is itself debris and retires
      TxTable.vacuum(spark, s"$tmp/fact", retentionMs = 0L)
      assert(!new java.io.File(sDir, "v7").exists(),
        "a garbage sentinel must age out, not block vacuum forever")
      assert(TxTable.read(spark, s"$tmp/fact").count() === 12L)
    }
  }

  test("MergeDvCommit with a NO-OP changeset still moves the group's " +
      "versions in step (an empty delta, nothing tombstoned)") {
    inDir { tmp =>
      import spark.implicits._
      morSeed(tmp)
      // deletes of keys the fact never held: no tombstones, no inserts
      val noop = Seq((555L, "delete", 0.0, 1))
        .toDF("event_id", "op", "value", "pb")
      val vs = PairTxn.commitAll(spark, tmp, Seq(
        PairTxn.MergeDvCommit(s"$tmp/fact", noop, "event_id", "op", "pb"),
        PairTxn.PairCommit(s"$tmp/view", summarize(factP(12)), replace = true)))
      assert(vs === Seq(2L, 2L), "versions move in step even for a no-op side")
      assert(factRows(TxTable.read(spark, s"$tmp/fact")) === factRows(factP(12)))
      assert(TxTable.readManifest(spark, s"$tmp/fact", 2L).files
        .forall(_.dvs.isEmpty))
    }
  }

  test("commitPair refuses a same-table pair") {
    inDir { tmp =>
      val f = fact(6)
      val e = intercept[IllegalArgumentException] {
        PairTxn.commitPair(spark, tmp,
          PairTxn.PairCommit(s"$tmp/t", f, replace = true),
          PairTxn.PairCommit(s"$tmp/t", f, replace = true))
      }
      assert(e.getMessage.contains("DISTINCT"))
    }
  }

  test("commitPair refuses ALIASED same-table dirs (trailing slash), " +
      "before staging anything") {
    inDir { tmp =>
      val f = fact(6)
      // a raw string compare would admit this pair; both sides would
      // then stage the SAME version slot and die mid-publish with a
      // misleading foreign-writer STRANDED error
      val e = intercept[IllegalArgumentException] {
        PairTxn.commitPair(spark, tmp,
          PairTxn.PairCommit(s"$tmp/t", f, replace = true),
          PairTxn.PairCommit(s"$tmp/t/", f, replace = true))
      }
      assert(e.getMessage.contains("DISTINCT"))
      // refused UPFRONT: no version published, no orphan staged commit
      assert(TxTable.latestVersion(spark, s"$tmp/t").isEmpty)
      assert(!new java.io.File(s"$tmp/t/data").exists())
    }
  }
}
