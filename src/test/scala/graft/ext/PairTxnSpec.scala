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
