package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Optimization-round instrumentation (guide §1): run named queries from
  * the bench pool, write each one's `.explain("formatted")` to
  * plans/<tag>/<name>.txt, and print a per-JOB wall-time breakdown so a
  * multi-action lane (tx setup + DML + requires + final read) shows
  * WHERE its seconds go — the final frame's plan alone can't. Usage:
  *   sbt "runMain graft.PlanDump <tag> q133_mad q108_pagerank"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default
  * 32). Each query runs once cold-ish (after the shared lineitem warm
  * probe), then once more timed — the second run's jobs are reported so
  * one-time session costs don't pollute the attribution.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = args.headOption.getOrElse(sys.error("usage: PlanDump <tag> <query>..."))
    val names = args.drop(1).toSeq
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // diagnostic-only conf overrides: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    final case class JobRec(id: Int, desc: String, var ms: Double,
        var started: Long, var stages: List[String])
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(e.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
            .mkString(" | "))
        jobs.put(e.jobId, JobRec(e.jobId, d, 0.0, e.time,
          e.stageInfos.map(si => s"${si.stageId}:${si.numTasks}t").toList))
        order.add(e.jobId); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(r => r.ms = (e.time - r.started).toDouble)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    })

    val pool = SparkEntry.queries ++ BenchProdLanes.queries.toMap ++
      BenchProbes.queries.toMap
    val outDir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(outDir)
    for (name <- names) {
      val fn = pool.getOrElse(name, sys.error(s"unknown query '$name'"))
      // pass 1: plan capture (also warms codegen/caches for this lane)
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), plan)
      df.queryExecution.toRdd.count()
      // pass 2: timed, with per-job attribution AND a driver-thread
      // stack sampler: the "gap" (wall time - job time) is driver-side
      // single-thread work (planning, file listing, manifest I/O,
      // commit protocol) — sample the lane's thread every 5 ms and
      // bucket by the most specific interesting frame so the gap gets
      // a name instead of a shrug.
      jobs.clear(); order.clear()
      val laneThread = Thread.currentThread()
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      val stacks = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val st = laneThread.getStackTrace
          val bucket =
            if (st.isEmpty) "?"
            else {
              val s = st.map(f => f.getClassName + "." + f.getMethodName)
              def has(p: String) = s.exists(_.contains(p))
              if (s.head.startsWith("java.lang.Object") && has("awaitResult")) "wait-on-job"
              else if (s.head.startsWith("java.lang.Thread") && s.head.endsWith("sleep")) "sleep"
              else if (has("StreamingQuery") && (has("awaitTermination") || has("processAllAvailable"))) "wait-on-stream"
              else if (has("catalyst.optimizer") || has("RuleExecutor")) "catalyst-opt/analysis"
              else if (has("QueryPlanner") || has("SparkStrategies") || has("adaptive.")) "physical-planning"
              else if (has("ParquetFooterReader") || has("ParquetFileReader")) "parquet-footer"
              else if (has("InMemoryFileIndex") || has("listLeafFiles") || has("HadoopFSUtils")) "file-listing"
              else if (has("RawLocalFileSystem") || has("ChecksumFileSystem") || has("FileUtil")) "hadoop-fs-io"
              else if (has("graft.ext.")) "graft-ext-driver"
              else if (has("classreader") || has("ClassLoader.loadClass") || has("janino") || has("CodeGenerator")) "codegen/classload"
              else if (has("collectFromPlan") || has("executeCollect")) "collect-decode"
              else if (has("Dataset") || has("QueryExecution") || has("sql.execution")) "other-sql-driver"
              else s.head
            }
          hist.merge(bucket, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
          if (bucket == "physical-planning" || bucket == "catalyst-opt/analysis") {
            val key = st.take(28).map(f =>
              f.getClassName + "." + f.getMethodName).mkString(" <- ")
            stacks.merge(key, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
          }
          Thread.sleep(5)
        }
      })
      sampler.setDaemon(true); sampler.start()
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      sampling = false; sampler.join(200)
      spark.streams.active.foreach(_.stop())
      Thread.sleep(200) // let listener events drain
      println(f"[plandump] $name%-32s total $sec%6.2f s, ${order.size()} jobs")
      val recs = scala.jdk.CollectionConverters.IteratorHasAsScala(
        order.iterator()).asScala.toSeq.flatMap(id => Option(jobs.get(id)))
      recs.sortBy(-_.ms).take(18).foreach { r =>
        println(f"[plandump]   job ${r.id}%4d ${r.ms / 1000.0}%7.3f s  " +
          f"[${r.stages.mkString(",").take(40)}] ${r.desc.take(100)}")
      }
      val accounted = recs.map(_.ms).sum / 1000.0
      println(f"[plandump]   jobs account for $accounted%6.2f s of $sec%6.2f s (gap = driver/planning/fs)")
      val total = scala.jdk.CollectionConverters.CollectionHasAsScala(
        hist.values()).asScala.map(_.intValue).sum.max(1)
      scala.jdk.CollectionConverters.MapHasAsScala(hist).asScala.toSeq
        .sortBy(-_._2.intValue).take(12).foreach { case (b, n) =>
          println(f"[plandump]   lane-thread ${100.0 * n.intValue / total}%5.1f%% ($n samples) $b")
        }
      scala.jdk.CollectionConverters.MapHasAsScala(stacks).asScala.toSeq
        .sortBy(-_._2.intValue).take(4).foreach { case (k, n) =>
          println(s"[plandump]   STACK x$n: ${k.take(1600)}")
        }
    }
    spark.stop()
  }
}
