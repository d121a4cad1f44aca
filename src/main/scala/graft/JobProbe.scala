package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only measurement harness (guide §1: measure first): run named
  * declared queries N times and print a per-JOB wall-clock breakdown, so a
  * query's time is attributable to its actual Spark jobs (builds,
  * broadcasts, checkpoints, readout) without a UI. Not part of the driver
  * contract; Bench remains the artifact of record.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.JobProbe q1,q2 [runs]"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(master = s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.core.Tables.lineitem(spark, sfDir).count()
    graft.core.Tables.documents(spark, sfDir).count()
    graft.core.Namespace.inodes(spark, sfDir).count()
    val keep = spark.sparkContext.getPersistentRDDs.keySet

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(s =>
          s"${s.name.takeWhile(_ != '\n')} [${js.stageInfos.size} stages, " +
            s"${js.stageInfos.map(_.numTasks).sum} tasks]").getOrElse("")
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .map(d => s"$d | $site").getOrElse(site)
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, (je.time - t0) / 1e3, desc))
        }
      }
    })

    val qmap = SparkEntry.queries
    names.foreach { name =>
      val fn = qmap(name)
      for (r <- 1 to runs) {
        done.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener events drain
        val rows = {
          import scala.jdk.CollectionConverters._
          done.asScala.toSeq.sortBy(_._1)
        }
        println(f"== $name run $r: wall $wall%.3f s, ${rows.size} jobs, job-sum ${rows.map(_._2).sum}%.3f s")
        rows.foreach { case (id, sec, desc) =>
          println(f"   job $id%5d  $sec%7.3f s  $desc")
        }
        if (r < runs) () // memo-warm runs: keep blocks
      }
      // per-query cleanup, the Bench posture
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .foreach { case (_, rdd) => rdd.unpersist(false) }
      System.gc()
    }
    spark.stop()
  }
}
