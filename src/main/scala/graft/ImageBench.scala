package graft

import graft.sources.FsImageSource
import graft.sources.fsimage.ImageGen

/** fsimage ingest bench: generates a synthetic image and times the
  * driver loader, the ranged distributed loader, and a summary report
  * over the loaded namespace — the engine's headline path vs the
  * reference's in-memory loader. One JSON line on stdout.
  *
  * `runMain graft.ImageBench [nFiles] [nDirs]` (defaults 2M / 20k;
  * env: SPARK_GRAFT_CPUS).
  */
object ImageBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(2000000)
    val nDirs = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(master = s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_imgbench").toFile
    val img = new java.io.File(dir, "bench.img").getPath
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val (tGen, _) = time(ImageGen.write(img, ImageGen.GenSpec(
      nDirs = nDirs, nFiles = nFiles, ecEvery = 100, aclEvery = 1000,
      xattrEvery = 1000, nSymlinks = 1000, withAtime = true,
      quotaEvery = 100)))
    val bytes = new java.io.File(img).length()

    val (tDriver, nD) = time(FsImageSource.inodes(spark, img).count())
    val (tDist, nX) = time(FsImageSource.inodesDistributed(spark, img).count())
    require(nD == nX, s"driver($nD) != distributed($nX)")
    // reports over the distributed load: the end-to-end admin path
    val (tReport, _) = time {
      graft.operators.Reports
        .summaryByUser(FsImageSource.inodesDistributed(spark, img)).count()
    }
    // quota accounting = the ancestor-rollup shape (explode + two aggs)
    // over a fresh load — the heaviest report family at 100 M inodes
    val (tQuota, nQ) = time {
      graft.operators.Reports
        .quotaReport(FsImageSource.inodesDistributed(spark, img)).count()
    }
    val expectQ = nDirs / 100 + (if (nDirs % 100 > 0) 1 else 0)
    require(nQ == expectQ, s"quota-dir count $nQ, expected $expectQ")
    def ms3(v: Double): String = (math.round(v * 1000) / 1000.0).toString
    println(s"""{"metric":"fsimage_ingest","inodes":$nD,"image_bytes":$bytes,""" +
      s""""gen_sec":${ms3(tGen)},"driver_sec":${ms3(tDriver)},""" +
      s""""distributed_sec":${ms3(tDist)},"report_sec":${ms3(tReport)},""" +
      s""""quota_report_sec":${ms3(tQuota)}}""")
    new java.io.File(img).delete()
    spark.stop()
  }
}
