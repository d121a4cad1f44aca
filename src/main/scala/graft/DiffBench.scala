package graft

import graft.operators.Reports
import graft.sources.FsImageSource
import graft.sources.fsimage.ImageGen

/** Image-to-image namespace-diff soak — the r9/r10 verdicts' open scale
  * proof: [[Reports.namespaceDiff]] composed with
  * [[FsImageSource.inodesDistributed]] on TWO capped-heap-scale images,
  * with add/remove/modify counts checked against [[ImageGen]] ground
  * truth (deterministic generator → exact expected counts, not
  * spot-checks):
  *
  *  - image A: nFiles files + 1000 symlinks
  *  - image B: nFiles + nFiles/1000 files (adds), no symlinks (removes),
  *    every 1000th shared file 1 KiB larger (`sizeShiftEvery` — modifies)
  *  - expected: added = nFiles/1000, removed = 1000,
  *    modified = ceil(nFiles/1000) (file 0 always shifts)
  *
  * The diff's full-outer join must be a SHUFFLE on the path key —
  * never a broadcast of a 100M-row side or a driver materialization —
  * so the executed plan is asserted to contain a SortMergeJoin and no
  * nested-loop/cartesian fallback before the counts are trusted. Driver
  * heap stays capped (SPARK_DRIVER_MEM, the r7 loader-soak posture):
  * both loaders' driver state is O(string table + scan buffer) and the
  * diff itself keeps nothing driver-side but the 3-row change summary.
  *
  * `runMain graft.DiffBench [nFiles] [nDirs]` (defaults 2M / 20k;
  * env: SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM). One JSON line on stdout.
  */
object DiffBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(2000000)
    val nDirs = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(master = s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nAdds = nFiles / 1000
    val nLinks = 1000
    val shiftEvery = 1000
    val expectModified = (nFiles + shiftEvery - 1) / shiftEvery

    val dir = java.nio.file.Files.createTempDirectory("graft_diffbench").toFile
    val imgA = new java.io.File(dir, "a.img").getPath
    val imgB = new java.io.File(dir, "b.img").getPath
    val (tGenA, _) = SoakUtil.time(ImageGen.write(imgA,
      ImageGen.GenSpec(nDirs = nDirs, nFiles = nFiles, nSymlinks = nLinks)))
    val (tGenB, _) = SoakUtil.time(ImageGen.write(imgB,
      ImageGen.GenSpec(nDirs = nDirs, nFiles = nFiles + nAdds,
        nSymlinks = 0, sizeShiftEvery = shiftEvery)))
    val bytes = new java.io.File(imgA).length() + new java.io.File(imgB).length()

    val diff = Reports.namespaceDiff(
      FsImageSource.inodesDistributed(spark, imgA),
      FsImageSource.inodesDistributed(spark, imgB))

    // Plan proof BEFORE the run: the full-outer join must shuffle on
    // path. A broadcast full-outer is impossible in Spark, but assert
    // anyway that no nested-loop/cartesian fallback sneaked in and that
    // the join is the sort-merge shape.
    val plan = diff.queryExecution.executedPlan.toString
    require(plan.contains("SortMergeJoin"),
      s"namespaceDiff plan lost its shuffle join:\n${plan.take(2000)}")
    require(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"namespaceDiff plan fell back to a nested loop:\n${plan.take(2000)}")

    val (tDiff, byChange) = SoakUtil.time {
      diff.groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    require(byChange.getOrElse("added", 0L) == nAdds.toLong,
      s"added ${byChange.get("added")} != $nAdds")
    require(byChange.getOrElse("removed", 0L) == nLinks.toLong,
      s"removed ${byChange.get("removed")} != $nLinks")
    require(byChange.getOrElse("modified", 0L) == expectModified.toLong,
      s"modified ${byChange.get("modified")} != $expectModified")

    println(s"""{"metric":"namespace_diff_soak","n_files":$nFiles,""" +
      s""""n_dirs":$nDirs,"image_bytes":$bytes,""" +
      s""""gen_a_sec":${SoakUtil.ms3(tGenA)},"gen_b_sec":${SoakUtil.ms3(tGenB)},""" +
      s""""diff_sec":${SoakUtil.ms3(tDiff)},""" +
      s""""added":${byChange.getOrElse("added", 0L)},""" +
      s""""removed":${byChange.getOrElse("removed", 0L)},""" +
      s""""modified":${byChange.getOrElse("modified", 0L)},""" +
      s""""sort_merge_join":true,"peak_heap_mb":${SoakUtil.peakHeapMb},""" +
      s""""xmx":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"}""")
    new java.io.File(imgA).delete(); new java.io.File(imgB).delete()
    spark.stop()
  }
}
