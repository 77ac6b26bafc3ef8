package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage split for the zip_files_ingest fixture (not
  * registered). History: this probe caught the r12 driver-side listing
  * stall — `FileSystem.listFiles` materializes LocatedFileStatus, whose
  * constructor eagerly loads permissions, and WITHOUT the native-hadoop
  * library that forks a shell process per file (measured ~25 s for 6k
  * files, serial, on the driver); `listStatus` loads no permissions.
  */
object ZipFilesProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val sfDir = args.headOption.getOrElse("/tmp/sf1_probe")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    time("warmup")(Tables.documents(spark, sfDir).count())
    // the build+write+list phase runs eagerly inside the call; walk is lazy
    val df = time("build_write_list")(graft.operators.Zip.zipFilesIngest(spark, sfDir))
    time("walk")(df.count())
    spark.stop()
  }
}
