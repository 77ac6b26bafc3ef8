package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Shared task-side stream plumbing for the container/drop front doors
  * (WARC/TAR/ZIP/JSONL): the magic-sniffed incremental decompressor
  * dispatch, the close-on-exhaust iterator wrapper, and the DISTRIBUTED
  * landing-bucket lister every path-walk front door routes through. One
  * definition — the walks themselves stay format-specific.
  */
private[graft] object Streams {

  /** Distributed landing-bucket listing: every `<id><ext>` drop file under
    * `dir` as `(id, path)`, with the driver paying exactly ONE
    * `listStatus` at the root — O(direct children), never O(files).
    * Root-level children split into drop files (matched in hand) and
    * subdirectories; each subdirectory's full recursive walk runs INSIDE
    * a task via a lazy `listStatusIterator` chain (O(one listing page) of
    * task memory), so a crawl-scale bucket — 10⁶–10⁷ files sharded into
    * prefix dirs, the layout every real landing zone uses — lists at
    * cluster parallelism instead of serially on the driver.
    *
    * `fileRe` must FULL-match the drop file NAME with group 1 the numeric
    * file id; non-matching names are skipped silently (landing dirs are
    * never clean). `listStatus`/`listStatusIterator`, NOT `listFiles`:
    * LocatedFileStatus eagerly loads each file's permissions, which on a
    * local FS without the native-hadoop library forks a shell process per
    * file (measured ~25 s for 6k files).
    */
  def listDrops(spark: SparkSession, dir: String, fileRe: String): Dataset[(Long, String)] = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val re = fileRe.r
    val subDirs = scala.collection.mutable.Buffer.empty[String]
    val rootFiles = scala.collection.mutable.Buffer.empty[(Long, String)]
    fs.listStatus(root).foreach { st =>
      if (st.isDirectory) subDirs += st.getPath.toString
      else st.getPath.getName match {
        case re(id, _*) => rootFiles += ((id.toLong, st.getPath.toString))
        case _ => ()
      }
    }
    val atRoot = spark.createDataset(rootFiles.toSeq)
    if (subDirs.isEmpty) atRoot
    else atRoot.union(
      spark.createDataset(subDirs.toSeq)
        .repartition(math.max(1, math.min(subDirs.size,
          4 * spark.sparkContext.defaultParallelism)))
        .flatMap { d =>
          val re2 = fileRe.r
          val p = new org.apache.hadoop.fs.Path(d)
          val dfs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          def walk(q: org.apache.hadoop.fs.Path): Iterator[org.apache.hadoop.fs.FileStatus] = {
            val it = dfs.listStatusIterator(q)
            new Iterator[org.apache.hadoop.fs.FileStatus] {
              def hasNext: Boolean = it.hasNext
              def next(): org.apache.hadoop.fs.FileStatus = it.next()
            }.flatMap(st =>
              if (st.isDirectory) walk(st.getPath) else Iterator.single(st))
          }
          walk(p).flatMap { st =>
            st.getPath.getName match {
              case re2(id, _*) => Iterator.single((id.toLong, st.getPath.toString))
              case _ => Iterator.empty
            }
          }
        })
  }

  /** [[listDrops]] sharded into walk tasks at 4× cluster parallelism —
    * proportional to the CLUSTER, not a constant cap: the shuffle
    * carries only (id, path) tuples, empty partitions on a small bucket
    * cost scheduling noise, and a crawl-scale bucket fans its per-file
    * walks across every executor. The shard key is the file ID (ids are
    * unique by contract, so hash-by-id spreads exactly like round-robin)
    * which co-locates any DUPLICATE id — the same numeric name landed in
    * two subdirs would otherwise ingest twice and collide in the
    * `fileId << 24` doc_id space downstream — so the walk rejects it
    * loudly instead. All four path-walk front doors (JSONL/TAR/ZIP/WARC)
    * and the `*_files_ingest` re-ingests route through here.
    */
  def dropTasks(spark: SparkSession, dir: String, fileRe: String): Dataset[(Long, String)] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    listDrops(spark, dir, fileRe)
      .repartition(4 * spark.sparkContext.defaultParallelism, col("_1"))
      .mapPartitions { it =>
        val seen = scala.collection.mutable.LongMap.empty[String]
        it.map { case t @ (id, p) =>
          seen.get(id) match {
            case Some(prev) => throw new IllegalArgumentException(
              s"drop id $id appears at two paths ('$prev' and '$p') — " +
                "duplicate numeric names collide in the doc_id file-slot space")
            case None => seen(id) = p
          }
          t
        }
      }
  }

  /** Sniff the stream head and wrap with the matching INCREMENTAL
    * decompressor — `GZIPInputStream` (multi-member concat, per-member
    * CRC verified by the JDK), `ZstdInputStream` (frame loop, content
    * checksums verified natively), or `LZ4FrameInputStream` — else pass
    * the stream through untouched. Never dispatches on file name. A
    * stream shorter than 4 bytes passes through (the caller's grammar
    * rejects it with its own message).
    */
  def sniffed(in: java.io.InputStream): java.io.InputStream = {
    val pb = new java.io.PushbackInputStream(in, 4)
    val head = new Array[Byte](4)
    var got = 0
    var n = 0
    while (got < 4 && n >= 0) {
      n = pb.read(head, got, 4 - got)
      if (n > 0) got += n
    }
    pb.unread(head, 0, got)
    if (got >= 2 && (head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b)
      new java.util.zip.GZIPInputStream(pb, 64 * 1024)
    else if (got >= 4 && (head(0) & 0xff) == 0x28 && (head(1) & 0xff) == 0xb5 &&
      (head(2) & 0xff) == 0x2f && (head(3) & 0xff) == 0xfd)
      new com.github.luben.zstd.ZstdInputStream(pb)
    else if (got >= 4 && (head(0) & 0xff) == 0x04 && (head(1) & 0xff) == 0x22 &&
      (head(2) & 0xff) == 0x4d && (head(3) & 0xff) == 0x18)
      new net.jpountz.lz4.LZ4FrameInputStream(pb, false)
    else pb
  }

  /** Close `in` when the wrapped iterator exhausts or first fails — the
    * task-side stream hygiene for the path walks (call sites drain).
    */
  def closeOnExhaust[T](it: Iterator[T], in: java.io.Closeable): Iterator[T] =
    new Iterator[T] {
      private var open = true
      def hasNext: Boolean = {
        val h = open && it.hasNext
        if (open && !h) { open = false; in.close() }
        h
      }
      def next(): T =
        try it.next()
        catch { case e: Throwable => if (open) { open = false; in.close() }; throw e }
    }
}
