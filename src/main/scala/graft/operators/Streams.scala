package graft.operators

/** Shared task-side stream plumbing for the container/drop front doors
  * (WARC/TAR/ZIP/JSONL): the magic-sniffed incremental decompressor
  * dispatch and the close-on-exhaust iterator wrapper. One definition —
  * the walks themselves stay format-specific.
  */
private[graft] object Streams {

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
