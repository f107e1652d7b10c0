package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}

/** CRAM index (`.crai`) from the public htslib spec: gzip-compressed
  * text, one line per slice —
  * `seqId  alnStart  alnSpan  containerOffset  sliceOffset  sliceSize`
  * — where sliceOffset is the slice header block's byte offset within
  * the compressed container body (the container's first landmark) and
  * sliceSize the byte length from there to the body's end.  Our
  * writer emits one slice per container, so lines map 1:1 onto
  * containers.
  *
  * Bounded-traversal role for CRAM: the reference delegates CRAM
  * record access wholesale to htsjdk (CRAMInputFormat.java), which
  * consults exactly this index; here it lets interval reads prune
  * whole containers before any task launches, and spares the driver
  * the per-container header-seek walk that indexless planning costs.
  */
object Crai {

  final case class Entry(seqId: Int, start: Int, span: Int,
                         containerOffset: Long, sliceOffset: Long, sliceSize: Long)

  def indexPath(cram: Path): Path = new Path(cram.getParent, cram.getName + ".crai")

  def write(fs: FileSystem, path: Path, entries: Seq[Entry]): Unit = {
    val w = new OutputStreamWriter(new GZIPOutputStream(fs.create(path, true)), UTF_8)
    try entries.foreach { e =>
      w.write(s"${e.seqId}\t${e.start}\t${e.span}\t${e.containerOffset}\t" +
        s"${e.sliceOffset}\t${e.sliceSize}\n")
    } finally w.close()
  }

  def read(fs: FileSystem, path: Path): Option[Seq[Entry]] = {
    if (!fs.exists(path)) return None
    val in = new BufferedReader(new InputStreamReader(
      new GZIPInputStream(fs.open(path)), UTF_8))
    try {
      val out = scala.collection.mutable.ArrayBuffer[Entry]()
      var line = in.readLine()
      while (line != null) {
        if (line.nonEmpty) {
          val f = line.split("\t")
          require(f.length >= 6, s"malformed .crai line: $line")
          out += Entry(f(0).toInt, f(1).toInt, f(2).toInt, f(3).toLong,
            f(4).toLong, f(5).toLong)
        }
        line = in.readLine()
      }
      Some(out.toSeq)
    } finally in.close()
  }

  /** Build from the container walk (data containers only — the header
    * and EOF containers carry no records). */
  def build(file: String): Seq[Entry] =
    Cram.enumerateContainers(file)
      .filter(_.nRecords > 0)
      .map { c =>
        Entry(c.refSeqId, c.startPos, c.span, c.offset, c.landmark.toLong,
          (c.length - c.landmark).toLong)
      }

  def buildAndWrite(file: String): Unit = {
    val (fs, p) = Fs.get(file)
    write(fs, indexPath(p), build(file))
  }
}
