package graft.sources

import java.io.{BufferedInputStream, BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.ReferenceFragment

/** FASTA reference input (S8; ref: FastaInputFormat.java,
  * ReferenceFragment.java — input only, like the reference).
  *
  * A line of sequence only makes sense with its contig name and its
  * 1-based start position within the contig, both of which depend on
  * everything before it — so split placement is done on the DRIVER
  * with one cheap sequential metadata scan (record the byte offset,
  * name and cumulative position of every contig and every ~splitSize
  * boundary), and tasks then read their ranges with full context.
  * Reference genomes are ~GBs (vs TB alignment data): one driver scan
  * is the right trade, and it is what makes the per-line fragments
  * exactly positioned (the reference format does the same job with a
  * per-split re-scan).
  */
object Fasta {

  /** Split plan entry: byte range + contig name + 1-based start
    * position of the range's first sequence character. */
  final case class FastaRange(start: Long, end: Long, contig: String, startPos: Long)

  def planRanges(path: String, splitSize: Long): Seq[FastaRange] = {
    val (fs, p) = Fs.get(path)
    val len = fs.getFileStatus(p).getLen
    val in = new BufferedInputStream(fs.open(p), 1 << 20)
    val out = scala.collection.mutable.ArrayBuffer[FastaRange]()
    var offset = 0L
    var contig = ""
    var pos = 1L // next sequence char's 1-based position in contig
    var rangeStart = -1L
    var rangeContig = ""
    var rangePos = 1L
    var sinceSplit = 0L

    def closeRange(end: Long): Unit = {
      if (rangeStart >= 0 && end > rangeStart)
        out += FastaRange(rangeStart, end, rangeContig, rangePos)
      rangeStart = -1
    }

    val reader = new BufferedReader(new InputStreamReader(in, UTF_8))
    var line = reader.readLine()
    while (line != null) {
      val lineLen = line.length + 1L // assumes \n endings (FASTA norm)
      if (line.startsWith(">")) {
        closeRange(offset)
        contig = line.drop(1).split("\\s+")(0)
        pos = 1
        rangeStart = offset + lineLen
        rangeContig = contig
        rangePos = 1
        sinceSplit = 0
      } else if (line.nonEmpty) {
        if (rangeStart < 0) { rangeStart = offset; rangeContig = contig; rangePos = pos }
        pos += line.length
        sinceSplit += lineLen
        if (sinceSplit >= splitSize) {
          closeRange(offset + lineLen)
          rangeStart = offset + lineLen
          rangeContig = contig
          rangePos = pos
          sinceSplit = 0
        }
      }
      offset += lineLen
      line = reader.readLine()
    }
    closeRange(math.min(offset, len))
    reader.close()
    out.toSeq
  }

  /** One ReferenceFragment per sequence line, exactly positioned. */
  def read(spark: SparkSession, path: String,
           splitSize: Long = 16L * 1024 * 1024): Dataset[ReferenceFragment] = {
    import spark.implicits._
    val ranges = planRanges(path, splitSize)
    spark.sparkContext.parallelize(ranges, math.max(1, ranges.size))
      .flatMap { r =>
        val (fs, p) = Fs.get(path)
        val raw = fs.open(p)
        raw.seek(r.start)
        val reader = new BufferedReader(new InputStreamReader(
          new BufferedInputStream(raw), UTF_8))
        var consumed = 0L
        var pos = r.startPos
        val budget = r.end - r.start
        new Iterator[ReferenceFragment] {
          private var nextF: ReferenceFragment = _
          private var done = false
          private def fetch(): Unit = {
            while (nextF == null && !done) {
              if (consumed >= budget) { done = true; reader.close(); return }
              val line = reader.readLine()
              if (line == null) { done = true; reader.close(); return }
              consumed += line.length + 1L
              if (line.nonEmpty && !line.startsWith(">")) {
                nextF = ReferenceFragment(r.contig, pos, line)
                pos += line.length
              }
            }
          }
          override def hasNext: Boolean = { if (nextF == null) fetch(); nextF != null }
          override def next(): ReferenceFragment = {
            if (!hasNext) throw new NoSuchElementException
            val f = nextF; nextF = null; f
          }
        }
      }.toDS()
  }
}
