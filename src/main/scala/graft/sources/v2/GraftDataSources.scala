package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.{SamRecord, SequencedFragment, VcfVariant}
import graft.sources.{BamIO, Bgzf, Fastq, RangedText, Vcf}

/** DataSource V2 façade over the graft format codecs — the Spark-first
  * re-expression of the reference's InputFormats as first-class
  * `spark.read.format(...)` sources:
  *
  *   spark.read.format("bam").option("intervals", "chr1:1-10000")
  *     .load("reads.bam")
  *   spark.read.format("fastq").load("reads.fastq")
  *   spark.read.format("vcf").load("calls.vcf.bgz")
  *
  * The BAM source pushes interval predicates into the scan: a
  * conjunction of `rname = c` (or `rname IN (...)`) with `pos`
  * bounds prunes BGZF chunks through the sidecar/.bai/.csi index
  * before any task launches — the reference's bounded traversal
  * (ref: BAMInputFormat.java:150-190, `hadoopbam.bam.intervals`)
  * surfacing as ordinary Catalyst predicate pushdown.  Pushed filters
  * are also re-applied by Spark (over-approximate chunk pruning stays
  * exactly correct).  Column pruning projects the typed record onto
  * the required schema before rows reach the exchange.
  *
  * Partition planning = the same driver-side split placement the
  * Dataset readers use (one task per virtual-offset range), so a
  * 1000-executor cluster fans out identically through SQL and the
  * typed API.
  */
object GraftDataSources {

  /** Serialize a case-class record stream onto a pruned schema. */
  private[v2] class RecordReader[T](it: Iterator[T], enc: ExpressionEncoder[T],
                                    pruned: StructType)
      extends PartitionReader[InternalRow] {
    private val ser = enc.createSerializer()
    private val full = enc.schema
    private val proj = UnsafeProjection.create(pruned.map { f =>
      val i = full.fieldIndex(f.name)
      BoundReference(i, full(i).dataType, full(i).nullable)
    }.toSeq)
    private var cur: InternalRow = _
    override def next(): Boolean =
      if (it.hasNext) { cur = proj(ser(it.next())); true } else false
    override def get(): InternalRow = cur
    override def close(): Unit = ()
  }

  private[v2] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).orElse(Option(options.get("paths")))
    require(p.isDefined, "graft source needs a load path")
    p.get
  }

  private[v2] abstract class SingleTable(tableName: String, tableSchema: StructType)
      extends Table with SupportsRead {
    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
  }
}

// ------------------------------------------------------------------ BAM

class BamDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "bam"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExpressionEncoder[SamRecord]().schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BamTable(new CaseInsensitiveStringMap(properties))
}

class BamTable(options: CaseInsensitiveStringMap)
    extends GraftDataSources.SingleTable(
      s"bam:${GraftDataSources.pathOf(options)}",
      ExpressionEncoder[SamRecord]().schema) {
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new BamScanBuilder(GraftDataSources.pathOf(options), options)
}

class BamScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val fullSchema = ExpressionEncoder[SamRecord]().schema
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep only fields we actually have (Spark may ask for metadata cols)
    required = StructType(requiredSchema.filter(f => fullSchema.fieldNames.contains(f.name)))

  /** Consume `rname` equality/IN plus `pos` bounds as a bounded-
    * traversal interval set.  Everything is returned as residual —
    * chunk pruning over-approximates (a record can overlap an
    * interval without starting in it), Spark re-checks exactly. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val contigs: Option[Seq[String]] = filters.collectFirst {
      case EqualTo("rname", c: String) => Seq(c)
      case In("rname", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        vs.toSeq.map(_.toString)
    }
    var lo = 1L
    var hi = Int.MaxValue.toLong
    val posFilters = filters.filter {
      case GreaterThan("pos", v: Number) => lo = math.max(lo, v.longValue() + 1); true
      case GreaterThanOrEqual("pos", v: Number) => lo = math.max(lo, v.longValue()); true
      case LessThan("pos", v: Number) => hi = math.min(hi, v.longValue() - 1); true
      case LessThanOrEqual("pos", v: Number) => hi = math.min(hi, v.longValue()); true
      case _ => false
    }
    pushed = contigs match {
      case Some(cs) =>
        intervals = cs.map(c =>
          (c, math.max(1L, lo).min(Int.MaxValue).toInt, hi.max(0).min(Int.MaxValue).toInt))
        filters.filter {
          case EqualTo("rname", _) | In("rname", _) => true
          case f => posFilters.contains(f)
        }
      case None => Array.empty // pos bounds alone cannot prune chunks
    }
    filters // all residual: exact semantics stay with Spark
  }
  override def pushedFilters(): Array[Filter] = pushed

  private var intervals: Seq[(String, Int, Int)] = Nil

  override def build(): Scan = {
    val optIntervals = Option(options.get("intervals"))
    val splitSize = Option(options.get("splitsize")).map(_.toLong)
      .getOrElse(64L * 1024 * 1024)
    val includeUnmapped = Option(options.get("includeunmapped")).exists(_.toBoolean)
    new BamScan(path, required, pushed, intervals, optIntervals, splitSize, includeUnmapped)
  }
}

class BamScan(path: String, pruned: StructType, pushed: Array[Filter],
              filterIntervals: Seq[(String, Int, Int)],
              optionIntervals: Option[String], splitSize: Long,
              includeUnmapped: Boolean) extends Scan with Batch {

  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def description(): String = {
    val iv = effectiveIntervals
    s"graft bam $path intervals=${if (iv.isEmpty) "*" else iv.mkString(",")} " +
      s"pushed=${pushed.mkString("[", ",", "]")}"
  }

  /** Explicit option intervals (the reference's property style) are
    * authoritative record filters; filter-derived intervals are an
    * optimization (residual predicates re-check exactly). */
  private lazy val planned = {
    val (header, _) = BamIO.planSplits(path, Nil, Long.MaxValue)
    val iv = optionIntervals match {
      case Some(spec) => BamIO.parseIntervals(spec, header)
      case None => filterIntervals
    }
    val (h, ranges) = BamIO.planSplits(path, iv, splitSize, includeUnmapped)
    (h, iv, ranges)
  }
  private def effectiveIntervals: Seq[(String, Int, Int)] = planned._2

  override def planInputPartitions(): Array[InputPartition] = {
    val (header, iv, ranges) = planned
    ranges.map { case (s, e) =>
      BamPartition(path, s, e, header.refs, iv.toArray, includeUnmapped)
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new BamReaderFactory(pruned)
}

case class BamPartition(file: String, startVo: Long, endVo: Long,
                        refs: Array[graft.model.SamRef],
                        intervals: Array[(String, Int, Int)],
                        includeUnmapped: Boolean) extends InputPartition

class BamReaderFactory(pruned: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val bp = p.asInstanceOf[BamPartition]
    val it = BamIO.readRange(bp.file, bp.startVo, bp.endVo, bp.refs,
      bp.intervals, bp.includeUnmapped)
    new GraftDataSources.RecordReader(it, ExpressionEncoder[SamRecord](), pruned)
  }
}

// ---------------------------------------------------------------- FASTQ

class FastqDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fastq"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExpressionEncoder[SequencedFragment]().schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FastqTable(new CaseInsensitiveStringMap(properties))
}

class FastqTable(options: CaseInsensitiveStringMap)
    extends GraftDataSources.SingleTable(
      s"fastq:${GraftDataSources.pathOf(options)}",
      ExpressionEncoder[SequencedFragment]().schema) {
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder
      with SupportsPushDownRequiredColumns {
    private var required: StructType = schema
    override def pruneColumns(r: StructType): Unit =
      required = StructType(r.filter(f => schema.fieldNames.contains(f.name)))
    override def build(): Scan = {
      val path = GraftDataSources.pathOf(options)
      val splitSize = Option(options.get("splitsize")).map(_.toLong)
        .getOrElse(64L * 1024 * 1024)
      new TextFramedScan[SequencedFragment](path, splitSize, required,
        ExpressionEncoder[SequencedFragment](), FastqFraming)
    }
  }
}

/** Per-range record framing for splittable text-ish formats. */
trait RangeFraming[T] extends Serializable {
  def frame(path: String, start: Long, end: Long, bgzf: Boolean): Iterator[T]
}

object FastqFraming extends RangeFraming[SequencedFragment] {
  def frame(path: String, start: Long, end: Long, bgzf: Boolean): Iterator[SequencedFragment] = {
    val endBound = if (bgzf) Bgzf.virtualOffset(end, 0) else end
    Fastq.frame(RangedText.readLines(path, start, end, bgzf, stopAtEnd = false),
      start, endBound)
  }
}

object VcfFraming extends RangeFraming[VcfVariant] {
  def frame(path: String, start: Long, end: Long, bgzf: Boolean): Iterator[VcfVariant] =
    RangedText.readLines(path, start, end, bgzf, stopAtEnd = true)
      .filter(l => l.text.nonEmpty && !l.text.startsWith("#"))
      .map(l => Vcf.parseLine(l.text))
}

class TextFramedScan[T](path: String, splitSize: Long, pruned: StructType,
                        enc: ExpressionEncoder[T], framing: RangeFraming[T])
    extends Scan with Batch {
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val bgzf = RangedText.isBgzf(path)
    RangedText.ranges(path, splitSize).map { case (s, e) =>
      TextRangePartition(path, s, e, bgzf): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TextFramedReaderFactory[T](pruned, enc, framing)
}

case class TextRangePartition(path: String, start: Long, end: Long,
                              bgzf: Boolean) extends InputPartition

class TextFramedReaderFactory[T](pruned: StructType, enc: ExpressionEncoder[T],
                                 framing: RangeFraming[T])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val tp = p.asInstanceOf[TextRangePartition]
    new GraftDataSources.RecordReader(
      framing.frame(tp.path, tp.start, tp.end, tp.bgzf), enc, pruned)
  }
}

// ------------------------------------------------------------------ VCF

class VcfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "vcf"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExpressionEncoder[VcfVariant]().schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new VcfTable(new CaseInsensitiveStringMap(properties))
}

class VcfTable(options: CaseInsensitiveStringMap)
    extends GraftDataSources.SingleTable(
      s"vcf:${GraftDataSources.pathOf(options)}",
      ExpressionEncoder[VcfVariant]().schema) {
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder
      with SupportsPushDownRequiredColumns {
    private var required: StructType = schema
    override def pruneColumns(r: StructType): Unit =
      required = StructType(r.filter(f => schema.fieldNames.contains(f.name)))
    override def build(): Scan = {
      val path = GraftDataSources.pathOf(options)
      val splitSize = Option(options.get("splitsize")).map(_.toLong)
        .getOrElse(64L * 1024 * 1024)
      new TextFramedScan[VcfVariant](path, splitSize, required,
        ExpressionEncoder[VcfVariant](), VcfFraming)
    }
  }
}
