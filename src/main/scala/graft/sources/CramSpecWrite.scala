package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import graft.model.SamRecord

/** Spec-profile CRAM 3.0 writer: containers whose record payloads use
  * REAL data-series encodings — the wire format any foreign CRAM
  * reader (htslib/htsjdk/samtools) consumes — instead of the graft
  * fast-path profile.  Conformance witness: [[CramForeign]] (built
  * independently against the public spec for FOREIGN files) reads
  * these containers back record-for-record; no profile marker is
  * written, so the read path treats graft's own spec-profile output
  * exactly as it treats a samtools file.
  *
  * Encoding choices (all public spec §11-12):
  *  - positions absolute (preservation AP=0) — containers stay
  *    self-contained for any record order, no delta chain;
  *  - no reference required (RR=0): match segments ride explicit `b`
  *    (bases-verbatim) features, so neither writer nor reader needs
  *    the FASTA — the htslib "no-ref" mode shape;
  *  - within-slice qname pairs whose mate fields reconstruct exactly
  *    ride NF chains (CF bit 4 + NF series, the htslib shape); every
  *    other record is detached (CF bit 2) with RNEXT/PNEXT/TLEN
  *    stored verbatim;
  *  - containers carry two slices sharing one compression header once
  *    enough records are buffered (multi-slice layout);
  *  - all series EXTERNAL (ITF8/byte streams) or constant HUFFMAN,
  *    names/insertions/clips BYTE_ARRAY_STOP, tag values
  *    BYTE_ARRAY_LEN over a per-tag block — the CORE bit stream is
  *    empty.  Every block gzip-compressed.
  *
  * CRAM-semantics normalization (inherent to the format, same as an
  * htsjdk writer): unmapped records (flag 0x4) carry no CIGAR or MAPQ
  * (read back as "*" / 0); `=`/`X` CIGAR ops read back as `M` (bases
  * are verbatim, only the op label degrades); a mapped record must
  * have bases (`seq != "*"`) unless its CIGAR is "*".
  */
object CramSpecWrite {

  // fixed content ids for the data series (any ids are legal; these
  // leave 1..9 clear of the graft profile's id 1)
  private val BF = 10; private val RI = 11; private val RL = 12
  private val AP = 13; private val RN = 14; private val MF = 15
  private val NS = 16; private val NP = 17; private val TS = 18
  private val TL = 19; private val FN = 20; private val FC = 21
  private val FP = 22; private val DL = 23; private val RS = 24
  private val HC = 25; private val PD = 26; private val IN = 27
  private val SC = 28; private val BB = 29; private val BA = 30
  private val QS = 31; private val MQ = 32; private val CF = 33
  private val NF = 34

  private final class Streams {
    private val m = scala.collection.mutable.LinkedHashMap[Int, ByteArrayOutputStream]()
    def apply(cid: Int): ByteArrayOutputStream =
      m.getOrElseUpdate(cid, new ByteArrayOutputStream(256))
    def itf8(cid: Int, v: Int): Unit = Cram.writeItf8(apply(cid), v)
    def byte(cid: Int, v: Int): Unit = apply(cid).write(v)
    def bytes(cid: Int, b: Array[Byte]): Unit = apply(cid).write(b)
    def nonEmpty: Seq[(Int, Array[Byte])] =
      m.toSeq.collect { case (cid, s) if s.size() > 0 => (cid, s.toByteArray) }
  }

  // --------------------------------------------- encoding descriptors

  private def writeEnc(out: ByteArrayOutputStream, codec: Int,
                       params: Array[Byte]): Unit = {
    Cram.writeItf8(out, codec)
    Cram.writeItf8(out, params.length)
    out.write(params)
  }

  private def extParams(cid: Int): Array[Byte] = {
    val b = new ByteArrayOutputStream(4); Cram.writeItf8(b, cid); b.toByteArray
  }

  private def writeExternal(out: ByteArrayOutputStream, cid: Int): Unit =
    writeEnc(out, 1, extParams(cid))

  private def writeHuffConst(out: ByteArrayOutputStream, sym: Int): Unit = {
    val p = new ByteArrayOutputStream(8)
    Cram.writeItf8(p, 1); Cram.writeItf8(p, sym) // one symbol
    Cram.writeItf8(p, 1); Cram.writeItf8(p, 0) // zero-bit code
    writeEnc(out, 3, p.toByteArray)
  }

  private def writeByteArrayStop(out: ByteArrayOutputStream, cid: Int): Unit = {
    val p = new ByteArrayOutputStream(4)
    p.write(0) // stop byte
    Cram.writeItf8(p, cid)
    writeEnc(out, 5, p.toByteArray)
  }

  private def writeByteArrayLen(out: ByteArrayOutputStream, cid: Int): Unit = {
    val p = new ByteArrayOutputStream(8)
    writeEnc(p, 1, extParams(cid)) // length: EXTERNAL itf8, same block
    writeEnc(p, 1, extParams(cid)) // values: EXTERNAL bytes
    writeEnc(out, 4, p.toByteArray)
  }

  /** Compression-header block for one container: preservation map
    * (RN=1, AP=0, RR=0, TD), the fixed data-series map, and one
    * BYTE_ARRAY_LEN entry per distinct tag in the container. */
  private def compressionHeader(tdBlob: Array[Byte],
                                tagCids: Seq[Int]): CramIO.Block = {
    val out = new ByteArrayOutputStream(512)
    // preservation map
    val pres = new ByteArrayOutputStream(64)
    Cram.writeItf8(pres, 4)
    pres.write("RN".getBytes(US_ASCII)); pres.write(1)
    pres.write("AP".getBytes(US_ASCII)); pres.write(0)
    pres.write("RR".getBytes(US_ASCII)); pres.write(0)
    pres.write("TD".getBytes(US_ASCII))
    Cram.writeItf8(pres, tdBlob.length); pres.write(tdBlob)
    Cram.writeItf8(out, pres.size()); out.write(pres.toByteArray)
    // data series encodings
    val ds = new ByteArrayOutputStream(256)
    val entries = scala.collection.mutable.ArrayBuffer[(String, ByteArrayOutputStream => Unit)]()
    def ext(key: String, cid: Int): Unit = entries += ((key, writeExternal(_, cid)))
    ext("BF", BF); ext("RI", RI); ext("RL", RL); ext("AP", AP)
    // CF varies per record since the writer emits NF mate chains for
    // reconstructable within-slice pairs (htslib's shape): detached
    // 0x3, chain head 0x5, chain tail 0x1
    ext("CF", CF)
    entries += (("RG", writeHuffConst(_, -1))) // RG rides the tag dict
    entries += (("RN", writeByteArrayStop(_, RN)))
    ext("MF", MF); ext("NS", NS); ext("NP", NP); ext("TS", TS)
    ext("NF", NF)
    ext("TL", TL); ext("FN", FN); ext("FC", FC); ext("FP", FP)
    ext("DL", DL); ext("RS", RS); ext("HC", HC); ext("PD", PD)
    entries += (("IN", writeByteArrayStop(_, IN)))
    entries += (("SC", writeByteArrayStop(_, SC)))
    entries += (("BB", writeByteArrayLen(_, BB)))
    ext("BA", BA); ext("QS", QS); ext("MQ", MQ)
    Cram.writeItf8(ds, entries.length)
    entries.foreach { case (key, w) => ds.write(key.getBytes(US_ASCII)); w(ds) }
    val dsb = ds.toByteArray
    val dsSize = new ByteArrayOutputStream(8)
    Cram.writeItf8(dsSize, dsb.length)
    out.write(dsSize.toByteArray); out.write(dsb)
    // tag encodings
    val te = new ByteArrayOutputStream(128)
    Cram.writeItf8(te, tagCids.length)
    tagCids.foreach { cid =>
      Cram.writeItf8(te, cid)
      writeByteArrayLen(te, cid)
    }
    val teb = te.toByteArray
    val teSize = new ByteArrayOutputStream(8)
    Cram.writeItf8(teSize, teb.length)
    out.write(teSize.toByteArray); out.write(teb)
    CramIO.Block(CramIO.Gzip, CramIO.CompressionHeader, 0, out.toByteArray)
  }

  // ------------------------------------------------- record encoding

  private def cigarOps(c: String): Seq[(Int, Char)] = {
    if (c == "*") return Nil
    val out = scala.collection.mutable.ArrayBuffer[(Int, Char)]()
    var n = 0
    c.foreach { ch =>
      if (ch.isDigit) n = n * 10 + (ch - '0')
      else { out += ((n, ch)); n = 0 }
    }
    out.toSeq
  }

  /** One encoded slice plus the container-header fields its records
    * determined. */
  final case class EncodedSlice(blocks: Seq[CramIO.Block], refSeqId: Int,
                                start: Int, span: Int, bases: Long)

  /** A whole container: one compression header shared by its slices
    * (the multi-slice layout htslib writes). */
  final case class EncodedContainer(compHeader: CramIO.Block,
                                    slices: Seq[EncodedSlice],
                                    refSeqId: Int, start: Int, span: Int,
                                    bases: Long, nRecords: Int)

  /** NF chain plan for one slice: mateNext(i) = index of i's mate when
    * the pair reconstructs EXACTLY from chain resolution (both mapped,
    * mutual RNEXT/PNEXT, consistent mate flags, canonical TLEN) —
    * htslib's eligibility bar; everything else stays detached. */
  private def chainPlan(recs: Seq[SamRecord],
                        refIdx: Map[String, Int]): Array[Int] = {
    val mateNext = Array.fill(recs.length)(-1)
    def rid(r: SamRecord) = refIdx.getOrElse(r.rname, -1)
    def chainable(a: SamRecord, b: SamRecord): Boolean = {
      val ra = rid(a); val rb = rid(b)
      def ns(r: SamRecord, self: Int) =
        if (r.rnext == "=") self else refIdx.getOrElse(r.rnext, -1)
      val bothMapped = (a.flag & 0x4) == 0 && (b.flag & 0x4) == 0
      bothMapped && ra >= 0 && rb >= 0 && a.pos > 0 && b.pos > 0 &&
        ns(a, ra) == rb && ns(b, rb) == ra &&
        a.pnext == b.pos && b.pnext == a.pos &&
        (a.flag & 0x8) == 0 && (b.flag & 0x8) == 0 &&
        (((a.flag & 0x20) != 0) == ((b.flag & 0x10) != 0)) &&
        (((b.flag & 0x20) != 0) == ((a.flag & 0x10) != 0)) && {
          val left = math.min(a.pos, b.pos)
          val right = math.max(a.end, b.end)
          val span = right - left + 1
          val (ta, tb) = if (a.pos <= b.pos) (span, -span) else (-span, span)
          a.tlen == ta && b.tlen == tb
        }
    }
    recs.zipWithIndex.groupBy(_._1.qname).values.foreach { grp =>
      if (grp.length == 2) {
        val Seq((a, ai), (b, bi)) = grp.sortBy(_._2)
        if (chainable(a, b)) mateNext(ai) = bi
      }
    }
    mateNext
  }

  /** Encode `recsSlices` as the slices of ONE container sharing a
    * compression header; the tag dictionary and TL indices span the
    * container, exactly like a multi-slice htslib container. */
  private[sources] def encodeContainer(recsSlices: Seq[Seq[SamRecord]],
                                       refIdx: Map[String, Int],
                                       counterStart: Long,
                                       v31: Boolean = false,
                                       fqz: Boolean = false): EncodedContainer = {
    val all = recsSlices.flatten
    // tag dictionary: distinct (tag, normalized type) line per record
    val wired = all.map(r => r.tags.map(BamCodec.tagWire))
    val lines = scala.collection.mutable.LinkedHashMap[String, Int]()
    val tlOfAll = wired.map { ts =>
      val sig = ts.map { case (tag, typ, _) => tag + typ }.mkString
      lines.getOrElseUpdate(sig, lines.size)
    }
    val tdBlob = (lines.keys.mkString("\u0000") + "\u0000").getBytes(US_ASCII)
    val tagCids = wired.flatten
      .map { case (tag, typ, _) => (tag.charAt(0) << 16) | (tag.charAt(1) << 8) | typ }
      .distinct.sorted

    var counter = counterStart
    var offset = 0
    val encSlices = recsSlices.filter(_.nonEmpty).map { recs =>
      val sliceWired = wired.slice(offset, offset + recs.length)
      val sliceTl = tlOfAll.slice(offset, offset + recs.length)
      offset += recs.length
      val es = encodeOneSlice(recs, sliceWired, sliceTl, refIdx, counter, v31, fqz)
      counter += recs.length
      es
    }
    val rids = encSlices.map(_.refSeqId).distinct
    val crid = if (rids.length == 1) rids.head else -2
    val spanned = encSlices.filter(e => e.refSeqId >= 0 && e.span > 0)
    val cstart = if (crid >= 0 && spanned.nonEmpty) spanned.map(_.start).min else 0
    val cend = if (crid >= 0 && spanned.nonEmpty)
      spanned.map(e => e.start + e.span - 1).max else -1
    EncodedContainer(compressionHeader(tdBlob, tagCids), encSlices,
      crid, cstart, if (cend >= cstart) cend - cstart + 1 else 0,
      encSlices.map(_.bases).sum, all.length)
  }

  /** One slice's records → serialized blocks (`wired`/`tlOf` carry
    * the container-level tag encodings for exactly these records). */
  private def encodeOneSlice(recs: Seq[SamRecord],
                             wired: Seq[Array[(String, Char, Array[Byte])]],
                             tlOf: Seq[Int],
                             refIdx: Map[String, Int],
                             counterStart: Long,
                             v31: Boolean = false,
                             fqz: Boolean = false): EncodedSlice = {
    val mateNext = chainPlan(recs, refIdx)
    val isTail = Array.fill(recs.length)(false)
    mateNext.foreach(j => if (j >= 0) isTail(j) = true)

    val s = new Streams
    var refSeq = -3 // -3 unset; else the common refId or -2 mixed
    var minPos = Int.MaxValue
    var maxEnd = 0
    // per-record QS byte counts: the fqzcomp encoder codes record
    // lengths in-stream, so the QS block needs them at encode time
    val qsLens = scala.collection.mutable.ArrayBuffer[Int]()
    recs.zipWithIndex.zip(tlOf).foreach { case ((r, i), tl) =>
      val rid = refIdx.getOrElse(r.rname, -1)
      refSeq = if (refSeq == -3) rid else if (refSeq == rid) refSeq else -2
      val unmapped = (r.flag & 0x4) != 0
      val seqLen = if (r.seq == "*") 0 else r.seq.length
      if (!unmapped && r.cigar != "*")
        require(seqLen > 0, s"spec-profile CRAM cannot represent a mapped " +
          s"record with CIGAR but no bases: ${r.qname}")
      if (r.pos > 0 && rid >= 0) {
        minPos = math.min(minPos, r.pos)
        maxEnd = math.max(maxEnd, math.max(r.end, r.pos))
      }
      s.itf8(BF, r.flag & ~0x28) // 0x8/0x20 reconstruct from MF / chain
      // quals always stored (0x1); mate info detached (0x2) unless the
      // record heads (0x4 + NF) or tails (resolution target) a chain
      val head = mateNext(i) >= 0
      s.itf8(CF, 0x1 | (if (head) 0x4 else if (isTail(i)) 0x0 else 0x2))
      s.itf8(RI, rid)
      s.itf8(RL, seqLen)
      s.itf8(AP, r.pos)
      s.bytes(RN, r.qname.getBytes(UTF_8)); s.byte(RN, 0)
      if (head) {
        s.itf8(NF, mateNext(i) - i - 1)
      } else if (!isTail(i)) {
        s.itf8(MF, (if ((r.flag & 0x20) != 0) 1 else 0) | (if ((r.flag & 0x8) != 0) 2 else 0))
        val nsId = if (r.rnext == "=") rid else refIdx.getOrElse(r.rnext, -1)
        s.itf8(NS, nsId)
        s.itf8(NP, r.pnext)
        s.itf8(TS, r.tlen)
      }
      s.itf8(TL, tl)
    }
    // second pass alignment payloads + tags (kept separate for clarity;
    // stream order within a block is all that matters, and each series
    // has its own block)
    recs.zip(wired).foreach { case (r, tags) =>
      tags.foreach { case (tag, typ, value) =>
        val cid = (tag.charAt(0) << 16) | (tag.charAt(1) << 8) | typ
        s.itf8(cid, value.length)
        s.bytes(cid, value)
      }
      val unmapped = (r.flag & 0x4) != 0
      val seqLen = if (r.seq == "*") 0 else r.seq.length
      if (!unmapped && r.cigar == "*") {
        // Legal SAM corner: mapped (0x4 clear) but CIGAR-less.  CRAM
        // has no way to say "mapped, no alignment detail", so store any
        // bases as one verbatim 'b' run — it reads back as <len>M with
        // the exact bases, which is how htsjdk reconstructs such
        // records too (features → CIGAR; no features → readLength M).
        if (seqLen > 0) {
          s.itf8(FN, 1)
          s.byte(FC, 'b'); s.itf8(FP, 1)
          s.itf8(BB, seqLen); s.bytes(BB, r.seq.getBytes(US_ASCII))
        } else s.itf8(FN, 0)
        s.itf8(MQ, r.mapq)
      } else if (!unmapped) {
        val ops = cigarOps(r.cigar)
        val feats = scala.collection.mutable.ArrayBuffer[(Char, Int)]() // (code, fpos)
        var rpos = 0 // 0-based read cursor
        val bodies = scala.collection.mutable.ArrayBuffer[() => Unit]()
        ops.foreach { case (n, op) =>
          val fpos = rpos + 1
          op match {
            case 'M' | '=' | 'X' =>
              val frag = r.seq.substring(rpos, rpos + n)
              feats += (('b', fpos))
              bodies += (() => { s.itf8(BB, n); s.bytes(BB, frag.getBytes(US_ASCII)) })
              rpos += n
            case 'I' =>
              val frag = r.seq.substring(rpos, rpos + n)
              feats += (('I', fpos))
              bodies += (() => { s.bytes(IN, frag.getBytes(US_ASCII)); s.byte(IN, 0) })
              rpos += n
            case 'S' =>
              val frag = r.seq.substring(rpos, rpos + n)
              feats += (('S', fpos))
              bodies += (() => { s.bytes(SC, frag.getBytes(US_ASCII)); s.byte(SC, 0) })
              rpos += n
            case 'D' => feats += (('D', fpos)); bodies += (() => s.itf8(DL, n))
            case 'N' => feats += (('N', fpos)); bodies += (() => s.itf8(RS, n))
            case 'H' => feats += (('H', fpos)); bodies += (() => s.itf8(HC, n))
            case 'P' => feats += (('P', fpos)); bodies += (() => s.itf8(PD, n))
            case other =>
              throw new IllegalArgumentException(s"CIGAR op '$other' in ${r.cigar}")
          }
        }
        require(rpos == seqLen,
          s"CIGAR ${r.cigar} consumes $rpos read bases but seq has $seqLen (${r.qname})")
        s.itf8(FN, feats.length)
        var prev = 0
        feats.zip(bodies).foreach { case ((code, fpos), body) =>
          s.byte(FC, code)
          s.itf8(FP, fpos - prev)
          prev = fpos
          body()
        }
        s.itf8(MQ, r.mapq)
      } else if (seqLen > 0) {
        r.seq.foreach(c => s.byte(BA, c))
      }
      // CF bit 1: quality scores always stored ("*" → 0xff sentinel
      // bytes, which read back as "*")
      if (r.qual == "*") (0 until seqLen).foreach(_ => s.byte(QS, 0xff))
      else r.qual.foreach(c => s.byte(QS, c - 33))
      qsLens += (if (r.qual == "*") seqLen else r.qual.length)
    }

    val rid = if (refSeq == -3) -1 else refSeq
    val start = if (rid >= 0 && minPos != Int.MaxValue) minPos else 0
    val span = if (rid >= 0 && maxEnd >= minPos) maxEnd - minPos + 1 else 0
    val ext = s.nonEmpty
    // slice header: content ids of the external blocks that exist
    val sh = new ByteArrayOutputStream(64)
    Cram.writeItf8(sh, rid)
    Cram.writeItf8(sh, start)
    Cram.writeItf8(sh, span)
    Cram.writeItf8(sh, recs.length)
    Cram.writeLtf8(sh, counterStart)
    Cram.writeItf8(sh, ext.length + 1) // + core block
    Cram.writeItf8(sh, ext.length)
    ext.foreach { case (cid, _) => Cram.writeItf8(sh, cid) }
    Cram.writeItf8(sh, -1) // no embedded reference
    sh.write(new Array[Byte](16)) // md5 (RR=0: zeroed)
    val core = CramIO.Block(CramIO.Raw, CramIO.CoreData, 0, Array.emptyByteArray)
    // compression header NOT included: the container owns it (shared
    // across this container's slices)
    val blocks = Seq(
      CramIO.Block(CramIO.Raw, CramIO.SliceHeader, 0, sh.toByteArray),
      core) ++
      ext.map { case (cid, data) =>
        // CRAM 3.0 profile: rANS 4x8 for the bulky byte-stream series
        // (the decoder side is the same codec that reads htslib
        // blocks), gzip below the table-overhead floor.  CRAM 3.1
        // profile: rANS Nx16, and the RN series rides the name
        // tokeniser — the htslib 3.1 default shape.
        if (fqz && cid == QS && data.nonEmpty)
          // htslib "small"-profile shape: quality scores ride fqzcomp
          CramIO.Block(CramIO.FqzM, CramIO.External, cid, data,
            pre = Fqz.encode(data, qsLens.filter(_ > 0).toArray))
        else {
          val method =
            if (v31 && cid == RN) CramIO.NameTokM
            else if (data.length < 256) CramIO.Gzip
            else if (v31) CramIO.RansNx16M
            else CramIO.Rans4x8
          CramIO.Block(method, CramIO.External, cid, data)
        }
      }
    val bases = recs.iterator.map(r => if (r.seq == "*") 0L else r.seq.length.toLong).sum
    EncodedSlice(blocks, rid, start, span, bases)
  }
}
