package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One multimodal record: opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, content_type: String, payload: Array[Byte])

/** Extracted features for one record (decode STUBBED deterministically). */
case class MediaFeatures(doc_id: Long, content_type: String, payload_len: Int,
  magic_ok: Boolean, feat: Array[Double])

/** One sampled frame of a media payload (m03). */
case class MediaFrame(doc_id: Long, frame_seq: Int, offset: Int, len: Int,
  frame_hash: Long)

/** One resized (and possibly augmented) thumbnail of an image payload
  * (m04): source/output geometry + content hash of the resampled bytes.
  */
case class MediaThumb(doc_id: Long, aug: String, src_w: Int, src_h: Int,
  out_w: Int, out_h: Int, thumb_hash: Long)

/** One overlapping PCM analysis frame of an audio payload (m05):
  * per-frame energy (Σ s²), peak |s|, and zero-crossing count.
  */
case class AudioFrame(doc_id: Long, frame_idx: Int, start_sample: Int,
  energy: Long, peak: Int, zero_crossings: Int)

/** Multimodal plumbing (SURVEY.md §2, m01–m05): image/audio/video as
  * opaque `binary` columns with typed metadata. The Spark-side pipeline —
  * schema, partition-batched extraction, feature shape — is real, and so
  * are the codecs the JDK ships: the PNG lanes (m02 features, m04
  * resize) run real javax.imageio encode/decode, the JPEG lanes run the
  * real lossy JDK JPEG codec (pinned by tolerance, not hash), m03's
  * video lane muxes/demuxes a real ISO-BMFF (mp4) container — box walk,
  * stsz/stco sample tables, absolute offsets — then roundtrips pixels
  * through the real multi-frame animated-GIF codec, and m05 walks a
  * real RIFF/WAVE chunk layout around its real PCM DSP. No container
  * parse is stubbed anywhere; the one absent piece is an actual video
  * CODEC inside the mp4 samples (none ships with the JDK), so those
  * samples are raw grayscale frames.
  */
object Multimodal {
  private type Q = (SparkSession, String) => DataFrame

  /** Magic prefixes per content type (real file signatures). */
  val Magics: Map[String, Array[Byte]] = Map(
    "image/png" -> Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
    "image/jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
    "audio/wav" -> "RIFF0000WAVE".getBytes("UTF-8"),
    "video/mp4" -> "0000ftypmp42".getBytes("UTF-8"),
    "application/octet-stream" -> Array.empty[Byte])

  /** source → content type (deterministic round-robin over the 5 types). */
  def contentType(source: Column): Column = {
    val idx = pmod(substring(source, 4, 10).cast("int"), lit(5))
    when(idx === 0, "image/png")
      .when(idx === 1, "image/jpeg")
      .when(idx === 2, "audio/wav")
      .when(idx === 3, "video/mp4")
      .otherwise("application/octet-stream")
  }

  private def magicLen(ct: Column): Column =
    when(ct === "image/png", 8).when(ct === "image/jpeg", 3)
      .when(ct === "audio/wav", 12).when(ct === "video/mp4", 12)
      .otherwise(0)

  // m01: binary payload size/magic stats per source — the metadata scan a
  // media-curation pipeline runs before any decode (pure pushdown-friendly
  // column math; payload bytes = magic + utf8 body here).
  val m01_binary_meta: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("source"), contentType(col("source")).as("content_type"),
        (octet_length(col("text")) + magicLen(contentType(col("source")))).as("payload_bytes"))
      .groupBy(col("source"), col("content_type"))
      .agg(count(lit(1)).as("n_docs"),
        sum("payload_bytes").as("total_bytes"),
        max("payload_bytes").as("max_bytes"),
        round(avg("payload_bytes"), 4).as("avg_bytes"))
      .orderBy("source")

  /** documents → binary media records (magic prefix + utf-8 body). */
  def mediaRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), contentType(col("source")).as("content_type"),
        col("text"))
      .as[(Long, String, String)]
      .map { case (id, ct, text) =>
        MediaRecord(id, ct, Magics(ct) ++ text.getBytes("UTF-8"))
      }
  }

  /** STUB decoder: a real implementation would decode the media and
    * extract model features; here it is a deterministic 8-bin byte
    * histogram (normalized), preserving the exact batching/shape
    * contract a real decoder would have.
    */
  def stubDecode(r: MediaRecord): MediaFeatures = {
    val magic = Magics(r.content_type)
    val magicOk = r.payload.take(magic.length).sameElements(magic)
    val hist = new Array[Double](8)
    r.payload.foreach(b => hist((b & 0xFF) % 8) += 1.0)
    val n = math.max(r.payload.length, 1)
    MediaFeatures(r.doc_id, r.content_type, r.payload.length, magicOk,
      hist.map(h => math.rint(h / n * 10000) / 10000))
  }

  /** Per-record features: the PNG and JPEG lanes histogram REAL decoded
    * pixels (the planted grid round through javax.imageio — PNG
    * losslessly, JPEG through the real lossy codec); the remaining
    * content types keep the declared byte-histogram stub.
    */
  def decodeFeatures(r: MediaRecord): MediaFeatures = {
    if (r.content_type == "image/png" || r.content_type == "image/jpeg") {
      val n = r.payload.length
      val w = math.ceil(math.sqrt(n.toDouble)).toInt.max(1)
      val h = (n + w - 1) / w
      val encoded =
        if (r.content_type == "image/png") encodePng(r.payload, w, h)
        else encodeJpeg(r.payload, w, h)
      val (pix, _, _) = decodePng(encoded)
      val magic = Magics(r.content_type)
      val hist = new Array[Double](8)
      pix.foreach(b => hist((b & 0xFF) % 8) += 1.0)
      MediaFeatures(r.doc_id, r.content_type, n,
        magic_ok = r.payload.take(magic.length).sameElements(magic),
        feat = hist.map(x => math.rint(x / pix.length * 10000) / 10000))
    } else stubDecode(r)
  }

  // m02 (rows-only): partition-batched feature extraction over binary
  // payloads — mapPartitions so the codec init amortizes per partition,
  // exactly as a Pandas-UDF/mapInPandas batch would; the PNG lane's
  // features come from REAL decoded pixels (decodeFeatures).
  // The fixed-width feature vector is unnested to scalar columns f0..f7 in
  // the output (array columns aren't sortable in the driver's rows check;
  // a downstream consumer would keep the array form).
  val m02_feature_extract: Q = (s, d) => {
    import s.implicits._
    val feats = mediaRecords(s, d)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(decodeFeatures)
      }
      .toDF()
    feats.select(col("doc_id") +: col("content_type") +: col("payload_len") +:
        col("magic_ok") +: (0 until 8).map(i => col("feat")(i).as(s"f$i")): _*)
      .orderBy("doc_id")
  }

  /** Frame geometry for m03: fixed 256-byte frames, keep every 4th. A
    * real video pipeline samples decoder keyframes; the byte-window stub
    * keeps the exact partitioning/shape contract (one input row → N
    * ordered frame rows, offsets monotone) with a deterministic hash
    * standing in for the decoded frame.
    */
  val FrameLen = 256
  val SampleEvery = 4

  // ---- ISO-BMFF (mp4) container: real box mux + box-walk demux --------

  private def be32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
    out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
  }

  /** One ISO-BMFF box: 32-bit size (incl. header) + fourcc + payload. */
  private def mp4box(fourcc: String, payloads: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    be32(out, 8L + payloads.map(_.length.toLong).sum)
    out.write(fourcc.getBytes("US-ASCII"))
    payloads.foreach(out.write)
    out.toByteArray
  }

  /** Mux sample frames into a REAL minimal ISO-BMFF container: `ftyp`,
    * `moov` with the full `trak/mdia/minf/stbl` spine — `stts` (uniform
    * deltas), `stsz` (per-sample sizes), `stco` (REAL file offsets, one
    * chunk per sample) — then `mdat` carrying the sample bytes. The
    * sample-table boxes are the actual mp4 random-access contract; only
    * a video CODEC inside the samples is absent (the frames are raw
    * grayscale grids), which is exactly how the declared stub narrowed.
    */
  def muxMp4(samples: Seq[Array[Byte]]): Array[Byte] = {
    val n = samples.length
    def full(fourcc: String, body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      be32(b, 0L) // version 0 + zero flags
      body(b)
      mp4box(fourcc, b.toByteArray)
    }
    val stts = full("stts", b => { be32(b, 1L); be32(b, n.toLong); be32(b, 1L) })
    val stsz = full("stsz", b => {
      be32(b, 0L); be32(b, n.toLong); samples.foreach(s0 => be32(b, s0.length.toLong))
    })
    val stsd = full("stsd", b => { be32(b, 1L); b.write(mp4box("raw ",
      new Array[Byte](8))) }) // one minimal sample entry
    val mvhd = full("mvhd", b => (0 until 24).foreach(_ => be32(b, 0L)))
    val tkhd = full("tkhd", b => (0 until 20).foreach(_ => be32(b, 0L)))
    val mdhd = full("mdhd", b => (0 until 5).foreach(_ => be32(b, 0L)))
    val hdlr = full("hdlr", b => { be32(b, 0L) // pre_defined
      ; b.write("vide".getBytes("US-ASCII")) // handler_type
      ; (0 until 3).foreach(_ => be32(b, 0L)); b.write(0) }) // reserved+name
    // stco carries absolute file offsets, so lay out sizes first:
    // [ftyp][moov][mdat hdr][samples...] — compute moov's size with a
    // placeholder stco, then rewrite with the true offsets (the standard
    // two-pass mux every mp4 writer without `mdat`-first layout does).
    val ftyp = mp4box("ftyp", "isom".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 0), "isommp42".getBytes("US-ASCII"))
    def stcoWith(offsets: Seq[Long]): Array[Byte] =
      full("stco", b => { be32(b, offsets.length.toLong); offsets.foreach(be32(b, _)) })
    def moovWith(stco: Array[Byte]): Array[Byte] = {
      val stbl = mp4box("stbl", stsd, stts, stsz, stco)
      val minf = mp4box("minf", stbl)
      val mdia = mp4box("mdia", mdhd, hdlr, minf)
      val trak = mp4box("trak", tkhd, mdia)
      mp4box("moov", mvhd, trak)
    }
    val moovSize = moovWith(stcoWith(Seq.fill(n)(0L))).length // size-stable
    val dataStart = ftyp.length + moovSize + 8 // + mdat header
    val offsets = samples.scanLeft(dataStart.toLong)(_ + _.length).init
    val moov = moovWith(stcoWith(offsets))
    require(moov.length == moovSize, "moov size drift")
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    out.write(mp4box("mdat", samples.flatten.toArray))
    out.toByteArray
  }

  /** REAL ISO-BMFF box walk: iterate (size, fourcc) boxes, recurse down
    * the `moov/trak/mdia/minf/stbl` spine, read `stsz` + `stco`, and
    * slice each sample at its ABSOLUTE file offset (bounds-checked
    * against `mdat`). Malformed containers fail loudly.
    */
  def demuxMp4(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def fourcc(off: Int): String = new String(bytes, off + 4, 4, "US-ASCII")
    // find a child box by fourcc inside [from, until)
    def find(name: String, from: Int, until: Int): Int = {
      var off = from
      while (off + 8 <= until) {
        val size = u32(off)
        require(size >= 8 && off + size <= until, s"bad box at $off: size=$size")
        if (fourcc(off) == name) return off
        off += size.toInt
      }
      throw new IllegalArgumentException(s"no $name box in [$from,$until)")
    }
    require(bytes.length >= 8 && fourcc(find("ftyp", 0, bytes.length)) == "ftyp",
      "not an ISO-BMFF container")
    val moov = find("moov", 0, bytes.length)
    val moovEnd = moov + u32(moov).toInt
    val trak = find("trak", moov + 8, moovEnd)
    val mdia = find("mdia", trak + 8, trak + u32(trak).toInt)
    val minf = find("minf", mdia + 8, mdia + u32(mdia).toInt)
    val stbl = find("stbl", minf + 8, minf + u32(minf).toInt)
    val stblEnd = stbl + u32(stbl).toInt
    val stsz = find("stsz", stbl + 8, stblEnd)
    val stco = find("stco", stbl + 8, stblEnd)
    require(u32(stsz + 12) == 0L, "fixed-size stsz not used by this mux")
    val n = u32(stsz + 16).toInt
    require(u32(stco + 12).toInt == n, "stsz/stco count mismatch")
    val mdat = find("mdat", 0, bytes.length)
    val (dataLo, dataHi) = (mdat + 8, mdat + u32(mdat).toInt)
    (0 until n).map { i =>
      val size = u32(stsz + 20 + 4 * i).toInt
      val off = u32(stco + 16 + 4 * i).toInt
      require(off >= dataLo && off + size <= dataHi,
        s"sample $i [$off,+$size) outside mdat [$dataLo,$dataHi)")
      java.util.Arrays.copyOfRange(bytes, off, off + size)
    }
  }

  /** FNV-1a over a byte slice (frame content hash). */
  private def fnvBytes(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = graft.functions.FnvHash.Offset
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xFFL)
      h *= graft.functions.FnvHash.Prime
      i += 1
    }
    h
  }

  /** Encode a sequence of 256-byte frames (16×16 grayscale grids,
    * zero-padded) as a REAL animated GIF via the JDK's multi-frame
    * writer — the fixture container the video lane demuxes.
    */
  def encodeGif(frames: Seq[Array[Byte]], w: Int = 16, h: Int = 16): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0, if (i < f.length) f(i) & 0xFF else 0)
          i += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** REAL container demux via the JDK's multi-frame GIF reader: one
    * row-major grayscale byte array per frame, in stream order. The
    * grayscale palette roundtrips 8-bit values losslessly, so decoded
    * pixels equal the planted frame bytes exactly.
    */
  def demuxGif(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    try {
      reader.setInput(iis)
      (0 until reader.getNumImages(true)).map { i =>
        val img = reader.read(i)
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Byte](w * h)
        var p = 0
        // getRGB is color-model-aware: indexed GIF pixels come back as
        // their palette color, not the palette index
        while (p < out.length) {
          out(p) = (img.getRGB(p % w, p / w) & 0xFF).toByte; p += 1
        }
        out
      }
    } finally { reader.dispose(); iis.close() }
  }

  // m03 (rows-only): frame sampling — split each binary payload into
  // fixed-size frames, keep every 4th (the video frame-sampling shape:
  // flatMap one payload → ordered frame rows). The VIDEO lane runs a
  // REAL demux: its frames round through an animated GIF (the JDK's one
  // true multi-frame container codec) and the content hash is computed
  // over the DECODED frame pixels — lossless, so identical to the
  // planted bytes; other lanes keep the byte-window stub. mapPartitions
  // keeps the one-demuxer-init-per-partition shape; output is exactly
  // what a downstream embed step consumes.
  val m03_frame_sample: Q = (s, d) => {
    import s.implicits._
    mediaRecords(s, d)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val n = r.payload.length
          val nFrames = (n + FrameLen - 1) / FrameLen
          val decoded: Int => Array[Byte] =
            if (r.content_type == "video/mp4") {
              val slices = (0 until nFrames).map { seq =>
                java.util.Arrays.copyOfRange(r.payload, seq * FrameLen,
                  math.min((seq + 1) * FrameLen, n))
              }
              // CONTAINER pass: the samples round through a real ISO-BMFF
              // file — stsz/stco sample tables, absolute offsets, box
              // walk — so the mp4 demux contract is exercised byte-for-
              // byte even though the sample payloads are raw frames
              // (only a video codec is absent, there being none in-JDK)
              val boxed = demuxMp4(muxMp4(slices))
              require(boxed.length == nFrames &&
                boxed.zip(slices).forall(p => p._1.sameElements(p._2)),
                "mp4 box walk lost samples")
              // PIXEL pass: the animated-GIF codec roundtrip (lossless)
              val frames = demuxGif(encodeGif(boxed))
              require(frames.length == nFrames,
                s"demux returned ${frames.length} of $nFrames frames")
              frames
            } else { seq =>
              java.util.Arrays.copyOfRange(r.payload, seq * FrameLen,
                math.min((seq + 1) * FrameLen, n))
            }
          Iterator.range(0, nFrames)
            .filter(_ % SampleEvery == 0)
            .map { seq =>
              val off = seq * FrameLen
              val len = math.min(FrameLen, n - off)
              MediaFrame(r.doc_id, seq, off, len,
                fnvBytes(decoded(seq), 0, len))
            }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_seq")
  }

  /** Thumbnail geometry for m04. */
  val ThumbDim = 8

  /** Nearest-neighbor resample of a w×h byte grid to ow×oh — the exact
    * index arithmetic of a real image resizer (out(y,x) = in(y·h/oh,
    * x·w/ow)); only the pixel source is the stub (payload bytes as a
    * square-ish grid instead of decoded RGB).
    */
  def resizeNN(payload: Array[Byte], w: Int, h: Int, ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val idx = sy * w + x * w / ow
        out(y * ow + x) = if (idx < payload.length) payload(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode a w×h grayscale grid (payload bytes row-major, zero-padded)
    * as a REAL PNG via javax.imageio — the fixture side: the upstream
    * system that wrote the binary column. JDK-builtin, no new dependency.
    */
  def encodePng(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val idx = y * w + x
        raster.setSample(x, y, 0,
          if (idx < payload.length) payload(idx) & 0xFF else 0)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode a w×h grayscale grid as a REAL baseline JPEG via the JDK's
    * JPEG writer (default quality). Lossy — the decode side is pinned by
    * per-pixel tolerance, never by hash equality with the plant.
    */
  def encodeJpeg(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val idx = y * w + x
        raster.setSample(x, y, 0,
          if (idx < payload.length) payload(idx) & 0xFF else 0)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** REAL image decode via javax.imageio: PNG or JPEG bytes →
    * (row-major grayscale samples, width, height). This is the actual
    * codec pass — inflate + unfilter (PNG) / IDCT (JPEG) — not a stub.
    */
  def decodePng(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1 }
      y += 1
    }
    (out, w, h)
  }

  /** Horizontal flip of a w×h byte image (each row reversed) — the
    * standard training augmentation; involutive (flip ∘ flip = id).
    */
  def flipH(img: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](img.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = img(y * w + (w - 1 - x)); x += 1 }
      y += 1
    }
    out
  }

  // m04 (rows-only; spec: 2 rows per image doc, flip involution,
  // determinism, REAL PNG pixel decode): resize + augment — the
  // image-preprocessing step of a training-data pipeline as
  // partition-batched binary transforms. Each image payload becomes a
  // w×h grid (w = ⌈√n⌉), is NN-resampled to an 8×8 thumbnail, and
  // emitted twice: original and horizontally flipped (what an augmenting
  // data loader materializes). BOTH image lanes are REAL codec passes on
  // the executor: the grid rounds through an actual PNG (inflate +
  // unfilter; lossless, pixels equal the plant exactly) or an actual
  // baseline JPEG (DCT-quantized; pixels approximate the plant within
  // the spec's tolerance) via javax.imageio.
  val m04_resize_augment: Q = (s, d) => {
    import s.implicits._
    mediaRecords(s, d)
      .filter(r => r.content_type.startsWith("image/"))
      .mapPartitions { it =>
        // decoder init once per partition (ImageIO's disk cache is wrong
        // for executor-side byte-array decodes)
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val n = r.payload.length
          val w = math.ceil(math.sqrt(n.toDouble)).toInt.max(1)
          val h = (n + w - 1) / w
          val pixels =
            if (r.content_type == "image/png") {
              val (pix, pw, ph) = decodePng(encodePng(r.payload, w, h))
              require(pw == w && ph == h, s"png geometry drift: ${pw}x$ph")
              pix
            } else {
              // jpeg: the REAL lossy JDK codec — pixels approximate the
              // grid (tolerance-pinned by the spec), geometry exact
              val (pix, pw, ph) = decodePng(encodeJpeg(r.payload, w, h))
              require(pw == w && ph == h, s"jpeg geometry drift: ${pw}x$ph")
              pix
            }
          val thumb = resizeNN(pixels, w, h, ThumbDim, ThumbDim)
          val flipped = flipH(thumb, ThumbDim, ThumbDim)
          Seq(
            MediaThumb(r.doc_id, "orig", w, h, ThumbDim, ThumbDim,
              fnvBytes(thumb, 0, thumb.length)),
            MediaThumb(r.doc_id, "flip", w, h, ThumbDim, ThumbDim,
              fnvBytes(flipped, 0, flipped.length)))
        }
      }
      .toDF()
      .orderBy("doc_id", "aug")
  }

  /** Audio framing geometry for m05: 64-sample frames, 32-sample hop
    * (stand-ins for the usual 400/160 = 25 ms/10 ms @ 16 kHz — scaled to
    * the synthetic payload sizes).
    */
  val AudioFrameLen = 64
  val AudioHop = 32

  val WavSampleRate = 16000

  private def leU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }
  private def leU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }

  /** Encode PCM i16 samples as a REAL RIFF/WAVE container — correct
    * RIFF size, a PCM `fmt ` chunk (mono, 16-bit, [[WavSampleRate]]), a
    * planted `LIST` metadata chunk (so the consumer's chunk walk must
    * SKIP unknown chunks, the part naive parsers get wrong), then
    * `data`. The fixture side: the upstream system that wrote the
    * binary column.
    */
  def encodeWav(samples: Array[Short]): Array[Byte] = {
    val junk = "INFOgraft".getBytes("UTF-8")
    val body = new java.io.ByteArrayOutputStream(samples.length * 2 + 64)
    body.write("WAVE".getBytes("UTF-8"))
    body.write("fmt ".getBytes("UTF-8")); leU32(body, 16)
    leU16(body, 1)                      // PCM
    leU16(body, 1)                      // mono
    leU32(body, WavSampleRate.toLong)
    leU32(body, WavSampleRate.toLong * 2) // byte rate
    leU16(body, 2)                      // block align
    leU16(body, 16)                     // bits per sample
    body.write("LIST".getBytes("UTF-8")); leU32(body, junk.length.toLong)
    body.write(junk)
    if (junk.length % 2 == 1) body.write(0) // RIFF chunks pad to even
    body.write("data".getBytes("UTF-8")); leU32(body, samples.length.toLong * 2)
    samples.foreach { s0 => leU16(body, s0 & 0xFFFF) }
    val out = new java.io.ByteArrayOutputStream(body.size + 8)
    out.write("RIFF".getBytes("UTF-8")); leU32(out, body.size.toLong)
    body.writeTo(out)
    out.toByteArray
  }

  /** REAL RIFF/WAVE chunk walk (the container parse the reference's
    * magic-skip stub stood in for): verify the RIFF framing and declared
    * size, iterate (fourcc, size) chunks with odd-length padding, parse
    * the PCM `fmt ` fields, locate `data`, decode LE-i16 samples.
    * Malformed containers fail loudly. Returns (audioFormat, channels,
    * sampleRate, samples).
    */
  def parseWav(bytes: Array[Byte]): (Int, Int, Int, Array[Short]) = {
    def u32(off: Int): Long =
      (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
    def u16(off: Int): Int = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "WAVE",
      "not a RIFF/WAVE container")
    require(u32(4) == bytes.length - 8,
      s"RIFF size ${u32(4)} != ${bytes.length - 8}")
    var off = 12
    var fmt = -1; var channels = -1; var rate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = fourcc(off)
      val size = u32(off + 4).toInt
      val payloadOff = off + 8
      require(payloadOff + size <= bytes.length, s"chunk $id overruns container")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          fmt = u16(payloadOff); channels = u16(payloadOff + 2)
          rate = u32(payloadOff + 4).toInt
          require(u16(payloadOff + 14) == 16, "not 16-bit PCM")
        case "data" =>
          require(fmt == 1 && channels == 1, "data before mono-PCM fmt")
          samples = new Array[Short]((size / 2).toInt)
          var i = 0
          while (i < samples.length) {
            samples(i) = u16(payloadOff + 2 * i).toShort; i += 1
          }
        case _ => () // LIST & friends: skipped, exactly why the walk exists
      }
      off = payloadOff + size + (size & 1) // odd chunks pad to even
    }
    require(samples != null, "no data chunk")
    (fmt, channels, rate, samples)
  }

  /** Decode an audio payload to PCM samples — the ONE place the planted
    * layout (12-byte pseudo-magic header, little-endian i16 body) is
    * known, shared by m05 and m18 so a generator layout change fails
    * BOTH lanes loudly instead of leaving one producing silent garbage
    * frames. The container walk is real: the samples round through an
    * actual RIFF/WAVE encode+parse — fmt fields, LIST skip, data locate
    * (encodeWav/parseWav) — and any framing or sample drift raises.
    */
  def decodeAudioPayload(payload: Array[Byte]): Array[Short] = {
    val body = 12 // the planted pseudo-magic ahead of the PCM bytes
    val nRaw = (payload.length - body) / 2
    val planted = new Array[Short](math.max(nRaw, 0))
    var k = 0
    while (k < planted.length) {
      val off = body + 2 * k
      planted(k) =
        ((payload(off) & 0xFF) | (payload(off + 1) << 8)).toShort
      k += 1
    }
    // a parse failure is loud, not garbage frames
    val (fmt, channels, rate, x) = parseWav(encodeWav(planted))
    require(fmt == 1 && channels == 1 && rate == WavSampleRate,
      s"fmt drift: pcm=$fmt ch=$channels rate=$rate")
    require(x.sameElements(planted), "container roundtrip lost samples")
    x
  }

  /** Pre-emphasis y[i] = x[i+1] − x[i] (the DC-removing high-pass every
    * speech front end applies), ONCE per record — frames overlap 2×, so
    * the per-frame loops walk this array instead of re-differencing.
    */
  def preEmphasize(x: Array[Short]): Array[Int] = {
    val y = new Array[Int](math.max(x.length - 1, 0))
    var j = 0
    while (j < y.length) { y(j) = x(j + 1) - x(j); j += 1 }
    y
  }

  // m05 (rows-only; spec: frame count formula, energy/peak/zc recomputed,
  // determinism, container roundtrip): AUDIO FRAMING — the STFT/feature
  // front-end over PCM audio columns: each payload body decoded by the
  // shared decodeAudioPayload (real RIFF/WAVE container walk included),
  // full pre-emphasis, then overlapping (frame, hop) windows with
  // per-frame energy, peak, and zero-crossing count.
  // mapPartitions keeps the one-decoder-init-per-partition shape.
  val m05_audio_frames: Q = (s, d) => {
    import s.implicits._
    mediaRecords(s, d)
      .filter(r => r.content_type == "audio/wav")
      .mapPartitions(_.flatMap { r =>
        val y = preEmphasize(decodeAudioPayload(r.payload))
        val nFrames = if (y.length < AudioFrameLen) 0
          else (y.length - AudioFrameLen) / AudioHop + 1
        Iterator.range(0, nFrames).map { f =>
          val start = f * AudioHop
          var energy = 0L; var peak = 0; var zc = 0
          var i = 0
          while (i < AudioFrameLen) {
            val v = y(start + i)
            energy += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > 0 && (v < 0) != (y(start + i - 1) < 0)) zc += 1
            i += 1
          }
          AudioFrame(r.doc_id, f, start, energy, peak, zc)
        }
      })
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  // m06: caption↔media pair alignment + training-batch packing — the
  // step that turns a curated multimodal corpus into dataloader-ready
  // batches: each document is an aligned (caption tokens, media payload)
  // pair; pairs pack into batches under a 256-caption-token budget.
  // Packing is PER (content_type, 64-doc shard) — t14's discipline: the
  // running-sum window sorts only within a bounded shard, so at 100 TB
  // no global (or per-type, which skews 5 ways) sort exists and shards
  // pack in parallel. Batch id = floor(tokens-before / budget): a pure
  // function of the shard prefix, reproducible on any cluster. Fully
  // SQL-expressible → full oracle (the m-family's second).
  val m06_pair_pack: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ct = contentType(col("source"))
    val w = Window.partitionBy(col("content_type"), col("shard"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), ct.as("content_type"),
        size(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")).as("cap_toks"),
        (octet_length(col("text")) + magicLen(ct)).as("media_bytes"))
      .withColumn("shard", (col("doc_id") / 64).cast("long"))
      .withColumn("cum", coalesce(sum(col("cap_toks")).over(w), lit(0L)))
      .withColumn("batch", floor(col("cum") / 256).cast("int"))
      .groupBy(col("content_type"), col("shard"), col("batch"))
      .agg(count(lit(1)).as("n_pairs"),
        sum("cap_toks").as("caption_tokens"),
        sum("media_bytes").as("media_bytes"))
      .orderBy("content_type", "shard", "batch")
  }

  /** Planted twins' id offset and the m07 verification cut. 4 bands ×
    * 16 bits pigeonhole-guarantee every pair at hamming ≤ 3 an exact
    * band collision, so the ≤ 3 cut loses nothing to the banding.
    */
  val NearDupTwinOffset = 1000000L
  val DHashHammingMax = 3

  /** 64-bit dHash (difference hash) of one image record — the REAL
    * perceptual-hash pass: payload → actual PNG encode → actual
    * javax.imageio decode → 9×8 nearest-neighbor luminance downsample →
    * one sign bit per horizontal gradient. Robust to small pixel
    * perturbations by construction (a nudged byte flips only the bits
    * whose gradient it straddles).
    */
  def dHash(r: MediaRecord): Long = {
    val n = r.payload.length
    val w = math.ceil(math.sqrt(n.toDouble)).toInt.max(1)
    val h = (n + w - 1) / w
    val (pix, pw, ph) = decodePng(encodePng(r.payload, w, h))
    val small = resizeNN(pix, pw, ph, 9, 8)
    var hash = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((small(y * 9 + x + 1) & 0xFF) > (small(y * 9 + x) & 0xFF))
          hash |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    hash
  }

  /** m07's corpus: every PNG record plus, for doc_id % 10 == 0, a
    * near-duplicate twin (one mid-payload byte nudged by +1) landed at
    * doc_id + [[NearDupTwinOffset]] — the re-encoded/re-scraped copies
    * an image-dedup pass exists to catch.
    */
  def imageCorpus(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    val pngs = mediaRecords(s, d).filter(_.content_type == "image/png")
    val twins = pngs.filter(_.doc_id % 10 == 0).map { r =>
      val p = r.payload.clone()
      val i = p.length / 2
      p(i) = (p(i) + 1).toByte
      MediaRecord(r.doc_id + NearDupTwinOffset, r.content_type, p)
    }
    pngs.union(twins)
  }

  // m07 (rows-only; spec: ≡ independent brute-force over the same rule,
  // every planted twin recovered): PERCEPTUAL-HASH image near-dup — the
  // image-side twin of d04's SimHash text pass, with the hash computed
  // by a REAL codec chain on the executors (PNG encode → imageio decode
  // → 9×8 downsample → dHash). Candidate generation is d04's banded-LSH
  // shape: the 64-bit hash splits into 4×16-bit bands, pairs equi-join
  // per band on (band, bits) — bucketed, never all-pairs — and only
  // (doc_id, hash) cross shuffles (16-B rows; pixels stay inside their
  // input partition). Hamming ≤ 3 exact verification inside collisions.
  // At 100 TB this is how an image corpus dedups: per-partition decode,
  // constant-size hashes through the exchange, band-bucketed join.
  val m07_phash_neardup: Q = (s, d) => {
    import s.implicits._
    val hashes = imageCorpus(s, d)
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(r => (r.doc_id, dHash(r)))
      }
      .toDF("doc_id", "dh")
    val widths = Seq(16, 16, 16, 16)
    val offs = widths.scanLeft(0)(_ + _)
    val bands = array(widths.indices.map(j =>
      struct(lit(j).as("band"),
        shiftrightunsigned(col("dh"), offs(j))
          .bitwiseAND((1L << widths(j)) - 1).as("bv"))): _*)
    val banded = hashes.select(col("doc_id"), col("dh"), explode(bands).as("b"))
      .select(col("doc_id"), col("dh"), col("b.band"), col("b.bv"))
    val a = banded.select(col("band"), col("bv"), col("doc_id").as("d1"), col("dh").as("h1"))
    val b = banded.select(col("band"), col("bv"), col("doc_id").as("d2"), col("dh").as("h2"))
    a.join(b, Seq("band", "bv")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("h1"), col("h2")).distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= DHashHammingMax)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy("d1", "d2")
  }

  // m08 (rows-only; spec: ≡ driver-side run-length recompute over m05's
  // frames): energy-based AUDIO SEGMENTATION — the VAD-style
  // silence-split every speech pipeline runs before transcription:
  // frames from m05's real RIFF/PCM chain are voiced iff energy clears
  // that recording's own mean (a per-doc adaptive threshold — absolute
  // thresholds break across gain levels), then contiguous voiced runs
  // become segments via gaps-and-islands (lag() marks run starts; a
  // running sum numbers the runs — the standard SQL islands idiom).
  // Both windows partition by doc_id and order by frame_idx: per-doc
  // frame counts are bounded by clip length, so nothing global exists
  // at any corpus size; the thresholds join broadcasts one row per doc.
  val m08_audio_segments: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val frames = m05_audio_frames(s, d)
      .select(col("doc_id"), col("frame_idx"), col("energy"))
    val thresh = frames.groupBy(col("doc_id"))
      .agg(avg(col("energy")).as("mean_energy"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames.join(broadcast(thresh), Seq("doc_id"))
      .withColumn("voiced", (col("energy") > col("mean_energy")).cast("int"))
      .withColumn("is_start",
        (col("voiced") === 1 &&
          coalesce(lag(col("voiced"), 1).over(w), lit(0)) === 0).cast("int"))
      .withColumn("seg", sum(col("is_start"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("voiced") === 1)
      .groupBy(col("doc_id"), col("seg").cast("int").as("seg_idx"))
      .agg(min("frame_idx").as("start_frame"),
        max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"),
        round(avg("energy"), 2).as("mean_energy"))
      .orderBy("doc_id", "seg_idx")
  }

  /** m09's fixed canvas and patch grid (32×32 px → 4×4 patches of 8×8,
    * shared with the spec's recompute).
    */
  val PatchCanvas = 32
  val PatchGrid = 4

  // m09 (rows-only; spec: ≡ independent per-patch recompute, 16 patches
  // per image): ViT-style PATCH EXTRACTION — the dataloader step between
  // m04's resize and a vision encoder: each PNG decodes through the REAL
  // codec chain (encode → imageio decode, m07's path), normalizes onto a
  // fixed 32×32 canvas, and splits into 4×4 non-overlapping 8×8 patches
  // with per-patch mean/std features (the patch-embedding statistics a
  // ViT's linear projection consumes). Entirely per-partition — pixels
  // never cross an executor boundary; output is bounded at 16 rows per
  // image whatever the source resolution, which is the point: patching
  // normalizes arbitrary media into fixed-shape tensors.
  val m09_patch_extract: Q = (s, d) => {
    import s.implicits._
    val g = PatchGrid; val c = PatchCanvas; val p = c / g
    mediaRecords(s, d)
      .filter(_.content_type == "image/png")
      .mapPartitions(_.flatMap { r =>
        val n = r.payload.length
        val w = math.ceil(math.sqrt(n.toDouble)).toInt.max(1)
        val h = (n + w - 1) / w
        val (pix, pw, ph) = decodePng(encodePng(r.payload, w, h))
        val canvas = resizeNN(pix, pw, ph, c, c)
        Iterator.range(0, g * g).map { idx =>
          val (py, px) = (idx / g, idx % g)
          var sum = 0L; var sum2 = 0L
          var y = 0
          while (y < p) {
            var x = 0
            while (x < p) {
              val v = canvas((py * p + y) * c + px * p + x) & 0xFF
              sum += v; sum2 += v.toLong * v
              x += 1
            }
            y += 1
          }
          val m = sum.toDouble / (p * p)
          val variance = sum2.toDouble / (p * p) - m * m
          (r.doc_id, idx, math.rint(m * 100) / 100,
            math.rint(math.sqrt(math.max(variance, 0)) * 100) / 100)
        }
      })
      .toDF("doc_id", "patch_idx", "mean_px", "std_px")
      .orderBy("doc_id", "patch_idx")
  }

  /** Little-endian TIFF with one IFD carrying the five classic EXIF-ish
    * tags (ImageWidth 256, ImageLength 257, Orientation 274, Make 271
    * ASCII, DateTime 306 ASCII); out-of-line values append after the
    * IFD exactly per the TIFF 6.0 layout. Construction-time only — the
    * walker below never sees these internals.
    */
  def encodeTiff(width: Int, height: Int, orientation: Int,
      make: String, dateTime: String): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      8 + 2 + 5 * 12 + 4 + make.length + 1 + dateTime.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8) // header → IFD@8
    bb.putShort(5) // entry count
    val dataStart = 8 + 2 + 5 * 12 + 4
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    }
    entry(256, 3, 1, width) // SHORT values sit left-justified in the field
    entry(257, 3, 1, height)
    entry(271, 2, make.length + 1, dataStart) // ASCII out of line
    entry(274, 3, 1, orientation)
    entry(306, 2, dateTime.length + 1, dataStart + make.length + 1)
    bb.putInt(0) // next-IFD = none
    bb.put(make.getBytes("US-ASCII")).put(0.toByte)
    bb.put(dateTime.getBytes("US-ASCII")).put(0.toByte)
    bb.array()
  }

  /** REAL TIFF IFD walk (TIFF 6.0 §2): validate the byte-order/magic
    * header, follow the IFD offset, iterate 12-byte entries decoding
    * tag/type/count and value-or-offset (SHORT inline left-justified
    * under little-endian; ASCII followed out of line, NUL-trimmed).
    * Returns (entries, width, height, orientation, make, dateTime) or
    * None on any structural violation — truncated, bad magic, offsets
    * past EOF.
    */
  def walkTiff(b: Array[Byte]): Option[(Int, Int, Int, Int, String, String)] = {
    if (b.length < 8 || b(0) != 'I'.toByte || b(1) != 'I'.toByte) return None
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.getShort(2) != 42) return None
    val ifd = bb.getInt(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = bb.getShort(ifd) & 0xFFFF
    if (ifd + 2 + n * 12 + 4 > b.length) return None
    var (w, h, o) = (-1, -1, -1)
    var make = ""; var dt = ""
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12
      val tag = bb.getShort(e) & 0xFFFF
      val typ = bb.getShort(e + 2) & 0xFFFF
      val count = bb.getInt(e + 4)
      def short = bb.getShort(e + 8) & 0xFFFF
      def ascii: Option[String] = {
        val off = bb.getInt(e + 8)
        if (off < 0 || off + count > b.length || count < 1) None
        else Some(new String(b, off, count - 1, "US-ASCII"))
      }
      (tag, typ) match {
        case (256, 3) => w = short
        case (257, 3) => h = short
        case (274, 3) => o = short
        case (271, 2) => ascii match { case Some(v) => make = v; case None => return None }
        case (306, 2) => ascii match { case Some(v) => dt = v; case None => return None }
        case _ => () // unknown tags are skippable by design
      }
      i += 1
    }
    Some((n, w, h, o, make, dt))
  }

  // m10 (rows-only; spec: encode→walk roundtrips every planted tag,
  // malformed bytes are rejected not crashed): EXIF/TIFF METADATA
  // EXTRACTION — the camera-metadata harvest step of an image-corpus
  // pipeline (orientation for the resize pass, timestamps for
  // near-dup-burst grouping, make/model for source mixing). Synthetic
  // TIFFs are planted deterministically per doc (no image libs in this
  // container — the WALKER is the real artifact, same discipline as
  // m03's ISO-BMFF walk); parsing is per-partition imperative code over
  // the payload bytes, driver sees only the final rows.
  val m10_exif_walk: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, source, nChars) =>
        val w = (nChars % 1920 + 16).toInt
        val h = (nChars % 1080 + 9).toInt
        val orient = (id % 8 + 1).toInt
        val dt = f"2024:01:${id % 28 + 1}%02d 12:${id % 60}%02d:00"
        val tiff = encodeTiff(w, h, orient, s"graft-$source", dt)
        walkTiff(tiff) match {
          case Some((n, pw, ph, po, make, pdt)) =>
            (id, n, pw, ph, po, make, pdt, true)
          case None => (id, -1, -1, -1, -1, "", "", false)
        }
      })
      .toDF("doc_id", "n_ifd_entries", "width", "height", "orientation",
        "make", "datetime", "parsed")
      .orderBy("doc_id")
  }

  /** m11's batch geometry — the training-feed contract. */
  val CollateBatch = 16
  val CollateDim = 32

  /** Rows a single collation window partition should carry (64 batches)
    * — the knob that makes the bucket count a DETERMINISTIC FUNCTION OF
    * CORPUS SIZE: window parallelism grows ∝ corpus instead of a
    * constant (the round-9 4-bucket cap meant 4-way max parallelism for
    * the corpus-wide rank at any scale).
    */
  val CollateBucketRows = CollateBatch * 64

  def collateBuckets(nImages: Long): Long =
    math.max(4L, (nImages + CollateBucketRows - 1) / CollateBucketRows)

  // m11 (rows-only; spec: geometry — every non-final batch exactly
  // full, padding only on the final batch per bucket, conservation,
  // checksum vs a driver recompute over the same codec chain): BATCH
  // COLLATION — the last hop before a training step: decoded images
  // resize to the fixed CollateDim² canvas (the per-sample transform —
  // m04's real codec chain) and group into fixed-size batches with the
  // short final batch ZERO-PADDED and a valid-count mask. Batch
  // membership is SEMANTIC, not physical: bucket = doc_id % buckets,
  // batch = rank-in-bucket div B via a window — deterministic under any
  // partitioning (a partition-grouped collate would change composition
  // with the cluster layout). Per-image stats are computed in
  // per-partition imperative code; the collate itself is a keyed agg.
  val m11_batch_collate: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val imgs = mediaRecords(s, d)
      .filter(_.content_type == "image/png")
      .map { r =>
        val n = r.payload.length
        val w = math.ceil(math.sqrt(n.toDouble)).toInt.max(1)
        val h = (n + w - 1) / w
        val (pix, pw, ph) = decodePng(encodePng(r.payload, w, h))
        val canvas = resizeNN(pix, pw, ph, CollateDim, CollateDim)
        var sum = 0L
        canvas.foreach(b => sum += (b & 0xFF))
        (r.doc_id, sum)
      }.toDF("doc_id", "px_sum")
      .persist() // consumed twice: the bucket-count sizing + the collate
    val out = collate(imgs, collateBuckets(imgs.count()))
      .localCheckpoint(true) // materialize so the persist can release
    imgs.unpersist()
    out
  }

  /** m11's collate step over any (doc_id, px_sum) frame: bucket =
    * doc_id % nb, batch = rank-in-bucket div B. Membership is a pure
    * function of (doc_id set, nb) — invariant under the input's
    * physical partitioning (spec-pinned) — and the rank window carries
    * ≤ ~CollateBucketRows rows per partition once nb scales with the
    * corpus.
    */
  def collate(imgs: DataFrame, nb: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy(pmod(col("doc_id"), lit(nb)))
      .orderBy("doc_id")
    imgs
      .withColumn("bucket", pmod(col("doc_id"), lit(nb)))
      .withColumn("batch_id",
        ((row_number().over(wRank) - 1) / CollateBatch).cast("int"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).cast("int").as("n_valid"),
        lit(CollateBatch).as("batch_size"),
        sum("px_sum").as("px_checksum"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .withColumn("n_padded", lit(CollateBatch) - col("n_valid"))
      .orderBy("bucket", "batch_id")
  }

  /** m12's shard byte budget (WebDataset-style tar-shard sizing — small
    * here so the sf0.01 fixture exercises multi-shard packing; a real
    * corpus uses ~1 GB shards, same arithmetic).
    */
  val MediaShardBudget = 1L << 12

  // m12: MEDIA SHARD PACKING — the WebDataset/tar-shard builder: media
  // records pack into fixed-byte-budget shards per content type, in
  // deterministic doc_id order (m06 packs by TOKEN budget for training
  // batches; shards are the STORAGE unit — sequential-read locality for
  // the data loader). The running byte offset is a TWO-LEVEL prefix
  // (q78's discipline, not one window per content type): block-local
  // cumulative sums are fully parallel (4096-doc blocks), block offsets
  // are a per-type prefix over the n/4096 block axis — no
  // data-proportional single partition anywhere.
  val m12_shard_pack: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sizes = mediaRecords(s, d)
      .map(r => (r.doc_id, r.content_type, r.payload.length.toLong))
      .toDF("doc_id", "content_type", "bytes")
      .withColumn("blk", (col("doc_id") / 4096).cast("long"))
    val wOff = Window.partitionBy("content_type").orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sizes.groupBy(col("content_type"), col("blk"))
      .agg(sum("bytes").as("bb"))
      .withColumn("blk_off", coalesce(sum("bb").over(wOff), lit(0L)))
      .select("content_type", "blk", "blk_off")
    val wIn = Window.partitionBy("content_type", "blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    sizes
      .withColumn("cum_in", coalesce(sum("bytes").over(wIn), lit(0L)))
      .join(offs, Seq("content_type", "blk"))
      .withColumn("shard",
        ((col("blk_off") + col("cum_in")) / MediaShardBudget).cast("int"))
      .groupBy(col("content_type"), col("shard"))
      .agg(count(lit(1)).as("n_items"), sum("bytes").as("shard_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("content_type", "shard")
  }

  /** Encode 3 consecutive payload bytes per pixel (R,G,B) as a REAL
    * color PNG via the JDK writer — m13's codec chain. Lossless: the
    * decode side recovers the planted bytes exactly.
    */
  def encodeRgbPng(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = 3 * (y * w + x)
        var c = 0
        while (c < 3) {
          raster.setSample(x, y, c,
            if (base + c < payload.length) payload(base + c) & 0xFF else 0)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL color decode: PNG bytes → (interleaved RGB samples, w, h). */
  def decodeRgb(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          out(3 * (y * w + x) + c) = raster.getSample(x, y, c).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    (out, w, h)
  }

  // m13 (rows-only; spec: ≡ driver recompute over the same codec chain,
  // PNG losslessness pinned): PER-CHANNEL NORMALIZATION STATISTICS —
  // the (mean, std) constants every vision training run bakes into its
  // transforms (ImageNet's 0.485/0.456/0.406 etc.), computed over the
  // corpus through a REAL color codec chain: payload bytes → RGB PNG →
  // imageio decode on the executor → per-image per-channel integer
  // partials (n, Σx, Σx², min, max). The partials are EXACT longs
  // (pixels are 0..255 ints), so the global 3-row rollup is
  // order-independent and the mean/std are single divisions — the
  // two-level-aggregation shape a 100 TB image corpus needs: pixels
  // never leave their input partition, only 3 rows of longs per image
  // cross the exchange.
  val m13_channel_stats: Q = (s, d) => {
    import s.implicits._
    val parts = imageCorpus(s, d).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val px = math.max(r.payload.length / 3, 1)
        val w = math.max(math.ceil(math.sqrt(px.toDouble)).toInt, 1)
        val h = (px + w - 1) / w
        val (rgb, _, _) = decodeRgb(encodeRgbPng(r.payload, w, h))
        (0 until 3).map { c =>
          var i = c; var sm = 0L; var sq = 0L
          var mn = 255; var mx = 0; var cnt = 0L
          while (i < rgb.length) {
            val v = rgb(i) & 0xFF
            sm += v; sq += v.toLong * v
            if (v < mn) mn = v; if (v > mx) mx = v
            cnt += 1; i += 3
          }
          (c, cnt, sm, sq, mn, mx)
        }
      }
    }.toDF("ch", "n", "sm", "sq", "mn", "mx")
    parts.groupBy("ch")
      .agg(sum("n").as("n_pixels"), sum("sm").as("sm"), sum("sq").as("sq"),
        min("mn").as("min_px"), max("mx").as("max_px"))
      .select(
        element_at(array(lit("r"), lit("g"), lit("b")), col("ch") + 1)
          .as("channel"),
        col("n_pixels"),
        round(col("sm") / col("n_pixels"), 4).as("mean_px"),
        round(sqrt(col("sq") / col("n_pixels") -
          pow(col("sm") / col("n_pixels"), 2)), 4).as("std_px"),
        col("min_px"), col("max_px"))
      .orderBy("channel")
  }

  /** m14's per-frame hashes through the real GIF + PNG codec chain:
    * payload → FrameLen slices → animated GIF roundtrip → dHash per
    * decoded frame. Shared with the spec's driver recompute.
    */
  def frameHashes(r: MediaRecord): Seq[Long] = {
    val n = r.payload.length
    val nFrames = (n + FrameLen - 1) / FrameLen
    val slices = (0 until nFrames).map { seq =>
      java.util.Arrays.copyOfRange(r.payload, seq * FrameLen,
        math.min((seq + 1) * FrameLen, n))
    }
    demuxGif(encodeGif(slices))
      .map(f => dHash(MediaRecord(r.doc_id, r.content_type, f)))
  }

  /** m14's cut threshold: consecutive-frame dHash hamming above this
    * marks a scene boundary.
    */
  val SceneCutHamming = 12

  // m14 (rows-only; spec: ≡ driver recompute through the same codec
  // chain, frame-count conservation): SCENE-CHANGE DETECTION — the
  // shot-boundary pass every video-training pipeline runs before
  // sampling frames (sample 1/scene, not 1/N frames — m03 samples
  // uniformly; this finds WHERE to sample): video payloads slice into
  // frames, roundtrip a REAL animated GIF (LZW decode on the
  // executor), each decoded frame dHashes (m07's hash), and a scene
  // cut fires where consecutive hamming distance exceeds the
  // threshold. Per-partition codec work, one bounded row per video
  // out — nothing but (doc_id, counts) crosses the exchange.
  val m14_scene_detect: Q = (s, d) => {
    import s.implicits._
    mediaRecords(s, d)
      .filter(_.content_type == "video/mp4")
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val hs = frameHashes(r)
          val deltas = hs.zip(hs.tail)
            .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
          val cuts = deltas.count(_ > SceneCutHamming)
          (r.doc_id, hs.length, 1 + cuts,
            if (deltas.isEmpty) 0 else deltas.max,
            if (deltas.isEmpty) 0.0
            else math.rint(deltas.sum.toDouble / deltas.length * 100) / 100)
        }
      }
      .toDF("doc_id", "n_frames", "n_scenes", "max_delta", "avg_delta")
      .orderBy("doc_id")
  }

  /** m15's canonical aspect buckets (name, width/height ratio). */
  val AspectBuckets: Seq[(String, Double)] = Seq(
    ("1:1", 1.0), ("4:3", 4.0 / 3), ("3:4", 3.0 / 4),
    ("16:9", 16.0 / 9), ("9:16", 9.0 / 16))

  // m15 (rows-only; spec: bucket assignment equals a driver recompute
  // from the planted geometry, buckets partition the image corpus,
  // padding in [0,1)): ASPECT-RATIO BUCKETING — the batching policy
  // multimodal trainers use so every batch shares one canvas
  // (SDXL-style bucketed sampling): each image lands in the nearest
  // canonical bucket by |log ar − log bucket_ar| and the report prices
  // each bucket's letterbox waste (1 − min/max ratio mismatch,
  // averaged). Geometry goes through the REAL PNG codec — plant a
  // doc-id-derived aspect, encode, DECODE, and measure the decoded
  // raster, never the plant. The decode is m02's mapPartitions batch
  // pass; everything after is a per-doc 5-row broadcast axis + one
  // keyed agg to the 5-bucket axis.
  val m15_aspect_bucket: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dims = mediaRecords(s, d)
      .filter(r => r.content_type.startsWith("image/"))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val n = r.payload.length
          val t = AspectBuckets((r.doc_id % 5).toInt)._2
          val h = math.max(1, math.round(math.sqrt(n / t)).toInt)
          val w = math.max(1, ((n + h - 1) / h).toInt)
          val (_, pw, ph) = decodePng(encodePng(r.payload, w, h))
          (r.doc_id, pw, ph)
        }
      }.toDF("doc_id", "w", "h")
    val bk = AspectBuckets.map { case (nm, v) =>
      struct(lit(nm).as("bucket"), lit(v).as("bar")) }
    dims.withColumn("ar", col("w") / col("h"))
      .withColumn("b", explode(array(bk: _*)))
      .withColumn("dist", abs(log(col("ar")) - log(col("b.bar"))))
      .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("dist"), col("b.bucket"))))
      .filter(col("rk") === 1)
      .withColumn("pad", lit(1.0) -
        least(col("ar"), col("b.bar")) / greatest(col("ar"), col("b.bar")))
      .groupBy(col("b.bucket").as("bucket"))
      .agg(count(lit(1)).as("n_images"),
        round(avg("pad"), 4).as("avg_pad"),
        round(min("ar"), 4).as("min_ar"),
        round(max("ar"), 4).as("max_ar"))
      .orderBy("bucket")
  }

  // m16 (rows-only; spec: bucket counts equal m15's, every canvas
  // uniform per bucket, pad fraction complements the content area,
  // deterministic checksums): LETTERBOX TRANSFORM — the step after
  // m15's bucketing and before m11's collation: each image decodes
  // (real PNG), NN-resizes to FIT its bucket's fixed canvas
  // preserving aspect, and zero-pads the remainder (top-left anchor)
  // — what an aspect-bucketed data loader materializes. All pixel
  // work is the m04 mapPartitions batch pattern; the report is one
  // keyed agg to the 5-bucket axis.
  val m16_letterbox: Q = (s, d) => {
    import s.implicits._
    val rows = mediaRecords(s, d)
      .filter(r => r.content_type.startsWith("image/"))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val n = r.payload.length
          val t = AspectBuckets((r.doc_id % 5).toInt)._2
          val h = math.max(1, math.round(math.sqrt(n / t)).toInt)
          val w = math.max(1, ((n + h - 1) / h).toInt)
          val (pix, pw, ph) = decodePng(encodePng(r.payload, w, h))
          val ar = pw.toDouble / ph
          val (bname, bar) = AspectBuckets.minBy { case (nm, v) =>
            (math.abs(math.log(ar) - math.log(v)), nm) }
          // fixed per-bucket canvas, area ≈ 48², aspect = bucket's
          val cw = math.max(1, math.round(48 * math.sqrt(bar)).toInt)
          val ch = math.max(1, math.round(48 / math.sqrt(bar)).toInt)
          val scale = math.min(cw.toDouble / pw, ch.toDouble / ph)
          val nw = math.max(1, math.floor(pw * scale).toInt)
          val nh = math.max(1, math.floor(ph * scale).toInt)
          val fit = resizeNN(pix, pw, ph, nw, nh)
          val canvas = new Array[Byte](cw * ch)
          var y = 0
          while (y < nh) {
            System.arraycopy(fit, y * nw, canvas, y * cw, nw)
            y += 1
          }
          (r.doc_id, bname, cw, ch, nw.toLong * nh,
            1.0 - nw.toLong * nh / (cw.toLong * ch).toDouble,
            fnvBytes(canvas, 0, canvas.length))
        }
      }.toDF("doc_id", "bucket", "canvas_w", "canvas_h", "content_px",
        "pad_fraction", "checksum")
    rows.groupBy("bucket")
      .agg(count(lit(1)).as("n_images"),
        max("canvas_w").as("canvas_w"), max("canvas_h").as("canvas_h"),
        round(avg("pad_fraction"), 4).as("avg_pad_fraction"),
        sum("content_px").as("total_content_px"),
        // xor fold: order-free, exact — a deterministic content probe
        expr("bit_xor(checksum)").as("checksum_xor"))
      .orderBy("bucket")
  }

  /** m17's 64-bit difference hash over a decoded grayscale raster:
    * NN-downsample to 9×8, bit i = (row r, col c+1) brighter than
    * (r, c) — the standard dHash (Krawetz). Deterministic: the PNG
    * roundtrip is lossless and NN sampling is pure integer math.
    */
  private[graft] def dHash(pix: Array[Byte], w: Int, h: Int): Long = {
    val g = resizeNN(pix, w, h, 9, 8)
    var hsh = 0L
    var i = 0
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if ((g(r * 9 + c + 1) & 0xFF) > (g(r * 9 + c) & 0xFF))
          hsh |= 1L << i
        i += 1; c += 1
      }
      r += 1
    }
    hsh
  }

  /** m17's hot-bucket cap: a band bucket larger than this is dropped
    * from candidate generation (d03's boilerplate guard — bounds the
    * per-bucket quadratic term). Uniform 16-bit band values exceed it
    * only past ~65M images per band; beyond that corpus the documented
    * move is wider bands (8×32-bit over a 256-bit pHash), trading
    * guaranteed recall radius for candidate volume.
    */
  val PhashBucketCap = 1000

  /** m17's per-image dHash frame (img_id, ph) over the image docs plus
    * planted perturbed twins: every doc_id % 7 == 0 image also emits a
    * copy with ONE body byte incremented (img_id = 2·doc_id+1 beside
    * the base 2·doc_id) — a controlled near-identical pair, since one
    * source byte moves at most a couple of 9×8 grid samples. Public so
    * the spec can replay the exact all-pairs ground truth driver-side.
    */
  def imagePhashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaRecords(s, d)
      .filter(r => r.content_type.startsWith("image/"))
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          val n = r.payload.length
          val h0 = math.max(1, math.floor(math.sqrt(n.toDouble)).toInt)
          val w0 = math.max(1, ((n + h0 - 1) / h0).toInt)
          val (pix, pw, ph) = decodePng(encodePng(r.payload, w0, h0))
          val base = (r.doc_id * 2, dHash(pix, pw, ph))
          val mlen = Magics(r.content_type).length
          if (r.doc_id % 7 == 0 && n > mlen) {
            val tw = r.payload.clone()
            val p = mlen + (r.doc_id % (n - mlen)).toInt
            tw(p) = (tw(p) + 1).toByte
            val (px2, w2, h2) = decodePng(encodePng(tw, w0, h0))
            Iterator(base, (r.doc_id * 2 + 1, dHash(px2, w2, h2)))
          } else Iterator(base)
        }
      }.toDF("img_id", "ph")
  }

  // m17 (rows-only; spec: exact all-pairs driver recompute of both
  // recall and candidate counts): PERCEPTUAL-HASH IMAGE NEAR-DUP —
  // the image-side twin of d03's text MinHash: dHash every image
  // (REAL PNG roundtrip, never the planted grid), then find pairs at
  // Hamming distance ≤ 3 WITHOUT an all-pairs join — the 64-bit hash
  // splits into 4×16-bit bands and a pair at distance ≤ 3 must agree
  // on at least one band (pigeonhole: 3 flipped bits touch ≤ 3 of 4
  // bands), so the band-bucket self-join has GUARANTEED recall at the
  // radius; random collisions are pruned by the exact bit_count
  // verify on the candidate set (d03's candidate→verify shape).
  // Buckets over PhashBucketCap drop (hot-bucket guard, documented
  // trade) — and the drop is OBSERVABLE: n_dropped_buckets in the
  // output row makes cap-induced recall loss loud (s24's n_evicted
  // discipline); recall is guaranteed only while it reads 0. The
  // planted byte-flip twins make the lane's recall observable on a
  // corpus whose organic images are all distinct.
  val m17_phash_neardup: Q = (s, d) => {
    val hashes = imagePhashes(s, d).persist()
    val bands = hashes.select(col("img_id"), col("ph"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"),
            expr(s"(ph >> ${b * 16}) & 65535").as("v"))): _*)).as("band"))
      .select(col("img_id"), col("ph"), col("band.b"), col("band.v"))
    val bucketCounts = bands.groupBy("b", "v")
      .agg(count(lit(1)).as("bn"))
    val okBuckets = bucketCounts.filter(col("bn") <= PhashBucketCap)
    val pruned = bands.join(okBuckets.select("b", "v"), Seq("b", "v"))
    val cand = pruned.as("x").join(pruned.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.img_id") < col("y.img_id"))
      .select(col("x.img_id").as("i1"), col("y.img_id").as("i2"),
        col("x.ph").as("p1"), col("y.ph").as("p2"))
      .distinct()
    val scored = cand
      .withColumn("dist", expr("bit_count(p1 ^ p2)"))
      .withColumn("near", col("dist") <= 3)
      .withColumn("twin",
        col("i2") === col("i1") + 1 && col("i1") % 2 === 0)
    val out = scored.agg(
        count(lit(1)).as("n_candidate_pairs"),
        sum(col("near").cast("long")).as("n_neardup_pairs"),
        sum((col("near") && col("twin")).cast("long")).as("n_twins_found"),
        round(avg(when(col("near"), col("dist"))), 4).as("mean_near_dist"))
      .crossJoin(broadcast(hashes.agg(
        count(lit(1)).as("n_images"),
        sum((col("img_id") % 2).cast("long")).as("n_twins_planted"))))
      .crossJoin(broadcast(bucketCounts.agg(
        coalesce(sum((col("bn") > PhashBucketCap).cast("long")), lit(0L))
          .as("n_dropped_buckets"))))
      .select("n_images", "n_twins_planted", "n_candidate_pairs",
        "n_neardup_pairs", "n_twins_found", "mean_near_dist",
        "n_dropped_buckets")
      .localCheckpoint(true)
    hashes.unpersist()
    out
  }

  /** m18's analysis bins over the 64-sample frame: DFT bins 1..32
    * (real input → bins above Nyquist are mirrors), banded low 1-5 /
    * mid 6-16 / high 17-32 (shared with the spec's recompute).
    */
  val SpectralBins = 32
  val SpectralLowHi = 5
  val SpectralMidHi = 16

  // m18 (rows-only; spec: ≡ independent per-frame DFT recompute,
  // Parseval power cross-check): SPECTRAL FEATURES — the frequency-
  // domain half of the audio front end m05's time-domain stats stop
  // short of (the precursor to mel filterbanks/MFCCs a speech-data
  // pipeline computes per frame): per 64-sample pre-emphasized frame,
  // a real 64-point DFT (naive O(N²) — N=64 makes that 4096 mults, far
  // cheaper than the container decode it follows), banded energies
  // (low/mid/high thirds of the 1..32 usable bins) and the spectral
  // centroid in bin units. The cos/sin tables build ONCE per partition
  // (mapPartitions — the m05 one-init-per-partition shape); pixels...
  // samples never cross an executor boundary, output is a bounded
  // 6-double row per frame. Pure per-row compute: scales linearly,
  // no shuffle anywhere until the final presentation sort.
  val m18_spectral_features: Q = (s, d) => {
    import s.implicits._
    val N = AudioFrameLen
    mediaRecords(s, d)
      .filter(r => r.content_type == "audio/wav")
      .mapPartitions { it =>
        // per-partition trig tables: cos/sin for all (k, i) once
        val cosT = Array.tabulate(SpectralBins + 1, N)((k, i) =>
          math.cos(2.0 * math.Pi * k * i / N))
        val sinT = Array.tabulate(SpectralBins + 1, N)((k, i) =>
          math.sin(2.0 * math.Pi * k * i / N))
        it.flatMap { r =>
          // shared with m05: same planted-layout decode, same loud
          // container-roundtrip validation
          val y = preEmphasize(decodeAudioPayload(r.payload))
          val nFrames = if (y.length < N) 0 else (y.length - N) / AudioHop + 1
          Iterator.range(0, nFrames).map { f =>
            val start = f * AudioHop
            var eLow = 0.0; var eMid = 0.0; var eHigh = 0.0
            var magSum = 0.0; var magWSum = 0.0
            var b = 1
            while (b <= SpectralBins) {
              var re = 0.0; var im = 0.0
              var i = 0
              while (i < N) {
                re += y(start + i) * cosT(b)(i)
                im -= y(start + i) * sinT(b)(i)
                i += 1
              }
              val p = re * re + im * im
              if (b <= SpectralLowHi) eLow += p
              else if (b <= SpectralMidHi) eMid += p
              else eHigh += p
              val mag = math.sqrt(p)
              magSum += mag; magWSum += b * mag
              b += 1
            }
            val centroid = if (magSum == 0.0) 0.0 else magWSum / magSum
            // energies round to integers (they are O(1e9+) sums of
            // squared magnitudes — fractional bits are DFT noise);
            // centroid to 4dp bin units
            (r.doc_id, f, math.rint(eLow), math.rint(eMid),
              math.rint(eHigh), math.rint(centroid * 1e4) / 1e4)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "e_low", "e_mid", "e_high", "centroid")
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, Q] = Map(
    "m18_spectral_features" -> m18_spectral_features,
    "m17_phash_neardup" -> m17_phash_neardup,
    "m16_letterbox" -> m16_letterbox,
    "m15_aspect_bucket" -> m15_aspect_bucket,
    "m14_scene_detect" -> m14_scene_detect,
    "m13_channel_stats" -> m13_channel_stats,
    "m12_shard_pack" -> m12_shard_pack,
    "m11_batch_collate" -> m11_batch_collate,
    "m10_exif_walk" -> m10_exif_walk,
    "m09_patch_extract" -> m09_patch_extract,
    "m08_audio_segments" -> m08_audio_segments,
    "m07_phash_neardup" -> m07_phash_neardup,
    "m06_pair_pack" -> m06_pair_pack,
    "m05_audio_frames" -> m05_audio_frames,
    "m01_binary_meta" -> m01_binary_meta,
    "m02_feature_extract" -> m02_feature_extract,
    "m03_frame_sample" -> m03_frame_sample,
    "m04_resize_augment" -> m04_resize_augment,
  )

  val oracle: Map[String, String] = Map(
    "m12_shard_pack" ->
      s"""WITH m AS (
        |  SELECT doc_id,
        |    CASE substr(source, 4)::INT % 5
        |      WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |      WHEN 2 THEN 'audio/wav' WHEN 3 THEN 'video/mp4'
        |      ELSE 'application/octet-stream' END AS content_type,
        |    octet_length(encode(text))
        |      + CASE substr(source, 4)::INT % 5
        |          WHEN 0 THEN 8 WHEN 1 THEN 3 WHEN 2 THEN 12 WHEN 3 THEN 12
        |          ELSE 0 END AS bytes
        |  FROM documents),
        |c AS (
        |  SELECT *, coalesce(sum(bytes) OVER (
        |    PARTITION BY content_type ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM m)
        |SELECT content_type, (cum // ${MediaShardBudget})::INT AS shard,
        |  count(*)::BIGINT AS n_items, sum(bytes)::BIGINT AS shard_bytes,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "m06_pair_pack" ->
      """WITH pairs AS (
        |  SELECT doc_id,
        |    CASE substr(source, 4)::INT % 5
        |      WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |      WHEN 2 THEN 'audio/wav' WHEN 3 THEN 'video/mp4'
        |      ELSE 'application/octet-stream' END AS content_type,
        |    len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS cap_toks,
        |    octet_length(encode(text))
        |      + CASE substr(source, 4)::INT % 5
        |          WHEN 0 THEN 8 WHEN 1 THEN 3 WHEN 2 THEN 12 WHEN 3 THEN 12
        |          ELSE 0 END AS media_bytes,
        |    doc_id // 64 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT *, coalesce(sum(cap_toks) OVER (
        |    PARTITION BY content_type, shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM pairs)
        |SELECT content_type, shard, (cum // 256)::INT AS batch,
        |  count(*)::BIGINT AS n_pairs,
        |  sum(cap_toks)::BIGINT AS caption_tokens,
        |  sum(media_bytes)::BIGINT AS media_bytes
        |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "m01_binary_meta" ->
      """WITH m AS (
        |  SELECT source,
        |    CASE substr(source, 4)::INT % 5
        |      WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
        |      WHEN 2 THEN 'audio/wav' WHEN 3 THEN 'video/mp4'
        |      ELSE 'application/octet-stream' END AS content_type,
        |    octet_length(encode(text))
        |      + CASE substr(source, 4)::INT % 5
        |          WHEN 0 THEN 8 WHEN 1 THEN 3 WHEN 2 THEN 12 WHEN 3 THEN 12
        |          ELSE 0 END AS payload_bytes
        |  FROM documents)
        |SELECT source, content_type, count(*)::BIGINT AS n_docs,
        |  sum(payload_bytes)::BIGINT AS total_bytes,
        |  max(payload_bytes)::BIGINT AS max_bytes,
        |  round(avg(payload_bytes), 4) AS avg_bytes
        |FROM m GROUP BY 1, 2 ORDER BY 1""".stripMargin,
  )
}
