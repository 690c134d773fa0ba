package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata, and per-item decode/feature
  * work runs BATCHED inside `mapPartitions` — one decoder instantiation per
  * partition, not per row (the Spark-side shape that matters at 100 TB:
  * payload bytes never pass through the driver, partitions bound memory, and
  * the decode stage pipelines with the scan).
  *
  * Two decoders ship behind the single [[MediaDecoder]] seam:
  * [[PpmDecoder]] is a REAL byte-level parser (P6 PPM header: magic,
  * `#` comments, dimensions, maxval, then raw pixel data; trailing
  * complete w·h frames count as an animation), and [[StubDecoder]] is the
  * deterministic length-derived stand-in kept for arbitrary non-media
  * payloads. A malformed payload yields a NULL `media_meta` struct (the
  * row survives — at 100 TB one corrupt object must not kill the job);
  * decoder bugs other than [[MediaFormatException]] still propagate.
  */
object Multimodal {

  /** Decoded media metadata (what a real image/audio probe would return). */
  final case class MediaMeta(byteLen: Int, width: Int, height: Int, frames: Int)

  /** A payload that is not valid media — mapped to a null meta struct by
    * [[withMediaMeta]], never to a job failure. */
  final class MediaFormatException(msg: String) extends RuntimeException(msg)

  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  /** Deterministic stand-in for a real decoder: metadata is a pure function
    * of the payload length, so tests and oracles can predict it. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      MediaMeta(n, n % 640, (n * 7) % 480, n % 30 + 1)
    }
  }

  /** Real binary P6 PPM parser: validates the magic, skips whitespace and
    * `#` comments, reads width/height/maxval, requires the single
    * whitespace separator before pixel data, and counts the COMPLETE
    * w·h·bytesPerPixel frames in the remaining bytes (≥ 2 frames = our
    * concatenated-animation convention; plain PPM has exactly one).
    * Throws [[MediaFormatException]] on anything malformed: bad magic,
    * non-positive or overflowing dimensions, maxval outside 1..65535,
    * missing separator, or pixel data shorter than one frame. */
  object PpmDecoder extends MediaDecoder {
    /** Full header parse, exposed for PIXEL-level stages ([[withPatchSums]]):
      * returns (meta, dataOffset, bytesPerSample) where dataOffset is the
      * first pixel byte and bytesPerSample derives from the PARSED maxval
      * (1 for maxval < 256, 2 otherwise) — never inferred from residual
      * byte counts, which trailing junk bytes would misclassify. */
    def decodeFull(payload: Array[Byte]): (MediaMeta, Int, Int) = {
      def fail(msg: String): Nothing = throw new MediaFormatException(msg)
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
        fail("not a P6 PPM: bad magic")
      var i = 2
      def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
      def skipWsAndComments(): Unit = {
        var done = false
        while (!done) {
          while (i < payload.length && isWs(payload(i))) i += 1
          if (i < payload.length && payload(i) == '#') {
            while (i < payload.length && payload(i) != '\n') i += 1
          } else done = true
        }
      }
      def readInt(what: String): Int = {
        skipWsAndComments()
        val start = i
        var v = 0L
        while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
          v = v * 10 + (payload(i) - '0')
          if (v > Int.MaxValue) fail(s"$what overflows int")
          i += 1
        }
        if (i == start) fail(s"missing $what")
        v.toInt
      }
      val w = readInt("width")
      val h = readInt("height")
      val maxval = readInt("maxval")
      if (w <= 0 || h <= 0) fail("non-positive dimensions")
      if (maxval <= 0 || maxval > 65535) fail("maxval out of 1..65535")
      if (i >= payload.length || !isWs(payload(i))) fail("missing header/data separator")
      i += 1 // the spec mandates exactly ONE whitespace byte before pixels
      val bytesPerSample = if (maxval < 256) 1 else 2
      val frameBytes = w.toLong * h * 3 * bytesPerSample
      val frames = ((payload.length - i) / frameBytes).toInt
      if (frames < 1) fail("truncated pixel data: no complete frame")
      (MediaMeta(payload.length, w, h, frames), i, bytesPerSample)
    }

    def decode(payload: Array[Byte]): MediaMeta = decodeFull(payload)._1

    /** Header parse exposed for PIXEL-level stages: (meta, dataOffset). */
    def decodeWithOffset(payload: Array[Byte]): (MediaMeta, Int) = {
      val (meta, off, _) = decodeFull(payload)
      (meta, off)
    }

    /** Sample `s` (0-based, 3 per pixel) of frame 1: the byte for 8-bit
      * images, the big-endian 2-byte value for 16-bit (the P6 spec).
      * Bounds overruns surface as [[MediaFormatException]] — a corrupt
      * object must degrade to the per-row failure path, never kill the
      * task with a raw ArrayIndexOutOfBoundsException. */
    def sampleAt(payload: Array[Byte], off: Int, bytesPerSample: Int, s: Int): Int = {
      val last = if (bytesPerSample == 1) off + s else off + 2 * s + 1
      if (s < 0 || last >= payload.length)
        throw new MediaFormatException(s"sample $s out of pixel data bounds")
      if (bytesPerSample == 1) payload(off + s) & 0xff
      else ((payload(off + 2 * s) & 0xff) << 8) | (payload(off + 2 * s + 1) & 0xff)
    }
  }

  /** Construct a REAL P6 PPM payload column whose header values derive
    * deterministically from `n` (any non-negative int column): width
    * `n%8+1`, height `n*7%6+1`, maxval 255, and `n%5+1` concatenated
    * frames of filler pixels. The bytes are genuinely parseable — the
    * oracle-checked queries build payloads with this, PARSE them with
    * [[PpmDecoder]], and let DuckDB replay only the construction
    * arithmetic, so the hash gate proves the parser recovers the header
    * from the actual bytes. Dimensions stay single-digit by construction
    * (header is always 11 bytes). */
  def ppmPayload(n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w = n % 8 + 1
    val h = (n * 7) % 6 + 1
    val f = n % 5 + 1
    concat(lit("P6\n"), w.cast("string"), lit(" "), h.cast("string"), lit("\n255\n"),
      call_function("repeat", lit("x"), (w * h * 3 * f).cast("int"))).cast("binary")
  }

  /** [[ppmPayload]] with TEXTURED pixels: byte i of the pixel blob is
    * 97 + (i mod 26) (a repeating alphabet), so pixel-level stages have
    * real per-position variation AND the oracle can still replay every
    * byte arithmetically. Same header construction as [[ppmPayload]]. */
  def ppmPayloadTextured(n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w = n % 8 + 1
    val h = (n * 7) % 6 + 1
    val f = n % 5 + 1
    val len = (w * h * 3 * f).cast("int")
    concat(lit("P6\n"), w.cast("string"), lit(" "), h.cast("string"), lit("\n255\n"),
      call_function("repeat", lit("abcdefghijklmnopqrstuvwxyz"),
        (len.cast("long") / 26L + 1L).cast("int")).substr(lit(1), len))
      .cast("binary")
  }

  /** ViT-style PATCH POOLING over REAL decoded pixels: parse the P6
    * header with [[PpmDecoder]], take the FIRST frame's bytes, and sum
    * byte intensities per (pw × ph) patch (channels pooled, ragged edge
    * patches keep their partial pixel sets) — the decode → patch → pool
    * preprocessing a vision encoder consumes, with sums kept integer so
    * downstream checks are exact. Emits width, height, n_patches and the
    * row-major per-patch sums as a CSV string (the q38 array convention);
    * malformed payloads yield NULLs, never job failure. Batched
    * mapPartitions — the justified seam for byte-level work. */
  def withPatchSums(
      df: DataFrame, binCol: String, pw: Int, ph: Int): DataFrame = {
    require(pw > 0 && ph > 0)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_patches", IntegerType),
      StructField("patch_sums", StringType),
      StructField("total_sum", LongType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(binIdx).asInstanceOf[Array[Byte]]
        val extra: Seq[Any] =
          if (payload == null) Seq(null, null, null, null, null)
          else try {
            val (meta, off, bps) = PpmDecoder.decodeFull(payload)
            val (w, h) = (meta.width, meta.height)
            val (pxAcross, pxDown) = ((w + pw - 1) / pw, (h + ph - 1) / ph)
            val sums = new Array[Long](pxAcross * pxDown)
            var s = 0
            val nSamples = w * h * 3
            while (s < nSamples) {
              val px = (s / 3) % w
              val py = (s / 3) / w
              val patch = (py / ph) * pxAcross + (px / pw)
              sums(patch) += PpmDecoder.sampleAt(payload, off, bps, s)
              s += 1
            }
            Seq(w, h, sums.length, sums.mkString(","), sums.sum)
          } catch {
            case _: MediaFormatException => Seq(null, null, null, null, null)
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(rowEnc)
    out
  }

  /** Construct a REAL P6 payload rendering a fixed 9×7 NORMALIZED-grid
    * texture at a per-variant scale: images with the same `imgId div 8`
    * (the group) share one md5-derived cell texture, rendered at
    * (9·sx)×(7·sy) pixels with sx, sy ∈ {1,2} chosen by the variant
    * `imgId mod 8` — the SAME image at different resolutions, which is
    * exactly what a perceptual hash must identify. Each variant also
    * perturbs ONE last-column grid cell (+10 on the byte), so within-group
    * pairs land at dHash Hamming ≤ 2, never exactly 0 for all pairs.
    * All bytes stay in 97..126 (single-byte ASCII — a string→binary cast
    * would UTF-8-expand anything ≥ 128). The construction is pure md5 +
    * integer arithmetic, so a DuckDB oracle can replay the DECODED cell
    * sums without ever seeing a byte (the q272 pattern: the hash match
    * then proves the byte-level parse + dHash geometry). */
  def ppmPayloadGrid(imgId: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.TextHash
    val id = imgId.cast("long")
    val v = pmod(id, lit(8L)).cast("int")
    val gid = shiftright(id, 3)
    val sx = (lit(1) + pmod(v, lit(2))).cast("int")
    val sy = (lit(1) + pmod(shiftright(v, 1), lit(2))).cast("int")
    val w = sx * lit(9)
    val h = sy * lit(7)
    val pRow = pmod(v, lit(7))
    def cellByte(gx: org.apache.spark.sql.Column, gy: org.apache.spark.sql.Column) =
      lit(97) +
        pmod(TextHash.md5Long(concat(lit("img:"), gid.cast("string"),
          lit(":"), gx.cast("string"), lit(":"), gy.cast("string"))), lit(20L)).cast("int") +
        when(gy === pRow && gx === lit(8), lit(10)).otherwise(lit(0))
    // one md5 per (gy, gx) grid cell — 63 per image; pixel replication is
    // pure repeat() so the HOF never re-evaluates a hash per byte
    val body = array_join(
      transform(sequence(lit(0), lit(6)), gy =>
        call_function("repeat",
          array_join(transform(sequence(lit(0), lit(8)), gx =>
            call_function("repeat",
              call_function("char", cellByte(gx, gy).cast("long")),
              sx * lit(3))), ""),
          sy)), "")
    concat(lit("P6\n"), w.cast("string"), lit(" "), h.cast("string"), lit("\n255\n"), body)
      .cast("binary")
  }

  /** Perceptual dHash over REAL decoded pixels: parse the P6 header, pool
    * the FIRST frame's byte intensities into a `gridW`×`gridH` cell grid
    * (ragged cells keep their exact byte counts), then emit one bit per
    * horizontally-adjacent cell pair — bit `gy·(gridW−1)+gx` is set iff
    * mean(gy,gx) > mean(gy,gx+1), compared exactly by integer
    * cross-multiplication (`sumA·cntB > sumB·cntA` — no float means, so
    * the fingerprint is bit-reproducible in any engine). The grid
    * normalization makes the hash RESOLUTION-INVariant: the same texture
    * rendered at 1× and 2× pools to proportional cell sums and identical
    * bits. Images smaller than the grid (an empty cell) and malformed
    * payloads yield a NULL fingerprint; the row survives. 16-bit images
    * (maxval ≥ 256) pool their big-endian SAMPLE values, so the same
    * picture stored 8- vs 16-bit fingerprints consistently. Cross-mult
    * stays in int64 for cells up to ~10⁸ pixels at 8 bit (255n·3n < 2⁶³;
    * ~257× fewer for 16-bit samples).
    * Default 9×7 grid → 56 bits: 4 lossless 14-bit pigeonhole chunks for
    * Hamming-≤3 blocking ([[ImageDedup]]), all within positive int64. */
  def withDHash(
      df: DataFrame, binCol: String, gridW: Int = 9, gridH: Int = 7): DataFrame = {
    require(gridW >= 2 && gridH >= 1, "grid must have at least one comparison")
    require((gridW - 1) * gridH <= 62, "fingerprint must fit positive int64")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("dhash", LongType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(binIdx).asInstanceOf[Array[Byte]]
        val extra: Seq[Any] =
          if (payload == null) Seq(null, null, null)
          else try {
            val (meta, off, bps) = PpmDecoder.decodeFull(payload)
            val (w, h) = (meta.width, meta.height)
            if (w < gridW || h < gridH) Seq(w, h, null)
            else {
              val sums = new Array[Long](gridW * gridH)
              val cnts = new Array[Long](gridW * gridH)
              var i = 0
              val frameLen = w * h * 3 // SAMPLES per frame (8- or 16-bit each)
              while (i < frameLen) {
                val px = (i / 3) % w
                val py = (i / 3) / w
                val cell = (py.toLong * gridH / h).toInt * gridW +
                  (px.toLong * gridW / w).toInt
                sums(cell) += PpmDecoder.sampleAt(payload, off, bps, i)
                cnts(cell) += 1
                i += 1
              }
              var fp = 0L
              var gy = 0
              while (gy < gridH) {
                var gx = 0
                while (gx < gridW - 1) {
                  val a = gy * gridW + gx
                  if (sums(a) * cnts(a + 1) > sums(a + 1) * cnts(a))
                    fp |= 1L << (gy * (gridW - 1) + gx)
                  gx += 1
                }
                gy += 1
              }
              Seq(w, h, fp)
            }
          } catch {
            case _: MediaFormatException => Seq(null, null, null)
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(rowEnc)
    out
  }

  /** [[ppmPayload]] with SCENE-structured frames — the video fixture for
    * per-frame stages: same md5-free header law (width `n%8+1`, height
    * `n*7%6+1`, `n%5+1` frames), but every frame's pixel bytes are the
    * CONSTANT `97 + md5("scn:" id ":" (f div 2)) % 26` — frames 0-1 share
    * scene 0, frames 2-3 scene 1, … so a scene CUT occurs exactly at every
    * even frame boundary (when the adjacent scenes' md5 bytes differ).
    * One md5 per scene (≤3 per clip); pixel replication is pure repeat().
    * Construction is md5 + integer arithmetic — a DuckDB oracle replays
    * the decoded per-frame sums without seeing a byte (the q272 proof
    * shape applied to the FRAME axis). */
  def ppmPayloadScenes(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.TextHash
    val idL = id.cast("long")
    val w = pmod(idL, lit(8L)) + 1L
    val h = pmod(idL * 7L, lit(6L)) + 1L
    val f = pmod(idL, lit(5L)) + 1L
    val frameLen = (w * h * 3L).cast("int")
    val body = array_join(
      transform(sequence(lit(0L), f - 1L), fr =>
        call_function("repeat",
          call_function("char",
            lit(97L) + pmod(TextHash.md5Long(concat(lit("scn:"),
              idL.cast("string"), lit(":"),
              shiftright(fr, 1).cast("string"))), lit(26L))),
          frameLen)), "")
    concat(lit("P6\n"), w.cast("string"), lit(" "), h.cast("string"),
      lit("\n255\n"), body).cast("binary")
  }

  /** [[ppmPayloadScenes]]'s near-duplicate sibling (video's q296): real
    * multi-frame P6 animations in GROUPS of 8 — gid = id div 8 picks the
    * scene sequence, v = id mod 8 the variant. Every variant renders the
    * SAME 112 group-keyed constant-intensity frames at a per-variant
    * RESOLUTION (width 3 or 6 — within-clip frame-sum comparisons are
    * resolution-invariant because every frame of a clip scales by the
    * same pixel count) plus a one-frame intensity perturbation (frame
    * v·13 gets +3). The temporal fingerprint compares DISJOINT frame
    * pairs (2i vs 2i+1), so one perturbed frame flips at most ONE bit —
    * pairwise fingerprint Hamming ≤ 2 within a group. Pure integer + md5
    * arithmetic: the oracle replays the frame constants without seeing a
    * byte, and the hash match proves the multi-frame decode. */
  def ppmPayloadScenesGrouped(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.TextHash
    val idL = id.cast("long")
    val v = pmod(idL, lit(8L))
    val gid = ((idL - v) / lit(8L)).cast("long")
    val w = (pmod(v, lit(2L)) + 1L) * 3L
    val h = lit(2L)
    val frameLen = (w * h * 3L).cast("int")
    val pf = v * 13L
    val body = array_join(
      transform(sequence(lit(0L), lit(111L)), fr =>
        call_function("repeat",
          call_function("char",
            lit(97L) + pmod(TextHash.md5Long(concat(lit("vfp:"),
              gid.cast("string"), lit(":"), fr.cast("string"))), lit(26L))
              + when(fr === pf, lit(3L)).otherwise(lit(0L))),
          frameLen)), "")
    concat(lit("P6\n"), w.cast("string"), lit(" "), h.cast("string"),
      lit("\n255\n"), body).cast("binary")
  }

  /** TEMPORAL fingerprint over real decoded frames — video's
    * [[withDHash]]: decode every frame's intensity sum and emit one bit
    * per DISJOINT frame pair, bit_i = (sum_{2i} > sum_{2i+1}). Within a
    * clip all frames share the pixel count, so the sum comparison IS the
    * mean comparison — resolution-invariant across re-encodings by
    * construction — and disjoint pairs mean a single corrupted/edited
    * frame flips at most one bit. NULL fingerprint for malformed or
    * shorter-than-2·nPairs clips (the row survives). */
  def withTemporalHash(df: DataFrame, binCol: String, nPairs: Int = 56): DataFrame = {
    require(nPairs >= 1 && nPairs <= 60)
    val outSchema = StructType(df.schema.fields :+
      StructField("temporal_hash", LongType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(binIdx).asInstanceOf[Array[Byte]]
        val fp: Any =
          if (payload == null) null
          else try {
            val (meta, off, bps) = PpmDecoder.decodeFull(payload)
            if (meta.frames < 2 * nPairs) null
            else {
              val spf = meta.width * meta.height * 3
              def frameSum(fr: Int): Long = {
                var sum = 0L; var i = 0
                while (i < spf) {
                  sum += PpmDecoder.sampleAt(payload, off, bps, fr * spf + i)
                  i += 1
                }
                sum
              }
              var hsh = 0L; var i = 0
              while (i < nPairs) {
                if (frameSum(2 * i) > frameSum(2 * i + 1)) hsh |= 1L << i
                i += 1
              }
              hsh
            }
          } catch {
            case _: MediaFormatException => null
          }
        Row.fromSeq(r.toSeq :+ fp)
      }
    }(rowEnc)
    out
  }

  /** Per-FRAME intensity sums over REAL decoded pixels — the stage a
    * scene-cut detector consumes: parse the P6 header, sum every frame's
    * sample values (8/16-bit aware), and emit ONE ROW PER FRAME
    * (doc fan-out ≈ frame count, no shuffle). Malformed payloads emit
    * zero rows here (a per-frame relation has no place for a null frame;
    * the row-surviving variant is [[withMediaMeta]]'s null struct). */
  def withFrameSums(df: DataFrame, binCol: String): DataFrame = {
    // both long: a mixed Int/Long Seq literal numeric-widens to Long (the
    // withAudioFeatures trap)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_sum", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.get(binIdx).asInstanceOf[Array[Byte]]
        if (payload == null) Iterator.empty
        else try {
          val (meta, off, bps) = PpmDecoder.decodeFull(payload)
          val samplesPerFrame = meta.width * meta.height * 3
          (0 until meta.frames).iterator.map { fr =>
            var sum = 0L
            var s = 0
            while (s < samplesPerFrame) {
              sum += PpmDecoder.sampleAt(payload, off, bps,
                fr * samplesPerFrame + s)
              s += 1
            }
            Row.fromSeq(r.toSeq ++ Seq(fr.toLong, sum))
          }
        } catch {
          case _: MediaFormatException => Iterator.empty
        }
      }
    }(rowEnc)
    out
  }

  /** Real canonical RIFF/WAVE PCM parser — the audio counterpart of
    * [[PpmDecoder]]. Accepts the 44-byte canonical layout (RIFF size +
    * WAVE + a 16-byte `fmt ` chunk + `data`), PCM format only, 16-bit
    * samples, any channel count / sample rate. Throws
    * [[MediaFormatException]] on malformed payloads: bad magic, non-PCM,
    * non-16-bit, zero rate/channels, or a data chunk longer than the
    * payload. Truncated trailing bytes (an incomplete final sample) are
    * rejected too — silently dropping them would desync channel
    * deinterleaving. */
  object WavDecoder {
    final case class WavMeta(
        byteLen: Int, sampleRate: Int, channels: Int, nSamples: Int)

    private def le16(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def le32(p: Array[Byte], i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    private def tag(p: Array[Byte], i: Int, s: String): Boolean =
      p(i) == s(0).toByte && p(i + 1) == s(1).toByte &&
        p(i + 2) == s(2).toByte && p(i + 3) == s(3).toByte

    /** Returns (meta, dataOffset). */
    def decodeWithOffset(payload: Array[Byte]): (WavMeta, Int) = {
      def fail(msg: String): Nothing = throw new MediaFormatException(msg)
      if (payload.length < 44) fail("shorter than a canonical WAV header")
      if (!tag(payload, 0, "RIFF")) fail("bad RIFF magic")
      if (!tag(payload, 8, "WAVE")) fail("bad WAVE tag")
      if (!tag(payload, 12, "fmt ")) fail("missing fmt chunk")
      if (le32(payload, 16) != 16L) fail("non-canonical fmt chunk size")
      if (le16(payload, 20) != 1) fail("not PCM")
      val channels = le16(payload, 22)
      val rate = le32(payload, 24)
      val bits = le16(payload, 34)
      if (channels < 1) fail("zero channels")
      if (rate < 1 || rate > Int.MaxValue) fail("bad sample rate")
      if (bits != 16) fail(s"only 16-bit PCM supported, got $bits")
      if (!tag(payload, 36, "data")) fail("missing data chunk")
      val dataLen = le32(payload, 40)
      if (dataLen > payload.length - 44L) fail("data chunk overruns payload")
      if (dataLen % (2L * channels) != 0) fail("truncated final sample frame")
      val nSamples = (dataLen / (2L * channels)).toInt
      (WavMeta(payload.length, rate.toInt, channels, nSamples), 44)
    }

    /** Channel-`c` value of sample frame `i`: 16-bit little-endian SIGNED. */
    def sampleAt(payload: Array[Byte], off: Int, channels: Int, i: Int, c: Int): Int = {
      val u = le16(payload, off + 2 * (i * channels + c))
      if (u >= 32768) u - 65536 else u
    }
  }

  /** Construct a REAL canonical WAV payload column (16-bit PCM mono,
    * 8 kHz) whose samples derive deterministically from `id`:
    * `n = (id mod 7)·160 + 400` sample frames (never a whole number of
    * 160-sample windows — the ragged tail is always exercised), segmented
    * into 160-sample (20 ms) chunks whose amplitude is md5-chosen — ~3/4
    * "loud" (±12000), ~1/4 near-silent (±40) — with sample `s` valued
    * `((s·37 + id·13) mod (2A+1)) − A`. Bytes are assembled as a hex
    * string (arbitrary byte values — a `char()`-based build would
    * UTF-8-expand anything ≥ 128) and `unhex`ed once; the per-segment md5
    * is bound through `zip_with` so it is never re-evaluated per sample
    * (the HOF-lambda trap). The construction is pure integer + md5
    * arithmetic, so a DuckDB oracle replays the decoded FEATURES without
    * ever seeing a byte — the hash match then proves the byte-level
    * header parse, LE sign decode, and window geometry. */
  def wavPayload(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.TextHash
    val idL = id.cast("long")
    val n = pmod(idL, lit(7L)) * 160L + 400L
    // ceil(n/160) without float division: subtract the remainder first
    // (n ≤ 1360 — the double round-trip would be exact too, but integer
    // arithmetic keeps the form obviously portable)
    val nSegI = (((n + 159L) - pmod(n + 159L, lit(160L))) / 160L).cast("long")
    def hx(b: org.apache.spark.sql.Column) =
      lpad(hex(b.cast("long")), 2, "0")
    def le16h(x: org.apache.spark.sql.Column) =
      concat(hx(x.bitwiseAND(lit(255L))), hx(shiftright(x.cast("long"), 8).bitwiseAND(lit(255L))))
    def le32h(x: org.apache.spark.sql.Column) =
      concat(hx(x.bitwiseAND(lit(255L))),
        hx(shiftright(x.cast("long"), 8).bitwiseAND(lit(255L))),
        hx(shiftright(x.cast("long"), 16).bitwiseAND(lit(255L))),
        hx(shiftright(x.cast("long"), 24).bitwiseAND(lit(255L))))
    val amps = transform(sequence(lit(0L), nSegI - 1L), seg =>
      when(pmod(TextHash.md5Long(concat(lit("aud:"), idL.cast("string"),
        lit(":"), seg.cast("string"))), lit(4L)) > 0, lit(12000L))
        .otherwise(lit(40L)))
    // zip_with binds `amps` once; the inner lambda sees the amplitude as a
    // VALUE, so each segment's md5 is computed exactly once
    val segHex = zip_with(amps, sequence(lit(0L), nSegI - 1L), (a, seg) =>
      array_join(transform(
        sequence(seg * 160L, least((seg + 1L) * 160L, n) - 1L), sIdx => {
          val v = pmod(sIdx * 37L + idL * 13L, a * 2L + 1L) - a
          val u = pmod(v + 65536L, lit(65536L))
          concat(hx(u.bitwiseAND(lit(255L))), hx(shiftright(u, 8)))
        }), ""))
    val dataLen = n * 2L
    val hdr = concat(lit("52494646"), le32h(dataLen + 36L), lit("57415645"),
      lit("666D7420"), le32h(lit(16L)), le16h(lit(1L)), le16h(lit(1L)),
      le32h(lit(8000L)), le32h(lit(16000L)), le16h(lit(2L)), le16h(lit(16L)),
      lit("64617461"), le32h(dataLen))
    unhex(concat(hdr, array_join(segHex, "")))
  }

  /** [[wavPayload]]'s near-duplicate sibling (the audio counterpart of
    * [[ppmPayloadGrid]]): REAL canonical WAVs in GROUPS of 8 — gid =
    * id div 8 picks the content, v = id mod 8 the variant. Every variant
    * renders the SAME md5-chosen per-segment waveform (56 segments × 160
    * samples, loud ±12000 / quiet ±40) at a per-variant GAIN
    * (sc = 1 + v mod 2 — an exact integer multiply, so |sample| ordering
    * and therefore every peak POSITION is bit-identical across gains)
    * plus a one-segment PHASE perturbation (segment v gets +17 on the
    * sample index), so variants of one group differ in at most one peak
    * position each — pairwise fingerprint Hamming ≤ 2. Pure integer + md5
    * arithmetic end to end: the oracle replays the decoded peak positions
    * without ever seeing a byte, and the hash match proves the byte-level
    * RIFF parse + LE sign decode + window scan. */
  def wavPayloadScaled(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.TextHash
    val idL = id.cast("long")
    // integer floor-div: Column `/` is FLOAT division — subtract the
    // remainder first so the quotient is exact, then narrow
    val v = pmod(idL, lit(8L))
    val gid = ((idL - v) / lit(8L)).cast("long")
    val sc = pmod(v, lit(2L)) + 1L
    val nSeg = 56
    val n = nSeg * 160L
    def hx(b: org.apache.spark.sql.Column) =
      lpad(hex(b.cast("long")), 2, "0")
    def le16h(x: org.apache.spark.sql.Column) =
      concat(hx(x.bitwiseAND(lit(255L))), hx(shiftright(x.cast("long"), 8).bitwiseAND(lit(255L))))
    def le32h(x: org.apache.spark.sql.Column) =
      concat(hx(x.bitwiseAND(lit(255L))),
        hx(shiftright(x.cast("long"), 8).bitwiseAND(lit(255L))),
        hx(shiftright(x.cast("long"), 16).bitwiseAND(lit(255L))),
        hx(shiftright(x.cast("long"), 24).bitwiseAND(lit(255L))))
    // group-keyed segment amplitude (NOT id-keyed: variants share content)
    val amps = transform(sequence(lit(0L), lit(nSeg - 1L)), seg =>
      when(pmod(TextHash.md5Long(concat(lit("afp:"), gid.cast("string"),
        lit(":"), seg.cast("string"))), lit(4L)) > 0, lit(12000L))
        .otherwise(lit(40L)))
    val segHex = zip_with(amps, sequence(lit(0L), lit(nSeg - 1L)), (a, seg) =>
      array_join(transform(sequence(seg * 160L, (seg + 1L) * 160L - 1L), sIdx => {
        val ph = when(seg === v, lit(17L)).otherwise(lit(0L))
        val base = pmod(sIdx * 37L + gid * 13L + ph, a * 2L + 1L) - a
        val u = pmod(base * sc + 65536L, lit(65536L))
        concat(hx(u.bitwiseAND(lit(255L))), hx(shiftright(u, 8)))
      }), ""))
    val dataLen = lit(n * 2L)
    val hdr = concat(lit("52494646"), le32h(dataLen + 36L), lit("57415645"),
      lit("666D7420"), le32h(lit(16L)), le16h(lit(1L)), le16h(lit(1L)),
      le32h(lit(8000L)), le32h(lit(16000L)), le16h(lit(2L)), le16h(lit(16L)),
      lit("64617461"), le32h(dataLen))
    unhex(concat(hdr, array_join(segHex, "")))
  }

  /** [[wavPayloadScaled]] as a mapPartitions BYTE builder — identical
    * integer + md5 arithmetic, ~70× faster: 5k × 18 KB clips through the
    * per-sample Catalyst hex-string path cost ~70 s at sf0.1 (45M
    * interpreted lambda evaluations, each building strings), while the
    * same formula in a JVM loop writes the bytes in under a second.
    * Byte-for-byte parity with the column form is spec-asserted
    * (AudioDedupSpec), and the oracle replays the FORMULA either way. */
  def withWavPayloadScaled(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("payload", org.apache.spark.sql.types.BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ buildWavScaled(r.getLong(idIdx))))
    }(rowEnc)
    out
  }

  private[operators] def buildWavScaled(id: Long): Array[Byte] = {
    val v = java.lang.Math.floorMod(id, 8L)
    val gid = (id - v) / 8L
    val sc = v % 2L + 1L
    val nSeg = 56; val n = nSeg * 160
    val dataLen = 2 * n
    val out = new Array[Byte](44 + dataLen)
    def tag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s(i).toByte; i += 1 }
    }
    def le16(off: Int, x: Int): Unit = {
      out(off) = (x & 0xff).toByte; out(off + 1) = ((x >> 8) & 0xff).toByte
    }
    def le32(off: Int, x: Long): Unit = {
      out(off) = (x & 0xff).toByte; out(off + 1) = ((x >> 8) & 0xff).toByte
      out(off + 2) = ((x >> 16) & 0xff).toByte; out(off + 3) = ((x >> 24) & 0xff).toByte
    }
    tag(0, "RIFF"); le32(4, dataLen + 36L); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16L); le16(20, 1); le16(22, 1)
    le32(24, 8000L); le32(28, 16000L); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, dataLen.toLong)
    var seg = 0
    while (seg < nSeg) {
      val hv = graft.functions.Md5LongUtil.hashBytes(
        s"afp:$gid:$seg".getBytes("UTF-8"))
      val a = if (java.lang.Math.floorMod(hv, 4L) > 0) 12000L else 40L
      val ph = if (seg.toLong == v) 17L else 0L
      var i = 0
      while (i < 160) {
        val sIdx = seg * 160L + i
        val base = java.lang.Math.floorMod(sIdx * 37L + gid * 13L + ph, a * 2L + 1L) - a
        val u = java.lang.Math.floorMod(base * sc + 65536L, 65536L).toInt
        le16(44 + 2 * (seg * 160 + i), u)
        i += 1
      }
      seg += 1
    }
    out
  }

  /** PEAK-CONSTELLATION fingerprint over real decoded PCM — the audio
    * analogue of [[withDHash]]: per 160-sample window, find the peak
    * (argmax |v|, FIRST index on ties — channel 0) and emit one bit for
    * which half of the window holds it; the first `nWindows` window bits
    * pack into one long. Peak POSITIONS are invariant under any positive
    * integer gain (|c·v| ordering == |v| ordering), so re-encoded /
    * amplitude-scaled copies fingerprint identically — the property the
    * near-dup pairing rides. NULL fingerprint for malformed or
    * shorter-than-nWindows payloads (the row survives — one corrupt
    * object must not kill a 100 TB job). Batched mapPartitions: the one
    * justified byte-level seam. */
  def withPeakHash(
      df: DataFrame, binCol: String,
      window: Int = 160, nWindows: Int = 56): DataFrame = {
    require(window > 1 && nWindows >= 1 && nWindows <= 60)
    val outSchema = StructType(df.schema.fields :+
      StructField("peak_hash", LongType))
    val binIdx = df.schema.fieldIndex(binCol)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(binIdx).asInstanceOf[Array[Byte]]
        val fp: Any =
          if (payload == null) null
          else try {
            val (meta, off) = WavDecoder.decodeWithOffset(payload)
            if (meta.nSamples < window.toLong * nWindows) null
            else {
              var h = 0L
              var w = 0
              while (w < nWindows) {
                var best = -1; var bestPos = 0
                var i = 0
                while (i < window) {
                  val a = math.abs(WavDecoder.sampleAt(
                    payload, off, meta.channels, w * window + i, 0))
                  if (a > best) { best = a; bestPos = i }
                  i += 1
                }
                if (bestPos >= window / 2) h |= 1L << w
                w += 1
              }
              h
            }
          } catch {
            case _: MediaFormatException => null
          }
        Row.fromSeq(r.toSeq :+ fp)
      }
    }(rowEnc)
    out
  }

  /** Audio feature extraction over REAL decoded PCM — the
    * silence-detection / level-analysis pass an audio-curation pipeline
    * runs per clip: parse the WAV header with [[WavDecoder]], fold channel
    * values (channel 0 for multi-channel clips), and emit integer features
    * per `window`-sample window: peak and mean absolute level, window
    * count, silent-window count (window max |v| < `silenceThresh`), and
    * the longest consecutive silent run. All integer (mean via `div`), so
    * downstream gates are exact on any engine. Malformed payloads yield
    * NULL features; the row survives (the 100 TB rule). Batched
    * mapPartitions — the justified byte-level seam. */
  def withAudioFeatures(
      df: DataFrame, binCol: String,
      window: Int = 160, silenceThresh: Int = 64): DataFrame = {
    require(window > 0 && silenceThresh >= 0)
    // all LongType: a mixed Int/Long Seq literal numeric-widens every
    // element to Long (Scala weak-lub), which the Row encoder rejects
    // against INT fields — uniform longs sidestep the trap entirely
    val outSchema = StructType(df.schema.fields ++ Seq(
      "sample_rate", "n_samples", "duration_ms", "peak_abs", "sum_abs",
      "mean_abs", "n_windows", "n_silent", "longest_silence")
      .map(StructField(_, LongType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(binIdx).asInstanceOf[Array[Byte]]
        val extra: Seq[Any] =
          if (payload == null) Seq.fill(9)(null)
          else try {
            val (meta, off) = WavDecoder.decodeWithOffset(payload)
            val n = meta.nSamples
            if (n == 0)
              Seq(meta.sampleRate.toLong, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
            else {
              var peak = 0; var sumAbs = 0L
              var nWin = 0; var nSilent = 0
              var run = 0; var longest = 0
              var winMax = 0
              var i = 0
              while (i < n) {
                val a = math.abs(WavDecoder.sampleAt(payload, off, meta.channels, i, 0))
                if (a > peak) peak = a
                if (a > winMax) winMax = a
                sumAbs += a
                i += 1
                if (i % window == 0 || i == n) {
                  nWin += 1
                  if (winMax < silenceThresh) {
                    nSilent += 1; run += 1
                    if (run > longest) longest = run
                  } else run = 0
                  winMax = 0
                }
              }
              Seq(meta.sampleRate.toLong, n.toLong,
                n.toLong * 1000L / meta.sampleRate, peak.toLong, sumAbs,
                sumAbs / n, nWin.toLong, nSilent.toLong, longest.toLong)
            }
          } catch {
            case _: MediaFormatException => Seq.fill(9)(null)
          }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(rowEnc)
    out
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false)))

  /** Append a `media_meta` struct by running `decoder` over the `binCol`
    * payloads, batched per partition. Null payloads yield a null struct. */
  def withMediaMeta(
      df: DataFrame,
      binCol: String,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("media_meta", metaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    val out: Dataset[Row] = df.mapPartitions { rows =>
      // per-partition decoder setup happens HERE (once), not per row
      val d = decoder
      rows.map { r =>
        val payload = r.get(binIdx).asInstanceOf[Array[Byte]]
        val meta =
          if (payload == null) null
          else try {
            val m = d.decode(payload)
            Row(m.byteLen, m.width, m.height, m.frames)
          } catch {
            // malformed media → null meta, row survives; any OTHER
            // exception is a decoder bug and still fails the task
            case _: MediaFormatException => null
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(rowEnc)
    out
  }

  /** Pure-column variant of the stub (codegen'd, no mapPartitions) — used by
    * the oracle-checked query; must agree with [[withMediaMeta]]+StubDecoder.
    */
  def stubMetaColumns(df: DataFrame, binCol: String): DataFrame = {
    val n = octet_length(col(binCol))
    df.withColumn("byte_len", n.cast("int"))
      .withColumn("width", (n % 640).cast("int"))
      .withColumn("height", ((n * 7) % 480).cast("int"))
      .withColumn("frames", (n % 30 + 1).cast("int"))
  }
}
