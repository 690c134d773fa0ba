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
      * returns (meta, dataOffset) where dataOffset is the first pixel byte. */
    def decodeWithOffset(payload: Array[Byte]): (MediaMeta, Int) = {
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
      val bytesPerPx = if (maxval < 256) 3 else 6
      val frameBytes = w.toLong * h * bytesPerPx
      val frames = ((payload.length - i) / frameBytes).toInt
      if (frames < 1) fail("truncated pixel data: no complete frame")
      (MediaMeta(payload.length, w, h, frames), i)
    }

    def decode(payload: Array[Byte]): MediaMeta = decodeWithOffset(payload)._1

    /** [[decodeWithOffset]] plus the bytes-per-SAMPLE (1 for maxval < 256,
      * 2 for 16-bit samples) — pixel-level stages must NOT assume 1
      * (a 16-bit image read as bytes pools garbage). */
    def decodeFull(payload: Array[Byte]): (MediaMeta, Int, Int) = {
      val (meta, off) = decodeWithOffset(payload)
      val frameBytes = (payload.length - off) / meta.frames
      ((meta, off, if (frameBytes == meta.width * meta.height * 3) 1 else 2))
    }

    /** Sample `s` (0-based, 3 per pixel) of frame 1: the byte for 8-bit
      * images, the big-endian 2-byte value for 16-bit (the P6 spec). */
    def sampleAt(payload: Array[Byte], off: Int, bytesPerSample: Int, s: Int): Int =
      if (bytesPerSample == 1) payload(off + s) & 0xff
      else ((payload(off + 2 * s) & 0xff) << 8) | (payload(off + 2 * s + 1) & 0xff)
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
