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
  * The actual media decode is STUBBED (this container has no image/audio
  * libs): [[StubDecoder]] derives deterministic fake metadata from the
  * payload bytes. The seam to swap in a real decoder is the single
  * [[MediaDecoder]] function; everything around it — schema, batching,
  * partitioning, null handling — is real and tested.
  */
object Multimodal {

  /** Decoded media metadata (what a real image/audio probe would return). */
  final case class MediaMeta(byteLen: Int, width: Int, height: Int, frames: Int)

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
          else {
            val m = d.decode(payload)
            Row(m.byteLen, m.width, m.height, m.frames)
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
