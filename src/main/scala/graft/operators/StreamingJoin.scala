package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: correlate two event streams on
  * a key within a bounded time window (e.g. "purchase within an hour before
  * each error"). The time-range condition bounds the join state on both
  * sides — with watermarks, the engine evicts buffered rows once they can
  * no longer match, so state stays proportional to the window, not the
  * stream. Works identically on batch inputs (where it is a plain
  * conditional join).
  */
object StreamingJoin {

  /** `left` events joined to `right` events of the same `keyCol` whose
    * timestamp falls in `[left.ts - lookbackSeconds, left.ts]`. Both inputs
    * need event-time columns named `tsL`/`tsR` respectively. */
  def withinLookback(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsL: String,
      tsR: String,
      lookbackSeconds: Long,
      watermark: String = "1 hour"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(tsL, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(tsR, watermark) else right
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(tsR) >= l(tsL) - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        r(tsR) <= l(tsL))
  }
}
