package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the online twin of the batch range join
  * (q39: clicks within a horizon before each purchase). Two live streams
  * are joined on user plus an event-time RANGE condition; the range is
  * what makes this runnable forever:
  *
  *  - without a time bound, a stream-stream inner join must keep EVERY
  *    past row of both sides in state (any future row might match);
  *  - with watermarks on both inputs and the `[purchaseTs - horizon,
  *    purchaseTs]` constraint, Spark derives per-side state watermarks —
  *    clicks older than (watermark − horizon) and purchases older than
  *    the watermark can never match a future row and are evicted, so
  *    state is bounded by horizon × arrival rate, not stream length.
  *
  * The optional left-outer variant additionally emits purchases that
  * attracted NO click in the horizon (organic conversions) — these rows
  * can only be declared once the click-side watermark has passed their
  * window, so they surface with watermark latency, the structural price
  * of a correct streaming outer join.
  *
  * Reference behavior mirrored: the monitoring queries' correlation of
  * pipeline events within sliding windows (SURVEY §2C); semantics match
  * the batch q39 range join on the same inputs.
  */
object StreamingJoins {

  final case class Click(clickId: Long, userId: Long, ts: Timestamp)

  final case class Purchase(purchaseId: Long, userId: Long, amount: Double,
                            ts: Timestamp)

  /** Pairs every purchase with each same-user click in the
    * `horizonSec`-second window ending at the purchase. `leftOuter`
    * keeps click-less purchases (null click columns).
    *
    * Output: (purchaseId, userId, amount, purchaseTs, clickId, clickTs).
    */
  def clickAttribution(clicks: Dataset[Click], purchases: Dataset[Purchase],
                       horizonSec: Long = 600L,
                       watermarkDelay: String = "10 minutes",
                       leftOuter: Boolean = false): DataFrame = {
    require(horizonSec > 0)
    val c = clicks.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("clickId"), col("userId").as("c_userId"),
        col("ts").as("clickTs"))
    val p = purchases.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("purchaseId"), col("userId"), col("amount"),
        col("ts").as("purchaseTs"))
    val cond = col("userId") === col("c_userId") &&
      col("clickTs") >= col("purchaseTs") - expr(s"INTERVAL $horizonSec SECOND") &&
      col("clickTs") <= col("purchaseTs")
    p.join(c, cond, if (leftOuter) "left_outer" else "inner")
      .select(col("purchaseId"), col("userId"), col("amount"),
        col("purchaseTs"), col("clickId"), col("clickTs"))
  }
}
