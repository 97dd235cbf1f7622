package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A closed user session: [start, end] with its event count. */
final case class ClosedSession(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

/** The open-session state carried between micro-batches. */
final case class OpenSession(startMs: Long, endMs: Long, nEvents: Long)

/** Stateful Structured-Streaming operators. The annotate matcher itself is
  * stateless, so custom state appears only in the analytics around the
  * stream — exactly two shapes a 100 TB/day pipeline needs:
  *
  *  - streaming exact dedup, state bounded by the watermark horizon
  *    (`dropDuplicatesWithinWatermark` on a content hash: 16 bytes of key
  *    state per doc within the horizon, not the text);
  *  - gap-based sessionization with [[ClosedSession]] emission on
  *    event-time timeout (`flatMapGroupsWithState`): state is one
  *    [[OpenSession]] per active user, evicted the moment the watermark
  *    passes its gap — memory scales with concurrently-active users, not
  *    stream length.
  */
object StatefulOps {

  /** Streaming exact dedup: emit the first occurrence of each distinct
    * `textCol` value; duplicates arriving within the watermark horizon are
    * dropped. State is the 128-bit content hash, evicted by watermark.
    * (On a batch frame use [[graft.ops.Dedup.exact]] instead.)
    */
  def streamingDedup(df: DataFrame, textCol: String, tsCol: String,
      delay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, delay)
      .withColumn("__text_md5", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("__text_md5")
      .drop("__text_md5")

  /** Gap-based streaming sessionization: a session closes when no event
    * arrives for `gapSec` seconds (event time). Closed sessions are
    * emitted once, when the watermark passes session end + gap (or when a
    * later in-stream event proves the gap). Equivalent batch semantics:
    * the lag + cumulative-sum sessionization of `SparkEntry.q_sessions`.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      gapSec: Long, delay: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = df.sparkSession
    import spark.implicits._
    val gapMs = gapSec * 1000L
    df.select(col(userCol).cast("long").as("user"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", delay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (user: Long, events: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[OpenSession]) => {
          if (events.isEmpty && state.hasTimedOut) {
            // watermark passed end + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.startMs, s.endMs, s.nEvents))
          } else {
            // micro-batch iterators are unordered: sort, then fold gaps
            val times = events.map(_._2.getTime).toArray
            java.util.Arrays.sort(times)
            val closed = Vector.newBuilder[ClosedSession]
            var open = state.getOption
            times.foreach { t =>
              open match {
                case Some(s) if t - s.endMs <= gapMs =>
                  open = Some(OpenSession(s.startMs, math.max(s.endMs, t), s.nEvents + 1))
                case Some(s) =>
                  closed += ClosedSession(user, s.startMs, s.endMs, s.nEvents)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the event-time watermark passes the gap horizon
              state.setTimeoutTimestamp(s.endMs + gapMs + 1)
            }
            closed.result().iterator
          }
        })
  }
}
