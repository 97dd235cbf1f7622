package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.{AccumulatorV2, LongAccumulator}

/** Monotone MAX accumulator: `value` is the largest Long ever added
  * across all tasks (Long.MinValue when nothing was added — callers
  * that want "0 until observed" should add a 0 floor themselves).
  * Spark ships sum/list accumulators only; per-key state-size bounds
  * are max-shaped, so [[TemporalAsofMetrics]] needs this. At-least-once
  * caveat-free: a replayed task re-adding the same observation cannot
  * move a max, so (unlike a sum) the reading is exact even across task
  * retries.
  */
final class MaxAccumulator extends AccumulatorV2[java.lang.Long, java.lang.Long] {
  private var m: Long = Long.MinValue
  override def isZero: Boolean = m == Long.MinValue
  override def copy(): MaxAccumulator = {
    val c = new MaxAccumulator
    c.m = m
    c
  }
  override def reset(): Unit = m = Long.MinValue
  override def add(v: java.lang.Long): Unit = m = math.max(m, v)
  def add(v: Long): Unit = m = math.max(m, v)
  override def merge(other: AccumulatorV2[java.lang.Long, java.lang.Long]): Unit =
    other match {
      case o: MaxAccumulator => m = math.max(m, o.m)
      case _ => throw new UnsupportedOperationException(
        s"cannot merge ${other.getClass.getName} into MaxAccumulator")
    }
  override def value: java.lang.Long = m
}

/** Production observability for [[StatefulOps.streamAsofTemporal]]
  * (r15 board #3): the operator's scale-safety claim — per key the
  * version history prunes to ONE at-or-before the watermark plus the
  * not-yet-effective futures, and pending events stay bounded by the
  * `delay` horizon — was design-proven but invisible at runtime. These
  * named accumulators surface it per trigger in the Spark UI and
  * programmatically, WITHOUT reading the state store:
  *
  *  - `versionsKeptMax` — max versions retained by any (key, trigger)
  *    AFTER pruning: stays ≈ 1 + futures-in-horizon when pruning works,
  *    grows with the full update history when it doesn't;
  *  - `pendingMax` — max events buffered by any (key, trigger) await­
  *    ing their watermark seal (bounded by the key's event rate ×
  *    `delay`);
  *  - `sealedEvents` — events resolved and emitted (sum; task retries
  *    can over-count — trend signal, not an exactly-once ledger);
  *  - `ttlEvictions` — idle-TTL state removals (sum, same caveat);
  *  - `newKeys` — first-ever-seen state keys (sum): a monotone climb
  *    on a supposed dimension key space is the misuse
  *    [[StateGrowthWatch]] warns about.
  *
  * KEYS HELD needs no accumulator: Spark already reports the state
  * row count per trigger as
  * `query.lastProgress.stateOperators[0].numRowsTotal`.
  *
  * Max readings are EXACT across task retries (see [[MaxAccumulator]]);
  * sums are at-least-once, like every Spark accumulator in a
  * non-result stage. Register once per query via
  * [[TemporalAsofMetrics.register]] and pass to `streamAsofTemporal`;
  * sharing one bundle across two queries folds their numbers together.
  */
final case class TemporalAsofMetrics(
    versionsKeptMax: MaxAccumulator, pendingMax: MaxAccumulator,
    sealedEvents: LongAccumulator, ttlEvictions: LongAccumulator,
    newKeys: LongAccumulator) extends Serializable {
  /** versionsKeptMax with a 0 floor (nothing observed yet). */
  def maxVersionsKept: Long = math.max(0L, versionsKeptMax.value)
  /** pendingMax with a 0 floor (nothing observed yet). */
  def maxPending: Long = math.max(0L, pendingMax.value)
}

object TemporalAsofMetrics {
  /** New bundle of NAMED accumulators (names prefixed `graft.temporal.
    * <name>.` — named accumulators appear per-stage in the Spark UI,
    * the production surface the r15 board asked for).
    */
  def register(spark: SparkSession, name: String): TemporalAsofMetrics = {
    val sc = spark.sparkContext
    def max(suffix: String): MaxAccumulator = {
      val a = new MaxAccumulator
      sc.register(a, s"graft.temporal.$name.$suffix")
      a
    }
    TemporalAsofMetrics(
      versionsKeptMax = max("versionsKeptMax"),
      pendingMax = max("pendingMax"),
      sealedEvents = sc.longAccumulator(s"graft.temporal.$name.sealedEvents"),
      ttlEvictions = sc.longAccumulator(s"graft.temporal.$name.ttlEvictions"),
      newKeys = sc.longAccumulator(s"graft.temporal.$name.newKeys"))
  }
}

/** Advisory listener for the idle-TTL misuse (r15 board #7, stretch):
  * `idleTtlSec = 0` (keep state forever) is the right default for a
  * DIMENSION key space, but a caller who keys
  * [[StatefulOps.streamAsofTemporal]] by an unbounded id (per-session
  * ids, event ids) grows state monotonically until the job dies —
  * silently, because each trigger is individually healthy. This watch
  * WARNs once per query when its total state row count has STRICTLY
  * GROWN for `nTriggers` consecutive progress events.
  *
  * Scope and honesty: a `StreamingQueryProgress` does not say which
  * operator the state rows belong to, so the watch observes every
  * stateful query in the session it is registered on (queries with no
  * state operators are ignored) — the WARN names the query id and the
  * knob, and a query whose state legitimately grows for that long
  * (e.g. a long cold-start backfill) gets one spurious WARN and then
  * silence. [[StatefulOps.streamAsofTemporal]] arms one watch per
  * session automatically when called with `idleTtlSec = 0`.
  *
  * The decision core is [[observe]] — pure bookkeeping, unit-testable
  * without a streaming query.
  */
final class StateGrowthWatch(nTriggers: Int = StateGrowthWatch.defaultTriggers)
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  require(nTriggers >= 2, s"StateGrowthWatch: nTriggers must be >= 2, got $nTriggers")
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  // per query: (last total, consecutive strict growths, already warned)
  private val seen =
    scala.collection.mutable.Map.empty[java.util.UUID, (Long, Int, Boolean)]

  /** Record one progress observation; returns true when THIS call
    * crossed the threshold and emitted the WARN.
    */
  def observe(queryId: java.util.UUID, totalStateRows: Long): Boolean =
    synchronized {
      val (last, streak, warned) = seen.getOrElse(queryId, (Long.MinValue, 0, false))
      val grew = last != Long.MinValue && totalStateRows > last
      val s = if (grew) streak + 1 else 0
      val fire = !warned && s >= nTriggers
      seen(queryId) = (totalStateRows, s, warned || fire)
      if (fire) StateGrowthWatch.log.warn(
        s"streaming query $queryId state row count grew $s triggers in a " +
          s"row (now $totalStateRows) with no idle TTL configured — if " +
          "this is a graft streamAsofTemporal keyed by an unbounded id " +
          "space, pass idleTtlSec > 0 so quiet keys evict; a genuinely " +
          "growing dimension can ignore this one-time warning")
      fire
    }

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val ops = e.progress.stateOperators
    if (ops != null && ops.nonEmpty)
      observe(e.progress.id, ops.map(_.numRowsTotal).sum)
  }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    synchronized { seen.remove(e.id); () }
}

object StateGrowthWatch {
  /** 12 consecutive growth triggers: long enough that a bursty-but-
    * bounded key space (which plateaus or dips as keys repeat) never
    * strings together, short enough to fire within minutes on default
    * trigger cadences.
    */
  val defaultTriggers = 12
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[StateGrowthWatch])
  // one armed watch per session is enough — it observes every query
  private val armed =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, StateGrowthWatch]())

  /** Arm one session-wide watch (idempotent per session). */
  def armOnce(spark: SparkSession, nTriggers: Int = defaultTriggers): Unit =
    armed.synchronized {
      if (!armed.containsKey(spark)) {
        val w = new StateGrowthWatch(nTriggers)
        spark.streams.addListener(w)
        armed.put(spark, w)
      }
    }
}
