package graft.engine

import scala.collection.mutable

/** Aho-Corasick automaton over TOKEN TERMS (not characters) for the
  * exact-adjacency subset of the dictionary: non-fuzzy phrase queries
  * with slop 0 — the dominant case in reference-style dictionaries
  * (plain phrases / names).
  *
  * One automaton pass per document field finds every occurrence of every
  * such query in O(tokens + matches), independent of dictionary size —
  * the probing path (positions lookup per candidate) remains only for
  * slop>0 / span / fuzzy queries. Emitted spans are identical to the
  * slop-0 phrase matcher: (endPos - len + 1, endPos) for each occurrence.
  *
  * Built once on the driver at compile time; immutable and thread-safe
  * afterwards. The representation is deliberately flat — an interned
  * term table plus CSR int arrays (edge lists sorted by term id, O(1)
  * root transitions) — so the broadcast (de)serializes as a handful of
  * primitive arrays instead of a forest of per-node hash maps: at 80k
  * patterns that is the difference between milliseconds and seconds per
  * executor fetch, and executors under storage-memory pressure may
  * refetch after eviction.
  */
final class AhoCorasick private (
    private val termList: Array[String],
    private val rootNext: Array[Int], // termId -> next node from root, -1 if none
    private val edgeStart: Array[Int], // CSR offsets per node (n+1)
    private val edgeTerm: Array[Int], // sorted term ids per node
    private val edgeNext: Array[Int], // parallel next-node ids
    val fail: Array[Int],
    val outputs: Array[Array[Int]], // per node: query idxs ending here
    val patternLen: Array[Int] // per query idx position in `outputs`: its term count
) extends Serializable {

  /** Rebuilt lazily after deserialization — ships as Array[String]. */
  @transient private lazy val termIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](termList.length * 2)
    var i = 0
    while (i < termList.length) { m.put(termList(i), Integer.valueOf(i)); i += 1 }
    m
  }

  /** goto(s, tid): next node or -1. Root is O(1); other nodes binary
    * search their (small) sorted edge list.
    */
  private def step(s: Int, tid: Int): Int = {
    if (s == 0) return rootNext(tid)
    var lo = edgeStart(s)
    var hi = edgeStart(s + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val t = edgeTerm(mid)
      if (t == tid) return edgeNext(mid)
      else if (t < tid) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Walk the term sequence; invoke `emit(queryIdx, startPos, endPos)`
    * (token positions, inclusive) for every occurrence.
    */
  def run(terms: Array[String], emit: (Int, Int, Int) => Unit): Unit = {
    var state = 0
    var pos = 0
    while (pos < terms.length) {
      val tidObj = termIds.get(terms(pos))
      if (tidObj == null) state = 0 // term labels no edge anywhere
      else {
        val tid = tidObj.intValue()
        var s = state
        var next = -1
        while (next < 0) {
          val g = step(s, tid)
          if (g >= 0) next = g
          else if (s == 0) next = 0
          else s = fail(s)
        }
        state = next
      }
      // outputs along the suffix chain
      var o = state
      while (o != 0) {
        val out = outputs(o)
        var i = 0
        while (i < out.length) {
          val q = out(i)
          emit(q, pos - patternLen(q) + 1, pos)
          i += 1
        }
        o = fail(o)
      }
      pos += 1
    }
  }
}

object AhoCorasick {

  /** Build from (queryIdx, terms) patterns. Construction uses per-node
    * hash maps (driver-side only), then compacts to the CSR form.
    */
  def build(patterns: Seq[(Int, Array[String])]): AhoCorasick = {
    val gotoMaps = mutable.ArrayBuffer(new java.util.HashMap[String, java.lang.Integer]())
    val outBufs = mutable.ArrayBuffer(new mutable.ArrayBuilder.ofInt)
    val maxQ = if (patterns.isEmpty) 0 else patterns.map(_._1).max + 1
    val patternLen = new Array[Int](maxQ)
    patterns.foreach { case (qIdx, terms) =>
      patternLen(qIdx) = terms.length
      var node = 0
      terms.foreach { t =>
        val nxt = gotoMaps(node).get(t)
        if (nxt == null) {
          gotoMaps += new java.util.HashMap[String, java.lang.Integer]()
          outBufs += new mutable.ArrayBuilder.ofInt
          gotoMaps(node).put(t, Integer.valueOf(gotoMaps.length - 1))
          node = gotoMaps.length - 1
        } else node = nxt.intValue()
      }
      outBufs(node) += qIdx
    }
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    // BFS fail links
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).forEach((_, v) => { fail(v) = 0; queue += v })
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).forEach { (term, v) =>
        queue += v
        var f = fail(u)
        var target = 0
        var done = false
        while (!done) {
          val g = gotoMaps(f).get(term)
          if (g != null && g.intValue() != v) { target = g.intValue(); done = true }
          else if (f == 0) { done = true }
          else f = fail(f)
        }
        fail(v) = target
        // merge suffix outputs lazily at run time via the fail chain
      }
    }
    // intern edge-label terms, compact transitions to CSR
    val termIdx = new java.util.HashMap[String, Integer]()
    val termBuf = mutable.ArrayBuffer.empty[String]
    gotoMaps.foreach(_.forEach { (t, _) =>
      if (!termIdx.containsKey(t)) { termIdx.put(t, Integer.valueOf(termBuf.length)); termBuf += t }
    })
    val edgeStart = new Array[Int](n + 1)
    var total = 0
    var i = 0
    while (i < n) { edgeStart(i) = total; total += gotoMaps(i).size(); i += 1 }
    edgeStart(n) = total
    val edgeTerm = new Array[Int](total)
    val edgeNext = new Array[Int](total)
    i = 0
    while (i < n) {
      val pairs = mutable.ArrayBuffer.empty[(Int, Int)]
      gotoMaps(i).forEach((t, v) => pairs += ((termIdx.get(t).intValue(), v.intValue())))
      val sorted = pairs.sortBy(_._1)
      var j = 0
      while (j < sorted.length) {
        edgeTerm(edgeStart(i) + j) = sorted(j)._1
        edgeNext(edgeStart(i) + j) = sorted(j)._2
        j += 1
      }
      i += 1
    }
    val rootNext = Array.fill(termBuf.length)(-1)
    gotoMaps(0).forEach((t, v) => rootNext(termIdx.get(t).intValue()) = v.intValue())
    new AhoCorasick(termBuf.toArray, rootNext, edgeStart, edgeTerm, edgeNext,
      fail, outBufs.map(_.result()).toArray, patternLen)
  }
}
