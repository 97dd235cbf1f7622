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
  * afterwards (plain arrays + per-node hash maps), broadcast with the
  * rest of the compiled dictionary.
  */
final class AhoCorasick private (
    val goto_ : Array[java.util.HashMap[String, java.lang.Integer]],
    val fail: Array[Int],
    val outputs: Array[Array[Int]], // per node: query idxs ending here
    val patternLen: Array[Int] // per query idx position in `outputs`: its term count
) extends Serializable {

  /** Walk the term sequence; invoke `emit(queryIdx, startPos, endPos)`
    * (token positions, inclusive) for every occurrence.
    */
  def run(terms: Array[String], emit: (Int, Int, Int) => Unit): Unit = {
    var state = 0
    var pos = 0
    while (pos < terms.length) {
      val t = terms(pos)
      var s = state
      var next = -1
      while (next < 0) {
        val g = goto_(s).get(t)
        if (g != null) next = g.intValue()
        else if (s == 0) next = 0
        else s = fail(s)
      }
      state = next
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

  /** Build from (queryIdx, terms) patterns. */
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
        // merge suffix outputs lazily at run time via the fail chain;
        // nothing to do here
      }
    }
    new AhoCorasick(gotoMaps.toArray, fail, outBufs.map(_.result()).toArray, patternLen)
  }
}
