package graft

import graft.ops.{Dedup, Multimodal, Similarity, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  private def rmScratch(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val st = java.nio.file.Files.list(p)
      try st.forEach(rmScratch(_)) finally st.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content about spark engines"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "tiny")).toDF("doc_id", "text")

  test("exact dedup groups by content hash") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(out.length == 4)
    val dupGroup = out.find(_.getLong(1) == 0L).get
    assert(dupGroup.getLong(2) == 2L) // docs 0 and 3
  }

  test("shingles + ngram jaccard inverted-index pairs") {
    val sh = docs.select(Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).contains("the quick brown"))
    assert(sh(4).isEmpty) // "tiny" has < 3 words
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 0-3 exact (j=1.0), 0-1 and 1-3 near (6 common of 7+7-6=8 -> 0.75)
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(pairs.find(p => p._1 == 0L && p._2 == 3L).get._3 == 1.0)
    assert(math.abs(pairs.head._3 - 0.75) < 1e-9)
  }

  test("minhash LSH pairs match exact jaccard at high threshold") {
    val mh = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.7)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.7)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(mh.toSeq == exact.toSeq)
  }

  test("incremental minhash: cross-side pairs only, equals exact jaccard") {
    val corpus = docs.filter($"doc_id".isin(0L, 2L, 4L))
    val delta = docs.filter($"doc_id".isin(1L, 3L))
    val got = Dedup.minhashPairsAgainst(corpus, delta, "text", "doc_id",
        threshold = 0.7)
      .orderBy("id_corpus", "id_delta").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // cross pairs at >= 0.7: (0,1)=0.75 and (0,3)=1.0; the within-delta
    // pair (1,3) must NOT appear
    assert(got.toSeq == Seq((0L, 1L, 0.75), (0L, 3L, 1.0)))
  }

  test("dropNearDuplicates keeps the smallest id per pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.5)
    val kept = Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 2L, 4L)) // 1 and 3 are near-dups of 0
  }

  test("keepBestInClusters elects the top-ranked member per component") {
    // chain component {0,1,2} via explicit pairs + singleton {5}
    val corpus = Seq(
      (0L, "aa", 10L), (1L, "bb", 30L), (2L, "cc", 20L),
      (5L, "zz", 1L)).toDF("doc_id", "text", "q")
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestInClusters(corpus, pairs, "doc_id", col("q"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 5L)) // 1 has top q in its component; 5 untouched
    // tie on rank -> smaller id wins
    val tied = Seq((0L, "x", 7L), (1L, "y", 7L)).toDF("doc_id", "text", "q")
    val p2 = Seq((0L, 1L)).toDF("id_a", "id_b")
    val k2 = Dedup.keepBestInClusters(tied, p2, "doc_id", col("q"))
      .select("doc_id").collect().map(_.getLong(0))
    assert(k2.toSeq == Seq(0L))
  }

  test("graft.functions facade delegates to the kernels") {
    val df = docs.limit(1)
    val r = df.select(
      graft.functions.simhash64(col("text")),
      graft.functions.fingerprint(col("text")),
      graft.functions.langId(col("text")),
      graft.functions.wsTokens(col("text")),
      graft.functions.annotate(df, "text",
        Seq(graft.dict.DictionaryEntry("quick brown", id = Some("q"))))).collect().head
    assert(r.getLong(0) == graft.ops.Dedup.simhashValue("the quick brown fox jumps over the lazy dog"))
    assert(r.getString(2) == "en")
    assert(r.getInt(3) == 9)
    assert(r.getSeq[org.apache.spark.sql.Row](4).head.getString(2) == "q")
  }

  test("tfidfTopTerms ranks rare terms above frequent ones") {
    val corpus = Seq(
      (0L, "x x y"), (1L, "y z"), (2L, "z z q")).toDF("doc_id", "text")
    val top = TextStats.tfidfTopTerms(corpus, "text", "doc_id", k = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    // doc 0: x (tf 2, df 1) beats y; doc 1: y and z tie (tf 1, df 2 each),
    // term-asc tie-break -> y; doc 2: q (tf 1, df 1) beats z (tf 2, df 2)
    // because 1*ln(3) > 2*ln(3/2) — idf outweighs raw tf
    assert(top.map(t => (t._1, t._2)).toSeq == Seq((0L, "x"), (1L, "y"), (2L, "q")))
    assert(math.abs(top(0)._3 - 2.197225) < 1e-6)
  }

  test("asofJoin attaches the latest right row at or before each left ts") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")).toDF("k", "ts", "lv")
    val r = Seq((1L, 10L, "x"), (1L, 15L, "y"), (2L, 9L, "z")).toDF("k", "ts", "rv")
    val out = graft.ops.Joins.asofJoin(l, r, "k", "ts")
      .orderBy("k", "ts").collect()
    // equality is inclusive; no earlier right row -> null match
    assert(out.map(x => Option(x.get(5)).orNull).toSeq == Seq("x", "y", null))
    val tol = graft.ops.Joins.asofJoin(l, r, "k", "ts", toleranceSec = Some(4))
      .orderBy("k", "ts").collect()
    assert(tol.map(x => Option(x.get(5)).orNull).toSeq == Seq("x", null, null))
  }

  test("asofJoin tolerance is micros-exact on timestamps (no seconds truncation)") {
    // ts 10.1s matching rm 9.9s: true delta 0.2s <= tol 1; a plain
    // cast-to-long computed 10 - 9 = 1 as well here, but at tol=0 it
    // nulled within-tolerance sub-second matches and disagreed with
    // asofJoinDirected's micros axis — pin both directions on the same
    // sub-second fixture
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) {
      setNanos(((us % 1000000) * 1000).toInt)
    }
    val l = Seq((1L, ts(10100000L), "a")).toDF("k", "ts", "lv")
    val r = Seq((1L, ts(9900000L), "x")).toDF("k", "ts", "rv")
    val backward = graft.ops.Joins.asofJoin(l, r, "k", "ts", toleranceSec = Some(0))
      .select("r_rv").head()
    // delta 0.2s > tol 0s -> nulled; the old seconds axis said 10-9=1 too,
    // but at tol=1 the old axis ALSO nulled (1 > ... no: 1 <= 1 kept) —
    // the distinguishing case is tol=0 with sub-second delta in the SAME
    // second: ts 10.9 vs rm 10.1 -> old axis 10-10=0 kept, true 0.8s > 0
    assert(backward.isNullAt(0))
    val l2 = Seq((1L, ts(10900000L), "a")).toDF("k", "ts", "lv")
    val r2 = Seq((1L, ts(10100000L), "x")).toDF("k", "ts", "rv")
    val sameSecond = graft.ops.Joins.asofJoin(l2, r2, "k", "ts", toleranceSec = Some(0))
      .select("r_rv").head()
    assert(sameSecond.isNullAt(0),
      "0.8s delta within one epoch second must exceed tol=0")
    // and the one-second tolerance keeps it, agreeing with the directed path
    val kept = graft.ops.Joins.asofJoin(l2, r2, "k", "ts", toleranceSec = Some(1))
      .select("r_rv").head().getString(0)
    val keptDirected = graft.ops.Joins.asofJoinDirected(l2, r2, "k", "ts",
        direction = "nearest", toleranceSec = Some(1))
      .select("r_rv").head().getString(0)
    assert(kept == "x" && keptDirected == "x")
  }

  test("rangeJoin pairs points with containing intervals via binning") {
    val pts = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0)).toDF("pid", "v")
    val ivs = Seq((10L, 0.0, 10.0), (11L, 14.0, 16.0), (12L, 5.0, 25.0))
      .toDF("iid", "lo", "hi")
    val out = graft.ops.Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binWidth = 10.0)
      .select("pid", "r_iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 5 in [0,10] and [5,25]; 15 in [14,16] and [5,25]; 25 in [5,25] (inclusive)
    assert(out == Set((1L, 10L), (1L, 12L), (2L, 11L), (2L, 12L), (3L, 12L)))
  }

  test("asofJoin property: equals brute-force per-row latest lookup") {
    val rnd = new scala.util.Random(17)
    val left = (0 until 150).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(60).toLong, i.toLong))
    val right = (0 until 150).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(60).toLong, i.toLong))
    // de-dup right (k, ts) so the expected match is unique
    val rightU = right.groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    val l = left.toDF("k", "ts", "lid")
    val r = rightU.toDF("k", "ts", "rid")
    val got = graft.ops.Joins.asofJoin(l, r, "k", "ts")
      .select("lid", "r_rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val want = left.map { case (k, ts, lid) =>
      val cands = rightU.filter(t => t._1 == k && t._2 <= ts)
      lid -> (if (cands.isEmpty) -1L else cands.maxBy(t => (t._2, t._3))._3)
    }.toMap
    assert(got == want)
  }

  test("rangeJoin property: equals brute-force containment filter") {
    val rnd = new scala.util.Random(29)
    val pts = (0 until 120).map(i => (i.toLong, rnd.nextDouble() * 100))
    val ivs = (0 until 60).map { i =>
      val lo = rnd.nextDouble() * 100
      (i.toLong, lo, lo + rnd.nextDouble() * 12)
    }
    val got = graft.ops.Joins.rangeJoin(
        pts.toDF("pid", "v"), ivs.toDF("iid", "lo", "hi"), "v", "lo", "hi",
        binWidth = 10.0)
      .select("pid", "r_iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = (for {
      (pid, v) <- pts; (iid, lo, hi) <- ivs if lo <= v && v <= hi
    } yield (pid, iid)).toSet
    assert(got == want)
  }

  test("saltedJoin equals the plain inner join") {
    val l = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "lv")
    val r = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "rv")
    val got = graft.ops.Joins.saltedJoin(l, r, Seq("k"), buckets = 4)
      .orderBy("k", "lv").collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
    val want = l.join(r, Seq("k"), "inner")
      .orderBy("k", "lv").collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("property: saltedJoin equals plain inner join under n:m dup " +
      "fan-out, null keys, and multi-column keys") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the docstring claims EXACT equality to left.join(right, keys,
    // "inner") — that is a bag contract: duplicate keys on both sides
    // fan out n×m, and null keys drop (null != null) in both forms
    val scen = for {
      buckets <- Gen.oneOf(1, 2, 7, 16)
      twoKeys <- Gen.oneOf(false, true)
      seed <- Gen.choose(0L, 1000000L)
    } yield (buckets, twoKeys, seed)
    val prop = Prop.forAllNoShrink(scen) { case (buckets, twoKeys, seed) =>
      val rnd = new scala.util.Random(seed)
      def key(): Option[Long] =
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(5).toLong)
      val l = (0 until 40).map(i => (key(), key(), i.toLong))
        .toDF("k1", "k2", "lv")
      val r = (0 until 25).map(i => (key(), key(), 1000L + i))
        .toDF("k1", "k2", "rv")
      val keys = if (twoKeys) Seq("k1", "k2") else Seq("k1")
      def bag(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
      val got = bag(graft.ops.Joins.saltedJoin(l, r, keys, buckets))
      val want = bag(l.join(r, keys, "inner"))
      if (got != want) info(s"saltedJoin MISMATCH buckets=$buckets " +
        s"keys=$keys seed=$seed: got=${got.size} want=${want.size}")
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(20).withInitialSeed(44L), prop)
    assert(res.passed, res.status.toString)
  }

  test("binned joins: null points and null interval bounds join nothing") {
    // rangeJoin/intervalOverlapJoin compile to bin-equi-joins, and SQL
    // inner inequality semantics must survive the binning: a null value
    // makes the bin (or the explode's sequence) null, so the row joins
    // NOTHING — same as `p.v BETWEEN i.lo AND i.hi` through a null.
    // Pinned so a binning refactor (e.g. coalescing null bins to a
    // sentinel) can't silently admit phantom pairs.
    val pts = Seq((1L, Some(2.0)), (2L, None: Option[Double]))
      .toDF("pid", "v")
    val ivs = Seq(
      (10L, Some(0.0), Some(5.0)),                      // catches pid 1
      (11L, None: Option[Double], Some(5.0)),           // null start
      (12L, Some(0.0), None: Option[Double]))           // null end
      .toDF("iid", "lo", "hi")
    val rj = graft.ops.Joins.rangeJoin(pts, ivs, "v", "lo", "hi",
        binWidth = 1.0)
      .select("pid", "r_iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rj == Set((1L, 10L)), rj.toString)
    val oj = graft.ops.Joins.intervalOverlapJoin(
        Seq((1L, Some(1.0), Some(3.0)), (2L, None: Option[Double], Some(3.0)))
          .toDF("lid", "ls", "le"),
        ivs, "ls", "le", "lo", "hi", binWidth = 8L)
      .select("lid", "r_iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oj == Set((1L, 10L)), oj.toString)
  }

  test("asof joins: null keys and null timestamps never match (SQL)") {
    // The docstring contract is DuckDB ASOF LEFT JOIN
    // (ON l.key = r.key AND l.ts >= r.ts): a null never satisfies the
    // equality or the inequality. The merge-window shape, left alone,
    // diverges silently — partitionBy groups null KEYS into one
    // partition (null left keys "match" null-key right rows) and a
    // null TS sorts first, so backward carries it and forward hands a
    // null-ts left row the partition's earliest right row. Pinned for
    // all three directions plus the tolerance path.
    val l = Seq(
      (Some(1L), Some(10L), "a"),          // real match both directions
      (None: Option[Long], Some(11L), "b"), // null left key
      (Some(1L), None: Option[Long], "c"))  // null left ts
      .toDF("k", "ts", "lv")
    val r = Seq(
      (Some(1L), Some(5L), "x"),            // backward/nearest match
      (Some(1L), Some(20L), "w"),           // forward match
      (None: Option[Long], Some(4L), "y"),  // null-key right: never a match
      (Some(1L), None: Option[Long], "z"))  // null-ts right: never a match
      .toDF("k", "ts", "rv")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = graft.ops.Joins.asofJoinDirected(l, r, "k", "ts", dir)
        .select("lv", "r_rv").collect()
        .map(row => row.getString(0) ->
          (if (row.isNullAt(1)) null else row.getString(1))).toMap
      val wantA = if (dir == "forward") "w" else "x"
      assert(got == Map("a" -> wantA, "b" -> null, "c" -> null),
        s"$dir: $got")
    }
    val tol = graft.ops.Joins
      .asofJoin(l, r, "k", "ts", toleranceSec = Some(100))
      .select("lv", "r_rv").collect()
      .map(row => row.getString(0) ->
        (if (row.isNullAt(1)) null else row.getString(1))).toMap
    assert(tol == Map("a" -> "x", "b" -> null, "c" -> null), tol.toString)
  }

  test("clusters computes exact transitive connected components") {
    // chain 0-1-2-3 (3 never pairs with 0 directly) + separate pair 10-11
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters: driver union-find and distributed propagation agree") {
    // a 300-edge random graph with chains, cliques and reverse-ordered
    // edges: force BOTH paths over the same pairs via the threshold knob
    val rnd = new scala.util.Random(23)
    val edges = ((0 until 150).map { i =>
      val a = rnd.nextInt(200).toLong; val b = rnd.nextInt(200).toLong
      (math.max(a, b) + 1, math.min(a, b)) // id_a > id_b: reverse order too
    } ++ (0 until 150).map { i =>
      (1000L + i, 1000L + i + 1) // one long chain (propagation stress)
    }).toDF("id_a", "id_b")
    val viaDriver = Dedup.clusters(edges, driverThreshold = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaDistributed = Dedup.clusters(edges, driverThreshold = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaDriver == viaDistributed)
    // the 151-node chain collapses to its min
    assert((1000L to 1150L).forall(n => viaDriver(n) == 1000L))
  }

  test("simhash near-dup pairs: banding finds exactly the hamming<=3 pairs") {
    // brute-force ground truth from the signature column itself
    val sigs = docs.select($"doc_id", Dedup.simhash64($"text").as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pigeonhole: hamming<=3 over 4 bands of 16 bits guarantees recall
    assert(pairs == want)
    assert(pairs.contains((0L, 3L))) // exact dup -> hamming 0
    assert(!pairs.contains((0L, 2L)))
  }

  test("simhash bucket cap neutralizes a boilerplate flood; empties dropped") {
    // 10k identical docs (one signature -> one degenerate bucket per band:
    // k² = 50M candidate pairs without the cap) + the regular corpus +
    // empty/whitespace docs. With the cap the flood contributes nothing
    // and the job stays quadratic-free; regular near-dup pairs survive.
    val flood = spark.range(1000L, 11000L)
      .select(col("id").as("doc_id"),
        lit("boilerplate header all rights reserved do not edit").as("text"))
    val empties = Seq((500L, ""), (501L, "   ")).toDF("doc_id", "text")
    val corpus = docs.union(flood).union(empties)
    val pairs = Dedup.simhashPairs(corpus, "text", "doc_id",
        maxHamming = 3, maxBucket = 100)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth over the NON-flood docs only (flood pairs are the
    // documented recall sacrifice; exact dedup removes them first)
    val sigs = docs.select($"doc_id", Dedup.simhash64($"text").as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(pairs == want)
    assert(!pairs.exists(p => p._1 >= 500L || p._2 >= 500L))
  }

  test("simhash cap bystander: a pair sharing a capped band recovers via its other bands") {
    // find a bystander text whose LOW band (band 0) collides with the
    // flood signature's band 0 — the worst case the cap can touch
    val floodText = "boilerplate header all rights reserved do not edit"
    val floodBand0 = Dedup.simhashValue(floodText) & 0xFFFFL
    // every token must vary with i, else the majority vote freezes most
    // signature bits and the collision below may be unreachable
    val bystanderText = Iterator.from(0)
      .map(i => s"b$i q${i * 7 + 1} z${i * 13 + 5} w${i * 31 + 11}")
      .take(4000000)
      .find(t => (Dedup.simhashValue(t) & 0xFFFFL) == floodBand0)
      .get
    val flood = spark.range(1000L, 11001L)
      .select(col("id").as("doc_id"), lit(floodText).as("text"))
    val bystanders = Seq((1L, bystanderText), (2L, bystanderText)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(flood.union(bystanders), "text", "doc_id",
        maxHamming = 3, maxBucket = 100)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // band 0's bucket (flood + bystanders) is over the cap and dropped
    // whole, but the identical bystanders also agree on bands 1-3, whose
    // buckets hold only the two of them — the pair survives
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 >= 1000L || p._2 >= 1000L)) // flood still neutralized
  }

  test("jaccard df-cap drop stats expose the per-doc recall budget") {
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val corpus = (0L until 20L).map(i =>
      (i, s"$boiler unique$i content$i words$i here$i now$i")).toDF("doc_id", "text")
    val stats = Dedup.shingleDropStats(corpus, "text", "doc_id", maxShingleDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(stats.size == 20)
    // the 6 boilerplate-only trigrams have df=20 > 5: dropped everywhere;
    // the shingles touching uniqueN have df=1: kept
    assert(stats.forall { case (_, total, dropped) => dropped == 6 && total > dropped })
    // with a high cap nothing is dropped
    val none = Dedup.shingleDropStats(corpus, "text", "doc_id", maxShingleDf = 100)
      .collect()
    assert(none.forall(_.getLong(2) == 0L))
  }

  test("jaccard shingle df-cap: hot shingles skip the index, not the verify") {
    // every doc shares the same boilerplate prefix (hot shingles); only
    // 100/101 are true near-dups. With maxShingleDf small enough to drop
    // every boilerplate shingle from the inverted index, the pair set AND
    // the jaccard values must be unchanged: candidates come from the rare
    // shingles, verification still counts the common boilerplate.
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val base = (0L until 20L).map(i =>
      (i, s"$boiler unique$i content$i words$i here$i now$i"))
    val nearDup = Seq(
      (100L, s"$boiler alpha beta gamma delta epsilon zeta"),
      (101L, s"$boiler alpha beta gamma delta epsilon eta"))
    val corpus = (base ++ nearDup).toDF("doc_id", "text")
    def run(cap: Int) = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
        threshold = 0.5, maxShingleDf = cap)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val uncapped = run(Int.MaxValue)
    val capped = run(5) // boilerplate shingles have df=22 > 5
    assert(capped.toSeq == uncapped.toSeq)
    assert(capped.exists(p => p._1 == 100L && p._2 == 101L))
    // the boilerplate-only overlaps must stay below threshold, not appear
    assert(!capped.exists(p => p._1 < 100L && p._2 < 100L))
  }

  test("embedding near-dup pairs and ANN top-k") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "embedding", "vec_id", dim = 4,
      threshold = 0.95).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))

    val topk = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
      Array(1.0, 0.0, 0.0, 0.0), k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(topk.toSeq == Seq((0L, 1), (1L, 2)))

    val knn = Similarity.knnJoin(vecs, vecs.filter($"vec_id" === 0L),
      "embedding", "vec_id", k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(knn.toSeq == Seq((0L, 1L, 1), (0L, 2L, 2)))

    val lsh = Similarity.lshTopK(vecs, "embedding", "vec_id",
      Array(1.0, 0.0, 0.0, 0.0), k = 2, dim = 4, probeHamming = 3)
    assert(lsh.collect().map(_.getLong(0)).contains(0L))
  }

  test("vector kernels fail clearly on bad input and compare by value") {
    // length mismatch surfaces an actionable message, not AIOOBE
    val bad = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val thrown = intercept[Throwable] {
      bad.select(Similarity.cosine(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(thrown).exists(t =>
      t.getMessage != null && t.getMessage.contains("length mismatch")), thrown)

    // plane/centroid matrices compare by VALUE so canonicalization and
    // common-subexpression elimination see identical expressions as equal
    val child = org.apache.spark.sql.GraftBridge.expression(col("a"))
    def planes() = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val h1 = graft.spark.HyperplaneBandsExpression(child, planes(), 2)
    val h2 = graft.spark.HyperplaneBandsExpression(child, planes(), 2)
    assert(h1 == h2 && h1.hashCode == h2.hashCode)
    val i1 = graft.spark.IvfAssignExpression(child, planes())
    val i2 = graft.spark.IvfAssignExpression(child, planes())
    assert(i1 == i2 && i1.hashCode == i2.hashCode)
  }

  test("embedding banding caps degenerate buckets (skew guard)") {
    // a flood of identical vectors would contribute k² candidate pairs per
    // band bucket; the cap drops those buckets while an unrelated near-dup
    // pair (clean buckets) is still found
    val flood = Seq.tabulate(200)(i => (i.toLong, Array(1.0f, 0.0f, 0.0f, 0.0f)))
    val pair = Seq(
      (1000L, Array(0.0f, 1.0f, 0.05f, 0.0f)),
      (1001L, Array(0.0f, 1.0f, 0.06f, 0.0f)))
    val vecs = (flood ++ pair).toDF("vec_id", "embedding")
    val res = Dedup.embeddingPairs(vecs, "embedding", "vec_id", dim = 4,
      threshold = 0.95, persist = false, maxBucket = 50)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res == Set((1000L, 1001L)))
  }

  test("IVF top-k is exact and prunes clusters on clustered data") {
    // 3 well-separated direction clusters in 8-dim
    val centers = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0))
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map { i =>
      val c = centers(i % 3)
      val v = c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      (i.toLong, v)
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val model = Similarity.ivfFit(vecs, "embedding", "vec_id", nClusters = 3,
      sampleN = 60)
    val q = Array(0.95, 0.05, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val ivf = Similarity.ivfTopK(vecs, "embedding", "vec_id", q, k = 5, model,
      probe = 1).collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val brute = Similarity.bruteForceTopK(vecs, "embedding", "vec_id", q, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(ivf.toSeq == brute.toSeq) // exact, bit-for-bit
    // with a tight floor the bound rules out the orthogonal clusters
    val cands = Similarity.ivfCandidateClusters(model, q, floor = 0.9)
    assert(cands.size < model.nClusters)
    // degenerate floor keeps everything (bound is conservative, never wrong)
    assert(Similarity.ivfCandidateClusters(model, q, -1.0).size == model.nClusters)
  }

  test("IVF top-k stays exact on isotropic data (no cluster structure)") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 120).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val vecs = rows.toDF("vec_id", "embedding")
    val q = Array.fill(8)(rnd.nextGaussian())
    val model = Similarity.ivfFit(vecs, "embedding", "vec_id", nClusters = 5,
      sampleN = 120)
    val ivf = Similarity.ivfTopK(vecs, "embedding", "vec_id", q, k = 7, model,
      probe = 2).collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val brute = Similarity.bruteForceTopK(vecs, "embedding", "vec_id", q, k = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(ivf.toSeq == brute.toSeq)
  }

  test("batched IVF kNN equals brute-force knnJoin (clustered and isotropic)") {
    val rnd = new scala.util.Random(13)
    def mk(n: Int, f: Int => Array[Double]) = (0 until n).map { i =>
      (i.toLong, f(i).map(_.toFloat))
    }.toDF("vec_id", "embedding")
    // clustered: 3 separated directions
    val centers = Seq(Array(1.0, 0, 0, 0, 0, 0), Array(0.0, 1, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0))
    val clustered = mk(90, i => centers(i % 3).map(_ + rnd.nextGaussian() * 0.05))
    // isotropic: no cluster structure (pruning must stay honest)
    val iso = mk(60, _ => Array.fill(6)(rnd.nextGaussian()))
    for (corpus <- Seq(clustered, iso)) {
      val queries = corpus.filter(col("vec_id") < 4)
      val model = Similarity.ivfFit(corpus, "embedding", "vec_id",
        nClusters = 5, sampleN = 90)
      val ivf = Similarity.ivfKnnJoin(corpus, queries, "embedding", "vec_id",
        k = 6, model, probe = 2)
      val brute = Similarity.knnJoin(corpus, queries, "embedding", "vec_id", k = 6)
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._3)).toSeq
      assert(key(ivf) == key(brute))
    }
  }

  test("ivfFit samples uniformly, not an id-order prefix (ordered-corpus bias)") {
    // ingestion-ordered corpus: ALL of cluster A (ids 0..199) precedes
    // ALL of cluster B (ids 200..399). A head sample of 200 sees only A
    // and fits both centroids inside it; the salted-hash sample must see
    // both clusters and recover the A/B split.
    val rnd = new scala.util.Random(7)
    val a = Array(1.0, 0.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 0.0, 0.0)
    val rows = (0 until 400).map { i =>
      val c = if (i < 200) a else b
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val model = Similarity.ivfFit(vecs, "embedding", "vec_id", nClusters = 2,
      sampleN = 200) // half the corpus — an id-order prefix would be pure A
    val assigned = vecs.select(col("vec_id"),
        Similarity.ivfAssign(col("embedding"), model).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // each true cluster lands (almost) entirely in one fitted cluster,
    // and the two land in DIFFERENT fitted clusters
    def majority(ids: Seq[(Long, Int)]): (Int, Double) = {
      val byC = ids.groupBy(_._2).view.mapValues(_.size).toMap
      val (c, n) = byC.maxBy(_._2)
      (c, n.toDouble / ids.size)
    }
    val (ca, pa) = majority(assigned.filter(_._1 < 200).toSeq)
    val (cb, pb) = majority(assigned.filter(_._1 >= 200).toSeq)
    assert(ca != cb, s"both true clusters collapsed onto fitted cluster $ca")
    assert(pa > 0.95 && pb > 0.95, s"impure fit: $pa / $pb")
  }

  test("LSH top-k recall contract on clustered data") {
    // the approximation claim in lshTopK's scaladoc as a checked bound:
    // on clustered data (the regime where LSH is actually deployed —
    // near-duplicate embeddings, tight semantic clusters) the bucketed
    // search must recover >= 80% of the true top-k at the default
    // parameters. Deterministic: fixed data seed, fixed plane seed.
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array(1.0, 0, 0, 0, 0, 0), Array(0.0, 1, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0), Array(0.0, 0, 0, 1, 0, 0))
    val corpus = (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val query = Array(0.95, 0.05, 0.0, 0.0, 0.0, 0.0)
    val k = 10
    val lsh = Similarity.lshTopK(corpus, "embedding", "vec_id", query,
      k, dim = 6).collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteForceTopK(corpus, "embedding", "vec_id",
      query, k).collect().map(_.getLong(0)).toSet
    val recall = (lsh & brute).size.toDouble / k
    assert(recall >= 0.8, s"LSH recall $recall < 0.8; lsh=$lsh brute=$brute")
  }

  test("deterministic sampling: stable, partition-independent, well-sized") {
    import graft.ops.Sampling
    val ids = spark.range(0L, 2000L).toDF("id")
      .withColumn("src", when(col("id") % 2 === 0, "a").otherwise("b"))
    // split assignment is a pure function of (id, salt)
    val s1 = Sampling.assignSplit(ids, "id", salt = "x")
      .select("id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val s2 = Sampling.assignSplit(ids.repartition(7), "id", salt = "x")
      .select("id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(s1 == s2)
    val sizes = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(sizes("train") - 1600) < 120, sizes.toString)
    assert(math.abs(sizes("val") - 200) < 70, sizes.toString)
    assert(math.abs(sizes("test") - 200) < 70, sizes.toString)
    // growing the corpus never reassigns an existing row
    val grown = Sampling.assignSplit(spark.range(0L, 3000L).toDF("id"), "id",
      salt = "x").select("id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(s1.forall { case (k, v) => grown(k) == v })
    // sample fraction lands near target and is a subset relation under
    // growing fractions (thresholds are nested by construction)
    val small = Sampling.sample(ids, "id", 0.2, "y").select("id")
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.sample(ids, "id", 0.5, "y").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(math.abs(small.size - 400) < 100, small.size.toString)
    // stratified: per-stratum selection is independent of other strata
    val strat = Sampling.stratifiedSample(ids, "id", "src", 0.3, "z")
      .select("id").collect().map(_.getLong(0)).toSet
    val aOnly = Sampling.stratifiedSample(ids.filter(col("src") === "a"),
      "id", "src", 0.3, "z").select("id").collect().map(_.getLong(0)).toSet
    assert(strat.filter(_ % 2 == 0) == aOnly)
    // mixture equals the union of per-source samples
    val mix = Sampling.mixture(ids, "id", "src", Map("a" -> 0.5, "b" -> 0.1),
      "m").select("id").collect().map(_.getLong(0)).toSet
    val ma = Sampling.sample(ids.filter(col("src") === "a"), "id", 0.5, "m")
      .select("id").collect().map(_.getLong(0)).toSet
    val mb = Sampling.sample(ids.filter(col("src") === "b"), "id", 0.1, "m")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(mix == (ma ++ mb))
  }

  test("chunking: coverage, overlap, and reconstruction invariants") {
    import graft.ops.TextStats
    val doc = (1 to 150).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "short text"), (3L, "   ")).toDF("doc_id", "text")
    val chunks = TextStats.chunk(df, "text", "doc_id", chunkTokens = 64,
        overlap = 16)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 1: starts 0,48,96 (144 < 150-16=134? no: 96 < 134 yes; 144 >= 134 dropped)
    val d1 = chunks.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1.head._3.startsWith("w1 w2 ") && d1.head._4 == 64)
    // consecutive chunks share exactly `overlap` tokens
    val c0 = d1(0)._3.split(" ")
    val c1 = d1(1)._3.split(" ")
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
    // every source token appears in some chunk (full coverage)
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert(covered == doc.split(" ").toSet)
    // short doc: one chunk, all tokens; blank doc: no chunks
    assert(chunks.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, "short text", 2L)))
    assert(!chunks.exists(_._1 == 3L))
    // real multi-line text: \s+ runs (tabs, newlines, double spaces) are
    // single separators — no empty tokens inflating n_tokens
    val messy = Seq((9L, "  one\ttwo\n\nthree  four ")).toDF("doc_id", "text")
    val mc = TextStats.chunk(messy, "text", "doc_id", chunkTokens = 3, overlap = 1)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(mc.toSeq == Seq((0L, "one two three", 3L), (1L, "three four", 2L)))
  }

  test("token counts: whitespace and BPE-ish") {
    val out = TextStats.tokenCounts(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 9)
    assert(out(4).getInt(1) == 1)
    val bpe = docs.sparkSession.range(1)
      .select(TextStats.bpeTokens(lit("don't stop, 42 times!")))
      .collect().head.getInt(0)
    // don + ' + t + stop + , + 4 + 2 + times + ! = 9
    assert(bpe == 9)
  }

  test("language id heuristic: stopword tier + script tier") {
    val d = Seq(
      (0L, "the cat and the dog"),
      (1L, "el perro y la casa de que"),
      (2L, "xyzzy qwerty"),
      (3L, "这是一个中文测试文档没有空格"),           // CJK script -> zh
      (4L, "Это русский текст для проверки"),          // Cyrillic -> ru
      (5L, "o problema não é com os dados"),           // pt stopwords
      (6L, "il problema che sono della rete"),         // it
      (7L, "het is een goede dag met zon"),            // nl
      (8L, "tai yra geras tekstas kad veikia"),        // lt
      (9L, "mixed 中文 few cjk the of and is to in a")) // CJK < 25% -> stopwords
      .toDF("id", "text")
    val out = d.select($"id", TextStats.langId($"text").as("lang"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("en", "es", "und", "zh", "ru", "pt", "it", "nl", "lt", "en"))
  }

  test("langId kernel ≡ declarative on generated unicode soup") {
    // deterministic pseudo-random strings over the alphabets the two
    // tiers discriminate on: ASCII words, stopwords from every profile,
    // CJK, Cyrillic (both cases), Greek, astral-plane surrogates, and
    // every \s whitespace class — 500 strings, one Spark comparison
    val rnd = new scala.util.Random(2026)
    val stopPool = TextStats.langStopwords.flatMap(_._2)
    val ws = Seq(" ", "\t", "\n", "\u000B", "\f", "\r")
    def token(): String = rnd.nextInt(6) match {
      case 0 => stopPool(rnd.nextInt(stopPool.size))
      case 1 => (0 to rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      case 2 => (0 to rnd.nextInt(4)).map(_ => ('一' + rnd.nextInt(500)).toChar).mkString
      case 3 => (0 to rnd.nextInt(4)).map(_ => (0x410 + rnd.nextInt(64)).toChar).mkString
      case 4 => (0 to rnd.nextInt(3)).map(_ => (0x391 + rnd.nextInt(24)).toChar).mkString
      case _ => new String(Character.toChars(0x1D538 + rnd.nextInt(50)))
    }
    val soup = (0 until 500).map { _ =>
      (0 to rnd.nextInt(12)).map(_ => token())
        .mkString(ws(rnd.nextInt(ws.size)), ws(rnd.nextInt(ws.size)), "")
    }
    val d = soup.toDF("text")
    val diverged = d.select(
        TextStats.langId($"text").as("k"),
        TextStats.langIdDeclarative($"text").as("d"), $"text")
      .where(not($"k" <=> $"d")).collect()
    assert(diverged.isEmpty,
      diverged.take(3).map(r => s"'${r.getString(2)}': ${r.getString(0)} vs ${r.getString(1)}").mkString("; "))
  }

  test("langId kernel ≡ declarative spec on corpus + adversarial cases") {
    // the codegen'd single-pass kernel must agree everywhere with the
    // native-SQL-functions spec (which is what the DuckDB oracles mirror)
    val adversarial = Seq(
      "",                              // blank → und
      "   \t\n  ",                     // whitespace-only → und
      "the el le der o il het ir",     // 8-way 1-score tie → list order (en)
      "la que",                        // es/fr 2-score tie → es (earlier)
      "van niet met het een zijn voor",// nl full house
      "und nicht",                     // "und" the German stopword, not the fallback
      "αβγ δεζ",                       // Greek — no tier fires → und
      "中",                            // 1 CJK char of 1 nonspace → zh
      "а",                             // 1 Cyrillic of 1 → ru
      "Это text with the and of is in a to", // cyr 3/26 < 25% → stopwords (en)
      "𝕊 𝕡 𝕒 𝕣 𝕜 the of and is",       // surrogate pairs count once in nonSpace
      "ЁЛКА ЗИМОЙ",                    // uppercase Cyrillic + Ё
      "一二三 the of and is in a to la el", // cjk 3/~30 < 25% → stopwords
      "tab\tseparated\ntheof\fand\ris in a") // every \s class splits
    val d2 = (docs.select($"text") union
      adversarial.toDF("text")).withColumn("id", monotonically_increasing_id())
    val both = d2.select($"id",
        TextStats.langId($"text").as("k"),
        TextStats.langIdDeclarative($"text").as("d"))
      .where(not($"k" <=> $"d"))
    assert(both.count() == 0, s"kernel/declarative divergence: ${both.collect().toSeq}")
    // null propagates as null through the kernel like any SQL scalar
    val nulls = Seq((0L, null: String), (1L, "the of and")).toDF("id", "text")
      .select(TextStats.langId($"text")).collect().map(_.isNullAt(0))
    assert(nulls.toSeq == Seq(true, false))
  }

  test("quality metrics") {
    val out = TextStats.quality(docs, "text", "doc_id").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("quality_bucket") == "ok")
    assert(out(4).getAs[String]("quality_bucket") == "too_short")
    assert(out(0).getAs[Int]("n_stopwords") == 1) // "the"
  }

  test("int8 quantization: exact codes, bounded reconstruction, cosine contract") {
    import graft.ops.Embeddings
    val vecs = Seq(
      (0L, Array(1.0, -0.5, 0.25, 0.0)),
      (1L, Array(0.0, 0.0, 0.0, 0.0)),        // zero vector
      (2L, Array(-2.0, 2.0, 1.0, -1.0))).toDF("id", "v")
    val q = Embeddings.quantize(vecs, "v", "id").orderBy("id").collect()
    // maxabs=1 -> scale 1/127; codes = round(127*x): 127, -64 (63.5 away), 32, 0
    assert(q(0).getAs[Double]("scale") == 1.0 / 127)
    assert(q(0).getAs[scala.collection.Seq[Byte]]("q").toSeq == Seq[Byte](127, -64, 32, 0))
    assert(q(1).getAs[Double]("scale") == 0.0)
    assert(q(1).getAs[scala.collection.Seq[Byte]]("q").toSeq == Seq[Byte](0, 0, 0, 0))
    assert(q(2).getAs[scala.collection.Seq[Byte]]("q").toSeq == Seq[Byte](-127, 127, 64, -64))

    // dequantize reconstructs within scale/2 per element
    val rec = Embeddings.dequantizeInt8(col("q"), col("scale"))
    val back = Embeddings.quantize(vecs, "v", "id")
      .select(col("id"), rec.as("r")).orderBy("id").collect()
    assert(back(0).getSeq[Double](1).zip(Seq(1.0, -0.5, 0.25, 0.0))
      .forall { case (a, b) => math.abs(a - b) <= 0.5 / 127 + 1e-12 })

    // cosine on codes tracks true cosine within 2e-2 on random vectors
    val rnd = new scala.util.Random(5)
    val pairs = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    }.toDF("id", "a", "b")
    val errs = pairs.select(
        graft.ops.Similarity.cosine(col("a"), col("b")).as("t"),
        Embeddings.int8Cosine(
          Embeddings.quantizeInt8(col("a")).getField("q"),
          Embeddings.quantizeInt8(col("b")).getField("q")).as("e"))
      .collect().map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    assert(errs.max < 0.02, s"max int8 cosine error ${errs.max}")

    // zero vectors quantize to all-zero codes; cosine against them is
    // defined as 0.0 (not NaN), so threshold predicates see them ranked
    // last instead of silently vanishing
    val z = Seq((0L, Array(0.0, 0.0), Array(1.0, 2.0))).toDF("id", "a", "b")
      .select(Embeddings.int8Cosine(
        Embeddings.quantizeInt8(col("a")).getField("q"),
        Embeddings.quantizeInt8(col("b")).getField("q")).as("c"))
      .collect().head.getDouble(0)
    assert(z == 0.0)
  }

  test("repetition counters: one-pass kernel matches hand counts") {
    // "a b a b a": words=5, distinct=2, chars=5; bigrams: "a b"x2, "b a"x2
    // -> n_bigrams=4, top=2, dup occurrences=4
    assert(TextStats.repetitionCountsValue("a b a b a").toSeq ==
      Seq(5L, 2L, 5L, 4L, 2L, 4L))
    assert(TextStats.repetitionCountsValue("x y z").toSeq ==
      Seq(3L, 3L, 3L, 2L, 1L, 0L))
    assert(TextStats.repetitionCountsValue("solo").toSeq ==
      Seq(1L, 1L, 4L, 0L, 0L, 0L))
    assert(TextStats.repetitionCountsValue("").toSeq ==
      Seq(0L, 0L, 0L, 0L, 0L, 0L))
    assert(TextStats.repetitionCountsValue("  padded   whitespace  ").toSeq ==
      Seq(2L, 2L, 16L, 1L, 1L, 0L))
  }

  test("gopher quality signals and keep flag") {
    val d = Seq(
      (0L, ("spark " * 30).trim),                        // pathological repetition
      (1L, (0 until 60).map(i => s"w$i").mkString(" ")), // clean long doc
      (2L, "too short")).toDF("doc_id", "text")
    val out = TextStats.gopherQuality(d, "text", "doc_id",
        minWords = 20, minMeanWordLen = 2.0,
        maxTopBigramFrac = 0.5, maxDupWordFrac = 0.5)
      .orderBy("doc_id").collect()
    // doc 0: all-same words -> dup_word_frac 29/30, top bigram 29/29
    assert(out(0).getAs[Double]("dup_word_frac") == math.rint(29.0 / 30 * 1e6) / 1e6)
    assert(out(0).getAs[Double]("top_bigram_frac") == 1.0)
    assert(out(0).getAs[Long]("keep") == 0L)
    // doc 1: all-distinct words, every bigram unique
    assert(out(1).getAs[Double]("dup_word_frac") == 0.0)
    assert(out(1).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(out(1).getAs[Long]("keep") == 1L)
    // doc 2: below min word count
    assert(out(2).getAs[Long]("keep") == 0L)
  }

  test("ngram decontamination drops exactly the overlapping docs") {
    import graft.ops.Decontaminate
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "prefix words then alpha beta gamma delta and more"), // shares 4-gram with 0
      (2L, "unrelated content entirely its own words here"),
      (3L, "short one")).toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 0L)
    val cont = Decontaminate.contaminatedIds(corpus, bench, "text", "doc_id", n = 4)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(cont.toSeq == Seq(0L, 1L))
    val clean = Decontaminate(corpus, bench, "text", "doc_id", n = 4)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(clean.toSeq == Seq(2L, 3L))
    // n larger than every doc: nothing contaminated, nothing dropped
    val all = Decontaminate(corpus, bench, "text", "doc_id", n = 50)
      .count()
    assert(all == 4L)
  }

  test("ngram decontamination: whitespace variants still hash to the same gram") {
    import graft.ops.Decontaminate
    // the shared 4-gram differs only in whitespace (tab, newline, double
    // space, leading/trailing pad) between bench and corpus — the GPT-3
    // method treats words as \s+ tokens, so all variants must be caught
    val corpus = Seq(
      (0L, "alpha beta\tgamma delta epsilon"),
      (1L, "  alpha  beta gamma\ndelta trailing words  "),
      (2L, "alpha beta gamma other delta")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val cont = Decontaminate.contaminatedIds(corpus, bench, "text", "doc_id", n = 4)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(cont.toSeq == Seq(0L, 1L))
    // and the join path agrees with the documented wordNgrams surface
    val viaStrings = corpus
      .select(col("doc_id"), explode(Decontaminate.wordNgrams(col("text"), 4)).as("g"))
      .join(bench.select(explode(Decontaminate.wordNgrams(col("text"), 4)).as("g")), Seq("g"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(viaStrings == cont.toSet)
  }

  test("repetition counters property: equals brute-force recomputation") {
    val rnd = new scala.util.Random(41)
    val vocab = Seq("a", "bb", "ccc", "dd", "e")
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(12)
      val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val ws = text.split("\\s+").filter(_.nonEmpty)
      val bgs = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val cnt = bgs.groupBy(identity).view.mapValues(_.size).toMap
      val want = Seq[Long](ws.length, ws.distinct.length, ws.map(_.length.toLong).sum,
        bgs.length, if (cnt.isEmpty) 0L else cnt.values.max.toLong,
        cnt.values.filter(_ > 1).sum.toLong)
      assert(TextStats.repetitionCountsValue(text).toSeq == want, s"text='$text'")
    }
  }

  test("ngram decontamination property: equals brute-force overlap") {
    val rnd = new scala.util.Random(43)
    val vocab = Seq("w1", "w2", "w3")
    val n = 3
    val corpus = (0 until 40).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    val bench = df.filter($"doc_id" % 5 === 0)
    def grams(t: String): Set[String] =
      t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    val benchGrams = corpus.filter(_._1 % 5 == 0).flatMap(c => grams(c._2)).toSet
    val wantContaminated = corpus.filter(c => grams(c._2).exists(benchGrams)).map(_._1).toSet
    val got = graft.ops.Decontaminate.contaminatedIds(df, bench, "text", "doc_id", n)
      .collect().map(_.getLong(0)).toSet
    assert(got == wantContaminated)
    val clean = graft.ops.Decontaminate(df, bench, "text", "doc_id", n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == corpus.map(_._1).toSet -- wantContaminated)
  }

  test("fingerprint: rolling hash is content-defined") {
    val d = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g h"),
      (2L, "q r s t u v w x y z")).toDF("id", "text")
    val fps = d.select(TextStats.fingerprint($"text")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1)) // identical docs -> identical fingerprint
    assert(fps(0) != fps(2)) // different content -> different fingerprint
  }

  test("size-targeted write: files land near the target, none tiny") {
    import graft.ops.Materialize
    val dir = java.nio.file.Files.createTempDirectory("graft_matwrite").toString
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .repartition(8) // many small tasks: the shape that sprays tiny files
      val target = 1 // MB — small enough that sf0.001 yields multiple files
      val (rowsPerFile, bpr) = Materialize.writeSized(docs, s"$dir/out",
        targetFileMB = target, sortCols = Seq("lang"))
      assert(bpr > 1.0)
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/out"))
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
      val sizes = files.map(java.nio.file.Files.size(_))
      assert(sizes.nonEmpty)
      // no file overshoots the target by more than 2x (sampling error bound)
      assert(sizes.forall(_ < target * 1024 * 1024 * 2), sizes.mkString(","))
      // ...and the 8 undersized input partitions CONSOLIDATE: file count is
      // what the total stored bytes demand, not what the input partitioning
      // sprays (+1 slack for the range-partition boundary)
      val wantFiles = math.max(1L, math.ceil(
        sizes.sum.toDouble / (target * 1024 * 1024)).toLong)
      assert(sizes.length <= wantFiles + 1,
        s"tiny-file spray: ${sizes.length} files for ${sizes.sum} bytes at ${target}MB target")
      // rereads identical
      val n0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
      assert(spark.read.parquet(s"$dir/out").count() == n0)
      assert(rowsPerFile >= 1L)
      // the sample scratch dir is cleaned up
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/out_rowsize_sample")))
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(java.nio.file.Paths.get(dir))
    }
  }

  test("multimodal plumbing: synthesize -> features -> resize -> frames") {
    val media = Multimodal.synthesize(docs, "text", "doc_id")
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "data", "meta"))
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(feats.length == 5)
    val f0 = feats(0).getSeq[Float](3)
    assert(f0.length == 16 && math.abs(f0.sum - 1.0f) < 1e-3)

    val resized = Multimodal.resize(media, 8, 8).select("meta.width").collect()
    assert(resized.forall(_.getInt(0) == 8))

    val frames = Multimodal.sampleFrames(media)
    val fr = frames.collect()
    assert(fr.nonEmpty)
    assert(frames.schema.fieldNames.toSeq == Seq("media_id", "frame_idx", "frame_bytes"))
  }

  test("perceptual hashes: near-identical images pair up, different ones don't") {
    import graft.ops.Codecs
    def gradient(w: Int, h: Int, f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = f(x, y)
        val o = (y * w + x) * 3
        rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
      }
      rgb
    }
    val base = gradient(32, 32, (x, y) => ((x * 8) % 256, (y * 8) % 256, 0))
    // near-dup: a single 2x2 patch flipped to white
    val tweaked = base.clone()
    for (y <- 10 to 11; x <- 10 to 11; c <- 0 to 2)
      tweaked((y * 32 + x) * 3 + c) = 0xff.toByte
    // structurally different: inverted gradient
    val other = gradient(32, 32, (x, y) => (255 - (x * 8) % 256, 255 - (y * 8) % 256, 255))
    val media = Seq(
      (0L, "image", Codecs.encodeBmp(32, 32, base)),
      (1L, "image", Codecs.encodeBmp(32, 32, tweaked)),
      (2L, "image", Codecs.encodeBmp(32, 32, other)))
      .toDF("media_id", "kind", "data")
    val hashes = Multimodal.imageHashes(media)
    val m = hashes.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(0L)._1, m(1L)._1) <= 3, s"ahash near-dup too far: ${ham(m(0L)._1, m(1L)._1)}")
    assert(ham(m(0L)._1, m(2L)._1) > 10, s"ahash differentiates: ${ham(m(0L)._1, m(2L)._1)}")
    assert(ham(m(0L)._2, m(2L)._2) > 10, s"dhash differentiates: ${ham(m(0L)._2, m(2L)._2)}")
    // the banding operator applied to the signatures: only the near-dup pair
    val pairs = graft.ops.Dedup.hammingPairs64(hashes, "media_id", "ahash",
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)), pairs.toSeq.toString)
    // kernel is what the expression computes (shared-path sanity)
    val (w, h, rgb, _) = Codecs.decodeImage(Codecs.encodeBmp(32, 32, base))
    assert(Multimodal.perceptualHashes(w, h, rgb) == m(0L))
  }

  test("PQ encode/ADC: determinism, internal consistency, reconstruction") {
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 64).map { i =>
      (i.toLong, Array.fill(8)((rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val model = Similarity.pqFit(vecs, "embedding", "vec_id", m = 4, k = 8,
      sampleN = 64)
    assert(model.m == 4 && model.k == 8 && model.subDim == 2 && model.dim == 8)
    // encode is deterministic and codes index valid centroids
    val codes1 = vecs.select(col("vec_id"),
      Similarity.pqEncode(col("embedding"), model).as("codes"))
      .orderBy("vec_id").collect().map(_.getSeq[Byte](1).toSeq)
    val codes2 = vecs.select(col("vec_id"),
      Similarity.pqEncode(col("embedding"), model).as("codes"))
      .orderBy("vec_id").collect().map(_.getSeq[Byte](1).toSeq)
    assert(codes1.toSeq == codes2.toSeq)
    assert(codes1.forall(c => c.length == 4 && c.forall(b => b >= 0 && b < 8)))
    // ADC score == dot(q_normalized, reconstruction) computed by hand
    val q = Array.fill(8)(rnd.nextGaussian())
    val qn = { val n = math.sqrt(q.map(x => x * x).sum); q.map(_ / n) }
    val table = Array.tabulate(model.m * model.k) { idx =>
      val mi = idx / model.k; val c = idx % model.k
      (0 until model.subDim).map(j =>
        qn(mi * model.subDim + j) * model.codebooks(mi)(c)(j)).sum
    }
    val v0 = vecs.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val c0 = Similarity.pqEncodeValue(v0, model.codebooks)
    val adc = Similarity.pqAdcValue(c0, table, model.k)
    val recon = (0 until model.m).flatMap(mi =>
      model.codebooks(mi)(c0(mi) & 0xff)).toArray
    val byHand = qn.zip(recon).map { case (a, b) => a * b }.sum
    assert(math.abs(adc - byHand) < 1e-9)
  }

  test("PQ top-k recall contract on clustered data; full rerank is exact") {
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0), Array(0.0, 0, 0, 1, 0, 0, 0, 0))
    val corpus = (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val query = Array(0.95, 0.05, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val k = 10
    val model = Similarity.pqFit(corpus, "embedding", "vec_id", m = 4, k = 16,
      sampleN = 200)
    val brute = Similarity.bruteForceTopK(corpus, "embedding", "vec_id",
      query, k).collect().map(_.getLong(0)).toSet
    val pq = Similarity.pqTopK(corpus, "embedding", "vec_id", query, k,
      model).collect().map(_.getLong(0)).toSet
    val recall = (pq & brute).size.toDouble / k
    assert(recall >= 0.8, s"PQ recall $recall < 0.8; pq=$pq brute=$brute")
    // rerank = corpus size -> bit-identical to brute force (the rerank
    // path uses the same cosine kernel and tie-break)
    val full = Similarity.pqTopK(corpus, "embedding", "vec_id", query, k,
      model, rerank = 200).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val bruteFull = Similarity.bruteForceTopK(corpus, "embedding", "vec_id",
      query, k).collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(full.toSeq == bruteFull.toSeq)
    // materialized codes column gives the same answer as on-the-fly
    val withCodes = corpus.withColumn("codes",
      Similarity.pqEncode(col("embedding"), model))
    val viaCodes = Similarity.pqTopK(withCodes, "embedding", "vec_id", query,
      k, model, codesCol = Some("codes")).collect().map(_.getLong(0)).toSet
    assert(viaCodes == pq)
  }

  test("IVF-PQ composition: cluster pruning + code scan on the pruned subset") {
    // the scaladoc claim on pqEncode — "compose with ivfAssign for
    // IVF-PQ" — as a checked property: assign clusters, materialize
    // codes, restrict the PQ scan to the query's candidate clusters,
    // and the clustered-data answer must still hit the recall bar
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(0.0, 1, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1, 0, 0, 0, 0, 0), Array(0.0, 0, 0, 1, 0, 0, 0, 0))
    val corpus = (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val query = Array(0.95, 0.05, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val k = 10
    val ivf = Similarity.ivfFit(corpus, "embedding", "vec_id", nClusters = 4)
    val pq = Similarity.pqFit(corpus, "embedding", "vec_id", m = 4, k = 16,
      sampleN = 200)
    val indexed = corpus
      .withColumn("cluster", Similarity.ivfAssign(col("embedding"), ivf))
      .withColumn("codes", Similarity.pqEncode(col("embedding"), pq))
    val cands = Similarity.ivfCandidateClusters(ivf, query, floor = 0.5)
    assert(cands.size < 4, s"clustered data should prune: $cands")
    val pruned = indexed.filter(col("cluster")
      .isin(cands.map(Integer.valueOf): _*))
    val got = Similarity.pqTopK(pruned, "embedding", "vec_id", query, k, pq,
      codesCol = Some("codes")).collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteForceTopK(corpus, "embedding", "vec_id",
      query, k).collect().map(_.getLong(0)).toSet
    val recall = (got & brute).size.toDouble / k
    assert(recall >= 0.8, s"IVF-PQ recall $recall; got=$got brute=$brute")
  }

  test("bloom decontamination equals the exact broadcast path") {
    val bench = docs.filter(col("doc_id").isin(0L, 2L))
    val exact = graft.ops.Decontaminate(docs, bench, "text", "doc_id", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val viaBloom = graft.ops.Decontaminate.bloom(docs, bench, "text", "doc_id", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(viaBloom.toSeq == exact.toSeq)
    // a very lossy filter still yields exact results (confirm join
    // removes the extra false positives the high fpp lets through)
    val lossy = graft.ops.Decontaminate.bloom(docs, bench, "text", "doc_id",
      n = 3, fpp = 0.5).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(lossy.toSeq == exact.toSeq)
  }

  test("duplicate spans: global window counts, within-doc repeats, short docs") {
    val corpus = Seq(
      (0L, "a b c d e"),      // windows(3): [abc, bcd, cde]
      (1L, "a b c x y"),      // shares abc with 0
      (2L, "p q r p q r p q") // within-doc repeats: pqr x2, qrp x2, rpq x2
      , (3L, "zz")).toDF("doc_id", "text") // shorter than window
    val out = Dedup.duplicateSpans(corpus, "text", "doc_id", window = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 0: 3 windows, 1 dup (abc shared with doc 1)
    assert(out(0) == (0L, 3L, 1L, 0.333333))
    assert(out(1) == (1L, 3L, 1L, 0.333333))
    // doc 2: 6 windows: pqr qrp rpq pqr qrp rpq — every one occurs twice
    assert(out(2) == (2L, 6L, 6L, 1.0))
    assert(out(3) == (3L, 0L, 0L, 0.0))
  }

  test("remove duplicate spans: first occurrence survives, cuts union, docs vanish") {
    val corpus = Seq(
      (0L, "a b c d"),      // owner of abc@0, bcd@1 -> untouched
      (1L, "x a b c y"),    // abc@1 dup -> cut tokens 1..3 -> "x y"
      (2L, "a b c d"),      // exact dup: both windows cut -> covers all -> dropped
      (3L, "z z"),          // shorter than window -> untouched
      (4L, "p q r p q r"))  // within-doc repeat pqr@3 -> cut 3..5 -> "p q r"
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(corpus, "text", "doc_id", window = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (0L, 4L, "a b c d"),
      (1L, 2L, "x y"),
      (3L, 2L, "z z"),
      (4L, 3L, "p q r")))
    spark.catalog.clearCache()
  }

  test("cutRebuildValue: 200 random cut sets match the dead-set reference") {
    // the r8 kernel vs an independent O(tokens×cuts) reference: any cut
    // position (incl. ones whose window overhangs the end), any overlap
    // pattern, any window size
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 200) {
      val n = 1 + rnd.nextInt(40)
      val toks = (0 until n).map(i => s"t$i")
      val text = toks.mkString(" ")
      val w = 1 + rnd.nextInt(6)
      val cuts = (0 until rnd.nextInt(10)).map(_ => rnd.nextInt(n)).distinct.toArray
      val (gotN, gotS) = Dedup.cutRebuildValue(text, cuts.clone(), w)
      val dead = cuts.flatMap(p => p until math.min(p + w, n)).toSet
      val kept = (0 until n).filterNot(dead).map(toks)
      assert(gotN == kept.size && gotS == kept.mkString(" "),
        s"trial=$trial n=$n w=$w cuts=${cuts.toSeq}: got ($gotN, '$gotS')")
    }
  }

  test("remove duplicate spans: many overlapping cuts merge into intervals (vs brute force)") {
    // adversarial boilerplate doc: "a0 a1 a2" repeated 500 times in doc 1
    // makes every window after the first a duplicate — hundreds of
    // OVERLAPPING cut windows that must pre-merge instead of each being
    // re-checked per token (the old tokens×cuts shape)
    val unit = (0 until 3).map(i => s"a$i").mkString(" ")
    val boiler = Seq.fill(500)(unit).mkString(" ")
    val w = 4
    val corpus = Seq(
      (0L, s"$unit x $unit y"),          // owner of the early windows
      (1L, s"head1 head2 $boiler tail1 tail2")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(corpus, "text", "doc_id", window = w)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

    // brute-force oracle: same window hashing (token equality suffices
    // here — tokens are distinct strings), global-first ownership, cut
    // every non-owner occurrence's [p, p+w) range, rebuild
    val texts = Map(0L -> s"$unit x $unit y",
      1L -> s"head1 head2 $boiler tail1 tail2")
    val wins = texts.toSeq.sortBy(_._1).flatMap { case (id, t) =>
      val tk = t.split("\\s+")
      (0 to tk.length - w).map(p => ((id, p), tk.slice(p, p + w).mkString(" ")))
    }
    val byKey = wins.groupBy(_._2)
    val owners = byKey.map { case (k, occ) => k -> occ.map(_._1).min }
    val expected = texts.toSeq.sortBy(_._1).flatMap { case (id, t) =>
      val tk = t.split("\\s+")
      val cuts = (0 to tk.length - w).filter { p =>
        val k = tk.slice(p, p + w).mkString(" ")
        byKey(k).size > 1 && owners(k) != ((id, p))
      }
      val dead = cuts.flatMap(p => p until math.min(p + w, tk.length)).toSet
      val keptT = tk.indices.filterNot(dead).map(tk)
      if (keptT.isEmpty) None
      else Some((id, keptT.length.toLong, keptT.mkString(" ")))
    }
    assert(out == expected)
    spark.catalog.clearCache()
  }

  test("line dedup: global first occurrence wins, docs reassemble in order") {
    val multi = Seq(
      (0L, "alpha\nbeta\nalpha"),   // within-doc repeat: 2nd alpha drops
      (1L, "beta\ngamma"),          // beta seen in doc 0 -> drops
      (2L, "alpha\nbeta"),          // both seen -> doc disappears
      (3L, "delta")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(multi, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (0L, 2L, "alpha\nbeta"),
      (1L, 1L, "gamma"),
      (3L, 1L, "delta")))
  }

  test("line dedup property: equals brute-force first-occurrence sweep") {
    val rnd = new scala.util.Random(43)
    val vocab = Seq("aa bb", "cc", "dd ee ff", "gg", "hh ii") // tiny -> collisions
    (0 until 20).foreach { round =>
      val docs = (0 until 8).map { id =>
        val n = 1 + rnd.nextInt(4)
        (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString("\n"))
      }
      // brute force: sweep (id, pos) in order, keep first global occurrence
      val seen = scala.collection.mutable.Set[String]()
      val want = docs.flatMap { case (id, text) =>
        val kept = text.split("\n", -1).filter(l => seen.add(l))
        if (kept.isEmpty) None
        else Some((id, kept.length.toLong, kept.mkString("\n")))
      }
      val got = Dedup.lineDedup(docs.toDF("doc_id", "text"), "text", "doc_id")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.toSeq == want, s"round $round docs=$docs")
    }
  }

  test("duplicate spans property: equals brute-force window counting") {
    val rnd = new scala.util.Random(47)
    val vocab = Seq("x", "y", "z")
    (0 until 20).foreach { round =>
      val docs = (0 until 6).map { id =>
        val n = rnd.nextInt(8)
        (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val w = 3
      val allWins = docs.flatMap { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        toks.sliding(w).filter(_.length == w).map(win => (id, win.mkString(" "))).toSeq
      }
      val freq = allWins.groupBy(_._2).view.mapValues(_.size).toMap
      val want = docs.map { case (id, _) =>
        val mine = allWins.filter(_._1 == id)
        val nd = mine.count(x => freq(x._2) > 1)
        val frac = if (mine.isEmpty) 0.0
          else BigDecimal(nd.toDouble / mine.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, mine.size.toLong, nd.toLong, frac)
      }
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "text",
          "doc_id", window = w)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == want, s"round $round docs=$docs")
    }
  }

  test("line dedup: no duplicates is a no-op; custom delimiter") {
    val clean = Seq((0L, "a|b"), (1L, "c|d")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(clean, "text", "doc_id", delim = "|")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((0L, 2L, "a|b"), (1L, 2L, "c|d")))
  }

  test("bm25 top-k: equals brute-force scoring; non-matching docs absent") {
    val corpus = Seq(
      (0L, "hash join hash"),
      (1L, "hash"),
      (2L, "scan vector"),
      (3L, "the the the")).toDF("doc_id", "text")
    val query = Seq("hash", "join")
    val k1 = 1.2; val b = 0.75
    val got = graft.ops.Retrieval.bm25TopK(corpus, "text", "doc_id", query, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute force, same formula and fold order
    val texts = Map(0L -> "hash join hash", 1L -> "hash", 2L -> "scan vector",
      3L -> "the the the")
    val dls = texts.view.mapValues(_.split("\\s+").length.toDouble).toMap
    val n = texts.size.toDouble
    val avgdl = dls.values.sum / n
    def tf(id: Long, t: String) = texts(id).split("\\s+").count(_ == t).toDouble
    def dfOf(t: String) = texts.keys.count(tf(_, t) > 0).toDouble
    def score(id: Long) = {
      val raw = query.foldLeft(0.0) { (acc, t) =>
        val f = tf(id, t)
        if (f == 0) acc
        else {
          val idf = math.log(1.0 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5))
          acc + idf * f * (k1 + 1) / (f + k1 * ((1 - b) + b * dls(id) / avgdl))
        }
      }
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.map(_._1).toSeq == Seq(0L, 1L)) // docs 2,3 never score
    assert(got.toSeq == Seq((0L, 1L, score(0L)), (1L, 2L, score(1L))))
    // two hashes in a short doc outrank one hash + longer doc? sanity:
    // doc 0 carries both terms, so it must rank first
    assert(score(0L) > score(1L))
  }

  test("packing offsets: exact global prefix, partition-independent, empty docs drop") {
    val corpus = Seq(
      (0L, "a b c"),        // 3 tokens, start 0, seqs 0..0
      (1L, ""),             // 0 tokens -> dropped
      (2L, "d e f g"),      // 4 tokens, start 3, seqs 0..1 (L=4: 3..6)
      (3L, "h"),            // 1 token, start 7, seq 1
      (4L, "i j k l m"))    // 5 tokens, start 8, seqs 2..3
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Packing.packingOffsets(df, "text", "doc_id", seqTokens = 4)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val got = run(corpus)
    assert(got.toSeq == Seq(
      (0L, 3L, 0L, 0L, 0L),
      (2L, 4L, 3L, 0L, 1L),
      (3L, 1L, 7L, 1L, 1L),
      (4L, 5L, 8L, 2L, 3L)))
    // partitioning-independence: a hostile input layout gives identical rows
    assert(run(corpus.repartition(7)).toSeq == got.toSeq)
    assert(run(corpus.repartition(1)).toSeq == got.toSeq)
    spark.catalog.clearCache()
  }

  test("linear text score: weighted tf sum, bias-only docs, keep threshold") {
    val corpus = Seq(
      (0L, "spark spark slow"),   // 0.5 + 2*1.5 - 2.0 = 1.5
      (1L, "nothing weighted"),   // bias only = 0.5
      (2L, "slow slow")           // 0.5 - 4.0 = -3.5
    ).toDF("doc_id", "text")
    val out = graft.ops.Retrieval.linearTextScore(corpus, "text", "doc_id",
        Seq("spark" -> 1.5, "slow" -> -2.0), bias = 0.5, threshold = 0.4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("score"), r.getAs[Long]("keep")))
    assert(out.toSeq == Seq((0L, 1.5, 1L), (1L, 0.5, 1L), (2L, -3.5, 0L)))
    // decision-table contract: ids + score + keep only, no corpus columns
    val cols = graft.ops.Retrieval.linearTextScore(corpus, "text", "doc_id",
      Seq("spark" -> 1.0)).columns.toSeq
    assert(cols == Seq("doc_id", "score", "keep"))
  }

  test("linear text score: duplicate/case-colliding terms sum; dotted terms survive") {
    val corpus = Seq(
      (0L, "fast fast v2.0"),
      (1L, "plain")).toDF("doc_id", "text")
    // "Fast" and "fast" collide after lowercasing -> one summed weight 1.5;
    // "v2.0" contains '.' which must not be parsed as a nested field
    val out = graft.ops.Retrieval.linearTextScore(corpus, "text", "doc_id",
        Seq("Fast" -> 1.0, "fast" -> 0.5, "v2.0" -> 10.0), bias = 0.0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Double]("score")))
    assert(out.toSeq == Seq((0L, 13.0), (1L, 0.0)))
    // bm25 with a dotted query term analyzes and ranks too
    val ranked = graft.ops.Retrieval.bm25TopK(corpus, "text", "doc_id",
      Seq("v2.0"), k = 2).collect()
    assert(ranked.length == 1 && ranked.head.getLong(0) == 0L)
  }

  test("bigram perplexity: add-alpha closed form vs hand computation") {
    val ref = Seq((0L, "a b a b"), (1L, "a c")).toDF("doc_id", "text")
    // ref unigrams: a:3 b:2 c:1 -> V = 3+1 = 4
    // ref bigrams: (a,b):2 (b,a):1 (a,c):1
    val docs = Seq(
      (10L, "a b"),    // lp = ln((2+.1)/(3+.1*4)) = ln(2.1/3.4)
      (11L, "b c"),    // ln((0+.1)/(2+.4)) = ln(.1/2.4)
      (12L, "z a"),    // unseen history: ln(.1/(0+.4))
      (13L, "solo"),   // 1 token -> 0 bigrams, null scores
      (14L, "a b a")   // ln(2.1/3.4) + ln((1+.1)/(2+.4))
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Lm.bigramPerplexity(d, ref, "text", "doc_id", alpha = 0.1)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    val out = run(docs)
    def g(x: Double) = math.floor(x * 1e9) / 1e9 // the integer-grain contract
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(0) == ((10L, 1L, Some(r6(g(math.log(2.1 / 3.4)))))))
    assert(out(1) == ((11L, 1L, Some(r6(g(math.log(0.1 / 2.4)))))))
    assert(out(2) == ((12L, 1L, Some(r6(g(math.log(0.1 / 0.4)))))))
    assert(out(3) == ((13L, 0L, None)))
    assert(out(4) == ((14L, 2L,
      Some(r6((g(math.log(2.1 / 3.4)) + g(math.log(1.1 / 2.4))) / 2)))))
    // partitioning-independence: the integer-grain sum must not care
    assert(run(docs.repartition(7)).toSeq == out.toSeq)
  }

  test("perplexity buckets: head/middle/tail split, unscored docs are tail") {
    val ref = Seq((0L, "a b a b a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b a b"), (2L, "a b z q"), (3L, "z q z q"), (4L, "x"))
      .toDF("doc_id", "text")
    val buckets = graft.ops.Lm.perplexityBuckets(
        graft.ops.Lm.bigramPerplexity(docs, ref, "text", "doc_id"), "doc_id",
        headQ = 0.34, tailQ = 0.67)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getAs[String]("bucket")))
    assert(buckets(0)._2 == "head")   // pure in-distribution
    // "a b z q" scores WORSE than all-OOV "z q z q": a known history with
    // an unseen continuation divides alpha by the full history count,
    // while an unseen history gets the flat 1/V - the classic smoothed-LM
    // caveat (CCNet buckets exist precisely to absorb such quirks)
    assert(buckets(1)._2 == "tail")
    assert(buckets(2)._2 == "middle")
    assert(buckets(3)._2 == "tail")   // unscored
  }

  test("dsir importance weights: target-like docs score higher; partition-independent") {
    val docs = Seq(
      (0L, "clean prose about science topics"),
      (1L, "clean prose about history topics"),
      (2L, "buy now click here spam spam"),
      (3L, "")).toDF("doc_id", "text")
    val target = Seq((0L, "clean prose about many good topics")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Lm.importanceWeights(d, target, "text", "doc_id", buckets = 256)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    val out = run(docs)
    // target-overlapping docs beat the spam doc
    assert(out(0)._3.get > out(2)._3.get && out(1)._3.get > out(2)._3.get, out.mkString(","))
    // empty text still yields one ''-unigram (the raw-split contract)
    assert(out(3)._2 == 1L)
    assert(run(docs.repartition(5)).toSeq == out.toSeq)
  }

  test("mixture plan: epoch cap, shortfall, unweighted domains absent") {
    val corpus = Seq(
      ("web", 100L), ("web", 100L),    // available 200
      ("code", 50L),                   // available 50
      ("books", 500L)                  // unweighted -> absent
    ).toDF("domain_col", "toks")
    val plan = graft.ops.Sampling.mixturePlan(corpus, "domain_col", col("toks"),
        Seq("web" -> 0.5, "code" -> 0.5), budget = 1000L, maxEpochs = 3.0)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    // code: target 500, cap 50*3=150 -> shortfall 350, epochs 3.0
    assert(plan(0) == (("code", 50L, 500L, 150L, 3.0, 350L)))
    // web: target 500, cap 200*3=600 -> no shortfall, epochs 2.5
    assert(plan(1) == (("web", 200L, 500L, 500L, 2.5, 0L)))
    assert(plan.length == 2)
  }

  test("ngramRepetition: hand-counted 3/4-gram fractions and keep edges") {
    import graft.ops.TextStats.ngramRepetitionValue
    // "a b a b a b": 3-grams = [aba, bab, aba, bab] -> tot 4, top 2, dup 4
    assert(ngramRepetitionValue("a b a b a b", 3).toSeq == Seq(4L, 2L, 4L))
    // all distinct
    assert(ngramRepetitionValue("q w e r t", 3).toSeq == Seq(3L, 1L, 0L))
    // shorter than n
    assert(ngramRepetitionValue("a b", 3).toSeq == Seq(0L, 0L, 0L))
    assert(ngramRepetitionValue("", 4).toSeq == Seq(0L, 0L, 0L))
    val df = Seq(
      (0L, "a b a b a b a b"), // heavy repetition -> dropped
      (1L, "one two three four five six seven eight nine ten eleven twelve")) // clean -> kept
      .toDF("doc_id", "text")
    val out = graft.ops.TextStats.ngramRepetition(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("keep") == 0 &&
      out(0).getAs[Double]("dup_3gram_frac") == 1.0)
    assert(out(1).getAs[Long]("keep") == 1 &&
      out(1).getAs[Double]("top_3gram_frac") < 0.17)
  }

  test("gopherPageRules: alpha/symbol/bullet/ellipsis/stopword rules") {
    val good = "with the quick brown fox we jump over lazy dogs again today"
    val df = Seq(
      (0L, good), // 2 stopwords (with, the), all alpha -> keep
      (1L, "12345 67890 11111 22222 33333 with the"), // alpha frac 2/7 < 0.8
      (2L, "# # # # with the words here"), // 4 symbols / 8 words > 0.1
      (3L, "• one two with\n• three the four\n- five six seven"), // all bullets
      (4L, "fade away with...\nthe end comes…\nplain line"), // 2/3 ellipsis
      (5L, "no stop words here at all"), // 0 of the 8 stopwords
      (6L, "")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.gopherPageRules(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("keep") == 1 && out(0).getAs[Long]("n_stopwords") == 2)
    assert(out(1).getAs[Long]("keep") == 0 &&
      out(1).getAs[Double]("alpha_word_frac") < 0.8)
    assert(out(2).getAs[Long]("keep") == 0 &&
      out(2).getAs[Double]("symbol_ratio") == 0.5)
    assert(out(3).getAs[Long]("keep") == 0 &&
      out(3).getAs[Double]("bullet_line_frac") == 1.0)
    assert(out(4).getAs[Long]("keep") == 0 &&
      out(4).getAs[Double]("ellipsis_line_frac") == 0.666667)
    assert(out(5).getAs[Long]("keep") == 0 && out(5).getAs[Long]("n_stopwords") == 0)
    assert(out(6).getAs[Long]("keep") == 0 && out(6).getAs[Long]("n_words") == 0)
  }

  test("truncateNormalize: unit norm on the kept prefix, zero vec, short vec") {
    import graft.ops.Embeddings.truncateNormalizeValue
    val v = Array(3.0, 4.0, 100.0, -7.0)
    val t2 = truncateNormalizeValue(v, 2)
    assert(math.abs(t2(0) - 0.6) < 1e-12 && math.abs(t2(1) - 0.8) < 1e-12)
    assert(math.abs(t2.map(x => x * x).sum - 1.0) < 1e-12)
    assert(truncateNormalizeValue(Array(0.0, 0.0), 2).toSeq == Seq(0.0, 0.0))
    assert(truncateNormalizeValue(Array(5.0), 3).toSeq == Seq(1.0)) // dims > length
    // column surface matches the kernel bit-for-bit
    val df = Seq((0L, Seq(3.0f, 4.0f, 9.0f))).toDF("id", "embedding")
    val got = df.select(graft.ops.Embeddings.truncateNormalize(col("embedding"), 2))
      .head().getSeq[Double](0)
    assert(got == truncateNormalizeValue(Array(3.0, 4.0), 2).toSeq)
  }

  test("cms term counts: one-sided error, exact at wide sketches, absent terms") {
    val docs = Seq(
      (0L, "alpha beta alpha gamma"),
      (1L, "beta beta delta"),
      (2L, "ALPHA epsilon")).toDF("doc_id", "text") // lowercased by the op
    val truth = Map("alpha" -> 3L, "beta" -> 3L, "gamma" -> 1L,
      "delta" -> 1L, "epsilon" -> 1L, "missing" -> 0L)
    // wide sketch: no collisions plausible -> estimates exact
    val wide = graft.ops.Sketch.cmsTermCounts(docs, "text",
        truth.keys.toSeq, d = 3, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == truth, wide.toString)
    // brutal w=2 sketch: collisions everywhere, but est >= true ALWAYS
    val tiny = graft.ops.Sketch.cmsTermCounts(docs, "text",
        truth.keys.toSeq, d = 2, w = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, c) => assert(tiny(t) >= c, s"$t: ${tiny(t)} < $c") }
    // partition independence
    val rep = graft.ops.Sketch.cmsTermCounts(docs.repartition(5), "text",
        truth.keys.toSeq, d = 3, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == wide)
  }

  test("cms merge: linear — merged shards equal the whole-corpus sketch") {
    val docs = Seq(
      (0L, "alpha beta alpha gamma"),
      (1L, "beta beta delta"),
      (2L, "ALPHA epsilon"),
      (3L, "zeta zeta zeta alpha")).toDF("doc_id", "text")
    val whole = graft.ops.Sketch.cmsTable(docs, "text", d = 3, w = 64)
    val s1 = graft.ops.Sketch.cmsTable(
      docs.filter(col("doc_id") < 2), "text", d = 3, w = 64)
    val s2 = graft.ops.Sketch.cmsTable(
      docs.filter(col("doc_id") >= 2), "text", d = 3, w = 64)
    val merged = graft.ops.Sketch.cmsMerge(s1, s2)
    def counters(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(counters(merged) == counters(whole))
    // shard estimates never exceed the merged estimate (monotone sums)
    val terms = Seq("alpha", "zeta", "missing")
    val em = graft.ops.Sketch.cmsProbe(merged, terms, d = 3, w = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- Seq(s1, s2);
         (t, e) <- graft.ops.Sketch.cmsProbe(s, terms, d = 3, w = 64)
           .collect().map(r => r.getString(0) -> r.getLong(1)))
      assert(e <= em(t), s"$t: shard $e > merged ${em(t)}")
    // three-way merge associativity: merge(merge(s1,s2), s1) counts s1 twice
    val twice = graft.ops.Sketch.cmsMerge(merged, s1)
    val c1 = counters(s1)
    assert(counters(twice) == counters(whole).map { case (k, v) =>
      k -> (v + c1.getOrElse(k, 0L)) })
  }

  test("hll: estimate accuracy, merge linearity, partition invariance, small range") {
    import graft.ops.Hll
    // 50k distinct values sit ABOVE the classic raw-estimator bias band
    // (2.5m..5m, where Flajolet's raw formula runs a few % high and
    // HLL++ applies empirical correction — this implementation is
    // classic HLL, documented as such): there sigma ~1.04/sqrt(4096)
    // = 1.6%, so 5% is a 3-sigma bound (deterministic hash, no flake)
    val vals = (0 until 50000).map(i => s"value-$i").toDF("v")
    val est = Hll.hllCountDistinct(vals, "v").collect().head.getDouble(2)
    assert(math.abs(est - 50000) / 50000 < 0.05, s"est $est")
    // in the 2.5m..5m bias band the raw estimate still lands within 10%
    // (the documented classic-HLL contract there)
    val mid = (0 until 10000).map(i => s"value-$i").toDF("v")
    val midEst = Hll.hllCountDistinct(mid, "v").collect().head.getDouble(2)
    assert(math.abs(midEst - 10000) / 10000 < 0.10, s"mid est $midEst")
    // duplicates don't move the estimate (registers see the same hashes)
    val dup = vals.union(vals).union(vals)
    assert(Hll.hllCountDistinct(dup, "v").collect().head.getDouble(2) == est)
    // merge linearity: per-register max of shard tables == whole-corpus table
    val s1 = vals.filter(length(col("v")) % 2 === 0)
    val s2 = vals.filter(length(col("v")) % 2 === 1)
    def regs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(regs(Hll.hllMerge(Hll.hllRegisters(s1, "v"), Hll.hllRegisters(s2, "v")))
      == regs(Hll.hllRegisters(vals, "v")))
    // partition invariance
    assert(regs(Hll.hllRegisters(vals.repartition(7), "v"))
      == regs(Hll.hllRegisters(vals, "v")))
    // small-range regime (100 distinct << 2.5m): linear counting is
    // near-exact there
    val tiny = (0 until 100).map(i => s"t$i").toDF("v")
    val tinyEst = Hll.hllCountDistinct(tiny, "v").collect().head.getDouble(2)
    assert(math.abs(tinyEst - 100) / 100 < 0.03, s"tiny est $tinyEst")
  }

  test("boilerplate lines: removed everywhere incl. first; thresholds bind") {
    import graft.ops.Dedup
    // domain A: 4 docs share a footer; domain B: 2 docs share one (below minDocs)
    val d = Seq(
      (0L, "a", "unique zero\nFOOTER A"),
      (1L, "a", "unique one\nFOOTER A"),
      (2L, "a", "unique two\nFOOTER A"),
      (3L, "a", "unique three\nFOOTER A\nrare line"),
      (4L, "a", "no footer here"),
      (10L, "b", "b text ten\nFOOTER B"),
      (11L, "b", "b text eleven\nFOOTER B"))
      .toDF("id", "dom", "text")
    val out = Dedup.removeBoilerplateLines(d, "text", "id", "dom",
        minDocs = 3, minDocFrac = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // FOOTER A in 4/5 of domain a → removed from ALL FOUR (first included)
    (0L to 2L).foreach(i => assert(out(i)._2 == s"unique ${Seq("zero","one","two")(i.toInt)}", out(i).toString))
    assert(out(3L) == (2L, "unique three\nrare line"))
    assert(out(4L) == (1L, "no footer here"))
    // FOOTER B only in 2 docs < minDocs=3 → kept despite 100% frac
    assert(out(10L) == (2L, "b text ten\nFOOTER B"))
    // a line must clear BOTH thresholds (frac alone not enough)
    val big = (0 until 20).map(i => (i.toLong, "c", s"body $i\nCOMMON"))
      .toDF("id", "dom", "text")
    val out2 = Dedup.removeBoilerplateLines(big, "text", "id", "dom",
        minDocs = 3, minDocFrac = 0.5)
      .collect().map(r => r.getString(2))
    assert(out2.forall(!_.contains("COMMON")))
    // doc that is ALL boilerplate disappears
    val all = (0 until 5).map(i => (i.toLong, "d", "ONLY FOOTER")).toDF("id", "dom", "text")
    assert(Dedup.removeBoilerplateLines(all, "text", "id", "dom",
      minDocs = 3, minDocFrac = 0.5).count() == 0)
  }

  test("corpus card: metrics, entropy bounds, uniform-mix entropy") {
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon", "s1"),
      (1L, "alpha beta gamma delta epsilon", "s1"), // exact dup
      (2L, "one two three four five six", "s2"),
      (3L, "shorty", "s2")).toDF("id", "text", "src")
    val card = TextStats.corpusCard(d, "text", "id", "src")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("n_docs") == 4.0 && card("n_tokens") == 17.0)
    assert(card("dup_frac") == 0.25)           // 3 distinct of 4
    assert(card("short_doc_frac") == 0.25)     // "shorty"
    assert(card("mean_doc_tokens") == 4.25)
    // two equal sources → ln 2 (to the grain)
    assert(math.abs(card("source_entropy") - math.log(2)) < 1e-6, card.toString)
    // single source → exactly 0 (p=1 → term ln 1 = 0)
    val one = TextStats.corpusCard(d.withColumn("src", lit("only")),
      "text", "id", "src").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(one("source_entropy") == 0.0)
    // empty corpus: all-zero card, no null/NaN
    val empty = TextStats.corpusCard(d.filter(lit(false)), "text", "id", "src")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(empty.values.forall(v => v == 0.0), empty.toString)
  }

  test("histogram sketch: bucketing edges, merge linearity, quantile accuracy") {
    import graft.ops.Sketch
    val vals = ((1 to 100).map(_.toDouble) ++ Seq(-5.0, 250.0)).toDF("v")
    // lo=0 hi=200 buckets=20 → width 10; -5 underflows, 250 overflows
    val h = Sketch.histTable(vals, "v", 0, 200, 20)
    val m = h.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m(-1) == 1 && m(20) == 1)
    assert(m(0) == 9)  // 1..9 (10 goes to bucket 1 — floor(10/10)=1)
    assert(m(1) == 10) // 10..19
    assert(m.collect { case (k, v) if k >= 0 && k < 20 => v }.sum == 100)
    // merge linearity: parity shards sum to the whole
    val h1 = Sketch.histTable(vals.filter(col("v").cast("int") % 2 === 0), "v", 0, 200, 20)
    val h2 = Sketch.histTable(vals.filter(col("v").cast("int") % 2 =!= 0), "v", 0, 200, 20)
    val merged = Sketch.histMerge(h1, h2).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == m)
    // median of 1..100 (in-range): nearest rank 50 → inside bucket 4
    // (values 40..49, cum_before 39): est = 40 + 10*(50-39)/10? bucket 4
    // holds 40..49 → est = 0 + 10*(4 + (50-39)/10) = 51.0
    val q = Sketch.histQuantile(h, 0.5, 0, 200, 20).collect().head
    assert(q.getLong(0) == 100)
    assert(math.abs(q.getDouble(1) - 51.0) < 1e-9, q.toString)
    // the estimate lands within one bucket width of the exact median
    assert(math.abs(q.getDouble(1) - 50.5) <= 10.0)
  }

  test("cdc chunks: reassembly, short/blank docs, boundary realignment") {
    import graft.ops.TextStats
    def norm(s: String) = s.trim.split("\\s+").mkString(" ")
    val text = (0 until 200).map(i => s"tok${i * 7 % 97}").mkString("  ")
    val chunks = TextStats.cdcChunksValue(text, 5, 8)
    // chunks re-join to the ws-normalized text, nothing lost or reordered
    assert(chunks.mkString(" ") == norm(text))
    assert(chunks.length >= 5, s"expected several chunks, got ${chunks.length}")
    // blank → nothing; shorter than one window → one whole chunk
    assert(TextStats.cdcChunksValue("   ", 5, 8).isEmpty)
    assert(TextStats.cdcChunksValue("a  b c", 5, 8).toSeq == Seq("a b c"))
    // content-defined realignment: the same suffix behind two DIFFERENT
    // prefixes chunks identically once past the first shared boundary —
    // the property fixed-stride chunking lacks
    val shared = (0 until 150).map(i => s"s$i").mkString(" ")
    val a = TextStats.cdcChunksValue("one two three " + shared, 5, 8)
    val b = TextStats.cdcChunksValue("four five six seven eight nine " + shared, 5, 8)
    assert(a.length >= 4 && b.length >= 4)
    assert(a.takeRight(3).toSeq == b.takeRight(3).toSeq,
      s"tails diverged:\n${a.takeRight(3).toSeq}\n${b.takeRight(3).toSeq}")
    // SQL surface agrees with the kernel (both registration paths share
    // allFunctions, so install() coverage covers spark.sql.extensions)
    graft.spark.GraftExtensions.install(spark)
    val viaSql = spark.sql("SELECT graft_cdc_chunks('a b  c', 5, 8) AS c")
      .head().getSeq[String](0)
    assert(viaSql == TextStats.cdcChunksValue("a b  c", 5, 8).toSeq)
  }

  test("histAuto: fitted range covers everything, no under/overflow") {
    import graft.ops.Sketch
    val vals = (1 to 100).map(_.toDouble).toDF("v")
    val (lo, hi, h) = Sketch.histAuto(vals, "v", 10)
    assert(lo == 1.0 && hi > 100.0 && hi < 100.0001)
    val m = h.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(!m.contains(-1) && !m.contains(10))   // nothing out of range
    assert(m.values.sum == 100)
    // all-equal column: one bucket holds everything
    val flat = Seq.fill(7)(3.25).toDF("v")
    val (flo, fhi, fh) = Sketch.histAuto(flat, "v", 4)
    assert(flo == 3.25 && fhi == 4.25)
    assert(fh.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap == Map(0 -> 7L))
    // empty: documented (0,1) range, empty table
    val (elo, ehi, eh) = Sketch.histAuto(Seq.empty[Double].toDF("v"), "v", 4)
    assert(elo == 0.0 && ehi == 1.0 && eh.count() == 0)
  }

  test("cdc delta dedup: corpus-owned chunks drop from the delta only") {
    import graft.ops.Dedup
    val shared = (0 until 150).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (0L, "corpus head " + shared),
      (1L, "another corpus doc entirely")).toDF("doc_id", "text")
    val dShared = (0 until 60).map(i => s"d$i").mkString(" ")
    val delta = Seq(
      (10L, "delta head " + shared),      // loses the corpus-shared interior
      (11L, "fresh delta content only"),  // untouched
      (12L, "x y " + dShared),            // owns dShared chunks
      (13L, "p q " + dShared)             // loses them to 12 (intra-delta)
    ).toDF("doc_id", "text")
    val out = Dedup.cdcDedupDelta(corpus, delta, "text", "doc_id",
        window = 5, divisor = 8)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(10L).startsWith("delta head"))
    assert(out(10L).length < ("delta head " + shared).length)
    assert(out(11L) == "fresh delta content only")
    assert(out(12L) == "x y " + dShared)  // first intra-delta occurrence keeps all
    assert(out(13L).length < ("p q " + dShared).length)
    // corpus ids never appear — only the cleaned delta returns
    assert(out.keySet.forall(_ >= 10L))
  }

  test("round-8 ops degrade cleanly on an empty corpus") {
    import graft.ops.{Dedup, Packing, Sampling, Sketch, Skew}
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.cdcChunkTable(empty, "text", "doc_id").count() == 0)
    assert(Dedup.cdcDedupDocs(empty, "text", "doc_id").count() == 0)
    assert(Dedup.cdcChunkPairs(empty, "text", "doc_id").count() == 0)
    assert(Sampling.trainingOrder(empty, "doc_id").count() == 0)
    assert(Packing.packSequences(empty, "text", "doc_id", 16).count() == 0)
    assert(Skew.skewReport(empty, "text").count() == 0)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.crossSourceDupMatrix(noPairs, empty, "doc_id", "text")
      .count() == 0)
    val noVals = Seq.empty[(Double, Long)].toDF("v", "doc_id")
    assert(Sketch.histTable(noVals, "v", 0, 10, 5).count() == 0)
    assert(Sketch.histQuantile(
      Sketch.histTable(noVals, "v", 0, 10, 5), 0.5, 0, 10, 5).count() == 0)
  }

  test("cdc chunk pairs: containment flags embedded docs, strangers stay apart") {
    import graft.ops.Dedup
    val shared = (0 until 150).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (0L, "alpha beta gamma " + shared),
      (1L, shared),                              // wholly embedded in 0 and 2
      (2L, "delta epsilon zeta eta " + shared),
      (3L, (0 until 80).map(i => s"z$i").mkString(" "))  // stranger
    ).toDF("doc_id", "text")
    val pairs = Dedup.cdcChunkPairs(docs, "text", "doc_id",
        window = 5, divisor = 8, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // doc 1 is (almost) wholly contained in 0 and 2 — containment near 1
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L))._2 >= 0.8,
      pairs.toString)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L))._2 >= 0.8)
    assert(pairs.contains((0L, 2L)))   // they share the interior chunks too
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("cdc dedup: shared passage keeps first occurrence, full dup drops") {
    import graft.ops.Dedup
    val shared = (0 until 150).map(i => s"s$i").mkString(" ")
    val uniq2 = (0 until 40).map(i => s"u${i}").mkString(" ")
    val docs = Seq(
      (0L, "one two three " + shared),            // owns the shared chunks
      (1L, uniq2 + " " + shared),                 // loses realigned shared chunks
      (2L, "totally unrelated standalone text"),  // untouched
      (3L, "one two three " + shared)             // full dup of doc 0 → all owned elsewhere
    ).toDF("doc_id", "text")
    val out = Dedup.cdcDedupDocs(docs, "text", "doc_id", window = 5, divisor = 8)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    val byId = out.map(t => t._1 -> t).toMap
    // doc 0 first: keeps everything (ws-normalized)
    assert(byId(0L)._3 == ("one two three " + shared))
    // doc 1 keeps its unique head, loses the shared tail chunks that
    // realigned with doc 0's (the boundary-straddling chunk may survive)
    assert(byId(1L)._3.startsWith(uniq2))
    assert(byId(1L)._3.length < (uniq2 + " " + shared).length)
    // doc 2 untouched; doc 3 fully deduplicated away
    assert(byId(2L)._3 == "totally unrelated standalone text")
    assert(!byId.contains(3L))
    // rebuild kernel: no drops == plain chunk re-join; drops match filter
    val chunks = graft.ops.TextStats.cdcChunksValue(shared, 5, 8)
    val (n0, t0) = Dedup.chunkDropRebuildValue(shared, Array.empty, 5, 8)
    assert(n0 == chunks.length && t0 == chunks.mkString(" "))
    val (n1, t1) = Dedup.chunkDropRebuildValue(shared, Array(0, 2), 5, 8)
    val kept = chunks.zipWithIndex.collect { case (c, i) if i != 0 && i != 2 => c }
    assert(n1 == kept.length && t1 == kept.mkString(" "))
  }

  test("pack sequences: exact lengths, byte-faithful reassembly, straddling docs") {
    import graft.ops.Packing
    val docs = Seq(
      (0L, "a b c"),          // 3 tokens
      (1L, "d e f g h i j"),  // 7 → straddles seqs 0→1 and 1→2
      (2L, "   "),            // whitespace-only → dropped
      (3L, "k l m")           // 3 → ends in partial seq 2
    ).toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "text", "doc_id", seqTokens = 5)
      .orderBy(col("seq_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // 13 tokens → seqs of 5,5,3
    assert(out.toSeq == Seq(
      (0L, 5L, "a b c d e"),
      (1L, 5L, "f g h i j"),
      (2L, 3L, "k l m")))
    // concatenation in seq order == corpus in id order (ws-normalized)
    assert(out.map(_._3).mkString(" ") == "a b c d e f g h i j k l m")
    // partitioning invariance (the offsets' pin extends to the writer)
    val again = Packing.packSequences(docs.repartition(5), "text", "doc_id", 5)
      .orderBy(col("seq_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(again.toSeq == out.toSeq)
    // EOS separator: every non-blank doc contributes its tokens + <eos>;
    // blank docs stay dropped and contribute no separator
    val sep = Packing.packSequences(docs, "text", "doc_id", 4, sepToken = "<eos>")
      .orderBy(col("seq_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(sep.map(_._3).mkString(" ") ==
      "a b c <eos> d e f g h i j <eos> k l m <eos>")
    assert(sep.forall(s => s._2 == 4L || s == sep.last))
  }

  test("cdc chunks property: reassembly and drop-rebuild over random corpora") {
    import graft.ops.{Dedup, TextStats}
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 50) {
      val n = rnd.nextInt(120)
      val glue = if (rnd.nextBoolean()) " " else "  "
      val text = (0 until n).map(_ => s"t${rnd.nextInt(30)}").mkString(glue)
      val w = 1 + rnd.nextInt(6)
      val div = 1L << (1 + rnd.nextInt(5))
      val chunks = TextStats.cdcChunksValue(text, w, div)
      val norm = text.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(chunks.mkString(" ") == norm, s"w=$w div=$div n=$n")
      val drops = (0 until chunks.length).filter(_ => rnd.nextBoolean()).toArray
      val (nk, t2) = Dedup.chunkDropRebuildValue(text, drops, w, div)
      val kept = chunks.zipWithIndex.collect {
        case (c, i) if !drops.contains(i) => c
      }
      assert(nk == kept.length && t2 == kept.mkString(" "), s"w=$w div=$div")
    }
  }

  test("training order: dense ranks, partitioning-invariant, domains interleave") {
    import graft.ops.Sampling
    val rows = (0 until 400).map(i => (i.toLong, if (i < 300) "big" else "small"))
    val df = rows.toDF("doc_id", "domain")
    val ranks = Sampling.trainingOrder(df, "doc_id", "s").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.values.toSeq.sorted == (1L to 400L))
    // partitioning invariance: base-offset + local-rank telescopes the same
    val again = Sampling.trainingOrder(df.repartition(7), "doc_id", "s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == ranks)
    // reference order: md5(id || salt) ascending, driver-computed
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val ref = rows.map(_._1).sortBy(id => md5hex(id.toString + "s"))
      .zipWithIndex.map { case (id, i) => id -> (i + 1).toLong }.toMap
    assert(ranks == ref)
    // interleaving: a 75%-dominant domain never forms long blocks in
    // rank order (geometric runs; a blocked layout would run 300 deep)
    val domainOf = rows.toMap
    val seq = ranks.toSeq.sortBy(_._2).map(t => domainOf(t._1))
    val maxRun = seq.foldLeft((0, 0, "")) { case ((best, cur, prev), d) =>
      val c = if (d == prev) cur + 1 else 1
      (math.max(best, c), c, d)
    }._1
    assert(maxRun <= 60, s"max same-domain run $maxRun")
  }

  test("SQL surface: newly registered graft_* kernels agree with the kernels") {
    graft.spark.GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT graft_window_hashes('a b c d e f g', 5) AS wh," +
        " graft_cosine(array(1D, 0D), array(1D, 0D)) AS cos," +
        " graft_compression_ratio('aaaaaaaaaaaaaaaaaaaa') AS cr," +
        " graft_ngram_repetition('a b a b', 2) AS nr," +
        " graft_truncate_norm(array(3D, 4D, 12D), 2) AS tn").head()
    assert(r.getSeq[Long](0) ==
      graft.ops.TextStats.windowHashesValue("a b c d e f g", 5).toSeq)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) < 1.0 && r.getDouble(2) > 0.0)
    assert(r.getSeq[Long](3) ==
      graft.ops.TextStats.ngramRepetitionValue("a b a b", 2).toSeq)
    assert(r.getSeq[Double](4).zip(Seq(0.6, 0.8))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("ivf refine: full-corpus rounds recover a cluster bad init misses, " +
      "deterministic, search stays exact") {
    import graft.ops.Similarity
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    def unit(x: Array[Double]) = {
      val n = math.sqrt(dot(x, x)); x.map(_ / n)
    }
    val a = Array(1.0, 0.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 0.0, 0.0)
    def jitter(base: Array[Double], i: Int) = {
      val eps = 0.02 * ((i % 7) - 3)
      val v = base.clone; v(2) += eps; v(3) -= eps / 2; v
    }
    val rows = (0 until 200).map(i =>
      (i.toLong, (if (i < 100) jitter(a, i) else jitter(b, i)).toSeq))
    val df = rows.toDF("id", "vec")
    // degenerate init: BOTH centroids inside cluster A — the failure mode
    // head-of-corpus sampling produces on an ingestion-ordered corpus
    val bad = Similarity.IvfModel(
      Array(unit(jitter(a, 0)), unit(jitter(a, 1))), Array(0.0, 0.0))
    val refined = Similarity.ivfRefine(df, "vec", "id", bad, iters = 3)
    val sims = refined.centroids.map(c => (dot(c, a), dot(c, b)))
    // one centroid converged onto each true center
    assert(sims.exists(s => s._1 > 0.99 && s._2 < 0.1), sims.toSeq.toString)
    assert(sims.exists(s => s._2 > 0.99 && s._1 < 0.1), sims.toSeq.toString)
    // balanced assignment after refinement: 100 vectors per cluster
    val counts = df.select(Similarity.ivfAssign(col("vec"), refined).as("c"))
      .groupBy("c").count().collect().map(_.getLong(1)).sorted.toSeq
    assert(counts == Seq(100L, 100L), counts.toString)
    // grained sums → bit-identical centroids on a repeated run
    val again = Similarity.ivfRefine(df, "vec", "id", bad, iters = 3)
    assert(refined.centroids.flatten.toSeq == again.centroids.flatten.toSeq)
    // exactness is radius-carried: refined-model search == brute force
    val q = unit(jitter(b, 5))
    val viaIvf = Similarity.ivfTopK(df, "vec", "id", q, 5, refined, probe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val brute = Similarity.bruteForceTopK(df, "vec", "id", q, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(viaIvf == brute)
    // a centroid no vector assigns to keeps its position (never NaNs)
    val farOff = Array(0.0, 0.0, 0.0, -1.0)
    val withEmpty = Similarity.IvfModel(
      Array(unit(a.clone), unit(b.clone), farOff), Array(0.0, 0.0, 0.0))
    val r2 = Similarity.ivfRefine(df, "vec", "id", withEmpty, iters = 2)
    assert(r2.centroids(2).toSeq == farOff.toSeq)
    assert(r2.centroids.flatten.forall(v => !v.isNaN))
  }

  test("cross-source dup matrix: triangle cells, pair counts, distinct docs") {
    import graft.ops.Dedup
    val meta = Seq(
      (0L, "cc"), (1L, "wiki"), (2L, "cc"), (3L, "books"), (4L, "wiki"))
      .toDF("doc_id", "source")
    // pairs: cc↔wiki twice (0-1, 1-2 share doc 1), cc↔cc once, books↔wiki once
    val pairs = Seq((0L, 1L), (2L, 1L), (0L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val m = Dedup.crossSourceDupMatrix(pairs, meta, "doc_id", "source")
      .orderBy(col("source_lo"), col("source_hi")).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(m(("cc", "wiki")) == ((2L, 3L)))   // pairs (0,1),(2,1); docs {0,1,2}
    assert(m(("cc", "cc")) == ((1L, 2L)))     // pair (0,2)
    assert(m(("books", "wiki")) == ((1L, 2L)))
    assert(m.size == 3)
  }

  test("skew report: heavy keys ranked, profile stats, null-key group") {
    import graft.ops.Skew
    // 50×"a", 10×"b", 5×null, 1 each of c..g → 8 key groups, 70 rows
    val rows = (Seq.fill(50)("a") ++ Seq.fill(10)("b") ++
      Seq.fill(5)(null.asInstanceOf[String]) ++ Seq("c", "d", "e", "f", "g"))
    val df = rows.toDF("k")
    val rep = Skew.skewReport(df, "k", topK = 3).orderBy(col("rank")).collect()
    assert(rep.length == 3)
    val top = rep.map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(top.toSeq == Seq((1, "a", 50L), (2, "b", 10L), (3, "<null>", 5L)))
    val head = rep.head
    assert(head.getLong(4) == 8L && head.getLong(5) == 70L) // n_keys, n_rows
    assert(head.getLong(6) == 50L)                          // max_rows
    assert(math.abs(head.getDouble(7) - 70.0 / 8) < 1e-4)   // mean_rows
    assert(math.abs(head.getDouble(10) - 50.0 / head.getDouble(7)) < 1e-4)
    assert(math.abs(head.getDouble(3) - 50.0 / 70) < 1e-4)  // share
    // ties on count break by key string ascending — partition-stable
    val tied = Seq("x", "y", "z").flatMap(k => Seq.fill(4)(k)).toDF("k")
      .repartition(7)
    val t = Skew.skewReport(tied, "k", topK = 2).orderBy(col("rank"))
      .collect().map(_.getString(1)).toSeq
    assert(t == Seq("x", "y"))
  }

  test("hll estimate on an empty corpus: linear counting gives 0, not null") {
    import graft.ops.Hll
    val none = Seq.empty[String].toDF("v")
    val r = Hll.hllCountDistinct(none, "v").collect().head
    assert(r.getLong(0) == 4096 && !r.isNullAt(2) && r.getDouble(2) == 0.0,
      r.toString)
  }

  test("corpus snapshot diff and contamination overlap") {
    import graft.ops.Snapshot
    val before = Seq((0L, "alpha beta"), (1L, "gamma delta"), (2L, "epsilon zeta"))
      .toDF("id", "text")
    val after = Seq((0L, "alpha beta"), (1L, "gamma delta CHANGED"), (3L, "brand new"))
      .toDF("id", "text")
    val diff = Snapshot.corpusDiff(before, after, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(0L -> "unchanged", 1L -> "changed", 2L -> "removed",
      3L -> "added"), diff.toString)

    val corpus = Seq((0L, "one two three four five six seven")).toDF("id", "text")
    // bench doc shares the 5-window "two three four five six" family with
    // the corpus plus windows the corpus lacks
    val bench = Seq((0L, "two three four five six unseen1 unseen2 unseen3"))
      .toDF("id", "text")
    val rep = Snapshot.overlapReport(corpus, bench, "text", window = 5)
      .collect().head
    // corpus: 3 windows; bench: 4 windows, 2 shared ("two..six", "three..unseen1"? no —
    // shared = windows present in corpus: "two three four five six" only
    assert(rep.getLong(0) == 3 && rep.getLong(1) == 4)
    assert(rep.getLong(2) == 1 && rep.getDouble(3) == 0.25, rep.toString)
    // fully-contained bench → overlap 1.0
    val contained = Snapshot.overlapReport(corpus, corpus, "text", window = 5)
      .collect().head
    assert(contained.getDouble(3) == 1.0)
    // windowless bench → 0.0, not NaN
    val short = Snapshot.overlapReport(corpus,
      Seq((0L, "too short")).toDF("id", "text"), "text", window = 5).collect().head
    assert(short.getLong(1) == 0 && short.getDouble(3) == 0.0)
  }

  test("kl divergence report: zero on itself, positive under drift, invariant") {
    import graft.ops.Lm
    // single-domain corpus: P_domain == P_corpus cell-for-cell → exactly 0
    val one = Seq((0L, "a", "alpha beta gamma delta"),
      (1L, "a", "alpha beta beta epsilon")).toDF("id", "dom", "text")
    val k1 = Lm.klDivergenceReport(one, "dom", "text").collect()
    assert(k1.length == 1 && k1.head.getDouble(2) == 0.0, k1.toSeq.toString)
    // drifted domain scores higher than an on-mix domain
    val mixed = ((0 until 40).map(i => (i.toLong, "news", "the market rose today on strong earnings reports")) ++
      (40 until 80).map(i => (i.toLong, "also_news", "the market fell today on weak earnings reports")) ++
      (80 until 90).map(i => (i.toLong, "code", "def fn ( x ) : return x * x + 1 # comment"))
      ).toDF("id", "dom", "text")
    val kl = Lm.klDivergenceReport(mixed, "dom", "text").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl("code") > kl("news"), kl.toString)
    assert(kl.values.forall(_ >= 0.0), kl.toString)
    // partition invariance (the grained-sum contract)
    val rep = Lm.klDivergenceReport(mixed.repartition(7), "dom", "text").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rep == kl)
  }

  test("leakageSafeSplit: clusters land whole; untouched rows match assignSplit") {
    // two 3-doc near-dup clusters + 94 singletons
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val alt = "vector search with quantized codes beats brute force at scale"
    val docs = ((0 until 94).map(i => (i.toLong, s"unique document number $i about topic $i")) ++
      Seq((100L, base), (101L, base + " x"), (102L, base + " y"),
        (200L, alt), (201L, alt + " x"), (202L, alt + " y"))).toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.5)
    // sanity: the two trios are the only near-dup structure
    val pairIds = pairs.collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pairIds == Set(100L, 101L, 102L, 200L, 201L, 202L), pairIds.toString)
    val out = graft.ops.Sampling.leakageSafeSplit(docs, pairs, "doc_id", salt = "lk")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 100)
    // each cluster: one split for all members
    assert(Set(out(100L), out(101L), out(102L)).size == 1)
    assert(Set(out(200L), out(201L), out(202L)).size == 1)
    // untouched rows: byte-identical to plain assignSplit on own id
    val plain = graft.ops.Sampling.assignSplit(docs, "doc_id", salt = "lk")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 94L).foreach(i => assert(out(i) == plain(i), s"row $i moved"))
    // and cluster members follow the REPRESENTATIVE's (min id) own-id split
    assert(out(100L) == plain(100L) && out(200L) == plain(200L))
  }

  test("sampleExactPerGroup: exact k per stratum, stable under growth") {
    val df = (0L until 100L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "g")
    val out = graft.ops.Sampling.sampleExactPerGroup(df, "id", "g", k = 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.count(_._2 == "a") == 7 && out.count(_._2 == "b") == 7)
    // small group keeps everything
    val tiny = graft.ops.Sampling.sampleExactPerGroup(
      df.filter(col("id") < 5), "id", "g", k = 7).count()
    assert(tiny == 5)
    // growth stability: adding rows displaces at most one pick per group
    val grown = (0L until 120L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "g")
    val out2 = graft.ops.Sampling.sampleExactPerGroup(grown, "id", "g", k = 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val kept = out.toSet.intersect(out2)
    assert(kept.size >= out.length - 2, s"unstable: ${out.toSet.diff(out2)}")
    // deterministic across partitionings
    val rep = graft.ops.Sampling.sampleExactPerGroup(
      df.repartition(7), "id", "g", k = 7)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rep == out.toSet)
  }

  test("filterByGroupQuantile: per-group median cut, side flip, null contracts") {
    val df = Seq(
      (0L, "en", java.lang.Long.valueOf(10L)), (1L, "en", java.lang.Long.valueOf(20L)),
      (2L, "en", java.lang.Long.valueOf(30L)), (3L, "en", java.lang.Long.valueOf(40L)),
      (4L, "de", java.lang.Long.valueOf(5L)), (5L, "de", java.lang.Long.valueOf(100L)),
      (6L, "en", null.asInstanceOf[java.lang.Long]),
      (7L, "xx", null.asInstanceOf[java.lang.Long])).toDF("id", "g", "score")
      .withColumnRenamed("g", "lang")
    val out = graft.ops.Sampling.filterByGroupQuantile(df, "score", "lang", 0.5)
      .orderBy("id").collect()
    // en median of 10,20,30,40 = 25 -> 10,20 keep
    assert(out(0).getAs[Long]("keep") == 1 && out(1).getAs[Long]("keep") == 1)
    assert(out(2).getAs[Long]("keep") == 0 && out(3).getAs[Long]("keep") == 0)
    assert(out(0).getAs[Double]("threshold") == 25.0)
    // de median of 5,100 = 52.5
    assert(out(4).getAs[Long]("keep") == 1 && out(5).getAs[Long]("keep") == 0)
    // null score and all-null group -> keep 0
    assert(out(6).getAs[Long]("keep") == 0 && out(7).getAs[Long]("keep") == 0)
    // keepBelow=false flips the side (>= so boundary rows survive)
    val hi = graft.ops.Sampling.filterByGroupQuantile(df, "score", "lang", 0.5,
        keepBelow = false).orderBy("id").collect()
    assert(hi(0).getAs[Long]("keep") == 0 && hi(3).getAs[Long]("keep") == 1)
  }

  test("temperature mixture plan: tau=2 boosts the tail, tau=1 is natural") {
    val corpus = Seq(("small", 100L), ("big", 400L)).toDF("domain_col", "toks")
    // tau=2: sqrt weights 10 vs 20 -> 1/3, 2/3 of a 300 budget
    val plan = graft.ops.Sampling.temperatureMixturePlan(corpus, "domain_col",
        col("toks"), temperature = 2.0, budget = 300L, maxEpochs = 1.0)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
    assert(plan(0)._1 == "big" && math.abs(plan(0)._3 - 2.0 / 3) < 1e-6
      && plan(0)._4 == 200L && plan(0)._5 == 200L && plan(0)._6 == 0.5)
    assert(plan(1)._1 == "small" && math.abs(plan(1)._3 - 1.0 / 3) < 1e-6
      && plan(1)._4 == 100L && plan(1)._5 == 100L && plan(1)._6 == 1.0
      && plan(1)._7 == 0L)
    // tau=1 reproduces natural proportions: small gets 0.2 of the mass
    val nat = graft.ops.Sampling.temperatureMixturePlan(corpus, "domain_col",
        col("toks"), temperature = 1.0, budget = 500L)
      .orderBy("domain").collect()
    assert(math.abs(nat(1).getDouble(2) - 0.2) < 1e-6
      && nat(1).getLong(3) == 100L)
    // epoch cap still binds: tiny maxEpochs forces shortfall
    val capped = graft.ops.Sampling.temperatureMixturePlan(corpus, "domain_col",
        col("toks"), temperature = 2.0, budget = 3000L, maxEpochs = 1.0)
      .orderBy("domain").collect()
    assert(capped(1).getLong(4) == 100L && capped(1).getLong(6) > 0L)
    // a domain whose rows all have zero tokens: epochs 0.0 (not null),
    // and the plan still feeds applyMixturePlan without tripping its
    // require (r7 ADVICE)
    val withEmpty = corpus.union(Seq(("empty", 0L)).toDF("domain_col", "toks"))
    val p2 = graft.ops.Sampling.temperatureMixturePlan(withEmpty, "domain_col",
        col("toks"), temperature = 2.0, budget = 300L, maxEpochs = 1.0)
      .orderBy("domain").collect()
    val emptyRow = p2.find(_.getString(0) == "empty").get
    assert(!emptyRow.isNullAt(5) && emptyRow.getDouble(5) == 0.0
      && emptyRow.getLong(4) == 0L)
  }

  test("url canonicalization: case, ports, userinfo, tracking params, non-urls") {
    val df = Seq(
      (0L, "HTTP://Example.COM:80/Path/X?utm_source=a&id=7#frag"),
      (1L, "https://u:p@Sub.Example.org:443/a?utm_a=1&utm_b=2"),
      (2L, "https://example.org"),
      (3L, "http://host.net:8080/x?a=1&fbclid=zz&b=2"),
      (4L, "not a url")).toDF("doc_id", "url")
    val out = df.select(col("doc_id"), graft.ops.Urls.normalize(col("url")),
        graft.ops.Urls.host(col("url")), graft.ops.Urls.registeredDomain(col("url")))
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(out(0) == ("http://example.com/Path/X?id=7", "example.com", "example.com"))
    assert(out(1) == ("https://sub.example.org/a", "sub.example.org", "example.org"))
    assert(out(2) == ("https://example.org/", "example.org", "example.org"))
    assert(out(3) == ("http://host.net:8080/x?a=1&b=2", "host.net", "host.net"))
    assert(out(4) == ("not a url", "", ""))
  }

  test("registered domain: public-suffix-list rules, wildcards, exceptions, fallback") {
    val hosts = Seq(
      (0L, "https://foo.co.uk/x"),          // listed 2-label suffix
      (1L, "https://a.b.foo.co.uk/x"),      // deep subdomain, same answer
      (2L, "https://deep.sub.site.com.au"), // com.au registry
      (3L, "https://user.github.io"),       // private-domain suffix
      (4L, "https://a.user.github.io"),     // subdomain of a github page
      (5L, "https://co.uk"),                // host IS a public suffix -> ""
      (6L, "https://anything.weird.ck"),    // wildcard *.ck
      (7L, "https://www.ck"),               // exception !www.ck -> www.ck
      (8L, "https://sub.example.dev"),      // unlisted TLD -> last-2 fallback
      (9L, "https://bucket.s3.amazonaws.com"))
    val out = hosts.toDF("doc_id", "url")
      .select(col("doc_id"), graft.ops.Urls.registeredDomain(col("url")))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("foo.co.uk", "foo.co.uk", "site.com.au",
      "user.github.io", "user.github.io", "", "anything.weird.ck",
      "www.ck", "example.dev", "bucket.s3.amazonaws.com"))
    // SQL surface matches the column API
    graft.spark.GraftExtensions.install(spark)
    val viaSql = spark.sql(
      "SELECT graft_domain('a.b.foo.co.uk') AS d").head().getString(0)
    assert(viaSql == "foo.co.uk")
    // pure-kernel contracts
    assert(graft.ops.Psl.publicSuffix("foo.co.uk") == "co.uk")
    assert(graft.ops.Psl.publicSuffix("x.anything.ck") == "anything.ck")
    assert(graft.ops.Psl.publicSuffix("www.ck") == "ck")
    assert(graft.ops.Psl.registeredDomain("ck") == "")
  }

  test("pii redaction: masks emails, ips, phones; clean text untouched") {
    val df = Seq(
      (0L, "mail a.user+tag@sub.example.org or root@10.1.2.3 at 10.255.0.1 call +44 555-0199 end"),
      (1L, "no pii here just words"),
      (2L, "two mails x@y.io and z@w.ai")).toDF("doc_id", "text")
    val out = graft.ops.TextClean.redactPii(df, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("n_emails"),
        r.getAs[Long]("n_ips"), r.getAs[Long]("n_phones")))
    // root@10.1.2.3 is NOT an email (TLD must be alpha) -> its host is an IP
    assert(out(0)._1 ==
      "mail <EMAIL> or root@<IP> at <IP> call <PHONE> end")
    assert((out(0)._2, out(0)._3, out(0)._4) == (1L, 2L, 1L))
    assert(out(1)._1 == "no pii here just words" &&
      (out(1)._2, out(1)._3, out(1)._4) == (0L, 0L, 0L))
    assert(out(2)._1 == "two mails <EMAIL> and <EMAIL>" && out(2)._2 == 2L)
  }

  test("cleaning/url ops propagate null text as null (standard SQL contract)") {
    val df = Seq((0L, null.asInstanceOf[String]), (1L, "ok a@b.io"))
      .toDF("doc_id", "text")
    val r = graft.ops.TextClean.redactPii(df, "text").orderBy("doc_id").collect()
    assert(r(0).isNullAt(r(0).fieldIndex("text")) &&
      r(0).isNullAt(r(0).fieldIndex("n_emails")))
    assert(r(1).getAs[String]("text") == "ok <EMAIL>")
    val h = df.select(graft.ops.TextClean.stripHtml(col("text")),
        graft.ops.Urls.normalize(col("text")), graft.ops.Urls.host(col("text")))
      .orderBy(df("doc_id")).collect()
    assert(h(0).isNullAt(0) && h(0).isNullAt(1) && h(0).isNullAt(2))
  }

  test("applyMixturePlan: full copies + fractional epoch, token mass near actual") {
    val df = (0L until 1000L).map(i => (i, if (i < 800) "web" else "code"))
      .toDF("id", "domain")
    // web: 1.5 epochs (one full copy + half), code: 0.25 (sample only)
    val out = graft.ops.Sampling.applyMixturePlan(
      df, "domain", "id", Seq("web" -> 1.5, "code" -> 0.25), salt = "s")
    val counts = out.groupBy("domain", "epoch").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(counts(("web", 0)) == 800L) // full epoch: everything
    val frac = counts(("web", 1))
    assert(frac > 300 && frac < 500, s"~400 expected, got $frac")
    val code = counts(("code", 0))
    assert(code > 20 && code < 90, s"~200*0.25=50 expected, got $code")
    // deterministic: same plan, same salt, same rows
    val again = graft.ops.Sampling.applyMixturePlan(
      df, "domain", "id", Seq("web" -> 1.5, "code" -> 0.25), salt = "s")
      .groupBy("domain", "epoch").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(again == counts)
    // columns preserved + epoch appended
    assert(out.columns.toSeq == Seq("id", "domain", "epoch"))
  }

  test("sentence segmentation + compression ratio: boundaries, repetition signal") {
    val seg = Seq((0L, "First one. Second two! Third? Last"))
      .toDF("id", "text")
      .select(graft.ops.TextStats.sentenceDelimited(col("text")))
      .head().getString(0)
    assert(seg == "First one.\nSecond two!\nThird?\nLast")
    // abbreviation-naive by design: "e.g. x" splits (documented)
    val df = Seq(
      (0L, "spam " * 200),                     // highly repetitive
      (1L, (0 until 200).map(i => s"w$i").mkString(" ")), // diverse
      (2L, ""), (3L, null.asInstanceOf[String])).toDF("id", "text")
    val r = df.select(col("id"),
        graft.ops.TextStats.compressionRatio(col("text")).as("cr"))
      .orderBy("id").collect()
    val (rep, div) = (r(0).getDouble(1), r(1).getDouble(1))
    assert(rep < 0.1 && div > 0.3 && rep < div)
    assert(r(2).isNullAt(1) && r(3).isNullAt(1)) // empty and null → null
    // deterministic across invocations
    val again = df.select(graft.ops.TextStats.compressionRatio(col("text")))
      .orderBy(df("id")).collect()
    assert(again(0).getDouble(0) == rep && again(1).getDouble(0) == div)
  }

  test("mojibake repair inverts one and two rounds of damage; clean text untouched") {
    import graft.ops.TextClean.{fixMojibakeValue, mojibakeDamageValue}
    val orig = "café naïve æther – 汉字 😀 plain ascii tail"
    val once = mojibakeDamageValue(orig)
    val twice = mojibakeDamageValue(once)
    assert(once != orig && twice != once) // damage is real
    assert(fixMojibakeValue(once) == orig)
    assert(fixMojibakeValue(twice) == orig)
    // no false positive: genuine Latin-1-range prose is NOT valid UTF-8
    // when re-encoded, so repair leaves it alone
    assert(fixMojibakeValue(orig) == orig)
    assert(fixMojibakeValue("café résumé") == "café résumé")
    assert(fixMojibakeValue("pure ascii stays") == "pure ascii stays")
    assert(fixMojibakeValue("") == "")
    // column + SQL surfaces agree, null passes through
    val df = Seq((0L, mojibakeDamageValue("naïve 😀")), (1L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = df.select(graft.ops.TextClean.fixMojibake(col("text")))
      .orderBy(df("id")).collect()
    assert(got(0).getString(0) == "naïve 😀" && got(1).isNullAt(0))
    df.createOrReplaceTempView("moji_t")
    graft.spark.GraftExtensions.install(spark)
    val sqlGot = spark.sql("SELECT graft_fix_mojibake(text) FROM moji_t WHERE id = 0")
      .head().getString(0)
    assert(sqlGot == "naïve 😀")
  }

  test("c4Filter: line rules, sentence minimum, page poisons, audit counts") {
    val good = "This sentence is long enough and ends well."
    val page5 = (1 to 5).map(i => s"Good sentence number $i ends here.").mkString("\n")
    val df = Seq(
      (0L, page5), // clean 5-sentence page → kept
      (1L, page5 + "\nno terminal punct line\nShort.\nwe use javascript here."),
      (2L, (1 to 4).map(i => s"Only sentence $i is present here.").mkString("\n")),
      (3L, page5 + "\nSadly lorem ipsum appears here."),
      (4L, page5 + "\nBraces { break pages."),
      (5L, page5 + "\nA SLUR word poisons the page.")).toDF("doc_id", "text")
    val out = graft.ops.TextClean.c4Filter(df, "text", badWords = Seq("slur"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("keep") == 1 && out(0).getAs[Long]("n_sentences") == 5)
    // doc 1: the three bad lines are dropped, page still has its 5 good ones
    assert(out(1).getAs[Long]("keep") == 1)
    assert(out(1).getAs[Long]("n_lines_dropped") == 3)
    assert(out(1).getAs[String]("text") == page5)
    // doc 2: only 4 sentences → dropped, text retained for audit
    assert(out(2).getAs[Long]("keep") == 0 && out(2).getAs[Long]("n_sentences") == 4)
    // docs 3-5: lorem ipsum / brace / bad word (case-insensitive, whole word)
    assert(out(3).getAs[Long]("keep") == 0)
    assert(out(4).getAs[Long]("keep") == 0)
    assert(out(5).getAs[Long]("keep") == 0)
    // whole-word: "slurp" must NOT poison
    val ok = graft.ops.TextClean.c4Filter(
      Seq((0L, page5 + "\nWe slurp soup together tonight.")).toDF("doc_id", "text"),
      "text", badWords = Seq("slur")).head()
    assert(ok.getAs[Long]("keep") == 1)
    assert(good.nonEmpty)
  }

  test("astral-plane safety: emoji/supplementary chars survive normalize, tokens, dedup") {
    // U+1F600 GRINNING FACE (surrogate pair in UTF-16) + U+10348 GOTHIC HWAIR
    val emoji = new String(Character.toChars(0x1F600))
    val hwair = new String(Character.toChars(0x10348))
    val df = Seq(
      (0L, s"hello $emoji world $hwair end"),
      (1L, s"$emoji$emoji\n$emoji$emoji\ntail")).toDF("doc_id", "text")
    // normalize must not mangle supplementary characters (NFC is identity
    // on them; the regex classes must not split surrogate pairs)
    val norm = df.select(graft.ops.TextClean.normalizeUnicode(col("text")))
      .orderBy(df("doc_id")).collect().map(_.getString(0))
    assert(norm(0) == s"hello $emoji world $hwair end")
    // token counting sees them as non-space runs
    val toks = df.select(graft.ops.TextStats.wsTokens(col("text")))
      .orderBy(df("doc_id")).collect().map(_.getInt(0))
    assert(toks(0) == 5)
    // within-doc line dedup on emoji-only lines
    val dd = graft.ops.Dedup.dedupLinesWithinDoc(df, "text")
      .orderBy("doc_id").collect()
    assert(dd(1).getAs[String]("text") == s"$emoji$emoji\ntail")
    // BPE symbols are CODE POINTS: a surrogate pair is one symbol, never
    // two lone surrogates (which couldn't round-trip through UTF-8)
    val model = graft.ops.Bpe.BpeModel(Seq.empty, 0L, 0, 1.0)
    val enc = graft.ops.Bpe.encodeWordValue(s"a$emoji", model.ranks)
    assert(enc.toSeq == Seq("a", emoji, "</w>"))
  }

  test("png codec: pixel-exact round trip across all five filters; gray/RGBA; CRC") {
    import graft.ops.Codecs
    // gradient-ish 5x4 so Sub/Up/Average/Paeth all produce distinct streams
    val rgb = Array.tabulate(5 * 4 * 3)(i => ((i * 7 + i * i % 13) % 256).toByte)
    for (f <- 0 to 4) {
      val png = Codecs.encodePng(5, 4, rgb, filterType = f)
      assert((png(1) & 0xff) == 'P' && (png(0) & 0xff) == 0x89)
      val (w, h, back) = Codecs.decodePng(png)
      assert(w == 5 && h == 4 && back.toSeq == rgb.toSeq, s"filter $f")
    }
    // decodeImage sniffs both formats and resize re-encodes the source one
    val (w2, h2, back2, fmt) = Codecs.decodeImage(Codecs.encodePng(5, 4, rgb, 4))
    assert(w2 == 5 && h2 == 4 && back2.toSeq == rgb.toSeq && fmt == "png")
    assert(Codecs.decodeImage(Codecs.encodeBmp(5, 4, rgb))._4 == "bmp")
    // grayscale and RGBA color types: hand-built PNGs (chunk CRCs and
    // zlib from the JDK, filter 0 rows)
    def buildPng(w: Int, h: Int, colorType: Int, channels: Int,
        px: Array[Byte]): Array[Byte] = {
      def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
        val tb = tag.getBytes("US-ASCII")
        val bb = java.nio.ByteBuffer.allocate(12 + data.length)
        bb.putInt(data.length).put(tb).put(data)
        val c = new java.util.zip.CRC32; c.update(tb); c.update(data)
        bb.putInt(c.getValue.toInt); bb.array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      val stride = w * channels
      val raw = new Array[Byte]((stride + 1) * h)
      for (y <- 0 until h)
        System.arraycopy(px, y * stride, raw, y * (stride + 1) + 1, stride)
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val all = new java.io.ByteArrayOutputStream()
      all.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      all.write(chunk("IHDR", ihdr)); all.write(chunk("IDAT", out.toByteArray))
      all.write(chunk("IEND", Array.empty)); all.toByteArray
    }
    val gray = Array[Byte](10, 20, 30, 40, 50, 60) // 3x2 gray
    val (gw, gh, grgb) = Codecs.decodePng(buildPng(3, 2, 0, 1, gray))
    assert(gw == 3 && gh == 2)
    assert(grgb.toSeq == gray.flatMap(g => Seq(g, g, g)).toSeq) // replicated
    val rgba = Array.tabulate(2 * 2 * 4)(i => (i * 10).toByte)
    val (aw, ah, argb) = Codecs.decodePng(buildPng(2, 2, 6, 4, rgba))
    assert(aw == 2 && ah == 2)
    assert(argb.toSeq == // alpha dropped
      (0 until 4).flatMap(p => Seq(rgba(p * 4), rgba(p * 4 + 1), rgba(p * 4 + 2))))
    // corrupt CRC must be REJECTED, not mis-read
    val good = Codecs.encodePng(5, 4, rgb, 1)
    val bad = good.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x7f).toByte // inside IEND CRC
    intercept[IllegalArgumentException](Codecs.decodePng(bad))
    // truncated IDAT rejected
    intercept[Exception](Codecs.decodePng(good.take(good.length / 2)))
    // non-image rejected by the sniffer
    intercept[IllegalArgumentException](
      Codecs.decodeImage("not an image at all".getBytes))
  }

  test("property: mojibake damage inverts for arbitrary code-point soup; c4 idempotent") {
    import graft.ops.TextClean.{fixMojibakeValue, mojibakeDamageValue}
    // alphabet chosen over the full range: ASCII, Latin-1 accents (whose
    // Latin-1 bytes can never form valid UTF-8 next to these neighbors),
    // BMP CJK, astral emoji, whitespace/punct
    val cps = Array(97, 98, 99, 32, 32, 0xE9, 0xF1, 0x4E49, 0x6C49,
      0x1F600, 0x2026, 10, 9, 46, 63)
    val rnd = new scala.util.Random(42)
    def randString(): String = {
      val sb = new java.lang.StringBuilder
      val n = rnd.nextInt(40)
      var i = 0
      while (i < n) { sb.appendCodePoint(cps(rnd.nextInt(cps.length))); i += 1 }
      sb.toString
    }
    for (_ <- 1 to 300) {
      val s = randString()
      assert(fixMojibakeValue(mojibakeDamageValue(s)) == s, s"once: $s")
      assert(fixMojibakeValue(mojibakeDamageValue(mojibakeDamageValue(s))) == s,
        s"twice: $s")
    }
    // c4Filter is idempotent on its own kept output: kept lines satisfy
    // every line rule, and a kept page satisfies every page rule
    val page = (1 to 6).map(i => s"Idempotent sentence number $i ends here.")
      .mkString("\n") + "\nno punct dropped line"
    val once = graft.ops.TextClean.c4Filter(
      Seq((0L, page)).toDF("doc_id", "text"), "text", badWords = Seq("zzz"))
    val kept = once.where(col("keep") === 1).select("doc_id", "text")
    val twice = graft.ops.TextClean.c4Filter(kept, "text", badWords = Seq("zzz"))
      .head()
    assert(twice.getAs[Long]("keep") == 1)
    assert(twice.getAs[String]("text") == once.head().getAs[String]("text"))
    assert(twice.getAs[Long]("n_lines_dropped") == 0L)
  }

  test("gif codec: LZW round trips incl. table growth; width-crossing stream decodes") {
    import graft.ops.Codecs
    // repetitive indices force LZW table growth (and clear-early resets)
    val pal = Array(Array(255, 0, 0), Array(0, 255, 0), Array(0, 0, 255), Array(9, 9, 9))
    val idx = Array.tabulate(16 * 8)(i => ((i / 3) % 4).toByte) // runs of 3
    val gif = Codecs.encodeGif(16, 8, pal, idx)
    assert(new String(gif.take(6), "ISO-8859-1") == "GIF87a")
    val (w, h, rgb) = Codecs.decodeGif(gif)
    assert(w == 16 && h == 8)
    for (i <- idx.indices) {
      val p = pal(idx(i))
      assert((rgb(i * 3) & 0xff) == p(0) && (rgb(i * 3 + 1) & 0xff) == p(1) &&
        (rgb(i * 3 + 2) & 0xff) == p(2), s"pixel $i")
    }
    // random-ish indices (few table hits) round-trip too
    val idx2 = Array.tabulate(9 * 5)(i => ((i * 7 + i / 9) % 4).toByte)
    val (_, _, rgb2) = Codecs.decodeGif(Codecs.encodeGif(9, 5, pal, idx2))
    assert(rgb2.grouped(3).map(_.map(_ & 0xff).toSeq).toSeq ==
      idx2.map(pal(_).toSeq).toSeq)
    // hand-built stream crossing a width boundary: minCode=2, codes
    // [CLEAR,0,1,6,7,END] with 7 and END read at 4 bits; expected pixels
    // derived by hand: 0 1 01 10 -> [0,1,0,1,1,0]
    val bw = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += width
      while (nAcc >= 8) { bw.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
    }
    put(4, 3); put(0, 3); put(1, 3); put(6, 3); put(7, 4); put(5, 4)
    if (nAcc > 0) bw.write((acc & 0xff).toInt)
    val lzw = bw.toByteArray
    val head = new java.io.ByteArrayOutputStream()
    head.write("GIF87a".getBytes("US-ASCII"))
    head.write(Array[Byte](3, 0, 2, 0)) // 3x2
    head.write(0x80 | 1); head.write(0); head.write(0) // 4-entry palette
    for (p <- Seq(Seq(10, 10, 10), Seq(20, 20, 20), Seq(30, 30, 30), Seq(40, 40, 40));
         v <- p) head.write(v)
    head.write(0x2C); head.write(Array[Byte](0, 0, 0, 0, 3, 0, 2, 0, 0))
    head.write(2) // min code size
    head.write(lzw.length); head.write(lzw); head.write(0); head.write(0x3B)
    val (hw, hh, hrgb) = Codecs.decodeGif(head.toByteArray)
    assert(hw == 3 && hh == 2)
    assert(hrgb.grouped(3).map(_(0) & 0xff).toSeq == Seq(10, 20, 10, 20, 20, 10))
    // sniffer + same-format re-encode
    val (sw2, sh2, srgb, fmt) = Codecs.decodeImage(gif)
    assert(fmt == "gif" && sw2 == 16 && sh2 == 8)
    val re = Codecs.encodeImage(sw2, sh2, srgb, "gif")
    assert(Codecs.decodeGif(re)._3.toSeq == srgb.toSeq)
    intercept[IllegalArgumentException](Codecs.decodeGif("GIFnope!?".getBytes))
  }

  test("bmp codec: byte-exact round trip incl. row padding; resize elects nearest") {
    import graft.ops.Codecs
    // 3x2: stride 12 (9 data + 3 pad) — the padding case
    val rgb = Array.tabulate(3 * 2 * 3)(i => (i * 11 % 256).toByte)
    val bmp = Codecs.encodeBmp(3, 2, rgb)
    assert(bmp(0) == 'B' && bmp(1) == 'M' && bmp.length == 54 + 12 * 2)
    val (w, h, back) = Codecs.decodeBmp(bmp)
    assert(w == 3 && h == 2 && back.toSeq == rgb.toSeq)
    // BGR on disk: first stored pixel is the BOTTOM-LEFT one, reversed
    assert(bmp(54) == rgb(3 * 3 + 2) && bmp(56) == rgb(3 * 3)) // b, r of (0,1)
    // 4x1 (no padding) survives too
    val r2 = Array.tabulate(12)(i => i.toByte)
    assert(Codecs.decodeBmp(Codecs.encodeBmp(4, 1, r2))._3.toSeq == r2.toSeq)
    // nearest-neighbor: 2x upscale replicates pixels, identity resize is a no-op
    val up = Codecs.resizeRgb(2, 1, Array[Byte](1, 2, 3, 4, 5, 6), 4, 1)
    assert(up.toSeq == Seq[Byte](1, 2, 3, 1, 2, 3, 4, 5, 6, 4, 5, 6))
    assert(Codecs.resizeRgb(3, 2, rgb, 3, 2).toSeq == rgb.toSeq)
  }

  test("wav codec: round trip, chunk walking past LIST, malformed rejected") {
    import graft.ops.Codecs
    val samples = Array.tabulate(100)(i => ((i * 523) % 2048 - 1024).toShort)
    val wav = Codecs.encodeWav(8000, samples)
    assert(wav.length == 44 + 200)
    val (sr, back) = Codecs.decodeWav(wav)
    assert(sr == 8000 && back.toSeq == samples.toSeq)
    // a LIST chunk between fmt and data must be skipped, not fatal
    val withList = {
      val head = java.util.Arrays.copyOfRange(wav, 0, 36) // RIFF..fmt chunk
      val listChunk = "LIST".getBytes("ISO-8859-1") ++
        Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("ISO-8859-1")
      val dataChunk = java.util.Arrays.copyOfRange(wav, 36, wav.length)
      val out = head ++ listChunk ++ dataChunk
      val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(4, out.length - 8) // fix RIFF size
      out
    }
    val (sr2, back2) = Codecs.decodeWav(withList)
    assert(sr2 == 8000 && back2.toSeq == samples.toSeq)
    intercept[IllegalArgumentException](Codecs.decodeWav("nope".getBytes))
    intercept[IllegalArgumentException](
      Codecs.decodeBmp(Array[Byte](1, 2, 3)))
  }

  test("y4m codec: round trip, frame parameter lines, non-420 rejected") {
    import graft.ops.Codecs
    val frameSize = 8 * 8 + 2 * 16
    val frames = (0 until 3).map(f =>
      Array.tabulate(frameSize)(i => ((i + f * 7) % 256).toByte))
    val y4m = Codecs.encodeY4m(8, 8, "25:1", frames)
    assert(new String(y4m.take(10), "ISO-8859-1") == "YUV4MPEG2 ")
    val (w, h, back) = Codecs.decodeY4m(y4m)
    assert(w == 8 && h == 8 && back.length == 3)
    assert(back.zip(frames).forall { case (a, b) => a.toSeq == b.toSeq })
    // FRAME lines may carry parameters per spec
    val withParams = {
      val s = new String(y4m, "ISO-8859-1")
      s.replaceFirst("FRAME\n", "FRAME Xcustom\n").getBytes("ISO-8859-1")
    }
    assert(Codecs.decodeY4m(withParams)._3.length == 3)
    // odd dimensions and foreign colorspaces are rejected, not mis-sliced
    intercept[IllegalArgumentException](Codecs.encodeY4m(7, 8, "25:1", Seq.empty))
    val c444 = "YUV4MPEG2 W8 H8 F25:1 C444\n".getBytes("ISO-8859-1")
    intercept[IllegalArgumentException](Codecs.decodeY4m(c444))
  }

  test("corpus report: per-language volume, exact quantiles, dup rate") {
    val df = Seq(
      (0L, "the fast hash join of the table"), // en
      (1L, "the fast hash join of the table"), // exact dup of 0
      (2L, "a tiny doc is here"),              // en
      (3L, "el que la de y los")).toDF("doc_id", "text") // es
    val r = graft.ops.TextStats.corpusReport(df, "text", "doc_id").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("en", "es")) // n_docs desc
    val en = r(0)
    assert(en.getAs[Long]("n_docs") == 3L && en.getAs[Long]("n_tokens") == 19L)
    assert(en.getAs[Long]("n_exact_dups") == 1L)
    assert(en.getAs[Double]("dup_frac") == 0.333333)
    assert(en.getAs[Double]("p50_tokens") == 7.0) // tokens 7,7,5 -> median 7
    val es = r(1)
    assert(es.getAs[Long]("n_docs") == 1L && es.getAs[Long]("n_exact_dups") == 0L)
  }

  test("property: normalizeUnicode is idempotent; vocab/pmi partition-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // idempotence over laced real data: normalize(normalize(x)) == normalize(x)
    val laced = docs.limit(200).withColumn("text",
      concat(lit("\u2018q\u2019 cafe\u0301\u200B "), col("text"), lit("  x")))
    val once = graft.ops.TextClean.normalizeUnicode(col("text"), foldPunct = true)
    val diff = laced
      .select(once.as("a"),
        graft.ops.TextClean.normalizeUnicode(
          graft.ops.TextClean.normalizeUnicode(col("text"), foldPunct = true),
          foldPunct = true).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
    // partitioning must not change vocab/pmi results (grained logs +
    // deterministic cuts are the mechanism under test)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val v1 = canon(graft.ops.Vocab.topKNgrams(docs, "text", n = 2, k = 30, minCount = 2))
    val v2 = canon(graft.ops.Vocab.topKNgrams(docs.repartition(13), "text", n = 2, k = 30, minCount = 2))
    assert(v1 == v2)
    val p1 = canon(graft.ops.Vocab.pmiCollocations(docs, "text", minCount = 3, k = 20))
    val p2 = canon(graft.ops.Vocab.pmiCollocations(docs.repartition(7), "text", minCount = 3, k = 20))
    assert(p1 == p2)
  }

  test("nb quality-model fit: hand-computed log-odds; composes with linearTextScore") {
    val pos = Seq((0L, "good clean prose text"), (1L, "clean prose again")).toDF("id", "text")
    val neg = Seq((2L, "spam spam buy now"), (3L, "buy spam")).toDF("id", "text")
    val w = graft.ops.Retrieval.fitNbWeights(pos, neg, "text",
        alpha = 0.5, minCount = 1L, k = 100)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // totals: npos=7, nneg=6, distinct terms = 8 -> v=9
    val (npos, nneg, v) = (7.0, 6.0, 9.0)
    def expect(cp: Long, cn: Long): Double = {
      val w9 = math.floor((math.log((cp + 0.5) / (npos + 0.5 * v)) -
        math.log((cn + 0.5) / (nneg + 0.5 * v))) * 1e9).toLong
      (BigDecimal(w9) / BigDecimal(1000000000L))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(w("spam")._1 == 0L && w("spam")._2 == 3L)
    assert(w("spam")._3 == expect(0, 3))
    assert(w("clean")._3 == expect(2, 0))
    assert(w("clean")._3 > 0 && w("spam")._3 < 0 && w("buy")._3 < 0)
    // serving composition: the trained weights separate the corpora
    val weights = graft.ops.Retrieval.fitNbWeights(pos, neg, "text",
        alpha = 0.5, minCount = 1L, k = 100)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toSeq
    val scored = graft.ops.Retrieval.linearTextScore(
        pos.unionByName(neg), "text", "id", weights)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(0L) > 0 && scored(1L) > 0 && scored(2L) < 0 && scored(3L) < 0)
  }

  test("domain blocklist: PSL-resolved removal, non-URLs kept, table variant agrees") {
    val df = Seq(
      // PSL: registeredDomain("a.spam.example.co.uk") = example.co.uk
      (0L, "https://a.spam.example.co.uk/x"),
      (1L, "https://sub.bad.net/y"),
      (2L, "https://good.org/z"),
      (3L, "plain text"),
      (4L, null: String)).toDF("id", "url") // null url: not named -> kept
    val kept = graft.ops.Urls.filterBlockedDomains(df, "url",
        Seq("example.co.uk", "bad.net"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
    val blocklist = Seq("example.co.uk", "bad.net").toDF("domain")
    val kept2 = graft.ops.Urls.filterBlockedDomainsDf(df, "url", blocklist)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
    // the table variant must not reorder/drop other columns
    assert(graft.ops.Urls.filterBlockedDomainsDf(df, "url", blocklist)
      .columns.toSeq == Seq("id", "url"))
  }

  test("semdedup: drops exactly the brute-force within-cluster >=tau set, min id kept") {
    // three well-separated directions in R^4, near-identical copies in each
    def jit(base: Array[Double], eps: Double): Seq[Double] =
      base.toIndexedSeq.zipWithIndex.map { case (x, i) => x + (if (i == 3) eps else 0.0) }
    val ex = Array(1.0, 0.02, 0.0, 0.0)
    val ey = Array(0.0, 1.0, 0.03, 0.0)
    val ez = Array(0.01, 0.0, 1.0, 0.0)
    val rows = Seq(
      (0L, jit(ex, 0.0)), (1L, jit(ex, 0.01)), (2L, jit(ex, 0.02)), // x-group
      (10L, jit(ey, 0.0)), (11L, jit(ey, 0.015)),                   // y-group
      (20L, jit(ez, 0.0)), (21L, jit(ez, 0.01)), (22L, jit(ez, 0.4))) // 22 far
    val df = rows.toDF("id", "v")
    val tau = 0.999
    val model = graft.ops.Similarity.ivfFit(df, "v", "id", nClusters = 3)
    val kept = graft.ops.Dedup.semDedupAssigned(df, "v", "id", model, tau)
      .select("id").collect().map(_.getLong(0)).toSet
    // brute-force expectation from the model's own assignments
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val assign = df.select(col("id"),
        graft.ops.Similarity.ivfAssign(col("v"), model).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expectedDrops = (for {
      (ia, va) <- rows; (ib, vb) <- rows
      if ia < ib && assign(ia) == assign(ib) && cos(va, vb) >= tau
    } yield ib).toSet
    assert(kept == rows.map(_._1).toSet -- expectedDrops)
    // sanity on the geometry: each group deduped to its min id, outlier kept
    assert(kept.contains(0L) && kept.contains(10L) && kept.contains(20L))
    assert(kept.contains(22L))
    assert(expectedDrops.nonEmpty)
  }

  test("bpe fit: Sennrich worked example elects es, est, est</w>, lo in order") {
    val types = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = graft.ops.Bpe.fitOnTypes(types, 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
    // more merges than pairs exist -> stops when nothing is left to fuse
    val all = graft.ops.Bpe.fitOnTypes(Seq(("ab", 1L)), 100)
    assert(all == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("bpe encode: lowest -> lo w est</w>; unseen words fall through to chars") {
    val ranks = Seq(("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"))
      .zipWithIndex.toMap
    assert(graft.ops.Bpe.encodeWordValue("lowest", ranks).toSeq ==
      Seq("lo", "w", "est</w>"))
    assert(graft.ops.Bpe.encodeWordValue("newest", ranks).toSeq ==
      Seq("n", "e", "w", "est</w>"))
    assert(graft.ops.Bpe.encodeWordValue("xyz", ranks).toSeq ==
      Seq("x", "y", "z", "</w>"))
    assert(graft.ops.Bpe.encodeWordValue("low", Map.empty).toSeq ==
      Seq("l", "o", "w", "</w>"))
  }

  test("bpe distributed: fit stats, encode conservation, compression on repeats") {
    val docs = Seq(
      (0L, "the lowest price the lowest cost"),
      (1L, "newest widest lowest"),
      (2L, "the the the")).toDF("doc_id", "text")
    val model = graft.ops.Bpe.fit(docs, "text", numMerges = 50)
    assert(model.nWordTypes == 6 && model.typesUsed == 6 &&
      model.tokenMassCovered == 1.0)
    val enc = graft.ops.Bpe.encode(docs, "text", model)
      .orderBy("doc_id").collect()
    // 50 merges over 6 types saturate: every word becomes ONE token
    assert(enc(0).getAs[Long]("n_bpe_tokens") == 6L)
    assert(enc(2).getAs[scala.collection.Seq[String]]("bpe_tokens").toSeq ==
      Seq("the</w>", "the</w>", "the</w>"))
    // char conservation: concat of tokens = chars + one marker per word
    enc.foreach { r =>
      val toks = r.getAs[scala.collection.Seq[String]]("bpe_tokens")
      val words = r.getAs[String]("text").toLowerCase.trim.split("\\s+")
      assert(toks.mkString("") == words.map(_ + "</w>").mkString(""))
    }
    // truncated type table still encodes every word (char fallback)
    val tiny = graft.ops.Bpe.fit(docs, "text", numMerges = 5, maxWordTypes = 2)
    assert(tiny.typesUsed == 2 && tiny.tokenMassCovered < 1.0)
    val enc2 = graft.ops.Bpe.encode(docs, "text", tiny).collect()
    assert(enc2.forall(_.getAs[Long]("n_bpe_tokens") > 0L))
  }

  test("model persistence: BPE/IVF/PQ round-trip through parquet exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_models").toString
    // BPE incl. stats; a loaded model must encode identically
    val docs = Seq((0L, "the lowest price the lowest cost"),
      (1L, "newest widest lowest")).toDF("doc_id", "text")
    val bpe = graft.ops.Bpe.fit(docs, "text", numMerges = 10)
    graft.ops.Models.saveBpe(spark, bpe, s"$dir/bpe")
    val bpe2 = graft.ops.Models.loadBpe(spark, s"$dir/bpe")
    assert(bpe2 == bpe)
    val a = graft.ops.Bpe.encode(docs, "text", bpe).orderBy("doc_id").collect()
    val b = graft.ops.Bpe.encode(docs, "text", bpe2).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
    // zero-merge model still round-trips (meta row carries the stats)
    val empty = graft.ops.Bpe.BpeModel(Seq.empty, 7L, 3, 0.5)
    graft.ops.Models.saveBpe(spark, empty, s"$dir/bpe0")
    assert(graft.ops.Models.loadBpe(spark, s"$dir/bpe0") == empty)
    // IVF: exact centroid/radius recovery
    val ivf = graft.ops.Similarity.IvfModel(
      Array(Array(1.0, 0.0), Array(0.0, -1.0)), Array(0.25, 0.5))
    graft.ops.Models.saveIvf(spark, ivf, s"$dir/ivf")
    val ivf2 = graft.ops.Models.loadIvf(spark, s"$dir/ivf")
    assert(ivf2.centroids.map(_.toSeq).toSeq == ivf.centroids.map(_.toSeq).toSeq)
    assert(ivf2.radii.toSeq == ivf.radii.toSeq)
    // PQ: nested codebooks exact
    val pq = graft.ops.Similarity.PqModel(Array(
      Array(Array(0.1, 0.2), Array(0.3, 0.4)),
      Array(Array(-1.0, 2.0), Array(0.0, 0.0))))
    graft.ops.Models.savePq(spark, pq, s"$dir/pq")
    val pq2 = graft.ops.Models.loadPq(spark, s"$dir/pq")
    assert(pq2.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(rm(_)) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(java.nio.file.Paths.get(dir))
  }

  test("bpe decode inverts encode up to the canonicalization contract") {
    val docs = Seq(
      (0L, "The LOWEST price   the lowest cost"),
      (1L, "newest widest lowest"),
      (2L, ""),
      (3L, "one")).toDF("doc_id", "text")
    val model = graft.ops.Bpe.fit(docs, "text", numMerges = 50)
    val out = graft.ops.Bpe.encode(docs, "text", model)
      .select(col("doc_id"), graft.ops.Bpe.decode(col("bpe_tokens")).as("d"),
        col("text"))
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val want = r.getAs[String]("text").toLowerCase.trim
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(r.getAs[String]("d") == want, s"doc ${r.getLong(0)}")
    }
    // truncated model (char fallback path) still round-trips
    val tiny = graft.ops.Bpe.fit(docs, "text", numMerges = 3, maxWordTypes = 2)
    val out2 = graft.ops.Bpe.encode(docs, "text", tiny)
      .select(graft.ops.Bpe.decode(col("bpe_tokens")).as("d"), col("text"))
      .collect()
    out2.foreach { r =>
      val want = r.getAs[String]("text").toLowerCase.trim
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(r.getAs[String]("d") == want)
    }
  }

  test("within-doc line dedup: first occurrence survives in order, zero-shuffle") {
    val df = Seq(
      (0L, "nav\nbody one\nnav\nbody two\nnav\nfooter"),
      (1L, "a\n\nb\n\na"), // empty lines dedup like any line
      (2L, "unique\nlines\nonly"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = graft.ops.Dedup.dedupLinesWithinDoc(df, "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == "nav\nbody one\nbody two\nfooter")
    assert(out(0).getAs[Long]("n_lines_removed") == 2L)
    assert(out(1).getAs[String]("text") == "a\n\nb")
    assert(out(1).getAs[Long]("n_lines_removed") == 2L)
    assert(out(2).getAs[String]("text") == "unique\nlines\nonly")
    assert(out(2).getAs[Long]("n_lines_removed") == 0L)
    assert(out(3).isNullAt(out(3).fieldIndex("text")))
  }

  test("unicode normalize: NFC composes, invisibles drop, spaces map, controls strip") {
    val df = Seq(
      (0L, "cafe\u0301 ok"),                       // NFD -> composed
      (1L, "a\u200Bb\uFEFFc\u00ADd"),              // zero-width / BOM / soft hyphen
      (2L, "x\u00A0y\u3000z\u2009w"),              // NBSP, ideographic, thin space
      (3L, "ke\u0007pt\tn\nl\u007F"),             // controls; tab/LF survive
      (4L, "\u2018a\u2019 \u201Cb\u201D \u2013 \u2026")) // punct (fold on)
      .toDF("doc_id", "text")
    val plain = df.select(col("doc_id"),
      graft.ops.TextClean.normalizeUnicode(col("text")).as("t"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(plain(0) == "caf\u00E9 ok" && plain(0).length == 7)
    assert(plain(1) == "abcd")
    assert(plain(2) == "x y z w")
    assert(plain(3) == "kept\tn\nl")
    assert(plain(4) == "\u2018a\u2019 \u201Cb\u201D \u2013 \u2026") // no fold by default
    val folded = df.select(graft.ops.TextClean.normalizeUnicode(
        col("text"), foldPunct = true))
      .orderBy(df("doc_id")).collect().map(_.getString(0))
    assert(folded(4) == "'a' \"b\" - ...")
    // NFKC is exposed too (compatibility: ligature fi -> fi, superscript 2 -> 2)
    val nfkc = Seq((0L, "\uFB01 x\u00B2")).toDF("doc_id", "text")
      .select(graft.ops.TextClean.normalizeUnicode(col("text"), form = "NFKC"))
      .head().getString(0)
    assert(nfkc == "fi x2")
    // null propagates; SQL surface agrees with the DataFrame API
    graft.spark.GraftExtensions.install(spark)
    val viaSql = spark.sql(
      "SELECT graft_normalize('cafe\u0301') AS t," +
        " graft_normalize('\uFB01', 'NFKC') AS k," +
        " graft_normalize(CAST(NULL AS STRING)) AS n").head()
    assert(viaSql.getString(0) == "caf\u00E9" && viaSql.getString(1) == "fi" &&
      viaSql.isNullAt(2))
  }

  test("topKPerGroup: sharded election == single-window answer, ties by id") {
    import graft.ops.Sampling
    val rnd = new scala.util.Random(5)
    val df = (0 until 500).map(i =>
      (i.toLong, s"g${i % 4}", rnd.nextInt(40))).toDF("id", "g", "score")
    val got = Sampling.topKPerGroup(df, "id", "g", "score", k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    // reference: plain window (ties on score break by ascending id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val ref = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 7)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong)).sorted.toSeq
    assert(got == ref)
    // ascending variant + small group keeps everything
    val tiny = Seq((1L, "a", 9), (2L, "a", 3), (3L, "b", 5))
      .toDF("id", "g", "score")
    val asc = Sampling.topKPerGroup(tiny, "id", "g", "score", k = 2,
        descending = false)
      .orderBy("g", "rank_in_group").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(asc == Seq((2L, 1L), (1L, 2L), (3L, 1L)))
    // partitioning invariance
    val rep = Sampling.topKPerGroup(df.repartition(13), "id", "g",
      "score", 7).collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    assert(rep == got)
  }

  test("bloomPrunedJoin == plain join; probe actually prunes") {
    import graft.ops.Joins
    val big = (0 until 2000).map(i => (i.toLong % 500, i.toLong))
      .toDF("k", "payload")
    val small = Seq((7L, "a"), (450L, "b"), (499L, "c")).toDF("k", "v")
    val pruned = Joins.bloomPrunedJoin(big, small, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val plain = big.join(small, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(pruned == plain && pruned.size == 12) // 3 keys x 4 rows each
    // plan shape needs a non-local source (ConvertToLocalRelation
    // evaluates the probe at optimization time on LocalRelations):
    // parquet-backed big side keeps the codegen'd probe in the scan
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_extendedprice"))
    val ords = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderkey") % 31 === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val filtered = Joins.bloomPrunedJoin(li, ords, "k")
      .queryExecution.executedPlan.toString
    assert(filtered.contains("graft_bloom_might_contain"), filtered)
    // non-integral key rejected loudly
    intercept[IllegalArgumentException] {
      Joins.bloomPrunedJoin(
        Seq(("x", 1L)).toDF("k", "p"), Seq(("x", "v")).toDF("k", "v"), "k")
    }
  }

  test("property: bloomPrunedJoin equals the plain join for any keys and fpp") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.ops.Joins
    // the exactness claim rests on Bloom filters having no false
    // NEGATIVES: whatever the fpp (even an absurd 0.9), the prefilter
    // may pass extra rows but the join itself removes them — output is
    // bag-identical to the plain inner join, duplicates included
    val scen = for {
      fpp <- Gen.oneOf(0.9, 0.5, 0.01, 1e-6)
      seed <- Gen.choose(0L, 1000000L)
    } yield (fpp, seed)
    val prop = Prop.forAllNoShrink(scen) { case (fpp, seed) =>
      val rnd = new scala.util.Random(seed)
      // negative keys, dup keys on both sides, disjoint tails, and NULL
      // keys on BOTH sides (r12 verdict #4): the inner join drops a
      // null key (null != null) and the prefilter must agree — the
      // probe's null-propagating eval turns filter(null) into a drop,
      // never a crash in the bloom build or a spurious survivor
      def key(span: Int, off: Int): Option[Long] =
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(span).toLong - off)
      val big = (0 until 300).map(i =>
        (key(80, 40), i.toLong)).toDF("k", "payload")
      val small = (0 until 12).map(i =>
        (key(120, 60), s"v$i")).toDF("k", "v")
      def bag(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
      val got = bag(Joins.bloomPrunedJoin(big, small, "k", fpp))
      val want = bag(big.join(small, Seq("k")))
      if (got != want) info(s"bloomPrunedJoin MISMATCH fpp=$fpp seed=$seed: " +
        s"got=${got.size} want=${want.size}")
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(20).withInitialSeed(45L), prop)
    assert(res.passed, res.status.toString)
  }

  test("pageRank9: cycle symmetry, sink attraction, mass bound") {
    import graft.ops.Graph
    // 3-cycle: perfect symmetry, each node keeps ~1/3 of the mass
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rc = Graph.pageRank9(cyc, "src", "dst", iters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rc.values.toSet.size == 1, s"cycle must stay uniform: $rc")
    assert(math.abs(rc(1L) - 333333333L) < 1000000)
    // star into a hub: the hub outranks every leaf
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L))
      .toDF("src", "dst")
    val rs = Graph.pageRank9(star, "src", "dst", iters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 1 and 9 recirculate the mass (2-cycle, oscillating convergence);
    // the unfed leaves decay to the damping base
    assert(rs(9L) > 5 * rs(2L) && rs(1L) > 5 * rs(2L), s"$rs")
    assert(rs(2L) == rs(3L), s"symmetric leaves: $rs")
    // total mass never exceeds 1.0 (floors + no dangling redistribution
    // only LOSE mass)
    assert(rs.values.sum <= 1000000000L)
    // partition invariance (exact integer arithmetic)
    val rep = Graph.pageRank9(star.repartition(5), "src", "dst", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rep == rs)
  }

  test("topKPerGroupAgg == topKPerGroup on random data, k-bounded state") {
    import graft.ops.Sampling
    val rnd = new scala.util.Random(7)
    val df = (0 until 400).map(i =>
      (i.toLong, s"g${i % 5}", rnd.nextInt(30))).toDF("id", "g", "score")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    val win = canon(Sampling.topKPerGroup(df, "id", "g", "score", 6))
    val agg = canon(Sampling.topKPerGroupAgg(df, "id", "g", "score", 6))
    assert(agg == win)
    // partition invariance
    val rep = canon(Sampling.topKPerGroupAgg(df.repartition(13), "id", "g",
      "score", 6))
    assert(rep == win)
    // string ids: typed aggregator, lexicographic ties == window path
    // (note "10" < "2" lexicographically — exactly what col(id).asc
    // does on a string column, so the two formulations agree)
    val strIds = Seq(("10", "g", 5), ("2", "g", 5), ("zz", "g", 9),
      ("a", "h", 1)).toDF("id", "g", "score")
    def canonS(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(3))).sorted.toSeq
    val winS = canonS(Sampling.topKPerGroup(strIds, "id", "g", "score", 2))
    val aggS = canonS(Sampling.topKPerGroupAgg(strIds, "id", "g", "score", 2))
    assert(aggS == winS)
    assert(aggS.contains(("10", 2L)) && !aggS.exists(_._1 == "2"))
    // unsupported id types still rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.topKPerGroupAgg(
        Seq((1.5, "g", 1)).toDF("id", "g", "score"), "id", "g", "score", 2)
    }
    // ascending (bottom-k) variant == ascending window election
    val winA = canon(Sampling.topKPerGroup(df, "id", "g", "score", 6,
      descending = false))
    val aggA = canon(Sampling.topKPerGroupAgg(df, "id", "g", "score", 6,
      descending = false))
    assert(aggA == winA)
  }

  test("weightedSamplePerGroup: A-ES draw favors weight, deterministic") {
    import graft.ops.Sampling
    // one group: a single weight-1000 row among 60 weight-1 rows — the
    // heavy row survives a k=5 draw with probability ~1 - tiny
    val df = ((0 until 60).map(i => (i.toLong, "g", 1.0)) :+
      (999L, "g", 1000.0)).toDF("id", "g", "w")
    val got = Sampling.weightedSamplePerGroup(df, "id", "g", "w", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.length == 5)
    assert(got.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.exists(_._1 == 999L), "weight-1000 row must be drawn")
    // zero/negative/null weights never sample; small group keeps all
    val mixed = Seq((1L, "a", 4.0), (2L, "a", 0.0), (3L, "a", -1.0),
      (4L, "b", 2.0)).toDF("id", "g", "w")
      .union(Seq((5L, "b", Option.empty[Double])).toDF("id", "g", "w"))
    val kept = Sampling.weightedSamplePerGroup(mixed, "id", "g", "w", k = 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L))
    // partitioning invariance (rank included)
    val big = (0 until 300).map(i => (i.toLong, s"g${i % 3}",
      1.0 + (i % 7))).toDF("id", "g", "w")
    val a = Sampling.weightedSamplePerGroup(big, "id", "g", "w", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    val b = Sampling.weightedSamplePerGroup(big.repartition(17), "id", "g",
      "w", k = 8).collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    assert(a == b)
  }

  test("coalesceIntervals: overlap/touch/contain merge, gap bridging, " +
      "reversed raises, partition invariance") {
    import graft.ops.Intervals
    // numeric axis: overlapping [1,5)+[3,7) merge; touching [7,9)
    // merges too (half-open union); contained [10,12)⊂[9,15) collapses;
    // disjoint [20,21) stands alone; zero-length [30,30) is a point span
    val df = Seq(("a", 1L, 5L), ("a", 3L, 7L), ("a", 7L, 9L),
      ("a", 9L, 15L), ("a", 10L, 12L), ("a", 20L, 21L), ("a", 30L, 30L),
      ("b", 2L, 4L)).toDF("k", "s", "e")
    val got = Intervals.coalesceIntervals(df, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(got == Seq(("a", 1L, 15L, 5L, 14L), ("a", 20L, 21L, 1L, 1L),
      ("a", 30L, 30L, 1L, 0L), ("b", 2L, 4L, 1L, 2L)), s"$got")
    // gap=5 bridges the 15→20 silence but not the 9-wide 21→30 one;
    // gap=9 bridges both
    val bridged5 = Intervals.coalesceIntervals(df.filter(col("k") === "a"),
        "k", "s", "e", gap = 5L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(bridged5 == Seq((1L, 21L), (30L, 30L)), s"$bridged5")
    val bridged9 = Intervals.coalesceIntervals(df.filter(col("k") === "a"),
        "k", "s", "e", gap = 9L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(bridged9 == Seq((1L, 30L)), s"$bridged9")
    // partition invariance
    val rep = Intervals.coalesceIntervals(df.repartition(7), "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(rep == got)
    // reversed interval raises in-plan
    val err = intercept[Exception] {
      Intervals.coalesceIntervals(
        Seq(("a", 5L, 3L)).toDF("k", "s", "e"), "k", "s", "e").collect()
    }
    assert(err.getMessage != null)
    // unsupported axis fails fast
    intercept[IllegalArgumentException] {
      Intervals.coalesceIntervals(
        Seq(("a", "x", "y")).toDF("k", "s", "e"), "k", "s", "e")
    }
  }

  test("intervalCoverage / intervalGaps: union-exact coverage, " +
      "interior-only gaps, timestamp axis round-trip") {
    import graft.ops.Intervals
    val df = Seq(("a", 1L, 5L), ("a", 3L, 7L), ("a", 9L, 15L),
      ("a", 20L, 21L), ("b", 2L, 4L)).toDF("k", "s", "e")
    val cov = Intervals.intervalCoverage(df, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sorted.toSeq
    // a: union [1,7)+[9,15)+[20,21) = 6+6+1 = 13 over 3 spans, 4 inputs
    assert(cov == Seq(("a", 4L, 3L, 13L, 1L, 21L), ("b", 1L, 1L, 2L, 2L, 4L)),
      s"$cov")
    val gaps = Intervals.intervalGaps(df, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    // interior silences only: [7,9) and [15,20); b has one span → none
    assert(gaps == Seq(("a", 7L, 9L, 2L), ("a", 15L, 20L, 5L)), s"$gaps")
    // timestamp axis: micros-exact round trip, gap in SECONDS
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val tdf = Seq(("a", ts(0), ts(60)), ("a", ts(100), ts(160)))
      .toDF("k", "s", "e")
    val spans = Intervals.coalesceIntervals(tdf, "k", "s", "e", gap = 40L)
      .collect()
    assert(spans.length == 1)
    assert(spans.head.getAs[java.sql.Timestamp]("span_start") == ts(0) &&
      spans.head.getAs[java.sql.Timestamp]("span_end") == ts(160) &&
      spans.head.getAs[Long]("covered_us") == 160000000L, spans.head.toString)
    val tgaps = Intervals.intervalGaps(tdf, "k", "s", "e")
      .collect().map(r => r.getAs[Long]("gap_us")).toSeq
    assert(tgaps == Seq(40000000L), s"$tgaps")
  }

  test("property: coalesceIntervals == brute-force union over random " +
      "interval sets; coverage and gaps consistent") {
    import graft.ops.Intervals
    val rnd = new scala.util.Random(42)
    // brute force: mark covered points on a small integer axis
    def bruteSpans(iv: Seq[(Long, Long)], gap: Long): Seq[(Long, Long)] = {
      if (iv.isEmpty) return Nil
      val sorted = iv.sortBy(x => (x._1, x._2))
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var (cs, ce) = sorted.head
      for ((s, e) <- sorted.tail) {
        if (s <= ce + gap) ce = math.max(ce, e)
        else { out += ((cs, ce)); cs = s; ce = e }
      }
      out += ((cs, ce))
      out.toSeq
    }
    for (trial <- 0 until 8) {
      val gap = Seq(0L, 0L, 1L, 3L)(trial % 4)
      val data = (0 until 120).map { _ =>
        val k = s"k${rnd.nextInt(4)}"
        val s = rnd.nextInt(200).toLong
        (k, s, s + rnd.nextInt(12).toLong)
      }
      val df = data.toDF("k", "s", "e")
      val got = Intervals.coalesceIntervals(df, "k", "s", "e", gap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sorted.toSeq)
        .toMap
      val want = data.groupBy(_._1).view
        .mapValues(v => bruteSpans(v.map(x => (x._2, x._3)), gap).sorted)
        .toMap
      assert(got == want, s"trial $trial gap $gap")
      // coverage rollup consistent with the spans
      val cov = Intervals.intervalCoverage(df, "k", "s", "e", gap)
        .collect().map(r => r.getString(0) ->
          (r.getLong(2), r.getLong(3))).toMap
      for ((k, spans) <- want) {
        assert(cov(k)._1 == spans.length.toLong, s"n_spans $k")
        assert(cov(k)._2 == spans.map(x => x._2 - x._1).sum, s"covered $k")
      }
      // gaps are exactly the complement between consecutive spans
      val gaps = Intervals.intervalGaps(df, "k", "s", "e", gap)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).sorted.toSeq)
        .toMap.withDefaultValue(Seq.empty)
      for ((k, spans) <- want) {
        val expect = spans.sliding(2).collect {
          case Seq((_, e1), (s2, _)) => (e1, s2)
        }.toSeq
        assert(gaps(k) == expect, s"gaps $k")
      }
    }
  }

  test("driftStats: identical==0/0, disjoint KS==1, shift ordering, " +
      "partition invariance, empty side raises") {
    import graft.ops.Drift
    val a = (0 until 200).map(i => (i % 50).toDouble).toDF("v")
    // identical distributions: PSI and KS exactly zero (p==q cell-wise
    // → the grained term is exactly 0, the cdfs coincide)
    val same = Drift.driftStats(a, a, "v", 0, 100, 10).head()
    assert((same.getLong(0), same.getLong(1)) == (200L, 200L))
    assert(same.getDouble(2) == 0.0 && same.getDouble(3) == 0.0)
    // disjoint supports: KS hits exactly 1.0, PSI blows past the 0.25
    // "major drift" bar by an order of magnitude
    val b = (0 until 200).map(i => 50.0 + (i % 50)).toDF("v")
    val dis = Drift.driftStats(a, b, "v", 0, 100, 10).head()
    assert(dis.getDouble(3) == 1.0, s"disjoint KS: $dis")
    assert(dis.getDouble(2) > 10, s"disjoint PSI: $dis")
    // a mild shift sits strictly between the two
    val c = (0 until 200).map(i => (i % 50) + 10.0).toDF("v")
    val mid = Drift.driftStats(a, c, "v", 0, 100, 10).head()
    assert(mid.getDouble(2) > 0.0 && mid.getDouble(2) < dis.getDouble(2))
    assert(mid.getDouble(3) > 0.0 && mid.getDouble(3) < 1.0)
    // partition invariance (grained PSI sum is order-proof)
    val rep = Drift.driftStats(a.repartition(13), c.repartition(7),
      "v", 0, 100, 10).head()
    assert(rep == mid)
    // an empty side raises in-plan, not a silent zero
    val err = intercept[Exception] {
      Drift.driftStats(a.filter(col("v") < -1), a, "v", 0, 100, 10).collect()
    }
    assert(err.getMessage != null)
    // the day-over-day path: drift over persisted bucket tables equals
    // drift over the raw frames
    import graft.ops.Sketch
    val fromHists = Drift.driftFromHistTables(
      Sketch.histTable(a, "v", 0, 100, 10),
      Sketch.histTable(c, "v", 0, 100, 10)).head()
    assert(fromHists == mid)
  }

  test("driftByGroup: per-group stats, one-sided group reports nulls") {
    import graft.ops.Drift
    val a = ((0 until 100).map(i => ("en", (i % 50).toDouble)) ++
      (0 until 60).map(i => ("de", (i % 30).toDouble)) ++
      (0 until 20).map(i => ("fr", i.toDouble))).toDF("lang", "v")
    val b = ((0 until 100).map(i => ("en", (i % 50).toDouble)) ++
      (0 until 60).map(i => ("de", 50.0 + (i % 30)))).toDF("lang", "v")
    val got = Drift.driftByGroup(a, b, "lang", "v", 0, 100, 10)
      .collect().map(r => r.getString(0) -> r).toMap
    // en identical, de disjoint, fr one-sided
    assert(got("en").getDouble(3) == 0.0 && got("en").getDouble(4) == 0.0)
    assert(got("de").getDouble(4) == 1.0 && got("de").getDouble(3) > 5)
    assert(got("fr").getLong(2) == 0L)
    assert(got("fr").isNullAt(3) && got("fr").isNullAt(4),
      "a group with an empty opposite side reports null psi/ks")
    // per-group == one-shot on the same stratum
    val en = Drift.driftStats(
      a.filter(col("lang") === "en").select(col("v")),
      b.filter(col("lang") === "en").select(col("v")),
      "v", 0, 100, 10).head()
    assert(got("en").getLong(1) == en.getLong(0) &&
      got("en").getDouble(3) == en.getDouble(2) &&
      got("en").getDouble(4) == en.getDouble(3))
  }

  test("drift null contract: values drop, null bucket rows raise, " +
      "both-empty raises") {
    import graft.ops.{Drift, Sketch}
    val a = ((0 until 100).map(i => Option((i % 50).toDouble)) ++
      Seq.fill(7)(Option.empty[Double])).toDF("v")
    // identical inputs WITH nulls: zero drift and the null rows are
    // NOT counted (before the r16 ADVICE fix they became a null
    // bucket that never matched itself — spurious PSI on identical
    // null-bearing inputs)
    val same = Drift.driftStats(a, a, "v", 0, 100, 10).head()
    assert((same.getLong(0), same.getLong(1)) == (100L, 100L), same.toString)
    assert(same.getDouble(2) == 0.0 && same.getDouble(3) == 0.0)
    // per-group path drops nulls too; an all-null group vanishes
    val ga = ((0 until 40).map(i => ("en", Option((i % 20).toDouble))) ++
      (0 until 5).map(_ => ("xx", Option.empty[Double])))
      .toDF("lang", "v")
    val gs = Drift.driftByGroup(ga, ga, "lang", "v", 0, 100, 10).collect()
    assert(gs.map(_.getString(0)).toSet == Set("en"), gs.mkString(","))
    // a PERSISTED table carrying a NULL bucket row raises (either side)
    val hist = Sketch.histTable(a.filter(col("v").isNotNull), "v", 0, 100, 10)
    val bad = hist.unionByName(
      Seq((Option.empty[Int], 7L)).toDF("bucket", "c"))
    intercept[Exception] { Drift.driftFromHistTables(bad, hist).collect() }
    intercept[Exception] { Drift.driftFromHistTables(hist, bad).collect() }
    // BOTH sides empty raises instead of silently returning an empty
    // relation (the r16 ADVICE hole: the old groupBy emitted no row
    // for the raise guard to fire on)
    val empty = hist.filter(lit(false))
    intercept[Exception] { Drift.driftFromHistTables(empty, empty).collect() }
  }

  test("driftCategorical: identical==0, one-sided category golden, " +
      "persisted path, sentinel nulls, empty raises") {
    import graft.ops.Drift
    val a = (Seq.fill(8)("x") ++ Seq.fill(2)("y")).toDF("lang")
    val b = Seq.fill(5)("x").toDF("lang")
    // identical mixes: psi and chi2 exactly zero
    val same = Drift.driftCategorical(a, a, "lang").head()
    assert((same.getLong(0), same.getLong(1), same.getLong(2)) ==
      (10L, 10L, 2L))
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0)
    // one-sided category golden, replicated with independent plain-
    // Scala arithmetic over the known counts (x: 8 vs 5, y: 2 vs 0)
    val got = Drift.driftCategorical(a, b, "lang").head()
    def psi9(p: Double, q: Double) =
      math.floor((p - q) * math.log(p / q) * 1e9).toLong
    def chi9(o: Double, e: Double) =
      math.floor((o - e) * (o - e) / e * 1e9).toLong
    val wantPsi = BigDecimal((psi9(0.8, 1.0) + psi9(0.2, 1e-6)).toDouble / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // expected counts on the 2×k grid: e = n_side · (c_a+c_b) / (n_a+n_b);
    // the absent (y, B) cell still contributes its expected count
    val wantChi = BigDecimal((
      chi9(8, 10.0 * 13.0 / 15.0) + chi9(5, 5.0 * 13.0 / 15.0) +
      chi9(2, 10.0 * 2.0 / 15.0) + chi9(0, 5.0 * 2.0 / 15.0)).toDouble / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == (10L, 5L, 2L))
    assert(got.getDouble(3) == wantPsi, s"psi ${got.getDouble(3)} != $wantPsi")
    assert(got.getDouble(4) == wantChi, s"chi2 ${got.getDouble(4)} != $wantChi")
    assert(got.getDouble(3) > 0 && got.getDouble(4) > 1.0)
    // day-over-day persisted path == raw path
    val viaTables = Drift.driftFromCatTables(
      Drift.catTable(a, "lang"), Drift.catTable(b, "lang")).head()
    assert(viaTables == got)
    // null categories are the sentinel level, not dropped
    val withNull = (Seq.fill(8)(Some("x")) ++ Seq.fill(2)(Option.empty[String]))
      .toDF("lang")
    val ct = Drift.catTable(withNull, "lang").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ct == Map("x" -> 8L, "__null__" -> 2L))
    // empty sides raise — including both-empty
    intercept[Exception] {
      Drift.driftCategorical(a.filter(lit(false)), a, "lang").collect()
    }
    intercept[Exception] {
      val e = Drift.catTable(a, "lang").filter(lit(false))
      Drift.driftFromCatTables(e, e).collect()
    }
  }

  test("driftSeries: consecutive-day pairs over a persisted stack") {
    import graft.ops.{Drift, Sketch}
    val d1 = (0 until 200).map(i => (i % 50).toDouble).toDF("v")
    val d2 = d1 // identical day
    val d3 = (0 until 200).map(i => (i % 50) + 10.0).toDF("v")
    val stack = Seq(d1 -> 1, d2 -> 2, d3 -> 3).map { case (df, day) =>
      Sketch.histTable(df, "v", 0, 100, 10).withColumn("day", lit(day))
    }.reduce(_ unionByName _)
    val got = Drift.driftSeries(stack, "day")
      .orderBy(col("day")).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(2, 3))
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2))
    // day 2 vs 1: identical; day 3 vs 2: the shift
    assert(got(0).getDouble(4) == 0.0 && got(0).getDouble(5) == 0.0)
    assert(got(1).getDouble(4) > 0.0 && got(1).getDouble(5) > 0.0)
    // each pair row equals the two-table diff of the same days
    val pair = Drift.driftFromHistTables(
      Sketch.histTable(d2, "v", 0, 100, 10),
      Sketch.histTable(d3, "v", 0, 100, 10)).head()
    assert(got(1).getLong(2) == pair.getLong(0) &&
      got(1).getDouble(4) == pair.getDouble(2) &&
      got(1).getDouble(5) == pair.getDouble(3))
  }

  test("rankBiasedOverlap: identical lists = 1-p^k, hand-computed " +
      "prefix overlap, one-sided qid scores 0") {
    import graft.ops.Retrieval
    val a = Seq((1L, "x1", 1L), (1L, "x2", 2L), (1L, "x3", 3L),
      (2L, "y1", 1L)).toDF("qid", "id", "rank")
    val b = Seq((1L, "x2", 1L), (1L, "x1", 2L), (1L, "x9", 3L))
      .toDF("qid", "id", "rank")
    // qid 1: overlaps at depths (0, 2, 2) → terms 0, p·1, p²·(2/3);
    // grained: (0 + 500000000 + 166666666)/1e9 × (1−p) = 0.333333
    // qid 2: only on side A → no agreement → 0
    val gotRows = Retrieval.rankBiasedOverlap(a, b, "qid", "id", "rank",
        k = 3, p = 0.5).collect()
    val got = gotRows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.333333, 2L -> 0.0), got.toString)
    // rbo_ext = rbo + X_k/k·p^k: qid 1 has X_3 = 2 (x1, x2) →
    // grained + 2·41666666 → 0.416667; a one-sided qid stays 0
    val gotE = gotRows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(gotE == Map(1L -> 0.416667, 2L -> 0.0), gotE.toString)
    // identical FULL lists (qid 1): ov_d = d, so rbo = (1−p)·Σ p^{d−1}
    // = 1 − p^k = 0.875; qid 2 self-compares its single item: ov = 1 at
    // every depth → grained (1e9 + 250000000 + 83333333)/1e9 × 0.5 =
    // 0.666667 (< 1: truncated RBO penalizes lists shorter than k)
    val selfRows = Retrieval.rankBiasedOverlap(a, a, "qid", "id", "rank",
        k = 3, p = 0.5).collect()
    val self = selfRows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(self == Map(1L -> 0.875, 2L -> 0.666667), self.toString)
    // the extrapolation closes the truncation gap: an identical FULL
    // list extrapolates to exactly 1.0 (X_k = k recovers the p^k tail
    // within the grain, round-6 lands on 1); the short self-list gains
    // only its single pair's tail share
    val selfE = selfRows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(selfE == Map(1L -> 1.0, 2L -> 0.708333), selfE.toString)
    // partition invariance: grained term sums are order-proof
    val rep = Retrieval.rankBiasedOverlap(a.repartition(7),
        b.repartition(13), "qid", "id", "rank", k = 3, p = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep == got)
  }

  test("embeddingDrift: identical==0 with centroid_cos 1, shifted side " +
      "drifts, zero-norm drops") {
    import graft.ops.Drift
    val rnd = new scala.util.Random(7)
    val base = (0 until 100).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian())))
    val a = base.toDF("id", "embedding")
    val same = Drift.embeddingDrift(a, a, "embedding", buckets = 20).head()
    assert((same.getLong(0), same.getLong(1)) == (100L, 100L))
    assert(same.getDouble(2) == 0.0 && same.getDouble(3) == 0.0)
    // cos(c, c): the grained sums coincide term-for-term → exactly 1
    assert(same.getDouble(4) == 1.0)
    // a constant shift on one dimension moves both the per-row cosine
    // distribution and the centroid
    val b = base.map { case (id, v) => (id, v.updated(0, v(0) + 3.0)) }
      .toDF("id", "embedding")
    val mov = Drift.embeddingDrift(a, b, "embedding", buckets = 20).head()
    assert(mov.getDouble(2) > 0.0, mov.toString)
    assert(mov.getDouble(4) < 1.0, mov.toString)
    // a zero-norm vector has no cosine: scores null and drops
    val withZero = (base :+ (999L, Array.fill(8)(0.0)))
      .toDF("id", "embedding")
    val z = Drift.embeddingDrift(withZero, a, "embedding", buckets = 20).head()
    assert(z.getLong(0) == 100L, z.toString)
  }

  test("embeddingDriftByGroup: stable group reads exact zero, only the " +
      "shifted group moves, reference-absent group keeps its row, and " +
      "the per-group row == whole-corpus embeddingDrift on that group") {
    import graft.ops.Drift
    val rnd = new scala.util.Random(13)
    val base = (0 until 60).map(_ => Array.fill(6)(rnd.nextGaussian()))
    // g0 stable (same rows both sides); g1's side B shifted on dim 0;
    // g2 present only on side B (no reference centroid to score against)
    val a = (base.map(v => ("g0", v)) ++ base.map(v => ("g1", v)))
      .toDF("g", "embedding")
    val b = (base.map(v => ("g0", v)) ++
      base.map(v => ("g1", v.updated(0, v(0) + 3.0))) ++
      base.take(5).map(v => ("g2", v))).toDF("g", "embedding")
    val got = Drift.embeddingDriftByGroup(a, b, "g", "embedding",
        buckets = 20)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("g0", "g1", "g2"), got.keySet.toString)
    val g0 = got("g0")
    assert((g0.getLong(1), g0.getLong(2)) == (60L, 60L), g0.toString)
    assert(g0.getDouble(3) == 0.0 && g0.getDouble(4) == 0.0, g0.toString)
    assert(g0.getDouble(5) == 1.0, g0.toString)
    val g1 = got("g1")
    assert(g1.getDouble(3) > 0.0 && g1.getDouble(5) < 1.0, g1.toString)
    // the appeared group: its row IS the finding — nothing scoreable
    // against a missing reference, so zero counts and null stats
    val g2 = got("g2")
    assert((g2.getLong(1), g2.getLong(2)) == (0L, 0L), g2.toString)
    assert(g2.isNullAt(3) && g2.isNullAt(4) && g2.isNullAt(5), g2.toString)
    // the per-group machinery (broadcast centroid relation, relational
    // shared-dim rotation) lands on the whole-corpus op's exact numbers
    val whole = Drift.embeddingDrift(
      a.filter(col("g") === "g1").select(col("embedding")),
      b.filter(col("g") === "g1").select(col("embedding")),
      "embedding", buckets = 20).head()
    assert(g1.getLong(1) == whole.getLong(0) &&
      g1.getLong(2) == whole.getLong(1) &&
      g1.getDouble(3) == whole.getDouble(2) &&
      g1.getDouble(4) == whole.getDouble(3) &&
      g1.getDouble(5) == whole.getDouble(4), s"$g1 vs $whole")
  }

  test("weighted drift: integer weights == row replication (psi/ks " +
      "identical, totals scale by the 1e6 grain); null weight drops; " +
      "negative weight raises; categorical twin") {
    import graft.ops.Drift
    val rnd = new scala.util.Random(19)
    val rowsA = (0 until 120).map(_ => (rnd.nextInt(50).toDouble,
      (rnd.nextInt(4) + 1).toLong))
    val rowsB = (0 until 120).map(_ => (rnd.nextInt(50) + 8.0,
      (rnd.nextInt(4) + 1).toLong))
    val a = rowsA.toDF("v", "w")
    val b = rowsB.toDF("v", "w")
    val wd = Drift.driftStats(a, b, "v", 0, 100, 10,
      weightCol = Some("w")).head()
    def rep(rows: Seq[(Double, Long)]) =
      rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.toDF("v")
    val rd = Drift.driftStats(rep(rowsA), rep(rowsB), "v", 0, 100, 10).head()
    // shares are identical (every counter scales by exactly 1e6), so
    // the grained PSI terms and the cdf KS coincide bit-for-bit
    assert(wd.getDouble(2) == rd.getDouble(2) &&
      wd.getDouble(3) == rd.getDouble(3), s"$wd vs $rd")
    assert(wd.getLong(0) == rd.getLong(0) * 1000000L &&
      wd.getLong(1) == rd.getLong(1) * 1000000L, s"$wd vs $rd")
    // a null weight has no mass: the row drops entirely (999 would
    // otherwise land in the overflow bucket and move KS)
    val rowsAN = rowsA.map { case (v, w) => (v, Some(w): Option[Long]) } :+
      ((999.0, Option.empty[Long]))
    val wdN = Drift.driftStats(rowsAN.toDF("v", "w"), b, "v", 0, 100, 10,
      weightCol = Some("w")).head()
    assert(wdN == wd, s"$wdN vs $wd")
    // negative mass is a pipeline bug: raise, don't corrupt shares
    intercept[Exception] {
      Drift.driftStats(Seq((1.0, -1L)).toDF("v", "w"), b, "v", 0, 100, 10,
        weightCol = Some("w")).collect()
    }
    // categorical twin: psi exact under replication; χ² scales by the
    // grain (per-cell flooring keeps the ratio within tolerance)
    val ca = rowsA.map { case (v, w) => (s"c${v.toInt % 5}", w) }
      .toDF("cat", "w")
    val cb = rowsB.map { case (v, w) => (s"c${v.toInt % 7}", w) }
      .toDF("cat", "w")
    val cw = Drift.driftCategorical(ca, cb, "cat",
      weightCol = Some("w")).head()
    def repC(rows: Seq[(Double, Long)], m: Int) =
      rows.flatMap { case (v, w) =>
        Seq.fill(w.toInt)(s"c${v.toInt % m}") }.toDF("cat")
    val cr = Drift.driftCategorical(repC(rowsA, 5), repC(rowsB, 7),
      "cat").head()
    assert(cw.getLong(2) == cr.getLong(2), s"$cw vs $cr") // k
    assert(cw.getDouble(3) == cr.getDouble(3), s"$cw vs $cr") // psi
    assert(math.abs(cw.getDouble(4) / 1e6 - cr.getDouble(4)) < 1e-4,
      s"$cw vs $cr") // chi2 scales linearly with total mass
    // the weighted bucket-quantile rides the same grain: weighted
    // bands == replicated bands (the nested-ceiling identity
    // ⌈⌈10⁶pn⌉/10⁶⌉ = ⌈pn⌉ keeps the selected bucket fixed)
    import graft.ops.Profile
    val probs = Seq(0.25, 0.5, 0.9)
    def bands(df: org.apache.spark.sql.DataFrame, w: Option[String]) =
      Profile.groupQuantileSketch(df, "g", "v", probs, 0, 100, 10, w)
        .collect().map(r => r.getDouble(1) ->
          (r.getDouble(3), r.getDouble(4))).toMap
    val qw = bands(rowsA.map { case (v, w) => ("g", v, w) }
      .toDF("g", "v", "w"), Some("w"))
    val qr = bands(rep(rowsA).select(lit("g").as("g"), col("v")), None)
    assert(qw == qr, s"$qw vs $qr")
    // and the per-group numeric drift: psi/ks identical, totals scale
    def grouped(rows: Seq[(Double, Long)]) =
      rows.map { case (v, w) => (s"s${v.toInt % 3}", v, w) }
        .toDF("g", "v", "w")
    val gw = Drift.driftByGroup(grouped(rowsA), grouped(rowsB),
        "g", "v", 0, 100, 10, weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    def groupedRep(rows: Seq[(Double, Long)]) =
      rows.flatMap { case (v, w) =>
        Seq.fill(w.toInt)((s"s${v.toInt % 3}", v)) }.toDF("g", "v")
    val gr = Drift.driftByGroup(groupedRep(rowsA), groupedRep(rowsB),
        "g", "v", 0, 100, 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(gw.keySet == gr.keySet)
    gw.keySet.foreach { g =>
      assert(gw(g).getLong(1) == gr(g).getLong(1) * 1000000L &&
        gw(g).getDouble(3) == gr(g).getDouble(3) &&
        gw(g).getDouble(4) == gr(g).getDouble(4), s"$g: ${gw(g)} vs ${gr(g)}")
    }
  }

  test("funnelReportSketch: n_users == the exact report's, discrete " +
      "median gap inside the one-width band, no-gap steps null") {
    import graft.ops.Events
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val steps = Seq("A", "B", "C")
    val rnd = new scala.util.Random(23)
    val rows = (1L to 40L).flatMap { u =>
      val t0 = rnd.nextInt(1000).toLong
      val g1 = 1L + rnd.nextInt(200)
      val g2 = 1L + rnd.nextInt(200)
      Seq((u, ts(t0), "A"), (u, ts(t0 + g1), "B"),
        (u, ts(t0 + g1 + g2), "C"))
    }
    val df = rows.toDF("user_id", "ts", "event_type")
    val maxGap = 100L // kills roughly half the transitions
    val exact = Events.funnelReportWithin(df, "user_id", "ts",
        "event_type", steps, maxGap)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val width = 5.0e6
    val sk = Events.funnelReportSketch(df, "user_id", "ts", "event_type",
        steps, maxGap, lo = 0.0, hi = 2.0e8, buckets = 40)
      .orderBy(col("step_idx")).collect()
    assert(sk.map(r => r.getLong(0) -> r.getLong(2)).toMap == exact)
    // the DISCRETE median (rank ceil(n/2)) of the exact micro gaps is
    // bracketed by a band of exactly one bucket width
    val gaps = Events.funnelTimes(df, "user_id", "ts", "event_type",
        steps, maxGap).collect()
      .filter(!_.isNullAt(4)).map(r => r.getLong(1) -> r.getLong(4))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    sk.foreach { r =>
      val si = r.getLong(0)
      gaps.get(si) match {
        case Some(vs) =>
          val d = vs((math.max(1L,
            math.ceil(0.5 * vs.size).toLong) - 1).toInt).toDouble
          val qlo = r.getDouble(3)
          val qhi = r.getDouble(4)
          assert(qlo <= d && d <= qhi, s"step $si: $d not in [$qlo,$qhi]")
          assert(math.abs(qhi - qlo - width) < 1e-9, s"step $si band")
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4), s"step $si expected nulls")
      }
    }
  }

  test("driftCatSeries: consecutive-day pairs over a persisted " +
      "category stack") {
    import graft.ops.Drift
    val d1 = (Seq.fill(8)("x") ++ Seq.fill(2)("y")).toDF("lang")
    val d2 = d1
    val d3 = (Seq.fill(2)("x") ++ Seq.fill(8)("y")).toDF("lang")
    val stack = Seq(d1 -> 1L, d2 -> 2L, d3 -> 3L).map { case (df, day) =>
      Drift.catTable(df, "lang").withColumn("day", lit(day))
    }.reduce(_ unionByName _)
    val got = Drift.driftCatSeries(stack, "day")
      .orderBy(col("day")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 1L), (3L, 2L)))
    // day 2 vs 1 identical; day 3 vs 2 the mix flip
    assert(got(0).getDouble(5) == 0.0 && got(0).getDouble(6) == 0.0)
    assert(got(1).getDouble(5) > 0.0 && got(1).getDouble(6) > 0.0)
    // each pair row equals the two-table categorical diff
    val pair = Drift.driftFromCatTables(
      Drift.catTable(d2, "lang"), Drift.catTable(d3, "lang")).head()
    assert(got(1).getLong(2) == pair.getLong(0) &&
      got(1).getLong(4) == pair.getLong(2) &&
      got(1).getDouble(5) == pair.getDouble(3) &&
      got(1).getDouble(6) == pair.getDouble(4))
    // a null day in the stack raises, like a null cat
    intercept[Exception] {
      Drift.driftCatSeries(stack.withColumn("day",
        when(col("day") === 2L, lit(null)).otherwise(col("day"))),
        "day").collect()
    }
  }

  test("property: rankBiasedOverlap == brute-force truncated RBO on " +
      "random rankings") {
    import graft.ops.Retrieval
    val rnd = new scala.util.Random(31)
    val k = 8
    val p = 0.5
    // per qid: two rankings over overlapping id pools (some ids shared,
    // some one-sided, some qids on one side only)
    def ranking(qid: Long): Seq[(Long, String, Long)] = {
      val ids = rnd.shuffle((0 until 14).map(i => s"id$i")).take(k)
      ids.zipWithIndex.map { case (id, r) => (qid, id, (r + 1).toLong) }
    }
    val aRows = (0L until 12L).flatMap(ranking)
    val bRows = (4L until 16L).flatMap(ranking)
    val a = aRows.toDF("qid", "id", "rank")
    val b = bRows.toDF("qid", "id", "rank")
    val gotRows = Retrieval.rankBiasedOverlap(a, b, "qid", "id", "rank",
      k, p).collect()
    val got = gotRows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gotE = gotRows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // brute force from the definition, with the op's grain convention
    val t9 = (1 to k).map(d => math.floor(math.pow(p, d - 1) / d * 1e9).toLong)
    val ext9 = math.floor(math.pow(p, k) / k * 1e9).toLong
    val byQ = (aRows.map(_._1) ++ bRows.map(_._1)).distinct
    val aM = aRows.groupBy(_._1); val bM = bRows.groupBy(_._1)
    byQ.foreach { q =>
      val ra = aM.getOrElse(q, Nil).map(r => r._2 -> r._3).toMap
      val rb = bM.getOrElse(q, Nil).map(r => r._2 -> r._3).toMap
      def ov(d: Int): Int = ra.count { case (id, r) =>
        r <= d && rb.get(id).exists(_ <= d) }
      val sum9 = (1 to k).map { d =>
        // |A:d ∩ B:d| straight from the definition
        ov(d).toLong * t9(d - 1)
      }.sum
      val want = BigDecimal((1 - p) * sum9.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(q) == want, s"qid $q: ${got(q)} vs $want")
      // Webber §4.5 extrapolation, brute: rbo + X_k·ext9 at the grain
      val wantE = BigDecimal(
          ((1 - p) * sum9.toDouble + ov(k).toLong * ext9) / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gotE(q) == wantE, s"qid $q ext: ${gotE(q)} vs $wantE")
      assert(gotE(q) >= got(q), s"qid $q: ext below truncated")
    }
    assert(got.size == byQ.size)
  }

  test("timeWeightedAvg: |value| >= 1e12 stays exact — decimal(20,0) " +
      "terms cannot overflow on long-grain inputs") {
    import graft.ops.Events
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // v6 = 2e18 and 4e18: a decimal(18,0) cast overflows (ADVICE r16);
    // decimal(20,0) holds any long
    val df = Seq((1L, ts(0), 2.0e12, 1L), (1L, ts(10), 4.0e12, 2L),
      (1L, ts(40), 0.0, 3L)).toDF("k", "ts", "v", "tie")
    val got = Events.timeWeightedAvg(df, "k", "ts", "v", "tie").head()
    // twa = (2e12·10s + 4e12·30s) / 40s = 3.5e12, exactly
    assert(got.getLong(1) == 3L)
    assert(got.getDouble(4) == 3.5e12, got.toString)
  }

  test("funnel deadline: greedy anchored cascade pinned, times, report " +
      "with zero-user steps") {
    import graft.ops.Events
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val steps = Seq("A", "B", "C")
    val df = Seq(
      // u1: the documented greedy counterexample — the deadline kills
      // the anchored match even though a later anchor would convert
      (1L, ts(0), "A"), (1L, ts(10), "A"), (1L, ts(11), "B"),
      // u2: converts A→B in-window, C outside it
      (2L, ts(0), "A"), (2L, ts(3), "B"), (2L, ts(100), "C"),
      // u3: full conversion, gaps 4s and 4s
      (3L, ts(0), "A"), (3L, ts(4), "B"), (3L, ts(8), "C"))
      .toDF("user_id", "ts", "event_type")
    val per = Events.funnelStepsWithin(df, "user_id", "ts", "event_type",
        steps, maxGapSec = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(per == Map(1L -> 1L, 2L -> 2L, 3L -> 3L), per.toString)
    // without the deadline the same users reach 2 / 3 / 3
    val free = Events.funnelSteps(df, "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(free == Map(1L -> 2L, 2L -> 3L, 3L -> 3L), free.toString)
    // per-step time-to-reach rows: step 1 has no gap; exact micros
    val times = Events.funnelTimes(df, "user_id", "ts", "event_type",
        steps, maxGapSec = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(times == Set((1L, 1L, -1L), (2L, 1L, -1L), (2L, 2L, 3000000L),
      (3L, 1L, -1L), (3L, 2L, 4000000L), (3L, 3L, 4000000L)), times.toString)
    // report: counts + median gap; a step nobody reaches keeps its row
    val rep = Events.funnelReportWithin(df, "user_id", "ts", "event_type",
        steps, maxGapSec = 5)
      .orderBy(col("step_idx")).collect()
    assert(rep.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "A", 3L), (2L, "B", 2L), (3L, "C", 1L)))
    assert(rep(0).isNullAt(3)) // step 1: no transition to time
    assert(rep(1).getDouble(3) == 3500000.0) // median of 3s, 4s
    assert(rep(2).getDouble(3) == 4000000.0)
    val rep0 = Events.funnelReportWithin(df, "user_id", "ts", "event_type",
        Seq("A", "B", "Z"), maxGapSec = 5)
      .orderBy(col("step_idx")).collect()
    assert(rep0.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "A", 3L), (2L, "B", 2L), (3L, "Z", 0L)))
    assert(rep0(2).isNullAt(3))
    // null timestamps DROP before the fold: left in, a null-ts step-1
    // match would NULL-freeze every later comparison (review r17); a
    // user whose events are all null-ts is absent
    val withNulls = df.union(Seq(
      (6L, null.asInstanceOf[java.sql.Timestamp], "A"),
      (6L, ts(0), "A"), (6L, ts(4), "B"),
      (7L, null.asInstanceOf[java.sql.Timestamp], "A"))
      .toDF("user_id", "ts", "event_type"))
    val pn = Events.funnelStepsWithin(withNulls, "user_id", "ts",
        "event_type", steps, maxGapSec = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pn == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 6L -> 2L), pn.toString)
  }

  test("funnel fold kernels == the HOF folds they replaced, exactly " +
      "(randomized events incl. null types, null ts, dup ts, deadlines)") {
    import graft.ops.Events
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val steps = Seq("A", "B", "C")
    val n = steps.length
    val stepsLit = typedLit(steps)
    val rnd = new scala.util.Random(7)
    val types = Array("A", "B", "C", "X", null)
    // 60 users x up to 14 events: random types (nulls included), random
    // seconds in [0, 20] (plenty of duplicate instants), plus a few
    // hand-built corner users
    val rows = (for {
      u <- 0L until 60L
      _ <- 0 until (1 + rnd.nextInt(14))
    } yield (u, ts(rnd.nextInt(21).toLong),
        types(rnd.nextInt(types.length)))) ++ Seq(
      (100L, null.asInstanceOf[java.sql.Timestamp], "A"), // null-ts anchor
      (100L, ts(1), "A"), (100L, ts(2), "B"), (100L, ts(3), "C"),
      (101L, ts(0), "A"), (101L, ts(0), "B"),             // non-strict ts
      (102L, ts(0), "A"), (102L, ts(5), "B"), (102L, ts(6), "C"), // gap==5
      (103L, ts(0), "A"), (103L, ts(6), "B"))              // gap==6 > 5
    val df = rows.toDF("user_id", "ts", "event_type")
    val evs = sort_array(collect_list(
      struct(col("ts").as("ts"), col("event_type").as("t"))))
    // === funnelSteps (no deadline): kernel vs the replaced HOF fold
    val hofReach = aggregate(
      evs,
      struct(lit(0).as("i"), lit(null).cast("timestamp").as("last")),
      (acc, e) => {
        val stepName = element_at(stepsLit,
          least(acc.getField("i") + 1, lit(n)))
        val advance = acc.getField("i") < n &&
          e.getField("t") === stepName &&
          (acc.getField("i") === 0 ||
            e.getField("ts") > acc.getField("last"))
        when(advance, struct((acc.getField("i") + 1).as("i"),
          e.getField("ts").as("last"))).otherwise(acc)
      },
      acc => acc.getField("i").cast("long"))
    val viaHof = df.groupBy(col("user_id")).agg(hofReach.as("reached"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaKernel = Events.funnelSteps(df, "user_id", "ts", "event_type",
        steps).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel == viaHof)
    // the null-ts anchor corner actually bites: user 100 anchors on the
    // null-ts A and freezes at depth 1 under BOTH implementations
    assert(viaKernel(100L) == 1L)
    assert(viaKernel(101L) == 1L) // equal instants never advance
    // === funnelStepsWithin (deadline): kernel vs the replaced HOF fold
    val gapUs = 5000000L
    val hofWithin = aggregate(
      evs,
      struct(lit(0).as("i"), lit(null).cast("timestamp").as("last"),
        array().cast("array<timestamp>").as("ml")),
      (acc, e) => {
        val stepName = element_at(stepsLit,
          least(acc.getField("i") + 1, lit(n)))
        val advance = acc.getField("i") < n &&
          e.getField("t") === stepName &&
          (acc.getField("i") === 0 ||
            (e.getField("ts") > acc.getField("last") &&
              unix_micros(e.getField("ts")) -
                unix_micros(acc.getField("last")) <= lit(gapUs)))
        when(advance, struct((acc.getField("i") + 1).as("i"),
          e.getField("ts").as("last"),
          concat(acc.getField("ml"), array(e.getField("ts"))).as("ml")))
          .otherwise(acc)
      },
      acc => struct(acc.getField("i").cast("long").as("reached"),
        acc.getField("ml").as("step_ts")))
    val hofW = df.filter(col("ts").isNotNull).groupBy(col("user_id"))
      .agg(hofWithin.getField("reached").as("reached"),
        hofWithin.getField("step_ts").as("step_ts"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[java.sql.Timestamp](2).toList))).toMap
    val kerW = Events.funnelStepsWithin(df, "user_id", "ts", "event_type",
        steps, maxGapSec = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[java.sql.Timestamp](2).toList))).toMap
    assert(kerW == hofW)
    // deadline boundary: gap exactly 5 s advances, 6 s does not
    assert(kerW(102L)._1 == 3L && kerW(103L)._1 == 1L)
  }

  test("groupQuantileSketch: discrete quantile inside a one-width band; " +
      "winsorizeSketch within grain of the discrete-exact clip; " +
      "robustStatsSketch error bounds") {
    import graft.ops.Profile
    val rnd = new scala.util.Random(42)
    // heavy-tailed (lognormal, σ=2): the shape that breaks per-group
    // exact-percentile buffers at scale
    val rows = for (g <- 0 until 3; _ <- 0 until 300)
      yield (s"g$g", math.exp(rnd.nextGaussian() * 2))
    val df = rows.toDF("g", "x")
    val hi = Math.nextUp(rows.map(_._2).max)
    val buckets = 64
    val width = (hi - 0.0) / buckets
    val byG = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    def disc(vs: IndexedSeq[Double], p: Double): Double =
      vs((math.max(1L, math.ceil(p * vs.size).toLong) - 1).toInt)
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val sk = Profile.groupQuantileSketch(df, "g", "x", probs, 0.0, hi, buckets)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    for (g <- byG.keys; p <- probs) {
      val d = disc(byG(g), p)
      val (qlo, qhi) = sk((g, p))
      assert(qlo <= d && d <= qhi, s"$g p=$p disc=$d not in [$qlo,$qhi]")
      assert(math.abs(qhi - qlo - width) < 1e-9, s"band width $g $p")
    }
    // winsorizeSketch: every clipped value within one grain of the
    // clip by the exact DISCRETE bounds
    val ws = Profile.winsorizeSketch(df, "g", "x", 0.0, hi, buckets,
        pLo = 0.05, pHi = 0.95)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(ws.length == rows.length)
    ws.foreach { case (g, x, w) =>
      val lo = disc(byG(g), 0.05)
      val hi95 = disc(byG(g), 0.95)
      val want = math.min(math.max(x, lo), hi95)
      assert(math.abs(w - want) <= width + 1e-6, s"$g $x: $w vs $want")
    }
    // robust stats: median within width/2, MAD within one width of
    // the discrete-exact statistics
    val rs = Profile.robustStatsSketch(df, "g", "x", 0.0, hi, buckets)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    for ((g, vs) <- byG) {
      val (n, medS, madS) = rs(g)
      assert(n == vs.size.toLong)
      val med = disc(vs, 0.5)
      val mad = disc(vs.map(v => math.abs(v - med)).sorted.toIndexedSeq, 0.5)
      assert(math.abs(medS - med) <= width / 2 + 1e-9, s"$g med $medS vs $med")
      assert(math.abs(madS - mad) <= width + 1e-9, s"$g mad $madS vs $mad")
    }
    // rz sanity: inliers small, the tail large, null never for this
    // null-free in-range input
    val rz = Profile.robustStandardizeSketch(df, "g", "x", 0.0, hi, buckets)
      .collect()
    assert(rz.length == rows.length && rz.forall(!_.isNullAt(2)))
  }

  test("topKIdsPerGroupAgg / weightedSampleIdsPerGroup == hydrated forms") {
    import graft.ops.Sampling
    val rnd = new scala.util.Random(11)
    val df = (0 until 400).map(i =>
      (i.toLong, s"g${i % 5}", rnd.nextInt(30))).toDF("id", "g", "score")
    // ids-only election == (group, id, rank) projection of the join form
    val ids = Sampling.topKIdsPerGroupAgg(df, "id", "g", "score", 6)
    assert(ids.columns.toSeq == Seq("g", "id", "rank_in_group"))
    val got = ids.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val hyd = Sampling.topKPerGroupAgg(df, "id", "g", "score", 6)
      .select(col("g"), col("id"), col("rank_in_group")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == hyd)
    // same for the A-ES draw: identical ids AND draw order, no join in
    // the ids-only plan (streaming-capable shape)
    val wdf = (0 until 300).map(i => (i.toLong, s"g${i % 3}",
      1.0 + (i % 7))).toDF("id", "g", "w")
    val sIds = Sampling.weightedSampleIdsPerGroup(wdf, "id", "g", "w", k = 8)
    assert(sIds.columns.toSeq == Seq("g", "id", "sample_rank"))
    val sGot = sIds.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val sHyd = Sampling.weightedSamplePerGroup(wdf, "id", "g", "w", k = 8)
      .select(col("g"), col("id"), col("sample_rank")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(sGot == sHyd)
    assert(!sIds.queryExecution.executedPlan.toString.contains("Join"),
      "ids-only election must not join back to the input")
    // partition invariance
    val rep = Sampling.weightedSampleIdsPerGroup(wdf.repartition(17),
        "id", "g", "w", k = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rep == sGot)
  }

  test("timeWeightedAvg: duration weighting, zero-span null, null drop, " +
      "partition invariance") {
    import graft.ops.Events
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // 10 held for 10s, 20 held for 20s, final sample holds nothing:
    // twa = (10*10 + 20*20)/30 = 16.666667 — the plain mean says 10
    val df = Seq((1L, ts(0), 10.0, 1L), (1L, ts(10), 20.0, 2L),
      (1L, ts(30), 0.0, 3L),
      (2L, ts(5), 7.0, 4L), // single sample: no duration
      (3L, ts(1), 1.0, 5L), (3L, ts(1), 9.0, 6L)) // all at one instant
      .toDF("k", "ts", "v", "tie")
    val got = Events.timeWeightedAvg(df, "k", "ts", "v", "tie")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(got(1L) == ((3L, Some(16.666667))), s"${got(1L)}")
    assert(got(2L) == ((1L, None)))
    assert(got(3L) == ((2L, None)), "zero-span key must report null twa")
    // null values drop before weighting
    val withNull = Seq((1L, ts(0), Some(10.0), 1L),
      (1L, ts(5), Option.empty[Double], 2L), (1L, ts(10), Some(20.0), 3L),
      (1L, ts(30), Some(0.0), 4L)).toDF("k", "ts", "v", "tie")
    val g2 = Events.timeWeightedAvg(withNull, "k", "ts", "v", "tie")
      .head()
    assert(g2.getLong(1) == 3L && g2.getDouble(4) == 16.666667, g2.toString)
    // partition invariance (decimal term sum is order-proof)
    val big = (0 until 500).map(i =>
      ((i % 7).toLong, ts(i * 13L % 997), (i % 23).toDouble - 5, i.toLong))
      .toDF("k", "ts", "v", "tie")
    val a = Events.timeWeightedAvg(big, "k", "ts", "v", "tie")
      .collect().map(_.toString).sorted.toSeq
    val b = Events.timeWeightedAvg(big.repartition(17), "k", "ts", "v", "tie")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("cramersV: perfect association == 1, independence == 0, " +
      "single-level null, null category sentinel") {
    import graft.ops.Profile
    // perfect: a determines b
    val perfect = ((1 to 5).map(_ => ("x", "p")) ++
      (1 to 5).map(_ => ("y", "q"))).toDF("a", "b")
    val p = Profile.cramersV(perfect, "a", "b").head()
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == ((10L, 2L, 2L)))
    assert(p.getDouble(4) == 1.0, p.toString)
    // chi2 by hand: 4 cells, e = 2.5 each, (o−e)²/e = 2.5 each → 10
    assert(p.getDouble(3) == 10.0, p.toString)
    // independence: uniform 2×2
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .flatMap(Seq.fill(3)(_)).toDF("a", "b")
    val i = Profile.cramersV(indep, "a", "b").head()
    assert(i.getDouble(3) == 0.0 && i.getDouble(4) == 0.0, i.toString)
    // single level on one axis: no association to measure
    val single = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val s = Profile.cramersV(single, "a", "b").head()
    assert(s.isNullAt(4), s.toString)
    // nulls are their own level
    val withNull = Seq((Some("x"), "p"), (Option.empty[String], "q"))
      .toDF("a", "b")
    val n = Profile.cramersV(withNull, "a", "b").head()
    assert(n.getLong(1) == 2L, "null category must count as a level")
    // partition invariance (grained term sum)
    val big = (0 until 400).map(i =>
      (s"a${i % 3}", s"b${(i * 7) % 5}")).toDF("a", "b")
    val x = Profile.cramersV(big, "a", "b").head()
    val y = Profile.cramersV(big.repartition(13), "a", "b").head()
    assert(x == y)
  }

  test("winsorize / robustStandardize: clip band, outlier immunity, " +
      "zero-MAD null, null passthrough") {
    import graft.ops.Profile
    // one wild value among 1..9: winsorize at [0.1, 0.9] tames it
    val df = ((1 to 9).map(i => ("g", Some(i.toDouble))) :+
      (("g", Some(1000.0))) :+ (("g", Option.empty[Double])))
      .toDF("k", "v")
    val w = Profile.winsorize(df, "k", "v", pLo = 0.1, pHi = 0.9)
      .collect().map(r =>
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
         if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    // p90 rank = 0.9·(10−1) = 8.1 → 9 + 0.1·(1000−9) = 108.1; p10 → 1.9
    assert(w.contains((Some(1000.0), Some(108.1))), s"$w")
    assert(w.contains((Some(1.0), Some(1.9))), s"$w")
    assert(w.contains((None, None)), "null x stays null")
    assert(w.contains((Some(5.0), Some(5.0))), "in-band values unchanged")
    // robust z: the wild value barely moves everyone else's score
    val rz = Profile.robustStandardize(df, "k", "v")
      .collect().filter(!_.isNullAt(1))
      .map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // median of 1..9,1000 = 5.5; |x−5.5| sorted =
    // 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 → MAD = 2.5
    assert(math.abs(rz(5.0) - (-0.5 / (1.4826 * 2.5))) < 1e-5, s"$rz")
    assert(rz(1000.0) > 100, "the outlier itself scores huge")
    // zero-MAD group (constant majority) nulls out
    val const = (1 to 9).map(_ => ("g", 4.0)).toDF("k", "v")
      .union(Seq(("g", 99.0)).toDF("k", "v"))
    val z0 = Profile.robustStandardize(const, "k", "v").collect()
    assert(z0.forall(_.isNullAt(2)), "zero MAD must null rz")
  }

  test("property: timeWeightedAvg == brute-force step integral on " +
      "random series") {
    import graft.ops.Events
    val rnd = new scala.util.Random(99)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val data = (0 until 300).map { i =>
      ((i % 5).toLong, rnd.nextInt(5000).toLong,
        math.floor(rnd.nextDouble() * 200 - 100) / 10, i.toLong)
    }
    val df = data.map(x => (x._1, ts(x._2), x._3, x._4))
      .toDF("k", "ts", "v", "tie")
    val got = Events.timeWeightedAvg(df, "k", "ts", "v", "tie")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    for ((k, rows) <- data.groupBy(_._1)) {
      val sorted = rows.sortBy(x => (x._2, x._4))
      val span = (sorted.last._2 - sorted.head._2) * 1000000L
      val want =
        if (span == 0) None
        else {
          // exact replication of the op's grain arithmetic: v6·Δus
          // summed exactly, one final double division
          val st = sorted.sliding(2).collect {
            case Seq((_, t1, v, _), (_, t2, _, _)) =>
              BigInt(math.floor(v * 1e6).toLong) * BigInt((t2 - t1) * 1000000L)
          }.sum
          Some(BigDecimal(st.toDouble / 1e6 / span)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      assert(got(k) == want, s"key $k: got ${got(k)} want $want")
    }
  }

  test("ohlcResample: endpoint determinism on ts ties, epoch-aligned " +
      "buckets, null drop") {
    import graft.ops.Events
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // one hour bucket: ts-tied openers resolve by tie asc — open is the
    // tie-1 sample, not the tie-2 one; close is the last by (ts, tie)
    val df = Seq((1L, ts(10), Some(5.0), 1L), (1L, ts(10), Some(9.0), 2L),
      (1L, ts(20), Some(1.0), 3L), (1L, ts(30), Option.empty[Double], 4L),
      (1L, ts(3700), Some(7.0), 5L)) // next hour
      .toDF("k", "ts", "v", "tie")
    val got = Events.ohlcResample(df, "k", "ts", "v", "tie", "1 hour")
      .collect().map(r => (r.getTimestamp(1).getTime / 1000,
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getLong(6))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 5.0, 9.0, 1.0, 1.0, 3L),
      (3600L, 7.0, 7.0, 7.0, 7.0, 1L)), s"$got")
    // partition invariance (endpoint elections are tie-total)
    val rep = Events.ohlcResample(df.repartition(5), "k", "ts", "v", "tie",
        "1 hour")
      .collect().map(r => (r.getTimestamp(1).getTime / 1000,
        r.getDouble(2), r.getDouble(5))).sortBy(_._1).toSeq
    assert(rep == got.map(x => (x._1, x._2, x._5)))
  }

  test("scd2: consecutive-identical collapse, intervals, ties by tieCol") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val log = Seq(
      (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "A"), // resend: collapses
      (1L, ts(3), 12L, "B"), (1L, ts(4), 13L, "A"),
      (2L, ts(5), 14L, "X"),
      // equal timestamps: event_id orders them (15 before 16)
      (3L, ts(6), 16L, "Q"), (3L, ts(6), 15L, "P"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Events.scd2(log, "user_id", "ts", "event_id",
        "event_type")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
        (2L, 1L, "X"), (3L, 1L, "P"), (3L, 2L, "Q")))
    // interval chaining: A [t1, t3), B [t3, t4), A [t4, null) current
    assert(out(0)._4 == ts(1) && out(0)._5.contains(ts(3)) && !out(0)._6)
    assert(out(1)._5.contains(ts(4)))
    assert(out(2)._5.isEmpty && out(2)._6)
    // the equal-ts pair chains P -> Q by event_id order
    assert(out(4)._5.contains(ts(6)) && out(5)._6)
  }

  test("scd2 and resampleDailyFfill: partition invariance") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(17)
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val log = (0 until 300).map(i =>
      (i.toLong % 9, ts(rnd.nextInt(5000)), i.toLong,
        s"v${rnd.nextInt(3)}", rnd.nextDouble() * 10))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    def canonScd(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Events.scd2(d, "user_id", "ts", "event_id", "event_type")
        .collect().map(_.toString).sorted.toSeq
    assert(canonScd(log) == canonScd(log.repartition(11)))
    def canonRes(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Events.resampleDailyFfill(d, "user_id", "ts", "value",
          "event_type", "event_id")
        .collect().map(_.toString).sorted.toSeq
    assert(canonRes(log) == canonRes(log.repartition(11)))
  }

  test("decayedScore: exact power-of-two decay at integer grain") {
    import java.sql.Timestamp
    val base = 1700000000L
    def ts(daysAgo: Double) =
      new Timestamp((base - (daysAgo * 86400).toLong) * 1000L)
    val ev = Seq(
      (1L, ts(0), 10.0),   // n=0: 10.0
      (1L, ts(8), 10.0),   // 8d, hl=7 -> n=1: 5.0
      (1L, ts(30), 12.0),  // n=4: 0.75
      (2L, ts(3.5), 7.0))  // n=0: 7.0
      .toDF("user_id", "ts", "value")
    val out = graft.ops.Events.decayedScore(ev, "user_id", "ts", "value",
        halfLifeDays = 7, asOfEpochSec = Some(base))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out(0) == ((1L, 15.75, 3L)))
    assert(out(1) == ((2L, 7.0, 1L)))
    // default as-of = corpus max ts
    val out2 = graft.ops.Events.decayedScore(ev, "user_id", "ts", "value",
        halfLifeDays = 7).orderBy("user_id").collect()
    assert(out2(0).getDouble(1) == 15.75)
  }

  test("invertedIndex: positions, df/tf, ordered postings, minDf prune") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog. sat"),
      (3L, "CAT cat")).toDF("doc_id", "text")
    val out = graft.ops.Retrieval.invertedIndex(df, "text", "doc_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out("the") == ((2L, 3L, "1:1|5;2:1")))
    assert(out("cat") == ((2L, 3L, "1:2;3:1|2"))) // case-folded
    assert(out("sat") == ((2L, 2L, "1:3;2:3")))
    assert(!out.contains("dog.")) // punctuation fragment dropped
    val pruned = graft.ops.Retrieval.invertedIndex(df, "text", "doc_id",
      minDf = 2).collect().map(_.getString(0)).sorted.toSeq
    assert(pruned == Seq("cat", "sat", "the"))
  }

  test("blockedPairs: only in-block pairs, threshold distance, a<b") {
    val df = Seq(
      (1L, "smith john", "b1"), (2L, "smith jon", "b1"),
      (3L, "smith johnny", "b1"), // dist 2 from #1, 3 from #2
      (4L, "smith john", "b2")) // same name, other block: never paired
      .toDF("id", "name", "blk")
    val out = graft.ops.Linkage.blockedPairs(df, "id", "name",
        col("blk"), maxDist = 2)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("jaroWinklerValue: published worked examples + edge cases") {
    import graft.ops.Linkage.jaroWinklerValue
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(close(jaroWinklerValue("martha", "marhta"), 0.9611111111111111))
    assert(close(jaroWinklerValue("dixon", "dicksonx"), 0.8133333333333332))
    // no boost when jaro <= 0.7 (CRATE/TRACE has prefix 0 anyway) and
    // when there is no common prefix
    assert(close(jaroWinklerValue("CRATE", "TRACE"), 0.7333333333333334))
    assert(close(jaroWinklerValue("jellyfish", "smellyfish"),
      0.8962962962962964))
    // boost prefix caps at 4
    assert(close(jaroWinklerValue("abcd", "abcd!!!!!!!!!!!!!!!!!"),
      0.8380952380952381))
    // either-empty and zero-match conventions (DuckDB parity)
    assert(jaroWinklerValue("", "") == 0.0)
    assert(jaroWinklerValue("", "abc") == 0.0)
    assert(jaroWinklerValue("ab", "ba") == 0.0) // window 0: no matches
    assert(jaroWinklerValue("abc", "abc") == 1.0)
    // SQL surface registers the codegen'd expression
    graft.spark.GraftExtensions.install(spark)
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(close(viaSql, 0.9611111111111111))
    // code-POINT granularity pin: 20 astral chars are 20 units to this
    // kernel (a UTF-16-unit kernel would score 40/43 = 0.98605 here);
    // the end-to-end DataFrame path keeps the pair through the length
    // guard (the discriminating guard-vs-kernel consistency property
    // lives in the conservativeness test's astral alphabet)
    val astral = "𝕏" * 20 // 20 code points, 40 UTF-16 units
    val jwAstral = jaroWinklerValue(astral, astral + "abc")
    assert(close(jwAstral, 0.9739130434782608), jwAstral.toString)
    val pair = Seq((1L, astral), (2L, astral + "abc"))
      .toDF("id", "name").withColumn("blk", lit("b"))
    val kept = graft.ops.Linkage.blockedPairsJw(pair, "id", "name",
      col("blk"), minSim = 0.97).count()
    assert(kept == 1L, "astral pair must survive the guard end-to-end")
  }

  test("JW length bound is conservative: jw >= c implies the guard") {
    import graft.ops.Linkage.jaroWinklerValue
    val rnd = new scala.util.Random(11)
    // alphabet includes an astral char: the guard compares code-point
    // lengths (Catalyst length()), so the property would FAIL under a
    // UTF-16-unit kernel — this is the discriminating regression pin
    // for the code-point alignment fix
    val alphabet = Seq("a", "b", "c", "d", "𝕏")
    def randStr() = (0 until 1 + rnd.nextInt(20))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (c <- Seq(0.9, 0.95, 0.985)) {
      val r = 3 * ((c - 0.4) / 0.6) - 2
      assert(r > 0)
      for (_ <- 0 until 2000) {
        val (a, b) = (randStr(), randStr())
        if (jaroWinklerValue(a, b) >= c) {
          // code-POINT lengths — the unit Catalyst length() counts and
          // the guard compares
          val pa = a.codePointCount(0, a.length)
          val pb = b.codePointCount(0, b.length)
          val (lo, hi) = (math.min(pa, pb), math.max(pa, pb))
          assert(lo >= r * hi,
            s"bound dropped qualifying pair ($a, $b) at c=$c")
        }
      }
    }
  }

  test("byteJaccardValue: byte-set semantics incl. multi-byte, SQL surface") {
    import graft.ops.Linkage.byteJaccardValue
    def j(a: String, b: String) =
      byteJaccardValue(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    assert(j("ab", "b") == 0.5)
    assert(j("aab", "ab") == 1.0) // SET of bytes, multiplicity-free
    assert(j("abc", "abc") == 1.0)
    assert(j("AB", "ab") == 0.0) // case = different bytes
    // multi-byte code points contribute individual bytes (DuckDB parity:
    // 'héllo' vs 'hello' = {h,C3,A9,l,o} vs {h,e,l,o} = 3/6)
    assert(j("héllo", "hello") == 0.5)
    assert(j("", "abc") == 0.0 && j("", "") == 0.0)
    graft.spark.GraftExtensions.install(spark)
    assert(spark.sql("SELECT graft_byte_jaccard('ab', 'b')")
      .head().getDouble(0) == 0.5)
  }

  test("labelOutliers: cosine to own centroid, flag below threshold") {
    val df = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(1.0f, 0.1f)),
      (3L, 0, Array(-1.0f, 0.0f)), // opposite: negative cosine
      (4L, 1, Array(0.0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val out = graft.ops.Embeddings.labelOutliers(df, "embedding",
        "vec_id", "label", threshold = 0.0)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(out(0)._2 > 0.9 && !out(0)._3)
    assert(out(2)._2 < -0.9 && out(2)._3)
    assert(math.abs(out(3)._2 - 1.0) < 1e-6 && !out(3)._3)
    // partition invariance (integer-grain centroid)
    val rep = graft.ops.Embeddings.labelOutliers(
        df.repartition(7), "embedding", "vec_id", "label", 0.0)
      .orderBy("id").collect().map(_.getDouble(2)).toSeq
    assert(rep == out.map(_._2).toSeq)
  }

  test("zorderKey2: exact Morton interleave, envelope report quadrants") {
    import graft.ops.Layout
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
    val z = df.select(Layout.zorderKey2(col("a"), col("b"), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(a=3 (011), b=5 (101)) = a1 b1 a0 b0: bits
    // z = sum a_i<<(2i+1) | b_i<<2i = (1<<1)|(1<<3) | (1<<0)|(1<<4) = 27
    assert(z == Seq(0L, 2L, 1L, 3L, 27L))
    // envelope: 4 buckets over 2-bit dims -> each zorder bucket is one
    // quadrant (half of each dim); linear buckets span all of b
    val grid = (for (a <- 0 until 4; b <- 0 until 4) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val rep = Layout.zorderEnvelopeReport(grid, "a", "b", bits = 2,
        nBuckets = 4)
      .orderBy("layout", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    val zorder = rep.filter(_._1 == "zorder")
    assert(zorder.forall(r => r._4 - r._3 == 1 && r._6 - r._5 == 1),
      s"each zorder bucket must span half of each dim: ${zorder.toSeq}")
    val linear = rep.filter(_._1 == "linear")
    assert(linear.forall(r => r._5 == 0 && r._6 == 3),
      "linear buckets span the whole b domain")
  }

  test("zorderKey N-dim: 2-col case == zorderKey2, 3-col round-robin") {
    import graft.ops.Layout
    val df = Seq((3L, 5L, 6L)).toDF("a", "b", "c")
    val two = df.select(
      Layout.zorderKey(Seq(col("a"), col("b")), 3).as("zn"),
      Layout.zorderKey2(col("a"), col("b"), 3).as("z2")).head()
    assert(two.getLong(0) == two.getLong(1))
    // 3 cols x 2 bits: round i holds bits (a_i b_i c_i) at 3i+2,3i+1,3i
    // a=11b, b=01b, c=10b -> round0: a0=1,b0=1,c0=0 -> 110b at bits 2..0
    // round1: a1=1,b1=0,c1=1 -> 101b at bits 5..3 => 101110b = 46
    val three = df.select(
      Layout.zorderKey(Seq(col("a"), col("b"), col("c")), 2)).head().getLong(0)
    assert(three == 46L)
  }

  test("clusterByZorder: range partitions follow the morton key") {
    import graft.ops.Layout
    val grid = (for (a <- 0 until 8; b <- 0 until 8) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val parts = Layout.clusterByZorder(grid, "a", "b", bits = 3,
        nPartitions = 4)
      .rdd.mapPartitionsWithIndex { (i, it) =>
        Iterator.single(i -> it.map(r => (r.getLong(0), r.getLong(1))).toSeq)
      }.collect().toMap
    assert(parts.values.map(_.size).sum == 64)
    // partitions are contiguous, non-overlapping z ranges
    def zOf(p: (Long, Long)) = (0 until 3).map(i =>
      (((p._1 >> i) & 1) << (2 * i + 1)) | (((p._2 >> i) & 1) << (2 * i))).sum
    val ranges = parts.toSeq.sortBy(_._1)
      .map { case (_, rows) => (rows.map(zOf).min, rows.map(zOf).max) }
      .filter(_ => true)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ => ()
    }
  }

  test("writeClustered: per-file envelopes rectangular on both dims") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_wc")
    try {
      val grid = (for (a <- 0 until 64; b <- 0 until 64)
        yield (a.toLong, b.toLong, s"pay-$a-$b")).toDF("a", "b", "pay")
      // ~tiny files so several materialize
      val (rpf, _) = graft.ops.Materialize.writeClustered(grid,
        s"$scratch/out", "a", "b", bits = 6, targetFileMB = 1)
      assert(rpf >= 1L)
      val back = spark.read.parquet(s"$scratch/out")
      assert(back.count() == 64L * 64)
      assert(back.columns.sorted.toSeq == Seq("a", "b", "pay"))
      val envs = back
        .select(input_file_name().as("f"), col("a"), col("b"))
        .groupBy("f")
        .agg((max(col("a")) - min(col("a"))).as("sa"),
          (max(col("b")) - min(col("b"))).as("sb"))
        .collect()
      // with a z-ordered layout no file should span a full dimension on
      // BOTH axes (a linear sort would give sb = 63 for every file)
      if (envs.length >= 4) {
        assert(envs.forall(r => r.getLong(1) < 63 || r.getLong(2) < 63),
          envs.mkString(","))
        assert(envs.count(_.getLong(2) < 63) * 2 >= envs.length,
          envs.mkString(","))
      }
    } finally {
      rmScratch(scratch)
    }
  }

  test("cojoinBucketed: shuffle-free sort-merge join, correct rows") {
    import graft.ops.Layout
    val scratch = java.nio.file.Files.createTempDirectory("graft_bkt_t")
    try {
      val l = (0 until 100).map(i => (i.toLong % 10, i.toLong))
        .toDF("k", "lv")
      val r = (0 until 10).map(i => (i.toLong, s"n$i")).toDF("k", "rv")
      val j = Layout.cojoinBucketed(spark, l, r, "k", nBuckets = 4,
        scratch.toString, "graft_t_l", "graft_t_r")
      assert(j.count() == 100)
      assert(j.filter(col("k") === 3L).count() == 10)
      // the write-time amortization extends to aggregation: groupBy on
      // the bucket key over the bucketed table plans NO exchange either
      val agg = spark.table("graft_t_l").groupBy(col("k")).count()
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        agg.queryExecution.executedPlan.toString)
      assert(agg.count() == 10)
      Seq("graft_t_l", "graft_t_r")
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    } finally {
      rmScratch(scratch)
    }
  }

  test("resampleDailyFfill: gap rows, forward fill, in-day latest") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      (1L, ts(1, 9), 10L, 2.5, "a"), (1L, ts(1, 17), 11L, 1.0, "b"),
      (1L, ts(4, 8), 12L, 4.0, "c"), // 2 silent days in between
      (2L, ts(2, 1), 13L, 1.5, "x"))
      .toDF("user_id", "ts", "event_id", "value", "event_type")
    val out = graft.ops.Events.resampleDailyFfill(ev, "user_id", "ts",
        "value", "event_type", "event_id")
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getString(4)))
    assert(out.length == 5) // user 1: days 1-4; user 2: day 2
    assert(out(0) == ((1L, "2024-01-01", 2L, 3.5, "b"))) // latest-in-day
    assert(out(1) == ((1L, "2024-01-02", 0L, 0.0, "b"))) // gap, ffilled
    assert(out(2) == ((1L, "2024-01-03", 0L, 0.0, "b")))
    assert(out(3) == ((1L, "2024-01-04", 1L, 4.0, "c")))
    assert(out(4) == ((2L, "2024-01-02", 1L, 1.5, "x")))
  }

  test("mergeAggStates: merge(base, delta) == state(union), disjoint keys") {
    import graft.ops.Snapshot
    val all = Seq((1L, 2.0), (1L, 3.5), (1L, -1.0), (2L, 7.0), (3L, 0.5))
      .toDF("k", "v")
    val base = Snapshot.additiveAggState(
      all.filter(col("v") > 0), "k", "v")
    val delta = Snapshot.additiveAggState(
      all.filter(col("v") <= 0), "k", "v") // key 3 only in base side? no:
    val merged = Snapshot.mergeAggStates(base, delta)
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val full = Snapshot.additiveAggState(all, "k", "v")
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(merged.toSeq == full.toSeq)
    // keys present on one side only must survive the full-outer merge
    assert(merged.exists(_._1 == 2L) && merged.exists(_._1 == 3L))
  }

  test("groupedCorr: exact signed correlation, zero-variance null") {
    import graft.ops.Profile
    val df = Seq(
      ("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 30.0),
      ("dn", 1.0, 5.0), ("dn", 2.0, 3.0), ("dn", 3.0, 1.0),
      ("flat", 1.0, 7.0), ("flat", 2.0, 7.0))
      .toDF("g", "x", "y")
    val out = Profile.groupedCorr(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out("up") == ((3L, Some(1.0))))
    assert(out("dn") == ((3L, Some(-1.0))))
    assert(out("flat")._2.isEmpty) // zero y-variance: null, not NaN crash
    // partition invariance (exact integer sufficient statistics)
    val rep = Profile.groupedCorr(df.repartition(5), "g", "x", "y")
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(rep == out.map { case (k, v) => k -> v._2.map(_.asInstanceOf[Any]) })
  }

  test("groupedOls: exact line recovery, grain de-quantization") {
    import graft.ops.Profile
    // y = 3x + 2 exactly
    val df = (1 to 5).map(i => ("g", i.toDouble, 3.0 * i + 2))
      .toDF("g", "x", "y")
    val r = Profile.groupedOls(df, "g", "x", "y").head()
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 2.0)
    // y in cents, x unscaled: slope de-quantizes by gx/gy
    val cents = (1 to 5).map(i => ("g", i.toDouble, (3.0 * i + 2) / 100))
      .toDF("g", "x", "y")
    val rc = Profile.groupedOls(cents, "g", "x", "y", xGrain = 1, yGrain = 100)
    assert(rc.head().getDouble(2) == 0.03 && rc.head().getDouble(3) == 0.02)
    // zero x-variance: null fit
    val flat = Seq(("g", 2.0, 1.0), ("g", 2.0, 9.0)).toDF("g", "x", "y")
    assert(Profile.groupedOls(flat, "g", "x", "y").head().isNullAt(2))
  }

  test("packingPlan: exact chunk math, packed beats padded") {
    val df = Seq("a b c d e", "a b c", "", "a").toDF("text")
    val out = graft.ops.Packing.packingPlan(df, "text", Seq(4))
      .head()
    // docs: 5, 3, (blank dropped), 1 tokens; L=4:
    // chunks: 2 + 1 + 1 = 4 -> padded 16; total 9 -> packed ceil(9/4)*4=12
    assert(out.getLong(1) == 3L && out.getLong(2) == 9L)
    assert(out.getLong(3) == 16L && out.getLong(5) == 12L)
    assert(out.getDouble(4) > out.getDouble(6))
  }

  test("langIdWithConfidence: margins, script tier, tie and und cases") {
    import graft.ops.TextStats
    val df = Seq(
      (0L, "the cat is of the and in a to house"), // en, strong margin
      (1L, "la de the"),                           // es 2 vs en 1 -> margin 1
      (2L, "zz qq ww"),                            // und: 0, 0
      (3L, "的 是 一 在 不 了 有 和"),                // zh script tier
      (4L, "le la de")).toDF("doc_id", "text")     // es/fr tie at 2 -> margin 0
    val out = df.select(col("doc_id"),
        TextStats.langIdWithConfidence(col("text")).as("c"))
      .orderBy("doc_id").collect()
      .map(r => { val c = r.getStruct(1)
        (c.getString(0), c.getInt(1), c.getInt(2)) })
    assert(out(0)._1 == "en" && out(0)._2 >= 5 && out(0)._3 == 0)
    assert(out(1) == ("es", 2, 1))
    assert(out(2) == ("und", 0, 0))
    assert(out(3)._1 == "zh" && out(3)._2 == 8 && out(3)._3 == 0)
    // tie: es wins by list order but margin 0 flags it unconfident
    assert(out(4) == ("es", 2, 2))
    // lang agrees with the kernel langId everywhere on the real corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dis = docs.select(
        TextStats.langId(col("text")).as("k"),
        TextStats.langIdWithConfidence(col("text")).getField("lang").as("d"))
      .filter(col("k") =!= col("d")).count()
    assert(dis == 0)
  }

  test("videoFingerprints: luma-contour bits, brightness invariance, near-dup") {
    import graft.ops.{Codecs, Dedup, Multimodal}
    def frame(luma: Int) =
      (Array.fill(8)(luma.toByte) ++ Array.fill(4)(0.toByte))
    def y4m(lumas: Seq[Int]) =
      Codecs.encodeY4m(4, 2, "25:1", lumas.map(frame))
    val base = Seq(10, 60, 20, 80, 30, 90, 40, 95)
    val brighter = base.map(_ + 20)        // uniform brightness shift
    val tweaked = base.updated(2, 25)      // small local edit
    val reversed = base.reverse
    val media = Seq(
      (0L, "video", y4m(base)), (1L, "video", y4m(brighter)),
      (2L, "video", y4m(tweaked)), (3L, "video", y4m(reversed)))
      .toDF("media_id", "kind", "data")
    val fp = Multimodal.videoFingerprints(media)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fp(1L) == fp(0L)) // brightness invariance
    assert(java.lang.Long.bitCount(fp(0L) ^ fp(2L)) <= 2)
    assert(java.lang.Long.bitCount(fp(0L) ^ fp(3L)) > 3)
    // composes with hammingPairs64: tweak found, reverse excluded
    val sigs = Multimodal.videoFingerprints(media)
      .filter(col("media_id").isin(0L, 2L, 3L))
    val pairs = Dedup.hammingPairs64(sigs, "media_id", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)) && !pairs.exists(p => p._2 == 3L))
  }

  test("funnel: ordered subsequence with strict time increase") {
    import graft.ops.Events
    val ev = Seq(
      // u1 completes all three in order
      ("u1", 10L, "signup"), ("u1", 20L, "click"), ("u1", 30L, "purchase"),
      // u2 purchases BEFORE clicking: depth 2
      ("u2", 10L, "signup"), ("u2", 15L, "purchase"), ("u2", 20L, "click"),
      // u3 clicks at the SAME ts as signup: strict increase -> depth 1,
      // but a later second click advances it to 2
      ("u3", 10L, "signup"), ("u3", 10L, "click"), ("u3", 40L, "click"),
      // u4 never signs up: depth 0 despite click+purchase
      ("u4", 5L, "click"), ("u4", 6L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val steps = Seq("signup", "click", "purchase")
    val per = Events.funnelSteps(ev, "user_id", "ts", "event_type", steps)
      .orderBy("user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(per == Seq(("u1", 3L), ("u2", 2L), ("u3", 2L), ("u4", 0L)))
    val report = Events.funnelReport(ev, "user_id", "ts", "event_type", steps)
      .orderBy("step_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(report == Seq((1L, "signup", 3L), (2L, "click", 3L),
      (3L, "purchase", 1L)))
    // partitioning invariance
    val rep = Events.funnelSteps(ev.repartition(7), "user_id", "ts",
        "event_type", steps)
      .orderBy("user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rep == per)
  }

  test("asofJoinDirected: forward/nearest semantics, equality, ties, tolerance") {
    import graft.ops.Joins
    val left = Seq((1L, "u", 100L), (2L, "u", 205L), (3L, "u", 300L),
      (4L, "v", 50L)).toDF("lid", "k", "t")
    val right = Seq((10L, "u", 100L), (11L, "u", 210L), (12L, "u", 280L))
      .toDF("rid", "k", "t")
    def run(dir: String, tol: Option[Long] = None) =
      Joins.asofJoinDirected(left, right, "k", "t", dir,
        toleranceSec = tol)
        .select("lid", "r_rid").orderBy("lid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSeq
    // forward: first right at-or-after (inclusive at equality)
    assert(run("forward") == Seq((1L, 10L), (2L, 11L), (3L, -1L), (4L, -1L)))
    // nearest: 205 is 5 from 210 (fwd) vs 105 from 100 (back) -> fwd;
    // 300 has no forward -> back 280; 100 exact -> itself
    assert(run("nearest") == Seq((1L, 10L), (2L, 11L), (3L, 12L), (4L, -1L)))
    // tie goes backward: left 245 equidistant (35) from 210 and 280
    val tieL = Seq((9L, "u", 245L)).toDF("lid", "k", "t")
    val tie = Joins.asofJoinDirected(tieL, right, "k", "t", "nearest")
      .select("r_rid").head().getLong(0)
    assert(tie == 11L)
    // tolerance nulls far matches (numeric axis: raw units)
    assert(run("nearest", tol = Some(10L)) ==
      Seq((1L, 10L), (2L, 11L), (3L, -1L), (4L, -1L)))
    // backward direction delegates to the proven asofJoin
    assert(run("backward") == Seq((1L, 10L), (2L, 10L), (3L, 12L), (4L, -1L)))
  }

  test("pseudonymizeEmails: stable tokens, coreference preserved, count") {
    import graft.ops.TextClean
    val df = Seq(
      (0L, "from a@x.com to b@y.org, cc a@x.com"),
      (1L, "reply by A@x.com only"),
      (2L, "no addresses here")).toDF("doc_id", "text")
    val out = TextClean.pseudonymizeEmails(df, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    def tok(e: String) = "<EMAIL_" + java.security.MessageDigest
      .getInstance("MD5").digest(e.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(8) + ">"
    // both occurrences of a@x.com get the SAME token (coreference)
    assert(out(0)._1 ==
      s"from ${tok("a@x.com")} to ${tok("b@y.org")}, cc ${tok("a@x.com")}")
    assert(out(0)._2 == 2L)
    // case-insensitive identity: A@x.com maps to a@x.com's token
    assert(out(1)._1 == s"reply by ${tok("a@x.com")} only")
    // untouched doc passes through with zero identities
    assert(out(2)._1 == "no addresses here" && out(2)._2 == 0L)
  }

  test("sceneChanges: integer cut verdicts incl. the exact-threshold boundary") {
    import graft.ops.{Codecs, Multimodal}
    // 4x2 C420: frame = 8 luma bytes + 2+2 chroma; flat-luma frames at
    // 10, 10, 16, 116 -> deltas 0, 6 (== tau, must cut), 100
    def frame(luma: Int) =
      (Array.fill(8)(luma.toByte) ++ Array.fill(4)(0.toByte))
    val y4m = Codecs.encodeY4m(4, 2, "25:1",
      Seq(frame(10), frame(10), frame(16), frame(116)))
    val media = Seq((5L, "video", y4m)).toDF("media_id", "kind", "data")
    val out = Multimodal.sceneChanges(media, threshold = 6.0)
      .orderBy("frame_idx").collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(out == Seq((1, 0.0, 0L), (2, 6.0, 1L), (3, 100.0, 1L)))
  }

  test("cmsInnerProduct: join-size estimate one-sided, exact at wide w") {
    import graft.ops.Sketch
    val a = Seq((0L, "x x y z"), (1L, "x w")).toDF("id", "text")
    val b = Seq((2L, "x y y q")).toDF("id", "text")
    // exact join size: x 3*1 + y 1*2 = 5 (z, w, q unmatched)
    val wide = Sketch.cmsInnerProduct(
      Sketch.cmsTable(a, "text", d = 3, w = 4096),
      Sketch.cmsTable(b, "text", d = 3, w = 4096)).head().getLong(0)
    assert(wide == 5L)
    // brutal collisions (w=2): still one-sided, never under
    val tight = Sketch.cmsInnerProduct(
      Sketch.cmsTable(a, "text", d = 3, w = 2),
      Sketch.cmsTable(b, "text", d = 3, w = 2)).head().getLong(0)
    assert(tight >= 5L)
    // disjoint vocabularies estimate low (0 at wide w)
    val disj = Sketch.cmsInnerProduct(
      Sketch.cmsTable(a, "text", d = 3, w = 4096),
      Sketch.cmsTable(Seq((9L, "none here")).toDF("id", "text"),
        "text", d = 3, w = 4096)).head()
    assert(disj.getLong(0) == 0L)
  }

  test("audioFingerprints: energy-contour bits, gain invariance, hamming composability") {
    import graft.ops.{Codecs, Dedup, Multimodal}
    def wavDf(rows: Seq[(Long, Array[Short])]) = {
      val data = rows.map { case (id, s) =>
        (id, "audio", Codecs.encodeWav(8000, s)) }
      data.toDF("media_id", "kind", "data")
    }
    // deterministic contour: monotone rising ramp (ASYMMETRIC — its
    // reverse has the complementary contour)
    val base = Array.tabulate(32)(i => (i * 40).toShort)
    val gained = base.map(s => (s * 2).toShort) // uniform gain
    val noisy = base.clone(); noisy(5) = (noisy(5) + 30).toShort // tiny edit
    val reversed = base.reverse
    val fp = Multimodal.audioFingerprints(
        wavDf(Seq((0L, base), (1L, gained), (2L, noisy), (3L, reversed))))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // gain invariance: energies scale uniformly, deltas keep their sign
    assert(fp(1L) == fp(0L))
    // a tiny local edit moves at most a couple of contour bits
    assert(java.lang.Long.bitCount(fp(0L) ^ fp(2L)) <= 2)
    // a reversed clip flips the contour — far in hamming space
    assert(java.lang.Long.bitCount(fp(0L) ^ fp(3L)) > 4)
    // the signatures feed hammingPairs64 unchanged: near pair found,
    // reversed clip excluded at maxHamming=3
    val sigs = Multimodal.audioFingerprints(
      wavDf(Seq((0L, base), (2L, noisy), (3L, reversed))))
    val pairs = Dedup.hammingPairs64(sigs, "media_id", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)) && !pairs.exists(p => p._2 == 3L))
  }

  test("randomProject: deterministic ±1 JL with exact integer grains") {
    import graft.ops.Embeddings
    // hand case: outDim 1, the value is just the signed grain sum
    val tiny = Seq((0L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val got = Embeddings.randomProject(tiny, "embedding", "vec_id", 1, "t")
      .head()
    val s0 = Embeddings.rpSign("t", 0, 0)
    val s1 = Embeddings.rpSign("t", 0, 1)
    assert(got.getInt(1) == 0)
    assert(math.abs(got.getDouble(2) - (s0 * 1.0 + s1 * 2.0)) < 1e-9)
    // distance preservation in the JL sense on clustered data: 64 -> 16
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() / 8).toFloat))
    }.toDF("vec_id", "embedding")
    val proj = Embeddings.randomProject(vecs, "embedding", "vec_id", 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    val raw = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for (i <- 0L until 10L; j <- (i + 1) until 10L) yield
      dist(proj(i).toArray, proj(j).toArray) / dist(raw(i), raw(j))
    // ±1 JL at m=16: distortion concentrates near 1; loose 5x bounds
    assert(ratios.forall(r => r > 0.2 && r < 5.0), ratios.mkString(","))
    // determinism + partition invariance
    val a = Embeddings.randomProject(vecs, "embedding", "vec_id", 16)
      .collect().map(_.toSeq).toSet
    val b = Embeddings.randomProject(vecs.repartition(9), "embedding",
      "vec_id", 16).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("randomProject kernel == interpreted HOF formulation (r18 opt)") {
    import graft.ops.Embeddings
    import org.apache.spark.sql.functions._
    // the exact SQL/HOF formulation the codegen'd kernel replaced —
    // kept here as the parity reference (bit-identical contract)
    def hofProject(df: org.apache.spark.sql.DataFrame, outDim: Int,
        inDim: Int, salt: String): org.apache.spark.sql.DataFrame = {
      val signs: Seq[Seq[Long]] = (0 until outDim).map(k =>
        (0 until inDim).map(j => Embeddings.rpSign(salt, k, j).toLong))
      val signsLit = typedLit(signs)
      val grains = transform(col("embedding"),
        v => round(v.cast("double") * lit(1e6), 0).cast("long"))
      val scale = 1e6 * math.sqrt(outDim.toDouble)
      val proj = transform(sequence(lit(1), lit(outDim)), k =>
        aggregate(
          zip_with(grains, element_at(signsLit, k), (g, s) => g * s),
          lit(0L), (acc, x) => acc + x)
          .cast("double") / lit(scale))
      df.select(col("vec_id"), posexplode(proj).as(Seq("k", "value")))
    }
    val rnd = new scala.util.Random(23)
    val rows = (0 until 30).map(i =>
      (i.toLong, Array.fill(12)(rnd.nextGaussian()))) :+
      (100L, Array.fill(12)(0.0)) // zero vector
    val df = rows.toDF("vec_id", "embedding")
    val got = Embeddings.randomProject(df, "embedding", "vec_id", 5, "pk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val want = hofProject(df, 5, 12, "pk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == want) // bit-identical, no tolerance
    // ragged vector: HOF null-pads into all-null components; kernel must
    // agree (rows present, values null)
    val ragged = Seq((7L, Array(1.0, 2.0, 3.0))).toDF("vec_id", "embedding")
    val gr = Embeddings.randomProject(ragged, "embedding", "vec_id", 4, "pk")
    // inDim is read from the FIRST row, so feed the mismatch via a
    // second frame projected with the same salt/dims as a 12-dim fit:
    val both = df.limit(1).unionByName(ragged)
    val g2 = Embeddings.randomProject(both, "embedding", "vec_id", 4, "pk")
      .filter(col("vec_id") === 7L).collect()
    val w2 = hofProject(both, 4, 12, "pk")
      .filter(col("vec_id") === 7L).collect()
    assert(g2.length == 4 && w2.length == 4)
    assert(g2.forall(_.isNullAt(2)) && w2.forall(_.isNullAt(2)))
    assert(gr.count() == 4) // 3-dim fit of itself: plain rows
  }

  test("grained-cosine kernels == interpreted HOF formulation (r18 opt)") {
    import org.apache.spark.sql.GraftBridge
    // the exact HOF scoring the codegen'd kernels replaced in
    // Drift.embeddingDrift / embeddingDriftByGroup — kept as the parity
    // reference (bit-identical contract, same null/ragged/zero guards)
    def g9(x: Double, y: Double): Long = math.floor(x * y * 1e9).toLong
    val rnd = new scala.util.Random(31)
    val ca = Array.fill(6)(rnd.nextGaussian())
    val scA = ca.map(c => g9(c, c)).sum
    val centLit = array(ca.map(lit).toIndexedSeq: _*)
    // rows: random, zero vector, ragged (short + long), null element, NaN
    val vecs = spark.range(1).select(
      concat(
        typedLit((0 until 20).map(_ =>
          Seq.fill(6)(rnd.nextGaussian()))).cast("array<array<double>>"),
        typedLit(Seq(Seq.fill(6)(0.0))).cast("array<array<double>>"),
        typedLit(Seq(Seq(1.0, 2.0))).cast("array<array<double>>"),
        typedLit(Seq(Seq.fill(9)(1.5))).cast("array<array<double>>"),
        array(array(lit(1.0), lit(null).cast("double"), lit(2.0),
          lit(3.0), lit(4.0), lit(5.0))),
        array(array(lit(Double.NaN), lit(Double.NaN), lit(Double.NaN),
          lit(Double.NaN), lit(Double.NaN), lit(Double.NaN)))
      ).as("vv"))
      .select(explode(col("vv")).as("v"))
    val vc = col("v").cast("array<double>")
    val sd = aggregate(
      zip_with(vc, centLit, (x, y) => floor(x * y * 1e9).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val sv = aggregate(
      transform(vc, x => floor(x * x * 1e9).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val want = vecs.select(
      when(size(vc) === lit(ca.length) && sv > 0 && lit(scA) > 0,
        sd.cast("double") /
          sqrt(sv.cast("double") * lit(scA).cast("double"))).as("cos"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val got = vecs.select(GraftBridge.column(
        graft.spark.GrainedCosineConstExpression(
          GraftBridge.expression(vc), ca, scA)).as("cos"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == want.toSeq) // bit-identical, no tolerance
    // zero vector (sv=0), short, long, null element, NaN (sv=0)
    assert(got.count(_.isEmpty) == 5, got.mkString(","))
    // per-row-centroid twin: same rows, centroid + grained self-norm on
    // the row (the embeddingDriftByGroup broadcast-join shape)
    val withCent = vecs.select(col("v"), centLit.as("cent"),
      lit(scA).as("sc9"))
    val sdR = aggregate(
      zip_with(vc, col("cent"), (x, y) => floor(x * y * 1e9).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val wantR = withCent.select(
      when(size(vc) === size(col("cent")) && sv > 0 && col("sc9") > 0,
        sdR.cast("double") /
          sqrt(sv.cast("double") * col("sc9").cast("double"))).as("cos"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val gotR = withCent.select(GraftBridge.column(
        graft.spark.GrainedCosineExpression(
          GraftBridge.expression(vc),
          GraftBridge.expression(col("cent")),
          GraftBridge.expression(col("sc9")))).as("cos"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(gotR.toSeq == wantR.toSeq)
    assert(gotR.toSeq == got.toSeq) // const and per-row kernels agree
    // sc9 <= 0 nulls every row in both kernels
    val zeroRef = vecs.select(GraftBridge.column(
        graft.spark.GrainedCosineConstExpression(
          GraftBridge.expression(vc), ca, 0L)).as("cos"))
      .collect()
    assert(zeroRef.forall(_.isNullAt(0)))
  }

  test("intervalOverlapJoin: exactly-once pairs == cross-join filter") {
    import graft.ops.Joins
    val left = Seq((1L, 0L, 100L), (2L, 50L, 250L), (3L, 400L, 410L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 90L, 300L), (11L, 100L, 100L), (12L, 260L, 399L))
      .toDF("rid", "rs", "re")
    val got = Joins.intervalOverlapJoin(left, right, "ls", "le", "rs", "re",
        binWidth = 7)
      .select("lid", "r_rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // 1-10 overlap [90,100]; 1-11 touch at the endpoint (closed);
    // 2-10 span MANY shared 7-wide bins -> still exactly one row;
    // 2-11 touch; 3-* and *-12 disjoint from everything except 2-12? no:
    // 2 ends 250 < 260, so 12 pairs with nothing
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)))
    // randomized equivalence with the O(n^2) reference at several widths
    val rnd = new scala.util.Random(7)
    val li = (0 until 60).map { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(80))
    }.toDF("lid", "ls", "le")
    val ri = (0 until 60).map { i =>
      val s = rnd.nextInt(1000).toLong; (i.toLong, s, s + rnd.nextInt(80))
    }.toDF("rid", "rs", "re")
    val ref = li.crossJoin(ri)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (bw <- Seq(3L, 40L, 500L)) {
      val fast = Joins.intervalOverlapJoin(li, ri, "ls", "le", "rs", "re", bw)
        .select("lid", "r_rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(fast == ref, s"binWidth=$bw")
    }
  }

  test("curriculumOrder: phase-major dense ranks, md5 shuffle within phase") {
    import graft.ops.Sampling
    val df = (0 until 300).map(i => (i.toLong, i % 3)).toDF("id", "phase")
    val out = Sampling.curriculumOrder(df, "id", "phase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // dense 1..N
    assert(out.map(_._3).sorted.toSeq == (1L to 300L))
    // phase-major: every phase-0 rank < every phase-1 rank < phase-2
    val byPhase = out.groupBy(_._2).map { case (p, rs) =>
      p -> (rs.map(_._3).min, rs.map(_._3).max) }
    assert(byPhase(0L)._2 < byPhase(1L)._1 && byPhase(1L)._2 < byPhase(2L)._1)
    // within a phase: rank order == driver-side (md5(id||salt), id) order
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val phase1 = out.filter(_._2 == 1L).sortBy(_._3).map(_._1).toSeq
    val expect = (0 until 300).filter(_ % 3 == 1).map(_.toLong)
      .sortBy(id => (md5hex(s"${id}curriculum"), id))
    assert(phase1 == expect)
    // partitioning invariance
    val rep = Sampling.curriculumOrder(df.repartition(17), "id", "phase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rep.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("importanceSample: weight-proportional odds, clipping, determinism") {
    import graft.ops.Sampling
    val df = (0 until 2000).map(i =>
      (i.toLong, if (i < 100) 50.0 else 1.0)).toDF("id", "w")
    // heavy rows clip at p=1 (50 * 400 / 6900 > 1): ALL 100 kept
    val out = Sampling.importanceSample(df, "id", "w", targetRows = 400L,
      salt = "t")
    val kept = out.collect().map(_.getLong(0)).toSet
    assert((0L until 100L).forall(kept.contains))
    // light rows keep ≈ (400 - clip surplus) share; just bound loosely
    val nLight = kept.count(_ >= 100L)
    assert(nLight > 50 && nLight < 400)
    // deterministic + partition-independent
    val again = Sampling.importanceSample(df.repartition(13), "id", "w",
      400L, "t").collect().map(_.getLong(0)).toSet
    assert(again == kept)
    // zero/negative/null weights never kept
    val bad = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 0.0), (2L, -5.0), (3L, null), (4L, 100.0))
      .toDF("id", "w")
    val keptBad = Sampling.importanceSample(bad, "id", "w", 10L)
      .collect().map(_.getLong(0)).toSeq
    assert(keptBad == Seq(4L))
    // expected-count calibration without clipping: uniform weights,
    // target 500 of 2000 -> binomial(2000, 0.25), well within 5 sigma
    val uni = (0 until 2000).map(i => (i.toLong, 1.0)).toDF("id", "w")
    val n = Sampling.importanceSample(uni, "id", "w", 500L, "u").count()
    assert(math.abs(n - 500.0) < 5 * math.sqrt(2000 * 0.25 * 0.75))
  }

  test("pipeline DSL: spec compiles to the hand-written chain; validate catches errors") {
    import graft.pipeline.Pipeline
    val df = Seq(
      (0L, "the cat sat on the mat and the dog ran off today"),
      (1L, "the cat sat on the mat and the dog ran off today"), // dup of 0
      (2L, "el la de que y los una palabra mas aqui hoy bien"),
      (3L, "short doc"),
      (4L, "le la les et un des que mots ici plus encore bien"))
      .toDF("doc_id", "text")
    val spec =
      """[{:op :filter-min-words :n 5}
        | {:op :dedup-exact}
        | {:op :lang-id :out "lang_pred"}
        | {:op :filter-lang :langs ["en" "es"]}]""".stripMargin
    val got = Pipeline.run(df, spec)
      .select("doc_id", "lang_pred").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // hand-written chain: drop doc 3 (short), dup 1 loses to 0, doc 4
    // is fr and filtered; 0=en, 2=es survive
    assert(got == Seq((0L, "en"), (2L, "es")))
    // the DSL output must equal the literally hand-composed chain
    val hand = {
      val f = df.filter(graft.ops.TextStats.wsTokens(col("text")) >= 5)
      val d = f.join(graft.ops.Dedup.exact(f, "text", "doc_id")
        .select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      d.withColumn("lang_pred", graft.ops.TextStats.langId(col("text")))
        .filter(col("lang_pred").isin("en", "es"))
    }.select("doc_id", "lang_pred").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == hand)
    // transform stages keep the schema pure (diagnostics dropped)
    val norm = Pipeline.run(df,
      """[{:op :normalize} {:op :redact-pii} {:op :pseudonymize}]""")
    assert(norm.columns.toSeq == Seq("doc_id", "text"))
    // near-dedup stage: exact dup of doc 0 (doc 1) dropped keep-first
    val near = Pipeline.run(df,
      """[{:op :dedup-near :threshold 0.9}]""")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(near == Seq(0L, 2L, 3L, 4L))
    assert(Pipeline.validate("""[{:op :dedup-near :threshold 1.5}]""")
      .exists(_.contains(":threshold out of")))
    // validation: unknown op, missing arg, bad rate — no data touched
    assert(Pipeline.validate("""[{:op :nope}]""")
      .exists(_.contains("unknown op :nope")))
    assert(Pipeline.validate("""[{:op :filter-min-words}]""")
      .exists(_.contains("missing :n")))
    assert(Pipeline.validate("""[{:op :sample :rate 1.5}]""")
      .exists(_.contains(":rate out of")))
    assert(Pipeline.validate("""{:op :sample}""").nonEmpty) // not a vector
    assert(Pipeline.validate(
      """[{:op :sample :rate 0.5} {:op :normalize :form "NFKC"}]""").isEmpty)
    // run fails fast with the stage index
    val e = intercept[IllegalArgumentException](
      Pipeline.run(df, """[{:op :normalize} {:op :bogus}]""").collect())
    assert(e.getMessage.contains("stage 1"))
  }

  test("fuzzy decontamination: containment scores, threshold, clean corpus") {
    import graft.ops.Decontaminate
    val train = Seq(
      (0L, "a b c d e f g h"),        // contains all of bench 100's grams
      (1L, "a b c x y z q w"),        // 2 of bench 100's 6 3-grams
      (2L, "totally unrelated words here")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e f g h")).toDF("bench_id", "text")
    val pairs = Decontaminate.fuzzyContaminationPairs(
        train, bench, "text", "doc_id", "bench_id", n = 3, minFrac = 0.5)
      .orderBy("doc_id").collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 0L && pairs(0).getLong(2) == 6L &&
      pairs(0).getLong(3) == 6L && pairs(0).getDouble(4) == 1.0)
    // lowering the bar under 1/6 admits the partial overlap at its score
    val loose = Decontaminate.fuzzyContaminationPairs(
        train, bench, "text", "doc_id", "bench_id", n = 3,
        minFrac = 0.16)
      .orderBy("doc_id").collect()
    assert(loose.length == 2 && loose(1).getLong(0) == 1L &&
      loose(1).getLong(2) == 1L) // only "a b c" shared
    // clean corpus drops exactly the flagged doc
    val clean = Decontaminate.fuzzy(train, bench, "text", "doc_id",
        "bench_id", n = 3, minFrac = 0.5)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(clean == Seq(1L, 2L))
    // whitespace variants hash to the same grams (the \s+ contract)
    val wsTrain = Seq((7L, "a  b\tc   d e f g h")).toDF("doc_id", "text")
    val wsPairs = Decontaminate.fuzzyContaminationPairs(
      wsTrain, bench, "text", "doc_id", "bench_id", n = 3, minFrac = 0.99)
    assert(wsPairs.count() == 1)
  }

  test("bloom sketch: no false negatives, merge == whole rebuild, fill report") {
    import graft.ops.Sketch
    val df = Seq((0L, "alpha beta gamma"), (1L, "delta epsilon beta"))
      .toDF("doc_id", "text")
    val bits = Sketch.bloomTable(df, "text", k = 3, m = 4096)
    // every present term probes maybe=1 (no false negatives, any k/m)
    val present = Sketch.bloomProbe(bits,
        Seq("alpha", "beta", "gamma", "delta", "epsilon"), k = 3, m = 4096)
      .collect()
    assert(present.forall(_.getLong(1) == 1L))
    // an absent term is (overwhelmingly, at this fill) maybe=0
    val absent = Sketch.bloomProbe(bits, Seq("zzznothere"), k = 3, m = 4096)
      .head()
    assert(absent.getLong(1) == 0L)
    // case-insensitivity matches the sketch side's lower()
    assert(Sketch.bloomProbe(bits, Seq("ALPHA"), k = 3, m = 4096)
      .head().getLong(1) == 1L)
    // merge linearity: sharded OR == whole-corpus filter, bit for bit
    val b1 = Sketch.bloomTable(df.filter(col("doc_id") === 0), "text", 3, 4096)
    val b2 = Sketch.bloomTable(df.filter(col("doc_id") === 1), "text", 3, 4096)
    val merged = Sketch.bloomMerge(b1, b2).collect().map(_.getLong(0)).toSet
    val whole = bits.collect().map(_.getLong(0)).toSet
    assert(merged == whole)
    // fill: 5 distinct terms x 3 hashes -> <= 15 bits; fpr = (n/m)^3
    val fill = Sketch.bloomFill(bits, k = 3, m = 4096).head()
    val n = fill.getLong(0)
    assert(n >= 5 && n <= 15 && n == whole.size)
    val frac = n.toDouble / 4096
    assert(math.abs(fill.getDouble(1) - BigDecimal(frac * frac * frac)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("unimaxMixturePlan: ascending water-filling with caps and donated slack") {
    import graft.ops.Sampling
    // A=10, B=100, C=1000 tokens; budget 600, cap 2 epochs:
    // A share 200 -> cap 20; B share (580/2)=290 -> cap 200; C gets 380
    val df = (Seq.fill(1)(("A", 10)) ++ Seq(("B", 100)) ++ Seq(("C", 1000)))
      .toDF("domain", "n")
    val out = Sampling.unimaxMixturePlan(df, "domain", col("n"),
        budget = 600L, maxEpochs = 2.0)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(out == Seq(
      ("A", 10L, 20L, 20L, 2.0),
      ("B", 100L, 200L, 200L, 2.0),
      ("C", 1000L, 2000L, 380L, 0.38)))
    // uncapped domains receive the SAME share (the fairness property):
    // budget 300 caps nothing -> each of the three gets exactly 100
    val fair = Sampling.unimaxMixturePlan(
        Seq(("A", 200), ("B", 300), ("C", 400)).toDF("domain", "n"),
        "domain", col("n"), budget = 300L, maxEpochs = 4.0)
      .orderBy("domain").collect().map(_.getLong(3)).toSeq
    assert(fair == Seq(100L, 100L, 100L))
    // a zero-token domain allocates 0 with epochs 0.0 (not null)
    val z = Sampling.unimaxMixturePlan(
        Seq(("Z", 0), ("B", 50)).toDF("domain", "n"),
        "domain", col("n"), budget = 100L, maxEpochs = 2.0)
      .orderBy("domain").collect()
    assert(z(1).getString(0) == "Z" && z(1).getLong(3) == 0L &&
      z(1).getDouble(4) == 0.0)
    // allocation never exceeds budget and is partitioning-independent
    val big = (0 until 30).map(i => (s"d$i", i * 7 + 1)).toDF("domain", "n")
    val a1 = Sampling.unimaxMixturePlan(big, "domain", col("n"), 1000L, 2.0)
      .orderBy("domain").collect().map(_.toSeq).toSeq
    val a2 = Sampling.unimaxMixturePlan(big.repartition(11), "domain",
        col("n"), 1000L, 2.0)
      .orderBy("domain").collect().map(_.toSeq).toSeq
    assert(a1 == a2)
    assert(a1.map(_(3).asInstanceOf[Long]).sum <= 1000L)
  }

  test("profileColumns: nullity, cardinality, native-type extrema, widths") {
    import graft.ops.Profile
    val df = Seq[(java.lang.Long, String)](
      (2L, "bb"), (10L, null), (1L, "a"), (10L, "ccc"))
      .toDF("k", "s")
    val out = Profile.profileColumns(df, Seq("k", "s"))
      .orderBy("column").collect()
    val k = out(0)
    assert(k.getString(0) == "k" && k.getLong(1) == 4 && k.getLong(2) == 0)
    assert(k.getDouble(3) == 0.0 && k.getLong(4) == 3)
    // native-type extrema: min 1 / max 10 — NOT the lexicographic "1"/"2"
    assert(k.getString(5) == "1" && k.getString(6) == "10")
    assert(math.abs(k.getDouble(7) - 6.0 / 4) < 1e-9) // "2","10","1","10"
    val s = out(1)
    assert(s.getLong(2) == 1 && s.getDouble(3) == 0.25 && s.getLong(4) == 3)
    assert(s.getString(5) == "a" && s.getString(6) == "ccc")
    assert(math.abs(s.getDouble(7) - 2.0) < 1e-9) // (2+1+3)/3 non-null
    // all-null column: avg_len null, extrema null, distinct 0
    val an = Profile.profileColumns(
      Seq[(Long, String)]((1L, null), (2L, null)).toDF("k", "s"), Seq("s"))
      .head()
    assert(an.getLong(2) == 2 && an.getDouble(3) == 1.0 && an.getLong(4) == 0)
    assert(an.isNullAt(5) && an.isNullAt(6) && an.isNullAt(7))
    // partition invariance: one row per column regardless of layout
    val rep = Profile.profileColumns(df.repartition(7), Seq("k", "s"))
      .orderBy("column").collect()
    assert(rep.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
  }

  test("checkSuite: all five kinds, integer-arithmetic verdicts, vacuous pass") {
    import graft.ops.Profile._
    val df = Seq[(java.lang.Long, String, String)](
      (1L, "en", "web"), (2L, "de", "web"), (2L, "xx!", "book"),
      (4L, null, "web")).toDF("id", "lang", "src")
    val out = checkSuite(df, Seq(
      NotNull("lang"),          // 1 null of 4 -> fail, metric 0.25
      Unique("id"),             // dup 2 -> fail, 3 distinct / 4
      InRange("id", 1, 3),      // 4 out of range -> fail, 3/4
      MatchesRegex("lang", "^[a-z]{2}$", 0.6), // 2 of 3 non-null -> pass at 0.6
      AcceptedValues("src", Seq("web"), 0.8))) // 3 of 4 -> fail at 0.8
      .orderBy("check").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("accepted:src", 0.75, 0L),
      ("in_range:id", 0.75, 0L),
      ("not_null:lang", 0.25, 0L),
      ("regex:lang", 0.666667, 1L),
      ("unique:id", 0.75, 0L)))
    // boundary: metric exactly at an exactly-representable minFrac
    // passes (>= in integer micros)
    val b = checkSuite(df, Seq(AcceptedValues("src", Seq("web"), 0.75)))
      .head()
    assert(b.getLong(2) == 1L)
    // vacuous: empty relation passes every check with null metrics
    val empty = df.filter(lit(false))
    val vac = checkSuite(empty, Seq(NotNull("lang"), Unique("id"),
      InRange("id", 0, 1), MatchesRegex("lang", ".", 1.0),
      AcceptedValues("src", Seq("web"), 1.0))).collect()
    assert(vac.forall(_.getLong(2) == 1L))
    assert(vac.forall(_.isNullAt(1)))
  }

  test("html strip: blocks vanish with content, entities decode, ws collapses") {
    val df = Seq(
      (0L, "<html><body><h1>T</h1><script>if (1 < 2) { x(); }</script>" +
        "<style>p > a { }</style><!-- note --><p>body  text</p>" +
        " &amp;lt; &amp; &lt;tag&gt;</body></html>")).toDF("doc_id", "text")
    val got = df.select(graft.ops.TextClean.stripHtml(col("text"))).head().getString(0)
    // &amp;lt; decodes to the literal "&lt;" (amp decoded LAST), the
    // standalone &lt;tag&gt; to "<tag>", script/style content is gone
    assert(got == "T body text &lt; & <tag>")
  }

  test("ArgMaxTie aggregate equals the window election, including ties") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // scores drawn from a 5-value set so ties are common; ids unique
    val rows = (0L until 4000L).map { i =>
      (i % 37, (i * 2654435761L % 5).toDouble / 10.0, i)
    }
    val df = rows.toDF("g", "score", "id")
    val viaAgg = df.groupBy(col("g"))
      .agg(graft.spark.ArgMaxTie(col("score"), -col("id")).as("b"))
      .select(col("g"), col("b.score").as("score"), (-col("b.tie")).as("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("g"), col("score"), col("id"))
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
    // empty-group path: aggregating zero rows after a filter yields no row
    assert(df.filter(col("score") < -1).groupBy(col("g"))
      .agg(graft.spark.ArgMaxTie(col("score"), -col("id"))).count() == 0L)
    // plan: the argmax must hash-aggregate (primitive buffer), never sort
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
  }

  test("hardNegativesIvf equals the brute-force hardNegatives bit for bit") {
    val spark2 = SparkTestSession.spark
    val emb = spark2.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val copies = emb.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), (x, i) => when(i === 0, -x).otherwise(x)).as("embedding"))
    val corpus = emb.union(copies)
    // corpus-scale query set — the regime the IVF path exists for
    val queries = corpus.filter(col("vec_id") % 3 === 0)
    val model = Similarity.ivfFit(corpus, "embedding", "vec_id", 8)
    val brute = Similarity.hardNegatives(corpus, queries, "embedding", "vec_id", 0.9)
    val ivf = Similarity.hardNegativesIvf(corpus, queries, "embedding", "vec_id", 0.9, model)
    // exactness: same (query, neg, cosine) rows — the pruning bound is a
    // superset guarantee, so even on isotropic data (no prunable
    // structure) the argmax must land on the identical vector
    assert(brute.exceptAll(ivf).isEmpty && ivf.exceptAll(brute).isEmpty)
    assert(ivf.count() == queries.count())
    spark2.catalog.clearCache()
  }

  test("lossy-id-cast guards: pageRank9 and ivfKnnJoin fail fast; clusters routes strings distributed") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // pageRank9 on string nodes used to collapse every URL to the null
    // node and silently rank garbage
    val e = intercept[IllegalArgumentException] {
      graft.ops.Graph.pageRank9(
        Seq(("a.com", "b.com")).toDF("src", "dst"), "src", "dst", iters = 2)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    // ivfKnnJoin's driver collect would NPE on null-cast query ids
    val model = Similarity.IvfModel(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(0.0, 0.0))
    val sCorpus = Seq(("x", Seq(1.0, 0.0)), ("y", Seq(0.0, 1.0))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Similarity.ivfKnnJoin(sCorpus, sCorpus, "v", "id", k = 1, model)
    }
    // clusters: string ids are legitimate (URL dedup graphs) — the
    // type-generic distributed min-label path must serve them at any
    // size instead of the long-decoding driver shortcut crashing
    val pairs = Seq(("u1", "u2"), ("u2", "u3"), ("u9", "u8")).toDF("id_a", "id_b")
    val labels = Dedup.clusters(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels == Map("u1" -> "u1", "u2" -> "u1", "u3" -> "u1",
      "u8" -> "u8", "u9" -> "u8"), labels.toString)
    // stateful streams decode typed long keys — both entry points must
    // reject at plan-build time, not mid-stream inside the encoder
    val sdf = Seq(("s1", "t", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("id", "text", "ts")
    intercept[IllegalArgumentException] {
      graft.streaming.StatefulOps.streamingNearDupHits(sdf, "text", "id", "ts")
    }
    intercept[IllegalArgumentException] {
      graft.streaming.StatefulOps.sessionize(sdf, "id", "ts", gapSec = 60)
    }
  }

  test("asofJoin tolerance on integral axes is exact past 2^53 (nanos-since-epoch)") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // double ulp at ~1.7e18 is 256: a double axis cannot tell a 300-unit
    // delta from 256 or 512 — the long axis must
    val base = 1700000000000000000L
    val l = Seq((1L, base + 300L, "a")).toDF("k", "ts", "lv")
    val r = Seq((1L, base, "x")).toDF("k", "ts", "rv")
    assert(graft.ops.Joins.asofJoin(l, r, "k", "ts", toleranceSec = Some(100))
      .select("r_rv").head().isNullAt(0), "delta 300 must exceed bound 100")
    assert(graft.ops.Joins.asofJoin(l, r, "k", "ts", toleranceSec = Some(300))
      .select("r_rv").head().getString(0) == "x")
    val near = graft.ops.Joins.asofJoinDirected(l, r, "k", "ts",
      direction = "nearest", toleranceSec = Some(299))
    assert(near.select("r_rv").head().isNullAt(0), "299 < 300 exactly")
  }

  test("rangeJoin containment is exact past 2^53 (native comparison, not double)") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // 2^53 and 2^53+1 collapse to one double: a double-cast filter kept
    // the out-of-range point; native long comparison must exclude it
    val p = Seq((1L, 9007199254740993L), (2L, 9007199254740992L))
      .toDF("pid", "v")
    val ivs = Seq((10L, 0L, 9007199254740992L)).toDF("iid", "lo", "hi")
    val got = graft.ops.Joins.rangeJoin(p, ivs, "v", "lo", "hi",
        binWidth = 1e16)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L), s"2^53+1 must fall outside [0, 2^53]: $got")
  }

  test("asofJoin tolerance axis follows the UNION-widened type and lossless decimals") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // mixed int/double sides widen to double: a left-type long axis
    // would truncate -5.5 to -5 and keep a 0.5-delta match at tol=0
    val l = Seq((1L, -5, "a")).toDF("k", "ts", "lv")
    val r = Seq((1L, -5.5, "x")).toDF("k", "ts", "rv")
      .select(col("k"), col("ts").cast("double").as("ts"), col("rv"))
    val lw = l.select(col("k"), col("ts").cast("double").as("ts"), col("lv"))
    assert(graft.ops.Joins.asofJoin(lw, r, "k", "ts", toleranceSec = Some(0))
      .select("r_rv").head().isNullAt(0), "0.5 delta must exceed tol 0")
    // decimal(18,0) nanos axis is exact like long (the Ids.isIntegral rule)
    val base = BigDecimal(900000000000000000L)
    val ld = Seq((1L, base + 300, "a")).toDF("k", "ts", "lv")
      .select(col("k"), col("ts").cast("decimal(18,0)").as("ts"), col("lv"))
    val rd = Seq((1L, base, "x")).toDF("k", "ts", "rv")
      .select(col("k"), col("ts").cast("decimal(18,0)").as("ts"), col("rv"))
    assert(graft.ops.Joins.asofJoin(ld, rd, "k", "ts", toleranceSec = Some(100))
      .select("r_rv").head().isNullAt(0), "delta 300 must exceed bound 100")
    assert(graft.ops.Joins.asofJoin(ld, rd, "k", "ts", toleranceSec = Some(300))
      .select("r_rv").head().getString(0) == "x")
    // long ∪ decimal(18,0) widens to decimal(20,0) — past the long
    // range, so it must take the exact decimal(38,0) axis, not double
    val lmix = Seq((1L, 900000000000000300L, "a")).toDF("k", "ts", "lv")
    assert(graft.ops.Joins.asofJoin(lmix, rd, "k", "ts", toleranceSec = Some(299))
      .select("r_rv").head().isNullAt(0), "widened-decimal axis must stay exact")
    assert(graft.ops.Joins.asofJoin(lmix, rd, "k", "ts", toleranceSec = Some(300))
      .select("r_rv").head().getString(0) == "x")
  }

  test("clusters: output id/label type equals the input id type on BOTH paths") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val pairs = Seq((1, 2), (2, 3), (9, 8)).toDF("id_a", "id_b")
    val driver = Dedup.clusters(pairs) // 3 edges -> driver shortcut
    val dist = Dedup.clusters(pairs, driverThreshold = 0L) // forced distributed
    assert(driver.schema("id").dataType ==
      org.apache.spark.sql.types.IntegerType, driver.schema.treeString)
    assert(driver.schema.map(_.dataType) == dist.schema.map(_.dataType))
    val a = driver.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val b = dist.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(a == b && a == Set((1, 1), (2, 1), (3, 1), (8, 8), (9, 8)))
  }

  test("asofJoin tolerance on TIMESTAMP_NTZ uses the naive axis (no DST distortion)") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val prevTz = spark2.conf.get("spark.sql.session.timeZone")
    try {
      // America/Los_Angeles skips 02:00-03:00 on 2026-03-08; an
      // instant-based axis computed this 75-minute naive delta as 15
      // minutes and passed a 60-minute tolerance
      spark2.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val l = Seq((1L, java.time.LocalDateTime.parse("2026-03-08T03:10:00"), "a"))
        .toDF("k", "ts", "lv")
      val r = Seq((1L, java.time.LocalDateTime.parse("2026-03-08T01:55:00"), "x"))
        .toDF("k", "ts", "rv")
      assert(l.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      assert(graft.ops.Joins.asofJoin(l, r, "k", "ts", toleranceSec = Some(3600))
        .select("r_rv").head().isNullAt(0),
        "naive 75min delta must exceed a 60min tolerance across the DST gap")
      assert(graft.ops.Joins.asofJoin(l, r, "k", "ts", toleranceSec = Some(4500))
        .select("r_rv").head().getString(0) == "x")
    } finally spark2.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("rangeJoin/intervalOverlapJoin reject mixed exact/fractional comparison columns") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // a long point vs double bounds would coerce the containment filter
    // to double and readmit >2^53 ulp matches — plan-build-time raise
    val pLong = Seq((1L, 100L)).toDF("pid", "v")
    val ivDouble = Seq((10L, 0.0, 200.0)).toDF("iid", "lo", "hi")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Joins.rangeJoin(pLong, ivDouble, "v", "lo", "hi", binWidth = 50.0)
    }
    assert(e1.getMessage.contains("mixed exact/fractional"), e1.getMessage)
    // one-family inputs keep working: all-double, and exact long+decimal
    val pDouble = Seq((1L, 100.0)).toDF("pid", "v")
    assert(graft.ops.Joins.rangeJoin(pDouble, ivDouble, "v", "lo", "hi",
      binWidth = 50.0).count() == 1)
    val ivDec = ivDouble.select(col("iid"),
      col("lo").cast("decimal(10,0)").as("lo"),
      col("hi").cast("decimal(10,0)").as("hi"))
    assert(graft.ops.Joins.rangeJoin(pLong, ivDec, "v", "lo", "hi",
      binWidth = 50.0).count() == 1)
    // non-numeric (timestamp) columns are named too
    val pTs = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("pid", "v")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Joins.rangeJoin(pTs, ivDouble, "v", "lo", "hi", binWidth = 50.0)
    }
    assert(e2.getMessage.contains("must be numeric"), e2.getMessage)
    // interval×interval: same contract over the four bound columns
    val lIv = Seq((1L, 0L, 10L)).toDF("lid", "s", "e")
    val rIvD = Seq((2L, 5.0, 15.0)).toDF("rid", "s", "e")
    val e3 = intercept[IllegalArgumentException] {
      graft.ops.Joins.intervalOverlapJoin(lIv, rIvD, "s", "e", "s", "e",
        binWidth = 10L)
    }
    assert(e3.getMessage.contains("mixed exact/fractional"), e3.getMessage)
  }

  test("prefixing joins reject output-name collisions at plan build") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // left already carries r_rv: the output would silently hold two
    // r_rv columns, ambiguous on first reference
    val l = Seq((1L, 10L, "x")).toDF("k", "ts", "r_rv")
    val r = Seq((1L, 9L, "y")).toDF("k", "ts", "rv")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoin(l, r, "k", "ts")
    }
    assert(e1.getMessage.contains("collide"), e1.getMessage)
    // a different prefix resolves it
    assert(graft.ops.Joins.asofJoin(l, r, "k", "ts", rightPrefix = "c_")
      .columns.count(_ == "c_rv") == 1)
    val p = Seq((1L, 5L, 7L)).toDF("pid", "v", "r_iid")
    val ivs = Seq((10L, 0L, 9L)).toDF("iid", "lo", "hi")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Joins.rangeJoin(p, ivs, "v", "lo", "hi", binWidth = 10.0)
    }
    assert(e2.getMessage.contains("collide"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      graft.ops.Joins.intervalOverlapJoin(
        ivs.toDF("r_rid", "s", "e"), ivs.toDF("rid", "s", "e"),
        "s", "e", "s", "e", binWidth = 10L)
    }
    assert(e3.getMessage.contains("collide"), e3.getMessage)
    // the streaming range join shares the guard (fires at plan build,
    // before any watermark/stream machinery)
    val e4 = intercept[IllegalArgumentException] {
      graft.streaming.StatefulOps.streamStreamJoin(
        l.withColumn("ts2", col("ts").cast("timestamp")),
        r.withColumn("ts2", col("ts").cast("timestamp")),
        "k", "ts2", windowSec = 60L)
    }
    assert(e4.getMessage.contains("collide"), e4.getMessage)
  }

  test("joins reject reserved internal temp-column names at plan build") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // rangeJoin's points-side __bin was silently overwritten by the bin
    // routing withColumn and then dropped from the output — silent
    // column loss; now a named plan-build error
    val p = Seq((1L, 5L, 9L)).toDF("pid", "v", "__bin")
    val ivs = Seq((10L, 0L, 9L)).toDF("iid", "lo", "hi")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Joins.rangeJoin(p, ivs, "v", "lo", "hi", binWidth = 10.0)
    }
    assert(e1.getMessage.contains("reserved internal temp names") &&
      e1.getMessage.contains("__bin"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Joins.rangeJoin(p.drop("__bin"),
        ivs.withColumn("__nbins", lit(1L)), "v", "lo", "hi", binWidth = 10.0)
    }
    assert(e2.getMessage.contains("__nbins"), e2.getMessage)
    // overlap join: left raw names; right checked AFTER prefixing — the
    // default r_ prefix shields a right __bin, an empty prefix doesn't
    val lIv = Seq((1L, 0L, 10L)).toDF("lid", "s", "e")
    val e3 = intercept[IllegalArgumentException] {
      graft.ops.Joins.intervalOverlapJoin(lIv.withColumn("__bin", lit(0L)),
        ivs.toDF("rid", "s", "e"), "s", "e", "s", "e", binWidth = 10L)
    }
    assert(e3.getMessage.contains("__bin"), e3.getMessage)
    assert(graft.ops.Joins.intervalOverlapJoin(lIv,
      Seq((2L, 5L, 15L, 0L)).toDF("rid", "s", "e", "__bin"),
      "s", "e", "s", "e", binWidth = 10L).columns.contains("r___bin"),
      "a prefixed right __bin is shielded and must survive into the output")
    val e4 = intercept[IllegalArgumentException] {
      graft.ops.Joins.intervalOverlapJoin(lIv,
        Seq((2L, 5L, 15L, 0L)).toDF("rid", "rs", "re", "__bin"),
        "s", "e", "rs", "re", binWidth = 10L, rightPrefix = "")
    }
    assert(e4.getMessage.contains("__bin"), e4.getMessage)
    // as-of family: staging names reserved on both sides
    val al = Seq((1L, 10L, "x")).toDF("k", "ts", "__rm")
    val ar = Seq((1L, 9L, "y")).toDF("k", "ts", "rv")
    val e5 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoin(al, ar, "k", "ts")
    }
    assert(e5.getMessage.contains("__rm"), e5.getMessage)
    val e6 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoinDirected(al.toDF("k", "ts", "lv"),
        ar.toDF("__rf", "ts", "rv"), "ts", "ts", direction = "nearest")
    }
    assert(e6.getMessage.contains("__rf"), e6.getMessage)
    // saltedJoin: a user __salt on either side was replaced then dropped
    val e7 = intercept[IllegalArgumentException] {
      graft.ops.Joins.saltedJoin(
        Seq((1L, 2L)).toDF("pk", "__salt"), ivs.toDF("pk", "lo", "hi"), Seq("pk"))
    }
    assert(e7.getMessage.contains("__salt"), e7.getMessage)
  }

  test("pass-through operators reject reserved staging names at plan build") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    def named(e: Exception, token: String): Unit =
      assert(e.getMessage.contains(token), e.getMessage)
    // silent-LOSS sites: user column overwritten by staging, dropped
    named(intercept[IllegalArgumentException] {
      graft.ops.Urls.filterBlockedDomainsDf(
        Seq(("http://a.com/x", 1L)).toDF("url", "__rd"), "url",
        Seq("a.com").toDF("domain"))
    }, "__rd")
    named(intercept[IllegalArgumentException] {
      graft.ops.TextClean.pseudonymizeEmails(
        Seq(("a@b.com", 1L)).toDF("text", "__m"), "text")
    }, "__m")
    named(intercept[IllegalArgumentException] {
      graft.ops.TextClean.c4Filter(
        Seq(("Good line here.", 1L)).toDF("text", "__kept"), "text")
    }, "__kept")
    named(intercept[IllegalArgumentException] {
      graft.ops.Layout.clusterByZorder(
        Seq((1L, 2L, 3L)).toDF("a", "b", "__z"), "a", "b", 8, 2)
    }, "__z")
    named(intercept[IllegalArgumentException] {
      graft.ops.Sampling.importanceSample(
        Seq((1L, 0.5, 0.1)).toDF("id", "w", "__p"), "id", "w", 10L)
    }, "__p")
    named(intercept[IllegalArgumentException] {
      graft.ops.Sampling.weightedSamplePerGroup(
        Seq((1L, "g", 0.5, 0.1)).toDF("id", "g", "w", "__aes_key"),
        "id", "g", "w", 1)
    }, "__aes_key")
    named(intercept[IllegalArgumentException] {
      graft.ops.Sampling.leakageSafeSplit(
        Seq((1L, "x")).toDF("id", "__rep"),
        Seq((1L, 2L)).toDF("id_a", "id_b"), "id")
    }, "__rep")
    named(intercept[IllegalArgumentException] {
      graft.spark.SparkHighlighter.mergeSameTypeRelational(
        Seq((1L, "T", 0L, 5L, "e1", 9L)).toDF("doc_id", "ann_type",
          "begin_offset", "end_offset", "dict_entry_id", "__cluster"))
    }, "__cluster")
    named(intercept[IllegalArgumentException] {
      graft.streaming.StatefulOps.streamingDedup(
        Seq(("t", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "h"))
          .toDF("text", "ts", "__text_md5"), "text", "ts")
    }, "__text_md5")
    // silent-CORRUPTION site: an id column named like a staged temp is
    // REPLACED mid-election — the semi-join would key on shard numbers
    named(intercept[IllegalArgumentException] {
      graft.ops.Sampling.sampleExactPerGroup(
        Seq((1L, "g")).toDF("__s", "g"), "__s", "g", k = 1)
    }, "__s")
    // rank-output duplication: a named error, not an ambiguous column
    named(intercept[IllegalArgumentException] {
      graft.ops.Sampling.topKPerGroup(
        Seq((1L, "g", 2.0, 1L)).toDF("id", "g", "s", "rank_in_group"),
        "id", "g", "s", k = 1)
    }, "rank_in_group")
    named(intercept[IllegalArgumentException] {
      graft.ops.Sampling.topKPerGroupAgg(
        Seq((1L, "g", 2.0, 1L)).toDF("id", "g", "s", "rank_in_group"),
        "id", "g", "s", k = 1)
    }, "rank_in_group")
    // clean inputs keep working through a guarded op
    assert(graft.ops.Urls.filterBlockedDomainsDf(
      Seq(("http://a.com/x", 1L)).toDF("url", "v"), "url",
      Seq("b.com").toDF("domain")).count() == 1)
  }

  test("asofJoin family rejects mixed exact/fractional numeric ts sides") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // ADVICE r11: a long left ts vs double right ts union-widens the
    // axis to double, readmitting >2^53 ulp inexactness — now the same
    // plan-build raise as the range-join family
    val l = Seq((1L, 100L, "a")).toDF("k", "ts", "lv")
    val rD = Seq((1L, 99.0, "x")).toDF("k", "ts", "rv")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoin(l, rD, "k", "ts")
    }
    assert(e1.getMessage.contains("mixed exact/fractional"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoinDirected(l, rD, "k", "ts", direction = "nearest")
    }
    assert(e2.getMessage.contains("mixed exact/fractional"), e2.getMessage)
    // one-family mixes keep working: long vs decimal(18,0) (exact), and
    // both-double (fractional)
    val rDec = rD.select(col("k"), col("ts").cast("decimal(18,0)").as("ts"),
      col("rv"))
    assert(graft.ops.Joins.asofJoin(l, rDec, "k", "ts")
      .select("r_rv").head().getString(0) == "x")
    val lD = Seq((1L, 100.0, "a")).toDF("k", "ts", "lv")
    assert(graft.ops.Joins.asofJoinDirected(lD, rD, "k", "ts",
      direction = "nearest").select("r_rv").head().getString(0) == "x")
  }

  test("asofJoin: string ts raises at plan build; DATE axis is exact naive days") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // a string ts "worked" lexicographically untolerated but the double
    // axis cast is NULL, so a tolerance silently nulled EVERY match —
    // now a named plan-build error in every direction
    val lS = Seq((1L, "2026-01-02", "a")).toDF("k", "ts", "lv")
    val rS = Seq((1L, "2026-01-01", "x")).toDF("k", "ts", "rv")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoin(lS, rS, "k", "ts")
    }
    assert(e1.getMessage.contains("unsupported ts type string"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoinDirected(lS, rS, "k", "ts", direction = "forward")
    }
    assert(e2.getMessage.contains("unsupported ts type"), e2.getMessage)
    // DATE both sides: tolerance compares exact naive day deltas
    val lD = lS.select(col("k"), col("ts").cast("date").as("ts"), col("lv"))
    val rD = rS.select(col("k"), col("ts").cast("date").as("ts"), col("rv"))
    assert(graft.ops.Joins.asofJoin(lD, rD, "k", "ts",
        toleranceSec = Some(86400L)) // exactly one day — inclusive
      .select("r_rv").head().getString(0) == "x")
    assert(graft.ops.Joins.asofJoin(lD, rD, "k", "ts",
        toleranceSec = Some(86399L))
      .select("r_rv").head().isNullAt(0), "86399s < 1 day delta")
  }

  test("asofJoin rejects mixed TIMESTAMP/TIMESTAMP_NTZ ts columns (DST-safe)") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // union widening would cast the NTZ side through the session zone,
    // silently reintroducing the DST delta distortion — named raise
    val l = Seq((1L, java.sql.Timestamp.valueOf("2026-03-08 03:10:00"), "a"))
      .toDF("k", "ts", "lv")
    val r = Seq((1L, java.time.LocalDateTime.parse("2026-03-08T01:55:00"), "x"))
      .toDF("k", "ts", "rv")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoin(l, r, "k", "ts")
    }
    assert(e1.getMessage.contains("naive side"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoinDirected(r, l, "k", "ts", direction = "forward")
    }
    assert(e2.getMessage.contains("naive side"), e2.getMessage)
    // same-family inputs (both instant) keep working
    val r2 = Seq((1L, java.sql.Timestamp.valueOf("2026-03-08 01:55:00"), "x"))
      .toDF("k", "ts", "rv")
    assert(graft.ops.Joins.asofJoin(l, r2, "k", "ts").count() == 1)
    // DATE is naive like NTZ: date x TIMESTAMP rejected the same way...
    val rDate = r2.select(col("k"), col("ts").cast("date").as("ts"), col("rv"))
    val e3 = intercept[IllegalArgumentException] {
      graft.ops.Joins.asofJoin(l, rDate, "k", "ts")
    }
    assert(e3.getMessage.contains("naive side"), e3.getMessage)
    // ...while DATE x NTZ (both naive — union widens to NTZ) is allowed
    val lNtz = Seq((1L, java.time.LocalDateTime.parse("2026-03-08T03:10:00"), "a"))
      .toDF("k", "ts", "lv")
    assert(graft.ops.Joins.asofJoin(lNtz, rDate, "k", "ts").count() == 1)
  }

  test("rangeJoin/intervalOverlapJoin expose bin-skew observe metrics") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // one narrow interval (1 bin) + one wide outlier (11 bins): the
    // metric must surface the outlier's fan-out, not just the average
    val p = Seq((1L, 5L), (2L, 55L)).toDF("pid", "v")
    val ivs = Seq((10L, 0L, 9L), (20L, 0L, 109L)).toDF("iid", "lo", "hi")
    val rj = graft.ops.Joins.rangeJoin(p, ivs, "v", "lo", "hi", binWidth = 10.0)
    // collect() (not count()) so the metrics land on THIS df's own
    // queryExecution — count() plans and executes a separate one
    assert(rj.collect().length == 3) // p1 in both, p2 in the wide one
    val m = rj.queryExecution.observedMetrics
      .find(_._1.startsWith("graft_range_join")).map(_._2)
    assert(m.nonEmpty, s"no graft_range_join metric in " +
      s"${rj.queryExecution.observedMetrics.keys}")
    assert(m.get.getAs[Long]("intervals") == 2L, m.get.toString)
    assert(m.get.getAs[Long]("exploded_rows") == 12L, m.get.toString)
    assert(m.get.getAs[Long]("max_bins_per_interval") == 11L, m.get.toString)
    val oj = graft.ops.Joins.intervalOverlapJoin(
      ivs.toDF("lid", "s", "e"), ivs.toDF("rid", "s", "e"),
      "s", "e", "s", "e", binWidth = 10L)
    assert(oj.collect().length == 4)
    val om = oj.queryExecution.observedMetrics
    val lm = om.find(_._1.startsWith("graft_overlap_join_l")).map(_._2)
    val rm = om.find(_._1.startsWith("graft_overlap_join_r")).map(_._2)
    assert(lm.nonEmpty && rm.nonEmpty, om.keys.toString)
    assert(lm.get.getAs[Long]("max_bins_per_interval") == 11L, lm.get.toString)
    assert(rm.get.getAs[Long]("exploded_rows") == 12L, rm.get.toString)
    // observeSkew = false: identical rows, no CollectMetrics in the plan
    val rjOff = graft.ops.Joins.rangeJoin(p, ivs, "v", "lo", "hi",
      binWidth = 10.0, observeSkew = false)
    assert(rjOff.collect().length == 3)
    assert(rjOff.queryExecution.observedMetrics.isEmpty,
      rjOff.queryExecution.observedMetrics.keys.toString)
    val ojOff = graft.ops.Joins.intervalOverlapJoin(
      ivs.toDF("lid", "s", "e"), ivs.toDF("rid", "s", "e"),
      "s", "e", "s", "e", binWidth = 10L, observeSkew = false)
    assert(ojOff.collect().length == 4)
    assert(ojOff.queryExecution.observedMetrics.isEmpty,
      ojOff.queryExecution.observedMetrics.keys.toString)
    // composition: two range joins unioned into ONE action must carry
    // two distinct counter-suffixed metrics (Spark rejects duplicate
    // observation names per query — the counter exists for this)
    val twice = graft.ops.Joins.rangeJoin(p, ivs, "v", "lo", "hi", binWidth = 10.0)
      .select("pid")
      .unionByName(graft.ops.Joins
        .rangeJoin(p, ivs, "v", "lo", "hi", binWidth = 10.0).select("pid"))
    assert(twice.collect().length == 6)
    val names = twice.queryExecution.observedMetrics.keys
      .filter(_.startsWith("graft_range_join")).toSeq
    assert(names.size == 2 && names.distinct.size == 2, names.toString)
  }

  test("fit entry points raise NAMED errors on empty input") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val noDocs = Seq.empty[(Long, String)].toDF("id", "text")
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Bpe.fit(noDocs, "text", numMerges = 5)
    }
    assert(e1.getMessage.contains("Bpe.fit: empty input"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Embeddings.randomProject(noVecs, "v", "id", outDim = 4)
    }
    assert(e2.getMessage.contains("randomProject: empty input"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      graft.ops.Retrieval.bm25TopK(noDocs, "text", "id", Seq("x"), k = 3)
    }
    assert(e3.getMessage.contains("bm25TopK: empty corpus"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      graft.ops.Retrieval.fitNbWeights(noDocs, noDocs, "text")
    }
    assert(e4.getMessage.contains("fitNbWeights: no tokens"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException] {
      graft.ops.Similarity.ivfFit(noVecs, "v", "id", nClusters = 2)
    }
    assert(e5.getMessage.contains("ivfFit"), e5.getMessage)
    // perplexityBuckets with zero SCORED rows: the documented
    // unscored→tail policy decides everything — graceful, not a crash
    val unscored = Seq((1L, None: Option[Double]), (2L, None: Option[Double]))
      .toDF("id", "ppl")
    val buckets = graft.ops.Lm.perplexityBuckets(unscored, "id")
      .select("bucket").collect().map(_.getString(0)).toSeq
    assert(buckets == Seq("tail", "tail"), buckets.toString)
  }

  test("property: as-of joins match brute force on every time-axis type " +
      "(sub-second and >2^53 magnitudes)") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.DataFrame

    // master time value is an exact BigInt of axis units (micros for the
    // timestamp family, raw values otherwise) so ONE brute-force model
    // covers every column type without fp in the reference itself
    def tsOf(u: BigInt): java.sql.Timestamp = {
      val sec = (u / 1000000).toLong
      val micros = (u % 1000000).toLong
      java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(sec, micros * 1000L))
    }
    def ldtOf(u: BigInt): java.time.LocalDateTime =
      java.time.LocalDateTime.ofEpochSecond((u / 1000000).toLong,
        ((u % 1000000).toLong * 1000L).toInt, java.time.ZoneOffset.UTC)
    def mk(typ: String, rows: Seq[(Long, BigInt, Long)], idName: String): DataFrame =
      typ match {
        case "long" =>
          rows.map { case (k, u, i) => (k, u.toLong, i) }.toDF("k", "ts", idName)
        case "int" =>
          rows.map { case (k, u, i) => (k, u.toInt, i) }.toDF("k", "ts", idName)
        case "double" =>
          rows.map { case (k, u, i) => (k, u.toDouble, i) }.toDF("k", "ts", idName)
        case "float" => // values kept on a float-exact integer grid
          rows.map { case (k, u, i) => (k, u.toFloat, i) }.toDF("k", "ts", idName)
        case "decimal20" => // beyond the long range — the decimal(38) axis
          rows.map { case (k, u, i) => (k, u.toString, i) }
            .toDF("k", "ts", idName)
            .select(col("k"), col("ts").cast("decimal(20,0)").as("ts"), col(idName))
        case "decimal18" => // in-long-range JDBC NUMERIC keys
          rows.map { case (k, u, i) => (k, u.toString, i) }
            .toDF("k", "ts", idName)
            .select(col("k"), col("ts").cast("decimal(18,0)").as("ts"), col(idName))
        case "date" => // u is micros at day granularity
          rows.map { case (k, u, i) =>
            (k, java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay((u / 86400000000L).toLong)), i)
          }.toDF("k", "ts", idName)
        case "timestamp" =>
          rows.map { case (k, u, i) => (k, tsOf(u), i) }.toDF("k", "ts", idName)
        case "ntz" =>
          rows.map { case (k, u, i) => (k, ldtOf(u), i) }.toDF("k", "ts", idName)
      }

    def brute(left: Seq[(Long, BigInt, Long)], right: Seq[(Long, BigInt, Long)],
        tolUnits: Option[BigInt], dir: String): Map[Long, Long] =
      left.map { case (k, u, lid) =>
        val rs = right.filter(_._1 == k)
        val back = rs.filter(_._2 <= u).sortBy(t => (t._2, t._3)).lastOption
        val fwd = rs.filter(_._2 >= u).sortBy(t => (t._2, t._3)).headOption
        val cand = dir match {
          case "backward" => back
          case _ => (back, fwd) match { // nearest: tie -> backward (pandas)
            case (Some(b), Some(f)) =>
              if ((f._2 - u) < (u - b._2)) Some(f) else Some(b)
            case (b, f) => b.orElse(f)
          }
        }
        lid -> cand.filter(c => tolUnits.forall(t => (u - c._2).abs <= t))
          .map(_._3).getOrElse(-1L)
      }.toMap

    // per-side type pairs: same-type rows plus the UNION-WIDENING mixes
    // the axis chooses from (int∪long → long, long∪decimal(18,0) →
    // decimal(20,0) — integral-valued but past the long range at these
    // magnitudes, float∪double → double, naive date∪ntz → ntz)
    val typePairs = Seq(
      ("timestamp", "timestamp"), ("ntz", "ntz"), ("date", "date"),
      ("ntz", "date"), ("date", "ntz"),
      ("long", "long"), ("int", "int"), ("int", "long"), ("long", "int"),
      ("decimal20", "decimal20"), ("long", "decimal18"), ("decimal18", "long"),
      ("double", "double"), ("float", "double"), ("double", "float"))
    val scen = for {
      pairIdx <- Gen.choose(0, typePairs.length - 1)
      dir <- Gen.oneOf("backward", "nearest")
      seed <- Gen.choose(0L, 1000000L)
      tolIdx <- Gen.choose(0, 2)
    } yield (typePairs(pairIdx), dir, seed, tolIdx)

    val prop = Prop.forAllNoShrink(scen) { case ((lTyp, rTyp), dir, seed, tolIdx) =>
      val rnd = new scala.util.Random(seed)
      val typs = Set(lTyp, rTyp)
      val calendar = typs.exists(Set("timestamp", "ntz", "date"))
      // per-pair regime: the timestamp family gets sub-second deltas
      // (incl. exact-second boundary hits), long/decimal get >2^53
      // magnitudes where double ulps are hundreds of units (bounded by
      // the NARROWEST side's range: decimal(18,0) caps at <1e18, int at
      // ~2.1e9, float-exact ints at 2^24), decimal20-only pairs sit
      // past the LONG range so the decimal(38) branch engages
      val (base, spread, tols) =
        if (calendar && typs.forall(_ == "date"))
          (BigInt(20000L) * 86400000000L, 6,
            Seq(None, Some(86400L), Some(2 * 86400L)))
        else if (calendar && typs("date")) // mixed date/ntz
          (BigInt(20000L) * 86400000000L, 4,
            Seq(None, Some(86400L), Some(3 * 86400L)))
        else if (calendar)
          (BigInt(1700000000L) * 1000000L, 2000000, Seq(None, Some(1L), Some(2L)))
        else if (typs("int"))
          (BigInt(1000000000), 5000, Seq(None, Some(1000L), Some(2500L)))
        else if (typs("float"))
          (BigInt(2).pow(20), 4000, Seq(None, Some(1000L), Some(2500L)))
        else if (typs("decimal18"))
          (BigInt(10).pow(17) * 9, 1000, Seq(None, Some(100L), Some(300L)))
        else if (typs("decimal20"))
          (BigInt(2).pow(63) + BigInt(2).pow(62), 1000,
            Seq(None, Some(100L), Some(300L)))
        else if (typs("long"))
          (BigInt(2).pow(62), 1000, Seq(None, Some(100L), Some(300L)))
        else // double-only
          (BigInt(2).pow(50), 4000, Seq(None, Some(1000L), Some(2500L)))
      // a DATE side only holds day-granular values (floored); when any
      // date participates, deltas span whole days plus sub-day noise so
      // the day-scale tolerances actually discriminate
      def draw(typ: String): BigInt = {
        val u =
          if (typs("date"))
            base +
              BigInt((rnd.nextInt(2 * spread + 1) - spread).toLong) * 86400000000L +
              BigInt(rnd.nextLong(86400000000L))
          else if (calendar)
            base + BigInt(
              if (rnd.nextBoolean())
                (rnd.nextInt(5) - 2).toLong * 1000000L // exact-second hits
              else (rnd.nextInt(2 * spread + 1) - spread).toLong)
          else base + BigInt((rnd.nextInt(2 * spread + 1) - spread).toLong)
        if (typ == "date") (u / 86400000000L) * 86400000000L else u
      }
      val left = (0 until 20).map(i => (rnd.nextInt(3).toLong, draw(lTyp), i.toLong))
      val right = (0 until 20).map(i => (rnd.nextInt(3).toLong, draw(rTyp), 100L + i))
        .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
      val tol = tols(tolIdx)
      // master units are micros for the calendar family, raw otherwise
      val scale = if (calendar) 1000000L else 1L
      val l = mk(lTyp, left, "lid")
      val r = mk(rTyp, right, "rid")
      val out = if (dir == "backward")
        graft.ops.Joins.asofJoin(l, r, "k", "ts", toleranceSec = tol)
      else graft.ops.Joins.asofJoinDirected(l, r, "k", "ts", "nearest",
        toleranceSec = tol)
      // sorted-Seq MULTISET compare (ADVICE r14): a Map keyed by lid
      // would collapse a fan-out duplicate (two output rows for one
      // left row) to one arbitrary entry and could still pass
      val got = out.select("lid", "r_rid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toSeq.sorted
      val want = brute(left, right, tol.map(t => BigInt(t) * scale), dir)
        .toSeq.sorted
      if (got != want) {
        info(s"MISMATCH typ=$lTyp/$rTyp dir=$dir seed=$seed tol=$tol: " +
          got.zip(want).filter(p => p._1 != p._2).take(5).toString)
      }
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(30).withInitialSeed(42L), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: asof null keys/timestamps follow SQL semantics under " +
      "random null mixes, all directions") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // complements the six-axis property (which generates dense non-null
    // rows): here ~1/6 of keys AND timestamps are null on both sides,
    // and the reference model is the SQL one — a null never satisfies
    // the key equality or the ts inequality (r14 fix; the raw window
    // shape instead matched null keys to each other and carried
    // null-first timestamps)
    val scen = for {
      dir <- Gen.oneOf("backward", "forward", "nearest")
      seed <- Gen.choose(0L, 1000000L)
      tolIdx <- Gen.oneOf(0, 1)
    } yield (dir, seed, tolIdx)
    val prop = Prop.forAllNoShrink(scen) { case (dir, seed, tolIdx) =>
      val rnd = new scala.util.Random(seed)
      def key(): Option[Long] =
        if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(3).toLong)
      def ts(): Option[Long] =
        if (rnd.nextInt(6) == 0) None else Some(1000L + rnd.nextInt(200))
      val left = (0 until 25).map(i => (key(), ts(), i.toLong))
      // dedup right (k, ts) so duplicate-timestamp tiebreaks (which
      // differ by direction and are covered elsewhere) can't fire
      val right = (0 until 25).map(i => (key(), ts(), 100L + i))
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val tol = Seq(None, Some(30L))(tolIdx)
      val want: Map[Long, Long] = left.map {
        case (Some(k), Some(u), lid) =>
          val rs = right.collect {
            case (Some(rk), Some(ru), rid) if rk == k => (ru, rid) }
          val back = rs.filter(_._1 <= u).sortBy(_._1).lastOption
          val fwd = rs.filter(_._1 >= u).sortBy(_._1).headOption
          val cand = dir match {
            case "backward" => back
            case "forward"  => fwd
            case _ => (back, fwd) match {
              case (Some(b), Some(f)) =>
                if ((f._1 - u) < (u - b._1)) Some(f) else Some(b)
              case (b, f) => b.orElse(f)
            }
          }
          lid -> cand.filter(c => tol.forall(t => (u - c._1).abs <= t))
            .map(_._2).getOrElse(-1L)
        case (_, _, lid) => lid -> -1L // null key or ts: never matches
      }.toMap
      val out = graft.ops.Joins.asofJoinDirected(
        left.toDF("k", "ts", "lid"), right.toDF("k", "ts", "rid"),
        "k", "ts", dir, toleranceSec = tol)
      // sorted-Seq MULTISET compare (ADVICE r14): catches fan-out
      // duplicates the former Map-by-lid collapse would have masked
      val got = out.select("lid", "r_rid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toSeq.sorted
      val wantSeq = want.toSeq.sorted
      if (got != wantSeq) info(s"MISMATCH dir=$dir seed=$seed tol=$tol: " +
        got.zip(wantSeq).filter(p => p._1 != p._2).take(5).toString)
      got == wantSeq
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(25).withInitialSeed(47L), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: binned joins match brute-force cross filter across " +
      "numeric families and bin widths") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.DataFrame

    // families: all-long at >2^53 magnitudes (double ulps are hundreds
    // of units — the native-filter regime), decimal(20,0) past the LONG
    // range, all-double on an exact integer grid, and the allowed
    // exact-family mix (long one side, decimal(18,0) the other). The
    // bin ROUTING always runs on the rounded double axis; the property
    // verifies the documented monotonic-superset argument empirically:
    // rounding may add candidates but the native filter's output equals
    // exact BigInt brute force.
    def sqlType(fam: String): String = fam match {
      case "long" => "long"
      case "double" => "double"
      case "decimal20" => "decimal(20,0)"
      case "decimal18" => "decimal(18,0)"
    }
    def mk(fam: String, rows: Seq[(Long, Seq[BigInt])], idName: String,
        valNames: Seq[String]): DataFrame = {
      val wide = rows.map { case (id, vs) =>
        (id, vs.map(_.toString).mkString(","))
      }.toDF(idName, "__vs")
      valNames.zipWithIndex.foldLeft(wide) { case (df, (n, i)) =>
        df.withColumn(n,
          split(col("__vs"), ",").getItem(i).cast(sqlType(fam)))
      }.drop("__vs")
    }

    val scen = for {
      fam <- Gen.oneOf("long", "decimal20", "double", "mixed_exact",
        "long_neg", "zero_cross")
      bwIdx <- Gen.choose(0, 3)
      seed <- Gen.choose(0L, 1000000L)
    } yield (fam, bwIdx, seed)

    val prop = Prop.forAllNoShrink(scen) { case (fam, bwIdx, seed) =>
      val rnd = new scala.util.Random(seed)
      // long_neg and zero_cross pin the negative-coordinate corner:
      // floor-division bins must be TRUE floors there (a
      // truncate-toward-zero bin would shift every negative bin by one
      // and route boundary points to the wrong bin)
      val (base, famL, famR) = fam match {
        case "long" => (BigInt(2).pow(62), "long", "long")
        case "long_neg" => (-BigInt(2).pow(62), "long", "long")
        case "zero_cross" => (BigInt(0), "long", "long")
        case "decimal20" =>
          (BigInt(2).pow(63) + BigInt(2).pow(62), "decimal20", "decimal20")
        case "double" => (BigInt(2).pow(50), "double", "double")
        case _ => (BigInt(10).pow(17) * 9, "long", "decimal18")
      }
      // non-divisor odd widths, a power of two, and (rangeJoin only) a
      // fractional width — bin math tolerates any positive double
      val bwDouble = Seq(7.0, 64.0, 501.0, 63.5)(bwIdx)
      val bwLong = Seq(7L, 64L, 501L, 63L)(bwIdx)
      def draw(): BigInt = base + BigInt((rnd.nextInt(2001) - 1000).toLong)
      val pts = (0 until 15).map(i => (i.toLong, draw()))
      val ivs = (0 until 10).map { i =>
        val a = draw(); (100L + i.toLong, a, a + BigInt(rnd.nextInt(51)))
      }
      val pDf = mk(famL, pts.map { case (id, v) => (id, Seq(v)) }, "pid", Seq("v"))
      val iDf = mk(famR, ivs.map { case (id, a, b) => (id, Seq(a, b)) },
        "iid", Seq("lo", "hi"))
      val gotR = graft.ops.Joins.rangeJoin(pDf, iDf, "v", "lo", "hi", bwDouble)
        .select("pid", "r_iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val wantR = for {
        (pid, v) <- pts; (iid, lo, hi) <- ivs if lo <= v && v <= hi
      } yield (pid, iid)
      val rOk = gotR.sorted == wantR.sorted // bag equality: also no dups
      if (!rOk) info(s"rangeJoin MISMATCH fam=$fam bw=$bwDouble seed=$seed: " +
        s"got=${gotR.size} want=${wantR.size}")

      val lIvs = (0 until 10).map { i =>
        val a = draw(); (i.toLong, a, a + BigInt(rnd.nextInt(51)))
      }
      val lDf = mk(famL, lIvs.map { case (id, a, b) => (id, Seq(a, b)) },
        "lid", Seq("s", "e"))
      val gotO = graft.ops.Joins.intervalOverlapJoin(lDf,
          mk(famR, ivs.map { case (id, a, b) => (id, Seq(a, b)) },
            "rid", Seq("s", "e")),
          "s", "e", "s", "e", bwLong)
        .select("lid", "r_rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val wantO = for {
        (lid, ls, le) <- lIvs; (rid, rs, re) <- ivs if ls <= re && rs <= le
      } yield (lid, rid)
      // sorted-bag equality doubles as the exactly-once check: a pair
      // surfacing at two bins would break it even with set equality
      val oOk = gotO.sorted == wantO.sorted
      if (!oOk) info(s"overlap MISMATCH fam=$fam bw=$bwLong seed=$seed: " +
        s"got=${gotO.size} want=${wantO.size} dups=${gotO.size - gotO.distinct.size}")
      rOk && oOk
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(30).withInitialSeed(43L), prop)
    assert(res.passed, res.status.toString)
  }

  test("IVF persist lifecycle: caches release after the caller's first action") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    spark2.catalog.clearCache()
    // baseline: RDD-level persists from earlier tests (localCheckpoint
    // blocks awaiting GC) are outside clearCache's reach and not ours —
    // the contract under test is that THIS operator adds nothing
    val baseline = spark2.sparkContext.getPersistentRDDs.keySet
    val rows = Seq(
      (0L, Seq(1.0, 0.001, 0.0)), (1L, Seq(1.0, 0.002, 0.0)),
      (2L, Seq(1.0, 0.003, 0.0)), (3L, Seq(1.0, 0.004, 0.0)),
      (10L, Seq(0.0, 1.0, 0.01)), (11L, Seq(0.0, 1.0, 0.02)))
    val corpus = rows.toDF("id", "v")
    val queries = corpus.filter(col("id") === 0L)
    val model = Similarity.ivfFit(corpus, "v", "id", nClusters = 2, sampleN = 6)
    // the release listener fires on the listener-bus thread after the
    // action returns — poll briefly instead of asserting instantly
    def storedAfter(f: => Unit): Int = {
      f
      def fresh = spark2.sparkContext.getPersistentRDDs.keySet.toSet -- baseline
      val deadline = System.currentTimeMillis + 30000
      while (fresh.nonEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      fresh.size
    }
    // two back-to-back invocations with NO manual clearCache: each must
    // leave zero tracked RDDs once its first action completes
    for (_ <- 1 to 2) {
      val n = storedAfter {
        assert(Similarity.hardNegativesIvf(
          corpus, queries, "v", "id", 0.9, model, probe = 1).count() == 1)
      }
      assert(n == 0, s"hardNegativesIvf left $n cached RDDs")
    }
    val pairs = Seq((0L, 1L, 0.99)).toDF("id_a", "id_b", "cosine")
    for (_ <- 1 to 2) {
      val n = storedAfter {
        Similarity.contrastiveTriplets(
          corpus, pairs, "v", "id", 0.9, nClusters = 2).count()
      }
      assert(n == 0, s"contrastiveTriplets left $n cached RDDs")
    }
    // the caller's transforms stack ON TOP of the marker: a filtered
    // count still releases (and ivfTopK/ivfKnnJoin share the contract)
    val n2 = storedAfter {
      Similarity.ivfTopK(corpus, "v", "id",
        Array(1.0, 0.0, 0.0), k = 2, model).filter(col("rank") === 1).count()
    }
    assert(n2 == 0, s"ivfTopK left $n2 cached RDDs")
    val n3 = storedAfter {
      Similarity.ivfKnnJoin(corpus, queries, "v", "id", k = 2, model).count()
    }
    assert(n3 == 0, s"ivfKnnJoin left $n3 cached RDDs")
    // the recompute-safe persists in corpusReport/invertedIndex share
    // the contract (snapshot-dependent persists — packingOffsets,
    // trainingOrder — deliberately do NOT; see CacheRelease scaladoc)
    val docs = Seq((1L, "a b a"), (2L, "b c d")).toDF("id", "text")
    val n4 = storedAfter {
      graft.ops.TextStats.corpusReport(docs, "text", "id").count()
    }
    assert(n4 == 0, s"corpusReport left $n4 cached RDDs")
    val n5 = storedAfter {
      graft.ops.Retrieval.invertedIndex(docs, "text", "id", minDf = 2).count()
    }
    assert(n5 == 0, s"invertedIndex left $n5 cached RDDs")
    // release must fire on a FAILED first action too (the onFailure
    // path): a cache pinned by a crashed job would otherwise leak
    val cached = Seq(1L, 2L).toDF("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count() // materialize
    val marked = graft.spark.CacheRelease.afterFirstAction(
      cached.withColumn("boom",
        when(col("id") > 0, expr("raise_error('intentional test failure')"))
          .otherwise(lit("x"))),
      Seq(cached))
    val n6 = storedAfter {
      intercept[Exception] { marked.collect() }
    }
    assert(n6 == 0, s"failed action left $n6 cached RDDs")
  }

  test("CacheRelease: pending introspection and the maxPending cap") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val CR = graft.spark.CacheRelease
    val base = CR.pending
    // armed-but-abandoned plans are visible in pending (registration is
    // synchronous on the arming thread)
    val c1 = Seq(1L).toDF("id").persist(); c1.count()
    val c2 = Seq(2L).toDF("id").persist(); c2.count()
    val m1 = CR.afterFirstAction(c1.select("id"), Seq(c1))
    val m2 = CR.afterFirstAction(c2.select("id"), Seq(c2))
    assert(CR.pending == base + 2, s"expected ${base + 2}, got ${CR.pending}")
    // first actions drain them (the release rides the async listener
    // bus — poll instead of asserting instantly)
    m1.count(); m2.count()
    def drainTo(target: Int): Unit = {
      val deadline = System.currentTimeMillis + 30000
      while (CR.pending > target && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(CR.pending == target, s"pending ${CR.pending} != $target")
    }
    drainTo(base)
    // the cap: arming past maxPending force-releases the OLDEST hook —
    // its materialized cache must actually drop, not just the counter
    val before = spark2.sparkContext.getPersistentRDDs.keySet.toSet
    val old = Seq(9L).toDF("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    old.count()
    assert(spark2.sparkContext.getPersistentRDDs.keySet.toSet != before)
    CR.afterFirstAction(old.select("id"), Seq(old))
    val armed = (1 to CR.maxPending).map { i =>
      CR.afterFirstAction(Seq(i.toLong).toDF("id"), Seq.empty)
    }
    assert(CR.pending <= CR.maxPending,
      s"cap ${CR.maxPending} exceeded: ${CR.pending}")
    // eviction unpersists synchronously on the arming thread
    assert(spark2.sparkContext.getPersistentRDDs.keySet.toSet == before,
      "evicted hook must unpersist its cache")
    // drain the armed hooks so they don't shadow later tests' counters
    armed.foreach(_.count())
    drainTo(base)
  }

  test("CacheRelease: concurrent arming never exceeds the cap and drains clean") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val CR = graft.spark.CacheRelease
    val base = CR.pending
    // 4 threads arming 20 hooks each races the registry add against
    // the eviction loop; the cap may transiently over-evict (harmless,
    // recompute-safe) but must never be exceeded at rest, and every
    // armed frame must still be runnable afterwards
    val armed = java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.sql.DataFrame]())
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        (0 until 20).foreach { i =>
          armed.add(CR.afterFirstAction(
            Seq((t * 100 + i).toLong).toDF("id"), Seq.empty))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(CR.pending <= CR.maxPending,
      s"cap ${CR.maxPending} exceeded after concurrent arming: ${CR.pending}")
    // surviving hooks drain on their actions; evicted frames still run
    // (they just lost nothing — empty cache lists here)
    armed.forEach(df => assert(df.count() == 1))
    val deadline = System.currentTimeMillis + 30000
    while (CR.pending > base && System.currentTimeMillis < deadline)
      Thread.sleep(50)
    assert(CR.pending == base, s"pending ${CR.pending} != $base after drain")
  }

  test("CacheRelease: maxPending conf honored, eviction logs the marker") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val CR = graft.spark.CacheRelease
    // earlier suites' hooks ride the async listener bus — wait them out
    // so the cap-of-3 arithmetic below starts from a clean registry
    val startDeadline = System.currentTimeMillis + 30000
    while (CR.pending > 0 && System.currentTimeMillis < startDeadline)
      Thread.sleep(50)
    assert(CR.pending == 0, s"stale pending hooks from earlier tests: ${CR.pending}")
    // capture the eviction WARN via a log4j2 appender on the exact
    // logger CacheRelease writes to (the conf contract says evictions
    // are LOUD — a silent force-release is the bug this test pins)
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-cr-capture", null, null, false,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        captured.add(e.getMessage.getFormattedMessage)
    }
    appender.start()
    val coreLogger = org.apache.logging.log4j.LogManager
      .getLogger("graft.spark.CacheRelease")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    val prevLevel = coreLogger.getLevel
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.spark.CacheRelease", org.apache.logging.log4j.Level.WARN)
    coreLogger.addAppender(appender)
    try {
      spark2.conf.set(CR.maxPendingKey, "3")
      assert(CR.maxPending == 3, "introspection must read the session conf")
      val armed = (1 to 5).map { i =>
        CR.afterFirstAction(Seq(i.toLong).toDF("id"), Seq.empty)
      }
      assert(CR.pending <= 3, s"conf cap 3 exceeded: ${CR.pending}")
      val msgs = captured.toArray.map(_.toString)
      assert(msgs.exists(m => m.contains("graft_cache_release_") &&
          m.contains(CR.maxPendingKey)),
        s"eviction must log the evicted marker and the conf knob; got: " +
          msgs.mkString(" | "))
      // a bad value fails loudly at arming, never a silent default
      spark2.conf.set(CR.maxPendingKey, "0")
      intercept[IllegalArgumentException] {
        CR.afterFirstAction(Seq(9L).toDF("id"), Seq.empty)
      }
      spark2.conf.set(CR.maxPendingKey, "banana")
      intercept[IllegalArgumentException] { CR.maxPending }
      spark2.conf.unset(CR.maxPendingKey)
      assert(CR.maxPending == 64, "unset conf falls back to the default")
      armed.foreach(_.count())
      val deadline = System.currentTimeMillis + 30000
      while (CR.pending > 0 && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(CR.pending == 0, s"pending ${CR.pending} != 0 after drain")
    } finally {
      spark2.conf.unset(CR.maxPendingKey)
      coreLogger.removeAppender(appender)
      appender.stop()
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "graft.spark.CacheRelease", prevLevel)
    }
  }

  test("reserved-name guard matches the session's case resolution") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // default caseSensitive=false: withColumn("__bin", ...) REPLACES a
    // user '__Bin' case-insensitively, so the guard must reject it too
    val pts = Seq((1L, 2.0, "x")).toDF("pid", "v", "__Bin")
    val ivs = Seq((1L, 0.0, 5.0)).toDF("iid", "lo", "hi")
    val err = intercept[IllegalArgumentException] {
      graft.ops.Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binWidth = 1.0)
    }
    assert(err.getMessage.contains("__Bin"), err.getMessage)
    // case-SENSITIVE session: '__Bin' is a genuinely different column,
    // never overwritten — rejecting it would be a false positive
    val prev = spark2.conf.get("spark.sql.caseSensitive")
    try {
      spark2.conf.set("spark.sql.caseSensitive", "true")
      assert(graft.ops.Joins.rangeJoin(pts, ivs, "v", "lo", "hi",
        binWidth = 1.0).count() == 1L)
    } finally spark2.conf.set("spark.sql.caseSensitive", prev)
    // ADVICE r12 #3: the interval side renames AFTER staging __bin, so
    // PREFIXED names must stay clear — prefix "__" + column 'bin' used
    // to die in a confusing AnalysisException on the USING join
    val err2 = intercept[IllegalArgumentException] {
      graft.ops.Joins.rangeJoin(
        Seq((1L, 2.0)).toDF("pid", "v"),
        Seq((1L, 0.0, 5.0, "z")).toDF("iid", "lo", "hi", "bin"),
        "v", "lo", "hi", binWidth = 1.0, rightPrefix = "__")
    }
    assert(err2.getMessage.contains("rangeJoin") &&
      err2.getMessage.contains("prefixed"), err2.getMessage)
    // ADVICE r13: a prefixed name equal to '__nbins' IS safe in
    // rangeJoin (it drops __nbins before the rename fold, unlike
    // intervalOverlapJoin) — rejecting it was a false positive
    assert(graft.ops.Joins.rangeJoin(
      Seq((1L, 2.0)).toDF("pid", "v"),
      Seq((1L, 0.0, 5.0, "z")).toDF("iid", "lo", "hi", "nbins"),
      "v", "lo", "hi", binWidth = 1.0, rightPrefix = "__").count() == 1L)
  }

  test("reserved-name guard follows the DataFrame's session, not the " +
      "thread-active one") {
    // r13 board #5: in a multi-session JVM with divergent
    // spark.sql.caseSensitive the staging withColumn resolves against
    // the DataFrame's OWN session — a guard reading getActiveSession
    // follows the wrong mode and re-opens the silent-overwrite path.
    val base = SparkTestSession.spark // case-INsensitive (default)
    import base.implicits._
    val caseSens = base.newSession()
    caseSens.conf.set("spark.sql.caseSensitive", "true")
    val pts = Seq((1L, 2.0, "x")).toDF("pid", "v", "__Bin")
    val ivs = Seq((1L, 0.0, 5.0)).toDF("iid", "lo", "hi")
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    try {
      // df owned by the case-insensitive session ('__Bin' WILL be
      // overwritten by withColumn("__bin", ...)) while a case-sensitive
      // session is thread-active: must still reject
      org.apache.spark.sql.SparkSession.setActiveSession(caseSens)
      val err = intercept[IllegalArgumentException] {
        graft.ops.Joins.rangeJoin(pts, ivs, "v", "lo", "hi", binWidth = 1.0)
      }
      assert(err.getMessage.contains("__Bin"), err.getMessage)
      // converse: df owned by the case-SENSITIVE session ('__Bin' is a
      // genuinely different, safe column) while the insensitive session
      // is active: must still accept
      val ptsCs = { import caseSens.implicits._
        Seq((1L, 2.0, "x")).toDF("pid", "v", "__Bin") }
      val ivsCs = { import caseSens.implicits._
        Seq((1L, 0.0, 5.0)).toDF("iid", "lo", "hi") }
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      assert(graft.ops.Joins.rangeJoin(ptsCs, ivsCs, "v", "lo", "hi",
        binWidth = 1.0).count() == 1L)
    } finally prevActive.foreach(
      org.apache.spark.sql.SparkSession.setActiveSession)
  }

  test("Ids.fieldOf honors spark.sql.caseSensitive") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val df = Seq((1L, "a")).toDF("DocId", "text")
    // default (insensitive): the fallback resolves like the analyzer
    assert(graft.ops.Ids.fieldOf(df, "docid", "t").name == "DocId")
    val prev = spark2.conf.get("spark.sql.caseSensitive")
    try {
      spark2.conf.set("spark.sql.caseSensitive", "true")
      // case-sensitive session: the guard must NOT resolve a column the
      // analyzer would reject — a pass here would validate the wrong one
      intercept[IllegalArgumentException] {
        graft.ops.Ids.fieldOf(df, "docid", "t")
      }
      assert(graft.ops.Ids.fieldOf(df, "DocId", "t").name == "DocId")
    } finally spark2.conf.set("spark.sql.caseSensitive", prev)
  }

  test("numeric-id contract: lossless DECIMAL(p<=18,0) ids accepted, null sample ids raise") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // JDBC NUMERIC keys arrive as scale-0 decimals; their long cast is
    // exact, so the guard must not reject them
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
      .select(col("src").cast("decimal(10,0)").as("src"),
        col("dst").cast("decimal(10,0)").as("dst"))
    assert(graft.ops.Graph.pageRank9(e, "src", "dst", iters = 2).count() == 3)
    assert(!graft.ops.Ids.isIntegral(
      org.apache.spark.sql.types.DecimalType(19, 0)), "19 digits can overflow long")
    assert(!graft.ops.Ids.isIntegral(org.apache.spark.sql.types.DoubleType))
    // a null id used to silently vanish from every sample/split at any
    // fraction; now the selection hash raises naming the contract
    val ids = Seq(Some(1L), Some(2L), None).toDF("id")
    val err = intercept[Exception] {
      graft.ops.Sampling.assignSplit(ids, "id").collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(x => Option(x.getMessage)).mkString(" | "))
    assert(rootMsg(err).contains("NULL id"), rootMsg(err))
  }

  test("stratifiedSample: null strata form their own stratum, never silently vanish") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val ids = (0L until 200L).map(i => (i, if (i % 3 == 0) null else "a"))
      .toDF("id", "src")
    // fraction 1.0 must keep EVERY row — the old concat-null hash
    // dropped all null-strata rows at any fraction
    assert(graft.ops.Sampling.stratifiedSample(ids, "id", "src", 1.0, "z").count() == 200L)
    // null-strata rows sample at ~fraction like any other stratum
    val nullKept = graft.ops.Sampling.stratifiedSample(ids, "id", "src", 0.5, "z")
      .filter(col("src").isNull).count()
    assert(nullKept > 10 && nullKept < 57, s"null stratum kept $nullKept of 67")
    // and non-null strata selection is unchanged by null rows' presence
    val a1 = graft.ops.Sampling.stratifiedSample(ids, "id", "src", 0.3, "z")
      .filter(col("src") === "a").collect().map(_.getLong(0)).toSet
    val a2 = graft.ops.Sampling.stratifiedSample(ids.filter(col("src").isNotNull),
      "id", "src", 0.3, "z").collect().map(_.getLong(0)).toSet
    assert(a1 == a2)
  }

  test("applyChanges rejects unknown/null ops instead of vanishing the row") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val base = Seq((1L, "old"), (2L, "keep")).toDF("id", "text")
    val ok = Seq((1L, "new", "update"), (3L, "ins", "insert"))
      .toDF("id", "text", "op")
    val applied = graft.ops.Snapshot.applyChanges(base, ok, "id", "op")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(applied == Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
    // a misspelled op used to anti-join the base row away AND drop the
    // change payload — id 1 silently vanished; now the job fails named
    val bad = Seq((1L, "new", "Delete")).toDF("id", "text", "op")
    val e = intercept[Exception] {
      graft.ops.Snapshot.applyChanges(base, bad, "id", "op").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("unknown op"),
      s"${e.getClass}: ${e.getMessage}")
    val nullOp = Seq((1L, "new", null: String)).toDF("id", "text", "op")
    intercept[Exception] {
      graft.ops.Snapshot.applyChanges(base, nullOp, "id", "op").collect()
    }
  }

  test("hardNegativesIvf fails fast on non-integral id columns") {
    val corpus = Seq(("a", Seq(1.0, 0.0)), ("b", Seq(0.0, 1.0)))
      .toDF("id", "v")
    val model = Similarity.IvfModel(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(0.0, 0.0))
    // without the guard, cast('long') nulls every string id, the
    // self-exclusion filter drops all rows, and the result is silently
    // EMPTY — the r9-advice failure this test pins shut
    val e = intercept[IllegalArgumentException] {
      Similarity.hardNegativesIvf(corpus, corpus, "v", "id", 0.9, model)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("hardNegativesIvf fallback path (all-dup probed cluster) stays exact and observable") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // cluster A: the query plus near-identical copies (all >= 0.9 to
    // it); cluster B: an orthogonal direction (the only sub-threshold
    // rows). probe=1 probes exactly A, which holds no sub-threshold
    // candidate -> s1 = -1 -> the honest full scan must still find the
    // true hardest negative in B, identically to brute force.
    val rows = Seq(
      (0L, Seq(1.0, 0.001, 0.0)), (1L, Seq(1.0, 0.002, 0.0)),
      (2L, Seq(1.0, 0.003, 0.0)), (3L, Seq(1.0, 0.004, 0.0)),
      (10L, Seq(0.0, 1.0, 0.01)), (11L, Seq(0.0, 1.0, 0.02)))
    val corpus = rows.toDF("id", "v")
    val queries = corpus.filter(col("id") === 0L)
    val model = Similarity.ivfFit(corpus, "v", "id", nClusters = 2, sampleN = 6)
    val ivf = Similarity.hardNegativesIvf(corpus, queries, "v", "id", 0.9, model, probe = 1)
    val got = ivf.collect()
    val brute = Similarity.hardNegatives(corpus, queries, "v", "id", 0.9).collect()
    assert(got.toSeq == brute.toSeq)
    assert(got.length == 1 && Set(10L, 11L).contains(got.head.getLong(1)))
    // the observe() contract: the fallback fraction is 1/1 here
    val m = ivf.queryExecution.observedMetrics
      .find(_._1.startsWith("graft_hard_negatives_ivf")).map(_._2)
    assert(m.nonEmpty, s"no graft_hard_negatives_ivf metric in ${ivf.queryExecution.observedMetrics.keys}")
    assert(m.get.getAs[Long]("queries") == 1L &&
      m.get.getAs[Long]("fallback_queries") == 1L, m.get.toString)
    spark2.catalog.clearCache()
  }

  test("labelCentroidModel rejects sparse and negative labels") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // gap below the max (labels {0, 2}): without the density check the
    // missing cluster 1 would silently become an all-zero centroid
    val sparse = Seq((0L, 0, Seq(1.0, 0.0)), (1L, 2, Seq(0.0, 1.0)))
      .toDF("id", "label", "v")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.labelCentroidModel(sparse, "v", "label")
    }
    assert(e1.getMessage.contains("dense"), e1.getMessage)
    val neg = Seq((0L, -1, Seq(1.0, 0.0)), (1L, 0, Seq(0.0, 1.0)))
      .toDF("id", "label", "v")
    intercept[Exception] {
      Similarity.labelCentroidModel(neg, "v", "label")
    }
    // dense labels still fit: centroid of each single-member label
    val ok = Seq((0L, 0, Seq(1.0, 0.0)), (1L, 1, Seq(0.0, 1.0)))
      .toDF("id", "label", "v")
    val model = Similarity.labelCentroidModel(ok, "v", "label")
    assert(model.nClusters == 2 && model.centroids(0)(0) == 1.0)
  }

  test("ArgMaxTie null ties coalesce to Long.MinValue (sort last on equal score)") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val df = Seq[(Long, Double, java.lang.Long)](
      (0L, 1.0, null), (0L, 1.0, 5L),   // equal score: real tie wins
      (1L, 1.0, null),                   // only-null ties: MinValue surfaces
      (2L, 2.0, null), (2L, 1.0, 7L))    // higher score wins even with null tie
      .toDF("g", "score", "tie")
    val got = df.groupBy(col("g"))
      .agg(graft.spark.ArgMaxTie(col("score"), col("tie")).as("b"))
      .select(col("g"), col("b.score"), col("b.tie"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got(0L) == ((1.0, 5L)), s"null tie must lose to a real tie: ${got(0L)}")
    assert(got(1L) == ((1.0, Long.MinValue)), s"all-null ties surface MinValue: ${got(1L)}")
    assert(got(2L) == ((2.0, Long.MinValue)), s"score dominates tie: ${got(2L)}")
  }

  test("semDedupAssigned: a tighter maxCluster cap only ever REDUCES drops") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // one dense near-dup cluster of 6 + a far singleton; capping the
    // cluster at 3 must keep a superset of the uncapped survivors and
    // every capped drop must also be an uncapped drop (the cap is a
    // recall budget, never a correctness risk — r9 verdict stretch #8)
    def v(eps: Double) = Seq(1.0, eps, 0.0)
    val rows = Seq((0L, v(0.00)), (1L, v(0.01)), (2L, v(0.02)),
      (3L, v(0.03)), (4L, v(0.04)), (5L, v(0.05)), (50L, Seq(0.0, 0.0, 1.0)))
    val df = rows.toDF("id", "v")
    val model = Similarity.ivfFit(df, "v", "id", nClusters = 2, sampleN = 7)
    def kept(cap: Int): Set[Long] =
      Dedup.semDedupAssigned(df, "v", "id", model, tau = 0.999, maxCluster = cap)
        .select("id").collect().map(_.getLong(0)).toSet
    val all = rows.map(_._1).toSet
    val keptUncapped = kept(10000)
    val keptCapped = kept(3)
    assert(keptUncapped.subsetOf(keptCapped),
      s"cap must only shrink drops: uncapped=$keptUncapped capped=$keptCapped")
    assert((all -- keptCapped).subsetOf(all -- keptUncapped))
    // the geometry actually exercises the cap: uncapped drops 1..5,
    // capped considers only ids 0,1,2 so 3,4,5 survive the cap
    assert(keptUncapped == Set(0L, 50L) && keptCapped == Set(0L, 3L, 4L, 5L, 50L))
    spark2.catalog.clearCache()
  }

  test("Bench self-adjudication: suspect flags headline-row dispersion >2") {
    import graft.Bench.{dispersion, median, suspect}
    assert(median(Vector(1.0, 2.0, 3.0, 4.0)) == 2.5)
    assert(math.abs(dispersion(Vector(2.0, 7.0, 7.2, 6.9)) - 3.475) < 1e-9)
    // quiet window: K+1 samples agree (disp 1.0-1.3) -- not suspect
    val quiet = Map(
      "annotate_5k_dict" -> Vector(1.00, 1.05, 1.10, 0.98),
      "annotate_80k_mixed" -> Vector(2.0, 2.1, 2.2, 2.05))
    assert(!suspect(quiet))
    // the r12 contamination shape: all K round-aligned samples poisoned,
    // only the time-displaced K+1th clean -- median/min 3.5, must flag
    val poisoned = quiet + ("annotate_5k_mixed" -> Vector(7.0, 7.2, 6.9, 2.0))
    assert(suspect(poisoned))
    // headline rows only: an op-query blip never flags the artifact
    // (op mins already self-defend via K interleaved rounds)
    assert(!suspect(quiet + ("q_triplets" -> Vector(30.0, 3.0, 3.1, 3.0))))
    // threshold is a parameter: the same quiet window flags under a
    // hair-trigger threshold, pinning that the comparison is med/min
    assert(suspect(quiet, threshold = 1.01))
    // canary row (r15 board #1): a uniformly-loaded window elevates the
    // canary's every sample EQUALLY — tight dispersion, so it must NOT
    // flip suspect (it is a normalization signal for bench_compare's
    // canary-normalized geomean, not a discard-the-row signal)
    assert(!suspect(quiet + ("canary_cpu" -> Vector(0.9, 0.95, 0.92, 0.91))))
  }

  test("Bench compactTailLine: budget-bounded, valid JSON, headline " +
      "intact, most-expensive queries first, omission count honest") {
    import graft.Bench.compactTailLine
    val headline = """{"docs_per_sec":248834,"cpus":32,"suspect":false,""" +
      """"attempts":1}"""
    val mins = Seq("q_small" -> 0.099, "q_triplets" -> 4.340,
      "q_stream_join" -> 4.626, "q_mid" -> 0.590, "q_tiny" -> 0.012,
      "q_exact_one" -> 1.0)
    val line = compactTailLine(headline, 92.391, "/root/testdata/sf0.1",
      mins, budgetBytes = 1870)
    assert(line.length <= 1870, s"over budget: ${line.length}")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(line) // throws on invalid JSON
    assert(root.get("headline").get("docs_per_sec").asLong == 248834L)
    assert(root.get("metric").asText == "total")
    assert(math.abs(root.get("value").asDouble - 92.391) < 1e-9)
    assert(root.get("sf").asText == "/root/testdata/sf0.1")
    // generous budget: every key fits, values at 1ms resolution
    val q = root.get("queries")
    assert(q.size == 6 && root.get("queries_omitted").asInt == 0)
    assert(math.abs(q.get("q_triplets").asDouble - 4.34) < 1e-9)
    assert(math.abs(q.get("q_tiny").asDouble - 0.012) < 1e-9)
    assert(math.abs(q.get("q_exact_one").asDouble - 1.0) < 1e-9)
    // tight budget: the expensive keys win the slots, count is honest,
    // line still parses and never exceeds the budget (the budget
    // guarantee holds whenever it covers the fixed headline+metric
    // prefix, here ~163 bytes; below that the prefix prints regardless)
    val sizes = (165 to 320 by 7)
    sizes.foreach { b =>
      val l = compactTailLine(headline, 92.391, "sf", mins, budgetBytes = b)
      assert(l.length <= b, s"budget $b overflowed: ${l.length}")
      val r = om.readTree(l)
      val got = r.get("queries")
      assert(got.size + r.get("queries_omitted").asInt == mins.size)
      if (got.size > 0 && got.size < mins.size) {
        // first-fit by descending time: q_triplets/q_stream_join take
        // priority over the sub-second keys whenever one of them fits
        assert(got.has("q_stream_join") || got.has("q_triplets") ||
          !got.has("q_tiny"))
      }
    }
    // the real-shape sanity check: a 182-key map at realistic key
    // lengths must deliver ≥40 keys within the r18-measured tail budget
    val big = (1 to 182).map(i => f"q_realistic_key_$i%03d" -> (0.05 + i * 0.02))
    val real = compactTailLine(headline, 120.0, "/root/testdata/sf0.1",
      big, budgetBytes = 1870)
    assert(real.length <= 1870)
    val rb = om.readTree(real)
    assert(rb.get("queries").size >= 40,
      s"only ${rb.get("queries").size} keys fit")
  }

  test("Bench op-row band residuals: the recorded r16 driver window " +
      "flags, the quiet r16a window does not") {
    import graft.Bench.{Band, loadBands, opRowsOverBand, opRowsSuspect}
    // decision unit first: median over 1.4×band-max AND disp > 1.5,
    // three rows needed
    val b = Map("q_a" -> Band(0.1, 0.2), "q_b" -> Band(0.1, 0.2),
      "q_c" -> Band(0.1, 0.2))
    val hot = Map("q_a" -> (0.3, 2.0), "q_b" -> (0.29, 1.6),
      "q_c" -> (0.5, 1.8))
    assert(opRowsSuspect(hot, b))
    assert(opRowsOverBand(hot, b) == Seq("q_a", "q_b", "q_c"))
    // two rows are not enough — one regression or unlucky row must not
    // discard a window
    assert(!opRowsSuspect(hot - "q_c", b))
    // a high residual with QUIET dispersion is a real regression, not
    // a burst: report it, never auto-discard it
    assert(!opRowsSuspect(hot.map { case (k, (m, _)) => k -> (m, 1.1) }, b))
    // unbanded rows and non-op rows never count
    assert(!opRowsSuspect(Map("q_new1" -> (9.0, 9.0), "q_new2" -> (9.0, 9.0),
      "q_new3" -> (9.0, 9.0)), b))
    assert(!opRowsSuspect(Map("annotate_5k_dict" -> (9.0, 9.0),
      "canary_cpu" -> (9.0, 9.0), "q_a" -> (0.3, 2.0)), b))
    // a missing bands file disables the rule (fresh checkout)
    assert(loadBands("/nonexistent/bands.json").isEmpty)
    assert(!opRowsSuspect(hot, Map.empty))

    // the PERMANENT-RECORD shapes: BENCH_LOCAL_r16driver.json is the
    // r16 driver window (suspect:false with a quiet canary yet six op
    // medians 1.4–1.9× over band, disp 1.46–2.18 — the blind spot);
    // BENCH_LOCAL_r16a.json is the same round's clean builder window
    val bands = loadBands("BENCH_BANDS.json")
    assert(bands.nonEmpty && bands.contains("q_vocab"), bands.size.toString)
    def rowsOf(path: String): Map[String, (Double, Double)] = {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)))
      val med = root.get("queries_median")
      val disp = root.get("queries_disp")
      val out = Map.newBuilder[String, (Double, Double)]
      val it = med.fields()
      while (it.hasNext) {
        val e = it.next()
        val d = disp.get(e.getKey)
        if (d != null) out += e.getKey -> (e.getValue.asDouble, d.asDouble)
      }
      out.result()
    }
    val driver = rowsOf("BENCH_LOCAL_r16driver.json")
    assert(opRowsSuspect(driver, bands),
      s"r16 driver shape must flag: over=${opRowsOverBand(driver, bands)}")
    assert(opRowsOverBand(driver, bands).size >= 3)
    val quiet = rowsOf("BENCH_LOCAL_r16a.json")
    assert(!opRowsSuspect(quiet, bands),
      s"r16a quiet window must stay clean: ${opRowsOverBand(quiet, bands)}")
  }

  test("Bench attempt scheduler: escalating pauses outlast a burst " +
      "longer than attempts 1+2's span; rejection evidence kept; a " +
      "never-quiet host returns the last window with full history") {
    import graft.Bench.{retryPauseSec, runAttempts}
    // the documented escalation: 240 s, then capped at 900 s
    assert(retryPauseSec(1) == 240)
    assert(retryPauseSec(2) == 900)
    assert(retryPauseSec(3) == 900)
    assert(retryPauseSec(9) == 900) // no overflow at silly depths
    assert(retryPauseSec(2, 0, 900) == 0) // PAUSE_SEC=0 = no-pause drill
    // fake clock: a window takes 900 s of wall time; the burst covers
    // t ∈ [0, burstEnd). A window is suspect iff it STARTS inside it.
    def run(burstEndSec: Long, maxAttempts: Int) = {
      var now = 0L
      val evidence = Seq.newBuilder[(Long, Int)]
      val (win, attempts, rejected) = runAttempts[(Long, Boolean)](
        maxAttempts,
        a => retryPauseSec(a),
        () => (),
        () => { val start = now; now += 900; (start, start < burstEndSec) },
        (w: (Long, Boolean)) => w._2,
        (w: (Long, Boolean), a: Int) => evidence += ((w._1, a)),
        ms => now += ms / 1000)
      (win, attempts, rejected, evidence.result())
    }
    // burst 2100 s > window1 + pause1 + window2 = 2040 s: attempts 1
    // (t=0) and 2 (t=1140) both land inside it; the 900 s escalation
    // puts attempt 3 at t=2940 — quiet, accepted
    val (win, attempts, rejected, evidence) = run(2100L, 3)
    assert(!win._2 && attempts == 3 && win._1 == 2940L, s"$win $attempts")
    assert(evidence == Seq((0L, 1), (1140L, 2)), evidence.toString)
    assert(rejected.map(_._1) == Seq(0L, 1140L), rejected.toString)
    // the r17 policy (2 attempts, no escalation past the first pause)
    // provably could not have escaped the same burst
    val (w17, a17, rej17, _) = run(2100L, 2)
    assert(w17._2 && a17 == 2 && rej17.size == 1, s"$w17 $a17")
    // a burst outlasting every attempt: the final window comes back
    // suspect WITH both prior rejections attached — the "host never
    // quieted" proof the archive embeds
    val (wAll, aAll, rejAll, _) = run(Long.MaxValue / 2, 3)
    assert(wAll._2 && aAll == 3 && rejAll.size == 2, s"$wAll $aAll")
  }

  test("temporalVersionBound: watermark-schedule replay on a synthetic " +
      "feed") {
    // delay 10us; cuts at 10/20/31; updates key 7 at us {5,15,25,28},
    // key 8 at {18}; events make every chunk non-empty.
    val ev = Array((1L, 7L, 5L), (2L, 7L, 15L), (3L, 7L, 25L), (4L, 7L, 30L))
    val upd = Array((7L, 5L, "a"), (7L, 15L, "b"), (7L, 25L, "c"),
      (7L, 28L, "d"), (8L, 18L, "e"))
    // trigger 1: no wm yet → futures = upd in (−∞,10) = 1
    // trigger 2: wm = min(5,5)−10 = −5 → key 7 has {5,15} = 2
    // trigger 3: wm = min(15,18)−10 = 5 → key 7 has {15,25,28} = 3
    // sentinel:  wm = min(30,28)−10 = 18 → key 7 has {25,28} = 2
    // bound = 1 + max(3, max(2, 1)) = 4
    assert(SparkEntry.temporalVersionBound(ev, upd, Seq(10L, 20L, 31L),
      delayUs = 10L) == 4L)
    // no updates at all: the sentinel-key floor keeps the bound ≥ 2
    assert(SparkEntry.temporalVersionBound(ev, Array.empty,
      Seq(10L, 20L, 31L), delayUs = 10L) == 2L)
    // a huge delay never prunes: every ingested update is a future
    assert(SparkEntry.temporalVersionBound(ev, upd, Seq(10L, 20L, 31L),
      delayUs = 1000000L) == 5L)
  }

  test("Bench canary: deterministic, code-independent fixed work") {
    // the canary's work must never change (its numbers form a cross-
    // round band): pin the checksum of the constant buffer + FNV loop.
    // If this assertion ever fails, the canary changed and BENCH bands
    // before/after are incomparable — bump deliberately, note in
    // COVERAGE.md.
    val h = graft.Bench.canaryOnce(passes = 3)
    assert(h == graft.Bench.canaryOnce(passes = 3))
    assert(graft.Bench.canaryOnce(passes = 1500) == -4665232685988848699L)
    // scaling sanity: more passes = different (more) work
    assert(graft.Bench.canaryOnce(passes = 2) != h)
    // the timed unit: 32 identical per-thread checksums folded by
    // commutative addition — deterministic regardless of thread order
    assert(graft.Bench.canaryWall(threads = 2) ==
      graft.Bench.canaryOnce() * 2)
  }

  test("Bench loadavg: parse, JSON form, and the pre-window quiet gate") {
    import graft.Bench.{loadavgJson, parseLoadavg, readLoadavg, waitForQuiet}
    // /proc/loadavg line shape: three averages then scheduler fields
    assert(parseLoadavg("0.52 1.10 2.75 2/1136 12345") ==
      Some((0.52, 1.10, 2.75)))
    assert(parseLoadavg("") == None)
    assert(parseLoadavg("a b c") == None)
    assert(loadavgJson(Some((0.5, 1.0, 2.0))) == "[0.50,1.00,2.00]")
    assert(loadavgJson(None) == "null")
    // this test host IS Linux: the artifact keys must be real numbers
    val live = readLoadavg()
    assert(live.exists(l => l._1 >= 0 && l._2 >= 0 && l._3 >= 0), live.toString)

    // quiet gate decision loop, with an injected clock (no sleeping):
    // load above the gate drains the budget then reports NOT quiet
    var slept = 0L
    val logs = scala.collection.mutable.Buffer.empty[String]
    assert(!waitForQuiet(threshold = 4.0, budgetSec = 60, pollSec = 15,
      read = () => Some(9.9), sleep = ms => slept += ms, log = logs.append(_)))
    assert(slept == 4 * 15000L, s"4 polls of 15s expected, slept $slept ms")
    assert(logs.size == 4 && logs.forall(_.contains("loadavg 9.90")))
    // a burst that ends mid-budget: gate opens as soon as load drops
    val seq = Iterator(Some(8.0), Some(5.0), Some(1.2))
    slept = 0L
    assert(waitForQuiet(4.0, 600, 15, () => seq.next(), ms => slept += ms,
      _ => ()))
    assert(slept == 2 * 15000L, s"gate must open on the 3rd read: $slept")
    // already quiet: zero sleeps; unreadable loadavg (None): fail open —
    // a non-Linux host must measure rather than spin forever
    assert(waitForQuiet(4.0, 600, 15, () => Some(0.3), _ => fail(), _ => ()))
    assert(waitForQuiet(4.0, 600, 15, () => None, _ => fail(), _ => ()))
  }
}
