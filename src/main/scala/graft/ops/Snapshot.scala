package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-snapshot management operators: diff two corpus versions and
  * measure cross-corpus contamination overlap — the bookkeeping a
  * periodically-recrawled 100 TB corpus needs between ingests.
  */
object Snapshot {

  /** Diff two corpus snapshots by content hash: one row per doc id that
    * appears in either snapshot, `status` ∈ added / removed / changed /
    * unchanged. The full outer join moves only (id, md5) projections —
    * text never shuffles, so diffing 100 TB costs two narrow scans +
    * one id-keyed join. Precondition: `idCol` is unique within each
    * snapshot (the usual corpus invariant — run [[Dedup.exact]] first
    * if ids can repeat; duplicate ids would multiply through the join).
    */
  def corpusDiff(before: DataFrame, after: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val b = before.select(col(idCol).as("id"), md5(col(textCol)).as("__hb"))
    val a = after.select(col(idCol).as("id"), md5(col(textCol)).as("__ha"))
    b.join(a, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__hb").isNull, lit("added"))
          .when(col("__ha").isNull, lit("removed"))
          .when(col("__hb") === col("__ha"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Corpus-level contamination overlap: the fraction of `bench`'s
    * distinct `window`-token rolling-hash windows that also occur in
    * `corpus` — "how much of this benchmark is inside the training
    * corpus", the aggregate companion to the per-doc
    * [[Decontaminate]] filters. Output: one row
    * `(n_corpus_windows, n_bench_windows, n_shared, overlap_frac)`
    * with `overlap_frac` = shared / bench distinct windows, round-6
    * (0 when the bench has no windows).
    *
    * Scale shape: both sides reduce to distinct 8-byte window hashes
    * before the intersection join — text is scanned once per side and
    * never shuffles. "Same hash" is "same token window" up to 64-bit
    * collisions, the q_fp_card-certified contract.
    */
  def overlapReport(corpus: DataFrame, bench: DataFrame, textCol: String,
      window: Int = 5): DataFrame = {
    def winHashes(df: DataFrame) = df.select(
        explode(TextStats.fingerprintWindows(col(textCol), window)).as("__h"))
      .distinct()
    val c = winHashes(corpus)
    val b = winHashes(bench)
    val shared = b.join(c, Seq("__h"), "left_semi")
      .agg(count(lit(1)).as("n_shared"))
    val nc = c.agg(count(lit(1)).as("n_corpus_windows"))
    val nb = b.agg(count(lit(1)).as("n_bench_windows"))
    nc.crossJoin(nb).crossJoin(shared)
      .select(col("n_corpus_windows"), col("n_bench_windows"), col("n_shared"),
        when(col("n_bench_windows") === 0, lit(0.0))
          .otherwise(round(col("n_shared").cast("double") / col("n_bench_windows"), 6))
          .as("overlap_frac"))
  }

  /** Subject-erasure propagation (GDPR/CCPA delete): given a table of
    * subject keys to erase, anti-join every dependent table on its key
    * column and report, per table, how many rows were removed and kept
    * — the audit trail a compliance workflow must produce alongside
    * the rewritten data. Returns (audit, cleaned tables in input
    * order). The erase-key set stays a semi/anti-join side (broadcast
    * or shuffled as AQE sizes it); dependent-table payloads never
    * shuffle for the audit (counts aggregate scan-side).
    */
  def eraseSubjects(subjects: DataFrame, subjectKey: String,
      tables: Seq[(String, DataFrame, String)])
      : (DataFrame, Seq[(String, DataFrame)]) = {
    require(tables.nonEmpty, "eraseSubjects: no tables")
    val keys = subjects.select(col(subjectKey).as("__k")).distinct()
    val cleaned = tables.map { case (name, df, keyCol) =>
      name -> df.join(keys, df(keyCol) === keys("__k"), "left_anti")
    }
    // audit: one aggregation per table, unioned (tiny)
    val audit = tables.map { case (name, df, keyCol) =>
      df.join(keys, df(keyCol) === keys("__k"), "left_semi")
        .agg(count(lit(1)).as("n_removed"))
        .select(lit(name).as("table_name"), col("n_removed"))
        .crossJoin(df.agg(count(lit(1)).as("n_total")))
        .select(col("table_name"), col("n_removed"),
          (col("n_total") - col("n_removed")).as("n_kept"))
    }.reduce(_ union _)
    (audit, cleaned)
  }

  /** MERGE-INTO emulation: apply a change batch (op ∈ insert / update /
    * delete, keyed by `idCol`) to a base snapshot — the warehouse
    * upsert a periodically-recrawled corpus runs per ingest. Semantics:
    * a changed id REPLACES the base row (update == delete + insert, so
    * an "insert" for an existing id is also a replace — idempotent
    * replays converge); `delete` removes; untouched base rows pass
    * through unchanged. Precondition: ids unique per input (the corpus
    * invariant).
    *
    * Scale shape: one left-anti join on id projections (the only
    * shuffle; text rides only on rows that actually survive) + a
    * union with the non-delete change payloads. The base is never
    * rewritten in place — output is the next snapshot, which is what
    * makes [[corpusDiff]]/time-travel possible downstream.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, idCol: String,
      opCol: String): DataFrame = {
    // op validation INSIDE the plan (scan-local, no extra pass): a null
    // or misspelled op ("Delete", "upsert") used to slip through
    // `=!= "delete"` as null/false — the base row was already
    // anti-joined away, so the id silently VANISHED from the snapshot.
    // assert_true returns null (so `.isNull` keeps every row) and
    // throws a named error on the first bad op; consumed inside the
    // filter it cannot be pruned away.
    val opOk = assert_true(col(opCol).isin("insert", "update", "delete"),
      concat(lit("applyChanges: unknown op '"),
        coalesce(col(opCol), lit("NULL")),
        lit(s"' (expected insert/update/delete) for $idCol="),
        coalesce(col(idCol).cast("string"), lit("NULL"))))
    val survivors = base.join(
      changes.select(col(idCol)), Seq(idCol), "left_anti")
    survivors.unionByName(
      changes.filter(opOk.isNull && col(opCol) =!= "delete").drop(opCol))
  }

  /** Order-independent per-group content checksum: count + the exact
    * BIGINT sum of 32-bit md5 prefixes — equal iff the grouped content
    * MULTISETS are equal (up to the 32-bit collision bound), no matter
    * how either side was partitioned or ordered. The cheap
    * anti-entropy primitive for validating a 100 TB copy/migration:
    * one scan-local projection + one tiny aggregation per side, compare
    * |groups| rows. (A sum of 2^32-bounded terms needs ~2^31 rows per
    * group to overflow int64 — far past any per-group corpus here; at
    * that scale switch the prefix to 6 hex chars.)
    */
  def contentChecksum(df: DataFrame, textCol: String,
      groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(conv(substring(md5(col(textCol)), 1, 8), 16, 10).cast("long"))
          .as("checksum"))

  /** Additive-aggregate state for one key: every field merges by a
    * commutative monoid (count/sum add, min/max lattice), which is what
    * makes the incremental path EXACT, not approximate.
    */
  private val aggStateCols = Seq("n_rows", "sum6", "min_v", "max_v")

  /** Build the per-key additive-aggregate state table:
    * (key, n_rows, sum6, min_v, max_v) with the sum at 1e-6 integer
    * grain (exact, partition-order-proof). This is the materialized
    * state an incrementally-maintained rollup keeps per key.
    */
  def additiveAggState(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"),
        sum(floor(v * 1e6).cast("long")).as("sum6"),
        min(v).as("min_v"), max(v).as("max_v"))
  }

  /** Incremental view maintenance: merge a base state table with the
    * state of a new delta batch — count/sum add, min/max lattice-join —
    * so refreshing a 100 TB rollup costs one aggregation OVER THE DELTA
    * plus a key-keyed merge join of two state tables, never a rescan of
    * the base. `merge(state(base), state(delta)) == state(base ∪ delta)`
    * EXACTLY (all fields are monoid folds; the q_agg_merge oracle pins
    * the equality relationally). Both inputs must be
    * [[additiveAggState]]-shaped.
    */
  def mergeAggStates(base: DataFrame, delta: DataFrame): DataFrame = {
    require(aggStateCols.forall(base.columns.contains) &&
      aggStateCols.forall(delta.columns.contains),
      s"mergeAggStates: inputs must have ${aggStateCols.mkString(", ")}")
    val b = aggStateCols.foldLeft(base) { (df, c) =>
      df.withColumnRenamed(c, s"b_$c")
    }
    val d = aggStateCols.foldLeft(delta) { (df, c) =>
      df.withColumnRenamed(c, s"d_$c")
    }
    b.join(d, Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("b_n_rows"), lit(0L)) +
          coalesce(col("d_n_rows"), lit(0L))).as("n_rows"),
        (coalesce(col("b_sum6"), lit(0L)) +
          coalesce(col("d_sum6"), lit(0L))).as("sum6"),
        least(col("b_min_v"), col("d_min_v")).as("min_v"),
        greatest(col("b_max_v"), col("d_max_v")).as("max_v"))
  }
}
