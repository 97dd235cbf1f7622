package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing offsets — the bookkeeping of the "concatenate the
  * corpus, then slice fixed-length training sequences" step every
  * autoregressive pretraining run performs: with documents concatenated
  * in ascending id order, each document owns the global token range
  * `[start_token, start_token + n_tokens)` and therefore lands in
  * training sequences `seq_first .. seq_last` (length `seqTokens`
  * each). Downstream, a writer groups by sequence id to emit packed
  * rows; the offsets here are the exact, engine-portable contract.
  *
  * Scale shape: a global prefix sum without a global window. Token
  * counts range-partition by id (tiny (id, n) rows), per-partition
  * subtotals collect to the driver (one row per partition), and each
  * row's global start = its partition's base offset + a WITHIN-partition
  * running sum — so no single-partition window ever materializes the
  * corpus. The range boundaries Spark samples are nondeterministic, but
  * the OUTPUT is partitioning-independent: base-offset + local-prefix
  * telescopes to "sum of n over all ids < id" whatever the boundaries
  * (OpsSpec pins this by re-running under a different partitioning).
  * The ranged frame is persisted so the subtotal job and the prefix job
  * see the SAME sampled boundaries — required for correctness, not just
  * speed.
  *
  * Zero-token documents own no tokens and are dropped (documented;
  * filter them earlier if they should error instead).
  *
  * Output: (idCol, n_tokens, start_token, seq_first, seq_last).
  */
object Packing {

  def packingOffsets(df: DataFrame, textCol: String, idCol: String,
      seqTokens: Int): DataFrame = {
    require(seqTokens >= 1, s"seqTokens must be >= 1: $seqTokens")
    val spark = df.sparkSession
    val counts = df.select(col(idCol).as("id"),
        TextStats.wsTokens(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    // CORRECTNESS pin, not a perf cache (do NOT auto-release): the
    // collected per-partition bases below describe THIS materialization
    // — a recompute may re-sample different range boundaries (Spark's
    // RangePartitioner sketch seeds on the physical RDD id), and ranks
    // against stale bases would duplicate/skip sequence ids. Freed by
    // the caller's cache hygiene once the result is fully consumed.
    val ranged = counts.repartitionByRange(col("id"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subtotals = ranged.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__t"), min(col("id")).as("__min_id"))
      .collect()
      .sortBy(_.getAs[Long]("__min_id"))
    val bases = subtotals.scanLeft(0L)(_ + _.getAs[Long]("__t"))
    val baseRows = subtotals.zip(bases).map { case (r, base) =>
      (r.getInt(0), base) }.toSeq
    import spark.implicits._
    val baseDf = broadcast(baseRows.toDF("__pid", "__base"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(baseDf, "__pid")
      .withColumn("start_token",
        col("__base") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("id").as(idCol), col("n_tokens"),
        col("start_token"),
        // integer DIV, not double division: exact past 2^53 tokens
        expr(s"start_token DIV $seqTokens").as("seq_first"),
        expr(s"(start_token + n_tokens - 1) DIV $seqTokens").as("seq_last"))
  }

  /** The WRITER half of sequence packing: materialize the packed
    * training sequences themselves — concatenate the corpus in id
    * order, slice `seqTokens`-token rows. Output: `(seq_id, n_tokens,
    * seq_text)`, every sequence exactly `seqTokens` tokens except the
    * final partial one.
    *
    * Scale shape: [[packingOffsets]] plans the cut points on (id, n)
    * rows; each doc then explodes into its per-sequence FRAGMENTS
    * (token sub-ranges — a doc touches `seq_last − seq_first + 1`
    * sequences, so output volume is corpus + one boundary fragment per
    * sequence), and fragments group by `seq_id` to reassemble. Text
    * crosses the wire exactly once — unavoidable, the output IS
    * reassembled text — with map-side size bounded by the sequence
    * length, and the reassembly sort (`array_sort` over
    * (global-start, fragment) structs) is per-sequence local. Every
    * number and byte replays relationally (the q_pack_write oracle).
    */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
      seqTokens: Int, sepToken: String = null): DataFrame = {
    // document separator (EOS): appending it to each non-blank doc's
    // text BEFORE planning makes the separator an ordinary token — the
    // offsets, fragments, and oracle replay all see the same stream
    val src = if (sepToken == null) df else {
      require(sepToken.nonEmpty && !sepToken.exists(_.isWhitespace),
        s"packSequences: sepToken must be a single non-blank token: '$sepToken'")
      df.withColumn(textCol,
        when(length(trim(col(textCol))) > 0,
          concat(trim(col(textCol)), lit(" " + sepToken)))
          .otherwise(col(textCol)))
    }
    val offs = packingOffsets(src, textCol, idCol, seqTokens)
    val toks = src.select(col(idCol).as("__id"),
      split(trim(col(textCol)), "\\s+").as("__tk"))
    offs.join(toks, offs(idCol) === toks("__id"))
      .select(col("start_token"), col("n_tokens"), col("__tk"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
      .select(col("seq_id"),
        greatest(lit(0L), col("seq_id") * seqTokens - col("start_token"))
          .as("__fs"),
        least(col("n_tokens"), (col("seq_id") + 1) * seqTokens - col("start_token"))
          .as("__fe"),
        col("start_token"), col("__tk"))
      .select(col("seq_id"),
        (col("start_token") + col("__fs")).as("__gstart"),
        slice(col("__tk"), (col("__fs") + 1).cast("int"),
          (col("__fe") - col("__fs")).cast("int")).as("__frag"))
      .groupBy(col("seq_id"))
      .agg(sum(size(col("__frag"))).cast("long").as("n_tokens"),
        concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col("__gstart"), col("__frag")))),
          s => s.getField("__frag")))).as("seq_text"))
  }

  /** Packing decision-support: for each candidate sequence length,
    * what the corpus costs under (a) PAD-PER-DOC — every doc split to
    * ⌈t/L⌉ sequences, last one padded (the naive loader) — vs
    * (b) PACKED — documents concatenated, one global ⌈Σt/L⌉ (what
    * [[packSequences]] materializes). `*_waste_frac` is the padding
    * fraction each regime burns; the gap IS the packing argument, and
    * it shifts with L, which is why this is a per-length report and
    * not a constant. One aggregation computes every length's exact
    * integer chunk counts in one corpus scan (blank docs excluded);
    * the per-length rows explode from the single aggregate row.
    */
  def packingPlan(df: DataFrame, textCol: String,
      seqLens: Seq[Int]): DataFrame = {
    require(seqLens.nonEmpty && seqLens.forall(_ >= 1),
      s"packingPlan: bad lengths $seqLens")
    val base = df
      .select(graft.ops.TextStats.wsTokens(col(textCol)).cast("long").as("t"))
      .filter(col("t") > 0)
    val aggs = Seq(count(lit(1)).as("n_docs"), sum(col("t")).as("total")) ++
      seqLens.map(l =>
        sum(floor((col("t") + lit(l - 1)) / lit(l)).cast("long"))
          .as(s"__chunks_$l"))
    val one = base.agg(aggs.head, aggs.tail: _*)
    val rows = seqLens.map { l =>
      val padded = col(s"__chunks_$l") * l
      val packed = floor((col("total") + lit(l - 1)) / lit(l)).cast("long") * l
      struct(lit(l).cast("long").as("seq_len"), col("n_docs").as("n_docs"),
        col("total").as("total_tokens"),
        padded.as("padded_slots"),
        round(lit(1.0) - col("total") / padded, 6).as("padded_waste_frac"),
        packed.as("packed_slots"),
        round(lit(1.0) - col("total") / packed, 6).as("packed_waste_frac"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
