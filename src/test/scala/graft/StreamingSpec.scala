package graft

import graft.dict.{DictionaryEntry => DE}
import graft.streaming.AnnotationStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("windowed annotation counts with watermark over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val df = stream.toDF().toDF("ts", "text")
    val dict = Seq(DE("hash join", id = Some("hj")), DE("scan", id = Some("sc")))
    val counts = AnnotationStream.windowedMatchCounts(
      df, "text", "ts", dict, windowDuration = "1 hour", watermark = "10 minutes")
    val query = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      stream.addData(
        (ts(10, 5), "a hash join here"),
        (ts(10, 20), "hash join and scan"),
        (ts(11, 1), "scan only"))
      query.processAllAvailable()
      val rows = spark.table("win_counts")
        .select(date_format($"window.start", "HH").as("h"), $"dict_entry_id", $"n_matches")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(("10", "hj", 2L), ("10", "sc", 1L), ("11", "sc", 1L)))
    } finally query.stop()
  }

  test("match totals with HLL distinct-doc sketch (batch)") {
    val docs = Seq(
      (0L, "hash join hash join"),
      (1L, "hash join"),
      (2L, "nothing")).toDF("doc_id", "text")
    val out = AnnotationStream.matchTotals(docs, "text", "doc_id",
      Seq(DE("hash join", id = Some("hj")))).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L) // 3 matches
    assert(out.head.getLong(2) == 2L) // ~2 distinct docs
  }
}
