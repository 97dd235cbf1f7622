package graft

import graft.sources.Wet
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withFixture(test: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wet")
    try {
      val records = Seq(
        ("http://example.com/a", "2024-01-01T00:00:00Z", "alpha beta gamma"),
        // multibyte payload: Content-Length counts BYTES, not chars
        ("http://example.com/b", "2024-01-02T00:00:00Z", "café ☕ über"),
        ("http://example.com/c", "2024-01-03T00:00:00Z", ""))
      val bytes = Wet.toBytes(records)
      java.nio.file.Files.write(dir.resolve("part-0.warc.wet"), bytes)
      val gz = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.GZIPOutputStream(gz)
      z.write(Wet.toBytes(Seq(
        ("http://example.com/d", "2024-01-04T00:00:00Z", "delta epsilon"))))
      z.close()
      java.nio.file.Files.write(dir.resolve("part-1.warc.wet.gz"), gz.toByteArray)
      test(dir.toString)
    } finally {
      val s = java.nio.file.Files.list(dir)
      try s.forEach(p => java.nio.file.Files.delete(p)) finally s.close()
      java.nio.file.Files.delete(dir)
    }
  }

  test("wet source: records parse, warcinfo skipped, gz transparent") {
    withFixture { dir =>
      val df = Wet.read(spark, dir)
      assert(df.schema == Wet.schema)
      val rows = df.orderBy("url")
        .select("url", "record_type", "content_length", "record_idx", "text")
        .collect()
      assert(rows.length == 4) // 3 plain + 1 gz; 2 warcinfo skipped
      assert(rows.map(_.getString(0)).toSeq == Seq(
        "http://example.com/a", "http://example.com/b",
        "http://example.com/c", "http://example.com/d"))
      assert(rows.forall(_.getString(1) == "conversion"))
      // record_idx 0 is the warcinfo preamble in each file
      assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L, 1L))
      // byte-exact multibyte payload
      assert(rows(1).getString(4) == "café ☕ über")
      assert(rows(1).getLong(2) ==
        "café ☕ über".getBytes("UTF-8").length.toLong)
      // empty payload is a row, not a parse error
      assert(rows(2).getString(4) == "" && rows(2).getLong(2) == 0L)
    }
  }

  test("wet source: recordTypes option widens to warcinfo") {
    withFixture { dir =>
      val all = spark.read.format("wet")
        .option("recordTypes", "conversion,warcinfo").load(dir)
      assert(all.count() == 6)
      assert(all.filter(col("record_type") === "warcinfo").count() == 2)
    }
  }

  test("wet source: glob path selects matching files; miss is an error") {
    withFixture { dir =>
      // glob: only the plain (non-gz) file matches
      val globbed = Wet.read(spark, s"$dir/part-0.warc.wet")
      assert(globbed.count() == 3)
      val star = Wet.read(spark, s"$dir/part-*.warc.wet*")
      assert(star.count() == 4)
      // a glob matching nothing is an empty scan, a missing literal path errors
      assert(Wet.read(spark, s"$dir/nope-*.wet").count() == 0)
      intercept[java.io.FileNotFoundException] {
        Wet.read(spark, s"$dir/definitely-missing.wet").count()
      }
    }
  }

  test("wet source: one partition per file (cluster parallelism unit)") {
    withFixture { dir =>
      val df = Wet.read(spark, dir)
      assert(df.rdd.getNumPartitions == 2) // 2 files -> 2 partitions
    }
  }

  test("wet source: truncated record — failfast throws, permissive keeps the prefix") {
    withFixture { dir =>
      // append a file whose last record lies about Content-Length
      val good = Wet.toBytes(Seq(
        ("http://example.com/x", "2024-01-05T00:00:00Z", "intact record")))
      val bad = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
        "WARC-Target-URI: http://example.com/y\r\n" +
        "Content-Length: 99999\r\n\r\nonly a few bytes").getBytes("ISO-8859-1")
      val path = java.nio.file.Paths.get(dir, "part-2.warc.wet")
      java.nio.file.Files.write(path, good ++ bad)
      try {
        val e = intercept[org.apache.spark.SparkException] {
          Wet.read(spark, path.toString).count()
        }
        assert(e.getMessage.contains("truncated") ||
          Option(e.getCause).exists(_.getMessage.contains("truncated")))
        val kept = spark.read.format("wet").option("mode", "permissive")
          .load(path.toString)
        assert(kept.select("url").as[String](spark.implicits.newStringEncoder)
          .collect().toSeq == Seq("http://example.com/x"))
        // permissive leaves the other, intact files untouched
        assert(spark.read.format("wet").option("mode", "permissive")
          .load(dir).count() == 5)
      } finally java.nio.file.Files.delete(path)
    }
  }

  test("wet source: column pruning reaches the reader") {
    withFixture { dir =>
      val urls = Wet.read(spark, dir).select("url")
      // pruned schema flows through the v2 scan
      assert(urls.queryExecution.executedPlan.toString.contains("url"))
      assert(!urls.queryExecution.optimizedPlan.schema.fieldNames.contains("text"))
      assert(urls.distinct().count() == 4)
      // pipeline smoke: wet -> quality stats, no raw-text columns needed
      val toks = graft.ops.TextStats.tokenCounts(
        Wet.read(spark, dir), "text", "url")
      assert(toks.filter(col("url") === "http://example.com/a")
        .head().getAs[Int]("ws_tokens") == 3)
    }
  }

  test("wet streaming: new files become micro-batches, each record exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_wet_ckpt")
    def drop(name: String, recs: Seq[(String, String, String)]): Unit =
      java.nio.file.Files.write(dir.resolve(name), Wet.toBytes(recs))
    try {
      drop("crawl-000.warc.wet", Seq(
        ("http://s.com/a", "2024-01-01T00:00:00Z", "alpha"),
        ("http://s.com/b", "2024-01-01T00:00:00Z", "beta")))
      val stream = spark.readStream.format("wet").load(dir.toString)
      assert(stream.isStreaming)
      val query = stream.select("url", "text")
        .writeStream.format("memory").queryName("wet_stream")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try {
        query.processAllAvailable()
        assert(spark.table("wet_stream").count() == 2)
        // a new file with a LATER name lands: picked up, earlier files not replayed
        drop("crawl-001.warc.wet", Seq(
          ("http://s.com/c", "2024-01-02T00:00:00Z", "gamma delta")))
        query.processAllAvailable()
        val rows = spark.table("wet_stream").orderBy("url")
          .collect().map(r => (r.getString(0), r.getString(1)))
        assert(rows.toSeq == Seq(
          ("http://s.com/a", "alpha"), ("http://s.com/b", "beta"),
          ("http://s.com/c", "gamma delta")))
      } finally query.stop()
    } finally {
      Seq(dir, ckpt).foreach { d =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("warc source: response records parse HTTP envelope; body is bytes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    try {
      val html = "<html><body>Hello &amp; welcome</body></html>".getBytes("UTF-8")
      val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1, 2, 3)
      val bytes = graft.sources.Warc.toBytes(Seq(
        ("http://example.com/page", "2024-01-01T00:00:00Z", 200, "text/html; charset=utf-8", html),
        ("http://example.com/img", "2024-01-02T00:00:00Z", 404, "image/png", png)))
      java.nio.file.Files.write(dir.resolve("crawl-0.warc"), bytes)
      val df = graft.sources.Warc.read(spark, dir.toString)
      assert(df.schema == graft.sources.Warc.schema)
      val rows = df.orderBy("url")
        .select("url", "record_type", "http_status", "http_content_type", "body")
        .collect()
      assert(rows.length == 2) // warcinfo skipped, responses surfaced
      assert(rows.forall(_.getString(1) == "response"))
      val img = rows(0)
      assert(img.getInt(2) == 404 && img.getString(3) == "image/png")
      assert(img.getAs[Array[Byte]](4).toSeq == png.toSeq)
      val page = rows(1)
      // charset parameter stripped from the media type
      assert(page.getInt(2) == 200 && page.getString(3) == "text/html")
      assert(new String(page.getAs[Array[Byte]](4), "UTF-8") ==
        "<html><body>Hello &amp; welcome</body></html>")
      // decode + stripHtml composes downstream
      val visible = df.select(graft.ops.TextClean.stripHtml(
          decode(col("body"), "UTF-8")).as("t"))
        .filter(col("http_content_type") === "text/html")
        .head().getString(0)
      assert(visible == "Hello & welcome")
    } finally {
      val s = java.nio.file.Files.list(dir)
      try s.forEach(p => java.nio.file.Files.delete(p)) finally s.close()
      java.nio.file.Files.delete(dir)
    }
  }

  test("warc http parse: non-HTTP payload falls through, LF-only headers accepted") {
    import graft.sources.Warc
    val dns = "bind9 response bytes".getBytes("UTF-8")
    assert(Warc.parseHttp(dns)._1 == null)
    assert(Warc.parseHttp(dns)._3.toSeq == dns.toSeq)
    val lfOnly = "HTTP/1.0 301 Moved\nContent-Type: TEXT/PLAIN\n\nbody!".getBytes("ISO-8859-1")
    val (st, ct, body) = Warc.parseHttp(lfOnly)
    assert(st == 301 && ct == "text/plain")
    assert(new String(body, "ISO-8859-1") == "body!")
    // header-only message: empty body, not an error
    val headOnly = "HTTP/1.1 204 No Content\r\nServer: x\r\n\r\n".getBytes("ISO-8859-1")
    val h = Warc.parseHttp(headOnly)
    assert(h._1 == 204 && h._3.isEmpty)
  }
}
