package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.BinaryIngest

class BinaryIngestSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("ingest")
    def put(name: String, content: String): Unit =
      java.nio.file.Files.write(d.resolve(name), content.getBytes("UTF-8"))
    put("plain.txt", "hello plain world")
    put("report.pdf", "page one\ftwo\fthree")
    put("table.docx", "para one\ncell a\tcell b\npara two")
    put("scan.png", "fakeimagebytes")
    put("empty.txt", "   ") // whitespace-only (binaryFile skips 0-byte files)
    put("weird name!@#.txt", "sanitized")
    d.toString
  }

  private lazy val out = BinaryIngest.ingest(spark,
    BinaryIngest.readBinary(spark, dir)).collect()
    .map(r => r.getString(0).split("/").last -> r).toMap

  test("format dispatch routes by lowercased extension (S2)") {
    assert(out("plain.txt").getString(2) == "text")
    assert(out("report.pdf").getString(2) == "pdf")
    assert(out("table.docx").getString(2) == "docx")
    assert(out("scan.png").getString(2) == "image")
  }

  test("plain text decodes inline (S6)") {
    assert(out("plain.txt").getString(4) == "hello plain world")
  }

  test("pdf stub joins pages with newline (S3 page-concat semantics)") {
    assert(out("report.pdf").getString(4) == "page one\ntwo\nthree")
  }

  test("docx stub flattens table rows with ' | ' (S4)") {
    assert(out("table.docx").getString(4) == "para one\ncell a | cell b\npara two")
  }

  test("image routes to OCR parser (S5)") {
    assert(out("scan.png").getString(4) == "[ocr] fakeimagebytes")
  }

  test("empty parse -> per-row error, batch survives (P5)") {
    assert(out("empty.txt").getString(5) == "Parsing produced empty text")
    assert(out("plain.txt").getString(5) == null)
  }

  test("filename sanitize strips charset (P6)") {
    assert(out.keys.exists(_.contains("weird")))
    val r = out.find(_._1.contains("weird")).get._2
    assert(r.getString(1) == "weird name.txt")
  }
}
