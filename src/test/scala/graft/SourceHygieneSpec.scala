package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards against accidental source corruption (the advisor finding: a
  * literal NUL inside a string literal makes git treat the whole .scala
  * file as binary, silently bypassing textual diff/review). Fixture
  * bytes below 0x20 belong in \\uXXXX escapes, not raw in the source. */
class SourceHygieneSpec extends AnyFunSuite {

  test("no .scala source contains non-printable bytes (except \\t \\n \\r)") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val bytes = java.nio.file.Files.readAllBytes(p)
        val bad = bytes.indices.filter { i =>
          val b = bytes(i) & 0xff
          b < 9 || (b > 13 && b < 32)
        }
        if (bad.isEmpty) None
        else Some(s"$p: byte ${bytes(bad.head) & 0xff} at offset ${bad.head}")
      }
      .toList
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
