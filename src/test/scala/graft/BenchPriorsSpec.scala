package graft

import java.nio.charset.{CharsetDecoder, CodingErrorAction, StandardCharsets}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Charset-hostility guard for the bench rerun-trigger priors.
  *
  * Round 17's driver bench crashed with MalformedInputException because the
  * priors header grew a U+2014 em-dash and Bench read the resource with the
  * JVM default charset (ASCII in the driver environment). Two defenses are
  * pinned here: the resource must stay pure ASCII, and the parse must survive
  * a deliberately hostile (strict-ASCII) decode of arbitrary bytes.
  */
class BenchPriorsSpec extends AnyFunSuite {

  private def priorsBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/bench_priors.txt")
    assert(in != null, "bench_priors.txt resource missing")
    try in.readAllBytes() finally in.close()
  }

  test("bench_priors.txt is pure ASCII (no byte >= 0x80)") {
    val bad = priorsBytes.zipWithIndex.filter { case (b, _) => (b & 0xff) >= 0x80 }
    assert(bad.isEmpty,
      s"non-ASCII bytes at offsets ${bad.take(5).map(_._2).mkString(",")} — " +
        "the driver JVM runs file.encoding=ANSI_X3.4-1968; keep this file ASCII")
  }

  test("priors parse under a strict ASCII decoder (driver-locale simulation)") {
    val dec: CharsetDecoder = StandardCharsets.US_ASCII.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    // Throws MalformedInputException if any byte is non-ASCII — exactly the
    // r17 failure mode. Pure-ASCII content makes this a no-op.
    val text = dec.decode(java.nio.ByteBuffer.wrap(priorsBytes)).toString
    val rows = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split("\\s+") match {
          case Array(n, v) => scala.util.Try(n -> v.toDouble).toOption
          case _ => None
        }
      }.toMap
    assert(rows.nonEmpty, "priors resource parsed to zero entries")
    assert(rows.values.forall(v => v > 0 && v < 3600), "prior medians out of sane range")
  }

  test("a malformed priors resource degrades to empty, never throws (Bench contract)") {
    // Mirror Bench.scala's guarded read over bytes that WOULD crash a
    // default-charset read on an ASCII JVM.
    val hostile = "# header with em-dash — here\nq1 1.5\n".getBytes(StandardCharsets.UTF_8)
    val parsed: Map[String, Double] = scala.util.Try {
      implicit val codec: scala.io.Codec = scala.io.Codec.UTF8
        .onMalformedInput(CodingErrorAction.REPLACE)
        .onUnmappableCharacter(CodingErrorAction.REPLACE)
      scala.io.Source.fromInputStream(new java.io.ByteArrayInputStream(hostile))
        .getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          l.split("\\s+") match {
            case Array(n, v) => scala.util.Try(n -> v.toDouble).toOption
            case _ => None
          }
        }.toMap
    }.recover { case _ => Map.empty[String, Double] }.get
    assert(parsed == Map("q1" -> 1.5))
  }
}
