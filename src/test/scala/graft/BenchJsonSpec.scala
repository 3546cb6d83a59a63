package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON-line contract: a crashed entry must be EXPLICIT in the
  * line — negative wall time plus an `errors` entry — never
  * indistinguishable from a fast success (the driver reads this line as
  * the round's official numbers).
  */
class BenchJsonSpec extends AnyFunSuite {
  test("a failing entry records negative time and an errors[] marker") {
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val ok = Bench.timedEntry("fine", errors) { Thread.sleep(5); 42 }
    assert(ok > 0)
    val bad = Bench.timedEntry("broken", errors) {
      throw new IllegalStateException("exploded \"mid\"-entry")
    }
    assert(bad < 0) // first marker: negated wall time
    assert(errors.size == 1 && errors.head.startsWith(
      "broken: IllegalStateException: exploded"))

    val results = scala.collection.mutable.LinkedHashMap(
      "fine" -> ok, "broken" -> bad)
    val line = Bench.jsonLine(results, errors, "/sf")
    // second marker: explicit errors array, with quotes escaped so the
    // line stays parseable JSON
    assert(line.contains("\"errors\":[\"broken: IllegalStateException: " +
      "exploded \\\"mid\\\"-entry\"]"))
    assert(line.contains("\"broken\":-"))
    // well-formed: the driver json-parses this line
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
  }

  test("a clean run emits an empty errors array") {
    val line = Bench.jsonLine(
      scala.collection.mutable.LinkedHashMap("a" -> 1.5), Nil, "/sf")
    assert(line.contains("\"errors\":[]"))
    assert(line.contains("\"a\":1.5"))
  }
}
