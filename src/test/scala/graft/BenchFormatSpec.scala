package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench-record protocol: the driver captures only the
  * trailing ~2000 chars of Bench's stdout, so the LAST printed line
  * must be a complete JSON record carrying the verdict. This rotted
  * silently for six rounds (the full line ended with the noise map and
  * the captured tail held zero timings); these tests make any future
  * format change that breaks the tail a CI failure, not a
  * round-later surprise. */
class BenchFormatSpec extends AnyFunSuite {

  // realistic name lengths/values: 107 registered queries + 11 warm
  private val fake: Seq[(String, Double)] =
    (1 to 107).map(i => f"some_registered_query_name_$i%03d" -> (i * 0.037)) ++
      (1 to 11).map(i => s"warm:shared_artifact_build_$i" -> (i * 1.3))

  test("compactLine always fits the driver's tail capture") {
    val line = Bench.compactLine(107.2, fake, 0, Nil, "/root/testdata/sf0.1")
    assert(line.length <= 1600, s"len=${line.length}")
    // a 50k-char full line before it must not push it out of the tail
    val tail = (("x" * 50000) + "\n" + line).takeRight(2000)
    assert(tail.contains("\"metric\":\"total\""))
    assert(tail.contains("\"value\":"))
    assert(tail.contains("\"queries\":{"))
    assert(tail.contains("\"sf\":"))
  }

  test("n_queries counts registered queries only; warm entries go to n_warm") {
    val line = Bench.compactLine(107.2, fake, 0, Nil, "sf", nWarm = 11)
    assert(line.contains("\"n_queries\":107"), line)
    assert(line.contains("\"n_warm\":11"), line)
  }

  test("compactLine is valid JSON with slowest-first queries and an omitted count") {
    val line = Bench.compactLine(107.2, fake, 2,
      Seq("slow_one", "slow_two"), "/root/testdata/sf0.1")
    // structural JSON validity: balanced braces/brackets, no trailing comma
    assert(line.head == '{' && line.last == '}')
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.count(_ == '[') == line.count(_ == ']'))
    assert(!line.contains(",}") && !line.contains(",]"))
    assert(line.contains("\"value\":107.200"))
    assert(line.contains("\"n_errors\":2"))
    assert(line.contains("\"flagged\":[\"slow_one\",\"slow_two\"]"))
    // slowest entry must be the first in the map (truncation keeps the
    // entries that matter)
    val qStart = line.indexOf("\"queries\":{") + "\"queries\":{".length
    // keys can contain ':' (warm entries) — parse by quote boundaries
    val firstKey = line.substring(qStart + 1, line.indexOf('"', qStart + 1))
    val slowest = fake.maxBy(_._2)._1
    assert(firstKey == slowest, s"first=$firstKey")
    // kept + omitted must account for every entry
    val om = "\"omitted\":(\\d+)".r.findFirstMatchIn(line).map(_.group(1).toInt)
    val kept = line.substring(qStart, line.lastIndexOf("},\"omitted\""))
      .split(",").count(_.nonEmpty)
    assert(om.isDefined && kept + om.get == fake.size,
      s"kept=$kept omitted=$om total=${fake.size}")
  }

  test("compactLine renders dot decimals under a comma-decimal JVM locale") {
    // the f-interpolator formats with the DEFAULT locale — under de_DE
    // it would render {"value":107,200}, invalid JSON, resurrecting
    // the unparseable-tail failure on any comma-decimal bench host.
    // NOTE: mutates the JVM-global default Locale — safe only because
    // forked test suites run sequentially (Test/fork := true,
    // testForkedParallel left false); revisit if parallel forked tests
    // are ever enabled.
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.compactLine(107.2, Seq("a" -> 1.5), 0, Nil, "sf")
      assert(line.contains("\"value\":107.200"), line)
      assert(line.contains("\"a\":1.500"), line)
      assert(!line.contains("107,200"), line)
    } finally java.util.Locale.setDefault(prev)
  }

  test("compactLine escapes quotes and backslashes in names and sf path") {
    val line = Bench.compactLine(1.0, Seq("we\"ird" -> 1.0), 0,
      Seq("fla\\gged"), """/data/my"dir""")
    assert(line.contains("\"we\\\"ird\":1.000"), line)
    assert(line.contains("\"fla\\\\gged\""), line)
    assert(line.contains("\"sf\":\"/data/my\\\"dir\""), line)
    assert(line.count(_ == '{') == line.count(_ == '}'))
  }

  test("compactLine with few queries keeps them all and omits none") {
    val small = Seq("a" -> 1.0, "b" -> 2.0, "c" -> 0.5)
    val line = Bench.compactLine(3.5, small, 0, Nil, "sf0.01")
    assert(line.contains("\"b\":2.000"))
    assert(line.contains("\"a\":1.000"))
    assert(line.contains("\"c\":0.500"))
    assert(line.contains("\"omitted\":0"))
  }

  // ---- r9 positional tail (omitted always 0) -------------------------

  private val regNames = (1 to 130).map(i => f"some_registered_query_name_$i%03d")
  private val okRuns: Seq[(String, Double)] =
    regNames.filterNot(_.endsWith("007")).map(n => n -> 0.37) // 007 "errored"
  private val warmRuns: Seq[(String, Double)] =
    (1 to 16).map(i => s"shared_artifact_build_$i" -> (i * 1.3))

  test("compactLineFull fits the tail at full current scale with omitted 0") {
    val line = Bench.compactLineFull(142.6, okRuns, regNames, warmRuns,
      1, Seq("slow_one"), "/root/testdata/sf0.1")
    assert(line.length <= 1900, s"len=${line.length}")
    val tail = (("x" * 50000) + "\n" + line).takeRight(2000)
    assert(tail.startsWith("\n" + line.take(10)) || tail.contains("\"metric\":\"total\""))
    assert(line.contains("\"omitted\":0"))
    assert(line.contains("\"n_queries\":130"))
    assert(line.contains("\"n_warm\":16"))
  }

  test("compactLineFull qt is positional over NAME-SORTED registry, -1 for errors") {
    val line = Bench.compactLineFull(10.0, okRuns, regNames.reverse, warmRuns,
      1, Nil, "sf")
    val qt = line.substring(line.indexOf("\"qt\":[") + 6, line.indexOf("],\"queries\""))
      .split(",")
    assert(qt.length == regNames.size)
    // registry order passed reversed, but qt must follow sorted order:
    // index of the errored 007 in sorted names carries -1.00
    val idx = regNames.sorted.indexOf("some_registered_query_name_007")
    assert(qt(idx) == "-1.00", qt(idx))
    assert(qt.count(_ == "-1.00") == 1)
    assert(qt.filterNot(_ == "-1.00").forall(_ == "0.37"))
  }

  test("compactLineFull is balanced JSON with named warm map and slowest-first queries") {
    val line = Bench.compactLineFull(10.0, okRuns, regNames, warmRuns, 0, Nil, "sf")
    assert(line.head == '{' && line.last == '}')
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.count(_ == '[') == line.count(_ == ']'))
    assert(!line.contains(",}") && !line.contains(",]"))
    assert(line.contains("\"warm\":{\"shared_artifact_build_1\":1.30"))
    val qStart = line.indexOf("\"queries\":{") + "\"queries\":{".length
    val firstKey = line.substring(qStart + 1, line.indexOf('"', qStart + 1))
    assert(firstKey == "warm:shared_artifact_build_16", firstKey)
  }
}
