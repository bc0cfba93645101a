package graft

import graft.ingest.{Rdf, Turtle}
import graft.model.TableLoader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property-style roundtrips: ARBITRARY literal content through the
  * REAL formatters and back through the REAL parsers. The generators
  * concentrate on escaping hazards (quotes, backslashes, control
  * chars, full unicode) — the classic way formatter and parser drift
  * apart is each handling a slightly different escape set. */
class RoundtripSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSuite.session

  /** Generated corpus: printable ascii, full unicode, and adversarial
    * escape-heavy strings. Restricted to UTF-8-representable content
    * (Spark's UTF8String replaces unpaired surrogates, which would
    * fail the roundtrip for reasons unrelated to escaping). */
  private lazy val strings: Seq[String] = {
    val gen = Gen.listOfN(400, Gen.frequency(
      4 -> Gen.asciiPrintableStr,
      3 -> Arbitrary.arbitrary[String],
      2 -> Gen.oneOf("\"", "\\", "\\\\", "a\"b\\c", "line1\nline2",
        "\r\n\t", "ends with backslash\\", "\"quoted\"",
        "\\n literal-backslash-n", "tab\there", "é中文")))
    gen.sample.get
      .filter(_.nonEmpty)
      .filter(s => new String(s.getBytes("UTF-8"), "UTF-8") == s)
      .distinct
  }

  /** Infoton frame with one doc per generated string, value in a
    * string field — the store shape the formatters consume. */
  private def frame: DataFrame = {
    import spark.implicits._
    strings.zipWithIndex.map { case (s, i) => (s"/rt/$i", s) }
      .toDF("path", "value")
      .select(
        struct(col("path"), lit("/rt").as("parent"),
          lit(null).cast("timestamp").as("lastModified"),
          lit("t").as("lastModifiedBy"),
          lit(null).cast("string").as("uuid"),
          lit("local").as("dc"), lit(1L).as("indexTime"),
          lit(true).as("current"), lit("ObjectInfoton").as("kind"),
          lit("cmwell").as("protocol")).as("system"),
        map(lit("v"), array(TableLoader.sVal(col("value")))).as("fields"))
  }

  test("ntriples formatter → line parser roundtrips arbitrary literals") {
    import spark.implicits._
    val byPath = frame.select(col("system.path"),
        element_at(col("fields")("v"), 1).getField("s"))
      .as[(String, String)].collect().toMap
    val lines = graft.ops.Formatters.ntriples(frame)
      .as[String].collect()
    assert(lines.length == strings.size)
    lines.foreach { line =>
      val st = Rdf.parseLine(line).getOrElse(
        fail(s"formatter emitted an unparseable line: $line"))
      val path = Rdf.iriToPath(st.subj)
      assert(st.lit.contains(byPath(path)),
        s"literal mismatch for $path: got ${st.lit}")
    }
  }

  test("ttl formatter → Turtle parser roundtrips arbitrary literals") {
    import spark.implicits._
    val byPath = frame.select(col("system.path"),
        element_at(col("fields")("v"), 1).getField("s"))
      .as[(String, String)].collect().toMap
    val docs = graft.ops.Formatters.ttl(frame).as[String].collect()
    assert(docs.length == strings.size)
    docs.foreach { doc =>
      val sts = Turtle.parse(graft.ops.Formatters.ttlHeader + doc)
      assert(sts.length == 1, s"expected 1 statement from: $doc")
      val st = sts.head
      val path = Rdf.iriToPath(st.subj)
      assert(st.lit.contains(byPath(path)),
        s"literal mismatch for $path: got ${st.lit}")
    }
  }
}
