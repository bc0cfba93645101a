package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** RDF/XML subset parsing: Descriptions, typed nodes, resource/datatype/
  * lang properties, nested nodes, fail-loud unsupported. */
class RdfXmlSpec extends AnyFunSuite {

  private val Doc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ont="cmwell://ont#">
      |  <rdf:Description rdf:about="cmwell://customer/1">
      |    <ont:name xml:lang="en">Alice &amp; Bob</ont:name>
      |    <ont:acctbal rdf:datatype="http://www.w3.org/2001/XMLSchema#double">711.56</ont:acctbal>
      |    <ont:refNation rdf:resource="cmwell://nation/3"/>
      |  </rdf:Description>
      |  <ont:Supplier rdf:about="cmwell://supplier/9">
      |    <ont:active rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</ont:active>
      |  </ont:Supplier>
      |</rdf:RDF>""".stripMargin

  test("descriptions, typed nodes and property forms parse") {
    val sts = RdfXml.parse(Doc)
    val c = sts.filter(_.subj == "cmwell://customer/1")
    assert(c.exists(s => s.pred == "cmwell://ont#name" &&
      s.lit.contains("Alice & Bob") && s.lang.contains("en")))
    assert(c.exists(s => s.pred == "cmwell://ont#refNation" &&
      s.objIri.contains("cmwell://nation/3")))
    assert(c.map(Rdf.toValue).exists(v => v.vType == "d" &&
      v.n.contains(711.56)))
    val sup = sts.filter(_.subj == "cmwell://supplier/9")
    assert(sup.exists(s =>
      s.pred == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" &&
        s.objIri.contains("cmwell://ont#Supplier")))
    assert(sup.map(Rdf.toValue).exists(v => v.vType == "b" &&
      v.b.contains(true)))
  }

  test("concurrent parses are safe (per-thread StAX factory)") {
    // XMLInputFactory is not specified thread-safe; parses run on Spark
    // task threads, so hammer the parser from a parallel stream and
    // check every result is complete and uncorrupted
    val results = java.util.stream.IntStream.range(0, 256).parallel()
      .mapToObj[Seq[Rdf.Statement]](i =>
        RdfXml.parse(Doc.replace("customer/1", s"customer/$i")))
      .toArray
    assert(results.length == 256)
    results.zipWithIndex.foreach { case (sts, _) =>
      assert(sts.asInstanceOf[Seq[Rdf.Statement]].size == 5)
    }
    val trix = """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      |<graph><uri>c://g/1</uri>
      |<triple><uri>c://s/1</uri><uri>c://o#p</uri>
      |<plainLiteral xml:lang="en">hi</plainLiteral></triple>
      |</graph></TriX>""".stripMargin
    val tr = java.util.stream.IntStream.range(0, 256).parallel()
      .mapToObj[Seq[Rdf.Statement]](i =>
        Trix.parse(trix.replace("s/1", s"s/$i"))).toArray
    assert(tr.forall(_.asInstanceOf[Seq[Rdf.Statement]].size == 1))
  }

  test("nested node elements become blank-node objects") {
    val sts = RdfXml.parse(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:o="c://o#">
        |  <rdf:Description rdf:about="c://a/1">
        |    <o:addr><rdf:Description>
        |      <o:city>Berlin</o:city>
        |    </rdf:Description></o:addr>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin)
    val link = sts.find(s => s.subj == "c://a/1" && s.pred == "c://o#addr").get
    val b = link.objIri.get
    assert(b.startsWith("_:"))
    assert(sts.exists(s => s.subj == b && s.pred == "c://o#city" &&
      s.lit.contains("Berlin")))
  }

  test("parseType and containers are rejected loudly") {
    intercept[IllegalArgumentException](RdfXml.parse(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:o="c://o#">
        |  <rdf:Description rdf:about="c://a/1">
        |    <o:x rdf:parseType="Literal"><b>x</b></o:x>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin))
  }
}
