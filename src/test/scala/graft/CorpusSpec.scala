package graft

import graft.corpus.Corpus
import graft.model.Span

/** The distributed (Catalyst) corpus generator and the plain-Scala one
  * implement the same spec — row-for-row identity is what makes oracle
  * golden traces meaningful.
  */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("distributed docs == local docs, row for row") {
    val spec = Corpus.Spec(nDocs = 300, nHosts = 7, maxLinks = 5)
    val dist = Corpus.docs(spark, spec)
      .as[(String, Seq[Span])].collect().toMap
    val local = Corpus.docsLocal(spec).map(d => d.doc_id -> d.spans).toMap
    assert(dist.keySet == local.keySet)
    local.foreach { case (id, spans) =>
      assert(dist(id) == spans, s"doc $id")
    }
  }

  test("span offsets are dense ascending per doc (input_hint order key)") {
    val spec = Corpus.Spec(nDocs = 100)
    Corpus.docsLocal(spec).foreach { d =>
      assert(d.spans.map(_.offset) == d.spans.indices)
    }
  }

  test("link targets stay in range; hot host is actually hot") {
    val spec = Corpus.Spec(nDocs = 1000, nHosts = 20, hotHostPct = 25)
    val docs = Corpus.docsLocal(spec)
    val allLinks = docs.flatMap(_.spans.filter(_.kind == "link"))
    assert(allLinks.nonEmpty)
    assert(allLinks.forall(_.media_ref.startsWith("http://h")))
    val hot = docs.count(_.doc_id.startsWith("http://h0.test/"))
    assert(hot > 150 && hot < 400) // ~25% ± noise
  }
}
