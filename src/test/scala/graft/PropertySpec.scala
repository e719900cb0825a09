package graft

import org.scalacheck.Gen
import graft.canon.Canon
import graft.corpus.Corpus
import graft.text.TextOps

/** Property-based checks (SURVEY §5.3) via ScalaCheck generators with a
  * fixed seed. Spark evaluation is batched: each property collects its
  * generated cases into one DataFrame pass.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** `gen.sample` may return None (ScalaCheck retries exhausted); retry
    * until Some so a flaky sample never masquerades as a property failure.
    */
  private def sampleOf[T](gen: Gen[T]): T =
    Iterator.continually(gen.sample).flatten.next()

  private val schemeGen = Gen.oneOf("http", "HTTP", "https", "Https")
  private val hostGen = for {
    a <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
    b <- Gen.oneOf("Test", "test", "EXAMPLE.com")
  } yield s"$a.$b"
  private val urlGen: Gen[String] = for {
    sch <- schemeGen
    host <- hostGen
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/a", "/a/b/", "/p/1/")
    query <- Gen.oneOf("", "?b=2&a=1", "?z=9&a=1&m=3")
    frag <- Gen.oneOf("", "#x", "#frag/with/slash")
  } yield s"$sch://$host$port$path$query$frag"

  private def canonBatch(urls: Seq[String]): Seq[String] =
    urls.toDF("url").select(Canon.canonicalize($"url")).as[String]
      .collect().toSeq

  test("canon is idempotent and strips fragments/uppercase-host (batch of 300)") {
    val urls = sampleOf(Gen.listOfN(300, urlGen))
    val once = canonBatch(urls)
    val twice = canonBatch(once)
    once.zip(twice).zip(urls).foreach { case ((o, t), u) =>
      assert(o == t, s"not idempotent for $u: $o -> $t")
      assert(o == null || !o.contains("#"), s"fragment survived: $u -> $o")
      if (o != null) {
        val authority = o.split("://")(1).takeWhile(c => c != '/' && c != '?')
        assert(authority == authority.toLowerCase,
          s"host not lowercased: $u -> $o")
      }
    }
  }

  test("corpus determinism: same spec -> identical docs across evaluations") {
    val spec = Corpus.Spec(nDocs = 50, nHosts = 5)
    assert(Corpus.docsLocal(spec) == Corpus.docsLocal(spec))
    val a = Corpus.docs(spark, spec).collect().map(_.toString).sorted
    val b = Corpus.docs(spark, spec).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("selectAttrs round-trips generated attribute sets (batch of 200)") {
    // generate (tag-ish) attribute maps, render them as markup with a
    // random quoting style per attribute, and require the extractor to
    // recover EXACTLY the map (names lowercased; first dup wins — the
    // generator emits unique names so round-trip is exact)
    import graft.text.TextSelect
    val nameGen = Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString)
      .suchThat(_.nonEmpty)
    val valGen = Gen.listOfN(6,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('/', '.', '-', '_')))
      .map(_.mkString)
    val attrsGen: Gen[List[(String, String)]] = for {
      n <- Gen.choose(0, 4)
      names <- Gen.listOfN(n, nameGen).map(_.distinct)
      vals <- Gen.listOfN(names.size, valGen)
    } yield names.zip(vals)
    val styleGen = Gen.oneOf(0, 1, 2) // "v" | 'v' | bare
    val cases: Seq[(String, Map[String, String])] =
      sampleOf(Gen.listOfN(200, attrsGen)).map { attrs =>
        val rendered = attrs.map { case (k, v) =>
          sampleOf(styleGen) match {
            case 0 => s"""$k="$v""""
            case 1 => s"$k='$v'"
            case 2 => s"$k=$v"
          }
        }.mkString(" ")
        (s"<p>noise</p><a $rendered>x</a>", attrs.toMap)
      }
    val got = cases.map(_._1).toDF("h")
      .select(TextSelect.selectAttrs($"h", "a").as("a"))
      .as[Seq[Map[String, String]]].collect().toSeq
    got.zip(cases).foreach { case (g, (html, want)) =>
      assert(g.size == 1, html)
      assert(g.head == want, s"$html -> ${g.head}, want $want")
    }
  }

  test("token count: invariant under extra whitespace (batch of 200)") {
    val textGen = Gen.listOfN(6,
      Gen.oneOf("the", "fox", "a", "b1", "z")).map(_.mkString(" "))
    val texts = sampleOf(Gen.listOfN(200, textGen))
    val padded = texts.map(_.replace(" ", "   ") + "  ")
    val base = texts.toDF("text")
      .select(TextOps.tokenCount($"text")).as[Int].collect().toSeq
    val pad = padded.toDF("text")
      .select(TextOps.tokenCount($"text")).as[Int].collect().toSeq
    assert(base == pad)
  }

  test("UrlTraps features match a plain-Scala model on generated URLs (batch of 300)") {
    import graft.canon.UrlTraps
    val segGen = Gen.oneOf("a", "b", "x", "x", "cal", "s1") // dup 'x' forces runs
    val trapUrlGen: Gen[(String, List[String], Int, String)] = for {
      sch <- schemeGen
      host <- hostGen
      segs <- Gen.choose(0, 14).flatMap(nn => Gen.listOfN(nn, segGen))
      trailing <- Gen.oneOf("", "/")
      nParams <- Gen.choose(0, 9)
      frag <- Gen.oneOf("", "#x", "#f?k1=1&k2=1") // '?' in fragment: not a query
    } yield {
      val path = segs.map("/" + _).mkString +
        (if (segs.nonEmpty || trailing.nonEmpty) trailing else "")
      // every 3rd value contains a literal '?' (redirect-target style):
      // the count must anchor at the FIRST '?', not the last
      val query =
        if (nParams == 0) ""
        else "?" + (1 to nParams)
          .map(i => if (i % 3 == 0) s"k$i=u?x$i=1" else s"k$i=$i")
          .mkString("&")
      (s"$sch://$host$path$query$frag", segs, nParams, frag)
    }
    def modelRun(segs: List[String]): Int =
      if (segs.isEmpty) 0
      else segs.tail.foldLeft((segs.head, 1, 1)) { case ((prev, run, best), s) =>
        val r = if (s == prev) run + 1 else 1
        (s, r, math.max(best, r))
      }._3
    val cases = sampleOf(Gen.listOfN(300, trapUrlGen))
    val got = cases.map(_._1).toDF("u").select(
      UrlTraps.pathDepth($"u"), UrlTraps.maxSegmentRun($"u"),
      UrlTraps.queryParamCount($"u"), UrlTraps.isTrap($"u"))
      .as[(Int, Int, Int, Boolean)].collect().toSeq
    got.zip(cases).foreach { case ((d, r, p, t), (u, segs, nParams, _)) =>
      assert(d == segs.size, s"depth $u")
      assert(r == modelRun(segs), s"run $u")
      assert(p == nParams, s"params $u")
      assert(t == (modelRun(segs) >= 3 || segs.size >= 12 || nParams >= 8),
        s"verdict $u")
    }
  }

  test("UrlTraps screens raw (authority-less) URLs and session-id markers") {
    import graft.canon.UrlTraps
    val cases = Seq(
      // (url, depth, maxRun, sessionId)
      ("//mirror.test/x/x/x/p", 4, 3, false),        // protocol-relative
      ("a/x/x/x/b", 5, 3, false),                    // bare relative path
      ("file:/x/x/x", 3, 3, false),                  // scheme, no authority
      ("http://h.test/p;jsessionid=A1B2C3", 1, 1, true),
      ("http://h.test/p?PHPSESSID=deadbeef", 1, 1, true),
      ("http://h.test/p?a=1&sid=42", 1, 1, true),
      ("http://h.test/p?aside=1", 1, 1, false),      // 'sid' needs ?/& anchor
      ("http://h.test/p?residue=x&b=2", 1, 1, false))
    val got = cases.map(_._1).toDF("u").select(
      UrlTraps.pathDepth($"u"), UrlTraps.maxSegmentRun($"u"),
      UrlTraps.hasSessionId($"u"), UrlTraps.isTrap($"u"))
      .as[(Int, Int, Boolean, Boolean)].collect().toSeq
    got.zip(cases).foreach { case ((d, r, sess, trap), (u, wd, wr, wsess)) =>
      assert(d == wd, s"depth $u")
      assert(r == wr, s"run $u")
      assert(sess == wsess, s"session $u")
      assert(trap == (wr >= 3 || wd >= 12 || wsess), s"verdict $u")
    }
  }
}
