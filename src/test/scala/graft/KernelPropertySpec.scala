package graft

import graft.functions.UrlCanonicalizeExpr
import graft.sources.AerospikeSink.Ripemd160
import graft.sources.KafkaConnectAdaptor.{canonicalJson, parseFlatJson}

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** Randomized properties for the round-6 kernels: the invariants a
  * fuzzer would lean on, over seeded generators. */
class KernelPropertySpec extends AnyFunSuite {

  private def canon(u: String): String = UrlCanonicalizeExpr(null).canonicalize(u)

  private def randomUrl(rnd: scala.util.Random): String = {
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val scheme = pick(Seq("http", "HTTP", "https", "HtTpS"))
    val host = pick(Seq("Example.com", "a.b.example.NET", "h-1.io"))
    val port = pick(Seq("", ":80", ":443", ":8080"))
    val segs = (0 until rnd.nextInt(5)).map(_ =>
      pick(Seq("a", "b%2Fc", ".", "..", "p%7Eq", "x", "%41")))
    val path = if (segs.isEmpty) "" else segs.mkString("/", "/", if (rnd.nextBoolean()) "/" else "")
    val params = (0 until rnd.nextInt(4)).map(_ =>
      pick(Seq("a=1", "b=%7e", "utm_source=x", "z=", "fbclid=9", "k=v%2Fw")))
    val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
    val frag = if (rnd.nextBoolean()) "#sec%20tion" else ""
    s"$scheme://$host$port$path$query$frag"
  }

  test("url canonicalization is idempotent over random noisy URLs") {
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val u = randomUrl(rnd)
      val once = canon(u)
      assert(canon(once) === once, s"not idempotent for $u -> $once")
    }
  }

  test("canonical URLs carry no fragments, no tracking params, sorted queries") {
    val rnd = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val c = canon(randomUrl(rnd))
      assert(!c.contains("#"), c)
      assert(!c.contains("utm_") && !c.contains("fbclid"), c)
      val qi = c.indexOf('?')
      if (qi >= 0) {
        val parts = c.substring(qi + 1).split("&").toSeq
        assert(parts === parts.sorted, c)
        assert(parts.forall(_.nonEmpty), c)
      }
      // scheme and host are lowercase up to the path
      val pathStart = c.indexOf('/', c.indexOf("://") + 3)
      val prefix = if (pathStart < 0) c else c.substring(0, pathStart)
      assert(prefix === prefix.toLowerCase, c)
    }
  }

  test("char_ngrams kernel equals per-position substring on random unicode text") {
    import org.apache.spark.unsafe.types.UTF8String
    val alphabet = "ab Zé漢字🙂ß́"
    val rnd = new scala.util.Random(11)
    def substrForm(s: String, n: Int): Seq[String] = {
      // the declarative twin: substr(text, i, n) by codepoints
      val cps = s.codePoints().toArray
      if (cps.length < n) Seq.empty
      else (0 to cps.length - n).map(i => new String(cps, i, n))
    }
    for (_ <- 0 until 300) {
      val len = rnd.nextInt(40)
      val s = (0 until len).map { _ =>
        val cp = alphabet.codePointAt(
          alphabet.offsetByCodePoints(0, rnd.nextInt(alphabet.codePointCount(0, alphabet.length))))
        new String(Character.toChars(cp))
      }.mkString
      for (n <- Seq(1, 3)) {
        val got = graft.functions.CharNgramsExpr(null, n)
          .kernel(UTF8String.fromString(s))
        val gotSeq = (0 until got.numElements())
          .map(i => got.getUTF8String(i).toString)
        assert(gotSeq == substrForm(s, n), s"mismatch for <$s> n=$n")
      }
    }
  }

  test("char_entropy kernel: closed forms and histogram-replay parity on random unicode") {
    import org.apache.spark.unsafe.types.UTF8String
    def ent(s: String): Double =
      graft.functions.CharEntropyExpr(null).kernel(UTF8String.fromString(s))
    val Half = java.math.RoundingMode.HALF_UP
    // closed forms: uniform text scores 0; two equiprobable chars score ln 2
    assert(ent("") == 0.0)
    assert(ent("aaaa") == 0.0)
    // POSITIVE zero specifically: uniform text computes ln n − round9(ln n)
    // ≈ −4e-10 before the 6-decimal round; the BigDecimal path must fold
    // that to +0.0 (the oracle adds `+ 0.0` to match IEEE -0.0 from round)
    for (s <- Seq("aa", "bbb", "zzzzzzz")) {
      val h = ent(s)
      assert(java.lang.Double.doubleToRawLongBits(h) == 0L,
        s"entropy of uniform <$s> must be +0.0, got bits of $h")
    }
    val ln2r = java.math.BigDecimal.valueOf(math.log(2.0)).setScale(6, Half).doubleValue()
    assert(ent("ab") == ln2r)
    assert(ent("abab") == ln2r)
    // repetitive text below diverse text
    assert(ent("spam spam spam spam") < ent("the quick brown fox jumps"))

    // replay the formula from a plain codepoint histogram (the oracle's
    // explode → histogram → decimal-aggregate shape) over random unicode
    val alphabet = "ab Zé漢字🙂ß́"
    val rnd = new scala.util.Random(23)
    def replay(s: String): Double = {
      val cps = s.codePoints().toArray
      if (cps.isEmpty) return 0.0
      val n = cps.length
      var sum = java.math.BigDecimal.ZERO
      for ((_, c) <- cps.groupBy(identity).view.mapValues(_.length)) {
        val r9 = java.math.BigDecimal.valueOf(math.log(c.toDouble)).setScale(9, Half).doubleValue()
        sum = sum.add(java.math.BigDecimal.valueOf(r9).setScale(9, Half)
          .multiply(java.math.BigDecimal.valueOf(c.toLong)))
      }
      java.math.BigDecimal.valueOf(math.log(n.toDouble) - sum.doubleValue() / n)
        .setScale(6, Half).doubleValue()
    }
    for (_ <- 0 until 300) {
      val len = rnd.nextInt(60)
      val s = (0 until len).map { _ =>
        val cp = alphabet.codePointAt(
          alphabet.offsetByCodePoints(0, rnd.nextInt(alphabet.codePointCount(0, alphabet.length))))
        new String(Character.toChars(cp))
      }.mkString
      assert(ent(s) == replay(s), s"mismatch for <$s>")
    }
  }

  test("canonical flat JSON round-trips arbitrary string maps") {
    val rnd = new scala.util.Random(13)
    def randomStr(): String = {
      val chars = Seq('a', 'b', '"', '\\', '\n', '\t', 'é', ':', ',', '{', '}')
      (0 until rnd.nextInt(12)).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
    (0 until 300).foreach { _ =>
      val m = (0 until rnd.nextInt(6)).map(i =>
        s"k$i${randomStr()}" -> (if (rnd.nextInt(8) == 0) null else randomStr())).toMap
      val j = canonicalJson(m)
      assert(parseFlatJson(j) === m, s"roundtrip failed for $j")
      // canonical: ordering-independent encoding
      assert(canonicalJson(m.toSeq.reverse.toMap) === j)
    }
  }

  test("ripemd160 is stable across padding boundaries and input-sensitive") {
    val lengths = Seq(0, 1, 54, 55, 56, 57, 63, 64, 65, 119, 120, 128, 1000)
    val digests = lengths.map { n =>
      val d = Ripemd160.digest(Array.fill(n)('x'.toByte))
      assert(d.length === 20)
      d.toSeq
    }
    assert(digests.distinct.size === lengths.size, "length collisions")
    // single-bit sensitivity
    val a = Ripemd160.digest("The quick brown fox".getBytes(UTF_8))
    val b = Ripemd160.digest("The quick brown foy".getBytes(UTF_8))
    assert(a.toSeq !== b.toSeq)
    assert(Ripemd160.digest("The quick brown fox".getBytes(UTF_8)).toSeq === a.toSeq)
  }
}
