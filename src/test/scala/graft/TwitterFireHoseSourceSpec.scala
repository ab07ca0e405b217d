package graft

import graft.sources.TwitterFireHoseSource
import graft.sources.TwitterFireHoseSource.{OAuthKeys, Tweet}

import org.apache.spark.sql.functions._

import java.io.ByteArrayInputStream
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

class TwitterFireHoseSourceSpec extends SparkSpec {

  // the publicly documented HMAC-SHA1 worked example (independently
  // recomputed from the RFC 5849 rules before being pinned here)
  private val exampleKeys = OAuthKeys(
    consumerKey = "xvz1evFS4wEEPTGEFPHBog",
    consumerSecret = "kAcSOqF21Fu85e7zjz7ZN2U4ZRhfV3WpwPAoE3Z7kBw",
    token = "370773112-GmHxMAgYyLbNEtIKZeRNFsMKPR9EyMZeS9weJAEb",
    tokenSecret = "LswwdoUaIvS8ltyTt5jkRh4J50vUPVVHtR2YPi5kE")

  test("OAuth1 signing matches the public worked example bit-for-bit") {
    val params = Seq(
      "status" -> "Hello Ladies + Gentlemen, a signed OAuth request!",
      "include_entities" -> "true")
    val header = TwitterFireHoseSource.authorizationHeader(
      "POST", "https://api.twitter.com/1.1/statuses/update.json", params,
      exampleKeys, nonce = "kYjzVBB8Y0ZFabxSWbWovY3uYSQ2pTgmZeNu2VS4cg",
      timestamp = 1318622958L)
    assert(header.contains(
      """oauth_signature="hCtSmYh%2BiHYCEqBWrE7C7hYmtUk%3D""""), header)
    assert(header.startsWith("OAuth oauth_consumer_key=\"xvz1evFS4wEEPTGEFPHBog\""))
  }

  test("percent-encoding follows RFC 3986 unreserved exactly") {
    assert(TwitterFireHoseSource.pctEncode("Az0-._~") === "Az0-._~")
    assert(TwitterFireHoseSource.pctEncode("a b+c") === "a%20b%2Bc")
    assert(TwitterFireHoseSource.pctEncode("é") === "%C3%A9") // UTF-8, uppercase hex
  }

  test("endpoint selection: sample when unfiltered, filter with follow/track CSVs") {
    assert(TwitterFireHoseSource.endpoint(Nil, Nil, delimited = false, stallWarnings = false)
      === (("/1.1/statuses/sample.json", Nil)))
    val (p, q) = TwitterFireHoseSource.endpoint(Seq(1L, 2L), Seq("spark", "scala"),
      delimited = true, stallWarnings = true)
    assert(p === "/1.1/statuses/filter.json")
    assert(q === Seq("follow" -> "1,2", "track" -> "spark,scala",
      "delimited" -> "length", "stall_warnings" -> "true"))
  }

  test("stream framing: keep-alive skip and delimited=length byte counts") {
    // the length count covers the message plus its trailing newline
    val body = "\r\n\r\n{\"a\":1}\n\r\n22\n{\"text\":\"len framed\"}\n{\"b\":2}\n"
    val in = new ByteArrayInputStream(body.getBytes(UTF_8))
    assert(TwitterFireHoseSource.nextMessage(in) === "{\"a\":1}")
    assert(TwitterFireHoseSource.nextMessage(in) === "{\"text\":\"len framed\"}")
    assert(TwitterFireHoseSource.nextMessage(in) === "{\"b\":2}")
    assert(TwitterFireHoseSource.nextMessage(in) === null)
  }

  test("top-level field scan is depth-aware: user.created_at never shadows") {
    val json = """{"user":{"created_at":"INNER","id":1},"created_at":"OUTER","text":"t"}"""
    assert(TwitterFireHoseSource.topLevelString(json, "created_at") === Some("OUTER"))
    assert(TwitterFireHoseSource.topLevelString("""{"id":5}""", "created_at") === None)
    // escaped quotes inside values don't derail the scan
    val tricky = """{"text":"say \"created_at\": here","created_at":"X"}"""
    assert(TwitterFireHoseSource.topLevelString(tricky, "created_at") === Some("X"))
  }

  test("event time: created_at parses; guestimate only as fallback") {
    val json = """{"created_at":"Wed Oct 10 20:19:24 +0000 2018","id":1}"""
    assert(TwitterFireHoseSource.eventTime(json, guestimate = false) === Some(1539202764000L))
    assert(TwitterFireHoseSource.eventTime("""{"id":1}""", guestimate = false) === None)
    assert(TwitterFireHoseSource.eventTime("""{"id":1}""", guestimate = true,
      now = () => 42L) === Some(42L))
    assert(TwitterFireHoseSource.eventTime("""{"created_at":"garbage"}""",
      guestimate = true, now = () => 42L) === Some(42L))
  }

  test("firehose end-to-end: signed GET, tweets pumped, reconnect after drop") {
    val server = new ServerSocket(0)
    val authSeen = new ConcurrentLinkedQueue[String]()
    val served = new CountDownLatch(2)
    val fake = new Thread(() => {
      for (round <- 0 until 2) {
        val c = server.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(c.getInputStream, UTF_8))
        var line = in.readLine()
        val request = new StringBuilder
        while (line != null && line.nonEmpty) {
          request.append(line).append('\n'); line = in.readLine()
        }
        authSeen.add(request.toString): Unit
        val tweets =
          if (round == 0) "{\"id\":1,\"text\":\"first\",\"created_at\":\"Wed Oct 10 20:19:24 +0000 2018\"}\n\r\n"
          else "{\"id\":2,\"text\":\"second\"}\n{\"delete\":{\"status\":{\"id\":1,\"user_id\":9}}}\n"
        c.getOutputStream.write(
          ("HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n" + tweets).getBytes(UTF_8))
        c.getOutputStream.flush()
        served.countDown()
        c.close() // drop → client must reconnect
      }
    }, "fake-stream-api")
    fake.setDaemon(true)
    fake.start()

    val got = new ConcurrentLinkedQueue[Tweet]()
    val fh = TwitterFireHoseSource.subscribe("127.0.0.1", server.getLocalPort,
      exampleKeys, got.add(_): Unit, terms = Seq("spark"),
      sleeper = _ => ()) // no real backoff sleep in tests
    try {
      assert(served.await(10, TimeUnit.SECONDS), "both connections not served")
      val deadline = System.currentTimeMillis() + 10000
      while (got.size < 3 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      val tweets = got.iterator().asScala.toSeq
      assert(tweets.map(t => TwitterFireHoseSource.topLevelString(t.json, "text"))
        .take(2) === Seq(Some("first"), Some("second")))
      assert(tweets.head.eventTimeMs === Some(1539202764000L))
      assert(tweets(1).eventTimeMs === None)
      assert(tweets(2).json.contains("\"delete\""))
      assert(fh.reconnects >= 1)
      val requests = authSeen.iterator().asScala.toSeq
      requests.foreach { r =>
        assert(r.contains("GET /1.1/statuses/filter.json?track=spark"), r)
        assert(r.contains("Authorization: OAuth oauth_consumer_key="), r)
        assert(r.contains("oauth_signature="), r)
      }
    } finally { fh.close(); server.close() }
  }

  test("tweetSchema round-trips the raw payload through from_json") {
    import spark.implicits._
    val raw = Seq(
      """{"id":7,"text":"hello","lang":"en","user":{"id":3,"screen_name":"ada","followers_count":10},"retweet_count":2}""",
      """{"delete":{"status":{"id":7,"user_id":3}}}""").toDF("json")
    val parsed = raw.select(from_json(col("json"),
      TwitterFireHoseSource.tweetSchema).as("t"))
    val rows = parsed.select("t.id", "t.text", "t.user.screen_name",
      "t.delete.status.id").collect()
    assert(rows(0).getLong(0) === 7L)
    assert(rows(0).getString(1) === "hello")
    assert(rows(0).getString(2) === "ada")
    assert(rows(0).isNullAt(3))
    assert(rows(1).getLong(3) === 7L)
  }
}
