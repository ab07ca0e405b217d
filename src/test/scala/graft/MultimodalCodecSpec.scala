package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.MediaGen
import org.apache.spark.sql.Row

/**
 * Real container-header codecs: golden bytes (hand-assembled per the
 * public specs, independent of MediaGen) plus builder↔parser roundtrips
 * and the distributed decode pipeline.
 */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def decode(b: Array[Byte]): Row = {
    val df = Seq(Tuple1(b)).toDF("payload")
    Multimodal.withDecodedMeta(df, "payload")
      .select("media_meta.*").collect().head
  }

  test("golden PNG: the canonical 1x1 RGBA header parses to 1x1, 4 channels") {
    // PNG signature + IHDR for width=1, height=1, bit depth 8, color type 6
    // (RGBA) with its well-known CRC 0x1f15c489 — bytes straight from the
    // W3C spec, not from our builder.
    val golden = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52,
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, 0x89).map(_.toByte)
    val m = decode(golden)
    assert(m.getString(1) == "png")
    assert(m.getInt(2) == 1 && m.getInt(3) == 1)
    assert(m.getInt(4) == 4, "color type 6 = RGBA = 4 channels")
  }

  test("JPEG marker walk skips APPn/COM segments before SOF0") {
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x09) ++
      "comment".getBytes("US-ASCII")
    val base = MediaGen.jpeg(640, 480)
    // splice a COM segment between SOI and the rest
    val spliced = base.take(2) ++ com ++ base.drop(2)
    val m = decode(spliced)
    assert(m.getString(1) == "jpeg")
    assert(m.getInt(2) == 640 && m.getInt(3) == 480)
    assert(m.getInt(4) == 3)
  }

  test("JPEG 0xFF fill bytes between segments are skipped, not misread as markers") {
    // spec-valid padding: any number of 0xFF fill bytes may precede a marker
    val pad = Array.fill(5)(0xff.toByte)
    val base = MediaGen.jpeg(640, 480)
    val padded = base.take(2) ++ pad ++ base.drop(2)
    val m = decode(padded)
    assert(m.getString(1) == "jpeg")
    assert(m.getInt(2) == 640 && m.getInt(3) == 480)
  }

  test("builders roundtrip through the parsers for many sizes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 30) {
      val w = 1 + rnd.nextInt(4000); val h = 1 + rnd.nextInt(4000)
      val png = decode(MediaGen.png(w, h))
      assert((png.getString(1), png.getInt(2), png.getInt(3), png.getInt(4)) ==
        ("png", w, h, 3))
      val jpg = decode(MediaGen.jpeg(w min 65535, h min 65535))
      assert((jpg.getString(1), jpg.getInt(2), jpg.getInt(3)) ==
        ("jpeg", w min 65535, h min 65535))
      val gif = decode(MediaGen.gif(w min 65535, h min 65535))
      assert((gif.getString(1), gif.getInt(2), gif.getInt(3)) ==
        ("gif", w min 65535, h min 65535))
    }
  }

  test("WAV fmt/data chunk walk: channels and duration") {
    // 8000 Hz, stereo, 16-bit: byteRate 32000; 64000 bytes = 2000 ms
    val m = decode(MediaGen.wav(8000, 2, 64000))
    assert(m.getString(0) == "audio" && m.getString(1) == "wav")
    assert(m.isNullAt(2) && m.isNullAt(3))
    assert(m.getInt(4) == 2)
    assert(m.getLong(5) == 2000L)
  }

  test("built PNG chunks carry valid CRC32 (spec conformance of the builder)") {
    val b = MediaGen.png(123, 77)
    // IHDR: length at 8, type at 12, data 13 bytes, CRC after
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13)
    val stored = ((b(29) & 0xffL) << 24) | ((b(30) & 0xffL) << 16) |
      ((b(31) & 0xffL) << 8) | (b(32) & 0xffL)
    assert(stored == crc.getValue)
  }

  test("golden MP3: hand-assembled frame header, with and without ID3v2 tag") {
    // 0xFF 0xFB = MPEG1 Layer III no-CRC; 0x90 = bitrate idx 9 (128 kbps),
    // samplerate idx 0 (44100); 0x00 = stereo. Bytes straight from the
    // ISO 11172-3 header layout, not from our builder.
    val frame = Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte)
    val bare = frame ++ new Array[Byte](16000 - 4) // 16000 B @128kbps = 1000ms
    val m = decode(bare)
    assert(m.getString(0) == "audio" && m.getString(1) == "mp3")
    assert(m.isNullAt(2) && m.isNullAt(3))
    assert(m.getInt(4) == 2)
    assert(m.getLong(5) == 1000L)
    // ID3v2 tag with syncsafe size 0x0100 = 128: audio region excludes it
    val id3 = "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0) ++
      Array[Byte](0, 0, 1, 0) ++ new Array[Byte](128)
    val tagged = id3 ++ frame.take(3) ++ Array(0xc0.toByte) ++ // mono mode
      new Array[Byte](8000 - 4)
    val t = decode(tagged)
    assert(t.getString(1) == "mp3")
    assert(t.getInt(4) == 1, "channel mode 3 = single_channel = mono")
    assert(t.getLong(5) == 8000L * 8 / 128)
    // reserved version bits / Layer I are not "MP3" — stub, not garbage
    assert(decode(Array(0xff, 0xeb, 0x90, 0x00).map(_.toByte) ++
      new Array[Byte](100)).getString(1) == "stub")
  }

  test("golden MP4: version-1 mvhd/tkhd boxes (64-bit times) parse correctly") {
    // hand-assembled ISO BMFF with v1 boxes — MediaGen only builds v0, so
    // this golden covers the other layout
    def be32b(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def be64b(v: Long) = be32b((v >> 32).toInt) ++ be32b(v.toInt)
    def box(t: String, p: Array[Byte]) =
      be32b(p.length + 8) ++ t.getBytes("US-ASCII") ++ p
    val ftyp = box("ftyp", "isom".getBytes ++ be32b(0) ++ "isom".getBytes)
    val mvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32b(90000) ++ be64b(270000L) ++ new Array[Byte](80)) // 3000 ms
    val tkhd = box("tkhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](32) ++
      new Array[Byte](52) ++ be32b(1920 << 16) ++ be32b(1080 << 16))
    val m = decode(ftyp ++ box("moov", mvhd ++ box("trak", tkhd)))
    assert(m.getString(0) == "video" && m.getString(1) == "mp4")
    assert(m.getInt(2) == 1920 && m.getInt(3) == 1080)
    assert(m.getLong(5) == 3000L)
    // MP4 builder roundtrips through the parser
    val b = decode(MediaGen.mp4(640, 360, 12345L))
    assert((b.getString(1), b.getInt(2), b.getInt(3), b.getLong(5)) ==
      ("mp4", 640, 360, 12345L))
    // a box whose size overruns the buffer falls back to the stub
    val overrun = ftyp ++ be32b(1 << 20) ++ "moov".getBytes("US-ASCII")
    assert(decode(overrun).getString(1) == "stub")
  }

  test("unknown bytes fall back to the deterministic stub") {
    val m = decode("definitely not an image".getBytes("UTF-8"))
    assert(m.getString(1) == "stub")
  }

  test("REAL pixel path: ImageIO decodes the synthesized PNG — dimensions, channels and mean luma are pixel-true") {
    (Seq(0L, 1L, 7L, 41L, 255L, 256L, 511L, 1234567L)).foreach { id =>
      val png = Multimodal.synthPng(id)
      // it is a real PNG (the header parser agrees)...
      assert(decode(png).getString(1) == "png")
      // ...and the PIXELS decode: solid gray at the arithmetic level
      val ps = Multimodal.ImageIODecoder.decode(png).get
      assert(ps.width == 1 + (id % 8).toInt)
      assert(ps.height == 1 + (id % 5).toInt)
      assert(ps.channels == 3)
      assert(math.round(ps.meanLuma) == id % 256,
        s"id $id: mean luma ${ps.meanLuma} != gray ${id % 256}")
      assert(ps.lumaHist.sum == ps.width.toLong * ps.height)
    }
    // undecodable bytes → None (callers fall back to the stub)
    assert(Multimodal.ImageIODecoder.decode("not pixels".getBytes).isEmpty)
  }

  test("pluggable decoder seam: withDecodedMeta overrides dims from real pixels; withFeatures goes pixel-true; withPixelStats surfaces mean luma; stub fallback unchanged") {
    val ids = spark.range(0, 48).toDF("doc_id").repartition(4)
    val pngs = ids.withColumn("payload", Multimodal.pngSynth($"doc_id"))
    // withPixelStats: distributed real decode
    val stats = Multimodal.withPixelStats(pngs, "payload")
      .select($"doc_id", $"pixel_stats.width", $"pixel_stats.height",
        $"pixel_stats.n_channels", $"pixel_stats.mean_luma")
      .collect()
    stats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 1 + (id % 8).toInt)
      assert(r.getInt(2) == 1 + (id % 5).toInt)
      assert(r.getInt(3) == 3)
      assert(math.round(r.getDouble(4)) == id % 256)
    }
    // withDecodedMeta with the decoder: header keeps format, pixels own
    // the dimensions (here they agree — the PNG is honest)
    val meta = Multimodal.withDecodedMeta(pngs, "payload",
        decoder = Some(Multimodal.ImageIODecoder))
      .select($"doc_id", $"media_meta.format", $"media_meta.width")
      .collect()
    meta.foreach { r =>
      assert(r.getString(1) == "png")
      assert(r.getInt(2) == 1 + (r.getLong(0) % 8).toInt)
    }
    // withFeatures through the seam: pixel-true histogram — a solid-gray
    // image has ALL its mass in one luma bin, so exactly one feature
    // bucket is ~1.0 and it differs from the stub's pseudo-embedding
    val dim = 16
    val feats = Multimodal.withFeatures(pngs, "payload", dim,
        decoder = Some(Multimodal.ImageIODecoder))
      .select($"doc_id", $"features").as[(Long, Array[Float])].collect()
    feats.foreach { case (id, f) =>
      assert(f.length == dim)
      val g = (id % 256).toInt
      assert(math.abs(f(g * dim / 256) - 1.0f) < 1e-6,
        s"id $id: luma mass must sit in bucket ${g * dim / 256}: ${f.toSeq}")
      assert(f.map(_.toDouble).sum > 0.999 && f.map(_.toDouble).sum < 1.001)
    }
    // no decoder (or undecodable bytes): byte-identical stub behavior
    val stub = Seq(Tuple1("not an image".getBytes)).toDF("payload")
    val viaSeam = Multimodal.withFeatures(stub, "payload", 8,
      decoder = Some(Multimodal.ImageIODecoder)).select("features")
      .as[Array[Float]].head()
    val plain = Multimodal.withFeatures(stub, "payload", 8)
      .select("features").as[Array[Float]].head()
    assert(viaSeam.toSeq == plain.toSeq,
      "undecodable bytes must fall back to the unchanged stub")
    // pixel_stats is null for undecodable bytes
    assert(Multimodal.withPixelStats(stub, "payload")
      .select("pixel_stats").head().isNullAt(0))
  }

  test("malformed RIFF files fall back to the stub instead of crashing") {
    // valid RIFF/WAVE magic, then a chunk whose size overruns the buffer
    val overrun = ("RIFF".getBytes("US-ASCII") ++
      Array[Byte](100, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII") ++
      "junk".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 0x7f)) ++ new Array[Byte](24)
    assert(decode(overrun).getString(1) == "stub")
    // fmt chunk header fits but its body is truncated mid-field
    val truncated = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](40, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII") ++
      "pad ".getBytes("US-ASCII") ++ Array[Byte](20, 0, 0, 0) ++
      new Array[Byte](20) ++
      "fmt ".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0)
    assert(truncated.length == 48)
    assert(decode(truncated).getString(1) == "stub")
  }

  test("synthesizeMedia + decode recovers the fixture formulas distributed") {
    val ids = spark.range(0, 64).toDF("doc_id").repartition(8)
    val decoded = Multimodal.withDecodedMeta(
      Multimodal.synthesizeMedia(ids, "doc_id"), "payload")
      .select($"doc_id", $"media_meta.format", $"media_meta.width",
        $"media_meta.height", $"media_meta.n_channels", $"media_meta.duration_ms")
      .as[(Long, String, Option[Int], Option[Int], Int, Long)]
      .collect().sortBy(_._1)
    val v1l3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    for ((id, fmt, w, h, ch, dur) <- decoded) {
      val ew = 64 + (id % 512).toInt; val eh = 64 + ((id * 7) % 512).toInt
      (id % 6) match {
        case 0 => assert((fmt, w, h, ch, dur) == ("png", Some(ew), Some(eh), 3, 0L))
        case 1 => assert((fmt, w, h, ch, dur) == ("jpeg", Some(ew), Some(eh), 3, 0L))
        case 2 => assert((fmt, w, h, ch, dur) == ("gif", Some(ew), Some(eh), 3, 0L))
        case 3 =>
          val c = 1 + (id % 2).toInt
          val expectedDur = (8000 + (id % 100) * 16) * 1000L / (8000L * c * 2)
          assert((fmt, w, h, ch, dur) == ("wav", None, None, c, expectedDur))
        case 4 =>
          val kbps = v1l3(1 + (id % 14).toInt)
          val expectedDur = (2000L + (id % 50) * 100) * 8 / kbps
          val c = if (id % 2 == 0) 2 else 1
          assert((fmt, w, h, ch, dur) == ("mp3", None, None, c, expectedDur))
        case _ =>
          assert((fmt, w, h, ch, dur) ==
            ("mp4", Some(ew), Some(eh), 3, 30000L + (id % 100) * 500L))
      }
    }
  }
}
