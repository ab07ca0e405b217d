package graft

import graft.log.PathIO
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Deterministic fuzz (fixed-seed) over PathIO's path algebra — the
  * invariants every seam protocol leans on: qualify idempotence and
  * spelling-insensitivity, child/relativize inversion, walk order,
  * and tree-delete completeness. Runs on BOTH bare and file:-scheme
  * spellings of the same directories. */
class PathIOPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(13)

  private def segment(): String = {
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_-"
    (0 until (1 + rnd.nextInt(10)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString match {
      // never produce the reserved shapes PathIO callers treat as
      // metadata, and never a leading dash that could read as an option
      case s if s.startsWith("-") => "x" + s
      case s => s
    }
  }

  test("qualify: idempotent, and bare vs file:-scheme spellings agree") {
    val root = Files.createTempDirectory("pio-prop").toString
    (1 to 50).foreach { _ =>
      val rel = (0 until (1 + rnd.nextInt(4))).map(_ => segment()).mkString("/")
      val bare = s"$root/$rel"
      val schemed = s"file:$root/$rel"
      val q1 = PathIO.qualify(bare).toString
      val q2 = PathIO.qualify(schemed).toString
      assert(q1 == q2, s"spellings disagree: $q1 vs $q2")
      assert(PathIO.qualify(q1).toString == q1, s"not idempotent: $q1")
    }
  }

  test("child/relativize invert each other for generated multi-segment names") {
    val root = Files.createTempDirectory("pio-prop").toString
    (1 to 50).foreach { _ =>
      val rel = (0 until (1 + rnd.nextInt(5))).map(_ => segment()).mkString("/")
      val base = PathIO.path(if (rnd.nextBoolean()) root else s"file:$root")
      val p = PathIO.path(base.toString, rel)
      assert(PathIO.relativize(base, p) == rel,
        s"relativize(child($rel)) != $rel")
    }
    // prefix-confusion guard: /a/bc is NOT under /a/b
    val b1 = PathIO.path(root, "a/b")
    val p1 = PathIO.path(root, "a/bc/x")
    PathIO.mkdirs(PathIO.path(root, "a/bc"))
    intercept[IllegalArgumentException] { PathIO.relativize(b1, p1) }
  }

  test("walk order and tree delete over random trees, bare and schemed") {
    (1 to 5).foreach { round =>
      val rootNio = Files.createTempDirectory(s"pio-prop-$round")
      val rootStr =
        if (round % 2 == 0) "file:" + rootNio.toString else rootNio.toString
      // random tree: up to 20 files in up to 8 nested dirs
      val dirs = scala.collection.mutable.ArrayBuffer(rootNio)
      (1 to (2 + rnd.nextInt(6))).foreach { _ =>
        val parent = dirs(rnd.nextInt(dirs.size))
        val d = parent.resolve(segment())
        Files.createDirectories(d)
        dirs += d
      }
      var files = 0
      (1 to (5 + rnd.nextInt(15))).foreach { i =>
        val parent = dirs(rnd.nextInt(dirs.size))
        val f = parent.resolve(s"f$i-${segment()}.bin")
        if (!Files.exists(f)) { Files.write(f, Array[Byte](1)); files += 1 }
      }
      val statuses = PathIO.walkStatuses(PathIO.path(rootStr))
      // count: start dir + all dirs + all files (dirs may nest under
      // each other so recount from nio truth)
      val nioCount = {
        val w = Files.walk(rootNio)
        try w.count() finally w.close()
      }
      assert(statuses.size.toLong == nioCount,
        s"walk size ${statuses.size} != nio $nioCount")
      // pre-order: every entry's parent appears before it
      val seen = scala.collection.mutable.Set[String]()
      statuses.foreach { st =>
        val parent = Option(st.getPath.getParent).map(_.toUri.getPath)
        val self = st.getPath.toUri.getPath
        if (parent.exists(p => p.startsWith(rootNio.toUri.getPath.stripSuffix("/"))) &&
            self != rootNio.toUri.getPath.stripSuffix("/"))
          assert(parent.forall(seen.contains) || statuses.head.getPath == st.getPath,
            s"child $self walked before parent")
        seen += self.stripSuffix("/")
      }
      // deleteTree removes everything
      assert(PathIO.deleteTree(PathIO.path(rootStr)))
      assert(!Files.exists(rootNio))
    }
  }
}
