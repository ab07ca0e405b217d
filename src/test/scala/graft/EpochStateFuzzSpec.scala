package graft

import graft.ext.MixtureStream
import graft.log.PathIO

/**
 * Model-based fuzz of the [[graft.ext.EpochState]] commit protocol
 * (via its [[MixtureStream]] instantiation — the richer payload):
 * random interleavings of commits, identical replays, crash leftovers
 * (`<name>.tmp.<uuid>` siblings a killed atomicCreate strands), and
 * divergent-writer attempts — after EVERY step, `priorTotals` at
 * every readable epoch must equal an in-memory model, and the on-disk
 * chain must stay within the two-entry replay window (modulo
 * leftovers awaiting their prune). The targeted cases live in
 * MixtureStreamSpec/SeqPackStreamSpec and the seam suites; this walks
 * the compositions (a leftover stacked under a replay, divergence
 * after a prune, leftovers of several epochs at once).
 */
class EpochStateFuzzSpec extends SparkSpec {

  test("random commit/replay/leftover/divergence interleavings match the model") {
    for (seed <- Seq(7L, 123L)) {
      val rnd = new scala.util.Random(seed)
      val out = java.nio.file.Files
        .createTempDirectory(s"esfuzz-$seed").toString
      // the model: committed totals per epoch (never pruned — reads of
      // old epochs compare only within the live window)
      var committed = Map.empty[Long, Map[String, Long]]
      var nextEpoch = 0L

      def totalsFor(e: Long): Map[String, Long] =
        Map("a" -> e * 10L, "b" -> (e * 3L + 1L))

      def liveFloor: Long = nextEpoch - 2L // prune keeps >= last-1

      def check(step: String): Unit = {
        // prior() at every epoch whose answer the live window can still
        // serve: probe the two live entries and one past-the-end read
        val probes = Seq(nextEpoch - 1L, nextEpoch, nextEpoch + 5L)
          .filter(_ >= 0L)
        probes.foreach { e =>
          val want = committed.filter { case (k, _) =>
            k < e && k >= liveFloor }
          val wantV =
            if (want.isEmpty) Map.empty[String, Long]
            else want(want.keys.max)
          val got = MixtureStream.priorTotals(out, e)
          assert(got == wantV,
            s"seed=$seed after $step: prior($e) = $got, want $wantV " +
              s"(committed=${committed.keys.toSeq.sorted})")
        }
      }

      (0 until 40).foreach { step =>
        rnd.nextInt(4) match {
          case 0 => // commit the next epoch
            MixtureStream.commitTotals(out, nextEpoch, totalsFor(nextEpoch))
            committed += nextEpoch -> totalsFor(nextEpoch)
            nextEpoch += 1L
          case 1 if nextEpoch > 0 => // identical replay of the last epoch
            val e = nextEpoch - 1L
            MixtureStream.commitTotals(out, e, totalsFor(e))
          case 2 => // crash leftover of a random recent epoch
            val e = math.max(0L, nextEpoch - rnd.nextInt(3))
            PathIO.atomicCreate(
              PathIO.path(out, s"_mixstate-$e.tmp.${rnd.nextInt(9999)}"),
              "garbage".getBytes("UTF-8")): Unit
          case 3 if nextEpoch > 0 => // divergent writer: loud, no change
            val e = nextEpoch - 1L
            intercept[RuntimeException] {
              MixtureStream.commitTotals(out, e,
                totalsFor(e) + ("a" -> -1L))
            }: Unit
          case _ => () // replay/divergence need a first commit
        }
        check(s"step $step")
      }
      // end state: live entries within the window; leftovers only for
      // epochs the prune hasn't passed yet
      val names = PathIO.listDir(PathIO.path(out)).map(_.getName)
        .filter(_.startsWith("_mixstate-"))
      val entries = names.filterNot(_.contains(".tmp."))
        .map(_.stripPrefix("_mixstate-").toLong)
      assert(entries.forall(_ >= liveFloor), s"seed=$seed: stale $entries")
      assert(entries.size <= 2, s"seed=$seed: chain grew: $entries")
    }
  }
}
