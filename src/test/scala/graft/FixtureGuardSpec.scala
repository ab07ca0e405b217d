package graft

/**
 * Session-start fail-fast on driver fixture regeneration (VERDICT r7 #2).
 * If the driver regenerated `/root/testdata` with a changed schema, this
 * suite fails with ONE message naming every drifted table — fix
 * [[FixtureGuard.expected]] (and whatever queries the change breaks)
 * before trusting any other red test.
 */
class FixtureGuardSpec extends SparkSpec {
  test("testdata fixtures match the pinned schema contract at every SF") {
    val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(d => s"/root/testdata/$d")
      .filter(d => new java.io.File(d).isDirectory)
    assert(sfDirs.nonEmpty, "no testdata directories found under /root/testdata")
    val drift = sfDirs.flatMap(d => FixtureGuard.check(spark, d).map(m => s"$d: $m"))
    assert(drift.isEmpty,
      "DRIVER FIXTURES CHANGED — update FixtureGuard.expected and audit " +
        "affected queries before debugging anything else:\n  " +
        drift.mkString("\n  "))
  }

  test("observe reports mtime and schema for every fixture table") {
    val obs = FixtureGuard.observe(spark, sf001)
    assert(obs.keySet == FixtureGuard.expected.keySet)
    assert(obs.values.forall { case (mtime, schema) =>
      mtime > 0L && schema.startsWith("struct<")
    })
  }
}
