package graft

/** Testdata-drift canary (round-7 verdict item 2).
  *
  * Pins the POST-`Tables.load` schema of every testdata table, so the
  * next testdata regeneration that changes a column's name or type fails
  * HERE first with a diff naming the table, column, and both types —
  * instead of 20 opaque `DATATYPE_MISMATCH` analysis errors scattered
  * across suites (what round 6's TIMESTAMP(NANOS)→MICROS shift produced).
  *
  * Deliberately checks the loader's output, not the raw parquet footer:
  * `Tables.load` is the engine's only ingress, and its contract — e.g.
  * `events.ts` always normalizes to TimestampType whether the file ships
  * nanos-as-long or micros-NTZ — is what every registered query depends
  * on. Raw-footer drift that the loader absorbs is fine; drift that leaks
  * through it is the regression. Expectations + diff logic live in
  * [[TestdataSchema]], shared with Verify's pre-gate warning.
  */
class TestdataCanarySpec extends SparkSpec {
  for (table <- TestdataSchema.expected.keys.toSeq.sorted) {
    test(s"canary: $table schema matches the engine's assumptions") {
      val drift = TestdataSchema.drift(spark, sfDir, table)
      assert(drift.isEmpty,
        "\nTESTDATA DRIFT DETECTED (regenerated testdata no longer " +
          "matches the schema the engine was built against):\n  " +
          drift.mkString("\n  ") +
          "\nFix: update Tables.load (and any queries touching the " +
          "drifted columns), then update TestdataSchema.expected.")
    }
  }
}
