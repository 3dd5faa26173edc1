package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.util.{Failure, Success, Try}

/** Dev harness: run every registered query under ANSI mode ON vs OFF and
  * diff the results. Spark 4.x defaults `spark.sql.ansi.enabled=true`, so a
  * library caller who does NOT copy our sessions' ansi=false pin gets ANSI
  * semantics — the r10 advisory on compactGroupQuantiles (out-of-bounds
  * element_at throwing only under ANSI) proved this is a real divergence
  * class, not a theoretical one. This sweep makes the whole 138-query
  * surface observable under both modes.
  *
  * Verdicts per query:
  *   OK         — both modes succeed, canonical result hash identical
  *   DIFF       — both succeed, results differ (semantics-changing config)
  *   ERROR_ON   — ANSI-on throws where ANSI-off succeeds (caller-facing crash)
  *   ERROR_BOTH — both throw (not an ANSI issue; environment/fixture)
  *   FLAKY      — ANSI-off is not self-reproducible (excluded from grading)
  *
  * Usage: runMain graft.DevAnsiSweep /root/testdata/sf0.001 [only,names]
  */
object DevAnsiSweep {
  private def cell(v: Any): String = v match {
    case null => "∅"
    case a: Array[Byte] => java.util.Base64.getEncoder.encodeToString(a)
    case a: Array[_] => a.map(cell).mkString("[", ",", "]")
    case s: collection.Seq[_] => s.map(cell).mkString("[", ",", "]")
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => cell(k) + "→" + cell(x) }.toSeq.sorted
        .mkString("{", ",", "}")
    case r: Row => r.toSeq.map(cell).mkString("(", ",", ")")
    case d: Double => java.lang.Double.toHexString(d) // bit-exact
    case f: Float => java.lang.Float.toHexString(f)
    case x => x.toString
  }

  /** Canonical (column-order-free, row-order-free) content hash. */
  private def canon(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
    val lines = rows.map(_.toSeq.map(cell).mkString("")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update(l.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString + s" (${rows.length} rows)"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only = args.lift(1).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String, fn: (SparkSession, String) => DataFrame,
            ansi: Boolean): Try[String] = {
      spark.conf.set("spark.sql.ansi.enabled", ansi.toString)
      // Queries must not capture the conf before we set it: each call
      // re-builds the plan, so analysis-time Cast/TryEval modes re-read it.
      Try(canon(fn(spark, sfDir)))
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    var okN, diffN, errOnN, errBothN, flakyN = 0
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val off = run(name, fn, ansi = false)
      val on = run(name, fn, ansi = true)
      val verdict = (off, on) match {
        case (Success(a), Success(b)) if a == b => okN += 1; "OK"
        case (Success(a), Success(b)) =>
          // rule out nondeterminism before blaming ANSI
          val off2 = run(name, fn, ansi = false)
          if (off2 != off) { flakyN += 1; s"FLAKY off1=$a off2=${off2.getOrElse("err")}" }
          else { diffN += 1; s"DIFF off=$a on=$b" }
        case (Success(_), Failure(e)) =>
          errOnN += 1
          s"ERROR_ON ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}"
        case (Failure(e), _) =>
          errBothN += 1
          s"ERROR_BOTH ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}"
      }
      println(s"[ansi] $name: $verdict")
    }
    println(s"[ansi] SUMMARY ok=$okN diff=$diffN error_on=$errOnN " +
      s"error_both=$errBothN flaky=$flakyN of ${names.size}")
    spark.stop()
    if (diffN + errOnN + errBothN > 0) sys.exit(1)
  }
}
