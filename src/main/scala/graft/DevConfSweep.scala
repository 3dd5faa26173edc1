package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.util.{Failure, Success, Try}

/** Dev harness: run every registered query under a BASE vs ALT session
  * config and diff the results. A library caller on a real cluster does
  * not copy this repo's session pins, so every axis here is a divergence
  * a user could actually hit:
  *
  *   ansi       — Spark 4.x defaults `spark.sql.ansi.enabled=true`; the
  *                r11 sweep caught the whole minhash family throwing
  *                ARITHMETIC_OVERFLOW there (fixed via WrapArith's
  *                EvalMode.LEGACY pin). Alt = ansi on.
  *   codegen    — interpreted evaluation (`factoryMode=NO_CODEGEN`,
  *                wholeStage off) must agree with generated code: every
  *                graftx expression ships a hand-written doGenCode whose
  *                nullSafeEval twin is otherwise only lightly exercised.
  *   partitions — results must be shuffle-partition-count INVARIANT:
  *                AQE resizes exchanges at runtime and no two clusters
  *                run the same width, so any result that depends on the
  *                session partition count is broken at scale. Alt = a
  *                coprime odd count (7 vs the base 8).
  *   aqe        — adaptive execution off vs on.
  *
  * Verdicts per query:
  *   OK         — both configs succeed, canonical result hash identical
  *   DIFF       — both succeed, results differ (config-dependent output)
  *   ERROR_ALT  — alt config throws where base succeeds (caller crash)
  *   ERROR_BOTH — both throw (not this axis; environment/fixture)
  *   FLAKY      — base is not self-reproducible (excluded from grading)
  *
  * Usage: runMain graft.DevConfSweep <axis> /root/testdata/sf0.001 [only]
  */
object DevConfSweep {
  /** axis → (base confs, alt confs); every key is runtime-settable. */
  private val axes: Map[String, (Map[String, String], Map[String, String])] =
    Map(
      "ansi" -> (Map("spark.sql.ansi.enabled" -> "false"),
        Map("spark.sql.ansi.enabled" -> "true")),
      "codegen" -> (Map(
        "spark.sql.codegen.wholeStage" -> "true",
        "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY"),
        Map(
          "spark.sql.codegen.wholeStage" -> "false",
          "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")),
      "partitions" -> (Map("spark.sql.shuffle.partitions" -> "8"),
        Map("spark.sql.shuffle.partitions" -> "7")),
      "aqe" -> (Map("spark.sql.adaptive.enabled" -> "true"),
        Map("spark.sql.adaptive.enabled" -> "false")),
      // a cluster where no join auto-broadcasts (dims past the driver
      // budget): the planner falls back to shuffle joins everywhere an
      // explicit broadcast() hint isn't pinned — values must not move
      "broadcast" -> (Map(),
        Map("spark.sql.autoBroadcastJoinThreshold" -> "-1")))

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
    val lines = rows.map(_.toSeq.map(cell).mkString("")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update(l.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString + s" (${rows.length} rows)"
  }

  def main(args: Array[String]): Unit = {
    val axis = args(0)
    val (baseConf, altConf) = axes.getOrElse(axis,
      sys.error(s"unknown axis '$axis' — one of ${axes.keys.mkString(",")}"))
    val sfDir = args(1)
    val only = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn: (SparkSession, String) => DataFrame,
            confs: Map[String, String]): Try[String] = {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // Queries re-build their plan per call, so analysis-time modes
      // (Cast eval mode, codegen factory) re-read the conf we just set.
      try Try(canon(fn(spark, sfDir)))
      finally confs.keys.foreach(spark.conf.unset)
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    var okN, diffN, errAltN, errBothN, flakyN = 0
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val base = run(fn, baseConf)
      val alt = run(fn, altConf)
      val verdict = (base, alt) match {
        case (Success(a), Success(b)) if a == b => okN += 1; "OK"
        case (Success(a), Success(b)) =>
          // rule out nondeterminism before blaming the axis
          val base2 = run(fn, baseConf)
          if (base2 != base) {
            flakyN += 1
            s"FLAKY base1=$a base2=${base2.getOrElse("err")}"
          } else { diffN += 1; s"DIFF base=$a alt=$b" }
        case (Success(_), Failure(e)) =>
          errAltN += 1
          s"ERROR_ALT ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1)
              .mkString
        case (Failure(e), _) =>
          errBothN += 1
          s"ERROR_BOTH ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1)
              .mkString
      }
      println(s"[conf:$axis] $name: $verdict")
    }
    println(s"[conf:$axis] SUMMARY ok=$okN diff=$diffN error_alt=$errAltN " +
      s"error_both=$errBothN flaky=$flakyN of ${names.size}")
    spark.stop()
    if (diffN + errAltN + errBothN > 0) sys.exit(1)
  }
}
