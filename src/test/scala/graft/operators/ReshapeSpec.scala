package graft.operators

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the argmax / unpivot / resample queries that the
  * driver's value-hash can't express. */
class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("argmax_agg picks each customer's lexicographic-max order") {
    val got = Registry.all("argmax_agg").fn(spark, sfDir)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val want = Tables.load(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (ck, rows) =>
        val best = rows.maxBy(r => (r._3, r._2))
        ck -> (best._2, best._3)
      }
    assert(got == want)
  }

  test("unpivot_melt is an exact 4x reshape with no value drift") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val out = Registry.all("unpivot_melt").fn(spark, sfDir)
    assert(out.count() == li.count() * 4)
    // Sum per measure equals the column sum it came from.
    val sums = out.groupBy("measure").agg(sum("val").as("s"))
      .as[(String, Double)].collect().toMap
    val direct = li.agg(sum("l_quantity"), sum("l_extendedprice"),
      sum("l_discount"), sum("l_tax"))
      .as[(Double, Double, Double, Double)].head()
    assert(math.abs(sums("l_quantity") - direct._1) < 1e-6)
    assert(math.abs(sums("l_extendedprice") - direct._2) < 1e-4)
    assert(math.abs(sums("l_discount") - direct._3) < 1e-6)
    assert(math.abs(sums("l_tax") - direct._4) < 1e-6)
  }

  test("topk_per_group emits at most 3 rows per customer, " +
      "rank-contiguous") {
    val out = Registry.all("topk_per_group").fn(spark, sfDir)
      .as[(Long, Long, Double, Int)].collect().groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
      // ranks follow price desc
      assert(rows.sortBy(_._4).map(_._3).sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      })
    }
  }

  test("group_split keeps every customer wholly on one side at a " +
      "plausible group ratio") {
    val out = Registry.all("group_split").fn(spark, sfDir)
      .as[(Long, Long, String)].collect()
    val byCust = out.groupBy(_._2)
    assert(byCust.forall(_._2.map(_._3).distinct.length == 1))
    val trainFrac = byCust.count(_._2.head._3 == "train").toDouble /
      byCust.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"frac=$trainFrac")
  }

  test("resample_ffill spans each user's range gapless with no " +
      "nulls after the first observation") {
    val out = Registry.all("resample_ffill").fn(spark, sfDir)
      .as[(Long, java.sql.Timestamp, Option[Double])].collect()
      .groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      val hours = rows.map(_._2.getTime).sorted
      // Gapless hourly spine.
      hours.sliding(2).foreach { case Array(a, b) =>
        assert(b - a == 3600000L)
      case _ => }
      // First bucket holds a real observation → nothing is ever null.
      assert(rows.forall(_._3.isDefined))
    }
  }

  test("grouping_sets_agg emits exactly the three requested set " +
    "shapes and each marginal sums to the grand total") {
    val out = Registry.all("grouping_sets_agg").fn(spark, sfDir)
      .select($"o_orderstatus", $"o_orderpriority", $"n")
      .as[(Option[String], Option[String], Long)].collect()
    val total = Tables.load(spark, sfDir, "orders").count()
    val byStatus = out.filter(r => r._1.isDefined && r._2.isEmpty)
    val byPrio = out.filter(r => r._1.isEmpty && r._2.isDefined)
    val grand = out.filter(r => r._1.isEmpty && r._2.isEmpty)
    // no (status, priority) cross cells — the shape CUBE would add
    assert(out.forall(r => r._1.isEmpty || r._2.isEmpty))
    assert(byStatus.map(_._3).sum === total)
    assert(byPrio.map(_._3).sum === total)
    assert(grand.map(_._3).toSeq === Seq(total))
  }

  test("sample_per_group takes min(100, group size) rows per status " +
    "with dense ranks") {
    val out = Registry.all("sample_per_group").fn(spark, sfDir)
    val sizes = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    val got = out.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("k"), max("sample_rank").as("hi"),
        countDistinct("sample_rank").as("d"))
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === sizes.keySet)
    got.foreach { case (st, k, hi, d) =>
      val exp = math.min(100L, sizes(st))
      assert(k === exp && hi === exp && d === exp, s"status $st")
    }
  }
}
