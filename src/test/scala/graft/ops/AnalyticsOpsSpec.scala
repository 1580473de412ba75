package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q103–q105 (histogram, triangles, retention): plain-Scala replays
  * plus the structurally known triangle count.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q103 equals a plain-Scala equi-width histogram replay") {
    val xs = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_extendedprice").as[Double].collect().toSeq
    val (mn, mx) = (xs.min, xs.max)
    def bucket(x: Double): Long =
      math.min(19L, math.floor(((x - mn) * 20.0) / (mx - mn)).toLong)
    val byB = xs.groupBy(bucket)
    val expect = byB.toSeq.map { case (b, vs) =>
      // decimal-routed sum, 6 dp — Tables.dsum's arithmetic
      val sum = vs.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      (b, mn + (b.toDouble * (mx - mn)) / 20.0,
        mn + ((b + 1).toDouble * (mx - mn)) / 20.0, vs.size.toLong, sum)
    }.sortBy(_._1)
    val got = Relational.q103Histogram(spark, dir)
      .as[(Long, Double, Double, Long, Double)].collect().toSeq
    assert(got === expect)
    assert(got.map(_._4).sum === xs.size.toLong) // nothing dropped
  }

  test("q104 counts exactly two triangles per long-enough document") {
    val eligible = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .filter { case (_, t) =>
        t.toLowerCase.replaceAll("\\s+", " ").trim.length >= 130
      }.map(_._1).sorted
    val got = GenomicsCatalog.q104Triangles(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(got === eligible.map(_ -> 2L))
  }

  test("q107 equals a plain-Scala rolling z-score replay") {
    // sf0.01: the sf0.001 stream carries ~7 events/type/frame and
    // max |z| = (n−1)/√n < 3 — nothing is flaggable at that scale
    val dir = "/root/testdata/sf0.01"
    val events = graft.ops.Tables.eventsTsUs(spark, dir)
      .select($"event_id", $"event_type", $"ts_us", $"value")
      .as[(Long, String, Long, Double)].collect().toSeq
      .map { case (id, tpe, ts, v) =>
        (id, tpe, ts, if (id % 997 == 0) v * 20.0 else v)
      }
    def dec(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expect = events.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      es.map { case (id, tpe, ts, v) =>
        val frame = es.filter(e => e._3 >= ts - 86400000000L && e._3 <= ts)
        val n = frame.size.toDouble
        val sumv = frame.map(e => dec(e._4)).sum.toDouble
        val sumsq = frame.map(e => dec(e._4 * e._4)).sum.toDouble
        val varr = (sumsq - (sumv * sumv) / n) / (n - 1)
        val z = if (frame.size >= 2 && varr > 0)
          Some((v - sumv / n) / math.sqrt(varr)) else None
        (id, tpe, ts, v, frame.size.toLong, z)
      }
    }.collect { case (id, tpe, ts, v, n, Some(z)) if math.abs(z) > 3 =>
      (id, tpe, ts, v, n, z)
    }.sortBy { case (id, tpe, ts, _, _, _) => (tpe, ts, id) }
    val got = Text.q107Anomaly(spark, dir)
      .as[(Long, String, Long, Double, Long, Double)].collect().toSeq
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q109 equals a plain-Scala DAU/WAU replay") {
    val act = graft.ops.Tables.eventsTsUs(spark, dir)
      .select($"user_id", expr("ts_us div 86400000000").as("day"))
      .as[(Long, Long)].collect().toSeq.distinct
    val dau = act.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val wau = act.flatMap { case (u, d) => (0 to 6).map(o => (u, d + o)) }
      .distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expect = dau.keys.toSeq.sorted.map(d =>
      (d, dau(d), wau(d), dau(d).toDouble / wau(d).toDouble))
    val got = Text.q109RollingActive(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === expect)
    // WAU always covers at least the day's own actives
    got.foreach { case (_, d, w, s0) =>
      assert(w >= d && s0 <= 1.0)
    }
  }

  test("q110 finds exactly the planted violations on the clean corpus") {
    val got = Relational.q110DqReport(spark, dir)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      ("lineitem", "discount_in_[0,1]", 0L, true),
      ("lineitem", "negative_price", 2L, false),
      ("lineitem", "null_order_key", 0L, true),
      ("lineitem", "orphan_order_key", 1L, false),
      ("orders", "unique_order_key", 0L, true)))
  }

  test("q111 equals a plain-Scala transition-matrix replay") {
    val events = graft.ops.Tables.eventsTsUs(spark, dir)
      .select($"user_id", $"event_type", $"ts_us", $"event_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    val pairs = events.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._3, e._4)).map(_._2).sliding(2).collect {
        case Seq(a, b) => (a, b)
      }
    }.toSeq
    val counted = pairs.groupBy(identity).view.mapValues(_.size.toLong)
    val rowTotals = pairs.groupBy(_._1).view.mapValues(_.size.toLong)
    val expect = counted.toSeq.map { case ((a, b), n) =>
      (a, b, n, n.toDouble / rowTotals(a).toDouble)
    }.sortBy { case (a, b, _, _) => (a, b) }
    val got = Text.q111Transitions(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === expect)
    // probabilities row-normalize to 1
    got.groupBy(_._1).values.foreach(rows =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9))
  }

  test("q112 incremental merge equals a direct full recompute") {
    val got = Relational.q112IncrementalAgg(spark, dir)
      .as[(String, String, Long, Double, Double)].collect().toSeq
    val full = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(28,6)")).cast("double")
          .as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(28,6)")).cast("double")
          .as("sum_price"))
      .orderBy($"l_returnflag", $"l_linestatus")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(got === full)
    // the staged state really is a strict subset of the corpus
    val staged = spark.read.parquet(s"${Dedup.stageRoot(dir)}/agg_state")
      .agg(sum($"n")).as[Long].head()
    assert(staged < got.map(_._3).sum && staged > 0)
  }

  test("q114 equals a plain-Scala chi-square replay") {
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select($"event_type", $"value").as[(String, Double)].collect().toSeq
    val (mn, mx) = (events.map(_._2).min, events.map(_._2).max)
    def bucket(v: Double): Long =
      math.min(3L, math.floor(((v - mn) * 4.0) / (mx - mn)).toLong)
    val cells = events.groupBy { case (t, v) => (t, bucket(v)) }
      .view.mapValues(_.size.toLong).toMap
    val rowT = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colT = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nT = cells.values.sum
    val expect = cells.toSeq.map { case ((t, b), o) =>
      val e = (rowT(t).toDouble * colT(b).toDouble) / nT.toDouble
      (t, b, o, e, ((o.toDouble - e) * (o.toDouble - e)) / e)
    }.sortBy { case (t, b, _, _, _) => (t, b) }
    val got = Text.q114ChiSquare(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got === expect)
  }

  test("q107's prefix-sum decomposition equals the naive RANGE window on adversarial data") {
    // the committed form replaced the O(rows × frame) moving-frame
    // window (SCALING.md); this pins value-equality against the naive
    // spelling on data built to stress the decomposition: heavy ts
    // ties (integer-division timestamps), frame-empty leading rows,
    // and spikes — 2,000 random events, seeded
    import org.apache.spark.sql.expressions.{Window => W}
    val rng = new scala.util.Random(7)
    val rows = (1 to 2000).map { i =>
      (i.toLong, s"t${rng.nextInt(3)}",
        (rng.nextInt(200) * 86400000000L / 64) + rng.nextInt(3), // dense ties
        if (rng.nextInt(50) == 0) rng.nextDouble() * 1000 else rng.nextDouble())
    }
    val tmp = java.nio.file.Files.createTempDirectory("q107eq").toString
    rows.toDF("event_id", "event_type", "ts_us", "value")
      .select($"event_id", $"event_type", ($"ts_us" * 1000).as("ts"),
        $"value", lit("{}").as("props"), lit(0L).as("user_id"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Text.q107Anomaly(spark, tmp)
      .as[(Long, String, Long, Double, Long, Double)].collect().toSeq
    // naive spelling, test-only (the 61 s form — fine on 2k rows)
    val e = graft.ops.Tables.eventsTsUs(spark, tmp)
      .select($"event_id", $"event_type", $"ts_us",
        when($"event_id" % 997 === 0, $"value" * 20.0)
          .otherwise($"value").as("value"))
    val w = W.partitionBy($"event_type").orderBy($"ts_us")
      .rangeBetween(-86400000000L, 0)
    val dec = "decimal(28,6)"
    val sumv = sum($"value".cast(dec)).over(w).cast("double")
    val sumsq = sum(($"value" * $"value").cast(dec)).over(w).cast("double")
    val n = count(lit(1)).over(w).cast("double")
    val varr = (sumsq - (sumv * sumv) / n) / (n - 1)
    val naive = e.withColumn("n_frame", count(lit(1)).over(w))
      .withColumn("z", when($"n_frame" >= 2 && varr > 0,
        ($"value" - sumv / n) / sqrt(varr)))
      .where(abs($"z") > 3)
      .select($"event_id", $"event_type", $"ts_us", $"value", $"n_frame", $"z")
      .orderBy($"event_type", $"ts_us", $"event_id")
      .as[(Long, String, Long, Double, Long, Double)].collect().toSeq
    assert(got === naive)
    assert(got.nonEmpty) // the planted spikes must flag on this stream
  }

  test("q105 equals a plain-Scala cohort-retention replay") {
    val act = graft.ops.Tables.eventsTsUs(spark, dir)
      .select($"user_id", expr("ts_us div 86400000000").as("day"))
      .as[(Long, Long)].collect().toSeq.distinct
    val cohort = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = act.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
      .view.mapValues(_.size.toLong).toMap
    val expect = cells.toSeq.map { case ((c, o), n) =>
      (c, o, n, n.toDouble / cells((c, 0L)).toDouble)
    }.sortBy { case (c, o, _, _) => (c, o) }
    val got = Text.q105Retention(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === expect)
    // day-0 retention is exactly 1.0 for every cohort
    got.filter(_._2 == 0L).foreach(r => assert(r._4 === 1.0))
  }
}
