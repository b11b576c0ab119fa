package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Graft.table

/** Relational operator coverage: scans, filters, projections, hash/broadcast
  * joins, semi/anti joins, aggregates (incl. distinct, rollup, having),
  * windows (ranking + running frames), sorts/top-k, set ops, scalar
  * functions, CASE, scalar subqueries.
  *
  * Conventions shared with the DuckDB oracles (the driver hash-compares):
  *  - every double aggregate is ROUNDed identically on both sides;
  *  - every output carries a deterministic ORDER BY with a unique tiebreak;
  *  - DuckDB integer SUM/COUNT are CAST back to BIGINT to match Spark types.
  *
  * Scale notes: fact-fact joins shuffle on their keys and rely on AQE for
  * skew; genuinely bounded dims (region 5 rows, nation 25 rows) are
  * broadcast explicitly; everything else is left to Catalyst/AQE so the
  * same plan survives a 100x scale-up.
  */
object Relational {

  private def r2(c: Column): Column = round(c, 2)
  private def r6(c: Column): Column = round(c, 6)

  /** TIMESTAMP_NTZ literal (the testdata timestamps are tz-less): a
    * string literal would force a cast onto the column and defeat parquet
    * filter pushdown.
    */
  private def ntz(date: String): Column =
    lit(java.time.LocalDate.parse(date).atStartOfDay())

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: full-scan group-by aggregate; Catalyst plans
    // partial+final HashAggregate, no extra shuffle beyond the group-by.
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          r2(sum($"l_quantity")).as("sum_qty"),
          r2(sum($"l_extendedprice")).as("sum_base_price"),
          r2(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("sum_disc_price"),
          r6(avg($"l_quantity")).as("avg_qty"),
          r6(avg($"l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // TPC-H Q6 shape: tight filter + scalar aggregate. Filters and the
    // 2-column projection push down to the parquet scan.
    "q2_filter_agg" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "lineitem")
        .where($"l_shipdate" >= ntz("1995-01-01") && $"l_shipdate" < ntz("1997-01-01")
          && $"l_discount" > 0.05 && $"l_quantity" < 24)
        .agg(r2(sum($"l_extendedprice" * $"l_discount")).as("revenue"))
    },

    // TPC-H Q3 shape: two hash joins + group-by + top-k by revenue.
    "q3_join_topk" -> { (s, dir) =>
      import s.implicits._
      val c = table(s, dir, "customer").where($"c_mktsegment" === "BUILDING")
      val o = table(s, dir, "orders").where($"o_orderdate" < ntz("1995-03-15"))
      val l = table(s, dir, "lineitem").where($"l_shipdate" > ntz("1995-03-15"))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(r2(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },

    // TPC-H Q5 shape: 6-way join; bounded dims nation/region broadcast.
    "q4_join_multi" -> { (s, dir) =>
      import s.implicits._
      val l = table(s, dir, "lineitem")
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val su = table(s, dir, "supplier")
      val n = broadcast(table(s, dir, "nation"))
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(su, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(n, $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(r2(sum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    },

    // Left-semi join (EXISTS).
    "q5_semi_join" -> { (s, dir) =>
      import s.implicits._
      val o = table(s, dir, "orders")
      val big = table(s, dir, "lineitem").where($"l_quantity" >= 49)
      o.join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", r2($"o_totalprice").as("totalprice"))
        .orderBy($"o_orderkey")
    },

    // Left-anti join (NOT EXISTS): orders with no high-quantity line.
    "q6_anti_join" -> { (s, dir) =>
      import s.implicits._
      val o = table(s, dir, "orders")
      val big = table(s, dir, "lineitem").where($"l_quantity" >= 49)
      o.join(big, $"o_orderkey" === $"l_orderkey", "left_anti")
        .select($"o_orderkey", $"o_orderpriority")
        .orderBy($"o_orderkey")
    },

    // Ranking: top-3 customers per market segment by acctbal. NOT a
    // segment-partitioned row_number window — mktsegment has 5 distinct
    // values, so that window would sort ALL customers through 5 reducer
    // tasks. The bounded-heap TopKByScore aggregate keeps 3 pairs per
    // (segment, partition) map-side; the exchange carries 5 x
    // #partitions x 3 rows at any table size, and the heap's
    // (score desc, id asc) order reproduces the window's tie-break.
    "q7_window_rank" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "customer")
        .select($"c_mktsegment",
          struct($"c_acctbal".as("score"), $"c_custkey".as("id")).as("p"))
        .groupBy($"c_mktsegment")
        .agg(graft.functions.VectorAggregates.topKByScore($"p", 3).as("top"))
        .select($"c_mktsegment", posexplode($"top").as(Seq("r", "e")))
        .select($"c_mktsegment", ($"r" + 1).cast("int").as("rn"),
          $"e.id".as("c_custkey"), r2($"e.score").as("acctbal"))
        .orderBy($"c_mktsegment", $"rn")
    },

    // Running-total window frame per supplier over a deterministic order.
    "q8_window_running" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "lineitem")
        .where($"l_suppkey" <= 3)
        .withColumn("running_qty", sum($"l_quantity").over(w))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          r2($"running_qty").as("running_qty"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
    },

    // Top-k by value: orderBy+limit compiles to TakeOrderedAndProject
    // (bounded-memory per-partition heaps + driver merge, no full sort).
    "q9_topk" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", r2($"l_extendedprice").as("price"))
        .orderBy($"price".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    },

    // Aggregate with DISTINCT + plain aggregates in one pass.
    "q10_agg_distinct" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "customer")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          countDistinct($"c_nationkey").as("n_nations"),
          r2(sum($"c_acctbal")).as("sum_bal"))
        .orderBy($"c_mktsegment")
    },

    // Set op: UNION (distinct) of two key sets.
    "q11_union" -> { (s, dir) =>
      import s.implicits._
      val a = table(s, dir, "orders").select($"o_custkey".as("key"))
      val b = table(s, dir, "customer").select($"c_custkey".as("key"))
      a.union(b).distinct().orderBy($"key")
    },

    // Set op: EXCEPT — buyer keys outside the BUILDING segment.
    "q12_except" -> { (s, dir) =>
      import s.implicits._
      val a = table(s, dir, "orders").select($"o_custkey".as("key"))
      val b = table(s, dir, "customer")
        .where($"c_mktsegment" === "BUILDING").select($"c_custkey".as("key"))
      a.except(b).orderBy($"key")
    },

    // Set op: INTERSECT — customers that did order.
    "q13_intersect" -> { (s, dir) =>
      import s.implicits._
      val b = table(s, dir, "customer").select($"c_custkey".as("key"))
      val a = table(s, dir, "orders").select($"o_custkey".as("key"))
      b.intersect(a).orderBy($"key")
    },

    // ROLLUP with grouping_id so the NULL super-aggregate rows are tagged.
    "q14_rollup" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "customer")
        .rollup($"c_mktsegment")
        .agg(r2(sum($"c_acctbal")).as("sum_bal"), count(lit(1)).as("n"))
        .select(coalesce($"c_mktsegment", lit("(all)")).as("segment"),
          $"sum_bal", $"n")
        .orderBy($"segment")
    },

    // Scalar function coverage: string/math/date built-ins.
    "q15_scalar_funcs" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "part")
        .select(
          $"p_partkey",
          upper($"p_brand").as("brand_u"),
          substring($"p_name", 1, 5).as("name5"),
          length($"p_name").as("name_len"),
          concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
          abs($"p_size" - 25).as("size_dist"),
          r2(floor($"p_retailprice") + lit(0.5)).as("floor_price"),
          r2(sqrt($"p_retailprice")).as("sqrt_price"))
        .orderBy($"p_partkey")
    },

    // CASE expression bucketing + aggregate over buckets.
    "q16_case_buckets" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "orders")
        .select(
          when($"o_totalprice" < 50000, "small")
            .when($"o_totalprice" < 150000, "medium")
            .otherwise("large").as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    },

    // Uncorrelated scalar subquery: orders above 1.5x the average price.
    "q17_scalar_subquery" -> { (s, dir) =>
      import s.implicits._
      val o = table(s, dir, "orders")
      val avgPrice = o.agg(avg($"o_totalprice").as("a"))
      o.join(broadcast(avgPrice))
        .where($"o_totalprice" > $"a" * 1.5)
        .select($"o_orderkey", r2($"o_totalprice").as("totalprice"))
        .orderBy($"o_orderkey")
    },

    // GROUP BY ... HAVING.
    "q18_having" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), r2(sum($"o_totalprice")).as("spend"))
        .where($"n_orders" >= 15)
        .orderBy($"o_custkey")
    },

    // Date functions: month truncation + extraction.
    "q20_datetrunc" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "orders")
        .groupBy(date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n"), r2(sum($"o_totalprice")).as("revenue"))
        .orderBy($"month")
    },

    // String function battery: replace/pad/trim/split_part/reverse.
    "q21_strings" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "part")
        .select(
          $"p_partkey",
          regexp_replace($"p_name", "[aeiou]", "").as("consonants"),
          lpad($"p_brand", 12, "_").as("padded"),
          split_part($"p_type", lit(" "), lit(1)).as("type1"),
          reverse($"p_brand").as("rev"),
          lower($"p_type").as("lo"))
        .orderBy($"p_partkey")
    },

    // Analytic window: lag — price delta between consecutive orders.
    "q22_lag" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      table(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          r2($"o_totalprice" - lag($"o_totalprice", 1).over(w)).as("delta"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // Analytic window: first/last value over a running frame.
    "q23_first_last" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "lineitem")
        .where($"l_suppkey" <= 2)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          r2(first($"l_extendedprice").over(w)).as("first_price"),
          r2(last($"l_extendedprice").over(w)).as("running_last"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
    },

    // Ranking over a total order WITHOUT the global window: a plain
    // Window.orderBy funnels the whole table through one task, so the
    // rank comes from RangeRank's two-pass shape (range repartition +
    // local rank + broadcast offsets) and NTILE/PERCENT_RANK are derived
    // from (grank, gcount) with pure column math. Same values, no
    // single-partition stage.
    "q24_ntile" -> { (s, dir) =>
      import s.implicits._
      import graft.operators.RangeRank._
      val ranked = globalRowNumber(
        table(s, dir, "orders").select($"o_orderkey", $"o_totalprice"),
        Seq($"o_totalprice", $"o_orderkey"))
      ranked.select($"o_orderkey",
          ntileFromRank($"grank", $"gcount", 4).cast("int").as("quartile"),
          round(percentRankFromRank($"grank", $"gcount"), 9).as("prank"))
        .orderBy($"o_orderkey")
    },

    // Sessionization (gaps-and-islands): 30-minute inactivity gap per
    // user over the events stream — lag + cumulative flag sum.
    "q25_sessionize" -> { (s, dir) =>
      import s.implicits._
      val raw = table(s, dir, "events")
      val ev = raw
        .select($"user_id", graft.engine.Graft.tsMillis(raw).as("t"))
      val byUser = Window.partitionBy($"user_id").orderBy($"t")
      val sess = ev
        .withColumn("gap",
          when(lag($"t", 1).over(byUser).isNull, 1)
            .when($"t" - lag($"t", 1).over(byUser) > 1800000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum($"gap").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy($"user_id")
        .agg(max($"session_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    },

    // JSON extraction from the events props column.
    "q26_json" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "events")
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), r6(avg($"k")).as("avg_k"))
        .orderBy($"event_type")
    },

    // Exact percentiles (linear interpolation) per group — the
    // HISTOGRAM form. History: percentile() buffers every value of a
    // group in ONE task's aggregation buffer (O(rows/group) heap — the
    // only observed scale failure in 13 rounds: 30x pack OOM at the
    // standing 8g); the r14 rank-based sort-window replacement was
    // memory-flat but sorted every row twice through spilling
    // WindowExec (40s at 30x, the pack's slowest gate). This form
    // aggregates to distinct (group, column, value) COUNTS first — a
    // codegen'd HashAggregate whose map-side partial combine shrinks
    // the shuffle from row count to distinct-value count (l_quantity
    // has ~50 distinct values; prices a bounded set that does NOT grow
    // with row replication) — then runs the rank bracketing over the
    // tiny histogram: cumulative count per value covers the rank
    // interval (cum-cnt, cum], so the value at sorted rank r is the
    // unique histogram row with cum-cnt < r <= cum. lo/hi at ranks
    // floor/ceil((n-1)*p)+1 and interpolation lo + frac*(hi-lo) are
    // exactly what percentile()/DuckDB quantile_cont compute, so the
    // result is bit-identical; memory is bounded by the hash-agg
    // (spills) and a window over histogram-sized data. Both percentile
    // columns ride ONE scan via inline'd (column-id, value) pairs into
    // one shared histogram.
    "q27_percentile" -> { (s, dir) =>
      import s.implicits._
      val hist = table(s, dir, "lineitem")
        .select($"l_returnflag", inline(array(
          struct(lit(1).as("_cid"), $"l_quantity".cast("double").as("_v")),
          struct(lit(2).as("_cid"), $"l_extendedprice".cast("double").as("_v")))))
        .groupBy($"l_returnflag", $"_cid", $"_v")
        .agg(count(lit(1)).as("_cnt"))
      val part = Window.partitionBy($"l_returnflag", $"_cid")
      val ranked = hist
        .withColumn("_cum", sum($"_cnt").over(part.orderBy($"_v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("_n", sum($"_cnt").over(
          part.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val pos = (col("_n") - 1) * when(col("_cid") === 1, 0.5).otherwise(0.9)
      val rkLo = floor(pos) + 1
      val rkHi = ceil(pos) + 1
      val hitLo = col("_cum") - col("_cnt") < rkLo && rkLo <= col("_cum")
      val hitHi = col("_cum") - col("_cnt") < rkHi && rkHi <= col("_cum")
      ranked
        .where(hitLo || hitHi)
        .groupBy($"l_returnflag")
        .agg(
          max(when(col("_cid") === 1 && hitLo, $"_v")).as("_lo1"),
          max(when(col("_cid") === 1 && hitHi, $"_v")).as("_hi1"),
          max(when(col("_cid") === 2 && hitLo, $"_v")).as("_lo2"),
          max(when(col("_cid") === 2 && hitHi, $"_v")).as("_hi2"),
          max(when(col("_cid") === 1, pos - floor(pos))).as("_f1"),
          max(when(col("_cid") === 2, pos - floor(pos))).as("_f2"))
        .select($"l_returnflag",
          r6(col("_lo1") + col("_f1") * (col("_hi1") - col("_lo1"))).as("median_qty"),
          r6(col("_lo2") + col("_f2") * (col("_hi2") - col("_lo2"))).as("p90_price"))
        .orderBy($"l_returnflag")
    },

    // Statistical aggregates: stddev / correlation.
    "q28_stats" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .agg(
          r6(stddev_samp($"l_quantity")).as("sd_qty"),
          r6(corr($"l_quantity", $"l_extendedprice")).as("corr_qp"))
        .orderBy($"l_linestatus")
    },

    // Full outer join with non-matching rows on both sides.
    "q29_full_outer" -> { (s, dir) =>
      import s.implicits._
      val big = table(s, dir, "orders").where($"o_totalprice" > 300000)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_big"))
      val poor = table(s, dir, "customer").where($"c_acctbal" < 1000)
        .select($"c_custkey", r2($"c_acctbal").as("acctbal"))
      big.join(poor, $"o_custkey" === $"c_custkey", "full_outer")
        .select(coalesce($"o_custkey", $"c_custkey").as("key"),
          $"n_big", $"acctbal")
        .orderBy($"key")
    },

    // Cross join (bounded dims only at scale).
    "q30_cross_join" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "nation").crossJoin(table(s, dir, "region"))
        .select($"n_name", $"r_name")
        .orderBy($"n_name", $"r_name")
    },

    // Right outer join preserving unmatched right rows.
    "q31_right_join" -> { (s, dir) =>
      import s.implicits._
      val big = table(s, dir, "orders").where($"o_totalprice" > 300000)
      table(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "right_outer")
        .select($"o_orderkey", $"c_name", r2($"o_totalprice").as("totalprice"))
        .orderBy($"o_orderkey")
    },

    // dense_rank + cume_dist: both are functions of the ORDER BY key's
    // VALUE (not row position), so ties across engines cannot diverge.
    // A per-row window over partitionBy(o_orderpriority) caps parallelism
    // at the priority cardinality (5) and sorts n/5 rows per task, so the
    // window runs over the tiny distinct (priority, status) count table
    // instead and the per-row values arrive via a broadcast equi-join:
    // dense_rank = the status's rank among the partition's distinct
    // statuses; cume_dist = running row count / partition row count —
    // the same integer division the engines' native cume_dist performs.
    "q32_dense_cume" -> { (s, dir) =>
      import s.implicits._
      val counts = table(s, dir, "orders")
        .groupBy($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      val wOrd = Window.partitionBy($"o_orderpriority").orderBy($"o_orderstatus")
      val wAll = Window.partitionBy($"o_orderpriority")
      val ranks = counts.select($"o_orderpriority", $"o_orderstatus",
        dense_rank().over(wOrd).as("drank"),
        round(sum($"cnt").over(wOrd).cast("double") /
          sum($"cnt").over(wAll), 9).as("cdist"))
      table(s, dir, "orders")
        .join(broadcast(ranks), Seq("o_orderpriority", "o_orderstatus"))
        .select($"o_orderkey", $"o_orderpriority", $"drank", $"cdist")
        .orderBy($"o_orderkey")
    },

    // CUBE: all four grouping combinations in one pass; super-aggregate
    // NULLs tagged by coalesce (the dimension values are never null).
    "q33_cube" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "customer")
        .cube($"c_mktsegment", ($"c_nationkey" % 5).as("nmod"))
        .agg(r2(sum($"c_acctbal")).as("sum_bal"), count(lit(1)).as("n"))
        .select(coalesce($"c_mktsegment", lit("(all)")).as("segment"),
          coalesce($"nmod".cast("string"), lit("(all)")).as("nation_mod"),
          $"sum_bal", $"n")
        .orderBy($"segment", $"nation_mod")
    },

    // Array aggregation: per-customer top-3 order totals as a SORTED
    // array (collect_list order is partition-dependent; the sort makes
    // it deterministic). Emitted as a '|'-joined string of fixed-2dp
    // decimals (the mm03 pattern) so the driver's pandas hash-compare —
    // which cannot sort/hash an array column — stays oracle-portable.
    "q34_array_agg" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          array_join(transform(
            slice(sort_array(collect_list($"o_totalprice"), asc = false),
              lit(1), lit(3)),
            x => round(x, 2).cast("decimal(18,2)").cast("string")),
            "|").as("top3"))
        .orderBy($"o_custkey")
    },

    // lead (forward neighbor) + nth_value (fixed frame member) — the
    // remaining analytic-function row; unique (date, key) order makes
    // both deterministic.
    "q35_lead_nth" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      table(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey",
          lead($"o_orderkey", 1).over(w).as("next_key"),
          nth_value($"o_orderkey", 2).over(wf).as("second_key"))
        .orderBy($"o_orderkey")
    },

    // PIVOT (long→wide): order-status counts as columns per priority,
    // with EXPLICIT pivot values — the values-less pivot() overload runs
    // an extra driver-side distinct job to discover them (a scale hazard
    // on a high-cardinality pivot column); the explicit list keeps the
    // whole thing one partial+final aggregate.
    "q36_pivot" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_orderpriority",
          coalesce($"F", lit(0L)).as("n_f"),
          coalesce($"O", lit(0L)).as("n_o"),
          coalesce($"P", lit(0L)).as("n_p"))
        .orderBy($"o_orderpriority")
    },

    // LISTAGG / string_agg: '|'-joined distinct market segments per
    // nation. collect_set order is partition-dependent, so the array is
    // sorted before joining — the same contract as the oracle's ORDER BY
    // inside string_agg. The per-group state is bounded by the distinct
    // segment count, not the row count.
    "q37_listagg" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")),
          $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_cust"),
          array_join(array_sort(collect_set($"c_mktsegment")), "|")
            .as("segments"))
        .orderBy($"n_name")
    },

    // RANGE frame (value-based window): per-customer trailing-7-day
    // revenue. RANGE vs ROWS matters under same-day ties — every peer
    // day joins the frame, so the result is tie-order-independent.
    // o_custkey is high-cardinality: parallelism scales with the data
    // (not the q32 low-cardinality cliff).
    "q38_range_frame" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"day")
        .rangeBetween(-6, 0)
      table(s, dir, "orders")
        .withColumn("day",
          datediff($"o_orderdate".cast("date"), to_date(lit("1970-01-01")))
            .cast("long"))
        .select($"o_orderkey", $"o_custkey", $"day",
          r2(sum($"o_totalprice").over(w)).as("rev_7d"))
        .orderBy($"o_orderkey")
    },

    // UNPIVOT (wide→long melt): numeric part attributes to (attr, val)
    // rows — the inverse of q36. Row-local generation, no shuffle; the
    // value columns are cast to one type up front (unpivot requires it).
    "q39_unpivot" -> { (s, dir) =>
      import s.implicits._
      table(s, dir, "part")
        .unpivot(
          Array($"p_partkey"),
          Array($"p_retailprice", $"p_size".cast("double").as("p_size")),
          "attr", "val")
        .select($"p_partkey", $"attr", r2($"val").as("val"))
        .orderBy($"p_partkey", $"attr")
    },

    // GROUPING SETS: two independent marginals + grand total in ONE pass (an
    // Expand node feeding one aggregate) — rollup/cube's general form;
    // the dimension values are never null so coalesce tags the
    // super-aggregate rows unambiguously.
    "q40_grouping_sets" -> { (s, dir) =>
      table(s, dir, "orders").createOrReplaceTempView("graft_q40_orders")
      s.sql("""SELECT COALESCE(o_orderpriority, '(all)') AS pri,
              |  COALESCE(o_orderstatus, '(all)') AS status,
              |  COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS revenue
              |FROM graft_q40_orders
              |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
              |ORDER BY pri, status""".stripMargin)
    },

    // Correlated-subquery shape, decorrelated: "orders 50% above their
    // own customer's average" — the per-group threshold becomes one
    // aggregate + an equi-join back, which is exactly the plan Catalyst
    // rewrites the correlated form into (and the only shape that scales:
    // a per-row subquery re-scan would be O(n) scans).
    "q41_above_avg" -> { (s, dir) =>
      import s.implicits._
      val avgs = table(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(avg($"o_totalprice").as("cavg"))
      table(s, dir, "orders")
        .join(avgs, Seq("o_custkey"))
        .where($"o_totalprice" > $"cavg" * 1.5)
        // cavg itself is NOT emitted: averages of 2-decimal money values
        // land exactly on .xx5 boundaries where double ROUND diverges
        // between engines (measured 20/3178 rows at sf0.01); membership
        // (the strict > comparison) is boundary-safe
        .select($"o_orderkey", $"o_custkey", r2($"o_totalprice").as("totalprice"))
        .orderBy($"o_orderkey")
    },

    // Salted skew-resistant join: the lineitem side spreads each join
    // key over 8 salt subkeys, orders replicate across them — the
    // explicit-salting tool for keys too hot even for AQE's skew split
    // (the "celebrity key" case; here the salting must simply be
    // RESULT-INVISIBLE, which is exactly what the plain-join oracle
    // checks). Aggregated per priority so the gate is compact.
    "q42_salted_join" -> { (s, dir) =>
      import s.implicits._
      graft.operators.SaltedJoin.inner(
          table(s, dir, "lineitem").select($"l_orderkey", $"l_extendedprice"),
          table(s, dir, "orders").select($"o_orderkey".as("l_orderkey"),
            $"o_orderpriority"),
          "l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(r2(sum($"l_extendedprice")).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },

    // ratio_to_report (share of partition total): the partition key has
    // 5 distinct values, so a per-row window would cap parallelism at 5
    // (the q32 cliff) — the totals aggregate to a 5-row table instead
    // and broadcast back; the ratio itself is row-local division.
    "q43_ratio_report" -> { (s, dir) =>
      import s.implicits._
      val totals = table(s, dir, "orders")
        .groupBy($"o_orderpriority").agg(sum($"o_totalprice").as("tot"))
      table(s, dir, "orders")
        .join(broadcast(totals), Seq("o_orderpriority"))
        .select($"o_orderkey", $"o_orderpriority",
          round($"o_totalprice" / $"tot", 9).as("share"))
        .orderBy($"o_orderkey")
    },

    // Join + window combined: each order's price rank within its customer.
    "q19_join_window" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      table(s, dir, "orders")
        .join(table(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .withColumn("rk", row_number().over(w))
        .where($"rk" === 1)
        .select($"c_custkey", $"c_name", $"o_orderkey", r2($"o_totalprice").as("best_price"))
        .orderBy($"c_custkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 6) AS avg_qty,
        |  ROUND(AVG(l_discount), 6) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_agg" ->
      """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount > 0.05 AND l_quantity < 24""".stripMargin,

    "q3_join_topk" ->
      """SELECT l_orderkey, o_orderdate,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q4_join_multi" ->
      """SELECT n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q5_semi_join" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q6_anti_join" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q7_window_rank" ->
      """SELECT c_mktsegment, rn, c_custkey, acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |         ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "q8_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  ROUND(SUM(l_quantity) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q9_topk" ->
      """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
        |FROM lineitem
        |ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q10_agg_distinct" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
        |  ROUND(SUM(c_acctbal), 2) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q11_union" ->
      """SELECT o_custkey AS key FROM orders
        |UNION SELECT c_custkey AS key FROM customer ORDER BY key""".stripMargin,

    "q12_except" ->
      """SELECT o_custkey AS key FROM orders
        |EXCEPT SELECT c_custkey AS key FROM customer
        |        WHERE c_mktsegment = 'BUILDING' ORDER BY key""".stripMargin,

    "q13_intersect" ->
      """SELECT c_custkey AS key FROM customer
        |INTERSECT SELECT o_custkey AS key FROM orders ORDER BY key""".stripMargin,

    "q14_rollup" ->
      """SELECT COALESCE(c_mktsegment, '(all)') AS segment,
        |  ROUND(SUM(c_acctbal), 2) AS sum_bal, COUNT(*) AS n
        |FROM customer GROUP BY ROLLUP(c_mktsegment) ORDER BY segment""".stripMargin,

    "q15_scalar_funcs" ->
      """SELECT p_partkey,
        |  UPPER(p_brand) AS brand_u,
        |  SUBSTR(p_name, 1, 5) AS name5,
        |  CAST(LENGTH(p_name) AS INT) AS name_len,
        |  CONCAT(p_brand, '-', p_type) AS brand_type,
        |  ABS(p_size - 25) AS size_dist,
        |  ROUND(FLOOR(p_retailprice) + 0.5, 2) AS floor_price,
        |  ROUND(SQRT(p_retailprice), 2) AS sqrt_price
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q16_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS bucket, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q17_scalar_subquery" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
        |ORDER BY o_orderkey""".stripMargin,

    "q18_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  ROUND(SUM(o_totalprice), 2) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,

    "q20_datetrunc" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |  COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "q21_strings" ->
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
        |  lpad(p_brand, 12, '_') AS padded,
        |  split_part(p_type, ' ', 1) AS type1,
        |  reverse(p_brand) AS rev,
        |  lower(p_type) AS lo
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q22_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(o_totalprice - LAG(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q23_first_last" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  ROUND(FIRST_VALUE(l_extendedprice) OVER w, 2) AS first_price,
        |  ROUND(LAST_VALUE(l_extendedprice) OVER w, 2) AS running_last
        |FROM lineitem WHERE l_suppkey <= 2
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q24_ntile" ->
      """SELECT o_orderkey,
        |  CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile,
        |  ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 9) AS prank
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q25_sessionize" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts)//1000000 AS t FROM events),
        |flagged AS (SELECT user_id, t,
        |  CASE WHEN LAG(t, 1) OVER (PARTITION BY user_id ORDER BY t) IS NULL THEN 1
        |       WHEN t - LAG(t, 1) OVER (PARTITION BY user_id ORDER BY t) > 1800000 THEN 1
        |       ELSE 0 END AS gap
        |  FROM ev),
        |sess AS (SELECT user_id,
        |  SUM(gap) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
        |       COUNT(*) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q26_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q27_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q28_stats" ->
      """SELECT l_linestatus,
        |  ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q29_full_outer" ->
      """SELECT COALESCE(b.o_custkey, p.c_custkey) AS key, b.n_big, p.acctbal
        |FROM (SELECT o_custkey, COUNT(*) AS n_big FROM orders
        |      WHERE o_totalprice > 300000 GROUP BY o_custkey) b
        |FULL OUTER JOIN (SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        |      FROM customer WHERE c_acctbal < 1000) p
        |  ON b.o_custkey = p.c_custkey
        |ORDER BY key""".stripMargin,

    "q30_cross_join" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin,

    "q31_right_join" ->
      """SELECT o_orderkey, c_name, ROUND(o_totalprice, 2) AS totalprice
        |FROM customer RIGHT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        |  ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q32_dense_cume" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority
        |       ORDER BY o_orderstatus) AS INT) AS drank,
        |  ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority
        |                          ORDER BY o_orderstatus), 9) AS cdist
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q33_cube" ->
      """SELECT COALESCE(c_mktsegment, '(all)') AS segment,
        |  COALESCE(CAST(nmod AS VARCHAR), '(all)') AS nation_mod,
        |  ROUND(SUM(c_acctbal), 2) AS sum_bal, COUNT(*) AS n
        |FROM (SELECT c_mktsegment, c_nationkey % 5 AS nmod, c_acctbal
        |      FROM customer)
        |GROUP BY CUBE(c_mktsegment, nmod)
        |ORDER BY segment, nation_mod""".stripMargin,

    "q34_array_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  array_to_string(list_transform(
        |    (list(o_totalprice ORDER BY o_totalprice DESC))[1:3],
        |    x -> CAST(CAST(ROUND(x, 2) AS DECIMAL(18,2)) AS VARCHAR)),
        |    '|') AS top3
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q35_lead_nth" ->
      """SELECT o_orderkey, o_custkey,
        |  LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS next_key,
        |  NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_key
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q36_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
        |       AS BIGINT) AS n_f,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)
        |       AS BIGINT) AS n_o,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
        |       AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q37_listagg" ->
      """WITH j AS (SELECT n_name, c_mktsegment
        |           FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |d AS (SELECT DISTINCT n_name, c_mktsegment FROM j),
        |c AS (SELECT n_name, COUNT(*) AS n_cust FROM j GROUP BY n_name)
        |SELECT n_name, n_cust,
        |  string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segments
        |FROM d JOIN c USING (n_name)
        |GROUP BY n_name, n_cust ORDER BY n_name""".stripMargin,

    "q38_range_frame" ->
      """SELECT o_orderkey, o_custkey, day,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice,
        |        date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |          AS day
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q39_unpivot" ->
      """SELECT p_partkey, attr, ROUND(val, 2) AS val FROM (
        |  SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part)
        |ORDER BY p_partkey, attr""".stripMargin,

    "q40_grouping_sets" ->
      """SELECT COALESCE(o_orderpriority, '(all)') AS pri,
        |  COALESCE(o_orderstatus, '(all)') AS status,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY pri, status""".stripMargin,

    "q41_above_avg" ->
      """WITH a AS (SELECT o_custkey, AVG(o_totalprice) AS cavg
        |           FROM orders GROUP BY o_custkey)
        |SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
        |FROM orders JOIN a USING (o_custkey)
        |WHERE o_totalprice > cavg * 1.5
        |ORDER BY o_orderkey""".stripMargin,

    "q42_salted_join" ->
      """SELECT o_orderpriority,
        |  ROUND(SUM(l_extendedprice), 2) AS revenue, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q43_ratio_report" ->
      """SELECT o_orderkey, o_orderpriority,
        |  ROUND(o_totalprice / SUM(o_totalprice)
        |    OVER (PARTITION BY o_orderpriority), 9) AS share
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q19_join_window" ->
      """SELECT c_custkey, c_name, o_orderkey, best_price FROM (
        |  SELECT c_custkey, c_name, o_orderkey,
        |    ROUND(o_totalprice, 2) AS best_price,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rk = 1 ORDER BY c_custkey""".stripMargin
  )
}
