package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent per partition SPLIT, so the selected
  * set changes whenever the input repartitions — useless for
  * reproducible corpus curation. These operators key the decision on a
  * content hash of a stable key column instead: the same row is selected
  * on any cluster layout, any partition count, any engine (the md5
  * basis is the same one the DuckDB oracles share — see
  * TextFunctions.shingleHashes).
  *
  * Scale shape: hashSample is a pure row-local filter (no shuffle, fully
  * pushdown-friendly for the surviving columns); stratifiedTopN
  * range-partitions on (stratum, hash) and ranks via the grouped prefix
  * sum — parallelism never caps at the stratum count, and there is no
  * global ordering anywhere.
  */
object Sampling {

  /** 60-bit deterministic hash of a key column (first 15 md5 hex digits
    * — bit-identical in DuckDB: CAST(('0x'||substr(md5(k),1,15)) AS BIGINT)).
    */
  def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Keep ~fraction of rows, decided per row by hash bucket: stable
    * under repartitioning, joins, and engine changes. `buckets` sets the
    * resolution (fraction rounds to 1/buckets steps).
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      buckets: Int = 10000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    val cut = math.round(fraction * buckets)
    df.where(pmod(keyHash(key), lit(buckets)) < cut)
  }

  /** Weighted deterministic sample: row i survives with probability
    * `weight_i` (clamped to [0,1]), decided by comparing its hash bucket
    * against a per-row cutoff — quality-weighted corpus downsampling
    * where good documents keep a higher retention rate. Same stability
    * contract as [[hashSample]] (row-local, layout-independent), weight
    * resolution 1/buckets.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      buckets: Int = 10000): DataFrame = {
    val cut = round(greatest(lit(0.0), least(weight, lit(1.0))) * buckets)
    df.where(pmod(keyHash(key), lit(buckets)) < cut)
  }

  /** Cluster-balanced subsampling: cap every cluster's contribution at
    * `cap` rows, the kept subset chosen by the stable content hash —
    * unbiased within the cluster and layout/engine independent, like
    * every sampler here. With `cellCol` = a semantic cluster id
    * (IvfIndex.transform over an embedding column is the row-local
    * way to get one), head clusters — boilerplate genres, dominant
    * topics — stop drowning the mixture while tail clusters pass
    * through whole: the diversity-flattening move cluster-dedup
    * pipelines apply after assignment.
    *
    * `key` must be unique per row (it breaks hash ties; a duplicate
    * key would tie and rank layout-dependently).
    *
    * Scale shape: the within-cluster rank is RangeRank.groupedCumSum —
    * range-partitioned on (cell, hash, key), so parallelism never caps
    * at the cluster count and a mega-cluster never funnels through one
    * task; the cap is then a row-local filter.
    */
  def clusterCap(df: DataFrame, key: Column, cellCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    require(!df.columns.contains("_cb1"),
      "input must not carry the reserved column _cb1")
    RangeRank.groupedCumSum(
        df.withColumn("_cb1", lit(1L)),
        Seq(cellCol), Seq(keyHash(key), key), "_cb1")
      .where(col("gcum") < cap)
      .drop("gcum", "_cb1")
  }

  /** Deterministic seeded global shuffle: returns `df` plus `pos` — the
    * row's 1-based position in a pseudorandom permutation keyed by
    * (seed, key). Training pipelines need a reproducible corpus order
    * (same seed → same order on any layout, any cluster, any engine);
    * changing the seed re-deals the whole permutation because the seed
    * is hashed WITH the key, not used as an offset.
    *
    * `key` MUST be unique per row: the permutation order is the total
    * order (hash, key), and duplicate keys tie — tied rows would rank
    * in partition-arrival order, which is exactly the layout dependence
    * this operator exists to prevent.
    *
    * Scale shape: the permutation rank comes from
    * `RangeRank.globalRowNumber` — range-partition on (hash, key), rank
    * locally, broadcast per-partition offsets back. The only
    * global-order work touches #partitions rows; a
    * `Window.orderBy(hash)` formulation would funnel the corpus
    * through one task.
    */
  def shuffleOrder(df: DataFrame, key: Column, seed: Long): DataFrame = {
    val reserved = Set("_h", "pos", "grank", "gcount")
    require(!df.columns.exists(reserved),
      s"input must not carry the reserved columns ${reserved.mkString(", ")}")
    val h = keyHash(concat(lit(seed.toString), lit(":"), key.cast("string")))
    RangeRank.globalRowNumber(df.withColumn("_h", h), Seq(col("_h"), key))
      .withColumnRenamed("grank", "pos")
      .drop("_h", "gcount")
  }

  /** Temperature-flattened domain mixture (the multilingual-pretraining
    * rebalance): domain d is sampled toward share `n_d^tau / sum n^tau`,
    * so tau = 1 keeps the natural distribution and tau < 1 upweights
    * small domains at the expense of large ones. Per-domain retention
    * rate `r_d = min(1, targetFraction * N * n_d^tau / (sum n^tau * n_d))`
    * — the clamp means oversubscribed small domains keep everything
    * (rates cannot exceed 1 without replication), the standard
    * single-pass approximation. Row decisions are the same stable
    * hash-bucket test as [[hashSample]], with a FLOOR cutoff (never
    * keeps more than the rate, where the fixed-fraction samplers
    * round): one metadata-sized aggregate, then a row-local filter.
    */
  def temperatureMix(df: DataFrame, domain: Column, key: Column,
      tau: Double, targetFraction: Double, buckets: Int = 10000): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    require(targetFraction >= 0 && targetFraction <= 1,
      s"targetFraction out of range: $targetFraction")
    val cols = df.columns
    // persisted: the totals aggregate below re-evaluates this subtree
    // otherwise (exchange reuse does not kick in — the RangeRank trap),
    // and each evaluation is a full corpus scan
    val counts = graft.engine.Caches.track(
      df.groupBy(domain.as("_dom")).agg(count(lit(1)).as("_n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tot = counts.agg(sum(col("_n")).cast("double").as("_tn"),
      sum(pow(col("_n").cast("double"), tau)).as("_tp"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("_dom").as("_dom_r"),
        least(lit(1.0), lit(targetFraction) * col("_tn") *
          pow(col("_n").cast("double"), tau) /
          (col("_tp") * col("_n").cast("double"))).as("_rate"))
    // null-safe join: a null domain is a real group in `counts` and
    // holds probability mass, so it must match its rate row back — an
    // equality join would silently drop those rows and under-fill.
    df.withColumn("_dom", domain)
      .join(broadcast(rates), col("_dom") <=> col("_dom_r"))
      .where(pmod(keyHash(key), lit(buckets)) <
        floor(col("_rate") * buckets))
      .select(cols.head, cols.tail: _*)
  }

  /** UniMax domain sampling (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute a total row budget UNIFORMLY across
    * domains, except no domain repeats more than `maxEpochs` times —
    * the published fairer alternative to temperature mixing (pp08),
    * which over-samples head domains at any τ > 0.
    *
    * The allocation is classic water-filling over the per-domain counts:
    * sort domains by their epoch cap (maxEpochs·n) ascending; a prefix
    * saturates at its cap, the rest split the remaining budget evenly.
    * The level θ satisfies Σ min(capᵢ, θ) = budget, so a domain's quota
    * is min(capᵢ, θ) and its sampling rate quota/n ∈ (0, maxEpochs].
    * Rates above 1 mean REPLICATION: a row emits floor(rate) full-epoch
    * copies plus one more iff its hash bucket clears the fractional
    * part — the same stable content-hash test as [[hashSample]], so the
    * realized corpus is layout- and engine-independent. Output carries
    * an `epoch` column (1-based copy index).
    *
    * Scale shape: the water-filling runs entirely on the #domains-row
    * count table (its windows order DOMAINS, never data rows — the pp03
    * allocation precedent); rates broadcast back; the per-row decision
    * and the copy explode are row-local, with output bounded by
    * budget + #domains rows. The budget is met to hash-bucket
    * resolution (1/buckets per domain), exact when every rate is
    * integral.
    */
  def unimax(df: DataFrame, domain: Column, key: Column, budgetRows: Long,
      maxEpochs: Double, buckets: Int = 10000): DataFrame = {
    require(budgetRows > 0, s"budgetRows must be positive: $budgetRows")
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    val cols = df.columns
    val counts = df.groupBy(domain.as("_dom")).agg(count(lit(1)).as("_n"))
    // windows over the #domains-row table only; the deliberate
    // single-partition ordering is metadata-sized by construction
    val byCap = org.apache.spark.sql.expressions.Window
      .orderBy(col("_cap"), col("_dom"))
    val k = counts.agg(count(lit(1)).as("_k"))
    val s = counts
      .withColumn("_cap", lit(maxEpochs) * col("_n").cast("double"))
      .withColumn("_i", row_number().over(byCap))
      .withColumn("_p", sum(col("_cap")).over(byCap)) // inclusive prefix
      .crossJoin(broadcast(k))
      // domain i saturates iff granting every not-yet-placed domain its
      // cap-sized share still fits the remaining budget
      .withColumn("_sat",
        col("_cap") * (col("_k") - col("_i") + 1) <=
          lit(budgetRows.toDouble) - (col("_p") - col("_cap")))
    val level = s.agg(
      coalesce(max(when(col("_sat"), col("_i"))), lit(0)).as("_m"),
      coalesce(sum(when(col("_sat"), col("_cap"))), lit(0.0)).as("_pm"))
    val rates = s.crossJoin(broadcast(level))
      .withColumn("_quota",
        when(col("_i") <= col("_m"), col("_cap"))
          .otherwise((lit(budgetRows.toDouble) - col("_pm")) /
            (col("_k") - col("_m"))))
      .select(col("_dom").as("_dom_r"),
        (col("_quota") / col("_n").cast("double")).as("_rate"))
    // null-safe join (same reason as temperatureMix's): a null domain
    // consumes budget in the water-fill, so it must emit its quota —
    // an equality join would silently under-fill the budget.
    df.withColumn("_dom", domain)
      .join(broadcast(rates), col("_dom") <=> col("_dom_r"))
      .withColumn("_copies",
        floor(col("_rate")).cast("long") +
          when(pmod(keyHash(key), lit(buckets)) <
            floor((col("_rate") - floor(col("_rate"))) * buckets), 1L)
            .otherwise(0L))
      .where(col("_copies") >= 1)
      .withColumn("epoch", explode(sequence(lit(1L), col("_copies"))))
      .select((cols.map(col) :+ col("epoch")): _*)
  }

  /** Deterministic n-per-stratum sample: rows ranked inside each stratum
    * by (key hash, key) — a reproducible shuffle order — and the first n
    * kept.
    *
    * Ranks come from `RangeRank.groupedCumSum`, NOT a
    * `Window.partitionBy(stratum)` — a stratum-keyed window hashes the
    * ENTIRE corpus onto at most #strata reducer tasks, and strata are
    * few by nature (languages, sources), so at scale that window
    * serializes the table through a handful of tasks. The grouped
    * prefix sum range-partitions on (stratum, hash, key) instead — every
    * core ranks a slice, the only stratum-wide work is a window over
    * the #partitions x #strata count table.
    */
  def stratifiedTopN(df: DataFrame, stratum: Column, key: Column, n: Int): DataFrame = {
    val cols = df.columns
    val ranked = RangeRank.groupedCumSum(
      df.withColumn("_st", stratum).withColumn("_one", lit(1L)),
      groupCols = Seq("_st"),
      sortCols = Seq(keyHash(key), key),
      weightCol = "_one")
    // gcum is the EXCLUSIVE prefix of the 1-weights = the 0-based rank.
    // The prefix pass persists plan-internal state tracked by
    // graft.engine.Caches — long-lived sessions call Caches.release()
    // after the terminal action (same contract as sequence packing).
    ranked.where(col("gcum") < n)
      .select(cols.head, cols.tail: _*)
  }
}
