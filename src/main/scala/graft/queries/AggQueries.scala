package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.{Aggs, Tables => T}

/** Aggregation family A1–A8 (SURVEY.md §2.4) declared over the driver's
  * test tables with DuckDB oracles. Reference citations on each query.
  *
  * Float policy (SURVEY §7.4): aggregate-derived floats rounded to 6 —
  * Spark's partial-aggregation order differs from a single-threaded
  * oracle at ~1e-13 relative, far inside the rounding.
  */
object AggQueries {

  def defs: Seq[QueryDef] = Seq(

    // A1: grand stats mean/std_pop/max/min/median/RMSE over an error
    // population (extrinsic_calibration.py:216-226; numpy std is ddof=0).
    QueryDef("a1_grand_stats",
      """SELECT round(avg(l_quantity), 6) AS mean_err,
        |  round(stddev_pop(l_quantity), 6) AS std_err,
        |  max(l_quantity) AS max_err, min(l_quantity) AS min_err,
        |  round(median(l_quantity), 6) AS median_err,
        |  round(sqrt(avg(l_quantity * l_quantity)), 6) AS rmse
        |FROM lineitem""") { (s, d) =>
      val stats = Aggs.grandStats(col("l_quantity"))
      T.lineitem(s, d).agg(stats.head, stats.tail: _*)
    },

    // A2: per-group mean -> global stats over the means
    // (extrinsic_calibration.py:212-214 error_per_pose -> all_errors).
    QueryDef("a2_two_level_agg",
      """SELECT round(avg(group_mean), 6) AS mean_of_means,
        |  round(stddev_pop(group_mean), 6) AS std_of_means,
        |  CAST(count(*) AS BIGINT) AS n_groups
        |FROM (SELECT l_orderkey, avg(l_quantity) AS group_mean
        |      FROM lineitem GROUP BY l_orderkey)""") { (s, d) =>
      Aggs.twoLevelMean(T.lineitem(s, d), "l_orderkey", "l_quantity")
    },

    // A2 on the bucketed layout (A2_SF100.md §6 productized): identical
    // semantics and oracle to a2_two_level_agg, but the per-group level
    // runs on a lineitem copy bucket-partitioned (and bucket-sorted) on
    // l_orderkey — ONE complete bucket-local HashAggregate, no keyed
    // Exchange anywhere in the plan (pinned in PlanSpec). This is the
    // plan a production ingest buys: at sf100 the exchange tax a2 pays
    // (147M-row shuffle) disappears — 52→20.5 s medians, best rep at
    // same-day-DuckDB level. The oracle is layout-blind by design.
    QueryDef("a2_bucketed",
      """SELECT round(avg(group_mean), 6) AS mean_of_means,
        |  round(stddev_pop(group_mean), 6) AS std_of_means,
        |  CAST(count(*) AS BIGINT) AS n_groups
        |FROM (SELECT l_orderkey, avg(l_quantity) AS group_mean
        |      FROM lineitem GROUP BY l_orderkey)""") { (s, d) =>
      Aggs.twoLevelMean(T.bucketedDeclared(s, d, "lineitem"),
        "l_orderkey", "l_quantity")
    },

    // A3: column-wise mean of N vectors (extrinsic_calibration.py:72-73
    // np.mean(rvecs_list, axis=0)) — element-wise array_sum_agg: the
    // shuffle carries dim doubles per partition instead of the
    // posexplode form's n x dim (pos, value) rows (the posexplode twin
    // is pinned value-identical in AggsSpec).
    QueryDef("a3_columnwise_mean",
      """SELECT pos, round(avg(v), 6) AS mean_v FROM (
        |  SELECT generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings)
        |GROUP BY pos ORDER BY pos""") { (s, d) =>
      graft.expr.GraftFunctions.register(s)
      T.embeddings(s, d)
        // count(embedding): null vectors are skipped by the sum, so they
        // must not inflate the denominator (oracle's unnest drops them)
        .agg(call_function("array_sum_agg", col("embedding")).as("s"),
          count(col("embedding")).as("n"))
        .select(posexplode(transform(col("s"), x => round(x / col("n"), 6)))
          .as(Seq("pos", "mean_v")))
        .orderBy("pos")
    },

    // A4: mean per-image reprojection error (camera_calib.py:104-113:
    // per-image norm/len, then mean over images).
    QueryDef("a4_per_image_error",
      """SELECT round(avg(img_err), 6) AS mean_calib_err,
        |  CAST(count(*) AS BIGINT) AS n_images
        |FROM (SELECT l_orderkey,
        |        sqrt(sum(l_discount * l_discount)) / count(*) AS img_err
        |      FROM lineitem GROUP BY l_orderkey)""") { (s, d) =>
      T.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg((sqrt(sum(col("l_discount") * col("l_discount"))) /
          count(lit(1))).as("img_err"))
        .agg(round(avg("img_err"), 6).as("mean_calib_err"),
          count(lit(1)).as("n_images"))
    },

    // A5: sorted group-collect of the 5 exposure paths per id
    // (handlehdrgen.py:14-20; sort_array for determinism).
    QueryDef("a5_collect_group",
      """SELECT user_id,
        |  array_to_string(list_sort(list(CAST(event_id AS VARCHAR))), ',')
        |    AS collected
        |FROM events GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      Aggs.sortedCollect(T.events(s, d), "user_id", "event_id")
        .orderBy("user_id")
    },

    // A6: count / count-distinct bookkeeping (act_img.py:311-314,
    // extrinsic_calibration.py:338-340).
    QueryDef("a6_counts",
      """SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM events""") { (s, d) =>
      T.events(s, d).agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"))
    },

    // A7: min/max/mean per coordinate axis (calculate.py:36-52).
    QueryDef("a7_axis_stats",
      """SELECT 'x' AS axis, round(min(l_quantity), 6) AS mn,
        |  round(max(l_quantity), 6) AS mx, round(avg(l_quantity), 6) AS mean
        |FROM lineitem
        |UNION ALL
        |SELECT 'y', round(min(l_extendedprice), 6),
        |  round(max(l_extendedprice), 6), round(avg(l_extendedprice), 6)
        |FROM lineitem
        |UNION ALL
        |SELECT 'z', round(min(l_discount), 6), round(max(l_discount), 6),
        |  round(avg(l_discount), 6)
        |FROM lineitem
        |ORDER BY axis""") { (s, d) =>
      Aggs.axisStats(T.lineitem(s, d),
        Seq("x" -> "l_quantity", "y" -> "l_extendedprice",
          "z" -> "l_discount"))
        .orderBy("axis")
    },

    // A8: residual-vector flatten + objective assembly
    // (extrinsic_calibration.py:107-130 errors.extend / np.concatenate;
    // the optimizer consumes sum(r^2)).
    // Raw (un-normalized) global double sum: at ~36M terms the partial-agg
    // reassociation error outgrows the 1e-6 rounding grain (seen at sf3:
    // 98892.912 vs .911995), so the ACCUMULATION is exact DECIMAL(38,12)
    // (per-term double→decimal is deterministic, decimal addition is
    // associative → scale- and order-independent). The OUTPUT is the
    // suite-standard rounded DOUBLE: a raw decimal column hash-mismatched
    // at the driver's gate in r10 (representation, not value), so both
    // engines cast the exact sum to double and round to the 1e-6 grain.
    // Rounding happens in DECIMAL space (round the exact decimal sum to
    // scale 6, THEN cast to double) on BOTH engines: rounding after a
    // cast-to-double let each engine round its own nearest-double of the
    // exact value, and a sum landing exactly on a 5e-7 tie could break
    // differently per engine. HALF_UP on the exact decimal is
    // deterministic, and a decimal with scale 6 converts to the same
    // double everywhere.
    QueryDef("a8_residual_flatten",
      """SELECT CAST(count(*) AS BIGINT) AS n_residuals,
        |  CAST(round(sum(CAST(r * r AS DECIMAL(38,12))), 6) AS DOUBLE) AS sum_sq
        |FROM (SELECT unnest([l_discount, l_tax]) AS r FROM lineitem)""") { (s, d) =>
      T.lineitem(s, d)
        .select(explode(array(col("l_discount"), col("l_tax"))).as("r"))
        .agg(count(lit(1)).as("n_residuals"),
          round(sum((col("r") * col("r")).cast(DecimalType(38, 12))), 6)
            .cast("double").as("sum_sq"))
    }
  )
}
