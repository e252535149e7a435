package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Layout

/** Data-layout queries: z-order clustering, footer-stats file skipping, and
  * incremental cell-grain re-clustering.
  *
  * The reference lands extracts row-ordered and pays a full scan per
  * predicate; at 100 TB the layout IS the query plan — these queries pin
  * the exact math the layout operators use (bucketization, Morton
  * interleave, cell grain, overlap pruning) against the DuckDB oracle, while
  * LayoutSpec proves the physical claims (files skipped, untouched cells
  * not rewritten) on real parquet.
  *
  * All three replay deterministically: bucket bounds come from 1-row
  * aggregates (broadcast, no collect in the query path), the interleave is
  * exact integer math, and file/cell row counts come from footer statistics
  * that equal the true counts.
  */
object LayoutQueries {

  /** Bits per dimension for the bucket grid (2^16 buckets per dim). */
  private val Bits = 16

  /** Top bits of the z-value that form a cell (64 cells). */
  private val CellBits = 6

  /** The study predicate window in bucket space: one eighth of each
    * dimension's range, mid-grid (literals so both engines agree). */
  private val PLo = 20480L
  private val PHi = 28671L

  def rowsOnly: Set[String] = Set.empty

  /** Shared READ-ONLY z-clustered layout of the events projection — the
    * fixture q177 (range-pruned read) and q180 (stats count) measure their
    * reads against; q179 keys its own bloom-equipped variant. The layout is
    * deterministic in the data and the pruned-read/stats paths never write
    * (validatedSkipIndex heals only a stale/absent index, and a fresh build
    * is valid in place — no copy, so the index's absolute paths stay
    * live), so it builds once per suite (the q175/q178 cachedFixture
    * rationale) and every warmup+run measures the READ the query exists
    * for, not a repeated shuffle + z-sort + footer-index build. */
  private def zLayoutFixture(s: SparkSession, dir: String, key: String,
                             bloomCols: Seq[String]): String =
    PrepQueries.cachedFixture(key, dir) { d =>
      Layout.clusterByZOrder(
        Tables.events(s, dir).select(col("event_id"), col("user_id"),
          col("event_type"), col("value")),
        "event_id", "user_id", d, Bits, CellBits, bloomCols = bloomCols)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-order vs single-column layout, measured at the cell grain: for a
    // 2-D box, an A-only and a B-only predicate, how many cells must a
    // reader touch and how many rows does it scan? The z-layout prunes on
    // BOTH dimensions; the linear layout prunes only on its sort key. One
    // corpus-grain groupBy per layout (map-side combined to <= 4096 rows);
    // everything downstream is on 64-row frames.
    "q176_zorder_cells" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"))
      val bounds = ev.agg(
        min("event_id").as("amin"), max("event_id").as("amax"),
        min("user_id").as("bmin"), max("user_id").as("bmax"))
      val z = ev.crossJoin(broadcast(bounds))
        .select(
          Layout.zBucket(col("event_id"), col("amin"), col("amax"), Bits).as("ab"),
          Layout.zBucket(col("user_id"), col("bmin"), col("bmax"), Bits).as("bb"))
        .withColumn("zval", Layout.zValue2(col("ab"), col("bb"), Bits))
        .withColumn("zcell", shiftright(col("zval"), 2 * Bits - CellBits))
        .withColumn("lcell", shiftright(col("ab"), Bits - CellBits))
      val inA = col("ab") >= PLo && col("ab") <= PHi
      val inB = col("bb") >= PLo && col("bb") <= PHi
      // Joint grain (zcell, lcell): both layouts' cell statistics derive
      // from this one aggregate.
      val g = z.groupBy("zcell", "lcell").agg(
        min("ab").as("ab_min"), max("ab").as("ab_max"),
        min("bb").as("bb_min"), max("bb").as("bb_max"),
        count(lit(1)).as("n"),
        sum(when(inA && inB, 1L).otherwise(0L)).as("m_box"),
        sum(when(inA, 1L).otherwise(0L)).as("m_a"),
        sum(when(inB, 1L).otherwise(0L)).as("m_b"))

      def layoutRows(cellCol: String, label: String): DataFrame = {
        val cells = g.groupBy(col(cellCol)).agg(
          min("ab_min").as("ab_min"), max("ab_max").as("ab_max"),
          min("bb_min").as("bb_min"), max("bb_max").as("bb_max"),
          sum("n").as("n"),
          sum("m_box").as("m_box"), sum("m_a").as("m_a"), sum("m_b").as("m_b"))
        // File-skipping semantics: a cell is touched iff its actual data
        // min/max interval can intersect the predicate interval.
        val tA = col("ab_max") >= PLo && col("ab_min") <= PHi
        val tB = col("bb_max") >= PLo && col("bb_min") <= PHi
        cells.agg(
          count(lit(1)).as("cells_total"),
          sum(when(tA && tB, 1L).otherwise(0L)).as("t_box"),
          sum(when(tA && tB, col("n")).otherwise(0L)).as("s_box"),
          sum("m_box").as("mm_box"),
          sum(when(tA, 1L).otherwise(0L)).as("t_a"),
          sum(when(tA, col("n")).otherwise(0L)).as("s_a"),
          sum("m_a").as("mm_a"),
          sum(when(tB, 1L).otherwise(0L)).as("t_b"),
          sum(when(tB, col("n")).otherwise(0L)).as("s_b"),
          sum("m_b").as("mm_b"))
          .select(lit(label).as("layout"), col("cells_total"),
            expr("stack(3, 'box', t_box, s_box, mm_box, " +
              "'dim_a', t_a, s_a, mm_a, 'dim_b', t_b, s_b, mm_b) " +
              "as (predicate, cells_touched, rows_scanned, rows_matched)"))
      }

      layoutRows("zcell", "zorder").unionByName(layoutRows("lcell", "linear"))
        .select("layout", "predicate", "cells_total", "cells_touched",
          "rows_scanned", "rows_matched")
        .orderBy("layout", "predicate")
    },

    // Footer-stats skip index over a real z-clustered layout: cluster the
    // events by (event_id, user_id), build the per-file min/max index from
    // parquet FOOTERS (zero data bytes), then answer a key-range predicate
    // by reading only the files the index admits. The oracle checks the
    // contract that matters — pruning admits no false negatives: the
    // pruned read returns exactly the full filter's rows. LayoutSpec pins
    // the other half (it really does open fewer files).
    "q177_skipindex_pruned_read" -> { (s, dir) =>
      val out = zLayoutFixture(s, dir, "zlayout_events", Nil)
      Layout.readPruned(s, out, "event_id", 100L, 499L)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    },

    // Equality pruning on a STRING column via dictionary/bloom metadata —
    // the predicate class min/max stats cannot serve (q177's range path).
    // The layout lands with a bloom filter on event_type; readPrunedEq
    // tests each row group's dictionary (exact, when fully dict-encoded)
    // or bloom (might-contain) and reads only admitted files. The oracle
    // pins the contract: never a false negative — the pruned read IS the
    // relational filter. LayoutSpec proves files are really skipped on
    // selective fixtures (events' five types appear in every cell, so
    // pruning is honest but unselective here).
    "q179_dict_pruned_read" -> { (s, dir) =>
      val out = zLayoutFixture(s, dir, "zlayout_events_bloom", Seq("event_type"))
      Layout.readPrunedEq(s, out, "event_type", "purchase")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    },

    // Metadata-answered range count with an exact residual: files whose
    // stats lie fully inside [lo, hi] contribute footer row counts without
    // being opened; only boundary-straddling files are scanned. The range
    // is the interior [amin + span/8, amin + span/2] so interior slabs are
    // metadata-only at every SF. The oracle replays the classification at
    // the cell grain — clusterByZOrder lands exactly one file per nonempty
    // cell (hash repartition on the cell id + partitionBy), so file grain
    // and cell grain coincide; exact_count is additionally just the plain
    // relational count, independent of any layout assumption.
    "q180_stats_count" -> { (s, dir) =>
      val out = zLayoutFixture(s, dir, "zlayout_events", Nil)
      val (bounds, _, _) = Layout.readZMeta(s, out)
      val span = bounds.aMax - bounds.aMin + 1
      Layout.statsCount(s, out, "event_id",
        bounds.aMin + span / 8, bounds.aMin + span / 2)
    },

    // Incremental optimize plan: land 90% of events as the base z-layout,
    // then fold in the 10% batch. The report is the executed rewrite plan —
    // per cell, how many rows the base held (from footer row counts alone:
    // planning reads NO base data), how many the batch adds, and whether
    // the cell is rewritten. Batch rows bucket under the base's FROZEN
    // bounds (out-of-range ids clamp to edge buckets) — the property that
    // makes the layout incrementally maintainable at all.
    "q178_zorder_optimize" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      // the pristine 90% base z-layout is deterministic in the data:
      // build it ONCE per suite, and since optimizeIncremental MUTATES
      // its base, restore a fresh copy per run by plain file copy — the
      // suite then measures the optimize, not the base's rebuild
      // (shuffle + z-sort + footer index) on every warmup+run
      val pristine = PrepQueries.cachedFixture("q178_base", dir) { d =>
        Layout.clusterByZOrder(ev.filter(col("event_id") % 10 =!= 0),
          "event_id", "user_id", d, Bits, CellBits)
      }
      val base = PrepQueries.copyFixtureToScratch(pristine, "graft_q178_")
      // the skip index stores ABSOLUTE file paths: rebase them onto the
      // copy, or validatedSkipIndex would see zero overlap with the live
      // listing and silently rebuild the WHOLE index from footers inside
      // the measured optimize — re-importing the fixture cost the cache
      // exists to remove
      Layout.rebaseSkipIndex(s, base, pristine, base)
      val batch = ev.filter(col("event_id") % 10 === 0)
      Layout.optimizeIncremental(s, base, batch, "event_id", "user_id")
        .select(col("zcell"), col("rows_base"), col("rows_added"),
          col("rewritten"))
        .orderBy("zcell")
    }
  )

  /** Shared oracle fragment: bucketize events into the 2^16 grid. */
  private def bucketCte(src: String): String =
    s"""bounds AS (SELECT min(event_id) amin, max(event_id) amax,
       |                 min(user_id) bmin, max(user_id) bmax FROM $src),
       |b AS (SELECT ((GREATEST(amin, LEAST(amax, event_id)) - amin) * 65536)
       |               // (amax - amin + 1) AS ab,
       |             ((GREATEST(bmin, LEAST(bmax, user_id)) - bmin) * 65536)
       |               // (bmax - bmin + 1) AS bb,
       |             ev.* FROM ev CROSS JOIN bounds)""".stripMargin

  /** Morton interleave in DuckDB: OR of disjoint bits = sum of them. */
  private val zvalSql: String =
    """CAST(list_sum(list_transform(range(0, 16),
      |  i -> (((ab >> i) & 1) << (2*i+1)) + (((bb >> i) & 1) << (2*i))))
      |  AS BIGINT)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q176_zorder_cells" ->
      s"""WITH ev AS (SELECT event_id, user_id FROM events),
         |${bucketCte("ev")},
         |z AS (SELECT ab, bb, $zvalSql AS zval FROM b),
         |zz AS (SELECT ab, bb, zval >> 26 AS zcell, ab >> 10 AS lcell FROM z),
         |g AS (SELECT zcell, lcell,
         |        min(ab) ab_min, max(ab) ab_max, min(bb) bb_min, max(bb) bb_max,
         |        count(*) n,
         |        sum(CASE WHEN ab BETWEEN 20480 AND 28671
         |                  AND bb BETWEEN 20480 AND 28671 THEN 1 ELSE 0 END) m_box,
         |        sum(CASE WHEN ab BETWEEN 20480 AND 28671 THEN 1 ELSE 0 END) m_a,
         |        sum(CASE WHEN bb BETWEEN 20480 AND 28671 THEN 1 ELSE 0 END) m_b
         |      FROM zz GROUP BY 1, 2),
         |cells AS (
         |  SELECT 'zorder' AS layout, zcell AS cell,
         |         min(ab_min) ab_min, max(ab_max) ab_max,
         |         min(bb_min) bb_min, max(bb_max) bb_max,
         |         sum(n) n, sum(m_box) m_box, sum(m_a) m_a, sum(m_b) m_b
         |  FROM g GROUP BY 2
         |  UNION ALL
         |  SELECT 'linear' AS layout, lcell AS cell,
         |         min(ab_min), max(ab_max), min(bb_min), max(bb_max),
         |         sum(n), sum(m_box), sum(m_a), sum(m_b)
         |  FROM g GROUP BY 2),
         |agg AS (SELECT layout,
         |    count(*) AS cells_total,
         |    sum(CASE WHEN ab_max >= 20480 AND ab_min <= 28671
         |              AND bb_max >= 20480 AND bb_min <= 28671 THEN 1 ELSE 0 END) t_box,
         |    sum(CASE WHEN ab_max >= 20480 AND ab_min <= 28671
         |              AND bb_max >= 20480 AND bb_min <= 28671 THEN n ELSE 0 END) s_box,
         |    sum(m_box) mm_box,
         |    sum(CASE WHEN ab_max >= 20480 AND ab_min <= 28671 THEN 1 ELSE 0 END) t_a,
         |    sum(CASE WHEN ab_max >= 20480 AND ab_min <= 28671 THEN n ELSE 0 END) s_a,
         |    sum(m_a) mm_a,
         |    sum(CASE WHEN bb_max >= 20480 AND bb_min <= 28671 THEN 1 ELSE 0 END) t_b,
         |    sum(CASE WHEN bb_max >= 20480 AND bb_min <= 28671 THEN n ELSE 0 END) s_b,
         |    sum(m_b) mm_b
         |  FROM cells GROUP BY 1)
         |SELECT layout, predicate,
         |       CAST(cells_total AS BIGINT) AS cells_total,
         |       CAST(cells_touched AS BIGINT) AS cells_touched,
         |       CAST(rows_scanned AS BIGINT) AS rows_scanned,
         |       CAST(rows_matched AS BIGINT) AS rows_matched
         |FROM (
         |  SELECT layout, 'box' AS predicate, cells_total,
         |         t_box AS cells_touched, s_box AS rows_scanned, mm_box AS rows_matched FROM agg
         |  UNION ALL
         |  SELECT layout, 'dim_a', cells_total, t_a, s_a, mm_a FROM agg
         |  UNION ALL
         |  SELECT layout, 'dim_b', cells_total, t_b, s_b, mm_b FROM agg)
         |ORDER BY layout, predicate""".stripMargin,

    "q177_skipindex_pruned_read" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE event_id BETWEEN 100 AND 499
        |ORDER BY event_id""".stripMargin,

    "q179_dict_pruned_read" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q180_stats_count" ->
      s"""WITH ev AS (SELECT event_id, user_id FROM events),
         |${bucketCte("ev")},
         |z AS (SELECT event_id, $zvalSql AS zval FROM b),
         |rng AS (SELECT amin + (amax - amin + 1) // 8 AS lo,
         |               amin + (amax - amin + 1) // 2 AS hi FROM bounds),
         |cells AS (SELECT zval >> 26 AS zcell, min(event_id) mn,
         |                 max(event_id) mx, count(*) n
         |          FROM z GROUP BY 1),
         |cls AS (SELECT n,
         |          CASE WHEN mn >= lo AND mx <= hi THEN 'meta'
         |               WHEN mx >= lo AND mn <= hi THEN 'scan'
         |               ELSE 'skip' END AS k
         |        FROM cells CROSS JOIN rng)
         |SELECT
         |  CAST((SELECT count(*) FROM ev CROSS JOIN rng
         |        WHERE event_id BETWEEN lo AND hi) AS BIGINT) AS exact_count,
         |  CAST(count(*) AS BIGINT) AS files_total,
         |  CAST(sum(CASE WHEN k = 'meta' THEN 1 ELSE 0 END) AS BIGINT) AS files_meta_only,
         |  CAST(sum(CASE WHEN k = 'scan' THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         |  CAST(sum(CASE WHEN k = 'scan' THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
         |FROM cls""".stripMargin,

    "q178_zorder_optimize" ->
      s"""WITH ev AS (SELECT event_id, user_id FROM events
         |            WHERE event_id % 10 <> 0),
         |${bucketCte("ev")},
         |z AS (SELECT ab, bb, $zvalSql AS zval FROM b),
         |bcells AS (SELECT zval >> 26 AS zcell, count(*) AS rows_base
         |           FROM z GROUP BY 1),
         |ev2 AS (SELECT event_id, user_id FROM events WHERE event_id % 10 = 0),
         |b2 AS (SELECT ((GREATEST(amin, LEAST(amax, event_id)) - amin) * 65536)
         |                // (amax - amin + 1) AS ab,
         |              ((GREATEST(bmin, LEAST(bmax, user_id)) - bmin) * 65536)
         |                // (bmax - bmin + 1) AS bb
         |       FROM ev2 CROSS JOIN bounds),
         |z2 AS (SELECT ab, bb, $zvalSql AS zval FROM b2),
         |acells AS (SELECT zval >> 26 AS zcell, count(*) AS rows_added
         |           FROM z2 GROUP BY 1)
         |SELECT COALESCE(b.zcell, a.zcell) AS zcell,
         |       CAST(COALESCE(rows_base, 0) AS BIGINT) AS rows_base,
         |       CAST(COALESCE(rows_added, 0) AS BIGINT) AS rows_added,
         |       COALESCE(rows_added, 0) > 0 AS rewritten
         |FROM bcells b FULL OUTER JOIN acells a ON b.zcell = a.zcell
         |ORDER BY zcell""".stripMargin
  )
}
