package graft.queries

import graft.GraftSession.table
import graft.functions.{TextFunctions => TF}
import graft.operators.{ConnectedComponents, MinHashLSH}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation queries (SURVEY.md §2 C13-C16): the
  * operations between "raw documents" and "training batches" —
  * scrubbing, filtering, dedup materialization, sequence packing,
  * split assignment. Each is a single declarative plan; the
  * shuffles are one keyed exchange each.
  */
object CorpusQueries {

  private val normSql = """regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"""
  private val nTokSql = s"len(string_split($normSql, ' '))"

  /** Transitive near-dup clusters (id, cluster_id) via connected
    * components on the COLLAPSED quotient graph: CC iterates over
    * representative-level edges (clone groups contribute one node,
    * not c²/2 within-pairs), then members re-attach in one
    * output-sized join. A doc appears iff it belongs to some expanded
    * pair: its rep has a cross edge, or its clone group has ≥ 2
    * members (within-pairs at jaccard 1). cluster_id = min id of the
    * expanded component — each rep IS its group's min id, so the
    * quotient CC's min-rep label already equals it.
    * Shared by dedup_clusters and dedup_keep_best.
    */
  private def collapsedClusters(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val (repPairs, groups) = MinHashLSH
      .nearDupGraph(table(s, dir, "documents"), "doc_id", "text", 0.8)
    ConnectedComponents.clustersFromQuotient(
      repPairs.select(col("id_a"), col("id_b")), groups)
  }

  // word-trigram near-dup pairs (same definition as dedup_minhash_pairs)
  private val pairsCte =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(toks) - 1),
      |    i -> concat(toks[CAST(i AS INT)], ' ',
      |                toks[CAST(i + 1 AS INT)], ' ',
      |                toks[CAST(i + 2 AS INT)]))) AS grams
      |  FROM t WHERE len(toks) >= 3),
      |drops AS (
      |  SELECT DISTINCT b.doc_id AS doc_id
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8)""".stripMargin

  val all: Seq[Q] = Seq(

    // C13: PII/noise scrubbing — emails, URLs, long digit runs.
    Q("text_scrub",
      """SELECT doc_id,
        |  length(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '[0-9]{4,}', '<NUM>', 'g')) AS scrubbed_len,
        |  length(text) AS orig_len
        |FROM documents""".stripMargin) { (s, dir) =>
      val scrubbed = regexp_replace(regexp_replace(regexp_replace(col("text"),
        "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
        "https?://[^ ]+", "<URL>"),
        "[0-9]{4,}", "<NUM>")
      table(s, dir, "documents").select(
        col("doc_id"),
        length(scrubbed).as("scrubbed_len"),
        length(col("text")).as("orig_len"))
    },

    // C14: quality/language filter pass — the keep/drop decision a
    // corpus builder runs before training.
    Q("corpus_filter",
      s"""SELECT lang, source,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n_chars >= 200 AND $nTokSql >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM documents GROUP BY lang, source""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_chars") >= 200 && TF.tokenCount(col("text")) >= 30, 1)
            .otherwise(0)).as("n_kept"))
    },

    // C15: dedup materialization — drop every doc that near-dups a
    // lower-id doc (MinHash-LSH pairs → anti join), count survivors.
    Q("corpus_dedup_keep_first",
      s"""WITH $pairsCte
         |SELECT source, count(*) AS n_docs_kept
         |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM drops)
         |GROUP BY source""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      // Drop set from the COLLAPSED graph (see collapsedClusters): a
      // doc drops iff some lower-id doc near-dups it, which in
      // quotient terms is (a) any non-representative clone-group
      // member (its rep is the group min), or (b) a representative
      // with a lower cross-edge neighbor. Linear in docs — the
      // re-expanded pair set would spell c²/2 rows per c-clone group
      // just to learn "c − 1 docs drop". Materialized ONCE via
      // localCheckpoint, then broadcast: the anti-join is a map-side
      // hash probe over one corpus scan.
      val (repPairs, groups) = MinHashLSH.nearDupGraph(docs, "doc_id", "text", 0.8)
      val nonReps = groups.filter(col("member_id") =!= col("rep_id"))
        .select(col("member_id").as("doc_id"))
      val droppedReps = repPairs.select(col("id_b").as("doc_id")).distinct()
      val drops = nonReps.unionByName(droppedReps).distinct().localCheckpoint(true)
      docs.join(broadcast(drops), Seq("doc_id"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_kept"))
    },

    // C15b: transitive dedup clusters — near-dup pairs are not
    // transitive, so the canonical doc is the min id of the whole
    // connected component (hash-min label propagation vs a DuckDB
    // recursive-CTE transitive closure).
    // Round 7: CC runs on the COLLAPSED quotient graph
    // (MinHashLSH.nearDupGraph — representatives + clone groups), not
    // the re-expanded pair set, where a c-clone cluster contributes
    // c²/2 within-pairs (24.7M edges at the ×100 probe — the entire
    // cost of this query there). Exact by the quotient argument in
    // nearDupGraph's scaladoc; members re-attach in one output-sized
    // join. ×100: 100 s → ~5 s.
    Q("dedup_clusters",
      s"""WITH RECURSIVE $pairsCte,
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8),
         |edges AS (SELECT id_a AS s, id_b AS t FROM p
         |          UNION SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
         |  UNION
         |  SELECT e.s, r.r FROM edges e JOIN reach r ON e.t = r.id)
         |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin) { (s, dir) =>
      collapsedClusters(s, dir)
    },

    // C117: DEDUP CLUSTER PROFILE — the cluster-size histogram +
    // duplicate-mass summary a curation team reads before committing
    // a dedup policy (Lee et al. ACL'22 §4 report exactly this
    // distribution): per cluster size k, how many near-dup clusters
    // and docs; k = 1 is the un-clustered remainder; dup_docs =
    // Σ_{k≥2} (k−1)·n_clusters is the mass a keep-one policy would
    // drop, dup_pct its corpus share (ONE division, 6dp floor). All
    // counts exact integers off C15b's transitive clusters (the
    // collapsed quotient-graph CC — clone groups never expand to
    // c²/2 pairs). Scale shape: the C15b machinery + a cluster-grain
    // rollup + a size-grain (≤ max-cluster-size rows) rollup.
    Q("dedup_cluster_profile",
      s"""WITH RECURSIVE $pairsCte,
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8),
         |edges AS (SELECT id_a AS s, id_b AS t FROM p
         |          UNION SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
         |  UNION
         |  SELECT e.s, r.r FROM edges e JOIN reach r ON e.t = r.id),
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |sizes AS (
         |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS k
         |  FROM cl GROUP BY cluster_id),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_clustered FROM cl),
         |hist AS (
         |  SELECT k AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |    CAST(k * count(*) AS BIGINT) AS n_docs
         |  FROM sizes GROUP BY k
         |  UNION ALL
         |  SELECT 1, n_corpus - n_clustered, n_corpus - n_clustered
         |  FROM nd, nc),
         |dup AS (
         |  SELECT CAST(sum(CASE WHEN cluster_size >= 2
         |      THEN n_docs - n_clusters ELSE 0 END) AS BIGINT) AS dup_docs
         |  FROM hist)
         |SELECT h.cluster_size, h.n_clusters, h.n_docs, nd.n_corpus,
         |  d.dup_docs,
         |  floor(CAST(d.dup_docs AS DOUBLE) / CAST(nd.n_corpus AS DOUBLE)
         |    * 1000000 + 0.5) / 1000000 AS dup_pct
         |FROM hist h, nd, dup d""".stripMargin) { (s, dir) =>
      val cl = collapsedClusters(s, dir)
        .localCheckpoint() // feeds the size rollup and the clustered count
      val sizes = cl.groupBy(col("cluster_id")).agg(count(lit(1)).as("k"))
      val nd = table(s, dir, "documents").agg(count(lit(1)).as("n_corpus"))
      val nc = cl.agg(count(lit(1)).as("n_clustered"))
      val hist = sizes.groupBy(col("k"))
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("k").as("cluster_size"), col("n_clusters"),
          (col("k") * col("n_clusters")).as("n_docs"))
        .unionByName(broadcast(nd).crossJoin(broadcast(nc))
          .select(lit(1L).as("cluster_size"),
            (col("n_corpus") - col("n_clustered")).as("n_clusters"),
            (col("n_corpus") - col("n_clustered")).as("n_docs")))
        .localCheckpoint() // feeds the dup-mass rollup and the output
      val dup = hist.agg(sum(when(col("cluster_size") >= 2,
        col("n_docs") - col("n_clusters")).otherwise(lit(0L))).as("dup_docs"))
      hist.crossJoin(broadcast(nd)).crossJoin(broadcast(dup))
        .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
          col("n_corpus"), col("dup_docs"),
          (floor(col("dup_docs").cast("double")
            / col("n_corpus").cast("double") * 1000000 + lit(0.5))
            / 1000000).as("dup_pct"))
    },

    // C119: T5-STYLE SPAN-CORRUPTION EXAMPLE CONSTRUCTION (Raffel et
    // al. JMLR 2020 §3.1.4) — the pretraining-example builder that
    // turns a document into (inputs-with-sentinels, targets): tokens
    // are marked for corruption by a DETERMINISTIC integer mask
    // ((doc_id·1000003 + i·101) mod 97 < 15 — ~15.5% noise density,
    // the paper's default; a shared pure-integer rule both engines
    // replay exactly, no RNG; the position stride 101 ≡ 4 (mod 97)
    // is deliberately SMALL so consecutive marks — and therefore
    // real multi-token spans — actually occur, the paper's mean span
    // length 3 regime), consecutive marked tokens merge into
    // one span, each span becomes <extra_id_K> in the inputs while
    // the targets carry <extra_id_K> followed by the span's tokens.
    // Pure integer/string arithmetic — nothing to round. Scale
    // shape: one posexplode (linear in corpus tokens), one
    // doc-partitioned lag/cumsum window (bounded by doc length — the
    // C16/C25 class), one keyed re-assembly groupBy.
    Q("span_corruption",
      s"""WITH t AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS toks
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |    toks[CAST(i AS INT)] AS w
         |  FROM t, unnest(range(1, len(toks) + 1)) AS u(i)),
         |f AS (
         |  SELECT doc_id, pos, w,
         |    CASE WHEN (doc_id * 1000003 + pos * 101) % 97 < 15
         |      THEN 1 ELSE 0 END AS flag
         |  FROM tok WHERE w <> ''),
         |st AS (
         |  SELECT doc_id, pos, w, flag,
         |    CASE WHEN flag = 1 AND
         |      coalesce(lag(flag) OVER (PARTITION BY doc_id ORDER BY pos), 0)
         |        = 0 THEN 1 ELSE 0 END AS start
         |  FROM f),
         |sp AS (
         |  SELECT doc_id, pos, w, flag, start,
         |    CAST(sum(start) OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS BIGINT) - 1 AS span_id
         |  FROM st),
         |pieces AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN flag = 0 THEN w
         |         WHEN start = 1 THEN '<extra_id_' || span_id || '>'
         |    END AS in_piece,
         |    CASE WHEN flag = 1 AND start = 1
         |           THEN '<extra_id_' || span_id || '> ' || w
         |         WHEN flag = 1 THEN w
         |    END AS tgt_piece
         |  FROM sp),
         |asm AS (
         |  SELECT doc_id,
         |    CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN tgt_piece IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_corrupted,
         |    CAST(sum(CASE WHEN in_piece LIKE '<extra_id_%' THEN 1 ELSE 0
         |      END) AS BIGINT) AS n_spans,
         |    coalesce(string_agg(in_piece, ' ' ORDER BY pos)
         |      FILTER (in_piece IS NOT NULL), '') AS input_text,
         |    coalesce(string_agg(tgt_piece, ' ' ORDER BY pos)
         |      FILTER (tgt_piece IS NOT NULL), '') AS target_text
         |  FROM pieces GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_corrupted, n_spans,
         |  input_text, target_text
         |FROM asm""".stripMargin) { (s, dir) =>
      val tok = table(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(
          regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))
          .as(Seq("pos0", "w")))
        .filter(col("w") =!= "")
        .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
          col("w"))
      val f = tok.withColumn("flag",
        when((col("doc_id") * 1000003 + col("pos") * 101) % 97 < 15,
          lit(1)).otherwise(lit(0)))
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val sp = f
        .withColumn("start", when(col("flag") === 1 &&
          coalesce(lag(col("flag"), 1).over(wd), lit(0)) === 0, lit(1))
          .otherwise(lit(0)))
        .withColumn("span_id",
          sum(col("start")).over(wd).cast("long") - 1)
      val pieces = sp.select(col("doc_id"), col("pos"),
        when(col("flag") === 0, col("w"))
          .when(col("start") === 1,
            concat(lit("<extra_id_"), col("span_id"), lit(">")))
          .as("in_piece"),
        when(col("flag") === 1 && col("start") === 1,
          concat(lit("<extra_id_"), col("span_id"), lit("> "), col("w")))
          .when(col("flag") === 1, col("w"))
          .as("tgt_piece"))
      pieces.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("tgt_piece").isNotNull, 1L).otherwise(0L))
            .as("n_corrupted"),
          sum(when(col("in_piece").startsWith("<extra_id_"), 1L)
            .otherwise(0L)).as("n_spans"),
          coalesce(array_join(transform(filter(
            sort_array(collect_list(struct(col("pos"), col("in_piece")
              .as("p")))), x => x.getField("p").isNotNull),
            x => x.getField("p")), " "), lit("")).as("input_text"),
          coalesce(array_join(transform(filter(
            sort_array(collect_list(struct(col("pos"), col("tgt_piece")
              .as("p")))), x => x.getField("p").isNotNull),
            x => x.getField("p")), " "), lit("")).as("target_text"))
    },

    // C55: dedup-cluster-aware dataset split — the leakage-safe split:
    // assignment hashes the near-dup CLUSTER label (C15b's transitive
    // components; singletons label as themselves), never the doc, so
    // no near-dup pair can straddle train/test (the contamination
    // C26 checks for is prevented by construction — crossing_edges is
    // structurally 0 and both engines emit their own count of it).
    // Plan: the quotient-graph cluster machinery + one keyed label
    // join + a 10-row rollup.
    Q("cluster_aware_split",
      s"""WITH RECURSIVE $pairsCte,
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8),
         |edges AS (SELECT id_a AS s, id_b AS t FROM p
         |          UNION SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
         |  UNION
         |  SELECT e.s, r.r FROM edges e JOIN reach r ON e.t = r.id),
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |lab AS (
         |  SELECT doc_id, coalesce(cluster_id, doc_id) AS lab
         |  FROM documents LEFT JOIN cl ON id = doc_id),
         |sp AS (SELECT doc_id, lab, lab % 10 AS split FROM lab),
         |cross_e AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n FROM p
         |  JOIN sp a ON a.doc_id = p.id_a JOIN sp b ON b.doc_id = p.id_b
         |  WHERE a.split <> b.split)
         |SELECT CAST(split AS BIGINT) AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT lab) AS BIGINT) AS n_clusters,
         |  CAST(sum(doc_id) AS BIGINT) AS doc_id_sum,
         |  (SELECT n FROM cross_e) AS crossing_edges
         |FROM sp GROUP BY split""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents").select(col("doc_id"))
      val (repPairs, groups) = MinHashLSH
        .nearDupGraph(table(s, dir, "documents"), "doc_id", "text", 0.8)
      val cl = ConnectedComponents.clustersFromQuotient(
        repPairs.select(col("id_a"), col("id_b")), groups)
        .localCheckpoint()
      val lab = docs.join(cl, docs("doc_id") === cl("id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("lab"))
      val sp = lab.withColumn("split", pmod(col("lab"), lit(10L)))
        .localCheckpoint() // feeds the rollup AND the crossing check
      // crossing check on the quotient graph: every rep-level edge and
      // every (rep, member) attachment must keep both endpoints in one
      // split — together they span every expanded near-dup pair
      val qEdges = repPairs.select(col("id_a"), col("id_b"))
        .unionByName(groups.select(col("rep_id").as("id_a"),
          col("member_id").as("id_b")))
      val crossing = qEdges
        .join(sp.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
        .join(sp.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
        .filter(col("sa") =!= col("sb"))
        .agg(count(lit(1)).as("crossing_edges"))
      sp.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lab")).as("n_clusters"),
          sum(col("doc_id")).as("doc_id_sum"))
        .crossJoin(broadcast(crossing))
    },

    // C56: INTRA-document segment dedup — remove repeated 10-token
    // segments WITHIN each doc, keeping first occurrences (the
    // self-repetition/boilerplate rewrite that complements C45's
    // corpus-wide line dedup and C27's repetition SCORES). Entirely
    // map-only: the keep-first selection is an indexed array filter
    // inside one codegen pass — zero shuffle at any corpus size, the
    // cheapest possible rewrite plan.
    Q("intra_doc_dedup",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |l AS (
        |  SELECT doc_id, list_transform(
        |    range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
        |    i -> array_to_string(
        |      toks[CAST(i * 10 + 1 AS INT):CAST(i * 10 + 10 AS INT)], ' '))
        |    AS segs
        |  FROM t),
        |k AS (
        |  SELECT doc_id, segs,
        |    list_filter(segs, (x, i) -> list_position(segs, x) = i) AS kept
        |  FROM l)
        |SELECT doc_id,
        |  CAST(len(segs) AS BIGINT) AS n_segments,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  array_to_string(kept, ' ') AS kept_text
        |FROM k""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val nSeg = ceil(size(toks).cast("double") / lit(10.0)).cast("int")
      val segs = transform(sequence(lit(0), nSeg - 1),
        i => concat_ws(" ", slice(toks, i * 10 + 1, lit(10))))
      table(s, dir, "documents")
        .select(col("doc_id"), segs.as("segs"))
        .select(col("doc_id"),
          size(col("segs")).cast("long").as("n_segments"),
          filter(col("segs"), (x, i) =>
            array_position(col("segs"), x) === (i + 1).cast("long")).as("kept"))
        .select(col("doc_id"), col("n_segments"),
          size(col("kept")).cast("long").as("n_kept"),
          array_join(col("kept"), " ").as("kept_text"))
    },

    // C45: LINE-level dedup (CCNet / RefinedWeb): duplicate lines —
    // boilerplate, navigation chrome, repeated headers — are removed
    // corpus-WIDE (first occurrence by (doc_id, line_idx) wins), and
    // each document is reassembled from its surviving lines. Distinct
    // from span_dedup_docs (C31), which SCORES span duplication but
    // rewrites nothing. The synthetic corpus has no newlines, so a
    // "line" is a fixed 10-token segment — the segmentation is a
    // parameter; the operator is the dedup + reassembly.
    //
    // Scale plan: ONE keyed exchange does the whole dedup — groupBy
    // the line's 128-bit fingerprint with min(struct(doc_id,
    // line_idx, line)): partial aggregation means each map task
    // forwards at most one candidate row per distinct line, so the
    // exchange carries distinct-lines rows (not corpus lines), each
    // with its ~10-token text. The reassembly is a second keyed
    // exchange at doc granularity. Third-fingerprint collision guard
    // as in dedup_exact_docs: a silent merge would need a
    // simultaneous 192-bit collision.
    Q("line_dedup",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |l AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
        |    i -> struct_pack(
        |      line_idx := CAST(i AS BIGINT),
        |      line := array_to_string(
        |        toks[CAST(i * 10 + 1 AS INT):CAST(i * 10 + 10 AS INT)], ' '))),
        |    recursive := true)
        |  FROM t),
        |f AS (
        |  SELECT doc_id, line_idx, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn
        |  FROM l),
        |k AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    array_to_string(list(line ORDER BY line_idx), ' ') AS kept_text
        |  FROM f WHERE rn = 1 GROUP BY doc_id),
        |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM l GROUP BY doc_id)
        |SELECT n.doc_id, n.n_lines,
        |  coalesce(k.n_kept, 0) AS n_kept,
        |  coalesce(k.kept_text, '') AS kept_text
        |FROM n LEFT JOIN k USING (doc_id)""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val nSeg = ceil(size(toks).cast("double") / lit(10.0)).cast("int")
      // Round-13 optimization (guide §2.3/§2.4 — clone-collapse):
      // the segment explode costs tokens-per-CORPUS, but docs with
      // IDENTICAL text have identical segment sets at identical
      // line_idx, and the corpus-wide first occurrence of a line by
      // (doc_id, line_idx) always lives in the MINIMUM doc_id of a
      // winning text group (every other member of the group repeats
      // the line at the same index under a larger doc_id — it can
      // never win, and keeps NOTHING: each of its lines recurs in
      // its own group's canonical doc). So the explode + dedup run
      // once per UNIQUE text keyed by the group's min doc_id; the
      // per-doc readout is n_lines (text-determined) plus the kept
      // lines for the canonical doc and (0, '') for every other
      // group member. Fingerprint + third-hash guard as in
      // dedup_exact_docs; the oracle keeps the full-corpus window.
      val keyed = table(s, dir, "documents").select(
        col("doc_id"), col("text"),
        xxhash64(col("text")).as("f1"),
        xxhash64(lit(42L), col("text")).as("f2"),
        length(col("text")).as("fl"))
      val uniq = keyed
        .groupBy(col("f1"), col("f2"), col("fl"))
        .agg(min(col("doc_id")).as("doc"), first(col("text")).as("text"),
          countDistinct(xxhash64(lit(1337L), col("text"))).as("_nfp"))
        .filter(assert_true(col("_nfp") === 1,
          lit("fingerprint collision in line_dedup")).isNull)
        .localCheckpoint() // the explode and the readout both scan it
      val lines = uniq.select(
        col("doc").as("doc_id"),
        posexplode(transform(sequence(lit(0), nSeg - 1),
          i => concat_ws(" ", slice(toks, i * 10 + 1, lit(10)))))
          .as(Seq("line_idx", "line")))
        .select(col("doc_id"), col("line_idx").cast("long").as("line_idx"),
          col("line"))
      val firsts = lines
        .groupBy(xxhash64(col("line")), xxhash64(lit(42L), col("line")),
          length(col("line")))
        .agg(
          min(struct(col("doc_id"), col("line_idx"), col("line"))).as("first"),
          countDistinct(xxhash64(lit(1337L), col("line"))).as("_nfp"))
        .filter(assert_true(col("_nfp") === 1,
          lit("fingerprint collision in line_dedup")).isNull)
        .select(col("first.doc_id").as("doc"),
          col("first.line_idx").as("line_idx"), col("first.line").as("line"))
      val kept = firsts.groupBy(col("doc")).agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(line_idx, line))), x -> x.line)"))
          .as("kept_text"))
      keyed.select(col("doc_id"), col("f1"), col("f2"), col("fl"))
        .join(uniq.select(col("f1"), col("f2"), col("fl"), col("doc"),
          nSeg.cast("long").as("n_lines")), Seq("f1", "f2", "fl"))
        .join(kept, Seq("doc"), "left")
        .select(col("doc_id"), col("n_lines"),
          when(col("doc_id") === col("doc"),
            coalesce(col("n_kept"), lit(0L))).otherwise(lit(0L)).as("n_kept"),
          when(col("doc_id") === col("doc"),
            coalesce(col("kept_text"), lit(""))).otherwise(lit(""))
            .as("kept_text"))
    },

    // C85: BOILERPLATE line scrub (CCNet §4.1 / OSCAR: navigation
    // chrome, cookie banners, repeated headers are lines that recur
    // across documents OF THE SAME SOURCE) — every occurrence of a
    // line appearing in ≥ 2 distinct docs of its source is removed,
    // including the first. Distinct from line_dedup (C45), which
    // keeps one canonical copy corpus-wide: dedup preserves one
    // banner, boilerplate scrub decides the banner is not content at
    // all. Line = the C45 10-token segment convention (corpus carries
    // no newlines; the segmentation is a parameter, the operator is
    // the df-threshold + rewrite).
    //
    // Scale plan (the line_dedup shape): the df count groups by
    // (source, 128-bit line fingerprint) with countDistinct(doc_id)
    // — partial aggregation ships per-(line, doc) candidates, the
    // flagged relation is (boilerplate lines)-sized, and the removal
    // is a left_anti fingerprint join back. Third-fingerprint
    // collision guard as in C1/C45.
    Q("line_boilerplate_scrub",
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |l AS (
        |  SELECT doc_id, source, unnest(list_transform(
        |    range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
        |    i -> struct_pack(
        |      line_idx := CAST(i AS BIGINT),
        |      line := array_to_string(
        |        toks[CAST(i * 10 + 1 AS INT):CAST(i * 10 + 10 AS INT)], ' '))),
        |    recursive := true)
        |  FROM t),
        |bp AS (
        |  SELECT source, line FROM (
        |    SELECT source, line, count(DISTINCT doc_id) AS df
        |    FROM l GROUP BY source, line)
        |  WHERE df >= 2),
        |k AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    array_to_string(list(line ORDER BY line_idx), ' ') AS kept_text
        |  FROM l
        |  WHERE NOT EXISTS (SELECT 1 FROM bp
        |                    WHERE bp.source = l.source AND bp.line = l.line)
        |  GROUP BY doc_id),
        |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
        |      FROM l GROUP BY doc_id)
        |SELECT n.doc_id, n.n_lines,
        |  coalesce(k.n_kept, 0) AS n_kept,
        |  coalesce(k.kept_text, '') AS kept_text
        |FROM n LEFT JOIN k USING (doc_id)""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val nSeg = ceil(size(toks).cast("double") / lit(10.0)).cast("int")
      val lines = table(s, dir, "documents").select(
        col("doc_id"), col("source"),
        posexplode(transform(sequence(lit(0), nSeg - 1),
          i => concat_ws(" ", slice(toks, i * 10 + 1, lit(10)))))
          .as(Seq("line_idx", "line")))
        .select(col("doc_id"), col("source"),
          col("line_idx").cast("long").as("line_idx"), col("line"),
          xxhash64(col("line")).as("h1"),
          xxhash64(lit(42L), col("line")).as("h2"),
          length(col("line")).as("hl"))
      val bp = lines
        .groupBy(col("source"), col("h1"), col("h2"), col("hl"))
        .agg(countDistinct(col("doc_id")).as("df"),
          countDistinct(xxhash64(lit(1337L), col("line"))).as("_nfp"))
        .filter(assert_true(col("_nfp") === 1,
          lit("fingerprint collision in line_boilerplate_scrub")).isNull)
        .filter(col("df") >= 2)
        .select(col("source"), col("h1"), col("h2"), col("hl"))
      val kept = lines.join(bp, Seq("source", "h1", "h2", "hl"), "left_anti")
        .groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_kept"),
          concat_ws(" ", expr(
            "transform(array_sort(collect_list(struct(line_idx, line))), x -> x.line)"))
            .as("kept_text"))
      lines.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_text"), lit("")).as("kept_text"))
    },

    // C84: QUALITY-BAND SPLIT (the CCNet head/middle/tail recipe,
    // Wenzek et al. 2020 — there by LM perplexity, here by the C10
    // composite quality score, the same operator over a different
    // score): per LANGUAGE, rank docs by score and cut at the count
    // terciles — head = best third, tail = worst third — so
    // downstream mixing can up-weight head data per language rather
    // than globally (a global cut would assign whole low-resource
    // languages to one band). RANK terciles, not score quantiles:
    // the cuts are exact integers, no interpolation to disagree on.
    // The ranking key is the UNROUNDED quality score (bit-equal
    // across engines — the dedup_keep_best precedent), ties on
    // doc_id; per-lang ranks via DistributedPrefixSum — two streamed
    // range-partitioned passes, never a per-lang single-reducer
    // window. Output pins the exact band SETS (id_sum) plus each
    // band's score range.
    Q("corpus_quality_bands",
      s"""WITH q AS (
         |  SELECT doc_id, lang, ${TextQueries.qualityRawSql} AS q
         |  FROM documents),
         |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY lang),
         |r AS (
         |  SELECT doc_id, lang, q,
         |    row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS rnk
         |  FROM q),
         |b AS (
         |  SELECT r.lang, r.doc_id, r.q,
         |    CASE WHEN rnk <= (n + 2) // 3 THEN 'head'
         |         WHEN rnk <= (2 * n + 2) // 3 THEN 'middle'
         |         ELSE 'tail' END AS band
         |  FROM r JOIN n USING (lang))
         |SELECT lang, band,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  floor(min(q) * 10000 + 0.5) / 10000 AS min_q,
         |  floor(max(q) * 10000 + 0.5) / 10000 AS max_q
         |FROM b GROUP BY lang, band""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TF.qualityScore(col("text")).as("q"))
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      // rank by quality DESC ⇔ prefix-count in (−q, doc_id) ASC order
      val ranked = graft.operators.DistributedPrefixSum.running(
        docs.withColumn("nq", -col("q")).withColumn("_one", lit(1L)),
        "lang", Seq("nq", "doc_id"), "_one", "rnk")
      ranked.join(broadcast(counts), Seq("lang"))
        .withColumn("band",
          when(col("rnk") <= expr("(n + 2) DIV 3"), "head")
            .when(col("rnk") <= expr("(2 * n + 2) DIV 3"), "middle")
            .otherwise("tail"))
        .groupBy(col("lang"), col("band"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          (floor(min(col("q")) * 10000 + lit(0.5)) / 10000).as("min_q"),
          (floor(max(col("q")) * 10000 + lit(0.5)) / 10000).as("max_q"))
    },

    // C46: quality-aware canonical selection — within each transitive
    // near-dup cluster keep the HIGHEST-quality member, not the
    // lowest id (what a production pipeline actually wants: among
    // mirrored copies keep the cleanest). Cluster machinery is
    // dedup_clusters' (MinHash-LSH pairs → hash-min connected
    // components); the choice key is the UNROUNDED quality score,
    // bit-equal across engines, ties broken on doc_id.
    Q("dedup_keep_best",
      s"""WITH RECURSIVE $pairsCte,
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8),
         |edges AS (SELECT id_a AS s, id_b AS t FROM p
         |          UNION SELECT id_b, id_a FROM p),
         |reach(id, r) AS (
         |  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
         |  UNION
         |  SELECT e.s, r.r FROM edges e JOIN reach r ON e.t = r.id),
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |q AS (SELECT cl.id, cl.cluster_id, ${TextQueries.qualityRawSql} AS qual
         |      FROM cl JOIN documents d ON cl.id = d.doc_id)
         |SELECT cluster_id, n_members, kept_doc_id, kept_quality FROM (
         |  SELECT cluster_id,
         |    CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members,
         |    id AS kept_doc_id,
         |    floor(qual * 10000 + 0.5) / 10000 AS kept_quality,
         |    row_number() OVER (PARTITION BY cluster_id ORDER BY qual DESC, id) AS rn
         |  FROM q) WHERE rn = 1""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      collapsedClusters(s, dir)
        .join(docs.select(col("doc_id").as("id"),
          TF.qualityScore(col("text")).as("qual")), Seq("id"))
        .groupBy(col("cluster_id"))
        .agg(
          count(lit(1)).as("n_members"),
          // lexicographic max of (quality, -id): max quality, ties
          // resolved to the LOWEST doc_id — window-free argmax with
          // map-side partial aggregation
          max_by(col("id"), struct(col("qual"), -col("id"))).as("kept_doc_id"),
          (floor(max(col("qual")) * lit(10000) + lit(0.5)).cast("double") /
            lit(10000)).as("kept_quality"))
    },

    // C30: the END-TO-END curation pipeline as ONE declarative plan —
    // scrub → quality filter → exact dedup (keep-first on normalized
    // scrubbed text) → split assignment → per-(split, lang) counts.
    // What a corpus builder actually ships: each stage is one of the
    // pipeline's oracled operators (C13/C14/C1/C17) composed, and the
    // whole chain still plans as a single job with two keyed
    // exchanges (dedup group + final rollup).
    Q("corpus_curate_pipeline",
      s"""WITH f AS (
         |  SELECT doc_id, lang,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
         |      'https?://[^ ]+', '<URL>', 'g'),
         |      '[0-9]{4,}', '<NUM>', 'g') AS stext
         |  FROM documents
         |  WHERE n_chars >= 200 AND $nTokSql >= 30),
         |k AS (
         |  SELECT min(doc_id) AS doc_id,
         |    min_by(lang, doc_id) AS lang,
         |    min_by(length(stext), doc_id) AS slen
         |  FROM f
         |  GROUP BY regexp_replace(lower(trim(stext)), '\\s+', ' ', 'g'))
         |SELECT
         |  CASE WHEN doc_id % 10 < 8 THEN 'train'
         |       WHEN doc_id % 10 < 9 THEN 'val'
         |       ELSE 'test' END AS split,
         |  lang,
         |  count(*) AS n_docs,
         |  CAST(sum(slen) AS BIGINT) AS total_chars
         |FROM k GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val scrubbed = regexp_replace(regexp_replace(regexp_replace(col("text"),
        "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
        "https?://[^ ]+", "<URL>"),
        "[0-9]{4,}", "<NUM>")
      table(s, dir, "documents")
        .filter(col("n_chars") >= 200 && TF.tokenCount(col("text")) >= 30)
        .select(col("doc_id"), col("lang"), scrubbed.as("stext"),
          TF.normalizeText(scrubbed).as("norm"))
        // dedup stage keys the exchange on a 128-bit fingerprint +
        // length, not the normalized text (same contract as
        // dedup_exact_docs: third-fingerprint assert fails loudly on
        // collision instead of silently merging)
        .groupBy(xxhash64(col("norm")), xxhash64(lit(42L), col("norm")),
          length(col("norm")))
        .agg(
          min(col("doc_id")).as("doc_id"),
          min_by(col("lang"), col("doc_id")).as("lang"),
          min_by(length(col("stext")), col("doc_id")).as("slen"),
          countDistinct(xxhash64(lit(1337L), col("norm"))).as("_nfp"))
        .filter(assert_true(col("_nfp") === 1,
          lit("fingerprint collision in corpus_curate_pipeline")).isNull)
        .withColumn("split",
          when(col("doc_id") % 10 < 8, "train")
            .when(col("doc_id") % 10 < 9, "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("slen")).as("total_chars"))
    },

    // C16: greedy sequence packing — assign docs (in stable order,
    // per language) to fixed token-budget bins by running token
    // offset; integer-exact in both engines. NOT a window: PARTITION
    // BY lang has a handful of groups, so a window would serialize
    // each language's whole corpus through one reducer at 100 TB —
    // DistributedPrefixSum computes the identical running total in
    // two parallel streamed passes (plan-asserted window-free).
    Q("pack_documents",
      s"""WITH d AS (
         |  SELECT doc_id, lang, CAST($nTokSql AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tok,
         |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
         |  FROM d)
         |SELECT doc_id, lang, n_tok,
         |  CAST(floor((cum_tok - n_tok) / 2048.0) AS BIGINT) AS bin_id
         |FROM c""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TF.tokenCount(col("text")).cast("bigint").as("n_tok"))
      graft.operators.DistributedPrefixSum
        .running(d, "lang", Seq("doc_id"), "n_tok", "cum_tok")
        .select(col("doc_id"), col("lang"), col("n_tok"),
          floor((col("cum_tok") - col("n_tok")) / 2048.0).cast("bigint").as("bin_id"))
    },

    // C122: PACKING EFFICIENCY AUDIT — the fill-rate/waste report on
    // C16's prefix-cut sequence packer (what a training team reads
    // before committing a context length: Krell et al. 2022 report
    // exactly these numbers for packed BERT). Per language: docs,
    // bins (= distinct prefix-cut bin ids), total tokens, fill =
    // tokens/(bins·2048) ONE division 6dp, and the STRADDLER count —
    // docs whose token span crosses a 2048 boundary (the packer's
    // truncation/continuation cases): a doc straddles iff
    // (cum−n)//2048 ≠ (cum−1)//2048 on the same exact prefix sums
    // C16 assigns bins from (n > 0; integer floor both engines).
    // Scale shape: C16's DistributedPrefixSum pass + one keyed
    // language rollup — no new shuffles beyond the packer's own.
    Q("packing_efficiency",
      s"""WITH d AS (
         |  SELECT doc_id, lang, CAST($nTokSql AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tok,
         |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d),
         |g AS (
         |  SELECT lang,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT (cum - n_tok) // 2048) AS BIGINT) AS n_bins,
         |    CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |    CAST(sum(CASE WHEN n_tok > 0 AND
         |      (cum - n_tok) // 2048 <> (cum - 1) // 2048
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
         |  FROM c GROUP BY lang)
         |SELECT lang, n_docs, n_bins, total_tokens, n_straddlers,
         |  floor(CAST(total_tokens AS DOUBLE)
         |    / CAST(n_bins * 2048 AS DOUBLE) * 1000000 + 0.5) / 1000000
         |    AS fill_rate
         |FROM g""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TF.tokenCount(col("text")).cast("bigint").as("n_tok"))
      val c = graft.operators.DistributedPrefixSum
        .running(d, "lang", Seq("doc_id"), "n_tok", "cum")
      c.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(expr("(cum - n_tok) div 2048")).as("n_bins"),
          sum(col("n_tok")).as("total_tokens"),
          sum(when(col("n_tok") > 0 &&
            expr("(cum - n_tok) div 2048") =!= expr("(cum - 1) div 2048"),
            1L).otherwise(0L)).as("n_straddlers"))
        .select(col("lang"), col("n_docs"), col("n_bins"),
          col("total_tokens"), col("n_straddlers"),
          (floor(col("total_tokens").cast("double")
            / (col("n_bins") * 2048).cast("double") * 1000000 + lit(0.5))
            / 1000000).as("fill_rate"))
    },

    // C25: overlapping-window document chunking — the RAG/pretraining
    // primitive that turns long docs into fixed-token windows
    // (size 128, stride 96 → 32-token overlap). A chunk i exists
    // while its start is in range and the previous chunk did not
    // already reach the end: i ≤ max(0, floor((n − 33) / 96)) — the
    // closed form both engines evaluate in identical IEEE floor
    // arithmetic. Chunk CONTENT is pinned, not just counts: first and
    // last token plus exact character length per chunk. One explode,
    // no shuffle until the (absent) downstream agg — at 100 TB this
    // is a map-only pass.
    Q("chunk_documents",
      s"""WITH d AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS t FROM documents),
         |n AS (SELECT doc_id, t, len(t) AS n_tok FROM d),
         |c AS (
         |  SELECT doc_id, t, n_tok, CAST(i AS INT) AS chunk_id
         |  FROM n, unnest(range(0,
         |    CAST(greatest(0, floor((n_tok - 33) / 96.0)) AS BIGINT) + 1)) AS u(i))
         |SELECT doc_id, chunk_id,
         |  CAST(chunk_id * 96 AS BIGINT) AS start_tok,
         |  CAST(least(128, n_tok - chunk_id * 96) AS BIGINT) AS n_tok_chunk,
         |  t[chunk_id * 96 + 1] AS first_tok,
         |  t[chunk_id * 96 + least(128, n_tok - chunk_id * 96)] AS last_tok,
         |  CAST(list_sum(list_transform(
         |      t[chunk_id * 96 + 1 : chunk_id * 96 + least(128, n_tok - chunk_id * 96)],
         |      x -> length(x))) + least(128, n_tok - chunk_id * 96) - 1
         |    AS BIGINT) AS chunk_chars
         |FROM c""".stripMargin) { (s, dir) =>
      val toks = table(s, dir, "documents").select(
        col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("t"))
        .withColumn("n_tok", size(col("t")))
      toks
        .select(col("doc_id"), col("t"), col("n_tok"),
          explode(sequence(lit(0),
            greatest(lit(0), floor((col("n_tok") - 33) / 96.0)).cast("int")))
            .as("chunk_id"))
        .withColumn("start_tok", (col("chunk_id") * 96).cast("bigint"))
        .withColumn("n_tok_chunk",
          least(lit(128), col("n_tok") - col("chunk_id") * 96).cast("bigint"))
        .withColumn("_chunk", expr("slice(t, cast(start_tok as int) + 1, cast(n_tok_chunk as int))"))
        .select(
          col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok_chunk"),
          element_at(col("_chunk"), 1).as("first_tok"),
          element_at(col("_chunk"), -1).as("last_tok"),
          (expr("aggregate(transform(_chunk, x -> length(x)), 0L, (a, x) -> a + x)")
            + col("n_tok_chunk") - 1).cast("bigint").as("chunk_chars"))
    },

    // C26: train/test contamination check — the eval-hygiene pass
    // (GPT-3 appendix C style): a TEST doc is contaminated if any of
    // its word 8-grams appears anywhere in the TRAIN split. Spark
    // joins HASHED shingles (the scale path — 8 bytes per gram on the
    // exchange, one keyed equi-join); the oracle joins the gram
    // STRINGS — identical counts up to 64-bit hash collisions, the
    // same contract every dedup oracle here already rests on. Splits
    // are dataset_split's doc_id % 10 assignment.
    Q("contamination_check",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(toks) - 6),
        |    i -> concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i + 1 AS INT)],
        |      toks[CAST(i + 2 AS INT)], toks[CAST(i + 3 AS INT)],
        |      toks[CAST(i + 4 AS INT)], toks[CAST(i + 5 AS INT)],
        |      toks[CAST(i + 6 AS INT)], toks[CAST(i + 7 AS INT)]))))  AS g
        |  FROM t WHERE len(toks) >= 8),
        |tr AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 < 8),
        |te AS (SELECT doc_id, g FROM g WHERE doc_id % 10 >= 9)
        |SELECT te.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overlap,
        |  CAST(CASE WHEN sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) > 0
        |    THEN 1 ELSE 0 END AS INT) AS is_contaminated
        |FROM te LEFT JOIN tr USING (g)
        |GROUP BY te.doc_id""".stripMargin) { (s, dir) =>
      val grams = table(s, dir, "documents").select(
        col("doc_id"),
        explode(graft.functions.VectorExpressions.tokenNgramHashes(
          split(col("text"), " "), 8)).as("g"))
      val train = grams.filter(col("doc_id") % 10 < 8)
        .select(col("g")).distinct().withColumn("hit", lit(1))
      grams.filter(col("doc_id") % 10 >= 9)
        .join(train, Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0))).as("n_overlap"))
        .select(col("doc_id"), col("n_grams"), col("n_overlap"),
          (col("n_overlap") > 0).cast("int").as("is_contaminated"))
    },

    // C36: the FULL pretraining data pipeline — quality filter →
    // scrub → exact dedup (fingerprint keys) → language rebalance →
    // overlapping chunking → token-budget packing — composed as ONE
    // declarative plan: the superset of corpus_curate_pipeline that
    // ends in training bins rather than a split rollup. Exchanges:
    // dedup group (fingerprint-keyed), the rebalance threshold
    // broadcast, and the packing prefix-sum passes (window-free);
    // chunking is a map-side explode. Everything is integer
    // arithmetic, so the oracle (which may use the window spelling —
    // it is the SPECIFICATION, not the plan) matches exactly.
    Q("corpus_pretrain_pipeline",
      s"""WITH f AS (
         |  SELECT doc_id, lang,
         |    regexp_replace(lower(trim(
         |      regexp_replace(regexp_replace(regexp_replace(text,
         |        '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
         |        'https?://[^ ]+', '<URL>', 'g'),
         |        '[0-9]{4,}', '<NUM>', 'g'))), '\\s+', ' ', 'g') AS norm
         |  FROM documents
         |  WHERE n_chars >= 200 AND $nTokSql >= 30),
         |k AS (
         |  SELECT min(doc_id) AS doc_id, min_by(lang, doc_id) AS lang, norm
         |  FROM f GROUP BY norm),
         |t AS (SELECT CAST(count(*) AS DOUBLE) AS n_total,
         |        count(DISTINCT lang) AS n_langs FROM k),
         |s AS (SELECT lang, count(*) AS n_docs FROM k GROUP BY lang),
         |th AS (
         |  SELECT lang,
         |    CAST(floor(least(1.0,
         |      (SELECT n_total FROM t) / (SELECT n_langs FROM t) / n_docs)
         |      * 1000000) AS BIGINT) AS thresh
         |  FROM s),
         |r AS (
         |  SELECT k.doc_id, k.lang, string_split(k.norm, ' ') AS toks
         |  FROM k JOIN th USING (lang)
         |  WHERE ((k.doc_id % 1000003) * 2654435761) % 1000000 < th.thresh),
         |n AS (SELECT doc_id, lang, toks, len(toks) AS n_tok FROM r),
         |c AS (
         |  SELECT doc_id, lang, n_tok, CAST(i AS INT) AS chunk_id,
         |    CAST(least(128, n_tok - i * 96) AS BIGINT) AS nc
         |  FROM n, unnest(range(0,
         |    CAST(greatest(0, floor((n_tok - 33) / 96.0)) AS BIGINT) + 1)) AS u(i)),
         |p AS (
         |  SELECT doc_id, lang, chunk_id, nc,
         |    sum(nc) OVER (PARTITION BY lang ORDER BY doc_id, chunk_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM c)
         |SELECT lang,
         |  CAST(floor((cum - nc) / 2048.0) AS BIGINT) AS bin_id,
         |  count(*) AS n_chunks,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(sum(nc) AS BIGINT) AS total_tokens
         |FROM p GROUP BY lang, bin_id""".stripMargin) { (s, dir) =>
      val scrubbed = regexp_replace(regexp_replace(regexp_replace(col("text"),
        "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
        "https?://[^ ]+", "<URL>"),
        "[0-9]{4,}", "<NUM>")
      // filter → scrub → normalize; dedup keys the exchange on the
      // 128-bit fingerprint (+ length), norm travels once as a value.
      // The deduped corpus is materialized ONCE (three consumers:
      // totals, thresholds, the main chain) — localCheckpoint here; on
      // a production cluster this stage persists to a table, exactly
      // like semantic_dedup's assignment materialization.
      val kept = table(s, dir, "documents")
        .filter(col("n_chars") >= 200 && TF.tokenCount(col("text")) >= 30)
        .select(col("doc_id"), col("lang"), TF.normalizeText(scrubbed).as("norm"))
      val dedup = kept
        .groupBy(xxhash64(col("norm")), xxhash64(lit(42L), col("norm")),
          length(col("norm")))
        .agg(
          min(col("doc_id")).as("doc_id"),
          min_by(col("lang"), col("doc_id")).as("lang"),
          min_by(col("norm"), col("doc_id")).as("norm"),
          countDistinct(xxhash64(lit(1337L), col("norm"))).as("_nfp"))
        .filter(assert_true(col("_nfp") === 1,
          lit("fingerprint collision in corpus_pretrain_pipeline")).isNull)
        .select(col("doc_id"), col("lang"), col("norm"))
        .localCheckpoint()
      // rebalance thresholds from the DEDUPED corpus, broadcast back
      val tot = dedup.agg(
        count(lit(1)).cast("double").as("n_total"),
        countDistinct(col("lang")).as("n_langs"))
      val th = dedup.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(tot))
        .select(col("lang"),
          floor(least(lit(1.0), col("n_total") / col("n_langs") / col("n_docs"))
            * 1000000).cast("bigint").as("thresh"))
      val kept2 = dedup
        .join(broadcast(th), Seq("lang"))
        .filter(((col("doc_id") % 1000003L) * 2654435761L % 1000000L) < col("thresh"))
        .select(col("doc_id"), col("lang"), split(col("norm"), " ").as("toks"))
        .withColumn("n_tok", size(col("toks")))
      // overlapping chunks (map-only), then token-budget packing via
      // the window-free distributed prefix sum
      val chunks = kept2
        .select(col("doc_id"), col("lang"), col("n_tok"),
          explode(sequence(lit(0),
            greatest(lit(0), floor((col("n_tok") - 33) / 96.0)).cast("int")))
            .as("chunk_id"))
        .withColumn("nc",
          least(lit(128), col("n_tok") - col("chunk_id") * 96).cast("bigint"))
        .select(col("doc_id"), col("lang"), col("chunk_id"), col("nc"))
      graft.operators.DistributedPrefixSum
        .running(chunks, "lang", Seq("doc_id", "chunk_id"), "nc", "cum")
        .groupBy(col("lang"),
          floor((col("cum") - col("nc")) / 2048.0).cast("bigint").as("bin_id"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("nc")).as("total_tokens"))
    },

    // C48: per-source quota cap — web-corpus pipelines cap documents
    // per DOMAIN so no single crawl source dominates training (the
    // C4/RefinedWeb "domain cap"): keep the top-20 highest-quality
    // docs per source, report the kept SET per source. TopKPerKey
    // bounded heaps (k rows per source per task, no window sort);
    // ordering key is the UNROUNDED quality score (bit-equal across
    // engines), ties on doc_id. kept_id_sum pins the exact kept set,
    // not just its size.
    Q("corpus_domain_cap",
      s"""WITH q AS (SELECT doc_id, source, ${TextQueries.qualityRawSql} AS qual
         |  FROM documents),
         |r AS (SELECT doc_id, source, qual,
         |    row_number() OVER (PARTITION BY source ORDER BY qual DESC, doc_id)
         |      AS rn FROM q),
         |k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
         |    CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
         |    floor(min(qual) * 10000 + 0.5) / 10000 AS min_kept_quality
         |  FROM r WHERE rn <= 20 GROUP BY source),
         |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM q
         |  GROUP BY source)
         |SELECT t.source, n_docs, n_kept, kept_id_sum, min_kept_quality
         |FROM t JOIN k USING (source)""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents").select(
        col("doc_id"), col("source"), TF.qualityScore(col("text")).as("qual"))
      val kept = graft.plans.TopK
        .perKey(docs, Seq("source"), Seq(("qual", false), ("doc_id", true)), 20)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("kept_id_sum"),
          (floor(min(col("qual")) * lit(10000) + lit(0.5)).cast("double") /
            lit(10000)).as("min_kept_quality"))
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .join(kept, Seq("source"))
    },

    // C42: DSIR-style importance weighting (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling") — the
    // standard way a pretraining corpus is reweighted toward a target
    // domain: hashed n-gram features (unigrams + bigrams, hash trick
    // into B = 8192 buckets), per-bucket add-one-smoothed log-ratio of
    // target vs source feature distributions, per-doc importance
    // weight = Σ over the doc's feature instances. Target here = the
    // lang='en' slice (a real deployment plugs in any in-domain
    // sample; the ENGINE work is identical).
    // Scale shape: the corpus is scanned exactly TWICE — once to
    // train (bucket groupBy, map-side combined into ≤ B·partitions
    // rows) and once to score (broadcast join against the ≤ B-row
    // weight table + one doc_id aggregation). The model is
    // localCheckpointed so no consumer re-runs training.
    // Determinism: bucket ids replay the HUGEINT rolling-fingerprint
    // mod-2^64 convention (text_quality_model precedent: unsigned
    // % 8192 ≡ signed & 8191); bigram buckets compose the two token
    // buckets as (b1·1000003 + b2) % 8192 in plain integer
    // arithmetic. The per-bucket log-ratio is quantized to an INTEGER
    // micro-log (floor(ln·1e4 + 0.5), the 4dp convention — ≤ B
    // model-sized ln calls, sub-ulp libm caveat as text_entropy), so
    // the per-doc Σ is an order-independent integer sum and the
    // keep/drop sign compares exactly. The oracle's char split
    // filters empty strings so an EMPTY token hashes to 0 exactly as
    // Spark's fingerprint of zero bytes does (DuckDB ord('') = −1
    // would otherwise yield bucket −1 — a latent divergence for any
    // doc whose text normalizes to empty; no-op for non-empty
    // tokens).
    Q("corpus_importance_weights",
      s"""WITH t AS (SELECT doc_id, lang, string_split($normSql, ' ') AS toks
         |  FROM documents),
         |u AS (
         |  SELECT doc_id, lang,
         |    list_transform(toks, tok ->
         |      CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
         |          list_transform(
         |            list_filter(string_split_regex(tok, ''), c -> c <> ''),
         |            c -> CAST(ord(c) AS HUGEINT))),
         |        (h, b) -> (h * 31 + b) % 18446744073709551616) % 8192 AS BIGINT)) AS ub
         |  FROM t),
         |i AS (
         |  SELECT doc_id, lang, unnest(list_concat(ub,
         |    list_transform(range(1, len(ub)), j ->
         |      (ub[CAST(j AS INT)] * 1000003 + ub[CAST(j + 1 AS INT)]) % 8192))) AS bucket
         |  FROM u),
         |m AS (
         |  SELECT bucket, count(*) AS cs,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
         |  FROM i GROUP BY bucket),
         |tot AS (SELECT CAST(sum(cs) AS DOUBLE) AS ns, CAST(sum(ct) AS DOUBLE) AS nt
         |  FROM m),
         |w AS (
         |  SELECT bucket,
         |    CAST(floor(ln(((ct + 1.0) / (cs + 1.0)) * ((ns + 8192.0) / (nt + 8192.0)))
         |      * 10000 + 0.5) AS BIGINT) AS lw_micro
         |  FROM m, tot)
         |SELECT i.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_features,
         |  CAST(sum(lw_micro) AS BIGINT) AS weight_micro,
         |  CAST(CASE WHEN sum(lw_micro) > 0 THEN 1 ELSE 0 END AS INT) AS kept
         |FROM i JOIN w USING (bucket)
         |GROUP BY i.doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.Fingerprint64
      val ub = transform(split(TF.normalizeText(col("text")), " "),
        tok => Fingerprint64.fingerprint64(tok).bitwiseAND(lit(8191L)))
      val inst = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), ub.as("ub"))
        .select(col("doc_id"), col("lang"),
          explode(concat(col("ub"),
            zip_with(
              slice(col("ub"), lit(1), size(col("ub")) - 1),
              slice(col("ub"), lit(2), size(col("ub")) - 1),
              (x, y) => (x * lit(1000003L) + y) % lit(8192L)))).as("bucket"))
      val model = inst.groupBy(col("bucket")).agg(
          count(lit(1)).as("cs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
        .localCheckpoint()
      val totals = model.agg(
        sum(col("cs")).cast("double").as("ns"),
        sum(col("ct")).cast("double").as("nt"))
      val weighted = model.crossJoin(broadcast(totals))
        .select(col("bucket"),
          floor(log(((col("ct") + lit(1.0)) / (col("cs") + lit(1.0)))
              * ((col("ns") + lit(8192.0)) / (col("nt") + lit(8192.0))))
            * 10000 + lit(0.5)).as("lw_micro"))
      inst.join(broadcast(weighted), Seq("bucket"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_features"), sum(col("lw_micro")).as("weight_micro"))
        .select(col("doc_id"), col("n_features"), col("weight_micro"),
          (col("weight_micro") > 0).cast("int").as("kept"))
    },

    // C17: deterministic train/val/test split assignment.
    Q("dataset_split",
      """SELECT
        |  CASE WHEN doc_id % 10 < 8 THEN 'train'
        |       WHEN doc_id % 10 < 9 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .withColumn("split",
          when(col("doc_id") % 10 < 8, "train")
            .when(col("doc_id") % 10 < 9, "val")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    },

    // C76: CORPUS DECONTAMINATION (span removal) — C26 detects
    // benchmark contamination; this op REMOVES it: every train-doc
    // token covered by any 8-gram that also appears in the test split
    // is dropped and the doc reassembled (the Dolma/FineWeb
    // "decontaminate before training" rewrite). The 100 TB shape:
    // test/eval sets are small by nature, so their distinct 8-grams
    // BROADCAST; the train corpus pays one scan + gram explode +
    // broadcast semi-match, and covered positions fold back per doc
    // (collect_set bounded by the doc's own length). Map-side heavy,
    // ONE keyed exchange (doc_id → covered starts). Exact string
    // grams on the broadcast (no hash-collision caveat — the payload
    // is test-set-sized, not corpus-sized).
    Q("corpus_decontaminate",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tg AS (
        |  SELECT DISTINCT unnest(list_transform(
        |    range(0, greatest(len(toks) - 7, 0)),
        |    i -> array_to_string(toks[CAST(i + 1 AS INT):CAST(i + 8 AS INT)], ' '))) AS g
        |  FROM t WHERE doc_id % 10 >= 9),
        |tr AS (SELECT doc_id, toks FROM t WHERE doc_id % 10 < 8),
        |st AS (
        |  SELECT x.doc_id, x.s
        |  FROM (SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS s
        |        FROM tr) x
        |  JOIN tg ON array_to_string(
        |    x.toks[CAST(x.s + 1 AS INT):CAST(x.s + 8 AS INT)], ' ') = tg.g),
        |cov AS (SELECT doc_id, list(DISTINCT s) AS cv FROM st GROUP BY doc_id),
        |o AS (SELECT tr.doc_id, toks,
        |        coalesce(cov.cv, CAST([] AS BIGINT[])) AS cv
        |      FROM tr LEFT JOIN cov USING (doc_id)),
        |k AS (SELECT doc_id, toks,
        |        list_filter(range(len(toks)),
        |          i -> len(list_filter(cv, s -> i >= s AND i <= s + 7)) = 0) AS kept
        |      FROM o)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_toks,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  coalesce(array_to_string(
        |    list_transform(kept, i -> toks[CAST(i + 1 AS INT)]), ' '), '')
        |    AS clean_text
        |FROM k""".stripMargin) { (s, dir) =>
      val t = table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val starts = expr(
        "CASE WHEN size(toks) >= 8 THEN sequence(0, size(toks) - 8) " +
          "ELSE CAST(array() AS ARRAY<INT>) END")
      val gramAt = "array_join(slice(toks, s + 1, 8), ' ')"
      val testGrams = t.filter(col("doc_id") % 10 >= 9)
        .select(explode(starts).as("s"), col("toks"))
        .select(expr(gramAt).as("g")).distinct()
      val train = t.filter(col("doc_id") % 10 < 8)
      val covered = train
        .select(col("doc_id"), col("toks"), explode(starts).as("s"))
        .join(broadcast(testGrams), expr(gramAt) === col("g"))
        .groupBy(col("doc_id")).agg(collect_set(col("s")).as("cv"))
      train.join(covered, Seq("doc_id"), "left")
        .withColumn("cv", coalesce(col("cv"), expr("CAST(array() AS ARRAY<INT>)")))
        .withColumn("kept", expr(
          "filter(transform(toks, (t, i) -> struct(i AS i, t AS t)), " +
            "x -> NOT exists(cv, s -> x.i >= s AND x.i <= s + 7))"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_toks"),
          size(col("kept")).cast("long").as("n_kept"),
          array_join(expr("transform(kept, x -> x.t)"), " ").as("clean_text"))
    },

    // C79: TOKEN-BUDGET CORPUS SELECTION — the "best docs up to N
    // tokens" cut every pretraining run makes: rank by a quality
    // signal, take the prefix whose cumulative token count fits the
    // budget (greedy knapsack with unit-density items — optimal for
    // this objective). Signal = chars-per-token density in integer
    // milli-units ((1000·n_chars) div n_tokens — longer words ≈
    // prose; exact integers, no float boundary); budget = ¼ of the
    // corpus's total tokens (one metadata-cheap agg, broadcast).
    // The cumulative sum is DistributedPrefixSum over (−score,
    // doc_id) order — two streamed range-partitioned passes, never a
    // single-reducer global window; the oracle states the same
    // prefix as a window sum. A doc straddling the boundary is
    // excluded (kept ⇔ cum ≤ budget): the cut is a deterministic
    // function of the ranked prefix, not of partitioning.
    Q("corpus_budget_select",
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    n_chars
        |  FROM documents),
        |sc AS (SELECT doc_id, source, n_tokens,
        |    (1000 * n_chars) // n_tokens AS score_milli FROM t),
        |b AS (SELECT CAST(sum(n_tokens) // 4 AS BIGINT) AS budget FROM sc),
        |r AS (
        |  SELECT doc_id, source, n_tokens, score_milli,
        |    sum(n_tokens) OVER (ORDER BY -score_milli, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM sc)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
        |  CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
        |  CAST(min(score_milli) AS BIGINT) AS worst_score_milli
        |FROM r, b WHERE cum <= budget
        |GROUP BY source""".stripMargin) { (s, dir) =>
      val t = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          col("n_chars"))
        .withColumn("score_milli", expr("(1000 * n_chars) div n_tokens"))
        .withColumn("neg_score", -col("score_milli"))
        .withColumn("_g", lit("all"))
      // DIV, not `/`: Spark's / is double division — the budget must
      // be the exact integer the oracle's `//` computes.
      val budget = t.agg(expr("sum(n_tokens) DIV 4").as("budget"))
      graft.operators.DistributedPrefixSum
        .running(t, "_g", Seq("neg_score", "doc_id"), "n_tokens", "cum")
        .crossJoin(broadcast(budget))
        .filter(col("cum") <= col("budget"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tokens")).as("kept_tokens"),
          sum(col("doc_id")).as("kept_id_sum"),
          min(col("score_milli")).as("worst_score_milli"))
    },

    // C104: DATASET CARD / per-source corpus summary (the
    // "datasheets for datasets" report, Gebru et al. 2021 — the
    // one-page evidence table a dataset release ships): per source
    // the doc count, exact whitespace-token total, distinct
    // languages, EXACT-duplicate fraction (docs sharing a normalized
    // 128-bit fingerprint with ≥1 other doc of the same source — the
    // C1 fingerprint contract), mean quality in exact milli units
    // ((Σ⌊q·1000⌋) DIV n — integer, no rounding contract), and the
    // token-count range. One corpus scan + one fingerprint-grain
    // keyed agg; everything else is per-source rollups.
    Q("corpus_datacard",
      s"""WITH d AS (
        |  SELECT source, lang, doc_id,
        |    CAST($nTokSql AS BIGINT) AS n_toks,
        |    CAST(floor((${TextQueries.qualityRawSql}) * 1000) AS BIGINT)
        |      AS q_milli,
        |    $normSql AS norm
        |  FROM documents),
        |fpc AS (SELECT source, norm, CAST(count(*) AS BIGINT) AS c
        |        FROM d GROUP BY source, norm)
        |SELECT d.source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(d.n_toks) AS BIGINT) AS total_tokens,
        |  CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
        |  CAST(count(*) FILTER (fpc.c > 1) AS BIGINT) AS n_dup_docs,
        |  CAST((sum(d.q_milli) - ((sum(d.q_milli) % count(*)
        |      + count(*)) % count(*))) // count(*) AS BIGINT)
        |    AS mean_q_milli,
        |  CAST(min(d.n_toks) AS BIGINT) AS min_toks,
        |  CAST(max(d.n_toks) AS BIGINT) AS max_toks
        |FROM d JOIN fpc ON d.source = fpc.source AND d.norm = fpc.norm
        |GROUP BY d.source""".stripMargin) { (s, dir) =>
      // Spark keys the dup rollup on the C1 128-bit fingerprint pair
      // + length (never the text itself on the exchange), with the
      // third-fingerprint collision guard; the oracle states the
      // same relation over the normalized TEXT (the C1 convention).
      val d = table(s, dir, "documents")
        .select(col("source"), col("lang"), col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_toks"),
          floor(TF.qualityScore(col("text")) * 1000).cast("long")
            .as("q_milli"),
          TF.normalizeText(col("text")).as("norm"))
        .select(col("source"), col("lang"), col("doc_id"), col("n_toks"),
          col("q_milli"),
          struct(xxhash64(col("norm")), xxhash64(lit(42L), col("norm")),
            length(col("norm"))).as("fp"),
          xxhash64(lit(1337L), col("norm")).as("_fp3"))
        .localCheckpoint() // fingerprint rollup + the card read it
      val fpc = d.groupBy(col("source"), col("fp"))
        .agg(count(lit(1)).as("c"), countDistinct(col("_fp3")).as("_nfp"))
        .filter(assert_true(col("_nfp") === 1,
          lit("fingerprint collision in corpus_datacard")).isNull)
        .select(col("source"), col("fp"), col("c"))
      d.join(fpc, Seq("source", "fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          sum((col("c") > 1).cast("long")).as("n_dup_docs"),
          sum(col("q_milli")).as("_sq"),
          min(col("n_toks")).as("min_toks"),
          max(col("n_toks")).as("max_toks"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("n_langs"), col("n_dup_docs"),
          expr("(_sq - (((_sq % n_docs) + n_docs) % n_docs)) div n_docs")
            .as("mean_q_milli"),
          col("min_toks"), col("max_toks"))
    },

    // C100: DICTIONARY BLOCKLIST TAGGING (the CommonCrawl/C4
    // bad-word-list filter shape, Raffel et al. 2020 §2.2 — a fixed
    // term dictionary broadcast to every doc, per-doc occurrence
    // evidence + a flag; the Aho-Corasick use case at the
    // whitespace-token grain this corpus's conventions define): total
    // hits via the fused one-pass TokenSetStats scan (the stopword
    // kernel reused with a different dictionary — exactly how a real
    // pipeline swaps wordlists), distinct hit terms via a set
    // intersect on the deduped token list; flagged = ≥ 3 total hits
    // OR ≥ 2 distinct terms (evidence-weighted, both count columns
    // oracle-gated so the thresholds are replayable). Dictionary
    // picks one common, one mid, one rare and one ABSENT term so
    // every evidence regime is exercised (absent ⇒ the scan proves
    // it never phantom-matches). Scale shape: map-only pass,
    // dictionary O(1) broadcast, no shuffle beyond the scan.
    Q("blocklist_tag", {
      val terms = "['slow', 'merge', 'dup', 'crash']"
      s"""WITH t AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
        |      ' ') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(toks, x -> list_contains($terms, x)))
        |      AS BIGINT) AS n_hits,
        |    CAST(len(list_intersect(list_distinct(toks), $terms))
        |      AS BIGINT) AS n_terms
        |  FROM t)
        |SELECT doc_id, n_hits, n_terms,
        |  CAST(CASE WHEN n_hits >= 3 OR n_terms >= 2 THEN 1 ELSE 0 END
        |    AS INT) AS flagged
        |FROM m""".stripMargin
    }) { (s, dir) =>
      val terms = Seq("slow", "merge", "dup", "crash")
      val toks = TF.wsTokens(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.VectorExpressions.tokenSetStats(toks, Seq(terms))
            .getField("hits0").cast("long").as("n_hits"),
          size(array_intersect(array_distinct(toks),
            array(terms.map(lit): _*))).cast("long").as("n_terms"))
        .select(col("doc_id"), col("n_hits"), col("n_terms"),
          (col("n_hits") >= 3 || col("n_terms") >= 2).cast("int")
            .as("flagged"))
    })
}
