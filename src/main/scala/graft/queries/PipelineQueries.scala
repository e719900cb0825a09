package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.TextDedup
import graft.multimodal.Media
import graft.sim.Ann
import graft.text.TextOps

/** Training-data pipeline operators as driver queries + generated DuckDB
  * oracles: text analysis, near-dup dedup (MinHash-LSH / SimHash /
  * Jaccard / exact), ANN over embeddings, multimodal metadata.
  *
  * Oracle-generation helpers build the (sometimes large) ANSI SQL from
  * the same constants the Spark operators use, so the two sides cannot
  * drift independently.
  */
object PipelineQueries {

  private def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  // ---- shared SQL fragments (mirror TextOps/TextDedup/Ann constants) ----

  private val P = TextOps.P
  private val toksSql =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""
  private def strHashSql(x: String) =
    s"CAST(('0x' || substring(md5($x), 1, 15)) AS BIGINT)"
  private def occSql(padded: String, needle: String) =
    s"CAST((length($padded) - length(replace($padded, '$needle', ''))) / ${needle.length} AS BIGINT)"
  private def langScoreSql(markers: Seq[String]) = markers
    .map(m => occSql("concat(' ', lower(text), ' ')", m)).mkString(" + ")
  /** 3-gram distinct shingles of `toks`. */
  private val shinglesSql =
    """list_distinct(CASE WHEN len(toks) >= 3
       THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
       ELSE [array_to_string(toks, ' ')] END)"""
  private val qvSql =
    "[CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) for i in range(1, 65)]"
  private def dotSql(a: String, b: String) =
    s"CAST(list_sum([$a[i] * $b[i] for i in range(1, 65)]) AS BIGINT)"
  private def hyperLit(j: Int): String =
    Ann.hyper(j, 64).mkString("[", ", ", "]")
  /** Shared simhash CTE chain over `src(doc_id, text)`; final CTE `sh`
    * has (doc_id, sh). Kept in one place so q_simhash and q_simhash_pairs
    * cannot drift.
    */
  private def simhashCte(src: String): String = {
    val sums = (0 until 32).map(i =>
      s"SUM(CASE WHEN (th >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s_$i")
      .mkString(", ")
    val bits = (0 until 32).map(i =>
      s"(CASE WHEN s_$i >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""toks AS (
          SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM $src),
        hx AS (SELECT doc_id, ${strHashSql("tok")} AS th FROM toks),
        bs AS (SELECT doc_id, $sums FROM hx GROUP BY doc_id),
        sh AS (SELECT doc_id, ($bits) AS sh FROM bs)"""
  }

  /** Shared MinHash-pair CTE chain over `documents`; final CTE `pairs`
    * has (a, b). Used by q_minhash_pairs and q_dup_clusters so the two
    * gates cannot drift.
    */
  private def minhashPairsCtes: String =
    s"""tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
        sh AS (SELECT doc_id, $shinglesSql AS sh FROM tk),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        hs AS (SELECT doc_id, (${strHashSql("s")} % $P) AS h FROM ex),
        sig AS (
          SELECT doc_id, j,
            min((((j * 2654435761) % $P + 1) * h + ((j * 13 + 7) % $P)) % $P)
              AS mh
          FROM hs CROSS JOIN (SELECT unnest(range(16)) AS j) jj
          GROUP BY doc_id, j),
        bk AS (
          SELECT doc_id,
            concat(CAST(j // 4 AS VARCHAR), ':',
                   string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j)) AS band
          FROM sig GROUP BY doc_id, j // 4),
        pairs AS (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
          FROM bk l JOIN bk r ON l.band = r.band AND l.doc_id < r.doc_id)"""

  private def bucketSqlB(v: String, offset: Int, bits: Int): String =
    (0 until bits).map { j =>
      s"(CASE WHEN ${dotSql(v, s"(${hyperLit(offset + j)})")} >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  private def bucketSql(v: String): String = bucketSqlB(v, 0, 8)
  private def cosSql(v: String, q: String) =
    s"CAST(${dotSql(v, q)} AS DOUBLE) / " +
      s"(sqrt(CAST(${dotSql(v, v)} AS DOUBLE)) * sqrt(CAST(${dotSql(q, q)} AS DOUBLE)))"

  // ---------------- queries ----------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_token_count" -> ((s, dir) =>
      documents(s, dir).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")),

    "q_lang_id" -> ((s, dir) =>
      documents(s, dir).select(col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "q_quality" -> ((s, dir) =>
      documents(s, dir).select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "q_fingerprint" -> ((s, dir) =>
      documents(s, dir).select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // the COMPOSED training-data pipeline, one pass: score (langID +
    // quality + tokens + fingerprint) -> quality filter -> exact dedup
    // (first occurrence per fingerprint) -> per-language corpus stats.
    // Each stage is its own gated operator; this gate pins that they
    // compose (column contracts, null behavior, aggregate types) the way
    // a real corpus build would chain them.
    "q_pipeline_corpus" -> ((s, dir) => {
      val scored = documents(s, dir).select(
        col("doc_id"),
        TextOps.langId(col("text")).as("lang_pred"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        // fingerprint as the dedup key (string works fine as urlHash here)
        TextOps.fingerprint(col("text")).as("urlHash"))
      val kept = scored.filter(col("quality") >= 1300)
      val deduped = graft.dedup.Seen.firstOccurrence(kept, col("doc_id"))
      deduped.groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .orderBy("lang_pred")
    }),

    // winnowing (rolling-hash) fingerprints: count + sum digest per doc.
    // STAGED projections (norm -> hashes -> mins): each stage's output is
    // a materialized column, never an expression re-inlined inside the
    // next stage's lambdas (TextOps staging contract)
    "q_winnow" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"), TextOps.winnowNorm(col("text")).as("_norm"))
        .select(col("doc_id"),
          TextOps.winnowHashes(col("_norm"), k = 5).as("_hs"))
        .select(col("doc_id"), TextOps.winnowMins(col("_hs"), w = 4).as("_fp"))
        .select(col("doc_id"),
          size(col("_fp")).as("n_fp"),
          aggregate(col("_fp"), lit(0L), (a, x) => a + x).as("fp_sum"))
        .orderBy("doc_id")),

    "q_dedup_exact" -> ((s, dir) =>
      TextDedup.exactDupGroups(documents(s, dir), "doc_id", "text")
        .orderBy("fp")),

    "q_simhash" -> ((s, dir) =>
      documents(s, dir).select(col("doc_id"),
        TextDedup.simhash(col("text")).as("simhash"))
        .orderBy("doc_id")),

    // SimHash near-dup pairs: 4-byte hamming banding (full recall <= 3)
    // + exact bit_count verify, over the corpus plus planted duplicates
    "q_simhash_pairs" -> ((s, dir) => {
      val d = documents(s, dir).select(col("doc_id"), col("text"))
      val planted = d.unionByName(d.filter(col("doc_id") < 30)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      TextDedup.simhashPairs(planted, "doc_id", "text", maxHamming = 3)
        .orderBy("a", "b")
    }),

    // BPE-ish subword counting (token-budget estimation proxy)
    "q_token_bpe" -> ((s, dir) =>
      documents(s, dir).select(col("doc_id"),
        TextOps.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")),

    "q_minhash_pairs" -> ((s, dir) =>
      TextDedup.minhashPairs(documents(s, dir), "doc_id", "text",
        shingleN = 3, k = 16, rowsPerBand = 4)
        .orderBy("a", "b")),

    // the COMPOSED dedup decision: banded MinHash pairs -> EXACT
    // connected components (min-label to fixpoint) -> per-doc canonical
    // id + cluster size. Oracle: the same pair CTEs + a recursive
    // min-reachability walk.
    "q_dup_clusters" -> ((s, dir) =>
      TextDedup.dupClusters(documents(s, dir), "doc_id", "text",
        shingleN = 3, k = 16, rowsPerBand = 4)
        .orderBy("doc_id")),

    "q_jaccard_pairs" -> ((s, dir) =>
      TextDedup.jaccardPairs(documents(s, dir), "doc_id", "text",
        blockCol = "source", shingleN = 3)
        .orderBy("a", "b")),

    "q_ann_bruteforce" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(Ann.quantize(col("embedding")).as("qvec"))
      Ann.bruteForceTopK(e, "vec_id", "embedding", q, 10)
    }),

    "q_ann_lsh_buckets" -> ((s, dir) =>
      embeddings(s, dir).select(col("vec_id"),
        Ann.lshBucket(Ann.quantize(col("embedding")), 64).as("bucket"))
        .orderBy("vec_id")),

    "q_ann_lsh_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(Ann.quantize(col("embedding")).as("qvec"))
      Ann.lshTopK(e, "vec_id", "embedding", q, 64, 10)
        .drop("bucket")
    }),

    "q_ivf_assign" -> ((s, dir) =>
      Ann.ivfAssign(embeddings(s, dir), "vec_id", "embedding", stride = 50)
        .orderBy("id")),

    // IVF multi-probe: nprobe=3 nearest inverted lists (the recall knob)
    "q_ivf_nprobe" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(Ann.quantize(col("embedding")).as("qvec"))
      Ann.ivfSearchN(e, "vec_id", "embedding", q, stride = 50, k = 10,
        nprobe = 3)
    }),

    // IVF SEARCH: probe only the query's inverted list, exact in-list
    // top-k (one scan, zero self-joins/shuffles)
    "q_ivf_search" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(Ann.quantize(col("embedding")).as("qvec"))
      Ann.ivfSearch(e, "vec_id", "embedding", q, stride = 50, k = 10)
    }),

    "q_embed_neardup" -> ((s, dir) =>
      Ann.nearDupPairs(embeddings(s, dir), "vec_id", "embedding", 64,
        thrNum = 1, thrDen = 5, nBits = 8)
        .orderBy("a", "b")),

    // the scale path: 3 independent 6-bit bands, candidate = any-band
    // collision, exact-cosine verified (bucket width shrinks with bits,
    // recall recovered by banding — VERDICT r01 ANN scaling fix)
    "q_embed_neardup_banded" -> ((s, dir) =>
      Ann.nearDupPairsBanded(embeddings(s, dir), "vec_id", "embedding", 64,
        thrNum = 1, thrDen = 5, bands = 3, bitsPerBand = 6)
        .orderBy("a", "b")),

    // P11 Json extractor analogue: parse the props JSON payload with
    // from_json (typed schema), aggregate the extracted field
    "q_events_json" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("k_sum"),
          max(col("k")).as("k_max"))
        .orderBy("event_type")),

    "q_events_window" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(
          date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm")
            .as("minute"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("v_milli"))
        .orderBy("minute", "event_type")),

    "q_media_meta" -> ((s, dir) =>
      Media.mediaMeta(
        Media.mediaTable(documents(s, dir), "doc_id", "text"))
        .orderBy("media_id")),

    // multimodal resize stage: aspect-preserving integer fit into 32x24
    "q_media_resize" -> ((s, dir) =>
      Media.resizeMedia(
        Media.mediaTable(documents(s, dir), "doc_id", "text"),
        new Media.StubDecoder(8), targetW = 32, targetH = 24)
        .orderBy("media_id")),

    // multimodal frame sampling: every 30th frame of each mp4 payload
    "q_media_frames" -> ((s, dir) =>
      Media.sampleFrames(
        Media.mediaTable(documents(s, dir), "doc_id", "text"),
        new Media.StubDecoder(8), everyN = 30)
        .orderBy("media_id", "frame_idx")),

    "q_media_features" -> ((s, dir) => {
      val media = Media.mediaTable(documents(s, dir), "doc_id", "text")
      val feats = Media.extractFeatures(media, new Media.StubDecoder(8))
      feats.select(col("media_id"), col("byte_len"), col("width"),
          col("height"),
          round(element_at(col("feature"), 1).cast("double") * 997)
            .cast("long").as("f0"),
          round(element_at(col("feature"), 8).cast("double") * 997)
            .cast("long").as("f7"))
        .orderBy("media_id")
    }),

    // REAL codec end-to-end: Catalyst-built 4x2 BMPs (one color per
    // doc) -> javax.imageio decode -> per-channel means recover the
    // exact channel bytes (featureDim 3: bucket k = channel k mean).
    "q_media_imageio" -> ((s, dir) => {
      import graft.multimodal.ImageIoDecoder
      val i = col("doc_id")
      val media = documents(s, dir).select(
        i.cast("long").as("media_id"), lit("bmp").as("format"),
        Media.bmpPayload(pmod(i, lit(256)), pmod(i * 3 + 1, lit(256)),
          pmod(i * 7 + 5, lit(256))).as("payload"))
      Media.extractFeatures(media, new ImageIoDecoder(3))
        .select(col("media_id"), col("byte_len"), col("width"),
          col("height"),
          round(element_at(col("feature"), 1).cast("double") * 255)
            .cast("long").as("ch_r"),
          round(element_at(col("feature"), 2).cast("double") * 255)
            .cast("long").as("ch_g"),
          round(element_at(col("feature"), 3).cast("double") * 255)
            .cast("long").as("ch_b"))
        .orderBy("media_id")
    })
  )

  // ---------------- oracles ----------------

  def oracleSql: Map[String, String] = Map(

    "q_token_count" ->
      s"SELECT doc_id, CAST(len($toksSql) AS INT) AS n_tokens FROM documents ORDER BY doc_id",

    "q_lang_id" -> {
      val scores = TextOps.langMarkers.map { case (l, ms) =>
        s"(${langScoreSql(ms)}) AS s_$l"
      }.mkString(", ")
      val langs = TextOps.langMarkers.map(_._1)
      // earliest-listed language attaining the max (matches the fold's
      // strict-> replacement rule)
      val cases = langs.zipWithIndex.map { case (l, i) =>
        val later = langs.drop(i + 1)
        val cond =
          if (later.isEmpty) "TRUE"
          else later.map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $cond THEN '$l'"
      }.mkString(" ")
      s"""SELECT doc_id, lang, CASE $cases END AS lang_pred
          FROM (SELECT doc_id, lang, $scores FROM documents)
          ORDER BY doc_id"""
    },

    "q_quality" -> {
      val stops = langScoreSql(Seq(" the ", " and ", " of ", " a ", " in "))
      s"""SELECT doc_id,
            (CASE WHEN n_chars > 0
              THEN CAST(FLOOR(alpha * 1000.0 / n_chars) AS BIGINT) ELSE 0 END)
          + (CASE WHEN n_tok > 0
              THEN CAST(FLOOR(stops * 1000.0 / n_tok) AS BIGINT) ELSE 0 END)
          + (CASE WHEN n_tok > 0
              THEN CAST(FLOOR(n_uniq * 1000.0 / n_tok) AS BIGINT) ELSE 0 END)
            AS quality
          FROM (SELECT doc_id,
                  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS alpha,
                  CAST(length(text) AS BIGINT) AS n_chars,
                  CAST(len($toksSql) AS BIGINT) AS n_tok,
                  CAST(len(list_distinct($toksSql)) AS BIGINT) AS n_uniq,
                  ($stops) AS stops
                FROM documents)
          ORDER BY doc_id"""
    },

    "q_fingerprint" ->
      s"""SELECT doc_id,
            md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
          FROM documents ORDER BY doc_id""",

    "q_pipeline_corpus" -> {
      val scores = TextOps.langMarkers.map { case (l, ms) =>
        s"(${langScoreSql(ms)}) AS s_$l"
      }.mkString(", ")
      val langs = TextOps.langMarkers.map(_._1)
      val cases = langs.zipWithIndex.map { case (l, i) =>
        val later = langs.drop(i + 1)
        val cond =
          if (later.isEmpty) "TRUE"
          else later.map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $cond THEN '$l'"
      }.mkString(" ")
      val stops = langScoreSql(Seq(" the ", " and ", " of ", " a ", " in "))
      s"""WITH base AS (
            SELECT doc_id,
              CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS alpha,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(len($toksSql) AS BIGINT) AS n_tok,
              CAST(len(list_distinct($toksSql)) AS BIGINT) AS n_uniq,
              ($stops) AS stops,
              md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
              $scores
            FROM documents),
          scored AS (
            SELECT doc_id, fp, CASE $cases END AS lang_pred,
              (CASE WHEN n_chars > 0
                THEN CAST(FLOOR(alpha * 1000.0 / n_chars) AS BIGINT) ELSE 0 END)
            + (CASE WHEN n_tok > 0
                THEN CAST(FLOOR(stops * 1000.0 / n_tok) AS BIGINT) ELSE 0 END)
            + (CASE WHEN n_tok > 0
                THEN CAST(FLOOR(n_uniq * 1000.0 / n_tok) AS BIGINT) ELSE 0 END)
                AS quality,
              n_tok AS n_tokens
            FROM base),
          dedup AS (
            SELECT * FROM scored WHERE quality >= 1300
            QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
          SELECT lang_pred, count(*) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens
          FROM dedup GROUP BY lang_pred ORDER BY lang_pred"""
    },

    "q_winnow" ->
      s"""WITH nm AS (
            SELECT doc_id,
              regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS norm
            FROM documents),
          gr AS (
            SELECT doc_id,
              CASE WHEN len(norm) >= 5
                THEN [substr(norm, i, 5) for i in range(1, len(norm) - 3)]
                ELSE [norm] END AS grams,
              len(norm) AS n FROM nm),
          hx AS (
            SELECT doc_id, n,
              [${strHashSql("g")} % $P for g in grams] AS hs FROM gr),
          mn AS (
            SELECT doc_id, n,
              CASE WHEN len(hs) >= 4
                THEN [list_min(hs[j:j+3]) for j in range(1, len(hs) - 2)]
                ELSE [list_min(hs)] END AS mins FROM hx),
          fp AS (
            SELECT doc_id,
              CASE WHEN n = 0 THEN CAST([] AS BIGINT[])
                ELSE list_sort(list_distinct(mins)) END AS fp FROM mn)
          SELECT doc_id, CAST(len(fp) AS INT) AS n_fp,
            CAST(coalesce(list_sum(fp), 0) AS BIGINT) AS fp_sum
          FROM fp ORDER BY doc_id""",

    "q_dedup_exact" ->
      s"""SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
            CAST(min(doc_id) AS BIGINT) AS canonical_id,
            count(*) AS group_size
          FROM documents GROUP BY 1 ORDER BY fp""",

    "q_simhash" ->
      s"""WITH ${simhashCte("documents")}
          SELECT doc_id, sh AS simhash FROM sh ORDER BY doc_id""",

    "q_simhash_pairs" -> {
      val bandEq = (0 until 4).map(b =>
        s"((l.sh >> ${8 * b}) & 255) = ((r.sh >> ${8 * b}) & 255)")
        .mkString(" OR ")
      s"""WITH planted AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, text FROM documents
            WHERE doc_id < 30),
          ${simhashCte("planted")}
          SELECT l.doc_id AS a, r.doc_id AS b
          FROM sh l JOIN sh r ON l.doc_id < r.doc_id AND ($bandEq)
          WHERE bit_count(xor(l.sh, r.sh)) <= 3
          ORDER BY a, b"""
    },

    "q_token_bpe" ->
      s"""SELECT doc_id,
            CAST(coalesce(list_sum(
              [(len(p) + 3) // 4 for p in
               regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]+')]
            ), 0) AS BIGINT) AS n_subwords
          FROM documents ORDER BY doc_id""",

    "q_minhash_pairs" ->
      s"""WITH $minhashPairsCtes
          SELECT a, b FROM pairs ORDER BY a, b""",

    // recursive min-reachability over the same pair CTEs: walk collects
    // every id reachable from a node through the undirected pair graph;
    // min(label) per node == the component minimum == canonical_id
    "q_dup_clusters" ->
      s"""WITH RECURSIVE $minhashPairsCtes,
          und AS (SELECT a AS x, b AS y FROM pairs
                  UNION ALL SELECT b, a FROM pairs),
          walk(node, label) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT u.x, w.label FROM und u JOIN walk w ON w.node = u.y),
          comp AS (SELECT node, min(label) AS canonical_id
                   FROM walk GROUP BY node),
          sizes AS (SELECT canonical_id, count(*) AS n
                    FROM comp GROUP BY canonical_id)
          SELECT c.node AS doc_id, c.canonical_id,
                 CAST(s.n AS BIGINT) AS cluster_size
          FROM comp c JOIN sizes s USING (canonical_id)
          ORDER BY doc_id""",

    "q_jaccard_pairs" ->
      s"""WITH tk AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
          sh AS (SELECT doc_id, source, $shinglesSql AS sh FROM tk)
          SELECT l.doc_id AS a, r.doc_id AS b,
            CAST(len(list_intersect(l.sh, r.sh)) AS INT) AS inter_n,
            CAST(len(list_distinct(list_concat(l.sh, r.sh))) AS INT) AS union_n
          FROM sh l JOIN sh r
            ON l.source = r.source AND l.doc_id < r.doc_id
          ORDER BY a, b""",

    "q_ann_bruteforce" ->
      s"""WITH q AS (SELECT $qvSql AS qv FROM embeddings WHERE vec_id = 0),
          v AS (SELECT vec_id, $qvSql AS v FROM embeddings)
          SELECT vec_id AS id, ${cosSql("v", "qv")} AS cosine
          FROM v CROSS JOIN q
          ORDER BY cosine DESC, id ASC LIMIT 10""",

    "q_ann_lsh_buckets" ->
      s"""WITH v AS (SELECT vec_id, $qvSql AS v FROM embeddings)
          SELECT vec_id, CAST(${bucketSql("v")} AS BIGINT) AS bucket FROM v
          ORDER BY vec_id""",

    "q_ann_lsh_topk" ->
      s"""WITH v0 AS (SELECT vec_id, $qvSql AS v FROM embeddings),
          q AS (SELECT v AS qv, ${bucketSql("v")} AS qb
                FROM v0 WHERE vec_id = 0),
          v AS (SELECT vec_id, v, ${bucketSql("v")} AS b FROM v0)
          SELECT vec_id AS id, ${cosSql("v", "qv")} AS cosine
          FROM v JOIN q ON v.b = q.qb
          ORDER BY cosine DESC, id ASC LIMIT 10""",

    "q_ivf_assign" ->
      s"""WITH v AS (SELECT vec_id, $qvSql AS v FROM embeddings),
          c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id % 50 = 0),
          sc AS (SELECT v.vec_id AS id, c.cid,
                   ${cosSql("v.v", "c.cv")} AS cos,
                   row_number() OVER (PARTITION BY v.vec_id
                     ORDER BY ${cosSql("v.v", "c.cv")} DESC, c.cid ASC) AS rk
                 FROM v CROSS JOIN c)
          SELECT id, cid FROM sc WHERE rk = 1 ORDER BY id""",

    "q_ivf_nprobe" ->
      s"""WITH v AS (SELECT vec_id, $qvSql AS v FROM embeddings),
          c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id % 50 = 0),
          sc AS (SELECT v.vec_id AS id, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                     ORDER BY ${cosSql("v.v", "c.cv")} DESC, c.cid ASC) AS rk
                 FROM v CROSS JOIN c),
          asg AS (SELECT id, cid FROM sc WHERE rk = 1),
          qv AS (SELECT v AS qvec FROM v WHERE vec_id = 0),
          qc AS (SELECT cid FROM (
                   SELECT c.cid,
                     row_number() OVER (
                       ORDER BY ${cosSql("c.cv", "qv.qvec")} DESC,
                         c.cid ASC) AS rk
                   FROM c CROSS JOIN qv) WHERE rk <= 3)
          SELECT a.id, ${cosSql("v.v", "qv.qvec")} AS cosine
          FROM asg a JOIN v ON v.vec_id = a.id CROSS JOIN qv
          WHERE a.cid IN (SELECT cid FROM qc)
          ORDER BY cosine DESC, id ASC LIMIT 10""",

    "q_ivf_search" ->
      s"""WITH v AS (SELECT vec_id, $qvSql AS v FROM embeddings),
          c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id % 50 = 0),
          sc AS (SELECT v.vec_id AS id, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                     ORDER BY ${cosSql("v.v", "c.cv")} DESC, c.cid ASC) AS rk
                 FROM v CROSS JOIN c),
          asg AS (SELECT id, cid FROM sc WHERE rk = 1),
          q AS (SELECT cid AS qcid FROM asg WHERE id = 0),
          qv AS (SELECT v AS qvec FROM v WHERE vec_id = 0)
          SELECT a.id, ${cosSql("v.v", "qv.qvec")} AS cosine
          FROM asg a JOIN v ON v.vec_id = a.id CROSS JOIN q CROSS JOIN qv
          WHERE a.cid = q.qcid
          ORDER BY cosine DESC, id ASC LIMIT 10""",

    "q_embed_neardup" ->
      s"""WITH v0 AS (SELECT vec_id, $qvSql AS v FROM embeddings),
          v AS (SELECT vec_id, v, ${bucketSql("v")} AS b FROM v0)
          SELECT l.vec_id AS a, r.vec_id AS b
          FROM v l JOIN v r ON l.b = r.b AND l.vec_id < r.vec_id
          WHERE ${dotSql("l.v", "r.v")} > 0
            AND ${dotSql("l.v", "r.v")} * ${dotSql("l.v", "r.v")} * 25 >=
                ${dotSql("l.v", "l.v")} * ${dotSql("r.v", "r.v")} * 1
          ORDER BY a, b""",

    "q_embed_neardup_banded" ->
      s"""WITH v0 AS (SELECT vec_id, $qvSql AS v FROM embeddings),
          v AS (SELECT vec_id, v,
                  ${bucketSqlB("v", 0, 6)} AS b0,
                  ${bucketSqlB("v", 6, 6)} AS b1,
                  ${bucketSqlB("v", 12, 6)} AS b2
                FROM v0)
          SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
          FROM v l JOIN v r
            ON (l.b0 = r.b0 OR l.b1 = r.b1 OR l.b2 = r.b2)
               AND l.vec_id < r.vec_id
          WHERE ${dotSql("l.v", "r.v")} > 0
            AND ${dotSql("l.v", "r.v")} * ${dotSql("l.v", "r.v")} * 25 >=
                ${dotSql("l.v", "l.v")} * ${dotSql("r.v", "r.v")} * 1
          ORDER BY a, b""",

    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
           CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS k_max
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_events_window" ->
      """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute,
           event_type, count(*) AS n,
           CAST(sum(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS v_milli
         FROM events GROUP BY 1, 2 ORDER BY minute, event_type""",

    "q_media_meta" ->
      """SELECT doc_id AS media_id,
           CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
             WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
           CAST(16 + (CAST(octet_length(encode(text)) AS BIGINT) * 7 + 3) % 64
             AS INT) AS height
         FROM documents ORDER BY media_id""",

    "q_media_resize" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
             CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
               WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
             CAST(octet_length(encode(text)) AS BIGINT) AS len,
             CAST(16 + octet_length(encode(text)) % 64 AS INT) AS w,
             CAST(16 + (CAST(octet_length(encode(text)) AS BIGINT) * 7 + 3)
               % 64 AS INT) AS h
           FROM documents),
         r AS (
           SELECT media_id, format, w, h,
             CASE WHEN 32 * h <= 24 * w THEN 32
               ELSE CAST(greatest(1, (w * 24) // h) AS INT) END AS out_w,
             CASE WHEN 32 * h <= 24 * w
               THEN CAST(greatest(1, (h * 32) // w) AS INT) ELSE 24 END AS out_h,
             len
           FROM m)
         SELECT media_id, format, w AS width, h AS height, out_w, out_h,
           CAST((len * out_w + out_h) % 997 AS BIGINT) AS checksum
         FROM r ORDER BY media_id""",

    "q_media_frames" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS len
           FROM documents WHERE doc_id % 4 = 3),
         f AS (
           SELECT media_id, len,
             unnest(range(0, CAST(1 + len % 240 AS INT), 30)) AS frame_idx
           FROM m)
         SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST((len * 131 + frame_idx) % 997 AS BIGINT) AS frame_hash
         FROM f ORDER BY media_id, frame_idx""",

    "q_media_features" ->
      """SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
           CAST(16 + (CAST(octet_length(encode(text)) AS BIGINT) * 7 + 3) % 64
             AS INT) AS height,
           CAST((CAST(octet_length(encode(text)) AS BIGINT) * 31 + 0) % 997
             AS BIGINT) AS f0,
           CAST((CAST(octet_length(encode(text)) AS BIGINT) * 31 + 7) % 997
             AS BIGINT) AS f7
         FROM documents ORDER BY media_id""",

    "q_media_imageio" ->
      """SELECT doc_id AS media_id, CAST(78 AS BIGINT) AS byte_len,
           CAST(4 AS INT) AS width, CAST(2 AS INT) AS height,
           CAST(doc_id % 256 AS BIGINT) AS ch_r,
           CAST((doc_id * 3 + 1) % 256 AS BIGINT) AS ch_g,
           CAST((doc_id * 7 + 5) % 256 AS BIGINT) AS ch_b
         FROM documents ORDER BY media_id"""
  )
}
