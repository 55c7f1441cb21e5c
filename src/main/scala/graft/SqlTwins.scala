package graft

/** Spark-dialect SQL twins for the oracle keys whose DuckDB oracle text
  * is NOT ANSI-portable (DuckDB `//`, `list_*`/`string_split` list math,
  * `quantile_cont`, in-args `IGNORE NULLS`, `epoch_ns`, hex-literal
  * casts). The engine's primary surface is the DataFrame API; for a
  * SQL-first user this object is the certified path to those operators:
  * each entry runs through `spark.sql` over the canonical table views
  * (with `events.ts` normalized to ns-BIGINT, the Tables contract) and
  * returns exactly the rows and column names of the corresponding
  * `SparkEntry.queries` plan. SqlFrontendSpec asserts that equivalence
  * for every entry; together with the keys whose DuckDB oracle text
  * already runs unmodified on Spark, the SQL surface covers all oracle
  * keys but one (SqlFrontendSpec asserts the exact closure — portable ∪
  * twins = every key). The single exception is `dedup_components`: its
  * transitive closure is a CYCLIC fixpoint needing UNION-distinct
  * recursion, which Spark's recursive CTEs do not support
  * (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE — probed; UNION ALL on a
  * cyclic graph never terminates), so connected components remain a
  * DataFrame-only surface (pipeline/Dedup.clusters).
  *
  * Dialect mapping notes (DuckDB → Spark), pinned once here:
  *  - `//` integer division → `DIV`
  *  - `string_split`/`list_*` → `split`/`filter`/`transform`/`aggregate`
  *    higher-order functions (1-based `element_at`, `slice`)
  *  - `CAST('0x'||h AS INT)` hex decode → `conv(h, 16, 10)`
  *  - `quantile_cont(x, q) OVER w` → `percentile(x, q) OVER w`
  *  - in-args `IGNORE NULLS` (`lag(x IGNORE NULLS)`) → postfix
  *    `lag(x) IGNORE NULLS OVER w`
  *  - `epoch_ns(ts)` → `ts` itself (the view already carries ns BIGINT)
  *  - `unnest(range(a, b))` → `explode(sequence(a, b - 1))`
  *  - HUGEINT cross-multiplies → DECIMAL(38,0)
  */
object SqlTwins {

  private val stopEn = "'the','and','of','to','in'"
  private def hits(list: String) =
    s"CAST(size(filter(split(text, ' '), w -> w IN ($list))) AS BIGINT)"

  /** The VectorDot custom expression's exact op sequence in SQL: float →
    * double promotion per element, left-to-right double accumulation —
    * `zip_with` + `aggregate` replay it bit-identically.
    */
  private def dot(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  /** 16-bit simhash per-bit majority sums, generated (16 repetitive
    * terms): sum over words of ±1 per bit of the word hash.
    */
  private val simhashBitSums = (0 until 16)
    .map(j => s"sum(2 * ((wh DIV ${1L << j}) % 2) - 1) AS s$j").mkString(",\n    ")
  private val simhashFp = (0 until 16)
    .map(j => s"CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    .mkString(" + ")

  val sql: Map[String, String] = Map(
    // ---- §2.1 CSV interchange: the oracle reads the written file via
    // DuckDB `read_csv` (not ANSI). The Spark twin computes the SAME
    // relation from the canonical events view WITHOUT the CSV hop —
    // row-equality with the DataFrame plan (which writes + re-reads the
    // file) is therefore ALSO a losslessness proof for the pinned
    // dialect: what left through the writer came back identical. ----
    "scan_csv_roundtrip" ->
      """WITH slice AS (
        |  SELECT id AS event_id,
        |    timestamp_micros(1704067200000000 + id * 3700000001) AS ts2,
        |    CASE WHEN id % 13 = 0 THEN NULL ELSE
        |      element_at(array('click', 'view', 'error'),
        |        CAST(pmod(id, 3) + 1 AS INT)) END AS event_type,
        |    CASE WHEN id % 7 = 0 THEN NULL ELSE
        |      CAST(pmod(id * 31, 10000) AS DOUBLE) / 100.0 END AS value,
        |    CASE WHEN id % 11 = 0 THEN NULL ELSE
        |      concat('{"k": "', id, '", "s": "a,b"}') END AS props
        |  FROM range(0, 1000))
        |SELECT coalesce(event_type, '(null)') AS etype,
        |  count(*) AS n,
        |  count(value) AS n_value,
        |  sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents,
        |  count(props) AS n_props,
        |  sum(CAST(length(props) AS BIGINT)) AS props_chars,
        |  unix_micros(min(ts2)) AS min_ts_us,
        |  unix_micros(max(ts2)) AS max_ts_us
        |FROM slice GROUP BY 1 ORDER BY 1""".stripMargin,
    // same slice, same digest as the CSV twin: the JSON key's file
    // roundtrip is the DataFrame side's job; the twin proves the
    // relation (slice → digest) is expressible as one SQL text — and
    // doubles as the losslessness proof for the JSONL dialect
    "scan_json_roundtrip" ->
      """WITH slice AS (
        |  SELECT id AS event_id,
        |    timestamp_micros(1704067200000000 + id * 3700000001) AS ts2,
        |    CASE WHEN id % 13 = 0 THEN NULL ELSE
        |      element_at(array('click', 'view', 'error'),
        |        CAST(pmod(id, 3) + 1 AS INT)) END AS event_type,
        |    CASE WHEN id % 7 = 0 THEN NULL ELSE
        |      CAST(pmod(id * 31, 10000) AS DOUBLE) / 100.0 END AS value,
        |    CASE WHEN id % 11 = 0 THEN NULL ELSE
        |      concat('{"k": "', id, '", "s": "a,b"}') END AS props
        |  FROM range(0, 1000))
        |SELECT coalesce(event_type, '(null)') AS etype,
        |  count(*) AS n,
        |  count(value) AS n_value,
        |  sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents,
        |  count(props) AS n_props,
        |  sum(CAST(length(props) AS BIGINT)) AS props_chars,
        |  unix_micros(min(ts2)) AS min_ts_us,
        |  unix_micros(max(ts2)) AS max_ts_us
        |FROM slice GROUP BY 1 ORDER BY 1""".stripMargin,
    // the Java-regex tokenizer as one SQL text (the real
    // Tokenize.unicodeTokens pattern verbatim, && intersection and
    // all); slice recomputed in SQL like the roundtrip twins
    "text_unicode_tokens" ->
      """WITH slice AS (
        |  SELECT id AS doc_id, concat_ws(' ',
        |    element_at(array('Hello, WORLD!', 'café crème brûlée',
        |      'Привет МИР слово', '这是一个测试', 'テスト です',
        |      '한국어 텍스트', 'abc世界def', "don't stop 42 x99",
        |      '--- !!! ...'), CAST(pmod(id, 9) + 1 AS INT)),
        |    element_at(array('Hello, WORLD!', 'café crème brûlée',
        |      'Привет МИР слово', '这是一个测试', 'テスト です',
        |      '한국어 텍스트', 'abc世界def', "don't stop 42 x99",
        |      '--- !!! ...'), CAST(pmod(id * 4, 9) + 1 AS INT)),
        |    element_at(array('Hello, WORLD!', 'café crème brûlée',
        |      'Привет МИР слово', '这是一个测试', 'テスト です',
        |      '한국어 텍스트', 'abc世界def', "don't stop 42 x99",
        |      '--- !!! ...'), CAST(pmod(id * 7, 9) + 1 AS INT))) AS text
        |  FROM range(0, 360)),
        |tok AS (
        |  SELECT doc_id, explode(regexp_extract_all(lower(text),
        |    '[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]|[[\\p{L}\\p{N}]&&[^\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]]+',
        |    0)) AS token
        |  FROM slice)
        |SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM tok GROUP BY 1 ORDER BY 1""".stripMargin,
    // ---- §2.3 subqueries: DuckDB `//` → DIV ----
    "subq_scalar_uncorr" ->
      """SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT)
        |    * (SELECT count(*) FROM orders) * 10000
        |    DIV (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) FROM orders)
        |    AS ratio_bp
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // ---- §2.4 aggregation ----
    "agg_string" ->
      """SELECT c_nationkey,
        |  array_join(array_sort(collect_list(c_name)), ',') AS names,
        |  count(*) AS n
        |FROM customer
        |WHERE c_custkey < 50
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "agg_median" ->
      """SELECT event_type,
        |  round(percentile(value, 0.25), 4) AS q25,
        |  round(percentile(value, 0.5), 4) AS q50,
        |  round(percentile(value, 0.75), 4) AS q75
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "agg_histogram" ->
      """WITH b AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |g AS (
        |  SELECT cents DIV 2500000 AS bucket, count(*) AS n_orders,
        |    sum(cents) AS sum_cents, min(cents) AS min_cents, max(cents) AS max_cents
        |  FROM b GROUP BY cents DIV 2500000)
        |SELECT bucket, bucket * 25000 AS bucket_lo_usd,
        |  n_orders, sum_cents, min_cents, max_cents
        |FROM g
        |ORDER BY bucket""".stripMargin,

    // ---- §2.5 windows ----
    "win_nth_value" ->
      """SELECT c_nationkey, c_custkey,
        |  nth_value(c_acctbal, 2) OVER w AS second_best,
        |  lag(CASE WHEN c_acctbal > 0 THEN c_acctbal END, 1) IGNORE NULLS OVER w AS prev_pos_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT user_id, event_id,
        |  lag(event_id, 1) OVER w AS prev_id,
        |  lead(event_id, 1) OVER w AS next_id,
        |  (ts - lag(ts, 1) OVER w) DIV 1000000000 AS gap_s
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_rolling_median" ->
      """SELECT event_type, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS v_c,
        |  percentile(CAST(round(value * 100) AS BIGINT), 0.5)
        |    OVER (PARTITION BY event_type ORDER BY event_id
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med_c
        |FROM events
        |ORDER BY event_type, event_id""".stripMargin,
    // identical text to win_rolling_median: same answer, and the DataFrame
    // twin is the scalable plan
    "win_rolling_median_scalable" ->
      """SELECT event_type, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS v_c,
        |  percentile(CAST(round(value * 100) AS BIGINT), 0.5)
        |    OVER (PARTITION BY event_type ORDER BY event_id
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med_c
        |FROM events
        |ORDER BY event_type, event_id""".stripMargin,
    "win_fill_forward" ->
      """SELECT user_id, event_id,
        |  last(CASE WHEN event_type = 'click' THEN value END) IGNORE NULLS OVER w AS last_click,
        |  first(CASE WHEN event_type = 'purchase' THEN value END) IGNORE NULLS OVER w AS first_purchase
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // ---- §2.7 scalar functions / generators ----
    "fn_string" ->
      """SELECT p_partkey,
        |  substring(p_name, 1, 4) AS name4,
        |  upper(p_name) AS name_up,
        |  lower(p_type) AS type_lo,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  trim(concat('  ', p_name, '  ')) AS name_trim,
        |  regexp_replace(p_name, ' ', '_') AS name_us,
        |  lpad(CAST(p_size AS STRING), 4, '0') AS size_pad,
        |  element_at(split(p_name, ' '), 1) AS first_word,
        |  CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_no,
        |  CAST(instr(p_name, 'e') AS BIGINT) AS e_pos
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd') AS month_start,
        |  datediff(to_date(o_orderdate), to_date('1995-01-01')) AS days_since,
        |  date_format(date_add(to_date(o_orderdate), 30), 'yyyy-MM-dd') AS due_date,
        |  CAST(weekday(o_orderdate) + 1 AS BIGINT) AS isodow,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  unix_timestamp(o_orderdate) AS epoch_s
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT event_id,
        |  round(abs(value - 100.0), 2) AS abs_dev,
        |  CAST(floor(value) AS BIGINT) AS flr,
        |  CAST(ceil(value) AS BIGINT) AS cl,
        |  round(sqrt(value), 6) AS sq,
        |  round(pow(value, 2), 4) AS p2,
        |  round(ln(value + 1.0), 6) AS ln1p,
        |  round(log10(value + 1.0), 6) AS lg,
        |  round(value % 7.0D, 2) AS m7,
        |  CAST(signum(value - 100.0) AS INT) AS sgn,
        |  round(sin(radians(value)), 6) AS sn,
        |  round(cos(radians(value)), 6) AS cs,
        |  round(atan2(value, 100.0), 6) AS at2,
        |  round(degrees(atan2(value, 100.0)), 4) AS at2d
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
        |  array_contains(split(text, ' '), 'the') AS has_the,
        |  CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_distinct,
        |  concat_ws(',', slice(sort_array(split(text, ' ')), 1, 3)) AS first3_sorted,
        |  CAST(size(filter(split(text, ' '), w -> length(w) > 5)) AS BIGINT) AS n_long,
        |  CAST(aggregate(transform(split(text, ' '), w -> length(w)), 0,
        |    (acc, x) -> acc + x) AS BIGINT) AS total_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  CAST(get_json_object(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(get_json_object(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  get_json_object(props, '$.missing') IS NULL AS no_miss
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "fn_bitwise" ->
      """SELECT event_id,
        |  event_id & 255 AS b_and,
        |  event_id | 4096 AS b_or,
        |  event_id ^ user_id AS b_xor,
        |  shiftleft(event_id, 3) AS shl,
        |  shiftright(event_id, 2) AS shr,
        |  CAST(bit_count(event_id) AS BIGINT) AS nbits
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "fn_hash" ->
      """SELECT doc_id,
        |  md5(text) AS h_md5,
        |  sha2(text, 256) AS h_sha256,
        |  substring(md5(concat(lang, '|', source)), 1, 8) AS h_part
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "fn_interval" ->
      """SELECT o_orderkey,
        |  unix_timestamp(o_orderdate + INTERVAL '100' DAY) AS plus100d_s,
        |  unix_timestamp(o_orderdate + INTERVAL '3' MONTH) AS plus3mo_s,
        |  unix_timestamp(date_trunc('month', o_orderdate)
        |    + INTERVAL '1' MONTH - INTERVAL '1' DAY) AS month_end_s,
        |  CAST(datediff(to_date(o_orderdate), '1995-01-01') AS BIGINT) AS days_since
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "fn_map" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    array_distinct(slice(filter(split(text, ' '), x -> x != ''), 1, 5)) AS w5
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    map_from_arrays(w5, transform(w5, x -> length(x))) AS m
        |  FROM w)
        |SELECT doc_id,
        |  CAST(size(m) AS BIGINT) AS n_keys,
        |  CAST(aggregate(map_values(m), 0, (a, x) -> a + x) AS BIGINT) AS sum_len,
        |  concat_ws(',', array_sort(map_keys(m))) AS keys_csv,
        |  CAST(element_at(m, 'the') AS BIGINT) AS the_len,
        |  CAST(size(map_filter(m, (k, v) -> v > 3)) AS BIGINT) AS n_long,
        |  CAST(aggregate(map_values(transform_values(m, (k, v) -> v * 2)), 0,
        |    (a, x) -> a + x) AS BIGINT) AS sum_len_2x
        |FROM m
        |ORDER BY doc_id""".stripMargin,
    "fn_regex" ->
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '*') AS masked,
        |  CAST(regexp_count(p_name, '[aeiou]') AS BIGINT) AS n_vowels,
        |  array_join(regexp_extract_all(p_name, '\\b[aeiou][a-z]*', 0), ',') AS vowel_words,
        |  CAST(p_name RLIKE '^[b-d]' AS BIGINT) AS starts_bcd,
        |  CAST(replace(p_name, ' ', '_') LIKE '%!_%' ESCAPE '!' AS BIGINT) AS multi_word,
        |  regexp_replace(p_brand, '[0-9]', '#') AS brand_masked,
        |  CAST(size(split(p_name, '\\s+')) AS BIGINT) AS n_words
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "explode_wordcount" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT explode(split(text, ' ')) AS word FROM documents) t
        |WHERE word != ''
        |GROUP BY word
        |ORDER BY n DESC, word ASC
        |LIMIT 100""".stripMargin,
    "nested_event_digest" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  to_json(array_sort(collect_list(struct(event_type, cnt)))) AS digest,
        |  to_json(map_from_entries(array_sort(collect_list(
        |    named_struct('key', event_type, 'value', cnt))))) AS type_counts
        |FROM c
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // ---- §2.4 aggregation (histogram-quantile twins) ----
    "agg_quartiles_scalable" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  percentile(v_c, 0.25) AS q25_c,
        |  percentile(v_c, 0.5) AS q50_c,
        |  percentile(v_c, 0.75) AS q75_c
        |FROM ev GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "agg_mad" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |m AS (
        |  SELECT event_type, percentile(v_c, 0.5) AS med
        |  FROM ev GROUP BY event_type)
        |SELECT ev.event_type, count(*) AS n,
        |  percentile(ev.v_c, 0.5) AS median_c,
        |  percentile(abs(ev.v_c - m.med), 0.5) AS mad_c
        |FROM ev JOIN m ON ev.event_type = m.event_type
        |GROUP BY ev.event_type
        |ORDER BY ev.event_type""".stripMargin,

    // ---- §2.8 event-time (ts is ns BIGINT on the canonical view) ----
    "evt_cohort_matrix" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, ts DIV 604800000000000 AS week
        |  FROM events),
        |c AS (
        |  SELECT user_id, week, min(week) OVER (PARTITION BY user_id) AS w0
        |  FROM uw),
        |m AS (
        |  SELECT w0 AS cohort_week, week - w0 AS week_offset,
        |    count(*) AS n_users
        |  FROM c GROUP BY w0, week - w0)
        |SELECT cohort_week, week_offset, n_users,
        |  round(CAST(n_users AS DOUBLE)
        |    / max(CASE WHEN week_offset = 0 THEN n_users END)
        |        OVER (PARTITION BY cohort_week), 4) AS retention
        |FROM m
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "evt_dwell_median" ->
      """WITH d AS (
        |  SELECT event_type,
        |    (ts - lag(ts, 1) OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id)) DIV 1000000000 AS dwell_s
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  percentile(dwell_s, 0.5) AS median_s,
        |  max(dwell_s) AS max_s
        |FROM d WHERE dwell_s IS NOT NULL
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "evt_tumbling" ->
      """SELECT (ts DIV 3600000000000) * 3600 AS wstart_s, event_type,
        |  count(*) AS n,
        |  CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_c
        |FROM events
        |GROUP BY ts DIV 3600000000000, event_type
        |ORDER BY wstart_s, event_type""".stripMargin,
    "evt_sliding" ->
      """SELECT wstart_s, event_type, count(*) AS n
        |FROM (
        |  SELECT explode(array((ts DIV 1800000000000 - 1) * 1800,
        |                       (ts DIV 1800000000000) * 1800)) AS wstart_s,
        |         event_type
        |  FROM events) t
        |GROUP BY wstart_s, event_type
        |ORDER BY wstart_s, event_type""".stripMargin,
    "evt_ohlc" ->
      """WITH r AS (
        |  SELECT event_type, ts DIV 3600000000000 AS hour, value,
        |    row_number() OVER (PARTITION BY event_type, ts DIV 3600000000000
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, ts DIV 3600000000000
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, hour,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high,
        |  min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  count(*) AS n
        |FROM r
        |GROUP BY event_type, hour
        |ORDER BY event_type, hour""".stripMargin,
    "evt_rolling_active" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, ts DIV 86400000000000 AS day FROM events),
        |days AS (SELECT DISTINCT day FROM ud),
        |ex AS (
        |  SELECT ud.user_id, ud.day AS day0, ud.day + g.o AS day
        |  FROM ud CROSS JOIN (SELECT explode(sequence(0, 6)) AS o) g)
        |SELECT ex.day,
        |  count(DISTINCT ex.user_id) AS active_7d,
        |  count(DISTINCT CASE WHEN ex.day0 = ex.day THEN ex.user_id END) AS active_1d
        |FROM ex
        |JOIN days d ON ex.day = d.day
        |GROUP BY ex.day
        |ORDER BY ex.day""".stripMargin,

    "evt_session" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CASE WHEN prev_ts IS NULL OR ts - prev_ts > 1800000000000
        |         THEN 1 ELSE 0 END AS BIGINT) AS new_session
        |  FROM x),
        |z AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM y)
        |SELECT user_id, session_id,
        |  count(*) AS n_events,
        |  (max(ts) - min(ts)) DIV 1000000000 AS duration_s,
        |  min(ts) DIV 1000000000 AS start_s
        |FROM z
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "evt_gapfill" ->
      """WITH a AS (
        |  SELECT event_type, ts DIV 3600000000000 AS h, count(*) AS n
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY event_type, ts DIV 3600000000000),
        |b AS (
        |  SELECT event_type, h, n,
        |    lead(h, 1) OVER (PARTITION BY event_type ORDER BY h) AS next_h
        |  FROM a),
        |c AS (
        |  SELECT event_type, h, n,
        |    explode(sequence(h, coalesce(next_h - 1, h))) AS hh
        |  FROM b)
        |SELECT event_type, hh * 3600 AS h_s,
        |  CASE WHEN hh = h THEN n ELSE CAST(0 AS BIGINT) END AS n
        |FROM c
        |ORDER BY event_type, h_s""".stripMargin,
    "evt_funnel" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS v_ts
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts, event_type, v_ts,
        |    min(CASE WHEN event_type = 'click' AND ts > v_ts THEN ts END)
        |      OVER (PARTITION BY user_id) AS c_ts
        |  FROM f),
        |h AS (
        |  SELECT user_id, v_ts, c_ts,
        |    min(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
        |      OVER (PARTITION BY user_id) AS p_ts
        |  FROM g)
        |SELECT user_id,
        |  min(v_ts) DIV 1000000000 AS view_s,
        |  min(c_ts) DIV 1000000000 AS click_s,
        |  min(p_ts) DIV 1000000000 AS purchase_s
        |FROM h
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "evt_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, ts DIV 86400000000000 AS day FROM events),
        |c AS (
        |  SELECT user_id, day,
        |    min(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM ud)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  count(DISTINCT user_id) AS users
        |FROM c
        |GROUP BY cohort_day, day - cohort_day
        |ORDER BY cohort_day, day_offset""".stripMargin,

    // ---- §2.12 composed stars whose oracle text uses epoch_ns ----
    "complex_scd2" ->
      """WITH base AS (
        |  SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) DIV 5000 AS tier,
        |    ts AS tns, event_id
        |  FROM events WHERE event_type = 'signup'),
        |chg AS (
        |  SELECT user_id, tier, tns, event_id FROM (
        |    SELECT user_id, tier, tns, event_id,
        |      lag(tier, 1) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS prev
        |    FROM base) x
        |  WHERE prev IS NULL OR prev != tier)
        |SELECT user_id, tier,
        |  tns DIV 1000000000 AS valid_from_s,
        |  lead(tns, 1) OVER (PARTITION BY user_id ORDER BY tns, event_id)
        |    DIV 1000000000 AS valid_to_s
        |FROM chg
        |ORDER BY user_id, valid_from_s""".stripMargin,
    "complex_top_revenue" ->
      """SELECT o.o_orderkey,
        |  unix_timestamp(o.o_orderdate) AS odate_s,
        |  o.o_orderpriority,
        |  sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS revenue_c,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l.l_shipdate >= TIMESTAMP '1999-01-01'
        |GROUP BY o.o_orderkey, unix_timestamp(o.o_orderdate), o.o_orderpriority
        |ORDER BY revenue_c DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    // (complex_regional_revenue moved to SqlFrontendSpec's PORTABLE list
    // — its DuckDB oracle text runs unmodified on spark.sql, probed)

    // ---- §2.11 corpus statistics over exploded tokens ----
    "text_bigram_pmi" ->
      """WITH docs AS (SELECT split(text, ' ') AS w FROM documents WHERE lang = 'en'),
        |toks AS (SELECT explode(w) AS word FROM docs),
        |toks2 AS (SELECT word FROM toks WHERE word != ''),
        |uni AS (SELECT word, count(*) AS c FROM toks2 GROUP BY word),
        |n AS (SELECT count(*) AS n_tok FROM toks2),
        |bi0 AS (SELECT explode(transform(sequence(1, size(w) - 1),
        |          i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))) AS p
        |        FROM docs WHERE size(w) >= 2),
        |bi AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM bi0 WHERE p.w1 != '' AND p.w2 != ''),
        |nb AS (SELECT count(*) AS n_big FROM bi),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi
        |        GROUP BY w1, w2 HAVING count(*) >= 10)
        |SELECT c12.w1, c12.w2, c12.c12,
        |  round(ln((CAST(c12.c12 AS DOUBLE) * n.n_tok * n.n_tok) /
        |    (CAST(nb.n_big AS DOUBLE) * u1.c * u2.c)), 4) AS pmi
        |FROM c12
        |JOIN uni u1 ON u1.word = c12.w1
        |JOIN uni u2 ON u2.word = c12.w2
        |CROSS JOIN n CROSS JOIN nb
        |ORDER BY pmi DESC, w1 ASC, w2 ASC
        |LIMIT 50""".stripMargin,
    "text_bm25" ->
      """WITH docs AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
        |dlt AS (SELECT doc_id, CAST(size(filter(w, x -> x != '')) AS BIGINT) AS dl FROM docs),
        |cst AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dlt),
        |tok AS (SELECT doc_id, explode(w) AS tok FROM docs),
        |tfq AS (SELECT doc_id, tok, count(*) AS tf
        |        FROM tok WHERE tok IN ('join', 'vector', 'scan') GROUP BY doc_id, tok),
        |dfq AS (SELECT tok, count(*) AS df FROM tfq GROUP BY tok),
        |wg AS (
        |  SELECT t.doc_id, t.tok,
        |    ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
        |      * (t.tf * (1.2 + 1.0))
        |      / (t.tf + 1.2 * (1.0 - 0.75
        |          + 0.75 * CAST(l.dl AS DOUBLE) * c.n_docs / c.sum_dl)) AS wgt
        |  FROM tfq t
        |  JOIN dfq d ON t.tok = d.tok
        |  JOIN dlt l ON t.doc_id = l.doc_id
        |  CROSS JOIN cst c)
        |SELECT doc_id, count(*) AS n_terms_hit,
        |  round(coalesce(sum(CASE WHEN tok = 'join' THEN wgt END), 0.0)
        |      + coalesce(sum(CASE WHEN tok = 'vector' THEN wgt END), 0.0)
        |      + coalesce(sum(CASE WHEN tok = 'scan' THEN wgt END), 0.0), 4)
        |    AS score
        |FROM wg
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id ASC
        |LIMIT 20""".stripMargin,
    "text_contamination" ->
      """WITH d0 AS (
        |  SELECT doc_id, filter(split(text, ' '), w -> w != '') AS toks
        |  FROM documents WHERE doc_id < 2000),
        |d AS (SELECT * FROM d0 WHERE size(toks) >= 5),
        |grams AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id, explode(transform(sequence(1, size(toks) - 4),
        |      i -> concat_ws(' ', slice(toks, i, 5)))) AS gram
        |    FROM d) t),
        |ev AS (SELECT doc_id AS eval_id, gram FROM grams WHERE doc_id % 7 = 0),
        |co AS (SELECT doc_id AS corpus_id, gram FROM grams WHERE doc_id % 7 != 0),
        |es AS (SELECT eval_id, count(*) AS n_eval_grams FROM ev GROUP BY eval_id),
        |sh AS (SELECT co.corpus_id, ev.eval_id, count(*) AS n_shared
        |       FROM co JOIN ev ON co.gram = ev.gram
        |       GROUP BY co.corpus_id, ev.eval_id)
        |SELECT sh.corpus_id, sh.eval_id, sh.n_shared,
        |  round(CAST(sh.n_shared AS DOUBLE) / es.n_eval_grams, 4) AS overlap
        |FROM sh JOIN es ON sh.eval_id = es.eval_id
        |WHERE CAST(sh.n_shared AS DOUBLE) / es.n_eval_grams >= 0.5
        |ORDER BY sh.corpus_id, sh.eval_id""".stripMargin,

    // ---- §2.9 sampling: hex decode via conv(h, 16, 10) ----
    "sample_hash" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) < 6554
        |ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 20
        |ORDER BY lang, doc_id""".stripMargin,
    "sample_split" ->
      """SELECT lang,
        |  CASE WHEN h < 52429 THEN 'train'
        |       WHEN h < 58982 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars
        |FROM (SELECT lang, n_chars,
        |        CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) AS h
        |      FROM documents) t
        |GROUP BY lang, CASE WHEN h < 52429 THEN 'train'
        |                    WHEN h < 58982 THEN 'val'
        |                    ELSE 'test' END
        |ORDER BY lang, split""".stripMargin,
    "sample_weighted" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) * 2000
        |      < n_chars * 65536
        |ORDER BY doc_id""".stripMargin,
    // the naive single-window statement of the semantics; the DataFrame
    // twin is the 256-bucket parallel decomposition
    "sample_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS BIGINT) AS pos
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "sample_temperature" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
        |  FROM documents GROUP BY lang),
        |t AS (SELECT sum(n) AS ntot, sum(w) AS sw FROM c)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN c USING (lang) CROSS JOIN t
        |WHERE CAST(conv(substring(md5(CAST(d.doc_id AS STRING)), 1, 4), 16, 10) AS DECIMAL(38,0))
        |        * t.sw * c.n
        |      < CAST(round(t.ntot * 0.5) AS DECIMAL(38,0)) * c.w * 65536
        |ORDER BY d.doc_id""".stripMargin,
    "sample_epochs" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY lang),
        |m AS (SELECT max(n) AS nmax FROM c),
        |e AS (SELECT c.lang, c.n, least(3 * c.n, m.nmax) AS ee
        |      FROM c CROSS JOIN m),
        |r AS (
        |  SELECT d.doc_id, d.lang,
        |    CAST(e.ee DIV e.n AS BIGINT)
        |      + CASE WHEN CAST(conv(substring(md5(CAST(d.doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)
        |               * e.n < (e.ee % e.n) * 65536
        |             THEN 1 ELSE 0 END AS n_replicas
        |  FROM documents d JOIN e USING (lang))
        |SELECT doc_id, lang, n_replicas,
        |  CAST(t.replica AS BIGINT) AS replica
        |FROM r LATERAL VIEW explode(sequence(1, n_replicas)) t AS replica
        |ORDER BY doc_id, replica""".stripMargin,

    // ---- §2.3 joins: as-of via correlated max, interval as range SQL ----
    // The SQL twin states the SEMANTICS (stock Spark plans it as a
    // nested-loop/shuffle join); the DataFrame keys are the scale plans
    // (AsofMergeJoin exec, IntervalJoinRewrite bucketing).
    "join_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
        |    (SELECT max(c.ts) FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS c_ts
        |  FROM p)
        |SELECT m.p_id, m.user_id, c.event_id AS click_id,
        |  (m.p_ts - c.ts) DIV 1000000000 AS gap_s
        |FROM m JOIN c ON c.user_id = m.user_id AND c.ts = m.c_ts
        |ORDER BY p_id""".stripMargin,
    "join_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
        |    (SELECT max(c.ts) FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS c_ts
        |  FROM p)
        |SELECT m.p_id, m.user_id, c.event_id AS click_id,
        |  (m.p_ts - c.ts) DIV 1000000000 AS gap_s
        |FROM m JOIN c ON c.user_id = m.user_id AND c.ts = m.c_ts
        |ORDER BY p_id""".stripMargin,
    "join_asof_forward_native" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
        |    (SELECT min(c.ts) FROM c WHERE c.user_id = p.user_id AND c.ts >= p.ts) AS c_ts
        |  FROM p)
        |SELECT m.p_id, m.user_id, c.event_id AS click_id,
        |  (c.ts - m.p_ts) DIV 1000000000 AS gap_s
        |FROM m JOIN c ON c.user_id = m.user_id AND c.ts = m.c_ts
        |ORDER BY p_id""".stripMargin,
    "join_asof_within" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
        |    (SELECT max(c.ts) FROM c
        |     WHERE c.user_id = p.user_id AND c.ts <= p.ts
        |       AND p.ts - c.ts <= 86400000000000) AS c_ts
        |  FROM p)
        |SELECT m.p_id, m.user_id, c.event_id AS click_id,
        |  (m.p_ts - c.ts) DIV 1000000000 AS gap_s
        |FROM m LEFT JOIN c ON c.user_id = m.user_id AND c.ts = m.c_ts
        |ORDER BY p_id""".stripMargin,
    "join_interval_native" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, ts DIV 1000000000 AS lo,
        |    ts DIV 1000000000 + 600 AS hi
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT ts DIV 1000000000 AS pt,
        |    CAST(round(value * 100) AS BIGINT) AS c_cents
        |  FROM events WHERE event_type = 'click')
        |SELECT p_id, count(*) AS n_clicks, sum(c_cents) AS click_cents
        |FROM c JOIN p ON pt >= lo AND pt <= hi
        |GROUP BY p_id
        |ORDER BY p_id""".stripMargin,

    // ---- §2.11 sequence packing: the greedy fold as a RECURSIVE CTE
    // (Spark 4.1 supports UNION ALL recursion; the acyclic rn → rn+1
    // step terminates. UNION-distinct recursion is NOT supported, which
    // is why dedup_components — a cyclic transitive closure — has no
    // twin and stays a DataFrame-only surface.) ----
    "text_pack" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, doc_id,
        |    CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT) AS n,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents
        |), pack AS (
        |  SELECT source, doc_id, n, rn,
        |    CAST(0 AS BIGINT) AS bin_id, n AS fill
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.source, d.doc_id, d.n, d.rn,
        |    CASE WHEN p.fill > 0 AND p.fill + d.n > 256
        |         THEN p.bin_id + 1 ELSE p.bin_id END,
        |    CASE WHEN p.fill > 0 AND p.fill + d.n > 256
        |         THEN d.n ELSE p.fill + d.n END
        |  FROM d JOIN pack p ON d.source = p.source AND d.rn = p.rn + 1
        |)
        |SELECT source, doc_id, n AS n_tokens, bin_id
        |FROM pack
        |ORDER BY source, doc_id""".stripMargin,

    // ---- §2.9 multimodal metadata ----
    "mm_binary_meta" ->
      """SELECT doc_id, lang,
        |  CAST(length(encode(text, 'UTF-8')) AS BIGINT) AS n_bytes,
        |  CAST((length(encode(text, 'UTF-8')) + 255) DIV 256 AS BIGINT) AS n_frames,
        |  base64(encode(substring(text, 1, 12), 'UTF-8')) AS b64_head,
        |  md5(encode(text, 'UTF-8')) AS content_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // ---- §2.11 dedup / similarity ----
    "dedup_containment" ->
      """WITH tok AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, explode(array_distinct(split(text, ' '))) AS word
        |    FROM documents WHERE doc_id < 300) t
        |  WHERE word != ''),
        |sizes AS (SELECT doc_id, count(*) AS n_words FROM tok GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
        |  FROM tok a JOIN tok b ON a.word = b.word AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |c AS (
        |  SELECT i.a_id, i.b_id, i.n_inter,
        |    i.n_inter / least(sa.n_words, sb.n_words) AS cont
        |  FROM inter i
        |  JOIN sizes sa ON sa.doc_id = i.a_id
        |  JOIN sizes sb ON sb.doc_id = i.b_id)
        |SELECT a_id, b_id, n_inter, round(cont, 4) AS containment
        |FROM c WHERE cont >= 0.9
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_near_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, explode(array_distinct(split(text, ' '))) AS word
        |    FROM documents WHERE doc_id < 300) t
        |  WHERE word != ''),
        |sizes AS (SELECT doc_id, count(*) AS n_words FROM tok GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
        |  FROM tok a JOIN tok b ON a.word = b.word AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |j AS (
        |  SELECT i.a_id, i.b_id,
        |    i.n_inter / (sa.n_words + sb.n_words - i.n_inter) AS jac
        |  FROM inter i
        |  JOIN sizes sa ON sa.doc_id = i.a_id
        |  JOIN sizes sb ON sb.doc_id = i.b_id)
        |SELECT a_id, b_id, round(jac, 4) AS jaccard
        |FROM j WHERE jac >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_ngram" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    array_distinct(transform(sequence(1, length(text) - 2),
        |      i -> substring(text, i, 3))) AS grams
        |  FROM documents WHERE doc_id < 150 AND length(text) >= 3),
        |e AS (SELECT doc_id, size(grams) AS n_grams, explode(grams) AS gram FROM g),
        |j AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    a.n_grams AS na, b.n_grams AS nb, CAST(count(*) AS INT) AS n_inter
        |  FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.n_grams, b.n_grams)
        |SELECT a_id, b_id, round(n_inter / (na + nb - n_inter), 4) AS jaccard
        |FROM j WHERE n_inter / (na + nb - n_inter) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_simhash" ->
      s"""WITH w AS (
        |  SELECT doc_id,
        |    CAST(conv(substring(md5(word), 1, 4), 16, 10) AS BIGINT) AS wh
        |  FROM (SELECT doc_id, explode(split(text, ' ')) AS word
        |        FROM documents WHERE doc_id < 300) t
        |  WHERE word != ''),
        |s AS (
        |  SELECT doc_id,
        |    $simhashBitSums
        |  FROM w GROUP BY doc_id),
        |f AS (SELECT doc_id, $simhashFp AS fp FROM s)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(a.fp ^ b.fp) AS BIGINT) AS hamming
        |FROM f a JOIN f b ON a.doc_id < b.doc_id
        |WHERE bit_count(a.fp ^ b.fp) <= 1
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_minhash_lsh" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    filter(array_distinct(split(text, ' ')), w -> w != '') AS toks,
        |    transform(array_distinct(split(text, ' ')), w -> md5(w)) AS h0x,
        |    transform(array_distinct(split(text, ' ')), w -> md5(concat('#', w))) AS h1x
        |  FROM documents WHERE doc_id < 300),
        |sg AS (
        |  SELECT doc_id, toks,
        |    array(
        |      concat(array_min(transform(h0x, h -> substring(h, 1, 8))),
        |             array_min(transform(h0x, h -> substring(h, 9, 8)))),
        |      concat(array_min(transform(h0x, h -> substring(h, 17, 8))),
        |             array_min(transform(h0x, h -> substring(h, 25, 8)))),
        |      concat(array_min(transform(h1x, h -> substring(h, 1, 8))),
        |             array_min(transform(h1x, h -> substring(h, 9, 8)))),
        |      concat(array_min(transform(h1x, h -> substring(h, 17, 8))),
        |             array_min(transform(h1x, h -> substring(h, 25, 8))))) AS buckets
        |  FROM d),
        |e AS (SELECT doc_id, toks, posexplode(buckets) AS (band, bucket) FROM sg),
        |cand AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.toks AS ta, b.toks AS tb
        |  FROM e a JOIN e b ON a.band = b.band AND a.bucket = b.bucket
        |                   AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.toks, b.toks),
        |j AS (
        |  SELECT a_id, b_id, size(array_intersect(ta, tb)) AS n_inter,
        |    size(ta) AS na, size(tb) AS nb
        |  FROM cand)
        |SELECT a_id, b_id, round(n_inter / (na + nb - n_inter), 4) AS jaccard
        |FROM j WHERE n_inter / (na + nb - n_inter) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin,
    "dedup_incremental" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 600),
        |sp AS (SELECT (max(doc_id) + 1) DIV 2 AS split FROM d),
        |tok AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, explode(array_distinct(split(text, ' '))) AS word FROM d) t
        |  WHERE word != ''),
        |sizes AS (SELECT doc_id, count(*) AS n_words FROM tok GROUP BY doc_id),
        |inter AS (
        |  SELECT n.doc_id AS n_id, o.doc_id AS o_id, count(*) AS n_inter
        |  FROM tok n CROSS JOIN sp JOIN tok o
        |    ON n.word = o.word AND n.doc_id >= sp.split AND o.doc_id < sp.split
        |  GROUP BY n.doc_id, o.doc_id),
        |best AS (
        |  SELECT n_id,
        |    max_by(named_struct('o_id', o_id, 'jac', jac),
        |           named_struct('jac', jac, 'neg', -o_id)) AS b
        |  FROM (
        |    SELECT i.n_id, i.o_id,
        |      i.n_inter / (sn.n_words + so.n_words - i.n_inter) AS jac
        |    FROM inter i
        |    JOIN sizes sn ON sn.doc_id = i.n_id
        |    JOIN sizes so ON so.doc_id = i.o_id) x
        |  WHERE jac >= 0.5
        |  GROUP BY n_id)
        |SELECT d.doc_id, best.b.o_id AS dup_of, round(best.b.jac, 4) AS jaccard
        |FROM d CROSS JOIN sp
        |LEFT JOIN best ON d.doc_id = best.n_id
        |WHERE d.doc_id >= sp.split
        |ORDER BY d.doc_id""".stripMargin,
    "sim_cosine_topk" ->
      s"""WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(${dot("embedding", "p")}
        |    / (sqrt(${dot("embedding", "embedding")}) * sqrt(${dot("p", "p")})), 4) AS sim
        |FROM embeddings CROSS JOIN probe
        |ORDER BY sim DESC, vec_id ASC
        |LIMIT 10""".stripMargin,
    "dedup_embedding" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(${dot("embedding", "embedding")}) AS norm
        |  FROM embeddings WHERE vec_id < 300),
        |c AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    ${dot("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, round(cos, 4) AS cos_sim
        |FROM c WHERE cos >= 0.40
        |ORDER BY a_id, b_id""".stripMargin,
    "sim_quantized_topk" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    transform(embedding, x ->
        |      CAST(greatest(least(round(CAST(x AS DOUBLE) * 256), 127.0D), -128.0D) AS INT)) AS q
        |  FROM embeddings),
        |probe AS (SELECT q AS p FROM q WHERE vec_id = 0)
        |SELECT vec_id,
        |  aggregate(zip_with(q, p, (a, b) -> CAST(a * b AS BIGINT)),
        |    CAST(0 AS BIGINT), (acc, x) -> acc + x) AS score
        |FROM q CROSS JOIN probe
        |ORDER BY score DESC, vec_id ASC
        |LIMIT 10""".stripMargin,
    "sim_label_centroid" ->
      """WITH comps AS (
        |  SELECT label, pos, avg(CAST(v AS DOUBLE)) AS m
        |  FROM (SELECT label, posexplode(embedding) AS (pos, v) FROM embeddings) t
        |  GROUP BY label, pos),
        |norms AS (
        |  SELECT label, round(sqrt(sum(m * m)), 4) AS centroid_norm
        |  FROM comps GROUP BY label),
        |counts AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
        |SELECT CAST(norms.label AS BIGINT) AS label, n_vecs, centroid_norm
        |FROM norms JOIN counts ON norms.label = counts.label
        |ORDER BY label""".stripMargin,
    // the oracle's (x−y)² list_reduce as zip_with+aggregate — the same
    // per-element op sequence VectorDistSq compiles (bit-identical)
    "sim_kmeans_assign" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS c FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cid,
        |    aggregate(zip_with(e.embedding, c.c,
        |      (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
        |              * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
        |      CAST(0.0 AS DOUBLE), (s, v) -> s + v) AS d2
        |  FROM embeddings e CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id, cid, d2,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
        |  FROM scored)
        |SELECT cid AS cluster_id,
        |  count(*) AS n_members,
        |  min(vec_id) AS min_member,
        |  sum(CAST(round(d2 * 10000) AS BIGINT)) AS d2_sum_4dp
        |FROM assigned WHERE rn = 1
        |GROUP BY cid ORDER BY cid""".stripMargin,
    "sim_ivf_topk" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS c FROM embeddings WHERE vec_id < 8),
        |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
        |pd AS (
        |  SELECT cid,
        |    aggregate(zip_with(p, c,
        |      (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
        |              * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
        |      CAST(0.0 AS DOUBLE), (s, v) -> s + v) AS d2
        |  FROM probe CROSS JOIN cents),
        |pc AS (SELECT cid FROM pd ORDER BY d2 ASC, cid ASC LIMIT 2),
        |scored AS (
        |  SELECT e.vec_id, c.cid,
        |    aggregate(zip_with(e.embedding, c.c,
        |      (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
        |              * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
        |      CAST(0.0 AS DOUBLE), (s, v) -> s + v) AS d2
        |  FROM embeddings e CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
        |  FROM scored),
        |cand AS (
        |  SELECT a.vec_id, a.cid AS cluster_id
        |  FROM assigned a JOIN pc ON a.cid = pc.cid
        |  WHERE a.rn = 1),
        |ranked AS (
        |  SELECT cand.vec_id, cluster_id,
        |    aggregate(zip_with(e.embedding, p,
        |      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |      CAST(0.0 AS DOUBLE), (s, x) -> s + x)
        |    / (sqrt(aggregate(zip_with(e.embedding, e.embedding,
        |         (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |         CAST(0.0 AS DOUBLE), (s, x) -> s + x))
        |       * sqrt(aggregate(zip_with(p, p,
        |         (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |         CAST(0.0 AS DOUBLE), (s, x) -> s + x))) AS cos
        |  FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id CROSS JOIN probe)
        |SELECT vec_id, cluster_id, round(cos, 4) AS sim
        |FROM ranked
        |ORDER BY cos DESC, vec_id ASC
        |LIMIT 10""".stripMargin,
    "sim_kmeans_update" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS c FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    aggregate(zip_with(e.embedding, c.c,
        |      (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
        |              * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
        |      CAST(0.0 AS DOUBLE), (s, v) -> s + v) AS d2
        |  FROM embeddings e CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id, embedding, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
        |  FROM scored),
        |comps AS (
        |  SELECT cid, pos + 1 AS pos,
        |    CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT) AS q
        |  FROM (SELECT cid, posexplode(embedding) AS (pos, v)
        |        FROM assigned WHERE rn = 1) t),
        |sums AS (
        |  SELECT cid, pos, sum(q) AS sq, count(*) AS nm
        |  FROM comps GROUP BY cid, pos)
        |SELECT cid AS cluster_id,
        |  max(nm) AS n_members,
        |  sum(abs(sq)) AS l1_sum_q,
        |  sum(CASE WHEN pos = 1 THEN sq ELSE 0 END) AS c0_sum_q
        |FROM sums
        |GROUP BY cid ORDER BY cluster_id""".stripMargin,

    // ---- §2.8 growth curve ----
    // DuckDB `//` → DIV; epoch_ns(ts) → ts (the view carries ns BIGINT)
    "evt_cumulative_uniques" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, ts DIV 86400000000000 AS day
        |  FROM events),
        |f AS (
        |  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS first_day
        |  FROM ud),
        |d AS (
        |  SELECT day,
        |    CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
        |    CAST(count(*) AS BIGINT) AS active_users
        |  FROM f GROUP BY day)
        |SELECT day, new_users, active_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_unique_users
        |FROM d
        |ORDER BY day""".stripMargin,

    // ---- §2.8 drift monitor ----
    // DuckDB `//` → DIV; epoch_ns(ts) → ts (the view carries ns BIGINT)
    "evt_drift_psi" ->
      """WITH b AS (
        |  SELECT least(9, greatest(0, (CAST(round(value * 100) AS BIGINT) * 10) DIV 50000)) AS bin,
        |    ts < 1705363200000000000 AS is_ref
        |  FROM events
        |), c AS (
        |  SELECT bin,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
        |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cur_n
        |  FROM b GROUP BY bin
        |), t AS (
        |  SELECT bin, ref_n, cur_n,
        |    sum(ref_n) OVER () AS ref_t, sum(cur_n) OVER () AS cur_t
        |  FROM c
        |)
        |SELECT bin, ref_n, cur_n,
        |  round(
        |    (CAST(cur_n + 1 AS DOUBLE) / CAST(cur_t + 10 AS DOUBLE) -
        |     CAST(ref_n + 1 AS DOUBLE) / CAST(ref_t + 10 AS DOUBLE)) *
        |    ln((CAST(cur_n + 1 AS DOUBLE) / CAST(cur_t + 10 AS DOUBLE)) /
        |       (CAST(ref_n + 1 AS DOUBLE) / CAST(ref_t + 10 AS DOUBLE))), 6) AS psi_term
        |FROM t
        |ORDER BY bin""".stripMargin,

    // ---- §2.11 text analysis ----
    // DuckDB unnest(string_split) → explode(split); VALUES list kept
    "text_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT w FROM (
        |    SELECT explode(filter(split(text, ' '), w -> w != '')) AS w
        |    FROM documents) t),
        |wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |cc AS (SELECT c, CAST(count(*) AS BIGINT) AS nt,
        |         CAST(c * count(*) AS BIGINT) AS tokc
        |       FROM wc GROUP BY c),
        |cum AS (
        |  SELECT c, nt, tokc,
        |    CAST(sum(nt) OVER (ORDER BY c DESC) - nt AS BIGINT) AS types_before,
        |    CAST(sum(tokc) OVER (ORDER BY c DESC) - tokc AS BIGINT) AS tokens_before,
        |    CAST(sum(tokc) OVER () AS BIGINT) AS total_tokens
        |  FROM cc),
        |ks AS (SELECT CAST(k AS BIGINT) AS k
        |       FROM (VALUES (10), (100), (1000), (10000)) AS t(k))
        |SELECT k,
        |  max(tokens_before + least(nt, k - types_before) * c) AS covered_tokens,
        |  round(CAST(max(tokens_before + least(nt, k - types_before) * c) AS DOUBLE)
        |    / CAST(max(total_tokens) AS DOUBLE), 6) AS coverage
        |FROM ks JOIN cum ON types_before < k
        |GROUP BY k
        |ORDER BY k""".stripMargin,
    // DuckDB unnest(range(…)) → explode(sequence(…)); list_filter → filter
    "text_bpe_pairs" ->
      """WITH vocab AS (
        |  SELECT w, count(*) AS wcount FROM (
        |    SELECT explode(filter(split(text, ' '), w -> w != '')) AS w
        |    FROM documents)
        |  GROUP BY w),
        |pairs AS (
        |  SELECT substring(w, i, 2) AS pair, wcount
        |  FROM (SELECT w, wcount, explode(sequence(1, length(w) - 1)) AS i
        |        FROM vocab WHERE length(w) >= 2))
        |SELECT pair, sum(wcount) AS pair_count
        |FROM pairs GROUP BY pair
        |ORDER BY pair_count DESC, pair LIMIT 50""".stripMargin,
    "text_tfidf_top" ->
      """WITH tok AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, explode(split(text, ' ')) AS word FROM documents) t
        |  WHERE word != ''),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tf.doc_id, tf.word,
        |  round(tf.tf * ln(n.n_docs / df.df), 4) AS tfidf
        |FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
        |ORDER BY tfidf DESC, doc_id ASC, word ASC
        |LIMIT 100""".stripMargin,
    "text_langid" ->
      s"""WITH scored AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    ${hits(stopEn)} AS n_en,
        |    ${hits("'der','die','und','das','ist'")} AS n_de,
        |    ${hits("'el','la','de','que','los'")} AS n_es,
        |    ${hits("'le','la','et','les','des'")} AS n_fr
        |  FROM documents)
        |SELECT doc_id, labeled_lang,
        |  CASE WHEN greatest(n_en, n_de, n_es, n_fr) = 0 THEN 'unknown'
        |       WHEN n_en = greatest(n_en, n_de, n_es, n_fr) THEN 'en'
        |       WHEN n_de = greatest(n_en, n_de, n_es, n_fr) THEN 'de'
        |       WHEN n_es = greatest(n_en, n_de, n_es, n_fr) THEN 'es'
        |       ELSE 'fr' END AS pred_lang,
        |  n_en, n_de, n_es, n_fr
        |FROM scored
        |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH base AS (
        |  SELECT doc_id,
        |    CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT) AS n_tokens,
        |    ${hits(stopEn)} AS n_stop,
        |    CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '')) AS BIGINT) AS n_punct,
        |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |      / size(filter(split(text, ' '), w -> w != '')) AS awl,
        |    CAST(${hits(stopEn)} AS DOUBLE)
        |      / size(filter(split(text, ' '), w -> w != '')) AS sr
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_stop, n_punct,
        |  round(awl, 4) AS avg_word_len,
        |  round(sr, 4) AS stop_ratio,
        |  round(least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0) * (1.0 - sr / 2.0), 4) AS quality_score
        |FROM base
        |ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT) AS ws_tokens,
        |  CAST(regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS BIGINT) AS bpe_tokens,
        |  round(CAST(length(text) AS DOUBLE) / 4.0, 2) AS est_llm_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  aggregate(filter(split(text, ' '), w -> w != ''), CAST(0 AS BIGINT),
        |    (acc, w) -> (acc * 31 + CAST(conv(substring(md5(w), 1, 4), 16, 10) AS BIGINT))
        |      % 1000000007) AS fingerprint,
        |  md5(text) AS text_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "text_chunk" ->
      """WITH d AS (
        |  SELECT doc_id, filter(split(text, ' '), w -> w != '') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS n_tokens,
        |    explode(sequence(0, greatest(CAST(ceil(size(toks) / 64.0D) AS INT), 1) - 1)) AS chunk_id
        |  FROM d)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  least(CAST(64 AS BIGINT), n_tokens - chunk_id * 64) AS chunk_tokens,
        |  concat_ws(' ', slice(toks, chunk_id * 64 + 1, 64)) AS chunk_text
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "text_repetition" ->
      """WITH docs AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, explode(w) AS tok FROM docs),
        |tc AS (SELECT doc_id, tok, count(*) AS n
        |       FROM tok WHERE tok != '' GROUP BY doc_id, tok),
        |pt AS (SELECT doc_id, sum(n) AS n_tokens, count(*) AS n_distinct,
        |         max(n) AS top_n
        |       FROM tc GROUP BY doc_id),
        |bg0 AS (SELECT doc_id, explode(transform(sequence(1, size(w) - 1),
        |          i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))) AS bg
        |        FROM docs WHERE size(w) >= 2),
        |bc AS (SELECT doc_id, bg, count(*) AS n FROM bg0 GROUP BY doc_id, bg),
        |pb AS (SELECT doc_id, sum(n) AS n_bi, count(*) AS n_bi_distinct
        |       FROM bc GROUP BY doc_id)
        |SELECT pt.doc_id, pt.n_tokens, pt.n_distinct, pt.top_n,
        |  round(CAST(pt.n_distinct AS DOUBLE) / pt.n_tokens, 4) AS distinct_frac,
        |  round(CAST(pt.top_n AS DOUBLE) / pt.n_tokens, 4) AS top_frac,
        |  round(coalesce(CAST(pb.n_bi - pb.n_bi_distinct AS DOUBLE) / pb.n_bi, 0.0), 4)
        |    AS dup_bigram_frac
        |FROM pt LEFT JOIN pb ON pt.doc_id = pb.doc_id
        |ORDER BY pt.doc_id""".stripMargin,
    "text_bigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, filter(split(text, ' '), w -> w != '') AS ws
        |  FROM documents),
        |v AS (
        |  SELECT count(DISTINCT w) AS v
        |  FROM (SELECT explode(ws) AS w FROM t)),
        |big AS (
        |  SELECT doc_id, element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2
        |  FROM (SELECT doc_id, ws, explode(sequence(1, size(ws) - 1)) AS i
        |        FROM t WHERE size(ws) >= 2) x),
        |dbc AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
        |        FROM big GROUP BY doc_id, w1, w2),
        |bc AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cnt FROM dbc GROUP BY w1, w2),
        |pc AS (SELECT w1, CAST(sum(c) AS BIGINT) AS pn FROM dbc GROUP BY w1),
        |terms AS (
        |  SELECT d.doc_id, d.c,
        |    named_struct('w1', d.w1, 'w2', d.w2,
        |      'term', CAST(d.c AS DOUBLE) *
        |        ln(CAST(cnt + 1 AS DOUBLE) / CAST(pn + v.v AS DOUBLE))) AS wt
        |  FROM dbc d JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    aggregate(array_sort(collect_list(wt)), CAST(0.0 AS DOUBLE),
        |      (acc, x) -> acc + x.term) AS logp
        |  FROM terms GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  round(logp, 4) AS sum_logp,
        |  round(logp / n_bigrams, 4) AS avg_logp
        |FROM agg
        |ORDER BY doc_id""".stripMargin,
    "text_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, explode(filter(split(text, ' '), w -> w != '')) AS word
        |  FROM documents),
        |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY word),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM wc),
        |dwc AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
        |        FROM toks GROUP BY doc_id, word),
        |terms AS (
        |  SELECT d.doc_id, d.c,
        |    named_struct('word', d.word,
        |      'term', CAST(d.c AS DOUBLE) * ln(CAST(w.n AS DOUBLE) / CAST(tt.t AS DOUBLE)))
        |      AS wt
        |  FROM dwc d JOIN wc w USING (word) CROSS JOIN tot tt),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    aggregate(array_sort(collect_list(wt)), CAST(0.0 AS DOUBLE),
        |      (acc, x) -> acc + x.term) AS logp
        |  FROM terms GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  round(logp, 4) AS sum_logp,
        |  round(logp / n_tokens, 4) AS avg_logp
        |FROM agg
        |ORDER BY doc_id""".stripMargin,
    "pipeline_clean" ->
      s"""WITH base AS (
        |  SELECT doc_id,
        |    CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT) AS n_tokens,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_wchars,
        |    ${hits(stopEn)} AS n_stop,
        |    CAST(size(filter(split(text, ' '),
        |      w -> w != '' AND w RLIKE '[a-z]')) AS BIGINT) AS n_alpha,
        |    CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', ''))
        |      AS BIGINT) AS n_sym
        |  FROM documents),
        |gopher AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(CASE WHEN n_tokens BETWEEN 30 AND 100000
        |           AND n_wchars >= n_tokens * 3 AND n_wchars <= n_tokens * 10
        |           AND n_stop >= 2 AND n_alpha * 10 >= n_tokens * 8
        |           AND n_sym * 10 <= n_tokens
        |         THEN 1 ELSE 0 END AS BIGINT) AS r_quality
        |  FROM base),
        |surv AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY text)
        |         THEN 1 ELSE 0 END AS BIGINT) AS r_survivor
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, concat_ws(' ', slice(toks, i, 3)) AS gram
        |  FROM (SELECT doc_id, toks, explode(sequence(1, size(toks) - 2)) AS i
        |        FROM (SELECT doc_id, filter(split(text, ' '), w -> w != '') AS toks
        |              FROM documents) d0
        |        WHERE size(toks) >= 3) t),
        |gc AS (SELECT gram, count(*) AS df FROM grams GROUP BY gram),
        |boiler AS (
        |  SELECT g.doc_id,
        |    CAST(CASE WHEN count(*) FILTER (WHERE gc.df >= 3) * 2 < count(*)
        |         THEN 1 ELSE 0 END AS BIGINT) AS rb
        |  FROM grams g JOIN gc ON g.gram = gc.gram
        |  GROUP BY g.doc_id)
        |SELECT s.doc_id, s.lang, gp.n_tokens,
        |  gp.r_quality, s.r_survivor,
        |  coalesce(b.rb, CAST(1 AS BIGINT)) AS r_boiler,
        |  gp.r_quality * s.r_survivor * coalesce(b.rb, CAST(1 AS BIGINT)) AS keep
        |FROM surv s
        |JOIN gopher gp ON s.doc_id = gp.doc_id
        |LEFT JOIN boiler b ON s.doc_id = b.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "text_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id, filter(split(text, ' '), w -> w != '') AS toks
        |  FROM documents),
        |d2 AS (SELECT * FROM d WHERE size(toks) >= 3),
        |grams AS (
        |  SELECT DISTINCT doc_id, concat_ws(' ', slice(toks, i, 3)) AS gram
        |  FROM (SELECT doc_id, toks, explode(sequence(1, size(toks) - 2)) AS i
        |        FROM d2) t),
        |gc AS (SELECT gram, count(*) AS df FROM grams GROUP BY gram)
        |SELECT g.doc_id,
        |  count(*) AS n_grams,
        |  count(*) FILTER (WHERE gc.df >= 3) AS n_boiler,
        |  round(CAST(count(*) FILTER (WHERE gc.df >= 3) AS DOUBLE) / count(*), 4)
        |    AS boiler_frac
        |FROM grams g JOIN gc ON g.gram = gc.gram
        |GROUP BY g.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    "text_gopher_rules" ->
      s"""WITH base AS (
        |  SELECT doc_id,
        |    CAST(size(filter(split(text, ' '), w -> w != '')) AS BIGINT) AS n_tokens,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_wchars,
        |    ${hits(stopEn)} AS n_stop,
        |    CAST(size(filter(split(text, ' '),
        |      w -> w != '' AND w RLIKE '[a-z]')) AS BIGINT) AS n_alpha,
        |    CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', ''))
        |      AS BIGINT) AS n_sym
        |  FROM documents),
        |rules AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(CASE WHEN n_tokens BETWEEN 30 AND 100000 THEN 1 ELSE 0 END
        |      AS BIGINT) AS r_len,
        |    CAST(CASE WHEN n_wchars >= n_tokens * 3 AND n_wchars <= n_tokens * 10
        |      THEN 1 ELSE 0 END AS BIGINT) AS r_wordlen,
        |    CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
        |    CAST(CASE WHEN n_alpha * 10 >= n_tokens * 8 THEN 1 ELSE 0 END
        |      AS BIGINT) AS r_alpha,
        |    CAST(CASE WHEN n_sym * 10 <= n_tokens THEN 1 ELSE 0 END
        |      AS BIGINT) AS r_sym
        |  FROM base)
        |SELECT doc_id, n_tokens, r_len, r_wordlen, r_stop, r_alpha, r_sym,
        |  r_len * r_wordlen * r_stop * r_alpha * r_sym AS keep
        |FROM rules
        |ORDER BY doc_id""".stripMargin,
    "sim_hard_negatives" ->
      s"""WITH pairs AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS neg_id,
        |    ${dot("c.embedding", "p.embedding")}
        |    / (sqrt(${dot("c.embedding", "c.embedding")})
        |       * sqrt(${dot("p.embedding", "p.embedding")})) AS cos
        |  FROM embeddings p JOIN embeddings c
        |    ON p.label != c.label
        |  WHERE p.vec_id < 200),
        |r AS (
        |  SELECT probe_id, neg_id, cos,
        |    row_number() OVER (PARTITION BY probe_id
        |                       ORDER BY cos DESC, neg_id) AS rnk
        |  FROM pairs)
        |SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, neg_id,
        |  round(cos, 4) AS sim
        |FROM r WHERE rnk <= 3
        |ORDER BY probe_id, rnk""".stripMargin,
    "sim_knn_label" ->
      s"""WITH pairs AS (
        |  SELECT a.vec_id, b.vec_id AS nbr_id,
        |    ${dot("a.embedding", "b.embedding")}
        |    / (sqrt(${dot("a.embedding", "a.embedding")})
        |       * sqrt(${dot("b.embedding", "b.embedding")})) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id != b.vec_id),
        |r AS (
        |  SELECT vec_id, nbr_id, cos,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY cos DESC, nbr_id) AS rnk
        |  FROM pairs)
        |SELECT vec_id, CAST(rnk AS BIGINT) AS rnk, nbr_id,
        |  round(cos, 4) AS sim
        |FROM r WHERE rnk <= 3
        |ORDER BY vec_id, rnk""".stripMargin)
}
