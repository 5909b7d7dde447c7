"""Build a tie-amplifier corpus for differential fuzzing.

Copies an sf dir with value columns QUANTIZED to force mass ordering
ties (prices to 1000s/100s, event timestamps to hours, values to
integers, account balances to 100s) while keeping schemas, key
uniqueness, and referential integrity intact. Ties are the inputs the
real sf corpora never exercise: every top-k boundary, rank
assignment, window frame, and as-of tie rule must be deterministic in
BOTH engines or the driver's value-hash comparison diverges — the
class the r7 4x duplicate-amplifier sweep caught twice (j3b unrounded
IVF cell score, k4 interpolated trim bounds).

Usage:
    python tools/make_tie_corpus.py [--src /root/testdata/sf0.001] \
        [--out /tmp/ties]
    python tools/check_parity.py --sf /tmp/ties          # the sweep
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

TRANSFORMS = {
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus,"
        " CAST(round(o_totalprice, -3) AS DOUBLE) AS o_totalprice,"
        " o_orderdate, o_orderpriority FROM t"
    ),
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,"
        " l_quantity, CAST(round(l_extendedprice, -2) AS DOUBLE) AS"
        " l_extendedprice, l_discount, l_tax, l_returnflag,"
        " l_linestatus, l_shipdate FROM t"
    ),
    "events": (
        "SELECT event_id, date_trunc('hour', ts) AS ts, user_id,"
        " event_type, CAST(round(value, 0) AS DOUBLE) AS value, props"
        " FROM t"
    ),
    "customer": (
        "SELECT c_custkey, c_name, c_nationkey,"
        " CAST(round(c_acctbal, -2) AS DOUBLE) AS c_acctbal,"
        " c_mktsegment FROM t"
    ),
    "supplier": (
        "SELECT s_suppkey, s_name, s_nationkey,"
        " CAST(round(s_acctbal, -2) AS DOUBLE) AS s_acctbal FROM t"
    ),
}


#: --nulls mode: deterministic 10% NULLs in non-key value columns —
#: the null-placement / null-arithmetic amplifier (Spark orders NULLS
#: FIRST asc, DuckDB NULLS LAST; UDFs see None; ANSI division traps).
#: r7 diagnostic sweep: 258/266 green, 8 triaged in SCALING.md.
NULL_TRANSFORMS = {
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus,"
        " CASE WHEN o_orderkey % 10 = 3 THEN NULL ELSE o_totalprice END"
        " AS o_totalprice, o_orderdate, o_orderpriority FROM t"
    ),
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,"
        " l_quantity, CASE WHEN (l_orderkey + l_linenumber) % 10 = 3"
        " THEN NULL ELSE l_extendedprice END AS l_extendedprice,"
        " l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
        " FROM t"
    ),
    "events": (
        "SELECT event_id, ts, user_id, event_type,"
        " CASE WHEN event_id % 10 = 3 THEN NULL ELSE value END AS value,"
        " props FROM t"
    ),
    "customer": (
        "SELECT c_custkey, c_name, c_nationkey,"
        " CASE WHEN c_custkey % 10 = 3 THEN NULL ELSE c_acctbal END"
        " AS c_acctbal, c_mktsegment FROM t"
    ),
}


#: --extremes mode: special floats (NaN, ±Inf) and huge magnitudes in
#: events.value — the one value column whose domain (a raw metric) can
#: legitimately carry sensor glitches. Deliberately NOT applied to the
#: money columns: their exactly-2-decimal domain is a documented
#: engine invariant (aggregates.py) and the DECIMAL-exact sum policy
#: depends on it. The seams this axis springs: CAST(NaN/Inf AS BIGINT)
#: is an ANSI job-killer in Spark, NaN ordering/equality is
#: engine-defined, and Inf−Inf / 0·Inf arithmetic yields NaN mid-agg.
EXTREME_TRANSFORMS = {
    "events": (
        "SELECT event_id, ts, user_id, event_type,"
        " CASE event_id % 97"
        "   WHEN 5 THEN 'nan'::DOUBLE"
        "   WHEN 11 THEN 'inf'::DOUBLE"
        "   WHEN 17 THEN '-inf'::DOUBLE"
        "   WHEN 23 THEN 1e15"
        "   WHEN 29 THEN -1e15"
        "   ELSE value END AS value,"
        " props FROM t"
    ),
}


#: --pathdocs mode: pathological documents — the empty string (NOT
#: NULL: different code paths), whitespace-only text, one ~200KB
#: UNBROKEN token (no spaces: tokenizers produce a single giant
#: term), and one ~880KB document (20k copies of one sentence — also
#: a within-doc repeat torture for j53). Real corpora contain all
#: four daily; the seams: split('')=[''] conventions, per-token
#: payload sizes through Arrow batches, giant-doc window/agg bounds.
PATHDOC_TRANSFORMS = {
    "documents": (
        "SELECT doc_id, text, lang, source,"
        " CAST(length(text) AS BIGINT) AS n_chars FROM ("
        "SELECT doc_id,"
        " CASE"
        "   WHEN doc_id % 101 = 3 THEN ''"
        "   WHEN doc_id % 101 = 5 THEN '   '"
        "   WHEN doc_id = 107 THEN repeat('za', 100000)"
        "   WHEN doc_id = 211 THEN"
        "     repeat('the quick brown fox jumps over the lazy dog ', 20000)"
        "   ELSE text END AS text,"
        " lang, source FROM t)"
    ),
}


#: --timewarp mode: edge timestamps in events.ts — epoch 0, the µs
#: just BEFORE the epoch (negative integer epoch: `x div/%` semantics
#: differ from floor/mod there), a 1955 odd-µs value, and the edges of
#: pandas' datetime64[ns] range (1677/2262 — kept INSIDE it because
#: the driver hashes pandas frames; beyond-ns dates would test the
#: tooling, not the engines). Springs: negative-epoch date extraction,
#: window()/date_trunc bucketing below 1970, epoch_us sign handling,
#: watermark arithmetic across a 300-year spread.
TIMEWARP_TRANSFORMS = {
    "events": (
        "SELECT event_id,"
        " CASE event_id % 89"
        "   WHEN 7 THEN TIMESTAMP '1970-01-01 00:00:00'"
        "   WHEN 13 THEN TIMESTAMP '1955-05-05 05:05:05.123457'"
        "   WHEN 19 THEN TIMESTAMP '2262-04-10 00:00:00.999999'"
        "   WHEN 23 THEN TIMESTAMP '1969-12-31 23:59:59.999999'"
        "   WHEN 29 THEN TIMESTAMP '1677-09-22 00:00:00.000001'"
        "   ELSE ts END AS ts,"
        " user_id, event_type, value, props FROM t"
    ),
}


#: --nullkeys mode: NULL JOIN/GROUP/WINDOW KEYS — the last structural
#: surface (--nulls nulls VALUE columns; this nulls the keys
#: themselves: anonymous events, orphaned orders, unlabeled vectors,
#: lang-less documents, supplier-less lineitems). The seams: SQL inner
#: joins DROP null keys while GROUP BY/window partitions keep them as
#: one group; Spark anti-join vs `NOT IN` split on null keys (the r8
#: j25 trap, now sprung on every id at once); null-safe vs plain
#: equality; ORDER BY null placement inside windows.
NULLKEY_TRANSFORMS = {
    # r10 completion: event_type and documents.source are ALSO keys
    # (pivot columns, funnel stages, session kinds, domain caps) — on
    # residues (%17) coprime to the id-key rule (%13) so type/source
    # nulls both co-occur with and appear apart from null user/lang.
    "events": (
        "SELECT event_id, ts,"
        " CASE WHEN event_id % 13 = 4 THEN NULL ELSE user_id END"
        " AS user_id,"
        " CASE WHEN event_id % 17 = 3 THEN NULL ELSE event_type END"
        " AS event_type,"
        " value, props FROM t"
    ),
    "orders": (
        "SELECT o_orderkey,"
        " CASE WHEN o_orderkey % 13 = 4 THEN NULL ELSE o_custkey END"
        " AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t"
    ),
    "lineitem": (
        "SELECT l_orderkey, l_partkey,"
        " CASE WHEN (l_orderkey + l_linenumber) % 17 = 5 THEN NULL"
        " ELSE l_suppkey END AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM t"
    ),
    "embeddings": (
        "SELECT vec_id, embedding,"
        " CAST(CASE WHEN vec_id % 13 = 6 THEN NULL ELSE label END"
        " AS INTEGER) AS label FROM t"
    ),
    "documents": (
        "SELECT doc_id, text,"
        " CASE WHEN doc_id % 13 = 4 THEN NULL ELSE lang END AS lang,"
        " CASE WHEN doc_id % 17 = 3 THEN NULL ELSE source END AS source,"
        " n_chars FROM t"
    ),
}


#: --dupids mode (r11, eighteenth axis): duplicate ROW IDS with
#: DIFFERENT payloads — the at-least-once-delivery / colliding-upsert
#: shape (r10 verdict item 7). ids where id % 10 = 7 are rewritten to
#: id - 7 (colliding with the existing % 10 = 0 id) while every
#: payload column keeps its original value, so ~10% of ids now name
#: TWO rows with different payloads. Every operator that treats
#: event_id/doc_id/vec_id as unique (dedup-by-id, upsert folds,
#: tombstone joins, digest anti-joins, per-id windows) must either be
#: multiset-correct or carry a DETERMINISTIC tie rule in both engines
#: — "latest by id" with no secondary order key is exactly the
#: nondeterminism this axis springs. Key columns other axes own
#: (user_id, o_custkey, l_suppkey, label, lang) are untouched, so
#: dupids composes into the chain without overwriting them.
DUPID_TRANSFORMS = {
    # r11b extension: FACT and DIMENSION keys too (o_orderkey,
    # c_custkey) — the colliding-upsert shape for golden joins and
    # CDC folds. Sprang two real findings on first sweep: e6's probe
    # join used o_orderkey as a row identity (fan-out under dup keys)
    # and t25's oracle inner-joined the customer FILTER leg where the
    # engine semi-joins (dup customer rows double-counted revenue in
    # the oracle only).
    #
    # r12 extension (r11 verdict item 3): the remaining identity
    # bets — lineitem's COMPOSITE key (l_orderkey, l_linenumber)
    # (for ~10% of orders every line >1 collapses onto line 1, so one
    # composite key names several different payloads; l_orderkey
    # itself stays a foreign key — the orders-side duplication above
    # already exercises parent fan-out), s_suppkey and p_partkey
    # (duplicate DIMENSION rows behind lineitem's untouched l_suppkey/
    # l_partkey foreign keys — every supplier/part dim join is now a
    # fan-out bet). Supplier shifts by 6 (keys are 1-based and dense:
    # −7 would map key 7 to the nonexistent key 0 at sf0.001's
    # 10-supplier table; −6 collides with key 1 at every SF).
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey,"
        " CASE WHEN l_orderkey % 10 = 3 AND l_linenumber > 1"
        " THEN 1 ELSE l_linenumber END AS l_linenumber,"
        " l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate FROM t"
    ),
    "supplier": (
        "SELECT CASE WHEN s_suppkey % 10 = 7 THEN s_suppkey - 6"
        " ELSE s_suppkey END AS s_suppkey,"
        " s_name, s_nationkey, s_acctbal FROM t"
    ),
    "part": (
        "SELECT CASE WHEN p_partkey % 10 = 7 THEN p_partkey - 7"
        " ELSE p_partkey END AS p_partkey,"
        " p_name, p_brand, p_type, p_size, p_retailprice FROM t"
    ),
    "orders": (
        "SELECT CASE WHEN o_orderkey % 10 = 7 THEN o_orderkey - 7"
        " ELSE o_orderkey END AS o_orderkey,"
        " o_custkey, o_orderstatus, o_totalprice, o_orderdate,"
        " o_orderpriority FROM t"
    ),
    "customer": (
        "SELECT CASE WHEN c_custkey % 10 = 7 THEN c_custkey - 7"
        " ELSE c_custkey END AS c_custkey,"
        " c_name, c_nationkey, c_acctbal, c_mktsegment FROM t"
    ),
    "events": (
        "SELECT CASE WHEN event_id % 10 = 7 THEN event_id - 7"
        " ELSE event_id END AS event_id,"
        " ts, user_id, event_type, value, props FROM t"
    ),
    "documents": (
        "SELECT CASE WHEN doc_id % 10 = 7 THEN doc_id - 7"
        " ELSE doc_id END AS doc_id,"
        " text, lang, source, n_chars FROM t"
    ),
    "embeddings": (
        "SELECT CASE WHEN vec_id % 10 = 7 THEN vec_id - 7"
        " ELSE vec_id END AS vec_id,"
        " embedding, label FROM t"
    ),
}


#: --clockskew mode (r12, nineteenth axis): out-of-order event
#: DELIVERY — producers with skewed clocks, late rows that are early
#: by wall-clock, negative inter-arrival at the watermark boundary
#: (r11 verdict item 7). Targets i4/i5/i8/i10/i13/i19 watermark
#: arithmetic and e12/e13/e14/i12's sequence ordering. Injected (on
#: the row's own id, composable with every other axis):
#:   % 23 = 3  → a FAST-CLOCK producer: ts jumps to
#:               trunc_hour(max ts) + 7h10m — the new global max drags
#:               every final watermark to an HOUR-ALIGNED boundary
#:               (max − 10 min lands exactly on an hourly window end:
#:               the inclusive-<= emission seam of the i4 class).
#:   % 23 = 5  → placed INSIDE the boundary window (h+6h30m): its
#:               window's end equals the final watermark exactly —
#:               emitted iff the oracle's <= is truly inclusive.
#:   % 23 = 7  → 25 h backward jump (crosses the day grain of
#:               d19/i18/i19 rollups); guarded away from the pandas-ns
#:               floor the chained --timewarp axis plants.
#:   % 23 = 11 → 3 h backward jump (plain out-of-order delivery).
#:   % 23 = 13 → previous row's ts (deterministic full-row order):
#:               zero/negative inter-arrival — duplicate event times
#:               for the sequence/session/EWMA tie rules.
CLOCKSKEW_TRANSFORMS = {
    "events": (
        "WITH m AS (SELECT date_trunc('hour', max(ts)) AS h FROM t)"
        " SELECT event_id,"
        " CASE"
        "   WHEN event_id % 23 = 3 THEN"
        "     (SELECT h FROM m) + INTERVAL 7 HOUR + INTERVAL 10 MINUTE"
        "   WHEN event_id % 23 = 5 THEN"
        "     (SELECT h FROM m) + INTERVAL 6 HOUR + INTERVAL 30 MINUTE"
        "   WHEN event_id % 23 = 7 AND ts > TIMESTAMP '1679-01-01'"
        "     THEN ts - INTERVAL 25 HOUR"
        "   WHEN event_id % 23 = 11 AND ts > TIMESTAMP '1679-01-01'"
        "     THEN ts - INTERVAL 3 HOUR"
        "   WHEN event_id % 23 = 13 THEN"
        "     coalesce(lag(ts) OVER (ORDER BY event_id, ts, user_id,"
        "                            event_type, value), ts)"
        "   ELSE ts END AS ts,"
        " user_id, event_type, value, props FROM t"
    ),
}


#: --datewarp mode: edge timestamps in the BUSINESS date columns
#: (o_orderdate / l_shipdate — --timewarp covers events.ts). The
#: seams: the golden queries' date-range predicates, year/month
#: extraction and INTERVAL arithmetic below 1970 and at the pandas
#: datetime64[ns] range edges (kept inside 1677/2262 per the r8
#: timewarp lesson — beyond-ns dates test the tooling, not the
#: engines). Keyed on the row's own key so orders and their lineitems
#: warp independently (join/date correlations break realistically).
DATEWARP_TRANSFORMS = {
    "orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,"
        " CASE o_orderkey % 31"
        "   WHEN 3 THEN TIMESTAMP '1969-12-31 23:59:59.999999'"
        "   WHEN 7 THEN TIMESTAMP '1970-01-01 00:00:00'"
        "   WHEN 11 THEN TIMESTAMP '1677-09-22 00:00:00.000001'"
        "   WHEN 13 THEN TIMESTAMP '2262-04-10 00:00:00.999999'"
        "   WHEN 17 THEN TIMESTAMP '1900-02-28 12:00:00'"
        "   ELSE o_orderdate END AS o_orderdate,"
        " o_orderpriority FROM t"
    ),
    "lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,"
        " l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
        " l_linestatus,"
        " CASE (l_orderkey + l_linenumber) % 31"
        "   WHEN 3 THEN TIMESTAMP '1969-12-31 23:59:59.999999'"
        "   WHEN 7 THEN TIMESTAMP '1970-01-01 00:00:00'"
        "   WHEN 11 THEN TIMESTAMP '1677-09-22 00:00:00.000001'"
        "   WHEN 13 THEN TIMESTAMP '2262-04-10 00:00:00.999999'"
        "   WHEN 17 THEN TIMESTAMP '1900-02-28 12:00:00'"
        "   ELSE l_shipdate END AS l_shipdate FROM t"
    ),
}


#: --props mode: hostile JSON payloads in events.props — the semi-
#: structured column every real event feed eventually corrupts. The
#: seams: Spark from_json is PERMISSIVE (malformed → NULL struct,
#: wrong-typed field → NULL field) while DuckDB's json functions
#: THROW on malformed input unless guarded (json_valid) and CAST
#: throws on a non-numeric string unless TRY_CAST — an oracle that
#: worked on clean props splits from the engine the day one bad line
#: lands. Injected: truncated JSON, empty string, NULL, wrong-typed
#: field, deep nesting + extra fields, valid non-object JSON.
PROPS_TRANSFORMS = {
    "events": (
        "SELECT event_id, ts, user_id, event_type, value,"
        " CASE event_id % 23"
        "   WHEN 3 THEN '{\"k\": '"
        "   WHEN 5 THEN ''"
        "   WHEN 7 THEN NULL"
        "   WHEN 11 THEN '{\"k\": \"abc\"}'"
        "   WHEN 13 THEN"
        "     '{\"k\": 7, \"nested\": {\"a\": [1, 2, 3], \"b\": {\"c\": \"d\"}}}'"
        "   WHEN 17 THEN '[1, 2, 3]'"
        "   ELSE props END AS props FROM t"
    ),
}


#: --hotkey mode: pathological KEY DISTRIBUTIONS — 90% of events land
#: on one user, 90% of embeddings in one label block, 90% of documents
#: in one lang, 90% of orders on one customer. The skew amplifier: at
#: 100 TB a power-law key is the norm, and every per-key window,
#: blocked pair join, groupBy and dim join must stay CORRECT (ties,
#: per-key ordering, block chunking) when one key swallows the corpus
#: — the axis also smokes out wedges (an unbounded per-key window or
#: unchunked block join goes quadratic on the hot key). Residue-0 rows
#: keep their original keys so secondary key paths stay populated.
HOTKEY_TRANSFORMS = {
    "events": (
        "SELECT event_id, ts,"
        " CASE WHEN event_id % 10 <> 0 THEN 7 ELSE user_id END AS user_id,"
        " event_type, value, props FROM t"
    ),
    "embeddings": (
        "SELECT vec_id, embedding,"
        " CAST(CASE WHEN vec_id % 10 <> 0 THEN 3 ELSE label END AS INTEGER)"
        " AS label FROM t"
    ),
    "documents": (
        "SELECT doc_id, text,"
        " CASE WHEN doc_id % 10 <> 0 THEN 'en' ELSE lang END AS lang,"
        " source, n_chars FROM t"
    ),
    "orders": (
        "SELECT o_orderkey,"
        " CASE WHEN o_orderkey % 10 <> 0 THEN 1 ELSE o_custkey END"
        " AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t"
    ),
}


#: --vec-extremes mode: hostile embedding payloads (r8 verdict item 4
#: — the last un-fuzzed payload type; events.value got --extremes,
#: embeddings only the null-vector gate). Injected, ~9 rows each of
#: 500: an all-NaN vector, single ±Inf and single-NaN components, the
#: all-zero vector (norm 0 → cosine divides by zero), and exact
#: DUPLICATE vectors (distance ties → top-k boundary tie-breaks).
#: The seams: NaN scores order differently per engine unless gated,
#: 0-norm normalization NaN-poisons every downstream similarity, and
#: duplicated candidates make any non-deterministic k-th-place pick
#: diverge. Dim stays 64 and element type FLOAT (schema-exact).
VEC_EXTREME_TRANSFORMS = {
    "embeddings": (
        "SELECT vec_id,"
        " CASE vec_id % 53"
        "   WHEN 5 THEN list_transform(embedding, x -> 'nan'::FLOAT)"
        "   WHEN 11 THEN list_concat(['inf'::FLOAT], embedding[2:])"
        "   WHEN 17 THEN list_concat(['-inf'::FLOAT], embedding[2:])"
        "   WHEN 23 THEN list_transform(embedding, x -> 0.0::FLOAT)"
        "   WHEN 29 THEN (SELECT t2.embedding FROM t t2 WHERE t2.vec_id = 1)"
        "   WHEN 31 THEN list_concat(['nan'::FLOAT], embedding[2:])"
        # NULL COMPONENTS (r10): the case the vec_ok null-leg closed —
        # Spark's 3VL exists() dropped such vectors while DuckDB's
        # list_filter kept them; a single-NULL head and a NULL among
        # zeros both must be gated identically now.
        "   WHEN 37 THEN list_concat([NULL::FLOAT], embedding[2:])"
        "   WHEN 41 THEN list_concat([NULL::FLOAT],"
        "                 list_transform(embedding[2:], x -> 0.0::FLOAT))"
        "   ELSE embedding END AS embedding,"
        " label FROM t"
    ),
}


#: --nulls-doc mode: NULL the PAYLOAD columns the --nulls mode leaves
#: alone — documents.text (with n_chars NULLed to keep the
#: n_chars = length(text) invariant) and embeddings.embedding. A null
#: document/vector is a daily occurrence in a real 100 TB corpus
#: (failed fetch, deleted source) and must flow through tokenizers,
#: dedup, UDF workers (None in a pandas batch!) and ANN scoring
#: without crashing a task or diverging from the oracle.
NULL_DOC_TRANSFORMS = {
    "documents": (
        "SELECT doc_id,"
        " CASE WHEN doc_id % 11 = 3 THEN NULL ELSE text END AS text,"
        " lang, source,"
        " CASE WHEN doc_id % 11 = 3 THEN NULL ELSE n_chars END AS n_chars"
        " FROM t"
    ),
    "embeddings": (
        "SELECT vec_id,"
        " CASE WHEN vec_id % 11 = 4 THEN NULL ELSE embedding END"
        " AS embedding, label FROM t"
    ),
}


#: --unicode mode: deterministic multibyte text in the string columns
#: the sf corpora keep pure-ASCII — the byte-length vs codepoint-length
#: amplifier (DuckDB levenshtein counts UTF-8 bytes where Spark counts
#:  codepoints — the j39 class; regex word classes, lower/upper
#: mappings, substr offsets and LIKE all have the same latent split).
#: Injections are common-case unicode a real testdata regen could
#: plausibly contain: accented Latin (2-byte), Greek (2-byte), CJK
#: (3-byte), one emoji (4-byte). Deliberately EXCLUDED: Turkish dotted
#: İ and German ß whose case mappings genuinely differ between Java
#: and ICU simple case folding — those are engine-divergent by spec,
#: not latent bugs. n_chars is recomputed post-transform (the corpus
#: invariant n_chars = length(text) holds for all rows in every sf).
UNICODE_TRANSFORMS = {
    "documents": (
        "SELECT doc_id, text, lang, source,"
        " CAST(length(text) AS BIGINT) AS n_chars FROM ("
        "SELECT doc_id,"
        " CASE doc_id % 4"
        "   WHEN 1 THEN replace(replace(text, 'fast', 'fàst'),"
        "                       'table', 'tâble')"
        "   WHEN 2 THEN 'café δοκιμή ' || text || ' 東京 naïve'"
        "   WHEN 3 THEN replace(text, 'data', '数据') || ' Über-résumé 🚀'"
        "   ELSE text END AS text,"
        " lang, source FROM t)"
    ),
    "part": (
        "SELECT p_partkey,"
        " CASE WHEN p_partkey % 5 = 2 THEN p_name || ' ñoño'"
        " ELSE p_name END AS p_name,"
        " p_brand, p_type, p_size, p_retailprice FROM t"
    ),
    "customer": (
        "SELECT c_custkey,"
        " CASE WHEN c_custkey % 7 = 2"
        " THEN replace(c_name, 'Customer', 'Cüstömer')"
        " ELSE c_name END AS c_name,"
        " c_nationkey, c_acctbal, c_mktsegment FROM t"
    ),
}


#: --evil-unicode mode (20th axis, r12 verdict item 5): ADVERSARIAL
#: unicode — the hostile tail the common-case --unicode axis skips.
#: documents.text gains zero-width joiners/spaces INSIDE tokens
#: (format-category codepoints: invisible, not \\w, split byte-level
#: tools from codepoint-level ones), astral-plane codepoints
#: (surrogate pairs: UTF-16 length != codepoint count != UTF-8 bytes),
#: combining-mark stacks, BiDi overrides, and MIXED-NORMALIZATION
#: duplicates — the same sentence NFC in one row and NFD in another
#: (doc_id%17 in {9,10}), NFC/NFD twin SUFFIXES on otherwise
#: unrelated rows ({4,5}), and both forms inside ONE document ({8}).
#: events.props stays VALID JSON (hostile JSON is --props) but carries
#: ZWJ-ed values, emoji ZWJ sequences, unicode keys in both
#: normalizations, BiDi content and astral values. The seams this
#: targets: Java-regex vs DuckDB-RE2 word/token boundaries around
#: format codepoints, length()/substr() codepoint-vs-byte splits,
#: shingle/fingerprint hashing of combining sequences, and any path
#: that silently normalizes on one engine only (the j39
#: ASCII-projection contract is the template for a finding). All
#: injected strings are built from EXPLICIT \\uXXXX escapes below so
#: the normalization form of every literal is auditable in source.
_ZWJ = "\u200d"    # ZERO WIDTH JOINER (format, invisible, not \\w)
_ZWSP = "\u200b"   # ZERO WIDTH SPACE
_ZWNJ = "\u200c"   # ZERO WIDTH NON-JOINER
_RLO = "\u202e"    # RIGHT-TO-LEFT OVERRIDE (BiDi)
_PDF = "\u202c"    # POP DIRECTIONAL FORMATTING
_ASTRAL = "\U0001d54f"          # MATHEMATICAL DOUBLE-STRUCK CAPITAL X
_GOTHIC = "\U00010348"          # GOTHIC LETTER HWAIR (plane 1)
_FAMILY = "\U0001f468" + _ZWJ + "\U0001f469" + _ZWJ + "\U0001f467"
_MARKSTACK = " a\u0301\u0302\u0303\u0304z"   # 4 combining marks on one base
#: the same phrase in both normal forms — NFC composed codepoints vs
#: NFD base+combining sequences; byte-unequal, render-identical.
_NFC_SUF = " d\u00e9j\u00e0 caf\u00e9 r\u00e9sum\u00e9"
_NFD_SUF = " de\u0301ja\u0300 cafe\u0301 re\u0301sume\u0301"
_NFC_SENT = "caf\u00e9 r\u00e9sum\u00e9 d\u00e9j\u00e0 vu \u00fcber na\u00efve"
_NFD_SENT = (
    "cafe\u0301 re\u0301sume\u0301 de\u0301ja\u0300 vu"
    " u\u0308ber nai\u0308ve"
)
EVIL_UNICODE_TRANSFORMS = {
    "documents": (
        "SELECT doc_id, text, lang, source,"
        " CAST(length(text) AS BIGINT) AS n_chars FROM ("
        "SELECT doc_id,"
        " CASE doc_id % 17"
        "   WHEN 1 THEN replace(text, 'key', 'k" + _ZWJ + "ey')"
        "   WHEN 2 THEN '" + _ZWNJ + "' || replace(text, 'sort', 'so"
        + _ZWSP + "rt')"
        "   WHEN 3 THEN text || ' " + _ASTRAL + "alue " + _GOTHIC + " "
        + _FAMILY + "'"
        "   WHEN 4 THEN text || '" + _NFC_SUF + "'"
        "   WHEN 5 THEN text || '" + _NFD_SUF + "'"
        "   WHEN 6 THEN text || '" + _MARKSTACK + "'"
        "   WHEN 7 THEN text || ' " + _RLO + "versed" + _PDF + "'"
        "   WHEN 8 THEN replace(replace(text, 'merge', 'm\u00e9rge'),"
        " 'table', 'ta\u0301ble')"
        "   WHEN 9 THEN '" + _NFC_SENT + "'"
        "   WHEN 10 THEN '" + _NFD_SENT + "'"
        "   ELSE text END AS text,"
        " lang, source FROM t)"
    ),
    "events": (
        "SELECT event_id, ts, user_id, event_type, value,"
        " CASE event_id % 29"
        '   WHEN 3 THEN \'{"k": 1, "name": "t' + _ZWJ + 'he"}\''
        '   WHEN 7 THEN \'{"k": 2, "emoji": "' + _FAMILY + _ZWJ
        + '\U0001f466"}\''
        '   WHEN 11 THEN \'{"caf\u00e9": 3}\''
        '   WHEN 13 THEN \'{"cafe\u0301": 4}\''
        '   WHEN 17 THEN \'{"k": "' + _RLO + 'evil' + _PDF + '"}\''
        '   WHEN 19 THEN \'{"k": "' + _ASTRAL + _ZWSP + _ASTRAL + '"}\''
        "   ELSE props END AS props FROM t"
    ),
}


#: --rowshuffle mode (21st axis, proactive r13): PERMUTE the physical
#: row order of EVERY table — content byte-identical, layout hostile.
#: Row order inside a parquet file is NOT a contract: at 100 TB the
#: same logical table arrives in whatever order splits, compactions
#: and shuffles produced, and any operator whose result depends on
#: physical order (an unpinned LIMIT, a first()-based pick, a tie
#: broken by encounter order) is nondeterministic at scale even if it
#: double-runs stably on one file. The permutation key is
#: md5(whole-row), so it is deterministic from CONTENT (reproducible
#: corpus) yet uncorrelated with every natural ordering. Pair this
#: corpus with check_determinism --vs-sf <original>: each query runs
#: on BOTH layouts and the canonicalized multisets must be EQUAL —
#: a stronger claim than same-corpus double-run determinism.
ROWSHUFFLE_TRANSFORMS = {
    t: "SELECT * FROM t ORDER BY md5(t::VARCHAR)" for t in TABLES
}


def _filesplit_corpus(src: str, out: str, n: int) -> None:
    """--filesplit mode (22nd axis, r13 verdict item 3): same rows,
    hostile FILE LAYOUT — every table becomes a DIRECTORY of n part
    files with deliberately UNEVEN sizes (triangular weights: part k
    carries ~2k/n(n+1) of the rows) plus one ZERO-ROW part, instead of
    the sf corpora's single single-row-group file. At 100 TB a table
    is always many ragged files and some tasks are empty; any operator
    whose result couples to split boundaries (per-partition firsts,
    partition-index-seeded logic, empty-partition edge cases, input_
    file_name assumptions) diverges between the layouts. Pair with
    check_determinism --vs-sf <single-file twin>: each query runs on
    BOTH layouts and the canonicalized multisets must be EQUAL —
    the file-boundary twin of --rowshuffle's row-order proof.

    pyarrow slice (not a SQL COPY) so physical types survive
    byte-exact — events.ts must stay TIMESTAMP(NANOS) for scan()'s
    nanosAsLong path to engage (the _limit_corpus discipline)."""
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    total_w = n * (n + 1) // 2
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        d = f"{out}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        rows = tbl.num_rows
        bounds = [0] + [
            round(rows * (i * (i + 1) // 2) / total_w) for i in range(1, n)
        ] + [rows]
        # the empty part leads: schema-only files are what an empty
        # task's sink commit looks like, and readers must plan past it
        pq.write_table(tbl.slice(0, 0), f"{d}/part-00000.parquet")
        for i in range(n):
            lo, hi = bounds[i], bounds[i + 1]
            pq.write_table(
                tbl.slice(lo, hi - lo), f"{d}/part-{i + 1:05d}.parquet"
            )
        print(f"{t}: {rows} rows -> {n} uneven parts + 1 empty part")
    print(f"filesplit corpus at {out}")


def _limit_corpus(src: str, out: str, n: int) -> None:
    """--limit mode: keep only the first n rows of every table (n=1 →
    single-row corpus, n=0 → empty corpus with intact schemas). The
    degenerate-cardinality amplifier: flushes out .first()-on-empty,
    index-0, empty-aggregate and schema-inference-on-empty-dir crashes
    that no populated corpus can reach. pyarrow slice (not a SQL COPY)
    so physical types survive byte-exact — events.ts must stay
    TIMESTAMP(NANOS) for scan()'s nanosAsLong path to engage."""
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl.slice(0, n), f"{out}/{t}.parquet")
        print(f"{t}: {min(n, tbl.num_rows)} rows")
    print(f"limit corpus at {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/ties")
    ap.add_argument(
        "--nulls", action="store_true",
        help="inject NULLs instead of quantizing (null-amplifier mode)",
    )
    ap.add_argument(
        "--unicode", action="store_true",
        help="inject multibyte text (byte-vs-codepoint amplifier mode)",
    )
    ap.add_argument(
        "--limit", type=int, default=None, metavar="N",
        help="keep only the first N rows per table (degenerate-"
             "cardinality amplifier; 0 = empty corpus)",
    )
    ap.add_argument(
        "--nulls-doc", action="store_true",
        help="NULL documents.text / embeddings.embedding (payload-"
             "null amplifier: UDF None inputs, null-vector scoring)",
    )
    ap.add_argument(
        "--extremes", action="store_true",
        help="NaN/±Inf/huge magnitudes in events.value (special-float "
             "amplifier: ANSI cast kills, NaN ordering, Inf arithmetic)",
    )
    ap.add_argument(
        "--timewarp", action="store_true",
        help="edge timestamps in events.ts (epoch 0, negative epochs, "
             "pandas-ns range edges: extraction/bucketing/watermarks)",
    )
    ap.add_argument(
        "--nullkeys", action="store_true",
        help="NULL join/group/window keys (anonymous events, orphaned "
             "orders, unlabeled vectors: null-key join/group asymmetries)",
    )
    ap.add_argument(
        "--datewarp", action="store_true",
        help="edge timestamps in o_orderdate/l_shipdate (business-date "
             "twin of --timewarp: range predicates, extraction, intervals)",
    )
    ap.add_argument(
        "--props", action="store_true",
        help="hostile JSON in events.props (malformed/empty/NULL/"
             "wrong-typed/nested: permissive-parse asymmetries)",
    )
    ap.add_argument(
        "--hotkey", action="store_true",
        help="90%% of events/embeddings/documents/orders on one key "
             "(skew amplifier: hot-key windows, blocked joins, dims)",
    )
    ap.add_argument(
        "--vec-extremes", action="store_true",
        help="NaN/±Inf components, zero vectors, duplicate vectors in "
             "embeddings.embedding (vector-payload amplifier)",
    )
    ap.add_argument(
        "--dupids", action="store_true",
        help="duplicate event_id/doc_id/vec_id with different payloads "
             "(at-least-once-delivery amplifier: dedup/upsert tie rules)",
    )
    ap.add_argument(
        "--clockskew", action="store_true",
        help="out-of-order event delivery in events.ts (fast-clock "
             "producer, boundary-exact windows, backward jumps, "
             "zero/negative inter-arrival: watermark/sequence seams)",
    )
    ap.add_argument(
        "--rowshuffle", action="store_true",
        help="permute physical row order of every table by "
             "md5(whole-row) (layout amplifier: pair with "
             "check_determinism --vs-sf to prove order-independence)",
    )
    ap.add_argument(
        "--evil-unicode", action="store_true",
        help="adversarial unicode in documents.text/events.props "
             "(zero-width/combining/astral/BiDi + mixed-normalization "
             "duplicates: tokenizer and dedup seams)",
    )
    ap.add_argument(
        "--pathdocs", action="store_true",
        help="pathological documents (empty/whitespace/giant-token/"
             "giant-doc text: tokenizer and batch-shape edges)",
    )
    ap.add_argument(
        "--filesplit", type=int, default=None, metavar="N",
        help="rewrite every table as a DIRECTORY of N uneven part "
             "files plus one empty part (layout amplifier: pair with "
             "check_determinism --vs-sf to prove split-independence)",
    )
    args = ap.parse_args()
    if args.limit is not None:
        _limit_corpus(args.src, args.out, args.limit)
        return
    if args.filesplit is not None:
        _filesplit_corpus(args.src, args.out, args.filesplit)
        return
    if args.rowshuffle:
        transforms = ROWSHUFFLE_TRANSFORMS
    elif args.evil_unicode:
        transforms = EVIL_UNICODE_TRANSFORMS
    elif args.clockskew:
        transforms = CLOCKSKEW_TRANSFORMS
    elif args.dupids:
        transforms = DUPID_TRANSFORMS
    elif args.nullkeys:
        transforms = NULLKEY_TRANSFORMS
    elif args.datewarp:
        transforms = DATEWARP_TRANSFORMS
    elif args.props:
        transforms = PROPS_TRANSFORMS
    elif args.hotkey:
        transforms = HOTKEY_TRANSFORMS
    elif args.vec_extremes:
        transforms = VEC_EXTREME_TRANSFORMS
    elif args.pathdocs:
        transforms = PATHDOC_TRANSFORMS
    elif args.timewarp:
        transforms = TIMEWARP_TRANSFORMS
    elif args.extremes:
        transforms = EXTREME_TRANSFORMS
    elif args.nulls_doc:
        transforms = NULL_DOC_TRANSFORMS
    elif args.unicode:
        transforms = UNICODE_TRANSFORMS
    else:
        transforms = NULL_TRANSFORMS if args.nulls else TRANSFORMS
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{args.src}/{t}.parquet"
        q = transforms.get(t)
        if q is None:
            shutil.copy(p, f"{args.out}/{t}.parquet")
            continue
        cols_src = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{p}')"
            ).fetchall()
        ]
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{p}')"
        )
        cols_out = [r[0] for r in con.execute(f"DESCRIBE {q}").fetchall()]
        assert cols_src == cols_out, (t, cols_src, cols_out)
        con.execute(f"COPY ({q}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: tied")
    print(f"tie corpus at {args.out}")


if __name__ == "__main__":
    main()
