"""Training-data-pipeline extension plans (SURVEY.md §7 P6): dedup,
similarity search, text analysis, multimodal plumbing — over the
``documents`` and ``embeddings`` testdata tables.

Oracle notes:
* ratio arithmetic is single integer division (bit-exact both sides);
* cosine uses a sequential double fold on both sides (Spark
  aggregate/zip_with vs DuckDB list_dot_product on DOUBLE[]) — ranking
  windows order by the UNROUNDED value in both engines;
* xxhash64-based entries (dedup_minhash_lsh, dedup_simhash_pairs,
  cms_heavy_hitters, hll_distinct_sketch) have no oracle — the hash is
  engine-specific → driver records rows-only checks; each has an
  md5-family twin with a FULL oracle (dedup_minhash_md5,
  dedup_simhash_md5, hll_md5_distinct) pinning the identical plan
  cross-engine, plus unit tests against exact baselines;
* the embedding LSH entries ARE fully oracled: the hyperplanes are
  closed-form ±1 literals (similarity._hyperplane), no engine-specific
  hash anywhere in that pipeline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators import (
    adpcm,
    dedup,
    geo,
    journeys,
    profile,
    multimodal,
    packing,
    rollup,
    sampling,
    similarity,
    sketches,
    textops,
)
from ..sources.testdata import load_table
from .spec import QuerySpec

_QUERY_IDS = [0, 1, 2, 3, 4]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir))


_DUP_SPAN_K, _DUP_SPAN_DIGITS = 24, 4


def _q_dup_span_stats(spark, sf_dir):
    return dedup.dup_span_stats(
        _docs(spark, sf_dir), k=_DUP_SPAN_K, sample_digits=_DUP_SPAN_DIGITS
    )


def _dup_span_sql() -> str:
    k = _DUP_SPAN_K
    # same TRIMMED digit subset as the operator (the range can yield
    # one extra digit when sample_digits does not divide 16)
    digit_list = [
        dedup._HEX[i] for i in range(0, 16, 16 // _DUP_SPAN_DIGITS)
    ][:_DUP_SPAN_DIGITS]
    digits = ", ".join(f"'{d}'" for d in digit_list)
    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {k} + 1)) AS p
  FROM documents
  WHERE text IS NOT NULL AND length(text) >= {k}
),
spans AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, md5(substr(text, CAST(p AS INTEGER), {k})) AS fp
    FROM pos
  ) WHERE substr(fp, 32, 1) IN ({digits})
),
dup AS (
  SELECT fp FROM spans GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
),
flag AS (
  SELECT s.doc_id,
         CASE WHEN d.fp IS NULL THEN 0 ELSE 1 END AS isdup
  FROM spans s LEFT JOIN dup d USING (fp)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(isdup) AS BIGINT) AS n_dup_spans,
       round(sum(isdup) * 1.0 / count(*), 6) AS dup_frac
FROM flag GROUP BY doc_id
"""


def _q_dup_span_removal(spark, sf_dir):
    """ExactSubstr span removal (dedup.remove_dup_spans) at full
    window resolution — every corpus-duplicated k-char run keeps
    exactly its first (doc_id, pos) occurrence; the gate projects
    count/length stats plus the md5 of the cleaned text so the hash
    pins the splice BYTE-exact."""
    from pyspark.sql import functions as F

    out = dedup.remove_dup_spans(_docs(spark, sf_dir), k=_DUP_SPAN_K)
    return out.select(
        "doc_id",
        F.col("n_removed_spans").cast("long").alias("n_removed_spans"),
        F.col("removed_chars").cast("long").alias("removed_chars"),
        F.length("text").cast("long").alias("clean_len"),
        F.md5("text").alias("clean_md5"),
    )


def _dup_span_removal_sql() -> str:
    k = _DUP_SPAN_K
    # per-char splice: O(corpus chars) at oracle scale — fine for
    # DuckDB at sf0.01, and trivially correct (keep a char iff no
    # removed span covers it, re-concat in position order)
    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {k} + 1)) AS p
  FROM documents WHERE text IS NOT NULL AND length(text) >= {k}),
occ AS (
  SELECT doc_id, p, md5(substr(text, CAST(p AS INTEGER), {k})) AS fp
  FROM pos),
red AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id, p) AS rn
    FROM occ) WHERE rn > 1),
isl AS (
  SELECT doc_id, p,
    CASE WHEN p > coalesce(max(p + {k} - 1) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
    THEN 1 ELSE 0 END AS new_isl FROM red),
isl2 AS (
  SELECT doc_id, p,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY p) AS isl_id
  FROM isl),
spans AS (
  SELECT doc_id, isl_id, min(p) AS s, max(p + {k} - 1) AS e
  FROM isl2 GROUP BY doc_id, isl_id),
spanagg AS (
  SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS rm_chars
  FROM spans GROUP BY doc_id),
chars AS (
  SELECT doc_id, unnest(generate_series(1, length(text))) AS i, text
  FROM documents WHERE text IS NOT NULL),
kept AS (
  SELECT c.doc_id, c.i, substr(c.text, CAST(c.i AS INTEGER), 1) AS ch
  FROM chars c
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = c.doc_id AND c.i BETWEEN s.s AND s.e)),
clean AS (
  SELECT doc_id, string_agg(ch, '' ORDER BY i) AS clean_text
  FROM kept GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(sa.n_spans, 0) AS BIGINT) AS n_removed_spans,
       CAST(coalesce(sa.rm_chars, 0) AS BIGINT) AS removed_chars,
       CAST(CASE WHEN d.text IS NULL THEN NULL
            WHEN sa.doc_id IS NULL THEN length(d.text)
            ELSE length(coalesce(cl.clean_text, '')) END AS BIGINT)
         AS clean_len,
       CASE WHEN d.text IS NULL THEN NULL
            WHEN sa.doc_id IS NULL THEN md5(d.text)
            ELSE md5(coalesce(cl.clean_text, '')) END AS clean_md5
FROM documents d
LEFT JOIN spanagg sa USING (doc_id)
LEFT JOIN clean cl USING (doc_id)
"""


_DEDUP_EXACT_SQL = r"""
SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
       count(*) AS cnt, min(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


_PREFIX_T, _PREFIX_SHINGLE = 0.8, 3


def _q_jaccard_prefix_pairs(spark, sf_dir):
    """Prefix-filtered EXACT set-similarity join (PPJoin family) at
    shingle=3, t=0.8, UNBLOCKED — the oracle computes the naive
    all-pairs answer, so the hash proves the prefix filter is
    lossless (finds every pair the quadratic join finds, including
    cross-(lang,source) pairs the blocked baseline cannot see)."""
    return dedup.jaccard_prefix_pairs(
        _docs(spark, sf_dir),
        threshold=_PREFIX_T,
        shingle=_PREFIX_SHINGLE,
    )


_PREFIX_JACCARD_SQL = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, w,
         unnest(generate_series(0, greatest(len(w) - {_PREFIX_SHINGLE}, 0)))
           AS p
  FROM t
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[p+1:p+{_PREFIX_SHINGLE}], ' ') AS tok
  FROM pos
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE c * 1.0 / (sa.n + sb.n - c) >= {_PREFIX_T}
"""


def _q_containment_pairs(spark, sf_dir):
    """Directed near-superset join (containment ≥ t over 3-shingles)
    — the oracle computes naive all-directed-pairs containment, so
    the hash proves the asymmetric prefix filter (probe side cut,
    indexed side full) lossless."""
    return dedup.containment_prefix_pairs(
        _docs(spark, sf_dir),
        threshold=_PREFIX_T,
        shingle=_PREFIX_SHINGLE,
    )


_CONTAINMENT_SQL = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, w,
         unnest(generate_series(0, greatest(len(w) - {_PREFIX_SHINGLE}, 0)))
           AS p
  FROM t
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[p+1:p+{_PREFIX_SHINGLE}], ' ') AS tok
  FROM pos
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id != b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c * 1.0 / sa.n, 4) AS containment
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
WHERE c * 1.0 / sa.n >= {_PREFIX_T}
"""


_CSKETCH_K = 24


def _q_containment_sketch_md5(spark, sf_dir):
    """Banded containment ESTIMATOR (bottom-k sketch, md5 family) —
    the scale path shadowing containment_pairs exactly the way
    dedup_minhash_md5 shadows the exact Jaccard join: probe volume
    is a constant k rows/doc, the sketch is a zero-shuffle
    projection, verification is a count aggregate. The oracle
    re-derives the identical sketch by ordering md5 hex strings, so
    the full estimate pipeline is hash-pinned cross-engine."""
    return dedup.containment_sketch_pairs(
        _docs(spark, sf_dir),
        k=_CSKETCH_K,
        threshold=_PREFIX_T,
        shingle=_PREFIX_SHINGLE,
        hash_family="md5",
    )


def _q_containment_sketch_xx(spark, sf_dir):
    """Production-hash twin (xxhash64 sketch) — engine-specific hash,
    so rows-only at the driver; the md5 twin pins the plan."""
    return dedup.containment_sketch_pairs(
        _docs(spark, sf_dir),
        k=_CSKETCH_K,
        threshold=_PREFIX_T,
        shingle=_PREFIX_SHINGLE,
        hash_family="xxhash64",
    )


def _containment_sketch_sql(max_df: int | None = None) -> str:
    """Oracle for the bottom-k containment estimator; ``max_df``
    mirrors the operator's opt-in df cap (indexed side only — the
    probe sketch is never df-filtered)."""
    index_src = "sh"
    cap_cte = ""
    if max_df is not None:
        cap_cte = f""",
capped AS (
  SELECT doc_id, tok FROM sh
  WHERE tok IN (
    SELECT tok FROM sh GROUP BY tok HAVING count(*) <= {int(max_df)}
  )
)"""
        index_src = "capped"
    return rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, w,
         unnest(generate_series(0, greatest(len(w) - {_PREFIX_SHINGLE}, 0)))
           AS p
  FROM t
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[p+1:p+{_PREFIX_SHINGLE}], ' ') AS tok
  FROM pos
),
hk AS (SELECT doc_id, tok, md5(tok) AS h FROM sh),
sk AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, tok,
           row_number() OVER (PARTITION BY doc_id ORDER BY h, tok) AS rn
    FROM hk
  ) WHERE rn <= {_CSKETCH_K}
),
ka AS (SELECT doc_id, count(*) AS kk FROM sk GROUP BY 1){cap_cte},
m AS (
  SELECT s.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
  FROM sk s JOIN {index_src} b ON s.tok = b.tok AND s.doc_id != b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(m * 1.0 / kk, 4) AS est_containment
FROM m JOIN ka ON doc_a = ka.doc_id
WHERE m * 1.0 / kk >= {_PREFIX_T}
"""


_CONTAINMENT_SKETCH_SQL = _containment_sketch_sql()
_CSKETCH_MAX_DF = 40
_SRC_CONTAIN_K = 64


def _q_source_containment(spark, sf_dir):
    """Directed corpus-group overlap: estimated containment of each
    source's union shingle set in every other's, from mergeable
    bottom-k sketches — the subset-acquisition question Jaccard
    overlap is blind to. The oracle computes the sketch by the direct
    definition (one rank over the distinct (source, token) set);
    Spark derives it from per-doc sketches via the bottom-k closure
    property — the hash proves the two derivations identical."""
    return dedup.source_containment_overlap(
        _docs(spark, sf_dir), k=_SRC_CONTAIN_K, shingle=_PREFIX_SHINGLE
    )


_SRC_CONTAIN_SQL = rf"""
WITH t AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, source, w,
         unnest(generate_series(0, greatest(len(w) - {_PREFIX_SHINGLE}, 0)))
           AS p
  FROM t
),
sh AS (
  SELECT DISTINCT source,
         array_to_string(w[p+1:p+{_PREFIX_SHINGLE}], ' ') AS tok
  FROM pos
),
hk AS (SELECT source, tok, md5(tok) AS h FROM sh),
sk AS (
  SELECT source AS source_a, tok FROM (
    SELECT source, tok,
           row_number() OVER (PARTITION BY source ORDER BY h, tok) AS rn
    FROM hk
  ) WHERE rn <= {_SRC_CONTAIN_K}
),
ka AS (SELECT source_a, count(*) AS kk FROM sk GROUP BY 1),
m AS (
  SELECT s.source_a, b.source AS source_b, count(*) AS m
  FROM sk s JOIN sh b ON s.tok = b.tok AND s.source_a != b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, round(m * 1.0 / kk, 4) AS est_containment
FROM m JOIN ka USING (source_a)
"""


def _q_containment_sketch_capped(spark, sf_dir):
    """The df-capped estimator (max_df=40 over ~500 sf0.01 docs):
    indexed-side boilerplate shingles dropped, estimates a
    deterministic lower bound — the documented 100 TB fan-out lever,
    driver-verified against the same-capped oracle."""
    return dedup.containment_sketch_pairs(
        _docs(spark, sf_dir),
        k=_CSKETCH_K,
        threshold=_PREFIX_T,
        shingle=_PREFIX_SHINGLE,
        hash_family="md5",
        max_df=_CSKETCH_MAX_DF,
    )


# deterministic HTML wrapper for the extraction gate: script with a
# '</div>' string literal and a '<' comparison, style, comment, block
# tags, and entities both sides of the payload
_HTML_PRE = (
    '<html><head><title>T</title><style>p{color:red}</style>'
    '<script type="text/javascript">var x = 1 < 2 && "</div>";</script>'
    '</head><body><!-- nav boilerplate --><div class="main">'
    '<h1>&quot;Doc&quot;</h1><p>pre &lt;tag&gt; &amp;amp; '
)
_HTML_POST = (
    "</p><p>tail &nbsp;&#39;quoted&#39;</p></div>"
    "<br><li>item</li></body></html>"
)


def _q_html_extract(spark, sf_dir):
    """Boilerplate-strip parity: every document wrapped in the SAME
    hostile HTML (script containing a fake closing tag and a bare
    '<', style, comment, block tags, all five entities) and
    extracted; the md5 pins the full staged chain — block-tag
    newlines, tag spaces, entity decode order (&amp; last),
    whitespace collapse — character for character."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST)
        ).alias("html"),
    )
    out = textops.html_extract_text(wrapped)
    return out.select(
        "doc_id", F.md5("text").alias("extracted_md5"), "n_chars"
    )


def _html_extract_oracle() -> str:
    pre = _HTML_PRE.replace("'", "''")
    post = _HTML_POST.replace("'", "''")
    return rf"""
WITH w AS (
  SELECT doc_id, '{pre}' || text || '{post}' AS h FROM documents
),
s AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(h,
            '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
          '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
          '(?s)<!--.*?-->', ' ', 'g'),
          '(?is)</?(p|div|br|li|tr|h[1-6])\b[^>]*>', chr(10), 'g'),
          '(?s)<[^>]*>', ' ', 'g'),
        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
        '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
      '[ \t]+', ' ', 'g'),
      ' ?\n ?', chr(10), 'g'),
      '\n{{2,}}', chr(10), 'g'),
      '^\n+|\n+$', '', 'g')) AS t
  FROM w
)
SELECT doc_id, md5(t) AS extracted_md5,
       length(t)::INTEGER AS n_chars
FROM s
"""


def _q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over a quasi-identifier pair coarse enough
    to form real equivalence classes (nation × market segment on
    customers, k=8): classes smaller than k are the re-identifiable
    ones a release must suppress or generalize."""
    from pyspark.sql import functions as F  # noqa: F401

    cust = load_table(spark, sf_dir, "customer")
    return textops.k_anonymity_report(
        cust, quasi_cols=["c_nationkey", "c_mktsegment"], k=8
    )


_K_ANON_SQL = """
SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS class_size
FROM customer
GROUP BY c_nationkey, c_mktsegment
HAVING count(*) < 8
"""


def _q_incremental_containment(spark, sf_dir):
    """Incremental exact-pair maintenance ≡ fresh rebuild: the shared
    synth_old_snapshot delta (added / changed / removed classes) is
    folded through update_containment_pairs; the oracle computes the
    NEW corpus's naive all-directed-pairs containment from scratch —
    a matching hash proves survivors-plus-delta-candidates covers
    exactly the fresh answer.

    Serving mode shares the OLD pair table per corpus snapshot (the
    _shared materialized-view contract): that table IS the artifact
    the fold maintains — a deployment persists it and pays only the
    delta fold per crawl (save_containment_pairs is the disk form).
    Cold/correctness runs rebuild it inline, so the declared
    derivation is unchanged; serving ≡ cold is pinned by
    test_incremental_artifacts_serving_equals_cold."""
    from .dam import _shared
    from .lakehouse import shared_snapshot_diff, synth_old_snapshot

    docs = _docs(spark, sf_dir)
    old = synth_old_snapshot(docs)
    old_pairs = _shared(
        "containment_old_pairs", spark, sf_dir,
        lambda: dedup.containment_prefix_pairs(
            old, threshold=_PREFIX_T, shingle=_PREFIX_SHINGLE
        ),
    )
    return dedup.update_containment_pairs(
        old_pairs, old, docs,
        threshold=_PREFIX_T, shingle=_PREFIX_SHINGLE,
        diff=(
            shared_snapshot_diff(spark, sf_dir)
            if os.environ.get("SPARK_DAM_SHARE_FRAMES") == "1"
            else None
        ),
    )


_EDIT_D = 2


def _q_edit_distance_pairs(spark, sf_dir):
    """Segment-filtered EXACT edit-distance self-join (PassJoin
    family) over variable-length normalized prefixes (24 + id%9
    chars, so the length bands and degenerate paths are exercised) —
    the oracle computes naive all-pairs levenshtein, so the hash
    proves the pigeonhole candidate filter lossless."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    keyed = docs.select(
        "doc_id",
        F.expr(
            "substring(regexp_replace(lower(text), '[^a-z0-9 ]', ''),"
            " 1, 24 + CAST(doc_id % 9 AS INT))"
        ).alias("key"),
    )
    return dedup.edit_distance_pairs(keyed, max_dist=_EDIT_D)


_EDIT_PAIRS_SQL = f"""
WITH s AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                1, CAST(24 + (doc_id % 9) AS INT)) AS k
  FROM documents
),
f AS (SELECT doc_id, k FROM s WHERE k IS NOT NULL AND length(k) > 0)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.k, b.k)::INTEGER AS dist
FROM f a JOIN f b ON a.doc_id < b.doc_id
WHERE abs(length(a.k) - length(b.k)) <= {_EDIT_D}
  AND levenshtein(a.k, b.k) <= {_EDIT_D}
"""


def _q_jaccard_pairs(spark, sf_dir):
    """Quadratic exact baseline, bounded by composite (lang, source)
    blocking — buckets stay ~corpus/100 regardless of scale factor."""
    return dedup.jaccard_pairs(
        _docs(spark, sf_dir), block_col=["lang", "source"], threshold=0.9
    )


_JACCARD_CTES = r"""toks AS (
  SELECT DISTINCT doc_id, lang, source,
         unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM toks a JOIN toks b
    ON a.tok = b.tok AND a.lang = b.lang AND a.source = b.source
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored_pairs AS (
  SELECT doc_a, doc_b, inter * 1.0 / (sa.n + sb.n - inter) AS j
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
)"""

_JACCARD_SQL = f"""
WITH {_JACCARD_CTES}
SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM scored_pairs WHERE j >= 0.9
"""

# Connected components as a recursive transitive closure over the same
# pair CTE: every node's cluster_id is the min doc_id it can reach
# (undirected edges make self reachable via any 2-cycle; least() guards
# the isolated-direction case). Deterministic — pins the clustering
# semantics of the iterative Spark operator.
_CLUSTERS_SQL = f"""
WITH RECURSIVE {_JACCARD_CTES},
pairs AS (SELECT doc_a, doc_b FROM scored_pairs WHERE j >= 0.9),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src
"""


def _q_minhash_near_dups(spark, sf_dir):
    """Scale path with 3-token shingles (real near-dup semantics —
    unigram sets degenerate on the 31-word synthetic vocabulary)."""
    return dedup.minhash_near_duplicates(
        _docs(spark, sf_dir), threshold=0.8, shingle=3
    )


def _q_repetition_signals(spark, sf_dir):
    """Gate runs the duplicated-trigram cap at 0.10 (the synthetic
    corpus's trigram-dup tail tops out ~0.38 and anything above 0.25
    is already caught by the bigram cap, so the published-style 0.60
    default would leave the trigram branch dead); production uses the
    operator default."""
    return textops.repetition_signals(_docs(spark, sf_dir), dup_trigram_max=0.10)


_REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
         len(text) AS n_chars
  FROM documents
),
stats AS (
  SELECT doc_id, n_chars, len(t) AS n_tokens,
         len(list_distinct(t)) AS n_distinct
  FROM toks
),
pos2 AS (
  SELECT doc_id, t, unnest(generate_series(0, len(t) - 2)) AS i FROM toks
),
bg AS (
  SELECT doc_id, array_to_string(t[i+1:i+2], ' ') AS gram, count(*) AS cnt
  FROM pos2 GROUP BY 1, 2
),
top_bg AS (
  SELECT doc_id, gram AS top_bigram, cnt * len(gram) AS top_chars
  FROM bg
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) = 1
),
pos3 AS (
  SELECT doc_id, t, unnest(generate_series(0, len(t) - 3)) AS i FROM toks
),
tg AS (
  SELECT doc_id, array_to_string(t[i+1:i+3], ' ') AS gram, count(*) AS cnt
  FROM pos3 GROUP BY 1, 2
),
dup_tg AS (
  SELECT doc_id, sum(cnt * len(gram)) AS dup_chars
  FROM tg WHERE cnt >= 2 GROUP BY 1
)
SELECT s.doc_id,
       s.n_tokens,
       round(1.0 - s.n_distinct * 1.0 / s.n_tokens, 4) AS repeated_token_frac,
       coalesce(b.top_bigram, '') AS top_bigram,
       round(coalesce(b.top_chars, 0) * 1.0 / s.n_chars, 4)
         AS top_bigram_frac,
       round(least(1.0, coalesce(d.dup_chars, 0) * 1.0 / s.n_chars), 4)
         AS dup_trigram_frac,
       CASE
         WHEN round(coalesce(b.top_chars, 0) * 1.0 / s.n_chars, 4) > 0.08
           THEN 'bigram_loop'
         WHEN round(least(1.0, coalesce(d.dup_chars, 0) * 1.0 / s.n_chars), 4)
                > 0.10
           THEN 'trigram_dup'
         ELSE 'keep'
       END AS verdict
FROM stats s
LEFT JOIN top_bg b USING (doc_id)
LEFT JOIN dup_tg d USING (doc_id)
"""


_MINHASH_MD5_K = 16
_MINHASH_MD5_BANDS = 4
_MINHASH_MD5_THRESHOLD = 0.8


def _q_minhash_md5(spark, sf_dir):
    """The md5-family MinHash+LSH variant — bit-identical in DuckDB, so
    banded candidate generation AND Jaccard verification get a full
    hash oracle (the xxhash64 production path above stays rows-only by
    design). Same 3-token shingles/threshold as dedup_minhash_lsh."""
    return dedup.minhash_near_duplicates_md5(
        _docs(spark, sf_dir),
        num_hashes=_MINHASH_MD5_K,
        bands=_MINHASH_MD5_BANDS,
        threshold=_MINHASH_MD5_THRESHOLD,
        shingle=3,
    )


def _md5_sig_ctes(k: int, extra: str = "") -> str:
    """The shared toks→sh→h0t→sigs md5-MinHash signature CTE chain —
    ONE source of truth for the shingle + hash derivation that both
    _minhash_md5_sql and _source_overlap_sql must keep bit-identical
    to dedup.token_arrays + dedup.minhash_signatures_md5. ``extra``
    threads additional per-doc columns (e.g. ", source") through
    every stage."""
    mh_cols = ",\n         ".join(
        f"list_aggregate([md5('{i}|' || h) for h in h0], 'min') AS mh{i}"
        for i in range(k)
    )
    return rf"""toks AS (
  SELECT doc_id{extra}, string_split_regex(trim(text), '\s+') AS t
  FROM documents
),
sh AS (
  SELECT doc_id{extra},
         list_distinct([array_to_string(t[i+1:i+3], ' ')
                        for i in generate_series(0, greatest(len(t) - 3, 0))]
                      ) AS sset
  FROM toks
),
h0t AS (SELECT doc_id{extra}, sset, [md5(s) for s in sset] AS h0 FROM sh),
sigs AS (
  SELECT doc_id{extra},
         {mh_cols}
  FROM h0t
)"""


def _q_incremental_minhash_bands(spark, sf_dir):
    """Incremental LSH band-table maintenance ≡ fresh rebuild: the
    same synthesized added/changed/removed snapshot as
    incremental_postings, folded into a band table built over the
    OLD corpus — the oracle builds the NEW corpus's bands from
    scratch, so the hash proves the id-keyed fold (anti-join gone
    rows, append freshly-signed delta bands) lossless, with only the
    delta ever re-signed."""
    from .dam import _shared
    from .lakehouse import shared_snapshot_diff, synth_old_snapshot

    docs = _docs(spark, sf_dir)
    old = synth_old_snapshot(docs.select("doc_id", "text"))
    # the OLD band table is the maintained artifact (load_band_table
    # is its disk form); serving mode signs the old snapshot once per
    # corpus, cold runs rebuild inline
    base = _shared(
        "minhash_old_bands", spark, sf_dir,
        lambda: dedup.minhash_bands(
            dedup.minhash_signatures_md5(
                dedup.token_arrays(old, shingle=3),
                num_hashes=_MINHASH_MD5_K,
            ),
            num_hashes=_MINHASH_MD5_K,
            bands=_MINHASH_MD5_BANDS,
            hex_buckets=True,
        ),
    )
    return dedup.update_minhash_bands(
        base,
        old,
        docs.select("doc_id", "text"),
        num_hashes=_MINHASH_MD5_K,
        bands=_MINHASH_MD5_BANDS,
        shingle=3,
        hex_buckets=True,
        diff=(
            shared_snapshot_diff(spark, sf_dir)
            if os.environ.get("SPARK_DAM_SHARE_FRAMES") == "1"
            else None
        ),
    )


def _incr_bands_sql() -> str:
    """Fresh band build over the new corpus — incremental must be
    identical (same signature CTE chain as the near-dup oracle)."""
    k, bands = _MINHASH_MD5_K, _MINHASH_MD5_BANDS
    rows = k // bands
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band_id, md5(concat_ws('|', {cols})) AS bucket "
        "FROM sigs".format(
            b=b, cols=", ".join(f"mh{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    return rf"""
WITH {_md5_sig_ctes(k)}
SELECT doc_id, band_id, bucket FROM (
  {band_selects}
)
"""


_SOURCE_OVERLAP_K = 32


def _q_source_overlap(spark, sf_dir):
    """Corpus-level source-overlap matrix from mergeable per-source
    MinHash union sketches (md5 family → full oracle)."""
    return dedup.source_minhash_overlap(
        _docs(spark, sf_dir), num_hashes=_SOURCE_OVERLAP_K, shingle=3
    )


def _source_overlap_sql() -> str:
    """ANSI twin of source_minhash_overlap: the shared signature CTE
    chain (with source threaded through), then min-per-source (the
    union sketch) and a tiny source self-join."""
    k = _SOURCE_OVERLAP_K
    sk_cols = ", ".join(f"min(mh{i}) AS mh{i}" for i in range(k))
    agree = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)"
        for i in range(k)
    )
    return rf"""
WITH {_md5_sig_ctes(k, extra=", source")},
sk AS (SELECT source, {sk_cols} FROM sigs GROUP BY source)
SELECT a.source AS group_a, b.source AS group_b,
       CAST({agree} AS BIGINT) AS n_agree,
       round(({agree}) / {k}, 4) AS est_jaccard
FROM sk a JOIN sk b ON a.source < b.source
"""


def _minhash_md5_sql() -> str:
    """ANSI twin of minhash_near_duplicates_md5: the shared signature
    CTE chain, a UNION ALL over bands for the band explode,
    list_intersect for the verify."""
    k, bands = _MINHASH_MD5_K, _MINHASH_MD5_BANDS
    rows = k // bands
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band_id, md5(concat_ws('|', {cols})) AS bucket "
        "FROM sigs".format(
            b=b, cols=", ".join(f"mh{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    thr = _MINHASH_MD5_THRESHOLD
    return rf"""
WITH {_md5_sig_ctes(k)},
banded AS (
  {band_selects}
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
sized AS (SELECT doc_id, len(sset) AS n, sset FROM sh),
scored AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.sset, sb.sset)) * 1.0 /
           (sa.n + sb.n - len(list_intersect(sa.sset, sb.sset))) AS j
  FROM cands
  JOIN sized sa ON doc_a = sa.doc_id
  JOIN sized sb ON doc_b = sb.doc_id
)
SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM scored WHERE j >= {thr}
"""


_SIMHASH_MD5_MAX_HAMMING = 8


def _q_simhash_md5(spark, sf_dir):
    """The md5-family SimHash variant (same 3-shingle/Hamming-8
    settings as dedup_simhash_pairs) — every stage ANSI-expressible,
    so banded blocking AND the exact Hamming verify get a full hash
    oracle; the xxhash64 production path stays rows-only by design."""
    return dedup.simhash_near_pairs_md5(
        _docs(spark, sf_dir),
        max_hamming=_SIMHASH_MD5_MAX_HAMMING,
        shingle=3,
    )


def _simhash_md5_sql() -> str:
    """ANSI twin of simhash_near_pairs_md5. The 64 hash bits per
    shingle are the first 16 md5 hex chars as nibble values (char p,
    bit k) — bit i of the low 32-bit half lives at char 16 - i//4,
    bit i of the high half at char 8 - i//4 — majority-voted into two
    32-bit fingerprint halves, banded into four 16-bit chunks."""
    hexpos = "strpos('0123456789abcdef', substr(h, {p}, 1)) - 1"
    nibs = ",\n         ".join(
        f"({hexpos.format(p=p)}) AS v{p}" for p in range(1, 17)
    )

    def vote(j: int) -> str:
        if j < 32:
            p, k = 16 - j // 4, j % 4
        else:
            i = j - 32
            p, k = 8 - i // 4, i % 4
        return (
            f"sum(CASE WHEN ((v{p} >> {k}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
        )

    sums = ",\n         ".join(vote(j) for j in range(64))
    sh_lo = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)"
        for i in range(32)
    )
    sh_hi = " + ".join(
        f"(CASE WHEN b{i + 32} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)"
        for i in range(32)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, sh_hi, sh_lo, {bi} AS band_id, "
        f"(({half} >> {off}) & 65535) AS chunk FROM halves"
        for bi, (half, off) in enumerate(
            [("sh_lo", 0), ("sh_lo", 16), ("sh_hi", 0), ("sh_hi", 16)]
        )
    )
    return rf"""
WITH toks0 AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
shs AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i+1:i+3], ' ')
                        for i in generate_series(0, greatest(len(t) - 3, 0))]
                      ) AS ss
  FROM toks0
),
hx AS (SELECT doc_id, md5(unnest(ss)) AS h FROM shs),
nib AS (
  SELECT doc_id,
         {nibs}
  FROM hx
),
sums AS (
  SELECT doc_id,
         {sums}
  FROM nib GROUP BY doc_id
),
halves AS (
  SELECT doc_id, {sh_lo} AS sh_lo, {sh_hi} AS sh_hi FROM sums
),
banded AS (
  {band_selects}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sh_hi AS hi_a, a.sh_lo AS lo_a, b.sh_hi AS hi_b, b.sh_lo AS lo_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       (bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)))::INTEGER
         AS hamming
FROM pairs
WHERE (bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)))
        <= {_SIMHASH_MD5_MAX_HAMMING}
"""


def _q_simhash_pairs(spark, sf_dir):
    return dedup.simhash_near_pairs(
        _docs(spark, sf_dir), max_hamming=8, shingle=3
    )


def _cluster_frame(spark, sf_dir):
    """Jaccard pairs → connected components, shared in serving mode:
    dedup_clusters and dedup_best_keep both consume this frame, and a
    serving deployment materializes the cluster map once per corpus
    snapshot (it IS the dedup index), not per downstream query."""
    from .dam import _shared

    def build():
        pairs = dedup.jaccard_pairs(
            _docs(spark, sf_dir), block_col=["lang", "source"], threshold=0.9
        )
        return dedup.duplicate_clusters(pairs)

    return _shared("dedup_clusters", spark, sf_dir, build)


def _q_dedup_clusters(spark, sf_dir):
    """Iterative min-label propagation over near-dup pairs → duplicate
    clusters (genuinely non-SQL-expressible: driver-controlled
    iteration with lineage checkpointing)."""
    return _cluster_frame(spark, sf_dir)


def _q_dedup_best_keep(spark, sf_dir):
    """Quality-aware dedup retention: same pair/closure machinery as
    dedup_clusters, but the kept representative is the LARGEST member
    (ties → lowest id) instead of min-id — the keep-the-best-copy
    policy production dedup uses."""
    return dedup.best_keep_representatives(
        _cluster_frame(spark, sf_dir), _docs(spark, sf_dir)
    )


# Defined right after _CLUSTERS_SQL's CTE chain is (re)built below via
# the same _JACCARD_CTES + recursive closure, extended with the
# size-ranked representative pick.
def _best_keep_sql() -> str:
    return f"""
WITH RECURSIVE {_JACCARD_CTES},
pairs AS (SELECT doc_a, doc_b FROM scored_pairs WHERE j >= 0.9),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
clusters AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
),
ranked AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         row_number() OVER (
           PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id ASC
         ) AS rk,
         count(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM clusters c JOIN documents d USING (doc_id)
)
SELECT cluster_id, n_members, doc_id AS keep_id, n_chars AS keep_size
FROM ranked WHERE rk = 1
"""


_EPOCH_TARGETS = {"en": 1000, "de": 100_000_000, "fr": 20_000}


def _q_epoch_plan(spark, sf_dir):
    return sampling.epoch_plan(_docs(spark, sf_dir), _EPOCH_TARGETS)


def _epoch_plan_sql() -> str:
    values = ", ".join(
        f"('{k}', {v})" for k, v in sorted(_EPOCH_TARGETS.items())
    )
    return f"""
WITH targets(lang, target) AS (VALUES {values}),
census AS (
  SELECT d.lang AS stratum,
         CAST(SUM(ceil(length(d.text) / 4.0)) AS BIGINT) AS available_tokens,
         CAST(COALESCE(MAX(t.target), 0) AS BIGINT) AS target_tokens
  FROM documents d LEFT JOIN targets t ON d.lang = t.lang
  GROUP BY 1
)
SELECT stratum, available_tokens, target_tokens,
       CAST(CASE WHEN available_tokens > 0
                 THEN least(target_tokens * 1000 // available_tokens, 4000)
                 ELSE 0 END AS BIGINT) AS epochs_permille,
       CASE WHEN available_tokens > 0
            THEN target_tokens * 1000 // available_tokens > 4000
            ELSE FALSE END AS capped
FROM census
"""


def _q_corpus_card(spark, sf_dir):
    return textops.corpus_card(_docs(spark, sf_dir))


_CORPUS_CARD_SQL = r"""
WITH scored AS (
  SELECT source, lang,
         CAST(ceil(length(text) / 4.0) AS BIGINT) AS est,
         CASE WHEN len(string_split_regex(trim(text), '\s+')) < 10 THEN 0
              WHEN length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
                     / length(text) > 0.3 THEN 0
              WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
                                   x -> x IN ('the','a','of','and','to'))) * 1.0
                     / len(string_split_regex(trim(text), '\s+')) < 0.01 THEN 0
              ELSE 1 END AS keep
  FROM documents
),
per AS (
  SELECT source, lang, count(*) AS n,
         CAST(SUM(est) AS BIGINT) AS tok,
         CAST(SUM(keep) AS BIGINT) AS kept
  FROM scored GROUP BY 1, 2
),
probs AS (
  SELECT *, n / SUM(n) OVER (PARTITION BY source) AS p FROM per
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS est_tokens,
       CAST(SUM(kept) * 1000 // SUM(n) AS BIGINT) AS keep_permille,
       count(*) AS n_langs,
       round(-SUM(p * log2(p)), 4) AS lang_entropy_bits
FROM probs GROUP BY 1
"""


def _q_corpus_diff(spark, sf_dir):
    """Two deterministic 'snapshots' derived from the documents table:
    old = ids not divisible by 10, new = ids not divisible by 7 with
    the text of every id divisible by 5 revised — exercising all four
    verdicts (added/removed/changed/unchanged)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return dedup.corpus_diff(old, new)


_CORPUS_DIFF_SQL = r"""
WITH old_snap AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS old_fp
  FROM documents WHERE doc_id % 10 != 0
),
new_snap AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(
           CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END
         ), '\s+', ' ', 'g'))) AS new_fp
  FROM documents WHERE doc_id % 7 != 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.old_fp IS DISTINCT FROM n.new_fp THEN 'changed'
            ELSE 'unchanged' END AS verdict,
       o.old_fp, n.new_fp
FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
"""


def _q_token_stats(spark, sf_dir):
    return textops.token_stats(_docs(spark, sf_dir))


_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_distinct_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
       round(length(regexp_replace(text, '\s+', '', 'g')) * 1.0
             / len(string_split_regex(trim(text), '\s+')), 4) AS mean_token_len
FROM documents
"""


def _q_quality_scores(spark, sf_dir):
    return textops.quality_scores(_docs(spark, sf_dir))


_QUALITY_SQL = r"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\s+') AS toks,
         length(text) AS n_chars_measured,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct
  FROM documents
),
scored AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         n_chars_measured,
         len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) * 1.0
           / len(toks) AS sw_ratio,
         n_punct * 1.0 / n_chars_measured AS p_ratio
  FROM base
)
SELECT doc_id, n_tokens, n_chars_measured,
       round(sw_ratio, 4) AS stopword_ratio,
       round(p_ratio, 4) AS punct_ratio,
       CASE WHEN n_tokens < 10 THEN 'too_short'
            WHEN p_ratio > 0.3 THEN 'too_noisy'
            WHEN sw_ratio < 0.01 THEN 'low_fluency'
            ELSE 'keep' END AS verdict
FROM scored
"""


# The synthetic vocabulary carries only the "en" profile's function
# words — with the canonical English eight, the stopword rule fails
# every document vacuously, so the gate exercises the rule with the
# corpus-appropriate list (the operator's documented knob).
_GOPHER_GATE_STOPWORDS = textops.STOPWORD_PROFILES["en"]


def _q_gopher_rules(spark, sf_dir):
    return textops.gopher_rules(
        _docs(spark, sf_dir), stopwords=_GOPHER_GATE_STOPWORDS
    )


_GOPHER_STOP_SQL = " + ".join(
    f"(CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END)"
    for w in _GOPHER_GATE_STOPWORDS
)

_GOPHER_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\s+') AS toks,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) / 3
           + (length(text) - length(replace(text, '…', '')))
           AS n_ellipsis
  FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
           AS sum_len,
         len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
           AS n_alpha,
         {_GOPHER_STOP_SQL} AS n_stop,
         n_hash, n_ellipsis
  FROM base
),
scored AS (
  SELECT doc_id, n_words, n_stop,
         sum_len / n_words AS mwl,
         (n_hash + n_ellipsis) / n_words AS sym,
         n_alpha / n_words AS fa
  FROM m
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(mwl, 6) AS mean_word_len,
       round(sym, 6) AS symbol_word_ratio,
       round(fa, 6) AS frac_alpha_words,
       CAST(n_stop AS BIGINT) AS n_stop_distinct,
       CASE WHEN n_words < 50 OR n_words > 100000 THEN 'bad_word_count'
            WHEN mwl < 3 OR mwl > 10 THEN 'bad_mean_word_len'
            WHEN sym > 0.1 THEN 'too_symbolic'
            WHEN fa < 0.8 THEN 'low_alpha'
            WHEN n_stop < 2 THEN 'no_stopwords'
            ELSE 'keep' END AS verdict
FROM scored
"""


def _q_winnow_fingerprints(spark, sf_dir):
    return textops.winnow_fingerprints(_docs(spark, sf_dir))


# Winnowing substrate as shared CTEs: md5 hex shingle hashes compared
# lexically — the one fingerprint family that IS oracle-able (unlike
# xxhash-based MinHash/SimHash). generate_series is inclusive on both
# ends, matching Spark F.sequence; list slices are 1-based/3-wide on
# both engines; docs with < window shingles keep the pos-0 global min.
_WINNOW_CTES = r"""toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
positions AS (
  SELECT doc_id, t,
         unnest(generate_series(0, greatest(len(t) - 3, 0))) AS pos
  FROM toks
),
sh AS (
  SELECT doc_id, pos,
         md5(array_to_string(t[pos+1:pos+3], ' ')) AS h
  FROM positions
),
counted AS (
  SELECT *, count(*) OVER (PARTITION BY doc_id) AS nsh FROM sh
),
fp AS (
  SELECT DISTINCT doc_id, fingerprint FROM (
    SELECT doc_id, pos, nsh,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                       ) AS fingerprint
    FROM counted
  ) WHERE pos <= greatest(nsh - 4, 0)
)"""

_WINNOW_SQL = f"""
WITH {_WINNOW_CTES}
SELECT doc_id, fingerprint FROM fp
"""


def _q_fingerprint_overlap(spark, sf_dir):
    return textops.fingerprint_overlap_pairs(
        _docs(spark, sf_dir), max_df=100, min_overlap=2
    )


_OVERLAP_SQL = f"""
WITH {_WINNOW_CTES},
capped AS (
  SELECT doc_id, fingerprint FROM fp
  QUALIFY count(*) OVER (PARTITION BY fingerprint) <= 100
),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM capped GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fp
  FROM capped a JOIN capped b
    ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT doc_a, doc_b, shared_fp,
       round(shared_fp * 1.0 / least(sa.n_fp, sb.n_fp), 6) AS containment
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
"""


def _q_contamination(spark, sf_dir):
    """Decontamination over a deterministic benchmark split: every
    50th doc plays the eval set, the rest the training corpus. The
    synthetic 31-word vocabulary makes shared 3-gram runs common, so
    both verdict branches carry real rows."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return textops.contamination_flags(corpus, bench)


_CONTAMINATION_SQL = f"""
WITH {_WINNOW_CTES},
corpus AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id % 50 != 0),
bench AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 50 = 0),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM corpus GROUP BY 1),
hits AS (
  SELECT doc_id, count(*) AS contaminated_fp
  FROM corpus WHERE fingerprint IN (SELECT fingerprint FROM bench)
  GROUP BY 1
)
SELECT s.doc_id, s.n_fp,
       coalesce(h.contaminated_fp, 0)::BIGINT AS contaminated_fp,
       round(coalesce(h.contaminated_fp, 0) * 1.0 / s.n_fp, 4)
         AS contaminated_frac,
       CASE WHEN coalesce(h.contaminated_fp, 0) >= 2
            THEN 'contaminated' ELSE 'clean' END AS verdict
FROM sizes s LEFT JOIN hits h USING (doc_id)
"""


_BLOOM_K, _BLOOM_M = 3, 65536


def _q_bloom_contamination(spark, sf_dir):
    """contamination_flags with the eval-fingerprint set compressed
    into a fixed-size Bloom bitmap (one-sided error — a SUPERSET of
    the exact verdicts, never a miss). Same %50 benchmark split as
    the exact gate so the two outputs are directly comparable."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return textops.bloom_contamination(
        corpus, bench, k_hash=_BLOOM_K, m_bits=_BLOOM_M
    )


def _bloom_bit_test(pos_expr: str) -> str:
    """DuckDB bit-test of position ``pos_expr`` against the bitmap —
    the same nibble-index + big-endian-bit arithmetic the Spark side
    (sketches._nibble_bit / bloom_member_col) evaluates."""
    return (
        "((strpos('0123456789abcdef', substr(bm.bitmap, "
        f"CAST(({pos_expr}) // 4 AS INT) + 1, 1)) - 1) & "
        f"(CASE ({pos_expr}) % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 "
        "WHEN 2 THEN 2 ELSE 1 END)) != 0"
    )


_BLOOM_CONTAM_SQL = f"""
WITH {_WINNOW_CTES},
corpus AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id % 50 != 0),
bench AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 50 = 0),
bpos AS (
  SELECT DISTINCT
    ('0x' || substr(fingerprint, 1 + 8 * i, 8))::BIGINT % {_BLOOM_M} AS pos
  FROM bench CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
),
nibs AS (
  SELECT CAST(pos // 4 AS INT) AS idx,
         bit_or(CASE pos % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                WHEN 2 THEN 2 ELSE 1 END) AS v
  FROM bpos GROUP BY 1
),
bm AS (
  SELECT string_agg(substr('0123456789abcdef', coalesce(v, 0) + 1, 1),
                    '' ORDER BY idx) AS bitmap
  FROM (SELECT unnest(generate_series(0, {_BLOOM_M // 4 - 1})) AS idx)
  LEFT JOIN nibs USING (idx)
),
cpos AS (
  SELECT doc_id, fingerprint,
         ('0x' || substr(fingerprint, 1 + 8 * i, 8))::BIGINT % {_BLOOM_M}
           AS pos
  FROM corpus CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
),
chk AS (
  SELECT doc_id, fingerprint, bool_and({_bloom_bit_test('pos')}) AS maybe
  FROM cpos CROSS JOIN bm
  GROUP BY 1, 2
),
perdoc AS (
  SELECT doc_id, count(*) AS n_fp,
         sum(CASE WHEN maybe THEN 1 ELSE 0 END)::BIGINT AS maybe_fp
  FROM chk GROUP BY 1
)
SELECT doc_id, n_fp, maybe_fp,
       round(maybe_fp * 1.0 / n_fp, 4) AS maybe_frac,
       CASE WHEN maybe_fp >= 2 THEN 'maybe_contaminated' ELSE 'clean' END
         AS verdict
FROM perdoc
"""


_SAMPLE_RATES = {"en": 0.5, "de": 0.25, "zh": 0.05}
_SAMPLE_DEFAULT = 0.1


def _q_stratified_sample(spark, sf_dir):
    return sampling.hash_sample(
        _docs(spark, sf_dir),
        key_col="doc_id",
        strata_col="lang",
        rates=_SAMPLE_RATES,
        default_rate=_SAMPLE_DEFAULT,
        salt="s1",
    ).select("doc_id", "lang", "source")


def _sample_sql() -> str:
    """Generated from the SAME rate dict as the Spark gate — the hex
    thresholds are compared lexically (md5 prefixes are fixed-width
    lowercase), so the predicate is engine-neutral."""
    cases = " ".join(
        f"WHEN '{s}' THEN '{sampling.rate_threshold(r)}'"
        for s, r in _SAMPLE_RATES.items()
    )
    default = sampling.rate_threshold(_SAMPLE_DEFAULT)
    return f"""
SELECT doc_id, lang, source
FROM documents
WHERE substring(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang {cases} ELSE '{default}' END
"""


def _q_training_mix(spark, sf_dir):
    """The composed corpus-selection pipeline a pretraining build
    runs: quality gate → exact dedup (keep min doc_id per normalized
    fingerprint) → deterministic per-(lang, source) quota."""
    docs = _docs(spark, sf_dir)
    from pyspark.sql import functions as F

    keep = textops.quality_scores(docs).filter(
        F.col("verdict") == "keep"
    ).select("doc_id")
    survivors = docs.join(keep, "doc_id")
    dedup_keep = (
        survivors.groupBy(dedup.normalized_text().alias("fingerprint"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    unique_docs = docs.join(dedup_keep, "doc_id")
    return sampling.stratified_cap(
        unique_docs,
        strata_cols=["lang", "source"],
        cap=30,
        key_col="doc_id",
        salt="c1",
    ).select("doc_id", "lang", "source", "n_chars")


_TRAINING_MIX_SQL = r"""
WITH quality AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x IN ('the','a','of','and','to'))) * 1.0
           / len(string_split_regex(trim(text), '\s+')) AS sw_ratio,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) * 1.0
           / length(text) AS p_ratio
  FROM documents
),
keep AS (
  SELECT doc_id FROM quality
  WHERE n_tokens >= 10 AND p_ratio <= 0.3 AND sw_ratio >= 0.01
),
dedup_keep AS (
  SELECT min(d.doc_id) AS doc_id
  FROM documents d JOIN keep USING (doc_id)
  GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
),
ranked AS (
  SELECT d.doc_id, d.lang, d.source, d.n_chars,
         row_number() OVER (
           PARTITION BY d.lang, d.source
           ORDER BY substring(md5('c1' || CAST(d.doc_id AS VARCHAR)), 1, 8),
                    d.doc_id
         ) AS rk
  FROM documents d JOIN dedup_keep USING (doc_id)
)
SELECT doc_id, lang, source, n_chars FROM ranked WHERE rk <= 30
"""


def _q_lang_agreement(spark, sf_dir):
    return textops.lang_agreement(_docs(spark, sf_dir))


def _lang_guess_sql() -> str:
    """Replicates the language_guess fold (ties keep the earlier
    profile) as nested CASE, generated from the same profile dict."""
    profiles = [
        (lang, words)
        for lang, words in textops.STOPWORD_PROFILES.items()
        if words
    ]
    ratios = ", ".join(
        f"len(list_filter(toks, x -> x IN ({', '.join(repr(w) for w in words)}))) * 1.0 / len(toks) AS r_{lang}"
        for lang, words in profiles
    )
    first = profiles[0][0]
    expr_r, expr_l = f"r_{first}", f"'{first}'"
    for lang, _ in profiles[1:]:
        expr_l = f"CASE WHEN r_{lang} > ({expr_r}) THEN '{lang}' ELSE {expr_l} END"
        expr_r = f"CASE WHEN r_{lang} > ({expr_r}) THEN r_{lang} ELSE {expr_r} END"
    return f"""
WITH base AS (
  SELECT lang AS labeled_lang, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
scored AS (SELECT labeled_lang, {ratios} FROM base),
guessed AS (
  SELECT labeled_lang,
         CASE WHEN ({expr_r}) >= 0.01 THEN ({expr_l}) ELSE 'und' END AS guessed_lang
  FROM scored
)
SELECT labeled_lang, guessed_lang, count(*) AS cnt
FROM guessed GROUP BY 1, 2
"""


def _q_embedding_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, _QUERY_IDS, k=10)


def _q_embedding_hnsw_topk(spark, sf_dir):
    """Sharded HNSW graph ANN top-10 (similarity.hnsw_topk):
    deterministic id-keyed shards, per-shard small-world graphs
    built inside applyInPandas (hash-drawn levels, no RNG), shard
    fan-out search + global top-k merge.  Rows-only by design: a
    greedy best-first graph traversal is not SQL-expressible — the
    driver pins schema + exact row count while determinism, recall
    floors and the visited-count trade are pytest-pinned
    (test_hnsw_*) and the full-oracle brute-force twin is
    embedding_topk.

    Serving mode (SPARK_DAM_SHARE_FRAMES=1): the per-shard graphs
    persist as a build_hnsw_index table under the _shared disk-kind
    contract (SPARK_DAM_INDEX_DIR) and queries serve from the loaded
    artifact via hnsw_topk_from_index — bit-identical to the fused
    path (pytest-pinned), build-once/serve-many like every sibling
    index family."""
    import os

    from .dam import _index_path, _shared

    emb = load_table(spark, sf_dir, "embeddings")
    if os.environ.get("SPARK_DAM_SHARE_FRAMES") == "1":
        # One graph row per corpus vector, so emb.count() is the same
        # staleness fingerprint the ivf_pq_codes kinds pass: a disk
        # artifact from a regenerated same-path corpus is rebuilt, not
        # silently served (the trap load_hnsw_index's expect_n closes).
        on_disk = _index_path("hnsw_index", sf_dir) is not None
        idx = _shared(
            "hnsw_index", spark, sf_dir,
            lambda: similarity.build_hnsw_index(emb, n_shards=8),
            expect_rows=emb.count() if on_disk else None,
        )
        qv = [
            (r[0], list(r[1]))
            for r in emb.filter(emb.vec_id.isin(_QUERY_IDS))
            .select("vec_id", "embedding")
            .collect()
        ]
        return similarity.hnsw_topk_from_index(
            idx, qv, k=10, ef_search=48
        )
    return similarity.hnsw_topk(
        emb, _QUERY_IDS, k=10, ef_search=48, n_shards=8
    )


def _q_embedding_hnsw_refine_topk(spark, sf_dir):
    """HNSW + exact-refine serving composition (round-12 verdict ask
    #5): rerank-deep per-shard greedy shortlists, merged, re-ranked
    by exact cosine over raw vectors (point lookups, not a scan).
    Rows-only by design — the shortlist comes from graph traversal —
    while the value discipline is covered three ways: the refine tail
    is exact_cosine_rerank (the same expression the full-oracle
    embedding_ivf_pq_refine_topk gate hashes), the exhaustive twin
    embedding_hnsw_exhaustive carries the full oracle for the graph
    machinery, and pytest pins smoke-corpus equality to cosine_topk
    plus the operating-point accounting."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hnsw_refine_topk(
        emb, _QUERY_IDS, k=10, rerank=50, ef_search=48, n_shards=8
    )


def _q_embedding_hnsw_refine_exhaustive(spark, sf_dir):
    """Degenerate-config FULL-ORACLE twin of
    embedding_hnsw_refine_topk: one shard with ef_search ≥ corpus
    size makes the per-shard greedy shortlist the EXACT top-rerank
    (same exhaustive argument as embedding_hnsw_exhaustive), and the
    refine stage re-ranks that superset by exact cosine and cuts to
    top-10 — so the whole composition (graph build → rerank-deep
    traversal → shortlist merge → exact_cosine_rerank point-lookup
    tail) must reproduce the exact cosine top-10 and shares
    embedding_topk's DuckDB oracle.  Together with
    embedding_hnsw_exhaustive this gives every stage of the refine
    serving path driver value-verification; the serving-config gate
    (8 shards, ef 48) stays rows-only because real traversal is not
    SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hnsw_refine_topk(
        emb, _QUERY_IDS, k=10, rerank=50,
        ef_search=emb.count(), n_shards=1,
    )


def _q_embedding_hnsw_exhaustive(spark, sf_dir):
    """Degenerate-config FULL-ORACLE twin of embedding_hnsw_topk
    (round-12 verdict ask #2): n_shards=1 and ef_search ≥ corpus size
    make the greedy search exhaustive — the result set never fills
    past ef, so no termination cut ever fires and every reachable
    node's distance is evaluated (HNSW insertion links every new node
    to ≥1 prior node, so the layer-0 graph is connected) — and the
    output is therefore the exact cosine top-10, sharing
    embedding_topk's DuckDB oracle while still executing the REAL
    graph build (applyInPandas, hash-drawn levels) and greedy
    traversal.  This is the correctness-twin config, not the serving
    config: one shard means one pandas group holds the corpus, which
    is exactly what the sharded default exists to avoid at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hnsw_topk(
        emb, _QUERY_IDS, k=10, ef_search=emb.count(), n_shards=1
    )


def _q_embedding_opq_identity(spark, sf_dir):
    """Degenerate-config FULL-ORACLE twin of embedding_opq_topk
    (round-12 verdict ask #2): with the identity rotation, the
    rotation fold is an exact no-op in IEEE double (each output
    element is x[j]·1 plus exact zeros), so the full OPQ serving
    machinery — rotate_vectors literal-dot projection, opq_encode's
    combined [rotation, codebooks] stamp, verify_index_stamp, and the
    encoded-table ADC scorer — must reproduce embedding_pq_topk
    bit-for-bit, sharing its unrolled-Lloyd DuckDB oracle."""
    from pyspark.sql import functions as F

    ident = [
        [1.0 if i == j else 0.0 for j in range(_PQ_DIM)]
        for i in range(_PQ_DIM)
    ]
    emb = load_table(spark, sf_dir, "embeddings")
    books = _get_pq_codebooks(spark, sf_dir, emb)
    codes = similarity.verify_index_stamp(
        similarity.opq_encode(emb, ident, books, dim=_PQ_DIM),
        codebooks=[ident, books],
        caller="embedding_opq_identity",
    )
    rotated_q = similarity.rotate_vectors(
        emb.filter(F.col("vec_id").isin(_QUERY_IDS)),
        ident, out_col="embedding",
    )
    return similarity.pq_score_queries(
        codes.withColumnRenamed("vec_id", "neighbor_id"),
        similarity.pq_prepare_queries(rotated_q, books, dim=_PQ_DIM),
        books, k=10, exclude_self=True,
    )


_TOPK_SQL = f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
norms AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus
),
q AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn
  FROM norms WHERE vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)})
),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         list_dot_product(q.qv, n.v) / (q.qn * n.nrm) AS cosine
  FROM q JOIN norms n ON n.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= 10
"""


_FILTERED_PRED = "label = 3"

_FILTERED_TOPK_SQL = f"""
WITH corpus AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
norms AS (
  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
  FROM corpus
),
q AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn
  FROM norms WHERE vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)})
),
scored AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
         list_dot_product(q.qv, n.v) / (q.qn * n.nrm) AS cosine
  FROM q JOIN norms n ON n.vec_id != q.query_id
  WHERE n.{_FILTERED_PRED}
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= 10
"""


def _q_embedding_filtered_topk(spark, sf_dir):
    """Predicate-constrained vector search (filtered ANN — the
    planning decision every production vector store makes): top-10
    cosine among corpus vectors with label = 3 (~10 % selectivity),
    queries addressed against the unfiltered corpus.  strategy='auto'
    measures selectivity in one aggregate and — at 10 % ≤ the 20 %
    cutoff — picks the PRE-FILTER exact path (subset scan, broadcast
    query join), so the gate result is exact and the auto decision
    rule itself is what's exercised.  The graph post-filter path is
    value-pinned by embedding_filtered_graph_exhaustive below."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.filtered_topk(
        emb, _QUERY_IDS, predicate=_FILTERED_PRED, k=10,
        strategy="auto",
    )


def _q_embedding_filtered_graph_exhaustive(spark, sf_dir):
    """Degenerate-config FULL-ORACLE twin for the filtered-HNSW
    traversal path: one shard with ef_search ≥ corpus size never
    terminates early (the allowed-only result heap stays below ef
    whenever the filter excludes anything), so navigation reaches
    every node, every allowed node's exact distance enters the heap,
    and the output is the exact filtered top-10 — sharing
    embedding_filtered_topk's oracle while executing the REAL
    full-corpus graph build, the blocked-node navigation, and the
    allowed-mask admission logic."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hnsw_filtered_topk(
        emb, _QUERY_IDS, predicate=_FILTERED_PRED, k=10,
        ef_search=emb.count(), n_shards=1,
    )


_KNN_GRAPH_SQL = """
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
norms AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus
),
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cosine
  FROM norms q JOIN norms n ON n.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= 5
"""


def _q_knn_graph(spark, sf_dir):
    """Exact k-NN GRAPH (top-5 neighbors for EVERY corpus vector —
    the SemDeDup / dataset-cartography building block): the query
    side is the corpus itself, distributed via exploded block keys
    and a shuffled equi-join (no driver id list, no cartesian node),
    hierarchical per-(query, block) → global top-k reduction.  The
    oracle is the full quadratic ranking — exactness is the claim,
    the blocked fan-out is just the distribution strategy."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_graph(emb, k=5, n_blocks=16)


def _q_incremental_knn_graph(spark, sf_dir):
    """Incremental k-NN-graph fold ≡ fresh rebuild, value-pinned: the
    graph built over the synthesized old snapshot (added/changed/
    removed classes — the same _synth_old_embeddings delta every
    incremental-index gate folds) is updated with knn_graph_update,
    and the oracle is knn_graph's full quadratic ranking over the NEW
    corpus — a hash match proves carry/rescore/taint-rescan/delta
    merge reproduce the rebuild exactly, through every delta class."""
    from .dam import _shared

    emb = load_table(spark, sf_dir, "embeddings")
    old_emb = _synth_old_embeddings(emb)
    # the OLD graph is the maintained artifact (a deployment persists
    # it and folds deltas); serving mode builds its quadratic tile
    # pass once per corpus snapshot, cold runs rebuild inline
    prev = _shared(
        "knn_prev_graph", spark, sf_dir,
        lambda: similarity.knn_graph(old_emb, k=5, n_blocks=16),
    )
    return similarity.knn_graph_update(
        prev, old_emb, emb, k=5, n_blocks=16
    )


def _q_lsh_ann_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, _QUERY_IDS, k=10)


def _emb_sig_ctes(planes: int = 24, dim: int = 64, band_bits: int = 4) -> str:
    """Shared CTE block reproducing similarity.lsh_signatures + band
    split in ANSI SQL: the hyperplanes are closed-form ±1 literals
    (similarity._hyperplane — seeded integer arithmetic, no RNG), so
    the sign bits and 4-bit band chunks derive bit-identically via
    list_dot_product's left-to-right fold (the same parity
    embedding_topk's oracle already pins)."""
    n_bands = planes // band_bits

    def arr(i: int) -> str:
        comps = similarity._hyperplane(i, dim)
        return "[" + ", ".join(f"{c:.1f}" for c in comps) + "]"

    bit_cols = ",\n         ".join(
        f"(CASE WHEN list_dot_product(v, {arr(i)}) >= 0 "
        f"THEN 1 ELSE 0 END) AS bit{i}"
        for i in range(planes)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT vec_id, {b} AS band_id, ({expr}) AS chunk FROM bits".format(
            b=b,
            expr=" + ".join(
                f"{1 << j} * bit{b * band_bits + j}" for j in range(band_bits)
            ),
        )
        for b in range(n_bands)
    )
    return f"""corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
norms AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM corpus
),
bits AS (
  SELECT vec_id,
         {bit_cols}
  FROM corpus
),
banded AS (
  {band_selects}
)"""


def _lsh_ann_sql() -> str:
    """ANSI twin of lsh_topk over the shared signature CTEs."""
    k = 10
    qids = ", ".join(str(i) for i in _QUERY_IDS)
    return f"""
WITH {_emb_sig_ctes()},
qb AS (
  SELECT vec_id AS query_id, band_id, chunk FROM banded
  WHERE vec_id IN ({qids})
),
cands AS (
  SELECT DISTINCT q.query_id, b.vec_id AS neighbor_id
  FROM banded b JOIN qb q USING (band_id, chunk)
  WHERE b.vec_id != q.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(qn.v, nn.v) / (qn.nrm * nn.nrm) AS cosine
  FROM cands c
  JOIN norms nn ON nn.vec_id = c.neighbor_id
  JOIN norms qn ON qn.vec_id = c.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {k}
"""


_IVF_REFINE_ITERS = 2

# The Lloyd-refined coarse quantizer is an INDEX artifact: trained once
# per corpus snapshot, reused by every query against it (exactly how
# IVF serving works — FAISS trains the quantizer at build time, not per
# search). Memoized per (sf_dir, k, iters), but ONLY under serving mode
# (SPARK_DAM_SHARE_FRAMES=1, same gate as _shared) — the correctness
# driver and the cold-plan bench are documented to see raw un-cached
# plans, so they retrain per call; deterministic, so a retrain yields
# the identical list.
_IVF_INDEX_CACHE: dict[tuple, list] = {}


def _get_ivf_quantizer(spark, sf_dir, emb):
    """Load-or-train the IVF coarse quantizer under the serving-mode
    artifact contract: memoized per (sf_dir, C, iters); with
    SPARK_DAM_INDEX_DIR it persists across process restarts (parquet
    via save_ivf_index — loaded doubles are bit-identical to trained
    ones). Correctness/cold runs (serving off) always retrain."""
    import os

    from .dam import _index_path

    serving = os.environ.get("SPARK_DAM_SHARE_FRAMES") == "1"
    key = (os.path.realpath(sf_dir), 16, _IVF_REFINE_ITERS)
    cents = _IVF_INDEX_CACHE.get(key) if serving else None
    if cents is None:
        path = _index_path("ivf_quantizer", sf_dir) if serving else None
        n = emb.count() if path is not None else None
        if path is not None and os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            try:
                cents = similarity.load_ivf_index(spark, path, expect_n=n)
            except ValueError:
                cents = None  # stale artifact → retrain below
        if cents is None:
            cents = similarity.ivf_centroids(
                emb, n_centroids=16, refine_iters=_IVF_REFINE_ITERS
            )
            if path is not None:
                similarity.save_ivf_index(spark, cents, path, n_corpus=n)
        if serving:
            _IVF_INDEX_CACHE[key] = cents
    return cents


def _get_pq_codebooks(spark, sf_dir, emb):
    """PQ codebooks under the same load-or-train artifact contract as
    :func:`_get_ivf_quantizer` (save_pq_index / load_pq_index)."""
    import os

    from .dam import _index_path

    serving = os.environ.get("SPARK_DAM_SHARE_FRAMES") == "1"
    key = (os.path.realpath(sf_dir), _PQ_M, _PQ_KSUB, _PQ_ITERS)
    books = _PQ_INDEX_CACHE.get(key) if serving else None
    if books is None:
        path = _index_path("pq_codebooks", sf_dir) if serving else None
        n = emb.count() if path is not None else None
        if path is not None and os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            try:
                books = similarity.load_pq_index(spark, path, expect_n=n)
            except ValueError:
                books = None  # stale artifact → retrain below
        if books is None:
            books = similarity.pq_train(
                emb, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS, dim=_PQ_DIM
            )
            if path is not None:
                similarity.save_pq_index(spark, books, path, n_corpus=n)
        if serving:
            _PQ_INDEX_CACHE[key] = books
    return books


def _q_ivf_ann_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _get_ivf_quantizer(spark, sf_dir, emb)
    return similarity.ivf_topk(
        emb, _QUERY_IDS, k=10, n_centroids=16, n_probe=4,
        refine_iters=_IVF_REFINE_ITERS, centroids=cents,
    )


def _synth_old_embeddings(emb):
    """synth_old_snapshot's delta classes on the EMBEDDINGS table:
    vec_id ≡ 3 mod 10 absent (added), ≡ 7 mod 10 with element 0
    bumped by 1.0 (changed — value inequality is all the classify
    join needs), ephemeral high ids (removed)."""
    from pyspark.sql import functions as F

    perturbed = F.transform(
        "embedding",
        lambda x, i: F.when(i == 0, (x + F.lit(1.0)).cast("float"))
        .otherwise(x),
    )
    return (
        emb.filter(F.col("vec_id") % 10 != 3)
        .select(
            "vec_id",
            F.when(F.col("vec_id") % 10 == 7, perturbed)
            .otherwise(F.col("embedding"))
            .alias("embedding"),
            "label",
        )
        .unionByName(
            emb.filter(F.col("vec_id") % 10 == 1).select(
                (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    )


def _q_incremental_ivf_topk(spark, sf_dir):
    """Incremental IVF maintenance ≡ fresh build, served end-to-end:
    the assignment table built over a synthesized old snapshot
    (added/changed/removed classes) is folded forward under the SAME
    quantizer, and the query gate serves top-k FROM the folded table
    — the oracle is embedding_ann_ivf's fresh-build SQL, so the hash
    proves carry/re-assign/drop leave serving bit-identical."""
    from .dam import _shared

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _get_ivf_quantizer(spark, sf_dir, emb)
    old_emb = _synth_old_embeddings(emb)
    # the stamped OLD assignment table is the maintained artifact;
    # serving mode assigns the old snapshot once per corpus (persist
    # keeps the stamp metadata — same DataFrame object), cold runs
    # re-derive it inline
    old_assign = _shared(
        "ivf_old_assign", spark, sf_dir,
        lambda: similarity.stamp_ivf_assignments(
            similarity.ivf_assignments(old_emb, cents), cents
        ),
    )
    folded = similarity.ivf_update_assignments(
        # no caching: the gate returns a lazy frame the driver
        # executes later, so nothing here could unpersist — the
        # classify join re-executes once per branch instead of
        # accumulating executor storage across bench/driver runs
        old_assign, old_emb, emb, cents, cache_classification=False,
    )
    return similarity.ivf_topk(
        emb, _QUERY_IDS, k=10, n_probe=4, centroids=cents,
        assignments=folded,
    )


def _ivf_ann_sql() -> str:
    """IVF oracle with the Lloyd-REFINED coarse quantizer: the
    centroid chain is the same unrolled decimal-exact refinement the
    kmeans_exact_clusters oracle uses (c0 = seed-by-id → c{iters}),
    then cosine assignment / probing / re-rank as before."""
    refine = _lloyd_refine_ctes(16, _IVF_REFINE_ITERS, _KMEANS_EXACT_DIM)
    return f"""
WITH {refine},
norms AS (
  SELECT vec_id, v, sqrt(norm2) AS nrm FROM norms2
),
cents AS (
  SELECT cid AS cent_id, cv, sqrt(cn2) AS cn FROM c{_IVF_REFINE_ITERS}
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, c.cv) / (c.cn * n.nrm) DESC,
                      c.cent_id ASC) AS rn
    FROM norms n CROSS JOIN cents c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT query_id, cent_id FROM (
    SELECT n.vec_id AS query_id, c.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, c.cv) / (c.cn * n.nrm) DESC,
                      c.cent_id ASC) AS rn
    FROM norms n CROSS JOIN cents c
    WHERE n.vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)})
  ) WHERE rn <= 4
),
cands AS (
  SELECT q.query_id, a.vec_id AS neighbor_id
  FROM qprobe q JOIN assign a USING (cent_id)
  WHERE a.vec_id != q.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(qn.v, nn.v) / (qn.nrm * nn.nrm) AS cosine
  FROM cands c
  JOIN norms qn ON qn.vec_id = c.query_id
  JOIN norms nn ON nn.vec_id = c.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= 10
"""


_PQ_M, _PQ_KSUB, _PQ_ITERS, _PQ_DIM = 4, 16, 2, 64

# PQ codebooks are an index artifact exactly like the IVF quantizer:
# same serving-only memo + optional parquet persistence contract.
_PQ_INDEX_CACHE: dict[tuple, list] = {}


def _get_ivf_pq_codes(spark, sf_dir, emb):
    """The encoded-corpus index artifact (serving mode only): one
    (cent_id, code0..m-1) row per vector, built once per corpus
    snapshot via ivf_pq_encode and shared by the PQ and IVF-PQ gates
    — the codes ARE the stored index, so query time never re-scans
    the raw vectors. Returns None when serving is off (correctness
    driver / cold bench see the raw single-pass encode plan). A
    disk-persisted table is row-count-fingerprinted against the live
    corpus (same staleness contract as the quantizer/codebook
    artifacts) so a regenerated corpus rebuilds instead of joining
    new-quantizer probes against old-corpus codes."""
    import os

    if os.environ.get("SPARK_DAM_SHARE_FRAMES") != "1":
        return None
    from .dam import _index_path, _shared

    cents = _get_ivf_quantizer(spark, sf_dir, emb)
    books = _get_pq_codebooks(spark, sf_dir, emb)
    on_disk = _index_path("ivf_pq_codes", sf_dir) is not None
    return _shared(
        "ivf_pq_codes", spark, sf_dir,
        # Content-stamped with the codebook/quantizer fingerprints so
        # the scoring entrypoints fail LOUDLY if this table is ever
        # paired with artifacts from a different build (the row-count
        # fingerprint can't see a regenerated same-size corpus).
        lambda: similarity.stamp_index(
            similarity.ivf_pq_encode(
                emb, centroids=cents, codebooks=books, dim=_PQ_DIM
            ),
            codebooks=books, centroids=cents,
        ),
        expect_rows=emb.count() if on_disk else None,
    )


def _pq_norm_ann_sql() -> str:
    """Normalize-then-encode PQ oracle: one unit-normalization CTE
    (sqrt(list_dot_product) + list_transform — the byte-equal twin of
    similarity.normalize_vectors' expression), then the standard
    unrolled-Lloyd / argmin-encode / ADC chain over its slices."""
    unit = """unitsrc AS (
  SELECT vec_id,
         CASE WHEN nrm = 0 THEN v
              ELSE list_transform(v, x -> x / nrm) END AS u
  FROM (
    SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings)
  )
)"""
    return _pq_ann_sql(
        pre_cte=unit,
        src_for=lambda j, lo, hi: (
            f"(SELECT vec_id, u[{lo}:{hi}] AS v FROM unitsrc)"
        ),
    )


_PQ_NORM_INDEX_CACHE: dict[tuple, list] = {}


def _get_pq_norm_codebooks(spark, sf_dir, emb):
    """Unit-space PQ codebooks under the load-or-train artifact
    contract of :func:`_get_pq_codebooks` (own disk kind — codes and
    books trained in the normalized space must never pair with the
    raw-space artifacts)."""
    import os

    from .dam import _index_path

    serving = os.environ.get("SPARK_DAM_SHARE_FRAMES") == "1"
    key = (
        os.path.realpath(sf_dir), _PQ_M, _PQ_KSUB, _PQ_ITERS, "norm",
    )
    books = _PQ_NORM_INDEX_CACHE.get(key) if serving else None
    if books is None:
        path = (
            _index_path("pq_norm_codebooks", sf_dir) if serving else None
        )
        n = emb.count() if path is not None else None
        if path is not None and os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            try:
                books = similarity.load_pq_index(spark, path, expect_n=n)
            except ValueError:
                books = None  # stale artifact → retrain below
        if books is None:
            books = similarity.pq_train(
                similarity.normalize_vectors(emb),
                m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS, dim=_PQ_DIM,
            )
            if path is not None:
                similarity.save_pq_index(spark, books, path, n_corpus=n)
        if serving:
            _PQ_NORM_INDEX_CACHE[key] = books
    return books


def _q_embedding_pq_norm_topk(spark, sf_dir):
    """Normalize-then-encode PQ ADC top-10 (round-12 verdict ask #3;
    FAISS IndexPreTransform(L2norm, IndexPQ)): on unit vectors
    L2-ADC order estimates cosine order, closing the raw-PQ metric
    mismatch (sf10 ADC-only recall 0.10–0.34 raw → see SCALE.md's
    pq_norm row) at identical plan shape and code budget.  Full
    DuckDB oracle: the normalization CTE feeds the same
    unrolled-Lloyd chain as embedding_pq_topk's oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = _get_pq_norm_codebooks(spark, sf_dir, emb)
    return similarity.pq_norm_topk(
        emb, _QUERY_IDS, k=10, m=_PQ_M, ksub=_PQ_KSUB,
        iters=_PQ_ITERS, dim=_PQ_DIM, codebooks=books,
    )


def _q_pq_ann_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = _get_pq_codebooks(spark, sf_dir, emb)
    codes = _get_ivf_pq_codes(spark, sf_dir, emb)
    if codes is not None:
        from pyspark.sql import functions as F

        # Serving path: ADC over the persisted code table (cent_id is
        # the IVF half of the shared artifact; PQ ignores it).
        return similarity.pq_score_queries(
            codes.drop("cent_id").withColumnRenamed(
                "vec_id", "neighbor_id"
            ),
            similarity.pq_prepare_queries(
                emb.filter(F.col("vec_id").isin(_QUERY_IDS)),
                books, dim=_PQ_DIM,
            ),
            books, k=10, exclude_self=True,
        )
    return similarity.pq_topk(
        emb, _QUERY_IDS, k=10, m=_PQ_M, ksub=_PQ_KSUB,
        iters=_PQ_ITERS, dim=_PQ_DIM, codebooks=books,
    )


def _pq_sub_ctes(
    j: int,
    lo: int,
    dsub: int,
    ksub: int,
    iters: int,
    pref: str = "p",
    src: str | None = None,
) -> str:
    """Unrolled decimal-exact Lloyd for ONE PQ subspace — the
    _lloyd_refine_ctes construction applied to the slice
    ``v[lo : lo+dsub-1]`` with prefixed CTE names ({pref}{j}…), ending
    at codebook ``{pref}{j}c{iters}`` (cid, cv, cn2) and encode stage
    ``{pref}{j}e`` (vec_id, code). Seeds = the ksub lowest-id vectors'
    sub-slices, identical to similarity.pq_train.

    ``src`` overrides the training substrate: any SQL table expression
    yielding (vec_id, v DOUBLE[dsub]) — the residual gate passes the
    per-subspace residual slice; default is the raw embedding slice."""
    hi = lo + dsub - 1
    p = pref
    if src is None:
        src = (
            f"(SELECT vec_id,\n"
            f"               (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS v\n"
            f"        FROM embeddings)"
        )
    mean_cols = ",\n         ".join(
        f"CAST(sum(CAST(v[{d + 1}] AS DECIMAL(27,12))) AS DOUBLE)"
        f" / count(*) AS m{d}"
        for d in range(dsub)
    )
    mean_list = "[" + ", ".join(f"m{d}" for d in range(dsub)) + "]"

    def assign(r: int, out: str) -> str:
        return f"""{out} AS (
  SELECT vec_id, v, cid
  FROM (
    SELECT n.vec_id, n.v, c.cid,
           n.norm2 - 2.0 * list_dot_product(n.v, c.cv) + c.cn2 AS dist
    FROM {p}{j}n n CROSS JOIN {p}{j}c{r - 1} c
  )
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)"""

    parts = [
        f"""{p}{j}n AS (
  SELECT vec_id, v, list_dot_product(v, v) AS norm2
  FROM {src}
),
{p}{j}c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid,
         v AS cv, list_dot_product(v, v) AS cn2
  FROM (SELECT vec_id, v FROM {p}{j}n ORDER BY vec_id LIMIT {ksub})
)"""
    ]
    for r in range(1, iters + 1):
        parts.append(assign(r, f"{p}{j}a{r}"))
        parts.append(
            f"""{p}{j}m{r} AS (
  SELECT cid,
         {mean_cols}
  FROM {p}{j}a{r} GROUP BY 1
),
{p}{j}c{r} AS (
  SELECT {p}{j}c{r - 1}.cid,
         COALESCE(mm.cv, {p}{j}c{r - 1}.cv) AS cv,
         list_dot_product(COALESCE(mm.cv, {p}{j}c{r - 1}.cv),
                          COALESCE(mm.cv, {p}{j}c{r - 1}.cv)) AS cn2
  FROM {p}{j}c{r - 1}
  LEFT JOIN (SELECT cid, {mean_list} AS cv FROM {p}{j}m{r}) mm USING (cid)
)"""
        )
    parts.append(
        f"""{p}{j}e AS (
  SELECT vec_id, cid AS code
  FROM (
    SELECT n.vec_id, c.cid,
           n.norm2 - 2.0 * list_dot_product(n.v, c.cv) + c.cn2 AS dist
    FROM {p}{j}n n CROSS JOIN {p}{j}c{iters} c
  )
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)"""
    )
    return ",\n".join(parts)


def _pq_ann_sql(
    *, pre_cte: str = "", src_for=None
) -> str:
    """ADC oracle: per-subspace codebooks re-derived by the same
    unrolled decimal Lloyd the Spark side runs (so they match
    bit-for-bit), corpus encoded per subspace by argmin, and the
    asymmetric distance recovered per subspace by joining the code
    back to its centroid — summed j-ascending, the exact operation
    order of similarity.pq_topk's CASE-sum expression.

    ``pre_cte``/``src_for(j, lo, hi)`` re-substrate the whole chain
    (the normalized-vector gate prepends a unit-normalization CTE
    and slices it instead of the raw embeddings)."""
    m, ksub, iters, dim = _PQ_M, _PQ_KSUB, _PQ_ITERS, _PQ_DIM
    dsub = dim // m
    subs = ",\n".join(
        _pq_sub_ctes(
            j, j * dsub + 1, dsub, ksub, iters,
            src=(
                src_for(j, j * dsub + 1, (j + 1) * dsub)
                if src_for is not None else None
            ),
        )
        for j in range(m)
    )
    if pre_cte:
        subs = pre_cte + ",\n" + subs
    qids = ", ".join(str(i) for i in _QUERY_IDS)
    enc_joins = "\n  ".join(
        f"JOIN p{j}e e{j} ON e{j}.vec_id = e0.vec_id" for j in range(1, m)
    )
    enc_cols = ", ".join(f"e{j}.code AS code{j}" for j in range(m))
    q_cols = ", ".join(
        f"q{j}.v AS qs{j}, q{j}.norm2 AS qn{j}" for j in range(m)
    )
    q_joins = "\n  ".join(
        f"JOIN p{j}n q{j} ON q{j}.vec_id = q0.vec_id"
        for j in range(1, m)
    )
    book_joins = "\n  ".join(
        f"JOIN p{j}c{iters} b{j} ON b{j}.cid = e.code{j}" for j in range(m)
    )
    adc = " + ".join(
        f"(q.qn{j} - 2.0 * list_dot_product(q.qs{j}, b{j}.cv) + b{j}.cn2)"
        for j in range(m)
    )
    return f"""
WITH {subs},
enc AS (
  SELECT e0.vec_id, {enc_cols}
  FROM p0e e0
  {enc_joins}
),
q AS (
  SELECT q0.vec_id AS query_id, {q_cols}
  FROM p0n q0
  {q_joins}
  WHERE q0.vec_id IN ({qids})
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {adc} AS adc
  FROM enc e CROSS JOIN q
  {book_joins}
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, adc,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(adc, 6) AS adc_dist
FROM ranked WHERE rank <= 10
"""


def _q_ivf_pq_ann_topk(spark, sf_dir):
    """IVF-PQ serving composition: both index artifacts come from the
    SAME load-or-train helpers as the standalone gates (same params,
    same persistence), so one training pass per corpus snapshot —
    whichever gate runs first — serves all three ANN query shapes,
    in-process and across restarts."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _get_ivf_quantizer(spark, sf_dir, emb)
    books = _get_pq_codebooks(spark, sf_dir, emb)
    return similarity.ivf_pq_topk(
        emb, _QUERY_IDS, k=10, n_centroids=16, n_probe=4,
        refine_iters=_IVF_REFINE_ITERS, m=_PQ_M, ksub=_PQ_KSUB,
        iters=_PQ_ITERS, dim=_PQ_DIM, centroids=cents, codebooks=books,
        encoded=_get_ivf_pq_codes(spark, sf_dir, emb),
    )


def _ivf_pq_ann_sql() -> str:
    """IVF-PQ oracle = the IVF oracle's coarse chain (full-dim
    unrolled decimal Lloyd → cosine assign + probe) composed with the
    PQ oracle's per-subspace chains (codebooks + encode), candidates
    from the probed lists, ranked by the same ADC sum as the PQ
    oracle. CTE namespaces are disjoint by construction (norms2/c{r}
    vs p{j}…)."""
    m, ksub, iters, dim = _PQ_M, _PQ_KSUB, _PQ_ITERS, _PQ_DIM
    dsub = dim // m
    coarse = _lloyd_refine_ctes(16, _IVF_REFINE_ITERS, _KMEANS_EXACT_DIM)
    subs = ",\n".join(
        _pq_sub_ctes(j, j * dsub + 1, dsub, ksub, iters) for j in range(m)
    )
    qids = ", ".join(str(i) for i in _QUERY_IDS)
    enc_joins = "\n  ".join(
        f"JOIN p{j}e e{j} ON e{j}.vec_id = e0.vec_id" for j in range(1, m)
    )
    enc_cols = ", ".join(f"e{j}.code AS code{j}" for j in range(m))
    q_cols = ", ".join(
        f"q{j}.v AS qs{j}, q{j}.norm2 AS qn{j}" for j in range(m)
    )
    q_joins = "\n  ".join(
        f"JOIN p{j}n q{j} ON q{j}.vec_id = q0.vec_id"
        for j in range(1, m)
    )
    book_joins = "\n  ".join(
        f"JOIN p{j}c{iters} b{j} ON b{j}.cid = e.code{j}" for j in range(m)
    )
    adc = " + ".join(
        f"(qq.qn{j} - 2.0 * list_dot_product(qq.qs{j}, b{j}.cv) + b{j}.cn2)"
        for j in range(m)
    )
    return f"""
WITH {coarse},
{subs},
norms AS (
  SELECT vec_id, v, sqrt(norm2) AS nrm FROM norms2
),
cents AS (
  SELECT cid AS cent_id, cv, sqrt(cn2) AS cn FROM c{_IVF_REFINE_ITERS}
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, c.cv) / (c.cn * n.nrm) DESC,
                      c.cent_id ASC) AS rn
    FROM norms n CROSS JOIN cents c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT query_id, cent_id FROM (
    SELECT n.vec_id AS query_id, c.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, c.cv) / (c.cn * n.nrm) DESC,
                      c.cent_id ASC) AS rn
    FROM norms n CROSS JOIN cents c
    WHERE n.vec_id IN ({qids})
  ) WHERE rn <= 4
),
enc AS (
  SELECT e0.vec_id, {enc_cols}
  FROM p0e e0
  {enc_joins}
),
qq AS (
  SELECT q0.vec_id AS query_id, {q_cols}
  FROM p0n q0
  {q_joins}
  WHERE q0.vec_id IN ({qids})
),
cands AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM qprobe p JOIN assign a USING (cent_id)
  WHERE a.vec_id != p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         {adc} AS adc
  FROM cands c
  JOIN enc e ON e.vec_id = c.neighbor_id
  JOIN qq ON qq.query_id = c.query_id
  {book_joins}
),
ranked AS (
  SELECT query_id, neighbor_id, adc,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(adc, 6) AS adc_dist
FROM ranked WHERE rank <= 10
"""


_RES_PQ_INDEX_CACHE: dict[tuple, list] = {}


def _get_res_pq_codebooks(spark, sf_dir, emb, cents):
    """Residual PQ codebooks under the same load-or-train artifact
    contract as :func:`_get_pq_codebooks` (they're a list of float
    lists exactly like raw codebooks, so save/load_pq_index apply
    unchanged; distinct artifact name keeps the two from ever being
    paired with the wrong scorer).  The artifact is additionally
    stamped with the coarse quantizer's fingerprint it was trained
    against: residual books are meaningless under a different
    quantizer, and without the stamp an independently replaced
    ivf_quantizer artifact would leave stale books that load cleanly
    (row counts and their own content stamp both still match) and
    serve silently degraded ADC distances — the load refuses and
    retrains instead."""
    import os

    from .dam import _index_path

    serving = os.environ.get("SPARK_DAM_SHARE_FRAMES") == "1"
    cents_fp = similarity.artifact_fingerprint(cents)
    key = (
        os.path.realpath(sf_dir), _PQ_M, _PQ_KSUB, _PQ_ITERS, "res",
        cents_fp,
    )
    books = _RES_PQ_INDEX_CACHE.get(key) if serving else None
    if books is None:
        path = _index_path("pq_res_codebooks", sf_dir) if serving else None
        n = emb.count() if path is not None else None
        if path is not None and os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            try:
                books = similarity.load_pq_index(
                    spark, path, expect_n=n,
                    expect_trained_against=cents_fp,
                )
            except ValueError:
                books = None  # stale artifact → retrain below
        if books is None:
            books = similarity.pq_train_residual(
                emb, cents,
                m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS, dim=_PQ_DIM,
            )
            if path is not None:
                similarity.save_pq_index(
                    spark, books, path, n_corpus=n,
                    trained_against=cents_fp,
                )
        if serving:
            _RES_PQ_INDEX_CACHE[key] = books
    return books


_OPQ_ITERS = 3
_OPQ_INDEX_CACHE: dict[tuple, tuple] = {}


def _get_opq(spark, sf_dir, emb):
    """(rotation, codebooks) under the load-or-train artifact
    contract, via the ONE-artifact save_opq_index/load_opq_index
    round-trip: the rotation and its rotated-space codebooks persist
    together, so a desynchronized pair (books trained in one rotated
    space loaded against another rotation — the residual-books
    pairing trap) is unrepresentable on disk; n_corpus is the
    staleness stamp (a regenerated corpus retrains instead of
    serving the old snapshot's index)."""
    import os

    from .dam import _index_path

    serving = os.environ.get("SPARK_DAM_SHARE_FRAMES") == "1"
    key = (
        os.path.realpath(sf_dir), _PQ_M, _PQ_KSUB, _PQ_ITERS, _OPQ_ITERS,
        "opq",
    )
    pair = _OPQ_INDEX_CACHE.get(key) if serving else None
    if pair is None:
        path = _index_path("opq_index", sf_dir) if serving else None
        n = emb.count() if path is not None else None
        rotation = books = None
        if path is not None and os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            try:
                rotation, books = similarity.load_opq_index(
                    spark, path, expect_n=n
                )
            except ValueError:
                rotation = books = None  # stale → retrain below
        if rotation is None or books is None:
            rotation, books = similarity.pq_train_opq(
                emb, m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS,
                opq_iters=_OPQ_ITERS, dim=_PQ_DIM,
            )
            if path is not None:
                similarity.save_opq_index(
                    spark, rotation, books, path, n_corpus=n
                )
        pair = (rotation, books)
        if serving:
            _OPQ_INDEX_CACHE[key] = pair
    return pair


def _q_embedding_opq_topk(spark, sf_dir):
    """OPQ ADC top-10: learned orthogonal rotation (alternating
    Lloyd / Procrustes-SVD, Ge et al. CVPR 2013) folded into the
    scan projection, then the standard PQ serving pipeline at the
    SAME code budget.  Rows-only by design: the rotation update is
    an SVD — not DuckDB-expressible — so the driver pins schema +
    exact row count here, while the serving plan shape is the
    full-oracle-verified embedding_pq_topk's and the distortion /
    recall uplift is pinned in pytest (test_opq_*)."""
    emb = load_table(spark, sf_dir, "embeddings")
    rotation, books = _get_opq(spark, sf_dir, emb)
    return similarity.opq_topk(
        emb, _QUERY_IDS, rotation=rotation, codebooks=books,
        k=10, dim=_PQ_DIM,
    )


def _get_ivf_pq_res_codes(spark, sf_dir, emb, cents, books):
    """Residual code table under the shared-artifact contract of
    :func:`_get_ivf_pq_codes` — stamped with the residual codebook +
    quantizer fingerprints so ivf_pq_topk_residual refuses a
    mismatched pairing."""
    import os

    if os.environ.get("SPARK_DAM_SHARE_FRAMES") != "1":
        return None
    from .dam import _index_path, _shared

    on_disk = _index_path("ivf_pq_res_codes", sf_dir) is not None
    return _shared(
        "ivf_pq_res_codes", spark, sf_dir,
        lambda: similarity.stamp_index(
            similarity.ivf_pq_encode_residual(
                emb, centroids=cents, codebooks=books, dim=_PQ_DIM
            ),
            codebooks=books, centroids=cents,
        ),
        expect_rows=emb.count() if on_disk else None,
    )


def _q_ivf_pq_res_topk(spark, sf_dir):
    """Residual IVF-PQ (the FAISS IndexIVFPQ default): codebooks
    trained on v − centroid(v), codes quantize the residual, the
    query residualizes against each probed centroid before ADC.
    Shares the coarse quantizer artifact with the IVF family; the
    residual codebooks and code table follow the same load-or-train
    serving contract as the raw-PQ gates (correctness/cold runs
    retrain in-gate, pinning the whole residual chain in the hash)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _get_ivf_quantizer(spark, sf_dir, emb)
    books = _get_res_pq_codebooks(spark, sf_dir, emb, cents)
    return similarity.ivf_pq_topk_residual(
        emb, _QUERY_IDS, k=10, n_centroids=16, n_probe=4,
        refine_iters=_IVF_REFINE_ITERS, m=_PQ_M, ksub=_PQ_KSUB,
        iters=_PQ_ITERS, dim=_PQ_DIM, centroids=cents, codebooks=books,
        encoded=_get_ivf_pq_res_codes(spark, sf_dir, emb, cents, books),
    )


def _ivf_pq_res_sql(refine: tuple[int, int] | None = None) -> str:
    """Residual-IVF-PQ oracle: the IVF coarse chain, a residual
    substrate CTE (rsrc: full vector + assigned centroid vector),
    per-subspace Lloyd chains trained on the RESIDUAL slices
    (fv[i] − cvv[i], element-order-identical to Spark's
    zip_with-then-slice), and an ADC whose query side residualizes
    against each probed centroid — the same CASE-sum distance as the
    Spark plan, list-local.

    ``refine=(R, k)`` swaps the tail for the two-stage refine
    composition: the ADC ranking shortlists R per query, exact cosine
    over the raw vectors (norms CTE) re-ranks, output cut to k —
    mirroring similarity.ivf_pq_refine_topk."""
    m, ksub, iters, dim = _PQ_M, _PQ_KSUB, _PQ_ITERS, _PQ_DIM
    dsub = dim // m
    coarse = _lloyd_refine_ctes(16, _IVF_REFINE_ITERS, _KMEANS_EXACT_DIM)

    def idx_list(lo: int) -> str:
        return "[" + ", ".join(str(i) for i in range(lo, lo + dsub)) + "]"

    subs = ",\n".join(
        _pq_sub_ctes(
            j, j * dsub + 1, dsub, ksub, iters, pref="r",
            src=(
                f"(SELECT vec_id, list_transform({idx_list(j * dsub + 1)}, "
                f"i -> fv[i] - cvv[i]) AS v FROM rsrc)"
            ),
        )
        for j in range(m)
    )
    qids = ", ".join(str(i) for i in _QUERY_IDS)
    enc_joins = "\n  ".join(
        f"JOIN r{j}e e{j} ON e{j}.vec_id = e0.vec_id" for j in range(1, m)
    )
    enc_cols = ", ".join(f"e{j}.code AS code{j}" for j in range(m))
    qr_cols = ",\n         ".join(
        f"list_transform({idx_list(j * dsub + 1)}, "
        f"i -> n.v[i] - c.cv[i]) AS qs{j}"
        for j in range(m)
    )
    qq_cols = ", ".join(
        f"qs{j}, list_dot_product(qs{j}, qs{j}) AS qn{j}" for j in range(m)
    )
    book_joins = "\n  ".join(
        f"JOIN r{j}c{iters} b{j} ON b{j}.cid = e.code{j}" for j in range(m)
    )
    adc = " + ".join(
        f"(qq.qn{j} - 2.0 * list_dot_product(qq.qs{j}, b{j}.cv) + b{j}.cn2)"
        for j in range(m)
    )
    if refine is None:
        tail = """
SELECT query_id, neighbor_id, rank, round(adc, 6) AS adc_dist
FROM ranked WHERE rank <= 10"""
    else:
        rr, kk = refine
        tail = f""",
rescored AS (
  SELECT r.query_id, r.neighbor_id,
         list_dot_product(qn.v, nn.v) / (qn.nrm * nn.nrm) AS cosine
  FROM ranked r
  JOIN norms nn ON nn.vec_id = r.neighbor_id
  JOIN norms qn ON qn.vec_id = r.query_id
  WHERE r.rank <= {rr}
),
refined AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM rescored
)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine
FROM refined WHERE rank <= {kk}"""
    return f"""
WITH {coarse},
norms AS (
  SELECT vec_id, v, sqrt(norm2) AS nrm FROM norms2
),
cents AS (
  SELECT cid AS cent_id, cv, sqrt(cn2) AS cn FROM c{_IVF_REFINE_ITERS}
),
assign AS (
  SELECT vec_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, c.cv) / (c.cn * n.nrm) DESC,
                      c.cent_id ASC) AS rn
    FROM norms n CROSS JOIN cents c
  ) WHERE rn = 1
),
rsrc AS (
  SELECT n.vec_id, n.v AS fv, c.cv AS cvv
  FROM norms n JOIN assign a USING (vec_id)
  JOIN cents c USING (cent_id)
),
{subs},
qprobe AS (
  SELECT query_id, cent_id FROM (
    SELECT n.vec_id AS query_id, c.cent_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, c.cv) / (c.cn * n.nrm) DESC,
                      c.cent_id ASC) AS rn
    FROM norms n CROSS JOIN cents c
    WHERE n.vec_id IN ({qids})
  ) WHERE rn <= 4
),
enc AS (
  SELECT e0.vec_id, {enc_cols}
  FROM r0e e0
  {enc_joins}
),
qr AS (
  SELECT p.query_id, p.cent_id,
         {qr_cols}
  FROM qprobe p
  JOIN norms n ON n.vec_id = p.query_id
  JOIN cents c ON c.cent_id = p.cent_id
),
qq AS (
  SELECT query_id, cent_id, {qq_cols} FROM qr
),
cands AS (
  SELECT p.query_id, p.cent_id, a.vec_id AS neighbor_id
  FROM qprobe p JOIN assign a USING (cent_id)
  WHERE a.vec_id != p.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         {adc} AS adc
  FROM cands c
  JOIN enc e ON e.vec_id = c.neighbor_id
  JOIN qq ON qq.query_id = c.query_id AND qq.cent_id = c.cent_id
  {book_joins}
),
ranked AS (
  SELECT query_id, neighbor_id, adc,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
){tail}
"""


_REFINE_R = 50


def _q_ivf_pq_refine_topk(spark, sf_dir):
    """Two-stage serving (IndexRefineFlat shape): residual-IVF-PQ ADC
    shortlists R=50 per query, exact cosine over the raw vectors
    re-ranks to 10. Same artifact reuse as the residual gate."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _get_ivf_quantizer(spark, sf_dir, emb)
    books = _get_res_pq_codebooks(spark, sf_dir, emb, cents)
    return similarity.ivf_pq_refine_topk(
        emb, _QUERY_IDS, k=10, rerank=_REFINE_R, residual=True,
        n_centroids=16, n_probe=4, refine_iters=_IVF_REFINE_ITERS,
        m=_PQ_M, ksub=_PQ_KSUB, iters=_PQ_ITERS, dim=_PQ_DIM,
        centroids=cents, codebooks=books,
        encoded=_get_ivf_pq_res_codes(spark, sf_dir, emb, cents, books),
    )


def _q_multimodal_features(spark, sf_dir):
    """Registry projection of the media feature pipeline: the array
    column is element-projected (f0..f7) so the result is
    scalar-sortable by the driver's canonicalizer; the array-returning
    operator (multimodal.extract_features) stays for API use. The
    fixture decode is deterministic (md5 bytes / 255), so the whole
    mapInPandas path gains an exact DuckDB oracle."""
    from pyspark.sql import functions as F

    media = multimodal.synth_media(_docs(spark, sf_dir))
    feats = multimodal.extract_features(media, decode_stub=True)
    return feats.select(
        "media_id",
        "n_bytes",
        *[F.round(F.col("feature")[i], 6).alias(f"f{i}") for i in range(8)],
    )


def _multimodal_sql() -> str:
    """DuckDB twin of the stubbed decode: md5-hex pairs → byte values
    → /255.0 (IEEE double division agrees bit-for-bit both sides)."""

    def hexval(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(hx, {pos}, 1)) - 1)"

    cols = ", ".join(
        f"round(({hexval(2 * i + 1)} * 16 + {hexval(2 * i + 2)}) / 255.0, 6) AS f{i}"
        for i in range(8)
    )
    return f"""
WITH h AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents)
SELECT media_id, CAST(octet_length(unhex(hx)) AS BIGINT) AS n_bytes, {cols}
FROM h
"""


# Near-dup banding: 48 planes in 6 bands of 8 bits (256 buckets per
# band). The band width is the anti-quadratic lever: with B buckets a
# RANDOM corpus of N vectors yields ~bands·N²/(2B) candidates, so
# 4-bit bands (16 buckets) degenerate to all-pairs (measured: 2 000
# vectors → 2.07 M candidates, N²-complete) while 8-bit bands cut it
# ~40× and keep production-threshold recall high (cosine ≥0.95 ⇒
# per-bit match p≈0.90 ⇒ band match p⁸≈0.43 ⇒ 1-(1-p⁸)⁶ ≈ 97%).
# The ANN top-k path (lsh_topk) intentionally keeps looser 4-bit
# bands — top-k on far neighbors trades candidate volume for recall.
_ND_PLANES = 48
_ND_BAND_BITS = 8


def _q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs via the LSH bucket join: vectors
    sharing a signature band, verified at a cosine threshold — the
    embedding-space analogue of MinHash near-dup dedup. The synthetic
    vectors are random (true near-dups don't exist), so the gate
    threshold sits at the top of the random-cosine distribution (0.4)
    to keep the verify path exercised with real output; production
    near-dup dedup runs the same plan at ≥0.95.

    Serving mode shares the verified pair frame with
    semantic_dedup_reps (which consumes exactly these pairs): like the
    dedup cluster map, the near-dup pair set is an index-like artifact
    of a corpus snapshot, built once per snapshot."""
    from .dam import _shared

    return _shared(
        "emb_near_dups", spark, sf_dir,
        lambda: _build_embedding_near_dups(spark, sf_dir),
    )


def _build_embedding_near_dups(spark, sf_dir):
    # Delegates to the engine operator at the FIXED 8-bit banding the
    # static DuckDB oracle encodes (band b = planes 8b..8b+7, the same
    # chunk values as the packed-signature form this replaced).  The
    # production path is the operator's band_bits=None auto sizing —
    # fixed 8-bit bands degenerate quadratically with corpus growth
    # (sf10-measured: could not count candidates over 200 K vectors in
    # 10 min; auto 15-bit bands finish — BASELINE.md round-11).
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_near_dup_pairs(
        emb,
        threshold=0.4,
        bands=_ND_PLANES // _ND_BAND_BITS,
        band_bits=_ND_BAND_BITS,
    )


_EMB_NEAR_DUP_SQL_THRESHOLD = 0.4

_EMB_NEAR_DUPS_SQL = f"""
WITH {_emb_sig_ctes(_ND_PLANES, 64, _ND_BAND_BITS)},
cands AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.chunk = b.chunk AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       round(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 6) AS cosine
FROM cands
JOIN norms na ON na.vec_id = vec_a
JOIN norms nb ON nb.vec_id = vec_b
WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm)
        >= {_EMB_NEAR_DUP_SQL_THRESHOLD}
"""


_SKETCH_QUANTILES = [0.5, 0.9, 0.99]


def _q_quality_quantile_sketch(spark, sf_dir):
    """percentile_approx sketch over doc lengths — the 100 TB path for
    quantiles (mergeable GK sketch, single pass); exact interpolated
    twin is value_percentiles. The quantile array is posexploded to
    (lang, quantile, value) rows so the driver canonicalizer can sort
    the frame. Oracle-exact at gate scale: with accuracy 10000 ≫ n the
    GK buffer never compresses and the query returns the exact
    ceil(q·n)-rank element — precisely DuckDB's quantile_disc; at true
    100 TB the same plan degrades gracefully to ±1/accuracy rank error."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    agg = docs.groupBy("lang").agg(
        F.percentile_approx("n_chars", _SKETCH_QUANTILES, 10000).alias("qv"),
        F.count("*").alias("cnt"),
    )
    qlit = F.array(*[F.lit(float(q)) for q in _SKETCH_QUANTILES])
    return agg.select(
        "lang", "cnt", F.posexplode("qv").alias("pos", "n_chars_q")
    ).select(
        "lang", "cnt", qlit[F.col("pos")].alias("quantile"), "n_chars_q"
    )


_QUANTILE_SKETCH_SQL = "\nUNION ALL\n".join(
    f"""SELECT lang, count(*) AS cnt, CAST({q} AS DOUBLE) AS quantile,
       quantile_disc(n_chars, {q}) AS n_chars_q
FROM documents GROUP BY lang"""
    for q in _SKETCH_QUANTILES
)


def _q_hll_distinct_sketch(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) per group — the mergeable
    100 TB path for distinct counts; exact twin is distinct_counts.
    Rows-only by design: HLL estimates are implementation-defined (and
    measurably off-by-one even at 20 distinct sources)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    return docs.groupBy("lang").agg(
        F.approx_count_distinct("source").alias("approx_sources"),
        F.count("*").alias("cnt"),
    )


def _q_hll_md5(spark, sf_dir):
    """Hand-rolled md5-family HLL per lang over doc_id values — the
    oracle-checkable twin of hll_distinct_sketch: registers, the exact
    scaled harmonic sum (bigint), and the bias-corrected estimate all
    reproduce bit-identically in DuckDB."""
    return sketches.hll_md5_distinct(
        _docs(spark, sf_dir), ["lang"], "doc_id"
    )


_HLL_MD5_SQL = r"""
WITH hx AS (
  SELECT lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
),
parts AS (
  SELECT lang,
         (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
         substr(h, 3, 8) AS tail
  FROM hx
),
leads AS (
  SELECT lang, bucket,
         len(regexp_extract(tail, '^0*')) AS lead,
         strpos('0123456789abcdef',
                substr(tail, len(regexp_extract(tail, '^0*')) + 1, 1)) - 1 AS v
  FROM parts
),
rhos AS (
  SELECT lang, bucket,
         CASE WHEN lead >= 8 THEN 33
              ELSE lead * 4
                   + (CASE WHEN v >= 8 THEN 0 WHEN v >= 4 THEN 1
                           WHEN v >= 2 THEN 2 ELSE 3 END) + 1
         END AS rho
  FROM leads
),
regs AS (SELECT lang, bucket, max(rho) AS r FROM rhos GROUP BY 1, 2),
agg AS (
  SELECT lang,
         (sum(1::BIGINT << (33 - r))
            + (256 - count(*)) * (1::BIGINT << 33))::BIGINT AS harmonic_scaled,
         (256 - count(*))::INTEGER AS zero_registers
  FROM regs GROUP BY 1
),
rawed AS (
  SELECT lang, zero_registers, harmonic_scaled,
         (0.7213 / (1 + 1.079 / 256)) * 256 * 256 * (1::BIGINT << 33)
           / harmonic_scaled AS raw
  FROM agg
)
SELECT lang,
       round(CASE WHEN raw <= 640.0 AND zero_registers > 0
                  THEN 256.0 * ln(256.0 / zero_registers)
                  ELSE raw END, 2) AS est_distinct,
       zero_registers, harmonic_scaled
FROM rawed
"""


def _q_heavy_hitters(spark, sf_dir):
    return textops.heavy_hitters(_docs(spark, sf_dir), k=10)


_HEAVY_HITTERS_SQL = r"""
WITH toks AS (
  SELECT lang, t.token
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(token)
  WHERE t.token != ''
),
counts AS (SELECT lang, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
ranked AS (
  SELECT lang, token, cnt,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY cnt DESC, token ASC) AS INTEGER) AS rank
  FROM counts
)
SELECT lang, token, cnt, rank FROM ranked WHERE rank <= 10
"""


def _q_tfidf_top_terms(spark, sf_dir):
    return textops.tfidf_top_terms(_docs(spark, sf_dir), k=3)


_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(token)
  WHERE t.token != ''
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dfc AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         round(tf.tf * ln(n.n_docs * 1.0 / dfc.df), 4) AS tfidf
  FROM tf JOIN dfc USING (token) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tf, tfidf,
         CAST(row_number() OVER (
           PARTITION BY doc_id
           ORDER BY tfidf DESC, token ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, token, tf, tfidf, rank FROM ranked WHERE rank <= 3
"""


def _q_pii_scrub(spark, sf_dir):
    """The corpus carries no natural PII, so both engines inject the
    SAME deterministic addresses/IPs/phones per doc, then the scrub
    chain (count → redact, staged) must agree bit-for-bit incl. the
    md5 of the scrubbed text."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10.0."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(".7 call 555-867-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("text"),
    )
    scrubbed = textops.pii_scrub(docs)
    return scrubbed.select(
        "doc_id", "n_emails", "n_ipv4s", "n_phones",
        F.md5("scrubbed").alias("scrubbed_md5"),
    )


_PII_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com from 10.0.'
              || CAST(doc_id % 250 AS VARCHAR)
              || '.7 call 555-867-'
              || CAST(1000 + doc_id % 9000 AS VARCHAR) AS t
  FROM documents
),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
         regexp_replace(t, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS t
  FROM injected
),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4s,
         regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g') AS t
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_ipv4s,
         len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
         regexp_replace(t, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS t
  FROM s2
)
SELECT doc_id, n_emails, n_ipv4s, n_phones, md5(t) AS scrubbed_md5 FROM s3
"""


def _q_media_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing end-to-end WITH an oracle: the synth
    payload is md5(text) bytes, so frame i is a slice of the md5 hex —
    DuckDB reproduces every emitted frame byte-for-byte through the
    whole mapInPandas path."""
    from pyspark.sql import functions as F

    media = multimodal.synth_media(_docs(spark, sf_dir))
    frames = multimodal.sample_frames(media, n_frames=4, frame_bytes=4)
    return frames.select(
        "media_id", "frame_idx",
        F.lower(F.hex("frame")).alias("frame_hex"), "n_bytes",
    )


_FRAME_SAMPLE_SQL = r"""
SELECT doc_id AS media_id, CAST(u.i AS INTEGER) AS frame_idx,
       substr(md5(text), u.i * 8 + 1, 8) AS frame_hex,
       CAST(4 AS BIGINT) AS n_bytes
FROM documents, unnest(generate_series(0, 3)) AS u(i)
"""


def _q_media_resize(spark, sf_dir):
    """Resize plumbing end-to-end WITH an oracle: the stub cycles the
    16-byte md5 payload to width·height bytes, which DuckDB states as
    substr(repeat(md5_hex, k)). 6×3 = 18 bytes > 16 forces the cycle
    path."""
    from pyspark.sql import functions as F

    media = multimodal.synth_media(_docs(spark, sf_dir))
    resized = multimodal.resize_media(media, width=6, height=3)
    return resized.select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.lower(F.hex("payload")).alias("payload_hex"),
    )


_RESIZE_SQL = r"""
SELECT doc_id AS media_id, 6 AS width, 3 AS height,
       CAST(18 AS BIGINT) AS n_bytes,
       substr(repeat(md5(text), 2), 1, 36) AS payload_hex
FROM documents
"""


def _q_media_decode_features(spark, sf_dir):
    """REAL image decode end-to-end: synth_png_media encodes an 8×8
    RGB PNG per doc (pixels = md5(text) digest tiled, Paeth-filtered),
    decode_image_features inflates + unfilters it back and reduces to
    per-channel sums/means/min/max. The oracle derives the same stats
    arithmetically from the md5 hex pairs — a hash match proves the
    decoded bytes are exactly the encoded pixels (no stub anywhere)."""
    media = multimodal.synth_png_media(_docs(spark, sf_dir))
    return multimodal.decode_image_features(media)


# pixel byte j of the 8x8 RGB fixture is digest byte (j % 16): hex
# pair (j%16) of md5(text); channel = j % 3.  Sums are exact ints and
# means divide by the power-of-two 64, so no rounding is needed.
_MEDIA_DECODE_SQL = r"""
WITH bytes AS (
  SELECT d.doc_id, t.j,
         (strpos('0123456789abcdef',
                 substr(md5(coalesce(d.text, '')), ((t.j % 16) * 2) + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substr(md5(coalesce(d.text, '')), ((t.j % 16) * 2) + 2, 1)) - 1)
         AS b
  FROM documents d, generate_series(0, 191) t(j)
)
SELECT doc_id AS media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(sum(CASE WHEN j % 3 = 0 THEN b END) AS BIGINT) AS r_sum,
       CAST(sum(CASE WHEN j % 3 = 1 THEN b END) AS BIGINT) AS g_sum,
       CAST(sum(CASE WHEN j % 3 = 2 THEN b END) AS BIGINT) AS b_sum,
       CAST(sum(CASE WHEN j % 3 = 0 THEN b END) AS DOUBLE)
         / count(CASE WHEN j % 3 = 0 THEN b END) AS r_mean,
       CAST(sum(CASE WHEN j % 3 = 1 THEN b END) AS DOUBLE)
         / count(CASE WHEN j % 3 = 1 THEN b END) AS g_mean,
       CAST(sum(CASE WHEN j % 3 = 2 THEN b END) AS DOUBLE)
         / count(CASE WHEN j % 3 = 2 THEN b END) AS b_mean,
       CAST(min(CASE WHEN j % 3 = 0 THEN b END) AS INTEGER) AS r_min,
       CAST(max(CASE WHEN j % 3 = 0 THEN b END) AS INTEGER) AS r_max,
       CAST(min(CASE WHEN j % 3 = 1 THEN b END) AS INTEGER) AS g_min,
       CAST(max(CASE WHEN j % 3 = 1 THEN b END) AS INTEGER) AS g_max,
       CAST(min(CASE WHEN j % 3 = 2 THEN b END) AS INTEGER) AS b_min,
       CAST(max(CASE WHEN j % 3 = 2 THEN b END) AS INTEGER) AS b_max
FROM bytes
GROUP BY doc_id
"""


def _q_jpeg_decode_features(spark, sf_dir):
    """REAL JPEG decode end-to-end: synth_jpeg_media encodes a 32×32
    greyscale baseline JPEG per doc (sixteen 8×8 blocks, each flat at
    one md5(text) digest byte, quality 100, restart interval 2),
    decode_image_features Huffman-decodes, dequantizes and IDCTs it
    back and reduces to channel statistics.  Flat blocks at quality
    100 round-trip exactly (DC 8·(c−128) at quant step 1), so the
    oracle derives the same stats arithmetically from the md5 hex
    pairs — a hash match proves the entropy decode → dequantize →
    IDCT → restart-resync path is exact, not approximately right."""
    media = multimodal.synth_jpeg_media(_docs(spark, sf_dir))
    return multimodal.decode_image_features(media)


# block j of the 4×4 block grid is digest byte j: hex pair j of
# md5(text), each covering 64 pixels of the 32×32 greyscale image —
# so sums scale by 64 and the mean divides by the power-of-two 16.
# Greyscale decodes to channels=1: g/b stats are NULL by schema.
_JPEG_DECODE_SQL = r"""
WITH bytes AS (
  SELECT d.doc_id, t.j,
         (strpos('0123456789abcdef',
                 substr(md5(coalesce(d.text, '')), (t.j * 2) + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substr(md5(coalesce(d.text, '')), (t.j * 2) + 2, 1)) - 1)
         AS b
  FROM documents d, generate_series(0, 15) t(j)
)
SELECT doc_id AS media_id,
       CAST(32 AS INTEGER) AS width,
       CAST(32 AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS channels,
       CAST(64 * sum(b) AS BIGINT) AS r_sum,
       CAST(NULL AS BIGINT) AS g_sum,
       CAST(NULL AS BIGINT) AS b_sum,
       CAST(sum(b) AS DOUBLE) / 16 AS r_mean,
       CAST(NULL AS DOUBLE) AS g_mean,
       CAST(NULL AS DOUBLE) AS b_mean,
       CAST(min(b) AS INTEGER) AS r_min,
       CAST(max(b) AS INTEGER) AS r_max,
       CAST(NULL AS INTEGER) AS g_min,
       CAST(NULL AS INTEGER) AS g_max,
       CAST(NULL AS INTEGER) AS b_min,
       CAST(NULL AS INTEGER) AS b_max
FROM bytes
GROUP BY doc_id
"""


def _q_png_interlaced_decode_features(spark, sf_dir):
    """REAL Adam7-interlaced PNG decode end-to-end (round-13 media
    seam decision): the 8×8 digest-pixel fixture re-encoded in the
    7-pass interlaced layout (every pass non-empty at 8×8, each
    independently Paeth-filtered with its own zero prior) and decoded
    through the de-interlacing scatter path.  Pixels are identical to
    the sequential fixture, so the SAME arithmetic oracle pins the
    pass-split, per-pass unfiltering and grid reassembly byte-exactly
    (imagecodec._deinterlace_adam7)."""
    media = multimodal.synth_png_media(
        _docs(spark, sf_dir), interlace=True
    )
    return multimodal.decode_image_features(media)


def _q_jpeg_progressive_decode_features(spark, sf_dir):
    """REAL progressive-JPEG (SOF2) decode end-to-end: the greyscale
    flat-block fixture re-encoded with the multi-scan progressive
    script (spectral selection, DC/AC successive approximation, EOB
    runs, per-scan restarts).  Coefficients are identical to the
    baseline encode, so the flat-block quality-100 lossless identity
    holds and the SAME arithmetic oracle pins the multi-scan entropy
    decode byte-exactly — the driver checks the G.2 path, not just
    pytest."""
    media = multimodal.synth_jpeg_progressive_media(_docs(spark, sf_dir))
    return multimodal.decode_image_features(media)


def _q_jpeg_color_decode_features(spark, sf_dir):
    """REAL color-JPEG decode end-to-end at the dominant real-world
    shape (3-component baseline, 4:2:0 subsampling, interleaved
    4-luma+2-chroma MCUs, restart markers): synth_jpeg_color_media
    encodes a 32×32 RGB JPEG per doc with GREY-valued flat blocks —
    grey keeps the chroma planes flat at 128 (all chroma
    coefficients quantize to exactly 0) while the luma path is the
    proven-lossless flat-block one, so the whole color pipeline
    round-trips exactly at quality 100 and the oracle derives the
    r/g/b statistics (all equal, channels=3) arithmetically from the
    md5 hex pairs.  A hash match proves interleaved-MCU entropy
    decode → chroma dequantize/IDCT → upsample → YCbCr→RGB is exact
    for this fixture, not approximately right."""
    media = multimodal.synth_jpeg_color_media(_docs(spark, sf_dir))
    return multimodal.decode_image_features(media)


# same digest tiling as the greyscale JPEG oracle (luma block j =
# digest byte j, 64 px each), but decoded as RGB: grey pixels make
# all three channel statistics equal the luma statistics.
_JPEG_COLOR_DECODE_SQL = r"""
WITH bytes AS (
  SELECT d.doc_id, t.j,
         (strpos('0123456789abcdef',
                 substr(md5(coalesce(d.text, '')), (t.j * 2) + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substr(md5(coalesce(d.text, '')), (t.j * 2) + 2, 1)) - 1)
         AS b
  FROM documents d, generate_series(0, 15) t(j)
)
SELECT doc_id AS media_id,
       CAST(32 AS INTEGER) AS width,
       CAST(32 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(64 * sum(b) AS BIGINT) AS r_sum,
       CAST(64 * sum(b) AS BIGINT) AS g_sum,
       CAST(64 * sum(b) AS BIGINT) AS b_sum,
       CAST(sum(b) AS DOUBLE) / 16 AS r_mean,
       CAST(sum(b) AS DOUBLE) / 16 AS g_mean,
       CAST(sum(b) AS DOUBLE) / 16 AS b_mean,
       CAST(min(b) AS INTEGER) AS r_min,
       CAST(max(b) AS INTEGER) AS r_max,
       CAST(min(b) AS INTEGER) AS g_min,
       CAST(max(b) AS INTEGER) AS g_max,
       CAST(min(b) AS INTEGER) AS b_min,
       CAST(max(b) AS INTEGER) AS b_max
FROM bytes
GROUP BY doc_id
"""


def _q_adpcm_decode_features(spark, sf_dir):
    """REAL compressed-audio decode end-to-end (IMA ADPCM, WAV format
    tag 0x0011 — operators/adpcm.py): the fixture's single mono block
    seeds predictor 0 / index 0 and carries md5(text)'s 16 bytes as
    its 32 nibbles, so the DuckDB oracle must REPLAY the IMA
    step/index recurrence (recursive CTE over the nibble sequence,
    literal step/index tables) to reproduce the 33 decoded samples —
    a hash match pins the compressed-codec arithmetic itself,
    integer-exact, not just container parsing."""
    media = multimodal.synth_adpcm_media(_docs(spark, sf_dir))
    return multimodal.decode_audio_features(media)


def _adpcm_decode_sql() -> str:
    """The IMA recurrence as SQL: nibble j of the md5 digest (low
    nibble first within each byte) updates (pred, idx) exactly as
    adpcm.decode_nibble — bit tests via integer div/mod, the same
    floor semantics as the Python >> on non-negative steps."""
    steps = ", ".join(
        f"({i}, {s})" for i, s in enumerate(adpcm.STEP_TABLE)
    )
    itab = ", ".join(
        f"({n}, {d})" for n, d in enumerate(adpcm.INDEX_TABLE)
    )
    return f"""
WITH RECURSIVE steps(i, s) AS (
  SELECT * FROM (VALUES {steps}) v(i, s)
),
itab(n, d) AS (
  SELECT * FROM (VALUES {itab}) v(n, d)
),
nibs AS (
  SELECT d.doc_id, t.j,
         CASE WHEN (t.j - 1) % 2 = 0
              THEN strpos('0123456789abcdef',
                          substr(md5(coalesce(d.text, '')),
                                 ((t.j - 1) // 2) * 2 + 2, 1)) - 1
              ELSE strpos('0123456789abcdef',
                          substr(md5(coalesce(d.text, '')),
                                 ((t.j - 1) // 2) * 2 + 1, 1)) - 1
         END AS nib
  FROM documents d, generate_series(1, 32) t(j)
),
dec AS (
  SELECT doc_id, 0 AS j, 0 AS pred, 0 AS idx FROM documents
  UNION ALL
  SELECT nb.doc_id, nb.j,
         CAST(GREATEST(-32768, LEAST(32767,
           d.pred + (CASE WHEN nb.nib >= 8 THEN -1 ELSE 1 END) *
             (st.s // 8
              + CASE WHEN nb.nib % 2 = 1 THEN st.s // 4 ELSE 0 END
              + CASE WHEN (nb.nib // 2) % 2 = 1 THEN st.s // 2
                     ELSE 0 END
              + CASE WHEN (nb.nib // 4) % 2 = 1 THEN st.s
                     ELSE 0 END))) AS INTEGER),
         CAST(GREATEST(0, LEAST(88, d.idx + it.d)) AS INTEGER)
  FROM dec d
  JOIN nibs nb ON nb.doc_id = d.doc_id AND nb.j = d.j + 1
  JOIN steps st ON st.i = d.idx
  JOIN itab it ON it.n = nb.nib
)
SELECT doc_id AS media_id,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(33 AS BIGINT) AS n_frames,
       CAST(min(pred) AS INTEGER) AS c0_min,
       CAST(max(pred) AS INTEGER) AS c0_max,
       CAST(sum(pred) AS BIGINT) AS c0_sum,
       CAST(sum(CAST(pred AS BIGINT) * pred) AS BIGINT) AS c0_sumsq,
       CAST(NULL AS INTEGER) AS c1_min,
       CAST(NULL AS INTEGER) AS c1_max,
       CAST(NULL AS BIGINT) AS c1_sum,
       CAST(NULL AS BIGINT) AS c1_sumsq
FROM dec
GROUP BY doc_id
"""


def _q_audio_decode_features(spark, sf_dir):
    """REAL audio decode end-to-end: synth_wav_media writes a 16-bit
    stereo PCM WAV per doc (stdlib wave writer; samples = md5(text)
    digest tiled, little-endian int16), decode_audio_features parses
    it back (stdlib wave reader) and reduces to per-channel
    min/max/sum/sum-of-squares in exact integer math.  The oracle
    derives the same stats arithmetically from the md5 hex pairs — a
    hash match proves the WAV container round-trips byte-exactly."""
    media = multimodal.synth_wav_media(_docs(spark, sf_dir))
    return multimodal.decode_audio_features(media)


# The stereo PCM stream is md5(text)'s 16 bytes = 8 little-endian
# int16 samples (lane j: lo byte 2j, hi byte 2j+1), tiled 8× to 32
# frames × 2 channels; channel = j % 2, so per-channel stats are the
# lane stats with multiplicity 8 (sums ×8, min/max unchanged).
_AUDIO_DECODE_SQL = r"""
WITH samples AS (
  SELECT d.doc_id, t.j,
         (strpos('0123456789abcdef',
                 substr(md5(coalesce(d.text, '')), (t.j * 4) + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substr(md5(coalesce(d.text, '')), (t.j * 4) + 2, 1)) - 1)
         + 256 * (
             (strpos('0123456789abcdef',
                     substr(md5(coalesce(d.text, '')), (t.j * 4) + 3, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                       substr(md5(coalesce(d.text, '')), (t.j * 4) + 4, 1)) - 1)
         ) AS v_raw
  FROM documents d, generate_series(0, 7) t(j)
),
pcm AS (
  SELECT doc_id, j,
         CASE WHEN v_raw >= 32768 THEN v_raw - 65536 ELSE v_raw END AS v
  FROM samples
)
SELECT doc_id AS media_id,
       CAST(2 AS INTEGER) AS n_channels,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(32 AS BIGINT) AS n_frames,
       CAST(min(CASE WHEN j % 2 = 0 THEN v END) AS INTEGER) AS c0_min,
       CAST(max(CASE WHEN j % 2 = 0 THEN v END) AS INTEGER) AS c0_max,
       CAST(8 * sum(CASE WHEN j % 2 = 0 THEN v END) AS BIGINT) AS c0_sum,
       CAST(8 * sum(CASE WHEN j % 2 = 0 THEN v * v END) AS BIGINT) AS c0_sumsq,
       CAST(min(CASE WHEN j % 2 = 1 THEN v END) AS INTEGER) AS c1_min,
       CAST(max(CASE WHEN j % 2 = 1 THEN v END) AS INTEGER) AS c1_max,
       CAST(8 * sum(CASE WHEN j % 2 = 1 THEN v END) AS BIGINT) AS c1_sum,
       CAST(8 * sum(CASE WHEN j % 2 = 1 THEN v * v END) AS BIGINT) AS c1_sumsq
FROM pcm
GROUP BY doc_id
"""


def _q_video_frame_features(spark, sf_dir):
    """REAL video decode end-to-end: synth_y4m_media writes a
    YUV4MPEG2 stream per doc (videocodec.encode_y4m, 8 mono 6×4
    frames; pixels = md5(text) digest tiled), sample_frames with
    decode_stub=False parses the container back (videocodec.decode_y4m)
    and uniformly samples 4 source frames (indices 0,2,4,6 by the
    floor(k·total/n) rule), frame_pixel_stats reduces each sampled
    plane to exact-integer statistics.  The oracle derives the same
    per-frame stats arithmetically from the md5 hex — a hash match
    proves the Y4M container round-trips byte-exactly AND the sampling
    rule is the declared one."""
    media = multimodal.synth_y4m_media(_docs(spark, sf_dir))
    frames = multimodal.sample_frames(media, n_frames=4, decode_stub=False)
    return multimodal.frame_pixel_stats(frames)


# The mono pixel stream is md5(text)'s 16 bytes tiled to 8 frames ×
# 24 bytes (6×4 plane): byte j of the stream is digest[j % 16]; frame
# f covers j ∈ [24f, 24f+24); sampled source frames = floor(k·8/4) =
# {0, 2, 4, 6}.
_VIDEO_FRAME_SQL = r"""
WITH bytes AS (
  SELECT d.doc_id, t.j // 24 AS f,
         (strpos('0123456789abcdef',
                 substr(md5(coalesce(d.text, '')),
                        ((t.j % 16) * 2) + 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substr(md5(coalesce(d.text, '')),
                          ((t.j % 16) * 2) + 2, 1)) - 1) AS b
  FROM documents d, generate_series(0, 191) t(j)
)
SELECT doc_id AS media_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(24 AS BIGINT) AS n_bytes,
       CAST(min(b) AS INTEGER) AS p_min,
       CAST(max(b) AS INTEGER) AS p_max,
       CAST(sum(b) AS BIGINT) AS p_sum,
       CAST(sum(b * b) AS BIGINT) AS p_sumsq
FROM bytes
WHERE f % 2 = 0
GROUP BY doc_id, f
"""


_GEO_COUNTRIES = (
    "US", "DE", "IN", "BR", "JP", "GB", "FR", "AU",
    "CA", "NL", "SG", "KR",
)


def _q_geo_external_top_countries(spark, sf_dir):
    """The external-enrichment pattern end-to-end WITH an oracle:
    a deterministic synthetic ip per event, resolved through
    geo_enrich_external's mapInPandas + per-partition cache (default
    md5 fake resolver), rolled up to country counts.  DuckDB derives
    the same countries arithmetically from the md5 hex, so the hash
    gate pins the whole Python enrichment path."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "event_id",
        F.concat(
            F.lit("10.0."),
            (F.col("user_id") % 20).cast("string"),
            F.lit("."),
            (F.col("event_id") % 250).cast("string"),
        ).alias("ip_address"),
    )
    return (
        geo.geo_enrich_external(act)
        .groupBy("country")
        .agg(F.count("*").alias("cnt"))
    )


def _geo_external_sql() -> str:
    country_list = ", ".join(f"'{c}'" for c in _GEO_COUNTRIES)
    return f"""
WITH act AS (
  SELECT event_id,
         '10.0.' || CAST(user_id % 20 AS VARCHAR) || '.'
                 || CAST(event_id % 250 AS VARCHAR) AS ip
  FROM events
),
resolved AS (
  SELECT ([{country_list}])[
           ((strpos('0123456789abcdef', substr(md5(ip), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(ip), 2, 1)) - 1))
           % {len(_GEO_COUNTRIES)} + 1] AS country
  FROM act
)
SELECT country, count(*) AS cnt FROM resolved GROUP BY country
"""


def _q_bigram_logprob(spark, sf_dir):
    return textops.bigram_logprob_scores(_docs(spark, sf_dir))


_BIGRAM_LM_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS toks
  FROM documents
),
uni AS (
  SELECT u.token, count(*) AS c1
  FROM base, unnest(toks) AS u(token) GROUP BY 1
),
v AS (SELECT count(*) AS vocab FROM uni),
bi AS (
  SELECT doc_id, u.bg
  FROM (
    SELECT doc_id,
           CASE WHEN len(toks) >= 2
                THEN list_transform(generate_series(2, len(toks)),
                                    i -> toks[i-1] || ' ' || toks[i])
                ELSE [] END AS bgs
    FROM base
  ), unnest(bgs) AS u(bg)
),
bid AS (SELECT doc_id, bg, count(*) AS n FROM bi GROUP BY 1, 2),
bic AS (SELECT bg, CAST(sum(n) AS BIGINT) AS cbg FROM bid GROUP BY 1)
SELECT b.doc_id, CAST(sum(b.n) AS BIGINT) AS n_bigrams,
       round(sum(b.n * ln((bic.cbg + 1.0) / (uni.c1 + v.vocab)))
             / sum(b.n), 4) AS avg_logp
FROM bid b JOIN bic ON b.bg = bic.bg
JOIN uni ON split_part(b.bg, ' ', 1) = uni.token
CROSS JOIN v
GROUP BY 1
"""


def _q_semantic_dedup_reps(spark, sf_dir):
    """Semantic (embedding-space) dedup end-to-end: LSH near-dup pairs
    → connected components → keep only each cluster's min-id
    representative — the full SemDeDup-style pass over the corpus,
    reported as kept-representative counts per label. Full oracle:
    the pair stage uses closed-form hyperplanes (no engine-specific
    hash) and the clustering pins to a recursive-CTE transitive
    closure, the same construction as dedup_clusters; the partition
    property (reps ∪ dropped = corpus, no surviving near-dup pair) is
    additionally unit-tested."""
    from pyspark.sql import functions as F

    pairs = _q_embedding_near_dups(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    # duplicate_clusters unions both edge directions of `pairs`; the
    # branches share their shuffle stages (exchange reuse), so a
    # checkpoint here only adds materialization cost — measured slower
    clusters = dedup.duplicate_clusters(pairs)
    dropped = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select(F.col("doc_id").alias("vec_id"))
    emb = load_table(spark, sf_dir, "embeddings")
    kept = emb.join(dropped, "vec_id", "left_anti")
    return kept.groupBy("label").agg(F.count("*").alias("n_kept"))


_SEMANTIC_DEDUP_SQL = f"""
WITH RECURSIVE {_emb_sig_ctes(_ND_PLANES, 64, _ND_BAND_BITS)},
cands AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.chunk = b.chunk AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT vec_a AS doc_a, vec_b AS doc_b
  FROM cands
  JOIN norms na ON na.vec_id = vec_a
  JOIN norms nb ON nb.vec_id = vec_b
  WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm)
          >= {_EMB_NEAR_DUP_SQL_THRESHOLD}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
clusters AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
),
dropped AS (SELECT doc_id FROM clusters WHERE doc_id != cluster_id)
SELECT e.label, count(*) AS n_kept
FROM embeddings e
LEFT JOIN dropped d ON e.vec_id = d.doc_id
WHERE d.doc_id IS NULL
GROUP BY e.label
"""


def _q_cms_heavy_hitters(spark, sf_dir):
    """Exact global top-20 tokens with their CMS point estimates side
    by side. Rows-only by design (xxhash64 buckets are engine-
    specific); the CMS guarantees est ≥ exact, pinned in
    test_extensions together with mergeability."""
    from pyspark.sql import functions as F

    tokens = _docs(spark, sf_dir).select(
        F.explode(textops._norm_tokens("text")).alias("token")
    )
    exact = (
        tokens.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )
    sketch = sketches.cms_build(tokens, depth=4, width=1024)
    est = sketches.cms_estimate(
        sketch, exact.select("token"), depth=4, width=1024
    )
    return exact.join(est, "token").select("token", "cnt", "est_cnt")


_CMS_MD5_DEPTH = 4
_CMS_MD5_WIDTH = 1024


def _q_cms_md5_heavy_hitters(spark, sf_dir):
    """cms_heavy_hitters with the md5 bucket family — identical plan
    (one-pass fixed-size sketch, broadcast estimate join), full DuckDB
    oracle pinning bucket derivation and the min-over-depth estimate;
    the xxhash64 production path stays rows-only by design."""
    from pyspark.sql import functions as F

    tokens = _docs(spark, sf_dir).select(
        F.explode(textops._norm_tokens("text")).alias("token")
    )
    exact = (
        tokens.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )
    sketch = sketches.cms_build(
        tokens, depth=_CMS_MD5_DEPTH, width=_CMS_MD5_WIDTH, hash_family="md5"
    )
    est = sketches.cms_estimate(
        sketch,
        exact.select("token"),
        depth=_CMS_MD5_DEPTH,
        width=_CMS_MD5_WIDTH,
        hash_family="md5",
    )
    return exact.join(est, "token").select("token", "cnt", "est_cnt")


def _cms_md5_sql() -> str:
    """ANSI twin of the md5-family CMS pipeline: bucket = first 3 md5
    hex chars (nibble arithmetic, 12 bits) mod width, counters per
    (d, bucket), estimate = min over depth counters."""
    d, w = _CMS_MD5_DEPTH, _CMS_MD5_WIDTH
    nib = "(strpos('0123456789abcdef', substr(md5('{i}|' || token), {p}, 1)) - 1)"

    def bucket(i: int) -> str:
        return (
            "(("
            + " + ".join(
                f"{nib.format(i=i, p=p)} * {16 ** (3 - p)}" for p in (1, 2, 3)
            )
            + f") % {w})"
        )

    counter_selects = "\n  UNION ALL\n  ".join(
        f"SELECT {i} AS d, {bucket(i)} AS bucket, count(*) AS cnt "
        "FROM toks GROUP BY 2"
        for i in range(d)
    )
    cand_selects = "\n  UNION ALL\n  ".join(
        f"SELECT token, cnt, {i} AS d, {bucket(i)} AS bucket FROM top"
        for i in range(d)
    )
    return rf"""
WITH toks AS (
  SELECT t.token FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(token)
  WHERE t.token != ''
),
counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
top AS (SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT 20),
counters AS (
  {counter_selects}
),
cand AS (
  {cand_selects}
)
SELECT c.token, c.cnt, min(coalesce(ctr.cnt, 0))::BIGINT AS est_cnt
FROM cand c
LEFT JOIN counters ctr ON ctr.d = c.d AND ctr.bucket = c.bucket
GROUP BY c.token, c.cnt
"""


def _q_kmeans_clusters(spark, sf_dir):
    """Three Lloyd rounds over the embedding corpus, reported as
    cluster sizes. Rows-only by design: centroid means are FP-
    summation-order dependent, so cross-engine hash parity is not
    defined; the numpy twin in test_extensions pins the semantics."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = similarity.kmeans_lloyd(emb, k=8, iters=3)
    return assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_points")
    )


_OOV_TOP_N = 25


def _q_oov_rate(spark, sf_dir):
    """Tokenizer-coverage QA with a genuine reference/apply split:
    the vocabulary is the top-25 tokens of the EVEN docs (the
    synthetic corpus has ~31 distinct words, so ~6 land out-of-vocab)
    and the ODD docs are scored against it — the bpe/NB held-out
    discipline applied to vocab coverage."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    vocab = textops.vocab_top_n(
        docs.filter(F.col("doc_id") % 2 == 0), top_n=_OOV_TOP_N
    )
    return textops.oov_stats(docs.filter(F.col("doc_id") % 2 == 1), vocab)


_OOV_SQL = f"""
WITH toks_all AS (
  SELECT doc_id, t.token
  FROM documents,
       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(token)
  WHERE t.token != ''
),
vcounts AS (
  SELECT token, count(*) AS cnt FROM toks_all WHERE doc_id % 2 = 0
  GROUP BY 1
),
vocab AS (
  SELECT token FROM (
    SELECT token,
           row_number() OVER (ORDER BY cnt DESC, token ASC) AS r
    FROM vcounts
  ) WHERE r <= {_OOV_TOP_N}
),
perdoc AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN token IN (SELECT token FROM vocab)
             THEN 0 ELSE 1 END)::BIGINT AS n_oov
  FROM toks_all WHERE doc_id % 2 = 1 GROUP BY 1
)
SELECT d.doc_id,
       coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(n_oov, 0)::BIGINT AS n_oov,
       round(n_oov * 1.0 / NULLIF(n_tokens, 0), 6) AS oov_rate
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN perdoc USING (doc_id)
"""


def _q_key_skew_report(spark, sf_dir):
    """Hot-key diagnostic over events.user_id: top-10 heaviest keys
    with their share of all rows — the measurement that decides when
    salting / AQE skew handling pays."""
    events = load_table(spark, sf_dir, "events")
    return profile.key_skew_report(events, ["user_id"], top_n=10)


_SKEW_SQL = """
WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
r AS (
  SELECT user_id, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC)
              AS INTEGER) AS rank
  FROM c
)
SELECT rank, user_id, cnt, round(cnt * 1.0 / total, 6) AS share
FROM r CROSS JOIN t WHERE rank <= 10
"""


_HIST_WIDTH = 25.0


def _q_value_histogram(spark, sf_dir):
    """Equi-width histogram of events.value per event_type: one
    deterministic floor-division bin per row, map-side-combined
    counts."""
    events = load_table(spark, sf_dir, "events")
    return profile.value_histogram(
        events, "value", bin_width=_HIST_WIDTH, group_cols=["event_type"]
    )


_HIST_SQL = f"""
SELECT event_type,
       CAST(floor(value / {_HIST_WIDTH}) AS BIGINT) AS bin,
       round(CAST(floor(value / {_HIST_WIDTH}) AS BIGINT)
             * CAST({_HIST_WIDTH} AS DOUBLE), 6) AS bin_start,
       count(*) AS cnt
FROM events
GROUP BY 1, 2, 3
"""


def _q_value_correlation(spark, sf_dir):
    """Pearson r of (value, hour-of-day) per event_type via the
    exact-integer-moments recipe: bigint sums of quantized values,
    ONE fixed double expression, round 6 — the hash-pinnable corr()
    (built-in corr's double sums are summation-order-dependent)."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    df = events.select(
        "event_type", "value", F.hour("ts").cast("double").alias("hr")
    )
    return profile.pearson_corr_exact(
        df, "value", "hr", group_cols=["event_type"]
    )


_CORR_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(floor(value * 1000.0) AS BIGINT) AS x,
         CAST(floor(CAST(hour(ts) AS DOUBLE) * 1000.0) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
a AS (
  -- sums stay HUGEINT (exact 128-bit), mirroring the Spark side's
  -- DECIMAL(38,0) accumulators; only the final expression converts
  -- to DOUBLE
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM b GROUP BY 1
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                      0.0), 6) AS r
FROM a
"""


_FUNNEL_STEPS = ["view", "click", "purchase"]


def _q_funnel_steps(spark, sf_dir):
    """Strictly-ordered view→click→purchase funnel per user: each
    step's first timestamp must be AFTER the previous step's (the
    sequence semantics a naive per-type min gets wrong). Epoch-second
    outputs keep the hash timezone-proof."""
    events = load_table(spark, sf_dir, "events")
    return journeys.funnel_steps(events, _FUNNEL_STEPS)


_FUNNEL_SQL = """
WITH l1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS tv
  FROM events
),
l2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
              OVER (PARTITION BY user_id) AS tc
  FROM l1
),
l3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
              OVER (PARTITION BY user_id) AS tp
  FROM l2
),
pu AS (
  SELECT user_id, any_value(tv) AS tv, any_value(tc) AS tc,
         any_value(tp) AS tp
  FROM l3 GROUP BY 1
)
SELECT user_id,
       CAST(floor(epoch(tv)) AS BIGINT) AS t_view,
       CAST(floor(epoch(tc)) AS BIGINT) AS t_click,
       CAST(floor(epoch(tp)) AS BIGINT) AS t_purchase,
       greatest(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END,
                CASE WHEN tc IS NOT NULL THEN 2 ELSE 0 END,
                CASE WHEN tp IS NOT NULL THEN 3 ELSE 0 END)::INTEGER
         AS step_reached
FROM pu
WHERE greatest(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END,
               CASE WHEN tc IS NOT NULL THEN 2 ELSE 0 END,
               CASE WHEN tp IS NOT NULL THEN 3 ELSE 0 END) > 0
"""


def _q_funnel_conversion(spark, sf_dir):
    """The funnel aggregated into its conversion table (W2-style
    bounded output, |steps| rows): users reaching >= each step and
    the conversion rate from step 1 — funnel_summary composed over
    funnel_steps, so the gate pins the whole funnel->rollup chain.
    Integer user counts; the rate is ONE division of two exact
    integers, rounded 6dp."""
    events = load_table(spark, sf_dir, "events")
    return journeys.funnel_summary(
        journeys.funnel_steps(events, _FUNNEL_STEPS), _FUNNEL_STEPS
    )


_FUNNEL_CONVERSION_SQL = """
WITH l1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS tv
  FROM events
),
l2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
              OVER (PARTITION BY user_id) AS tc
  FROM l1
),
l3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
              OVER (PARTITION BY user_id) AS tp
  FROM l2
),
pu AS (
  SELECT user_id, any_value(tv) AS tv, any_value(tc) AS tc,
         any_value(tp) AS tp
  FROM l3 GROUP BY 1
),
sr AS (
  SELECT greatest(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END,
                  CASE WHEN tc IS NOT NULL THEN 2 ELSE 0 END,
                  CASE WHEN tp IS NOT NULL THEN 3 ELSE 0 END) AS step_reached
  FROM pu
),
c AS (
  SELECT CAST(coalesce(sum(CASE WHEN step_reached >= 1 THEN 1 END), 0)
              AS BIGINT) AS n0,
         CAST(coalesce(sum(CASE WHEN step_reached >= 2 THEN 1 END), 0)
              AS BIGINT) AS n1,
         CAST(coalesce(sum(CASE WHEN step_reached >= 3 THEN 1 END), 0)
              AS BIGINT) AS n2
  FROM sr WHERE step_reached > 0
)
SELECT 1 AS step_idx, 'view' AS step, n0 AS n_users,
       round(n0 / nullif(n0, 0), 6) AS conversion_from_first FROM c
UNION ALL
SELECT 2, 'click', n1, round(n1 / nullif(n0, 0), 6) FROM c
UNION ALL
SELECT 3, 'purchase', n2, round(n2 / nullif(n0, 0), 6) FROM c
"""


def _q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix keyed on each user's first-event date,
    7-day periods by integer day arithmetic (no week-start convention
    to disagree on across engines)."""
    events = load_table(spark, sf_dir, "events")
    return journeys.cohort_retention(events, period_days=7)


_COHORT_SQL = """
WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
f AS (SELECT *, min(d) OVER (PARTITION BY user_id) AS fd FROM d),
p AS (
  SELECT DISTINCT user_id, strftime(fd, '%Y-%m-%d') AS cohort_start,
         CAST((d - fd) // 7 AS INT) AS period_offset
  FROM f
),
a AS (
  SELECT cohort_start, period_offset, count(*)::BIGINT AS n_active
  FROM p GROUP BY 1, 2
),
s AS (
  SELECT cohort_start, count(*)::BIGINT AS cohort_size
  FROM p WHERE period_offset = 0 GROUP BY 1
)
SELECT cohort_start, period_offset, n_active, cohort_size,
       round(n_active * 1.0 / cohort_size, 6) AS retention
FROM a JOIN s USING (cohort_start)
"""


def _q_rollup_timeline(spark, sf_dir):
    """Continuous-aggregate chain: raw events reduce ONCE to minute
    partials (per event_type), which merge to hour then day partials
    WITHOUT re-touching raw data; the day view is finalized. The
    oracle aggregates raw→day directly, so the hash proves the full
    merge chain ≡ direct aggregation (associative-exact integer
    state)."""
    events = load_table(spark, sf_dir, "events")
    minute = rollup.time_partials(
        events, grain="minute", group_cols=["event_type"]
    )
    hour = rollup.rollup_partials(
        minute, to_grain="hour", group_cols=["event_type"]
    )
    day = rollup.rollup_partials(
        hour, to_grain="day", group_cols=["event_type"]
    )
    return rollup.finalize_rollup(
        day, group_cols=["event_type"], bucket_format="yyyy-MM-dd"
    )


_ROLLUP_SQL = """
WITH m AS (
  SELECT date_trunc('day', ts) AS b, event_type,
         CAST(floor(value * 1000) AS BIGINT) AS millis
  FROM events
),
agg AS (
  SELECT strftime(b, '%Y-%m-%d') AS time_bucket, event_type,
         count(*) AS n_events,
         CAST(sum(millis) AS BIGINT) AS sum_millis,
         min(millis) AS min_millis,
         max(millis) AS max_millis
  FROM m GROUP BY 1, 2
)
SELECT time_bucket, event_type, n_events, sum_millis,
       round(sum_millis / (n_events * 1000.0), 6) AS avg_value,
       round(min_millis / 1000.0, 3) AS v_min,
       round(max_millis / 1000.0, 3) AS v_max
FROM agg
"""


def _q_rollup_distinct_users(spark, sf_dir):
    """Distinct-users-per-day rollup from MINUTE-grain HLL register
    partials: distinct counts don't decompose as raw counts, but the
    registers merge by max — the oracle runs the HLL DIRECTLY over
    raw events at day grain, so the hash proves the register-merge
    law bit-for-bit (incl. the exact harmonic_scaled integer)."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    minute = rollup.distinct_partials(
        events, distinct_col="user_id", grain="minute",
        group_cols=["event_type"],
    )
    day = rollup.rollup_distinct(
        minute, to_grain="day", group_cols=["event_type"]
    )
    return day.select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("time_bucket"),
        "event_type",
        "est_distinct",
        "zero_registers",
        "harmonic_scaled",
    )


_ROLLUP_DISTINCT_SQL = r"""
WITH hx AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS time_bucket,
         event_type, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events
),
parts AS (
  SELECT time_bucket, event_type,
         (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
         substr(h, 3, 8) AS tail
  FROM hx
),
leads AS (
  SELECT time_bucket, event_type, bucket,
         len(regexp_extract(tail, '^0*')) AS lead,
         strpos('0123456789abcdef',
                substr(tail, len(regexp_extract(tail, '^0*')) + 1, 1)) - 1 AS v
  FROM parts
),
rhos AS (
  SELECT time_bucket, event_type, bucket,
         CASE WHEN lead >= 8 THEN 33
              ELSE lead * 4
                   + (CASE WHEN v >= 8 THEN 0 WHEN v >= 4 THEN 1
                           WHEN v >= 2 THEN 2 ELSE 3 END) + 1
         END AS rho
  FROM leads
),
regs AS (
  SELECT time_bucket, event_type, bucket, max(rho) AS r
  FROM rhos GROUP BY 1, 2, 3
),
agg AS (
  SELECT time_bucket, event_type,
         (sum(1::BIGINT << (33 - r))
            + (256 - count(*)) * (1::BIGINT << 33))::BIGINT
           AS harmonic_scaled,
         (256 - count(*))::INTEGER AS zero_registers
  FROM regs GROUP BY 1, 2
),
rawed AS (
  SELECT time_bucket, event_type, zero_registers, harmonic_scaled,
         (0.7213 / (1 + 1.079 / 256)) * 256 * 256 * (1::BIGINT << 33)
           / harmonic_scaled AS raw
  FROM agg
)
SELECT time_bucket, event_type,
       round(CASE WHEN raw <= 640.0 AND zero_registers > 0
                  THEN 256.0 * ln(256.0 / zero_registers)
                  ELSE raw END, 2) AS est_distinct,
       zero_registers, harmonic_scaled
FROM rawed
"""


def _q_encoding_signals(spark, sf_dir):
    """The synthetic corpus is clean ASCII, so both engines inject
    the SAME deterministic damage per doc_id class (the pii_scrub
    pattern): U+FFFD runs, C0 control bytes, cp1252-style mojibake
    pairs, C1 block chars — then every count, ratio, and
    first-failing-rule verdict must agree bit-for-bit."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.repeat(F.lit("\ufffd"), (F.col("doc_id") % 3 + 1).cast("int")),
            )
            .when(F.col("doc_id") % 7 == 1, F.lit("\x07\x1f"))
            .when(F.col("doc_id") % 7 == 2, F.lit("Ã©Ã¤ â€œquoteâ€"))
            .when(F.col("doc_id") % 7 == 3, F.lit("\u0085\u0092"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return textops.encoding_signals(docs)


_ENCODING_SQL = """
WITH injected AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 7 = 0 THEN repeat(chr(65533), CAST(doc_id % 3 + 1 AS INT))
           WHEN doc_id % 7 = 1 THEN chr(7) || chr(31)
           WHEN doc_id % 7 = 2 THEN 'Ã©Ã¤ â€œquoteâ€'
           WHEN doc_id % 7 = 3 THEN chr(133) || chr(146)
           ELSE '' END AS t
  FROM documents
),
counted AS (
  SELECT doc_id, length(t) AS n_chars,
         length(t) - length(regexp_replace(t, chr(65533), '', 'g'))
           AS n_replacement,
         length(t) - length(regexp_replace(t,
           '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')) AS n_control,
         length(t) - length(regexp_replace(t,
           '[\\x{80}-\\x{9F}]', '', 'g')) AS n_c1,
         len(regexp_extract_all(t, 'Ã[\\x{A0}-\\x{FF}]|â€')) AS n_mojibake
  FROM injected
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_replacement AS BIGINT) AS n_replacement,
       CAST(n_control AS BIGINT) AS n_control,
       CAST(n_c1 AS BIGINT) AS n_c1,
       CAST(n_mojibake AS BIGINT) AS n_mojibake,
       round((n_replacement + n_control + n_c1 + n_mojibake) * 1.0
             / NULLIF(n_chars, 0), 6) AS bad_ratio,
       CASE WHEN n_replacement > 0 THEN 'replacement'
            WHEN n_control > 0 THEN 'control'
            WHEN n_c1 > 0 OR n_mojibake > 0 THEN 'mojibake'
            ELSE 'ok' END AS verdict
FROM counted
"""


_WSAMPLE_N = 20


def _q_weighted_sample(spark, sf_dir):
    """Efraimidis–Spirakis weighted draw without replacement:
    per-lang top-20 documents weighted by n_chars — the reproducible
    quality-weighted subset pick. Weight and u are exact integers /
    dyadic rationals; the single ln() is pinned by round 6 and
    cannot reorder rows cross-engine (ties require identical (u, w)
    → identical keys → doc_id tiebreak)."""
    return sampling.weighted_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "n_chars"),
        key_col="doc_id",
        weight_col="n_chars",
        n=_WSAMPLE_N,
        strata_col="lang",
        salt="w1",
    )


_WSAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         -ln((('0x' || substr(md5('w1' || CAST(doc_id AS VARCHAR)), 1, 8)
              )::BIGINT + 1) / 4294967296.0)
           / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
),
ranked AS (
  SELECT doc_id, lang, n_chars, es_key,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY es_key ASC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM keyed
)
SELECT doc_id, lang, n_chars, rank, round(es_key, 6) AS es_key
FROM ranked WHERE rank <= {_WSAMPLE_N}
"""


_TEMP_MIX_ALPHA = 0.5


def _q_temperature_mix(spark, sf_dir):
    """Temperature rebalancing over lang strata at α=0.5 (T=2): the
    head languages downsample toward the tail's share; the kept set
    plus per-row applied rate is the gate output."""
    return sampling.temperature_mix(
        _docs(spark, sf_dir), key_col="doc_id", strata_col="lang",
        alpha=_TEMP_MIX_ALPHA,
    ).select("doc_id", "lang", "source", "mix_rate")


_TEMP_MIX_SQL = f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
mn AS (SELECT min(n) AS n_min FROM counts),
rates AS (
  SELECT lang, round(pow(n * 1.0 / n_min, {_TEMP_MIX_ALPHA} - 1.0), 6) AS rate
  FROM counts, mn
),
th AS (
  SELECT lang, rate,
         CASE WHEN rate >= 1.0 THEN 'g'
              ELSE lpad(lower(to_hex(CAST(floor(rate * 4294967296) AS BIGINT))),
                        8, '0')
         END AS thr
  FROM rates
)
SELECT d.doc_id, d.lang, d.source, t.rate AS mix_rate
FROM documents d
JOIN th t ON d.lang IS NOT DISTINCT FROM t.lang
WHERE substr(md5('t1' || CAST(d.doc_id AS VARCHAR)), 1, 8) < t.thr
"""


_KMEANS_EXACT_K = 8
_KMEANS_EXACT_ITERS = 3
_KMEANS_EXACT_DIM = 64


def _q_kmeans_exact(spark, sf_dir):
    """Lloyd k-means with order-independent (decimal-exact) centroid
    updates — the reproducible twin of kmeans_clusters. Output is the
    full integer assignment table, so the hash gate pins every round
    of the iterative computation cross-engine."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = similarity.kmeans_lloyd_exact(
        emb, k=_KMEANS_EXACT_K, iters=_KMEANS_EXACT_ITERS
    )
    return assigned.select(
        "vec_id", F.col("cluster_id").cast("bigint").alias("cluster_id")
    )


def _lloyd_assign_cte(r: int) -> str:
    """One unrolled assignment stage: squared L2 (norm2 − 2·dot + cn2,
    same operation order as the Spark _sqdist expression; ties →
    lowest centroid id, same as array_position of the first min)."""
    return f"""a{r} AS (
  SELECT vec_id, v, cid AS cluster_id
  FROM (
    SELECT n.vec_id, n.v, c.cid,
           n.norm2 - 2.0 * list_dot_product(n.v, c.cv) + c.cn2 AS dist
    FROM norms2 n CROSS JOIN c{r - 1} c
  )
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)"""


def _lloyd_refine_ctes(k: int, iters: int, dim: int) -> str:
    """Unrolled decimal-exact Lloyd refinement: seeds = k lowest-id
    vectors (c0), then per round one L2 assignment and a re-center
    with DECIMAL(27,12)-exact component sums divided as doubles — the
    same arithmetic the Spark side performs, so centroids match
    bit-for-bit.  The chain ends at ``c{iters}`` (cid, cv, cn2);
    callers append their own final stage (assignment for k-means,
    cosine probe for IVF)."""

    def mean_cols() -> str:
        return ",\n         ".join(
            f"CAST(sum(CAST(v[{d + 1}] AS DECIMAL(27,12))) AS DOUBLE)"
            f" / count(*) AS m{d}"
            for d in range(dim)
        )

    mean_list = "[" + ", ".join(f"m{d}" for d in range(dim)) + "]"
    parts = [
        f"""norms2 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS norm2
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cid,
         v AS cv, list_dot_product(v, v) AS cn2
  FROM (SELECT vec_id, v FROM norms2 ORDER BY vec_id LIMIT {k})
)"""
    ]
    for r in range(1, iters + 1):
        parts.append(_lloyd_assign_cte(r))
        parts.append(
            f"""m{r} AS (
  SELECT cluster_id AS cid,
         {mean_cols()}
  FROM a{r} GROUP BY 1
),
c{r} AS (
  SELECT c{r - 1}.cid,
         COALESCE(mm.cv, c{r - 1}.cv) AS cv,
         list_dot_product(COALESCE(mm.cv, c{r - 1}.cv),
                          COALESCE(mm.cv, c{r - 1}.cv)) AS cn2
  FROM c{r - 1}
  LEFT JOIN (SELECT cid, {mean_list} AS cv FROM m{r}) mm USING (cid)
)"""
        )
    return ",\n".join(parts)


def _kmeans_exact_sql() -> str:
    """ANSI twin of kmeans_lloyd_exact with the rounds unrolled (see
    _lloyd_refine_ctes).  Spark runs ``iters`` (assign → update)
    cycles and then one FINAL assignment against the post-update
    centroids — so the unroll has iters+1 assignment stages and the
    output is the last one."""
    k, iters, dim = _KMEANS_EXACT_K, _KMEANS_EXACT_ITERS, _KMEANS_EXACT_DIM
    body = (
        _lloyd_refine_ctes(k, iters, dim)
        + ",\n"
        + _lloyd_assign_cte(iters + 1)
    )
    return f"""
WITH {body}
SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id FROM a{iters + 1}
"""


_CURRICULUM_PHASES = 4


def _q_curriculum_phases(spark, sf_dir):
    """Curriculum cut by the continuous quality score (cleanest docs
    = phase 0, via ascending=False on a higher-is-better score)."""
    c = textops.quality_signal_cols("text")
    return sampling.curriculum_phases(
        _docs(spark, sf_dir),
        c["stopword_ratio"] - c["punct_ratio"],
        n_phases=_CURRICULUM_PHASES,
        ascending=False,
    )


_CURRICULUM_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\s+') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct
  FROM documents
),
scored AS (
  SELECT doc_id,
         -- NULLIF guards: Spark /0 yields NULL; DuckDB >= 1.1 would
         -- yield NaN (sorts FIRST under DESC) without them.
         len(list_filter(toks, x -> x IN ('the','a','of','and','to')))
           * 1.0 / NULLIF(len(toks), 0)
         - n_punct * 1.0 / NULLIF(n_chars, 0) AS q
  FROM base
),
ranked AS (
  SELECT doc_id, q,
         row_number() OVER (ORDER BY q DESC, doc_id ASC) AS phase_rank,
         count(*) OVER () AS n
  FROM scored
)
SELECT doc_id,
       round(q, 6) AS curriculum_score,
       CAST(phase_rank AS BIGINT) AS phase_rank,
       CAST(((phase_rank - 1) * {_CURRICULUM_PHASES}) // n AS INTEGER)
         AS phase
FROM ranked
"""


def _q_compression_signals(spark, sf_dir):
    return textops.compression_signals(_docs(spark, sf_dir))


_SPLIT_FRACS = (0.8, 0.1)


def _q_cluster_safe_splits(spark, sf_dir):
    """Splits keyed on the SHARED cluster frame (the dedup index a
    serving deployment materializes once per snapshot)."""
    return sampling.cluster_safe_splits(
        _docs(spark, sf_dir),
        _cluster_frame(spark, sf_dir),
        fracs=_SPLIT_FRACS,
    )


def _cluster_safe_splits_sql() -> str:
    from ..operators.sampling import rate_threshold

    t_train = rate_threshold(_SPLIT_FRACS[0])
    t_val = rate_threshold(_SPLIT_FRACS[0] + _SPLIT_FRACS[1])
    bucket = (
        "substr(md5('split' || CAST(COALESCE(cl.cluster_id, d.doc_id) "
        "AS VARCHAR)), 1, 8)"
    )
    return f"""
WITH RECURSIVE {_JACCARD_CTES},
pairs AS (SELECT doc_a, doc_b FROM scored_pairs WHERE j >= 0.9),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
cl AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
)
SELECT d.doc_id,
       COALESCE(cl.cluster_id, d.doc_id) AS split_key,
       CASE WHEN {bucket} < '{t_train}' THEN 'train'
            WHEN {bucket} < '{t_val}' THEN 'val'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN cl USING (doc_id)
"""


_REL_QUALITY_FRAC = 0.7


def _q_relative_quality_keep(spark, sf_dir):
    return textops.relative_quality_filter(
        _docs(spark, sf_dir), keep_frac=_REL_QUALITY_FRAC, strata_col="lang"
    )


_REL_QUALITY_SQL = rf"""
WITH base AS (
  SELECT doc_id, lang,
         string_split_regex(trim(text), '\s+') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         -- NULLIF guards: Spark /0 yields NULL; DuckDB >= 1.1 would
         -- yield NaN (sorts FIRST under DESC) without them.
         len(list_filter(toks, x -> x IN ('the','a','of','and','to')))
           * 1.0 / NULLIF(len(toks), 0)
         - n_punct * 1.0 / NULLIF(n_chars, 0) AS q
  FROM base
),
ranked AS (
  SELECT doc_id, lang, q,
         row_number() OVER (
           PARTITION BY lang ORDER BY q DESC, doc_id ASC) AS q_rank,
         count(*) OVER (PARTITION BY lang) AS n_stratum
  FROM scored
)
SELECT doc_id, lang,
       round(q, 6) AS q_score,
       CAST(q_rank AS BIGINT) AS q_rank,
       CAST(n_stratum AS BIGINT) AS n_stratum,
       q_rank <= ceil({_REL_QUALITY_FRAC} * n_stratum) AS kept
FROM ranked
"""


_NB_DIM = 32


def _q_nb_lang_classify(spark, sf_dir):
    """Train on even doc_ids, score odd doc_ids — a genuine held-out
    split, so the gate pins the classifier's generalization behavior,
    not memorization."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    return textops.nb_hashed_classify(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        label_col="lang",
        dim=_NB_DIM,
    )


def _nb_lang_sql() -> str:
    d = _NB_DIM
    msum = ",\n         ".join(
        f"CAST(sum(CASE WHEN bucket = {i} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS m{i}"
        for i in range(d)
    )
    csum = ",\n         ".join(
        f"CAST(sum(CASE WHEN bucket = {i} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS c{i}"
        for i in range(d)
    )
    score = "ln((d_l + 0.5) / (n_docs + 0.5 * k))" + "".join(
        f" + c{i} * ln((m{i} + 0.5) / (m_tot + 0.5 * {d}))"
        for i in range(d)
    )
    tok = (
        "((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1))"
        f" % {d}"
    )
    return f"""
WITH train_toks AS (
  SELECT lang, {tok} AS bucket
  FROM (SELECT lang, t.tok
        FROM documents,
             unnest(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               x -> x != '')) AS t(tok)
        WHERE doc_id % 2 = 0 AND lang IS NOT NULL)
),
bcounts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS m_tot,
         {msum}
  FROM train_toks GROUP BY lang
),
dcounts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS d_l
  FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL
  GROUP BY lang
),
model AS (
  SELECT p.*, d.d_l FROM bcounts p JOIN dcounts d USING (lang)
),
g AS (
  SELECT CAST(sum(d_l) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS k
  FROM model
),
score_toks AS (
  SELECT doc_id, {tok} AS bucket
  FROM (SELECT doc_id, t.tok
        FROM documents,
             unnest(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               x -> x != '')) AS t(tok)
        WHERE doc_id % 2 = 1)
),
doc_counts AS (
  SELECT doc_id,
         {csum}
  FROM score_toks GROUP BY doc_id
),
paired AS (
  SELECT dc.doc_id, m.lang,
         {score} AS _score
  FROM doc_counts dc CROSS JOIN model m CROSS JOIN g
),
ranked AS (
  SELECT doc_id, lang, _score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY _score DESC, lang ASC) AS rn,
         lead(_score) OVER (
           PARTITION BY doc_id ORDER BY _score DESC, lang ASC) AS _next
  FROM paired
)
SELECT doc_id, lang AS pred_label,
       round(_score, 6) AS score,
       round(_score - _next, 6) AS margin
FROM ranked WHERE rn = 1
"""


_VOCAB_DRIFT_TOP_N = 300


def _q_vocab_drift(spark, sf_dir):
    """Same deterministic snapshot split as corpus_diff (old = ids not
    divisible by 10; new = ids not divisible by 7, every id divisible
    by 5 revised with a ' v2' suffix) — the revision token guarantees
    a 'new' verdict row, the removed ids shift mass."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return textops.vocab_drift(old, new, top_n=_VOCAB_DRIFT_TOP_N)


_VOCAB_DRIFT_SQL = f"""
WITH old_docs AS (
  SELECT text FROM documents WHERE doc_id % 10 != 0
),
new_docs AS (
  SELECT CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 != 0
),
oc AS (
  SELECT t.tok AS token, CAST(count(*) AS BIGINT) AS c_old
  FROM old_docs,
       unnest(list_filter(
         regexp_split_to_array(trim(lower(text)), '\\s+'),
         x -> x != '')) AS t(tok)
  GROUP BY 1
),
nc AS (
  SELECT t.tok AS token, CAST(count(*) AS BIGINT) AS c_new
  FROM new_docs,
       unnest(list_filter(
         regexp_split_to_array(trim(lower(text)), '\\s+'),
         x -> x != '')) AS t(tok)
  GROUP BY 1
),
otop AS (
  SELECT token FROM (
    SELECT token,
           row_number() OVER (ORDER BY c_old DESC, token ASC) AS rk
    FROM oc
  ) WHERE rk <= {_VOCAB_DRIFT_TOP_N}
),
ntop AS (
  SELECT token FROM (
    SELECT token,
           row_number() OVER (ORDER BY c_new DESC, token ASC) AS rk
    FROM nc
  ) WHERE rk <= {_VOCAB_DRIFT_TOP_N}
),
vocab AS (
  SELECT DISTINCT token FROM (
    SELECT token FROM otop UNION ALL SELECT token FROM ntop
  )
),
j AS (
  SELECT v.token,
         COALESCE(oc.c_old, 0) AS c_old,
         COALESCE(nc.c_new, 0) AS c_new
  FROM vocab v
  LEFT JOIN oc USING (token)
  LEFT JOIN nc USING (token)
),
tot AS (
  SELECT CAST(sum(c_old) AS BIGINT) AS t_old,
         CAST(sum(c_new) AS BIGINT) AS t_new,
         CAST(count(*) AS BIGINT) AS v
  FROM j
)
SELECT token, c_old, c_new,
       round((c_old + 0.5) / (t_old + 0.5 * v), 8) AS p_old,
       round((c_new + 0.5) / (t_new + 0.5 * v), 8) AS p_new,
       round(((c_new + 0.5) / (t_new + 0.5 * v))
             * ln(((c_new + 0.5) / (t_new + 0.5 * v))
                  / ((c_old + 0.5) / (t_old + 0.5 * v))), 8) AS kl_term,
       CASE WHEN c_old = 0 THEN 'new'
            WHEN c_new = 0 THEN 'vanished'
            ELSE 'shifted' END AS verdict
FROM j CROSS JOIN tot
"""


_BPE_MERGES = 100


def _q_bpe_token_counts(spark, sf_dir):
    """Real BPE token counts under merges learned from the corpus
    itself (deterministic: word-freq table → (count DESC, pair ASC)
    merge rule). Iterative merge application is genuinely not
    SQL-expressible, so this is a rows-only entry pinned by
    expect_columns + an exact rows_oracle, with the full semantics
    pinned by test_extensions (hand-computed classic merge sequence;
    distributed counts ≡ driver-side re-encode)."""
    docs = _docs(spark, sf_dir)
    merges = textops.bpe_learn(docs, n_merges=_BPE_MERGES)
    return textops.bpe_token_counts(docs, merges)


_HASH_EMB_DIM = 32


def _q_doc_hash_embeddings(spark, sf_dir):
    """Element-projected hashing-trick embeddings (first 8 dims + norm
    + token count) so the result is scalar-sortable for the driver's
    canonicalizer; the array-returning operator stays for API use."""
    from pyspark.sql import functions as F

    emb = textops.hash_embeddings(_docs(spark, sf_dir), dim=_HASH_EMB_DIM)
    return emb.select(
        "doc_id",
        "n_tokens",
        F.round("norm", 6).alias("norm"),
        *[
            F.round(F.col("embedding")[i], 6).alias(f"e{i}")
            for i in range(8)
        ],
    )


def _doc_hash_embeddings_sql() -> str:
    d = _HASH_EMB_DIM
    csum = ",\n         ".join(
        f"CAST(sum(CASE WHEN bucket = {i} THEN sign ELSE 0 END) "
        f"AS BIGINT) AS c{i}"
        for i in range(d)
    )
    norm2 = " + ".join(f"c{i} * c{i}" for i in range(d))
    dims = ", ".join(
        f"CASE WHEN {norm2} > 0 THEN "
        f"round(CAST(c{i} AS DOUBLE) / sqrt(CAST({norm2} AS DOUBLE)), 6) "
        f"END AS e{i}"
        for i in range(8)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       unnest(list_filter(
         regexp_split_to_array(trim(lower(text)), '\\s+'),
         x -> x != '')) AS t(tok)
),
hashed AS (
  SELECT doc_id,
         ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1))
           % {d} AS bucket,
         CASE WHEN strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1
                   >= 8 THEN -1 ELSE 1 END AS sign
  FROM toks
),
counts AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         {csum}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(sqrt(CAST({norm2} AS DOUBLE)), 6) AS norm,
       {dims}
FROM counts
"""


_OUTLIER_TOP_N = 50


def _q_embedding_outliers(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kmeans_outliers(
        emb, k=_KMEANS_EXACT_K, iters=_KMEANS_EXACT_ITERS,
        top_n=_OUTLIER_TOP_N,
    )


def _embedding_outliers_sql() -> str:
    """The kmeans_exact oracle's centroid chain with the FINAL assign
    keeping its min distance (same ``norm2 − 2·dot + cn2`` expression
    the Spark _sqdist computes, same operand order → bit-identical
    doubles), then the far-tail top-N."""
    k, iters, dim = _KMEANS_EXACT_K, _KMEANS_EXACT_ITERS, _KMEANS_EXACT_DIM
    body = _lloyd_refine_ctes(k, iters, dim)
    return f"""
WITH {body},
final AS (
  SELECT vec_id, cid AS cluster_id, dist
  FROM (
    SELECT n.vec_id, c.cid,
           n.norm2 - 2.0 * list_dot_product(n.v, c.cv) + c.cn2 AS dist
    FROM norms2 n CROSS JOIN c{iters} c
  )
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)
SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id,
       round(dist, 6) AS sqdist
FROM final
ORDER BY dist DESC, vec_id ASC
LIMIT {_OUTLIER_TOP_N}
"""


_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48


def _q_doc_chunks(spark, sf_dir):
    return packing.chunk_documents(
        _docs(spark, sf_dir), chunk_size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    )


_DOC_CHUNKS_SQL = rf"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
),
sized AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) <= {_CHUNK_SIZE} THEN 1
              ELSE CAST(ceil((len(toks) - {_CHUNK_SIZE}) * 1.0
                             / {_CHUNK_STRIDE}) AS BIGINT) + 1
         END AS n_chunks
  FROM base
),
chunks AS (
  SELECT doc_id, g.chunk_idx,
         list_slice(toks, g.chunk_idx * {_CHUNK_STRIDE} + 1,
                    g.chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE}) AS ctoks
  FROM sized, LATERAL unnest(generate_series(0, n_chunks - 1)) AS g(chunk_idx)
)
SELECT doc_id, chunk_idx, chunk_idx * {_CHUNK_STRIDE} AS start_tok,
       CAST(len(ctoks) AS BIGINT) AS chunk_tokens,
       md5(array_to_string(ctoks, ' ')) AS chunk_fingerprint
FROM chunks
WHERE len(ctoks) > 0
"""


_PACK_BUDGET, _PACK_SHARDS = 2048, 8


def _q_pack_manifest(spark, sf_dir):
    return packing.pack_manifest(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )


_PACK_MANIFEST_SQL = rf"""
WITH counted AS (
  SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
offsets AS (
  SELECT doc_id, shard_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard_id ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tokens_before
  FROM counted
)
SELECT shard_id, CAST(tokens_before // {_PACK_BUDGET} AS BIGINT) AS pack_id,
       count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       CAST(SUM(n_tokens) * 1000 // {_PACK_BUDGET} AS BIGINT) AS fill_permille
FROM offsets GROUP BY 1, 2
"""


def _q_pack_read_sequences(spark, sf_dir):
    """The loader-view reconstruction (packing.pack_sequences) pinned
    ORDER-SENSITIVELY without nested types in the compared schema:
    each per-pack seq array reduces to positional checksums
    Σ (pos+1)·doc_id and Σ (pos+1)·n_tokens via array HOFs (no
    explode, no extra exchange) — any reordering of the reconstructed
    sequence changes the checksum, so a hash match pins the exact
    offset order a training loader would stream."""
    from pyspark.sql import functions as F

    assigned = packing.pack_offsets(
        _docs(spark, sf_dir), budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )
    seqs = packing.pack_sequences(assigned)
    checksum = (
        "aggregate(zip_with(seq, sequence(1, size(seq)), "
        "(s, i) -> CAST(i AS BIGINT) * s.{field}), "
        "CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    return seqs.select(
        "shard_id",
        "pack_id",
        "n_docs",
        "pack_tokens",
        F.expr(checksum.format(field="doc_id")).alias("order_checksum"),
        F.expr(checksum.format(field="n_tokens")).alias(
            "token_order_checksum"
        ),
    )


# within a (shard, pack) the running offset is monotone in doc_id
# (same running sum), so position rank ≡ row_number by doc_id
_PACK_SEQUENCES_SQL = rf"""
WITH counted AS (
  SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
offsets AS (
  SELECT doc_id, shard_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard_id ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tokens_before
  FROM counted
),
packs AS (
  SELECT shard_id,
         CAST(tokens_before // {_PACK_BUDGET} AS BIGINT) AS pack_id,
         doc_id, n_tokens,
         row_number() OVER (
           PARTITION BY shard_id, tokens_before // {_PACK_BUDGET}
           ORDER BY doc_id
         ) AS rn
  FROM offsets
)
SELECT shard_id, pack_id, count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       CAST(SUM(rn * doc_id) AS BIGINT) AS order_checksum,
       CAST(SUM(rn * n_tokens) AS BIGINT) AS token_order_checksum
FROM packs GROUP BY 1, 2
"""


_SHARD_COUNT = 16


def _q_shard_manifest(spark, sf_dir):
    return packing.shard_manifest(_docs(spark, sf_dir), n_shards=_SHARD_COUNT)


_SHARD_MANIFEST_SQL = f"""
WITH keyed AS (
  SELECT *,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
           % {_SHARD_COUNT} AS shard_id
  FROM documents
)
SELECT shard_id, count(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_size,
       count(DISTINCT lang) AS n_langs,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM keyed GROUP BY 1
"""


def _q_quantized_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.quantized_topk(emb, _QUERY_IDS, k=10)


# Scale cancels out of cosine, so the oracle ranks on raw integer-code
# dot products — every sum is an exact integer, making this the one
# similarity oracle with no float-fold caveat at all.
_QUANTIZED_TOPK_SQL = f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
quant AS (
  SELECT vec_id,
         list_transform(v, x -> floor(x * (127.0 / amax) + 0.5)) AS q
  FROM (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) AS amax
    FROM corpus
  )
  WHERE amax > 0
),
norms AS (
  SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS nrm FROM quant
),
qs AS (
  SELECT vec_id AS query_id, q AS qv, nrm AS qn
  FROM norms WHERE vec_id IN ({", ".join(str(i) for i in _QUERY_IDS)})
),
scored AS (
  SELECT qs.query_id, n.vec_id AS neighbor_id,
         list_dot_product(qs.qv, n.q) / (qs.qn * n.nrm) AS qcosine
  FROM qs JOIN norms n ON n.vec_id != qs.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, qcosine,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY qcosine DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(qcosine, 6) AS qcosine
FROM ranked WHERE rank <= 10
"""


QUERIES: dict[str, QuerySpec] = {
    "doc_chunks": QuerySpec(
        _q_doc_chunks, _DOC_CHUNKS_SQL,
        "overlapping token-window chunking (64/48), zero-shuffle "
        "explode; chunk content pinned via md5 fingerprints",
    ),
    "pack_manifest": QuerySpec(
        _q_pack_manifest, _PACK_MANIFEST_SQL,
        "offset-based sequence packing into 2048-token budgets across "
        "8 shards — per-pack doc/token/fill manifest, pure integer math",
    ),
    "pack_read_sequences": QuerySpec(
        _q_pack_read_sequences, _PACK_SEQUENCES_SQL,
        "loader-view pack reconstruction with order-sensitive "
        "positional checksums (array HOFs, no extra exchange)",
    ),
    "shard_manifest": QuerySpec(
        _q_shard_manifest, _SHARD_MANIFEST_SQL,
        "md5-keyed output-shard assignment preview (writer layout "
        "validation before the write)",
    ),
    "embedding_int8_topk": QuerySpec(
        _q_quantized_topk, _QUANTIZED_TOPK_SQL,
        "cosine top-10 under per-vector int8 quantization — integer "
        "dot products (scales cancel), recall vs exact unit-tested",
    ),
    "heavy_hitter_tokens": QuerySpec(
        _q_heavy_hitters, _HEAVY_HITTERS_SQL,
        "top-10 frequent tokens per language (corpus profiling)",
    ),
    "tfidf_top_terms": QuerySpec(
        _q_tfidf_top_terms, _TFIDF_SQL,
        "per-doc top-3 TF-IDF terms, rounded-score ranking",
    ),
    "pii_scrub": QuerySpec(
        _q_pii_scrub, _PII_SQL,
        "staged email/IP/phone redaction with counts, md5-verified text",
    ),
    "media_frame_sample": QuerySpec(
        _q_media_frame_sample, _FRAME_SAMPLE_SQL,
        "flatMap-shaped frame sampling over binary payloads "
        "(mapInPandas, stub decode, full oracle)",
    ),
    "media_resize": QuerySpec(
        _q_media_resize, _RESIZE_SQL,
        "schema-preserving resize stage over binary payloads "
        "(mapInPandas, stub decode, full oracle)",
    ),
    "png_interlaced_decode_features": QuerySpec(
        _q_png_interlaced_decode_features, _MEDIA_DECODE_SQL,
        "REAL Adam7-interlaced PNG decode: 7-pass fixture, per-pass "
        "Paeth unfiltering + grid reassembly — same pixels as the "
        "sequential fixture, so the same arithmetic md5 oracle pins "
        "the de-interlace path byte-exactly",
    ),
    "media_decode_features": QuerySpec(
        _q_media_decode_features, _MEDIA_DECODE_SQL,
        "REAL PNG decode (stdlib inflate + Paeth unfilter) → "
        "per-channel pixel statistics, oracle-pinned byte-exactly",
    ),
    "jpeg_decode_features": QuerySpec(
        _q_jpeg_decode_features, _JPEG_DECODE_SQL,
        "REAL baseline-JPEG decode (pure-numpy Huffman + dequant + "
        "IDCT + restart resync) → channel statistics, oracle-pinned "
        "exactly via lossless flat-block quality-100 round-trip",
    ),
    "jpeg_progressive_decode_features": QuerySpec(
        _q_jpeg_progressive_decode_features, _JPEG_DECODE_SQL,
        "REAL progressive-JPEG (SOF2) decode: spectral selection + "
        "successive approximation + EOB runs + per-scan restarts, "
        "same lossless flat-block identity and arithmetic oracle as "
        "the baseline gate — hash match pins the multi-scan path",
    ),
    "jpeg_color_decode_features": QuerySpec(
        _q_jpeg_color_decode_features, _JPEG_COLOR_DECODE_SQL,
        "REAL color-JPEG decode at the dominant real-world shape "
        "(3-component baseline, 4:2:0 interleaved MCUs, chroma "
        "tables, upsample, YCbCr→RGB) — grey-valued flat blocks "
        "round-trip exactly at q100, oracle-pinned per channel",
    ),
    "adpcm_decode_features": QuerySpec(
        _q_adpcm_decode_features, _adpcm_decode_sql(),
        "REAL compressed-audio decode (IMA ADPCM 0x0011): md5 nibbles "
        "through the step/index recurrence — the oracle replays the "
        "codec arithmetic in a recursive CTE, so the hash pins the "
        "decode itself, integer-exact",
    ),
    "audio_decode_features": QuerySpec(
        _q_audio_decode_features, _AUDIO_DECODE_SQL,
        "REAL WAV decode (stdlib wave reader, 16-bit stereo PCM) → "
        "per-channel integer statistics, oracle-pinned byte-exactly",
    ),
    "video_frame_features": QuerySpec(
        _q_video_frame_features, _VIDEO_FRAME_SQL,
        "REAL Y4M video decode (pure-stdlib YUV4MPEG2 parser) → "
        "uniform frame sampling → per-frame integer pixel statistics, "
        "oracle-pinned byte-exactly",
    ),
    "geo_external_top_countries": QuerySpec(
        _q_geo_external_top_countries, _geo_external_sql(),
        "external-service enrichment pattern (mapInPandas + "
        "per-partition resolver cache) → country rollup, full oracle",
    ),
    "bigram_logprob": QuerySpec(
        _q_bigram_logprob, _BIGRAM_LM_SQL,
        "add-one-smoothed corpus bigram LM fluency scores per doc",
    ),
    "semantic_dedup_reps": QuerySpec(
        _q_semantic_dedup_reps, _SEMANTIC_DEDUP_SQL,
        "SemDeDup-style pass: LSH near-dup pairs → connected components "
        "→ per-label kept-representative counts — full oracle "
        "(closed-form hyperplanes + recursive-CTE closure)",
    ),
    "cms_heavy_hitters": QuerySpec(
        _q_cms_heavy_hitters, None,
        "count-min sketch point estimates vs exact top-20 token counts "
        "(mergeable fixed-size frequency summary)",
        expect_columns=("token", "cnt", "est_cnt"),
        expect_rows=(20, 20),
    ),
    "cms_md5_heavy_hitters": QuerySpec(
        _q_cms_md5_heavy_hitters, _cms_md5_sql(),
        "count-min sketch with the md5 bucket family — same one-pass "
        "plan, full DuckDB oracle pinning buckets and min-over-depth",
    ),
    "kmeans_exact_clusters": QuerySpec(
        _q_kmeans_exact, _kmeans_exact_sql(),
        "Lloyd k-means with decimal-exact (order-independent) centroid "
        "updates — full-assignment hash oracle across 3 unrolled rounds",
    ),
    "curriculum_phases": QuerySpec(
        _q_curriculum_phases, _CURRICULUM_SQL,
        "curriculum-learning phase assignment: equal-count quality "
        "buckets via exact integer-division cuts — full oracle",
    ),
    "compression_signals": QuerySpec(
        _q_compression_signals, None,
        "zlib compression-ratio repetition/entropy signal (DEFLATE "
        "window sees document-scale structure the n-gram caps miss) — "
        "codec-version-specific bytes, rows-only with exact-count "
        "oracle",
        expect_columns=("doc_id", "n_bytes", "n_compressed", "ratio"),
        expect_rows=(1, None),
        rows_oracle=(
            "SELECT CAST(count(*) AS BIGINT) FROM documents "
            "WHERE text IS NOT NULL"
        ),
    ),
    "cluster_safe_splits": QuerySpec(
        _q_cluster_safe_splits, _cluster_safe_splits_sql(),
        "leakage-safe train/val/test assignment keyed on the near-dup "
        "CLUSTER (duplicates can never straddle train and eval) — "
        "full oracle over the recursive-closure cluster map",
    ),
    "relative_quality_keep": QuerySpec(
        _q_relative_quality_keep, _REL_QUALITY_SQL,
        "per-language RELATIVE quality thresholding (top keep_frac of "
        "each stratum — the language-fair CCNet cut) — full oracle",
    ),
    "nb_lang_classify": QuerySpec(
        _q_nb_lang_classify, _nb_lang_sql(),
        "hashed multinomial Naive Bayes (model-based doc filter, "
        "CCNet pattern): train on even ids, score held-out odd ids — "
        "training AND scoring fully relational, full oracle",
    ),
    "vocab_drift": QuerySpec(
        _q_vocab_drift, _VOCAB_DRIFT_SQL,
        "token-distribution drift between corpus snapshots: top-N "
        "union vocab, smoothed per-token KL(new‖old) contributions + "
        "new/vanished/shifted verdicts — full oracle",
    ),
    "bpe_token_counts": QuerySpec(
        _q_bpe_token_counts, None,
        "REAL BPE token counts (Sennrich learn on the distributed "
        "word-freq table, ranked greedy apply via mapInPandas) — "
        "iterative, rows-only with exact-count oracle",
        expect_columns=(
            "doc_id", "n_words", "n_bpe_tokens", "avg_tokens_per_word"
        ),
        expect_rows=(1, None),
        rows_oracle=(
            "SELECT CAST(count(*) AS BIGINT) FROM documents "
            "WHERE text IS NOT NULL AND trim(text) != ''"
        ),
    ),
    "doc_hash_embeddings": QuerySpec(
        _q_doc_hash_embeddings, _doc_hash_embeddings_sql(),
        "hashing-trick document embeddings (feature hashing, no "
        "vocabulary/fit): one explode + one hash agg, exact-integer "
        "counts L2-normalized — bridges text into embedding space; "
        "full oracle",
    ),
    "embedding_outliers": QuerySpec(
        _q_embedding_outliers, _embedding_outliers_sql(),
        "prototypicality pruning signal: top-N farthest vectors from "
        "their decimal-exact k-means centroid (TakeOrdered far tail) — "
        "full oracle with bit-identical distances",
    ),
    "kmeans_clusters": QuerySpec(
        _q_kmeans_clusters, None,
        "Lloyd k-means cluster sizes (literal-centroid assign; "
        "numpy-verified)",
        expect_columns=("cluster_id", "n_points"),
        expect_rows=(1, 8),
    ),
    "dedup_exact": QuerySpec(
        _q_dedup_exact, _DEDUP_EXACT_SQL,
        "exact dedup via normalized-md5 fingerprint groupBy",
    ),
    "containment_pairs": QuerySpec(
        _q_containment_pairs, _CONTAINMENT_SQL,
        "directed near-superset join: containment |A∩B|/|A| ≥ t via "
        "the asymmetric prefix filter (probe prefix × full inverted "
        "list), verified exactly — lossless vs the naive oracle",
    ),
    "containment_minhash_md5": QuerySpec(
        _q_containment_sketch_md5, _CONTAINMENT_SKETCH_SQL,
        "banded containment estimation (bottom-k sketch, md5 family): "
        "constant-k probe, zero-shuffle sketch projection, count-only "
        "verify — the scale path shadowing the exact prefix join, "
        "hash-exact DuckDB oracle",
    ),
    "source_containment": QuerySpec(
        _q_source_containment, _SRC_CONTAIN_SQL,
        "directed corpus-group containment matrix from mergeable "
        "bottom-k union sketches (per-doc sketch closure → group "
        "sketch) — the subset-acquisition signal symmetric source "
        "overlap misses; full oracle via the direct definition",
    ),
    "containment_minhash_capped": QuerySpec(
        _q_containment_sketch_capped,
        _containment_sketch_sql(max_df=_CSKETCH_MAX_DF),
        "df-capped containment estimation (max_df drops indexed-side "
        "boilerplate shingles; deterministic lower bound) — the "
        "100 TB fan-out lever, hash-pinned against the same-capped "
        "oracle",
    ),
    "containment_minhash_est": QuerySpec(
        _q_containment_sketch_xx, None,
        "banded containment estimation with the production xxhash64 "
        "sketch — engine-specific hash, rows-only; plan pinned by the "
        "md5 twin",
        expect_columns=("doc_a", "doc_b", "est_containment"),
        expect_rows=(1, None),
    ),
    "html_extract": QuerySpec(
        _q_html_extract, _html_extract_oracle(),
        "boilerplate-stripping HTML→text extraction (staged "
        "RE2-portable regexp chain: script/style/comment removal, "
        "block-tag newlines, entity decode, whitespace collapse) — "
        "zero shuffle, md5-pinned char-for-char",
    ),
    "k_anonymity_classes": QuerySpec(
        _q_k_anonymity, _K_ANON_SQL,
        "k-anonymity audit: quasi-identifier equivalence classes "
        "below k — one hash aggregate, risky-class-bounded output",
    ),
    "incremental_containment": QuerySpec(
        _q_incremental_containment, _CONTAINMENT_SQL,
        "corpus_diff fold of the exact containment pair table "
        "(clean-clean pairs survive, delta-restricted candidates "
        "re-derive the rest) ≡ fresh rebuild — same oracle as "
        "containment_pairs",
    ),
    "jaccard_prefix_pairs": QuerySpec(
        _q_jaccard_prefix_pairs, _PREFIX_JACCARD_SQL,
        "prefix-filtered EXACT set-similarity join (PPJoin family): "
        "rarest-first canonical prefixes prune candidates losslessly; "
        "oracle is the unblocked all-pairs computation",
    ),
    "dedup_jaccard_pairs": QuerySpec(
        _q_jaccard_pairs, _JACCARD_SQL,
        "blocked token-set Jaccard ≥0.9 near-dup pairs (exact baseline)",
    ),
    "edit_distance_pairs": QuerySpec(
        _q_edit_distance_pairs, _EDIT_PAIRS_SQL,
        "segment-filtered EXACT edit-distance self-join (PassJoin "
        "family): pigeonhole segments prune candidates losslessly, "
        "one levenshtein per candidate; oracle is naive all-pairs",
    ),
    "dup_span_removal": QuerySpec(
        _q_dup_span_removal, _dup_span_removal_sql(),
        "ExactSubstr span REMOVAL (Lee et al. ACL 2022 cleaning "
        "step): corpus-duplicated k-char runs keep exactly their "
        "first (doc_id, pos) occurrence, merged maximal spans are "
        "spliced out with one fold; clean-text md5 pins the splice "
        "byte-exact — full oracle",
    ),
    "dup_span_stats": QuerySpec(
        _q_dup_span_stats, _dup_span_sql(),
        "ExactSubstr-style per-doc duplicated-span fraction: "
        "content-keyed sampled k-char window fingerprints, cross-doc "
        "fp counts, fp-keyed join back — full oracle",
    ),
    "dedup_minhash_lsh": QuerySpec(
        _q_minhash_near_dups, None,
        "MinHash+LSH banded candidates verified by exact Jaccard (scale path)",
        expect_columns=("doc_a", "doc_b", "jaccard"),
        expect_rows=(1, None),
    ),
    "source_overlap": QuerySpec(
        _q_source_overlap, _source_overlap_sql(),
        "pairwise source-overlap matrix from mergeable per-source "
        "MinHash union sketches (md5 family, full oracle)",
    ),
    "incremental_minhash_bands": QuerySpec(
        _q_incremental_minhash_bands, _incr_bands_sql(),
        "incremental LSH band-table maintenance: id-keyed fold of an "
        "added/changed/removed delta (only the delta re-signed) ≡ "
        "fresh rebuild of the new corpus's bands, md5-pinned",
    ),
    "dedup_minhash_md5": QuerySpec(
        _q_minhash_md5, _minhash_md5_sql(),
        "MinHash+LSH with the md5 hash family — same banded plan, "
        "hash-exact DuckDB oracle pinning LSH + verify semantics",
    ),
    "dedup_simhash_pairs": QuerySpec(
        _q_simhash_pairs, None,
        "SimHash banded blocking, Hamming ≤8 near pairs",
        expect_columns=("doc_a", "doc_b", "hamming"),
        expect_rows=(1, None),
    ),
    "dedup_simhash_md5": QuerySpec(
        _q_simhash_md5, _simhash_md5_sql(),
        "SimHash with the md5 hash family — same banded plan, hash-exact "
        "DuckDB oracle pinning per-bit votes, banding, and Hamming verify",
    ),
    "dedup_clusters": QuerySpec(
        _q_dedup_clusters, _CLUSTERS_SQL,
        "iterative connected components over near-dup pairs (cluster reps) "
        "vs recursive-CTE transitive closure",
    ),
    "dedup_best_keep": QuerySpec(
        _q_dedup_best_keep, _best_keep_sql(),
        "quality-aware dedup retention: largest member kept per "
        "duplicate cluster (deterministic struct-max argmax)",
    ),
    "epoch_plan": QuerySpec(
        _q_epoch_plan, _epoch_plan_sql(),
        "epoch/repeat planning per language against token budgets "
        "(integer permille, 4-epoch repetition cap)",
    ),
    "corpus_card": QuerySpec(
        _q_corpus_card, _CORPUS_CARD_SQL,
        "per-source data card: doc/token census, quality keep rate, "
        "language-mix entropy (two-level rollup, no N+1)",
    ),
    "corpus_diff": QuerySpec(
        _q_corpus_diff, _CORPUS_DIFF_SQL,
        "snapshot-to-snapshot crawl delta by normalized fingerprint "
        "(added/removed/changed/unchanged via one full-outer join)",
    ),
    "token_stats": QuerySpec(
        _q_token_stats, _TOKEN_STATS_SQL,
        "per-doc token counting incl. BPE-ish estimate",
    ),
    "repetition_signals": QuerySpec(
        _q_repetition_signals, _REPETITION_SQL,
        "Gopher-style repetition filters: repeated-token fraction, "
        "top-bigram and duplicated-trigram char coverage + verdict",
    ),
    "quality_scores": QuerySpec(
        _q_quality_scores, _QUALITY_SQL,
        "per-doc quality heuristics + keep/drop verdict",
    ),
    "gopher_quality": QuerySpec(
        _q_gopher_rules, _GOPHER_SQL,
        "Gopher/MassiveText word-level rule battery: word count, "
        "mean word length, symbol ratio, alpha fraction, stopword "
        "presence + first-failing-rule verdict",
    ),
    "lang_agreement": QuerySpec(
        _q_lang_agreement, _lang_guess_sql(),
        "stopword-profile language-ID vs label confusion counts",
    ),
    "stratified_sample": QuerySpec(
        _q_stratified_sample, _sample_sql(),
        "deterministic md5-bucket sampling with per-language rates "
        "(zero-shuffle filter)",
    ),
    "training_mix": QuerySpec(
        _q_training_mix, _TRAINING_MIX_SQL,
        "composed corpus selection: quality gate → exact dedup → "
        "deterministic per-(lang,source) quota",
    ),
    "oov_rate": QuerySpec(
        _q_oov_rate, _OOV_SQL,
        "tokenizer-coverage QA: per-doc OOV rate of held-out docs "
        "against a top-N vocabulary learned on the reference half — "
        "broadcast vocab probe, corpus never shuffles on tokens",
    ),
    "key_skew_report": QuerySpec(
        _q_key_skew_report, _SKEW_SQL,
        "hot-key skew diagnostic: top-10 keys by count with share of "
        "all rows — rank over the aggregated key table only",
    ),
    "value_histogram": QuerySpec(
        _q_value_histogram, _HIST_SQL,
        "equi-width value histogram per event_type: deterministic "
        "floor-division bins, map-side-combined counts",
    ),
    "value_correlation": QuerySpec(
        _q_value_correlation, _CORR_SQL,
        "hash-pinnable Pearson r via exact bigint moments of "
        "quantized values + one fixed double expression",
    ),
    "funnel_steps": QuerySpec(
        _q_funnel_steps, _FUNNEL_SQL,
        "strictly-ordered per-user funnel (view→click→purchase): "
        "layered conditional-min windows over ONE user-key shuffle, "
        "epoch-second outputs",
    ),
    "funnel_conversion": QuerySpec(
        _q_funnel_conversion, _FUNNEL_CONVERSION_SQL,
        "funnel conversion table: users reaching >= each step + rate "
        "from step 1 — the funnel->rollup chain, bounded |steps| rows",
    ),
    "cohort_retention": QuerySpec(
        _q_cohort_retention, _COHORT_SQL,
        "cohort retention matrix: first-event-date cohorts, 7-day "
        "integer periods, bounded (periods x periods) rollup",
    ),
    "rollup_timeline": QuerySpec(
        _q_rollup_timeline, _ROLLUP_SQL,
        "continuous-aggregate rollup: minute partials merged to hour "
        "then day without re-scanning raw events — integer-exact "
        "decomposable state, chain ≡ direct aggregation",
    ),
    "rollup_distinct_users": QuerySpec(
        _q_rollup_distinct_users, _ROLLUP_DISTINCT_SQL,
        "distinct-users-per-day from minute-grain HLL register "
        "partials (register-wise max merge) ≡ direct day-level HLL — "
        "the non-decomposable aggregate made rollup-able",
    ),
    "encoding_signals": QuerySpec(
        _q_encoding_signals, _ENCODING_SQL,
        "encoding-damage QA: U+FFFD / control / C1 / mojibake-pair "
        "counts with first-failing-rule verdict over injected damage "
        "classes — zero-shuffle projection, integer-exact counts",
    ),
    "weighted_sample": QuerySpec(
        _q_weighted_sample, _WSAMPLE_SQL,
        "Efraimidis-Spirakis weighted sampling without replacement: "
        "-ln(u)/w exponential-race keys from content hashes, per-lang "
        "top-20 by n_chars weight — reproducible quality-weighted pick",
    ),
    "temperature_mix": QuerySpec(
        _q_temperature_mix, _TEMP_MIX_SQL,
        "temperature (α=0.5) language rebalancing: per-stratum keep "
        "rates (n_l/n_min)^(α−1) applied via deterministic hash "
        "thresholds — full oracle",
    ),
    "winnow_fingerprints": QuerySpec(
        _q_winnow_fingerprints, _WINNOW_SQL,
        "MOSS-style winnowing fingerprints (md5 shingles → rolling-min), "
        "full DuckDB oracle",
    ),
    "contamination_flags": QuerySpec(
        _q_contamination, _CONTAMINATION_SQL,
        "benchmark decontamination: corpus docs sharing winnowing "
        "fingerprints with a broadcast eval set — count/frac/verdict",
    ),
    "bloom_contamination": QuerySpec(
        _q_bloom_contamination, _BLOOM_CONTAM_SQL,
        "Bloom-bitmap decontamination: eval fingerprints compressed "
        "to a fixed 64 Kbit bitmap, corpus probed by a zero-join bit "
        "projection — one-sided-error superset of the exact verdicts",
    ),
    "fingerprint_overlap": QuerySpec(
        _q_fingerprint_overlap, _OVERLAP_SQL,
        "winnowing containment pairs with boilerplate frequency cap",
    ),
    "embedding_topk": QuerySpec(
        _q_embedding_topk, _TOPK_SQL,
        "brute-force cosine top-10 (double-fold parity)",
    ),
    "embedding_hnsw_topk": QuerySpec(
        _q_embedding_hnsw_topk, None,
        "sharded HNSW graph ANN top-10: per-shard small-world graphs "
        "in applyInPandas, shard fan-out search, global merge — "
        "deterministic (hash levels, id tie-breaks); rows-only "
        "(graph traversal not SQL); brute-force twin is full-oracle",
        expect_columns=("query_id", "neighbor_id", "rank", "cosine"),
        expect_rows=(50, 50),
        rows_oracle="SELECT 50",
    ),
    "embedding_hnsw_refine_topk": QuerySpec(
        _q_embedding_hnsw_refine_topk, None,
        "HNSW + exact-refine serving composition: rerank-deep shard "
        "shortlists, exact-cosine re-rank of merged candidates "
        "(point lookups) — rows-only (graph traversal not SQL); "
        "value discipline via the exhaustive full-oracle twin + the "
        "shared refine tail + pytest equality pins",
        expect_columns=("query_id", "neighbor_id", "rank", "cosine"),
        expect_rows=(50, 50),
        rows_oracle="SELECT 50",
    ),
    "knn_graph": QuerySpec(
        _q_knn_graph, _KNN_GRAPH_SQL,
        "exact k-NN graph: top-5 cosine neighbors for EVERY corpus "
        "vector — distributed query side (exploded block keys + "
        "shuffled equi-join), hierarchical top-k; full quadratic "
        "oracle",
    ),
    "incremental_knn_graph": QuerySpec(
        _q_incremental_knn_graph, _KNN_GRAPH_SQL,
        "incrementally-folded k-NN graph (carry+rescore unaffected, "
        "delta-score adds, full-rescan tainted/new queries) must "
        "equal the fresh rebuild — same quadratic oracle as "
        "knn_graph",
    ),
    "embedding_filtered_topk": QuerySpec(
        _q_embedding_filtered_topk, _FILTERED_TOPK_SQL,
        "predicate-constrained vector search (label = 3, ~10 % "
        "selectivity): auto strategy measures selectivity in one "
        "aggregate and picks the pre-filter exact path — full oracle",
    ),
    "embedding_filtered_graph_exhaustive": QuerySpec(
        _q_embedding_filtered_graph_exhaustive, _FILTERED_TOPK_SQL,
        "FULL-ORACLE degenerate twin of the filtered-HNSW traversal: "
        "one shard + ef ≥ N is exhaustive over allowed nodes ⇒ exact "
        "filtered top-10 through the real blocked-node navigation",
    ),
    "embedding_hnsw_refine_exhaustive": QuerySpec(
        _q_embedding_hnsw_refine_exhaustive, _TOPK_SQL,
        "FULL-ORACLE degenerate twin of embedding_hnsw_refine_topk: "
        "one shard + ef_search ≥ N makes the rerank-deep shortlist "
        "the exact top-50, so the full refine composition ≡ exact "
        "cosine top-10 (embedding_topk's oracle)",
    ),
    "embedding_hnsw_exhaustive": QuerySpec(
        _q_embedding_hnsw_exhaustive, _TOPK_SQL,
        "FULL-ORACLE degenerate twin of embedding_hnsw_topk: one "
        "shard + ef_search ≥ N makes the real graph build & greedy "
        "traversal exhaustive ⇒ ≡ exact cosine top-10 "
        "(embedding_topk's oracle)",
    ),
    "embedding_ann_lsh": QuerySpec(
        _q_lsh_ann_topk, _lsh_ann_sql(),
        "random-hyperplane LSH ANN top-10 (scale path; recall vs brute "
        "force unit-tested) — full oracle since the hyperplanes are "
        "closed-form literals",
    ),
    "incremental_ivf_topk": QuerySpec(
        _q_incremental_ivf_topk, _ivf_ann_sql(),
        "incrementally-folded IVF assignment table (carry unchanged, "
        "re-assign delta, stamp-verified quantizer) serves top-k "
        "bit-identical to the fresh build — same oracle as "
        "embedding_ann_ivf",
    ),
    "embedding_ann_ivf": QuerySpec(
        _q_ivf_ann_topk, _ivf_ann_sql(),
        "IVF ANN top-10: literal-centroid assign (zero shuffle) + "
        "probed-list exact re-rank, full DuckDB oracle",
    ),
    "embedding_pq_topk": QuerySpec(
        _q_pq_ann_topk, _pq_ann_sql(),
        "product-quantization ADC top-10 (Jégou PQ / FAISS IndexPQ "
        "shape): per-subspace decimal-exact codebooks, zero-shuffle "
        "argmin encode, asymmetric distance from codes — full DuckDB "
        "oracle re-deriving the codebooks by unrolled Lloyd",
    ),
    "embedding_pq_norm_topk": QuerySpec(
        _q_embedding_pq_norm_topk, _pq_norm_ann_sql(),
        "normalize-then-encode PQ ADC top-10 (FAISS L2norm "
        "pre-transform): unit vectors make L2-ADC order ≡ cosine "
        "order, fixing the raw-PQ metric mismatch — full oracle "
        "(normalization CTE + unrolled Lloyd)",
    ),
    "embedding_opq_topk": QuerySpec(
        _q_embedding_opq_topk, None,
        "OPQ ADC top-10 (Ge et al. / FAISS OPQMatrix): learned "
        "orthogonal rotation (alternating decimal-Lloyd + driver-side "
        "Procrustes SVD on k·d aggregates) folded into the scan, then "
        "the PQ pipeline at equal code bytes — rows-only (SVD is not "
        "SQL), schema+count pinned, uplift pytest-pinned",
        expect_columns=("query_id", "neighbor_id", "rank", "adc_dist"),
        expect_rows=(50, 50),
        rows_oracle=(
            "SELECT (SELECT count(*) FROM embeddings "
            "WHERE vec_id IN (0, 1, 2, 3, 4)) * 10"
        ),
    ),
    "embedding_opq_identity": QuerySpec(
        _q_embedding_opq_identity, _pq_ann_sql(),
        "FULL-ORACLE degenerate twin of embedding_opq_topk: identity "
        "rotation through the REAL OPQ machinery (rotate fold, "
        "opq_encode combined stamp, verify, encoded-table ADC) ⇒ ≡ "
        "plain PQ (embedding_pq_topk's unrolled-Lloyd oracle)",
    ),
    "embedding_ivf_pq_refine_topk": QuerySpec(
        _q_ivf_pq_refine_topk, _ivf_pq_res_sql(refine=(_REFINE_R, 10)),
        "two-stage IVF-PQ serving (IndexRefineFlat shape): residual "
        "ADC shortlist of R=50, exact-cosine re-rank of only those "
        "rows to top-10 — recall approaches unquantized IVF at R raw "
        "fetches per query; full oracle",
    ),
    "embedding_ivf_pq_res_topk": QuerySpec(
        _q_ivf_pq_res_topk, _ivf_pq_res_sql(),
        "residual IVF-PQ (FAISS IndexIVFPQ default): codebooks "
        "trained on v − centroid(v), per-list residual ADC — lower "
        "distortion at equal code bytes; full oracle re-derives the "
        "residual Lloyd chains",
    ),
    "embedding_ivf_pq_topk": QuerySpec(
        _q_ivf_pq_ann_topk, _ivf_pq_ann_sql(),
        "IVF-PQ ANN top-10 (IndexIVFPQ shape): probe-pruned candidate "
        "lists scored by ADC over PQ codes — one zero-shuffle corpus "
        "projection computes coarse assign AND codes; full DuckDB "
        "oracle composing both unrolled Lloyd chains",
    ),
    "multimodal_features": QuerySpec(
        _q_multimodal_features, _multimodal_sql(),
        "binary media column → Arrow-batched mapInPandas feature extraction "
        "(deterministic stub decode, element-projected, exact oracle)",
    ),
    "embedding_near_dups": QuerySpec(
        _q_embedding_near_dups, _EMB_NEAR_DUPS_SQL,
        "embedding-cosine near-dup pairs via LSH bands — full oracle "
        "(closed-form hyperplanes); gate verifies at 0.4 (top of the "
        "random-cosine distribution so the verify path has real "
        "output), production setting is ≥0.95",
    ),
    "quality_quantile_sketch": QuerySpec(
        _q_quality_quantile_sketch, _QUANTILE_SKETCH_SQL,
        "mergeable GK quantile sketch, posexploded; exact vs quantile_disc "
        "at gate scale (buffer uncompressed)",
    ),
    "hll_md5_distinct": QuerySpec(
        _q_hll_md5, _HLL_MD5_SQL,
        "hand-rolled md5-family HLL: registers, exact scaled harmonic "
        "sum, bias-corrected estimate — full DuckDB oracle",
    ),
    "hll_distinct_sketch": QuerySpec(
        _q_hll_distinct_sketch, None,
        "mergeable HLL++ distinct sketch per group (estimates are "
        "engine-specific; exact twin distinct_counts)",
        expect_columns=("lang", "approx_sources", "cnt"),
        expect_rows=(1, None),
        # groupBy keeps a NULL-lang group; count(DISTINCT) does not.
        rows_oracle=(
            "SELECT count(DISTINCT lang)"
            " + CASE WHEN count(*) FILTER (WHERE lang IS NULL) > 0"
            " THEN 1 ELSE 0 END FROM documents"
        ),
    ),
}
