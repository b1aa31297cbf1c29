"""Deduplication operators (X1 exact, X2 MinHash/LSH, SimHash, n-gram
Jaccard) — the training-data-pipeline dedup suite.

Scale design:
- Exact dedup is a single shuffle on the dedup key (window row_number keeps
  a deterministic survivor; ``dropDuplicates`` would keep an arbitrary one).
- MinHash/LSH: per-doc signatures are computed scan-side (no shuffle), then
  candidate generation shuffles once on (band_id, band_hash) — each bucket
  is tiny, so the self-join never materializes the full O(n^2) pair space.
  This is the standard web-scale near-dup pipeline shape.
- SimHash: 64-bit signature from per-token hash bit votes; candidates pair
  on 16-bit chunks (Hamming-distance blocking), same bucketed-join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_weather_spark.registry import register
from presto_weather_spark.session import load_table

N_HASHES = 16  # MinHash signature length
N_BANDS = 4  # LSH bands (4 rows per band)
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_K = 3  # tokens per shingle


def _tokens() -> F.Column:
    return F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")


def _hashed_gram_stream(
    tokened: DataFrame, k: int, keep_short_head: bool
) -> DataFrame:
    """(doc_id, pos, gh) stream of k-token window hashes with NO gram
    strings (round-10 optimization, guide §2.3/§4.2): hash each token once,
    combine k consecutive token hashes with a multi-arg xxhash64 over
    lead() columns — the minhash_signatures idiom. Everything stays in
    WholeStageCodegen; the interpreted transform(i -> concat_ws(slice(...)))
    lambda it replaces allocated every gram string and copied each token k
    times, and every downstream exchange/join shipped ~(k x token) bytes
    per row where 8 now go. gh identifies the gram string injectively
    short of a 64-bit collision — the exact trade x18/x40/x115 already
    ship against their string-gram DuckDB oracles (~n^2/2^65 collision
    odds; ~3e-9 at a million grams).

    ``tokened`` must be (doc_id, ts) with ts the token array, partitioned
    by doc_id (the lead window then sorts in place, no new exchange).
    pos is 1-based. keep_short_head=True keeps the pos==1 truncated
    window of docs shorter than k tokens (the array-slice builders'
    sequence(1, greatest(n-k+1, 1)) emitted one partial gram there);
    xxhash64 skips NULL lead columns, so the truncated hash is consistent
    across docs. n=0 (empty/whitespace-only text): this stream emits
    NOTHING — which MATCHES the DuckDB oracles, probe-verified in round
    11: the oracles' array_to_string(list_slice(toks, i, i+2), ' ') over
    an empty token list is NULL (not ''), and the enclosing
    list_distinct drops NULLs, so the oracle side emits zero grams for a
    zero-token doc too. (The round-9 STRING builders' concat_ws over the
    empty slice produced '' and silently DIVERGED from the oracles on
    such docs; the round-10 posexplode rewrite fixed that by accident.
    The round-11 advisor flagged the opposite direction — disproved by
    the probe; parity on planted empty/whitespace/NULL-text corpora is
    pinned in tests/test_degenerate_text.py.) NULL text also emits
    nothing on both sides. keep_short_head=False emits complete windows
    only (docs shorter than k tokens contribute nothing)."""
    th = tokened.select(
        "doc_id", F.posexplode("ts").alias("pos0", "tok")
    ).select("doc_id", "pos0", F.xxhash64("tok").alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos0")
    leads = [F.lead("h", i).over(w) for i in range(1, k)]
    keep = F.col("tail").isNotNull()
    if keep_short_head:
        keep = keep | (F.col("pos0") == 0)
    return (
        th.select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.xxhash64(F.col("h"), *leads).alias("gh"),
            leads[-1].alias("tail"),
        )
        .filter(keep)
        .select("doc_id", "pos", "gh")
    )


@register(
    "x01_exact_dedup",
    oracle="""
WITH ranked AS (
  SELECT event_id, user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_id, user_id, event_type,
       round(value, 6) AS value,
       CAST(date_trunc('second', ts) AS VARCHAR) AS ts_str
FROM ranked WHERE rn = 1
""",
    doc="X1: exact dedup keeping a deterministic survivor (latest ts, then "
    "highest id) per (user_id, event_type) — row_number window, one "
    "shuffle; the auditable form of dropDuplicates.",
)
def x01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Round-10 optimization (the r14 move): the rank-1 window (exchange +
    # per-key sort of every event) becomes a map-side-combinable
    # max(struct(ts, event_id, value)) — struct ordering is exactly
    # ORDER BY ts DESC, event_id DESC's first row ((ts, event_id) unique
    # per group; the carried value never tips a comparison).
    return (
        e.groupBy("user_id", "event_type")
        .agg(
            F.max(
                F.struct(
                    F.col("ts").alias("ts"),
                    F.col("event_id").alias("event_id"),
                    F.col("value").alias("value"),
                )
            ).alias("m")
        )
        .select(
            F.col("m.event_id").alias("event_id"),
            "user_id",
            "event_type",
            F.round(F.col("m.value"), 6).alias("value"),
            F.date_format(F.col("m.ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )


@register(
    "x01b_distinct_rows",
    oracle="""
SELECT DISTINCT lang, source FROM documents
""",
    doc="X1: plain DISTINCT (hash-aggregate form of exact dedup).",
)
def x01b_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("lang", "source").distinct()


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id -> MinHash signature (array of N_HASHES min-hashes).

    Shape: shingle (SHINGLE_K-token windows) -> explode -> one xxhash64 per
    shingle -> hash-aggregate with N_HASHES ``min(xxhash64(h, salt))``
    columns.  The aggregate keeps everything inside WholeStageCodegen with
    map-side partial mins, so each shingle string is tokenized and hashed
    exactly once; the per-salt re-hash works on a fixed-width bigint.  (The
    earlier formulation — nested ``transform`` lambdas re-hashing the
    shingle strings per salt — ran ~15x slower because higher-order
    functions are interpreted and Catalyst inlines the whole shingle
    subtree into every salt branch.)  The only shuffle is the partial->final
    aggregate exchange on doc_id, which LSH banding needs anyway.
    """
    # The corpus may arrive as a handful of large parquet row groups (one,
    # at test scale) — repartition so the CPU-bound shingle+hash work uses
    # every core. The explicit partition count matters: a column-only
    # repartition is a coalescible shuffle, and AQE would fold this tiny
    # (by bytes) but compute-heavy input back into one partition.
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(n_parts, "doc_id")
    # Shingle hashes WITHOUT building shingle strings: hash each token once,
    # then combine SHINGLE_K consecutive token hashes via lead() over
    # (doc_id, pos) — multi-arg xxhash64 is the combiner. Everything stays
    # in WholeStageCodegen (the earlier concat_ws(slice(toks, i, k)) inside
    # a transform() lambda was interpreted AND copied every token k times;
    # this form is ~1.9x faster and allocates no intermediate strings).
    # The window's sort shares the one exchange the final aggregate needs.
    # Zero-token docs (empty/whitespace-only/NULL text) explode to nothing
    # and get no signature — deliberate: the exact-gram oracles also emit
    # zero grams for such docs (round-11 probe: the oracles'
    # array_to_string over an empty slice is NULL and list_distinct drops
    # it), so un-signed empty docs can never cost gate recall; parity is
    # pinned in tests/test_degenerate_text.py.
    th = docs.select("doc_id", F.posexplode(_tokens()).alias("pos", "tok")).select(
        "doc_id", "pos", F.xxhash64("tok").alias("h")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("h", i).over(w) for i in range(1, SHINGLE_K)]
    shingle_hash = F.xxhash64(F.col("h"), *leads)
    return (
        th.select("doc_id", "pos", shingle_hash.alias("sh"), leads[-1].alias("tail"))
        # Drop the last SHINGLE_K-1 positions (incomplete windows); a doc
        # shorter than SHINGLE_K tokens keeps its (partial) first window so
        # every doc still gets a signature.
        .filter(F.col("tail").isNotNull() | (F.col("pos") == 0))
        .groupBy("doc_id")
        .agg(
            F.array(
                *[F.min(F.xxhash64(F.col("sh"), F.lit(salt))) for salt in range(N_HASHES)]
            ).alias("sig")
        )
    )


@register(
    "x02_minhash_near_dup",
    oracle=None,  # xxhash64-based signatures are engine-specific -> rows-only
    doc="X2: MinHash+LSH near-duplicate candidate pairs. Signatures "
    "scan-side; one shuffle on (band, band_hash); per-bucket self-join; "
    "exact signature-overlap estimate on candidates only. Rows-only check "
    "(no shared hash fn with DuckDB); pytest verifies planted duplicates.",
)
def x02_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(d)


def minhash_near_dup_pairs(d: DataFrame) -> DataFrame:
    """Candidate near-duplicate pairs for any (doc_id, text) DataFrame —
    the reusable core of x02 (tested on planted duplicates in
    tests/test_dedup.py)."""
    # The signature table feeds three plan branches (band explode + two
    # re-attach joins). Exchange reuse only dedups the pre-aggregate
    # repartition — the tokenize+window+min-hash aggregate would still run
    # once per branch — so materialize signatures exactly once with a lazy
    # localCheckpoint (2.5x at sf0.1; the per-executor block is
    # n_docs/n_parts x 16 bigints, trivially memory-safe at any scale).
    sigs = minhash_signatures(d).localCheckpoint(eager=False)
    # Keep the 16-bigint signature OUT of the band self-join: band rows are
    # (doc_id, band_hash) only — N_BANDS x narrower through the shuffle and
    # the distinct. The per-band id is folded into band_hash by salting the
    # hash with the band index (colliding across different bands is as
    # unlikely as any 64-bit collision). Signatures re-attach to the tiny
    # surviving pair set by two joins.
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.xxhash64(
                    b,
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND),
                            lambda h: h.cast("string"),
                        ),
                    ),
                ),
            )
        ).alias("band_hash"),
    )

    left = bands.alias("a")
    right = bands.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sig_a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(sig_a, "doc_a").join(sig_b, "doc_b")
    overlap = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / N_HASHES
    )
    return joined.select(
        "doc_a", "doc_b", F.round(overlap, 4).alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= 0.5)


# x02b's pair CTEs, shared with x02f's recursive-closure oracle.
_X02B_PAIRS_SQL = """grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS INT) - 2, 1) + 1),
           i -> array_to_string(list_slice(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''), i, i + 2), ' ')))) AS gram
  FROM documents
  WHERE doc_id < 60
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         COUNT(*) AS inter_size
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (
  SELECT doc_id, COUNT(DISTINCT gram) AS n_grams FROM grams GROUP BY doc_id
),
jacc AS (
  SELECT p.doc_a, p.doc_b,
         round(CAST(p.inter_size AS DOUBLE) / (sa.n_grams + sb.n_grams - p.inter_size), 6) AS jaccard
  FROM pairs p
  JOIN sizes sa ON p.doc_a = sa.doc_id
  JOIN sizes sb ON p.doc_b = sb.doc_id
  WHERE p.inter_size * 5 >= (sa.n_grams + sb.n_grams - p.inter_size)
)"""


@register(
    "x02b_ngram_jaccard",
    oracle="WITH " + _X02B_PAIRS_SQL + "\nSELECT doc_a, doc_b, jaccard FROM jacc",
    doc="X2: exact n-gram (3-token shingle) Jaccard similarity on a doc "
    "subset — the exact counterpart MinHash approximates; inverted-index "
    "join on shared grams instead of a cross join (the scalable exact "
    "form). Subset keeps the oracle cheap; the operator itself is "
    "unbounded.",
)
def x02b_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    toks = _tokens()
    n = F.size(toks)
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
        )
    )
    grams = d.select("doc_id", F.explode(grams_arr).alias("gram"))
    sizes = grams.groupBy("doc_id").agg(F.countDistinct("gram").alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("inter_size").cast("double") / (
        F.col("sa.n_grams") + F.col("sb.n_grams") - F.col("inter_size")
    )
    return (
        inter.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        # threshold in INTEGER space (inter/union >= 1/5 <=> 5*inter >=
        # union; union > 0 always) — the float quotient sits exactly ON
        # the boundary for unions divisible by 5, where a double compare
        # is engine-representation roulette
        .filter(
            F.col("inter_size") * 5
            >= F.col("sa.n_grams") + F.col("sb.n_grams") - F.col("inter_size")
        )
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "x02c_simhash",
    oracle=None,  # hash-dependent -> rows-only; pytest covers goldens.
    doc="X2: 64-bit SimHash signatures — per-token xxhash64 bit votes "
    "(+1/-1 per bit, weighted by term frequency), sign-packed into a "
    "bigint; near-dup candidates block on 16-bit chunks. Scan-side only "
    "here (signatures + chunk keys); rows-only check.",
)
def x02c_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_bits = 32  # 32-bit simhash: plenty for blocking at these corpus sizes
    d = load_table(spark, sf_dir, "documents")
    # Explode tokens and hash each once, then one hash-aggregate with
    # n_bits SUM(+-1) vote columns — all WholeStageCodegen with map-side
    # partial sums (an ``F.aggregate`` fold per bit would be interpreted
    # and re-traverse the token array 32 times).  Empty docs keep a row via
    # the single-empty-token guard, so output row count == input row count.
    toks = _tokens()
    guarded = F.when(F.size(toks) == 0, F.array(F.lit(""))).otherwise(toks)
    # Explicit count: AQE would coalesce a column-only repartition of
    # this byte-small, compute-heavy input back to one partition.
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism, "doc_id")
    hashed = d.select("doc_id", F.explode(guarded).alias("tok")).select(
        "doc_id", F.xxhash64("tok").alias("h")
    )
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"v{bit}")
            for bit in range(n_bits)
        ]
    )
    simhash = None
    for bit in range(n_bits):
        term = F.when(F.col(f"v{bit}") > 0, F.lit(1 << bit).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        simhash = term if simhash is None else simhash.bitwiseOR(term)
    out = votes.select("doc_id", simhash.alias("simhash"))
    return out.select(
        "doc_id",
        "simhash",
        *[
            F.shiftright(F.col("simhash"), 16 * i)
            .bitwiseAND(F.lit(0xFFFF))
            .alias(f"chunk_{i}")
            for i in range(2)
        ],
    )


@register(
    "x02f_neardup_clusters",
    oracle="WITH RECURSIVE " + _X02B_PAIRS_SQL + """,
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jacc
  UNION ALL
  SELECT doc_b, doc_a FROM jacc
),
nodes AS (SELECT doc_id FROM documents WHERE doc_id < 60),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
""",
    doc="X2: near-duplicate CLUSTER assignment — connected components over "
    "the x02b Jaccard pair graph via iterative min-label propagation "
    "(each doc's cluster id = min doc_id reachable through near-dup "
    "edges); isolated docs form singleton clusters. The driver loop runs "
    "O(graph diameter) rounds, each a distributed join+min-agg, with "
    "localCheckpoint truncating lineage — the standard Spark CC shape "
    "(large-star/small-star halves the rounds at 100 TB; the per-round "
    "plan is identical). Oracle: recursive-CTE transitive closure, "
    "viable only at oracle scale.",
)
def x02f_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = x02b_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    nodes = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id")
    )
    return min_label_clusters(nodes, pairs)


def min_label_clusters(nodes: DataFrame, pairs: DataFrame) -> DataFrame:
    """O(diameter)-round min-label propagation CC over undirected pairs.

    Exposed separately from x02f so the non-trivial path (multi-node
    components) is unit-testable on synthetic edge sets — the fixture
    corpus yields zero x02b pairs at every sf, which would otherwise
    leave the loop body exercised only by the edgeless early-return.
    """
    edges = _symmetric(pairs)
    edges = edges.persist()
    n_edges = edges.count()  # materializes the cache; one pass over pairs
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    if n_edges == 0:  # edgeless graph: every node is its own fixpoint
        edges.unpersist()
        return labels
    # Min-label propagation to fixpoint: label(v) <- min(label(v),
    # min(label(u) for u~v)). Converges in <= diameter rounds; the loop is
    # driver-side control flow only — every round is one shuffle join +
    # one min-aggregate, fully distributed. Convergence check: labels only
    # ever decrease, so sum(cluster_id) strictly drops iff any label
    # changed — one scalar agg over the just-checkpointed frame instead of
    # a labels-vs-labels join.
    prev_sum = None
    converged = False
    # Hard ceiling = node count (min-label propagation converges in at most
    # diameter < |V| rounds on any graph); hitting it means the convergence
    # check itself is broken, and silently returning partial labels would
    # hand the caller WRONG clusters — raise instead.
    max_rounds = max(int(nodes.count()), 1) + 1
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"min_label_clusters did not converge in {max_rounds} rounds "
            "(convergence invariant violated)"
        )
    return labels


# ---------------------------------------------------------------------------
# X19 — cross-document chunk dedup (CCNet/C4-style duplicated-span profile)
# ---------------------------------------------------------------------------

CHUNK_LEN = 16  # characters per chunk (aligned, non-overlapping)


@register(
    "x19_chunk_dedup",
    oracle=f"""
WITH ch AS (
  SELECT doc_id, md5(substr(text, CAST(s AS INT), {CHUNK_LEN})) AS h
  FROM documents,
       unnest(generate_series(1, greatest(len(text), 1), {CHUNK_LEN})) AS t(s)
),
freq AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs FROM ch GROUP BY h
)
SELECT ch.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (freq.n_docs > 1) AS BIGINT) AS dup_chunks,
       round(count(*) FILTER (freq.n_docs > 1) * 1.0 / count(*), 4) AS dup_ratio
FROM ch JOIN freq USING (h)
GROUP BY ch.doc_id
""",
    doc="X19: cross-document duplicated-span profile (the CCNet/C4 "
    "paragraph-dedup shape, adapted to aligned 16-char chunks because the "
    "corpus has no newlines): chunk each document, hash chunks with md5 "
    "(identical in Spark and DuckDB, so fully oracle-checkable), count "
    "distinct docs per chunk, and report per-doc duplicated-chunk ratio. "
    "Scale: the chunk table is |corpus|/16 rows built scan-side (explode, "
    "no shuffle); then one shuffle to count docs per hash and one to "
    "re-aggregate per doc — both on high-cardinality keys, no skew. At "
    "100 TB you would drop the join-back and instead anti-join docs whose "
    "ratio exceeds a threshold (same two-shuffle profile).",
)
def x19_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # single-row-group fixture scan -> fan the chunking out across cores
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    starts = F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_LEN))
    ch = d.select("doc_id", "text", F.explode(starts).alias("s")).select(
        "doc_id",
        F.md5(F.col("text").substr(F.col("s"), F.lit(CHUNK_LEN))).alias("h"),
    )
    # ch feeds both the frequency aggregate and the join-back; checkpoint the
    # (doc_id, hash) table once instead of re-running explode+md5 per branch
    # (the x18 gram-table pattern)
    ch = ch.localCheckpoint(eager=False)
    freq = ch.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
    dup = F.when(F.col("n_docs") > 1, 1).otherwise(0)
    return (
        ch.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(dup).alias("dup_chunks"),
            F.round(F.sum(dup) / F.count(F.lit(1)), 4).alias("dup_ratio"),
        )
    )


@register(
    "x29_dedup_lineage",
    oracle="""
WITH h AS (SELECT doc_id, md5(substr(text, 1, 64)) AS h FROM documents),
g AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY h) AS survivor_id,
         count(*) OVER (PARTITION BY h) AS group_size
  FROM h
)
SELECT doc_id, survivor_id, CAST(group_size AS BIGINT) AS group_size
FROM g WHERE doc_id <> survivor_id
""",
    doc="X29: exact-dedup lineage — the audit twin of x01: for every "
    "removed duplicate, which document survived and how large its "
    "duplicate group was (provenance for dataset cards / removal "
    "receipts). Keyed on md5 of the normalized first 64 chars (shared-"
    "boilerplate-prefix dedup; any normalization slots into the same "
    "plan) so the shuffle moves 16-byte digests, never document bodies "
    "(the wide-column-out-of-shuffle rule); min/count windows over one "
    "exchange on the digest.",
)
def x29_dedup_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id", F.md5(F.substring("text", 1, 64).cast("binary")).alias("h")
    )
    w = Window.partitionBy("h")
    g = h.select(
        "doc_id",
        F.min("doc_id").over(w).alias("survivor_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    )
    return g.filter(F.col("doc_id") != F.col("survivor_id")).select(
        "doc_id", "survivor_id", "group_size"
    )


@register(
    "x34_quality_aware_dedup",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, source, n_chars,
         md5(substr(text, 1, 64)) AS grp,
         round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / length(text), 6) AS alpha_ratio
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY grp
                               ORDER BY alpha_ratio DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY grp) AS group_size
  FROM scored
)
SELECT doc_id, lang, source, alpha_ratio,
       CAST(group_size AS BIGINT) AS group_size
FROM ranked WHERE rn = 1
""",
    doc="X34: QUALITY-AWARE dedup survivor selection — where x01/x29 keep "
    "a positional survivor (latest/lowest id), production curation keeps "
    "the highest-QUALITY duplicate: groups share the x29 boilerplate-"
    "prefix digest, the survivor maximizes alphabetic ratio (x09's "
    "quality ingredient) with doc_id as the deterministic tiebreak. "
    "Same one-shuffle row_number profile as x01 — the policy, not the "
    "plan, changes; scoring is scan-side so the shuffle still moves "
    "only digests and scalars.",
)
def x34_quality_aware_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    alpha = F.round(
        F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", "")).cast("double")
        / F.length("text"),
        6,
    )
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.md5(F.substring("text", 1, 64).cast("binary")).alias("grp"),
        alpha.alias("alpha_ratio"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("alpha_ratio").desc(), "doc_id")
    wc = Window.partitionBy("grp")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "alpha_ratio", "group_size")
    )


SEMDEDUP_TAU_E6 = 300000  # micro-unit integer threshold (no float literal)
SEMDEDUP_TAU = 0.30  # within-orthant cosine threshold (driver embeddings
# carry no true dups; 0.30 sits in the upper tail so ~100 pairs fire)
SEMDEDUP_BITS = 4  # sign bits -> 2^4 coarse cells


def _sign_bucket_sql() -> str:
    terms = [
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << (SEMDEDUP_BITS - 1 - i)} ELSE 0 END)"
        for i in range(SEMDEDUP_BITS)
    ]
    return " + ".join(terms)


@register(
    "x36_semantic_dedup",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_sign_bucket_sql()} AS bucket
  FROM embeddings
),
dups AS (
  SELECT a.vec_id,
         COUNT(*) AS n_dups_below
  FROM e a JOIN e b ON a.bucket = b.bucket AND b.vec_id < a.vec_id
  WHERE CAST(round(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT)
          >= {SEMDEDUP_TAU_E6}
  GROUP BY a.vec_id
)
SELECT e.vec_id, CAST(e.bucket AS INT) AS bucket,
       CAST(COALESCE(d.n_dups_below, 0) AS INT) AS n_dups_below,
       CAST(d.vec_id IS NULL AS BOOLEAN) AS kept
FROM e LEFT JOIN dups d ON e.vec_id = d.vec_id
""",
    doc="X36: SemDeDup-shaped semantic deduplication — embeddings are "
    "blocked into coarse cells (here: the orthant sign-bits of the leading "
    "dimensions, the axis-aligned special case of LSH hyperplanes; a "
    "production run uses the x15 k-means centroids as cells), then only "
    "intra-cell pairs are scored and a vector is dropped when any "
    "lower-id cell-mate has cosine >= tau. One shuffle on the cell id; "
    "each cell is scored as a single normalized matmul in applyInPandas "
    "(Arrow-batched, BLAS) — the pair space is O(sum cell^2), never "
    "O(n^2), and cells shrink as bits/centroids grow, which is the 100-TB "
    "scale knob. Survivor rule (lowest vec_id wins) is deterministic and "
    "order-free.",
)
def x36_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    bucket = sum(
        F.when(F.element_at("embedding", i + 1) >= 0, F.lit(1 << (SEMDEDUP_BITS - 1 - i))).otherwise(F.lit(0))
        for i in range(SEMDEDUP_BITS)
    ).cast("int")
    cells = emb.select("vec_id", "embedding", bucket.alias("bucket"))

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        # micro-unit integer grid — same values as np.round(x, 6)
        # (which computes round(x*1e6)/1e6) with an exact int compare
        sims_e6 = np.round(unit @ unit.T * 1e6)
        below = np.tril(sims_e6 >= SEMDEDUP_TAU_E6, k=-1)  # lower vec_id
        n_dups = below.sum(axis=1).astype(np.int32)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "bucket": pdf["bucket"].astype(np.int32),
                "n_dups_below": n_dups,
                "kept": n_dups == 0,
            }
        )

    return cells.groupBy("bucket").applyInPandas(
        score_cell, "vec_id bigint, bucket int, n_dups_below int, kept boolean"
    )


CONTAIN_NGRAM = 8  # token-shingle width for containment sets
CONTAIN_DF_MIN = 2  # a gram must repeat across docs to block a pair
CONTAIN_DF_CAP = 16  # drop boilerplate grams (df > cap) from the sets


@register(
    "x40_ngram_containment",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(1, greatest(CAST(len(t) AS INT) - {CONTAIN_NGRAM - 1}, 0) + 1),
           i -> array_to_string(list_slice(t, i, i + {CONTAIN_NGRAM - 1}), ' '))) AS gram
  FROM toks WHERE len(t) >= {CONTAIN_NGRAM}
),
df AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING COUNT(*) BETWEEN {CONTAIN_DF_MIN} AND {CONTAIN_DF_CAP}
),
capped AS (SELECT grams.doc_id, grams.gram FROM grams JOIN df USING (gram)),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM capped GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM capped a JOIN capped b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT p.doc_a, p.doc_b, p.n_shared,
         round(CAST(p.n_shared AS DOUBLE) / sa.n_grams, 6) AS containment_a,
         round(CAST(p.n_shared AS DOUBLE) / sb.n_grams, 6) AS containment_b
  FROM pairs p
  JOIN sizes sa ON p.doc_a = sa.doc_id
  JOIN sizes sb ON p.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, n_shared, containment_a, containment_b
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_a
    ORDER BY containment_a DESC, n_shared DESC, doc_b) AS rn
  FROM scored
) WHERE rn = 1
""",
    doc="X40: n-gram containment — the asymmetric cousin of Jaccard that "
    "catches SUB-document duplication (quotes, syndicated passages, "
    "wrapped boilerplate) which symmetric near-dup misses: "
    "C(A,B) = |grams(A) n grams(B)| / |grams(A)|. Gram sets are "
    "df-capped ([2,16]): singleton grams cannot block a pair and "
    "boilerplate grams (df > cap) would explode the candidate space — "
    "the cap is the 100-TB lever, bounding every gram's fan-out so the "
    "gram self-join stays O(sum df^2) with df <= cap. Per doc, the "
    "best containing candidate survives (deterministic tiebreaks). "
    "Spark joins on xxhash64(gram) so 8-byte keys shuffle, never gram "
    "strings; the oracle joins the strings — identical short of a "
    "64-bit collision.",
)
def x40_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from presto_weather_spark.operators.text_analysis import _spread

    d = _spread(load_table(spark, sf_dir, "documents"))
    # Round-10: hash each token ONCE and combine k hashes with multi-arg
    # xxhash64 — the old concat_ws(tok, lead...) allocated a k-token gram
    # string per position AND shipped token strings through the window
    # sort; now only 8-byte longs ride the sort and no string is built.
    # Same key class (injective short of a 64-bit collision).
    th = d.select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "tok")
    ).select("doc_id", "pos", F.xxhash64("tok").alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("h", i).over(w) for i in range(1, CONTAIN_NGRAM)]
    grams = (
        th.select(
            "doc_id",
            F.xxhash64(F.col("h"), *leads).alias("gh"),
            leads[-1].alias("tail"),
        )
        .filter(F.col("tail").isNotNull())
        .select("doc_id", "gh")
        .distinct()
        .localCheckpoint(eager=False)  # feeds df, capped, and the self-join
    )
    df = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(CONTAIN_DF_MIN, CONTAIN_DF_CAP))
        .select("gh")
    )
    capped = grams.join(F.broadcast(df), "gh").localCheckpoint(eager=False)
    sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), "gh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    scored = (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_grams", "na")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_grams", "nb"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(F.col("n_shared").cast("double") / F.col("na"), 6).alias(
                "containment_a"
            ),
            F.round(F.col("n_shared").cast("double") / F.col("nb"), 6).alias(
                "containment_b"
            ),
        )
    )
    rank = Window.partitionBy("doc_a").orderBy(
        F.col("containment_a").desc(), F.col("n_shared").desc(), F.col("doc_b")
    )
    return (
        scored.withColumn("rn", F.row_number().over(rank))
        .filter(F.col("rn") == 1)
        .select("doc_a", "doc_b", "n_shared", "containment_a", "containment_b")
    )


# ---------------------------------------------------------------------------
# X53 — leakage-safe train/test split (split by near-dup cluster, not doc)
# ---------------------------------------------------------------------------


@register(
    "x53_leakage_safe_split",
    oracle="WITH RECURSIVE " + _X02B_PAIRS_SQL + """,
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jacc
  UNION ALL
  SELECT doc_b, doc_a FROM jacc
),
nodes AS (SELECT doc_id FROM documents WHERE doc_id < 60),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
clusters AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
SELECT doc_id, cluster_id,
       CASE WHEN CAST(('0x' || substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 4)) AS INT) % 10 < 8
            THEN 'train' ELSE 'test' END AS split
FROM clusters
""",
    doc="X53: LEAKAGE-SAFE train/test split — x07's md5-bucket split keyed "
    "by NEAR-DUP CLUSTER id instead of document id, so near-duplicate "
    "documents can never straddle the split boundary (per-doc splits "
    "leak: a test doc's near-twin in train inflates eval). Composes "
    "x02f's connected components with the deterministic hash-bucket "
    "assignment; every member of a cluster inherits the cluster "
    "representative's bucket. The same-cluster-same-split invariant is "
    "asserted in tests/test_properties.py. Scale: adds one md5 over the "
    "cluster id per doc on top of the clustering job — the split itself "
    "is free.",
)
def x53_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = x02f_neardup_clusters(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("split"), F.col("cluster_id"))), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % 10
    )
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 8, "train").otherwise("test").alias("split"),
    )


# ---------------------------------------------------------------------------
# X61 — LSH banding quality evaluation (candidate set vs exact pairs)
# ---------------------------------------------------------------------------


@register(
    "x61_lsh_banding_eval",
    oracle=None,  # the MinHash side hinges on xxhash64 (engine-specific) ->
    # rows-only; precision/recall floors pinned in tests/test_properties.py.
    doc="X61: LSH BANDING EVALUATION — the self-audit every MinHash "
    "deployment needs: the banded candidate pairs (x02) are scored "
    "against the exact n-gram Jaccard pairs (x02b) on the same doc "
    "subset, reporting candidate/exact/hit counts and the "
    "precision/recall of the banding scheme. This is how band/row "
    "parameters are tuned in practice: recall too low -> more bands "
    "(catch more of the S-curve's left tail); precision too low -> "
    "longer rows. Both inputs are deterministic, so the eval is "
    "reproducible; at 100 TB the exact side runs on a small audit "
    "SAMPLE (as here) because exact all-pairs is exactly what LSH "
    "exists to avoid.",
)
def x61_lsh_banding_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    # Each side feeds two actions (its own count + the hit join) —
    # localCheckpoint so the MinHash-signature and exact-Jaccard
    # pipelines run ONCE each instead of twice.
    cand = (
        minhash_near_dup_pairs(d).select("doc_a", "doc_b").localCheckpoint()
    )
    exact = (
        x02b_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    n_cand = cand.count()
    n_exact = exact.count()
    n_hits = cand.join(exact, ["doc_a", "doc_b"]).count()
    precision = round(n_hits / n_cand, 6) if n_cand else 1.0
    recall = round(n_hits / n_exact, 6) if n_exact else 1.0
    return spark.createDataFrame(
        [(n_cand, n_exact, n_hits, precision, recall)],
        "n_candidates bigint, n_exact bigint, n_hits bigint, "
        "precision double, recall double",
    )


# ---------------------------------------------------------------------------
# X2g — banding recall gate (the driver-HASHABLE fidelity twin of x02/x61)
# ---------------------------------------------------------------------------

X02G_SUBSET = 2000  # audit subset: enough docs to carry dozens of real pairs
X02G_JACC_NUM, X02G_JACC_DEN = 7, 20  # exact threshold j >= 7/20 = 0.35
X02G_RECALL_NUM, X02G_RECALL_DEN = 9, 10  # banding must catch >= 90%


@register(
    "x02g_banding_recall_gate",
    oracle=f"""
WITH grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS INT) - 2, 1) + 1),
           i -> array_to_string(list_slice(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''), i, i + 2), ' ')))) AS gram
  FROM documents
  WHERE doc_id < {X02G_SUBSET}
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sizes AS (
  SELECT doc_id, COUNT(DISTINCT gram) AS n_grams FROM grams GROUP BY doc_id
)
SELECT p.doc_a, p.doc_b,
       CAST((2 * p.inter_size * 1000000
               + (sa.n_grams + sb.n_grams - p.inter_size))
            // (2 * (sa.n_grams + sb.n_grams - p.inter_size))
            AS BIGINT) AS jaccard_e6
FROM pairs p
JOIN sizes sa ON p.doc_a = sa.doc_id
JOIN sizes sb ON p.doc_b = sb.doc_id
WHERE p.inter_size * {X02G_JACC_DEN}
      >= {X02G_JACC_NUM} * (sa.n_grams + sb.n_grams - p.inter_size)
""",
    doc="X2g: BANDING RECALL GATE — the hash-verifiable fidelity twin of "
    "the rows-only x02/x61 family (round-8 verdict task #6). The OUTPUT "
    "is the exact 3-gram Jaccard pair set on a 2000-doc audit subset at "
    "the pinned integer threshold j >= 7/20 (micro-unit integer rational "
    "jaccard_e6 — fully DuckDB-reproducible, so the driver hash-verifies "
    "every row). The BANDING fidelity rides an in-engine gate the oracle "
    "never sees: before returning, the x02 banded candidate set is "
    "intersected with these exact pairs and the run RAISES if recall "
    "drops below the pinned 9/10 floor — a broken band hash, dropped "
    "band, or mis-sliced signature collapses recall to ~the single-band "
    "S-curve (~0.2 here) and turns every driver sample and audit of "
    "this key into a loud failure instead of a silently stale "
    "rows-only count. Recall on the current fixtures: 27/28 (sf0.001), "
    "24/25 (sf0.01), 45/45 (sf0.1). At 100 TB this is the standing "
    "audit-sample pattern: exact side on a bounded subset, candidate "
    "side the production banding, the floor a deploy gate.",
)
def x02g_banding_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < X02G_SUBSET
    )
    dp = d.sparkSession.sparkContext.defaultParallelism
    # Round-10 optimization: 3-gram HASHES via the lead-window token-hash
    # idiom (_hashed_gram_stream) instead of interpreted transform() gram
    # strings; the in-doc dedup the old array_distinct did happens in a
    # distinct() whose (doc_id, gh) clustering is satisfied by the doc_id
    # partitioning — no extra exchange. Same output short of a 64-bit
    # collision (the x18/x40 convention; ~2000 docs x ~e2 grams here).
    #
    # Explicit gh partitioning (user repartition — AQE does not coalesce
    # it) + one materialization for the three consumers (both self-join
    # branches and the sizes aggregate). Without this the CPU-heavy pair
    # join ran nearly single-task: AQE coalesces shuffle reads by BYTES,
    # and the gram table is small in bytes but quadratic in join output.
    # Measured 3.5 s -> 2.1 s on the exact join at sf0.1 (strings, r9);
    # the 8-byte keys shrink the same exchange/join a further step.
    tokened = d.repartition(dp, "doc_id").select(
        "doc_id", _tokens().alias("ts")
    )
    grams = (
        _hashed_gram_stream(tokened, 3, keep_short_head=True)
        .select("doc_id", "gh")
        .distinct()
        .repartition(dp, "gh")
        .localCheckpoint(eager=False)
    )
    sizes = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")  # rows pre-deduped above
    )
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.gh") == F.col("b.gh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    union = F.col("na") + F.col("nb") - F.col("inter_size")
    exact = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(F.col("inter_size") * X02G_JACC_DEN >= X02G_JACC_NUM * union)
        .select(
            "doc_a",
            "doc_b",
            # exact micro-unit rational (half-away) — no float quotient
            F.expr(
                "CAST((2 * inter_size * 1000000 + (na + nb - inter_size))"
                " DIV (2 * (na + nb - inter_size)) AS BIGINT)"
            ).alias("jaccard_e6"),
        )
        .localCheckpoint(eager=False)  # the gate counts it AND it returns
    )
    # the in-engine fidelity gate: banded candidates must catch >= 9/10 of
    # the exact pairs. (n_exact, n_hits) come from ONE driver action — a
    # left join against the (distinct-by-construction) candidate pair set
    # with a conditional count — instead of the count()+semi-join-count()
    # pair this ran through round 9 (verdict What's-wrong #1): the exact
    # side computes once, the banded candidates build once, both
    # audit-subset-bounded.
    cand = minhash_near_dup_pairs(d).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    stats = (
        exact.join(cand, ["doc_a", "doc_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("n_hits"),
        )
        .first()
    )
    n_exact, n_hits = stats["n_exact"], stats["n_hits"]
    if n_hits * X02G_RECALL_DEN < n_exact * X02G_RECALL_NUM:
        raise ValueError(
            f"x02g banding recall gate: candidates caught {n_hits}/{n_exact} "
            f"exact pairs at j >= {X02G_JACC_NUM}/{X02G_JACC_DEN} — below "
            f"the pinned {X02G_RECALL_NUM}/{X02G_RECALL_DEN} floor; the "
            f"LSH banding has regressed"
        )
    return exact


# ---------------------------------------------------------------------------
# X70 — near-dup graph degree histogram (duplication topology)
# ---------------------------------------------------------------------------


@register(
    "x70_neardup_degree_histogram",
    oracle="WITH " + _X02B_PAIRS_SQL + """,
deg AS (
  SELECT doc_id, COUNT(*) AS degree FROM (
    SELECT doc_a AS doc_id FROM jacc
    UNION ALL
    SELECT doc_b FROM jacc
  ) GROUP BY doc_id
),
all_docs AS (SELECT doc_id FROM documents WHERE doc_id < 60)
SELECT COALESCE(deg.degree, 0) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM all_docs LEFT JOIN deg USING (doc_id)
GROUP BY 1
""",
    doc="X70: NEAR-DUP GRAPH TOPOLOGY — the degree histogram of the "
    "near-duplicate graph (how many docs have 0, 1, 2... near-twins): "
    "the shape that distinguishes isolated copy-pairs (degree 1 "
    "spikes) from template explosions (heavy tail — one boilerplate "
    "page with thousands of twins), which need different treatment "
    "(pair dedup vs template removal) and different cluster-budget "
    "planning for x02f's label propagation (max degree bounds the "
    "join fan-out per round). Degree-0 docs are counted via the "
    "left join, so the histogram partitions the corpus. Runs on the "
    "same audit subset as x02b/x61.",
)
def x70_neardup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = x02b_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    deg = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    all_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id")
    )
    return (
        all_docs.join(deg, "doc_id", "left")
        .select(F.coalesce("degree", F.lit(0)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# X73 — content-defined chunking (rolling-hash boundaries, CDC dedup)
# ---------------------------------------------------------------------------

CDC_WINDOW = 8  # rolling window width (chars)
CDC_MODULUS = 32  # expected chunk length ~= modulus chars


@register(
    "x73_content_defined_chunking",
    oracle=f"""
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series({CDC_WINDOW}, len(text), 1)) AS s
  FROM documents
),
bounds AS (
  SELECT doc_id, text, s
  FROM pos
  WHERE CAST(('0x' || substr(md5(substr(text, CAST(s - {CDC_WINDOW} + 1 AS INT),
                                        {CDC_WINDOW})), 1, 8)) AS BIGINT)
          % {CDC_MODULUS} = 0
),
ends AS (
  SELECT DISTINCT doc_id, text, s FROM (
    SELECT doc_id, text, s FROM bounds
    UNION ALL
    SELECT doc_id, text, len(text) AS s FROM documents
  )
),
chunks AS (
  SELECT doc_id,
         substr(text,
                CAST(COALESCE(lag(s) OVER (PARTITION BY doc_id ORDER BY s), 0)
                     + 1 AS INT),
                CAST(s - COALESCE(lag(s) OVER (PARTITION BY doc_id ORDER BY s), 0)
                     AS INT)) AS chunk
  FROM ends
),
hashed AS (SELECT doc_id, md5(chunk) AS h, len(chunk) AS clen FROM chunks),
freq AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM hashed GROUP BY h)
SELECT hashed.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       round(AVG(clen), 4) AS avg_chunk_len,
       CAST(COUNT(*) FILTER (freq.nd > 1) AS BIGINT) AS dup_chunks,
       round(COUNT(*) FILTER (freq.nd > 1) * 1.0 / COUNT(*), 4) AS dup_ratio
FROM hashed JOIN freq USING (h)
GROUP BY hashed.doc_id
""",
    doc="X73: CONTENT-DEFINED CHUNKING — rolling-hash boundary selection "
    "(the LBFS/restic/borg CDC scheme): a position ends a chunk when "
    "the hash of the trailing 8-char window hits 0 mod 32, so chunk "
    "boundaries are decided by CONTENT, not offsets — after an "
    "insertion the boundaries downstream RESYNchronize, which is "
    "exactly what x19's fixed-offset grid cannot do (one inserted "
    "character shifts every later fixed chunk and destroys all its "
    "matches). The dedup profile over CDC chunks therefore survives "
    "edit drift between near-copies. Plan: boundary detection + chunk "
    "assembly run in ONE Arrow-batched mapInPandas kernel — a narrow "
    "per-partition pass emitting (doc_id, chunk_md5, chunk_len) rows, "
    "with NO row-per-character explode and no per-doc window shuffle "
    "(the round-3 plan exploded one row per corpus character: a "
    "~10^14-row intermediate at 100 TB; the kernel keeps the same "
    "boundary RULE — md5 of the trailing 8-char window == 0 mod 32 — "
    "so the DuckDB oracle is byte-identical). Downstream consumes the "
    "kernel output EXACTLY ONCE: groupBy(h, doc_id) partial → count() "
    "window over h for the distinct-doc frequency → final groupBy "
    "doc_id — three shuffles, no self-join, no checkpoint.",
)
def x73_content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )

    def cdc_chunks(batches):
        import hashlib

        import pandas as pd

        win, mod = CDC_WINDOW, CDC_MODULUS
        md5 = hashlib.md5
        for pdf in batches:
            doc_ids, hs, lens = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    text = ""  # null-tolerant, like the expression plan it replaced
                raw = text.encode("utf-8")
                # Boundary rule is defined on CHARACTER windows; for pure
                # ASCII (the common case) byte slices are identical and
                # avoid a per-window encode.
                ascii_fast = len(raw) == len(text)
                n = len(text)
                prev = 0
                for s in range(win, n + 1):
                    w = (
                        raw[s - win : s]
                        if ascii_fast
                        else text[s - win : s].encode("utf-8")
                    )
                    # int(hexdigest[:8], 16) == big-endian int of the
                    # first 4 digest bytes — same rule as the oracle.
                    if int.from_bytes(md5(w).digest()[:4], "big") % mod == 0:
                        chunk = text[prev:s]
                        doc_ids.append(doc_id)
                        hs.append(md5(chunk.encode("utf-8")).hexdigest())
                        lens.append(len(chunk))
                        prev = s
                if prev < n or n == 0:
                    chunk = text[prev:n]
                    doc_ids.append(doc_id)
                    hs.append(md5(chunk.encode("utf-8")).hexdigest())
                    lens.append(len(chunk))
            yield pd.DataFrame({"doc_id": doc_ids, "h": hs, "clen": lens})

    hashed = d.mapInPandas(cdc_chunks, "doc_id bigint, h string, clen int")
    return _chunk_dup_profile(hashed)


def _chunk_dup_profile(hashed: DataFrame) -> DataFrame:
    """Per-doc duplication profile over (doc_id, h, clen) chunk rows.

    Single-consumption downstream shared by x73 (md5-window boundary
    rule) and x73b (vectorized gear rule): rolling the (h, doc_id)
    partial first makes `count() OVER (PARTITION BY h)` equal the
    distinct-doc frequency, so the usual freq-computation + join-back
    (which reads the kernel output twice and needs a checkpoint)
    collapses into a linear 3-shuffle pipeline.
    """
    per_pair = hashed.groupBy("h", "doc_id").agg(
        F.count(F.lit(1)).alias("c"), F.sum("clen").alias("sclen")
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("h"))
    dup = F.sum(F.when(F.col("nd") > 1, F.col("c")).otherwise(0))
    return (
        per_pair.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chunks"),
            F.round(F.sum("sclen") / F.sum("c"), 4).alias("avg_chunk_len"),
            dup.alias("dup_chunks"),
            F.round(dup / F.sum("c"), 4).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# X73b — content-defined chunking, vectorized gear-hash kernel (scale path)
# ---------------------------------------------------------------------------

GEAR_WINDOW = 64  # taps kept by the uint64 left-shift recurrence
GEAR_MASK = 0x1F  # boundary when (h & mask) == 0 -> ~32-byte avg chunks


def _gear_table() -> "np.ndarray":  # noqa: F821 — numpy imported lazily
    """Deterministic 256-entry random uint64 table (md5-seeded, no RNG).

    Memoized per process: the kernel calls this once per DOCUMENT, and
    256 md5 digests per call would rival the hash pass itself on
    KB-sized documents."""
    global _GEAR_TABLE_CACHE
    try:
        return _GEAR_TABLE_CACHE
    except NameError:
        pass
    import hashlib

    import numpy as np

    _GEAR_TABLE_CACHE = np.array(
        [
            int.from_bytes(hashlib.md5(f"gear-{i}".encode()).digest()[:8], "big")
            for i in range(256)
        ],
        dtype=np.uint64,
    )
    return _GEAR_TABLE_CACHE


def gear_hash_vectorized(raw: "np.ndarray") -> "np.ndarray":  # noqa: F821
    """Gear rolling hash h_i = (h_{i-1} << 1) + GEAR[b_i] (mod 2^64) for
    every position i, computed WITHOUT the sequential scan.

    Because shifts >= 64 vanish mod 2^64, h_i depends only on the last 64
    bytes: h_i = sum_{k<64} GEAR[b_{i-k}] << k — a 64-tap shifted-add
    convolution. Doubling the window each pass (w = 1,2,4,...,64) computes
    it in log2(64) = 6 vectorized numpy passes instead of a per-byte
    Python loop; uint64 overflow wraps, which IS the mod-2^64 arithmetic.
    """
    import numpy as np

    h = _gear_table()[raw]
    n = len(h)
    tmp = np.empty_like(h)  # one scratch buffer, reused across passes
    w = 1
    while w < GEAR_WINDOW:
        if n > w:
            np.left_shift(h[: n - w], np.uint64(w), out=tmp[w:])
            h[w:] += tmp[w:]  # tmp holds pre-add values: no aliasing
        w *= 2
    return h


def _gear_chunk_rows(doc_id, text, md5):
    """Chunk one document with the vectorized gear boundary rule; returns
    (doc_ids, hashes, byte_lens) lists. Boundaries split on BYTES (the
    scale-correct unit: resync does not care about code points)."""
    import numpy as np

    raw_bytes = (text or "").encode("utf-8")
    n = len(raw_bytes)
    if n == 0:
        return [doc_id], [md5(b"").hexdigest()], [0]
    raw = np.frombuffer(raw_bytes, dtype=np.uint8)
    h = gear_hash_vectorized(raw)
    bounds = np.nonzero((h & np.uint64(GEAR_MASK)) == 0)[0] + 1
    doc_ids, hs, lens = [], [], []
    prev = 0
    for b in bounds.tolist():
        doc_ids.append(doc_id)
        hs.append(md5(raw_bytes[prev:b]).hexdigest())
        lens.append(b - prev)
        prev = b
    if prev < n:
        doc_ids.append(doc_id)
        hs.append(md5(raw_bytes[prev:]).hexdigest())
        lens.append(n - prev)
    return doc_ids, hs, lens


@register(
    "x73b_gear_cdc_chunking",
    oracle=None,
    doc="X73b: content-defined chunking with a VECTORIZED gear rolling "
    "hash — the 100-TB throughput path beside x73's oracle-parity "
    "md5-window rule. x73's kernel is a per-character Python loop with "
    "one md5 call per 8-char window (~10^13 interpreter iterations at "
    "100 TB); this kernel computes the gear recurrence h_i = (h_{i-1} "
    "<< 1) + GEAR[b_i] for EVERY byte position as 6 shifted-add numpy "
    "passes (the 64-tap window is a doubling convolution, mod-2^64 via "
    "native uint64 wrap), then md5s only the resulting ~32-byte chunks "
    "— per-byte work is pure SIMD. Same mapInPandas shape, same "
    "3-shuffle downstream profile as x73 (shared helper). Rows-only by "
    "design (a 256-entry gear table is not SQL-expressible); pinned by "
    "property tests: the doubling kernel equals the naive sequential "
    "recurrence byte-for-byte, and boundaries RESYNCHRONIZE after a "
    "character insertion — the CDC invariant that makes chunk-level "
    "dedup survive edit drift. Measured kernel throughput vs x73 in "
    "SCALE.md.",
)
def x73b_gear_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )

    def gear_chunks(batches):
        import hashlib

        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            doc_ids, hs, lens = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                di, hh, ll = _gear_chunk_rows(doc_id, text, md5)
                doc_ids.extend(di)
                hs.extend(hh)
                lens.extend(ll)
            yield pd.DataFrame({"doc_id": doc_ids, "h": hs, "clen": lens})

    hashed = d.mapInPandas(gear_chunks, "doc_id bigint, h string, clen int")
    return _chunk_dup_profile(hashed)


# ---------------------------------------------------------------------------
# X74 — dedup savings accounting (what deduplication buys, in tokens)
# ---------------------------------------------------------------------------


@register(
    "x74_dedup_savings",
    oracle="""
WITH sized AS (
  SELECT doc_id, source, md5(text) AS h,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tok
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM sized
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS raw_tokens,
       CAST(SUM(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT)
         AS unique_tokens,
       CAST(SUM(CASE WHEN rn > 1 THEN n_tok ELSE 0 END) AS BIGINT)
         AS saved_tokens,
       round(SUM(CASE WHEN rn > 1 THEN n_tok ELSE 0 END) * 1.0
             / SUM(n_tok), 6) AS savings_ratio
FROM ranked GROUP BY source
""",
    doc="X74: DEDUP SAVINGS accounting — the cost-benefit report behind "
    "every dedup decision: per source, raw token mass vs the mass "
    "surviving exact dedup (x01's min-doc_id survivor rule) and the "
    "fraction deduplication saves. This number is what justifies (or "
    "kills) running the heavier near-dup passes on a source — a "
    "source saving 0.1% does not earn a MinHash pass, one saving 30% "
    "does; it is also the compute-budget forecast, since downstream "
    "cost scales with unique_tokens, not raw_tokens. One hash window "
    "over content digests + one source aggregate.",
)
def x74_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from presto_weather_spark.operators.text_analysis import _tokens

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )  # fixture is one row group; spread the tokenize+hash CPU
    sized = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(F.filter(_tokens(), lambda t: t != "")).cast("bigint").alias("n_tok"),
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    ranked = sized.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("raw_tokens"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_tok")).otherwise(0)).alias(
            "unique_tokens"
        ),
        F.sum(F.when(F.col("rn") > 1, F.col("n_tok")).otherwise(0)).alias(
            "saved_tokens"
        ),
        F.round(
            F.sum(F.when(F.col("rn") > 1, F.col("n_tok")).otherwise(0))
            / F.sum("n_tok"),
            6,
        ).alias("savings_ratio"),
    )


# ---------------------------------------------------------------------------
# X80 — connected components via large-star/small-star (log-round CC)
# ---------------------------------------------------------------------------


def _symmetric(pairs: DataFrame) -> DataFrame:
    return pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a"))).toDF(
        "src", "dst"
    )


@register(
    "x80_cc_star_contraction",
    oracle="WITH RECURSIVE " + _X02B_PAIRS_SQL + """,
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jacc
  UNION ALL
  SELECT doc_b, doc_a FROM jacc
),
nodes AS (SELECT doc_id FROM documents WHERE doc_id < 60),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
""",
    doc="X80: CONNECTED COMPONENTS by alternating large-star/small-star "
    "contraction (Kiveris et al., 'Connected Components in MapReduce "
    "and Beyond') over the same near-dup graph as x02f — the LOG-ROUND "
    "scale path x02f's docstring points at: min-label propagation "
    "needs O(diameter) rounds (a 1M-doc template chain = 1M rounds), "
    "star contraction needs O(log n) because each round hangs every "
    "node directly onto its neighborhood minimum, collapsing paths "
    "exponentially. Each half-round is one groupBy(src) min-aggregate "
    "+ one projection — the identical shuffle profile to an x02f "
    "round, just fewer of them. Fixpoint detection compares an "
    "order-independent xxhash64 checksum of the edge multiset across "
    "rounds. Same output contract and recursive-CTE oracle as x02f "
    "(hash-green, not rows-only), so the two algorithms cross-check "
    "each other at every scale factor.",
)
def x80_cc_star_contraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = x02b_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    nodes = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id")
    )
    return star_contraction_clusters(nodes, pairs)


def star_contraction_clusters(nodes: DataFrame, pairs: DataFrame) -> DataFrame:
    """O(log n)-round large-star/small-star CC (Kiveris et al.).

    Exposed separately from x80 for the same reason as
    min_label_clusters: synthetic multi-component edge sets exercise
    the contraction rounds that the pair-free fixture corpus never
    reaches.
    """
    edges = _symmetric(pairs).persist()
    if edges.count() == 0:
        edges.unpersist()
        return nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))

    def large_star(e: DataFrame) -> DataFrame:
        # m(u) = min(Gamma(u) + {u}); emit (v, m) for strictly-larger
        # neighbors v > u. Keeps every (v, min-so-far) attachment while
        # never re-emitting the small side — the round that collapses
        # long paths. The neighborhood is UNDIRECTED: symmetrize first,
        # because small_star's output is oriented and a node appearing
        # only on the dst side would otherwise lose its neighbors.
        e = e.union(e.select(F.col("dst"), F.col("src"))).toDF("src", "dst")
        m = e.groupBy("src").agg(F.min("dst").alias("mn"))
        m = m.select("src", F.least("src", "mn").alias("m"))
        return (
            e.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # Orient edges toward the larger endpoint, group there, hang the
        # whole oriented neighborhood (plus the center) onto its min.
        oriented = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        m = oriented.groupBy("src").agg(F.min("dst").alias("mn"))
        m = m.select("src", F.least("src", "mn").alias("m"))
        hang = oriented.join(m, "src")
        out = hang.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
            m.select(F.col("src"), F.col("m").alias("dst"))
        )
        return out.filter(F.col("src") != F.col("dst")).distinct()

    def checksum(e: DataFrame):
        row = e.agg(
            # DECIMAL(38,0) sum: 64-bit hash values would overflow a
            # BIGINT accumulator under ANSI arithmetic
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("c"),
        ).first()
        return (row["h"], row["c"])

    # Probe cadence note (round-4 watch item): probing every SECOND round
    # was evaluated and rejected — a contraction round (3 shuffles + eager
    # checkpoint) costs more than a checksum over the just-checkpointed
    # frame, so halving probes trades up to two extra contractions for one
    # saved probe and loses on wall-clock for every graph that converges
    # in O(log n) rounds. The per-round probe stands; the 2x-gate row is
    # re-recorded from a quiet measurement instead.
    prev = None
    for _ in range(12):  # log2(60) rounds would be 6; slack for safety
        nxt = small_star(large_star(edges)).localCheckpoint()
        cur = checksum(nxt)
        edges.unpersist()
        edges = nxt.persist()
        if cur == prev:
            break
        prev = cur
    # Fixpoint edges form stars (v -> component min); symmetrize the star
    # set so membership is readable from either side, then take each
    # node's min attachment; singletons fall back to themselves.
    stars = edges.union(edges.select(F.col("dst"), F.col("src"))).toDF("a", "b")
    comp = stars.groupBy("a").agg(F.min("b").alias("mn"))
    out = nodes.join(comp, nodes.doc_id == comp.a, "left").select(
        "doc_id",
        F.least(F.col("doc_id"), F.coalesce(F.col("mn"), F.col("doc_id"))).alias(
            "cluster_id"
        ),
    )
    edges.unpersist()
    return out


# ---------------------------------------------------------------------------
# X81 — soft dedup (cluster-size down-weighting instead of dropping)
# ---------------------------------------------------------------------------


@register(
    "x81_soft_dedup_weights",
    oracle="WITH RECURSIVE " + _X02B_PAIRS_SQL + """,
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jacc
  UNION ALL
  SELECT doc_b, doc_a FROM jacc
),
nodes AS (SELECT doc_id FROM documents WHERE doc_id < 60),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
clusters AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
sized AS (
  SELECT doc_id, cluster_id,
         CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
  FROM clusters
)
SELECT doc_id, cluster_id, cluster_size,
       CAST(1000000 // cluster_size AS BIGINT) AS sample_weight_e6
FROM sized
""",
    doc="X81: SOFT DEDUP — the reweighting alternative to dropping "
    "near-duplicates: every member of a near-dup cluster stays in the "
    "corpus with sampling weight 1/cluster_size, so each DISTINCT "
    "piece of content contributes one unit of expected training mass "
    "no matter how many times it was crawled. This is what pipelines "
    "use when hard dedup is too blunt (near-dups that differ in the "
    "tail still carry signal; dropping also shifts the domain "
    "mixture), and the weights feed the x35 resampler directly. "
    "Composes x02f's connected components with one cluster-size "
    "window — the weight column is free on top of the clustering "
    "job. Invariant pinned in tests: weights sum to exactly the "
    "number of distinct clusters.",
)
def x81_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = x02f_neardup_clusters(spark, sf_dir)
    w = Window.partitionBy("cluster_id")
    # micro-unit integer weight (round-7 risk burn-down): 1/cluster_size
    # is an integer ratio, so it ships as exact 1e6 DIV size
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    ).select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        F.expr("CAST(1000000 DIV cluster_size AS BIGINT)").alias(
            "sample_weight_e6"
        ),
    )


# ---------------------------------------------------------------------------
# X96: edit-distance verified near-duplicate pairs (block -> verify)
# ---------------------------------------------------------------------------

X96_GRAM_K = 5  # shingle width for blocking (longer = more selective)
X96_DF_CAP = 8  # grams rarer than this participate in candidate generation
X96_MIN_SHARED = 3  # candidate pairs must share >= this many capped grams
X96_DUP_SIM = 0.8  # normalized-similarity threshold for the dup verdict


@register(
    "x96_editdist_verified_pairs",
    oracle=f"""
WITH grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS INT) - {X96_GRAM_K - 1}, 1) + 1),
           i -> array_to_string(list_slice(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''), i, i + {X96_GRAM_K - 1}), ' ')))) AS gram
  FROM documents
),
df AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(*) BETWEEN 2 AND {X96_DF_CAP}
),
capped AS (SELECT g.doc_id, g.gram FROM grams g JOIN df USING (gram)),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM capped a JOIN capped b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
  HAVING count(*) >= {X96_MIN_SHARED}
)
SELECT c.doc_a, c.doc_b, CAST(c.n_shared AS BIGINT) AS n_shared,
       CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev_dist,
       -- length() (CHARACTERS) to match Spark F.length; strlen() is bytes
       -- and diverges on any multi-byte UTF-8 text
       round(1.0 - levenshtein(ta.text, tb.text) * 1.0
                   / greatest(length(ta.text), length(tb.text), 1), 6) AS sim,
       -- integer-exact threshold (sim of at least 4/5 <=> 5*lev at
       -- most L); the float form sits ON the boundary when L % 5 = 0
       levenshtein(ta.text, tb.text) * 5
           <= greatest(length(ta.text), length(tb.text), 1)
           AS is_dup
FROM cand c
JOIN documents ta ON ta.doc_id = c.doc_a
JOIN documents tb ON tb.doc_id = c.doc_b
""",
    doc="X96: edit-distance VERIFIED near-duplicate pairs — the "
    "block-then-verify pipeline production dedup runs when MinHash "
    "candidates need a precise verdict (Levenshtein is the exact "
    "string-level measure signature methods approximate). Stage 1 "
    "(block): distinct 5-token shingles per doc, document-frequency "
    "capped to [2, 8] — a gram shared by >8 docs is boilerplate and "
    "generates quadratic fan-out, so it is excluded, bounding the "
    "inverted-index self-join at O(sum df^2) like x02b; candidate "
    "pairs must share >= 3 capped grams, which cut the sf0.1 pair "
    "space from ~1.0M (single shared 3-gram) to ~256. Stage 2 "
    "(verify): exact Levenshtein over the candidate pairs only — "
    "text is joined back onto the surviving (doc_a, doc_b) keys "
    "AFTER blocking (wide columns never enter the self-join), and "
    "the O(len^2) DP cost is paid per candidate, never per corpus "
    "pair. sim = 1 - lev/max(len); is_dup at 0.8. At 100 TB every "
    "stage is the same shape: one gram shuffle, one bucketed "
    "self-join on capped grams, one doc_id join to fetch two texts "
    "per surviving pair.",
)
def x96_editdist_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism, "doc_id")
    # Round-10 optimization: k-gram HASHES via the lead-window token-hash
    # idiom (_hashed_gram_stream) — no interpreted transform() string
    # builder, 8-byte keys through the df count, the broadcast and the
    # blocking self-join; the array_distinct in-doc dedup becomes a
    # distinct() whose (doc_id, gh) clustering the doc_id partitioning
    # already satisfies (no extra exchange). Identical candidate set
    # short of a 64-bit collision (the x18/x40 convention).
    grams = _hashed_gram_stream(
        d.select("doc_id", _tokens().alias("ts")),
        X96_GRAM_K,
        keep_short_head=True,
    ).select("doc_id", "gh").distinct()
    grams = grams.localCheckpoint(eager=False)  # df counts + both join sides
    df_ok = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= X96_DF_CAP))
        .select("gh")
    )
    capped = grams.join(F.broadcast(df_ok), "gh")
    a = capped.select("gh", F.col("doc_id").alias("doc_a"))
    b = capped.select("gh", F.col("doc_id").alias("doc_b"))
    cand = (
        a.join(b, "gh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= X96_MIN_SHARED)
    )
    ta = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    tb = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    lev = F.levenshtein("text_a", "text_b")
    sim = F.lit(1.0) - lev / F.greatest(
        F.length("text_a"), F.length("text_b"), F.lit(1)
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            lev.cast("bigint").alias("lev_dist"),
            F.round(sim, 6).alias("sim"),
            # integer-exact: 1 - lev/L >= X96_DUP_SIM (0.8) <=> 5*lev <= L
            (
                lev * 5
                <= F.greatest(
                    F.length("text_a"), F.length("text_b"), F.lit(1)
                )
            ).alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# X102: exact duplicated-span extraction (gaps-and-islands over dup windows)
# ---------------------------------------------------------------------------

X102_W = 8  # tokens per window (the exact-substring granularity)


@register(
    "x102_dup_span_extraction",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                             t -> t <> '') AS ts
  FROM documents
),
win AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(ts, i, i + {X102_W - 1}), ' ') AS gram
  FROM tok, unnest(generate_series(1, len(ts) - {X102_W - 1})) AS u(i)
  WHERE len(ts) >= {X102_W}
),
dup AS (
  SELECT gram FROM win GROUP BY gram
  HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT w.doc_id, w.pos,
         CASE WHEN w.pos - lag(w.pos) OVER (PARTITION BY w.doc_id
                                            ORDER BY w.pos) <= {X102_W}
              THEN 0 ELSE 1 END AS new_island
  FROM win w JOIN dup USING (gram)
),
islands AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
  FROM hits
)
SELECT doc_id, CAST(island_id AS BIGINT) AS span_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {X102_W - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) + {X102_W} - MIN(pos) AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_dup_windows
FROM islands
GROUP BY doc_id, island_id
""",
    doc="X102: exact duplicated-SPAN extraction — the actionable form of "
    "exact-substring dedup (Lee et al. 2022 'Deduplicating Training "
    "Data', public): not just HOW MUCH of a document is duplicated "
    "elsewhere (x84's mass accounting) but WHERE — maximal contiguous "
    "token spans every one of whose 8-token windows also occurs in "
    "another document, as (span_start, span_end) coordinates a "
    "curation pipeline can cut. Overlapping/adjacent duplicated "
    "windows merge via gaps-and-islands: a window starts a new island "
    "iff its position is more than W tokens after the previous "
    "duplicated position (else the spans [pos, pos+W-1] touch). Plan: "
    "one posexplode window pass (positions ride along — no second "
    "tokenize), one gram-keyed exchange for the >= 2-distinct-docs "
    "window-frequency table, one join back, then a doc_id-partitioned "
    "islands window (positions already co-partitioned after the "
    "join's doc-side shuffle). Integer-only arithmetic end to end — "
    "no rounding convention needed. At 100 TB attribute by "
    "xxhash64(gram) instead of the string to cut exchange bytes ~W x "
    "(tried in round 10 via the lead-window hash: oracle-identical "
    "but slower in the full-bench pairing — see OPTIMIZATION_r10.md).",
)
def x102_dup_span_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism, "doc_id")
    toks = _tokens()
    n = F.size(toks)
    # Round-10 note: a lead-window token-hash rewrite of this gram build
    # (the batch-2 _hashed_gram_stream shape) was tried, proved
    # oracle-identical at both SFs, measured noise-flat in isolated A/B —
    # and REGRESSED in the full-bench session pairing (1.23 s -> 2.02 s).
    # The window sort it introduces behaves worse than the array builder
    # under long-session memory pressure; reverted per keep-only-wins.
    wins = (
        d.filter(n >= X102_W)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), n - (X102_W - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, X102_W)),
                )
            ).alias("pos0", "gram"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    wins = wins.localCheckpoint(eager=False)  # dup table + the hits join
    dup = (
        wins.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    hits = wins.join(dup, "gram").select("doc_id", "pos")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    new_island = F.when(
        F.col("pos") - F.lag("pos").over(w_doc) <= X102_W, 0
    ).otherwise(1)
    islands = hits.withColumn("new_island", new_island).withColumn(
        "island_id",
        F.sum("new_island").over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy("doc_id", "island_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (X102_W - 1)).alias("span_end"),
        (F.max("pos") + X102_W - F.min("pos")).alias("span_tokens"),
        F.count(F.lit(1)).alias("n_dup_windows"),
    ).select(
        "doc_id",
        F.col("island_id").alias("span_id"),
        "span_start",
        "span_end",
        "span_tokens",
        "n_dup_windows",
    )


# ---------------------------------------------------------------------------
# X103: LSH banding parameter planner — the (bands, rows) S-curve optimizer
# ---------------------------------------------------------------------------

X103_THRESHOLD = 0.5  # target Jaccard threshold the x02 pipeline dedups at
X103_STEPS = 200  # fixed midpoint-rule grid (deterministic in both engines)


@register(
    "x103_lsh_parameter_planner",
    oracle=f"""
WITH plans(b, r) AS (VALUES (1, {N_HASHES}), (2, {N_HASHES // 2}),
                            (4, {N_HASHES // 4}), (8, {N_HASHES // 8}),
                            ({N_HASHES}, 1)),
grid AS (
  SELECT i, (i - 0.5) / {X103_STEPS} AS s
  FROM unnest(generate_series(1, {X103_STEPS})) AS t(i)
),
terms AS (
  SELECT p.b, p.r, g.i, g.s,
         round(1.0 - pow(1.0 - pow(g.s, p.r), p.b), 12) AS collide
  FROM plans p CROSS JOIN grid g
),
areas AS (
  -- integer-grid threshold (risk burn-down): the midpoint grid point sits
  -- below the 1/2 target exactly when i <= STEPS/2 — no float literal
  SELECT b, r,
         CAST(SUM(CASE WHEN i <= {X103_STEPS // 2}
                       THEN CAST(collide AS DECIMAL(28,18)) ELSE 0 END)
              AS DOUBLE) / {X103_STEPS} AS fp_area,
         CAST(SUM(CASE WHEN i > {X103_STEPS // 2}
                       THEN CAST(1.0 - collide AS DECIMAL(28,18)) ELSE 0 END)
              AS DOUBLE) / {X103_STEPS} AS fn_area
  FROM terms GROUP BY b, r
),
scored AS (
  SELECT b, r, round(fp_area, 6) AS fp_area, round(fn_area, 6) AS fn_area,
         round(fp_area + fn_area, 6) AS total_error
  FROM areas
)
SELECT b, r, fp_area, fn_area, total_error,
       total_error = MIN(total_error) OVER () AS is_optimal
FROM scored
""",
    doc="X103: LSH banding parameter planner — the design-knob optimizer "
    "behind x02's (bands, rows) choice (Leskovec/Rajaraman/Ullman, "
    "Mining of Massive Datasets ch.3, public): for every (b, r) "
    "factorization of the 16-hash MinHash signature, the collision "
    "S-curve P(s) = 1 - (1 - s^r)^b is integrated on a fixed 200-point "
    "midpoint grid to get the false-positive area below the 0.5 target "
    "threshold and the false-negative area above it; the minimal "
    "fp+fn plan is flagged. Makes the dedup pipeline's banding choice "
    "auditable inside the engine instead of a hand-picked constant. "
    "Work is 5 plans x 200 grid points — a VALUES-driven compute "
    "kernel, corpus-independent by design (the planner runs BEFORE "
    "touching data; at 100 TB it is the same 1000 rows). pow() terms "
    "round to 12dp before the DECIMAL integral sum (the x20/x95 "
    "convention) so both engines integrate bit-identically.",
)
def x103_lsh_parameter_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    plans = spark.createDataFrame(
        [(b, N_HASHES // b) for b in (1, 2, 4, 8, N_HASHES)], "b int, r int"
    )
    grid = spark.range(1, X103_STEPS + 1).select(
        F.col("id").alias("i"), ((F.col("id") - 0.5) / X103_STEPS).alias("s")
    )
    collide = F.round(
        F.lit(1.0) - F.pow(F.lit(1.0) - F.pow(F.col("s"), F.col("r")), F.col("b")),
        12,
    )
    terms = plans.crossJoin(grid).select(
        "b", "r", "i", "s", collide.alias("collide")
    )
    dec = lambda c: F.sum(c.cast("decimal(28,18)")).cast("double")  # noqa: E731
    areas = terms.groupBy("b", "r").agg(
        (
            # integer-grid threshold: s < 0.5 on the midpoint grid is
            # exactly i <= STEPS/2 (no float literal at the branch)
            dec(
                F.when(F.col("i") <= X103_STEPS // 2, F.col("collide")).otherwise(
                    F.lit(0.0)
                )
            )
            / X103_STEPS
        ).alias("fp_raw"),
        (
            dec(
                F.when(
                    F.col("i") > X103_STEPS // 2, F.lit(1.0) - F.col("collide")
                ).otherwise(F.lit(0.0))
            )
            / X103_STEPS
        ).alias("fn_raw"),
    )
    scored = areas.select(
        "b",
        "r",
        F.round("fp_raw", 6).alias("fp_area"),
        F.round("fn_raw", 6).alias("fn_area"),
        F.round(F.col("fp_raw") + F.col("fn_raw"), 6).alias("total_error"),
    )
    w = Window.partitionBy()
    return scored.select(
        "b",
        "r",
        "fp_area",
        "fn_area",
        "total_error",
        (F.col("total_error") == F.min("total_error").over(w)).alias("is_optimal"),
    )


# ---------------------------------------------------------------------------
# X104: duplicated-span excision — rewrite documents with x102's spans cut
# ---------------------------------------------------------------------------


@register(
    "x104_dup_span_excision",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, ts FROM (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS ts
    FROM documents
  ) WHERE len(ts) > 0
),
win AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(ts, i, i + {X102_W - 1}), ' ') AS gram
  FROM tok, unnest(generate_series(1, len(ts) - {X102_W - 1})) AS u(i)
  WHERE len(ts) >= {X102_W}
),
dup AS (
  SELECT gram FROM win GROUP BY gram
  HAVING COUNT(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT w.doc_id, w.pos,
         CASE WHEN w.pos - lag(w.pos) OVER (PARTITION BY w.doc_id
                                            ORDER BY w.pos) <= {X102_W}
              THEN 0 ELSE 1 END AS new_island
  FROM win w JOIN dup USING (gram)
),
spans AS (
  SELECT doc_id,
         MIN(pos) AS span_start, MAX(pos) + {X102_W - 1} AS span_end
  FROM (
    SELECT doc_id, pos,
           SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
    FROM hits
  ) GROUP BY doc_id, island_id
),
positions AS (
  SELECT t.doc_id, u.i AS pos, t.ts[u.i] AS term
  FROM tok t, unnest(generate_series(1, len(t.ts))) AS u(i)
),
kept AS (
  SELECT p.doc_id, p.pos, p.term
  FROM positions p
  LEFT JOIN spans s
    ON s.doc_id = p.doc_id AND p.pos BETWEEN s.span_start AND s.span_end
  WHERE s.doc_id IS NULL
)
SELECT t.doc_id,
       CAST(len(t.ts) AS BIGINT) AS n_tokens,
       CAST(len(t.ts) - COALESCE(k.n_kept, 0) AS BIGINT) AS tokens_removed,
       COALESCE(k.clean_text, '') AS clean_text
FROM tok t
LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(term, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
) k USING (doc_id)
""",
    doc="X104: duplicated-span EXCISION — the cut x102's coordinates "
    "license (Lee et al. 2022's aggressive exact-substring variant, "
    "public): rewrite every document with all corpus-duplicated spans "
    "removed, reporting the cleaned text and tokens_removed. Fully-"
    "excised documents survive as empty rows (the downstream length "
    "gate decides their fate — silent row loss would corrupt corpus "
    "accounting). Plan: x102's span derivation (one window pass, one "
    "gram exchange, one doc-partitioned islands window) plus one "
    "doc_id-co-partitioned span-coverage anti-join over the token "
    "positions and a per-doc ordered reassembly (sort_array over "
    "(pos, term) structs — deterministic, no string-ordering "
    "ambiguity). Everything after the gram exchange is keyed on "
    "doc_id, so the whole tail is one co-partitioned stage family at "
    "100 TB. Integer/string-exact end to end.",
)
def x104_dup_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism, "doc_id")
    toks = _tokens()
    base = d.select("doc_id", toks.alias("ts")).filter(F.size("ts") > 0)
    base = base.localCheckpoint(eager=False)  # windows, positions, final join
    # Round-10 note: the lead-window token-hash rewrite was tried here and
    # in x102, proved oracle-identical, and REGRESSED in the full-bench
    # pairing (1.70 s -> 3.24 s despite a flat isolated A/B); reverted per
    # keep-only-wins (see OPTIMIZATION_r10.md).
    wins = (
        base.filter(F.size("ts") >= X102_W)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (X102_W - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("ts"), i, X102_W)),
                )
            ).alias("pos0", "gram"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    wins = wins.localCheckpoint(eager=False)  # dup table + hits join
    dup = (
        wins.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    hits = wins.join(dup, "gram").select("doc_id", "pos")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        hits.withColumn(
            "new_island",
            F.when(F.col("pos") - F.lag("pos").over(w_doc) <= X102_W, 0).otherwise(1),
        )
        .withColumn(
            "island_id",
            F.sum("new_island").over(
                w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "island_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (X102_W - 1)).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )
    positions = base.select(
        "doc_id", F.posexplode("ts").alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    p, s = positions.alias("p"), spans.alias("s")
    kept = p.join(
        s,
        (F.col("p.doc_id") == F.col("s.doc_id"))
        & (F.col("p.pos") >= F.col("s.span_start"))
        & (F.col("p.pos") <= F.col("s.span_end")),
        "left_anti",  # equi-key on doc_id + range residual: no expansion
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
        ).alias("clean_text"),
    )
    return (
        base.select("doc_id", F.size("ts").cast("bigint").alias("n_tokens"))
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint")
            .alias("tokens_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# X110 — near-dup graph transitivity (exact triangle count + clustering)
# ---------------------------------------------------------------------------


@register(
    "x110_dup_graph_triangles",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(1, greatest(CAST(len(t) AS INT) - {CONTAIN_NGRAM - 1}, 0) + 1),
           i -> array_to_string(list_slice(t, i, i + {CONTAIN_NGRAM - 1}), ' '))) AS gram
  FROM toks WHERE len(t) >= {CONTAIN_NGRAM}
),
df AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING COUNT(*) BETWEEN {CONTAIN_DF_MIN} AND {CONTAIN_DF_CAP}
),
capped AS (SELECT grams.doc_id, grams.gram FROM grams JOIN df USING (gram)),
edges AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM capped a JOIN capped b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)
  GROUP BY v
),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
       tri.n_triangles,
       CAST((SELECT COALESCE(SUM(d * (d - 1) // 2), 0) FROM deg) AS BIGINT) AS n_wedges,
       CAST(CASE WHEN (SELECT COALESCE(SUM(d * (d - 1) // 2), 0) FROM deg) = 0 THEN 0
            ELSE 3000000 * tri.n_triangles
                 // (SELECT SUM(d * (d - 1) // 2) FROM deg)
       END AS BIGINT) AS transitivity_e6
FROM tri
""",
    doc="X110: near-dup graph TRANSITIVITY — exact triangle count and the "
    "global clustering coefficient (3*triangles / wedges) over the "
    "shared-gram candidate graph (x40's df-capped [{0},{1}] 8-token "
    "shingle edges). The curation read-out: near-duplication is an "
    "equivalence-ish relation, so a healthy threshold yields a cliquey "
    "graph (transitivity -> 1); low transitivity means the blocking key "
    "is chaining unrelated docs through hubs and the downstream "
    "connected-components dedup (x02f/x80) will over-merge. All counts "
    "are integer-exact; the wedges=0 degenerate case is an integer "
    "equality, and edges store src < dst so each triangle is counted "
    "exactly once (e1=(a,b), e2=(b,c), e3=(a,c), a<b<c). Scale: edges "
    "derive from the same bounded gram join as x40 (per-gram fan-out "
    "<= df cap); the triangle join is the standard edge-iterator plan "
    "— two shuffles of the EDGE list (corpus-independent, dup-density-"
    "sized), with degree-ordered orientation as the documented skew "
    "lever when hub nodes appear.".format(CONTAIN_DF_MIN, CONTAIN_DF_CAP),
)
def x110_dup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from presto_weather_spark.operators.text_analysis import _spread, _tokens

    d = _spread(load_table(spark, sf_dir, "documents"))
    # Round-10: per-token hash + multi-arg xxhash64 combine (see x40) —
    # no gram-string allocation, longs instead of strings through the
    # window sort; same key class short of a 64-bit collision.
    th = d.select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "tok")
    ).select("doc_id", "pos", F.xxhash64("tok").alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("h", i).over(w) for i in range(1, CONTAIN_NGRAM)]
    grams = (
        th.select(
            "doc_id",
            F.xxhash64(F.col("h"), *leads).alias("gh"),
            leads[-1].alias("tail"),
        )
        .filter(F.col("tail").isNotNull())
        .select("doc_id", "gh")
        .distinct()
        .localCheckpoint(eager=False)  # df filter + both join sides read it
    )
    df_ok = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(CONTAIN_DF_MIN, CONTAIN_DF_CAP))
        .select("gh")
    )
    capped = grams.join(F.broadcast(df_ok), "gh")
    edges = (
        capped.alias("a")
        .join(capped.alias("b"), "gh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=False)  # deg + three triangle-join sides
    )
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    nodes_edges_wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("bigint").alias("n_wedges"),
    ).crossJoin(F.broadcast(edges.agg(F.count(F.lit(1)).alias("n_edges"))))
    tri = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e2.src") == F.col("e1.dst"))
        .join(
            edges.alias("e3"),
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        nodes_edges_wedges.crossJoin(F.broadcast(tri))
        .select(
            F.coalesce(F.col("n_nodes"), F.lit(0)).cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.coalesce(F.col("n_wedges"), F.lit(0)).cast("bigint").alias("n_wedges"),
            # micro-unit integer ratio (round-7 risk burn-down): all
            # counts are exact BIGINTs, so transitivity ships as
            # 3e6 * triangles DIV wedges — no float division, no round
            F.when(F.coalesce(F.col("n_wedges"), F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.expr("CAST(3000000 * n_triangles DIV n_wedges AS BIGINT)")
            )
            .cast("bigint")
            .alias("transitivity_e6"),
        )
    )


# ---------------------------------------------------------------------------
# X115 — dedup threshold sensitivity (pair mass vs Jaccard cutoff)
# ---------------------------------------------------------------------------

X115_THRESHOLDS = (0.3, 0.5, 0.7, 0.9)


@register(
    "x115_dedup_threshold_sensitivity",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(1, greatest(CAST(len(t) AS INT) - {CONTAIN_NGRAM - 1}, 0) + 1),
           i -> array_to_string(list_slice(t, i, i + {CONTAIN_NGRAM - 1}), ' '))) AS gram
  FROM toks WHERE len(t) >= {CONTAIN_NGRAM}
),
df AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING COUNT(*) BETWEEN {CONTAIN_DF_MIN} AND {CONTAIN_DF_CAP}
),
capped AS (SELECT grams.doc_id, grams.gram FROM grams JOIN df USING (gram)),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM capped GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
  FROM capped a JOIN capped b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jacc AS (
  SELECT p.doc_a, p.doc_b,
         round(CAST(p.inter_size AS DOUBLE)
               / (sa.n_grams + sb.n_grams - p.inter_size), 6) AS j
  FROM pairs p
  JOIN sizes sa ON p.doc_a = sa.doc_id
  JOIN sizes sb ON p.doc_b = sb.doc_id
),
th AS (SELECT unnest([{', '.join(str(t) for t in X115_THRESHOLDS)}]) AS threshold),
hits AS (SELECT th.threshold, jacc.doc_a, jacc.doc_b
         FROM th JOIN jacc ON jacc.j >= th.threshold),
pair_counts AS (
  SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs FROM hits GROUP BY threshold
),
doc_counts AS (
  SELECT threshold, CAST(count(DISTINCT d) AS BIGINT) AS n_docs_affected
  FROM (SELECT threshold, doc_a AS d FROM hits
        UNION ALL SELECT threshold, doc_b AS d FROM hits)
  GROUP BY threshold
)
SELECT th.threshold,
       COALESCE(pair_counts.n_pairs, 0) AS n_pairs,
       COALESCE(doc_counts.n_docs_affected, 0) AS n_docs_affected
FROM th
LEFT JOIN pair_counts USING (threshold)
LEFT JOIN doc_counts USING (threshold)
""",
    doc="X115: dedup threshold SENSITIVITY — before committing a near-dup "
    "cutoff, the curve every curation run wants: for Jaccard thresholds "
    f"{X115_THRESHOLDS}, how many candidate pairs survive and how many "
    "documents are touched (the upper bound on removals). One exact "
    "pair table (x40's df-capped [{0},{1}] inverted-index join — never "
    "all-pairs) feeds every threshold: the sweep is a broadcast of 4 "
    "threshold literals against the pair table, NOT 4 pipeline runs — "
    "the cost of choosing a threshold is one pair materialization. "
    "Thresholds compare against the 6dp-rounded Jaccard with identical "
    "double literals in both engines; empty thresholds surface as "
    "explicit 0 rows (LEFT JOIN), not absent rows. Scale: everything "
    "after the gram join is pair-table-sized; the threshold explode "
    "multiplies the PAIR table by 4, never the corpus.".format(
        CONTAIN_DF_MIN, CONTAIN_DF_CAP
    ),
)
def x115_dedup_threshold_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from presto_weather_spark.operators.text_analysis import _spread, _tokens

    d = _spread(load_table(spark, sf_dir, "documents"))
    # Round-10 note: the per-token-hash lead combine (the x40 shape) was
    # tried here too, proved oracle-identical — and regressed in the
    # full-bench pairing (1.73 s -> 2.85 s) while isolated A/Bs were
    # noise-split; reverted per keep-only-wins (see OPTIMIZATION_r10.md).
    th_doc = d.select("doc_id", F.posexplode(_tokens()).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(w) for i in range(1, CONTAIN_NGRAM)
    ]
    grams = (
        th_doc.select(
            "doc_id",
            F.xxhash64(F.concat_ws(" ", *parts)).alias("gh"),
            parts[-1].alias("tail"),
        )
        .filter(F.col("tail").isNotNull())
        .select("doc_id", "gh")
        .distinct()
        .localCheckpoint(eager=False)  # df filter, sizes, both join sides
    )
    df_ok = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(CONTAIN_DF_MIN, CONTAIN_DF_CAP))
        .select("gh")
    )
    capped = grams.join(F.broadcast(df_ok), "gh").localCheckpoint(eager=False)
    sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), "gh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    j = F.col("inter_size").cast("double") / (
        F.col("sa.n_grams") + F.col("sb.n_grams") - F.col("inter_size")
    )
    jacc = (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", F.round(j, 6).alias("j"))
        .localCheckpoint(eager=False)  # 4-way threshold fan-out reads it
    )
    th = spark.createDataFrame(
        [(t,) for t in X115_THRESHOLDS], "threshold double"
    )
    hits = jacc.crossJoin(F.broadcast(th)).filter(
        F.col("j") >= F.col("threshold")
    )
    pair_counts = hits.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    doc_counts = (
        hits.select("threshold", F.col("doc_a").alias("d"))
        .unionAll(hits.select("threshold", F.col("doc_b").alias("d")))
        .groupBy("threshold")
        .agg(F.count_distinct("d").alias("n_docs_affected"))
    )
    return (
        th.join(F.broadcast(pair_counts), "threshold", "left")
        .join(F.broadcast(doc_counts), "threshold", "left")
        .select(
            "threshold",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.col("n_docs_affected"), F.lit(0))
            .cast("bigint")
            .alias("n_docs_affected"),
        )
    )


# ---------------------------------------------------------------------------
# X133 — near-dup cluster-size histogram (the dedup aggressiveness report)
# ---------------------------------------------------------------------------


@register(
    "x133_cluster_size_histogram",
    oracle=None,  # composed from x02f's oracle at import time (see below)
    doc="X133: CLUSTER-SIZE HISTOGRAM — the report read before signing off "
    "a dedup run: for each near-dup cluster size s, how many clusters, "
    "how many documents they hold, and how many a keep-one policy "
    "removes ((s-1) per cluster) — a long tail of giant clusters means "
    "the threshold chains unrelated docs (the x110 transitivity signal, "
    "as a size distribution). Built ON x02f's connected components and "
    "its oracle (composed textually at import, the x128 pattern), so "
    "the histogram is hash-verified against the same recursive-CTE "
    "ground truth. Scale: the histogram aggregates the LABEL table "
    "(one row per doc) twice — cluster sizes, then size counts; both "
    "shuffles are label-cardinality bounded.",
)
def x133_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = x02f_neardup_clusters(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.count(F.lit(1)) * F.any_value("cluster_size"))
        .cast("bigint")
        .alias("n_docs"),
        (F.count(F.lit(1)) * (F.any_value("cluster_size") - 1))
        .cast("bigint")
        .alias("n_removable"),
    )


def _install_x133_oracle() -> None:
    from presto_weather_spark.registry import _REGISTRY, Query

    base = _REGISTRY["x02f_neardup_clusters"].oracle
    q = _REGISTRY["x133_cluster_size_histogram"]
    sql = f"""
WITH labels AS ({base}),
sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM labels GROUP BY cluster_id
)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * any_value(cluster_size) AS BIGINT) AS n_docs,
       CAST(count(*) * (any_value(cluster_size) - 1) AS BIGINT) AS n_removable
FROM sizes GROUP BY cluster_size
"""
    _REGISTRY["x133_cluster_size_histogram"] = Query(
        name=q.name, fn=q.fn, oracle=sql, doc=q.doc
    )


_install_x133_oracle()


# ---------------------------------------------------------------------------
# X138 — dedup impact on the training mixture (share shift + KL)
# ---------------------------------------------------------------------------


@register(
    "x138_dedup_mixture_shift",
    oracle="""
WITH survivors AS (
  SELECT lang, row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
  FROM documents
),
before AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_before FROM documents GROUP BY lang
),
after AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_after
  FROM survivors WHERE rn = 1 GROUP BY lang
),
tb AS (SELECT CAST(SUM(n_before) AS BIGINT) AS t FROM before),
ta AS (SELECT CAST(SUM(n_after) AS BIGINT) AS t FROM after)
SELECT before.lang, before.n_before, after.n_after,
       round(CAST(before.n_before AS DOUBLE) / tb.t, 6) AS share_before,
       round(CAST(after.n_after AS DOUBLE) / ta.t, 6) AS share_after,
       round(CAST(after.n_after AS DOUBLE) / ta.t
             - CAST(before.n_before AS DOUBLE) / tb.t, 6) AS share_delta,
       round(CAST(CAST(after.n_after AS DOUBLE) / ta.t
                  * ln((CAST(after.n_after AS DOUBLE) / ta.t)
                       / (CAST(before.n_before AS DOUBLE) / tb.t))
             AS DECIMAL(28,18)), 6) AS kl_term
FROM before JOIN after USING (lang) CROSS JOIN tb CROSS JOIN ta
""",
    doc="X138: DEDUP MIXTURE SHIFT — what keep-one exact dedup (x01's "
    "lowest-doc_id-per-md5 survivor rule, restated as a window so the "
    "oracle shares it) does to the language mixture: per language, "
    "share before vs after, the delta, and the per-language KL term "
    "q·ln(q/p) whose sum is D_KL(after || before) — duplication is "
    "never uniform across languages, so dedup silently reweights the "
    "recipe and x134's planner must run on POST-dedup mass. Counts "
    "exact, shares 6dp integer ratios, the KL term through "
    "DECIMAL(28,18) per the x20 convention (languages with zero "
    "survivors would need an epsilon — the inner join surfaces only "
    "langs present on both sides, stated convention). Scale: one md5 "
    "window (the x01 digest shuffle) + two languages-sized aggregates.",
)
def x138_dedup_mixture_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    survivors = d.select("lang", F.row_number().over(w).alias("rn"))
    before = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    after = (
        survivors.filter(F.col("rn") == 1)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    tb = before.agg(F.sum("n_before").cast("bigint").alias("tb"))
    ta = after.agg(F.sum("n_after").cast("bigint").alias("ta"))
    p = F.col("n_before").cast("double") / F.col("tb")
    q = F.col("n_after").cast("double") / F.col("ta")
    return (
        before.join(after, "lang")
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(ta))
        .select(
            "lang",
            "n_before",
            "n_after",
            F.round(p, 6).alias("share_before"),
            F.round(q, 6).alias("share_after"),
            F.round(q - p, 6).alias("share_delta"),
            F.round(
                (q * F.log(q / p)).cast("decimal(28,18)").cast("double"), 6
            ).alias("kl_term"),
        )
    )


# ---------------------------------------------------------------------------
# X154 — near-dup cluster representative selection (the keep/drop manifest)
# ---------------------------------------------------------------------------


@register(
    "x154_cluster_rep_keeplist",
    oracle=None,  # composed from x02f's oracle at import time (see below)
    doc="X154: CLUSTER REPRESENTATIVE selection — the decision x02f's "
    "clusters exist to feed: which document SURVIVES each near-dup "
    "cluster. Where x34 picks quality survivors within exact-digest "
    "groups, this picks them within the transitive LSH/Jaccard "
    "clusters (x02f's connected components): the representative "
    "maximizes alphabetic ratio (x09's quality ingredient, here an "
    "exact e6 micro-unit integer via DIV), doc_id breaking ties. "
    "Emits the full keep/drop manifest — one row per clustered doc "
    "with its cluster, score and flag — the artifact a curation run "
    "joins back onto the corpus as its dedup filter. Oracle composed "
    "textually on x02f's recursive-CTE ground truth (the x133 "
    "pattern), so the manifest is hash-verified end to end. Scale: "
    "scoring is scan-side; the only new shuffle beyond x02f's CC is "
    "the per-cluster rank window, partitioned on cluster_id (grows "
    "with the data) and WindowGroupLimit-prunable.",
)
def x154_cluster_rep_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = x02f_neardup_clusters(spark, sf_dir)
    sc = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select(
            "doc_id",
            F.expr(
                "CAST(length(regexp_replace(text, '[^A-Za-z]', '')) "
                "* CAST(1000000 AS BIGINT) "
                "DIV greatest(length(text), 1) AS BIGINT)"
            ).alias("alpha_e6"),
        )
    )
    j = labels.join(sc, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("alpha_e6").desc(), "doc_id"
    )
    wc = Window.partitionBy("cluster_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wc).cast("bigint"))
        .select(
            "doc_id",
            "cluster_id",
            "alpha_e6",
            "cluster_size",
            F.when(F.col("rn") == 1, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("rep_flag"),
        )
    )


def _install_x154_oracle() -> None:
    from presto_weather_spark.registry import _REGISTRY, Query

    base = _REGISTRY["x02f_neardup_clusters"].oracle
    q = _REGISTRY["x154_cluster_rep_keeplist"]
    sql = f"""
WITH labels AS ({base}),
sc AS (
  SELECT doc_id,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000000
              // greatest(length(text), 1) AS BIGINT) AS alpha_e6
  FROM documents WHERE doc_id < 60
),
j AS (SELECT l.doc_id, l.cluster_id, sc.alpha_e6
      FROM labels l JOIN sc USING (doc_id)),
r AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY alpha_e6 DESC, doc_id) AS rn,
         CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
           AS cluster_size
  FROM j
)
SELECT doc_id, cluster_id, alpha_e6, cluster_size,
       CASE WHEN rn = 1 THEN 'keep' ELSE 'drop' END AS rep_flag
FROM r
"""
    _REGISTRY["x154_cluster_rep_keeplist"] = Query(
        name=q.name, fn=q.fn, oracle=sql, doc=q.doc
    )


_install_x154_oracle()
