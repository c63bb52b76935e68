"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference operators (BASELINE.json north star): exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.  All pure DataFrame —
designed so the shuffle keys are the dedup buckets themselves (band hashes /
shingles), which is the scalable formulation at 100 TB: no pairwise O(n²)
stage ever materializes beyond candidate buckets.

Deterministic hashing derives integers from md5 hex prefixes
(``conv(substr(md5(x),1,k),16,10)``) so results are reproducible across
engines (DuckDB oracle: ``cast('0x'||substr(md5(x),1,k) as bigint)``):
28-bit (k=7) for minhash/shingle ids, width-matched k=ceil(bits/4) for
simhash so every fingerprint bit carries entropy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from entitymatchingmodel_spark.functions.tokenize import word_tokens

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def md5_int(c: Column) -> Column:
    """Deterministic 28-bit integer hash of a string (engine-portable)."""
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def perm_constants(i: int) -> tuple[int, int]:
    """Deterministic per-permutation multipliers (splitmix64 of the index):
    c1 odd 32-bit, c2 odd 31-bit."""
    z = (i + 1) * 0x9E3779B97F4A7C15 % (1 << 64)
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
    z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
    z ^= z >> 31
    return (z & 0xFFFFFFFF) | 1, ((z >> 32) & 0x7FFFFFFF) | 1


def _hash_family(h: Column, seed: int) -> Column:
    """Permutation hash: murmur-style xor-shift-multiply finalizer of the
    28-bit base hash with per-permutation constants.

    A linear ``(a*x + b) mod p`` family is NOT usable here: with 28-bit
    inputs and any multiplier small enough to avoid 64-bit ANSI overflow,
    the product rarely wraps the modulus, the map stays order-preserving,
    every "permutation" picks the same argmin shingle, and the MinHash
    estimate degenerates to the binary "do the docs share the globally
    minimal shingle" (observed: est_jaccard exactly 1.0 for every LSH
    candidate).  The finalizer scrambles order properly; every
    intermediate stays under 2^63, safe for Spark 4 ANSI arithmetic, and
    the same expression evaluates identically in DuckDB (xor / >> / %).
    """
    c1, c2 = perm_constants(seed)
    x = h.bitwiseXOR(F.shiftright(h, 16))
    x = F.pmod(x * F.lit(c1), F.lit(1 << 32))
    x = x.bitwiseXOR(F.shiftright(x, 15))
    x = F.pmod(x * F.lit(c2), F.lit(1 << 32))
    return x.bitwiseXOR(F.shiftright(x, 16))


def word_shingles(c: Column, n: int) -> Column:
    """Distinct word n-gram shingles, space-joined.

    Built as ``arrays_zip`` of the n shifted token slices + a
    ``concat_ws`` transform — measured ~7x faster at sf0.1 than the
    per-element ``slice``+``array_join`` formulation (HOF lambdas evaluate
    interpreted, and allocating a length-n array per element dominates;
    zipping n parallel slices allocates once per *document*).  Each slice
    has exactly ``size - n + 1`` elements (0 when the doc is shorter than
    n), so the zip never null-pads and the output matches the old
    formulation exactly.
    """
    toks = word_tokens(F.lower(c))
    if n == 1:
        return F.array_distinct(toks)
    win = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, win).alias(str(i)) for i in range(n)])
    grams = F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))
    return F.array_distinct(grams)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical (normalized) texts: (content_hash, rep_doc_id, group_size).

    One hash-groupBy; map-side partial agg makes this a single cheap shuffle
    at any scale.
    """
    return (
        df.groupBy(F.md5(F.trim(F.lower(F.col(text_col)))).alias("content_hash"))
        .agg(
            F.min(id_col).alias("rep_doc_id"),
            F.count("*").alias("group_size"),
        )
    )


def _has_unorderable_type(dt) -> bool:
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _has_unorderable_type(dt.elementType)
    if isinstance(dt, StructType):
        return any(_has_unorderable_type(f.dataType) for f in dt.fields)
    return False


def drop_exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative row (min id) per identical normalized text.

    Skew shape: ONE hash-aggregate — ``min(struct(id, row))`` per content
    hash, combined map-side — never a per-group window sort: a viral
    document duplicated millions of times would otherwise funnel every
    copy through a single window task.  Ids are unique, so the struct
    comparison never looks past its first field and the winner is exactly
    the min-id row.  Falls back to the window formulation only when a
    column type is not orderable (maps), which min() rejects.
    """
    return _drop_duplicates_by_key(
        df, id_col, F.md5(F.trim(F.lower(F.col(text_col))))
    )


def _drop_duplicates_by_key(df: DataFrame, id_col: str, key) -> DataFrame:
    """Shared min-struct representative selection: keep the min-``id_col``
    row per ``key`` — ONE map-side-combined hash aggregate (see
    :func:`drop_exact_duplicates` for why this beats a per-group window
    at viral-duplicate skew); window fallback only for unorderable
    column types (maps), which ``min()`` rejects."""
    if not any(_has_unorderable_type(f.dataType) for f in df.schema.fields):
        cols = df.columns
        agg = df.groupBy(key.alias("_h")).agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("_k"),
                    F.struct(*[F.col(c) for c in cols]).alias("_row"),
                )
            ).alias("_w")
        )
        return agg.select(*[F.col(f"_w._row.{c}").alias(c) for c in cols])
    w = Window.partitionBy(key).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def drop_url_duplicates(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """C4's URL-dedup step — the FIRST stage of its pipeline (URL dedup ->
    quality -> content dedup): keep one representative row (min ``id_col``)
    per NORMALIZED URL (:func:`functions.web.url_normalize`: scheme +
    ``www.`` stripped, host lowercased, query/fragment dropped, one
    trailing slash trimmed), so scheme/tracking-parameter/fragment
    variants of one page collapse to a single document.

    Rows whose URL normalizes to NULL (NULL/empty input) are all KEPT —
    a missing URL is not a duplicate of another missing URL; they fall
    back to a per-row key derived from ``id_col``, which stays inside the
    same single aggregate (no split/union).

    Scale shape: identical to :func:`drop_exact_duplicates` — one
    map-side-combined hash aggregate, min-struct representative, no
    window sort on the (heavily skewed) popular-URL groups.
    """
    from entitymatchingmodel_spark.functions.web import url_normalize

    key = F.coalesce(
        url_normalize(F.col(url_col)),
        # \x00 prefix: cannot collide with a normalized URL (which never
        # starts with a control char)
        F.concat(F.lit("\x00id:"), F.col(id_col).cast("string")),
    )
    return _drop_duplicates_by_key(df, id_col, key)


# ---------------------------------------------------------------------------
# Incremental (snapshot-over-snapshot) dedup against a persisted index
# ---------------------------------------------------------------------------

def build_content_index(df: DataFrame, text_col: str) -> DataFrame:
    """``(content_hash string)`` — the distinct normalized-content
    fingerprints of an already-ingested corpus, the persisted state of
    INCREMENTAL dedup: each new crawl snapshot is deduplicated against
    the union of everything admitted before it (the CommonCrawl
    snapshot-over-snapshot reality — a new monthly dump re-serves most
    of the previous one), without ever re-reading the old corpus text.

    The hash is the same ``md5(trim(lower(text)))`` every exact-dedup
    operator here keys on, so an index built by this function, the
    ``content_hash`` emitted by :func:`exact_duplicates`, and
    ``curate_batch``'s dedup stage all speak one key.  ONE map-side-
    combined distinct (16 bytes/doc); persist it with
    ``persistence.write_bucketed`` BUCKETED BY ``content_hash`` and the
    anti-join in :func:`dedup_against_index` reads it shuffle-free on
    the index side, append new snapshots' hashes as they are admitted.
    """
    return df.select(
        F.md5(F.trim(F.lower(F.col(text_col)))).alias("content_hash")
    ).distinct()


def dedup_against_index(
    df: DataFrame, text_col: str, index: DataFrame
) -> DataFrame:
    """Rows of ``df`` whose normalized content hash is NOT in ``index``
    (a ``content_hash`` frame from :func:`build_content_index`) — the
    transform half of incremental dedup.  Schema = input schema.

    LEFT ANTI join on the hash: both sides shuffle-partition on an
    md5 key, so the join is skew-free by construction (the hash is
    uniform even when the duplicated TEXTS are viral), and Spark keeps
    only the join key from the index side (16 bytes/row) — with the
    index persisted bucketed on ``content_hash`` the index-side
    exchange disappears entirely.  In-batch duplicates are untouched
    (two NEW copies of a novel document both survive): compose with
    :func:`drop_exact_duplicates` before or after, exactly like the
    batch front-door's dedup stage.
    """
    if "content_hash" not in index.columns:
        raise ValueError(
            f"index must have a content_hash column, got {index.columns}"
        )
    clash = "_emm_ch" in df.columns
    if clash:
        raise ValueError("df already has a _emm_ch column; rename it")
    keyed = df.withColumn(
        "_emm_ch", F.md5(F.trim(F.lower(F.col(text_col))))
    )
    out = keyed.join(
        index.select(F.col("content_hash").alias("_emm_ch")),
        "_emm_ch",
        "left_anti",
    )
    return out.drop("_emm_ch")


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup
# ---------------------------------------------------------------------------

_BLOOM_MAX_BITS = 1 << 27  # 16 MiB bitmap ceiling for the driver-built literal
_BLOOM_SEED_2 = "emm-bloom-h2"  # second-hash salt (double hashing)


def _signed64(v: int) -> int:
    """Two's-complement view of an unsigned 64-bit value (JVM longs are
    signed; py4j rejects literals above Long.MAX_VALUE)."""
    return v - (1 << 64) if v >= 1 << 63 else v


def _bloom_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The ``num_hashes`` bit positions of ``key`` under double hashing
    (pos_j = (h1 + j*h2) mod m, Kirsch-Mitzenmacher): two independent
    xxhash64 draws (the second salted), each masked to 31 bits so the
    position arithmetic can never overflow a signed long even under the
    ANSI-mode default.  Build and probe MUST share this function — a
    formula drift would manufacture false NEGATIVES, which (unlike false
    positives, absorbed by the exact confirm join) would silently admit
    duplicates."""
    h1 = F.pmod(F.xxhash64(key), F.lit(1 << 31))
    h2 = F.pmod(F.xxhash64(key, F.lit(_BLOOM_SEED_2)), F.lit(1 << 31))
    return [
        F.pmod(h1 + F.lit(j) * h2, F.lit(num_bits)) for j in range(num_hashes)
    ]


def _bloom_validate(num_bits: int, num_hashes: int) -> None:
    if num_bits <= 0 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_bits > _BLOOM_MAX_BITS:
        raise ValueError(
            f"num_bits={num_bits} exceeds the {_BLOOM_MAX_BITS} bitmap ceiling "
            "(16 MiB driver-built literal); for indexes too large for an "
            "in-plan bitmap use dedup_against_index on the bucketed index"
        )
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes must be in [1, 16], got {num_hashes}")


def build_bloom_index(
    index: DataFrame, num_bits: int = 1 << 20, num_hashes: int = 5
) -> DataFrame:
    """``(word_idx int, bits long, num_bits long, num_hashes int)`` — a
    Bloom filter over a :func:`build_content_index` frame, as a SPARSE
    bitmap table of 64-bit words (only words with at least one set bit
    appear; at most ``num_bits/64`` rows regardless of index size).

    100-TB shape: ONE map-side-combined ``bit_or`` aggregation over the
    index compresses billions of 16-byte fingerprints into a <=16 MiB
    bitmap that :func:`dedup_against_bloom` turns into a pure map-stage
    prefilter for the next snapshot — the full-index anti-join then only
    ever sees the (tiny) probable-duplicate sliver.  Persist this table
    alongside the content index and rebuild it after appends (bit_or is
    idempotent, so re-aggregating index ∪ new_hashes is a cheap refresh).

    Sizing: with k hashes and n keys, fpp ≈ (1 - e^{-kn/m})^k; the
    default m=2^20, k=5 holds ~1% up to n≈10^5 — raise ``num_bits``
    toward the 2^27 ceiling for larger indexes, beyond which
    :func:`dedup_against_index` is the right tool.  The parameters are
    embedded as constant columns so a probe can never run with a
    mismatched geometry (which would create false negatives)."""
    _bloom_validate(num_bits, num_hashes)
    if "content_hash" not in index.columns:
        raise ValueError(
            f"index must have a content_hash column, got {index.columns}"
        )
    pos = F.explode(
        F.array(*_bloom_positions(F.col("content_hash"), num_bits, num_hashes))
    ).alias("pos")
    return (
        index.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
        .select(
            "word_idx",
            "bits",
            F.lit(num_bits).cast("long").alias("num_bits"),
            F.lit(num_hashes).cast("int").alias("num_hashes"),
        )
    )


def dedup_against_bloom(
    df: DataFrame,
    text_col: str,
    index: DataFrame,
    bloom: DataFrame | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACTLY :func:`dedup_against_index`, with a Bloom prefilter so the
    definitely-new majority of a snapshot never reaches the anti-join.

    Two branches over the snapshot (persist ``df`` if a second scan is
    expensive; two parquet scans are usually far cheaper than shuffling
    the full snapshot against the index):

    - bloom-MISS rows are *provably* absent from the index — they pass
      straight through a map-only stage (bitmap literal probe, zero
      joins, zero shuffle);
    - bloom-HIT rows (true duplicates + the fpp sliver) go through the
      exact LEFT ANTI join of :func:`dedup_against_index`, so false
      positives are always eliminated and the output is hash-exact.

    The bitmap is collected on the driver — bounded by ``num_bits/64``
    words (<=16 MiB at the validated ceiling) INDEPENDENT of index size
    — and shipped as one array<long> literal, so the probe is a single
    whole-stage-codegen projection (``element_at`` + bitwiseAND per
    hash).  Probe geometry is read from the bloom frame's embedded
    parameter columns, never from this function's arguments, so a
    mismatched build can't silently create false negatives."""
    if "content_hash" not in index.columns:
        raise ValueError(
            f"index must have a content_hash column, got {index.columns}"
        )
    if "_emm_ch" in df.columns:
        raise ValueError("df already has a _emm_ch column; rename it")
    if bloom is None:
        bloom = build_bloom_index(index, num_bits, num_hashes)
    missing = {"word_idx", "bits", "num_bits", "num_hashes"} - set(bloom.columns)
    if missing:
        raise ValueError(
            f"bloom is missing columns {sorted(missing)}; build it with "
            "build_bloom_index"
        )
    # ONE bounded driver collect for geometry AND words (<= num_bits/64
    # rows by construction; the validation below caps it at 2^21 words /
    # 16 MiB).  r11: this was two separate collects (a limit(1) for the
    # params, then the words) — against an in-plan bloom frame each
    # collect re-executed the whole index aggregation, doubling the
    # index-side work (guide §1.2: don't compute things twice).
    words = bloom.select("word_idx", "bits", "num_bits", "num_hashes").collect()
    if words:
        num_bits, num_hashes = int(words[0][2]), int(words[0][3])
    _bloom_validate(num_bits, num_hashes)
    bitmap = [0] * (num_bits // 64)
    for w_idx, bits, _, _ in words:
        bitmap[w_idx] = bits
    bm = F.lit(bitmap)

    # shiftleft() takes only a literal shift, so single-bit masks come from
    # a 64-word literal indexed by the in-word bit position instead.
    masks = F.lit([_signed64(1 << b) for b in range(64)])

    keyed = df.withColumn("_emm_ch", F.md5(F.trim(F.lower(F.col(text_col)))))
    hit = F.lit(True)
    for pos in _bloom_positions(F.col("_emm_ch"), num_bits, num_hashes):
        word = F.element_at(bm, F.shiftright(pos, 6).cast("int") + F.lit(1))
        mask = F.element_at(masks, F.pmod(pos, F.lit(64)).cast("int") + F.lit(1))
        hit = hit & (word.bitwiseAND(mask) != 0)

    definitely_new = keyed.where(~hit)
    probable = keyed.where(hit)
    confirmed_new = probable.join(
        index.select(F.col("content_hash").alias("_emm_ch")),
        "_emm_ch",
        "left_anti",
    )
    return definitely_new.unionByName(confirmed_new).drop("_emm_ch")

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) — MinHash signature over word-shingle sets.

    All-native and fully codegen'd: explode the distinct shingles, hash each
    once (md5 -> 28-bit long), then one hash-aggregate per doc id computing
    the ``num_hashes`` permutation minima as plain ``min()`` aggregates.
    Array higher-order functions (``array_min(transform(...))``) evaluate
    interpreted per element and were measured ~7x slower at sf0.1; plain
    aggregates stay inside whole-stage codegen.

    Scale shape: a doc's shingles land in the partition of their source row,
    so the map-side partial aggregation collapses to one row per doc BEFORE
    the exchange — the shuffle moves ~n_docs pre-aggregated rows keyed by
    doc id (high cardinality, no skew), regardless of corpus text size.

    Docs with no shingles (empty text) keep a row via ``explode_outer`` and
    yield an all-null signature, matching the previous semantics.

    Permutations use the murmur-style finalizer family (``_hash_family``):
    every intermediate stays under 2^63 (32-bit value times 31-bit odd
    constant), safe under Spark 4 ANSI overflow checking, and the same
    xor/shift/mod expression evaluates identically in DuckDB.
    """
    sh = word_shingles(F.col(text_col), shingle_n)
    ex = df.select(
        F.col(id_col).alias("id"), F.explode_outer(sh).alias("_s")
    ).select("id", md5_int(F.col("_s")).alias("_h"))
    mins = ex.groupBy("id").agg(
        *[
            F.min(_hash_family(F.col("_h"), i)).alias(f"_m{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "id", F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("sig")
    )


def _band_keys(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """``(id, sig, band, bkey)`` — one row per (doc, LSH band), bkey =
    md5 of the band's signature slice.  SHARED by the in-corpus pair
    join and the snapshot-over-snapshot band index so the two can never
    drift formulas (a drift would silently change which docs collide).

    explode_outer, not explode: the band array is fixed-length (never
    empty), and inner explode makes Spark infer a size>0 filter whose
    pushdown re-inlines the whole signature expression into a second
    full evaluation per row (InferFiltersFromGenerate + pushdown).
    All-null signatures (no-shingle docs) are excluded via a constant
    comparison on the cheap band key (``concat_ws`` of all-null rows is
    ''), never via a filter on the signature expression itself — such a
    filter gets predicate-pushdown-inlined below the projection and
    re-evaluates all hashes per row."""
    return (
        sigs.select(
            "id",
            "sig",
            F.explode_outer(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.md5(
                                F.concat_ws(",", *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)])
                            ).alias("bkey"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
        .filter(F.col("bkey") != F.md5(F.lit("")))
    )


def minhash_lsh_pairs(
    sigs: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
    materialize: bool = True,
    persist_handles: list | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: (id_a, id_b, est_jaccard).

    Scale shape: explode to (band_key, id), self-join per bucket — the only
    shuffle is on band keys; bucket sizes bound the quadratic work, the
    standard MinHash-LSH trade-off.

    ``materialize=True`` persists the signature table before the self-join.
    A self-join over an unmaterialized expensive subtree evaluates it once
    per join side; at corpus scale that is two full passes over the raw
    text.  One signature pass + cache is the correct plan at 100 TB.

    Documents with no shingles (empty text) have an all-null signature;
    they are excluded via a constant comparison on the cheap band key
    (``concat_ws`` of all-null rows is ''), never via a filter on the
    signature expression itself — such a filter gets predicate-pushdown-
    inlined below the projection and re-evaluates all hashes per row.
    """
    n = bands * rows_per_band
    if materialize:
        sigs = sigs.persist()
        if persist_handles is not None:
            persist_handles.append(sigs)
    banded = _band_keys(sigs, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # fraction of equal signature positions estimates Jaccard
    match_cnt = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return pairs.select(
        "id_a",
        "id_b",
        # denominator = the signature length actually compared, NOT
        # bands*rows_per_band: with num_hashes > bands*rows the banding
        # examines a prefix but the estimate still uses every position.
        # (num_hashes < bands*rows fails loudly at the band build: Spark 4
        # ANSI element_at raises INVALID_ARRAY_INDEX_IN_ELEMENT_AT.)
        (match_cnt / F.size("sig_a").cast("double")).alias("est_jaccard"),
    )


# ---------------------------------------------------------------------------
# Incremental NEAR-dedup against a persisted LSH band index
# ---------------------------------------------------------------------------

_BAND_INDEX_PARAMS = ("mh_num_hashes", "mh_shingle_n", "mh_bands", "mh_rows_per_band")


def build_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """``(band int, bkey string, mh_* params)`` — the DISTINCT MinHash-LSH
    band buckets of an already-admitted corpus: the persisted state of
    incremental NEAR-dedup, the fuzzy sibling of
    :func:`build_content_index` (same CommonCrawl snapshot-over-snapshot
    posture — a re-crawled page usually differs by boilerplate, not
    content, so exact hashes miss it; an LSH band collision catches it).

    One signature pass + a distinct on (band, bkey): output cardinality
    is at most ``bands`` rows per admitted doc and SHRINKS under
    duplication (duplicate docs share buckets) — 8 band rows ≈ 300 bytes
    per doc of persisted state.  Append new snapshots' buckets as they
    are admitted, exactly like the content index.  The MinHash geometry
    rides along as constant columns so a probe can never run with a
    mismatched signature formula (which would silently stop collisions
    from firing).

    ``sigs`` (optional, r11 optimization): a precomputed ``(id, sig)``
    frame for EXACTLY ``df``'s rows under EXACTLY these
    ``num_hashes``/``shingle_n`` parameters — the shared-signature-scan
    shape for a caller that both builds an index and probes in one job
    (the signature aggregation is the dominant cost at every scale;
    computing it once over the superset and filtering beats two full
    passes — guide §2.3 "aggregate before you shuffle" applied across
    call sites).  The caller owns the parity contract; the default
    recomputes from ``df``.
    """
    if num_hashes != bands * rows_per_band:
        raise ValueError(
            f"num_hashes ({num_hashes}) must equal bands*rows_per_band "
            f"({bands}*{rows_per_band})"
        )
    if sigs is None:
        sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    return (
        _band_keys(sigs, bands, rows_per_band)
        .select("band", "bkey")
        .distinct()
        .select(
            "band",
            "bkey",
            F.lit(num_hashes).cast("int").alias("mh_num_hashes"),
            F.lit(shingle_n).cast("int").alias("mh_shingle_n"),
            F.lit(bands).cast("int").alias("mh_bands"),
            F.lit(rows_per_band).cast("int").alias("mh_rows_per_band"),
        )
    )


def dedup_against_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index: DataFrame,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Rows of ``df`` that share NO LSH band bucket with ``index`` (a
    :func:`build_band_index` frame) — the RefinedWeb/Dolma
    drop-on-collision posture for snapshot-over-snapshot near-dedup.
    Schema passes through untouched.

    Scale shape: one signature pass over the snapshot, an equi-join on
    (band, bkey) that touches only colliding buckets (LEFT SEMI, then a
    distinct on the colliding ids), and a LEFT ANTI rejoin on the id —
    no pairwise stage anywhere, and the index side carries ~300 bytes
    per admitted doc.  Both joins key on hashes (uniform, skew-free).
    The MinHash geometry comes from the index's embedded parameter
    columns, never from caller arguments.  Docs with no shingles (empty
    text) have no band keys, collide with nothing, and are KEPT —
    matching the exact twin's NULL-hash semantics.  In-batch near-dups
    are untouched: compose with :func:`fuzzy_dedup` for within-snapshot
    cleanup, exactly like the exact path composes with
    :func:`drop_exact_duplicates`.

    ``sigs`` (optional, r11 optimization): a precomputed ``(id, sig)``
    frame for EXACTLY ``df``'s rows under the index's embedded MinHash
    geometry — pass it when the same job already computed the snapshot's
    signatures (e.g. it built the index from a slice of this snapshot),
    so the dominant signature aggregation runs once, not per call site
    (same contract as :func:`build_band_index`'s ``sigs``).
    """
    missing = {"band", "bkey", *_BAND_INDEX_PARAMS} - set(index.columns)
    if missing:
        raise ValueError(
            f"index is missing columns {sorted(missing)}; build it with "
            "build_band_index"
        )
    if "_emm_band_hit" in df.columns:
        raise ValueError("df already has a _emm_band_hit column; rename it")
    head = index.select(*_BAND_INDEX_PARAMS).limit(1).collect()
    if not head:
        return df
    num_hashes, shingle_n, bands, rows_per_band = (int(v) for v in head[0])
    if sigs is None:
        sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    colliding = (
        _band_keys(sigs, bands, rows_per_band)
        .join(index.select("band", "bkey"), ["band", "bkey"], "left_semi")
        .select(F.col("id").alias("_emm_band_hit"))
        .distinct()
    )
    return df.join(
        colliding,
        F.col(id_col) == F.col("_emm_band_hit"),
        "left_anti",
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    score_decimals: int | None = 6,
    materialize: bool = True,
    persist_handles: list | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over word-shingle sets: (id_a, id_b, jaccard).

    PPJoin-style prefix filtering (exact — no candidates are lost):

    1. Rank every doc's shingles by ascending global document frequency
       (rarest first, deterministic shingle tie-break).
    2. A pair with jaccard >= t must share a shingle within each side's
       first ``|s| - ceil(t*|s|) + 1`` shingles in that order (AllPairs/
       PPJoin prefix theorem), so the self-join runs on PREFIX shingles
       only.
    3. Verify candidates exactly with a native ``array_intersect`` over the
       full shingle arrays.

    This is the 100 TB formulation: a stop-shingle appearing in a large
    fraction of the corpus ranks last within every doc and never enters a
    prefix unless a doc consists almost entirely of hot shingles — the
    quadratic join-bucket blowup of the naive inverted-index join cannot
    happen.  Costs one extra shuffle (the df-rank window on doc id) versus
    the naive plan; candidate verification is codegen'd array ops.

    ``materialize=True`` persists the shingle tables feeding the self-join
    (both sides would otherwise recompute the full tokenize + rank).  The
    cached blocks intentionally outlive the returned (lazy) plan; pass
    ``persist_handles`` to receive the persisted DataFrames and
    ``unpersist()`` them after the result is consumed — otherwise repeated
    calls in a long-lived session hold blocks until LRU eviction.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    ).withColumn("sz", F.size("sh"))
    if materialize:
        sh = sh.persist()
        if persist_handles is not None:
            persist_handles.append(sh)
    ex = sh.select("id", "sz", F.explode_outer("sh").alias("shingle")).filter(
        F.col("shingle").isNotNull()  # see minhash_lsh_pairs note on explode_outer
    )
    freq = ex.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("shingle"))
    prefix = (
        ex.join(freq, "shingle")
        .withColumn("_pos", F.row_number().over(w))
        .filter(F.col("_pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1)
        .select("id", "shingle")
    )
    if materialize:
        prefix = prefix.persist()
        if persist_handles is not None:
            persist_handles.append(prefix)
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                            F.col("sz").alias("sz_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                        F.col("sz").alias("sz_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    if score_decimals is not None:
        jac = F.round(jac, score_decimals)
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# corpus-wide duplicate-span detection (exact-substring dedup signal)
# ---------------------------------------------------------------------------

def _span_tokens(c: Column) -> Column:
    return F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda x: x != "")


def duplicate_window_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Per-document duplicated-passage signal — the Spark-shaped stand-in
    for suffix-array exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", public method): slide a
    ``window``-token hash window with ``stride`` over every document and
    count, corpus-wide, how many of a document's windows occur more than
    once ANYWHERE (other documents or elsewhere in the same one).

    Output: ``(id, n_windows, n_dup_windows, dup_ratio)``; documents with
    fewer than ``window`` tokens have 0 windows and NULL ratio.

    Scale shape: windows are native expressions (sequence -> transform ->
    slice -> md5, no UDF); duplicate marking is one hash-aggregate on the
    window hash (map-side combined — a boilerplate window repeated a
    billion times is ONE row after partial aggregation, never one task's
    buffer) joined back on the hash, then a per-doc aggregate.  Work is
    tokens/stride rows per document, independent of corpus size.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = _span_tokens(F.col(text_col))
    n_win = F.greatest(
        F.lit(0), F.floor((F.size(toks) - window) / stride) + 1
    ).cast("int")
    base = df.select(F.col(id_col), toks.alias("_t"), n_win.alias("_nw"))
    wins = base.select(
        id_col, "_nw",
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), F.greatest("_nw", F.lit(1))),
                lambda i: F.when(
                    F.col("_nw") >= i,
                    F.md5(F.concat_ws(" ", F.slice("_t", (i - 1) * stride + 1, window))),
                ),
            )
        ).alias("_h"),
    )
    counts = (
        wins.filter(F.col("_h").isNotNull())
        .groupBy("_h").agg(F.count("*").alias("_c"))
    )
    marked = wins.join(counts, "_h", "left")
    return marked.groupBy(id_col).agg(
        F.first("_nw").alias("n_windows"),
        F.sum(
            F.when(F.col("_h").isNotNull() & (F.col("_c") > 1), 1).otherwise(0)
        ).cast("int").alias("n_dup_windows"),
    ).withColumn(
        "dup_ratio",
        F.when(
            F.col("n_windows") > 0,
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        ),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Maximal duplicated TOKEN SPANS per document: the duplicated windows
    of :func:`duplicate_window_stats`, merged per document into maximal
    ``[start, end)`` token ranges (overlapping/adjacent windows coalesce)
    — what a remove-repeated-passages curation step cuts out.

    Output: one row per span — ``(id, span_start, span_end)`` in token
    offsets.  Merging is the classic interval merge expressed as windows
    PER DOCUMENT (running max of span ends -> new-span flag -> running
    span counter), bounded by windows-per-doc, never corpus-wide.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = _span_tokens(F.col(text_col))
    n_win = F.greatest(
        F.lit(0), F.floor((F.size(toks) - window) / stride) + 1
    ).cast("int")
    base = df.select(F.col(id_col), toks.alias("_t"), n_win.alias("_nw"))
    wins = base.filter(F.col("_nw") > 0).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("_nw") - 1),
                lambda p: F.struct(
                    (p * stride).alias("s"),
                    (p * stride + window).alias("e"),
                    F.md5(F.concat_ws(" ", F.slice("_t", p * stride + 1, window))).alias("h"),
                ),
            )
        ).alias("_w"),
    ).select(id_col, F.col("_w.s").alias("_s"), F.col("_w.e").alias("_e"), F.col("_w.h").alias("_h"))
    counts = wins.groupBy("_h").agg(F.count("*").alias("_c"))
    dup = wins.join(counts, "_h").filter(F.col("_c") > 1)
    wo = Window.partitionBy(id_col).orderBy(F.col("_s").asc())
    run_end = F.max("_e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "_new", F.when(run_end.isNull() | (F.col("_s") > run_end), 1).otherwise(0)
    ).withColumn(
        "_grp", F.sum("_new").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    return flagged.groupBy(id_col, "_grp").agg(
        F.min("_s").cast("long").alias("span_start"),
        F.max("_e").cast("long").alias("span_end"),
    ).drop("_grp")


def remove_duplicate_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Cut duplicated passages out of the corpus, keeping each passage's
    FIRST occurrence — the full Lee-et-al exact-substring dedup step (the
    suffix-array method's Spark-shaped equivalent; :func:`duplicate_spans`
    is its detection half).

    For every duplicated ``window``-token hash window, the corpus-wide
    winner is the smallest ``(id, position)`` occurrence (same
    ``min(struct(...))`` winner aggregate as :func:`line_dedup` — one
    hash-agg, engine-deterministic); every other occurrence's token range
    is removed.  Overlapping removed ranges merge per document, and the
    text is rebuilt from the surviving tokens (whitespace/punctuation
    normalize to single spaces — acceptable for training-corpus text).

    Output: ``(id, text, n_tokens, n_tokens_removed)``.

    NULL-text rows propagate as all-NULL output columns (tokenizing NULL
    is NULL, so every derived column stays NULL — the SQL-engine
    convention).  Note this deliberately DIVERGES from :func:`line_dedup`,
    whose contract pins ``(n_lines NULL, n_kept 0, text '')`` for the
    same input (its aggregate counts zero kept lines and re-joins them to
    ''); both conventions are oracle-checked, so composing the two means
    normalizing ''/NULL text first if downstream code treats them alike.

    Scale shape: windowing is native expressions; the winner table is one
    map-side-combined aggregate on the window hash; span merge + token
    cut are per-document windows/array ops bounded by document length.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = _span_tokens(F.col(text_col))
    n_win = F.greatest(
        F.lit(0), F.floor((F.size(toks) - window) / stride) + 1
    ).cast("int")
    base = df.select(F.col(id_col), toks.alias("_t"), n_win.alias("_nw"))
    occ = base.filter(F.col("_nw") > 0).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("_nw") - 1),
                lambda p: F.struct(
                    (p * stride).alias("s"),
                    F.md5(F.concat_ws(" ", F.slice("_t", p * stride + 1, window))).alias("h"),
                ),
            )
        ).alias("_w"),
    ).select(id_col, F.col("_w.s").alias("_s"), F.col("_w.h").alias("_h"))
    winners = occ.groupBy("_h").agg(
        F.count("*").alias("_c"),
        F.min(F.struct(F.col(id_col).alias("_i"), F.col("_s").alias("_p"))).alias("_win"),
    )
    losers = (
        occ.join(winners, "_h")
        .filter(
            (F.col("_c") > 1)
            & ~((F.col(id_col) == F.col("_win._i")) & (F.col("_s") == F.col("_win._p")))
        )
        .select(id_col, "_s", (F.col("_s") + window).alias("_e"))
    )
    wo = Window.partitionBy(id_col).orderBy(F.col("_s").asc())
    run_end = F.max("_e").over(wo.rowsBetween(Window.unboundedPreceding, -1))
    spans = (
        losers.withColumn(
            "_new", F.when(run_end.isNull() | (F.col("_s") > run_end), 1).otherwise(0)
        )
        .withColumn("_grp", F.sum("_new").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(id_col, "_grp")
        .agg(F.min("_s").alias("s"), F.max("_e").alias("e"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("_cut"))
    )
    joined = base.join(spans, id_col, "left")
    # O(tokens + spans) rebuild: the merged spans are sorted and disjoint,
    # so the kept tokens are exactly the complement gaps — slice the token
    # array once per gap and flatten, instead of testing every token
    # against every span (the previous F.exists formulation was
    # O(tokens × spans) per document: 10^8 comparisons in ONE task for a
    # 10^5-token fully-duplicated doc).  Gap boundaries: starts = [0] ++
    # span ends, ends = span starts ++ [n]; zero-length gaps (span at the
    # very start/end) yield empty slices.
    cut = F.coalesce("_cut", F.array().cast("array<struct<s:long,e:long>>"))
    n = F.size("_t").cast("long")
    gap_starts = F.concat(
        F.array(F.lit(0).cast("long")), F.transform(cut, lambda sp: sp["e"])
    )
    gap_ends = F.concat(F.transform(cut, lambda sp: sp["s"]), F.array(n))
    kept = F.flatten(
        F.zip_with(
            gap_starts,
            gap_ends,
            lambda gs, ge: F.when(
                ge > gs, F.slice("_t", (gs + 1).cast("int"), (ge - gs).cast("int"))
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    # NULL text propagates NULL throughout (matching what a SQL engine's
    # string/list functions do on NULL input — pinned in
    # tests/test_dedup.py), instead of the accidental ''/NULL mix a bare
    # concat_ws would produce.
    present = F.col("_t").isNotNull()
    return joined.select(
        id_col,
        F.when(present, F.concat_ws(" ", kept)).alias(text_col),
        F.when(present, F.size("_t")).cast("int").alias("n_tokens"),
        F.when(present, F.size("_t") - F.size(kept)).cast("int").alias("n_tokens_removed"),
    )


# ---------------------------------------------------------------------------
# corpus-wide line-level dedup (C4/RefinedWeb-style curation)
# ---------------------------------------------------------------------------

def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """Remove duplicate LINES across the whole corpus, keeping the first
    occurrence — the exact line-level dedup used by public LLM curation
    pipelines (C4 removes repeated lines/spans corpus-wide; RefinedWeb
    does exact line dedup before fuzzy doc dedup).

    First occurrence = smallest (doc id, line position); lines compare by
    trimmed lowercase text when ``normalize`` (C4 normalizes before
    hashing).  Returns one row per input document:
    ``(id, n_lines, n_kept, text)`` with ``text`` the kept lines re-joined
    by ``sep`` ('' when every line of a doc was seen earlier).  NULL-text
    docs come out as ``(n_lines NULL, n_kept 0, text '')`` — the
    aggregate-then-rejoin convention; :func:`remove_duplicate_passages`
    instead propagates all-NULL for the same input (see its docstring) —
    normalize ''/NULL before composing the two.

    Scale shape: explode lines once; the winner per distinct line is ONE
    ``min(struct(id, pos))`` hash-aggregate keyed by the line's md5
    (map-side partial agg collapses each partition's duplicates before the
    exchange); membership is an equi-join of the line table to that
    winner table on the hash; the rebuild is one ``sort_array`` aggregate
    per doc.  Three shuffles, all on high-cardinality keys (line hash,
    doc id) — no broadcast of corpus-sized state, no driver collect.
    """
    norm = F.trim(F.lower(F.col("line"))) if normalize else F.col("line")
    # \Q...\E quotes the separator so regex metachars ('|', '.') split
    # literally; the re-join below uses sep as a literal string.
    sep_re = "\\Q" + sep + "\\E"
    # posexplode_OUTER: split(NULL) is NULL and a plain posexplode would
    # silently DROP NULL-text documents from the output, violating the
    # one-row-per-doc contract; the outer variant keeps them as one
    # (pos NULL, line NULL) row that aggregates to
    # (n_lines NULL, n_kept 0, text '') — exactly what the SQL-engine
    # formulation (len(NULL) -> NULL, unnest drops, outer rejoin) yields.
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(F.split(F.col(text_col), sep_re, -1)).alias("pos", "line"),
    ).withColumn("_h", F.md5(norm))
    winners = (
        lines.filter(F.col("_h").isNotNull())
        .groupBy("_h").agg(F.min(F.struct("id", "pos")).alias("w"))
    )
    # One aggregation computes total AND kept-line stats per doc: every
    # real line keeps exactly one joined row (one winner per hash; the
    # left join keeps NULL-line rows unmatched), is_kept marks the
    # winners, and collect_list skips the NULLs of non-kept lines — so no
    # separate n_lines scan of the input is needed (it would re-run the
    # whole upstream lineage a second time just to count lines).
    j = lines.join(winners, "_h", "left")
    is_kept = (
        F.col("w").isNotNull()
        & (F.col("id") == F.col("w.id"))
        & (F.col("pos") == F.col("w.pos"))
    )
    agg = j.groupBy("id").agg(
        F.count("line").alias("n_lines"),
        F.sum(is_kept.cast("int")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(is_kept, F.struct("pos", "line")))
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text"),
    )
    return agg.select(
        "id",
        F.when(F.col("n_lines") > 0, F.col("n_lines")).cast("int").alias("n_lines"),
        F.col("n_kept").cast("int").alias("n_kept"),
        "text",
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    score_decimals: int | None = 6,
    max_collect_rows: int = 2_000_000,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — exact.

    Physical strategy: collect + broadcast the (normalized) corpus matrix,
    then one vectorized numpy GEMM per Arrow batch via ``mapInPandas`` —
    the same replicated-matrix idiom the reference uses for its GT TF-IDF
    matrix (reference spark_indexing_utils.py:51-100, spark_cos_sim_matcher
    .py:716-719).  One pass over the distributed side, no shuffle at all.

    A per-pair expression formulation (crossJoin + zip_with/aggregate dot)
    is ~50x slower: higher-order array functions evaluate interpreted,
    per element, and recompute both norms for every pair.

    Scale guard: the broadcast side must fit in driver + executor memory,
    so corpora larger than ``max_collect_rows`` are refused with a
    ``ValueError`` pointing at :func:`embedding_near_pairs_bucketed`
    (the 100 TB path — centroid-bucketed, no driver collect of the corpus).
    """
    import numpy as np

    spark = df.sparkSession
    n = df.limit(max_collect_rows + 1).count()
    if n > max_collect_rows:
        raise ValueError(
            f"embedding_near_pairs collects the corpus to the driver; got "
            f"> {max_collect_rows} rows. Use embedding_near_pairs_bucketed "
            f"(IVF-bucketed, fully distributed) or raise max_collect_rows "
            f"if the corpus genuinely fits in memory."
        )
    pdf = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).toPandas()
    ids = pdf["id"].to_numpy()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    normed = mat / np.where(norms == 0, np.nan, norms)
    bc = spark.sparkContext.broadcast((ids, normed))

    out_schema = (
        f"id_a {df.schema[id_col].dataType.simpleString()}, "
        f"id_b {df.schema[id_col].dataType.simpleString()}, cosine double"
    )

    def run(batches):
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf_in in batches:
            a_ids = pdf_in["id"].to_numpy()
            a = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf_in["v"]])
            an = np.linalg.norm(a, axis=1, keepdims=True)
            a = a / np.where(an == 0, np.nan, an)
            sims = a @ b_mat.T
            if score_decimals is not None:
                sims = np.round(sims, score_decimals)
            upper = a_ids[:, None] < b_ids[None, :]
            keep = upper & (sims >= threshold)
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": a_ids[ai], "id_b": b_ids[bi], "cosine": sims[ai, bi]}
            )

    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).mapInPandas(
        run, schema=out_schema
    )


def embedding_near_pairs_bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    nlist: int = 16,
    probe_margin: float | None = None,
    seed: int = 42,
    score_decimals: int | None = 6,
) -> DataFrame:
    """Near-dup pairs via IVF-style centroid bucketing — the 100 TB path.

    1. ``nlist`` centroids are a deterministic md5-ordered sample of corpus
       vectors (the same engine-portable scheme as ``ann.ivf_topk``); only
       these ``nlist`` rows are ever collected to the driver.
    2. One ``mapInPandas`` pass assigns every vector to its best centroid
       bucket AND every bucket within ``probe_margin`` cosine of the best
       (multi-probe) — pairs straddling a bucket boundary are still
       co-bucketed as long as their centroid-cosine gap is within the
       margin.
    3. Per-bucket all-pairs GEMM via ``applyInPandas`` (the exact verify
       step, identical numpy arithmetic to :func:`embedding_near_pairs`),
       then a pair-level dedup since multi-probe can form a pair in more
       than one bucket.

    Shuffle = one exchange on bucket id; the quadratic work is bounded per
    bucket.  Recall: exact for pairs whose members share an assigned
    bucket; with cosine threshold t and margin m, a qualifying pair is
    only missed if its centroid-cosine gap exceeds m.  For unit vectors
    that gap is bounded: |cos(a,c) - cos(b,c)| = |(a-b)·c| <= ||a-b|| =
    sqrt(2 - 2·cos(a,b)) <= sqrt(2 - 2t), so ``probe_margin=None``
    (default) derives m = sqrt(2 - 2t) and the output provably EQUALS the
    exact all-pairs result — no data-dependent recall.  Pass a smaller
    explicit margin to trade exactness for less multi-probe fan-out (the
    dedup regime t >= 0.9 derives a modest m ~ 0.45 anyway; low
    thresholds derive wide margins and cost correspondingly more).
    """
    import math

    import numpy as np

    from entitymatchingmodel_spark.functions.sampling import _unit_hash

    if probe_margin is None:
        probe_margin = math.sqrt(max(0.0, 2.0 - 2.0 * threshold))
    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cents_rows = (
        base.withColumn("_h", _unit_hash(F.col("id"), f"embnp{seed}"))
        .orderBy("_h", "id")
        .limit(nlist)
        .select("v")
        .collect()
    )
    cmat = np.asarray([np.asarray(r["v"], dtype=np.float64) for r in cents_rows])
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cmat = cmat / np.where(cn == 0, np.nan, cn)
    bc = spark.sparkContext.broadcast(cmat)

    id_t = df.schema[id_col].dataType.simpleString()
    vec_t = df.schema[vec_col].dataType.simpleString()

    def assign(batches):
        import pandas as pd

        cm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            an = np.linalg.norm(a, axis=1, keepdims=True)
            a = a / np.where(an == 0, np.nan, an)
            sims = a @ cm.T  # (batch, nlist)
            best = np.nanmax(sims, axis=1, keepdims=True)
            keep = sims >= best - probe_margin  # multi-probe cover
            ri, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "bucket": bi.astype("int32"),
                    "id": pdf["id"].to_numpy()[ri],
                    "v": pdf["v"].to_numpy()[ri],
                }
            )

    assigned = base.mapInPandas(assign, f"bucket int, id {id_t}, v {vec_t}")

    def bucket_pairs(pdf):
        import pandas as pd

        ids = pdf["id"].to_numpy()
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        normed = mat / np.where(norms == 0, np.nan, norms)
        sims = normed @ normed.T
        if score_decimals is not None:
            sims = np.round(sims, score_decimals)
        upper = ids[:, None] < ids[None, :]
        ai, bi = np.nonzero(upper & (sims >= threshold))
        return pd.DataFrame(
            {"id_a": ids[ai], "id_b": ids[bi], "cosine": sims[ai, bi]}
        )

    return (
        assigned.groupBy("bucket")
        .applyInPandas(bucket_pairs, f"id_a {id_t}, id_b {id_t}, cosine double")
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def _iter_checkpoint(df: DataFrame, reliable: bool) -> DataFrame:
    """Per-round plan truncation for the iterative component loops.

    ``reliable=False`` (default): ``localCheckpoint`` — executor-local
    blocks, fine on local mode and for fault-free runs, but an executor
    loss on a real cluster loses the checkpointed partitions mid-loop.
    ``reliable=True``: reliable ``checkpoint(eager=True)`` to the
    session's checkpoint dir (``spark.sparkContext.setCheckpointDir`` —
    HDFS/object store on a cluster), surviving executor loss at the cost
    of a write per round.  Raises with guidance if no dir is set.

    Checkpoint files from earlier rounds are NOT deleted by default —
    Spark removes a reliable checkpoint only when the RDD is GC'd AND
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``.  Set that
    conf on long-lived clusters (or clean the checkpoint dir between
    runs) so a many-round loop does not accumulate one snapshot per
    round.
    """
    if not reliable:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        raise ValueError(
            "reliable_checkpoint=True requires "
            "spark.sparkContext.setCheckpointDir(<fault-tolerant path>) "
            "to be called first (HDFS/S3/... on a cluster)."
        )
    return df.checkpoint(eager=True)


class _loop_shuffle_partitions:
    """Temporarily size ``spark.sql.shuffle.partitions`` to an iterative
    loop's measured data volume (``rows // rows_per_partition + 2``, never
    above the session setting), restoring the session value on exit.

    Rationale: each loop round materializes eagerly, so every exchange
    inherits the session-wide partition count — a 256-edge graph otherwise
    pays 32-64 near-empty tasks per exchange per round, and fixed task
    overhead dominates the loop (measured ~5s of pure scheduling at
    sf0.1).  Sizing to the data keeps tiny graphs on a couple of tasks
    while leaving large graphs at the session setting — the same
    data-proportional sizing the supervised trainer applies before
    boosting (supervised.py).

    In the micro regime (sized target <= 4 partitions) AQE is also
    switched off for the loop's duration: per-stage adaptive re-planning
    is pure latency when each round chains ~8 shuffles over a few hundred
    rows (measured ~25% of loop wall time), while at real data volumes
    the target stays large and AQE remains ON for skew-join handling.

    SINGLE-THREADED-SESSION assumption: these are session-wide confs, so
    any query running CONCURRENTLY on the same SparkSession during a
    clustering loop inherits the loop's partition count (and, in the
    micro regime, its disabled AQE), and two concurrent loops can clobber
    each other's saved values.  That matches how this engine is driven
    (one query at a time per session — bench, driver, tests); a
    concurrent-query deployment should run clustering loops in their own
    ``spark.newSession()`` so conf changes are isolated.
    """

    def __init__(self, spark, n_rows: int, rows_per_partition: int = 200_000):
        self._spark = spark
        self._old = spark.conf.get("spark.sql.shuffle.partitions")
        self._target = max(2, min(int(self._old), n_rows // rows_per_partition + 2))
        self._aqe = None

    def __enter__(self):
        conf = self._spark.conf
        conf.set("spark.sql.shuffle.partitions", str(self._target))
        if self._target <= 4:
            self._aqe = conf.get("spark.sql.adaptive.enabled")
            conf.set("spark.sql.adaptive.enabled", "false")
        return self

    def __exit__(self, *exc):
        conf = self._spark.conf
        conf.set("spark.sql.shuffle.partitions", self._old)
        if self._aqe is not None:
            conf.set("spark.sql.adaptive.enabled", self._aqe)
        return False


def duplicate_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iterations: int = 50,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """(id, cluster_id) — connected components of the near-dup pair graph.

    ``cluster_id`` is the minimum member id of each component; documents
    with no pairs form singleton clusters.  This is the step that turns
    pairwise near-dup output (minhash_lsh_pairs / simhash_near_pairs /
    ngram_jaccard_pairs) into a keep-one-per-cluster training-set policy:
    ``filter(id == cluster_id)`` keeps exactly one representative.

    Algorithm: iterative min-label propagation — each round every node takes
    the min label among itself and its neighbours; converges in O(graph
    diameter) rounds (near-dup components are short chains in practice).
    Each round is one join + one groupBy; labels are localCheckpoint'ed per
    round — iterative DataFrames COMPOSE logical plans, and without plan
    truncation Catalyst analysis grows without bound with the round count
    (persist caches data, not the plan).  The loop exits on a
    converged-count check.  For adversarially long chains use
    :func:`duplicate_clusters_star` — same output contract, O(log n)
    rounds.
    """
    # symmetrize with ONE evaluation of the pair DAG (r11, guide §1.2): a
    # union of two selects references the (often expensive — LSH
    # self-join / bucketed ANN) pairs subtree twice per materialization;
    # the 2-struct explode emits both directions from a single pass.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("_e")
        )
        .select(F.col("_e.src").alias("src"), F.col("_e.dst").alias("dst"))
        .distinct()
        .persist()
    )
    n_nodes = ids.count()
    converged = False
    with _loop_shuffle_partitions(edges.sparkSession, n_nodes):
        # Narrow both loop inputs to the loop's partitioning ONCE (r11,
        # guide §2.4): the edge cache and the initial label frame carry
        # the session-width partitioning (32+ partitions locally), so
        # every round's join otherwise re-scans wide caches with
        # near-empty tasks; the edge side is additionally repartitioned
        # by its JOIN KEY (dst) and checkpointed — LogicalRDD preserves
        # the partitioning, so the per-round join reuses it instead of
        # re-exchanging the edges every round.
        edges_n = _iter_checkpoint(
            edges.repartition("dst"), reliable_checkpoint
        )
        edges.unpersist()
        labels = _iter_checkpoint(
            ids.select(F.col(id_col).alias("src"), F.col(id_col).alias("lbl"))
            .repartition("src"),
            reliable_checkpoint,
        )
        for _ in range(max_iterations):
            neigh = (
                edges_n.join(labels.withColumnRenamed("src", "dst"), "dst")
                .groupBy("src")
                .agg(F.min("lbl").alias("nlbl"))
            )
            # Carry the previous label through the checkpoint so the
            # convergence check is a shuffle-free scan of the checkpointed
            # data — a separate new-vs-old join here costs two extra
            # exchanges and an action per round (measured as the r4
            # dup_clusters bench regression).
            stepped = _iter_checkpoint(
                labels.join(neigh, "src", "left").select(
                    "src",
                    F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"),
                    F.col("lbl").alias("old"),
                ),
                reliable_checkpoint,
            )
            changed = stepped.filter(F.col("lbl") != F.col("old")).limit(1).count()
            labels = stepped.select("src", "lbl")
            if changed == 0:
                converged = True
                break
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iterations} rounds "
            "(component diameter exceeds max_iterations) — returning partial "
            "labels would silently split clusters; raise max_iterations or "
            "use duplicate_clusters_star (O(log n) rounds)."
        )
    return labels.select(F.col("src").alias(id_col), F.col("lbl").alias("cluster_id"))


def duplicate_clusters_star(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iterations: int = 30,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """(id, cluster_id) — connected components via alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce and
    Beyond", public algorithm).  Same output contract as
    :func:`duplicate_clusters` (cluster_id = component min; singletons
    included), but converges in O(log n) rounds regardless of graph
    diameter — the scale-safe choice for adversarially long dup chains
    where min-label propagation needs O(diameter) rounds.

    Each round is two hash-aggregate + join passes over the edge list plus
    an exact fixed-point check.  Edges are localCheckpoint'ed per round:
    star rounds COMPOSE plans (round k's plan nests k-1 rounds), so without
    plan truncation Catalyst analysis blows up exponentially — persist()
    caches data but not the logical plan.
    """
    # one-pass symmetrize via the 2-struct explode — see
    # duplicate_clusters (a union of two selects evaluates the pair DAG
    # twice per materialization)
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("u"), F.col("id_b").alias("v")),
                    F.struct(F.col("id_b").alias("u"), F.col("id_a").alias("v")),
                )
            ).alias("_e")
        )
        .select(F.col("_e.u").alias("u"), F.col("_e.v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )

    def large_star(e: DataFrame) -> DataFrame:
        # symmetric neighbourhood; m(u) = min(N(u) + {u}); for v > u emit (v, m)
        s = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
        m = s.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            s.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient v < u; m(u) = min(N(u)); emit (x, m) for x in N(u) + {u}
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v")).distinct()
        m = o.groupBy("u").agg(F.min("v").alias("m"))
        joined = o.join(m, "u")
        out = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return out

    # Exact fixed-point check, cheapened: both edge sets are distinct, so
    # equal counts + (new \ old) empty implies set equality — the exceptAll
    # job only runs in the (usually final) round where counts already match.
    # Materialize + count sym first: the count sizes the loop's shuffle
    # partitions (see _loop_shuffle_partitions) so EVERY star round —
    # including the first, measured ~8x slower when run at the session
    # partition count on a small graph — runs at data-proportional width.
    n_sym = sym.count()
    converged = False
    with _loop_shuffle_partitions(sym.sparkSession, n_sym):
        # Narrow the session-width edge cache to the loop's partitioning
        # ONCE before the first round (r11, guide §2.4):
        # ``small_star(large_star(e))`` references ``e``'s subtree FOUR
        # times (o, m-of-o, and both union branches of the join — Spark
        # reuses identical exchanges, not arbitrary subtrees), so the
        # first round otherwise re-scans the wide persisted cache through
        # several duplicated session-width map stages — measured 3.75s ->
        # 1.15s for round 0 at sf0.1 (256 edges, 32 -> 2 partitions);
        # later rounds already read narrow checkpoints.
        sym_n = _iter_checkpoint(sym.repartition("u"), reliable_checkpoint)
        sym.unpersist()
        edges = _iter_checkpoint(small_star(large_star(sym_n)), reliable_checkpoint)
        n_edges = edges.count()
        for _ in range(max_iterations):
            new_edges = _iter_checkpoint(
                small_star(large_star(edges)), reliable_checkpoint
            )
            n_new = new_edges.count()
            converged = (
                n_new == n_edges
                and new_edges.exceptAll(edges).limit(1).count() == 0
            )
            edges, n_edges = new_edges, n_new
            if converged:
                break
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters_star did not reach its fixed point in "
            f"{max_iterations} rounds — raise max_iterations (O(log n) "
            "rounds normally suffice)."
        )
    labels = edges.groupBy("u").agg(F.min("v").alias("lbl"))
    out = (
        ids.select(F.col(id_col).alias("u"))
        .join(labels, "u", "left")
        .select(
            F.col("u").alias(id_col),
            F.coalesce("lbl", "u").alias("cluster_id"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """(id, simhash) — per-document SimHash over word tokens, fully native.

    Explode distinct tokens, hash each once, then ONE hash-aggregate per
    doc computing the ``bits`` per-bit +1/-1 vote sums as plain ``sum()``
    aggregates (sign -> bit).  Same rationale as ``minhash_signatures``:
    array higher-order functions (``aggregate`` over the token array per
    bit) evaluate interpreted, per element; plain aggregates stay inside
    whole-stage codegen, and the map-side partial aggregation collapses to
    one row per doc before the exchange.

    Docs with no tokens keep a row via ``explode_outer`` and hash to 0
    (votes 0 -> all bits 0), matching the previous semantics.

    The per-token hash is ``bits`` wide (md5 hex prefix of ceil(bits/4)
    chars) — a hash NARROWER than ``bits`` leaves the high vote bits
    constant, which both degrades the fingerprint and collapses the high
    bit-block of :func:`simhash_near_pairs` to a handful of buckets (a
    quadratic join blowup at corpus scale).  ``bits`` is capped at 60 so
    the hex-prefix integer stays inside a signed 64-bit long.
    """
    if not 1 <= bits <= 60:
        raise ValueError("bits must be in [1, 60] (hash must fill every bit)")
    n_hex = (bits + 3) // 4
    tok_hash = F.conv(F.substring(F.md5(F.col("_t")), 1, n_hex), 16, 10).cast("long")
    if bits % 4:
        tok_hash = F.pmod(tok_hash, F.lit(1 << bits))
    toks = F.array_distinct(word_tokens(F.lower(F.col(text_col))))
    ex = df.select(F.col(id_col).alias("id"), F.explode_outer(toks).alias("_t")).select(
        "id", tok_hash.alias("_h")
    )
    votes = ex.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.pmod(F.shiftright(F.col("_h"), i), F.lit(2)) == 1, 1)
                .when(F.col("_h").isNotNull(), -1)
                .otherwise(0)
            ).alias(f"_v{i}")
            for i in range(bits)
        ]
    )
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"_v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return votes.select("id", sim.cast("long").alias("simhash"))


def simhash_near_pairs(
    sim: DataFrame, bits: int = 32, max_hamming: int = 3, blocks: int = 4,
    materialize: bool = True, persist_handles: list | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on bit-chunks (pigeonhole: a pair
    within max_hamming <= blocks-1 differing bits must agree on >= 1 block),
    then verify exact Hamming distance natively via bit_count(xor).

    ``materialize=True`` persists the signature input before the self-join
    (both join sides would otherwise recompute it — same rationale as
    minhash_lsh_pairs / ngram_jaccard_pairs)."""
    if bits % blocks:
        raise ValueError(
            f"bits ({bits}) must divide evenly into blocks ({blocks}); a "
            "truncated chunk would leave high bits outside every block key "
            "and silently miss near-pairs"
        )
    if materialize:
        sim = sim.persist()
        if persist_handles is not None:
            persist_handles.append(sim)
    chunk = bits // blocks
    mask = (1 << chunk) - 1
    banded = sim.select(
        "id",
        "simhash",
        F.explode_outer(  # fixed-length array; see minhash_lsh_pairs note
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("simhash", i * chunk).bitwiseAND(F.lit(mask)).alias("bkey"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.bkey").alias("bkey"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["blk", "bkey"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup-style one-call composition)
# ---------------------------------------------------------------------------

def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    nlist: int = 16,
    probe_margin: float | None = None,
    seed: int = 42,
    use_star: bool = False,
    max_iterations: int | None = None,
    validate: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication in ONE call (Abbas et al.,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", public method): embedding-cosine near-dup pairs →
    connected components → keep ONE representative per semantic cluster.

    This composes the three already-exact primitives a curation user would
    otherwise wire by hand:

    1. :func:`embedding_near_pairs_bucketed` — IVF-bucketed pair
       generation with the provable-recall margin (no driver collect of
       the corpus; one shuffle on bucket id), so the pair set EQUALS the
       exact all-pairs result at the default margin.
    2. :func:`duplicate_clusters` (or the O(log n)-round
       :func:`duplicate_clusters_star` with ``use_star=True`` for
       adversarially long dup chains) — cluster id = component min.
    3. Keep-one-per-cluster: the representative is the MINIMUM member id
       (== the cluster id), the same first-occurrence-wins policy as
       :func:`line_dedup` / :func:`remove_duplicate_passages` —
       deterministic across runs, partitionings, and engines.

    Returns the KEPT rows: every input column of ``df`` plus
    ``cluster_size`` (how many input rows this representative stands
    for); ``sum(cluster_size)`` over the output equals the input count.
    That invariant assumes ``id_col`` is UNIQUE; ``validate=True`` checks
    it with one short-circuiting aggregate (opt-in, same convention as
    ``sampling.per_group_cap``).

    Scale shape: pair generation is the bucketed 100 TB path; clustering
    is O(diameter) (or O(log n)) joins; the keep step is one count
    aggregate over the labels (cluster_id is itself the representative
    id, so no extra winner pass) and one equi-join back to ``df``.  No
    driver materialization beyond the ``nlist`` centroids and the
    per-round convergence scalars.
    """
    pairs = embedding_near_pairs_bucketed(
        df, id_col, vec_col,
        threshold=threshold, nlist=nlist, probe_margin=probe_margin, seed=seed,
    )
    return _keep_one_per_cluster(df, id_col, pairs, use_star, max_iterations,
                                 validate=validate)


def _keep_one_per_cluster(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    use_star: bool,
    max_iterations: int | None,
    validate: bool = False,
) -> DataFrame:
    """Shared keep-one tail of the one-call dedup compositions: cluster the
    pair graph, then keep each cluster's min-id member (the representative
    IS the cluster id, so the per-cluster count aggregate doubles as the
    keep table) with its ``cluster_size``.

    PRECONDITION: ``id_col`` is unique.  Duplicate ids inflate
    ``cluster_size`` and make the rejoin emit duplicate representative
    rows, breaking the documented ``sum(cluster_size) == input count``
    invariant.  ``validate=True`` enforces it with one short-circuiting
    aggregate (the same opt-in probe as ``sampling.per_group_cap``).
    """
    if validate:
        dup = (
            df.groupBy(id_col).agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1).limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"id column {id_col!r} is not unique (e.g. "
                f"{dup[0][id_col]!r} appears {dup[0]['_n']} times); "
                "duplicate ids inflate cluster_size and emit duplicate "
                "representative rows, breaking sum(cluster_size) == "
                "input-count"
            )
    ids = df.select(F.col(id_col).alias("id"))
    cluster_fn = duplicate_clusters_star if use_star else duplicate_clusters
    kwargs = {} if max_iterations is None else {"max_iterations": max_iterations}
    clusters = cluster_fn(ids, pairs, **kwargs)
    reps = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return df.join(
        reps.withColumnRenamed("cluster_id", id_col), id_col, "inner"
    )


def fuzzy_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    bands: int = 8,
    rows_per_band: int = 4,
    min_jaccard: float = 0.5,
    use_star: bool = False,
    max_iterations: int | None = None,
    persist_handles: list | None = None,
    validate: bool = False,
) -> DataFrame:
    """MinHash-LSH fuzzy deduplication in ONE call — the lexical sibling of
    :func:`semantic_dedup` and the document-level fuzzy-dedup step public
    LLM curation pipelines run (RefinedWeb / Dolma style: MinHash
    signatures → LSH candidate pairs → Jaccard cutoff → connected
    components → keep one document per cluster).

    Composes the already-exact primitives: :func:`minhash_signatures`,
    :func:`minhash_lsh_pairs` (filtered at ``min_jaccard`` on the
    signature-estimated Jaccard), :func:`duplicate_clusters` (or the
    O(log n)-round star variant), then the min-id keep-one policy shared
    by every dedup operator in this module.

    Returns the KEPT rows: every input column plus ``cluster_size``;
    ``sum(cluster_size)`` over the output equals the input count.  That
    invariant assumes ``id_col`` is UNIQUE; ``validate=True`` checks it
    with one short-circuiting aggregate (opt-in, same convention as
    ``sampling.per_group_cap``).

    Scale shape: shuffles on shingle hash / band key / id only; the
    quadratic work is bounded per LSH bucket; clustering is O(diameter)
    (or O(log n)) joins; the keep step is one count aggregate (the
    representative IS the cluster id) and one equi-join back to ``df``.
    ``persist_handles`` receives the signature cache from the LSH
    self-join (see :func:`minhash_lsh_pairs`).
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    pairs = minhash_lsh_pairs(
        sigs, bands=bands, rows_per_band=rows_per_band,
        persist_handles=persist_handles,
    ).filter(F.col("est_jaccard") >= min_jaccard)
    return _keep_one_per_cluster(df, id_col, pairs, use_star, max_iterations,
                                 validate=validate)
