"""Document deduplication suite (LLM-pipeline extension operators).

Four tiers, all scale-first:

- ``exact``: hash-groupBy on a content fingerprint (functions/text.py) —
  one shuffle on the fingerprint.
- ``minhash_lsh``: char-shingle → minhash signature → banded LSH buckets →
  candidate pairs → exact-Jaccard verification.  The signature aggregate is
  computed via explode + codegen'd multi-min hash aggregate (NOT per-row
  higher-order lambdas, which are interpreted and ~100× slower); candidate
  generation is an equi-join on (band_idx, band_hash) — never an all-pairs
  product, so the quadratic blowup is confined to within-bucket pairs.
- ``ngram_jaccard``: the exact verifier, usable standalone on a bounded
  pair set (array_intersect/array_union set semantics).
- ``simhash``: 64-bit sign sketch + hamming distance (vector inputs:
  functions/vector.py simhash64; text inputs: xxhash64 token sketch).

ANSI-mode note: Spark 4 throws on long overflow, so the k permutations
(a_i·h + b_i) mod P work in a 31-bit hash space (product < 2^62).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_ops_spark.functions.text import char_ngrams

_P31 = (1 << 31) - 1  # Mersenne prime 2^31-1


def _perm_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs from a fixed LCG — no RNG at plan
    time (reproducible across runs/partitions)."""
    params = []
    state = 0x5DEECE66D
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_P31 - 2)) + 1  # a ∈ [1, P-2]
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P31
        params.append((a, b))
    return params


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 8) -> DataFrame:
    """(id, shingles array<string> DISTINCT) — shared by minhash + verify.

    Lowercasing is staged as its own projection so it runs once per row,
    not once per shingle (see char_ngrams PERF note)."""
    lowered = df.select(
        F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("__lt")
    )
    return lowered.select(
        "id",
        F.array_distinct(char_ngrams(F.col("__lt"), n, pre_lowered=True)).alias(
            "shingles"
        ),
    )


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) minhash signature columns.

    Explode the shingle set and compute all k permuted minima in ONE
    codegen'd hash aggregate — k min() functions over (a_i·h+b_i) mod P —
    instead of k interpreted array traversals per row.
    """
    exploded = shingled.select(
        "id", F.explode("shingles").alias("sh")
    ).withColumn("h", F.pmod(F.xxhash64("sh"), F.lit(_P31)))
    aggs = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_P31))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_perm_params(num_hashes))
    ]
    return exploded.groupBy("id").agg(*aggs)


def band_stack(
    signatures: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """(id, band, bucket) rows: each band's r = k/bands signature values
    hash to one bucket key.  This stacked form is both the self-join key
    set for offline pair generation and the persisted probe index for
    ONLINE (at-ingest) near-dup flagging (streaming/dedup.py)."""
    r = num_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{band * r + i}") for i in range(r)]).alias(
            f"band_{band}"
        )
        for band in range(bands)
    ]
    banded = signatures.select("id", *band_cols)
    return banded.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def lsh_bucket_probe(stacked: DataFrame) -> dict:
    """One bounded aggregate over the banded index: the bucket-size
    summary ``plans.sizing.lsh_max_bucket`` sizes the hot-bucket cap
    from (q264's corpus-level prediction, measured at the index).
    Returns {"n_buckets", "p99_bucket", "max_bucket"}."""
    row = (
        stacked.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.expr("percentile_approx(__n, 0.99)").alias("p99"),
            F.max("__n").alias("mx"),
        )
        .collect()[0]
    )
    return {
        "n_buckets": int(row["n_buckets"] or 0),
        "p99_bucket": int(row["p99"] or 0),
        "max_bucket": int(row["mx"] or 0),
    }


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int | str | None = None,
) -> DataFrame:
    """(id_a, id_b) candidate pairs (id_a < id_b) from banded LSH.

    The pair generation is a self equi-join on (band, bucket) — the
    shuffle key spreads uniformly, and AQE's skew handling covers
    pathological buckets.

    ``max_bucket`` (opt-in) drops buckets holding more than that many
    docs BEFORE the pair join — the standard production guard for
    boilerplate-heavy corpora, where a few stop-shingle buckets go
    quadratic (this repo's adversarial shared-vocab corpus measured
    1.6M→17.8M candidates from 150k→500k docs with no cap; q264 is the
    feasibility probe that predicts it).  Recall cost is tiny by
    design: a true near-dup pair collides in ~``bands`` independent
    bands, so skipping one hot bucket still leaves every other band to
    catch it (measured at 500k docs: cap=256 halves the candidates
    9.0M vs 17.8M, halves the verify 72s vs 142s, and the verified
    pair set is IDENTICAL).  Precondition: run exact dedup first —
    thousands of byte-identical docs bucket together in EVERY band, so
    no cap is safe for them (the curation pipeline orders the stages
    this way already).
    """
    stacked = band_stack(signatures, num_hashes, bands)
    if max_bucket == "auto":
        # probe the banded index once and let the sizing rule decide —
        # returns None (no semi-join at all) on healthy corpora
        from stock_ops_spark.plans.sizing import lsh_max_bucket

        stacked = stacked.localCheckpoint(eager=True)  # probe + join reuse
        probe = lsh_bucket_probe(stacked)
        max_bucket = lsh_max_bucket(
            probe["p99_bucket"], probe["max_bucket"]
        )
    if max_bucket is not None:
        sizes = stacked.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__n")
        )
        stacked = (
            stacked.join(
                sizes.where(F.col("__n") <= max_bucket),
                ["band", "bucket"],
                "left_semi",
            )
        )
    left = stacked.alias("l")
    right = stacked.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingled: DataFrame, threshold: float
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (set semantics via
    array_intersect / array_union on already-distinct shingle arrays)."""
    a = shingled.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = shingled.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 8,
    max_bucket: int | str | None = None,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH → exact verify.
    ``max_bucket``: see ``lsh_candidate_pairs`` ("auto" probes the
    banded index and sizes the hot-bucket cap via
    ``plans.sizing.lsh_max_bucket``; default None keeps every oracled
    caller byte-identical).

    With k=64, b=16 (r=4): P(candidate | jaccard=0.9) ≈ 1-(1-0.9^4)^16
    ≈ 1-6e-8 — effectively total recall at the 0.9 level the corpus
    plants, while jaccard<0.3 pairs almost never collide in all 4 rows of
    a band.
    """
    # Spread the CPU-heavy shingle/hash work across all cores: a small
    # corpus arriving as one parquet file is one input partition, which
    # would serialize ~length(text) substring+hash ops per doc onto a
    # single thread.  (At 100 TB the source has many partitions already;
    # this narrow repartition of doc rows is noise.)
    # Eager checkpoint: the shingle arrays are consumed twice (signatures +
    # exact verify) and explode's inferred size>0 filter would otherwise
    # recompute the whole shingle expression a second time per pass —
    # materializing once cuts the pipeline ~2x.
    par = df.sparkSession.sparkContext.defaultParallelism
    shingled = shingle_sets(df.repartition(par), id_col, text_col, shingle_n).localCheckpoint(
        eager=True
    )
    sigs = minhash_signatures(shingled, num_hashes)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands, max_bucket=max_bucket)
    return jaccard_verify(cands, shingled, threshold)


def minhash_band_state(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 8,
) -> DataFrame:
    """(id, fp, band, bucket) — the per-doc refresh state the cached
    pair builder persists NEXT TO the pair artifact.

    ``fp`` (md5 of the raw text) identifies the doc version, the band
    rows are its LSH index entries.  On the next corpus rewrite the
    incremental path diffs (id, fp) against this table to find the
    delta and probes the delta's new bands against the carried band
    rows — the same banded index the streaming near-dup flagger keeps
    (streaming/dedup.py), here in its batch-artifact form.

    Every doc has >= 1 shingle (shingle_sets falls back to the whole
    text below n chars), so every doc has band rows — no sentinel rows
    needed for the diff to see the whole corpus."""
    fps = df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp")
    )
    shingled = shingle_sets(df, id_col, text_col, shingle_n)
    bb = band_stack(minhash_signatures(shingled, num_hashes), num_hashes, bands)
    return fps.join(bb, "id").select("id", "fp", "band", "bucket")


def minhash_pairs_delta(
    df: DataFrame,
    id_col: str,
    text_col: str,
    old_pairs: DataFrame,
    old_state: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 8,
    stats: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental near-dup refresh: compute pairs for (new ∪ changed)
    docs against the persisted band index instead of re-shingling the
    corpus (VERDICT r5 #2).

    Semantics are EXACTLY the full rebuild's:

    - docs absent from ``old_state`` or with a different fp are the
      DELTA; only they are shingled/hashed/banded.
    - old pairs both of whose endpoints are unchanged are carried
      verbatim (their texts didn't change, so neither did their
      jaccard); pairs touching a removed/changed doc are dropped (a
      changed doc re-pairs from its new bands).
    - candidates = delta bands ⋈ full band index (carried + delta), so
      every new pair has >= 1 delta endpoint — pairs between two
      unchanged docs were candidates in the previous build already and
      cannot newly appear (their bands are unchanged).
    - exact-jaccard verification re-shingles ONLY docs that occur in a
      candidate pair (a bounded semi-join of the corpus), never the
      whole corpus.

    Returns (pairs, new_state); ``stats`` (if given) gets the work
    counters the delta test asserts on: n_docs / n_delta / n_gone /
    n_verify_docs / n_carried / n_new.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    cur = df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp")
    )
    old_docs = old_state.select("id", "fp").distinct()
    delta_ids = (
        cur.join(old_docs, ["id", "fp"], "left_anti")
        .select("id")
        .localCheckpoint(eager=True)
    )
    gone_ids = (
        old_docs.join(cur, ["id", "fp"], "left_anti")
        .select("id")
        .localCheckpoint(eager=True)
    )
    kept_state = old_state.join(gone_ids, "id", "left_anti")

    delta_df = df.join(
        delta_ids, F.col(id_col) == delta_ids.id, "left_semi"
    )
    shingled_delta = shingle_sets(
        delta_df.repartition(par), id_col, text_col, shingle_n
    ).localCheckpoint(eager=True)
    bands_delta = band_stack(
        minhash_signatures(shingled_delta, num_hashes), num_hashes, bands
    )
    state_delta = (
        delta_df.select(
            F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp")
        )
        .join(bands_delta, "id")
        .select("id", "fp", "band", "bucket")
    )
    new_state = kept_state.select("id", "fp", "band", "bucket").unionByName(
        state_delta
    ).localCheckpoint(eager=True)

    # delta-side probe against the FULL index (carried + delta): one
    # equi-join on (band, bucket), never a corpus self-join
    probe = bands_delta.alias("l")
    index = new_state.select("id", "band", "bucket").alias("r")
    cand = (
        probe.join(
            index,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") != F.col("r.id")),
        )
        .select(
            F.least(F.col("l.id"), F.col("r.id")).alias("id_a"),
            F.greatest(F.col("l.id"), F.col("r.id")).alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verify_docs = df.join(cand_ids, F.col(id_col) == cand_ids.id, "left_semi")
    shingled_ver = shingle_sets(
        verify_docs.repartition(par), id_col, text_col, shingle_n
    ).localCheckpoint(eager=True)
    new_pairs = jaccard_verify(cand, shingled_ver, threshold)

    carried = old_pairs.join(
        gone_ids, old_pairs.id_a == gone_ids.id, "left_anti"
    )
    carried = carried.join(gone_ids, carried.id_b == gone_ids.id, "left_anti")
    pairs = carried.select("id_a", "id_b", "jaccard").unionByName(new_pairs)

    if stats is not None:
        stats["n_docs"] = df.count()
        stats["n_delta"] = delta_ids.count()
        stats["n_gone"] = gone_ids.count()
        stats["n_verify_docs"] = cand_ids.count()
        stats["n_carried"] = carried.count()
        stats["n_new"] = new_pairs.count()
    return pairs, new_state


def minhash_near_dup_pairs_cached(
    df: DataFrame,
    source_path: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 8,
    cache_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Persisted twin of ``minhash_near_dup_pairs`` — the verified pair
    set as a materialized artifact, the same discipline as
    ``clustering.fit_or_load_centroids``: a production dedup pipeline
    computes candidate pairs ONCE and every downstream stage (pair
    report q21, clustering q70, joint consensus q86, canonicalization
    q108) reads the artifact instead of re-shingling the corpus.  At
    100 TB the pipeline is hours of work; recomputing it per consumer
    is the difference between one pass and four.

    Cache layout (VERDICT r5 #2 — incremental refresh): the key splits
    into a FAMILY digest (source abspath + params + algorithm v-tag,
    constant across corpus rewrites) and a VERSION digest (source
    mtime+size).  Each version persists TWO artifacts: the verified
    pairs and the band-index state (``minhash_band_state``).  On a
    version miss where a prior complete version of the same family
    exists, ``minhash_pairs_delta`` computes pairs for only the
    (new ∪ changed) docs against the carried band index — the full
    pipeline runs only on a true cold start.  Both writes are atomic
    tmp+rename (``artifacts.publish``); a crashed refresh leaves the
    prior version intact and is retried whole.

    ``stats`` (dict, optional) receives the delta-path work counters —
    the incremental test asserts a 5% append re-shingles only ~5% of
    the corpus.
    """
    from stock_ops_spark.operators import artifacts

    spark = df.sparkSession
    if cache_dir is None:
        cache_dir = artifacts.default_cache_dir()
    famraw = (
        f"v2|{os.path.abspath(source_path)}|{id_col}|{text_col}"
        f"|t={threshold}|k={num_hashes}|b={bands}|n={shingle_n}"
    )
    fam = artifacts.cache_key(famraw)
    ver = artifacts.cache_key(artifacts.source_identity(source_path))
    suffixes = [".pairs.parquet", ".state.parquet"]
    ppath = artifacts.versioned_path(cache_dir, "neardup", fam, ver, suffixes[0])
    spath = artifacts.versioned_path(cache_dir, "neardup", fam, ver, suffixes[1])
    if os.path.isdir(ppath):
        return spark.read.parquet(ppath)
    os.makedirs(cache_dir, exist_ok=True)
    prior = artifacts.find_prior_version(cache_dir, "neardup", fam, ver, suffixes)
    if prior is not None:
        old_pairs = spark.read.parquet(
            artifacts.versioned_path(cache_dir, "neardup", fam, prior, suffixes[0])
        )
        old_state = spark.read.parquet(
            artifacts.versioned_path(cache_dir, "neardup", fam, prior, suffixes[1])
        )
        pairs, state = minhash_pairs_delta(
            df, id_col, text_col, old_pairs, old_state,
            threshold, num_hashes, bands, shingle_n, stats=stats,
        )
    else:
        pairs = minhash_near_dup_pairs(
            df, id_col, text_col, threshold, num_hashes, bands, shingle_n
        )
        state = minhash_band_state(
            df, id_col, text_col, num_hashes, bands, shingle_n
        )
    artifacts.publish(state, spath)
    artifacts.publish(pairs, ppath)
    return spark.read.parquet(ppath)


def exact_dup_groups(df: DataFrame, id_col: str, fingerprint) -> DataFrame:
    """Exact-dup clusters: (fingerprint, n_docs, canonical_id=min id)."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint.alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("canonical_id"))
    )


def text_simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sk) — classic 64-bit text SimHash: per-token xxhash64, each
    bit position votes +1/-1 weighted by token frequency, sketch bit =
    sign of the vote sum.

    Implemented as explode(tokens) → one aggregate with 64 conditional-sum
    functions (codegen'd, same pattern as minhash_signatures) → bit
    reassembly via bitwise OR.  Near-dup docs differ in few tokens → few
    bit flips → small hamming distance.
    """
    from stock_ops_spark.functions.text import tokens as tok_fn

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tok_fn(F.lower(F.col(text_col)))).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    # vote_i = sum over tokens of (bit_i(h) ? +1 : -1)
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v_{i}")
            for i in range(64)
        ]
    )
    sk = F.lit(0).cast("long")
    for i in range(64):
        sk = sk.bitwiseOR(
            F.when(
                F.col(f"v_{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("id", sk.alias("sk"))


def text_simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs by banded text-SimHash: pairs within
    ``max_hamming`` that share at least one exact 16-bit band (pigeonhole-
    certain when hamming < bands).  Verify candidates with jaccard_verify
    for exact semantics."""
    bits = 64 // bands
    sk = text_simhash64(df, id_col, text_col)
    stacked = sk.select(
        "id",
        "sk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sk"), b * bits)
                        .bitwiseAND(F.lit((1 << bits) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sk", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    l, r = stacked.alias("l"), stacked.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sk").bitwiseXOR(F.col("r.sk"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_num: int = 4,
    threshold_den: int = 5,
    n: int = 8,
    restrict_ids: DataFrame | None = None,
) -> DataFrame:
    """Exact set-CONTAINMENT join: pairs with
    |A∩B| / min(|A|,|B|) >= threshold over n-char shingles.

    Asymmetric near-dup detection — a short document embedded in a long
    one scores ~1.0 here while its symmetric Jaccard (|A∩B|/|A∪B|) is
    diluted by the big union, so MinHash-LSH (tuned to Jaccard)
    structurally misses it.

    Algorithm: exact prefix-filter set-containment join (SSJoin/PPJoin
    family; Chaudhuri et al. 2006, Xiao et al. 2008) over a
    DICTIONARY-ENCODED shingle space:

    1. The corpus vocabulary is assigned dense int ids in ascending
       document-frequency order, so every document becomes a SORTED int
       array whose order IS the global rarity order — the per-document
       prefix is then a plain array slice (no per-doc window), and the
       verify intersections hash ints instead of 8-char strings
       (measured ~3x cheaper at 5M candidate pairs).
    2. Candidates: with O = ceil(t·min(|A|,|B|)), a qualifying pair
       must share an element inside the first z-O+1 elements of BOTH
       sorted arrays (the prefix-filter lemma).  Taking A as the
       smaller side (za <= zb enforced in the join — the other
       orientation is covered by the pair's reversal), A contributes
       its za-ceil(t·za)+1 rarest shingles and the inverted index is
       probed with the positional bound pb <= zb - ceil(t·za) + 1.
       Recall is provably 100%: the output equals the quadratic
       all-pairs result.
    3. Exact verification on the int arrays.

    The threshold is carried as an exact rational (num/den): the survive
    predicate is ``inter * den >= num * min_size`` (pure integers, no
    float boundary) and ceil(t·z) is ``(num·z + den - 1) DIV den`` —
    immune to IEEE ceil traps (e.g. float ceil(9/11 · 77) = 64; exact 63).

    Scale notes: the dictionary id assignment is a window over the
    VOCABULARY (distinct shingles — orders of magnitude smaller than
    the corpus; at extreme vocabulary sizes assign ids per df-band,
    the order only has to be SOME global total order for correctness —
    rarity order is a performance choice).  The encoded set frame is
    checkpointed once and feeds the prefix, the inverted index and both
    verify sides.  On corpora where documents genuinely share their
    rare shingles pairwise (small vocabulary, templated text) the
    candidate set degrades toward all-pairs — that is inherent to
    EXACT containment, not to this plan; the filters are then free and
    the verify stays the measured bottleneck.

    Output: (id_a, id_b, n_shared, containment) with id_a < id_b.
    """
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(f"threshold must be in (0, 1]: {num}/{den}")
    from pyspark.sql import Window

    # Spread the shingle build across cores (a small corpus arriving as
    # one parquet file is one input partition — see minhash_near_dup_pairs).
    par = df.sparkSession.sparkContext.defaultParallelism
    ex0 = shingle_sets(df.repartition(par), id_col, text_col, n=n).select(
        "id", F.explode("shingles").alias("g")
    )
    dfreq = ex0.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    vocab = (
        dfreq.withColumn(
            "gid", F.row_number().over(Window.orderBy(F.col("df").asc(), F.col("g")))
        )
        .select("g", "gid")
        .localCheckpoint(eager=True)
    )
    # (id, sorted-int-array, size) — rarity order == ascending id order.
    enc = (
        ex0.join(F.broadcast(vocab), "g")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("gid")).alias("s"))
        .withColumn("sz", F.size("s"))
        .localCheckpoint(eager=True)
    )
    prefix_len = F.expr(
        f"CAST(sz - (({num} * sz + {den} - 1) DIV {den}) + 1 AS INT)"
    )
    ceil_a = F.expr(f"CAST(({num} * za + {den} - 1) DIV {den} AS INT)")
    prefix = (
        enc.select(
            F.col("id").alias("a"),
            F.col("sz").alias("za"),
            F.explode(F.slice("s", F.lit(1), prefix_len)).alias("gid"),
        )
        .withColumn("oa", ceil_a)
    )
    index = enc.select(
        F.col("id").alias("b"),
        F.col("sz").alias("zb"),
        F.posexplode("s").alias("pb0", "gid"),
    )
    cand = (
        prefix.join(index, "gid")
        .where(
            (F.col("a") != F.col("b"))
            & (F.col("za") <= F.col("zb"))
            # positional prefix filter: pb (1-based) <= zb - ceil(t*za) + 1
            & (F.col("pb0") + F.col("oa") <= F.col("zb"))
        )
        .select(F.least("a", "b").alias("id_a"), F.greatest("a", "b").alias("id_b"))
        .distinct()
    )
    if restrict_ids is not None:
        # incremental refresh (VERDICT r5 #2): keep only candidates with
        # >= 1 endpoint in the delta — unchanged×unchanged pairs are
        # carried from the prior artifact by the caller.  The filter
        # sits BEFORE verification, which is the measured bottleneck
        # (~15 of the 19.5 s cold pass at sf0.1), so a 5% delta cuts
        # the verify work to the delta-touching slice.  The dictionary
        # and index still scan the full corpus: document frequencies
        # are corpus-global, and correctness of the prefix filter
        # needs the full index on the probe's other side anyway.
        rid = restrict_ids.select(
            F.col(restrict_ids.columns[0]).alias("id")
        ).localCheckpoint(eager=True)
        cand = (
            cand.join(rid, cand.id_a == rid.id, "left_semi")
            .union(cand.join(rid, cand.id_b == rid.id, "left_semi"))
            .distinct()
        )
    A = enc.select(
        F.col("id").alias("id_a"), F.col("s").alias("sa"), F.col("sz").alias("za")
    )
    B = enc.select(
        F.col("id").alias("id_b"), F.col("s").alias("sb"), F.col("sz").alias("zb")
    )
    return (
        cand.join(A, "id_a")
        .join(B, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn("mn", F.least("za", "zb"))
        .where(F.col("inter") * den >= F.col("mn") * num)
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("bigint").alias("n_shared"),
            F.round(F.col("inter") / F.col("mn"), 6).alias("containment"),
        )
    )


def containment_pairs_cached(
    df: DataFrame,
    source_path: str,
    id_col: str,
    text_col: str,
    threshold_num: int = 4,
    threshold_den: int = 5,
    n: int = 8,
    cache_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Persisted twin of ``containment_pairs`` — the verified containment
    pair set as a materialized artifact, the same fit-once-read-many
    discipline as ``minhash_near_dup_pairs_cached`` / ``pagerank_cached``:
    the containment join is a full corpus pass (shingle dictionary +
    inverted-index join + 5M-pair verification at sf0.1) and its result
    is a tiny pair table every downstream scrub consumer re-reads.

    Versioned family layout + incremental refresh (VERDICT r5 #2,
    same scheme as ``minhash_near_dup_pairs_cached``): each version
    persists the pairs AND a (id, fp) doc manifest.  On a version miss
    with a prior complete version, only pairs touching the
    (new ∪ changed) delta are recomputed (``restrict_ids`` pushes the
    delta filter under the verify step — the cold pass's measured
    bottleneck); unchanged×unchanged pairs carry over verbatim.
    Containment between two unchanged docs depends only on their own
    shingle sets — the corpus-global dictionary is a BLOCKING device,
    not part of the pair semantics — so carried pairs are exact.

    ``stats`` (optional) receives n_docs / n_delta / n_gone /
    n_carried / n_new for the incremental test.
    """
    from stock_ops_spark.operators import artifacts

    spark = df.sparkSession
    if cache_dir is None:
        cache_dir = artifacts.default_cache_dir()
    famraw = (
        f"v2|{os.path.abspath(source_path)}|{id_col}|{text_col}"
        f"|t={threshold_num}/{threshold_den}|n={n}"
    )
    fam = artifacts.cache_key(famraw)
    ver = artifacts.cache_key(artifacts.source_identity(source_path))
    suffixes = [".pairs.parquet", ".docs.parquet"]
    ppath = artifacts.versioned_path(cache_dir, "containment", fam, ver, suffixes[0])
    dpath = artifacts.versioned_path(cache_dir, "containment", fam, ver, suffixes[1])
    if os.path.isdir(ppath):
        return spark.read.parquet(ppath)
    os.makedirs(cache_dir, exist_ok=True)
    cur = df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp")
    )
    prior = artifacts.find_prior_version(
        cache_dir, "containment", fam, ver, suffixes
    )
    if prior is not None:
        old_pairs = spark.read.parquet(
            artifacts.versioned_path(cache_dir, "containment", fam, prior, suffixes[0])
        )
        old_docs = spark.read.parquet(
            artifacts.versioned_path(cache_dir, "containment", fam, prior, suffixes[1])
        )
        delta_ids = (
            cur.join(old_docs, ["id", "fp"], "left_anti")
            .select("id")
            .localCheckpoint(eager=True)
        )
        gone_ids = (
            old_docs.join(cur, ["id", "fp"], "left_anti")
            .select("id")
            .localCheckpoint(eager=True)
        )
        carried = old_pairs.join(
            gone_ids, old_pairs.id_a == gone_ids.id, "left_anti"
        )
        carried = carried.join(
            gone_ids, carried.id_b == gone_ids.id, "left_anti"
        )
        new_pairs = containment_pairs(
            df, id_col, text_col, threshold_num, threshold_den, n,
            restrict_ids=delta_ids,
        )
        pairs = carried.select(
            "id_a", "id_b", "n_shared", "containment"
        ).unionByName(new_pairs)
        if stats is not None:
            stats["n_docs"] = df.count()
            stats["n_delta"] = delta_ids.count()
            stats["n_gone"] = gone_ids.count()
            stats["n_carried"] = carried.count()
            stats["n_new"] = new_pairs.count()
    else:
        pairs = containment_pairs(
            df, id_col, text_col, threshold_num, threshold_den, n
        )
    artifacts.publish(cur, dpath)
    artifacts.publish(pairs, ppath)
    return spark.read.parquet(ppath)
