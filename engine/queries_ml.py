"""Training-data-ops query catalog: dedup / similarity / text analysis /
multimodal plumbing (the large-scale curation operators beyond the SQL
algebra). SQL-checked where DuckDB can express the math in float64;
otherwise rows-only (pytest oracles in tests/test_neardup.py etc.).
"""

from __future__ import annotations

import numpy as np


def _read(sf_dir: str, name: str, columns=None):
    from engine.queries import _read as _r

    return _r(sf_dir, name, columns)


# Stateless text stages: every class stage runs via engine.ops.util.stage_task
# (instance cached per worker PROCESS, keyed by class+config) instead of a
# per-call actor pool — Ray task workers are long-lived across queries in a
# session, so the contract suite pays construction once, not per query, and
# the stage fuses with its parquet read (measured A/B in util.py docstring).
from engine.ops.util import stage_task as _stage


# ------------------------------------------------------------- text ops --

def q_token_counts(sf_dir):
    from engine.ops.textstats import TokenCounter

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_stage, fn_kwargs={"_stage_cls": TokenCounter}, batch_format="pyarrow")


def q_quality_components(sf_dir):
    from engine.ops.textstats import QualityScorer

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(_stage, fn_kwargs={"_stage_cls": QualityScorer}, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_chars", "n_nonspace", "n_digits", "n_punct"])


def q_quality_score(sf_dir):
    from engine.ops.textstats import QualityScorer

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(_stage, fn_kwargs={"_stage_cls": QualityScorer}, batch_format="pyarrow")
    return out.select_columns(["doc_id", "quality_score"])


def q_kmeans_assign(sf_dir):
    """Distributed Lloyd k-means over the embeddings table (k-means++
    init on a content-deterministic capped sample, 4 streaming partial-sum
    iterations) + one broadcast assignment pass. Iterative algorithm —
    no SQL twin; rows-only driver check, oracles in tests/test_kmeans.py
    (blob recovery, partition invariance, empty-cluster handling)."""
    from engine.ops.kmeans import kmeans_assign, kmeans_fit

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents = kmeans_fit(emb, k=8, iters=4)
    return kmeans_assign(emb, cents).select_columns(["vec_id", "cluster"])


def q_pca_embeddings(sf_dir):
    """Distributed one-pass PCA (block moment partials + driver eig) over
    the embeddings table, then a broadcast projection onto the top-4
    components. Eigendecomposition — no SQL twin; rows-only driver check,
    NumPy-parity + partition-invariance oracles in tests/test_pca.py."""
    from engine.ops.pca import pca_fit, pca_transform

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    comps, mean, _ = pca_fit(emb, k=4)
    return pca_transform(emb, comps, mean).select_columns(["vec_id", "pca"])


def q_gopher_quality_filter(sf_dir):
    """Gopher-rule quality gate (Rae et al. 2022 A1 subset): word-count,
    mean-word-length and stopword-ratio bounds; only survivors emitted.
    Value-exact vs DuckDB (shared [a-z]+ word semantics)."""
    from engine.ops.textstats import GopherFilter

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_stage, fn_kwargs={"_stage_cls": GopherFilter}, batch_format="pyarrow")


def q_lang_id(sf_dir):
    from engine.ops.textstats import LangId

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_stage, fn_kwargs={"_stage_cls": LangId}, batch_format="pyarrow")


def q_fingerprints(sf_dir):
    from engine.ops.textstats import Fingerprinter

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_stage, fn_kwargs={"_stage_cls": Fingerprinter}, batch_format="pyarrow")


def q_pii_scrub(sf_dir):
    from engine.ops.scrub import pii_scrub

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pii_scrub(docs)


def q_normalize_text(sf_dir):
    from engine.ops.scrub import normalize_text

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return normalize_text(docs)


def q_chunk_documents(sf_dir):
    from engine.ops.scrub import chunk_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(docs, size=512, overlap=64)


def q_line_dedup(sf_dir):
    """C4-style corpus-level line dedup (Raffel et al. 2020 §2.2: keep
    one occurrence of any line repeated across the corpus). The synthetic
    texts carry no newlines, so "lines" here are the deterministic
    64-char chunk grid (same substr arithmetic as the chunk_documents
    oracle); docs are rebuilt from their surviving lines joined by \\n.
    Value-exact vs DuckDB (row_number-over-line + string_agg)."""
    from engine.ops.dedup import exact_dedup, reassemble_lines
    from engine.ops.scrub import chunk_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lines = chunk_documents(docs, size=64, overlap=0).select_columns(
        ["doc_id", "chunk_idx", "chunk_text"])
    kept = exact_dedup(lines, keys=["chunk_text"], order_by=["doc_id", "chunk_idx"])
    return reassemble_lines(kept, id_col="doc_id", pos_col="chunk_idx",
                            line_col="chunk_text", sep="\n")


def q_top_bigrams(sf_dir):
    from engine.ops.textstats import top_bigrams

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return top_bigrams(docs, k=50)


def q_repetition_stats(sf_dir):
    """Gopher-style repetition signals (dup-line mass, top-2-gram mass)
    as exact integers — value-exact vs the DuckDB oracle."""
    from engine.ops.textstats import RepetitionStats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_stage, fn_kwargs={"_stage_cls": RepetitionStats}, batch_format="pyarrow")


def q_decontaminate(sf_dir):
    """GPT-3-style eval decontamination: docs with doc_id % 97 == 0 play
    the benchmark set; every other doc is scored for distinct shared
    word-3-grams against the broadcast benchmark gram set.  Gram
    STRINGS are compared (hashes only for per-doc dedup), so the DuckDB
    oracle matches value-exactly."""
    import pyarrow as pa

    from engine.ops.decontam import benchmark_gram_set, ngram_contamination

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 97) == 0
            return t.filter(pa.array(m if bench else ~m))
        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    grams = benchmark_gram_set(bench)
    return ngram_contamination(train, grams)


def q_pack_sequences(sf_dir):
    """Token-budget sequence packing (partition-local greedy): docs ->
    whitespace token counts -> packed assignment.  Greedy recursion
    isn't SQL-expressible, so this is rows-only; the packing invariants
    (every doc exactly once, no sequence over budget, determinism) are
    pytest-oracled in tests/test_pack.py."""
    from engine.ops.pack import pack_sequences
    from engine.ops.textstats import TokenCounter

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    toks = docs.map_batches(_stage, fn_kwargs={"_stage_cls": TokenCounter}, batch_format="pyarrow")
    toks = toks.select_columns(["doc_id", "n_tokens_ws"])
    return pack_sequences(toks, max_tokens=256, tok_col="n_tokens_ws",
                          num_partitions=16)


def q_split_assign(sf_dir):
    """Deterministic hash train/val/test split: splitmix64(doc_id)
    against cumulative fraction thresholds — content-addressed, so the
    assignment is identical across runs, partitionings and cluster
    sizes (the anti-leakage property a training corpus needs).
    Value-exact vs the DuckDB CASE twin (split_assign_sql)."""
    from engine.ops.agg import split_assign

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    return split_assign(docs, "doc_id",
                        {"train": 0.8, "val": 0.1, "test": 0.1})


def q_weighted_sample(sf_dir):
    """Efraimidis–Spirakis deterministic weighted sample (25 docs,
    weight = n_chars): content-addressed rank keys, streaming local
    top-k, value-exact vs the DuckDB ORDER BY ln(u)/w twin."""
    from engine.ops.agg import weighted_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return weighted_sample(docs, k=25, key="doc_id", weight_col="n_chars")


def q_tfidf_top_terms(sf_dir):
    """Per-document top-5 TF-IDF terms: two passes over the corpus (one
    for document frequencies -> ONE vocab-sized groupby-sum, one for
    scoring with the df map broadcast via ray.put) — no doc×term
    shuffle.  The score is quantized to an int64 (floor(score·1e6)) on
    both sides because numpy log and DuckDB ln differ in the last ulp."""
    from engine.ops.textstats import tfidf_top_terms

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_top_terms(docs, k=5)


# ---------------------------------------------------------------- dedup --

_MINHASH_PAIRS_CACHE: dict = {}


def _minhash_pairs(sf_dir):
    """Verified minhash pair list for sf_dir, MATERIALIZED and cached per
    process: q_minhash_near_dup and q_dup_groups share the identical
    upstream pipeline (pairs -> components), and the driver contract runs
    both — one execution instead of two. The pair list is tiny (verified
    near-dups) so holding it is free."""
    ds = _MINHASH_PAIRS_CACHE.get(sf_dir)
    if ds is None:
        from engine.ops.neardup import minhash_near_dup

        docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
        ds = minhash_near_dup(docs, threshold=0.5).materialize()
        _MINHASH_PAIRS_CACHE[sf_dir] = ds
    return ds


def q_minhash_near_dup(sf_dir):
    return _minhash_pairs(sf_dir)


def q_simhash_near_dup(sf_dir):
    from engine.ops.neardup import simhash_near_dup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = simhash_near_dup(docs, max_hamming=3).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_ngram_jaccard_near_dup(sf_dir):
    """Exact word-3-gram Jaccard dedup via inverted shingle index with a
    df cap — the no-sketch member of the dedup family, value-exact
    against the DuckDB oracle (same gram definition, same df rule, same
    rounding)."""
    from engine.ops.neardup import ngram_jaccard_near_dup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ngram_jaccard_near_dup(docs, threshold=0.5, df_cap=256).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_embedding_near_dup(sf_dir):
    """Size-switched route: exact O(n·N) brute below the switch (keeps the
    SQL-exact oracle at sf0.01), sign-LSH above it (the scale path — the
    rows-only q_embedding_near_dup_lsh entry keeps its own oracle)."""
    from engine.ops.neardup import embedding_near_dup_brute, embedding_near_dup_lsh

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = emb.count()  # metadata-only on a fresh parquet read
    if n > 50_000:
        return embedding_near_dup_lsh(emb, threshold=0.4)
    out = embedding_near_dup_brute(emb, threshold=0.4).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_embedding_near_dup_lsh(sf_dir):
    from engine.ops.neardup import embedding_near_dup_lsh

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dup_lsh(emb, threshold=0.4)


def q_semdedup(sf_dir):
    """SemDeDup (Abbas et al. 2023): deterministic k-means clustering of
    normalized embeddings, then greedy within-cluster cosine pruning in
    vec_id order.  Greedy order-dependence isn't SQL-expressible, so
    this is rows-only; the exact semantics are pytest-oracled against a
    sequential NumPy implementation in tests/test_semdedup.py."""
    from engine.ops.neardup import semdedup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = semdedup(emb, threshold=0.7, n_clusters=8).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q_exact_substring_dup(sf_dir):
    """ExactSubstr-family dedup (Lee et al. 2021): maximal cross-document
    byte-exact duplicate extents >= 32 bytes via winnowing anchors +
    diagonal extension. Maximal-extension is not SQL-expressible, so
    rows-only; the exact semantics are pytest-oracled against a
    brute-force all-pairs all-diagonals reference
    (tests/test_exactsubstr.py)."""
    from engine.ops.exactsubstr import exact_substring_dup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_substring_dup(docs, k=16, w=17, min_len=32).to_pandas()
    return out.sort_values(["a", "b", "pos_a"]).reset_index(drop=True)


def q_dup_groups(sf_dir):
    """MinHash pairs -> connected components via the size-dispatched
    ``dup_groups`` (driver union-find below 200k pairs, distributed
    min-label propagation above — see engine/ops/neardup.py for the
    measured crossover; the two paths are property-tested identical)."""
    from engine.ops.neardup import dup_groups

    out = dup_groups(_minhash_pairs(sf_dir)).to_pandas()
    return out.sort_values("id").reset_index(drop=True)


def q_dedup_keep_best(sf_dir):
    """End-to-end curation composite: minhash near-dup pairs ->
    connected components -> keep ONE canonical doc per dup group (max
    n_chars, tie-break min doc_id) plus every unpaired doc. The group
    map covers only PAIRED docs (bounded by the near-dup rate, not the
    corpus), so it broadcasts; survivors are picked by the two-level
    grouped top-k. Rows-only (components aren't SQL-expressible);
    invariants pytest in tests/test_neardup.py."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from engine.ops.agg import grouped_topk
    from engine.ops.join import broadcast_lookup
    from engine.ops.neardup import dup_groups

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    groups = dup_groups(_minhash_pairs(sf_dir))  # (id, group) for paired docs only
    tagged = broadcast_lookup(docs, groups, on="doc_id", right_on="id", how="left")

    def keep_ungrouped(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["group_id"])).drop_columns(["group_id"])

    def keep_grouped(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["group_id"]))

    solo = tagged.map_batches(keep_ungrouped, batch_format="pyarrow", zero_copy_batch=True)
    best = grouped_topk(tagged.map_batches(keep_grouped, batch_format="pyarrow",
                                           zero_copy_batch=True),
                        "group_id", "n_chars", k=1, descending=True, tie_break="doc_id")

    def strip_group(t: pa.Table) -> pa.Table:
        return t.drop_columns(["group_id"])

    kept = solo.union(best.map_batches(strip_group, batch_format="pyarrow",
                                       zero_copy_batch=True))
    return kept.to_pandas().sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------------------------------ ann --

def _query_vectors(sf_dir, n=5):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas().sort_values("vec_id").head(n)
    return np.stack(df["embedding"].to_numpy()).astype(np.float64), df["vec_id"].to_numpy()


def q_ann_topk(sf_dir):
    from engine.ops.ann import topk_cosine

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir, 5)
    out = topk_cosine(emb, q, k=5, query_ids=qids).to_pandas()
    return out.sort_values(["query_id", "score"], ascending=[True, False]).reset_index(drop=True)


def q_ann_topk_ivf(sf_dir):
    from engine.ops.ann import build_ivf, topk_cosine_ivf

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir, 5)
    indexed, cents = build_ivf(emb, n_centroids=8)
    return topk_cosine_ivf(indexed, cents, q, k=5, nprobe=4, query_ids=qids)


def q_ann_join(sf_dir):
    """Distributed similarity self-join: each embedding's nearest OTHER
    embedding, both sides co-partitioned by coarse centroid cells (no
    broadcast of either side — the cross-corpus-scale shape). Rows-only
    driver check; recall/exactness oracles in tests/test_ann_join.py."""
    from engine.ops.ann import ann_join

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann_join(emb, emb, k=1, nprobe=4, n_centroids=8, exclude_self=True)


def q_ann_topk_pq(sf_dir):
    """Product-quantization ANN (engine/ops/pq.py): 8-byte codes scanned
    via ADC lookup tables + exact re-rank of the top candidates. The
    32x-smaller scan payload is the 10^12-vector memory path. Rows-only
    driver check; recall + exactness oracles in tests/test_pq.py."""
    from engine.ops.pq import pq_encode, pq_topk, pq_train

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir, 5)
    books = pq_train(emb, m=8, n_codes=32)
    enc = pq_encode(emb, books)
    return pq_topk(enc, books, q, k=5, rerank=64, query_ids=qids)


# ------------------------------------------- image flagship (synthetic) --

def q_images_transform(sf_dir):
    """Thumbnail/augment stage: decode -> 32x32 box-mean resize ->
    hflip -> ppm re-encode in one per-worker-cached batch stage.
    Rows-only driver check; exact NumPy round-trip oracles in
    tests/test_transform.py."""
    from engine.fixtures.gen import images_dataset
    from engine.ops.transform import transform_images

    out = transform_images(images_dataset(300, parallelism=4),
                           resize=(32, 32), flip=True, out_fmt="ppm")
    return out.select_columns(["image_id", "w", "h", "fmt"])


def q_image_near_dup(sf_dir):
    """Perceptual near-dup image pairs: banded phash (4 x 16-bit,
    pigeonhole-complete for Hamming <= 3) + exact popcount verify.
    50 planted copies (re-generated images under new ids) must pair
    with their originals at Hamming 0. Rows-only driver check; planted
    band-semantics oracle in tests/test_transform.py."""
    import pyarrow.compute as pc_

    from engine.fixtures.gen import images_dataset
    from engine.ops.decode import featurize
    from engine.ops.transform import image_near_dup

    base = featurize(images_dataset(300, parallelism=4))

    def rename(t):
        import pyarrow as pa_

        ids = pc_.binary_join_element_wise(t["image_id"], pa_.scalar("copy"), "_")
        return t.set_column(t.schema.get_field_index("image_id"), "image_id", ids)

    copies = featurize(images_dataset(50, parallelism=2)).map_batches(
        rename, batch_format="pyarrow")
    both = base.union(copies).select_columns(["image_id", "phash"])
    return image_near_dup(both, max_hamming=3)


def q_images_featurize(sf_dir):
    from engine.fixtures.gen import images_dataset
    from engine.ops.decode import featurize

    return featurize(images_dataset(400, parallelism=4))


def q_images_fv_normalized(sf_dir):
    from engine.pipelines.flagship import image_flagship

    return image_flagship(400, parallelism=4)


def q_images_clusters(sf_dir):
    from engine.fixtures.gen import images_dataset
    from engine.ops.cluster import refine_clusters
    from engine.ops.decode import featurize

    return refine_clusters(featurize(images_dataset(400, parallelism=4)), radius=6)


def q_multimodal_fake_audio(sf_dir):
    """Plumbing check for the stubbed audio decode path (deterministic fake)."""
    import ray.data as rd

    from engine.ops.multimodal import AudioFeatureStage, decode_stage

    rows = [{"id": f"a{i:04d}", "bytes": bytes([i % 251] * (100 + i % 40))} for i in range(200)]
    ds = rd.from_items(rows)
    return decode_stage(ds, AudioFeatureStage, id_col="id", fake=True)


def q_multimodal_audio(sf_dir):
    """REAL WAV/PCM decode path: deterministic synthesized clips -> stdlib
    wave decode -> RMS + spectral centroid (pytest oracle recomputes both
    from the raw samples in tests/test_multimodal_audio.py)."""
    from engine.fixtures.gen import audio_dataset
    from engine.ops.multimodal import AudioFeatureStage, decode_stage

    ds = audio_dataset(200, parallelism=4)
    return decode_stage(ds, AudioFeatureStage, id_col="audio_id")


# ------------------------------------------------------------- catalogs --

_COS_DOT = (
    "list_sum(list_transform(list_zip(a.embedding, b.embedding), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"
_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

def _split_assign_oracle() -> str:
    from engine.ops.agg import split_assign_sql

    case = split_assign_sql("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return f"SELECT doc_id, {case} AS split FROM documents"


_TFIDF_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> length(x) > 0) AS w
      FROM documents),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(w) AS term FROM toks)
      GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, term, tf, df,
             CAST(floor(tf * ln((n + 1.0) / (df + 1.0)) * 1000000) AS BIGINT)
               AS score_q
      FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_q DESC, term) AS rk
      FROM scored)
    SELECT doc_id, term, tf, df, score_q FROM ranked WHERE rk <= 5
"""

def _weighted_sample_oracle() -> str:
    from engine.ops.agg import weighted_sample_sql

    return weighted_sample_sql("documents", 25, "doc_id", "n_chars",
                               cols="doc_id, n_chars")


def _lang_id_oracle() -> str:
    """DuckDB twin of engine/ops/textstats.py LangId, generated from the
    SAME _PROFILES constant. Per-gram non-overlapping substring counts
    via the replace trick ((len - len(replace))/3 — identical semantics
    to pc.count_substring / str.count); weights written as Python float
    repr so both sides multiply the same doubles in the same rank order
    (left-associative + chain == numpy's sequential +=); first-wins
    argmax via the ordered CASE; half-away ROUND both sides."""
    from engine.ops.textstats import _PROFILES

    langs = list(_PROFILES)
    score_exprs = []
    for lang in langs:
        terms = []
        for r, g in enumerate(_PROFILES[lang]):
            w = 1.0 / (r + 1)
            terms.append(
                f"{w!r} * CAST((length(tl) - length(replace(tl, '{g}', ''))) // 3"
                f" AS DOUBLE)")
        score_exprs.append(f"({' + '.join(terms)}) AS s_{lang}")
    # first maximum in _PROFILES order, mirroring np.argmax
    case_branches = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        case_branches.append(
            f"WHEN {' AND '.join(conds)} THEN '{lang}'" if conds
            else f"ELSE '{lang}'")
    best = f"greatest({', '.join('s_' + la for la in langs)})"
    return f"""
        WITH t AS (SELECT doc_id, lower(text) AS tl FROM documents),
        s AS (SELECT doc_id, tl, {', '.join(score_exprs)} FROM t),
        b AS (SELECT doc_id, tl, {best} AS best,
                     CASE {' '.join(case_branches)} END AS arg
              FROM s)
        SELECT doc_id,
               CASE WHEN best > 0 THEN arg ELSE 'und' END AS pred_lang,
               ROUND(least(best / greatest(1.0, length(tl) / 10.0), 1.0), 6)
                 AS lang_score
        FROM b"""


ORACLE_SQL_ML = {
    "split_assign": _split_assign_oracle(),
    "tfidf_top_terms": _TFIDF_ORACLE,
    "weighted_sample": _weighted_sample_oracle(),
    "lang_id": _lang_id_oracle(),
    # Both token counts are RE2 kernels in the engine
    # (engine/ops/textstats.py TokenCounter); DuckDB regexp_* is the
    # same RE2, so counts are value-exact. n_tokens_ws mirrors
    # utf8_trim_whitespace + split(\s+): trim via regexp_replace (SQL
    # trim() only strips spaces), split of '' yields [''] on both sides.
    "token_counts": r"""
        SELECT doc_id,
          CAST(len(regexp_split_to_array(
                 regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT)
            AS n_tokens_ws,
          CAST(len(regexp_extract_all(text,
                 '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'))
             + len(regexp_extract_all(text, '\s[\t\n\r\f]\S')) AS BIGINT)
            AS n_tokens_bpe
        FROM documents""",
    # Same double arithmetic, op order and operand types as
    # QualityScorer (engine/ops/textstats.py:114): each term is an
    # int->double division, + is left-associative both sides, and exact
    # 1e-6 rounding ties are impossible for binary doubles (a dyadic
    # rational can't equal (2m+1)/2e6), so np.round's half-even vs SQL
    # ROUND's half-away never diverges. n_stop/greatest(n_words,1)
    # covers the zero-word case (n_stop is 0 then), matching np.where.
    "quality_score": r"""
        WITH w AS (
          SELECT doc_id, length(text) AS n_chars,
                 length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
                 length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
                 length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
                 list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             x -> length(x) > 0) AS ws
          FROM documents),
        c AS (
          SELECT doc_id, n_chars, n_digits, n_punct,
                 CAST(greatest(n_nonspace, 1) AS DOUBLE) AS nz,
                 len(ws) AS n_words,
                 len(list_filter(ws, x -> list_contains(
                     ['the','a','an','and','or','of','to','in','is','are','was',
                      'were','be','been','it','this','that','for','on','with',
                      'as','at','by','from'], x))) AS n_stop
          FROM w)
        SELECT doc_id,
               ROUND(0.25 * least(n_chars / 500.0, 1.0)
                   + 0.25 * (1.0 - n_digits / nz)
                   + 0.25 * (1.0 - n_punct / nz)
                   + 0.25 * least((n_stop / CAST(greatest(n_words, 1) AS DOUBLE))
                                  * 2.0, 1.0), 6) AS quality_score
        FROM c""",
    # DuckDB regexp_* is RE2, the same engine behind Arrow's
    # count_substring_regex / replace_substring_regex — identical match
    # and GlobalReplace semantics, so this is value-exact. Counts are
    # taken on the text AS IT STANDS when each pattern runs (emails
    # redacted before phones), mirroring engine/ops/scrub.py SCRUB_STEPS.
    "pii_scrub": f"""
        WITH s1 AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '{_EMAIL}')) AS n_email,
                 regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g') AS text
          FROM documents),
        s2 AS (
          SELECT doc_id, n_email,
                 len(regexp_extract_all(text, '{_IPV4}')) AS n_ip,
                 regexp_replace(text, '{_IPV4}', '<IP>', 'g') AS text
          FROM s1)
        SELECT doc_id,
               regexp_replace(text, '{_PHONE}', '<PHONE>', 'g') AS text,
               n_email, n_ip,
               len(regexp_extract_all(text, '{_PHONE}')) AS n_phone
        FROM s2""",
    # same RE2-shared chain as pii_scrub: control chars out, \s runs to
    # one space, edge spaces off, lower. \x escapes are RE2 syntax inside
    # the SQL string literal, not SQL escapes.
    "normalize_text": r"""
        SELECT doc_id,
               lower(regexp_replace(regexp_replace(regexp_replace(text,
                   '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                   '\s+', ' ', 'g'),
                   '^ | $', '', 'g')) AS text,
               length(lower(regexp_replace(regexp_replace(regexp_replace(text,
                   '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                   '\s+', ' ', 'g'),
                   '^ | $', '', 'g'))) AS n_chars
        FROM documents""",
    "chunk_documents": """
        SELECT doc_id,
               i AS chunk_idx,
               substr(text, 1 + i * 448, 512) AS chunk_text,
               length(substr(text, 1 + i * 448, 512)) AS n_chunk_chars
        FROM (SELECT doc_id, text,
                     unnest(range(0, 1 + CAST(ceil(greatest(length(text) - 512, 0) / 448.0) AS BIGINT))) AS i
              FROM documents)""",
    "line_dedup": """
        WITH lines AS (
          SELECT doc_id, i AS chunk_idx, substr(text, 1 + i * 64, 64) AS chunk_text
          FROM (SELECT doc_id, text,
                       unnest(range(0, 1 + CAST(ceil(greatest(length(text) - 64, 0) / 64.0) AS BIGINT))) AS i
                FROM documents)),
        kept AS (
          SELECT *, row_number() OVER (PARTITION BY chunk_text
                                       ORDER BY doc_id, chunk_idx) AS rn
          FROM lines)
        SELECT doc_id,
               string_agg(chunk_text, chr(10) ORDER BY chunk_idx) AS text,
               count(*) AS n_lines
        FROM kept WHERE rn = 1
        GROUP BY doc_id""",
    "top_bigrams": r"""
        WITH toks AS (
          SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             x -> length(x) > 0) AS w
          FROM documents),
        pairs AS (
          SELECT w[i] || ' ' || w[i+1] AS bigram
          FROM (SELECT w, unnest(range(1, len(w))) AS i
                FROM toks WHERE len(w) >= 2))
        SELECT bigram, count(*) AS cnt
        FROM pairs GROUP BY bigram
        ORDER BY cnt DESC, bigram LIMIT 50""",
    "ngram_jaccard_near_dup": r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> length(x) > 0) AS w
          FROM documents),
        idx AS (
          SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
          FROM toks WHERE len(w) >= 3),
        grams AS (
          SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
            FROM idx
            UNION ALL
            SELECT doc_id, array_to_string(w, ' ') AS g
            FROM toks WHERE len(w) < 3)),
        df AS (SELECT g, count(*) AS df FROM grams GROUP BY g),
        kept AS (
          SELECT gr.doc_id, gr.g FROM grams gr JOIN df USING (g)
          WHERE df.df <= 256),
        sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS cnt
          FROM kept a
          JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT c.a, c.b,
               ROUND(CAST(c.cnt AS DOUBLE) / (na.n + nb.n - c.cnt), 6) AS jaccard
        FROM common c
        JOIN sizes na ON na.doc_id = c.a
        JOIN sizes nb ON nb.doc_id = c.b
        WHERE ROUND(CAST(c.cnt AS DOUBLE) / (na.n + nb.n - c.cnt), 6) >= 0.5""",
    "repetition_stats": r"""
        WITH lines AS (
          SELECT doc_id, l FROM (
            SELECT doc_id, unnest(string_split(text, chr(10))) AS l
            FROM documents)
          WHERE length(l) > 0),
        lc AS (
          SELECT doc_id, l, count(*) AS c, length(l) AS len
          FROM lines GROUP BY doc_id, l),
        lagg AS (
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_lines,
                 CAST(SUM(c * len) AS BIGINT) AS n_line_chars,
                 CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_lines,
                 CAST(SUM(CASE WHEN c >= 2 THEN c * len ELSE 0 END) AS BIGINT) AS dup_line_chars
          FROM lc GROUP BY doc_id),
        toks AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                     x -> length(x) > 0) AS w
          FROM documents),
        g2 AS (
          SELECT doc_id, w[i] || ' ' || w[i+1] AS g
          FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                FROM toks WHERE len(w) >= 2)),
        gc AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
        gtop AS (
          SELECT doc_id, CAST(MAX(c * length(g)) AS BIGINT) AS top2gram_chars
          FROM gc GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(la.n_lines, 0) AS n_lines,
               COALESCE(la.n_line_chars, 0) AS n_line_chars,
               COALESCE(la.n_dup_lines, 0) AS n_dup_lines,
               COALESCE(la.dup_line_chars, 0) AS dup_line_chars,
               COALESCE(gt.top2gram_chars, 0) AS top2gram_chars
        FROM documents d
        LEFT JOIN lagg la USING (doc_id)
        LEFT JOIN gtop gt USING (doc_id)""",
    "decontaminate": r"""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                     x -> length(x) > 0) AS w
          FROM documents),
        idx AS (
          SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
          FROM toks WHERE len(w) >= 3),
        grams AS (
          SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
            FROM idx
            UNION ALL
            SELECT doc_id, array_to_string(w, ' ') AS g
            FROM toks WHERE len(w) < 3)),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
        hits AS (
          SELECT gr.doc_id, count(*) AS n_hits
          FROM grams gr JOIN bench USING (g)
          WHERE gr.doc_id % 97 <> 0
          GROUP BY gr.doc_id)
        SELECT d.doc_id,
               COALESCE(h.n_hits, 0) AS n_hits,
               COALESCE(h.n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 97 <> 0""",
    "gopher_quality_filter": r"""
        WITH w AS (
          SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                     x -> length(x) > 0) AS ws
          FROM documents),
        c AS (
          SELECT doc_id,
                 len(ws) AS n_words,
                 COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS wchars,
                 len(list_filter(ws, x -> list_contains(
                     ['the','a','an','and','or','of','to','in','is','are','was',
                      'were','be','been','it','this','that','for','on','with',
                      'as','at','by','from'], x))) AS n_stop
          FROM w)
        SELECT doc_id, n_words,
               ROUND(wchars::DOUBLE / greatest(n_words, 1), 6) AS mean_word_len,
               ROUND(n_stop::DOUBLE / greatest(n_words, 1), 6) AS stop_ratio
        FROM c
        WHERE n_words BETWEEN 40 AND 100000
          AND wchars::DOUBLE / greatest(n_words, 1) BETWEEN 3.0 AND 10.0
          AND n_stop::DOUBLE / greatest(n_words, 1) >= 0.01""",
    "quality_components": r"""
        SELECT doc_id,
               length(text) AS n_chars,
               length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
               length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS n_punct
        FROM documents""",
    "embedding_near_dup": f"""
        WITH n AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
          FROM embeddings),
        p AS (
          SELECT a.vec_id AS a, b.vec_id AS b,
                 {_COS_DOT} / (a.nrm * b.nrm) AS c
          FROM n a JOIN n b ON a.vec_id < b.vec_id)
        SELECT a, b, ROUND(c, 5) AS cosine FROM p WHERE c >= 0.4""",
    "ann_topk": f"""
        WITH n AS (
          SELECT vec_id, embedding,
                 sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
          FROM embeddings),
        q AS (SELECT * FROM n ORDER BY vec_id LIMIT 5),
        p AS (
          SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
                 list_sum(list_transform(list_zip(q.embedding, b.embedding),
                         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (q.nrm * b.nrm) AS c
          FROM q, n b),
        r AS (
          SELECT query_id, vec_id, c,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rn
          FROM p)
        SELECT query_id, vec_id, ROUND(c, 5) AS score FROM r WHERE rn <= 5""",
}

QUERIES_ML = {
    "token_counts": q_token_counts,
    "quality_components": q_quality_components,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "fingerprints": q_fingerprints,
    "repetition_stats": q_repetition_stats,
    "pii_scrub": q_pii_scrub,
    "normalize_text": q_normalize_text,
    "dedup_keep_best": q_dedup_keep_best,
    "chunk_documents": q_chunk_documents,
    "line_dedup": q_line_dedup,
    "gopher_quality_filter": q_gopher_quality_filter,
    "kmeans_assign": q_kmeans_assign,
    "pca_embeddings": q_pca_embeddings,
    "top_bigrams": q_top_bigrams,
    "decontaminate": q_decontaminate,
    "pack_sequences": q_pack_sequences,
    "split_assign": q_split_assign,
    "tfidf_top_terms": q_tfidf_top_terms,
    "semdedup": q_semdedup,
    "weighted_sample": q_weighted_sample,
    "minhash_near_dup": q_minhash_near_dup,
    "simhash_near_dup": q_simhash_near_dup,
    "ngram_jaccard_near_dup": q_ngram_jaccard_near_dup,
    "exact_substring_dup": q_exact_substring_dup,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
    "dup_groups": q_dup_groups,
    "ann_topk": q_ann_topk,
    "ann_topk_ivf": q_ann_topk_ivf,
    "ann_topk_pq": q_ann_topk_pq,
    "ann_join": q_ann_join,
    "images_transform": q_images_transform,
    "image_near_dup": q_image_near_dup,
    "images_featurize": q_images_featurize,
    "images_fv_normalized": q_images_fv_normalized,
    "images_clusters": q_images_clusters,
    "multimodal_fake_audio": q_multimodal_fake_audio,
    "multimodal_audio": q_multimodal_audio,
}
