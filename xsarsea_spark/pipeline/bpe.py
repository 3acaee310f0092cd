"""Distributed BPE merge training: learn byte-pair-encoding-style
merges from a tokenized corpus — the tokenizer-training primitive of
an LLM data pipeline, run as k rounds of (distributed pair count ->
bounded top-1 -> per-row merge application).

Scale shape:

- **Pair counting** is one explode + hash aggregation per round —
  map-side combined, the exchange carries distinct pairs (vocab^2
  bounded), never positions.
- **The learned state is k (left, right) string pairs** — the
  bounded artifact (k-means-centroid precedent) collected one row per
  round; everything corpus-sized stays distributed.
- **Merge application is a zero-exchange per-row projection**:
  occurrence positions, greedy-leftmost selection and the rebuild are
  HOF expressions over the token array. Greedy-leftmost on runs
  ("a a a" with merge (a,a) keeps alternating occurrences) is the
  run-parity closed form — occurrence i is applied iff its offset
  from its consecutive-run start is even — so no sequential fold (and
  therefore no engine-specific fold-state) is needed.
- Each round ends in ``localCheckpoint``: the top-1 collect forces a
  job through the full lineage anyway, and without materialization
  round r+1 would recompute every earlier rebuild (and Catalyst's
  projection collapse would re-inline the rebuild expression once per
  ``element_at`` reference — the same blowup pca_power documents).

The DuckDB oracle replays every round in chained CTEs — including
recomputing each round's argmax pair in SQL, so the merge table is
value-exact cross-engine with no literals smuggled in.

Determinism: ties break on (count DESC, left ASC, right ASC); merged
tokens join with a single space, so multi-level merges stay readable
("key agg" + "row" -> "key agg row").

Parity: reference repo has no tokenizer pillar (engine-brief
extension); the algorithm is Sennrich et al. 2016 word-level BPE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xsarsea_spark.engine import materialize

__all__ = ["bpe_train", "bpe_encode", "bpe_bytelevel_encode",
           "bytelevel_pretokens", "apply_merge_expr",
           "GPT2_PRETOKEN_PAT", "bpe_save_merges", "bpe_load_merges",
           "bpe_apply", "bpe_apply_bytelevel", "bpe_bytelevel_train"]

# GPT-2-style pre-tokenization pattern (Radford et al. 2019), with one
# documented deviation: the original's `\s+(?!\S)` trailing-whitespace
# alternative uses a negative lookahead, which RE2 (DuckDB) does not
# support — so runs of 2+ spaces become ONE whitespace pre-token here
# instead of splitting the last space onto the following word. The
# pattern below is valid and IDENTICAL in Java regex (Spark), RE2
# (DuckDB) and the pure-Python scanner the parity test ships:
# contractions, optional-leading-space letter/number/other runs,
# whitespace runs. (\s differs across engines only on \x0B — excluded
# from the corpus and the adversarial tests.)
GPT2_PRETOKEN_PAT = (r"'s|'t|'re|'ve|'m|'ll|'d"
                     r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def apply_merge_expr(col: str, a: str, b: str) -> str:
    """Spark SQL expression: token array ``col`` with every
    greedy-leftmost (a, b) adjacency merged into one token.

    Let-bound via the singleton idiom (occ and kept positions are
    each computed once per row); all 1-based array ops, ANSI-safe
    (the size<2 guard keeps ``sequence`` ascending).
    """
    la, lb = _lit(a), _lit(b)
    occ = (f"CASE WHEN size({col}) < 2 THEN array() "
           f"ELSE filter(sequence(1, size({col}) - 1),"
           f" p -> element_at({col}, p) = {la}"
           f" AND element_at({col}, p + 1) = {lb}) END")
    # run-parity greedy: occurrence index i (1-based within occ) is
    # kept iff i minus its consecutive-run start index is even
    # The size-0 guard matters: sequence(1, 0) auto-steps DOWN and
    # feeds j = 0 into element_at (an ANSI error); IF (not OR) keeps
    # the j = 1 base case from touching index 0
    kept = ("CASE WHEN size(o) = 0 THEN array() ELSE"
            " transform(filter(sequence(1, size(o)), i ->"
            " ((i - array_max(filter(sequence(1, i), j -> IF(j = 1,"
            " true, element_at(o, j) - element_at(o, j - 1) > 1))))"
            " % 2) = 0), i -> element_at(o, i)) END")
    rebuild = (
        f"CASE WHEN size(o) = 0 THEN {col} ELSE"
        f" flatten(transform(sequence(1, size({col})), q ->"
        f" CASE WHEN array_contains(transform(kk, p -> p + 1), q)"
        f" THEN array()"
        f" WHEN array_contains(kk, q)"
        f" THEN array(element_at({col}, q) || ' '"
        f" || element_at({col}, q + 1))"
        f" ELSE array(element_at({col}, q)) END)) END")
    return (f"element_at(transform(array({occ}), o ->"
            f" element_at(transform(array({kept}), kk ->"
            f" {rebuild}), 1)), 1)")


def _bpe_rounds(docs: DataFrame, n_merges: int, text_col: str,
                id_col: str, apply_last: bool,
                sample_frac: float | None = None,
                ) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """Shared training loop: returns (final tokenized corpus, merge
    list). ``apply_last`` controls whether the last learned merge is
    also applied to the corpus (encode needs it; train's merge table
    does not, saving one checkpointed rebuild).

    ``sample_frac`` (default: exact, or ``spark.xsarsea.bpe.sampleFrac``
    if set) is the 100-TB knob: with ``0 < frac < 1``, pair counting
    after the FIRST round runs on a deterministic Bernoulli sample of
    the corpus — the shape production tokenizer trainers use, since
    top-pair ranks stabilize after the early rounds while each exact
    round still scans the full corpus. Round 1 always counts exactly
    (it fixes the highest-impact merge), merge APPLICATION always
    rewrites the full corpus (the encode output must be exact), and
    the default path stays exact for the DuckDB oracle.
    """
    if sample_frac is None:
        from xsarsea_spark.engine import get_conf
        sample_frac = float(get_conf(
            docs.sparkSession, "spark.xsarsea.bpe.sampleFrac", "1.0"))
    cur = (
        docs.filter(F.col(text_col).isNotNull())
        .selectExpr(id_col, f"split({text_col}, ' ') AS __t")
        .filter("size(__t) >= 1")
    )
    return _merge_rounds(cur, n_merges, [id_col], apply_last,
                         sample_frac)


def _merge_rounds(cur: DataFrame, n_merges: int, keys: list[str],
                  apply_last: bool, sample_frac: float,
                  ) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """The engine-agnostic merge loop: ``cur`` carries ``keys`` +
    ``__t`` (a token array per row; word-level rows are documents,
    byte-level rows are pre-tokens — merges never cross a row, which
    is exactly the no-merges-across-pre-token-boundaries rule)."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        src = cur
        if 0.0 < sample_frac < 1.0 and rank > 0:
            src = cur.sample(fraction=sample_frac, seed=rank)
        pairs = src.filter("size(__t) >= 2").select(F.explode(F.expr(
            "transform(sequence(1, size(__t) - 1), p ->"
            " named_struct('lhs', element_at(__t, p),"
            " 'rhs', element_at(__t, p + 1)))")).alias("__p"))
        top = (
            pairs.groupBy("__p.lhs", "__p.rhs")
            .agg(F.count(F.lit(1)).alias("__n"))
            .orderBy(F.desc("__n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["lhs"], top[0]["rhs"], top[0]["__n"]
        merges.append((rank, a, b, int(n)))
        if rank < n_merges - 1 or apply_last:
            cur = materialize(cur.select(
                *keys,
                F.expr(apply_merge_expr("__t", a, b)).alias("__t"),
            ))
    return cur, merges


def _merge_rounds_weighted(wf: DataFrame, n_merges: int,
                           apply_last: bool, sample_frac: float,
                           ) -> tuple[DataFrame,
                                      list[tuple[int, str, str, int]]]:
    """The merge loop over the DISTINCT-sequence frequency table
    ``wf`` = (__t0 the original symbol array, __t the evolving one,
    __f its corpus multiplicity) — the weighted form every
    production BPE trainer uses (Sennrich et al. 2016 train on a
    word-frequency dict, not the exploded corpus). Identical
    sequences contribute identical pair multisets, so SUM(__f) over
    the distinct table equals COUNT(*) over the exploded corpus
    EXACTLY — the learned merges (and every tie-break) are unchanged
    while each round's scan shrinks from corpus positions to
    vocabulary rows. With ``0 < sample_frac < 1`` the post-round-1
    counts sample DISTINCT sequences rather than corpus rows (the
    same approximation knob, a different sampling unit — the exact
    default path is what the oracle grades)."""
    merges: list[tuple[int, str, str, int]] = []
    cur = wf
    for rank in range(n_merges):
        src = cur
        if 0.0 < sample_frac < 1.0 and rank > 0:
            src = cur.sample(fraction=sample_frac, seed=rank)
        pairs = src.filter("size(__t) >= 2").select(
            "__f",
            F.explode(F.expr(
                "transform(sequence(1, size(__t) - 1), p ->"
                " named_struct('lhs', element_at(__t, p),"
                " 'rhs', element_at(__t, p + 1)))")).alias("__p"))
        top = (
            pairs.groupBy("__p.lhs", "__p.rhs")
            .agg(F.expr("CAST(SUM(__f) AS BIGINT)").alias("__n"))
            .orderBy(F.desc("__n"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["lhs"], top[0]["rhs"], top[0]["__n"]
        merges.append((rank, a, b, int(n)))
        if rank < n_merges - 1 or apply_last:
            cur = materialize(cur.select(
                "__t0", "__f",
                F.expr(apply_merge_expr("__t", a, b)).alias("__t"),
            ))
    return cur, merges


def bpe_train(docs: DataFrame, n_merges: int = 4,
              text_col: str = "text",
              id_col: str = "doc_id",
              sample_frac: float | None = None) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (merge_rank, lhs, rhs, pair_count). ``sample_frac`` < 1 counts
    pairs on a corpus sample after round 1 (see ``_bpe_rounds``)."""
    _, merges = _bpe_rounds(docs, n_merges, text_col, id_col,
                            apply_last=False, sample_frac=sample_frac)
    return docs.sparkSession.createDataFrame(
        merges,
        schema="merge_rank int, lhs string, rhs string,"
               " pair_count bigint")


def bpe_encode(docs: DataFrame, n_merges: int = 4,
               text_col: str = "text",
               id_col: str = "doc_id",
               sample_frac: float | None = None) -> DataFrame:
    """Train ``n_merges`` merges AND apply them all: per document the
    raw/encoded token counts, the compression ratio, and an md5
    digest of the encoded token stream (tokens joined on chr(31),
    which no corpus token contains, so the digest is injective over
    token boundaries — merged tokens themselves contain spaces).

    The encoded corpus IS the training loop's final state — each
    round's zero-exchange rebuild already materialized via
    ``localCheckpoint`` — so encode costs one extra rebuild beyond
    training, not a second pass over the merges.
    """
    cur, _ = _bpe_rounds(docs, n_merges, text_col, id_col,
                         apply_last=True, sample_frac=sample_frac)
    # raw count recovered from the encoded stream itself (a merged
    # token expands to its space-separated word count) — no join back
    # to the source, no second corpus scan
    return cur.select(
        id_col,
        F.expr("CAST(aggregate(__t, 0L,"
               " (a, x) -> a + size(split(x, ' '))) AS BIGINT)")
        .alias("n_tokens_raw"),
        F.expr("CAST(size(__t) AS BIGINT)").alias("n_tokens_encoded"),
        F.expr("md5(array_join(__t, char(31)))").alias("encoded_md5"),
    ).withColumn(
        "compression",
        F.expr("n_tokens_raw / CAST(n_tokens_encoded AS DOUBLE)"),
    ).select(id_col, "n_tokens_raw", "n_tokens_encoded",
             "compression", "encoded_md5")


def bpe_save_merges(merges: DataFrame, path: str) -> None:
    """Persist a trained merge table as the tokenizer artifact.

    The merge table is the ENTIRE learned state of the tokenizer
    (k-means-centroid precedent: bounded rows, corpus-independent),
    so one single-file parquet — written once, broadcast-read by
    every downstream encode job — is the production artifact shape
    (train once on a corpus sample, encode everywhere forever).

    ``repartition(1)``, not ``coalesce(1)``: on this Spark build a
    coalesced single-task write of a local-relation frame stalls ~6 s
    in scheduling while the tiny round-robin exchange costs <1 s —
    same one-file output either way (measured; see docs/PLANS.md).
    """
    merges.repartition(1).write.mode("overwrite").parquet(path)


def bpe_load_merges(spark, path: str) -> DataFrame:
    """Load a persisted merge table (see ``bpe_save_merges``)."""
    return spark.read.parquet(path)


def _collect_merges(merges: DataFrame) -> list[tuple[str, str]]:
    """Bounded collect of the rank-ordered (lhs, rhs) merge list —
    the artifact is k rows by construction, never corpus-sized."""
    rows = merges.select("merge_rank", "lhs", "rhs").collect()
    return [(r["lhs"], r["rhs"])
            for r in sorted(rows, key=lambda r: r["merge_rank"])]


def _greedy_merge_pass(toks: list[str], a: str, b: str) -> list[str]:
    """One greedy-leftmost merge pass — the sequential-scan twin of
    ``apply_merge_expr``'s run-parity closed form. A consumed pair
    advances the scan by 2, so within a run of equal tokens exactly
    the even-offset occurrences merge: identical output by
    construction, pinned bit-equal by tests/test_bpe_artifact.py.
    """
    out: list[str] = []
    i, n = 0, len(toks)
    while i < n:
        if i + 1 < n and toks[i] == a and toks[i + 1] == b:
            out.append(a + " " + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _apply_merges_kernel(merges: list[tuple[str, str]]):
    """mapInPandas kernel: apply the full rank-ordered merge list to
    every ``__t`` token array in ONE Arrow-batched pass — the encode
    fast path a persisted artifact buys. Training pays k jobs (each
    round's pair count needs the previous round's corpus); applying
    a known artifact pays zero extra jobs and zero exchanges: k
    in-memory passes per row, all other columns carried through.
    """

    def kernel(batches):
        for pdf in batches:
            if len(pdf):
                col = []
                for toks in pdf["__t"]:
                    toks = list(toks)
                    for a, b in merges:
                        toks = _greedy_merge_pass(toks, a, b)
                    col.append(toks)
                pdf = pdf.copy()
                pdf["__t"] = col
            yield pdf

    return kernel


def bpe_apply(docs: DataFrame, merges: DataFrame,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Encode the corpus with an already-trained (typically
    ``bpe_load_merges``-loaded) merge table — NO retraining, no pair
    counting, no per-round jobs: the merge list is collected (bounded
    artifact) and applied in one zero-exchange Arrow pass per row.
    Output schema and values are identical to ``bpe_encode`` run with
    the same merges (tests pin digest equality on the full corpus).
    """
    cur = (
        docs.filter(F.col(text_col).isNotNull())
        .selectExpr(id_col, f"split({text_col}, ' ') AS __t")
        .filter("size(__t) >= 1")
    )
    enc = cur.mapInPandas(_apply_merges_kernel(_collect_merges(merges)),
                          schema=cur.schema)
    return enc.select(
        id_col,
        F.expr("CAST(aggregate(__t, 0L,"
               " (a, x) -> a + size(split(x, ' '))) AS BIGINT)")
        .alias("n_tokens_raw"),
        F.expr("CAST(size(__t) AS BIGINT)").alias("n_tokens_encoded"),
        F.expr("md5(array_join(__t, char(31)))").alias("encoded_md5"),
    ).withColumn(
        "compression",
        F.expr("n_tokens_raw / CAST(n_tokens_encoded AS DOUBLE)"),
    ).select(id_col, "n_tokens_raw", "n_tokens_encoded",
             "compression", "encoded_md5")


def bpe_apply_bytelevel(docs: DataFrame, merges: DataFrame,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Byte-level twin of ``bpe_apply``: GPT-2-style pre-tokenization
    + byte-fallback symbols, then the persisted merge list applied to
    the DISTINCT pre-token table in one Arrow pass (merges are
    position-independent, so the per-occurrence result is a pure
    function of the pre-token string) and joined back onto the
    narrow occurrence frame. Same output schema and values as
    ``bpe_bytelevel_encode`` with the same merges — the Python
    boundary now carries vocabulary rows, not corpus rows.
    """
    pre = _bytelevel_pre(docs, text_col, id_col)
    vocab = (pre.select("__tok").distinct()
             .selectExpr("__tok", f"{_HEX_SYMBOLS_SQL} AS __t"))
    enc_vocab = vocab.mapInPandas(
        _apply_merges_kernel(_collect_merges(merges)),
        schema=vocab.schema)
    enc = pre.join(enc_vocab, on="__tok").select(
        id_col, "__pt", "__t")
    return (
        enc.groupBy(id_col)
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_pretokens"),
            F.expr("CAST(SUM(aggregate(__t, 0L, (a, x) ->"
                   " a + size(split(x, ' ')))) AS BIGINT)")
            .alias("n_bytes"),
            F.expr("CAST(SUM(size(__t)) AS BIGINT)")
            .alias("n_tokens_encoded"),
            F.expr("md5(array_join(transform(array_sort("
                   "collect_list(named_struct('pt', __pt, 's',"
                   " array_join(__t, char(31))))), e -> e.s),"
                   " char(30)))").alias("encoded_md5"),
        )
        .withColumn("compression",
                    F.expr("n_bytes / CAST(n_tokens_encoded"
                           " AS DOUBLE)"))
        .select(id_col, "n_pretokens", "n_bytes", "n_tokens_encoded",
                "compression", "encoded_md5")
    )


def bytelevel_pretokens(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """GPT-2-style byte-level pre-tokenization: one row per pre-token
    with its 1-based position and the byte-symbol array.

    Byte fallback: each pre-token becomes its UTF-8 bytes, one symbol
    per byte — so NO text is ever out-of-vocabulary, the property the
    GPT-2 byte-level design exists for. The symbol alphabet is the
    byte's two-char uppercase hex ("E2", "80", ...) rather than
    GPT-2's printable-unicode remap table: an equivalent injective
    byte naming that both engines derive with ``hex(encode(tok))``
    (bit-identical cross-engine), keeping the plumbing table-free.
    """
    return _bytelevel_pre(docs, text_col, id_col).selectExpr(
        id_col, "__pt", f"{_HEX_SYMBOLS_SQL} AS __t")


# the byte-symbol expansion of one pre-token string: its UTF-8 bytes
# as two-char uppercase hex symbols (injective byte naming — see
# bytelevel_pretokens). Applied to DISTINCT pre-tokens wherever
# possible: hex() over every corpus occurrence costs corpus-scale
# string work for a vocabulary-scale result.
_HEX_SYMBOLS_SQL = (
    "transform(sequence(1, length(hex(encode(__tok, 'UTF-8')))"
    " div 2), i -> substr(hex(encode(__tok, 'UTF-8')),"
    " 2 * i - 1, 2))")


def _bytelevel_pre(docs: DataFrame, text_col: str,
                   id_col: str) -> DataFrame:
    """(id, __pt, __tok): GPT-2 pre-tokenization WITHOUT the byte
    expansion — the narrow occurrence frame (position + raw pre-token
    string) every byte-level path shuffles; the hex symbol arrays are
    derived per DISTINCT pre-token (``_bytelevel_vocab``), not per
    occurrence."""
    pat = F.lit(GPT2_PRETOKEN_PAT)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(id_col,
                F.regexp_extract_all(F.col(text_col), pat, F.lit(0))
                .alias("__pts"))
        .select(id_col, F.posexplode("__pts").alias("__pt", "__tok"))
        # posexplode is 0-based; oracle lists are 1-based
        .selectExpr(id_col, "__pt + 1 AS __pt", "__tok")
    )


def _bytelevel_vocab(pre: DataFrame) -> DataFrame:
    """Distinct pre-token frequency table (__tok, __f, __t0): ONE
    map-side-combined count agg over the occurrence frame, then the
    byte-symbol expansion on the vocabulary rows only. __tok <-> __t0
    is a bijection (hex of the UTF-8 bytes is injective), so counts
    keyed by __tok equal counts keyed by the symbol array — the
    property that keeps merges/tie-breaks identical to grouping on
    the expanded arrays directly."""
    return (pre.groupBy("__tok")
            .agg(F.count(F.lit(1)).alias("__f"))
            .withColumn("__t0", F.expr(_HEX_SYMBOLS_SQL)))


def bpe_bytelevel_train(docs: DataFrame, n_merges: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        sample_frac: float | None = None) -> DataFrame:
    """Learn ``n_merges`` byte-level merges (GPT-2 pre-tokenization +
    byte-fallback symbols); returns the same (merge_rank, lhs, rhs,
    pair_count) artifact shape as ``bpe_train`` — persist it with
    ``bpe_save_merges`` and encode with ``bpe_apply_bytelevel``."""
    if sample_frac is None:
        from xsarsea_spark.engine import get_conf
        sample_frac = float(get_conf(
            docs.sparkSession, "spark.xsarsea.bpe.sampleFrac", "1.0"))
    pre = _bytelevel_pre(docs, text_col, id_col)
    # train on the distinct pre-token frequency table: counts (and
    # therefore merges and tie-breaks) are exactly the corpus counts
    # (__tok <-> __t0 bijection, see _bytelevel_vocab)
    wf = materialize(
        _bytelevel_vocab(pre)
        .select("__t0", "__f", F.col("__t0").alias("__t")))
    _, merges = _merge_rounds_weighted(
        wf, n_merges, apply_last=False, sample_frac=sample_frac)
    return docs.sparkSession.createDataFrame(
        merges,
        schema="merge_rank int, lhs string, rhs string,"
               " pair_count bigint")


def bpe_bytelevel_encode(docs: DataFrame, n_merges: int = 4,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         sample_frac: float | None = None) -> DataFrame:
    """GPT-2-style byte-level BPE: regex pre-tokenization (merges
    never cross pre-token boundaries), byte-fallback symbols, then
    the same distributed merge loop as word-level BPE — the tokenizer
    shape every production LLM data pipeline actually ships.

    Per document: pre-token count, UTF-8 byte count, encoded token
    count, compression, and an injective digest of the encoded stream
    (symbols joined by chr(31) within a pre-token, pre-tokens by
    chr(30) — neither occurs in hex-pair symbols or merge separators).

    Scale: pre-tokenization + byte mapping is a zero-exchange per-row
    projection; the explode to pre-token rows enforces the boundary
    rule with NO extra bookkeeping (a merge can only see one row).
    The corpus is then touched exactly TWICE: one map-side-combined
    frequency agg onto the DISTINCT pre-token table (identical
    pre-tokens collapse before the wire), and one final join of the
    corpus pre-tokens against the vocabulary-scale segmentation —
    every merge round runs on the distinct table (weighted counts
    are EXACTLY the corpus counts, so merges and tie-breaks are
    unchanged), instead of rescanning and rewriting the corpus per
    round. The final per-doc rollup is one hash agg. ``sample_frac``
    (or ``spark.xsarsea.bpe.sampleFrac``) samples the post-round-1
    counts over distinct pre-tokens (see _merge_rounds_weighted).
    """
    if sample_frac is None:
        from xsarsea_spark.engine import get_conf
        sample_frac = float(get_conf(
            docs.sparkSession, "spark.xsarsea.bpe.sampleFrac", "1.0"))
    pre = _bytelevel_pre(docs, text_col, id_col)
    vocab = materialize(_bytelevel_vocab(pre))
    wf = vocab.select("__t0", "__f", F.col("__t0").alias("__t"))
    seg, _ = _merge_rounds_weighted(
        wf, n_merges, apply_last=True, sample_frac=sample_frac)
    # segment each corpus pre-token by joining back on the RAW
    # pre-token string (mapped to its segmentation through the
    # __tok <-> __t0 bijection) — vocabulary-scale right side, so
    # the optimizer broadcasts it in practice; the corpus explode
    # now shuffles plain strings, never per-occurrence symbol
    # arrays, and the rounds never touch the corpus after the one
    # frequency agg
    tokseg = (vocab.select("__tok", "__t0")
              .join(seg.select("__t0", F.col("__t").alias("__tf")),
                    on="__t0")
              .select("__tok", "__tf"))
    cur = (pre.join(tokseg, on="__tok")
           .select(id_col, "__pt", F.col("__tf").alias("__t")))
    return (
        cur.groupBy(id_col)
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_pretokens"),
            F.expr("CAST(SUM(aggregate(__t, 0L, (a, x) ->"
                   " a + size(split(x, ' ')))) AS BIGINT)")
            .alias("n_bytes"),
            F.expr("CAST(SUM(size(__t)) AS BIGINT)")
            .alias("n_tokens_encoded"),
            F.expr("md5(array_join(transform(array_sort("
                   "collect_list(named_struct('pt', __pt, 's',"
                   " array_join(__t, char(31))))), e -> e.s),"
                   " char(30)))").alias("encoded_md5"),
        )
        .withColumn("compression",
                    F.expr("n_bytes / CAST(n_tokens_encoded"
                           " AS DOUBLE)"))
        .select(id_col, "n_pretokens", "n_bytes", "n_tokens_encoded",
                "compression", "encoded_md5")
    )
