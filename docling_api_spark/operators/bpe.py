"""Distributed BPE tokenizer induction: learn a byte-pair-encoding merge
table from a corpus, then encode the corpus with it.

The scalable shape is the one real BPE trainers use (HuggingFace
tokenizers, SentencePiece): the corpus is reduced ONCE to a word-type
frequency table (classic wordcount — map-side combine, one shuffle of
(word, count) rows), and the merge loop runs over that bounded table,
never the corpus. At 100 TB the corpus has ~10^10 documents but only
~10^7 distinct pre-token word types; learning on the type table is the
difference between N full-corpus passes and one.

  word_type_counts   distributed: regexp pre-tokenize (JVM codegen, the
                     engine-portable GPT-2-style BPE_PATTERN) -> explode
                     -> groupBy(word).count(). A hot word ("the") folds
                     map-side before the shuffle — no skew.
  learn_bpe          bounded: take the top `max_word_types` types by
                     (count desc, word asc); the dropped tail's share of
                     the token mass is REPORTED in the result (no silent
                     caps). The merge loop itself is driver-side pure
                     Python over <= max_word_types rows — deliberate:
                     pair-frequency state is vocab-sized, not
                     corpus-sized, and a distributed argmax per merge
                     would cost a shuffle per merge for a table that
                     fits in one hand.
  apply_bpe          distributed: the merge table broadcasts (one copy
                     per executor, not per task) and each document
                     encodes in an Arrow batch with a bounded per-task
                     word memo — word types repeat, so each distinct
                     word pays the merge walk once per task.

Determinism: ties in pair frequency break to the lexicographically
smallest pair; word-type truncation breaks count ties by word; the
encoder is a pure function of (merges, text). Same corpus => same
merges => same encoding at any parallelism.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docling_api_spark.operators.textstats import BPE_PATTERN


def word_type_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the whole corpus, BPE_PATTERN pre-tokenization."""
    toks = F.regexp_extract_all(text_col, F.lit(BPE_PATTERN), 0)
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    out, i = [], 0
    while i < len(symbols):
        if (i + 1 < len(symbols)
                and symbols[i] == pair[0] and symbols[i + 1] == pair[1]):
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def learn_bpe(
    word_counts: DataFrame,
    n_merges: int = 1000,
    max_word_types: int = 100_000,
) -> dict:
    """Learn up to ``n_merges`` merges from a (word, n) frequency table.

    Returns ``{"merges": [(a, b), ...], "vocab": [...],
    "n_word_types": total types, "n_word_types_used": types kept,
    "token_mass_covered": exact HALF_UP-e4 fraction of pre-token
    occurrences the kept types account for}``. Stops early when no pair
    occurs twice.
    """
    tot = word_counts.agg(
        F.count(F.lit(1)).alias("types"), F.sum("n").alias("mass")
    ).collect()[0]
    n_types, mass = int(tot["types"] or 0), int(tot["mass"] or 0)
    top = (
        word_counts.orderBy(F.desc("n"), F.asc("word"))
        .limit(max_word_types)
        .collect()
    )
    used_mass = sum(int(r["n"]) for r in top)
    words = {tuple(r["word"]): int(r["n"]) for r in top}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # max count; ties break to the lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        words = {
            _merge_word(syms, best[0]): n for syms, n in words.items()
        }

    base = sorted({c for syms in words for sym in syms for c in sym})
    # dedupe while preserving rank order: two distinct merges can
    # concatenate to the same string (('a','bc') and ('ab','c') both
    # yield 'abc') and a duplicated vocab entry would silently shift any
    # id table built by enumerate()
    vocab, seen = [], set()
    for tok in base + [a + b for a, b in merges]:
        if tok not in seen:
            seen.add(tok)
            vocab.append(tok)
    covered = (
        ((2 * 10000 * used_mass + mass) // (2 * mass)) / 10000
        if mass else 0.0
    )
    return {
        "merges": merges,
        "vocab": vocab,
        "n_word_types": n_types,
        "n_word_types_used": len(top),
        "token_mass_covered": covered,
    }


def _encode_word(word: str, ranks: dict) -> list[str]:
    """Standard BPE inference: repeatedly merge the lowest-rank adjacent
    pair present."""
    syms = list(word)
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document: (id_col, n_bpe_tokens, bpe_tokens).

    Tokens outside the learned vocab fall back to their base characters
    (standard BPE inference — never drops content). The merge table is a
    Spark broadcast variable: one copy per executor.
    """
    import re

    from docling_api_spark.operators.similarity import register_broadcast

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {tuple(m): i for i, m in enumerate(merges)}
    )
    register_broadcast(bc)  # evict stale copies in long-lived sessions
    pat = re.compile(BPE_PATTERN)
    out_schema = (
        df.select(id_col).schema[id_col].simpleString().split(":")[1]
    )
    schema = f"{id_col} {out_schema}, n_bpe_tokens int, bpe_tokens array<string>"

    def encoder(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ranks = bc.value
        # per-TASK memo (word types repeat heavily across batches),
        # bounded so a pathological tail of unique "words" (hashes,
        # base64 blobs) cannot grow it past executor heap
        memo: dict[str, list[str]] = {}
        for batch in batches:
            if len(memo) > 1_000_000:
                memo.clear()
            ids = batch.column(id_col)
            texts = batch.column(text_col).to_pylist()
            toks_out, n_out = [], []
            for t in texts:
                toks: list[str] = []
                for w in pat.findall(t or ""):
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                toks_out.append(toks)
                n_out.append(len(toks))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(n_out, pa.int32()),
                 pa.array(toks_out, pa.list_(pa.string()))],
                [id_col, "n_bpe_tokens", "bpe_tokens"],
            )

    return df.select(id_col, text_col).mapInArrow(encoder, schema)
