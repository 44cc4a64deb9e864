"""Byte-pair-encoding tokenizer — train + apply (Sennrich, Haddow & Birch,
ACL 2016 "Neural Machine Translation of Rare Words with Subword Units");
the real-vocab upgrade of textstats.bpe_ish_token_count for LLM token
budgeting / sequence packing.

Spark-first split of the algorithm:

- **train**: the greedy most-frequent-pair merge loop needs only the WORD
  FREQUENCY table, never the corpus — exactly how sentencepiece/HF
  trainers consume word-count files. The word counts are one distributed
  explode + groupBy (top ``max_vocab_words`` by frequency keeps the
  driver table bounded at any corpus size); the merge loop then runs on
  that bounded table. Deterministic: ties on pair frequency break
  lexicographically.

- **apply**: BPE encoding is a pure function of the word, so encode each
  DISTINCT word once (a vocabulary-sized frame through one Arrow batch
  UDF) and JOIN the piece lists back to word occurrences — encode cost is
  O(vocabulary), not O(corpus). Token counting never reassembles
  per-document piece lists at all: it is a join + groupBy-sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_RE = r"[a-z0-9]+"
END = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the lowercase letter/digit-run pre-tokenization."""
    return (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    max_vocab_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list (the whole model — feed it to ``bpe_encode`` /
    ``bpe_token_count``). Words carry the ``</w>`` end marker so merges
    can distinguish word-final pieces, per the original formulation."""
    wc = (
        word_counts(df, text_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(int(max_vocab_words))
        .collect()
    )
    vocab = {tuple(r["word"]) + (END,): int(r["freq"]) for r in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + freq
        if not pairs:
            break
        # deterministic: max frequency, ties -> lexicographically SMALLEST
        top_freq = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top_freq)
        if top_freq < 2:
            break  # no productive merge left
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_vocab = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge-rank table (lowest-rank pair
    merges first — the standard BPE apply loop)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _word_pieces(spark_df_words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word) -> (word, pieces array<string>): one Arrow-batched encode per
    DISTINCT word (the vocabulary-sized frame)."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def enc(col: pd.Series) -> pd.Series:
        return pd.Series([encode_word(w, ranks) for w in col])

    enc.__annotations__ = {"col": pd.Series, "return": pd.Series}
    enc_udf = F.pandas_udf(enc, "array<string>")
    return spark_df_words.select("word", enc_udf("word").alias("pieces"))


def bpe_token_count(
    df: DataFrame, key: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(key, n_words, n_bpe_tokens) under a trained merge list. The encode
    UDF touches only DISTINCT words; occurrences get their piece counts by
    join + sum (corpus cost is pure join work, no Python)."""
    occ = df.select(
        F.col(key).alias(key),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
        ).alias("word"),
    )
    pieces = _word_pieces(occ.select("word").distinct(), merges).select(
        "word", F.size("pieces").alias("np")
    )
    per_doc = (
        occ.join(pieces, "word")
        .groupBy(key)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("np").alias("n_bpe_tokens"),
        )
    )
    return (
        df.select(key)
        .join(per_doc, key, "left")
        .select(
            key,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )


def bpe_encode(
    df: DataFrame, key: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(key, pieces array<string>) — the full ordered piece stream per doc
    (posexplode words → join distinct-word pieces → ordered reassembly)."""
    occ = df.select(
        F.col(key).alias(key),
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
        ).alias("pos", "word"),
    )
    pieces = _word_pieces(occ.select("word").distinct(), merges)
    return (
        occ.join(pieces, "word")
        .groupBy(key)
        .agg(
            F.expr(
                "flatten(transform(sort_array(collect_list(struct(pos, pieces))),"
                " x -> x.pieces))"
            ).alias("pieces")
        )
    )
