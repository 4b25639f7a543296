"""Distributed BPE tokenizer training + encoding.

Sennrich et al. 2016 byte-pair encoding, trained the way production
tokenizer trainers actually work at corpus scale: merges are learned
from the WORD HISTOGRAM, not the raw text — so the only distributed
work is one vocabulary-sized count exchange (the
:func:`~.text.word_count` combiner), and the merge loop runs on the
driver over ≤ ``max_word_types`` (word type, count) rows in memory.
A 100 TB corpus and a 100 GB corpus with the same vocabulary train in
the same driver time.

Determinism contract: the merge loop picks the most frequent pair,
ties broken lexicographically ascending on the pair — a pure function
of the histogram, hence of the corpus (partitioning-invariant).

Encoding is a map stage: the merge list broadcasts via ``ray.put``;
each batch encodes its DISTINCT words once (the per-batch cache every
real tokenizer uses — work is O(unique words), not O(tokens)) and
scatters token counts back to documents vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray

__all__ = ["BPEModel", "bpe_train", "bpe_encode_counts",
           "bpe_merges_from_histogram", "bpe_encode_word"]

_EOW = "</w>"  # end-of-word marker, per the original BPE formulation


@dataclass
class BPEModel:
    merges: List[Tuple[str, str]]

    @property
    def ranks(self) -> Dict[Tuple[str, str], int]:
        return {m: i for i, m in enumerate(self.merges)}


def bpe_merges_from_histogram(words: List[str], counts: List[int],
                              n_merges: int) -> List[Tuple[str, str]]:
    """The classic histogram BPE loop (driver-side, deterministic)."""
    from collections import Counter

    seqs = [tuple(w) + (_EOW,) for w in words]
    counts = [int(c) for c in counts]
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for seq, c in zip(seqs, counts):
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += c
        if not pair_counts:
            break
        # max count, ties broken lexicographically ascending
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_seqs = []
        for seq in seqs:
            out, i, n = [], 0, len(seq)
            while i < n:
                if i < n - 1 and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs
    return merges


def bpe_encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Encode one word by applying merges in rank order (the standard
    lowest-rank-first greedy loop)."""
    seq = list(word) + [_EOW]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_train(ds, text_col: str = "text", n_merges: int = 100, *,
              max_word_types: Optional[int] = None) -> BPEModel:
    """Learn a BPE merge list from a Dataset: one distributed
    ``word_count`` exchange, then the histogram loop on the driver.
    ``max_word_types`` caps the histogram (types ranked by count desc,
    word asc) for corpora whose vocabulary outgrows driver memory —
    rare types contribute negligible pair mass anyway."""
    from .text import word_count

    df = word_count(ds, text_col=text_col).to_pandas()
    if len(df) == 0:
        raise ValueError("bpe_train: no tokens in corpus")
    df = df.sort_values(["n", "word"], ascending=[False, True],
                        kind="stable")
    if max_word_types is not None:
        df = df.head(int(max_word_types))
    merges = bpe_merges_from_histogram(df["word"].tolist(),
                                       df["n"].tolist(), n_merges)
    return BPEModel(merges=merges)


def bpe_encode_counts(ds, model: BPEModel, text_col: str = "text",
                      out_col: str = "n_bpe_tokens"):
    """Append the per-document BPE token count. Each batch encodes its
    DISTINCT words once and scatters counts back vectorized."""
    from .classify import _explode_tokens

    ref = ray.put(model.ranks)

    def encode(b: pa.Table) -> pa.Table:
        ranks = ray.get(ref)
        n = b.num_rows
        flat, parents = _explode_tokens(b, text_col)
        if len(flat) == 0:
            return b.append_column(out_col,
                                   pa.array(np.zeros(n, dtype=np.int64)))
        toks = np.asarray(flat, dtype=object).astype(str)
        par = np.asarray(parents, dtype=np.int64)
        uniq, inv = np.unique(toks, return_inverse=True)
        tok_len = np.array([len(bpe_encode_word(w, ranks)) for w in uniq],
                           dtype=np.int64)
        per_doc = np.bincount(par, weights=tok_len[inv], minlength=n)
        return b.append_column(out_col,
                               pa.array(per_doc.astype(np.int64)))

    return ds.map_batches(encode, batch_format="pyarrow")
