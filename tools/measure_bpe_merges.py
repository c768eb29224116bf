"""Measure BPE training wall-clock vs merge count (VERDICT r06 item 2).

The r06 trainer ran one distributed pair-count job + a 1-row argmax
collect PER merge — job-count-bounded (~0.2 s/merge => ~45 min for a
realistic 8k-merge vocabulary, hours for 30k-100k). The r07 trainer
collects the vocab-bounded word table once and runs the merge loop
driver-local (plans/bpe.py:_train_merges_local). This script times the
EXACT production loop on a synthetic realistic vocabulary (the sf
corpora use a 31-word template vocab, which exhausts after 89 merges —
too small to exercise merge-count scale).

Vocabulary model: 150k distinct words, 2-12 chars drawn from an
English-letter frequency table, Zipf counts (count_i ~ 1e6 / rank).
Seeded, so numbers are reproducible run-to-run.

Usage: python tools/measure_bpe_merges.py [n_merges ...]
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

from gmall2021_flink_dw_spark.plans.bpe import _train_merges_local

_LETTER_WEIGHTS = {
    "a": 8, "b": 2, "c": 3, "d": 4, "e": 12, "f": 2, "g": 2, "h": 6,
    "i": 7, "j": 1, "k": 1, "l": 4, "m": 3, "n": 7, "o": 8, "p": 2,
    "q": 1, "r": 6, "s": 6, "t": 9, "u": 3, "v": 1, "w": 2, "x": 1,
    "y": 2, "z": 1,
}


def synth_vocab(n_words: int = 150_000, seed: int = 42) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    letters = list(_LETTER_WEIGHTS)
    weights = list(_LETTER_WEIGHTS.values())
    words: dict[str, int] = {}
    while len(words) < n_words:
        w = "".join(rng.choices(letters, weights=weights, k=rng.randint(2, 12)))
        if w not in words:
            words[w] = max(1, int(1_000_000 / (len(words) + 1)))
    return [(" ".join(w), c) for w, c in words.items()]


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [512, 2048, 8192]
    rows = synth_vocab()
    print(f"vocab: {len(rows)} distinct words")
    for n in counts:
        t0 = time.time()
        merges, _ = _train_merges_local(list(rows), n)
        dt = time.time() - t0
        print(
            f"n_merges={n}: {len(merges)} merges in {dt:.2f}s "
            f"({dt / max(len(merges), 1) * 1000:.2f} ms/merge)"
        )


if __name__ == "__main__":
    main()
