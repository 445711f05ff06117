"""WER harness: word error rate, cpWER, and a pluggable ASR interface.

The reference keeps ASR scoring in the companion repo (``tssep_data``,
reference ``README.md:79-82``); the north-star parity target is DER/WER, so
the framework ships its own harness:

- ``wer``: Levenshtein word error rate with insertion/deletion/substitution
  breakdown (dynamic programming over word sequences).
- ``cp_wer``: concatenated-minimum-permutation WER (Watanabe et al.,
  CHiME-6): per-speaker transcripts are concatenated, the hypothesis->
  reference speaker assignment minimizing the *total* word errors is found
  by Hungarian assignment, and WER is total errors / total reference words.
- ``orc_wer``: optimal-reference-combination WER for segment-level
  hypotheses without speaker labels (each hypothesis segment may be
  attributed to any reference speaker; dynamic program over segments).
- ``Transcriber``: the pluggable ASR-hypothesis interface; the eval driver
  accepts any callable ``(samples, sample_rate) -> str``.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Sequence

import numpy as np

__all__ = ['WerResult', 'wer', 'cp_wer', 'orc_wer', 'Transcriber',
           'normalize_transcript']


def normalize_transcript(text: str) -> list[str]:
    """Uppercase, strip punctuation to whitespace-separated words."""
    keep = []
    for ch in text.upper():
        if ch.isalnum() or ch in "' ":
            keep.append(ch)
        else:
            keep.append(' ')
    return ''.join(keep).split()


@dataclasses.dataclass
class WerResult:
    errors: int
    length: int
    insertions: int
    deletions: int
    substitutions: int

    @property
    def error_rate(self) -> float:
        if self.length == 0:
            return 0.0 if self.errors == 0 else float('inf')
        return self.errors / self.length

    def __add__(self, other: 'WerResult') -> 'WerResult':
        return WerResult(
            self.errors + other.errors, self.length + other.length,
            self.insertions + other.insertions,
            self.deletions + other.deletions,
            self.substitutions + other.substitutions)

    def as_dict(self):
        return {'wer': self.error_rate, 'errors': self.errors,
                'length': self.length, 'insertions': self.insertions,
                'deletions': self.deletions,
                'substitutions': self.substitutions}


def _words(x) -> list[str]:
    if isinstance(x, str):
        return normalize_transcript(x)
    return list(x)


def _edit_ops(ref: list[str], hyp: list[str]):
    """(errors, ins, del, sub) via Levenshtein DP (numpy, O(R*H))."""
    r, h = len(ref), len(hyp)
    if r == 0:
        return h, h, 0, 0
    if h == 0:
        return r, 0, r, 0
    # cost[i,j]: (total, ins, del, sub) packed into separate arrays
    total = np.zeros((r + 1, h + 1), dtype=np.int32)
    total[:, 0] = np.arange(r + 1)
    total[0, :] = np.arange(h + 1)
    ops = np.zeros((r + 1, h + 1), dtype=np.int8)  # 0 diag, 1 ins, 2 del
    ops[:, 0] = 2
    ops[0, :] = 1
    ref_a = np.array(ref)
    for i in range(1, r + 1):
        match = (ref_a[i - 1] == np.array(hyp)) if h else np.array([])
        for j in range(1, h + 1):
            sub = total[i - 1, j - 1] + (0 if match[j - 1] else 1)
            ins = total[i, j - 1] + 1
            dele = total[i - 1, j] + 1
            best = min(sub, ins, dele)
            total[i, j] = best
            ops[i, j] = 0 if best == sub else (1 if best == ins else 2)
    # Backtrack for the op breakdown
    i, j = r, h
    n_ins = n_del = n_sub = 0
    while i > 0 or j > 0:
        op = ops[i, j]
        if op == 0 and i > 0 and j > 0:
            if ref[i - 1] != hyp[j - 1]:
                n_sub += 1
            i, j = i - 1, j - 1
        elif op == 1 and j > 0:
            n_ins += 1
            j -= 1
        else:
            n_del += 1
            i -= 1
    return int(total[r, h]), n_ins, n_del, n_sub


def wer(reference, hypothesis) -> WerResult:
    """Word error rate between one reference and one hypothesis.

    Inputs may be strings (normalized + split) or word sequences.
    """
    ref, hyp = _words(reference), _words(hypothesis)
    errors, n_ins, n_del, n_sub = _edit_ops(ref, hyp)
    return WerResult(errors, len(ref), n_ins, n_del, n_sub)


def cp_wer(reference_by_speaker: Sequence, hypothesis_by_speaker: Sequence,
           return_assignment=False):
    """Concatenated-minimum-permutation WER.

    ``reference_by_speaker`` / ``hypothesis_by_speaker``: one transcript per
    speaker — either a string, or a sequence of utterance strings that are
    concatenated in order.  Speaker counts may differ; the smaller side is
    padded with empty transcripts (unmatched hypothesis speakers count as
    insertions, unmatched reference speakers as deletions).
    """
    def concat(x):
        if isinstance(x, str):
            return _words(x)
        words = []
        for utt in x:
            words.extend(_words(utt))
        return words

    refs = [concat(x) for x in reference_by_speaker]
    hyps = [concat(x) for x in hypothesis_by_speaker]
    n = max(len(refs), len(hyps))
    refs += [[]] * (n - len(refs))
    hyps += [[]] * (n - len(hyps))

    table = [[wer(r, h) for h in hyps] for r in refs]
    cost = np.array([[t.errors for t in row] for row in table])
    import scipy.optimize
    ri, hi = scipy.optimize.linear_sum_assignment(cost)
    result = WerResult(0, 0, 0, 0, 0)
    for r, h in zip(ri, hi):
        result = result + table[r][h]
    if return_assignment:
        return result, dict(zip(hi.tolist(), ri.tolist()))
    return result


def orc_wer(reference_by_speaker: Sequence, hypothesis_segments: Sequence,
            max_speakers=8):
    """Optimal-reference-combination WER.

    Hypothesis *segments* (in temporal order, no speaker labels) are each
    attributed to one reference speaker (channel); the attribution
    minimizing the total word errors over all assignments is found by
    exhaustive search over per-segment channels with memoized per-channel
    concatenation — exact for the small segment counts of meeting eval
    (complexity K^S; guarded).
    """
    refs = [_words(r) if isinstance(r, (str, list)) else list(r)
            for r in reference_by_speaker]
    segs = [_words(s) for s in hypothesis_segments]
    k, s = len(refs), len(segs)
    if k == 0:
        total = sum(len(x) for x in segs)
        return WerResult(total, 0, total, 0, 0)
    if s == 0:
        total = sum(len(r) for r in refs)
        return WerResult(total, sum(len(r) for r in refs), 0, total, 0)
    if k ** s > 250_000:
        raise ValueError(
            f'orc_wer: {k}^{s} assignments is too many for exhaustive '
            f'search; merge segments or use cp_wer')
    best = None
    for assign in itertools.product(range(k), repeat=s):
        streams = [[] for _ in range(k)]
        for seg, ch in zip(segs, assign):
            streams[ch].extend(seg)
        result = WerResult(0, 0, 0, 0, 0)
        for r, hyp_stream in zip(refs, streams):
            result = result + wer(r, hyp_stream)
        if best is None or result.errors < best.errors:
            best = result
    return best


class Transcriber:
    """Pluggable ASR-hypothesis interface for the eval driver.

    Any callable ``(samples: np.ndarray, sample_rate: int) -> str`` works;
    this base class just documents the contract.  Wire a real ASR (e.g. a
    local HuggingFace CTC checkpoint) by subclassing::

        class MyASR(Transcriber):
            def __call__(self, samples, sample_rate):
                return self.pipe(samples)['text']
    """

    def __call__(self, samples: np.ndarray, sample_rate: int) -> str:
        raise NotImplementedError


@dataclasses.dataclass
class FunctionTranscriber(Transcriber):
    fn: Callable[[np.ndarray, int], str]

    def __call__(self, samples, sample_rate):
        return self.fn(samples, sample_rate)
