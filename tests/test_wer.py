"""WER / cpWER / ORC-WER harness tests (synthetic transcript pairs)."""

import numpy as np
import pytest

from tssep_tpu.eval.wer import (
    FunctionTranscriber, WerResult, cp_wer, normalize_transcript, orc_wer,
    wer,
)


def test_wer_identity():
    r = wer('the quick brown fox', 'the quick brown fox')
    assert r.errors == 0 and r.length == 4 and r.error_rate == 0.0


def test_wer_substitution():
    r = wer('the quick brown fox', 'the quick red fox')
    assert (r.errors, r.substitutions, r.insertions, r.deletions) \
        == (1, 1, 0, 0)
    assert r.error_rate == pytest.approx(0.25)


def test_wer_insert_delete():
    r = wer('a b c', 'a b c d e')
    assert (r.errors, r.insertions) == (2, 2)
    r = wer('a b c d e', 'a c e')
    assert (r.errors, r.deletions) == (2, 2)


def test_wer_mixed_known_value():
    # ref 6 words; hyp: 1 sub + 1 del + 1 ins = 3 errors
    r = wer('one two three four five six', 'one TWO2 three five six seven')
    assert r.errors == 3
    assert r.error_rate == pytest.approx(0.5)


def test_wer_normalization():
    assert normalize_transcript("Hello, world! it's me.") \
        == ['HELLO', 'WORLD', "IT'S", 'ME']
    assert wer('Hello, World!', 'hello world').errors == 0


def test_wer_empty():
    assert wer('', '').error_rate == 0.0
    assert wer('', 'a b').errors == 2
    assert wer('a b', '').errors == 2


def test_wer_result_add():
    total = wer('a b', 'a x') + wer('c d', 'c d y')
    assert total.errors == 2 and total.length == 4
    assert total.error_rate == pytest.approx(0.5)


def test_cp_wer_permutation_recovery():
    refs = ['alpha beta gamma', 'delta epsilon', 'zeta eta theta iota']
    # hypotheses in a different speaker order, one error in each
    hyps = ['zeta eta XXX iota',          # -> ref 2 (1 sub)
            'alpha beta gamma extra',     # -> ref 0 (1 ins)
            'delta']                      # -> ref 1 (1 del)
    result, assignment = cp_wer(refs, hyps, return_assignment=True)
    assert assignment == {0: 2, 1: 0, 2: 1}
    assert result.errors == 3
    assert result.length == 9
    assert result.error_rate == pytest.approx(3 / 9)


def test_cp_wer_utterance_lists():
    refs = [['hello there', 'general kenobi'], ['you are', 'a bold one']]
    hyps = [['you are a bold one'], ['hello there general kenobi']]
    result = cp_wer(refs, hyps)
    assert result.errors == 0


def test_cp_wer_unequal_speaker_counts():
    # extra hypothesis speaker -> all its words are insertions
    result = cp_wer(['a b c'], ['a b c', 'x y'])
    assert result.errors == 2 and result.length == 3
    # missing hypothesis speaker -> deletions
    result = cp_wer(['a b c', 'x y'], ['a b c'])
    assert result.errors == 2 and result.length == 5


def test_orc_wer_segments():
    refs = ['a b c d', 'x y z']
    segs = ['a b', 'x y', 'c d', 'z']
    result = orc_wer(refs, segs)
    assert result.errors == 0
    # one corrupted segment
    result = orc_wer(refs, ['a b', 'x QQQ', 'c d', 'z'])
    assert result.errors == 1
    assert result.length == 7


def test_orc_wer_beats_naive_channel():
    # Interleaved segments that a fixed channel split would score badly
    refs = ['a a a', 'b b b']
    segs = ['a', 'b', 'a', 'b', 'a', 'b']
    assert orc_wer(refs, segs).errors == 0


def test_orc_wer_guard():
    # max_speakers is enforced (the segment DP itself has no K^S guard)
    with pytest.raises(ValueError):
        orc_wer(['a'] * 9, ['x'] * 3, max_speakers=8)


def test_orc_wer_matches_exhaustive_oracle():
    import random

    from tssep_tpu.eval.wer import _orc_wer_exhaustive

    rng = random.Random(0)
    vocab = ['a', 'b', 'c', 'd', 'e']
    for trial in range(25):
        k = rng.randint(1, 3)
        s = rng.randint(1, 6)
        refs = [' '.join(rng.choices(vocab, k=rng.randint(0, 6)))
                for _ in range(k)]
        segs = [' '.join(rng.choices(vocab, k=rng.randint(0, 4)))
                for _ in range(s)]
        got = orc_wer(refs, segs)
        want = _orc_wer_exhaustive(refs, segs)
        assert got.errors == want.errors, (trial, refs, segs)
        assert got.length == want.length


def test_orc_wer_meeting_scale():
    # 8 speakers x 24 segments: impossible for K^S enumeration (8^24),
    # must complete via the segment DP and find the zero-error assignment.
    refs_words = [[f'w{spk}x{i}' for i in range(9)] for spk in range(8)]
    segs, order = [], []
    for spk in range(8):
        for part in range(3):
            segs.append(' '.join(refs_words[spk][part * 3:(part + 1) * 3]))
            order.append(spk)
    # interleave segments round-robin in a temporal-order-preserving way
    idx = sorted(range(len(segs)), key=lambda i: (i % 3, order[i]))
    segs = [segs[i] for i in idx]
    refs = [' '.join(w) for w in refs_words]
    result, assignment = orc_wer(refs, segs, return_assignment=True)
    assert result.errors == 0
    assert result.length == 8 * 9
    assert assignment == [order[i] for i in idx]


def test_orc_wer_corrupted_segment_meeting_scale():
    refs = [' '.join(f's{k}w{i}' for i in range(6)) for k in range(8)]
    segs = []
    for i in range(3):
        for k in range(8):
            segs.append(f's{k}w{2 * i} s{k}w{2 * i + 1}')
    segs[5] = 'XXX YYY'  # one fully corrupted 2-word segment
    result = orc_wer(refs, segs)
    assert result.errors == 2
    assert result.length == 48


def test_function_transcriber():
    t = FunctionTranscriber(lambda s, sr: 'hello world')
    assert t(np.zeros(16000), 16000) == 'hello world'


def test_driver_score_wer_end_to_end():
    """EvalDriver.score_wer: a correlation-based fake ASR transcribes the
    separated streams; cpWER recovers the speaker permutation and scores 0
    for clean separation."""
    from tssep_tpu.eval.driver import EvalDriver

    rng = np.random.default_rng(0)
    texts = ['the first speaker talks', 'second speaker here',
             'and a third one']
    refs = rng.normal(size=(3, 8000))

    def fake_asr(samples, sample_rate):
        # 'recognize' by matching against the known reference signals
        scores = [abs(np.dot(samples, r)) for r in refs]
        return texts[int(np.argmax(scores))]

    driver = EvalDriver.__new__(EvalDriver)  # score_wer needs no model
    # permuted, slightly noisy estimates
    est = np.stack([refs[2], refs[0], refs[1]]) \
        + 0.01 * rng.normal(size=(3, 8000))
    out = driver.score_wer({'time_estimate': est}, texts, fake_asr)
    assert out['cp_wer'] == 0.0
    assert out['wer_errors'] == 0
    assert out['wer_assignment'] == {0: 2, 1: 0, 2: 1}

    # a corrupted stream produces errors
    est_bad = est.copy()
    est_bad[0] = rng.normal(size=8000)  # matches some wrong reference
    out_bad = driver.score_wer({'time_estimate': est_bad}, texts, fake_asr)
    assert out_bad['wer_errors'] > 0
