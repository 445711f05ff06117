"""The in-framework CTC word recognizer: a REAL ASR behind the WER harness
(simulator word vocabulary -> log-mel/BLSTM/CTC -> cpWER), not a stub
transcriber."""

import numpy as np
import pytest

from tssep_tpu.data.simulate import MeetingSimulator
from tssep_tpu.eval.wer import wer


@pytest.fixture(scope='module')
def sim():
    return MeetingSimulator(duration=4.0, aux_size=65, seed=0,
                            embedding_kind='gate', speaker_pool=8,
                            vocabulary=6)


def test_vocabulary_examples_carry_transcription(sim):
    ex = sim.example(0)
    assert 'transcription' in ex
    assert len(ex['transcription']) == sim.num_speakers
    for t in ex['transcription']:
        words = t.split()
        assert words, 'every speaker utters at least one word'
        assert all(w.startswith('w') and int(w[1:]) < sim.vocabulary
                   for w in words)


def test_word_patterns_are_distinct(sim):
    patterns = [tuple(sim.word_pattern(w)) for w in range(sim.vocabulary)]
    assert len(set(patterns)) == sim.vocabulary
    # self-delimiting codebook: leading 'on' slot, no >=3-slot silence runs
    for p in patterns:
        assert p[0] == 1
        assert 2 <= sum(p) <= 5
        run = 0
        for b in p:
            run = run + 1 if b == 0 else 0
            assert run < 3, p


def test_shard_roundtrip_keeps_transcription(sim, tmp_path):
    from tssep_tpu.data.shard_corpus import ShardCorpusReader
    from tssep_tpu.data.simulate import simulate_corpus
    path = simulate_corpus(tmp_path / 'v.shard', 2, sim)
    reader = ShardCorpusReader(train_shard=str(path), validate_shard=str(path),
                               eval_shard=str(path), aux_size=sim.aux_size)
    ex = next(iter(reader('eval')))
    assert ex['transcription'] == sim.example(0)['transcription']


@pytest.fixture(scope='module')
def asr(sim):
    from tssep_tpu.eval.ctc import CTCRecognizer
    return CTCRecognizer.train_on(sim, steps=1600, batch=16)


@pytest.mark.slow
def test_ctc_recognizer_learns_clean_words(sim, asr):
    """Held-out clean utterances from pool voices transcribe with low WER —
    a real recognizer producing real hypotheses."""
    rng = np.random.RandomState(999)
    from tssep_tpu.eval.ctc import _draw_voice
    errors, words = 0, 0
    for _ in range(6):
        f0, timbre = _draw_voice(sim, rng)
        sig, ref_words = sim.word_utterance(
            rng, int(sim.sample_rate * 1.6), f0, timbre)
        hyp = asr(sig, sim.sample_rate)
        r = wer(' '.join(ref_words), hyp)
        errors += r.errors
        words += r.length
    assert words > 0
    assert errors / words < 0.3, (errors, words)


@pytest.mark.slow
def test_ctc_recognizer_persistence_roundtrip(sim, asr, tmp_path):
    from tssep_tpu.eval.ctc import CTCRecognizer
    rng = np.random.RandomState(7)
    from tssep_tpu.eval.ctc import _draw_voice
    f0, timbre = _draw_voice(sim, rng)
    sig, _ = sim.word_utterance(rng, int(sim.sample_rate * 1.2), f0, timbre)
    before = asr(sig, sim.sample_rate)
    asr.save(tmp_path / 'asr.npz')
    fresh = CTCRecognizer(vocabulary=sim.vocabulary).load(tmp_path / 'asr.npz')
    assert fresh(sig, sim.sample_rate) == before
