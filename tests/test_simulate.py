"""Meeting simulation -> shard corpus -> training path."""

import jax
import numpy as np
import pytest

from tssep_tpu.data.simulate import MeetingSimulator, SpeakerEmbedder, simulate_corpus
from tssep_tpu.runtime import native


def test_embedder_discriminates_speakers():
    emb = SpeakerEmbedder(aux_size=64)
    rng = np.random.RandomState(0)
    sim = MeetingSimulator(duration=1.0)
    a1 = sim._speaker_source(np.random.RandomState(1), 16000, 100.0)
    a2 = sim._speaker_source(np.random.RandomState(2), 16000, 100.0)
    b = sim._speaker_source(np.random.RandomState(3), 16000, 260.0)
    ea1, ea2, eb = emb(a1), emb(a2), emb(b)
    same = float(ea1 @ ea2)
    diff = float(ea1 @ eb)
    assert same > diff + 0.1, (same, diff)
    np.testing.assert_allclose(np.linalg.norm(ea1), 1.0, rtol=1e-6)


def test_simulator_example_contract():
    sim = MeetingSimulator(duration=1.0, num_speakers=4, num_channels=2,
                           reverb_taps=2, aux_size=33)
    ex = sim.example(0)
    obs = ex['audio_data']['observation']
    assert obs.shape == (2, 16000)
    assert ex['audio_data']['speaker_reverberation_early_ch0'].shape == (4, 16000)
    assert ex['audio_data']['vad'].shape == (4, 16000)
    assert ex['auxInput'].shape == (4, 33)
    # deterministic
    ex2 = sim.example(0)
    np.testing.assert_array_equal(obs, ex2['audio_data']['observation'])
    # distinct examples
    ex3 = sim.example(1)
    assert not np.array_equal(obs, ex3['audio_data']['observation'])


@pytest.mark.skipif(not native.available(), reason='native runtime not built')
@pytest.mark.slow
def test_corpus_roundtrip_and_training(tmp_path):
    from tssep_tpu.data.shard_corpus import ShardCorpusReader
    from tssep_tpu.tasks.model import Model

    shard = tmp_path / 'train.shard'
    sim = MeetingSimulator(duration=0.25, num_speakers=8, aux_size=33,
                           sample_rate=4000)
    simulate_corpus(shard, 3, sim)

    model = Model.new({
        'fe': {'size': 64, 'shift': 32, 'window_length': 64},
        'reader': {'factory':
                   'tssep_tpu.data.shard_corpus.ShardCorpusReader',
                   'train_shard': str(shard), 'validate_shard': str(shard),
                   'sample_rate': 4000, 'aux_size': 33},
        'mask_estimator': {'units': 2, 'projs': 3, 'combination': 'mul',
                           'ts_vad': 8, 'aux_net_output_size': 33},
    })
    assert isinstance(model.reader, ShardCorpusReader)
    ds = model.prepare_train_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    assert ex['observation'].shape[0] == 2
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    params = model.init_params(jax.random.PRNGKey(0))
    loss, _ = model.loss_fn(params, arrays, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_multichannel_recipe_end_to_end(tmp_path):
    """The >=6-mic reverberant rehearsal: train both stages briefly, score
    masking AND the ClassicBF MVDR path (exp/run_simulated.py
    main_multichannel at CI scale)."""
    from tssep_tpu.exp.run_simulated import main
    # strict_comparison=False: at 6 iterations the model is untrained, so
    # the comparison-validity checks (which are the point of the real
    # rehearsal) may legitimately fire; CI only exercises the plumbing.
    out = main(tmp_path / 'mc', train_examples=4, eval_examples=2,
               tsvad_iters=6, tssep_iters=6, batch=2, aux_size=513,
               duration=2.0, num_channels=6, reverb_taps=2,
               strict_comparison=False)
    vad_m, sep_m, bf_m = out
    assert vad_m['summary']['num_recordings'] == 2
    # the MVDR path produced scored output for every recording
    assert bf_m['summary']['num_recordings'] == 2
    if bf_m['summary'].get('degenerate'):
        # untrained-at-CI-scale: the new loudness machinery must have
        # recorded WHY instead of reporting a silent 0.0
        assert bf_m['summary']['degenerate_reasons']
    else:
        assert 'mean_si_sdr' in bf_m['summary']
        assert np.isfinite(bf_m['summary']['mean_si_sdr'])
    # every scored recording records how many segments were beamformed
    assert all('num_segments' in r for r in bf_m['per_recording'])
