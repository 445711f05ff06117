"""Variable-length meetings: padded collate, loss masking, shape bucketing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tssep_tpu.data.dummy import DummyReader, staircase_vad
from tssep_tpu.data import pipeline
from tssep_tpu.tasks.model import Model


@dataclasses.dataclass
class VarLenReader(DummyReader):
    """DummyReader variant with per-example durations."""

    def __call__(self, dataset_name, pre_load_apply=None, load_keys=()):
        base = super().__call__(dataset_name, None, load_keys)
        durations = [1.0, 0.7, 0.45, 1.0]

        out = []
        for i, ex in enumerate(base):
            n = int(self.sample_rate * 5 * durations[i % len(durations)])
            ex = dict(ex)
            ad = dict(ex['audio_data'])
            ad['observation'] = ad['observation'][..., :n]
            ad['vad'] = staircase_vad(n, ad['vad'].shape[0])
            if 'speaker_reverberation_early_ch0' in ad:
                ad['speaker_reverberation_early_ch0'] = \
                    ad['speaker_reverberation_early_ch0'][..., :n]
            ex['audio_data'] = ad
            ex['num_samples'] = n
            out.append(ex)
        ds = pipeline.new(out)
        if pre_load_apply is not None:
            ds = pre_load_apply(ds)
        return ds


def _model(loss, resolution):
    return Model.new({
        'fe': {'size': 64, 'shift': 32, 'window_length': 64},
        'reader': {'factory': f'{__name__}.VarLenReader',
                   'sample_rate': 256, 'aux_size': 33},
        'mask_estimator': {'units': 2, 'projs': 3, 'combination': 'mul',
                           'ts_vad': 8, 'aux_net_output_size': 33,
                           'output_resolution': resolution,
                           'random_speaker_order': False},
        'loss': loss,
    })


def test_varlen_collate_and_masks():
    model = _model({'factory': 'tssep_tpu.tasks.losses.LogMAE',
                    'target': 'speaker_reverberation_early_ch0'}, 'tf')
    ds = model.prepare_train_dataset(prefetch=False, batch_size=3)
    ex = next(iter(ds))
    assert '_sample_mask' in ex and 'num_samples' in ex
    obs = np.asarray(ex['observation'])
    sm = np.asarray(ex['_sample_mask'])
    assert obs.shape[-1] % (32 * Model.pad_shift_multiple) == 0
    for i, n in enumerate(ex['num_samples']):
        assert sm[i, 0, :n].all() and not sm[i, 0, n:].any()
        # padding region of the observation is zero
        assert np.abs(obs[i, :, n:]).max() == 0


@pytest.mark.slow
def test_varlen_masked_logmae_matches_per_example():
    """The padded-batch masked loss must equal per-example unpadded losses."""
    model = _model({'factory': 'tssep_tpu.tasks.losses.LogMAE',
                    'target': 'speaker_reverberation_early_ch0'}, 'tf')
    params = model.init_params(jax.random.PRNGKey(0))
    ds = model.prepare_train_dataset(prefetch=False, batch_size=2)
    ex = next(iter(ds))
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    _, aux = model.loss_fn(params, arrays, rng=None)
    batched = np.asarray(aux['per_example_loss'])

    # per-example, unpadded
    singles = []
    ds1 = model.prepare_train_dataset(prefetch=False, batch_size=None)
    for i, ex1 in zip(range(2), ds1):
        arr1 = {k: (v[None] if hasattr(v, 'shape') else v)
                for k, v in ex1.items()
                if hasattr(v, 'shape') or k == 'reference_channel'}
        arr1['reference_channel'] = 0
        _, aux1 = model.loss_fn(params, arr1, rng=None)
        singles.append(float(np.asarray(aux1['per_example_loss'])[0]))
    # ~1e-4-level deviation is inherent: the backward BLSTM's state enters
    # the valid region from the padded frames (the losses themselves are
    # exactly masked).
    np.testing.assert_allclose(batched, singles, rtol=3e-3)


@pytest.mark.slow
def test_varlen_vad_loss():
    model = _model({'factory': 'tssep_tpu.tasks.losses.VADSigmoidBCE',
                    'target': 'Vad'}, 't')
    params = model.init_params(jax.random.PRNGKey(0))
    ds = model.prepare_train_dataset(prefetch=False, batch_size=3)
    ex = next(iter(ds))
    assert '_frame_mask' in ex
    arrays = {k: v for k, v in ex.items()
              if hasattr(v, 'shape') or k == 'reference_channel'}
    loss, _ = model.loss_fn(params, arrays, rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.loss_fn(
        p, arrays, rng=jax.random.PRNGKey(1))[0])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
