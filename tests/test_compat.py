"""Compat layer: reference factory aliases + torch checkpoint import."""

import numpy as np
import pytest

import tssep_tpu.compat  # noqa: F401 - registers aliases
from tssep_tpu.compat.torch_ckpt import translate_torch_name
from tssep_tpu.config import from_config, get_config


def test_reference_yaml_loads():
    """The reference's own toy config (its factory paths) builds our model."""
    import yaml
    ref_yaml = '/root/reference/tssep/exp/init_cfg_common.yaml'
    with open(ref_yaml) as f:
        cfg = yaml.safe_load(f)
    model_cfg = cfg['eg']['trainer']['model']
    model_cfg['loss'] = {'factory': 'tssep.train.loss.VADSigmoidBCE',
                         'target': 'Vad'}
    model_cfg['mask_estimator']['output_resolution'] = 't'
    full = get_config(model_cfg['factory'],
                      {k: v for k, v in model_cfg.items() if k != 'factory'})
    model = from_config(full)
    assert model.fe.output_size == 553
    assert model.mask_estimator.ts_vad == 8
    assert model.mask_estimator.combination == 'mul'
    assert model.loss.name == 'VADSigmoidBCE'


def test_translate_names():
    cases = {
        'mask_estimator.pre_net.net.0.weight_ih_l0':
            'mask_estimator.pre_net.lstm0.weight_ih_l0',
        'mask_estimator.pre_net.net.0.weight_hh_l0_reverse':
            'mask_estimator.pre_net.lstm0.weight_hh_l0_reverse',
        'mask_estimator.pre_net.net.1.weight':
            'mask_estimator.pre_net.proj0.weight',
        'mask_estimator.post_net.birnn2.net.0.bias_ih_l0':
            'mask_estimator.post_net.birnn2.lstm0.bias_ih_l0',
        'mask_estimator.post_net.birnn0.net.1.bias':
            'mask_estimator.post_net.birnn0.proj0.bias',
        'mask_estimator.post_net.linear2.weight':
            'mask_estimator.post_net.linear2.weight',
        'mask_estimator.aux_net.net.0.weight':
            'mask_estimator.aux_net.linear0.weight',
        'mask_estimator.aux_net.net.2.weight':
            'mask_estimator.aux_net.linear1.weight',
        'mask_estimator.aux_net.net.4.bias':
            'mask_estimator.aux_net.linear2.bias',
    }
    for src, want in cases.items():
        assert translate_torch_name(src) == want, src


def test_torch_checkpoint_roundtrip(tmp_path):
    """Build a torch state dict shaped like the reference's, import it, and
    check every parameter lands bit-identically."""
    torch = pytest.importorskip('torch')
    import jax
    from tssep_tpu.compat.torch_ckpt import load_torch_checkpoint
    from tssep_tpu.tasks.model import Model
    from tssep_tpu.train.checkpoint import params_to_named

    model = Model.new({'mask_estimator': {'units': 10, 'projs': 12}})
    params = model.init_params(jax.random.PRNGKey(0))
    named = params_to_named(params)

    # reverse-translate our names into reference naming and save as .pth
    inverse = {}
    for name, arr in named.items():
        ref = name
        ref = ref.replace('.lstm0.', '.net.0.')
        ref = ref.replace('.proj0.', '.net.1.')
        inverse[ref] = torch.tensor(np.asarray(arr))
    path = tmp_path / 'ckpt.pth'
    torch.save({'model': inverse}, path)

    loaded = load_torch_checkpoint(path, params)
    loaded_named = params_to_named(loaded)
    assert set(loaded_named) == set(named)
    for k in named:
        np.testing.assert_array_equal(loaded_named[k], named[k])
