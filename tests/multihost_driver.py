"""Subprocess driver for tests/test_multihost.py.

Runs the reduced TS-VAD recipe through ``Experiment.train()`` as one
process of a ``jax.distributed`` CPU cluster (2 virtual devices per
process).  Invoked as:

    python multihost_driver.py <proc_id> <nproc> <port> <storage> <out.npz>

With nproc=1 the process owns all 4 virtual devices and skips the
distributed init — the numerical reference for the 2-process run.

This exercises the real multi-host code paths with process_count > 1:
``dist.multihost.initialize`` rendezvous, ``host_shard_dataset`` (examples
dealt round-robin by process), ``global_batch_from_local``
(``make_array_from_process_local_data`` over the 'data' mesh axis), the
collective-safe host fetch (``process_allgather``) in loss/summary/
checkpoint paths, and process-0-gated checkpoint/metrics writes.
Reference counterpart: none — the reference is strictly single-process
(``torch.nn.DataParallel``, reference experiment.py:313-314).
"""

import json
import os
import re
import sys

proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
port, storage, out_path = sys.argv[3], sys.argv[4], sys.argv[5]

local_devices = 4 // nproc
flags = os.environ.get('XLA_FLAGS', '')
flags = re.sub(r'--xla_force_host_platform_device_count=\d+', '', flags)
os.environ['XLA_FLAGS'] = (
    f'{flags} --xla_force_host_platform_device_count={local_devices}')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))          # tests/ (test_exp)
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))  # repo root

from tssep_tpu.config.configurable import NestedView, from_config  # noqa: E402
from tssep_tpu.dist import multihost  # noqa: E402
from tssep_tpu.train.experiment import Experiment  # noqa: E402

if nproc > 1:
    multihost.initialize(coordinator_address=f'localhost:{port}',
                         num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == proc_id, jax.process_index()
assert jax.device_count() == 4, jax.devices()
assert jax.local_device_count() == local_devices

from test_exp import _load_reduced  # noqa: E402

config = _load_reduced('init_cfg_tsvad.yaml', storage)
nv = NestedView(config)
nv['eg.trainer.stop_trigger'] = [3, 'iteration']
# Deterministic forward so the 2-process and 1-process runs compare.
nv['eg.trainer.model.mask_estimator.random_speaker_order'] = False
config['eg']['trainer']['model']['reader']['train_examples'] = 8
config['eg']['trainer']['mesh'] = {'data': 4, 'model': 1}
config['eg']['train_batchsize'] = 4
config['eg']['validation_batchsize'] = 4

eg: Experiment = from_config(Experiment.get_config(config['eg']))
it = eg.train()
assert it == 3, it

from tssep_tpu.train.checkpoint import params_to_named  # noqa: E402

named = params_to_named(eg.trainer.params)   # host fetch: allgather-safe
if jax.process_index() == 0:
    losses = {}
    with open(os.path.join(storage, 'metrics.jsonl')) as f:
        for line in f:
            rec = json.loads(line)
            if 'train/loss' in rec:
                losses[str(rec['step'])] = rec['train/loss']
    np.savez(out_path, __losses__=json.dumps(losses),
             **{k: np.asarray(v) for k, v in named.items()})
print(f'driver proc {proc_id}/{nproc} OK', flush=True)
