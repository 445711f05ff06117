"""Speaker-conditioned mask estimator (TS-VAD / TS-SEP core network).

Functional re-design of the reference's ``MaskEstimator_v2``
(``tssep/train/net.py:333-986``):

pipeline: optional input normalizer -> shared ``pre_net`` RNNP over the
mixture -> speaker-embedding conditioning ('mul' LHUC-style elementwise or
'cat' broadcast-concat) -> per-speaker BLSTM stack (speakers folded into the
batch axis) -> optional TS-VAD cross-speaker stacking before the last BLSTM
-> final linear head -> per-speaker (mask, time, freq) logits -> sigmoid.

Extras, all reproduced: random speaker order (invertible, via an explicit JAX
PRNG key — jit-safe, unlike the reference's host-side numpy RNG),
``num_averaged_permutations`` cyclic-shift ensembling folded into the batch
axis, ``explicit_vad`` gating head, SpeakerBeam-style ``AuxNet``.

Everything here is jit-compatible: static shapes, no data-dependent Python
control flow; speaker permutations use static index tensors + gathers.
"""

from __future__ import annotations

import dataclasses
import os
import typing

import jax
import jax.numpy as jnp
import numpy as np

from tssep_tpu.config.configurable import Configurable, from_config
from tssep_tpu.nn.init import torch_linear_init
from tssep_tpu.nn.norm import InstanceNorm
from tssep_tpu.nn.rnnp import RNNP

__all__ = ['MaskEstimator', 'MaskEstimator_v2', 'AuxNet', 'LinearAux', 'Output']


@dataclasses.dataclass
class Output:
    mask: typing.Any
    logit: typing.Any
    embedding: typing.Any = None
    vad_mask: typing.Any = None
    vad_logit: typing.Any = None


jax.tree_util.register_dataclass(
    Output, data_fields=['mask', 'logit', 'embedding', 'vad_mask',
                         'vad_logit'], meta_fields=[])


class LinearAux(Configurable):
    """Linear projection of the auxiliary embeddings (reference ``net.py:19``)."""

    def __init__(self, idim, odim, bias=True):
        self.idim = idim
        self.odim = odim
        self.bias = bias

    def init(self, key):
        return {'net': torch_linear_init(key, self.idim, self.odim, self.bias)}

    def apply(self, params, aux, lengths=None):
        w = params['net']
        out = aux @ w['weight'].T
        if self.bias:
            out = out + w['bias']
        return out


class AuxNet(Configurable):
    """SpeakerBeam-style aux network: 3-layer MLP + masked temporal mean.

    Input aux: (..., spk, aux_frames, idim); output: (..., spk, odim).
    ``lengths`` (optional, (..., spk)) masks padded aux frames before the mean
    (equivalent of the reference's ``padded_sequence_reduction``,
    ``net.py:989-1049``).
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        if config.get('odim') is None:
            config['odim'] = config['idim']

    def __init__(self, idim, odim=None, normalizer: InstanceNorm = None):
        if odim is None:
            odim = idim
        elif odim != idim:
            raise NotImplementedError((odim, idim))
        self.idim = idim
        self.odim = odim
        self.normalizer = normalizer

    def init(self, key):
        k = jax.random.split(key, 3)
        return {
            'linear0': torch_linear_init(k[0], self.idim, self.idim),
            'linear1': torch_linear_init(k[1], self.idim, self.idim),
            'linear2': torch_linear_init(k[2], self.idim, self.idim),
        }

    def apply(self, params, aux, lengths=None):
        h = aux
        if self.normalizer is not None:
            h = self.normalizer(h)
        for i in range(3):
            p = params[f'linear{i}']
            h = h @ p['weight'].T + p['bias']
            if i < 2:
                h = jax.nn.relu(h)
        if lengths is None:
            return h.mean(axis=-2)
        t = h.shape[-2]
        mask = (jnp.arange(t) < lengths[..., None]).astype(h.dtype)
        return (h * mask[..., None]).sum(axis=-2) / lengths[..., None].astype(h.dtype)


#: Activation dtype for the conditioning + post-net chain (the (B, S, T, F)
#: intermediates dominate HBM traffic); carries/losses stay f32.
COMPUTE_DTYPE = {'float32': None, 'bfloat16': 'bfloat16'}[
    os.environ.get('TSSEP_COMPUTE_DTYPE', 'float32')]

#: Dtype of the head rearrange + mask/logit outputs.  The (B, S, M, T, F)
#: head tensors at flagship dims are ~1.3 GB EACH in f32 and go through
#: two transposes (reshape_head) plus the loss — the single biggest
#: XLA-glue traffic item in the step HLO (tools/analyze_hlo.py).  bf16
#: halves that; losses upcast their final reductions.  Opt-in
#: (TSSEP_HEAD_BF16=1) pending accuracy/throughput evaluation.
HEAD_DTYPE = (jnp.bfloat16 if os.environ.get('TSSEP_HEAD_BF16', '0') != '0'
              else jnp.float32)


def _permutation_trial_indices(speakers: int, trials: int):
    """Cyclic-shift speaker index expansion + its inverse (static numpy)."""
    idx = ((np.arange(speakers)[:, None] + np.arange(speakers)[None, :])
           % speakers)[:trials, :].ravel()
    revert_idx = np.argsort(idx, kind='stable')
    return idx, revert_idx


class MaskEstimator(Configurable):
    """See module docstring.  ``init(key) -> params``; ``apply(params, ...)``."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        if config.get('aux_net') is None:
            # i-vector style aux by default
            config['aux_net_output_size'] = 100
        else:
            config['aux_net']['idim'] = config.get('odim') or config['idim']
            if config.get('combination', 'cat') == 'cat' and 'odim' in config['aux_net']:
                config['aux_net_output_size'] = config['aux_net']['odim']

    def __init__(
        self,
        *,
        idim=80,
        odim=None,
        layers=3,
        units=300,
        projs=320,
        dropout=0,
        nmask=1,
        pre_net='RNNP',
        aux_net: AuxNet = None,
        aux_net_output_size=None,
        combination: str = 'cat',       # 'cat' | 'mul'
        ts_vad=False,                   # False or int (number of speakers)
        output_resolution: str = 'tf',  # 'tf' | 't'
        random_speaker_order=True,
        num_averaged_permutations=1,
        input_normalizer: InstanceNorm = None,
        aux_normalizer: InstanceNorm = None,
        explicit_vad=False,
    ):
        if odim is None:
            odim = idim
        self.idim = idim
        self.odim = odim
        self.layers = layers
        self.units = units
        self.projs = projs
        self.dropout = dropout
        self.nmask = nmask
        self.combination = combination
        self.ts_vad = ts_vad
        self.output_resolution = output_resolution
        self.random_speaker_order = random_speaker_order
        self.num_averaged_permutations = num_averaged_permutations
        self.explicit_vad = explicit_vad
        if isinstance(input_normalizer, dict):
            input_normalizer = from_config(input_normalizer)
        if isinstance(aux_normalizer, dict):
            aux_normalizer = from_config(aux_normalizer)
        if isinstance(aux_net, dict):
            aux_net = from_config(aux_net)
        self.input_normalizer = input_normalizer
        self.aux_normalizer = aux_normalizer
        self.aux_net = aux_net
        self.aux_net_output_size = aux_net_output_size

        if not self.ts_vad:
            assert self.num_averaged_permutations == 1, (
                self.ts_vad, self.num_averaged_permutations)
        if self.output_resolution == 't':
            assert explicit_vad is False, explicit_vad

        self.ts_factor = int(ts_vad) if ts_vad else 1
        if ts_vad:
            assert 2 < ts_vad < 20, ts_vad

        if pre_net == 'RNNP':
            self.pre_net = RNNP(idim=idim, elayers=1, cdim=units, hdim=odim,
                                dropout=dropout)
        elif pre_net in (None, False):
            self.pre_net = None
        else:
            raise ValueError(pre_net)

        if combination == 'cat':
            assert aux_net_output_size is not None
            first_birnn_idim = odim + aux_net_output_size
        elif combination == 'mul':
            # LHUC-style elementwise conditioning: embeddings live in the
            # odim feature space.
            if aux_net_output_size is not None:
                assert aux_net_output_size == odim, (
                    f"combination='mul' needs aux embeddings of size odim="
                    f"{odim}, got aux_net_output_size={aux_net_output_size}")
            first_birnn_idim = odim
        else:
            raise NotImplementedError(combination)

        self.birnns = []
        for l in range(layers):
            in_l = first_birnn_idim if l == 0 else projs
            if l == layers - 1 and ts_vad:
                in_l = in_l * self.ts_factor
            self.birnns.append(RNNP(idim=in_l, elayers=1, cdim=units,
                                    hdim=projs, dropout=dropout))

        if output_resolution == 'tf':
            self.final_out_features = (odim + int(explicit_vad)) * nmask * self.ts_factor
        elif output_resolution == 't':
            self.final_out_features = nmask * self.ts_factor
        else:
            raise ValueError(output_resolution)

    # -- params ------------------------------------------------------------
    def init(self, key):
        n = self.layers + 3
        keys = jax.random.split(key, n)
        params = {}
        if self.pre_net is not None:
            params['pre_net'] = self.pre_net.init(keys[0])
        post = {}
        for l, birnn in enumerate(self.birnns):
            post[f'birnn{l}'] = birnn.init(keys[1 + l])
        post[f'linear{self.layers - 1}'] = torch_linear_init(
            keys[self.layers + 1], self.projs, self.final_out_features)
        params['post_net'] = post
        if self.aux_net is not None:
            params['aux_net'] = self.aux_net.init(keys[self.layers + 2])
        return params

    def reshape_head(self, logit, S, T):
        """Head rearrange: post-net linear output -> (B', S, nmask, T, Fh)
        (both head layouts of reference ``net.py:629-661``; the 't'
        resolution broadcasts per-frame scalars over frequency)."""
        logit = logit.astype(HEAD_DTYPE)
        M = self.nmask
        if self.output_resolution == 'tf':
            Fh = self.odim + int(self.explicit_vad)
            if self.ts_vad:
                # (B', 1, T, S*M*Fh)
                logit = logit.reshape(logit.shape[0], T, S, M, Fh)
                logit = jnp.transpose(logit, (0, 2, 3, 1, 4))
            else:
                logit = logit.reshape(logit.shape[0], S, T, M, Fh)
                logit = jnp.transpose(logit, (0, 1, 3, 2, 4))
        else:  # 't'
            if self.ts_vad:
                logit = logit.reshape(logit.shape[0], T, S, M)
                logit = jnp.transpose(logit, (0, 2, 3, 1))
            else:
                logit = logit.reshape(logit.shape[0], S, T, M)
                logit = jnp.transpose(logit, (0, 1, 3, 2))
            logit = jnp.broadcast_to(logit[..., None],
                                     logit.shape + (self.odim,))
        return logit

    # -- forward -----------------------------------------------------------
    def apply(self, params, xs, aux, *, rng=None, training=False,
              aux_lengths=None, stage=None) -> Output:
        """xs: (T, F) or (B, T, F); aux: (S, A) / (B, S, A) / (+ aux-frame dim
        when ``aux_net`` is set).  Returns masks (B?, S, nmask, T, odim).

        ``stage``: profiling hook (bench.py --stage-budget): return the raw
        intermediate tensor right after the named stage ('pre_net',
        'birnn0'..'birnn{L-1}', 'linear', 'head') instead of the full
        Output — with a scalar loss attached there, XLA dead-code-
        eliminates everything downstream, which is how the per-stage time
        budget is measured by differences on hardware."""
        batched = xs.ndim == 3
        if not batched:
            xs = xs[None]
            aux = aux[None]
            if aux_lengths is not None:
                aux_lengths = aux_lengths[None]

        B, T, _ = xs.shape
        S = aux.shape[1]
        trials = self.num_averaged_permutations

        # 0. RNG normalization: ``rng`` is either one key (2,) or
        # PER-EXAMPLE keys (B, 2).  Per-example draws always come from
        # ``split(step_key, B_global)[i]`` so they are identical under
        # mesh=None, jit-SPMD data parallelism, and shard_map (where each
        # shard receives only its slice of the pre-split keys — a naive
        # in-shard split(key, B_local) would duplicate draws across
        # shards; tests/test_dist_train.py asserts the consistency).
        keys = None
        if rng is not None:
            rng = jnp.asarray(rng)
            keys = rng if rng.ndim == 2 else jax.random.split(rng, B)
            # Batch-level stream (dropout): decorrelated from the
            # per-example stream by fold_in tag.
            rng = jax.random.fold_in(keys[0], 1)

        # 1. random speaker order (invertible, explicit PRNG)
        perm = None
        if self.random_speaker_order and keys is not None:
            perm = jax.vmap(
                lambda k: jax.random.permutation(
                    jax.random.fold_in(k, 0), S))(keys)
            ix = perm.reshape(perm.shape + (1,) * (aux.ndim - 2))
            aux = jnp.take_along_axis(aux, ix, axis=1)
            if aux_lengths is not None:
                aux_lengths = jnp.take_along_axis(aux_lengths, perm, axis=1)

        # 2. aux embedding
        if self.aux_net is not None:
            assert self.aux_normalizer is None
            aux = self.aux_net.apply(params['aux_net'], aux, aux_lengths)
        elif self.aux_normalizer is not None:
            aux = self.aux_normalizer(aux)
        aux = aux.astype(xs.dtype)                 # (B, S, A)

        # 3. input normalizer + pre_net
        if self.input_normalizer is not None:
            xs = self.input_normalizer(xs)
        if self.pre_net is not None:
            xs = self.pre_net.apply(params['pre_net'], xs, rng=rng,
                                    training=training)

        if stage == 'pre_net':
            return xs

        if COMPUTE_DTYPE is not None:
            xs = xs.astype(COMPUTE_DTYPE)
            aux = aux.astype(COMPUTE_DTYPE)

        # 4. conditioning — optionally fused into the first post-net
        # layer's Pallas kernel (the (B, S, T, F) 'mul'-conditioned tensor
        # then never exists in HBM; kernels/blstm.py fullfused_cond)
        from tssep_tpu.nn import rnnp as _rnnp_mod
        cond_fused = (
            self.combination == 'mul'
            and not (self.layers == 1 and self.ts_vad)  # stacking first
            and self.birnns[0].elayers == 1
            and self.birnns[0].bidirectional
            and _rnnp_mod.cond_fuse_active())
        first_layer = 0
        if cond_fused:
            xs_c, aux_c = xs, aux
            if trials > 1:
                idx, revert_idx = _permutation_trial_indices(S, trials)
                # expanding aux is equivalent to expanding the product
                aux_c = aux[:, idx].reshape((B * trials, S, aux.shape[-1]))
                xs_c = jnp.broadcast_to(
                    xs[:, None], (B, trials) + xs.shape[1:]
                ).reshape((B * trials,) + xs.shape[1:])
            h = self.birnns[0].apply_conditioned(
                params['post_net']['birnn0'], xs_c, aux_c, rng=rng,
                training=training)
            if 0 < self.layers - 1:
                if training and self.dropout > 0 and rng is not None:
                    rng, sub = jax.random.split(rng)
                    keep = jax.random.bernoulli(sub, 1 - self.dropout,
                                                h.shape)
                    h = jnp.where(keep, h / (1 - self.dropout), 0)
                h = jnp.tanh(h)
            first_layer = 1
        elif self.combination == 'mul':
            h = xs[:, None, :, :] * aux[:, :, None, :]
        elif self.combination == 'cat':
            h = jnp.concatenate(
                [jnp.broadcast_to(xs[:, None], (B, S) + xs.shape[1:]),
                 jnp.broadcast_to(aux[:, :, None, :], (B, S, T, aux.shape[-1]))],
                axis=-1)
        else:
            raise NotImplementedError(self.combination)
        # h: (B, S, T, F')

        # 5. permutation-trial expansion (free data parallelism)
        if trials > 1 and not cond_fused:
            idx, revert_idx = _permutation_trial_indices(S, trials)
            h = h[:, idx]                                  # (B, trials*S, T, F')
            h = h.reshape((B * trials, S) + h.shape[2:])

        # 6. post net
        n_folded = self.layers - 1 if self.ts_vad else self.layers
        for l, birnn in enumerate(self.birnns):
            if l < first_layer:
                continue
            if l == self.layers - 1 and self.ts_vad:
                # cross-speaker stacking: (B', S, T, F) -> (B', 1, T, S*F)
                h = jnp.swapaxes(h, 1, 2)                  # (B', T, S, F)
                h = h.reshape(h.shape[:2] + (1, -1))       # (B', T, 1, S*F)
                h = jnp.swapaxes(h, 1, 2)                  # (B', 1, T, S*F)
            # Trade HBM for the remat forward re-run on the LAST
            # no_remat_folded folded layers (their residuals have the
            # shortest lifetime: the backward reaches them first).
            remat = None
            if (_rnnp_mod.NO_REMAT_FOLDED > 0 and l < n_folded
                    and l >= n_folded - _rnnp_mod.NO_REMAT_FOLDED):
                remat = False
            h = birnn.apply(params['post_net'][f'birnn{l}'], h, rng=rng,
                            training=training, remat=remat)
            if stage == f'birnn{l}':
                return h
            if l < self.layers - 1:
                if training and self.dropout > 0 and rng is not None:
                    rng, sub = jax.random.split(rng)
                    keep = jax.random.bernoulli(sub, 1 - self.dropout, h.shape)
                    h = jnp.where(keep, h / (1 - self.dropout), 0)
                h = jnp.tanh(h)

        lin = params['post_net'][f'linear{self.layers - 1}']
        logit = (h @ lin['weight'].T.astype(h.dtype)
                 + lin['bias'].astype(h.dtype))
        if stage == 'linear':
            return logit
        logit = self.reshape_head(logit, S, T)
        if stage == 'head':
            return logit

        # 7. un-average permutation trials
        if trials > 1:
            logit = logit.reshape((B, trials * S) + logit.shape[2:])
            logit = logit[:, revert_idx]                    # speaker-major
            logit = logit.reshape((B, S, trials) + logit.shape[2:]).mean(axis=2)

        # 8. revert random speaker order
        if perm is not None:
            iperm = jnp.argsort(perm, axis=-1)
            ix = iperm.reshape(iperm.shape + (1,) * (logit.ndim - 2))
            logit = jnp.take_along_axis(logit, ix, axis=1)

        embedding = aux[:, :, None, :]

        if self.explicit_vad:
            mask = jax.nn.sigmoid(logit)
            vad_mask = mask[..., 0]
            mask = mask[..., 1:] * vad_mask[..., None]
            out = Output(mask=mask, logit=None, vad_mask=vad_mask,
                         vad_logit=logit[..., 0], embedding=embedding)
        else:
            out = Output(mask=jax.nn.sigmoid(logit), logit=logit,
                         embedding=embedding)

        if not batched:
            out = Output(**{
                f.name: (None if getattr(out, f.name) is None
                         else getattr(out, f.name)[0])
                for f in dataclasses.fields(out)
            })
        return out

    def num_params(self):
        n = 0
        if self.pre_net is not None:
            n += self.pre_net.num_params()
        for birnn in self.birnns:
            n += birnn.num_params()
        n += self.final_out_features * (self.projs + 1)
        if self.aux_net is not None:
            n += 3 * (self.aux_net.idim ** 2 + self.aux_net.idim)
        return n


#: Reference-compatible alias (its configs name the class MaskEstimator_v2).
MaskEstimator_v2 = MaskEstimator
