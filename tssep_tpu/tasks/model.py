"""Task assembly: feature extraction + mask estimator + enhancer + loss,
plus the data pipeline the model owns (reference ``tssep/train/model.py``).

TPU split of responsibilities:

- **host side** (numpy, not traced): dataset construction, target selection,
  collate/stacking, interval->frame VAD targets (``host_prepare``), device
  transfer;
- **device side** (pure, jit-able): ``forward`` (STFT -> features -> mask
  estimator -> enhancer) and ``review_loss`` (ISTFT -> loss), combined in
  ``loss_fn(params, batch, rng)`` which the trainer differentiates and jits.

Snapshots (audio/spectrogram/mask images) are produced by ``snapshots()``
host-side from a validation forward, mirroring the reference's tensorboard
review payloads (``model.py:692-752``)."""

from __future__ import annotations

import dataclasses
import os
import typing

import jax
import jax.numpy as jnp
import numpy as np

from tssep_tpu.config.configurable import Configurable, from_config
from tssep_tpu.data.dummy import DummyReader
from tssep_tpu.data import pipeline
from tssep_tpu.features import extractor as feature_extractor
from tssep_tpu.nn.estimator import MaskEstimator, Output
from tssep_tpu.signal.vad import stft_vad
from tssep_tpu.tasks import enhancer as enhancer_mod
from tssep_tpu.tasks import losses as loss_mod

__all__ = ['Model', 'ForwardOutput']


@dataclasses.dataclass
class ForwardOutput:
    mask: typing.Any
    logit: typing.Any
    embedding: typing.Any = None
    stft_estimate: typing.Any = None
    time_estimate: typing.Any = None
    vad_mask: typing.Any = None
    vad_logit: typing.Any = None


jax.tree_util.register_dataclass(
    ForwardOutput,
    data_fields=['mask', 'logit', 'embedding', 'stft_estimate',
                 'time_estimate', 'vad_mask', 'vad_logit'], meta_fields=[])


#: example keys that are transferred to the device (everything else stays host)
_DEVICE_KEY_BASE = ('Input', 'observation', 'auxInput', 'framewise_embeddings',
                    '_sample_mask', '_frame_mask')


class Model(Configurable):
    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['fe'] = dict(
            factory=feature_extractor.Log1pMaxNormAbsSTFT,
            size=1024, shift=256, window='hann',
        )
        config['reader'] = dict(factory=DummyReader)
        config['enhancer'] = dict(factory=enhancer_mod.Masking)

        # Instantiate the fe to derive dependent dims (mirrors reference
        # model.py:133-146).
        from tssep_tpu.config.configurable import get_config, import_class
        fe_view = config['fe']
        fe_cfg = (fe_view.to_dict() if hasattr(fe_view, 'to_dict')
                  else dict(fe_view))
        fe_obj = from_config(get_config(fe_cfg['factory'],
                                        {k: v for k, v in fe_cfg.items()
                                         if k != 'factory'}))

        enh_factory = import_class(config['enhancer']['factory'])
        config['mask_estimator'] = dict(
            factory=MaskEstimator,
            idim=fe_obj.output_size,
            odim=fe_obj.frequencies,
            nmask=1 if issubclass(enh_factory, enhancer_mod.Masking) else 2,
        )
        config['loss'] = dict(factory=loss_mod.LogMAE)

    def __init__(self, fe, reader, mask_estimator: MaskEstimator, enhancer,
                 loss):
        self.fe = fe
        self.reader = reader
        self.mask_estimator = mask_estimator
        self.enhancer = enhancer
        self.loss = loss

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------
    def init_params(self, key):
        return {'mask_estimator': self.mask_estimator.init(key)}

    def num_params(self):
        return self.mask_estimator.num_params()

    # ------------------------------------------------------------------
    # Data pipeline (host)
    # ------------------------------------------------------------------
    @property
    def _device_keys(self):
        extra = (self.loss.device_targets()
                 if hasattr(self.loss, 'device_targets')
                 else set(self.loss.targets())
                 | set(self.loss.targets(lower=True)))
        return set(_DEVICE_KEY_BASE) | extra

    def example_to_device(self, ex, device=None):
        out = dict(ex)
        for k in self._device_keys:
            if k in out and isinstance(out[k], np.ndarray):
                arr = out[k]
                if arr.dtype == np.float64:
                    arr = arr.astype(np.float32)
                out[k] = jnp.asarray(arr) if device is None else jax.device_put(
                    jnp.asarray(arr), device)
        return out

    def host_prepare(self, ex):
        """Host-side target preparation that cannot run under jit:
        sample-domain VAD -> frame activity for the 'Vad' loss target."""
        if 'Vad' in self.loss.targets() and 'Vad' not in ex and 'vad' in ex:
            if hasattr(self.fe, 'sample_vad_to_frame_vad'):
                # Waveform fes (KaldiMFCC) own their frame semantics.
                fv = self.fe.sample_vad_to_frame_vad(np.asarray(ex['vad']))
            else:
                fv = stft_vad(np.asarray(ex['vad']), self.fe.window_length,
                              self.fe.shift, self.fe.fading)
            ex['Vad'] = np.asarray(fv, dtype=np.float32)
        return ex

    def prepare_dataset(
        self, dataset_name, device=None, training=False, review=True,
        batch_size=None, prefetch=True, reader=None, sort=False,
        verbose=False, load_keys=None, host_shard=False, drop_last=False,
    ):
        if reader is None:
            reader = self.reader

        if sort:
            def pre_load_apply(ds):
                def get_num_samples(ex):
                    try:
                        return ex['end'] - ex['start']
                    except KeyError:
                        pass
                    ns = ex.get('num_samples')
                    if isinstance(ns, dict):
                        return ns.get('observation',
                                      max(ns.get('original_source', [0])))
                    return ns
                return ds.copy(freeze=True).sort(get_num_samples, reverse=True)
        else:
            pre_load_apply = None

        if load_keys is None:
            load_keys = ['observation', *self.loss.targets(lower=True)]

        ds = reader(dataset_name, pre_load_apply=pre_load_apply,
                    load_keys=load_keys)

        training_flag = training

        def prepare(ex):
            r = {'reference_channel': 0}
            try:
                r['observation'] = ex['audio_data']['observation']
            except KeyError:
                if 'Input' in ex:
                    r['Input'] = ex['Input']
                else:
                    raise

            for target_name in self.loss.targets():
                target_name_lower = target_name.lower()
                try:
                    if target_name_lower in ex['audio_data']:
                        target = ex['audio_data'][target_name_lower]
                        if isinstance(target, np.ndarray) and target.ndim == 3:
                            target = target[:, r['reference_channel']]
                        r[target_name_lower] = target
                    elif target_name in ('Vad',):
                        if target_name in ex['audio_data']:
                            r[target_name] = ex['audio_data'][target_name]
                    elif review:
                        raise KeyError(
                            f'Reader did not load {target_name_lower!r} '
                            f'(set review=False to allow missing targets)')
                except KeyError:
                    if training_flag:
                        raise

            for k in ('example_id', 'dataset', 'gender', 'auxInput', 'vad',
                      'transcription', 'speaker_ids',
                      'framewise_embeddings', 'framewise_embeddings_stride'):
                if k in ex:
                    r[k] = ex[k]
                elif k == 'vad' and 'vad' in ex.get('audio_data', {}):
                    r[k] = ex['audio_data']['vad']

            r = self.host_prepare(r)
            if verbose:
                r['verbose'] = ex
            return r

        ds = ds.map(prepare)

        if training and not sort:
            ds = ds.shuffle(reshuffle=True)

        if host_shard:
            # Multi-host: deal examples round-robin by process index AFTER
            # the (seed-deterministic, process-identical) shuffle, so the
            # union of all hosts' local batches is exactly the global batch
            # a single-host run would see.  Dealing before the shuffle
            # would let each host reshuffle its share independently and
            # silently change the effective batch composition
            # (tests/test_multihost.py compares the trajectories).
            from tssep_tpu.dist import multihost
            ds = multihost.host_shard_dataset(ds)

        if batch_size is not None:
            ds = ds.batch(batch_size, drop_last=drop_last)
            ds = ds.map(self.collate_fn)

        if prefetch:
            threads = int(os.environ.get('SLURM_CPUS_PER_TASK', 6))
            ds = ds.prefetch(threads, threads * 2, catch_filter_exception=True)
        elif training:
            ds = ds.catch()

        if device is not False:
            ds = ds.map(lambda ex: self.example_to_device(ex, None))
        return ds

    #: Padded (bucketed) lengths are rounded up to this many STFT shifts so
    #: jit sees few distinct shapes across batches of variable-length data.
    pad_shift_multiple = 32

    def _pad_time(self, arrays, target_len):
        return [np.pad(a, [(0, 0)] * (a.ndim - 1)
                       + [(0, target_len - a.shape[-1])])
                for a in arrays]

    def collate_fn(self, exs):
        """List of example dicts -> batch dict of stacked arrays.

        Variable-length examples are zero-padded on the time axis (rounded
        up to a shift multiple for shape bucketing) and loss masks
        (``_sample_mask`` / ``_frame_mask``) are attached; the losses then
        average over valid samples/frames only.
        """
        time_keys = {'observation', 'vad', *self.loss.targets(lower=True)}
        lengths = [e['observation'].shape[-1] for e in exs
                   if 'observation' in e]
        ragged = len(set(lengths)) > 1
        if ragged:
            quantum = self.fe.shift * self.pad_shift_multiple
            target_len = -(-max(lengths) // quantum) * quantum
            num_frames = [self.fe.num_frames(n) for n in lengths]
            padded_frames = self.fe.num_frames(target_len)

        keys = exs[0].keys()
        ex = {}
        for k in keys:
            vals = [e[k] for e in exs]
            if isinstance(vals[0], np.ndarray):
                if ragged and k in time_keys:
                    vals = self._pad_time(vals, target_len)
                elif ragged and k == 'Vad':
                    vals = self._pad_time(vals, padded_frames)
                try:
                    ex[k] = np.stack(vals)
                except ValueError:
                    ex[k] = vals  # ragged non-time key
            else:
                ex[k] = vals

        if ragged:
            ex['num_samples'] = np.asarray(lengths)
            sm = np.zeros((len(exs), 1, target_len), dtype=np.float32)
            fm = np.zeros((len(exs), 1, padded_frames), dtype=np.float32)
            for i, (n, nf) in enumerate(zip(lengths, num_frames)):
                sm[i, 0, :n] = 1
                fm[i, 0, :nf] = 1
            ex['_sample_mask'] = sm
            ex['_frame_mask'] = fm
        # Stack frame-VAD targets
        if 'Vad' in ex and isinstance(ex['Vad'], list) and \
                isinstance(ex['Vad'][0], np.ndarray):
            try:
                ex['Vad'] = np.stack(ex['Vad'])
            except ValueError:
                pass
        assert len(set(ex['reference_channel'])) == 1, ex['reference_channel']
        ex['reference_channel'] = ex['reference_channel'][0]
        return ex

    def prepare_train_dataset(self, device=None, batch_size=None,
                              prefetch=True, reader=None, sort=False,
                              host_shard=False, drop_last=False):
        return self.prepare_dataset(
            self.reader.train_dataset_name, device=device, training=True,
            batch_size=batch_size, prefetch=prefetch, reader=reader,
            sort=sort, host_shard=host_shard, drop_last=drop_last)

    def prepare_validate_dataset(self, device=None, batch_size=None,
                                 prefetch=True, reader=None, sort=False,
                                 host_shard=False, drop_last=False):
        return self.prepare_dataset(
            self.reader.validate_dataset_name, device=device, training=False,
            batch_size=batch_size, prefetch=prefetch, reader=reader,
            sort=sort, host_shard=host_shard, drop_last=drop_last)

    def prepare_eval_dataset(self, device=None, batch_size=None, prefetch=True,
                             reader=None, sort=False, load_keys=None):
        if reader is None:
            reader = self.reader
        return self.prepare_dataset(
            reader.eval_dataset_name, device=device, training=False,
            review=False, batch_size=batch_size, prefetch=prefetch,
            reader=reader, sort=sort, verbose=True, load_keys=load_keys)

    # ------------------------------------------------------------------
    # Device-side compute (jit-able)
    # ------------------------------------------------------------------
    def forward(self, params, ex, rng=None, training=False) -> ForwardOutput:
        ex = dict(ex)
        ref = ex['reference_channel']
        assert isinstance(ref, (int, np.integer)) or (
            hasattr(ref, 'ndim') and ref.ndim == 0), ref

        if 'Input' in ex:
            pass
        elif 'Observation' in ex:
            ex['Input'] = self.fe.stft_to_feature(
                ex['Observation'][..., ref, :, :]).astype(jnp.float32)
        elif hasattr(self.fe, 'stft'):
            ex['Observation'] = self.fe.stft(ex['observation'])
            ex['Input'] = self.fe.stft_to_feature(
                ex['Observation'][..., ref, :, :]).astype(jnp.float32)
        else:
            # Waveform feature extractor (e.g. KaldiMFCC): the Kaldi-input
            # TS-VAD path (reference model.py:510-513).
            ex['Input'] = jnp.asarray(
                self.fe(ex['observation'][..., ref, :])).astype(jnp.float32)

        ex = self.reader.data_hooks.pre_net(ex)

        me_out: Output = self.mask_estimator.apply(
            params['mask_estimator'], ex['Input'], ex['auxInput'],
            rng=rng, training=training)

        if 'Observation' in ex:
            stft_estimate = self.enhancer(me_out.mask, ex, self)
        else:
            assert isinstance(self.loss, loss_mod.VADSigmoidBCE), type(self.loss)
            stft_estimate = None

        out = ForwardOutput(
            mask=me_out.mask, logit=me_out.logit, vad_mask=me_out.vad_mask,
            vad_logit=me_out.vad_logit, embedding=me_out.embedding,
            stft_estimate=stft_estimate)
        if stft_estimate is not None:
            # Fused masked-synthesis path (Masking.re_im): the time
            # estimate multiplies the observation's re/im by the real
            # mask directly, so the complex stft_estimate above is dead
            # code in the jitted loss (XLA removes it) and only snapshot
            # forwards pay for it.
            re_im = getattr(self.enhancer, 're_im', None)
            if re_im is not None:
                out._re_im_estimate = re_im(me_out.mask, ex, self)
        return out

    def review_loss(self, ex, out: ForwardOutput):
        """ISTFT + loss; returns (loss_sum, per_example_loss)."""
        if (out.stft_estimate is not None and 'observation' in ex
                and hasattr(self.fe, 'istft')):
            est = getattr(out, '_re_im_estimate', None) or out.stft_estimate
            out.time_estimate = self.fe.istft(
                est, num_samples=ex['observation'].shape[-1])
        loss_value = self.loss.from_ex_out(ex, out, self)
        return jnp.sum(loss_value), loss_value

    def loss_fn(self, params, ex, rng=None, training=True):
        """The function the trainer differentiates: scalar loss + aux."""
        out = self.forward(params, ex, rng=rng, training=training)
        loss_sum, loss_value = self.review_loss(ex, out)
        return loss_sum, {'per_example_loss': loss_value}

    # ------------------------------------------------------------------
    # Snapshots (host side, for tensorboard)
    # ------------------------------------------------------------------
    def add_snapshots(self, ex, out: ForwardOutput, summary,
                      max_speakers=4):
        """Push audio / spectrogram-image / mask-image payloads for the
        first example of a batch into a ``ReviewSummary`` — the trainer
        calls this at summary/validation triggers (mirrors reference
        ``model.py:692-752`` and the VAD-overlay mask images of
        ``loss.py:148-169``)."""
        name = self.enhancer.name
        sr = getattr(self.reader, 'sample_rate', 16000)

        # The batch may be collated (leading batch dim) or a single raw
        # example (test_run's strict snapshot pre-flight feeds whatever the
        # pre-flight dataset yields): detect from the mask rank, fall back
        # to the observation rank.
        if out.mask is not None:
            batched = np.asarray(out.mask).ndim == 5
        elif 'observation' in ex:
            batched = np.asarray(ex['observation']).ndim == 3
        else:
            batched = True

        def first(x):  # leading batch entry, host-side
            x = np.asarray(x)
            return x[0] if (batched and x.ndim) else x

        if out.time_estimate is not None:
            est = first(out.time_estimate)
            summary.add_audio(f'{name}_audio_est', est.reshape(
                -1, est.shape[-1])[0], sr)
        if 'observation' in ex:
            obs = first(ex['observation'])
            summary.add_audio(f'{name}_audio_observation',
                              obs.reshape(-1, obs.shape[-1])[0], sr)
        if 'Observation' in ex:
            o = first(ex['Observation'])
            summary.add_stft_image(
                f'{name}_Observation_stft', o.reshape(
                    (-1,) + o.shape[-2:])[0])
        elif 'observation' in ex and hasattr(self.fe, 'stft'):
            # Training batches carry the waveform only (the STFT happens
            # inside jit); recompute the first example host-side.
            o = np.asarray(self.fe.stft(first(ex['observation'])))
            summary.add_stft_image(
                f'{name}_Observation_stft',
                o.reshape((-1,) + o.shape[-2:])[0])
        if out.stft_estimate is not None:
            e = first(out.stft_estimate)
            summary.add_stft_image(
                f'{name}_stft_estimate', e.reshape((-1,) + e.shape[-2:])[0])
        if out.mask is not None:
            mask = first(out.mask)              # (spk, nmask, T, F) or (spk, nmask, T, 1)
            vad = None
            if 'Vad' in ex:
                vad = first(ex['Vad'])          # (spk, T_frames)
            for s in range(min(mask.shape[0], max_speakers)):
                m = mask[s].reshape((-1,) + mask.shape[-2:])[0]  # (T, F)
                if m.ndim == 1:   # 't' resolution: per-frame activity
                    m = m[:, None]
                img = m
                if vad is not None and vad.shape[-1] == m.shape[0]:
                    # VAD-target stripe composited next to the mask
                    # (reference loss.py:148-169).
                    width = max(4, m.shape[1] // 16)
                    sep = np.full((m.shape[0], 2), 0.5, m.dtype)
                    stripe = np.repeat(
                        vad[s].astype(m.dtype)[:, None], width, axis=1)
                    img = np.concatenate([m, sep, stripe], axis=1)
                summary.add_mask_image(f'mask_spk{s}', img)

    def snapshots(self, ex, out: ForwardOutput):
        """Audio/image payloads mirroring reference ``model.py:692-752``."""
        snaps = {}
        name = self.enhancer.name
        if out.time_estimate is not None:
            snaps[f'{name}_audio_est'] = np.asarray(out.time_estimate)
        if 'observation' in ex:
            snaps[f'{name}_audio_observation'] = np.asarray(
                ex['observation'])[..., 0, :]
        if 'Observation' in ex:
            snaps[f'{name}_Observation_stft'] = np.asarray(
                abs(ex['Observation']))[..., 0, :, :]
        if out.mask is not None:
            snaps['mask'] = np.asarray(out.mask)
        if out.stft_estimate is not None:
            snaps[f'{name}_stft_estimate'] = np.abs(
                np.asarray(out.stft_estimate))
        return snaps
